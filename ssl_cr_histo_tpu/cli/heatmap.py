"""Camelyon16 WSI tumor-probability-map inference CLI (reference
test_Camelyon16.py).  Pairs sorted WSI files with sorted tissue-mask .npy
files and writes npy + PNG heatmap artifacts per slide.

Fixes the reference's classifier-loading defect (test_Camelyon16.py:126-127
leaves the head randomly initialized): here the head weights load from the
fine-tuned checkpoint."""

from __future__ import annotations

import argparse
import glob
import os

import jax
import numpy as np

from ssl_cr_histo_tpu.cli.common import (
    add_common_args,
    apply_reference_exact,
    model_dtype,
    seed_everything,
)
from ssl_cr_histo_tpu.data.wsi import open_slide
from ssl_cr_histo_tpu.eval.heatmap import (
    compute_probs_map,
    pair_wsi_masks,
    save_heatmap_artifacts,
)
from ssl_cr_histo_tpu.models import FinetuneHead, TripletNet
from ssl_cr_histo_tpu.parallel import steps as S
from ssl_cr_histo_tpu.train import optim
from ssl_cr_histo_tpu.train.checkpoint import restore_checkpoint
from ssl_cr_histo_tpu.train.init import init_triplet_state


def parse_args(argv=None):
    p = argparse.ArgumentParser("Camelyon16 WSI heatmap inference (TPU)")
    p.add_argument("--test_image_pth", required=True, help="dir of WSIs (.tif/.svs/.npy)")
    p.add_argument("--test_mask_pth", required=True, help="dir of tissue masks (.npy)")
    p.add_argument("--probs_map_path", required=True, help="output dir")
    p.add_argument("--finetune_ckpt", required=True, help="fine-tuned checkpoint dir")
    p.add_argument("--batch_size", type=int, default=256,
                   help="patches per forward; on forward-bound hosts 1024 "
                        "is +17%% throughput (eval-knee table in PERF.md)")
    add_common_args(p)  # provides --image_size (0 = default; 256 here)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    # only the "common" overrides apply here (f32 compute; no aug in this
    # CLI) — but the flag must not be a silently-ignored no-op
    apply_reference_exact(args, "heatmap")
    args.image_size = args.image_size or 256
    seed_everything(args.seed)

    model = TripletNet(args.model, dtype=model_dtype(args), remat=args.remat)
    head = FinetuneHead(num_classes=2)
    tx = optim.adam(1e-4)
    state = init_triplet_state(
        model, head, tx, jax.random.PRNGKey(0),
        image_size=args.image_size, triplet=False,
    )
    state, _ = restore_checkpoint(args.finetune_ckpt, state)
    forward = S.make_forward_fn(model, head)

    # Shard the patch grid over the data mesh axis: on a pod each chip
    # forwards its slice of the sliding window (SURVEY §2.2's spatial-tiling
    # equivalent of sequence parallelism).  Batches are always padded to
    # batch_size (eval/heatmap.py), so sizing the mesh to the batch makes
    # every device_put shardable — no replicate fallback.
    from ssl_cr_histo_tpu.parallel import batch_sharding, mesh_for_batch

    mesh = mesh_for_batch(args.batch_size)
    sharding = batch_sharding(mesh)

    from ssl_cr_histo_tpu.parallel.distributed import fetch_global, put_sharded

    def forward_sharded(patches):
        # patches arrive pre-transferred by the prefetch thread (put_fn)
        out = forward(state, patches)
        if jax.process_count() == 1:
            # return the DEVICE array: the serving loop defers the fetch one
            # batch (3-deep pipeline, eval/heatmap.py)
            return out
        # pod: a data-sharded output is not host-visible from one process —
        # allgather now (costs the deferred fetch; correctness over depth)
        return fetch_global(out)

    wsipaths = []
    for ext in ("tif", "svs", "npy"):
        wsipaths += glob.glob(os.path.join(args.test_image_pth, f"*.{ext}"))
    maskpaths = glob.glob(os.path.join(args.test_mask_pth, "*.npy"))
    try:
        pairs = pair_wsi_masks(wsipaths, maskpaths)
    except ValueError as e:
        raise SystemExit(str(e))

    for wsi_pth, mask_pth in pairs:
        wsi_id = os.path.splitext(os.path.basename(wsi_pth))[0]
        reader = open_slide(wsi_pth)
        mask = np.load(mask_pth)
        print(f"==> {wsi_id}: {int(mask.sum())} tissue positions")
        probs_map = compute_probs_map(
            reader,
            mask,
            forward_sharded,
            image_size=args.image_size,
            batch_size=args.batch_size,
            put_fn=lambda p: put_sharded(p, sharding),
        )
        from ssl_cr_histo_tpu.parallel.distributed import is_primary

        if is_primary():  # every pod process holds the full gathered map
            save_heatmap_artifacts(probs_map, args.probs_map_path, wsi_id)
            print(f"==> wrote {args.probs_map_path}/{wsi_id}*")


if __name__ == "__main__":
    main()
