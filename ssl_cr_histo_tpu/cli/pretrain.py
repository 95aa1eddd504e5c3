"""RSP self-supervised pretraining CLI.

Covers the reference's three pretraining drivers with one entry point:
  * pretrain_BreastPathQ.py  -> --variant v1 --tile_stride 128
  * pretrain_Camelyon16.py   -> --variant v1 --tile_stride 512 (and the
                                best-val gate after epoch 80)
  * Pretraining_v2/pretrain_RSP.py -> --variant v2 --tile_stride 768

Config of record (reference pretrain_BreastPathQ.py:151-196, :245-247):
SGD-Nesterov lr 0.01 wd 1e-4 + Lookahead(5, 0.5) stepped per epoch,
250 epochs, batch 64, 256x256 tiles.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ssl_cr_histo_tpu.cli.common import (
    add_common_args,
    apply_reference_exact,
    chunked_feed,
    model_dtype,
    resolve_photometric,
    resume_training,
    seed_everything,
)
from ssl_cr_histo_tpu.data.pipeline import pad_batches, prefetch_to_device
from ssl_cr_histo_tpu.data.sampler import RSPTripletSampler
from ssl_cr_histo_tpu.eval.metrics import AverageMeter
from ssl_cr_histo_tpu.models import Classifier, TripletNet
from ssl_cr_histo_tpu.parallel import batch_sharding, mesh_for_batch
from ssl_cr_histo_tpu.parallel import steps as S
from ssl_cr_histo_tpu.train import optim
from ssl_cr_histo_tpu.train.checkpoint import save_checkpoint
from ssl_cr_histo_tpu.train.init import init_triplet_state
from ssl_cr_histo_tpu.train.loop import BestTracker, CsvLogger, lookahead_epoch


def parse_args(argv=None):
    p = argparse.ArgumentParser("RSP pretraining (TPU)")
    p.add_argument("--train_image_pth", required=True, help="directory of WSIs (.tif/.svs/.npy)")
    p.add_argument("--variant", default="v1", choices=["v1", "v2"])
    p.add_argument("--tile_h", type=int, default=256)
    p.add_argument("--tile_w", type=int, default=256)
    p.add_argument("--tile_stride", type=int, default=128,
                   help="128 BreastPathQ / 512 Camelyon16 / 768 v2 (BASELINE.md)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_epoch", type=int, default=250)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--la_steps", type=int, default=5)
    p.add_argument("--la_alpha", type=float, default=0.5)
    p.add_argument("--save_freq", type=int, default=10)
    p.add_argument("--best_gate_epoch", type=int, default=0,
                   help="only save best-val after this epoch (80 for Camelyon16, "
                        "reference pretrain_Camelyon16.py:307)")
    p.add_argument("--validation_size", type=int, default=3000,
                   help="triplets held out for validation (3000 BPQ / 10000 Cam16)")
    p.add_argument("--validation_fraction", type=float, default=0.0,
                   help=">0 holds out a seeded fraction instead of a fixed "
                        "count (the v2 driver's 80/20 split, "
                        "Pretraining_v2/pretrain_RSP.py:217-218 -> 0.2)")
    p.add_argument("--lwst_level_idx", type=int, default=1,
                   help="thumbnail level for foreground stats, counted from "
                        "the bottom of the pyramid (1 BreastPathQ / 5 "
                        "Camelyon16, reference pretrain_*.py)")
    p.add_argument("--NAug", type=int, default=2, help="v2 RandAugment n")
    p.add_argument("--Magn", type=float, default=3.0, help="v2 RandAugment m")
    p.add_argument("--no_augment", action="store_true",
                   help="train on raw tiles (ablation / smoke-test aid; the "
                        "reference always augments)")
    p.add_argument("--expand_orderings", action="store_true",
                   help="strict reference epoch semantics: train each epoch "
                        "on ALL 6 orderings of every triplet (x6 steps/epoch, "
                        "host-enumerated — reference dataset.py:27-70 eager "
                        "expansion).  Default samples one ordering per "
                        "triplet per step (training-equivalent, 6x fewer "
                        "reads)")
    p.add_argument("--cache_tiles", action="store_true",
                   help="cache every read triplet in host RAM across epochs "
                        "(the reference's all-in-RAM behavior, dataset.py:"
                        "279-320; ~590 KB per 256^2 position — size your "
                        "host RAM).  Collapses --expand_orderings' 6x "
                        "re-reads and all per-epoch re-reads")
    p.add_argument("--read_workers", type=int, default=0,
                   help="triplet-read threads per batch (0/1 = serial; "
                        "workers open their own slide readers)")
    p.add_argument("--index_cache_dir", default="auto",
                   help="persistent slide-index cache ('auto' = "
                        "<train_image_pth>/.rsp_index; '' disables): re-runs "
                        "on the same slides skip the foreground scan")
    p.add_argument("--index_workers", type=int, default=0,
                   help="slide-indexing threads (0 = min(8, cpus))")
    p.add_argument("--resume", default="")
    p.add_argument("--steps_per_epoch", type=int, default=0,
                   help="0 = full pass over the sampled index")
    p.add_argument("--multi_step", type=int, default=8,
                   help="train steps scanned per device dispatch (lax.scan); "
                        "amortizes host dispatch latency.  1 = one dispatch "
                        "per step")
    p.add_argument("--joint_encode", action="store_true", default=True,
                   help="one batched backbone pass over the 3 views (~2x "
                        "faster fwd/bwd; BN stats joint across views instead "
                        "of per-view — see models.nets.forward_joint).  ON "
                        "by default (the benchmarked config); "
                        "--no_joint_encode restores the reference's "
                        "per-view BN statistics")
    p.add_argument("--no_joint_encode", dest="joint_encode", action="store_false")
    p.add_argument("--tsne", action="store_true",
                   help="reference best-epoch artifacts: dump the train "
                        "epoch's features/targets + t-SNE plot at every new "
                        "best val (pretrain_BreastPathQ.py:322-340), plus a "
                        "final t-SNE of validation features")
    add_common_args(p)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    apply_reference_exact(args, "pretrain")
    if args.image_size:
        # the common --image_size override maps onto the tile geometry here
        # (pretraining has no TaskConfig; tiles ARE the input resolution)
        args.tile_h = args.tile_w = args.image_size
    if args.tile_h != args.tile_w:
        # the sampler/models use one square tile size; the reference also
        # only ever runs square tiles — reject rather than silently using h
        raise SystemExit("non-square tiles are not supported (tile_h != tile_w)")
    key = seed_everything(args.seed)
    resolve_photometric(args)
    mesh = mesh_for_batch(args.batch_size)
    sharding = batch_sharding(mesh)

    sampler = RSPTripletSampler(
        tile=args.tile_h,
        stride=args.tile_stride,
        geometry=args.variant,
        lwst_level_idx=args.lwst_level_idx,
    )
    print(f"==> indexing WSIs under {args.train_image_pth} ...")
    indices = sampler.index_directory(
        args.train_image_pth,
        cache_dir=args.index_cache_dir or None,
        n_workers=args.index_workers,
    )
    n_total = sum(len(i.coords) for i in indices)
    if n_total == 0:
        raise SystemExit("no foreground tiles found")
    print(f"==> {n_total} triplet positions across {len(indices)} slides")

    # Held-out validation positions (reference random_split holdout,
    # pretrain_BreastPathQ.py:209).  We hold out whole positions.
    rng = np.random.default_rng(args.seed)
    flat = [(i, j) for i, idx in enumerate(indices) for j in range(len(idx.coords))]
    order = rng.permutation(len(flat))
    if args.validation_fraction > 0:
        n_val = int(len(flat) * args.validation_fraction)
    else:
        n_val = min(args.validation_size, len(flat) // 5)
    if n_val == 0:
        print("WARNING: validation holdout is empty (too few triplet "
              "positions); val metrics will read 0.0")
    val_set = set(order[:n_val].tolist())
    train_indices, val_positions = [], []
    flat_pos = {t: k for k, t in enumerate(flat)}
    from ssl_cr_histo_tpu.data.sampler import TripletIndex

    for slide_i, idx in enumerate(indices):
        tr_rows = [j for j in range(len(idx.coords)) if flat_pos[(slide_i, j)] not in val_set]
        va_rows = [j for j in range(len(idx.coords)) if flat_pos[(slide_i, j)] in val_set]
        train_indices.append(TripletIndex(idx.slide_path, idx.coords[tr_rows]))
        if va_rows:
            val_positions.append(TripletIndex(idx.slide_path, idx.coords[va_rows]))

    model = TripletNet(args.model, dtype=model_dtype(args), remat=args.remat)
    clf = Classifier(num_classes=6)
    tx = optim.sgd_nesterov(args.lr, momentum=0.9, weight_decay=args.weight_decay)
    state = init_triplet_state(
        model, clf, tx, key, image_size=args.tile_h, lookahead_slow=True
    )
    step_kwargs = dict(
        augment=None if args.no_augment else args.variant,
        n_aug=args.NAug, m_aug=args.Magn,
        aug_mode=args.aug_mode, photometric=args.photometric,
        joint_encode=args.joint_encode,
        # --tsne replicates the reference's best-epoch feature dump, which
        # accumulates TRAIN-batch features (pretrain_BreastPathQ.py:37-89)
        return_feats=args.tsne,
    )
    if args.multi_step > 1:
        step = S.make_pretrain_multi_step(model, clf, tx, **step_kwargs)
    else:
        step = S.make_pretrain_step(model, clf, tx, **step_kwargs)
    eval_step = S.make_pretrain_eval_step(model, clf)

    os.makedirs(args.save_dir, exist_ok=True)
    log = CsvLogger(
        os.path.join(args.save_dir, "train_results.csv"),
        "epoch, train_loss, train_acc, val_loss, val_acc",
    )
    best = BestTracker(args.save_dir, mode="min", gate_epoch=args.best_gate_epoch)

    # shared --resume path (cli.common.resume_training): restores the
    # best-val tracker (so a post-resume epoch can't silently overwrite a
    # better pre-resume 'best') and advances the per-epoch key chain so
    # augmentation randomness continues instead of replaying epoch 1's keys
    state, start_epoch, key, _ = resume_training(args, state, best, key)

    # LRU-capped slide readers: the unbounded dict kept every slide open for
    # the whole run (unbounded FDs/page cache on TIGER-scale slide sets).
    from ssl_cr_histo_tpu.data.wsi import ReaderCache

    readers = ReaderCache(capacity=64)
    tile_cache = {} if args.cache_tiles else None
    expand = args.expand_orderings
    for epoch in range(start_epoch, args.num_epoch + 1):
        t0 = time.time()
        train_loss, train_acc = AverageMeter(), AverageMeter()
        epoch_feats, epoch_targets = [], []

        def keep_feats(m, j=None):
            # accumulate per-train-batch features for the best-epoch dump
            # (reference pretrain_BreastPathQ.py:71-89)
            f, t = np.asarray(m["feats"]), np.asarray(m["labels"])
            if j is not None:
                f, t = f[j], t[j]
            epoch_feats.append(f.astype(np.float32))
            epoch_targets.append(t.astype(np.int32))

        batches = sampler.iter_batches(
            train_indices, args.batch_size, seed=args.seed + epoch,
            readers=readers, expand_orderings=expand,
            tile_cache=tile_cache, read_workers=args.read_workers,
        )
        if args.steps_per_epoch:
            # slice BEFORE prefetching so the worker thread ends with the
            # epoch instead of blocking on a full queue into the next one
            import itertools

            batches = itertools.islice(batches, args.steps_per_epoch)
        key, ek = jax.random.split(key)
        if args.multi_step > 1:
            feed = chunked_feed(
                batches, mesh, args.multi_step, n_arrays=2 if expand else 1
            )
            bi = 0
            for data_k, valid in feed:
                ek, sk = jax.random.split(ek)
                if expand:
                    tiles_k, labels_k = data_k
                    state, ms = step(state, tiles_k, sk, valid, labels_k)
                else:
                    tiles_k = data_k
                    state, ms = step(state, tiles_k, sk, valid)
                losses, accs = np.asarray(ms["loss"]), np.asarray(ms["acc"])
                for j in range(int(np.asarray(valid).sum())):
                    bi += 1
                    train_loss.update(float(losses[j]), tiles_k.shape[1])
                    train_acc.update(float(accs[j]), tiles_k.shape[1])
                    if args.tsne:
                        keep_feats(ms, j)
                    if bi % args.print_freq == 0:
                        print(
                            f"Train: [{epoch}][{bi}] loss {train_loss.val:.3f} "
                            f"({train_loss.avg:.3f}) acc {train_acc.avg:.3f}"
                        )
        else:
            for bi, item in enumerate(prefetch_to_device(batches, sharding=sharding)):
                ek, sk = jax.random.split(ek)
                if expand:
                    tiles, labels = item
                    state, m = step(state, tiles, sk, labels)
                else:
                    tiles = item
                    state, m = step(state, tiles, sk)
                train_loss.update(float(m["loss"]), tiles.shape[0])
                train_acc.update(float(m["acc"]), tiles.shape[0])
                if args.tsne:
                    keep_feats(m)
                if (bi + 1) % args.print_freq == 0:
                    print(
                        f"Train: [{epoch}][{bi + 1}] loss {train_loss.val:.3f} "
                        f"({train_loss.avg:.3f}) acc {train_acc.avg:.3f}"
                    )
        print(f"Epoch time: {time.time() - t0:.2f} s.")

        # validation: every val triplet under ALL 6 orderings (the
        # reference's eagerly x6-expanded val set, pretrain_*.py:95-148);
        # the final partial batch is zero-padded with a validity mask.
        val_loss, val_acc = AverageMeter(), AverageMeter()
        vb = sampler.iter_batches(
            val_positions, args.batch_size, seed=0, drop_last=False,
            readers=readers, tile_cache=tile_cache,
            read_workers=args.read_workers,
        )
        for tiles, valid in prefetch_to_device(
            pad_batches(vb, args.batch_size), sharding=sharding
        ):
            m = eval_step(state, tiles, valid)
            n = float(m["count"])
            if n:
                val_loss.update(float(m["loss_sum"]) / n, n)
                val_acc.update(float(m["correct"]) / n, n)

        # the reference CSV writes epoch+1 while naming checkpoints by epoch
        # (pretrain_BreastPathQ.py:290 vs :307) — defect not replicated: the
        # CSV epoch column matches ckpt_N and meta['epoch'] here
        log.append(epoch, train_loss.avg, train_acc.avg, val_loss.avg, val_acc.avg)
        state = lookahead_epoch(state, args.la_steps, args.la_alpha)

        meta = {"epoch": epoch, "args": vars(args), "train_loss": train_loss.avg,
                "val_loss": val_loss.avg}
        if best.update(val_loss.avg, epoch, state, meta):
            print(f"==> new best val loss {val_loss.avg:.4f}")
            if args.tsne and epoch_feats:
                # reference best-epoch artifacts: the train epoch's feature/
                # target arrays + their t-SNE plot, saved whenever a new
                # best-val model appears (pretrain_BreastPathQ.py:322-340)
                from ssl_cr_histo_tpu.eval.reporting import save_tsne_plot

                f = np.concatenate(epoch_feats)
                t = np.concatenate(epoch_targets)
                np.save(os.path.join(args.save_dir, f"best_pre_trained_feats_{epoch}.npy"), f)
                np.save(os.path.join(args.save_dir, f"best_pre_trained_targets_{epoch}.npy"), t)
                save_tsne_plot(
                    f, t, os.path.join(args.save_dir, f"best_tsne_feats_{epoch}.png")
                )
        if args.save_freq and epoch % args.save_freq == 0:
            # best_val rides periodic metas so resume restores the tracker
            meta["best_val"] = best.best_value
            save_checkpoint(os.path.join(args.save_dir, f"ckpt_{epoch}"), state, meta)

    if args.tsne and val_positions:
        from ssl_cr_histo_tpu.eval.reporting import save_tsne_plot

        # a feats-returning variant compiled only here: the per-epoch val
        # loop above never materializes the (6, B, 768) tensor
        eval_step_feats = S.make_pretrain_eval_step(model, clf, return_feats=True)
        feats, targets = [], []
        vb = sampler.iter_batches(val_positions, args.batch_size, seed=0,
                                  drop_last=False, readers=readers)
        for tiles, valid in prefetch_to_device(
            pad_batches(vb, args.batch_size), sharding=sharding
        ):
            m = eval_step_feats(state, tiles, valid)
            f = np.asarray(m["feats"])  # (6, B, 768): one row set per ordering
            keep = np.asarray(valid).astype(bool)
            for label in range(6):
                feats.append(f[label][keep])
                targets.append(np.full(int(keep.sum()), label, np.int32))
        save_tsne_plot(
            np.concatenate(feats), np.concatenate(targets),
            os.path.join(args.save_dir, "tsne.png"),
        )
        print("==> saved t-SNE plot")

    print("done.")


if __name__ == "__main__":
    main()
