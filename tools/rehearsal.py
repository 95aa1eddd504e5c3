"""Production-shape rehearsal: the WHOLE product at the reference configs of
record, on the real TPU, in one command.

Runs pretrain -> fine-tune -> consistency -> heatmap -> FROC on synthetic
H&E-like data at the reference shapes (256x256 tiles/patches, pretrain batch
64, Camelyon16 fine-tune batch 16/class, CR batch 8 + mu=7) — the complete
recipe of reference README.md:57-62 plus test_Camelyon16.py — and emits ONE
JSON (default REHEARSAL.json) with per-stage metrics, throughput, and
artifact paths.

    python tools/rehearsal.py --workdir /tmp/rehearsal --out REHEARSAL.json

Scaled-down knobs (--pretrain_epochs etc.) bound wall time; shapes and batch
semantics are never scaled down.  The unit/CLI test suite proves correctness
at toy shapes on CPU; this proves the product end-to-end at production
shapes on the chip (round-2 VERDICT item 1).
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import time

import numpy as np

# --------------------------------------------------------------------------
# Synthetic data at reference shapes
# --------------------------------------------------------------------------


def _tissue_texture(rng, h, w, base, nucleus_density=0.0006):
    """H&E-ish texture: base stain color + noise + dark nuclei dots."""
    img = np.clip(
        np.asarray(base, np.int16)[None, None, :]
        + rng.integers(-18, 18, (h, w, 3), dtype=np.int16),
        0, 255,
    ).astype(np.uint8)
    n_nuclei = int(h * w * nucleus_density)
    ys = rng.integers(2, h - 3, n_nuclei)
    xs = rng.integers(2, w - 3, n_nuclei)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            if dy * dy + dx * dx <= 4:
                img[ys + dy, xs + dx] = (
                    img[ys + dy, xs + dx].astype(np.int16) - 70
                ).clip(40, 255).astype(np.uint8)
    return img


TUMOR_BASE = (150, 70, 170)  # dense violet
NORMAL_BASE = (225, 160, 200)  # light pink


def make_pretrain_wsis(out_dir, n_slides=2, size=6400, seed=0):
    """v1-compatible WSIs: white background + strongly pink tissue block
    (the v1 LAB foreground test is relative to the slide-mean a-channel)."""
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_slides):
        rng = np.random.default_rng(seed + i)
        level0 = np.full((size, size, 3), 245, np.uint8)
        m = size // 8
        level0[m:-m, m:-m] = _tissue_texture(
            rng, size - 2 * m, size - 2 * m, (190, 80, 160)
        )
        np.save(os.path.join(out_dir, f"slide{i}.npy"), level0)


def make_camelyon_patches(out_dir, json_dir, n_per_class=300, size=256, seed=1):
    """Camelyon16-layout labeled patch set: list.txt line-indexed {i}.png,
    Tumor_/Normal_ id rule, polygon labels (data/datasets.py C9)."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(json_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    lines = []
    for i in range(2 * n_per_class):
        tumor = i % 2 == 0
        pid = "Tumor_026" if tumor else "Normal_040"
        x = 50 if tumor else 500  # tumor points inside the polygon
        lines.append((pid, x, x))
    with open(os.path.join(out_dir, "list.txt"), "w") as f:
        for i, (pid, x, y) in enumerate(lines):
            f.write(f"{pid},{x},{y}\n")
            img = _tissue_texture(
                rng, size, size,
                TUMOR_BASE if pid.startswith("Tumor") else NORMAL_BASE,
                nucleus_density=0.002 if pid.startswith("Tumor") else 0.0005,
            )
            cv2.imwrite(os.path.join(out_dir, f"{i}.png"), img[:, :, ::-1])
    tumor_doc = {
        "positive": [{"name": "t", "vertices": [[0, 0], [100, 0], [100, 100], [0, 100]]}],
        "negative": [],
    }
    with open(os.path.join(json_dir, "Tumor_026.json"), "w") as f:
        json.dump(tumor_doc, f)
    with open(os.path.join(json_dir, "Normal_040.json"), "w") as f:
        json.dump({"positive": [], "negative": []}, f)


def make_heatmap_slide(wsi_dir, mask_dir, gt_dir, size=8192, resolution=256, seed=7):
    """Two inference WSIs — one with an embedded tumor region (FROC
    sensitivity) and one all-normal (FROC false-positive branch: no GT file
    = normal slide) — plus tissue masks and grid-level ground truth."""
    os.makedirs(wsi_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    g = size // resolution
    m = size // 8
    mb = m // resolution + 1

    def base_slide(rng):
        level0 = np.full((size, size, 3), 245, np.uint8)
        level0[m:-m, m:-m] = _tissue_texture(
            rng, size - 2 * m, size - 2 * m, NORMAL_BASE, nucleus_density=0.0005
        )
        return level0

    mask = np.zeros((g, g), bool)
    mask[mb : g - mb, mb : g - mb] = True

    rng = np.random.default_rng(seed)
    level0 = base_slide(rng)
    # tumor island (same signature as the tumor training patches)
    t0, t1 = size // 2, size // 2 + size // 4
    level0[t0:t1, t0:t1] = _tissue_texture(
        rng, t1 - t0, t1 - t0, TUMOR_BASE, nucleus_density=0.002
    )
    np.save(os.path.join(wsi_dir, "t1.npy"), level0)
    np.save(os.path.join(mask_dir, "t1_mask.npy"), mask)
    gt = np.zeros((g, g), np.uint8)
    gt[t0 // resolution : t1 // resolution, t0 // resolution : t1 // resolution] = 1
    np.save(os.path.join(gt_dir, "t1.npy"), gt)

    np.save(os.path.join(wsi_dir, "n1.npy"), base_slide(np.random.default_rng(seed + 1)))
    np.save(os.path.join(mask_dir, "n1_mask.npy"), mask)
    return g


# --------------------------------------------------------------------------
# Stage drivers
# --------------------------------------------------------------------------


def _csv_rows(path):
    lines = open(path).read().strip().splitlines()[1:]
    return [[float(v) for v in ln.split(",") if v.strip() != ""] for ln in lines]


def main(argv=None):
    p = argparse.ArgumentParser("full-recipe rehearsal at reference shapes")
    p.add_argument("--workdir", default="/tmp/ssl_cr_rehearsal")
    p.add_argument("--out", default="REHEARSAL.json")
    p.add_argument("--pretrain_epochs", type=int, default=2)
    p.add_argument("--pretrain_steps_per_epoch", type=int, default=12)
    p.add_argument("--finetune_epochs", type=int, default=3)
    p.add_argument("--cr_epochs", type=int, default=2)
    p.add_argument("--froc_threshold", type=float, default=0.3,
                   help="candidate threshold for the FROC stage (the few-epoch\n"
                        "rehearsal model is not saturated; real runs use 0.5)")
    p.add_argument("--n_patches_per_class", type=int, default=300)
    p.add_argument("--skip_data", action="store_true",
                   help="reuse --workdir's existing synthetic data")
    args = p.parse_args(argv)

    from ssl_cr_histo_tpu.cli import consistency, finetune, froc, heatmap, pretrain

    W = args.workdir
    os.makedirs(W, exist_ok=True)
    report = {"config": vars(args), "stages": {}}

    t0 = time.time()
    if not args.skip_data:
        make_pretrain_wsis(os.path.join(W, "wsis"))
        make_camelyon_patches(
            os.path.join(W, "patches"), os.path.join(W, "jsons"),
            n_per_class=args.n_patches_per_class,
        )
        make_heatmap_slide(
            os.path.join(W, "hm_wsi"), os.path.join(W, "hm_mask"),
            os.path.join(W, "hm_gt"),
        )
    report["stages"]["data"] = {"seconds": round(time.time() - t0, 1)}
    print(f"== data ready ({report['stages']['data']['seconds']}s)")

    # ---- stage 1: RSP pretraining, config of record (BASELINE.md:
    # 256^2 tiles, stride 128, batch 64, v1 pool, SGD-Nesterov+Lookahead)
    s1 = os.path.join(W, "stage1")
    t0 = time.time()
    pretrain.main([
        "--train_image_pth", os.path.join(W, "wsis"),
        "--variant", "v1",
        "--tile_h", "256", "--tile_w", "256", "--tile_stride", "128",
        "--batch_size", "64",
        "--num_epoch", str(args.pretrain_epochs),
        "--steps_per_epoch", str(args.pretrain_steps_per_epoch),
        "--validation_size", "64",
        "--save_freq", str(args.pretrain_epochs),
        "--save_dir", s1,
    ])
    dt = time.time() - t0
    rows = _csv_rows(os.path.join(s1, "train_results.csv"))
    n_steps = args.pretrain_epochs * args.pretrain_steps_per_epoch
    report["stages"]["pretrain"] = {
        "seconds": round(dt, 1),
        "epochs": args.pretrain_epochs,
        "steps": n_steps,
        "batch": 64, "tile": 256,
        "train_loss": [r[1] for r in rows],
        "val_loss": [r[3] for r in rows],
        "val_acc": [r[4] for r in rows],
        "aug_patches_per_sec_incl_io": round(n_steps * 64 * 3 / dt, 1),
        "checkpoint": os.path.join(s1, f"ckpt_{args.pretrain_epochs}"),
    }
    gc.collect()
    print(f"== pretrain done ({dt:.0f}s): {report['stages']['pretrain']['train_loss']}")

    # ---- stage 2: Camelyon16 supervised fine-tune (batch 16 PER CLASS,
    # SGD-Nesterov 5e-4, 3-view stack — eval_Camelyon_SSL.py of record)
    s2 = os.path.join(W, "stage2")
    t0 = time.time()
    finetune.main([
        "--task", "camelyon16",
        "--train_path", os.path.join(W, "patches"),
        "--json_path", os.path.join(W, "jsons"),
        "--model_path", report["stages"]["pretrain"]["checkpoint"],
        "--num_epoch", str(args.finetune_epochs),
        "--labeled_train", "1.0",
        "--validation_split", "0.1",
        "--save_dir", s2,
    ])
    dt = time.time() - t0
    rows = _csv_rows(os.path.join(s2, "fine_tuned_results.csv"))
    report["stages"]["finetune"] = {
        "seconds": round(dt, 1),
        "epochs": args.finetune_epochs,
        "labeled_batch_per_step": 32,  # 16 per class
        "train_loss": [r[1] for r in rows],
        "val_err": [r[2] for r in rows],
        "checkpoint": os.path.join(s2, "final"),
    }
    gc.collect()
    print(f"== finetune done ({dt:.0f}s): val_err {report['stages']['finetune']['val_err']}")

    # ---- stage 3: SSL_CR consistency (batch 8/class + mu=7 unlabeled,
    # NAug=7, lambda_u=1 — eval_Camelyon_SSL_CR.py of record)
    s3 = os.path.join(W, "stage3")
    t0 = time.time()
    consistency.main([
        "--task", "camelyon16",
        "--train_path", os.path.join(W, "patches"),
        "--json_path", os.path.join(W, "jsons"),
        "--finetune_ckpt", os.path.join(s2, "final"),
        "--num_epoch", str(args.cr_epochs),
        "--labeled_train", "0.5",
        "--validation_split", "0.1",
        "--save_dir", s3,
    ])
    dt = time.time() - t0
    rows = _csv_rows(os.path.join(s3, "consistency_results.csv"))
    report["stages"]["consistency"] = {
        "seconds": round(dt, 1),
        "epochs": args.cr_epochs,
        "labeled_batch_per_step": 16,  # 8 per class
        "unlabeled_batch_per_step": 112,  # 8*mu7 per class
        "train_loss": [r[1] for r in rows],
        "sup_loss": [r[2] for r in rows],
        "cons_loss": [r[3] for r in rows],
        "val_err": [r[4] for r in rows],
        "checkpoint": os.path.join(s3, "final"),
    }
    gc.collect()
    print(f"== consistency done ({dt:.0f}s): loss {report['stages']['consistency']['train_loss']}")

    # ---- stage 3b: evaluation mode (reference eval blocks: confusion/
    # sens/spec/F1 + binary AUC, sharded inference)
    t0 = time.time()
    finetune.main([
        "--task", "camelyon16",
        "--mode", "evaluation",
        "--test_path", os.path.join(W, "patches"),
        "--json_path", os.path.join(W, "jsons"),
        "--finetune_ckpt", os.path.join(s3, "final"),
        "--save_dir", s3,
    ])
    ev = json.load(open(os.path.join(s3, "camelyon16_eval.json")))
    report["stages"]["evaluation"] = {
        "seconds": round(time.time() - t0, 1),
        "auc": ev.get("auc"),
        "accuracy": ev.get("accuracy"),
        "weighted_f1": ev.get("weighted_f1"),
    }
    gc.collect()
    print(f"== evaluation done: auc {ev.get('auc')}")

    # ---- stage 4: WSI heatmap inference at 256^2 (test_Camelyon16.py)
    hm_out = os.path.join(W, "probs")
    t0 = time.time()
    heatmap.main([
        "--test_image_pth", os.path.join(W, "hm_wsi"),
        "--test_mask_pth", os.path.join(W, "hm_mask"),
        "--probs_map_path", hm_out,
        "--finetune_ckpt", os.path.join(s3, "final"),
    ])
    dt = time.time() - t0
    pm = np.load(os.path.join(hm_out, "t1.npy"))
    pm_n = np.load(os.path.join(hm_out, "n1.npy"))
    gt = np.load(os.path.join(W, "hm_gt", "t1.npy"))
    tissue = np.load(os.path.join(W, "hm_mask", "t1_mask.npy"))
    tumor_mean = float(pm[gt > 0].mean())
    normal_mean = float(pm[(gt == 0) & tissue].mean())
    n_patches = 2 * int(tissue.sum())
    report["stages"]["heatmap"] = {
        "seconds": round(dt, 1),
        "grid": list(pm.shape),
        "slides": 2,
        "patches": n_patches,
        "patches_per_sec_incl_io": round(n_patches / dt, 1),
        "tumor_region_mean_prob": round(tumor_mean, 4),
        "normal_region_mean_prob": round(normal_mean, 4),
        "normal_slide_mean_prob": round(float(pm_n[tissue].mean()), 4),
        "artifacts": sorted(os.listdir(hm_out)),
    }
    gc.collect()
    print(f"== heatmap done ({dt:.0f}s): tumor {tumor_mean:.3f} vs normal {normal_mean:.3f}")

    # ---- stage 5: official-protocol FROC over the map
    froc_out = os.path.join(W, "froc.json")
    t0 = time.time()
    froc.main([
        "--probs_map_path", hm_out,
        "--gt_path", os.path.join(W, "hm_gt"),
        "--threshold", str(args.froc_threshold),
        "--itc_um", "275", "--mask_mpp", "64",  # 0.25 um/px * 256 downsample
        "--out", froc_out,
    ])
    fr = json.load(open(froc_out))
    report["stages"]["froc"] = {
        "seconds": round(time.time() - t0, 1),
        "froc": fr["froc"],
        "sens_at_fp": fr["sens_at_fp"],
        "total_lesions": fr["total_lesions"],
    }

    report["total_seconds"] = round(sum(s["seconds"] for s in report["stages"].values()), 1)
    import jax

    report["platform"] = str(jax.devices()[0])
    report["notes"] = (
        "Stage seconds include one-time jitted-program loads over the axon "
        "tunnel (~30-60s per distinct program even on persistent-cache "
        "hits) and H2D at ~31 MB/s — both dev-tunnel artifacts, absent on "
        "real hosts.  Steady-state pretrain epochs run in ~30s here "
        "(printed per-epoch); see PERF.md for clean step timings."
    )
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"== rehearsal complete in {report['total_seconds']}s -> {args.out}")
    return report


if __name__ == "__main__":
    main()
