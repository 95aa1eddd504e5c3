"""Shared CLI plumbing: seeding, mesh setup, optimizer factory, task
configs matching the reference's hyperparameters of record (BASELINE.md)."""

from __future__ import annotations

import argparse
import dataclasses
import os
import random
from typing import Optional

import jax
import numpy as np


@dataclasses.dataclass
class TaskConfig:
    """Per-dataset fine-tune/CR config of record."""

    name: str
    num_classes: int
    task: str  # 'classification' | 'regression'
    image_size: int
    batch_size: int
    optimizer: str
    lr: float
    milestones: tuple = (30, 60)
    gamma: float = 0.1
    epochs: int = 90
    # The reference's CR drivers default to smaller batches than the SSL
    # ones (eval_*_SSL_CR.py --batch_size: BPQ 4, Camelyon 8, Kather 8);
    # 0 = same as batch_size.
    cr_batch_size: int = 0

    @property
    def cr_batch(self) -> int:
        return self.cr_batch_size or self.batch_size

    def rows_per_step(self, batch_size: int) -> int:
        """Rows that actually flow through a train step at this batch
        setting: Camelyon16's balanced iterator draws `batch_size` PER
        CLASS (data.pipeline.balanced_batch_iterator), so 2x flows; other
        tasks ship batch_size.  Meshes and validation padding must be
        sized from THIS, not the flag value."""
        return 2 * batch_size if self.name == "camelyon16" else batch_size


TASKS = {
    # eval_BreastPathQ_SSL.py:234-241: Adam 1e-4, batch 4, MSE head
    "breastpathq": TaskConfig("breastpathq", 1, "regression", 256, 4, "adam", 1e-4),
    # eval_Camelyon_SSL.py:205-211: SGD-Nesterov 5e-4, batch 16 per class,
    # 2-way CE; CR batch 8 (eval_Camelyon_SSL_CR.py:247)
    "camelyon16": TaskConfig("camelyon16", 2, "classification", 256, 16, "sgd", 5e-4,
                             cr_batch_size=8),
    # eval_Kather_SSL.py:231-238: Adam 1e-5, batch 64, 9-way CE; CR batch 8
    # (eval_Kather_SSL_CR.py:267)
    "kather": TaskConfig("kather", 9, "classification", 224, 64, "adam", 1e-5,
                         cr_batch_size=8),
}


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Persistent XLA compilation cache (cold compiles of the fused train
    steps take minutes; cached reruns skip them).

    TPU/accelerator backends only: XLA:CPU's cached AOT results embed
    machine-feature flags the loader then rejects against the same host
    ("+prefer-no-scatter is not supported ..."), and the half-loaded
    executables crash collective participant threads (a rendezvous abort
    after 40 s).  CPU compiles are cheap; skip the cache there."""
    if jax.default_backend() == "cpu":
        return
    cache_dir = cache_dir or os.path.expanduser("~/.cache/ssl_cr_histo_tpu_xla")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def seed_everything(seed: int) -> jax.Array:
    """Per-CLI setup: multi-host init (no-op single-process), RNG seeding,
    and the persistent compile cache.  Every entry point calls this first,
    so `distributed.initialize()` runs before any backend-initializing jax
    call — the requirement for pod launches (SURVEY §2.2 DP plan; reference
    equivalent: the DataParallel wrap, pretrain_BreastPathQ.py:231-233)."""
    from ssl_cr_histo_tpu.parallel.distributed import initialize

    initialize()
    random.seed(seed)
    np.random.seed(seed)
    enable_compilation_cache()
    return jax.random.PRNGKey(seed)


def make_optimizer(kind: str, lr_schedule, weight_decay: float = 1e-4):
    """weight_decay defaults to the reference's 1e-4 for BOTH optimizers
    (every eval script passes --weight_decay 1e-4 into torch Adam/SGD as
    L2-added-to-grad, e.g. eval_BreastPathQ_SSL.py:396-397,
    eval_Camelyon_SSL.py:371); our adam/sgd_nesterov reproduce that
    pre-update L2 semantics, not decoupled AdamW."""
    from ssl_cr_histo_tpu.train import optim

    if kind == "sgd":
        return optim.sgd_nesterov(lr_schedule, momentum=0.9, weight_decay=weight_decay)
    if kind == "adam":
        return optim.adam(lr_schedule, weight_decay=weight_decay)
    raise ValueError(f"unknown optimizer {kind}")


def add_common_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--model", default="resnet18", choices=["resnet18", "resnet50"])
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--save_dir", default="./runs")
    parser.add_argument("--print_freq", type=int, default=100)
    parser.add_argument("--bf16", action="store_true", default=True,
                        help="bfloat16 backbone compute (params stay f32)")
    parser.add_argument("--no-bf16", dest="bf16", action="store_false")
    parser.add_argument(
        "--remat", action="store_true",
        help="rematerialize backbone blocks on backward (jax.checkpoint): "
             "~30%% more FLOPs for O(depth) less activation HBM — fits "
             "larger per-chip batches (e.g. resnet50 batch 128 at 256^2)",
    )
    parser.add_argument(
        "--aug_mode", default="fused", choices=["fused", "fast", "masked", "exact"],
        help="fused = single-warp TPU fast path; fast = batch-shared strong "
             "op sequence (CR); masked = per-image masked strong pool (CR; "
             "presence-exact, canonical order); exact = op-by-op reference "
             "semantics",
    )
    parser.add_argument(
        "--photometric", default="auto", choices=["auto", "xla", "pallas"],
        help="photometric-chain backend in fused mode (pallas = VMEM-resident "
             "kernel, TPU only; auto = pallas on TPU backends, xla elsewhere "
             "— the shipped default IS the benchmarked config)",
    )
    parser.add_argument(
        "--image_size", type=int, default=0,
        help="override the task's input resolution (0 = task default; the "
             "reference hard-codes 256/224 per task)",
    )
    parser.add_argument(
        "--reference_exact", action="store_true",
        help="strict-parity preset: flip EVERY ledgered deviation default "
             "back to the reference's behavior in one flag (per-view BN, "
             "with-replacement subsampling, eager x6 orderings, op-by-op "
             "exact augmentation, f32 compute — see REFERENCE_EXACT_PRESET "
             "and docs/MIGRATION.md). Overrides the individual flags; pass "
             "it for reproduction/parity runs, not for production throughput",
    )


# The strict-parity preset of record.  One entry per LEDGERED deviation
# default that has a restoring flag (PARITY.md C15-C17 deviation rows +
# docs/MIGRATION.md "Behavioral deviations"); tests/test_cli_defaults.py
# cross-checks this table against the docs so a future deviation flag
# cannot be added without joining the preset.  Keys are argparse dests.
#
#   joint_encode=False    — reference per-view BN statistics
#                           (pretrain_BreastPathQ.py:95-148 forward x3;
#                           MIGRATION.md: `--no_joint_encode` restores)
#   expand_orderings=True — eager x6 ordering expansion per epoch
#                           (dataset.py:27-70; default samples 1/step)
#   with_replacement=True — np.random.choice labeled subsampling incl. the
#                           bootstrap at fraction 1.0
#                           (eval_BreastPathQ_SSL.py:299)
#   aug_mode="exact"      — op-by-op reference augmentation sequencing (the
#                           fused/fast paths are law-exact but reorder the
#                           arithmetic)
#   photometric="xla"     — keep exact mode off the Pallas kernel path
#   bf16=False            — the reference trains in f32 (torch CUDA f32);
#                           bf16 is parity-neutral statistically but not
#                           bitwise
#
# NOT in the preset (documented exclusions, asserted by the test):
#   seed     — RNG parity with torch is impossible regardless of the seed
#              value (different generators/draw orders); the v2 reference's
#              seed=1 is documented in MIGRATION.md for manual use.
#   deviations without a flag — complete-val-set Camelyon16 validation,
#              aligned weak/strong CR pairs, fixed reference defects
#              (PARITY.md known-defect ledger): no flag exists, by design.
REFERENCE_EXACT_PRESET = {
    "common": {"bf16": False, "aug_mode": "exact", "photometric": "xla"},
    "pretrain": {"joint_encode": False, "expand_orderings": True},
    "finetune": {"with_replacement": True},
    "consistency": {"with_replacement": True},
}


def apply_reference_exact(args, stage: str):
    """Resolve ``--reference_exact`` for a stage CLI (call straight after
    parse_args, before any flag is read).  The preset OVERRIDES the
    individual flags — strictness must not depend on remembering which of
    the ~6 deviation flags to also pass (that failure mode is the point of
    the preset)."""
    if not getattr(args, "reference_exact", False):
        return args
    overrides = {**REFERENCE_EXACT_PRESET["common"],
                 **REFERENCE_EXACT_PRESET.get(stage, {})}
    for dest, value in overrides.items():
        if hasattr(args, dest):
            setattr(args, dest, value)
    return args


def resolve_photometric(args) -> str:
    """Resolve --photometric 'auto': the Pallas/Mosaic kernel on TPU
    devices only (Mosaic lowers nowhere else — not CPU, not GPU), plain XLA
    everywhere else.  Called after seed_everything so the backend is
    already initialized."""
    if getattr(args, "photometric", "auto") == "auto":
        d = jax.devices()[0]
        is_tpu = d.platform == "tpu" or "TPU" in getattr(d, "device_kind", "")
        args.photometric = "pallas" if is_tpu else "xla"
    return args.photometric


def apply_task_overrides(args, cfg: TaskConfig) -> TaskConfig:
    """Fold CLI overrides into the task config of record."""
    if getattr(args, "image_size", 0):
        cfg = dataclasses.replace(cfg, image_size=args.image_size)
    return cfg


def model_dtype(args):
    import jax.numpy as jnp

    return jnp.bfloat16 if args.bf16 else jnp.float32


def balanced_epoch_len(labels, batch_size: int, clamp: bool = True) -> int:
    """Steps per epoch of the balanced binary iterator: the smaller pool's
    per-pool batch count (data.pipeline.balanced_batch_iterator draws
    `batch_size` from EACH pool per step) — the epoch length LR milestones
    must be computed from for Camelyon16.  Pass `datasets.grouping_key(ds)`
    (source-dir pools when available, labels otherwise) so the count matches
    the iterator's pools.  clamp=False returns the true count (possibly 0)
    for empty-epoch detection.

    Raises SystemExit upfront when the key has != 2 pools: the balanced
    iterator would reject it mid-epoch otherwise (after load + compile),
    e.g. a --train_path of 3+ comma-joined dirs."""
    import numpy as np

    _, counts = np.unique(np.asarray(labels, dtype=np.int64), return_counts=True)
    if len(counts) != 2:
        raise SystemExit(
            f"Camelyon16 balanced batching needs exactly two pools (tumor + "
            f"normal source dirs, or binary polygon labels); got "
            f"{len(counts)} — for multi-dir layouts pass exactly two "
            f"comma-joined patch dirs; for single-dir layouts the polygon "
            f"labels (after any --labeled_train subsample) must contain both "
            f"classes"
        )
    n = int(counts.min()) // max(batch_size, 1)
    return max(n, 1) if clamp else n


def resume_training(args, state, best, key):
    """Shared --resume handling for the stage CLIs: resolve 'auto', restore
    the state/epoch/best-val, and advance the per-epoch key chain so
    augmentation randomness continues where the interrupted run left off.

    Returns (state, start_epoch, key, resume_path); resume_path is "" when
    not resuming (reference eval_Kather_SSL.py:427-442).
    """
    from ssl_cr_histo_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint

    start_epoch = 1
    resume_path = args.resume
    if resume_path == "auto":
        resume_path = latest_checkpoint(args.save_dir) or ""
    if resume_path:
        state, rmeta = restore_checkpoint(resume_path, state)
        start_epoch = int(rmeta.get("epoch", 0)) + 1
        # periodic ckpt_N metas persist best_val; the 'best' checkpoint's own
        # meta carries it as best/best_val; old final metas may have neither
        # but do carry this epoch's val_metric as a lower bound
        bv = rmeta.get("best_val", rmeta.get("best", rmeta.get("val_metric")))
        if bv is not None:
            best.restore(float(bv))
        for _ in range(start_epoch - 1):
            key, _ = jax.random.split(key)
        print(f"==> resumed from {resume_path} (epoch {start_epoch - 1})")
    return state, start_epoch, key, resume_path


def chunked_feed(it, mesh, k: int, n_arrays: int = 1):
    """Multi-step feed shared by the stage CLIs: stack K batches per chunk
    (``data.pipeline.chunk_batches``) and prefetch them to the mesh with
    chunk sharding on each of the ``n_arrays`` batch arrays and the (K,)
    validity mask replicated.  Yields (chunk, valid)."""
    from ssl_cr_histo_tpu.data.pipeline import chunk_batches, prefetch_to_device
    from ssl_cr_histo_tpu.parallel import chunk_sharding, replicated_sharding

    csh, rsh = chunk_sharding(mesh), replicated_sharding(mesh)
    data_sh = csh if n_arrays == 1 else tuple([csh] * n_arrays)
    return prefetch_to_device(chunk_batches(it, k), sharding=(data_sh, rsh))
