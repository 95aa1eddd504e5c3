"""Benchmark: end-to-end RSP pretraining step throughput on one TPU chip.

Measures the FULL jitted train step at the reference config of record
(BASELINE.md: 256x256 tiles, batch 64 triplets, v1 augmentation pool,
SGD-Nesterov lr 0.01 + weight decay): on-device augmentation + permutation
sampling + triple-ResNet18 forward/backward + optimizer update.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline compares against the reference pipeline's augmentation-bound
throughput measured by tools/measure_reference_baseline.py (BASELINE_LOCAL.
json — a faithful CPU transcription of the reference aug pool scaled by its
8 DataLoader workers; the reference GPUs idle waiting on augmentation, so
this is its end-to-end rate).  Falls back to a pinned value if absent.

`measure_pretrain` is the measurement of record — tools/bench_suite.py
imports it rather than re-implementing it, so BENCH_SUITE.json's pretrain
number cannot drift from the driver-guarded one.
"""

from __future__ import annotations

import gc
import json
import os
import time

FALLBACK_BASELINE_PPS = 147.8  # measured 2026-08-16 on this host, see tools/


def _enable_compilation_cache():
    """Persistent XLA compilation cache — cold-start compiles of the full
    step take 1-3 minutes on the tunnel; cached reruns skip them."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def measure_pretrain(iters: int = 3):
    """Pretrain-step throughput at the reference config of record.

    Execution mode == the pretrain CLI's SHIPPED defaults (cli.pretrain:
    --photometric auto -> pallas on TPU, --joint_encode on by default,
    --multi_step 8: 8 train steps per device dispatch, amortizing host
    dispatch latency like the CLI's chunked feed), so this measures what
    `python -m ssl_cr_histo_tpu.cli.pretrain` actually runs.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl_cr_histo_tpu.models import Classifier, TripletNet
    from ssl_cr_histo_tpu.parallel import steps as S
    from ssl_cr_histo_tpu.train import optim
    from ssl_cr_histo_tpu.train.init import init_triplet_state

    batch_size = 64
    tile = 256
    rng = np.random.default_rng(0)
    tiles = (rng.random((batch_size, 3, tile, tile, 3)) * 255).astype(np.uint8)
    tiles = jnp.asarray(tiles)

    model = TripletNet("resnet18", dtype=jnp.bfloat16)
    clf = Classifier(num_classes=6)
    tx = optim.sgd_nesterov(0.01, momentum=0.9, weight_decay=1e-4)
    state = init_triplet_state(model, clf, tx, jax.random.PRNGKey(0), image_size=tile)
    k_steps = 8
    multi = S.make_pretrain_multi_step(
        model, clf, tx, augment="v1", photometric="pallas", joint_encode=True
    )
    tiles_k = jnp.broadcast_to(tiles, (k_steps, *tiles.shape))
    valid = jnp.ones((k_steps,), jnp.float32)

    # compile + warmup.  NOTE: block_until_ready does not reliably
    # synchronize on the axon tunnel platform; a scalar device->host fetch
    # is the only hard sync.  The timed loop chains steps through the state
    # data dependency and fetches ONCE at the end — the final fetch cannot
    # complete until every step has executed, and this matches how training
    # actually runs (no per-step host sync).
    state, metrics = multi(state, tiles_k, jax.random.PRNGKey(0), valid)
    float(metrics["loss"][-1])

    t0 = time.time()
    for i in range(iters):
        state, metrics = multi(state, tiles_k, jax.random.PRNGKey(i + 1), valid)
    final_loss = float(metrics["loss"][-1])  # hard sync of the whole chain
    dt = (time.time() - t0) / (iters * k_steps)
    assert final_loss == final_loss, "loss is NaN"

    del state, metrics, multi, tiles, tiles_k
    gc.collect()  # free device buffers before any follow-on benchmark
    return {
        "metric": "rsp_pretrain_aug_patches_per_sec_per_chip",
        "value": round(batch_size * 3 / dt, 1),
        "unit": "patches/s/chip",
        "ms_per_step": round(dt * 1000, 2),
        "config": "256^2 b=64 v1-pallas joint multi_step=8 bf16 (CLI defaults)",
    }


def main():
    _enable_compilation_cache()

    r = measure_pretrain()
    value = r["value"]

    baseline = FALLBACK_BASELINE_PPS
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_LOCAL.json")
    if os.path.exists(path):
        with open(path) as f:
            baseline = float(json.load(f)["reference_aug_patches_per_sec"])

    out = {
        "metric": r["metric"],
        "value": value,
        "unit": r["unit"],
        "vs_baseline": round(value / baseline, 2),
    }
    # Regression visibility: also report the delta vs the COMMITTED
    # BENCH_SUITE.json pretrain figure (tools/bench_suite.py guard-bands the
    # full suite; this surfaces the same signal on the driver's one line).
    suite = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_SUITE.json")
    if os.path.exists(suite):
        with open(suite) as f:
            committed = {e["metric"]: e["value"]
                         for e in json.load(f).get("results", [])}
        if committed.get(r["metric"]):
            out["vs_committed"] = round(value / committed[r["metric"]], 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
