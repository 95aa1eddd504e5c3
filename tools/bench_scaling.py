"""Throughput scaling study: RSP pretrain step vs batch size and backbone.

The headline bench (bench.py) pins the reference config of record (batch 64,
resnet18).  This tool measures how the step scales when the per-chip batch
grows (better MXU/HBM amortization) and for the resnet50 backbone, to guide
production batch sizing.  Run directly, or through tools/tpu_job_worker.py.

Output: one line per config — batch, backbone, ms/step, patches/s/chip.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def measure(model_name: str, batch_size: int, k_steps: int = 4, iters: int = 3,
            tile: int = 256) -> dict:
    from ssl_cr_histo_tpu.models import Classifier, TripletNet
    from ssl_cr_histo_tpu.parallel import steps as S
    from ssl_cr_histo_tpu.train import optim
    from ssl_cr_histo_tpu.train.init import init_triplet_state

    rng = np.random.default_rng(0)
    tiles = (rng.random((batch_size, 3, tile, tile, 3)) * 255).astype(np.uint8)
    tiles_k = jnp.broadcast_to(jnp.asarray(tiles), (k_steps, batch_size, 3, tile, tile, 3))
    valid = jnp.ones((k_steps,), jnp.float32)

    model = TripletNet(model_name, dtype=jnp.bfloat16)
    clf = Classifier(num_classes=6)
    tx = optim.sgd_nesterov(0.01, momentum=0.9, weight_decay=1e-4)
    state = init_triplet_state(model, clf, tx, jax.random.PRNGKey(0), image_size=tile)
    multi = S.make_pretrain_multi_step(
        model, clf, tx, augment="v1", photometric="pallas", joint_encode=True
    )

    state, m = multi(state, tiles_k, jax.random.PRNGKey(0), valid)
    float(m["loss"][-1])  # hard sync (block_until_ready lies on the tunnel)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = multi(state, tiles_k, jax.random.PRNGKey(i + 1), valid)
    float(m["loss"][-1])
    dt = (time.perf_counter() - t0) / (iters * k_steps)
    return {
        "model": model_name,
        "batch": batch_size,
        "ms_per_step": round(dt * 1000, 1),
        "patches_per_sec": round(batch_size * 3 / dt, 0),
    }


CONFIGS = (
    ("resnet18", 64),
    ("resnet18", 128),
    ("resnet18", 256),
    ("resnet50", 64),
    ("resnet50", 128),
)


def main():
    # Each config runs in a FRESH subprocess: once a process OOMs the axon
    # device, every later allocation in it fails (CLAUDE.md) — continuing
    # in-process after one OOM would report bogus FAILED rows for configs
    # that actually fit.
    import os
    import subprocess
    import sys

    for model_name, batch in CONFIGS:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", model_name, str(batch)],
            capture_output=True, text=True,
        )
        line = (p.stdout.strip().splitlines() or [""])[-1]
        if p.returncode != 0:
            err = (p.stderr.strip().splitlines() or ["?"])[-1]
            print(f"{model_name} b={batch}: FAILED ({err})")
        else:
            print(line)


def one(model_name: str, batch: int) -> None:
    r = measure(model_name, batch)
    print(
        f"{r['model']} b={r['batch']}: {r['ms_per_step']} ms/step, "
        f"{r['patches_per_sec']:.0f} patches/s/chip"
    )


if __name__ == "__main__":
    import sys

    if len(sys.argv) == 4 and sys.argv[1] == "--one":
        one(sys.argv[2], int(sys.argv[3]))
    else:
        main()
