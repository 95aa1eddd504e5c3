"""Capture a jax.profiler trace of a compiled train step.

Builds the requested stage's step at a given config, warms the compile,
then traces a few steady-state dispatches into --logdir (view with
TensorBoard / xprof).  The device-op breakdown in PERF.md comes from
exactly this kind of capture.

    python tools/profile_step.py --stage pretrain --batch_size 64 \
        --logdir /tmp/trace
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser("train-step trace capture")
    p.add_argument("--stage", default="pretrain",
                   choices=["pretrain", "finetune", "consistency"])
    p.add_argument("--logdir", required=True)
    p.add_argument("--model", default="resnet18")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--mu", type=int, default=7, help="consistency unlabeled multiplier")
    p.add_argument("--steps", type=int, default=3, help="traced dispatches")
    p.add_argument("--aug_mode", default="fused")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ssl_cr_histo_tpu.models import Classifier, FinetuneHead, TripletNet
    from ssl_cr_histo_tpu.parallel import steps as S
    from ssl_cr_histo_tpu.train import optim
    from ssl_cr_histo_tpu.train.init import init_triplet_state
    from ssl_cr_histo_tpu.utils.profiling import trace

    b, size = args.batch_size, args.image_size
    rng = np.random.default_rng(0)
    model = TripletNet(args.model, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(1)

    if args.stage == "pretrain":
        head = Classifier(num_classes=6)
        tx = optim.sgd_nesterov(0.01)
        state = init_triplet_state(model, head, tx, jax.random.PRNGKey(0), image_size=size)
        step = S.make_pretrain_step(
            model, head, tx, augment="v1", aug_mode=args.aug_mode, joint_encode=True
        )
        tiles = jax.device_put((rng.random((b, 3, size, size, 3)) * 255).astype(np.uint8))
        run = lambda st: step(st, tiles, key)
    elif args.stage == "finetune":
        head = FinetuneHead(num_classes=9)
        tx = optim.adam(1e-4)
        state = init_triplet_state(
            model, head, tx, jax.random.PRNGKey(0), image_size=size, triplet=False
        )
        step = S.make_finetune_step(model, head, tx, task="classification")
        imgs = jax.device_put((rng.random((b, size, size, 3)) * 255).astype(np.uint8))
        labels = jax.device_put((np.arange(b) % 9).astype(np.int32))
        run = lambda st: step(st, imgs, labels, key)
    else:
        head = FinetuneHead(num_classes=2)
        tx = optim.sgd_nesterov(5e-4)
        state = init_triplet_state(
            model, head, tx, jax.random.PRNGKey(0), image_size=size, triplet=False
        )
        tp, ts = S.refresh_teacher(state)
        step = S.make_consistency_step(
            model, head, tx, task="classification", n_aug=7,
            aug_mode=args.aug_mode, donate=False,
        )
        xl = jax.device_put((rng.random((b, size, size, 3)) * 255).astype(np.uint8))
        yl = jax.device_put((np.arange(b) % 2).astype(np.int32))
        xu = jax.device_put(
            (rng.random((b * args.mu, size, size, 3)) * 255).astype(np.uint8)
        )
        run = lambda st: step(st, tp, ts, xl, yl, xu, key)

    # compile + warm (the first dispatch would otherwise dominate the trace)
    state, m = run(state)
    float(m["loss"])

    t0 = time.perf_counter()
    with trace(args.logdir):
        for _ in range(args.steps):
            state, m = run(state)
        float(m["loss"])  # hard sync inside the capture window
    dt = (time.perf_counter() - t0) / args.steps
    print(f"traced {args.steps} {args.stage} steps ({dt * 1000:.1f} ms/step) -> {args.logdir}")


if __name__ == "__main__":
    main()
