"""Teacher/student consistency training (SSL_CR stage 3) CLI — one entry
point for eval_{BreastPathQ,Camelyon,Kather}_SSL_CR.py via --task.

Config of record (BASELINE.md): mu=7 unlabeled batch multiplier, NAug=7,
lambda_u=1, teacher <- student refresh each epoch
(eval_Kather_SSL_CR.py:582-583); teacher fully frozen, student frozen below
--modules_student (reference eval_BreastPathQ_SSL_CR.py:405-441)."""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ssl_cr_histo_tpu.cli.common import (
    TASKS,
    add_common_args,
    make_optimizer,
    model_dtype,
    seed_everything,
)
from ssl_cr_histo_tpu.cli.finetune import validate
from ssl_cr_histo_tpu.data import datasets as D
from ssl_cr_histo_tpu.data.pipeline import prefetch_to_device
from ssl_cr_histo_tpu.eval import metrics as M
from ssl_cr_histo_tpu.models import FinetuneHead, TripletNet
from ssl_cr_histo_tpu.parallel import batch_sharding, make_mesh
from ssl_cr_histo_tpu.parallel import steps as S
from ssl_cr_histo_tpu.train import optim
from ssl_cr_histo_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from ssl_cr_histo_tpu.train.freeze import masked_optimizer
from ssl_cr_histo_tpu.train.init import init_triplet_state
from ssl_cr_histo_tpu.train.loop import BestTracker, CsvLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser("SSL_CR consistency training (TPU)")
    p.add_argument("--task", required=True, choices=list(TASKS))
    p.add_argument("--train_path", required=True)
    p.add_argument("--json_path", default="")
    p.add_argument("--finetune_ckpt", required=True,
                   help="stage-2 checkpoint initializing BOTH teacher and student "
                        "(reference eval_BreastPathQ_SSL_CR.py:391-402)")
    p.add_argument("--mu", type=int, default=7, help="unlabeled batch multiplier")
    p.add_argument("--NAug", type=int, default=7)
    p.add_argument("--lambda_u", type=float, default=1.0)
    p.add_argument("--modules_student", type=int, default=60)
    p.add_argument("--labeled_train", type=float, default=0.1)
    p.add_argument("--validation_split", type=float, default=0.1)
    p.add_argument("--num_epoch", type=int, default=90)
    p.add_argument("--batch_size", type=int, default=0)
    p.add_argument("--lr", type=float, default=0.0)
    p.add_argument("--ema", type=float, default=0.0,
                   help=">0 enables EMA teacher instead of per-epoch refresh "
                        "(non-reference option)")
    add_common_args(p)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = TASKS[args.task]
    key = seed_everything(args.seed)
    mesh = make_mesh()
    sharding = batch_sharding(mesh)
    batch_size = args.batch_size or cfg.batch_size

    # Data: labeled fraction for supervision; the FULL train split is the
    # unlabeled pool (reference uses the task's unlabeled data with
    # TransformFix — eval_Kather_SSL_CR.py:321-349).
    if cfg.name == "breastpathq":
        ds = D.load_breastpathq_h5(args.train_path, cfg.image_size)
    elif cfg.name == "camelyon16":
        ds = D.load_camelyon16_patches(args.train_path, args.json_path, cfg.image_size)
    else:
        ds = D.load_kather_folder(args.train_path, cfg.image_size)
    train, val = D.train_val_split(ds, args.validation_split, seed=args.seed)
    labeled = D.labeled_fraction(train, args.labeled_train, seed=args.seed)
    print(f"==> {len(labeled)} labeled / {len(train)} unlabeled / {len(val)} val")

    model = TripletNet(args.model, dtype=model_dtype(args))
    head = FinetuneHead(num_classes=cfg.num_classes)
    lr = args.lr or cfg.lr
    n_steps = max(len(labeled) // batch_size, 1)
    sched = optim.multistep_schedule(lr, [m * n_steps for m in cfg.milestones], cfg.gamma)
    base_tx = make_optimizer(cfg.optimizer, sched)

    state = init_triplet_state(
        model, head, base_tx, key, image_size=cfg.image_size, triplet=False
    )
    tx = masked_optimizer(base_tx, state.params, args.modules_student, args.model)
    state = state.replace(opt_state=tx.init(state.params))
    state, _ = restore_checkpoint(args.finetune_ckpt, state)
    state = state.replace(opt_state=tx.init(state.params))  # fresh optimizer

    teacher_params, teacher_stats = S.refresh_teacher(state)
    step = S.make_consistency_step(
        model, head, tx, task=cfg.task, lambda_u=args.lambda_u, n_aug=args.NAug,
        aug_mode=args.aug_mode,
    )
    val_forward = S.make_forward_fn(model, head)

    os.makedirs(args.save_dir, exist_ok=True)
    log = CsvLogger(
        os.path.join(args.save_dir, "consistency_results.csv"),
        "epoch, train_loss, sup_loss, cons_loss, val_metric",
    )
    best = BestTracker(args.save_dir, mode="min")

    for epoch in range(1, args.num_epoch + 1):
        t0 = time.time()
        tl, sl, cl = M.AverageMeter(), M.AverageMeter(), M.AverageMeter()
        if cfg.name == "camelyon16":
            # balanced tumor/normal labeled batches (reference's 4 zipped
            # loaders, eval_Camelyon_SSL_CR.py:53-101)
            from ssl_cr_histo_tpu.data.pipeline import balanced_batch_iterator

            lab_it = balanced_batch_iterator(
                labeled.images, labeled.labels, batch_size, seed=args.seed + epoch
            )
        else:
            lab_it = labeled.batches(batch_size, seed=args.seed + epoch)
        unlab_it = (
            (imgs,) for imgs, _ in train.batches(
                batch_size * args.mu, seed=1000 + args.seed + epoch
            )
        )
        key, ek = jax.random.split(key)
        # epoch length = min(len(labeled), len(unlabeled)) batches
        # (reference zip(), eval_Kather_SSL_CR.py:50)
        for (x_l, y_l), (x_u,) in zip(
            prefetch_to_device(lab_it, sharding=sharding),
            prefetch_to_device(unlab_it, sharding=sharding),
        ):
            ek, sk = jax.random.split(ek)
            state, m = step(
                state, teacher_params, teacher_stats, x_l, jnp.asarray(y_l), x_u, sk
            )
            tl.update(float(m["loss"]), len(y_l))
            sl.update(float(m["sup"]), len(y_l))
            cl.update(float(m["cons"]), len(y_l))
            if args.ema > 0:
                teacher_params = S.ema_update(teacher_params, state.params, args.ema)

        if args.ema == 0:
            teacher_params, teacher_stats = S.refresh_teacher(state)

        val_metric = validate(cfg, state, val, val_forward, batch_size)
        log.append(epoch, tl.avg, sl.avg, cl.avg, val_metric)
        print(
            f"epoch {epoch}: loss {tl.avg:.4f} (sup {sl.avg:.4f} cons {cl.avg:.4f}) "
            f"val {val_metric:.4f} ({time.time() - t0:.1f}s)"
        )
        meta = {"epoch": epoch, "args": vars(args), "val_metric": val_metric}
        if best.update(val_metric, epoch, state, meta):
            print(f"==> new best {val_metric:.4f}")
    save_checkpoint(os.path.join(args.save_dir, "final"), state, {"epoch": args.num_epoch})
    # The reference checkpoints both teacher and student state_dicts
    # (eval_BreastPathQ_SSL_CR.py:519-533).  With per-epoch refresh the
    # teacher equals the student; under --ema it differs, so persist it.
    if args.ema > 0:
        teacher_state = state.replace(
            params=teacher_params, batch_stats=teacher_stats
        )
        save_checkpoint(
            os.path.join(args.save_dir, "final_teacher"), teacher_state,
            {"epoch": args.num_epoch, "role": "teacher"},
        )


if __name__ == "__main__":
    main()
