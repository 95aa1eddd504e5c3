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
    chunked_feed,
    TASKS,
    add_common_args,
    apply_reference_exact,
    apply_task_overrides,
    balanced_epoch_len,
    make_optimizer,
    model_dtype,
    resume_training,
    seed_everything,
)
from ssl_cr_histo_tpu.cli.finetune import load_train_val, subsample_labeled, validate
from ssl_cr_histo_tpu.data import datasets as D
from ssl_cr_histo_tpu.data.pipeline import prefetch_to_device
from ssl_cr_histo_tpu.eval import metrics as M
from ssl_cr_histo_tpu.models import FinetuneHead, TripletNet
from ssl_cr_histo_tpu.parallel import batch_sharding, mesh_for_batch
from ssl_cr_histo_tpu.parallel import steps as S
from ssl_cr_histo_tpu.train import optim
from ssl_cr_histo_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from ssl_cr_histo_tpu.train.freeze import masked_optimizer
from ssl_cr_histo_tpu.train.init import init_triplet_state
from ssl_cr_histo_tpu.train.loop import BestTracker, CsvLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser("SSL_CR consistency training (TPU)")
    p.add_argument("--task", required=True, choices=list(TASKS))
    p.add_argument("--mode", default="fine-tuning", choices=["fine-tuning", "evaluation"])
    p.add_argument("--train_path", default="",
                   help="train data dir; Camelyon16 takes exactly TWO "
                        "comma-joined patch dirs (the reference's tumor + "
                        "normal layout, eval_Camelyon_SSL_CR.py:270-271) or "
                        "one dir with polygon labels")
    p.add_argument("--json_path", default="")
    p.add_argument("--val_path", default="",
                   help="explicit validation data dir(s); when set the whole "
                        "--train_path trains (and is the unlabeled pool) and "
                        "--validation_split is ignored (reference "
                        "eval_Camelyon_SSL_CR.py:275-277 PATCHES_*_VALID)")
    p.add_argument("--val_json_path", default="",
                   help="annotation JSON dir for --val_path (reference "
                        "--json_val_pth); defaults to --json_path")
    p.add_argument("--with_replacement", action="store_true",
                   help="reproduce the reference's labeled subsampling "
                        "with replacement (eval_Kather_SSL_CR.py:333)")
    p.add_argument("--test_path", default="", help="eval data dir (mode=evaluation)")
    p.add_argument("--test_path_b", default="", help="BreastPathQ second-rater dir")
    p.add_argument("--finetune_ckpt", default="",
                   help="stage-2 checkpoint initializing BOTH teacher and student "
                        "(reference eval_BreastPathQ_SSL_CR.py:391-402)")
    p.add_argument("--eval_ckpt", default="",
                   help="trained CR checkpoint to evaluate (mode=evaluation, "
                        "reference eval_Kather_SSL_CR.py:643-666)")
    p.add_argument("--mu", type=int, default=7, help="unlabeled batch multiplier")
    p.add_argument("--NAug", type=int, default=7)
    p.add_argument("--lambda_u", type=float, default=1.0)
    p.add_argument("--modules_student", type=int, default=60)
    p.add_argument("--labeled_train", type=float, default=0.1)
    p.add_argument("--labeled_views", type=int, default=3, choices=[1, 3],
                   help="3 = reference Supervised_train 3-view labeled branch "
                        "(eval_Kather_SSL_CR.py:70-79); 1 = raw labeled images "
                        "(non-reference ablation)")
    p.add_argument("--validation_split", type=float, default=0.2)
    p.add_argument("--num_epoch", type=int, default=90)
    p.add_argument("--batch_size", type=int, default=0)
    p.add_argument("--lr", type=float, default=0.0)
    p.add_argument("--weight_decay", type=float, default=1e-4,
                   help="L2 added to grads pre-update (torch semantics), "
                        "reference default 1e-4")
    p.add_argument("--multi_step", type=int, default=8,
                   help="train steps scanned per device dispatch (lax.scan); "
                        "1 = one dispatch per step")
    p.add_argument("--resume", default="",
                   help="checkpoint dir to resume from, or 'auto' for the "
                        "latest ckpt_N under save_dir (reference "
                        "eval_Kather_SSL_CR.py --resume)")
    p.add_argument("--save_freq", type=int, default=10,
                   help="epochs between periodic ckpt_N checkpoints (0 = off)")
    p.add_argument("--ema", type=float, default=0.0,
                   help=">0 enables EMA teacher instead of per-epoch refresh "
                        "(non-reference option; also EMAs BN stats)")
    p.add_argument("--eval_batch_size", type=int, default=64,
                   help="inference batch for per-epoch validation and "
                        "--mode evaluation; the eval mesh is sized to it, "
                        "so on a pod pick a multiple of the device count")
    add_common_args(p)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    apply_reference_exact(args, "consistency")
    cfg = apply_task_overrides(args, TASKS[args.task])
    key = seed_everything(args.seed)
    # CR stage batch defaults differ from the SSL stage's (reference
    # eval_*_SSL_CR.py --batch_size: BPQ 4 / Camelyon 8 / Kather 8)
    batch_size = args.batch_size or cfg.cr_batch
    # (Camelyon16 additionally ships step_rows*mu unlabeled — divisible by
    # anything that divides step_rows)
    step_rows = cfg.rows_per_step(batch_size)
    mesh = mesh_for_batch(step_rows)
    sharding = batch_sharding(mesh)

    model = TripletNet(args.model, dtype=model_dtype(args), remat=args.remat)
    head = FinetuneHead(num_classes=cfg.num_classes)

    if args.mode == "evaluation":
        # Reference CR scripts have their own --mode evaluation with the
        # task's test metrics incl. OVR AUC (eval_Kather_SSL_CR.py:643-666);
        # the evaluator is shared with the finetune CLI.
        from ssl_cr_histo_tpu.cli.finetune import evaluate

        ckpt = args.eval_ckpt or args.finetune_ckpt
        if not ckpt:
            raise SystemExit("--eval_ckpt required for evaluation")
        tmp_tx = make_optimizer(cfg.optimizer, args.lr or cfg.lr, args.weight_decay)
        state = init_triplet_state(
            model, head, tmp_tx, key, image_size=cfg.image_size, triplet=False
        )
        state, _ = restore_checkpoint(ckpt, state)
        evaluate(args, cfg, state, S.make_forward_fn(model, head),
                 eval_batch_size=args.eval_batch_size)
        return

    if not args.train_path or not args.finetune_ckpt:
        raise SystemExit("--train_path and --finetune_ckpt required for fine-tuning")

    # Data: labeled fraction for supervision; the FULL train split is the
    # unlabeled pool (reference uses the task's unlabeled data with
    # TransformFix — eval_Kather_SSL_CR.py:321-349, and the Camelyon CR
    # unlabeled samplers are the full per-class train indices,
    # eval_Camelyon_SSL_CR.py:320-321).  Validation comes from --val_path
    # when given (reference Camelyon16 VALID dirs), else a holdout split.
    train, val = load_train_val(args, cfg)
    labeled = subsample_labeled(train, args, cfg)
    print(f"==> {len(labeled)} labeled / {len(train)} unlabeled / {len(val)} val")

    lr = args.lr or cfg.lr
    # LR milestones in steps, from the epoch length the loop ACTUALLY uses:
    # min(labeled batches, unlabeled batches) via zip (reference
    # eval_Kather_SSL_CR.py:50 + per-epoch scheduler.step()).  Camelyon16
    # zips FOUR drop_last loaders — tumor/normal x labeled/unlabeled, each
    # with per-class batch sizes B and B*mu (eval_Camelyon_SSL_CR.py:53-101,
    # :330-356) — so both its iterators here are the balanced per-class ones.
    if cfg.name == "camelyon16":
        n_labeled_batches = balanced_epoch_len(
            D.grouping_key(labeled), batch_size, clamp=False
        )
        n_unlabeled_batches = balanced_epoch_len(
            D.grouping_key(train), batch_size * args.mu, clamp=False
        )
    else:
        n_labeled_batches = len(labeled) // batch_size
        n_unlabeled_batches = len(train) // (batch_size * args.mu)
    if min(n_labeled_batches, n_unlabeled_batches) == 0:
        # an empty zip would "train" 0 steps per epoch while validation and
        # checkpointing carry on — fail loudly instead
        raise SystemExit(
            f"zero steps per epoch: {n_labeled_batches} labeled batches "
            f"(batch {batch_size}{'/class' if cfg.name == 'camelyon16' else ''}) "
            f"vs {n_unlabeled_batches} unlabeled batches (batch "
            f"{batch_size}*mu{args.mu}) — reduce --batch_size/--mu or add data"
        )
    n_steps = min(n_labeled_batches, n_unlabeled_batches)
    sched = optim.multistep_schedule(lr, [m * n_steps for m in cfg.milestones], cfg.gamma)
    base_tx = make_optimizer(cfg.optimizer, sched, args.weight_decay)

    state = init_triplet_state(
        model, head, base_tx, key, image_size=cfg.image_size, triplet=False
    )
    tx = masked_optimizer(base_tx, state.params, args.modules_student, args.model)
    state = state.replace(opt_state=tx.init(state.params))
    state, _ = restore_checkpoint(args.finetune_ckpt, state)
    state = state.replace(opt_state=tx.init(state.params))  # fresh optimizer

    teacher_params, teacher_stats = S.refresh_teacher(state)
    # Shard-local concat groups = the data-axis size (mesh_for_batch sizes
    # the axis to divide batch_size, so labeled views and the unlabeled µB
    # sub-batch are both divisible).
    data_groups = int(mesh.shape["data"])
    step = S.make_consistency_step(
        model, head, tx, task=cfg.task, lambda_u=args.lambda_u, n_aug=args.NAug,
        aug_mode=args.aug_mode, labeled_views=args.labeled_views,
        data_groups=data_groups, multi=args.multi_step > 1, ema=args.ema,
    )
    val_forward = S.make_forward_fn(model, head)
    # per-epoch validation runs at inference batch size, on the SAME device
    # set as the train mesh (the state lives there; a differently-sized
    # device set would make jit reject the mixed placement)
    eval_sharding = batch_sharding(
        mesh_for_batch(args.eval_batch_size, devices=list(mesh.devices.flat))
    )

    os.makedirs(args.save_dir, exist_ok=True)
    log = CsvLogger(
        os.path.join(args.save_dir, "consistency_results.csv"),
        "epoch, train_loss, sup_loss, cons_loss, val_metric",
    )
    best = BestTracker(args.save_dir, mode="min")

    state, start_epoch, key, resume_path = resume_training(args, state, best, key)
    if resume_path:
        # teacher: per-epoch refresh mode re-derives it from the student at
        # the epoch boundary (teacher == student there by construction);
        # EMA mode restores its own persisted copy — written as
        # teacher_{basename} next to every student checkpoint (ckpt_N, best,
        # final), so any resume point can restore it.
        rdir, rbase = os.path.split(os.path.normpath(resume_path))
        teacher_path = os.path.join(rdir, f"teacher_{rbase}")
        if not os.path.isdir(teacher_path) and rbase == "final":
            # runs saved before round 3 named it final_teacher
            legacy = os.path.join(rdir, "final_teacher")
            if os.path.isdir(legacy):
                teacher_path = legacy
        if args.ema > 0 and os.path.isdir(teacher_path):
            tstate, _ = restore_checkpoint(teacher_path, state, restore_opt=False)
            teacher_params, teacher_stats = tstate.params, tstate.batch_stats
        else:
            if args.ema > 0:
                print(
                    f"WARNING: --ema {args.ema} but no teacher checkpoint at "
                    f"{teacher_path}; resetting the EMA teacher to the "
                    f"student (accumulated EMA state from the interrupted "
                    f"run is lost)"
                )
            teacher_params, teacher_stats = S.refresh_teacher(state)

    for epoch in range(start_epoch, args.num_epoch + 1):
        t0 = time.time()
        tl, sl, cl = M.AverageMeter(), M.AverageMeter(), M.AverageMeter()
        if cfg.name == "camelyon16":
            # the reference zips 4 loaders — tumor/normal x labeled/unlabeled
            # (eval_Camelyon_SSL_CR.py:53-101): labeled batches are B per
            # class and the unlabeled weak/strong pool is ALSO 50/50
            # tumor/normal at B*mu per class
            from ssl_cr_histo_tpu.data.pipeline import balanced_batch_iterator

            lab_it = balanced_batch_iterator(
                labeled, batch_size, seed=args.seed + epoch
            )
            unlab_it = (
                (imgs,) for imgs, _ in balanced_batch_iterator(
                    train, batch_size * args.mu, seed=1000 + args.seed + epoch
                )
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
        if args.multi_step > 1:
            pair_it = ((xl, yl, xu) for (xl, yl), (xu,) in zip(lab_it, unlab_it))
            feed = chunked_feed(pair_it, mesh, args.multi_step, n_arrays=3)
            for (xl_k, yl_k, xu_k), valid in feed:
                ek, sk = jax.random.split(ek)
                # the teacher rides the scan carry (per-step EMA inside when
                # --ema > 0; constant across the chunk otherwise)
                state, teacher_params, teacher_stats, ms = step(
                    state, teacher_params, teacher_stats, xl_k, yl_k, xu_k,
                    sk, valid,
                )
                bsz = xl_k.shape[1]
                l_, s_, c_ = (np.asarray(ms[k2]) for k2 in ("loss", "sup", "cons"))
                for j in range(int(np.asarray(valid).sum())):
                    tl.update(float(l_[j]), bsz)
                    sl.update(float(s_[j]), bsz)
                    cl.update(float(c_[j]), bsz)
        else:
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
                    # EMA both weights AND BN running stats — otherwise the
                    # teacher would forward on frozen stage-2-era statistics
                    # while its weights drift (advisor finding, round 1).
                    teacher_params = S.ema_update(teacher_params, state.params, args.ema)
                    teacher_stats = S.ema_update(teacher_stats, state.batch_stats, args.ema)

        if args.ema == 0:
            teacher_params, teacher_stats = S.refresh_teacher(state)

        val_metric = validate(cfg, state, val, val_forward,
                              args.eval_batch_size, sharding=eval_sharding)
        log.append(epoch, tl.avg, sl.avg, cl.avg, val_metric)
        print(
            f"epoch {epoch}: loss {tl.avg:.4f} (sup {sl.avg:.4f} cons {cl.avg:.4f}) "
            f"val {val_metric:.4f} ({time.time() - t0:.1f}s)"
        )
        meta = {"epoch": epoch, "args": vars(args), "val_metric": val_metric}
        if best.update(val_metric, epoch, state, meta):
            print(f"==> new best {val_metric:.4f}")
            if args.ema > 0:
                save_checkpoint(
                    os.path.join(args.save_dir, "teacher_best"),
                    state.replace(params=teacher_params, batch_stats=teacher_stats),
                    {"epoch": epoch, "role": "teacher"},
                )
        if args.save_freq and epoch % args.save_freq == 0:
            meta["best_val"] = best.best_value
            save_checkpoint(os.path.join(args.save_dir, f"ckpt_{epoch}"), state, meta)
            if args.ema > 0:
                save_checkpoint(
                    os.path.join(args.save_dir, f"teacher_ckpt_{epoch}"),
                    state.replace(params=teacher_params, batch_stats=teacher_stats),
                    {"epoch": epoch, "role": "teacher"},
                )
    # The reference checkpoints both teacher and student state_dicts
    # (eval_BreastPathQ_SSL_CR.py:519-533).  With per-epoch refresh the
    # teacher equals the student by construction — recorded in the meta;
    # under --ema it differs, so persist it as its own checkpoint.
    save_checkpoint(
        os.path.join(args.save_dir, "final"), state,
        {"epoch": args.num_epoch, "best_val": best.best_value,
         "teacher": "ema (see teacher_final)" if args.ema > 0
         else "equals student (per-epoch refresh, eval_Kather_SSL_CR.py:582-583)"},
    )
    if args.ema > 0:
        teacher_state = state.replace(
            params=teacher_params, batch_stats=teacher_stats
        )
        save_checkpoint(
            os.path.join(args.save_dir, "teacher_final"), teacher_state,
            {"epoch": args.num_epoch, "role": "teacher"},
        )


if __name__ == "__main__":
    main()
