"""pjit train/eval steps for the three SSL_CR_Histo stages.

TPU-first design: the step function is one jitted program containing the
on-device augmentation stack, the (triple-)ResNet forward/backward, the
optimizer update, and the metric reductions.  Batches arrive sharded over the
mesh ``data`` axis (see ``parallel.mesh``); jit partitions the program and
inserts gradient/metric all-reduces over ICI automatically — the TPU-native
equivalent of the reference's ``torch.nn.DataParallel`` scatter/gather
(reference pretrain_BreastPathQ.py:231-233).

Note on BatchNorm: batch statistics are computed over the GLOBAL batch (XLA
reduces over the sharded axis), i.e. sync-BN; the reference's DataParallel
computes per-replica stats.  Documented deviation — sync-BN is strictly more
deterministic and matches single-device math.

Reference call-stack parity:
  pretrain step  — reference pretrain_BreastPathQ.py:27-92 (train())
  finetune step  — reference eval_BreastPathQ_SSL.py:35-103
  consistency    — reference eval_Kather_SSL_CR.py:37-127
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssl_cr_histo_tpu.ops import batch as aug_batch
from ssl_cr_histo_tpu.train.state import TrainState

# The 6 resolution-sequence orderings and their class labels
# (reference dataset.py:36-38: tuple order is [HR, LR1, LR2]).
RSP_PERMUTATIONS = np.array(
    [[0, 1, 2], [0, 2, 1], [1, 2, 0], [1, 0, 2], [2, 0, 1], [2, 1, 0]],
    dtype=np.int32,
)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def permute_triplets(tiles: jnp.ndarray, perm_idx: jnp.ndarray) -> jnp.ndarray:
    """Reorder each (3, H, W, 3) triplet by its sampled permutation index."""
    perms = jnp.asarray(RSP_PERMUTATIONS)[perm_idx]  # (B, 3)
    return jnp.take_along_axis(tiles, perms[:, :, None, None, None], axis=1)


# ---------------------------------------------------------------------------
# RSP pretraining
# ---------------------------------------------------------------------------


def _pretrain_body(
    model,
    classifier,
    tx: optax.GradientTransformation,
    augment: Optional[str],
    n_aug: int,
    m_aug: float,
    aug_mode: str,
    photometric: str,
    joint_encode: bool,
    mean,
    std,
    return_feats: bool = False,
) -> Callable:
    """The un-jitted pretrain step body, shared by ``make_pretrain_step``
    (one jitted dispatch per batch) and ``make_pretrain_multi_step`` (a
    ``lax.scan`` over K stacked batches in one dispatch).

    return_feats: also emit the (B, D) TripletNet features and the (B,)
    ordering labels in the metrics — the reference accumulates these every
    train batch for the best-epoch t-SNE dump
    (pretrain_BreastPathQ.py:37-89, :322-340); off by default to keep the
    D2H transfer out of the steady-state step."""

    def loss_fn(params, batch_stats, tiles, labels):
        variables = {"params": params["model"], "batch_stats": batch_stats}
        if joint_encode:
            # one batched backbone pass over the 3 views (see
            # models.nets.TripletNet.forward_joint for the BN caveat)
            feats, mutated = model.apply(
                variables, tiles, train=True, mutable=["batch_stats"],
                method=model.forward_joint,
            )
        else:
            feats, mutated = model.apply(
                variables,
                tiles[:, 0],
                tiles[:, 1],
                tiles[:, 2],
                train=True,
                mutable=["batch_stats"],
            )
        logits = classifier.apply({"params": params["head"]}, feats)
        loss = cross_entropy(logits, labels)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return loss, (mutated["batch_stats"], acc, feats)

    def step(state: TrainState, tiles_u8: jnp.ndarray, key: jax.Array,
             labels: Optional[jnp.ndarray] = None):
        kperm, kaug = jax.random.split(key)
        b = tiles_u8.shape[0]
        # Permute the resolution sequence on the RAW uint8 tiles, before the
        # float conversion: the gather moves 4x fewer bytes, and the result
        # is identical — v1 draws one parameter set per triplet (shared by
        # all 3 tiles) and v2 draws iid per tile, so augmentation and
        # reordering commute (exactly for v1, in distribution for v2).
        # labels=None: one ordering sampled per triplet per step (default);
        # an explicit labels array is the strict x6 eager-expansion mode
        # (--expand_orderings), where the host enumerates every ordering.
        if labels is None:
            labels = jax.random.randint(kperm, (b,), 0, 6)
        tiles_u8 = permute_triplets(tiles_u8, labels)
        planar = False
        if augment == "v1":
            # fast/masked are strong-pool (CR) variants; the pretrain pool's
            # fast path is the fused single-warp policy
            v1_mode = "fused" if aug_mode in ("fast", "masked") else aug_mode
            # pallas path: stay channel-planar through the whole aug chain
            # (no relayouts around the kernel); the transpose back to NHWC
            # below is absorbed into the first conv by XLA for free.
            planar = v1_mode == "fused" and photometric == "pallas"
            tiles = aug_batch.augment_rsp_batch_v1(
                kaug, tiles_u8, mode=v1_mode, photometric=photometric,
                planar_out=planar,
            )
        elif augment == "v2":
            tiles = aug_batch.augment_rsp_batch_v2(
                kaug, tiles_u8, n=n_aug, m=m_aug, mode=aug_mode
            )
        else:
            tiles = aug_batch.to_float(tiles_u8)
        tiles = aug_batch.normalize_batch(
            tiles, mean, std, channel_axis=2 if planar else -1
        )
        if planar:
            # reshape-first so the NHWC conversion is a pure 4-D transpose
            # feeding the backbone (XLA folds it into conv1's layout);
            # the surrounding reshapes cancel against forward_joint's.
            b_, v_, c_, h_, w_ = tiles.shape
            tiles = (
                tiles.reshape(b_ * v_, c_, h_, w_)
                .transpose(0, 2, 3, 1)
                .reshape(b_, v_, h_, w_, c_)
            )

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (new_stats, acc, feats)), grads = grad_fn(
            state.params, state.batch_stats, tiles, labels
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            step=state.step + 1,
        )
        metrics = {"loss": loss, "acc": acc}
        if return_feats:
            metrics["feats"] = feats
            metrics["labels"] = labels
        return state, metrics

    return step


def make_pretrain_step(
    model,
    classifier,
    tx: optax.GradientTransformation,
    augment: Optional[str] = "v1",
    n_aug: int = 2,
    m_aug: float = 3.0,
    aug_mode: str = "fused",
    photometric: str = "xla",
    joint_encode: bool = False,
    mean=aug_batch.DEFAULT_MEAN,
    std=aug_batch.DEFAULT_STD,
    donate: bool = True,
    return_feats: bool = False,
) -> Callable:
    """Build the jitted RSP pretraining step.

    batch: uint8 (B, 3, H, W, 3) tiles in [HR, LR1, LR2] order.
    step(state, tiles, key[, labels]): the 6-way sequence permutation is
    sampled on device per example by default (the reference instead expands
    the dataset x6 eagerly — dataset.py:27-70; the training signal is the
    same with one random ordering per triplet per step, without 6x RAM);
    passing an explicit (B,) labels array selects the strict eager mode
    (``--expand_orderings``, host-enumerated orderings).
    Returns (state, metrics) with metrics {'loss', 'acc'} (+ 'feats',
    'labels' when return_feats).
    """
    body = _pretrain_body(
        model, classifier, tx, augment, n_aug, m_aug, aug_mode, photometric,
        joint_encode, mean, std, return_feats,
    )
    return jax.jit(body, donate_argnums=(0,) if donate else ())


def make_pretrain_multi_step(
    model,
    classifier,
    tx: optax.GradientTransformation,
    augment: Optional[str] = "v1",
    n_aug: int = 2,
    m_aug: float = 3.0,
    aug_mode: str = "fused",
    photometric: str = "xla",
    joint_encode: bool = False,
    mean=aug_batch.DEFAULT_MEAN,
    std=aug_batch.DEFAULT_STD,
    donate: bool = True,
    return_feats: bool = False,
) -> Callable:
    """K pretraining steps in ONE jitted dispatch via ``lax.scan``.

    Host dispatch through the runtime costs 1-2 ms per call (more over a
    remote tunnel); scanning K steps amortizes it K-fold while the host
    thread ships the next chunk.  The per-step math is byte-identical to
    ``make_pretrain_step`` (same body).

    multi(state, tiles_u8 (K, B, 3, H, W, 3), key, valid (K,)[, labels
    (K, B)]) -> (state, metrics stacked (K,)).
    ``valid`` masks zero-padded trailing steps of a partial final chunk:
    an invalid step's state update is discarded (the scan still runs it on
    the padded batch — static shapes — but the state passes through
    unchanged), so any chunk size divides any epoch length exactly.
    ``labels`` (optional) = host-enumerated orderings per step
    (--expand_orderings strict x6 mode).
    """
    body = _pretrain_body(
        model, classifier, tx, augment, n_aug, m_aug, aug_mode, photometric,
        joint_encode, mean, std, return_feats,
    )

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def multi(state: TrainState, tiles_u8: jnp.ndarray, key: jax.Array,
              valid: jnp.ndarray, labels: Optional[jnp.ndarray] = None):
        keys = jax.random.split(key, tiles_u8.shape[0])
        with_labels = labels is not None  # static at trace time

        def scan_body(st, inp):
            tiles, k_i, v = inp[:3]
            new_st, m = body(st, tiles, k_i, inp[3] if with_labels else None)
            st = jax.tree_util.tree_map(
                lambda n, o: jnp.where(v > 0, n, o), new_st, st
            )
            return st, m

        xs = (tiles_u8, keys, valid.astype(jnp.float32))
        if with_labels:
            xs = xs + (labels,)
        state, ms = jax.lax.scan(scan_body, state, xs)
        return state, ms

    return multi


def make_pretrain_eval_step(model, classifier, mean=aug_batch.DEFAULT_MEAN,
                            std=aug_batch.DEFAULT_STD, return_feats=False):
    """Validation step: no augmentation, running BN stats; every triplet is
    evaluated under ALL 6 resolution-sequence orderings, matching the
    reference's eagerly x6-expanded validation dataset (dataset.py:27-70 +
    pretrain_BreastPathQ.py:95-148).  ``lax.map`` scans the 6 orderings so
    device memory stays at one batch.

    valid: float/bool (B,) mask for host-side padding of the final partial
    batch (padded rows contribute zero weight).  Returns weighted SUMS
    ('loss_sum', 'correct', 'count') for exact averaging over ragged
    batches; with ``return_feats`` also 'feats' (6, B, 768) per-ordering
    features — only the --tsne dump reads them, so the per-epoch val loop
    keeps the default and never materializes the tensor (jitted outputs are
    not dead-code-eliminated by the caller ignoring them).
    """

    @jax.jit
    def step(state: TrainState, tiles_u8: jnp.ndarray, valid: jnp.ndarray):
        tiles = aug_batch.normalize_batch(aug_batch.to_float(tiles_u8), mean, std)
        b = tiles.shape[0]
        w = valid.astype(jnp.float32)
        variables = {"params": state.params["model"], "batch_stats": state.batch_stats}

        def eval_ordering(label):
            tp = permute_triplets(tiles, jnp.full((b,), label, jnp.int32))
            feats = model.apply(variables, tp[:, 0], tp[:, 1], tp[:, 2], train=False)
            logits = classifier.apply({"params": state.params["head"]}, feats)
            labels = jnp.full((b,), label, jnp.int32)
            losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            correct = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
            out = (jnp.sum(losses * w), jnp.sum(correct * w))
            return out + ((feats,) if return_feats else ())

        outs = jax.lax.map(eval_ordering, jnp.arange(6))
        metrics = {
            "loss_sum": jnp.sum(outs[0]),
            "correct": jnp.sum(outs[1]),
            "count": 6.0 * jnp.sum(w),
        }
        if return_feats:
            metrics["feats"] = outs[2]
        return metrics

    return step


# ---------------------------------------------------------------------------
# Supervised fine-tuning (SSL stage 2)
# ---------------------------------------------------------------------------


def make_finetune_step(
    model,
    head,
    tx: optax.GradientTransformation,
    task: str = "classification",
    three_view: bool = True,
    mean=aug_batch.DEFAULT_MEAN,
    std=aug_batch.DEFAULT_STD,
    donate: bool = True,
    multi: bool = False,
) -> Callable:
    """Supervised fine-tune step.

    batch: uint8 images (B, H, W, 3) + labels (B,).
    three_view=True applies the reference's 3-view augmentation stack on
    device and flattens views into the batch dim with repeated labels
    (reference dataset.py:487-536 + eval_BreastPathQ_SSL.py:58).
    task: 'classification' (CE) or 'regression' (MSE, scalar head).

    multi=True returns the K-steps-per-dispatch lax.scan variant instead:
    multi_step(state, images (K, B, H, W, 3), labels (K, B), key, valid (K,))
    -> (state, metrics stacked (K,)); ``valid`` masks padded trailing steps
    of a partial final chunk (state passes through unchanged) — see
    ``make_pretrain_multi_step``.
    """

    def loss_fn(params, batch_stats, images, labels):
        variables = {"params": params["model"], "batch_stats": batch_stats}
        feats, mutated = model.apply(
            variables,
            images,
            train=True,
            mutable=["batch_stats"],
            method=model.encode_single,
        )
        out = head.apply({"params": params["head"]}, feats)
        if task == "regression":
            loss = mse(out.squeeze(-1), labels.astype(jnp.float32))
            metric = loss
        else:
            loss = cross_entropy(out, labels)
            metric = jnp.mean(jnp.argmax(out, -1) == labels)
        return loss, (mutated["batch_stats"], metric)

    def step(state: TrainState, images_u8: jnp.ndarray, labels: jnp.ndarray, key: jax.Array):
        if three_view:
            views = aug_batch.augment_3view_batch(key, images_u8)  # (B,3,H,W,3)
            b, v = views.shape[0], views.shape[1]
            images = views.reshape(b * v, *views.shape[2:])
            labels = jnp.repeat(labels, v, axis=0)
        else:
            images = aug_batch.to_float(images_u8)
        images = aug_batch.normalize_batch(images, mean, std)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (new_stats, metric)), grads = grad_fn(
            state.params, state.batch_stats, images, labels
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(
            params=params, batch_stats=new_stats, opt_state=opt_state, step=state.step + 1
        )
        return state, {"loss": loss, "metric": metric}

    if not multi:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def multi_step(state: TrainState, images_u8, labels, key: jax.Array, valid):
        keys = jax.random.split(key, images_u8.shape[0])

        def scan_body(st, inp):
            imgs, labs, k_i, v = inp
            new_st, m = step(st, imgs, labs, k_i)
            st = jax.tree_util.tree_map(
                lambda n, o: jnp.where(v > 0, n, o), new_st, st
            )
            return st, m

        state, ms = jax.lax.scan(
            scan_body, state, (images_u8, labels, keys, valid.astype(jnp.float32))
        )
        return state, ms

    return multi_step


def make_forward_fn(model, head, mean=aug_batch.DEFAULT_MEAN, std=aug_batch.DEFAULT_STD):
    """Eval-mode forward: uint8 images -> head outputs (logits/scores)."""

    @jax.jit
    def forward(state: TrainState, images_u8: jnp.ndarray):
        images = aug_batch.normalize_batch(aug_batch.to_float(images_u8), mean, std)
        variables = {"params": state.params["model"], "batch_stats": state.batch_stats}
        feats = model.apply(variables, images, train=False, method=model.encode_single)
        return head.apply({"params": state.params["head"]}, feats)

    return forward


# ---------------------------------------------------------------------------
# Consistency training (SSL_CR stage 3)
# ---------------------------------------------------------------------------


def grouped_concat(parts, groups: int) -> jnp.ndarray:
    """Batch-dim concat that stays LOCAL on a batch-sharded mesh.

    A plain ``jnp.concatenate([x_l, strong])`` over arrays sharded on dim 0
    forces XLA SPMD to reshard (all-to-all + collective-permute per step —
    wasted ICI on a pod, and a rendezvous deadlock on the virtual CPU mesh).
    With ``groups`` = the data-axis size, interleaving per device shard —
    reshape each part to (groups, b/groups, ...), concat on the unsharded
    dim 1, flatten back — is a pure batch-order permutation (BN statistics
    and mean losses are order-invariant) and compiles to zero collectives.
    ``grouped_split`` is its exact inverse, restoring the original order.
    """
    if groups == 1:
        return jnp.concatenate(parts, axis=0)
    gs = [p.reshape(groups, p.shape[0] // groups, *p.shape[1:]) for p in parts]
    cat = jnp.concatenate(gs, axis=1)
    return cat.reshape(-1, *cat.shape[2:])


def grouped_split(x: jnp.ndarray, first_size: int, groups: int):
    """Inverse of ``grouped_concat`` for two parts: returns (first, second)
    in their original pre-concat order."""
    if groups == 1:
        return x[:first_size], x[first_size:]
    g = x.reshape(groups, -1, *x.shape[1:])
    k = first_size // groups
    a = g[:, :k].reshape(-1, *x.shape[1:])
    b = g[:, k:].reshape(-1, *x.shape[1:])
    return a, b


def expand_labeled_batch(key: jax.Array, x_l_u8: jnp.ndarray, y_l: jnp.ndarray,
                         views: int = 3):
    """The reference CR labeled branch: the labeled loader is the
    *Supervised_train* dataset, so each labeled sample enters the student
    batch as 3 augmented views with its label repeated, flattened into the
    batch (reference eval_Kather_SSL_CR.py:321 + :70-79
    ``inputs_x.reshape(-1, 3, 256, 256)``; same in the BPQ/Camelyon CR
    drivers).  views=1 feeds the raw image instead (non-reference ablation).

    Returns (images float32 (views*B, H, W, 3) un-normalized, labels (views*B,)).
    """
    if views == 1:
        return aug_batch.to_float(x_l_u8), y_l
    if views != 3:
        raise ValueError("the reference 3-view stack supports views in {1, 3}")
    stacks = aug_batch.augment_3view_batch(key, x_l_u8)  # (B, 3, H, W, 3)
    b, v = stacks.shape[0], stacks.shape[1]
    return stacks.reshape(b * v, *stacks.shape[2:]), jnp.repeat(y_l, v, axis=0)


def make_consistency_step(
    model,
    head,
    tx: optax.GradientTransformation,
    task: str = "classification",
    lambda_u: float = 1.0,
    n_aug: int = 7,
    aug_mode: str = "fused",
    labeled_views: int = 3,
    data_groups: int = 1,
    mean=aug_batch.DEFAULT_MEAN,
    std=aug_batch.DEFAULT_STD,
    donate: bool = True,
    multi: bool = False,
    ema: float = 0.0,
) -> Callable:
    """FixMatch-style teacher/student step (reference eval_Kather_SSL_CR.py:
    37-127).

    Teacher forwards the weak view (no grad, eval-mode BN); the student
    forwards labeled + strong views in ONE fused batch (reference :77-79).
    The labeled branch is the reference's 3-view supervised stack with
    repeated labels (labeled_views=3; see ``expand_labeled_batch``).
    Consistency loss: hard-pseudo-label CE for classification (:89-91), MSE
    between weak/strong logits for regression
    (eval_BreastPathQ_SSL_CR.py:93).  Teacher params live outside the
    optimizer and are refreshed per epoch by the loop (deepcopy-equivalent
    pytree copy — reference :582-583).

    data_groups: size of the mesh data axis; the labeled+strong concat is
    interleaved per device shard so it compiles with zero collectives (see
    ``grouped_concat``).  Requires both sub-batches divisible by it.

    multi=True returns the K-steps-per-dispatch lax.scan variant:
    multi_step(state, teacher_params, teacher_stats, x_l (K,B,...),
    y_l (K,B), x_u (K,uB,...), key, valid (K,)) ->
    (state, teacher_params, teacher_stats, metrics stacked (K,)).
    The teacher rides the scan carry: with ``ema`` > 0 it EMA-updates
    (weights and BN stats) after every inner step, exactly like the
    per-dispatch loop; with ema == 0 it is constant across the chunk
    (per-epoch refresh stays in the epoch loop).  ``valid`` masks padded
    trailing steps of a partial final chunk.
    """

    def loss_fn(params, batch_stats, teacher_params, teacher_stats,
                x_l, y_l, weak, strong):
        b_l = x_l.shape[0]
        # Teacher on the weak view — frozen, eval-mode stats.
        t_vars = {"params": teacher_params["model"], "batch_stats": teacher_stats}
        t_feats = model.apply(t_vars, weak, train=False, method=model.encode_single)
        logits_u_w = head.apply({"params": teacher_params["head"]}, t_feats)
        logits_u_w = jax.lax.stop_gradient(logits_u_w)

        # Student on cat(labeled, strong) — one fused forward, shard-local
        # interleaved so no resharding collective is emitted.
        inputs = grouped_concat([x_l, strong], data_groups)
        s_vars = {"params": params["model"], "batch_stats": batch_stats}
        feats, mutated = model.apply(
            s_vars, inputs, train=True, mutable=["batch_stats"],
            method=model.encode_single,
        )
        out = head.apply({"params": params["head"]}, feats)
        out_l, logits_u_s = grouped_split(out, b_l, data_groups)

        if task == "regression":
            sup = mse(out_l.squeeze(-1), y_l.astype(jnp.float32))
            cons = mse(logits_u_w.squeeze(-1), logits_u_s.squeeze(-1))
            metric = sup
        else:
            sup = cross_entropy(out_l, y_l)
            pseudo = jnp.argmax(jax.nn.softmax(logits_u_w, -1), -1)
            cons = cross_entropy(logits_u_s, pseudo)
            metric = jnp.mean(jnp.argmax(out_l, -1) == y_l)
        loss = sup + lambda_u * cons
        return loss, (mutated["batch_stats"], sup, cons, metric)

    def step(
        state: TrainState,
        teacher_params,
        teacher_stats,
        x_l_u8: jnp.ndarray,
        y_l: jnp.ndarray,
        x_u_u8: jnp.ndarray,
        key: jax.Array,
    ):
        kl, ku = jax.random.split(key)
        weak, strong = aug_batch.transform_fix_batch(ku, x_u_u8, n=n_aug, mode=aug_mode)
        x_l, y_rep = expand_labeled_batch(kl, x_l_u8, y_l, views=labeled_views)
        x_l = aug_batch.normalize_batch(x_l, mean, std)
        weak = aug_batch.normalize_batch(weak, mean, std)
        strong = aug_batch.normalize_batch(strong, mean, std)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (new_stats, sup, cons, metric)), grads = grad_fn(
            state.params, state.batch_stats, teacher_params, teacher_stats,
            x_l, y_rep, weak, strong,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(
            params=params, batch_stats=new_stats, opt_state=opt_state, step=state.step + 1
        )
        return state, {"loss": loss, "sup": sup, "cons": cons, "metric": metric}

    if not multi:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    @partial(jax.jit, donate_argnums=(0, 1, 2) if donate else ())
    def multi_step(
        state: TrainState,
        teacher_params,
        teacher_stats,
        x_l_u8, y_l, x_u_u8,   # each stacked (K, B, ...)
        key: jax.Array,
        valid,                 # (K,)
    ):
        keys = jax.random.split(key, x_l_u8.shape[0])

        def scan_body(carry, inp):
            st, t_params, t_stats = carry
            xl, yl, xu, k_i, v = inp
            new_st, m = step(st, t_params, t_stats, xl, yl, xu, k_i)
            st = jax.tree_util.tree_map(
                lambda n, o: jnp.where(v > 0, n, o), new_st, st
            )
            if ema > 0:
                # per-step EMA teacher (weights AND BN stats) inside the scan
                new_tp = ema_update(t_params, st.params, ema)
                new_ts = ema_update(t_stats, st.batch_stats, ema)
                t_params = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(v > 0, n, o), new_tp, t_params
                )
                t_stats = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(v > 0, n, o), new_ts, t_stats
                )
            return (st, t_params, t_stats), m

        (state, teacher_params, teacher_stats), ms = jax.lax.scan(
            scan_body,
            (state, teacher_params, teacher_stats),
            (x_l_u8, y_l, x_u_u8, keys, valid.astype(jnp.float32)),
        )
        return state, teacher_params, teacher_stats, ms

    return multi_step


def refresh_teacher(state: TrainState):
    """Per-epoch teacher <- student refresh (reference deepcopy,
    eval_Kather_SSL_CR.py:582-583): in JAX just copy the pytrees."""
    return jax.tree_util.tree_map(jnp.copy, state.params), jax.tree_util.tree_map(
        jnp.copy, state.batch_stats
    )


def ema_update(teacher_params, student_params, decay: float = 0.99):
    """Optional EMA teacher (behind a flag; not reference semantics)."""
    return jax.tree_util.tree_map(
        lambda t, s: decay * t + (1.0 - decay) * s, teacher_params, student_params
    )
