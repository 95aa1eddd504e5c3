"""Optimizers and LR schedules (optax).

Reference configs of record (BASELINE.md):
  * pretrain:  SGD(lr=0.01, momentum=0.9, nesterov, wd=1e-4) + Lookahead
               (la_steps=5, la_alpha=0.5) — reference
               pretrain_BreastPathQ.py:245-247
  * fine-tune: Adam 1e-4 (BPQ) / 1e-5 (Kather), SGD 5e-4 (Camelyon16), with
               MultiStepLR [30, 60] gamma=0.1 over 90 epochs.

Lookahead quirk: the reference wraps the inner SGD in Lookahead but steps the
wrapper only once per EPOCH (it is bound to the variable named ``scheduler``
and invoked as ``scheduler.step()`` — pretrain_BreastPathQ.py:247,293), so
slow-weight interpolation happens every ``la_steps`` epochs; the per-epoch
call also re-applies the final batch's gradients (a reference defect we do
not replicate).  ``lookahead_epoch_sync`` reproduces the epoch-level
interpolation; ``lookahead`` is the canonical per-step transform for users
who want the published algorithm.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


def multistep_schedule(base_lr: float, milestones_steps, gamma: float = 0.1):
    """torch MultiStepLR: multiply lr by gamma at each milestone (in steps)."""
    return optax.piecewise_constant_schedule(
        base_lr, {int(step): gamma for step in milestones_steps}
    )


def sgd_nesterov(
    learning_rate, momentum: float = 0.9, weight_decay: float = 1e-4
) -> optax.GradientTransformation:
    """torch-equivalent SGD: grad += wd * p, then Nesterov momentum."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate, momentum=momentum, nesterov=True),
    )


def radam(learning_rate, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """RAdam (rectified Adam).  The reference vendors the full RAdam repo but
    never instantiates the optimizer (SURVEY C24 — only Lookahead is
    imported); provided here for completeness via optax."""
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay), optax.radam(learning_rate)
        )
    return optax.radam(learning_rate)


def adam(learning_rate, weight_decay: float = 0.0) -> optax.GradientTransformation:
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay), optax.adam(learning_rate)
        )
    return optax.adam(learning_rate)


class LookaheadState(NamedTuple):
    inner: optax.OptState
    slow: chex.ArrayTree
    count: jnp.ndarray


def lookahead(
    inner: optax.GradientTransformation,
    sync_period: int = 5,
    slow_step_size: float = 0.5,
) -> optax.GradientTransformation:
    """Canonical Lookahead (Zhang et al. 2019) as a gradient transformation.

    Every ``sync_period`` steps the (fast) params are pulled back toward the
    slow weights: p <- a*p_fast + (1-a)*p_slow, and the slow weights recache.
    The returned updates already account for the interpolation, so the usual
    ``optax.apply_updates`` works unchanged.
    """

    def init(params):
        return LookaheadState(
            inner=inner.init(params),
            slow=jax.tree_util.tree_map(jnp.copy, params),
            count=jnp.zeros([], jnp.int32),
        )

    def update(updates, state, params):
        if params is None:
            raise ValueError("lookahead requires params")
        inner_updates, inner_state = inner.update(updates, state.inner, params)
        count = state.count + 1
        sync = count >= sync_period

        def interpolate(p, u, s):
            fast = p + u
            synced = s + slow_step_size * (fast - s)
            new_p = jnp.where(sync, synced, fast)
            new_s = jnp.where(sync, new_p, s)
            return new_p - p, new_s

        flat_updates, flat_slow = [], []
        leaves_p, treedef = jax.tree_util.tree_flatten(params)
        leaves_u = treedef.flatten_up_to(inner_updates)
        leaves_s = treedef.flatten_up_to(state.slow)
        for p, u, s in zip(leaves_p, leaves_u, leaves_s):
            du, ns = interpolate(p, u, s)
            flat_updates.append(du)
            flat_slow.append(ns)
        new_updates = jax.tree_util.tree_unflatten(treedef, flat_updates)
        new_slow = jax.tree_util.tree_unflatten(treedef, flat_slow)
        count = jnp.where(sync, 0, count)
        return new_updates, LookaheadState(inner_state, new_slow, count)

    return optax.GradientTransformation(init, update)


def lookahead_epoch_sync(params, slow_params, epoch_count, la_steps: int = 5, la_alpha: float = 0.5):
    """Reference-semantics Lookahead: called once per epoch; interpolates and
    recaches every ``la_steps`` epochs.

    Returns (params, slow_params, epoch_count) updated.
    """
    epoch_count = epoch_count + 1
    sync = epoch_count >= la_steps

    def interp(p, s):
        newp = jnp.where(sync, la_alpha * p + (1.0 - la_alpha) * s, p)
        news = jnp.where(sync, newp, s)
        return newp, news

    leaves_p, treedef = jax.tree_util.tree_flatten(params)
    leaves_s = treedef.flatten_up_to(slow_params)
    out_p, out_s = [], []
    for p, s in zip(leaves_p, leaves_s):
        a, b = interp(p, s)
        out_p.append(a)
        out_s.append(b)
    params = jax.tree_util.tree_unflatten(treedef, out_p)
    slow_params = jax.tree_util.tree_unflatten(treedef, out_s)
    epoch_count = jnp.where(sync, 0, epoch_count)
    return params, slow_params, epoch_count
