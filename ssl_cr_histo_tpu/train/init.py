"""State initialization and cross-stage checkpoint handoff helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ssl_cr_histo_tpu.train.state import TrainState


def init_triplet_state(
    model,
    head,
    tx: optax.GradientTransformation,
    key: jax.Array,
    image_size: int = 256,
    triplet: bool = True,
    lookahead_slow: bool = False,
) -> TrainState:
    """Initialize params/batch_stats/opt_state for (TripletNet, head).

    ``triplet=True`` initializes via the 3-input forward (pretraining);
    otherwise via ``encode_single`` (fine-tune stages).  Both produce the
    identical parameter structure — the handoff between stages is a plain
    pytree copy.
    """
    kv, kh = jax.random.split(key)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    if triplet:
        variables = model.init(kv, dummy, dummy, dummy, train=False)
    else:
        variables = model.init(kv, dummy, train=False, method=model.encode_single)
    feat_dummy = model.apply(variables, dummy, train=False, method=model.encode_single)
    head_vars = head.init(kh, feat_dummy)
    params = {"model": variables["params"], "head": head_vars["params"]}
    batch_stats = variables.get("batch_stats", {})
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros([], jnp.int32),
        slow_params=jax.tree_util.tree_map(jnp.copy, params) if lookahead_slow else None,
        la_count=jnp.zeros([], jnp.int32) if lookahead_slow else None,
    )
    return state


def load_backbone(state: TrainState, pretrained_model_params, pretrained_batch_stats) -> TrainState:
    """Stage handoff: replace the backbone+fc params (and BN stats) with a
    pretrained checkpoint's, keeping the current head (reference
    eval_BreastPathQ_SSL.py:342-353 loads the stage-1 'model' state_dict and
    re-initializes the head)."""
    params = dict(state.params)
    params["model"] = jax.tree_util.tree_map(jnp.copy, pretrained_model_params)
    return state.replace(
        params=params,
        batch_stats=jax.tree_util.tree_map(jnp.copy, pretrained_batch_stats),
    )
