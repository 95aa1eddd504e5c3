"""Train state pytree shared by all three training stages."""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    """Parameters + optimizer state for one (model, head) pair.

    params:       {'model': ..., 'head': ...} flax param trees
    batch_stats:  backbone BatchNorm running statistics
    opt_state:    optax state over ``params`` (possibly masked for freezing)
    step:         global optimizer step
    slow_params:  Lookahead slow weights (reference epoch-level semantics);
                  None when lookahead is unused
    la_count:     epochs since last Lookahead sync
    """

    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    step: jnp.ndarray
    slow_params: Optional[Any] = None
    la_count: Optional[jnp.ndarray] = None
