"""Model EMA with warmup-ramped decay.

Behavioral counterpart of reference utils/torch_utils.py:279-313 (ModelEMA):
decay(updates) = base * (1 - exp(-updates / 2000)); the EMA tracks *all* floating
state — params and BatchNorm running stats (the reference EMAs the full state_dict).
Kept in fp32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    tree: Any               # {'params': ..., 'batch_stats': ...} fp32 shadow
    updates: jnp.ndarray    # int32


def ema_init(variables) -> EmaState:
    # copy=True: an fp32 astype would alias the source buffer, and an aliased
    # params/ema pair breaks buffer donation of the train state.
    tree = jax.tree.map(lambda x: jnp.array(x, dtype=jnp.float32, copy=True), variables)
    return EmaState(tree=tree, updates=jnp.zeros((), jnp.int32))


def ema_update(state: EmaState, variables, base_decay: float = 0.9999) -> EmaState:
    updates = state.updates + 1
    d = base_decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / 2000.0))
    new = jax.tree.map(
        lambda e, v: d * e + (1.0 - d) * v.astype(jnp.float32), state.tree, variables)
    return EmaState(tree=new, updates=updates)
