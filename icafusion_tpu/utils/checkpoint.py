"""Checkpoint save/restore — msgpack pytrees, no pickle.

Behavioral counterpart of the reference's ckpt dict {epoch, best_fitness, model,
ema, updates, optimizer, wandb_id} torch-pickle (train.py:424-430) and
strip_optimizer (general.py:610-623), redesigned:

- flax msgpack serialization of plain numpy pytrees (safe to load, no code exec)
- last.ckpt / best.ckpt in <run_dir>/weights, best selected by fitness=mAP@0.5
- strip_checkpoint(): final inference artifact = EMA weights only, fp16 leaves
  (like strip_optimizer's half() finalization)
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


# in-flight background writers, keyed by destination path (one per path —
# a newer save for the same file joins the previous writer first, so writes
# to a given path are ordered)
_PENDING_SAVES: Dict[str, Any] = {}


def save_checkpoint(path, state, epoch: int, best_fitness: float,
                    extra: Optional[Dict[str, Any]] = None,
                    background: bool = False):
    """state: TrainState (train/trainer.py). Writes <path> (msgpack) atomically.

    The whole state is fetched with ONE jax.device_get (async per-leaf copies,
    single wait) — per-leaf np.asarray costs a device round trip each, which is
    ruinous over a remote-TPU tunnel (~12s per save observed).

    background=True overlaps the msgpack serialization + disk write with
    continued training (a thread per destination; call wait_pending_saves()
    before reading the files). The device fetch itself stays synchronous on
    purpose: the train step donates the state buffers, so a deferred
    device_get could read donated memory — only host-owned numpy ever crosses
    into the writer thread."""
    device_payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_momentum": state.opt.momentum,
        "opt_step": state.opt.step,
        "ema_tree": state.ema.tree,
        "ema_updates": state.ema.updates,
        "rng": state.rng,
    }
    host = jax.device_get(device_payload)
    payload = {
        **host,
        "opt_step": int(host["opt_step"]),
        "ema_updates": int(host["ema_updates"]),
        "rng": np.asarray(host["rng"]),
        "meta": {"epoch": epoch, "best_fitness": float(best_fitness),
                 **(extra or {})},
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    def write():
        tmp = path.with_suffix(path.suffix + ".tmp")
        tmp.write_bytes(serialization.msgpack_serialize(payload))
        os.replace(tmp, path)

    if not background:
        write()
        return
    import threading
    key = str(path)
    prev = _PENDING_SAVES.pop(key, None)
    if prev is not None:
        prev.join()
    t = threading.Thread(target=write, daemon=True)
    t.start()
    _PENDING_SAVES[key] = t


def wait_pending_saves():
    """Join all background checkpoint writers (call before reading the files
    or exiting)."""
    while _PENDING_SAVES:
        _, t = _PENDING_SAVES.popitem()
        t.join()


def load_checkpoint(path) -> Dict[str, Any]:
    return serialization.msgpack_restore(Path(path).read_bytes())


def restore_train_state(ckpt: Dict[str, Any], state):
    """Rebuild a TrainState from a loaded checkpoint dict, validating shapes
    against a freshly-initialized `state` (resume semantics, train.py:157-183)."""
    import jax.numpy as jnp

    from icafusion_tpu.train.ema import EmaState
    from icafusion_tpu.train.optim import SGDState

    def like(new, old):
        return jax.tree.map(lambda a, b: jnp.asarray(b).astype(a.dtype), new, old)

    return state.replace(
        params=like(state.params, ckpt["params"]),
        batch_stats=like(state.batch_stats, ckpt["batch_stats"]),
        opt=SGDState(momentum=like(state.opt.momentum, ckpt["opt_momentum"]),
                     step=jnp.asarray(ckpt["opt_step"], jnp.int32)),
        ema=EmaState(tree=like(state.ema.tree, ckpt["ema_tree"]),
                     updates=jnp.asarray(ckpt["ema_updates"], jnp.int32)),
        rng=jnp.asarray(ckpt["rng"]),
    )


def strip_checkpoint(ckpt_path, out_path):
    """Final inference artifact: EMA variables only, fp16 (general.py:610-623)."""
    ckpt = load_checkpoint(ckpt_path)
    ema = ckpt["ema_tree"]
    slim = {
        "params": jax.tree.map(lambda x: np.asarray(x, np.float16), ema["params"]),
        "batch_stats": jax.tree.map(lambda x: np.asarray(x, np.float16),
                                    ema["batch_stats"]),
        "meta": ckpt["meta"],
    }
    Path(out_path).write_bytes(serialization.msgpack_serialize(slim))


def load_inference_variables(path):
    """Load a stripped (or full) checkpoint for inference: prefers EMA weights
    (attempt_load semantics, experimental.py:119). Returns fp32 variables."""
    ckpt = load_checkpoint(path)
    if "ema_tree" in ckpt:
        tree = ckpt["ema_tree"]
    elif "params" in ckpt and "meta" in ckpt and "ema" not in ckpt:
        tree = {"params": ckpt["params"], "batch_stats": ckpt.get("batch_stats", {})}
    else:
        tree = ckpt
    return jax.tree.map(lambda x: np.asarray(x, np.float32), tree)
