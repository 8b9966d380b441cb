"""Train step + state: the TPU-native equivalent of the reference's epoch/batch loop
(reference train.py:263-366 — SURVEY §3.1).

One jitted SPMD program per step: forward (bf16 optional) -> loss -> grad ->
3-group SGD -> EMA. Under a data mesh the batch is sharded on its leading axis and
XLA inserts the gradient all-reduce (replacing DDP/NCCL — train.py:232-235,:571).

Key semantic mappings:
- AMP + GradScaler (train.py:256,:334-352)  -> bf16 compute, fp32 params/grads
  (no scaler needed for bf16)
- gradient accumulation to nbs=64 (train.py:123-124,:318,:347) -> ``accum_steps``
  microbatch lax.scan inside the same jitted step
- ModelEMA after each optimizer step (train.py:352) -> ema_update
- loss-gain rescale by nl/nc/imgsz (train.py:238-241) -> scaled_gains()
- DDP loss *= world_size (train.py:338-339) is unnecessary: the loss is computed
  over the *global* sharded batch, matching single-process large-batch semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from icafusion_tpu.config import HypConfig
from icafusion_tpu.models.assembler import ICAFusionModel, anchors_grid_units, model_strides
from icafusion_tpu.train.ema import EmaState, ema_init, ema_update
from icafusion_tpu.train.loss import YoloLoss
from icafusion_tpu.train.optim import SGDState, YoloAdam, YoloSGD


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt: SGDState
    ema: EmaState
    rng: jax.Array


def scaled_size(v: int, scale: float) -> int:
    """Multi-scale bucket size: round(v*scale) snapped to the stride-32 grid
    (reference train.py:327-329 random_size // gs * gs semantics)."""
    return max(round(v * scale / 32), 1) * 32


def scaled_gains(hyp: HypConfig, nc: int, nl: int, imgsz: int) -> Tuple[float, float, float]:
    """box/obj/cls gain rescale (reference train.py:238-241)."""
    box = hyp.box * 3.0 / nl
    cls = hyp.cls * nc / 80.0 * 3.0 / nl
    obj = hyp.obj * (imgsz / 640.0) ** 2 * 3.0 / nl
    return box, obj, cls


@dataclasses.dataclass
class Trainer:
    model: ICAFusionModel
    hyp: HypConfig
    epochs: int
    steps_per_epoch: int
    batch_size: int                 # global batch per optimizer step (pre-accum)
    imgsz: int = 640
    accum_steps: int = 1
    ema_decay: float = 0.9999
    warmup_min_steps: int = 1000
    adam: bool = False              # reference --adam (train.py:128-146)
    linear_lr: bool = False         # reference --linear-lr (train.py:148-152)
    freeze: tuple = ()              # substring param freeze (train.py:115-120)

    def __post_init__(self):
        cfg = self.model.cfg
        anchors = anchors_grid_units(cfg)
        box, obj, cls = scaled_gains(self.hyp, cfg.nc, cfg.nl, self.imgsz)
        self.loss_fn = YoloLoss(hyp=self.hyp, nc=cfg.nc, anchors=anchors,
                                strides=model_strides(cfg),
                                box_gain=box, obj_gain=obj, cls_gain=cls)
        opt_cls = YoloAdam if self.adam else YoloSGD
        self.optimizer = opt_cls(hyp=self.hyp, epochs=self.epochs,
                                 steps_per_epoch=self.steps_per_epoch,
                                 total_batch_size=self.batch_size * self.accum_steps,
                                 warmup_min_steps=self.warmup_min_steps,
                                 linear_lr=self.linear_lr,
                                 freeze=tuple(self.freeze))

    def init_state(self, rng, sample_rgb, sample_ir,
                   variables: Any = None) -> TrainState:
        """variables: pre-built {'params', 'batch_stats'} to adopt instead of
        a fresh init — e.g. a checkpoint pushed through
        merge_stream_variables for stream-merged training."""
        init_rng, state_rng = jax.random.split(rng)
        if variables is None:
            variables = jax.jit(self.model.init, static_argnames=("train", "decode"))(
                {"params": init_rng, "dropout": init_rng},
                sample_rgb, sample_ir, train=True, decode=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt=self.optimizer.init(params),
            ema=ema_init({"params": params, "batch_stats": batch_stats}),
            rng=state_rng,
        )

    def make_train_step(self, scale: float = 1.0,
                        grad_mask: Any = None) -> Callable:
        """Returns train_step(state, rgb, ir, targets, mask) -> (state, metrics).

        rgb/ir: (A*B, H, W, 3) float in [0,1]; targets (A*B, T, 5); mask (A*B, T)
        where A = accum_steps. jit/pjit-able; donate state for in-place update.

        scale != 1.0 resizes the batch on device to round(H*scale/32)*32 before
        the forward — the multi-scale training analog (reference train.py:325-331
        picks a random size per batch; under XLA each size is its own compiled
        step, so callers pick from a small bucket set).

        grad_mask: optional sparse 0/1 mask ({top-level param name: subtree}),
        multiplied into those gradient entries before the optimizer — used by
        the stream-merged training graph to pin the block-diagonal zeros
        (utils/stream_merge.grad_mask)."""
        model, loss_fn, optimizer = self.model, self.loss_fn, self.optimizer
        A = self.accum_steps

        def maybe_resize(x):
            if scale == 1.0:
                return x
            b, h, w, c = x.shape
            return jax.image.resize(
                x, (b, scaled_size(h, scale), scaled_size(w, scale), c),
                method="linear")

        def microbatch_loss(params, batch_stats, rgb, ir, targets, mask, drng):
            rgb = maybe_resize(rgb)
            ir = maybe_resize(ir)
            preds, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                rgb, ir, train=True, decode=False,
                rngs={"dropout": drng}, mutable=["batch_stats"])
            loss, items = loss_fn(preds, targets, mask)
            return loss, (items, mut["batch_stats"])

        grad_fn = jax.value_and_grad(microbatch_loss, has_aux=True)

        def train_step(state: TrainState, rgb, ir, targets, mask):
            rng, drng = jax.random.split(state.rng)

            if A == 1:
                (loss, (items, new_bs)), grads = grad_fn(
                    state.params, state.batch_stats, rgb, ir, targets, mask, drng)
            else:
                def resh(x):
                    return x.reshape((A, x.shape[0] // A) + x.shape[1:])
                mb = jax.tree.map(resh, (rgb, ir, targets, mask))
                drngs = jax.random.split(drng, A)

                def body(carry, xs):
                    bs_c, g_acc, l_acc, i_acc = carry
                    (r, iri, t, m), dr = xs
                    (l, (it, bs_n)), g = grad_fn(state.params, bs_c, r, iri, t, m, dr)
                    g_acc = jax.tree.map(jnp.add, g_acc, g)
                    return (bs_n, g_acc, l_acc + l, i_acc + it), None

                zero_g = jax.tree.map(jnp.zeros_like, state.params)
                (new_bs, grads, loss, items), _ = jax.lax.scan(
                    body, (state.batch_stats, zero_g, 0.0, jnp.zeros(4)), (mb, drngs))
                # accumulation in the reference sums gradients over A backward
                # passes before one optimizer step (train.py:344-347)
                loss = loss / A
                items = items / A

            if grad_mask is not None:
                # sparse: only the stream-merged subtrees carry a mask
                grads = dict(grads)
                for name, m in grad_mask.items():
                    grads[name] = jax.tree.map(jnp.multiply, grads[name], m)
            new_params, new_opt = optimizer.update(grads, state.opt, state.params)
            new_ema = ema_update(state.ema,
                                 {"params": new_params, "batch_stats": new_bs},
                                 self.ema_decay)
            metrics = {"loss": loss, "lbox": items[0], "lobj": items[1],
                       "lcls": items[2], "lr": optimizer.schedules(state.opt.step)[0][1]}
            return TrainState(params=new_params, batch_stats=new_bs, opt=new_opt,
                              ema=new_ema, rng=rng), metrics

        return train_step
