"""Optimizer: 3-group SGD with one-cycle schedule and per-iteration warmup.

Behavioral counterpart of reference train.py:123-155, :314-323 and the torch SGD
(nesterov) update rule:

- group 0: BatchNorm scales            — no weight decay      (train.py:136,:142)
- group 1: conv/dense kernels          — weight decay         (train.py:138,:141)
- group 2: biases + scalar gains       — no decay, own warmup (train.py:135,:143)
- weight decay pre-scaled by total_bs/nbs (train.py:123-126)
- one_cycle LR over epochs: lr = lr0 * ((1-cos(e/E*pi))/2 * (lrf-1) + 1)
  (general.py:244-246, train.py:148-152), stepped per *epoch*
- warmup over the first nw = max(3 epochs, 1000 iters) iterations: per-group LR and
  momentum linearly interpolated per iteration (train.py:314-323)

The update is hand-rolled (not optax.sgd) because LR *and momentum* vary per
iteration during warmup and differ per group — everything is computed inside the
jitted step from the integer step counter, so one compiled program covers the whole
schedule.

Note on coverage: the reference's module-walk grouping silently skips parameters not
named 'weight'/'bias' (pos_emb_*, LearnableWeights.w1/w2 are never added to any
param group and therefore never trained — train.py:128-146). We train them (group 1,
no decay via the bn-style mask is not applied; they live in group 0 semantics) since
that is the paper's evident intent; set ``freeze_unrouted=True`` to reproduce the
reference behavior exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from icafusion_tpu.config import HypConfig
from icafusion_tpu.utils.general import one_cycle


def _is_bias(path) -> bool:
    leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    return leaf == "bias"


def _is_bn_scale(path) -> bool:
    # flax BatchNorm params live under .../bn*/scale (our layers name them 'bn',
    # 'stem_bn', 'bn1'...); LayerNorm scales are *not* BN scales (reference pg1).
    leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if leaf != "scale":
        return False
    parent = path[-2].key if hasattr(path[-2], "key") else str(path[-2])
    return "bn" in parent


def _path_str(path) -> str:
    return "/".join(p.key if hasattr(p, "key") else str(p) for p in path)


def _is_frozen(path, freeze: Tuple[str, ...]) -> bool:
    """Reference freeze hook (train.py:115-120): substring match against the
    parameter name — `any(x in k for x in freeze)` — sets requires_grad=False.
    Here the name is the slash-joined flax path with a LEADING slash
    (reference `model.0.conv.weight` ≙ `/m0/conv/kernel`); a frozen param
    receives no update and no decay. Bare substrings match anywhere (`m0`
    also hits the C3-internal bottlenecks `/m12/m0/...`); an entry with a
    LEADING slash must match from the start of the path — `/m0/` freezes
    layer 0 only — the counterpart of upstream YOLOv5's `model.0.`
    trailing-dot convention."""
    if not freeze:
        return False
    k = "/" + _path_str(path)
    return any(k.startswith(x) if x.startswith("/") else x in k
               for x in freeze)


def _is_unrouted(path) -> bool:
    """Params the reference optimizer never sees (pos_emb, LearnableWeights,
    CrossTransformerBlock coefficients are named 'coefficients' here but map to
    reference LearnableCoefficient.bias -> group 2)."""
    leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    return leaf in ("pos_emb_vis", "pos_emb_ir", "w1", "w2")


def param_group(path) -> int:
    """0 = BN scale (no decay), 1 = kernels (decay), 2 = biases (no decay,
    warmup bias LR)."""
    leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if leaf == "coefficients":  # LearnableCoefficient.bias in the reference -> pg2
        return 2
    if _is_bias(path):
        return 2
    if _is_bn_scale(path):
        return 0
    if _is_unrouted(path):
        return 0
    return 1


class SGDState(NamedTuple):
    momentum: Any       # pytree of momentum buffers
    step: jnp.ndarray   # int32 iteration counter (optimizer steps)


@dataclasses.dataclass(frozen=True)
class YoloSGD:
    """The full reference training schedule, jit-compatible."""
    hyp: HypConfig
    epochs: int
    steps_per_epoch: int
    total_batch_size: int          # global batch * accumulate
    nbs: int = 64                  # nominal batch size (train.py:123)
    linear_lr: bool = False
    freeze_unrouted: bool = False
    # substring-match parameter freeze — the reference's transfer-learning
    # hook (train.py:115-120, shipped as an empty list there)
    freeze: Tuple[str, ...] = ()
    warmup_min_steps: int = 1000   # reference floor (train.py:264: nw >= 1000)

    @property
    def weight_decay(self) -> float:
        # train.py:123-126
        import math
        accumulate = max(round(self.nbs / self.total_batch_size), 1)
        return self.hyp.weight_decay * self.total_batch_size * accumulate / self.nbs

    @property
    def warmup_steps(self) -> int:
        return max(round(self.hyp.warmup_epochs * self.steps_per_epoch),
                   self.warmup_min_steps)

    def lr_factor(self, epoch):
        """lf(epoch) per the reference scheduler (train.py:148-152)."""
        if self.linear_lr:
            return (1 - epoch / max(self.epochs - 1, 1)) * (1.0 - self.hyp.lrf) + self.hyp.lrf
        import math
        return ((1 - jnp.cos(epoch * math.pi / self.epochs)) / 2) * (self.hyp.lrf - 1) + 1

    def schedules(self, step):
        """(lr_groups[3], momentum) at integer iteration ``step``."""
        h = self.hyp
        epoch_f = step.astype(jnp.float32) / self.steps_per_epoch
        epoch_i = jnp.floor(epoch_f)          # scheduler steps per epoch
        base_lr = h.lr0 * self.lr_factor(epoch_i)

        nw = float(self.warmup_steps)
        t = jnp.clip(step.astype(jnp.float32) / nw, 0.0, 1.0)
        in_warmup = step.astype(jnp.float32) < nw

        def warm(lr_start):
            return jnp.where(in_warmup, lr_start + t * (base_lr - lr_start), base_lr)

        lr0g = warm(0.0)                       # BN scales
        lr1g = warm(0.0)                       # kernels
        lr2g = warm(h.warmup_bias_lr)          # biases
        mom = jnp.where(in_warmup,
                        h.warmup_momentum + t * (h.momentum - h.warmup_momentum),
                        h.momentum)
        return (lr0g, lr1g, lr2g), mom

    def init(self, params) -> SGDState:
        return SGDState(momentum=jax.tree.map(jnp.zeros_like, params),
                        step=jnp.zeros((), jnp.int32))

    def update(self, grads, state: SGDState, params) -> Tuple[Any, SGDState]:
        """torch-SGD(nesterov) with per-group lr/decay: returns (new_params, state)."""
        (lr0g, lr1g, lr2g), mom = self.schedules(state.step)
        lrs = (lr0g, lr1g, lr2g)
        wd = self.weight_decay

        def upd(path, p, g, buf):
            grp = param_group(path)
            if (self.freeze_unrouted and _is_unrouted(path)) or \
                    _is_frozen(path, self.freeze):
                return p, buf
            g = g.astype(jnp.float32)
            if grp == 1:
                g = g + wd * p
            new_buf = mom * buf + g
            d = g + mom * new_buf            # nesterov
            return p - lrs[grp] * d, new_buf

        flat = jax.tree_util.tree_map_with_path(
            lambda path, p, g, b: upd(path, p, g, b), params, grads, state.momentum)
        new_params = jax.tree.map(lambda x: x[0], flat,
                                  is_leaf=lambda x: isinstance(x, tuple))
        new_buf = jax.tree.map(lambda x: x[1], flat,
                               is_leaf=lambda x: isinstance(x, tuple))
        return new_params, SGDState(momentum=new_buf, step=state.step + 1)


@dataclasses.dataclass(frozen=True)
class YoloAdam(YoloSGD):
    """The reference's --adam option (train.py:128-146): torch Adam with
    betas=(hyp.momentum, 0.999), the same 3 param groups (decay on kernels
    only, L2-into-grad like torch Adam), and the same per-iteration LR warmup.
    Momentum warmup does not apply — the reference's warmup loop only touches
    groups carrying a 'momentum' key, which Adam groups lack (train.py:321-323).

    State reuses SGDState with momentum = {'m': tree, 'v': tree} so checkpoint
    save/resume (utils/checkpoint.py) works unchanged."""

    def init(self, params) -> SGDState:
        return SGDState(
            momentum={"m": jax.tree.map(jnp.zeros_like, params),
                      "v": jax.tree.map(jnp.zeros_like, params)},
            step=jnp.zeros((), jnp.int32))

    def update(self, grads, state: SGDState, params) -> Tuple[Any, SGDState]:
        (lr0g, lr1g, lr2g), _ = self.schedules(state.step)
        lrs = (lr0g, lr1g, lr2g)
        wd = self.weight_decay
        b1, b2, eps = self.hyp.momentum, 0.999, 1e-8
        t = (state.step + 1).astype(jnp.float32)
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - b2 ** t

        def upd(path, p, g, m, v):
            grp = param_group(path)
            if (self.freeze_unrouted and _is_unrouted(path)) or \
                    _is_frozen(path, self.freeze):
                return p, m, v
            g = g.astype(jnp.float32)
            if grp == 1:
                g = g + wd * p
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * g * g
            step_sz = lrs[grp] * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            return p - step_sz, m, v

        flat = jax.tree_util.tree_map_with_path(
            lambda path, p, g, m, v: upd(path, p, g, m, v),
            params, grads, state.momentum["m"], state.momentum["v"])
        pick = lambda i: jax.tree.map(lambda x: x[i], flat,
                                      is_leaf=lambda x: isinstance(x, tuple))
        return pick(0), SGDState(momentum={"m": pick(1), "v": pick(2)},
                                 step=state.step + 1)
