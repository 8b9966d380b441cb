"""Model summary, FLOPs, and per-layer profiling.

Behavioral counterparts of reference utils/torch_utils.py:205-235 (model_info:
params + thop GFLOPs) and models/yolo_test.py:144-152 (forward_once
profile=True: per-layer latency). FLOPs come from XLA's own cost analysis
instead of thop; per-layer timing jits each layer's module in isolation
(under jit the real model is one fused program — per-layer numbers are for
relative comparison, like the reference's x10-loop timings).

Also exposes trace()/stop_trace() wrappers around jax.profiler for full
TensorBoard-viewable device traces (SURVEY §5.1).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def flops_estimate(fn, *args) -> Optional[float]:
    """Total FLOPs of a jitted callable from XLA cost analysis (thop analog)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None


def model_info(model, variables, img_size: int = 640, verbose: bool = True):
    """Summary line like model_info (torch_utils.py:205-235): layers, params,
    GFLOPs at img_size (two-stream forward)."""
    n_params = count_params(variables["params"])
    resolved, _ = __import__("icafusion_tpu.models.assembler",
                             fromlist=["resolve_model"]).resolve_model(model.cfg)
    x = jnp.zeros((1, img_size, img_size, 3), jnp.float32)

    def fwd(v, a, b):
        return model.apply(v, a, b, train=False, decode=False)

    flops = flops_estimate(fwd, variables, x, x)
    gflops = (flops or 0.0) / 1e9
    line = (f"Model Summary: {len(resolved)} layers, {n_params / 1e6:.2f}M params, "
            f"{gflops:.1f} GFLOPs @ {img_size} (paired forward)")
    if verbose:
        print(line)
    return {"layers": len(resolved), "params": n_params, "gflops": gflops}


def profile_op(fn, *args, iters: int = 10) -> float:
    """ms per call of a jitted fn, chained-sync timing (torch_utils.py:96-132
    analog). Only meaningful relative to other ops measured the same way."""
    f = jax.jit(fn)
    out = f(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    # chain on a scalar to defeat async-dispatch overlap
    t0 = time.time()
    carry = 0.0
    for _ in range(iters):
        out = f(*args)
        carry = carry + jax.tree.leaves(out)[0].sum()
    float(carry)
    return (time.time() - t0) / iters * 1e3


def start_trace(logdir: str):
    """Full device trace (jax.profiler) viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)


def stop_trace():
    jax.profiler.stop_trace()
