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


def profile_layers(model, variables, rgb, ir, iters: int = 5, verbose: bool = True):
    """Per-layer timing table — the forward_once(profile=True) analog
    (yolo_test.py:144-152). Captures every layer's real input from one forward
    pass, then times each layer's module in isolation (each is jitted separately;
    under the real jit the graph is fused, so these are relative numbers, like
    the reference's x10 loop). Returns a list of dicts."""
    from icafusion_tpu.models.assembler import MODULE_BUILDERS, resolve_model

    resolved, save = resolve_model(model.cfg)
    n = len(resolved)
    out, caps = model.apply(variables, rgb, ir, train=False, decode=False,
                            capture=tuple(range(n)))
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    rows = []
    for r in resolved[:-1]:  # Detect handled by the full decode path
        if r.f == -4:
            inp = ir
        elif r.f == -1:
            inp = caps[r.i - 1] if r.i > 0 else rgb
        elif isinstance(r.f, int):
            inp = caps[r.f]
        else:
            inp = [caps[j] if j >= 0 else caps[r.i - 1] for j in r.f]
        key = f"m{r.i}"
        sub = {"params": params.get(key, {}), "batch_stats": stats.get(key, {})}
        mod = MODULE_BUILDERS[r.module](r.args, model.dtype, "m")

        def fwd(v, x):
            return mod.apply(v, x, train=False)

        n_params = count_params(sub["params"])
        try:
            ms = profile_op(fwd, sub, inp, iters=iters)
        except Exception as e:  # modules returning tuples etc.
            ms = float("nan")
        rows.append({"i": r.i, "module": r.module, "ms": ms, "params": n_params})
        if verbose:
            print(f"{r.i:3d} {r.module:28s} {ms:8.2f} ms {n_params / 1e3:10.1f}k")
    return rows


def start_trace(logdir: str):
    """Full device trace (jax.profiler) viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)


def stop_trace():
    jax.profiler.stop_trace()
