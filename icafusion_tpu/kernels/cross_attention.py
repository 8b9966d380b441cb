"""Pallas TPU kernel: fused dual cross-attention (the DMFF hot loop).

Computes BOTH directions of ICAFusion's cross-attention
(reference models/common.py:641-687) in one kernel:

    out_vis[b] = softmax(q_ir  @ k_vis^T * scale) @ v_vis
    out_ir[b]  = softmax(q_vis @ k_ir^T  * scale) @ v_ir

per (batch, head) grid program. Fusion wins vs the XLA path:
- the LN'd vis/ir token matrices are loaded into VMEM once and reused by all six
  projections of both directions (the XLA graph reloads them per matmul);
- q/k/v, the NxN logits, softmax and the attention product never round-trip HBM —
  sequence lengths are fixed by config (<=400: vert*horz anchors), so everything
  for one (batch, head) fits comfortably in VMEM;
- one launch instead of ~14 ops.

Inference path only: the training path keeps the differentiable einsum
implementation (attention dropout needs RNG plumbing and XLA's fusion is adequate
at training batch sizes).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dca_kernel(vis_ref, ir_ref,
                wq_vis_ref, wk_vis_ref, wv_vis_ref,
                wq_ir_ref, wk_ir_ref, wv_ir_ref,
                bq_vis_ref, bk_vis_ref, bv_vis_ref,
                bq_ir_ref, bk_ir_ref, bv_ir_ref,
                out_vis_ref, out_ir_ref, *, scale: float):
    vis = vis_ref[0]          # (N, D)
    ir = ir_ref[0]            # (N, D)

    h = pl.program_id(1)

    def proj(x, w_ref, b_ref):
        # b_ref holds all heads' biases (H, dk); pick this program's row
        return (jnp.dot(x, w_ref[0], preferred_element_type=jnp.float32)
                + b_ref[h, :].astype(jnp.float32)[None, :])

    # six projections, two directions, one pass over the inputs
    q_vis = proj(vis, wq_vis_ref, bq_vis_ref)   # (N, dk)
    k_vis = proj(vis, wk_vis_ref, bk_vis_ref)
    v_vis = proj(vis, wv_vis_ref, bv_vis_ref)
    q_ir = proj(ir, wq_ir_ref, bq_ir_ref)
    k_ir = proj(ir, wk_ir_ref, bk_ir_ref)
    v_ir = proj(ir, wv_ir_ref, bv_ir_ref)

    def attend(q, k, v):
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # (N, N)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        return jnp.dot(p, v, preferred_element_type=jnp.float32)

    out_vis_ref[0, 0] = attend(q_ir, k_vis, v_vis).astype(out_vis_ref.dtype)
    out_ir_ref[0, 0] = attend(q_vis, k_ir, v_ir).astype(out_ir_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def dual_cross_attention(vis, ir, wq_vis, wk_vis, wv_vis, wq_ir, wk_ir, wv_ir,
                         bq_vis, bk_vis, bv_vis, bq_ir, bk_ir, bv_ir,
                         num_heads: int = 8, interpret: bool = False):
    """vis/ir: (B, N, D) LayerNorm'd tokens. w*: (D, D) packed projections
    (flax kernel layout, in->out); b*: (D,). Returns (out_vis, out_ir) each
    (B, N, D) — the per-head attention results concatenated, BEFORE the output
    projections (those are plain matmuls handled by XLA)."""
    B, N, D = vis.shape
    dk = D // num_heads
    scale = 1.0 / math.sqrt(dk)

    grid = (B, num_heads)
    # TPU block shapes must tile to (8,128) or equal the full array dims: weights
    # are pre-split per head to (H, D, dk) and outputs emitted as (B, H, N, dk)
    # so every block covers its trailing dims exactly.
    tok_spec = pl.BlockSpec((1, N, D), lambda b, h: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, D, dk), lambda b, h: (h, 0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((num_heads, dk), lambda b, h: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, N, dk), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((B, num_heads, N, dk), vis.dtype),
                 jax.ShapeDtypeStruct((B, num_heads, N, dk), vis.dtype)]
    weights = [w.reshape(D, num_heads, dk).transpose(1, 0, 2)
               for w in (wq_vis, wk_vis, wv_vis, wq_ir, wk_ir, wv_ir)]
    biases = [b.reshape(num_heads, dk) for b in
              (bq_vis, bk_vis, bv_vis, bq_ir, bk_ir, bv_ir)]

    out_vis, out_ir = pl.pallas_call(
        functools.partial(_dca_kernel, scale=scale),
        grid=grid,
        in_specs=[tok_spec, tok_spec] + [w_spec] * 6 + [b_spec] * 6,
        out_specs=[out_spec, out_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(vis, ir, *weights, *biases)
    # (B, H, N, dk) -> (B, N, H*dk)
    out_vis = out_vis.transpose(0, 2, 1, 3).reshape(B, N, D)
    out_ir = out_ir.transpose(0, 2, 1, 3).reshape(B, N, D)
    return out_vis, out_ir
