"""Cross-modal fusion modules — the core of ICAFusion (DMFF / dual cross-attention).

Behavioral counterparts of reference models/common.py:324-891:

- ``Add``                 fixed-weight blend of the two streams        (common.py:324-331)
- ``Add2``                add one element of a 2-list to x             (common.py:334-345)
- ``NiNfusion``           concat -> 1x1 conv (c->c/2) -> SiLU          (common.py:348-360)
- ``DMAF``                differential-modality gating                 (common.py:363-383)
- ``CrossAttention``      dual cross-attention: each modality queried
                          by the other                                 (common.py:590-687)
- ``CrossTransformerBlock`` pre/post-LN block with 8 learnable residual
                          gains + parameter-shared iteration           (common.py:690-759)
- ``TransformerFusionBlock`` (DMFF): learned avg/max downsample to a
                          fixed grid, pos-emb, cross transformer,
                          upsample + residual, concat + 1x1 conv       (common.py:762-865)
- ``AdaptivePool2d``      floor-mode adaptive pooling                  (common.py:868-891)

TPU notes: sequence lengths are fixed by config (vert*horz anchors <= 400), so the whole
dual attention fits in VMEM; compute runs in the module dtype (bf16 on TPU) with softmax
in fp32. A fused Pallas kernel (kernels/cross_attention.py) can replace the einsum path.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from icafusion_tpu.nn.layers import Conv, TORCH_CONV_INIT

Dtype = Any

# global switch for the fused attention kernel (bench A/B; see CrossAttention)
PALLAS_ENABLED = True


def set_pallas_enabled(flag: bool):
    global PALLAS_ENABLED
    PALLAS_ENABLED = bool(flag)


class Add(nn.Module):
    """w*x0 + (1-w)*x1 (common.py:324-331). YAML arg is the (ignored) channel count;
    weight stays at the reference default 0.5."""
    c2: int = 0
    weight: float = 0.5

    def __call__(self, xs, train: bool = False):
        return xs[0] * self.weight + xs[1] * (1.0 - self.weight)


class Add2(nn.Module):
    """x + other[index] where other is a 2-list (common.py:334-345)."""
    c1: int = 0
    index: int = 0

    def __call__(self, xs, train: bool = False):
        return xs[0] + xs[1][self.index]


class NiNfusion(nn.Module):
    """concat(streams) -> 1x1 conv(bias=False) -> SiLU (common.py:348-360)."""
    c1: int
    c2: int
    k: int = 1
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        y = jnp.concatenate(list(xs), axis=-1)
        p = self.k // 2
        y = nn.Conv(self.c2, kernel_size=(self.k, self.k), strides=(self.s, self.s),
                    padding=[(p, p), (p, p)], use_bias=False,
                    kernel_init=TORCH_CONV_INIT, dtype=self.dtype, name="conv")(y)
        return jax.nn.silu(y)


class DMAF(nn.Module):
    """Differential modality-aware gating (common.py:363-383).

    Returns a 2-tuple (x1_weight, x2_weight): each stream's difference map gated by
    tanh(global-avg-pool) of the *other* direction's difference."""
    c2: int = 0

    def __call__(self, xs, train: bool = False):
        x1, x2 = xs[0], xs[1]
        sub_vis = x1 - x2
        w_vis = jnp.tanh(jnp.mean(sub_vis, axis=(1, 2), keepdims=True))
        sub_ir = x2 - x1
        w_ir = jnp.tanh(jnp.mean(sub_ir, axis=(1, 2), keepdims=True))
        return sub_vis * w_ir, sub_ir * w_vis


def _adaptive_pool_axis(x, axis: int, m: int, pool_type: str):
    """True torch-adaptive pooling along one axis: output i covers input
    [floor(i*n/m), ceil((i+1)*n/m)). Exact (m,)-sized output for ANY n,
    including n < m (windows of size >= 1, shared between outputs)."""
    import numpy as _np
    n = x.shape[axis]
    if n == m:
        return x
    starts = [(i * n) // m for i in range(m)]
    ends = [-((-(i + 1) * n) // m) for i in range(m)]
    if pool_type == "avg":
        mat = _np.zeros((n, m), _np.float32)
        for i, (s, e) in enumerate(zip(starts, ends)):
            mat[s:e, i] = 1.0 / (e - s)
        y = jnp.moveaxis(x, axis, -1) @ jnp.asarray(mat, x.dtype)
        return jnp.moveaxis(y, -1, axis)
    kmax = max(e - s for s, e in zip(starts, ends))
    # pad each window by repeating its last valid index (harmless under max)
    idx = _np.asarray([[min(s + j, e - 1) for j in range(kmax)]
                       for s, e in zip(starts, ends)], _np.int32)
    g = jnp.take(x, jnp.asarray(idx.reshape(-1)), axis=axis)
    g = jnp.moveaxis(g, axis, 0).reshape((m, kmax) + g.shape[:axis]
                                         + g.shape[axis + 1:])
    return jnp.moveaxis(g.max(axis=1), 0, axis)


def adaptive_pool2d(x, out_h: int, out_w: int, pool_type: str = "avg"):
    """Adaptive pooling to exactly (out_h, out_w).

    When both dims >= target: floor-mode parity with the reference's
    AdaptivePool2d (common.py:868-891) — stride = in//out,
    kernel = in - (out-1)*stride, no padding. Otherwise (small/rect feature
    maps where the reference's floor-mode crashes with stride 0 in torch
    AvgPool2d) fall back to true torch AdaptiveAvg/MaxPool2d semantics — the
    reference's own original implementation (common.py:775-776) — which is
    defined for every geometry."""
    b, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x
    if h >= out_h and w >= out_w:
        sh, sw = h // out_h, w // out_w
        kh, kw = h - (out_h - 1) * sh, w - (out_w - 1) * sw
        if pool_type == "avg":
            return nn.avg_pool(x, (kh, kw), strides=(sh, sw), padding="VALID")
        return nn.max_pool(x, (kh, kw), strides=(sh, sw), padding="VALID")
    x = _adaptive_pool_axis(x, 1, out_h, pool_type)
    return _adaptive_pool_axis(x, 2, out_w, pool_type)


class _QDense(nn.Module):
    """nn.Dense-compatible layer (same param tree: kernel/bias, same init)
    that serves from int8 weights when utils/quantize.py has populated a
    'quant' collection for it (weight-only: w ~= w8 * s_w per out-channel).

    The fusion transformer's matmuls run at tiny M (100-400 tokens x batch)
    and are weight-bandwidth-bound (round-4 profile: 169 GB/s on the P5 MLPs)
    — int8 weights halve the HBM traffic; the dequant multiply fuses into the
    dot's operand load. Eval-only, lossless param layout, opt-in via
    quantize_variables(fusion_dense=True)."""
    features: int
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", self.kernel_init,
                       (x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        if self.has_variable("quant", "w8"):
            w8 = self.get_variable("quant", "w8")
            s_w = self.get_variable("quant", "s_w")
            k = w8.astype(self.dtype) * s_w.astype(self.dtype)
        else:
            k = k.astype(self.dtype)
        return x.astype(self.dtype) @ k + b.astype(self.dtype)


class _Proj(nn.Module):
    """Dense-parameter holder (same param tree as nn.Dense: kernel/bias) whose
    weights can be consumed either by the einsum path or the fused Pallas kernel."""
    d_in: int
    d_out: int
    std: float = 0.001

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.normal(stddev=self.std),
                       (self.d_in, self.d_out), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.d_out,), jnp.float32)
        return k, b


class CrossAttention(nn.Module):
    """Dual cross-attention (common.py:590-687).

    Per-modality LayerNorm and separate Q/K/V/out projections; the two directions are
        att_vis = softmax(q_ir @ k_vis^T / sqrt(dk)) @ v_vis   (common.py:670-682)
        att_ir  = softmax(q_vis @ k_ir^T / sqrt(dk)) @ v_ir
    i.e. each modality's features are *queried by the other*. Returns [out_vis, out_ir].

    Projection init follows the reference (normal std=0.001, zero bias —
    common.py:627-639). dk = d_model // h (common.py:601).

    Inference on TPU runs the fused Pallas kernel (kernels/cross_attention.py);
    training keeps the differentiable einsum path (identical math, plus dropout)."""
    d_model: int
    h: int = 8
    attn_pdrop: float = 0.1
    resid_pdrop: float = 0.1
    use_pallas: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        vis, ir = xs[0], xs[1]
        b, n, c = vis.shape
        dk = self.d_model // self.h
        d = self.d_model

        proj_w = {name: _Proj(d, d, name=name)()
                  for name in ("q_vis", "k_vis", "v_vis", "q_ir", "k_ir", "v_ir")}

        vis_n = nn.LayerNorm(dtype=jnp.float32, name="ln_vis")(vis)
        ir_n = nn.LayerNorm(dtype=jnp.float32, name="ln_ir")(ir)

        use_kernel = (self.use_pallas and PALLAS_ENABLED and not train
                      and jax.default_backend() != "cpu")
        if use_kernel:
            from icafusion_tpu.kernels.cross_attention import dual_cross_attention
            w = {k: v[0].astype(self.dtype) for k, v in proj_w.items()}
            bb = {k: v[1].astype(jnp.float32) for k, v in proj_w.items()}
            out_vis, out_ir = dual_cross_attention(
                vis_n.astype(self.dtype), ir_n.astype(self.dtype),
                w["q_vis"], w["k_vis"], w["v_vis"],
                w["q_ir"], w["k_ir"], w["v_ir"],
                bb["q_vis"], bb["k_vis"], bb["v_vis"],
                bb["q_ir"], bb["k_ir"], bb["v_ir"], num_heads=self.h)
        else:
            def proj(x, name):
                k, bias = proj_w[name]
                return (x.astype(self.dtype) @ k.astype(self.dtype)
                        + bias.astype(self.dtype))

            def heads(t):  # (b, n, d) -> (b, h, n, dk)
                return t.reshape(b, n, self.h, dk).transpose(0, 2, 1, 3)

            q_vis = heads(proj(vis_n, "q_vis"))
            k_vis = heads(proj(vis_n, "k_vis"))
            v_vis = heads(proj(vis_n, "v_vis"))
            q_ir = heads(proj(ir_n, "q_ir"))
            k_ir = heads(proj(ir_n, "k_ir"))
            v_ir = heads(proj(ir_n, "v_ir"))
            scale = 1.0 / math.sqrt(dk)

            def attend(q, k, v):
                logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                    preferred_element_type=jnp.float32) * scale
                a = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
                a = nn.Dropout(self.attn_pdrop, deterministic=not train)(a)
                o = jnp.einsum("bhqk,bhkd->bhqd", a, v,
                               preferred_element_type=jnp.float32)
                return o.astype(self.dtype).transpose(0, 2, 1, 3).reshape(b, n, d)

            out_vis = attend(q_ir, k_vis, v_vis)   # vis values, ir queries
            out_ir = attend(q_vis, k_ir, v_ir)     # ir values, vis queries

        w_init = nn.initializers.normal(stddev=0.001)
        out_vis = _QDense(d, kernel_init=w_init, dtype=self.dtype,
                          name="out_vis")(out_vis.astype(self.dtype))
        out_vis = nn.Dropout(self.resid_pdrop, deterministic=not train)(out_vis)
        out_ir = _QDense(d, kernel_init=w_init, dtype=self.dtype,
                         name="out_ir")(out_ir.astype(self.dtype))
        out_ir = nn.Dropout(self.resid_pdrop, deterministic=not train)(out_ir)
        return [out_vis, out_ir]


class CrossTransformerBlock(nn.Module):
    """Cross-attention transformer block with learnable residual gains and
    parameter-shared iteration (common.py:690-759).

    The same weights are re-applied ``loops_num`` times (the paper's iterative
    parameter-sharing — common.py:744-750). The MLP input LayerNorm is *shared*
    between the two modalities, matching the reference's single ``LN2``
    (common.py:749-750)."""
    d_model: int
    h: int = 8
    block_exp: int = 4
    attn_pdrop: float = 0.1
    resid_pdrop: float = 0.1
    loops_num: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        vis, ir = xs[0], xs[1]
        cross = CrossAttention(self.d_model, self.h, self.attn_pdrop,
                               self.resid_pdrop, dtype=self.dtype, name="crossatt")
        mlp_ln = nn.LayerNorm(dtype=jnp.float32, name="mlp_ln")  # shared LN2

        def mlp(name):
            def f(x):
                y = _QDense(self.block_exp * self.d_model, dtype=self.dtype,
                            kernel_init=TORCH_CONV_INIT,
                            name=f"{name}_fc1")(x)
                y = jax.nn.gelu(y, approximate=False)
                y = _QDense(self.d_model, dtype=self.dtype,
                            kernel_init=TORCH_CONV_INIT, name=f"{name}_fc2")(y)
                return nn.Dropout(self.resid_pdrop, deterministic=not train)(y)
            return f

        mlp_vis = mlp("mlp_vis")
        mlp_ir = mlp("mlp_ir")
        # 8 learnable scalar residual gains, init 1.0 (common.py:728-735)
        coef = self.param("coefficients", nn.initializers.ones, (8,), jnp.float32)
        c = [coef[i].astype(self.dtype) for i in range(8)]

        for _ in range(self.loops_num):  # parameter-shared iterations
            a_vis, a_ir = cross([vis, ir], train=train)
            vis_att = c[0] * vis + c[1] * a_vis
            ir_att = c[2] * ir + c[3] * a_ir
            vis = c[4] * vis_att + c[5] * mlp_vis(mlp_ln(vis_att).astype(self.dtype))
            ir = c[6] * ir_att + c[7] * mlp_ir(mlp_ln(ir_att).astype(self.dtype))
        return [vis, ir]


class LearnableWeights(nn.Module):
    """Two learnable scalars blending two inputs, init 0.5/0.5 (common.py:579-587)."""
    @nn.compact
    def __call__(self, x1, x2):
        w1 = self.param("w1", nn.initializers.constant(0.5), (1,), jnp.float32)
        w2 = self.param("w2", nn.initializers.constant(0.5), (1,), jnp.float32)
        return x1 * w1.astype(x1.dtype) + x2 * w2.astype(x2.dtype)


class TransformerFusionBlock(nn.Module):
    """DMFF: the TransformerFusionBlock (common.py:762-865).

    Pipeline per modality:
      1. learned avg/max-pool blend down to (vert, horz) anchors   (common.py:816-822)
      2. flatten + learned 2D positional embedding (zeros init)    (common.py:773-774,:819)
      3. n_layer CrossTransformerBlocks                            (common.py:791,:825)
      4. reshape + upsample back (nearest in train / bilinear eval) (common.py:828-837)
      5. residual add to the unpooled input                         (common.py:832,:838)
    then concat both modalities and 1x1 Conv to d_model             (common.py:840-841).

    YAML args are [d_model, vert_anchors, horz_anchors]; P3/P4/P5 use (256,20,20),
    (512,16,16), (1024,10,10) (yolov5l_Transfusion_FLIR.yaml:39-41)."""
    d_model: int
    vert_anchors: int = 16
    horz_anchors: int = 16
    h: int = 8
    block_exp: int = 4
    n_layer: int = 1
    embd_pdrop: float = 0.1
    attn_pdrop: float = 0.1
    resid_pdrop: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        vis, ir = xs[0], xs[1]
        b, hh, ww, c = vis.shape
        va, ha = self.vert_anchors, self.horz_anchors
        seq = va * ha

        pos_vis = self.param("pos_emb_vis", nn.initializers.zeros,
                             (1, seq, self.d_model), jnp.float32)
        pos_ir = self.param("pos_emb_ir", nn.initializers.zeros,
                            (1, seq, self.d_model), jnp.float32)

        def pool_flat(x, coeff_name, pos):
            a = adaptive_pool2d(x, va, ha, "avg")
            m = adaptive_pool2d(x, va, ha, "max")
            y = LearnableWeights(name=coeff_name)(a, m)      # (b, va, ha, c)
            assert y.shape[1] == va and y.shape[2] == ha, (
                f"adaptive_pool2d produced {y.shape[1:3]} for anchor grid "
                f"{va}x{ha} (input {hh}x{ww})")
            return y.reshape(b, seq, c) + pos.astype(y.dtype)

        vis_flat = pool_flat(vis, "vis_coefficient", pos_vis)
        ir_flat = pool_flat(ir, "ir_coefficient", pos_ir)

        for i in range(self.n_layer):
            vis_flat, ir_flat = CrossTransformerBlock(
                self.d_model, self.h, self.block_exp, self.attn_pdrop,
                self.resid_pdrop, dtype=self.dtype,
                name=f"crosstransformer{i}")([vis_flat, ir_flat], train=train)

        def up_residual(flat, x):
            y = flat.reshape(b, va, ha, c)
            # train: nearest; eval: bilinear (common.py:828-837). torch nearest
            # maps dst i -> src floor(i*in/out) (asymmetric), NOT half-pixel
            # centers like jax.image.resize, so gather with precomputed indices
            # (exact for all ratios, incl. the non-integer 16->40 at P4).
            # Eval bilinear align_corners=False IS half-pixel == jax 'linear'.
            if train:
                import numpy as _np
                iy = _np.floor(_np.arange(hh) * (va / hh)).astype(_np.int32)
                ix = _np.floor(_np.arange(ww) * (ha / ww)).astype(_np.int32)
                y = y[:, iy][:, :, ix]
            else:
                y = jax.image.resize(y, (b, hh, ww, c), method="linear")
            return y.astype(x.dtype) + x

        new_vis = up_residual(vis_flat, vis)
        new_ir = up_residual(ir_flat, ir)
        y = jnp.concatenate([new_vis, new_ir], axis=-1)
        return Conv(self.d_model * 2, self.d_model, k=1, s=1, p=0,
                    dtype=self.dtype, name="conv1x1_out")(y, train)
