"""Pallas kernel parity tests (interpret mode on CPU): the fused dual
cross-attention must match the einsum reference math exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icafusion_tpu.kernels.cross_attention import dual_cross_attention


def einsum_reference(vis, ir, w, b, h):
    B, N, D = vis.shape
    dk = D // h

    def proj(x, name):
        return x @ w[name] + b[name]

    def heads(t):
        return t.reshape(B, N, h, dk).transpose(0, 2, 1, 3)

    def attend(q, k, v):
        logits = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dk)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        a = e / e.sum(-1, keepdims=True)
        o = np.einsum("bhqk,bhkd->bhqd", a, v)
        return o.transpose(0, 2, 1, 3).reshape(B, N, D)

    q_vis, k_vis, v_vis = (heads(proj(vis, n)) for n in ("q_vis", "k_vis", "v_vis"))
    q_ir, k_ir, v_ir = (heads(proj(ir, n)) for n in ("q_ir", "k_ir", "v_ir"))
    return attend(q_ir, k_vis, v_vis), attend(q_vis, k_ir, v_ir)


@pytest.mark.parametrize("shape", [(2, 16, 64), (1, 100, 128)])
def test_dual_cross_attention_interpret(shape):
    B, N, D = shape
    h = 8
    rng = np.random.default_rng(0)
    vis = rng.normal(0, 1, (B, N, D)).astype(np.float32)
    ir = rng.normal(0, 1, (B, N, D)).astype(np.float32)
    names = ("q_vis", "k_vis", "v_vis", "q_ir", "k_ir", "v_ir")
    w = {n: rng.normal(0, 0.05, (D, D)).astype(np.float32) for n in names}
    b = {n: rng.normal(0, 0.01, (D,)).astype(np.float32) for n in names}

    out_vis, out_ir = dual_cross_attention(
        jnp.asarray(vis), jnp.asarray(ir),
        *[jnp.asarray(w[n]) for n in names],
        *[jnp.asarray(b[n]) for n in names],
        num_heads=h, interpret=True)
    ref_vis, ref_ir = einsum_reference(vis, ir, w, b, h)
    np.testing.assert_allclose(np.asarray(out_vis), ref_vis, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_ir), ref_ir, rtol=2e-4, atol=2e-5)


def test_pallas_nms_matches_scan():
    """Pallas greedy NMS (interpret) must equal the lax.scan formulation."""
    from icafusion_tpu.kernels.nms import pallas_greedy_nms
    from icafusion_tpu.ops.nms import _greedy_nms

    rng = np.random.default_rng(0)
    B, K = 2, 128
    boxes = np.zeros((B, K, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, 600, (B, K))
    boxes[..., 1] = rng.uniform(0, 600, (B, K))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(5, 100, (B, K))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(5, 100, (B, K))
    scores = -np.sort(-rng.uniform(0, 1, (B, K)).astype(np.float32), axis=1)
    scores[:, 100:] = -1.0  # padding

    keep_p, ok_p = pallas_greedy_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                     0.45, 30, interpret=True)
    keep_s, ok_s = jax.vmap(lambda b, s: _greedy_nms(b, s, 0.45, 30))(
        jnp.asarray(boxes), jnp.asarray(scores))
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_s))
    np.testing.assert_array_equal(np.asarray(keep_p)[np.asarray(ok_p)],
                                  np.asarray(keep_s)[np.asarray(ok_s)])


@pytest.mark.parametrize("shape", [(2, 32, 20), (1, 16, 12)])
def test_packed_conv_interpret(shape):
    """Pixel-packed 3x3 conv (experimental, rejected for the model path —
    see its docstring) must still match lax.conv + BN affine + SiLU exactly
    modulo the bf16 weight storage."""
    from icafusion_tpu.kernels.packed_conv import (pack_weights,
                                                   packed_conv3x3_silu)

    B, H, W = shape
    C = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.1
    s = rng.standard_normal(C).astype(np.float32) * 0.5 + 1.0
    b = rng.standard_normal(C).astype(np.float32) * 0.1
    # reference uses the same bf16-rounded folded weights the kernel stores
    wf = np.asarray((w * s).astype(jnp.bfloat16), np.float32) / s
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(wf), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) * s + b
    ref = ref * jax.nn.sigmoid(ref)

    w6, bias2 = pack_weights(w, s, b)
    out = packed_conv3x3_silu(x, w6, bias2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
