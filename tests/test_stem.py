"""The space-to-depth stem re-expression must be numerically identical to the
direct 6x6/s2 convolution with the same kernel."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

import icafusion_tpu.nn.layers as L
from icafusion_tpu.nn.layers import Conv


@pytest.fixture(autouse=True)
def enable_s2d(monkeypatch):
    monkeypatch.setattr(L, "STEM_S2D_ENABLED", True)


def test_stem_s2d_equals_direct_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32))
    m = Conv(3, 32, 6, 2, 2)
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    kernel = variables["params"]["conv"]["kernel"]
    assert kernel.shape == (6, 6, 3, 32)  # checkpoint layout unchanged

    y = m.apply(variables, x, train=False)
    # direct reference conv with the same kernel
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y_ref = jax.lax.conv_general_dilated(x, jnp.asarray(kernel), (2, 2),
                                         [(2, 2), (2, 2)], dimension_numbers=dn)
    # strip BN (identity at init: mean 0, var 1) and SiLU for comparison:
    # instead compare pre-activation by applying the same BN+SiLU to y_ref
    eps = 1e-3
    y_ref = y_ref / jnp.sqrt(1.0 + eps)
    y_ref = jax.nn.silu(y_ref)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    assert y.shape == (2, 32, 32, 32)


def test_odd_size_falls_back():
    # odd spatial dims can't space-to-depth; the direct conv path must be used
    x = jnp.zeros((1, 65, 62, 3))
    m = Conv(3, 16, 6, 2, 2)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 32, 31, 16)


class _Holder:
    dtype = jnp.float32


@pytest.mark.parametrize("shape", [(2, 8, 8, 3, 4), (1, 16, 12, 6, 8),
                                   (2, 80, 80, 6, 128), (1, 64, 80, 3, 64)])
def test_phase_packed_int8_stem_bit_exact(shape):
    """The phase-packed int8 stem (s2d4 input blocks, 2x2 conv, packed output
    phases) is the same integer arithmetic as the direct 6x6/s2/p2 lowering —
    outputs must be bit-identical, square and rect, merged (Cin=6) and not."""
    B, H, W, C, Co = shape
    rng = np.random.default_rng(7)
    x8 = jnp.asarray(rng.integers(-127, 128, (B, H, W, C), dtype=np.int8))
    w8 = jnp.asarray(rng.integers(-127, 128, (6, 6, C, Co), dtype=np.int8))
    s_w = jnp.asarray(rng.uniform(0.5, 2, (Co,)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x8, w8, (2, 2), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32).astype(jnp.float32) * s_w
    pp = Conv._phase_packed_stem(_Holder(), x8, w8, s_w)
    assert pp.shape == (B, H // 2, W // 2, Co)
    np.testing.assert_array_equal(np.asarray(pp), np.asarray(ref))


def test_phase_packed_int8_stem_in_model_path(monkeypatch):
    """ICAF_STEM_PP routes the quantized 6x6/s2 Conv through the packed path
    and matches the direct int8 path bit-for-bit through BN+SiLU."""
    monkeypatch.setattr(L, "STEM_S2D_ENABLED", False)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 6)).astype(np.float32))
    m = Conv(6, 32, 6, 2, 2)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    w = np.asarray(v["params"]["conv"]["kernel"], np.float32)
    s_in = np.abs(np.asarray(x)).max(axis=(0, 1, 2)) / 127.0
    ws = w * s_in[None, None, :, None]
    s_wq = np.abs(ws).max(axis=(0, 1, 2)) / 127.0
    w8 = np.clip(np.round(ws / s_wq), -127, 127).astype(np.int8)
    quant = {"w8": jnp.asarray(w8), "s_w": jnp.asarray(s_wq),
             "s_in": jnp.asarray(s_in)}
    vq = {"params": v["params"], "batch_stats": v["batch_stats"],
          "quant": quant}
    monkeypatch.setattr(L, "STEM_PP_ENABLED", False)
    y_direct = m.apply(vq, x, train=False)
    monkeypatch.setattr(L, "STEM_PP_ENABLED", True)
    y_packed = m.apply(vq, x, train=False)
    np.testing.assert_array_equal(np.asarray(y_direct), np.asarray(y_packed))
