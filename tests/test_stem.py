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
