"""adaptive_pool2d: floor-mode reference parity (common.py:868-891) when both
dims >= target, true torch AdaptiveAvg/MaxPool2d semantics (the reference's own
original, common.py:775-776) on small/rect geometries where the reference's
floor-mode crashes (stride 0). Regression for the round-4 soak failure:
`cli/val --rect --int8 --merge` at 320 on 256x320 sources hit
"reduce_window window_strides must have every element be strictly positive"."""

import jax.numpy as jnp
import numpy as np
import pytest

from icafusion_tpu.nn.fusion import adaptive_pool2d

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("pool_type", ["avg", "max"])
@pytest.mark.parametrize("h,w,oh,ow", [
    (8, 10, 10, 10),    # both dims < target (old code: wrong-shape passthrough)
    (14, 20, 16, 16),   # h < target, w > target (old code: stride-0 crash)
    (20, 14, 16, 16),   # transposed mixed case
    (3, 3, 10, 10),     # tiny input, big target
    (5, 40, 20, 20),    # extreme rect
    (9, 10, 10, 10),    # one dim off by one
])
def test_small_geometry_matches_torch_adaptive(h, w, oh, ow, pool_type):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, h, w, 4)).astype(np.float32)
    y = np.asarray(adaptive_pool2d(jnp.asarray(x), oh, ow, pool_type))
    tmod = (torch.nn.AdaptiveAvgPool2d if pool_type == "avg"
            else torch.nn.AdaptiveMaxPool2d)((oh, ow))
    t = tmod(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    assert y.shape == (2, oh, ow, 4)
    np.testing.assert_allclose(y, t.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("pool_type", ["avg", "max"])
@pytest.mark.parametrize("h,w,oh,ow", [
    (40, 40, 20, 20),   # exact divisor
    (13, 17, 10, 10),   # floor-mode with remainder
    (16, 20, 16, 16),   # one dim equal, one larger
])
def test_large_geometry_keeps_floor_mode(h, w, oh, ow, pool_type):
    """Both dims >= target must stay on the reference's floor-mode path
    (stride=in//out, kernel=in-(out-1)*stride) — parity, not torch-adaptive."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, h, w, 4)).astype(np.float32)
    y = np.asarray(adaptive_pool2d(jnp.asarray(x), oh, ow, pool_type))
    sh, sw = h // oh, w // ow
    kh, kw = h - (oh - 1) * sh, w - (ow - 1) * sw
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    tmod = (torch.nn.AvgPool2d if pool_type == "avg"
            else torch.nn.MaxPool2d)((kh, kw), stride=(sh, sw))
    np.testing.assert_allclose(y, tmod(t).permute(0, 2, 3, 1).numpy(),
                               rtol=1e-5, atol=1e-6)


def test_identity_passthrough():
    x = jnp.arange(2 * 10 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 10, 3)
    assert adaptive_pool2d(x, 10, 10, "avg") is x


def test_multiscale_buckets_all_viable_for_tfb():
    """The pool fallback makes every multi-scale bucket traceable for
    Transfusion: 0.75*320=224 puts a 7x7 P5 map into the (10,10) grid, which
    the reference cannot run at all (train.py:325-331 would crash in its
    AdaptivePool2d). viable_train_scales must now keep the full set."""
    import jax

    from icafusion_tpu.models import build_model
    from icafusion_tpu.models.zoo import icafusion_config
    from icafusion_tpu.train.fit import viable_train_scales

    mc = icafusion_config("n", nc=3, fusion="tfb")
    model = build_model(mc)
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 320, 320, 3), jnp.float32),
                           jnp.zeros((1, 320, 320, 3), jnp.float32),
                           train=False))
    scales = (0.75, 0.875, 1.0, 1.125, 1.25)
    kept = viable_train_scales(model, variables["params"],
                               variables["batch_stats"], 320, 320, scales,
                               log=lambda *a, **k: None)
    assert tuple(kept) == scales


@pytest.mark.slow
def test_tfb_model_forward_rect_geometry():
    """Full zoo:tfb:n forward at the soak's rect val shapes. 224x320 put a
    14x20 map into the P4 TFB (16,16) grid -> old stride-0 crash; 288x320
    put 9x10 into the P5 (10,10) grid -> old wrong-shape passthrough."""
    import jax

    from icafusion_tpu.models import build_model
    from icafusion_tpu.models.zoo import icafusion_config

    mc = icafusion_config("n", nc=3, fusion="tfb")
    model = build_model(mc)
    for hh, ww in [(224, 320), (288, 320)]:
        rgb = jnp.zeros((1, hh, ww, 3), jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, rgb, rgb,
                               train=False)
        pred, _, _ = model.apply(variables, rgb, rgb, train=False, decode=True)
        assert np.isfinite(np.asarray(pred)).all()
