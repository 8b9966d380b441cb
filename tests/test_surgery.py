"""Model-surgery tests: conv+BN folding, Grad-CAM, ensemble, TTA, model info."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icafusion_tpu.models import build_model
from icafusion_tpu.models.zoo import tiny_icafusion_config

CFG = tiny_icafusion_config(nc=3)


@pytest.fixture(scope="module")
def model_vars():
    model = build_model(CFG)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, 64, 64, 3))
    variables = jax.jit(model.init, static_argnames=("train", "decode"))(
        {"params": rng}, x, x, train=False, decode=False)
    # non-trivial BN stats so folding actually changes parameters
    variables = dict(variables)
    variables["batch_stats"] = jax.tree.map(
        lambda v: v + jax.random.uniform(rng, v.shape) * 0.3,
        variables["batch_stats"])
    return model, variables, x


@pytest.mark.slow
def test_fold_conv_bn_preserves_outputs(model_vars):
    from icafusion_tpu.ops.fuse import fold_conv_bn
    model, variables, x = model_vars
    fused = fold_conv_bn(variables)
    apply = jax.jit(model.apply, static_argnames=("train", "decode"))
    ref, _, _ = apply(variables, x, x, train=False, decode=True)
    out, _, _ = apply(fused, x, x, train=False, decode=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # kernels actually changed (fold is not a no-op)
    k0 = np.asarray(variables["params"]["m0"]["conv"]["kernel"])
    k1 = np.asarray(fused["params"]["m0"]["conv"]["kernel"])
    assert np.abs(k0 - k1).max() > 1e-6


@pytest.mark.slow
def test_gradcam(model_vars):
    from icafusion_tpu.models.gradcam import default_cam_layers, gradcam_saliency
    model, variables, x = model_vars
    layers = default_cam_layers(CFG)
    assert len(layers) == 3
    sal = gradcam_saliency(model, variables, x, x, layer=layers[0],
                           upsample_to=(64, 64))
    sal = np.asarray(sal)
    assert sal.shape == (1, 64, 64)
    assert np.isfinite(sal).all()
    assert sal.max() <= 1.0 + 1e-5 and sal.min() >= 0.0


@pytest.mark.slow
def test_ensemble_concat(model_vars):
    from icafusion_tpu.models.ensemble import ensemble_predict
    model, variables, x = model_vars
    pred1, _, _ = jax.jit(model.apply, static_argnames=("train", "decode"))(
        variables, x, x, train=False, decode=True)
    pred, logits = ensemble_predict([(model, variables), (model, variables)], x, x)
    assert pred.shape[1] == 2 * pred1.shape[1]
    np.testing.assert_allclose(np.asarray(pred[:, :pred1.shape[1]]),
                               np.asarray(pred1), rtol=1e-5)


@pytest.mark.slow
def test_tta_shapes(model_vars):
    from icafusion_tpu.models.tta import tta_inference
    model, variables, x = model_vars
    pred = tta_inference(model, variables, x, x)
    assert pred.ndim == 3 and pred.shape[-1] == 8
    assert np.isfinite(np.asarray(pred)).all()


@pytest.mark.slow
def test_model_info(model_vars):
    from icafusion_tpu.utils.profiling import model_info
    model, variables, x = model_vars
    info = model_info(model, variables, img_size=64, verbose=False)
    assert info["layers"] == 36
    assert info["params"] > 1e5
    assert info["gflops"] > 0
