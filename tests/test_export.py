"""Export round-trips: StableHLO (jax.export) and TF SavedModel (jax2tf) of the
two-stream model must reproduce the direct forward — the rebuild's interchange
analog of the reference's TorchScript/ONNX exports (models/export.py:66-124)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icafusion_tpu.models import build_model
from icafusion_tpu.models.zoo import tiny_icafusion_config


@pytest.fixture(scope="module")
def tiny_inference():
    cfg = tiny_icafusion_config(nc=3)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    x2 = rng.random((1, 64, 64, 3)).astype(np.float32)
    variables = jax.jit(model.init, static_argnames=("train", "decode"))(
        {"params": jax.random.PRNGKey(0)}, x, x, train=False, decode=False)

    def forward(rgb, ir):
        pred, logits, _ = model.apply(variables, rgb, ir, train=False,
                                      decode=True)
        return pred, logits

    return forward, x, x2


def test_stablehlo_round_trip(tiny_inference):
    from jax import export as jexport
    forward, x, x2 = tiny_inference
    exported = jexport.export(jax.jit(forward))(jnp.asarray(x), jnp.asarray(x2))
    blob = exported.serialize()
    assert len(blob) > 1000
    reloaded = jexport.deserialize(blob)
    pred_rt, _ = reloaded.call(jnp.asarray(x), jnp.asarray(x2))
    pred, _ = forward(jnp.asarray(x), jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(pred_rt), np.asarray(pred),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_savedmodel_round_trip(tiny_inference, tmp_path):
    tf = pytest.importorskip("tensorflow")
    from icafusion_tpu.cli.export import export_savedmodel
    forward, x, x2 = tiny_inference

    out = export_savedmodel(forward, jnp.asarray(x), str(tmp_path / "sm"))
    assert out is not None
    loaded = tf.saved_model.load(out)
    res = loaded.serve(tf.constant(x), tf.constant(x2))
    pred, logits = forward(jnp.asarray(x), jnp.asarray(x2))
    np.testing.assert_allclose(res["pred"].numpy(), np.asarray(pred),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(res["logits"].numpy(), np.asarray(logits),
                               rtol=1e-4, atol=1e-5)
