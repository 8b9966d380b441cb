"""Hub-style model factory — counterpart of reference hubconf.py:21-122.

    import icafusion_tpu.hub as hub
    model, variables = hub.create("icafusion_s", nc=3)               # fresh init
    model, variables = hub.create("icafusion_l", weights="best.ckpt")
    engine = hub.pipeline("icafusion_s", weights="best.ckpt")        # ready-to-serve
"""

from __future__ import annotations

_FACTORIES = {}


def _register():
    from icafusion_tpu.models import zoo
    for scale in "nsmlx":
        _FACTORIES[f"icafusion_{scale}"] = lambda nc=3, s=scale: zoo.icafusion_config(s, nc=nc)
        _FACTORIES[f"icafusion_{scale}_nin"] = \
            lambda nc=3, s=scale: zoo.icafusion_config(s, nc=nc, fusion="nin")
        _FACTORIES[f"icafusion_{scale}_add"] = \
            lambda nc=3, s=scale: zoo.icafusion_config(s, nc=nc, fusion="add")
    _FACTORIES["icafusion_vgg16"] = lambda nc=3: zoo.vgg16_icafusion_config(nc=nc)
    _FACTORIES["icafusion_resnet50"] = lambda nc=3: zoo.resnet50_icafusion_config(nc=nc)
    _FACTORIES["icafusion_tiny"] = lambda nc=3: zoo.tiny_icafusion_config(nc=nc)


def list_models():
    if not _FACTORIES:
        _register()
    return sorted(_FACTORIES)


def create(name: str, nc: int = 3, weights: str = None, img_size: int = 640,
           dtype=None):
    """-> (model, variables). With weights=None, variables are freshly
    initialized (hubconf.create semantics, hubconf.py:21-56)."""
    import jax
    import jax.numpy as jnp

    from icafusion_tpu.models import build_model
    if not _FACTORIES:
        _register()
    cfg = _FACTORIES[name](nc=nc)
    model = build_model(cfg, dtype=dtype or jnp.float32)
    if weights:
        from icafusion_tpu.utils.checkpoint import load_inference_variables
        variables = load_inference_variables(weights)
    else:
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
        variables = jax.jit(model.init, static_argnames=("train", "decode"))(
            {"params": rng}, x, x, train=False, decode=False)
    return model, variables


def pipeline(name: str, weights: str = None, nc: int = 3, img_size: int = 640,
             batch_size: int = 1, conf_thres: float = 0.25,
             merge_streams="auto"):
    """Ready-to-use ServingEngine (autoShape analog, common.py:400-553).
    merge_streams: int or 'auto' — stream-merged execution
    (utils/stream_merge.py; identical outputs)."""
    from icafusion_tpu.serve.engine import ServingEngine
    model, variables = create(name, nc=nc, weights=weights, img_size=img_size)
    return ServingEngine(model=model, variables=variables, img_size=img_size,
                         batch_size=batch_size, conf_thres=conf_thres,
                         merge_streams=merge_streams)
