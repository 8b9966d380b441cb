"""Numerical parity vs the actual reference implementation: build the reference
torch two-stream model, transfer its weights through the converter, and compare
decoded predictions element-wise. The strongest correctness evidence available —
it exercises every op in the flagship graph (Conv/BN/SiLU, C3, SPPF, the whole
DMFF fusion transformer, PANet, Detect decode) against the reference's numerics.

Requires /root/reference and torch; torchvision (absent here) is stubbed — the
reference only uses it on code paths these tests never touch.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _stub_torchvision():
    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            pr = types.ModuleType("pkg_resources")
            pr.parse_version = lambda v: tuple(int(x) for x in str(v).split(".")[:3]
                                               if x.isdigit())
            sys.modules["pkg_resources"] = pr
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")
        timm_layers.DropPath = torch.nn.Identity
        timm.models = timm_models
        timm_models.layers = timm_layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = timm_layers
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    utils_mod = types.ModuleType("torchvision.utils")
    utils_mod.save_image = lambda *a, **k: None
    tv.utils = utils_mod
    ops = types.ModuleType("torchvision.ops")
    ops.nms = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub"))
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv.transforms
    sys.modules["torchvision.utils"] = utils_mod
    sys.modules["torchvision.ops"] = ops


@pytest.fixture(scope="module")
def ref_model(reference_dir):
    _stub_torchvision()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.yolo_test import Model  # reference
    torch.manual_seed(0)
    model = Model(f"{REF}/models/transformer/yolov5n_Transfusion_kaist.yaml")
    model.eval()
    return model


@pytest.mark.slow
def test_forward_parity_with_reference(ref_model):
    import jax
    import jax.numpy as jnp

    from icafusion_tpu.config import load_model_config
    from icafusion_tpu.models import build_model
    from icafusion_tpu.utils.torch_convert import convert_state_dict

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    cfg = load_model_config(f"{REF}/models/transformer/yolov5n_Transfusion_kaist.yaml")
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    x = np.random.default_rng(0).random((1, 320, 320, 3), np.float32)
    x2 = np.random.default_rng(1).random((1, 320, 320, 3), np.float32)
    variables = jax.jit(model.init, static_argnames=("train", "decode"))(
        {"params": rng}, jnp.asarray(x), jnp.asarray(x2), train=False, decode=False)

    variables, unused = convert_state_dict(sd, dict(variables))
    # params that exist in the reference but are dead in its forward pass:
    # CTB's ln_input/ln_output/LN1 and its third unused mlp (common.py:701-702,
    # :716-721, :724 — only LN2 and mlp_vis/mlp_ir are ever called)
    import re
    dead = re.compile(
        r"model\.\d+\.crosstransformer\.\d+\.(ln_input|ln_output|LN1|mlp\.[02])\.")
    leftover = [k for k in unused if not dead.match(k)]
    assert leftover == [], f"unconverted reference params: {leftover[:10]}"

    # reference forward (eval mode -> decoded boxes), NCHW
    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        tx2 = torch.from_numpy(x2.transpose(0, 3, 1, 2))
        ref_z, ref_logits, ref_raw = ref_model(tx, tx2)
    ref_z = ref_z.numpy()

    pred, logits, raw = jax.jit(model.apply, static_argnames=("train", "decode"))(
        variables, jnp.asarray(x), jnp.asarray(x2), train=False, decode=True)

    # re-order ours (ny,nx,na) -> reference (na,ny,nx) per level, then compare
    chunks = []
    for r in raw:
        b, ny, nx, na, no = r.shape
        chunks.append(np.asarray(
            jax.nn.sigmoid(r).transpose(0, 3, 1, 2, 4)).reshape(b, -1, no))
    # decoded: rebuild from our pred by level for ordering
    sizes = [(40, 40), (20, 20), (10, 10)]
    offs = np.cumsum([0] + [ny * nx * 3 for ny, nx in sizes])
    ours = np.asarray(pred)
    reord = []
    for li, (ny, nx) in enumerate(sizes):
        blk = ours[:, offs[li]:offs[li + 1]].reshape(1, ny, nx, 3, -1)
        reord.append(blk.transpose(0, 3, 1, 2, 4).reshape(1, -1, blk.shape[-1]))
    ours_ref_order = np.concatenate(reord, axis=1)

    np.testing.assert_allclose(ours_ref_order, ref_z, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_stream_remap(ref_model):
    from icafusion_tpu.utils.torch_convert import remap_single_stream_to_two_stream
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    single = {k: v for k, v in sd.items()
              if int(k.split(".")[1]) < 10}
    remapped = remap_single_stream_to_two_stream(single)
    assert "model.10.conv.weight" in remapped
    np.testing.assert_array_equal(remapped["model.10.conv.weight"],
                                  remapped["model.0.conv.weight"])


@pytest.mark.slow
def test_reverse_convert_round_trip(ref_model):
    """reverse_convert (ours -> reference state_dict) is the exact inverse of
    convert_state_dict on the real reference model: every live key round-trips
    bit-exact, so TPU-trained checkpoints can flow into the reference stack
    (load_state_dict -> its export.py TorchScript/ONNX/CoreML paths)."""
    import jax
    import jax.numpy as jnp

    from icafusion_tpu.config import load_model_config
    from icafusion_tpu.models import build_model
    from icafusion_tpu.utils.torch_convert import (convert_state_dict,
                                                   reverse_convert)

    sd0 = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    cfg = load_model_config(
        f"{REF}/models/transformer/yolov5n_Transfusion_kaist.yaml")
    model = build_model(cfg)
    x = jnp.zeros((1, 320, 320, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train", "decode"))(
        {"params": jax.random.PRNGKey(0)}, x, x, train=False, decode=False)
    variables, _ = convert_state_dict(sd0, dict(variables))

    sd1 = reverse_convert(variables, like=sd0)
    import re
    dead = re.compile(r"(ln_input|ln_output|\.LN1\.|\.mlp\.)|"
                      r"num_batches_tracked|anchors|anchor_grid")
    n = 0
    for k, v in sd0.items():
        if dead.search(k) or k not in sd1:
            continue
        np.testing.assert_array_equal(sd1[k], np.asarray(v, np.float32),
                                      err_msg=k)
        n += 1
    assert n > 300  # the full live parameter set round-tripped

    # and the torch side actually accepts it
    mixed = dict(sd0)
    mixed.update({k: torch.from_numpy(np.ascontiguousarray(v))
                  for k, v in sd1.items()})
    ref_model.load_state_dict({k: torch.as_tensor(v) for k, v in mixed.items()},
                              strict=False)
