"""ONNX export round trip: emit (onnx_export) -> parse back (onnx_proto) ->
execute with the numpy evaluator (onnx_numpy) -> compare against the JAX
forward at fp32. One pass covers the protobuf serializer, the graph lowering
(incl. conv+BN folding), and the op semantics.

Counterpart capability of reference models/export.py:85-107 (ONNX opset-12 of
the single-input model); here the full two-stream graph with decode exports.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icafusion_tpu.export import onnx_numpy, onnx_proto
from icafusion_tpu.export.onnx_export import export_onnx
from icafusion_tpu.models.assembler import build_model
from icafusion_tpu.models import zoo


def _jitter(variables, seed=0):
    """Randomize params + BN running stats so conv+BN folding is non-trivial."""
    rng = np.random.default_rng(seed)

    def noise(x):
        x = np.asarray(x, np.float32)
        return x + rng.normal(0, 0.05, x.shape).astype(np.float32)

    params = jax.tree.map(noise, variables["params"])
    out = {"params": params}
    if "batch_stats" in variables:
        def stats(path, x):
            x = np.asarray(x, np.float32)
            if path[-1].key == "var":
                return rng.uniform(0.5, 1.5, x.shape).astype(np.float32)
            return rng.normal(0, 0.1, x.shape).astype(np.float32)
        out["batch_stats"] = jax.tree_util.tree_map_with_path(
            stats, variables["batch_stats"])
    return out


def _roundtrip(cfg, imgsz, batch=1, seed=0, tol=2e-3):
    model = build_model(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    rgb = rng.uniform(0, 1, (batch, imgsz, imgsz, 3)).astype(np.float32)
    ir = rng.uniform(0, 1, (batch, imgsz, imgsz, 3)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(seed)},
                           jnp.asarray(rgb), jnp.asarray(ir),
                           train=False, decode=False)
    variables = _jitter(variables, seed)
    variables = jax.tree.map(jnp.asarray, variables)

    pred, _, _ = model.apply(variables, jnp.asarray(rgb), jnp.asarray(ir),
                             train=False, decode=True)
    pred = np.asarray(pred)

    blob = export_onnx(cfg, jax.tree.map(np.asarray, variables),
                       batch=batch, imgsz=imgsz)
    m = onnx_proto.load(blob)
    assert m.opset == 13 and len(m.outputs) == 1
    feeds = {"rgb": rgb.transpose(0, 3, 1, 2), "ir": ir.transpose(0, 3, 1, 2)}
    (out,) = onnx_numpy.run(m, feeds).values()

    assert out.shape == pred.shape, (out.shape, pred.shape)
    # scale-aware: boxes are in pixels (O(imgsz)), scores in [0,1]
    np.testing.assert_allclose(out[..., :4], pred[..., :4],
                               rtol=tol, atol=tol * imgsz)
    np.testing.assert_allclose(out[..., 4:], pred[..., 4:],
                               rtol=tol, atol=tol)
    return m


def test_tiny_tfb_roundtrip():
    m = _roundtrip(zoo.tiny_icafusion_config(nc=3, fusion="tfb"), imgsz=64)
    ops = {n.op_type for n in m.nodes}
    # the DMFF path must really be in the graph
    assert {"Conv", "Softmax", "MatMul", "Resize", "MaxPool"} <= ops


def test_tiny_nin_roundtrip():
    _roundtrip(zoo.tiny_icafusion_config(nc=3, fusion="nin"), imgsz=64)


def test_tiny_add_roundtrip():
    _roundtrip(zoo.tiny_icafusion_config(nc=3, fusion="add"), imgsz=64, batch=2)


@pytest.mark.slow
def test_yolov5n_tfb_roundtrip():
    """The real model family: yolov5n-Transfusion at the minimum TFB size."""
    _roundtrip(zoo.icafusion_config("n", nc=3, fusion="tfb"), imgsz=320)


@pytest.mark.slow
def test_vgg16_roundtrip():
    _roundtrip(zoo.vgg16_icafusion_config(nc=3, fusion="nin"), imgsz=128)


@pytest.mark.slow
def test_resnet50_roundtrip():
    _roundtrip(zoo.resnet50_icafusion_config(nc=3, fusion="nin"), imgsz=128)


def test_nms_baked_matches_framework_nms():
    """--nms ONNX tail: NonMaxSuppression baked into the graph must yield the
    same detection set as ops/nms.py with multi_label=True (the reference's
    eval-mode NMS semantics, general.py:566-568) on the same decoded pred."""
    from icafusion_tpu.ops.nms import detections_to_numpy, non_max_suppression

    cfg = zoo.tiny_icafusion_config(nc=3, fusion="tfb")
    imgsz, batch, conf_t, iou_t = 64, 2, 0.25, 0.45
    # max_det large enough that neither cap binds: ops/nms.py caps the global
    # padded total where ONNX NonMaxSuppression caps per class — the two only
    # define the same set when the caps are not hit (documented in nms_tail)
    max_det = 512
    model = build_model(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    rgb = rng.uniform(0, 1, (batch, imgsz, imgsz, 3)).astype(np.float32)
    ir = rng.uniform(0, 1, (batch, imgsz, imgsz, 3)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(7)},
                           jnp.asarray(rgb), jnp.asarray(ir),
                           train=False, decode=False)
    variables = jax.tree.map(jnp.asarray, _jitter(variables, 7))

    pred, _, _ = model.apply(variables, jnp.asarray(rgb), jnp.asarray(ir),
                             train=False, decode=True)
    dets = detections_to_numpy(non_max_suppression(
        pred, conf_thres=conf_t, iou_thres=iou_t, multi_label=True,
        max_det=max_det, top_k=4096))
    want = np.concatenate([np.c_[np.full(len(d), bi), d]
                           for bi, d in enumerate(dets)])
    assert len(want) > 0, "degenerate test: no detections above threshold"

    blob = export_onnx(cfg, jax.tree.map(np.asarray, variables),
                       batch=batch, imgsz=imgsz, nms=(conf_t, iou_t, max_det))
    m = onnx_proto.load(blob)
    assert "NonMaxSuppression" in {n.op_type for n in m.nodes}
    assert m.outputs[0][2] == (-1, 7)   # dynamic num_dets dim round-trips
    (out,) = onnx_numpy.run(m, {"rgb": rgb.transpose(0, 3, 1, 2),
                                "ir": ir.transpose(0, 3, 1, 2)}).values()

    # same multiset of detections; order differs (ONNX: batch/class-major)
    def order(d):
        return d[np.lexsort((-d[:, 5], d[:, 6], d[:, 0]))]

    got, want = order(out), order(want)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_array_equal(got[:, 0], want[:, 0])        # batch ids
    np.testing.assert_array_equal(got[:, 6], want[:, 6])        # classes
    np.testing.assert_allclose(got[:, 1:5], want[:, 1:5],
                               rtol=2e-3, atol=2e-3 * imgsz)    # boxes
    np.testing.assert_allclose(got[:, 5], want[:, 5], rtol=2e-3, atol=2e-3)


def test_tiny_dmaf_roundtrip():
    """DMAF + Add2 differential-gating fusion (code-registered modules the
    reference never uses from YAML) must lower: tuple-valued layer output,
    Add2 indexing into it, and the tanh gate all round-trip."""
    m = _roundtrip(zoo.tiny_icafusion_config(nc=3, fusion="dmaf"), imgsz=64)
    assert "Tanh" in {n.op_type for n in m.nodes}


def test_grouped_c3_roundtrip():
    """C3 rows carrying the optional g/e YAML args (grouped bottleneck cv2,
    non-default expansion) must reach the emitter, not be dropped."""
    import dataclasses

    cfg = zoo.tiny_icafusion_config(nc=3, fusion="add")
    layers = list(cfg.layers)
    for i, ld in enumerate(layers):
        if ld.module == "C3" and ld.args == (32,):
            layers[i] = dataclasses.replace(ld, args=(32, "True", 2, 0.25))
    cfg = dataclasses.replace(cfg, layers=tuple(layers))
    _roundtrip(cfg, imgsz=64)


def test_resize_nearest_noninteger_matches_jax():
    """Non-integer nearest upscale: the framework's Upsample falls back to
    jax.image.resize (half-pixel centers); the emitted Resize must match it,
    not torch's asymmetric/floor (layers.py:482-493)."""
    from icafusion_tpu.export import onnx_proto as P
    from icafusion_tpu.export.onnx_export import Builder
    from icafusion_tpu.nn.layers import Upsample

    b = Builder()
    b.shape["x"] = (1, 3, 8, 8)
    out = b.resize("x", (12, 12), "nearest")
    blob = P.model_proto(P.graph_proto(
        b.nodes, "t", b.inits, [P.value_info("x", P.FLOAT, (1, 3, 8, 8))],
        [P.value_info(out, P.FLOAT, (1, 3, 12, 12))]))
    x = np.random.default_rng(0).normal(size=(1, 3, 8, 8)).astype(np.float32)
    (y,) = onnx_numpy.run(onnx_proto.load(blob), {"x": x}).values()
    want = Upsample(scale_factor=1.5, mode="nearest").apply(
        {}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_array_equal(y, np.asarray(want).transpose(0, 3, 1, 2))


def test_avgpool_pads_exclude_pad_cells():
    """ONNX AveragePool default count_include_pad=0: padded cells must not
    contribute to the divisor (torch avg_pool2d count_include_pad=False)."""
    import torch
    import torch.nn.functional as F

    from icafusion_tpu.export.onnx_numpy import _pool

    x = np.random.default_rng(1).normal(size=(2, 3, 7, 7)).astype(np.float32)
    got = _pool(x, "AveragePool", (3, 3), (2, 2), (1, 1, 1, 1))
    want = F.avg_pool2d(torch.from_numpy(x), 3, 2, padding=1,
                        count_include_pad=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_nms_default_max_boxes_selects_nothing():
    """Spec: max_output_boxes_per_class defaults to 0 == select no boxes."""
    from icafusion_tpu.export.onnx_numpy import _nms

    boxes = np.array([[[10, 10, 20, 20], [50, 50, 20, 20]]], np.float32)
    scores = np.array([[[0.9, 0.8]]], np.float32)
    assert _nms(boxes, scores, 0, 0.5, None, 1).shape == (0, 3)


def _kitchen_sink_config(nc=2):
    """Hand-built two-stream config exercising every code-registered module
    that no shipped reference YAML uses: GhostConv, CrossConv, MixConv2d,
    Contract/Expand, CBAM, Channel/Spatial_Attention, GhostBottleneck, C3TR,
    BatchNorm2d, SE_Block, MaxPool2d."""
    from icafusion_tpu.config import load_model_config
    from icafusion_tpu.models.zoo import COCO_ANCHORS

    tower = lambda f: [
        [f, 1, "GhostConv", [16, 3, 2]],          # 32^2 c16
        [-1, 1, "CrossConv", [32, 3, 2]],         # 16^2 c32
        [-1, 1, "MixConv2d", [32, [1, 3], 1]],    # 16^2 c32 (residual)
        [-1, 1, "Contract", [2]],                 # 8^2 c128
        [-1, 1, "Expand", [2]],                   # 16^2 c32
        [-1, 1, "CBAM", [32]],                    # 16^2 c32
        [-1, 1, "Channel_Attention", [32, 8]],    # 16^2 c32
        [-1, 1, "Spatial_Attention", [7]],        # 16^2 c32
        [-1, 1, "GhostBottleneck", [48, 3, 2]],   # 8^2 c48
        [-1, 1, "C3TR", [48]],                    # 8^2 c48
        [-1, 1, "BatchNorm2d", [48]],             # 8^2 c48   P3/8
        [-1, 1, "Conv", [64, 3, 2]],              # 4^2 c64
        [-1, 1, "SE_Block", [64]],                # 4^2 c64   P4/16
        [-1, 1, "MaxPool2d", [2, 2]],             # 2^2 c64   P5/32
    ]
    rows = tower(-1) + tower(-4)
    rows += [
        [[10, 24], 1, "Add", [1]],                # 28
        [[12, 26], 1, "Add", [1]],                # 29
        [[13, 27], 1, "Add", [1]],                # 30
        [[28, 29, 30], 1, "Detect", ["nc", "anchors"]],
    ]
    d = dict(nc=nc, depth_multiple=1.0, width_multiple=1.0,
             anchors=list(COCO_ANCHORS), backbone=rows[:28], head=rows[28:],
             name="kitchen_sink")
    return load_model_config(d, nc=nc)


def test_kitchen_sink_roundtrip():
    """Every registered assembler module (except Classify) must export and
    round-trip numerically — shipped families are covered by the zoo tests;
    this covers the code-registered long tail in one graph."""
    m = _roundtrip(_kitchen_sink_config(), imgsz=64)
    ops = {n.op_type for n in m.nodes}
    assert "ReduceMax" in ops          # CBAM / Spatial_Attention gates
    assert "LeakyRelu" in ops          # MixConv2d mix path


def test_unsupported_module_message():
    """Classify is the single registered module without an emitter (the
    assembler only builds Detect-terminated graphs, so it is unreachable)."""
    cfg = zoo.tiny_icafusion_config(nc=3, fusion="tfb")
    import dataclasses
    bad = dataclasses.replace(cfg.layers[0], module="Classify")
    cfg2 = dataclasses.replace(cfg, layers=(bad,) + cfg.layers[1:])
    with pytest.raises(NotImplementedError, match="no emitter"):
        export_onnx(cfg2, {"params": {}}, batch=1, imgsz=64)


def test_int8_qdq_roundtrip():
    """int8 QDQ export: every layers.Conv is emitted as activation Q/DQ +
    int8-weight DequantizeLinear (the deployable W8A8 artifact of
    utils/quantize.py); the numpy evaluator executes the quantized graph and
    its outputs stay close to both the fp ONNX graph and the framework's own
    int8 path."""
    from icafusion_tpu.utils.quantize import calibrate, quantize_variables

    cfg = zoo.tiny_icafusion_config(nc=3, fusion="tfb")
    model = build_model(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    ir = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(rgb), jnp.asarray(ir),
                           train=False, decode=False)
    variables = jax.tree.map(jnp.asarray, _jitter(variables, 0))
    qvars = quantize_variables(
        dict(variables),
        calibrate(model, variables, [(jnp.asarray(rgb), jnp.asarray(ir))]))

    fp_blob = export_onnx(cfg, jax.tree.map(np.asarray, variables),
                          batch=1, imgsz=64)
    q_blob = export_onnx(cfg, jax.tree.map(np.asarray, qvars),
                         batch=1, imgsz=64)
    m = onnx_proto.load(q_blob)
    ops = [n.op_type for n in m.nodes]
    n_q, n_dq = ops.count("QuantizeLinear"), ops.count("DequantizeLinear")
    assert n_q > 10, "every layers.Conv must carry an activation QDQ pair"
    assert n_dq == 2 * n_q, "each Q has an act-DQ; each conv adds a weight-DQ"

    feeds = {"rgb": rgb.transpose(0, 3, 1, 2), "ir": ir.transpose(0, 3, 1, 2)}
    (fp,) = onnx_numpy.run(onnx_proto.load(fp_blob), feeds).values()
    (q8,) = onnx_numpy.run(m, feeds).values()
    assert q8.shape == fp.shape
    assert np.isfinite(q8).all()
    # quantization error must be bounded: obj/cls scores within a few percent
    assert np.abs(q8[..., 4:] - fp[..., 4:]).max() < 0.05
    # and the QDQ graph must track the framework's own int8 path at least as
    # closely as it tracks fp32 (same weights, same 8-bit budget)
    qpred, _, _ = model.apply(qvars, jnp.asarray(rgb), jnp.asarray(ir),
                              train=False, decode=True)
    assert np.abs(q8[..., 4:] - np.asarray(qpred)[..., 4:]).max() < 0.05
