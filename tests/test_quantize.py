"""W8A8 post-training quantization (utils/quantize.py + Conv._int8_conv).

A capability beyond the reference (its export only comments CoreML int8,
models/export.py:118). Mechanics are pinned against manual numpy math; the
model-level test checks the int8 path is live end-to-end and its error stays
in the expected PTQ range.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest

from icafusion_tpu.nn.layers import Conv
from icafusion_tpu.utils.quantize import calibrate, quantize_variables


def _quant_ref(x, w, s_in):
    """Manual numpy W8A8: per-input-channel activation scales folded into the
    weights, per-out-channel weight quantization."""
    w_eff = w * np.reshape(s_in, (1, 1, -1, 1))
    s_w = np.maximum(np.abs(w_eff).max(axis=(0, 1, 2)) / 127.0, 1e-8)
    w8 = np.clip(np.round(w_eff / s_w), -127, 127).astype(np.int8)
    x8 = np.clip(np.round(x / s_in), -127, 127).astype(np.int8)
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x8), jnp.asarray(w8), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return np.asarray(y, np.float32) * s_w


def test_conv_int8_mechanics_exact():
    """Conv's int8 path == the manual quantized computation (before BN)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 16, 8)).astype(np.float32)
    m = Conv(c1=8, c2=16, k=3, act=False, dtype=jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    _, mut = m.apply(v, jnp.asarray(x), train=False, mutable=["calib"])
    np.testing.assert_allclose(np.asarray(mut["calib"]["absmax"]),
                               np.abs(x).max(axis=(0, 1, 2)), rtol=1e-6)
    qv = quantize_variables(v, jax.tree.map(np.asarray, mut["calib"]))

    w = np.asarray(v["params"]["conv"]["kernel"])
    s_in = np.abs(x).max(axis=(0, 1, 2)) / 127.0
    # BN at init is near-identity (mean 0, var 1, scale 1, bias 0) and
    # act=False, so the module output is the dequantized conv scaled by the
    # BN epsilon factor 1/sqrt(1+eps)
    from icafusion_tpu.nn.layers import BN_EPS
    ref = _quant_ref(x, w, s_in) / np.sqrt(1.0 + BN_EPS)
    out = np.asarray(m.apply(qv, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_calibration_reduces_absmax_over_batches():
    m = Conv(c1=4, c2=4, k=1, dtype=jnp.float32)
    x1 = jnp.ones((1, 8, 8, 4)) * 2.0
    x2 = jnp.ones((1, 8, 8, 4)) * 5.0
    v = m.init({"params": jax.random.PRNGKey(0)}, x1, train=False)

    class _M:  # calibrate() expects model.apply(v, rgb, ir, ...)
        @staticmethod
        def apply(v, a, b, train, decode, mutable):
            return m.apply(v, a, train=train, mutable=mutable)

    cal = calibrate(_M, v, [(x1, x1), (x2, x2)])
    np.testing.assert_allclose(cal["absmax"], np.full(4, 5.0), rtol=1e-6)


def test_model_int8_path_live_and_bounded():
    """Quantized flagship-graph (tiny) forward: every Conv runs int8, and the
    first stream layers' error stays in the small-percent PTQ range."""
    import icafusion_tpu.nn.layers as L
    from icafusion_tpu.models import build_model
    from icafusion_tpu.models.zoo import tiny_icafusion_config

    hits = []
    orig = L.Conv._int8_conv

    def spy(self, x, s, p):
        hits.append(1)
        return orig(self, x, s, p)

    L.Conv._int8_conv = spy
    try:
        model = build_model(tiny_icafusion_config(nc=3), dtype=jnp.float32)
        rng = jax.random.PRNGKey(0)
        x = jax.random.uniform(rng, (1, 128, 128, 3))
        x2 = jax.random.uniform(jax.random.PRNGKey(1), x.shape)
        v = model.init({"params": rng}, x, x2, train=False, decode=False)
        cal = calibrate(model, v, [(x, x2)])
        qv = quantize_variables(v, cal)
        n_convs = sum(1 for _ in jax.tree.leaves(cal))

        hits.clear()
        _, cf = model.apply(v, x, x2, train=False, decode=False, capture=(0, 1))
        assert not hits  # fp path must not touch int8
        _, cq = model.apply(qv, x, x2, train=False, decode=False, capture=(0, 1))
        assert len(hits) == n_convs  # every calibrated conv ran int8
        for i in (0, 1):
            a, b = np.asarray(cf[i]), np.asarray(cq[i])
            rel = np.abs(b - a).mean() / np.abs(a).mean()
            assert 0 < rel < 0.05, f"layer {i} rel {rel}"
    finally:
        L.Conv._int8_conv = orig


def test_train_path_never_quantizes():
    from icafusion_tpu.models import build_model
    from icafusion_tpu.models.zoo import tiny_icafusion_config
    model = build_model(tiny_icafusion_config(nc=3), dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, 128, 128, 3))
    v = model.init({"params": rng}, x, x, train=False, decode=False)
    qv = quantize_variables(v, calibrate(model, v, [(x, x)]))
    # train=True with quant present: falls back to the fp conv (and mutates
    # batch_stats as usual)
    rngs = {"dropout": jax.random.PRNGKey(7)}
    out, _ = model.apply(qv, x, x, train=True, mutable=["batch_stats"],
                         rngs=rngs)
    ref, _ = model.apply(v, x, x, train=True, mutable=["batch_stats"],
                         rngs=rngs)
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_nested_skip_and_detect_feeder():
    """skip accepts nested paths ('mX/cv3') and detect_feeder_skip names the
    final conv of each Detect-feeding block — the measured accuracy fix
    (-0.364 -> +0.013 pts mAP@50 on the trained instrument, ACCURACY.md)."""
    import jax.tree_util as tu

    from icafusion_tpu.models import build_model
    from icafusion_tpu.models.assembler import detect_layer, resolve_model
    from icafusion_tpu.models.zoo import tiny_icafusion_config
    from icafusion_tpu.utils.quantize import detect_feeder_skip

    cfg = tiny_icafusion_config(nc=3)
    skip = detect_feeder_skip(cfg)
    resolved, _ = resolve_model(cfg)
    by_i = {r.i: r for r in resolved}
    assert len(skip) == len(detect_layer(cfg).f)
    for s, i in zip(skip, detect_layer(cfg).f):
        if by_i[i].module in ("C3", "C3TR"):
            assert s == f"m{i}/cv3"
        else:
            assert s == f"m{i}"

    model = build_model(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, 128, 128, 3))
    v = model.init({"params": rng}, x, x, train=False, decode=False)
    cal = calibrate(model, v, [(x, x)])
    q_all = quantize_variables(v, cal)["quant"]
    q_skip = quantize_variables(v, cal, skip=skip)["quant"]
    paths_all = {tu.keystr(p) for p, _ in tu.tree_leaves_with_path(q_all)}
    paths_skip = {tu.keystr(p) for p, _ in tu.tree_leaves_with_path(q_skip)}
    dropped = paths_all - paths_skip
    assert dropped, "skip list removed nothing"
    for s in skip:
        key = "".join(f"['{part}']" for part in s.split("/"))
        assert all(key not in p for p in paths_skip), (s, key)
        assert any(key in p for p in dropped), (s, key)
    # siblings of a nested skip stay quantized (cv1 of the same block)
    nested = [s for s in skip if "/" in s]
    if nested:
        sib = nested[0].split("/")[0] + "/cv1"
        sib_key = "".join(f"['{p}']" for p in sib.split("/"))
        assert any(sib_key in p for p in paths_skip), sib


def test_fusion_dense_weight_only_int8():
    """fusion_dense=True adds weight-only w8/s_w for the fusion transformer's
    Dense layers (attention out-projections + MLP fc1/fc2), _QDense serves
    them, the param tree/checkpoint layout is unchanged, and the extra error
    over conv-only int8 stays in the near-lossless weight-only range."""
    from icafusion_tpu.models import build_model
    from icafusion_tpu.models.zoo import tiny_icafusion_config

    model = build_model(tiny_icafusion_config(nc=3), dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, 128, 128, 3))
    x2 = jax.random.uniform(jax.random.PRNGKey(1), x.shape)
    v = model.init({"params": rng}, x, x2, train=False, decode=False)
    cal = calibrate(model, v, [(x, x2)])
    qv = quantize_variables(v, cal)
    qvd = quantize_variables(v, cal, fusion_dense=True)

    # the dense entries exist exactly where the fusion Dense kernels live
    def leaves_with(tree, key, path=()):
        if not isinstance(tree, dict):
            return []
        out = [path] if key in tree and isinstance(tree[key], dict) is False \
            else []
        got = []
        for k, sub in tree.items():
            got += leaves_with(sub, key, path + (k,))
        return out + got

    def dense_paths(tree, path=()):
        found = []
        if isinstance(tree, dict):
            for k, sub in tree.items():
                if k in ("out_vis", "out_ir") or k.endswith(("_fc1", "_fc2")):
                    if isinstance(sub, dict) and "kernel" in sub and \
                            np.ndim(sub["kernel"]) == 2:
                        found.append(path + (k,))
                found += dense_paths(sub, path + (k,))
        return found

    want = set(dense_paths(jax.tree.map(np.asarray, v["params"])))
    assert want, "tiny config has no fusion Dense layers?"
    for p in want:
        node = qvd["quant"]
        for k in p:
            assert k in node, f"missing quant entry for {'/'.join(p)}"
            node = node[k]
        assert node["w8"].dtype == jnp.int8
        # conv-only quantization must NOT contain it
        n2, present = qv["quant"], True
        for k in p:
            if k not in n2:
                present = False
                break
            n2 = n2[k]
        assert not present

    # param trees identical (checkpoint layout untouched)
    assert jax.tree.structure(v["params"]) == jax.tree.structure(
        qvd["params"])

    pf, _, _ = model.apply(qv, x, x2, train=False, decode=True)
    pd, _, _ = model.apply(qvd, x, x2, train=False, decode=True)
    rel = np.abs(np.asarray(pd) - np.asarray(pf)).mean() / \
        (np.abs(np.asarray(pf)).mean() + 1e-9)
    assert rel < 0.01, f"weight-only dense int8 error too large: {rel}"


def test_calibration_persistence_roundtrip(tmp_path):
    """save_calibration/load_calibration: bit-identical quant collections vs
    fresh calibration; key mismatch (ckpt bytes, scheme, merge) falls back to
    None (VERDICT r4 ask #4 — kill the per-process calibration forward)."""
    from icafusion_tpu.models import build_model
    from icafusion_tpu.models.zoo import tiny_icafusion_config
    from icafusion_tpu.utils.quantize import (calibrate, calibrate_cached,
                                              calibration_key,
                                              load_calibration,
                                              quantize_variables,
                                              save_calibration)

    cfg = tiny_icafusion_config(nc=3)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    x2 = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, x2,
                   train=False, decode=False)

    fresh = calibrate(model, v, [(x, x2)])
    ckpt = tmp_path / "w.ckpt"
    ckpt.write_bytes(b"fake-checkpoint-bytes")
    key = calibration_key(str(ckpt), merge=0, extra={"imgsz": 64})
    path = tmp_path / "w.ckpt.calib"
    save_calibration(path, fresh, key)

    # exact round trip
    loaded = load_calibration(path, key)
    assert loaded is not None
    jax.tree.map(np.testing.assert_array_equal, fresh, loaded)

    # quant collections built from fresh vs loaded calibration: bit-identical
    qa = quantize_variables(v, fresh)["quant"]
    qb = quantize_variables(v, loaded)["quant"]
    jax.tree.map(np.testing.assert_array_equal, qa, qb)

    # key mismatches -> None (silent recalibrate fallback)
    assert load_calibration(path, calibration_key(str(ckpt), merge=3,
                                                  extra={"imgsz": 64})) is None
    bad = dict(key)
    bad["scheme"] = "other-version"
    assert load_calibration(path, bad) is None
    ckpt.write_bytes(b"different-checkpoint-bytes")
    assert load_calibration(path, calibration_key(str(ckpt), merge=0,
                                                  extra={"imgsz": 64})) is None

    # calibrate_cached: miss -> writes; hit -> skips the batches_fn entirely
    path2 = tmp_path / "c2.calib"
    calls = []

    def batches():
        calls.append(1)
        return [(x, x2)]

    c1, hit1 = calibrate_cached(model, v, batches, path2, key)
    c2, hit2 = calibrate_cached(model, v, batches, path2, key)
    assert (hit1, hit2) == (False, True)
    assert len(calls) == 1, "cache hit must not assemble calibration batches"
    jax.tree.map(np.testing.assert_array_equal, c1, c2)
