"""Stream-merge transform (utils/stream_merge.py): the two towers' leading
layer pairs run as single block-diagonal modules on the channel-concatenated
input — numerically identical to the reference's separate-chain execution
(yolo_test.py:140-156), recovering the MXU lanes XLA pads away on
sub-128-channel convs (BENCH.md round-2 profile)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icafusion_tpu.models import build_model
from icafusion_tpu.models.assembler import resolve_model
from icafusion_tpu.models.zoo import tiny_icafusion_config
from icafusion_tpu.utils.quantize import calibrate, quantize_variables
from icafusion_tpu.utils.stream_merge import (merge_stream_variables,
                                              validate_merge)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_icafusion_config(nc=3, fusion="tfb")
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    ir = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, rgb, ir,
                   train=False, decode=False)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    return cfg, model, v, rgb, ir


@pytest.mark.parametrize("k", [1, 3, 5])
def test_fp_parity(setup, k):
    """Merged forward == separate-stream forward (k=5 also exercises the
    sliced save of layer 4, referenced by the first fusion block)."""
    cfg, model, v, rgb, ir = setup
    ref, _, _ = model.apply(v, rgb, ir, train=False, decode=True)
    mv = merge_stream_variables(cfg, v, pairs=k)
    mm = build_model(cfg, merge_pairs=k)
    got, _, _ = mm.apply(mv, rgb, ir, train=False, decode=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_int8_composition(setup):
    """Merge-then-quantize tracks the unmerged int8 path: same per-channel
    calibration absmaxes (the merged input is the concat of the streams),
    exact int32 accumulation over the zero blocks."""
    cfg, model, v, rgb, ir = setup
    qv = quantize_variables(dict(v), calibrate(model, v, [(rgb, ir)]))
    ref = model.apply(qv, rgb, ir, train=False, decode=False)

    mv = merge_stream_variables(cfg, v, pairs=3)
    mm = build_model(cfg, merge_pairs=3)
    qmv = quantize_variables(dict(mv), calibrate(mm, mv, [(rgb, ir)]))
    got = mm.apply(qmv, rgb, ir, train=False, decode=False)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_validation(setup):
    cfg, model, v, rgb, ir = setup
    resolved, _ = resolve_model(cfg)
    with pytest.raises(ValueError, match="merge_pairs must be in"):
        validate_merge(resolved, 99)
    from icafusion_tpu.models.assembler import ResolvedLayer
    fake = (ResolvedLayer(i=0, f=-1, n=1, module="Focus", args=(3, 16, 1),
                          c2=16),
            ResolvedLayer(i=1, f=-4, n=1, module="Focus", args=(3, 16, 1),
                          c2=16))
    with pytest.raises(ValueError, match="not stream-mergeable"):
        validate_merge(fake, 1)
    with pytest.raises(ValueError, match="no layer takes the -4 input"):
        from icafusion_tpu.utils.stream_merge import ir_stream_start
        ir_stream_start(resolved[:8])  # RGB tower only


def test_unmerge_roundtrip(setup):
    """merge -> unmerge is the identity on every leaf (bit-exact slices)."""
    import jax.tree_util as tu

    from icafusion_tpu.utils.stream_merge import unmerge_stream_variables

    cfg, model, v, rgb, ir = setup
    rt = unmerge_stream_variables(cfg, merge_stream_variables(cfg, v, 3), 3)
    a = {tu.keystr(p): np.asarray(l) for p, l in
         tu.tree_leaves_with_path(jax.device_get(v))}
    b = {tu.keystr(p): np.asarray(l) for p, l in tu.tree_leaves_with_path(rt)}
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


@pytest.mark.parametrize("pairs", [3, 9])
def test_train_equivalence(setup, pairs):
    """Masked merged training == separate-stream training step-for-step
    (same losses up to float summation order), and the block-diagonal zeros
    stay EXACTLY zero — so the merged graph trains the reference model, just
    on full MXU lanes. pairs=9 covers the SPPF-containing full backbone."""
    import jax.tree_util as tu

    from icafusion_tpu.config import load_hyp_config
    from icafusion_tpu.train.loss import pad_targets
    from icafusion_tpu.train.trainer import Trainer
    from icafusion_tpu.utils.stream_merge import (grad_mask,
                                                  unmerge_stream_variables)

    cfg, model, v0, rgb, ir = setup
    hyp = load_hyp_config()
    B = rgb.shape[0]
    t, m = pad_targets([np.array([[0, .5, .5, .3, .3]], np.float32)] * B, 8)
    t, m = jnp.asarray(t), jnp.asarray(m)

    kw = dict(hyp=hyp, epochs=3, steps_per_epoch=5, batch_size=B,
              imgsz=rgb.shape[1], warmup_min_steps=0)
    tr = Trainer(model=model, **kw)
    st = tr.init_state(jax.random.PRNGKey(0), rgb[:1], ir[:1],
                       variables=jax.device_get(v0))

    mv = merge_stream_variables(cfg, v0, pairs=pairs)
    mask = grad_mask(cfg, mv["params"], pairs=pairs)
    mtr = Trainer(model=build_model(cfg, merge_pairs=pairs), **kw)
    mst = mtr.init_state(jax.random.PRNGKey(0), rgb[:1], ir[:1], variables=mv)

    step = jax.jit(tr.make_train_step())
    mstep = jax.jit(mtr.make_train_step(grad_mask=mask))
    for _ in range(3):
        st, met = step(st, rgb, ir, t, m)
        mst, mmet = mstep(mst, rgb, ir, t, m)
        assert abs(float(met["loss"]) - float(mmet["loss"])) < 1e-4

    mp = jax.device_get(mst.params)
    k0 = np.asarray(mp["m0_9"]["conv"]["kernel"])  # (6,6,6,32): blocks 3/16
    assert np.all(k0[:, :, 3:, :16] == 0) and np.all(k0[:, :, :3, 16:] == 0), \
        "gradient mask failed to pin the zero blocks"

    um = unmerge_stream_variables(
        cfg, {"params": mp, "batch_stats": jax.device_get(mst.batch_stats)},
        pairs=pairs)
    a = {tu.keystr(p): np.asarray(l) for p, l in
         tu.tree_leaves_with_path(jax.device_get(st.params))}
    b = {tu.keystr(p): np.asarray(l)
         for p, l in tu.tree_leaves_with_path(um["params"])}
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-4, err_msg=k)


def test_capture_conflict(setup):
    cfg, model, v, rgb, ir = setup
    mv = merge_stream_variables(cfg, v, pairs=3)
    mm = build_model(cfg, merge_pairs=3)
    with pytest.raises(ValueError, match="capture/overrides"):
        mm.apply(mv, rgb, ir, train=False, decode=False, capture=(1,))
    # capture of an unmerged layer still works
    (_, cap) = mm.apply(mv, rgb, ir, train=False, decode=False, capture=(4,))
    assert 4 in cap


@pytest.mark.parametrize("zoo_name", ["vgg16", "resnet50"])
def test_alt_backbone_merge(zoo_name):
    """VGGblock (plain conv+bias chains) and ResNetlayer (bottlenecks with
    per-channel residuals) merge through the generic leaf-wise transform —
    their early stages (3->64 stems, 64-ch blocks at full resolution) are the
    most lane-starved in the whole model family."""
    import jax.tree_util as tu

    from icafusion_tpu.models.zoo import (resnet50_icafusion_config,
                                          vgg16_icafusion_config)
    from icafusion_tpu.utils.stream_merge import unmerge_stream_variables

    cfg = (vgg16_icafusion_config(nc=3) if zoo_name == "vgg16"
           else resnet50_icafusion_config(nc=3))
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 1, (1, 320, 320, 3)), jnp.float32)
    ir = jnp.asarray(rng.uniform(0, 1, (1, 320, 320, 3)), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, rgb, ir,
                   train=False, decode=False)
    v = {"params": v["params"], "batch_stats": v.get("batch_stats", {})}
    ref = jax.jit(lambda v, a, b: model.apply(
        v, a, b, train=False, decode=False))(v, rgb, ir)

    mv = merge_stream_variables(cfg, v, pairs=2)
    mm = build_model(cfg, merge_pairs=2)
    got = jax.jit(lambda v, a, b: mm.apply(
        v, a, b, train=False, decode=False))(mv, rgb, ir)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)

    rt = unmerge_stream_variables(cfg, mv, pairs=2)
    a = {tu.keystr(p): np.asarray(l) for p, l in
         tu.tree_leaves_with_path(jax.device_get(v))}
    b = {tu.keystr(p): np.asarray(l) for p, l in tu.tree_leaves_with_path(rt)}
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_auto_merge_pairs():
    """'auto' merges exactly the lane-starved prefix: layers whose narrowest
    internal conv is under the 128-lane MXU width."""
    from icafusion_tpu.models.zoo import (icafusion_config,
                                          resnet50_icafusion_config,
                                          vgg16_icafusion_config)
    from icafusion_tpu.utils.stream_merge import (auto_merge_pairs,
                                                  resolve_merge)

    lcfg = icafusion_config("l", nc=3)
    assert auto_merge_pairs(lcfg) == 3          # stem, 64->128, C3(128)
    assert auto_merge_pairs(vgg16_icafusion_config(nc=3)) == 2
    assert auto_merge_pairs(resnet50_icafusion_config(nc=3)) == 2
    assert resolve_merge("auto", lcfg) == 3
    assert resolve_merge("2", lcfg) == 2
    assert resolve_merge(0, lcfg) == 0


def test_repeated_module_merge():
    """A repeated mergeable row ([-1, 2, 'Conv', ...]) merges through the
    same _Repeat wrapper as the main loop (regression: the merged prefix
    used to build a flat module and crash on the {r0, r1} param subtree)."""
    import dataclasses

    from icafusion_tpu.models.assembler import resolve_model as _rm

    cfg = tiny_icafusion_config(nc=3, fusion="tfb")
    layers = list(cfg.layers)
    for idx in (1, 10):  # layer 1 and its IR twin
        layers[idx] = dataclasses.replace(layers[idx], n=2)
    cfg2 = dataclasses.replace(cfg, layers=tuple(layers))
    resolved, _ = _rm(cfg2)
    assert resolved[1].n == 2 and resolved[10].n == 2

    model = build_model(cfg2)
    rng = np.random.default_rng(0)
    # 128px: the extra stride-2 copy halves every map; keep P5 >= the 4x4 grid
    rgb = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)), jnp.float32)
    ir = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, rgb, ir,
                   train=False, decode=False)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    ref = model.apply(v, rgb, ir, train=False, decode=False)

    mv = merge_stream_variables(cfg2, v, pairs=3)
    mm = build_model(cfg2, merge_pairs=3)
    got = mm.apply(mv, rgb, ir, train=False, decode=False)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_c3_nondefault_e_rejected():
    """C3 with explicit g/e args must be rejected up front (the cv3 row
    permutation assumes the default hidden width c2*0.5)."""
    import dataclasses

    from icafusion_tpu.models.assembler import resolve_model as _rm

    cfg = tiny_icafusion_config(nc=3, fusion="tfb")
    layers = list(cfg.layers)
    for idx in (2, 11):
        layers[idx] = dataclasses.replace(
            layers[idx], args=layers[idx].args + (True, 1, 0.25))
    cfg2 = dataclasses.replace(cfg, layers=tuple(layers))
    with pytest.raises(ValueError, match="explicit g/e"):
        validate_merge(_rm(cfg2)[0], 3)


def test_full_stream_merge_with_sppf(setup):
    """pairs=9 merges the ENTIRE tiny backbone — both towers run as one
    block-diagonal chain, including SPPF (whose cv2 consumes a 4-segment
    interleaved pool concat) — and unmerges bit-exactly."""
    import jax.tree_util as tu

    from icafusion_tpu.utils.stream_merge import unmerge_stream_variables

    cfg, model, v, rgb, ir = setup
    ref, _, _ = model.apply(v, rgb, ir, train=False, decode=True)
    mv = merge_stream_variables(cfg, v, pairs=9)
    mm = build_model(cfg, merge_pairs=9)
    got, _, _ = mm.apply(mv, rgb, ir, train=False, decode=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    rt = unmerge_stream_variables(cfg, mv, pairs=9)
    a = {tu.keystr(p): np.asarray(l) for p, l in
         tu.tree_leaves_with_path(jax.device_get(v))}
    b = {tu.keystr(p): np.asarray(l) for p, l in tu.tree_leaves_with_path(rt)}
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_cli_loader_merged_variables_device_resident(setup, tmp_path):
    """Regression: merge_stream_variables returns HOST numpy; every surface
    that serves from the merged tree must device_put it once, or each jitted
    call re-uploads the full weight set (measured on the TPU tunnel:
    8.7 s/batch vs 66 ms with resident weights). The CLI loader is the
    product surface val/detect/http all go through."""
    from icafusion_tpu.cli._common import load_model_for_inference
    from icafusion_tpu.train.ema import ema_init
    from icafusion_tpu.train.optim import SGDState
    from icafusion_tpu.train.trainer import TrainState
    from icafusion_tpu.utils.checkpoint import save_checkpoint

    cfg, model, v, rgb, ir = setup
    state = TrainState(
        params=v["params"], batch_stats=v["batch_stats"],
        opt=SGDState(momentum=jax.tree.map(jnp.zeros_like, v["params"]),
                     step=jnp.asarray(0, jnp.int32)),
        ema=ema_init({"params": v["params"], "batch_stats": v["batch_stats"]}),
        rng=jax.random.PRNGKey(0))
    p = tmp_path / "last.ckpt"
    save_checkpoint(p, state, epoch=0, best_fitness=0.0)

    _, mm, mv = load_model_for_inference("zoo:tiny", str(p), merge=2)
    leaves = jax.tree.leaves(mv)
    assert leaves and all(isinstance(l, jax.Array) for l in leaves), \
        "merged inference variables must be device-resident jax.Arrays"
    got, _, _ = mm.apply(mv, rgb, ir, train=False, decode=True)
    ref, _, _ = model.apply(v, rgb, ir, train=False, decode=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
