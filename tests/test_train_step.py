"""Training-stack tests: optimizer schedule parity, EMA decay, end-to-end train step
(single device and 8-device SPMD mesh), loss decrease on an overfit batch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from icafusion_tpu.config import load_hyp_config
from icafusion_tpu.models import build_model
from icafusion_tpu.models.zoo import tiny_icafusion_config
from icafusion_tpu.parallel.mesh import make_mesh
from icafusion_tpu.train.ema import ema_init, ema_update
from icafusion_tpu.train.loss import pad_targets
from icafusion_tpu.train.optim import YoloSGD, param_group
from icafusion_tpu.train.trainer import Trainer, scaled_gains

HYP = load_hyp_config()


def _mk_batch(B, imgsz=64, T=8, seed=0):
    r = np.random.default_rng(seed)
    rgb = r.random((B, imgsz, imgsz, 3), np.float32)
    ir = r.random((B, imgsz, imgsz, 3), np.float32)
    labels = [np.array([[0, 0.5, 0.5, 0.4, 0.4], [1, 0.25, 0.25, 0.2, 0.3]],
                       np.float32)] * B
    t, m = pad_targets(labels, T)
    return rgb, ir, jnp.asarray(t), jnp.asarray(m)


def test_schedule_matches_reference_formulas():
    opt = YoloSGD(hyp=HYP, epochs=60, steps_per_epoch=100, total_batch_size=64)
    assert opt.warmup_steps == 1000  # max(3*100, 1000)
    # at step 0 (warmup start): bias lr = warmup_bias_lr, others 0, mom = warmup_momentum
    (lr0, lr1, lr2), mom = opt.schedules(jnp.asarray(0))
    assert float(lr2) == pytest.approx(HYP.warmup_bias_lr)
    assert float(lr0) == pytest.approx(0.0) and float(lr1) == pytest.approx(0.0)
    assert float(mom) == pytest.approx(HYP.warmup_momentum)
    # well past warmup, epoch 30: one_cycle factor
    import math
    step = 30 * 100
    lf = ((1 - math.cos(30 * math.pi / 60)) / 2) * (HYP.lrf - 1) + 1
    (lr0, lr1, lr2), mom = opt.schedules(jnp.asarray(step))
    assert float(lr1) == pytest.approx(HYP.lr0 * lf, rel=1e-5)
    assert float(mom) == pytest.approx(HYP.momentum)
    # weight decay pre-scaling (train.py:123-126)
    assert opt.weight_decay == pytest.approx(HYP.weight_decay * 64 * 1 / 64)


def test_param_grouping():
    from jax.tree_util import DictKey
    p = lambda *names: tuple(DictKey(n) for n in names)
    assert param_group(p("m0", "bn", "scale")) == 0
    assert param_group(p("m0", "conv", "kernel")) == 1
    assert param_group(p("m0", "conv", "bias")) == 2
    assert param_group(p("m20", "crosstransformer0", "coefficients")) == 2
    assert param_group(p("m20", "pos_emb_vis")) == 0
    assert param_group(p("m20", "crosstransformer0", "mlp_ln", "scale")) == 1


def test_ema_decay_formula():
    v = {"params": {"w": jnp.ones(3)}}
    s = ema_init(v)
    s = ema_update(s, {"params": {"w": jnp.zeros(3)}})
    d = 0.9999 * (1 - np.exp(-1 / 2000))
    np.testing.assert_allclose(np.asarray(s.tree["params"]["w"]), d, rtol=1e-4)


@pytest.fixture(scope="module")
def tiny_trainer():
    cfg = tiny_icafusion_config(nc=3)
    model = build_model(cfg)
    tr = Trainer(model=model, hyp=HYP, epochs=3, steps_per_epoch=10,
                 batch_size=4, imgsz=64)
    rgb, ir, t, m = _mk_batch(4)
    state = tr.init_state(jax.random.PRNGKey(0), rgb[:1], ir[:1])
    return tr, state, (rgb, ir, t, m)


def test_freeze_substring_match():
    """optim._is_frozen mirrors the reference's `any(x in k for x in freeze)`
    (train.py:115-120): substring, not prefix."""
    from jax.tree_util import DictKey

    from icafusion_tpu.train.optim import _is_frozen
    p = lambda *names: tuple(DictKey(n) for n in names)
    assert _is_frozen(p("m0", "conv", "kernel"), ("m0",))
    assert _is_frozen(p("m23", "cv3", "conv", "kernel"), ("m23/cv3",))
    assert _is_frozen(p("m10", "bn", "scale"), ("bn",))   # substring semantics
    assert not _is_frozen(p("m1", "conv", "kernel"), ("m0",))
    assert not _is_frozen(p("m1", "conv", "kernel"), ())
    # leading-slash anchor: layer 0 only, not the C3-internal m0 bottleneck
    assert _is_frozen(p("m0", "conv", "kernel"), ("/m0/",))
    assert not _is_frozen(p("m12", "m0", "cv1", "conv", "kernel"), ("/m0/",))
    assert _is_frozen(p("m12", "m0", "cv1", "conv", "kernel"), ("m0",))


def test_frozen_params_do_not_move(tiny_trainer):
    """Trainer(freeze=...): frozen subtrees are bit-identical after optimizer
    steps while the rest train (reference requires_grad=False contract)."""
    tr, _, (rgb, ir, t, m) = tiny_trainer
    ftr = Trainer(model=tr.model, hyp=HYP, epochs=3, steps_per_epoch=10,
                  batch_size=4, imgsz=64, freeze=("m0", "m1/"))
    state = ftr.init_state(jax.random.PRNGKey(0), rgb[:1], ir[:1])
    before = jax.device_get(state.params)
    step = jax.jit(ftr.make_train_step())
    for _ in range(3):
        state, metrics = step(state, rgb, ir, t, m)
    assert np.isfinite(float(metrics["loss"]))
    after = jax.device_get(state.params)
    from icafusion_tpu.train.optim import _is_frozen, _path_str
    flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_a = jax.tree_util.tree_flatten_with_path(after)[0]
    n_frozen = n_moved = 0
    for (pb, vb), (pa, va) in zip(flat_b, flat_a):
        assert _path_str(pb) == _path_str(pa)
        if _is_frozen(pb, ("m0", "m1/")):
            np.testing.assert_array_equal(vb, va, err_msg=_path_str(pb))
            n_frozen += 1
        elif not np.array_equal(vb, va):
            n_moved += 1
    assert n_frozen > 0 and n_moved > 0, (n_frozen, n_moved)


@pytest.mark.slow
def test_train_step_runs_and_learns(tiny_trainer):
    tr, state, (rgb, ir, t, m) = tiny_trainer
    step = jax.jit(tr.make_train_step())
    losses = []
    for i in range(30):
        state, metrics = step(state, rgb, ir, t, m)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # overfitting one batch must reduce the loss
    assert losses[-1] < losses[0] * 0.9, f"no learning: {losses[0]} -> {losses[-1]}"
    assert int(state.opt.step) == 30
    assert int(state.ema.updates) == 30


@pytest.mark.slow
def test_train_step_spmd_8dev_matches_single(tiny_trainer):
    """The SPMD-sharded step must produce the same loss as the single-device step."""
    tr, state0, (rgb, ir, t, m) = tiny_trainer
    mesh = make_mesh(8)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    rgb8 = np.tile(rgb, (2, 1, 1, 1))
    ir8 = np.tile(ir, (2, 1, 1, 1))
    t8 = jnp.tile(t, (2, 1, 1))
    m8 = jnp.tile(m, (2, 1))

    step_fn = tr.make_train_step()
    single = jax.jit(step_fn)
    _, metrics1 = single(state0, rgb8, ir8, t8, m8)

    state_r = jax.device_put(state0, repl)
    batch = jax.device_put((rgb8, ir8, t8, m8), data)
    sharded = jax.jit(step_fn, in_shardings=(repl, data, data, data, data),
                      out_shardings=(repl, repl))
    _, metrics8 = sharded(state_r, *batch)
    np.testing.assert_allclose(float(metrics1["loss"]), float(metrics8["loss"]),
                               rtol=1e-4)


@pytest.mark.slow
def test_grad_accumulation_consistency():
    """accum_steps=2 over a doubled batch should match accum=1 on the same data
    up to BN-update ordering (loose tolerance)."""
    cfg = tiny_icafusion_config(nc=3)
    model = build_model(cfg)
    rgb, ir, t, m = _mk_batch(4)
    tr2 = Trainer(model=model, hyp=HYP, epochs=3, steps_per_epoch=10,
                  batch_size=2, imgsz=64, accum_steps=2)
    state = tr2.init_state(jax.random.PRNGKey(0), rgb[:1], ir[:1])
    step2 = jax.jit(tr2.make_train_step())
    state, metrics = step2(state, rgb, ir, t, m)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.opt.step) == 1


def test_max_pool_custom_vjp_matches_xla_gradient():
    """SPPF's stride-1 max pool carries a custom VJP (first-winner mask
    instead of XLA's select-and-scatter — layers.py). The gradient must match
    the default VJP (up to float summation order) for every kernel the
    SPP/SPPF family uses, INCLUDING tied inputs (integer-valued) and chained
    pools (the SPPF pattern, where the middle pool's input holds systematic
    duplicate maxima)."""
    from icafusion_tpu.nn.layers import _max_pool_same, _max_pool_same_impl
    rng = np.random.default_rng(7)
    for k in (5, 9, 13):
        for mk in (lambda: rng.normal(size=(2, 12, 9, 8)),
                   lambda: rng.integers(0, 4, (2, 12, 9, 8))):  # ties
            x = jnp.asarray(mk().astype(np.float32))
            ct = jnp.asarray(rng.normal(size=(2, 12, 9, 8)).astype(np.float32))
            y1, vjp1 = jax.vjp(lambda a: _max_pool_same(a, k), x)
            y2, vjp2 = jax.vjp(lambda a: _max_pool_same_impl(a, k), x)
            np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
            np.testing.assert_allclose(np.asarray(vjp1(ct)[0]),
                                       np.asarray(vjp2(ct)[0]),
                                       rtol=1e-5, atol=1e-6)
        # chained pools: tie-handling must match XLA's first-winner exactly
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 5)).astype(np.float32))
        ct = jnp.asarray(rng.normal(size=(2, 16, 16, 5)).astype(np.float32))
        g1 = jax.vjp(lambda a: _max_pool_same(
            _max_pool_same(_max_pool_same(a, k), k), k), x)[1](ct)[0]
        g2 = jax.vjp(lambda a: _max_pool_same_impl(
            _max_pool_same_impl(_max_pool_same_impl(a, k), k), k), x)[1](ct)[0]
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-6)
