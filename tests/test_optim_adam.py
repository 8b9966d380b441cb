"""YoloAdam matches torch.optim.Adam step-for-step (the reference's --adam
option, train.py:128-146): betas=(momentum, 0.999), per-group weight decay
(kernels only, L2-into-grad), shared LR schedule."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from icafusion_tpu.config import HypConfig  # noqa: E402
from icafusion_tpu.train.optim import YoloAdam, param_group  # noqa: E402


def test_adam_matches_torch():
    rng = np.random.default_rng(0)
    params = {
        "m0": {"conv": {"kernel": rng.normal(size=(3, 3, 4, 8)).astype(np.float32)},
               "bn": {"scale": rng.normal(size=(8,)).astype(np.float32),
                      "bias": rng.normal(size=(8,)).astype(np.float32)}},
        "m1": {"dense": {"kernel": rng.normal(size=(8, 4)).astype(np.float32),
                         "bias": rng.normal(size=(4,)).astype(np.float32)}},
    }
    # zero warmup + flat schedule so lr == lr0 every step on both sides
    hyp = HypConfig().replace(lr0=1e-3, lrf=1.0, warmup_epochs=0.0,
                              momentum=0.9, weight_decay=0.01)
    opt = YoloAdam(hyp=hyp, epochs=10, steps_per_epoch=1000,
                   total_batch_size=64, warmup_min_steps=0)
    state = opt.init(params)

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    tp = [torch.nn.Parameter(torch.from_numpy(np.asarray(v).copy()))
          for _, v in flat]
    groups = [param_group(path) for path, _ in flat]
    wd = opt.weight_decay
    topt = torch.optim.Adam([
        {"params": [p for p, g in zip(tp, groups) if g != 1], "weight_decay": 0.0},
        {"params": [p for p, g in zip(tp, groups) if g == 1], "weight_decay": wd},
    ], lr=1e-3, betas=(0.9, 0.999))

    jparams = params
    for step in range(5):
        g_rng = np.random.default_rng(100 + step)
        grads_flat = [g_rng.normal(size=np.shape(v)).astype(np.float32)
                      for _, v in flat]
        grads = jax.tree_util.tree_unflatten(treedef, grads_flat)
        jparams, state = opt.update(grads, state, jparams)

        k = iter(grads_flat)
        for p, g in zip(tp, (next(k) for _ in tp)):
            p.grad = torch.from_numpy(g.copy())
        topt.step()
        topt.zero_grad()

    jflat = [np.asarray(v) for _, v in
             jax.tree_util.tree_flatten_with_path(jparams)[0]]
    for jv, tv, (path, _) in zip(jflat, tp, flat):
        np.testing.assert_allclose(jv, tv.detach().numpy(), rtol=2e-5, atol=2e-6,
                                   err_msg=str(path))
