"""Dynamic micro-batching (serve/batcher.py): concurrent submits coalesce
into bucketed device batches with results identical to serial engine calls.
The reference's serving demo (utils/flask_rest_api/restapi.py:16-37) runs one
image per request; the batcher is the beyond-reference production path."""

import threading
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np
import pytest

from icafusion_tpu.models import build_model
from icafusion_tpu.models.zoo import tiny_icafusion_config


@pytest.fixture(scope="module")
def engine():
    from icafusion_tpu.serve.engine import ServingEngine
    cfg = tiny_icafusion_config(nc=3)
    model = build_model(cfg)
    x = np.zeros((1, 64, 96, 3), np.float32)
    variables = jax.jit(model.init, static_argnames=("train", "decode"))(
        {"params": jax.random.PRNGKey(0)}, x, x, train=False, decode=False)
    return ServingEngine(model=model, variables=variables, img_size=(64, 96),
                         batch_size=4, n_devices=1, conf_thres=0.001)


def _pairs(n, seed=0):
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 255, (n, 64, 96, 3), np.uint8)
    ir = rng.integers(0, 255, (n, 64, 96, 3), np.uint8)
    return rgb, ir


def test_default_buckets_respect_mesh(engine):
    from icafusion_tpu.serve.batcher import default_buckets
    assert default_buckets(engine) == [1, 2, 4]


def test_invalid_buckets_rejected(engine):
    from icafusion_tpu.serve.batcher import MicroBatcher
    with pytest.raises(ValueError):
        MicroBatcher(engine, buckets=[8])  # > engine.batch_size


def test_concurrent_submits_match_serial_and_coalesce(engine):
    from icafusion_tpu.serve.batcher import MicroBatcher
    rgb, ir = _pairs(8)
    serial = [engine.predict_arrays(rgb[i:i + 1], ir[i:i + 1])[0]
              for i in range(8)]

    with MicroBatcher(engine, max_wait_ms=500.0) as mb:
        mb.warmup()   # compile each bucket before timing-sensitive submits
        barrier = threading.Barrier(8)

        def call(i):
            barrier.wait()   # release all 8 submits at once
            return mb.submit(rgb[i], ir[i])

        with ThreadPoolExecutor(8) as ex:
            outs = list(ex.map(call, range(8)))
        stats = mb.stats()

    assert stats["requests"] == 8
    # 8 simultaneous requests over buckets {1,2,4} with a 500 ms coalesce
    # window must land in fewer batches than requests
    assert stats["batches"] < 8
    assert max(stats["bucket_counts"]) >= 2
    for got, want in zip(outs, serial):
        assert got.shape == want.shape
        if len(want):
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_orig_hw_rescale_matches_engine(engine):
    from icafusion_tpu.serve.batcher import MicroBatcher
    rgb, ir = _pairs(1, seed=3)
    want = engine.predict_arrays(rgb, ir, orig_hw=[(120, 160)])[0]
    with MicroBatcher(engine) as mb:
        got = mb.submit(rgb[0], ir[0], orig_hw=(120, 160))
    assert got.shape == want.shape
    if len(want):
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_submit_error_propagates(engine):
    from icafusion_tpu.serve.batcher import MicroBatcher
    with MicroBatcher(engine) as mb:
        with pytest.raises(Exception):
            mb.submit(np.zeros((3, 3), np.uint8), np.zeros((3, 3), np.uint8))
        # batcher survives a poisoned batch: a good request still works
        rgb, ir = _pairs(1, seed=5)
        out = mb.submit(rgb[0], ir[0])
        assert out.ndim == 2 and out.shape[1] == 6


def test_closed_batcher_rejects(engine):
    from icafusion_tpu.serve.batcher import MicroBatcher
    mb = MicroBatcher(engine)
    mb.close()
    rgb, ir = _pairs(1)
    with pytest.raises(RuntimeError):
        mb.submit(rgb[0], ir[0])
