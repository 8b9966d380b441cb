"""Auxiliary component tests: autoanchor, confluence, checkpoint round-trip."""

import numpy as np
import pytest


def test_anchor_metric_and_fitness():
    from icafusion_tpu.train.autoanchor import anchor_fitness, check_anchors
    anchors = np.array([[10, 13], [16, 30], [33, 23]], np.float32)
    # labels exactly equal to anchors -> perfect fit
    wh = anchors.copy()
    bpr, aat = check_anchors(wh, anchors, thr=4.0)
    assert bpr == 1.0
    assert anchor_fitness(wh, anchors, 0.25) == pytest.approx(1.0)
    # labels 10x larger than all anchors -> ratio 0.1 < 1/4 -> bpr 0
    bpr2, _ = check_anchors(wh * 10, anchors, thr=4.0)
    assert bpr2 == 0.0


def test_kmean_anchors_recovers_clusters():
    from icafusion_tpu.train.autoanchor import check_anchors, kmean_anchors
    rng = np.random.default_rng(0)
    true = np.array([[12, 15], [40, 60], [120, 90]], np.float32)
    wh = np.concatenate([t * rng.uniform(0.9, 1.1, (200, 2)) for t in true])
    k = kmean_anchors(wh, n=3, gen=200, seed=0)
    assert k.shape == (3, 2)
    bpr, _ = check_anchors(wh, k, thr=4.0)
    assert bpr > 0.99


def test_confluence_keeps_separated_boxes():
    from icafusion_tpu.ops.confluence import confluence_indices, confluence_process
    dets = np.array([
        [10, 10, 50, 50, 0.9, 0],
        [12, 12, 52, 52, 0.8, 0],      # near-duplicate of the first
        [200, 200, 260, 260, 0.7, 0],  # far away
    ], np.float32)
    keep = confluence_indices(dets, class_num=1, p_thres=0.6)
    assert len(keep) == 2
    assert 2 in keep

    # full pipeline from decoded xywh predictions
    pred = np.zeros((1, 3, 6), np.float32)
    pred[0, 0] = [30, 30, 40, 40, 0.9, 1.0]
    pred[0, 1] = [32, 32, 40, 40, 0.8, 1.0]
    pred[0, 2] = [230, 230, 60, 60, 0.7, 1.0]
    out = confluence_process(pred, conf_thres=0.1, p_thres=0.6)
    assert out[0].shape[1] == 6
    assert len(out[0]) == 2


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from icafusion_tpu.config import load_hyp_config
    from icafusion_tpu.train.ema import EmaState, ema_init
    from icafusion_tpu.train.optim import SGDState
    from icafusion_tpu.train.trainer import TrainState
    from icafusion_tpu.utils.checkpoint import (load_checkpoint,
                                                load_inference_variables,
                                                restore_train_state,
                                                save_checkpoint, strip_checkpoint)

    params = {"m0": {"conv": {"kernel": jnp.ones((3, 3, 3, 8))}}}
    bs = {"m0": {"bn": {"mean": jnp.zeros(8), "var": jnp.ones(8)}}}
    state = TrainState(
        params=params, batch_stats=bs,
        opt=SGDState(momentum=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.asarray(7, jnp.int32)),
        ema=ema_init({"params": params, "batch_stats": bs}),
        rng=jax.random.PRNGKey(3))
    p = tmp_path / "last.ckpt"
    save_checkpoint(p, state, epoch=4, best_fitness=0.5, extra={"note": "x"})
    ckpt = load_checkpoint(p)
    assert ckpt["meta"]["epoch"] == 4
    assert ckpt["opt_step"] == 7

    restored = restore_train_state(ckpt, state)
    assert int(restored.opt.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["m0"]["conv"]["kernel"]),
                                  np.ones((3, 3, 3, 8)))

    strip_checkpoint(p, tmp_path / "stripped.ckpt")
    v = load_inference_variables(tmp_path / "stripped.ckpt")
    assert v["params"]["m0"]["conv"]["kernel"].dtype == np.float32
    # strip drops the optimizer (smaller file)
    assert (tmp_path / "stripped.ckpt").stat().st_size < p.stat().st_size


class TestDownloads:
    """utils/downloads.py — google_utils.py:19-92 counterpart (no egress in
    this environment: the url machinery is exercised through file:// URLs)."""

    def test_local_passthrough(self, tmp_path):
        from icafusion_tpu.utils.downloads import attempt_download
        f = tmp_path / "w.msgpack"
        f.write_bytes(b"x" * 10)
        assert attempt_download(f) == f

    def test_safe_download_file_url(self, tmp_path):
        from icafusion_tpu.utils.downloads import safe_download
        src = tmp_path / "src.bin"
        src.write_bytes(b"y" * 2048)
        dst = tmp_path / "dst.bin"
        out = safe_download(src.as_uri(), dst, min_bytes=1024)
        assert out.read_bytes() == src.read_bytes()

    def test_safe_download_too_small_cleans_up(self, tmp_path):
        import pytest

        from icafusion_tpu.utils.downloads import DownloadError, safe_download
        src = tmp_path / "src.bin"
        src.write_bytes(b"tiny")
        dst = tmp_path / "dst.bin"
        with pytest.raises(DownloadError):
            safe_download(src.as_uri(), dst, min_bytes=1024)
        assert not dst.exists()

    def test_release_url_fallback_table(self):
        from icafusion_tpu.utils.downloads import github_release_url
        url = github_release_url("yolov5l.pt", tag="v5.0",
                                 assets=["yolov5l.pt"])
        assert url == ("https://github.com/ultralytics/yolov5/releases/"
                       "download/v5.0/yolov5l.pt")
        assert github_release_url("nope.pt", tag="v5.0", assets=["a.pt"]) is None

    def test_missing_unknown_asset_raises(self, tmp_path):
        import pytest

        from icafusion_tpu.utils.downloads import DownloadError, attempt_download
        with pytest.raises(DownloadError, match="not a known release asset"):
            attempt_download(tmp_path / "custom_weights.pt",
                             repo="nonexistent/repo")


def test_background_checkpoint_save(tmp_path):
    """background=True saves produce byte-identical checkpoints after
    wait_pending_saves(), and same-path saves are ordered (last wins)."""
    import jax
    import jax.numpy as jnp

    from icafusion_tpu.train.ema import ema_init
    from icafusion_tpu.train.optim import SGDState
    from icafusion_tpu.train.trainer import TrainState
    from icafusion_tpu.utils.checkpoint import (load_checkpoint,
                                                save_checkpoint,
                                                wait_pending_saves)

    def mk_state(v):
        params = {"m0": {"conv": {"kernel": jnp.full((2, 2, 3, 4), v)}}}
        bs = {"m0": {"bn": {"mean": jnp.zeros(4), "var": jnp.ones(4)}}}
        return TrainState(
            params=params, batch_stats=bs,
            opt=SGDState(momentum=jax.tree.map(jnp.zeros_like, params),
                         step=jnp.asarray(int(v), jnp.int32)),
            ema=ema_init({"params": params, "batch_stats": bs}),
            rng=jax.random.PRNGKey(0))

    p_sync, p_bg = tmp_path / "sync.ckpt", tmp_path / "bg.ckpt"
    save_checkpoint(p_sync, mk_state(1.0), epoch=1, best_fitness=0.1)
    save_checkpoint(p_bg, mk_state(1.0), epoch=1, best_fitness=0.1,
                    background=True)
    # second save to the same path while the first may be in flight
    save_checkpoint(p_bg, mk_state(2.0), epoch=2, best_fitness=0.2,
                    background=True)
    wait_pending_saves()
    ckpt = load_checkpoint(p_bg)
    assert ckpt["meta"]["epoch"] == 2 and ckpt["opt_step"] == 2
    ref = load_checkpoint(p_sync)
    np.testing.assert_array_equal(
        ckpt["params"]["m0"]["conv"]["kernel"],
        np.asarray(ref["params"]["m0"]["conv"]["kernel"]) * 2)
