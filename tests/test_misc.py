"""Tests for hyp evolution, dataset tools, paired video streams, loggers."""

import numpy as np
import pytest

from icafusion_tpu.config import load_hyp_config


def test_mutate_respects_bounds():
    from icafusion_tpu.train.evolve import META, mutate
    hyp = load_hyp_config()
    rng = np.random.default_rng(0)
    for _ in range(20):
        m = mutate(hyp, rng)
        for k, (_, lo, hi) in META.items():
            v = getattr(m, k)
            assert lo <= v <= hi, f"{k}={v} outside [{lo},{hi}]"


def test_evolve_improves_over_log(tmp_path):
    from icafusion_tpu.train.evolve import evolve
    hyp = load_hyp_config()

    # toy fitness: peak at lr0=0.03, mosaic=0.5
    def train_fn(h):
        return -((h.lr0 - 0.03) ** 2) * 100 - (h.mosaic - 0.5) ** 2

    best = evolve(train_fn, hyp, generations=25,
                  log_path=str(tmp_path / "evolve.csv"), seed=0)
    base_fit = train_fn(hyp)
    assert train_fn(best) >= base_fit
    assert (tmp_path / "evolve.csv").exists()


def test_autosplit_and_flatten(tmp_path):
    import cv2
    from icafusion_tpu.data.tools import autosplit, extract_boxes, flatten_recursive
    d = tmp_path / "visible" / "train"
    (tmp_path / "labels" / "train").mkdir(parents=True)
    d.mkdir(parents=True)
    for i in range(10):
        img = np.full((64, 64, 3), 100, np.uint8)
        cv2.rectangle(img, (10, 10), (40, 40), (250, 30, 30), -1)
        cv2.imwrite(str(d / f"i{i}.jpg"), img)
        (tmp_path / "labels" / "train" / f"i{i}.txt").write_text(
            "1 0.4 0.4 0.5 0.5\n")
    autosplit(str(d), weights=(0.8, 0.2, 0.0))
    train_list = (d.parent / "autosplit_train.txt").read_text().splitlines()
    val_list = (d.parent / "autosplit_val.txt").read_text().splitlines()
    assert len(train_list) + len(val_list) == 10

    n = extract_boxes(str(d), out_dir=str(tmp_path / "cls"))
    assert n == 10
    assert len(list((tmp_path / "cls" / "1").glob("*.jpg"))) == 10

    out = flatten_recursive(str(tmp_path / "visible"))
    assert len(list(out.glob("*.jpg"))) == 10


def test_paired_video_stream(tmp_path):
    import cv2
    from icafusion_tpu.data.streams import LoadPairedVideos
    paths = []
    for name in ("a.mp4", "b.mp4"):
        p = str(tmp_path / name)
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 96))
        for i in range(5):
            w.write(np.full((96, 128, 3), i * 40, np.uint8))
        w.release()
        paths.append(p)
    src = LoadPairedVideos(paths[0], paths[1], img_size=128)
    frames = list(src)
    src.release()
    assert len(frames) == 5
    rgb_lb, ir_lb, rgb0, ir0 = frames[0]
    assert rgb_lb.shape == (128, 128, 3)
    assert rgb0.shape == (96, 128, 3)


def test_loggers_noop(tmp_path):
    from icafusion_tpu.utils.loggers import Loggers
    lg = Loggers(tmp_path, enable_tb=True)  # TB backends absent -> no-op
    lg.log_scalars({"loss": 1.0}, step=0)
    lg.log_image("img", np.zeros((8, 8, 3), np.uint8), step=0)
    lg.close()


def test_detection_records_and_hist_equalize_and_qfocal():
    import jax.numpy as jnp

    from icafusion_tpu.data.augment import hist_equalize
    from icafusion_tpu.ops.nms import Detections, detections_to_records
    from icafusion_tpu.train.loss import qfocal_bce_with_logits

    d = Detections(boxes=jnp.asarray([[[1.0, 2, 3, 4]]]),
                   scores=jnp.asarray([[0.9]]),
                   classes=jnp.asarray([[1]]),
                   valid=jnp.asarray([[True]]))
    recs = detections_to_records(d, names=["a", "b"])
    assert recs[0][0]["name"] == "b"
    assert recs[0][0]["confidence"] == pytest.approx(0.9)  # fp32 round trip

    img = (np.linspace(0, 255, 64 * 64 * 3).reshape(64, 64, 3)).astype(np.uint8)
    eq = hist_equalize(img)
    assert eq.shape == img.shape and eq.dtype == np.uint8

    l = qfocal_bce_with_logits(jnp.zeros((4, 3)), jnp.ones((4, 3)), gamma=1.5)
    assert np.isfinite(np.asarray(l)).all()


@pytest.mark.slow
def test_hub_factory():
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent.parent))
    import hub
    assert "icafusion_l" in hub.list_models()
    model, variables = hub.create("icafusion_tiny", nc=3, img_size=64)
    import jax
    import jax.numpy as jnp
    x = jnp.zeros((1, 64, 64, 3))
    pred, logits, raw = jax.jit(
        model.apply, static_argnames=("train", "decode"))(
        variables, x, x, train=False, decode=True)
    assert pred.shape[-1] == 8


def test_detect_streams_live_loop(tmp_path):
    """detect CLI stream branch: LoadPairedStreams threaded readers feed the
    jitted two-stream inference loop; bounded by --max-frames; writes the
    annotated latest frame. Uses mp4 files as cv2 'streams' (same capture API
    as webcam/RTSP)."""
    import cv2
    import jax.numpy as jnp

    from icafusion_tpu.cli.detect import detect_streams, _is_stream, parse_args
    from icafusion_tpu.models import build_model
    from icafusion_tpu.models.zoo import tiny_icafusion_config

    assert _is_stream("0") and _is_stream("rtsp://cam/1")
    assert not _is_stream("folder/visible") and not _is_stream("a.mp4")

    paths = []
    for name in ("s1.mp4", "s2.mp4"):
        p = str(tmp_path / name)
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 96))
        for i in range(200):
            w.write(np.full((96, 128, 3), 30 + i, np.uint8))
        w.release()
        paths.append(p)

    mc = tiny_icafusion_config(nc=3)
    model = build_model(mc, dtype=jnp.float32)
    import jax
    variables = jax.jit(model.init, static_argnames=("train", "decode"))(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
        train=False, decode=False)
    args = parse_args(["--weights", "x", "--cfg", "zoo:tiny",
                       "--source1", paths[0], "--source2", paths[1],
                       "--img-size", "64", "--max-frames", "3",
                       "--stream-fps", "4",
                       "--save-dir", str(tmp_path / "out")])
    # paced file replay: each frame processed once (seq dedup); terminates at
    # max_frames, or via the stale timeout once the file drains
    n = detect_streams(args, model, variables, ["a", "b", "c"],
                       stale_timeout=8.0)
    assert 1 <= n <= 3
    assert (tmp_path / "out" / "stream0_last.jpg").exists()


def test_detect_folder_cli_flags(tmp_path):
    """Folder-branch detect CLI with the reference's output flags
    (detect_twostream.py:203-224): --save-txt format is normalized
    'cls xc yc w h' (+conf with --save-conf), --save-crop writes
    crops/<class>/<stem>.jpg, --classes filters NMS output."""
    import cv2
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from icafusion_tpu.cli.detect import main
    from icafusion_tpu.models import build_model
    from icafusion_tpu.models.zoo import tiny_icafusion_config

    vis, ir = tmp_path / "vis", tmp_path / "ir"
    vis.mkdir(), ir.mkdir()
    rng = np.random.default_rng(0)
    for stem in ("a", "b"):
        cv2.imwrite(str(vis / f"{stem}.jpg"),
                    rng.integers(0, 255, (96, 128, 3), np.uint8))
        cv2.imwrite(str(ir / f"{stem}.jpg"),
                    rng.integers(0, 255, (96, 128, 3), np.uint8))

    mc = tiny_icafusion_config(nc=3)
    model = build_model(mc, dtype=jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train", "decode"))(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
        train=False, decode=False)
    ckpt = tmp_path / "w.ckpt"
    ckpt.write_bytes(serialization.msgpack_serialize({
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats", {})),
        "meta": {"epoch": 0, "best_fitness": 0.0}}))

    out = tmp_path / "out"
    main(["--weights", str(ckpt), "--cfg", "zoo:tiny",
          "--source1", str(vis), "--source2", str(ir),
          "--img-size", "64", "--batch-size", "2", "--conf-thres", "0.001",
          "--save-dir", str(out), "--save-txt", "--save-conf",
          "--save-crop", "--classes", "0", "1", "--hide-conf"])

    txts = sorted(out.glob("*.txt"))
    assert txts, "random-weight detections at conf 0.001 must produce labels"
    vals = np.array([l.split() for l in txts[0].read_text().split("\n") if l],
                    np.float32)
    assert vals.shape[1] == 6                     # cls xc yc w h conf
    assert set(vals[:, 0].astype(int)) <= {0, 1}  # --classes filter
    assert (vals[:, 1:5] >= -1e-6).all() and (vals[:, 1:5] <= 1 + 1e-6).all()
    assert list(out.glob("crops/*/*.jpg")), "--save-crop output missing"
    assert (out / "a_rgb.jpg").exists() and (out / "a_ir.jpg").exists()


def test_detect_folder_rect_buckets(tmp_path, capsys):
    """--rect detect (reference detect_twostream's letterbox auto=True
    default, datasets.py:1424): sources of two aspect ratios land in two
    canvas-shape buckets, each batched/compiled separately; labels stay
    normalized to native coords."""
    import cv2
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from icafusion_tpu.cli.detect import main
    from icafusion_tpu.models import build_model
    from icafusion_tpu.models.zoo import tiny_icafusion_config

    vis, ir = tmp_path / "vis", tmp_path / "ir"
    vis.mkdir(), ir.mkdir()
    rng = np.random.default_rng(0)
    # 3 landscape (96x128 -> 48x64 canvas) + 2 portrait (128x96 -> 64x48)
    for stem, hw in (("a", (96, 128)), ("b", (96, 128)), ("c", (96, 128)),
                     ("d", (128, 96)), ("e", (128, 96))):
        for d in (vis, ir):
            cv2.imwrite(str(d / f"{stem}.jpg"),
                        rng.integers(0, 255, (*hw, 3), np.uint8))

    mc = tiny_icafusion_config(nc=3)
    model = build_model(mc, dtype=jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train", "decode"))(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
        train=False, decode=False)
    ckpt = tmp_path / "w.ckpt"
    ckpt.write_bytes(serialization.msgpack_serialize({
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats", {})),
        "meta": {"epoch": 0, "best_fitness": 0.0}}))

    out = tmp_path / "out"
    # img-size 128: 96x128 sources keep r=1 (scaleup=False) -> 96x128 canvas,
    # portrait -> 128x96; at 64 the stride-32 round-up would collapse both
    main(["--weights", str(ckpt), "--cfg", "zoo:tiny",
          "--source1", str(vis), "--source2", str(ir),
          "--img-size", "128", "--batch-size", "2", "--conf-thres", "0.001",
          "--rect", "--save-dir", str(out), "--save-txt", "--nosave"])

    assert "2 canvas shape(s)" in capsys.readouterr().out
    txts = sorted(out.glob("*.txt"))
    assert {t.stem for t in txts} <= {"a", "b", "c", "d", "e"} and txts
    for t in txts:
        vals = np.array([l.split() for l in t.read_text().split("\n") if l],
                        np.float32)
        assert vals.shape[1] == 5
        assert (vals[:, 1:] >= -1e-6).all() and (vals[:, 1:] <= 1 + 1e-6).all()
