"""Data-pipeline tests on a generated synthetic paired dataset: discovery, label
parsing/caching, letterbox geometry, mosaic validity, paired-flip coupling,
fixed-shape loader batches."""

import numpy as np
import pytest

from icafusion_tpu.config import load_hyp_config
from icafusion_tpu.data.augment import letterbox, xywhn2xyxy, xyxy2xywhn
from icafusion_tpu.data.datasets import (PairedDetectionDataset, img2label_path,
                                         parse_label_file)
from icafusion_tpu.data.loader import PairedLoader


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    """visible/ + infrared/ + labels/ with drawn rectangles, varied sizes."""
    import cv2
    root = tmp_path_factory.mktemp("flir_like")
    (root / "visible" / "train").mkdir(parents=True)
    (root / "infrared" / "train").mkdir(parents=True)
    (root / "labels" / "train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    sizes = [(480, 640), (512, 640), (640, 512)]
    for i in range(12):
        h, w = sizes[i % len(sizes)]
        rgb = np.full((h, w, 3), 30, np.uint8)
        ir = np.full((h, w, 3), 20, np.uint8)
        lines = []
        for _ in range(rng.integers(1, 4)):
            bw, bh = int(rng.uniform(0.1, 0.3) * w), int(rng.uniform(0.1, 0.3) * h)
            x1 = int(rng.uniform(0, w - bw))
            y1 = int(rng.uniform(0, h - bh))
            cls = int(rng.integers(0, 3))
            color = [(255, 60, 60), (60, 255, 60), (60, 60, 255)][cls]
            cv2.rectangle(rgb, (x1, y1), (x1 + bw, y1 + bh), color, -1)
            cv2.rectangle(ir, (x1, y1), (x1 + bw, y1 + bh), (200, 200, 200), -1)
            cx, cy = (x1 + bw / 2) / w, (y1 + bh / 2) / h
            lines.append(f"{cls} {cx:.6f} {cy:.6f} {bw / w:.6f} {bh / h:.6f}")
        cv2.imwrite(str(root / "visible" / "train" / f"img{i:03d}.jpg"), rgb[:, :, ::-1])
        cv2.imwrite(str(root / "infrared" / "train" / f"img{i:03d}.jpg"), ir[:, :, ::-1])
        (root / "labels" / "train" / f"img{i:03d}.txt").write_text("\n".join(lines) + "\n")
    return root


def test_label_path_derivation():
    assert img2label_path("/d/visible/train/a.jpg") == "/d/labels/train/a.txt"
    assert img2label_path("/d/infrared/test/b.png") == "/d/labels/test/b.txt"
    assert img2label_path("/d/images/val/c.jpeg") == "/d/labels/val/c.txt"


def test_letterbox_geometry():
    img = np.zeros((480, 640, 3), np.uint8)
    out, ratio, (dw, dh) = letterbox(img, 640)
    assert out.shape == (640, 640, 3)
    assert ratio == (1.0, 1.0)
    assert (dw, dh) == (0.0, 80.0)
    # gray padding at top/bottom
    assert (out[:80] == 114).all() and (out[-80:] == 114).all()
    # scaleup=False on a small image: no upscale, pure pad
    small = np.zeros((100, 200, 3), np.uint8)
    out2, r2, _ = letterbox(small, 640, scaleup=False)
    assert r2 == (1.0, 1.0) and out2.shape == (640, 640, 3)


def test_letterbox_auto_rect():
    """auto=True = the reference's minimal-rectangle rule (datasets.py:1424,
    pad = pad mod stride): canvas is the scaled size rounded up to the next
    stride multiple, never the full square."""
    # 500x640 at 640: r=1, ph=140 -> 140 mod 32 = 12 -> 512x640 canvas
    img = np.full((500, 640, 3), 200, np.uint8)
    out, ratio, (dw, dh) = letterbox(img, 640, auto=True)
    assert out.shape == (512, 640, 3) and ratio == (1.0, 1.0)
    assert (dw, dh) == (0.0, 6.0)
    assert (out[6:506] == 200).all()          # image content centered
    assert (out[:6] == 114).all() and (out[506:] == 114).all()
    # exact stride multiple after scaling: zero pad, no square blow-up
    out2, r2, p2 = letterbox(np.zeros((960, 1280, 3), np.uint8), 640, auto=True)
    assert out2.shape == (480, 640, 3) and r2 == (0.5, 0.5) and p2 == (0, 0)
    # scaleup=False small image: canvas hugs the source, rounded up to 32
    out3, r3, _ = letterbox(np.zeros((100, 200, 3), np.uint8), 640,
                            scaleup=False, auto=True)
    assert out3.shape == (128, 224, 3) and r3 == (1.0, 1.0)
    for o in (out, out2, out3):
        assert o.shape[0] % 32 == 0 and o.shape[1] % 32 == 0


def test_box_roundtrip():
    rng = np.random.default_rng(0)
    xywh = np.stack([rng.uniform(0.3, 0.7, 10), rng.uniform(0.3, 0.7, 10),
                     rng.uniform(0.05, 0.2, 10), rng.uniform(0.05, 0.2, 10)], 1)
    xyxy = xywhn2xyxy(xywh, 640, 480)
    back = xyxy2xywhn(xyxy, 640, 480)
    np.testing.assert_allclose(back, xywh, atol=1e-5)


def test_dataset_discovery_and_labels(synth_root):
    ds = PairedDetectionDataset(str(synth_root / "visible" / "train"),
                                str(synth_root / "infrared" / "train"),
                                img_size=320, nc=3,
                                cache_dir=str(synth_root / ".cache"))
    assert len(ds) == 12
    assert all(len(l) >= 1 for l in ds.labels)
    assert ds.class_histogram().sum() == sum(len(l) for l in ds.labels)
    # cache round-trip
    ds2 = PairedDetectionDataset(str(synth_root / "visible" / "train"),
                                 str(synth_root / "infrared" / "train"),
                                 img_size=320, nc=3,
                                 cache_dir=str(synth_root / ".cache"))
    for a, b in zip(ds.labels, ds2.labels):
        np.testing.assert_array_equal(a, b)


def test_train_sample_mosaic_and_flip(synth_root):
    hyp = load_hyp_config()  # mosaic=1.0, fliplr=0.5
    ds = PairedDetectionDataset(str(synth_root / "visible" / "train"),
                                str(synth_root / "infrared" / "train"),
                                img_size=320, hyp=hyp, augment=True, nc=3)
    rng = np.random.default_rng(42)
    rgb, ir, labels = ds.train_sample(0, rng)
    assert rgb.shape == (320, 320, 3) and ir.shape == (320, 320, 3)
    assert rgb.dtype == np.uint8
    if len(labels):
        assert (labels[:, 1:] >= 0).all() and (labels[:, 1:] <= 1).all()
        assert (labels[:, 0] < 3).all()
    # determinism: same rng seed -> identical sample
    rgb2, ir2, labels2 = ds.train_sample(0, np.random.default_rng(42))
    np.testing.assert_array_equal(rgb, rgb2)
    np.testing.assert_array_equal(labels, labels2)


def test_paired_flip_coupling(synth_root):
    """Flips must apply to both modalities with one coin: wherever a box is in the
    RGB image, the IR image must have its (white) box at the same place."""
    hyp = load_hyp_config().replace(mosaic=0.0, fliplr=1.0, hsv_h=0, hsv_s=0, hsv_v=0,
                                    translate=0, scale=0)
    ds = PairedDetectionDataset(str(synth_root / "visible" / "train"),
                                str(synth_root / "infrared" / "train"),
                                img_size=320, hyp=hyp, augment=True, nc=3)
    rgb, ir, labels = ds.train_sample(3, np.random.default_rng(7))
    # bright pixels must coincide spatially between modalities
    m_rgb = rgb.max(-1) > 100
    m_ir = ir.max(-1) > 100
    inter = (m_rgb & m_ir).sum()
    union = (m_rgb | m_ir).sum()
    assert inter / union > 0.95, "modalities desynchronized under flip"


def test_loader_batches(synth_root):
    hyp = load_hyp_config()
    ds = PairedDetectionDataset(str(synth_root / "visible" / "train"),
                                str(synth_root / "infrared" / "train"),
                                img_size=320, hyp=hyp, augment=True, nc=3)
    loader = PairedLoader(ds, batch_size=4, max_targets=16, seed=0, num_workers=2)
    assert loader.steps_per_epoch == 3
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    b = batches[0]
    assert b["rgb"].shape == (4, 320, 320, 3) and b["rgb"].dtype == np.uint8
    assert b["targets"].shape == (4, 16, 5)
    assert b["mask"].shape == (4, 16)
    assert b["mask"].any()
    # val batches: fixed shape with count + shapes metadata
    vb = next(iter(loader.val_batches()))
    assert vb["rgb"].shape == (4, 320, 320, 3)
    assert vb["count"] == 4
    (h0, w0), (ratio, pad) = vb["shapes"][0]
    assert h0 in (480, 512, 640)


def test_dataset_error_messages(synth_root, tmp_path):
    """Clear errors for the common misconfigurations (reference-style asserts)."""
    # mismatched pair counts
    import shutil
    solo = tmp_path / "solo"
    (solo / "visible").mkdir(parents=True)
    (solo / "infrared").mkdir(parents=True)
    for i in range(3):
        shutil.copy(next((synth_root / "visible" / "train").glob("*.jpg")),
                    solo / "visible" / f"v{i}.jpg")
    shutil.copy(next((synth_root / "infrared" / "train").glob("*.jpg")),
                solo / "infrared" / "v0.jpg")
    with pytest.raises(AssertionError, match="paired counts differ"):
        PairedDetectionDataset(str(solo / "visible"), str(solo / "infrared"),
                               img_size=64)
    # empty source dir
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError, match="no images found"):
        PairedDetectionDataset(str(empty), str(empty), img_size=64)


def test_label_validation(tmp_path):
    bad = tmp_path / "bad.txt"
    bad.write_text("0 0.5 0.5 0.5\n")  # 4 columns
    with pytest.raises(AssertionError, match="5 columns"):
        parse_label_file(str(bad))
    bad.write_text("0 1.5 0.5 0.5 0.5\n")  # out of bounds
    with pytest.raises(AssertionError, match="normalized"):
        parse_label_file(str(bad))
    bad.write_text("5 0.5 0.5 0.5 0.5\n")  # class >= nc
    with pytest.raises(AssertionError, match="exceeds nc"):
        parse_label_file(str(bad), nc=3)
    # duplicate rows removed
    bad.write_text("0 0.5 0.5 0.5 0.5\n0 0.5 0.5 0.5 0.5\n")
    assert len(parse_label_file(str(bad))) == 1


def test_rect_val_batches_match_harness_geometry(synth_root):
    """The product rect-val path (loader.rect_val_batches, cli/val --rect)
    reproduces the accuracy-parity harness's rect geometry bit-exactly —
    the geometry tools/accuracy_parity.py proved agrees with the reference's
    rect pad-0.5 protocol to +0.000 pts (test.py:100, datasets.py:826-872)."""
    import sys
    from pathlib import Path

    import cv2

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from accuracy_parity import preprocess
    from ref_compat import rect_val_shape

    hyp = load_hyp_config()
    ds = PairedDetectionDataset(str(synth_root / "visible" / "train"),
                                str(synth_root / "infrared" / "train"),
                                img_size=320, hyp=hyp, augment=False, nc=3)
    loader = PairedLoader(ds, batch_size=4, shuffle=False)

    # canvas formula == the harness's rect_val_shape on every image
    for i in range(len(ds)):
        h0, w0 = ds.image_shapes()[i]
        assert ds.rect_val_canvas(i) == rect_val_shape(int(h0), int(w0), 320)

    n_seen, canvases = 0, set()
    for batch in loader.rect_val_batches():
        hh, ww = batch["rgb"].shape[1:3]
        canvases.add((hh, ww))
        assert hh % 32 == 0 and ww % 32 == 0
        for k in range(batch["count"]):
            p = batch["paths"][k]
            rgb0 = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            ir0 = cv2.cvtColor(cv2.imread(p.replace("visible", "infrared")),
                               cv2.COLOR_BGR2RGB)
            want_rgb, want_ir, hw0, want_rp = preprocess(rgb0, ir0, (hh, ww),
                                                         img_size=320)
            np.testing.assert_array_equal(batch["rgb"][k], want_rgb)
            np.testing.assert_array_equal(batch["ir"][k], want_ir)
            (h0, w0), (ratio, pad) = batch["shapes"][k]
            assert (h0, w0) == hw0
            np.testing.assert_allclose(ratio, want_rp[0], rtol=1e-9)
            np.testing.assert_allclose(pad, want_rp[1], rtol=1e-9)
            n_seen += 1
    assert n_seen == len(ds)
    # 3 native aspect ratios in the fixture -> 3 shape groups, each jit'd once
    assert len(canvases) == 3


def test_loader_local_rows_match_global_batches(synth_root):
    """Multi-process dataset sharding (PairedLoader.local_rows — the
    DistributedSampler counterpart, reference datasets.py:119): each process's
    slice of every batch must be BIT-IDENTICAL to the corresponding rows of
    the single-process loader's global batches, augmentation included (sample
    RNG is keyed on dataset index, not slot/process)."""
    hyp = load_hyp_config()

    def make(local_rows):
        ds = PairedDetectionDataset(str(synth_root / "visible" / "train"),
                                    str(synth_root / "infrared" / "train"),
                                    img_size=320, hyp=hyp, augment=True, nc=3)
        return PairedLoader(ds, batch_size=4, max_targets=16, seed=0,
                            num_workers=2, local_rows=local_rows)

    full = list(make(None).epoch(1))
    lo = list(make((0, 2)).epoch(1))
    hi = list(make((2, 4)).epoch(1))
    assert len(full) == len(lo) == len(hi)
    for f, a, b in zip(full, lo, hi):
        for k in ("rgb", "ir", "targets", "mask"):
            np.testing.assert_array_equal(f[k][:2], a[k])
            np.testing.assert_array_equal(f[k][2:], b[k])


def test_cached_labels_revalidated_against_nc(tmp_path):
    """A label cache written by a single_cls run (class<nc assert skipped)
    must not let out-of-range class ids through a later multi-class run
    sharing the same cache (ADVICE r4; reference assert train.py:205-207)."""
    root = tmp_path / "d"
    for sub in ("visible", "infrared", "labels"):
        (root / sub).mkdir(parents=True)
    import cv2
    img = np.zeros((64, 64, 3), np.uint8)
    for i in range(2):
        cv2.imwrite(str(root / "visible" / f"i{i}.jpg"), img)
        cv2.imwrite(str(root / "infrared" / f"i{i}.jpg"), img)
        # class id 7 is out of range for nc=3
        (root / "labels" / f"i{i}.txt").write_text("7 0.5 0.5 0.2 0.2\n")
    cache = tmp_path / "cache"
    # single_cls run parses without the assert and writes the cache
    ds1 = PairedDetectionDataset(str(root / "visible"), str(root / "infrared"),
                                 img_size=64, nc=3, single_cls=True,
                                 cache_dir=str(cache))
    assert all(len(l) and l[:, 0].max() == 0 for l in ds1.labels)
    # multi-class run over the same cache must reject the stale class ids
    with pytest.raises(AssertionError, match="exceeds nc"):
        PairedDetectionDataset(str(root / "visible"), str(root / "infrared"),
                               img_size=64, nc=3, cache_dir=str(cache))
