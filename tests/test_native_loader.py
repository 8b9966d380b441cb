"""Native C++ loader parity: decode+letterbox must match the cv2 path closely
(bilinear half-pixel resize, identical pad geometry)."""

import numpy as np
import pytest

from icafusion_tpu.data import native
from icafusion_tpu.data.augment import letterbox


@pytest.fixture(scope="module")
def jpeg_pair(tmp_path_factory):
    import cv2
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    # smooth image so JPEG loss does not dominate the comparison
    base = rng.integers(0, 255, (30, 40, 3)).astype(np.uint8)
    img = cv2.resize(base, (640, 480), interpolation=cv2.INTER_CUBIC)
    p1 = str(d / "a.jpg")
    p2 = str(d / "b.jpg")
    cv2.imwrite(p1, img, [cv2.IMWRITE_JPEG_QUALITY, 98])
    cv2.imwrite(p2, img[:, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 98])
    return p1, p2


def test_native_matches_cv2(jpeg_pair):
    import cv2
    if not native.available():
        pytest.skip("native library not built")
    p1, p2 = jpeg_pair
    rgb, ir, ratios, pads, hw = native.decode_letterbox_batch([p1], [p2], 320,
                                                              scaleup=False)
    assert rgb.shape == (1, 320, 320, 3)
    assert tuple(hw[0]) == (480, 640)
    np.testing.assert_allclose(ratios[0], [0.5, 0.5])
    np.testing.assert_allclose(pads[0], [0.0, 40.0])

    ref_img = cv2.cvtColor(cv2.imread(p1), cv2.COLOR_BGR2RGB)
    ref_lb, r, (dw, dh) = letterbox(ref_img, 320, scaleup=False)
    # identical geometry: gray rows at top/bottom
    assert (rgb[0][:40] == 114).all() and (rgb[0][-40:] == 114).all()
    # pixel agreement (libjpeg vs cv2 decode + bilinear rounding): mean |diff| small
    diff = np.abs(rgb[0].astype(int) - ref_lb.astype(int))
    assert diff.mean() < 3.0, f"mean abs diff {diff.mean()}"
    assert (diff <= 25).mean() > 0.99


def test_native_rect_canvas(jpeg_pair):
    """(H, W) canvas: the minimal-rectangle serving geometry. 480x640 source
    onto a 256x320 canvas: r = min(256/480, 320/640) = 0.5, so the scaled
    240x320 image pads only 8 gray rows top and bottom — vs 40 rows on the
    320 square (test above). Must match the cv2 letterbox exactly."""
    import cv2
    if not native.available():
        pytest.skip("native library not built")
    p1, p2 = jpeg_pair
    rgb, ir, ratios, pads, hw = native.decode_letterbox_batch(
        [p1], [p2], (256, 320), scaleup=False)
    assert rgb.shape == (1, 256, 320, 3) and tuple(hw[0]) == (480, 640)
    np.testing.assert_allclose(ratios[0], [0.5, 0.5])
    np.testing.assert_allclose(pads[0], [0.0, 8.0])
    assert (rgb[0][:8] == 114).all() and (rgb[0][-8:] == 114).all()
    assert not (rgb[0][128] == 114).all()  # image content mid-canvas

    ref_img = cv2.cvtColor(cv2.imread(p1), cv2.COLOR_BGR2RGB)
    ref_lb, _, _ = letterbox(ref_img, (256, 320), scaleup=False)
    diff = np.abs(rgb[0].astype(int) - ref_lb.astype(int))
    assert diff.mean() < 3.0, f"mean abs diff {diff.mean()}"


def test_native_missing_file_error(jpeg_pair):
    if not native.available():
        pytest.skip("native library not built")
    p1, _ = jpeg_pair
    with pytest.raises(RuntimeError, match="failed"):
        native.decode_letterbox_batch([p1], ["/nonexistent.jpg"], 320)
