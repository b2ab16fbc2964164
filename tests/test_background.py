"""Background-conversion heuristics."""
import numpy as np

from nerf_tpu.eval.background import (
    conservative_background_conversion, convert_background,
    smart_background_conversion,
)


def _scene():
    """Black background, bright object in the center with a dark hole."""
    img = np.zeros((64, 64, 3), np.float32)
    img[20:44, 20:44] = 0.8          # object
    img[30:34, 30:34] = 0.02         # dark interior detail (NOT background)
    return img


def test_conservative_converts_border_connected_only():
    out = conservative_background_conversion(_scene())
    assert (out[0, 0] == 1.0).all()          # border background -> white
    assert (out[25, 25] == 0.8).all()        # object untouched
    assert (out[31, 31] < 0.1).all()         # interior dark hole preserved


def test_smart_preserves_textured_dark():
    img = _scene()
    # textured dark region connected to the border: high variance -> kept
    rng = np.random.RandomState(0)
    img[50:60, 2:12] = rng.rand(10, 10, 3) * 0.12
    out = smart_background_conversion(img)
    assert (out[0, 0] == 1.0).all()
    assert out[52:58, 4:10].std() > 0.01     # texture not flattened to white


def test_none_strategy_identity():
    img = _scene()
    out = convert_background(img, "none")
    np.testing.assert_array_equal(out, img)
