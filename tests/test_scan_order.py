"""pixels_to_scan (static-reshape scan ordering) == pixels_to_blocks + gather."""
import numpy as np
import pytest

from jpgenc_tpu.engine import (blocks_to_scan, get_plan, pixels_to_blocks,
                               pixels_to_scan, qtables_for_quality)
from jpgenc_tpu.layout import make_layout


@pytest.mark.parametrize("mode", ["gray", "420", "422", "444"])
@pytest.mark.parametrize("rst", [0, 3])
def test_pixels_to_scan_matches_gather(mode, rst, gray_image, rgb_image):
    img = gray_image if mode == "gray" else rgb_image
    layout = make_layout(img.shape[0], img.shape[1], mode, rst)
    plan = get_plan(layout)
    _, qt = qtables_for_quality(75)
    import jax
    ref = jax.jit(lambda i, q, sf: blocks_to_scan(
        pixels_to_blocks(i, layout, q), sf))(img, qt, plan.scan_flat)
    new = jax.jit(lambda i, q: pixels_to_scan(i, layout, q))(img, qt)
    ref = np.asarray(ref)
    new = np.asarray(new)
    # padding slots may differ (gather repeats block 0; reshape pads zeros);
    # only valid slots carry data
    n = layout.n_scan
    np.testing.assert_array_equal(new[:n], ref[:n])
