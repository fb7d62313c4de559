"""Pallas segment-merge kernel (kernel B) vs the jnp reference.

The kernel leaves words past each segment's content uninitialized (nothing
reads them), so comparisons mask to the used word range.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from jpgenc_tpu.engine import (get_plan, luts_from_tables, qtables_for_quality)
from jpgenc_tpu.layout import make_layout
from jpgenc_tpu.ops.entropy import make_pieces
from jpgenc_tpu.ops.pack import block_pack, segments_from_blocks
from jpgenc_tpu.ops.pallas.seg_merge import fused_seg_merge
from jpgenc_tpu.ref.encoder import standard_tables


def _blocks_case(img, mode, rst, quality, w_blk=24):
    layout = make_layout(img.shape[0], img.shape[1], mode, rst)
    plan = get_plan(layout)
    _, qt = qtables_for_quality(quality)
    dc_t, ac_t = standard_tables()
    luts = luts_from_tables(dc_t, ac_t)
    zz = plan.blocks(img, qt)[plan.scan_flat]
    pv, pl_ = make_pieces(zz, plan.plan, luts)
    buf, bits = block_pack(pv, pl_, w_blk)
    return layout, buf, bits


@pytest.mark.parametrize("mode,rst", [("gray", 0), ("gray", 3), ("420", 2),
                                      ("444", 0)])
def test_seg_merge_matches_reference(mode, rst, gray_image, rgb_image):
    img = gray_image if mode == "gray" else rgb_image
    layout, buf, bits = _blocks_case(img, mode, rst, 75)
    n_seg = layout.n_segments
    w_blk = 24
    spb = buf.shape[0] // n_seg
    ref_w, ref_b = segments_from_blocks(buf, bits, n_seg, spb * w_blk + 2)
    out_w, out_b = fused_seg_merge(buf, bits, n_seg, w_blk, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_b), np.asarray(ref_b))
    used = (np.asarray(ref_b) + 31) // 32 + 1
    ref_w, out_w = np.asarray(ref_w), np.asarray(out_w)
    for s in range(n_seg):
        np.testing.assert_array_equal(out_w[s, :used[s]], ref_w[s, :used[s]],
                                      err_msg=f"segment {s}")
