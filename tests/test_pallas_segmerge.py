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


@pytest.mark.parametrize("mode,rst", [("gray", 0), ("420", 2)])
def test_seg_merge_capped_output(mode, rst, gray_image, rgb_image):
    """cap_words bounds the output allocation at the caller's capacity
    tier (the worst-case buffer was ~8x the tight cap and its forced
    materialization cost ~29% of the encode dispatch — r5 ledger): when
    the content fits the cap, every used word must equal the uncapped
    kernel's, with a strictly smaller buffer."""
    img = gray_image if mode == "gray" else rgb_image
    layout, buf, bits = _blocks_case(img, mode, rst, 75)
    n_seg = layout.n_segments
    full_w, full_b = fused_seg_merge(buf, bits, n_seg, 24, interpret=True)
    used = (np.asarray(full_b) + 31) // 32 + 1
    # generous cap: >= any segment's content but << the worst case
    cap = int(used.max()) + 512
    cap_w, cap_b = fused_seg_merge(buf, bits, n_seg, 24, interpret=True,
                                   cap_words=cap)
    assert cap_w.shape[1] <= full_w.shape[1]
    if cap + 1024 < full_w.shape[1]:      # big worst case: must shrink
        assert cap_w.shape[1] < full_w.shape[1]
    np.testing.assert_array_equal(np.asarray(cap_b), np.asarray(full_b))
    fw, cw = np.asarray(full_w), np.asarray(cap_w)
    for s in range(n_seg):
        np.testing.assert_array_equal(cw[s, :used[s]], fw[s, :used[s]],
                                      err_msg=f"segment {s}")
