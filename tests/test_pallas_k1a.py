"""Fused K1+A kernel (pixels -> per-block packed bitstreams) equality.

The fused kernel must be bit-identical to the split pipeline it replaces
(fused_pixels_to_scan -> slot_metadata -> fused_block_pack) in interpret
mode, across subsampling modes, restart intervals (incl. short last
segments / padded slots), and capacity tiers. The on-hardware half of this
lane lives in test_hw_tpu.py.
"""
import numpy as np
import pytest


# widths keep mcus_x divisible by 8 (the Mosaic sublane-tile rule the
# applicability gate enforces for real-hardware lowering)
CASES = [
    (128, 256, "420", 0),
    (120, 120, "420", 3),      # short last segment -> padded slots; pad cols
    (64, 126, "422", 2),       # replicate-pad to the MCU grid
    (48, 62, "444", 0),
    (112, 128, "420", 1),      # every MCU its own segment
    (64, 128, "gray", 0),      # gray: one block per MCU, luma tables only
    (100, 64, "gray", 3),      # gray + DRI: short last segment, row-crossing
                               # DC carry inside a segment (8 MCUs/row, DRI=3)
    (64, 136, "420", 0),       # mcus_x = 9: unaligned width (3-D outputs)
    (64, 72, "gray", 0),       # gray mcus_x = 9
]


@pytest.mark.parametrize("h,w,sub,dri", CASES)
@pytest.mark.parametrize("w_blk", [8, 16, 24])
def test_fused_k1a_matches_split_pipeline(h, w, sub, dri, w_blk, rng):
    from jpgenc_tpu.engine import (get_plan, luts_from_tables,
                                   qtables_for_quality)
    from jpgenc_tpu.layout import make_layout
    from jpgenc_tpu.ops.pallas.block_pack import (fused_block_pack,
                                                  packed_tables,
                                                  slot_metadata)
    from jpgenc_tpu.ops.pallas.k1_dct import fused_pixels_to_scan
    from jpgenc_tpu.ops.pallas.k1a_fused import (fused_pixels_to_pack,
                                                 k1a_applicable)
    from jpgenc_tpu.ref.encoder import standard_tables
    from jpgenc_tpu.utils.fixtures import synth_frame

    lay = make_layout(h, w, sub, dri)
    assert k1a_applicable(lay)
    plan = get_plan(lay).plan
    _, qt = qtables_for_quality(75)
    luts = luts_from_tables(*standard_tables())
    tabs = packed_tables(luts)
    img = synth_frame(h, w, channels=0 if sub == "gray" else 3)

    zz = fused_pixels_to_scan(img, lay, qt, interpret=True)
    meta = slot_metadata(plan, zz)
    ref_buf, ref_bits = fused_block_pack(zz, *meta, tables=tabs,
                                         w_blk=w_blk, interpret=True)
    buf, bits = fused_pixels_to_pack(img, lay, qt, tabs, w_blk,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(ref_bits))
    np.testing.assert_array_equal(np.asarray(buf), np.asarray(ref_buf))


def test_fused_k1a_partial_chunk_flush(rng):
    """w_blk not divisible by 8 exercises the partial FINAL chunk store in
    the paired merge (_pair_entropy flushes <=8-word chunks; a non-multiple
    tier must flush a short tail chunk, not widen to all-live columns)."""
    test_fused_k1a_matches_split_pipeline(128, 256, "420", 0, 12, rng)
    test_fused_k1a_matches_split_pipeline(120, 120, "420", 3, 20, rng)


def test_k1a_gate():
    from jpgenc_tpu.layout import make_layout
    from jpgenc_tpu.ops.pallas.k1a_fused import k1a_applicable

    assert k1a_applicable(make_layout(64, 64, "gray", 0))
    assert k1a_applicable(make_layout(512, 512, "gray", 0))
    assert k1a_applicable(make_layout(2160, 3840, "420", 0))
    # any width: 3-D [my, mx, ...] outputs keep block dims equal to the
    # array dims, so the old mcus_x % 8 rule is gone
    assert k1a_applicable(make_layout(360, 480, "420", 0))
    assert k1a_applicable(make_layout(64, 120, "gray", 0))
    assert k1a_applicable(make_layout(3024, 4032, "420", 0))
    # oversize MCU rows (DMA block > 4 MB) must fall back
    assert not k1a_applicable(make_layout(64, 70000, "420", 0))


def test_k1a_gate_scoped_vmem_model():
    """The paired merge now flushes word columns in 8-word chunk stores
    (_pair_entropy), so the live set no longer scales with w_blk: the old
    w_blk=24-at-4K rejection (29 MB column list) is obsolete and those
    combinations are accepted. Tiers past the hardware-validated 32 and
    oversize rows still fall back."""
    from jpgenc_tpu.layout import make_layout
    from jpgenc_tpu.ops.pallas.k1a_fused import k1a_applicable
    assert k1a_applicable(make_layout(1080, 1920, "420", 0), 8)
    assert k1a_applicable(make_layout(1080, 1920, "420", 0), 16)
    assert k1a_applicable(make_layout(1080, 1920, "420", 0), 24)
    assert k1a_applicable(make_layout(1080, 1920, "420", 0), 32)
    assert k1a_applicable(make_layout(2160, 3840, "420", 0), 16)
    assert k1a_applicable(make_layout(2160, 3840, "420", 0), 24)
    assert not k1a_applicable(make_layout(1080, 1920, "420", 0), 56)
