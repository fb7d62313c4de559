"""Pallas fused block-pack kernel vs the jnp reference (interpret mode on
CPU; the same comparison runs compiled on real TPU via bench/verify)."""
import jax.numpy as jnp
import numpy as np
import pytest

from jpgenc_tpu.engine import (get_plan, luts_from_tables, qtables_for_quality)
from jpgenc_tpu.layout import make_layout
from jpgenc_tpu.ops.entropy import make_pieces
from jpgenc_tpu.ops.pack import block_pack, w_blk_for_quality
from jpgenc_tpu.ops.pallas.block_pack import (fused_block_pack, packed_tables,
                                              slot_metadata)
from jpgenc_tpu.ref.encoder import standard_tables


def _case(img, mode, rst, quality):
    layout = make_layout(img.shape[0], img.shape[1], mode, rst)
    plan = get_plan(layout)
    _, qt = qtables_for_quality(quality)
    dc_t, ac_t = standard_tables()
    luts = luts_from_tables(dc_t, ac_t)
    blocks = plan.blocks(img, qt)
    zz = blocks[plan.scan_flat]
    splan = plan.plan
    w_blk = w_blk_for_quality(quality)

    pv, pl_ = make_pieces(zz, splan, luts)
    ref_buf, ref_bits = block_pack(pv, pl_, w_blk)

    meta = slot_metadata(splan, zz)
    buf, bits = fused_block_pack(zz, *meta, tables=packed_tables(luts),
                                 w_blk=w_blk, interpret=True)
    return np.asarray(ref_buf), np.asarray(ref_bits), \
        np.asarray(buf), np.asarray(bits)


@pytest.mark.parametrize("mode,rst,q", [
    ("gray", 0, 75),
    ("gray", 3, 75),
    ("420", 0, 75),
    ("422", 2, 50),
    ("444", 0, 90),
])
def test_fused_block_pack_matches_reference(mode, rst, q, gray_image,
                                            rgb_image):
    img = gray_image if mode == "gray" else rgb_image
    ref_buf, ref_bits, buf, bits = _case(img, mode, rst, q)
    np.testing.assert_array_equal(bits, ref_bits)
    np.testing.assert_array_equal(buf, ref_buf)


def test_fused_block_pack_extreme_values(rng):
    """Saturated + noise image: large amplitudes, ZRL runs, EOB-less blocks."""
    img = (rng.integers(0, 2, (64, 64), dtype=np.uint8) * 255).astype(np.uint8)
    ref_buf, ref_bits, buf, bits = _case(img, "gray", 2, 95)
    np.testing.assert_array_equal(bits, ref_bits)
    np.testing.assert_array_equal(buf, ref_buf)
