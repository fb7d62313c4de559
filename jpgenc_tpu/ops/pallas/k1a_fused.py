"""Pallas TPU kernel K1+A: pixels -> per-block packed bitstreams, one pass.

Fuses the whole transform stage (SURVEY.md components #4-#8) AND the entropy
stage (#9-#11, #15 per-block half) into a single kernel: the quantized
zigzag coefficients never touch HBM (a ~12.5 MB/frame round trip at 1080p
4:2:0 plus the slot-metadata XLA pass that the split K1 / kernel-A pipeline
pays). The grid walks MCU rows sequentially, so the DC DPCM predictor
(SURVEY.md component #9) is carried across grid steps in VMEM scratch —
the same sequential-grid carry pattern as kernel B (seg_merge).

Per grid step (one MCU row, all of it in VMEM):

  raw u32 words [1, mh, mx, wpr]  (BlockSpec DMA from the padded image)
    -> shift-extract bytes -> [mx, mh*4*wpr] f32
    -> dense operator matmul (color + subsample + DCT + zigzag folded into
       one [4L, (nb+2)*64] matrix, k1_dct._dense_operator 'row_major')
    -> quantize (round-half-away, divisor kept un-folded for exactness)
    -> DC DPCM chains per component: lane/sublane shifts within the row,
       VMEM carry from the previous row, T.81 F.1.2 resets at segment starts
    -> per block position (static Y/chroma table choice): run-length
       analysis + Huffman LUT + register pack (block_pack._ac_analysis /
       _pack_slots — bit-identical to the standalone kernel A)
    -> [mx, (nb+2)*w_blk] packed words + [mx, nb+2] bit counts

The trailing reshape to slot order ([n_mcu, (nb+2)*w] -> [n_slots, w]) is
free: scan order IS (mcu, block-in-mcu) row-major, so XLA only relabels
dims. Outputs feed kernel B (fused_seg_merge) unchanged.

Numerics match the dense K1 kernel exactly (same operator, same op order);
the entropy half is integer-exact. Covers the color modes whose MCU row
fits the BlockSpec DMA budget (1080p/4K 420/422/444); gray and oversize
fall back to the split pipeline.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpgenc_tpu.layout import FrameLayout
from jpgenc_tpu.ops.transform import round_half_away
from jpgenc_tpu.ops.pallas.block_pack import (_ac_analysis, _dc_piece,
                                              _pack_slots)
from jpgenc_tpu.ops.pallas.k1_dct import _dense_operator

_F32 = jnp.float32
_I32 = jnp.int32


def _k1a_kernel(x_ref, m_ref, bias_ref, q_ref,
                ac_rows_ref, dc_rows_ref, misc_ref,
                buf_ref, bits_ref, carry_ref,
                *, mh: int, nb: int, mx: int, mps: int, w_blk: int):
    i = pl.program_id(0)                             # MCU row index

    # --- K1: bytes -> quantized zigzag (same math as _dense_dma_kernel)
    parts = []
    for r in range(mh):
        xr = x_ref[0, r]                             # [mx, wpr] i32
        for kb in range(4):
            parts.append(((xr >> (8 * kb)) & 255).astype(_F32))
    x = jnp.concatenate(parts, axis=1)               # [mx, mh*4*wpr]
    out = jnp.dot(x, m_ref[:],
                  precision=jax.lax.Precision.HIGHEST) + bias_ref[:]
    v = round_half_away(out / q_ref[:]).astype(_I32)  # [mx, (nb+2)*64]

    # --- DC DPCM chains (T.81 F.1.2): previous same-component DC, with
    # resets at restart-segment starts. Within the row the Y chain runs
    # (mcu, blk) row-major; chroma chains run per MCU. The previous row's
    # final DCs arrive via the sequential-grid VMEM carry.
    #
    # Mosaic layout rule (measured on axon): a [mx, 1] lane-column SLICE of
    # v keeps its source lane offset, and sublane pads/concats then fail
    # with "offset mismatch on non-concat dimension" — so every DC column
    # is extracted with a masked lane-sum instead, which yields a clean
    # offset-0 vector. All chain arithmetic below stays on such columns.
    lane = jax.lax.broadcasted_iota(_I32, (mx, v.shape[1]), 1)

    def _dc_col(blk):
        return jnp.sum(jnp.where(lane == blk * 64, v, 0), axis=1,
                       keepdims=True)                # [mx, 1], offset 0

    y_cols = [_dc_col(b) for b in range(nb)]
    cb_dc = _dc_col(nb)
    cr_dc = _dc_col(nb + 1)

    # shift down one MCU + inject the carried DC at row 0: pads and adds
    # only (row 0 of the shifted column is zero; the carry column is zero
    # everywhere BUT row 0). Garbage carry at the very first row of each
    # image is masked by the reset below (segment 0 starts at MCU 0).
    c_row = carry_ref[:]                             # [1, 128] i32
    lane128 = jax.lax.broadcasted_iota(_I32, (1, 128), 1)

    def _shift_carry(col, cl):
        shifted = jnp.pad(col, ((1, 0), (0, 0)))[0:mx]
        csel = jnp.sum(jnp.where(lane128 == cl, c_row, 0), axis=1,
                       keepdims=True)                # [1, 1], offset 0
        return shifted + jnp.pad(csel, ((0, mx - 1), (0, 0)))

    prev_y0 = _shift_carry(y_cols[nb - 1], 0)
    prev_cb = _shift_carry(cb_dc, 1)
    prev_cr = _shift_carry(cr_dc, 2)

    g = i * mx + jax.lax.broadcasted_iota(_I32, (mx, 1), 0)
    reset = (g % mps) == 0                           # segment-start MCUs
    prev_y0 = jnp.where(reset, 0, prev_y0)
    prev_cb = jnp.where(reset, 0, prev_cb)
    prev_cr = jnp.where(reset, 0, prev_cr)
    dcdiff = [y_cols[b] - (prev_y0 if b == 0 else y_cols[b - 1])
              for b in range(nb)] + [cb_dc - prev_cb, cr_dc - prev_cr]

    # row-(mx-1) extraction via masked sublane sums (single-row slices have
    # a nonzero sublane offset; same layout rule as above)
    is_last = jax.lax.broadcasted_iota(_I32, (mx, 1), 0) == mx - 1
    cvals = jnp.concatenate(
        [jnp.sum(jnp.where(is_last, col, 0), axis=0, keepdims=True)
         for col in (y_cols[nb - 1], cb_dc, cr_dc)], axis=1)   # [1, 3]
    carry_ref[:] = jnp.pad(cvals, ((0, 0), (0, 125)))

    # --- entropy + per-block pack, one 64-lane group per block position.
    # The Huffman table choice is STATIC per position (Y -> 0, chroma -> 1,
    # layout.py ComponentLayout), so each group needs only 2 candidate
    # gathers instead of kernel A's 4 + per-slot selects.
    valid = jnp.ones((mx, 1), jnp.bool_)
    bufs, tots = [], []
    for blk in range(nb + 2):
        tab = 0 if blk < nb else 1
        vb = v[:, blk * 64:(blk + 1) * 64]           # [mx, 64]
        pos, nz, run, s_ac, amp_ac, sym = _ac_analysis(vb)
        idx_lo = jnp.pad(sym & 127, ((0, 0), (0, 64)))    # [mx, 128]
        lo = jnp.take_along_axis(
            jnp.broadcast_to(ac_rows_ref[2 * tab:2 * tab + 1, :], (mx, 128)),
            idx_lo, axis=1)[:, :64]
        hi = jnp.take_along_axis(
            jnp.broadcast_to(ac_rows_ref[2 * tab + 1:2 * tab + 2, :],
                             (mx, 128)), idx_lo, axis=1)[:, :64]
        e_ac = jnp.where(sym >= 128, hi, lo)

        s_dc, amp_dc = _dc_piece(dcdiff[blk])
        e_dc = jnp.take_along_axis(
            jnp.broadcast_to(dc_rows_ref[tab:tab + 1, :], (mx, 128)),
            jnp.broadcast_to(s_dc, (mx, 128)), axis=1)[:, :1]
        zrl = jnp.full((mx, 1), misc_ref[0, tab], _I32)
        eob = jnp.full((mx, 1), misc_ref[0, 2 + tab], _I32)

        buf, total = _pack_slots(pos, nz, run, s_ac, amp_ac, e_ac,
                                 s_dc, amp_dc, e_dc, zrl, eob, valid, w_blk)
        bufs.append(jax.lax.bitcast_convert_type(buf, _I32))
        tots.append(total)

    buf_ref[:] = jax.lax.bitcast_convert_type(
        jnp.concatenate(bufs, axis=1), jnp.uint32)   # [mx, (nb+2)*w_blk]
    bits_ref[:] = jnp.concatenate(tots, axis=1)      # [mx, nb+2]


def k1a_applicable(layout: FrameLayout) -> bool:
    """Static gate: interleaved color with the MCU-row DMA block in budget
    (mirrors k1_dct's dense-DMA gate). Gray and oversize rows use the split
    K1 / kernel-A pipeline."""
    if layout.is_gray:
        return False
    c0 = layout.comps[0]
    return 8 * c0.vs * layout.mcus_x * 128 * 4 <= (4 << 20)


def fused_pixels_to_pack(img: jnp.ndarray, layout: FrameLayout,
                         qtabs: jnp.ndarray, tables: tuple, w_blk: int,
                         interpret: bool = False
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """u8 RGB image -> (buf [S, w_blk] u32, bits [S] i32), S padded to whole
    segments — drop-in for fused_pixels_to_scan + slot_metadata +
    fused_block_pack (bit-identical outputs; tests compare exactly).
    tables: packed_tables(luts)."""
    from jpgenc_tpu import tables as T
    from jpgenc_tpu.ops import color as C

    assert k1a_applicable(layout)
    ac_rows, dc_rows, misc = tables
    c0 = layout.comps[0]
    nb = c0.hs * c0.vs
    mh = 8 * c0.vs
    my, mx = layout.mcus_y, layout.mcus_x
    wpr = (8 * c0.hs) * 3 // 4
    l_out = (nb + 2) * 64
    mps = layout.restart_interval or layout.n_mcus

    zzi = np.asarray(T.ZIGZAG)
    q_y = qtabs[0].reshape(64).astype(_F32)[zzi]
    q_c = qtabs[1].reshape(64).astype(_F32)[zzi]
    q_out = jnp.concatenate([jnp.tile(q_y, nb), q_c, q_c]).reshape(1, -1)
    m_np, bias_np = _dense_operator(c0.hs, c0.vs, "row_major")

    padded = C.pad_replicate(img, c0.plane_h, c0.plane_w)
    words = jax.lax.bitcast_convert_type(
        padded.reshape(c0.plane_h, -1, 4), jnp.uint32)
    x4 = jax.lax.bitcast_convert_type(words, jnp.int32).reshape(
        my, mh, mx, wpr)

    buf, bits = pl.pallas_call(
        functools.partial(_k1a_kernel, mh=mh, nb=nb, mx=mx, mps=mps,
                          w_blk=w_blk),
        grid=(my,),
        in_specs=[
            pl.BlockSpec((1, mh, mx, wpr), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((mx, (nb + 2) * w_blk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mx, nb + 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((my * mx, (nb + 2) * w_blk), jnp.uint32),
            jax.ShapeDtypeStruct((my * mx, nb + 2), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((1, 128), _I32)],
        interpret=interpret,
    )(x4, jnp.asarray(m_np), jnp.asarray(bias_np), q_out,
      ac_rows, dc_rows, misc)

    # [n_mcu, (nb+2)*w] -> [n_slots, w] is a pure relabel (scan order is
    # (mcu, blk) row-major); pad slots beyond n_scan carry zero bits, the
    # same as the split pipeline's valid=0 slots
    buf = buf.reshape(-1, w_blk)
    bits = bits.reshape(-1)
    s_pad = layout.n_segments * layout.blocks_per_segment
    if s_pad > buf.shape[0]:
        buf = jnp.pad(buf, ((0, s_pad - buf.shape[0]), (0, 0)))
        bits = jnp.pad(bits, (0, s_pad - bits.shape[0]))
    return buf, bits
