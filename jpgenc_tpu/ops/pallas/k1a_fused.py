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
fits the BlockSpec DMA budget (1080p/4K 420/422/444) plus grayscale
(`_k1a_gray_kernel`: one 8x8 block per MCU, same (x-128) @ KDCT_ZZ
formulation as k1_dct._gray_kernel so the split/fused paths stay
bit-identical); oversize rows fall back to the split pipeline.
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

    # --- entropy + per-block pack. The Huffman table choice is STATIC per
    # block position (Y -> 0, chroma -> 1, layout.py ComponentLayout).
    # When the group count is even (420: 6, 422: 4) blocks are processed
    # TWO PER 128-LANE ROW with half-segmented shifts/prefixes — the
    # per-block [mx, 64] form leaves half of every vector register empty,
    # so pairing nearly halves the entropy instruction count. 444 (3
    # groups) falls back to the per-block loop.
    valid = jnp.ones((mx, 1), jnp.bool_)
    bufs, tots = [], []
    if (nb + 2) % 2 == 0:
        for p in range((nb + 2) // 2):
            bL, bR = 2 * p, 2 * p + 1
            v2 = v[:, bL * 64:(bR + 1) * 64]         # [mx, 128], offset 0
            # direct stores into the output block: the merge then holds
            # O(1) live vectors instead of O(w_blk) on the scoped-VMEM
            # stack, which is what capped the fused path at w_blk=24
            tots.extend(_pair_entropy(
                v2, dcdiff[bL], dcdiff[bR],
                0 if bL < nb else 1, 0 if bR < nb else 1,
                ac_rows_ref, dc_rows_ref, misc_ref, mx, w_blk,
                out_ref=buf_ref, base_l=bL * w_blk, base_r=bR * w_blk))
    else:
        for blk in range(nb + 2):
            tab = 0 if blk < nb else 1
            vb = v[:, blk * 64:(blk + 1) * 64]       # [mx, 64]
            pos, nz, run, s_ac, amp_ac, sym = _ac_analysis(vb)
            idx_lo = jnp.pad(sym & 127, ((0, 0), (0, 64)))    # [mx, 128]
            lo = jnp.take_along_axis(
                jnp.broadcast_to(ac_rows_ref[2 * tab:2 * tab + 1, :],
                                 (mx, 128)), idx_lo, axis=1)[:, :64]
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
                                     s_dc, amp_dc, e_dc, zrl, eob, valid,
                                     w_blk)
            bufs.append(jax.lax.bitcast_convert_type(buf, _I32))
            tots.append(total)

    if bufs:                                         # odd-group (444) path
        buf_ref[0] = jax.lax.bitcast_convert_type(
            jnp.concatenate(bufs, axis=1), jnp.uint32)
    bits_ref[0] = jnp.concatenate(tots, axis=1)      # [mx, nb+2]


def _pair_entropy(v2, dcd_l, dcd_r, tab_l, tab_r,
                  ac_rows_ref, dc_rows_ref, misc_ref, mx: int, w_blk: int,
                  out_ref=None, base_l: int = 0, base_r: int = 0):
    """Entropy + per-block pack for TWO zigzag blocks sharing one 128-lane
    row (left half lanes 0-63, right half 64-127).

    Same math as block_pack._ac_analysis + _pack_slots but with shifts and
    prefixes SEGMENTED at the half boundary (shift-ins masked to zero, the
    identity for both the max-prefix and the sum-prefix), so nothing leaks
    between the two blocks. The Huffman gathers run at the full 128-lane
    width Mosaic requires — no pad-and-slice, and both halves gather in one
    instruction.

    With out_ref (the caller's [mx, (nb+2)*w_blk] u32 output block), each
    merged word column is STORED immediately at lane base_l/base_r + w
    instead of accumulating a live column list — the unrolled merge then
    holds O(1) live vectors per step instead of O(w_blk), which is what
    capped the fused path at w_blk=24 on Mosaic's ~16 MB scoped-VMEM stack.
    Returns [tot_l, tot_r] ([mx, 1] bit totals); without out_ref, returns
    ([2*w_blk] list of [mx, 1] word columns, [tot_l, tot_r])."""
    from jpgenc_tpu.ops.pack import _shift_into_word
    from jpgenc_tpu.ops.pallas.block_pack import _lane_shift_right, _shl, _ssss

    t = mx
    _U32 = jnp.uint32
    lane = jax.lax.broadcasted_iota(_I32, (t, 128), 1)
    pos = lane & 63                                  # position within block
    left = lane < 64

    def seg_shift(x, sh):
        return jnp.where(pos >= sh, _lane_shift_right(x, sh), 0)

    # --- AC run lengths, segmented (T.81 F.1.2.2)
    nz = (v2 != 0) & (pos > 0)
    marker = jnp.where(nz, pos, 0)
    incl = marker
    for sh in (1, 2, 4, 8, 16, 32):
        incl = jnp.maximum(incl, seg_shift(incl, sh))
    prev_nz = seg_shift(incl, 1)
    run = pos - prev_nz - 1
    s_ac = _ssss(v2)
    amp_ac = jnp.where(v2 >= 0, v2, v2 + (_I32(1) << s_ac) - 1) & \
        ((_I32(1) << s_ac) - 1)
    sym = ((run & 15) << 4) | s_ac

    # --- Huffman AC lookup: full-width gathers, one per candidate row
    idx = sym & 127                                  # [t, 128]

    def ac_gather(row):
        return jnp.take_along_axis(
            jnp.broadcast_to(ac_rows_ref[row:row + 1, :], (t, 128)),
            idx, axis=1)

    if tab_l == tab_r:
        lo = ac_gather(2 * tab_l)
        hi = ac_gather(2 * tab_l + 1)
    else:
        lo = jnp.where(left, ac_gather(2 * tab_l), ac_gather(2 * tab_r))
        hi = jnp.where(left, ac_gather(2 * tab_l + 1),
                       ac_gather(2 * tab_r + 1))
    e_ac = jnp.where(sym >= 128, hi, lo)

    # --- DC pieces, one per half
    dcv = []
    for dcd, tab in ((dcd_l, tab_l), (dcd_r, tab_r)):
        s_dc, amp_dc = _dc_piece(dcd)                # [t, 1]
        e_dc = jnp.take_along_axis(
            jnp.broadcast_to(dc_rows_ref[tab:tab + 1, :], (t, 128)),
            jnp.broadcast_to(s_dc, (t, 128)), axis=1)[:, :1]
        code_dc = (e_dc >> 5).astype(_U32)
        dc_val = _shl(code_dc, s_dc) | amp_dc.astype(_U32)
        dc_len = (e_dc & 31) + s_dc
        dcv.append((dc_val, dc_len))
    dc_val = jnp.where(left, jnp.broadcast_to(dcv[0][0], (t, 128)),
                       jnp.broadcast_to(dcv[1][0], (t, 128)))
    dc_len = jnp.where(left, jnp.broadcast_to(dcv[0][1], (t, 128)),
                       jnp.broadcast_to(dcv[1][1], (t, 128)))

    # --- ZRL / EOB entries per half (scalars from SMEM)
    def half_entry(col_l, col_r):
        if col_l == col_r:
            return jnp.full((t, 128), misc_ref[0, col_l], _I32)
        return jnp.where(left, jnp.full((t, 128), misc_ref[0, col_l], _I32),
                         jnp.full((t, 128), misc_ref[0, col_r], _I32))

    zrl_e = half_entry(tab_l, tab_r)
    eob_e = half_entry(2 + tab_l, 2 + tab_r)

    # --- main piece per lane: AC value symbol; EOB at 63; DC at 0
    code_ac = (e_ac >> 5).astype(_U32)
    clen_ac = e_ac & 31
    main_val = _shl(code_ac, s_ac) | amp_ac.astype(_U32)
    main_len = jnp.where(nz, clen_ac + s_ac, 0)

    at63 = pos == 63
    eob_here = at63 & ~nz                            # this half's last AC == 0
    main_val = jnp.where(eob_here, (eob_e >> 5).astype(_U32), main_val)
    main_len = jnp.where(eob_here, eob_e & 31, main_len)

    at0 = pos == 0
    main_val = jnp.where(at0, dc_val, main_val)
    main_len = jnp.where(at0, dc_len, main_len)

    # --- registers: up to 3 ZRL pieces then the main piece (96-bit)
    n_zrl = jnp.where(nz, run >> 4, 0)
    zval = (zrl_e >> 5).astype(_U32)
    zlen = zrl_e & 31
    reg = [jnp.zeros((t, 128), _U32) for _ in range(3)]
    p_off = jnp.zeros((t, 128), _I32)
    for p in range(4):
        if p < 3:
            on = n_zrl > p
            pv = jnp.where(on, zval, _U32(0))
            plen = jnp.where(on, zlen, 0)
        else:
            pv = main_val
            plen = main_len
        a = 96 - p_off - plen
        for w in range(3):
            reg[w] = reg[w] | _shift_into_word(pv, a - 64 + 32 * w)
        p_off = p_off + plen
    slen = p_off

    # --- segmented exclusive prefix of bit offsets
    csum = slen
    for sh in (1, 2, 4, 8, 16, 32):
        csum = csum + seg_shift(csum, sh)
    off = csum - slen
    tot_l = jnp.sum(jnp.where(at63 & left, csum, 0), axis=1, keepdims=True)
    tot_r = jnp.sum(jnp.where(at63 & ~left, csum, 0), axis=1, keepdims=True)

    d = off >> 5
    r = off & 31

    w4 = []
    for j in range(4):
        lo_w = reg[j] if j <= 2 else jnp.zeros((t, 128), _U32)
        hi_w = reg[j - 1] if 1 <= j <= 3 else jnp.zeros((t, 128), _U32)
        w4.append(_shift_into_word(lo_w, -r) | _shift_into_word(hi_w, 32 - r))

    # --- merge: per-word masked accumulation, then per-half lane sums.
    # Every [mx, 1] column buffer lane-pads to a full 128-lane VMEM tile
    # (~mx*512 B), so a column LIST over all blocks is what blew Mosaic's
    # ~16 MB scoped stack at w_blk > 24 (the measured 5.04 KB/unit model).
    # With out_ref, columns are flushed in 8-word chunk stores, bounding
    # the live set to ~8 columns regardless of w_blk.
    if out_ref is not None:
        # flush in <=8-word chunk stores (a partial final chunk for tiers
        # not divisible by 8) so the live column set stays bounded at ~8
        # regardless of w_blk — reverting to all-live columns is exactly
        # the scoped-VMEM blowup this path exists to avoid
        cl, cr = [], []
        for w in range(w_blk):
            acc = jnp.zeros((t, 128), _I32)
            for j in range(4):
                acc = acc | jnp.where(
                    d == w - j,
                    jax.lax.bitcast_convert_type(w4[j], _I32), 0)
            cl.append(jnp.sum(jnp.where(left, acc, 0), axis=1,
                              keepdims=True))
            cr.append(jnp.sum(jnp.where(left, 0, acc), axis=1,
                              keepdims=True))
            if len(cl) == 8 or w == w_blk - 1:
                ch = len(cl)
                w0 = w + 1 - ch
                out_ref[0, :, base_l + w0:base_l + w0 + ch] = \
                    jax.lax.bitcast_convert_type(
                        jnp.concatenate(cl, axis=1), jnp.uint32)
                out_ref[0, :, base_r + w0:base_r + w0 + ch] = \
                    jax.lax.bitcast_convert_type(
                        jnp.concatenate(cr, axis=1), jnp.uint32)
                cl, cr = [], []
        return [tot_l, tot_r]
    cols_l, cols_r = [], []
    for w in range(w_blk):
        acc = jnp.zeros((t, 128), _I32)
        for j in range(4):
            acc = acc | jnp.where(d == w - j,
                                  jax.lax.bitcast_convert_type(w4[j], _I32), 0)
        cols_l.append(jnp.sum(jnp.where(left, acc, 0), axis=1, keepdims=True))
        cols_r.append(jnp.sum(jnp.where(left, 0, acc), axis=1, keepdims=True))
    return cols_l + cols_r, [tot_l, tot_r]


def _k1a_gray_kernel(x_ref, k_ref, q_ref,
                     ac_rows_ref, dc_rows_ref, misc_ref,
                     buf_ref, bits_ref, carry_ref,
                     *, mx: int, mps: int, w_blk: int):
    """Gray variant: one 8x8 block per MCU, luma tables only. One grid step
    processes one MCU row ([mx, 64] u8 blocks); the DC predictor crosses
    rows via the same sequential-grid VMEM carry as the color kernel. The
    transform half is k1_dct._gray_kernel's exact formulation ((x - 128) @
    KDCT_ZZ, quantize), so the fused and split Pallas paths stay
    bit-identical (the capacity-tier retry may switch paths mid-encode)."""
    i = pl.program_id(0)

    x = x_ref[0].astype(_I32).astype(_F32) - _F32(128.0)   # [mx, 64]
    out = jnp.dot(x, k_ref[:], precision=jax.lax.Precision.HIGHEST)
    v = round_half_away(out / q_ref[:]).astype(_I32)

    # --- DC DPCM: predecessor is the previous MCU in raster order (same
    # masked-sum column extraction as the color kernel — see layout note
    # there), reset at restart-segment starts, row-crossing via the carry.
    lane = jax.lax.broadcasted_iota(_I32, (mx, 64), 1)
    dc_col = jnp.sum(jnp.where(lane == 0, v, 0), axis=1, keepdims=True)

    c_row = carry_ref[:]                                   # [1, 128]
    lane128 = jax.lax.broadcasted_iota(_I32, (1, 128), 1)
    shifted = jnp.pad(dc_col, ((1, 0), (0, 0)))[0:mx]
    csel = jnp.sum(jnp.where(lane128 == 0, c_row, 0), axis=1, keepdims=True)
    prev = shifted + jnp.pad(csel, ((0, mx - 1), (0, 0)))
    g = i * mx + jax.lax.broadcasted_iota(_I32, (mx, 1), 0)
    prev = jnp.where((g % mps) == 0, 0, prev)
    dcdiff = dc_col - prev

    is_last = jax.lax.broadcasted_iota(_I32, (mx, 1), 0) == mx - 1
    cval = jnp.sum(jnp.where(is_last, dc_col, 0), axis=0, keepdims=True)
    carry_ref[:] = jnp.pad(cval, ((0, 0), (0, 127)))

    # --- entropy + per-block pack, table 0 (gray uses the luma tables)
    pos, nz, run, s_ac, amp_ac, sym = _ac_analysis(v)
    idx_lo = jnp.pad(sym & 127, ((0, 0), (0, 64)))         # [mx, 128]
    lo = jnp.take_along_axis(
        jnp.broadcast_to(ac_rows_ref[0:1, :], (mx, 128)), idx_lo,
        axis=1)[:, :64]
    hi = jnp.take_along_axis(
        jnp.broadcast_to(ac_rows_ref[1:2, :], (mx, 128)), idx_lo,
        axis=1)[:, :64]
    e_ac = jnp.where(sym >= 128, hi, lo)

    s_dc, amp_dc = _dc_piece(dcdiff)
    e_dc = jnp.take_along_axis(
        jnp.broadcast_to(dc_rows_ref[0:1, :], (mx, 128)),
        jnp.broadcast_to(s_dc, (mx, 128)), axis=1)[:, :1]
    zrl = jnp.full((mx, 1), misc_ref[0, 0], _I32)
    eob = jnp.full((mx, 1), misc_ref[0, 2], _I32)
    valid = jnp.ones((mx, 1), jnp.bool_)

    buf, total = _pack_slots(pos, nz, run, s_ac, amp_ac, e_ac,
                             s_dc, amp_dc, e_dc, zrl, eob, valid, w_blk)
    buf_ref[0] = buf
    bits_ref[0] = total


def _fused_gray(img: jnp.ndarray, layout: FrameLayout, qtabs: jnp.ndarray,
                tables: tuple, w_blk: int, interpret: bool
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    from jpgenc_tpu import tables as T
    from jpgenc_tpu.ops import color as C
    from jpgenc_tpu.ops.transform import _KDCT_ZZ

    ac_rows, dc_rows, misc = tables
    c0 = layout.comps[0]
    my, mx = layout.mcus_y, layout.mcus_x
    mps = layout.restart_interval or layout.n_mcus
    zzi = np.asarray(T.ZIGZAG)
    q = qtabs[0].reshape(64).astype(_F32)[zzi].reshape(1, 64)
    k = jnp.asarray(_KDCT_ZZ)

    padded = C.pad_replicate(img, c0.plane_h, c0.plane_w)
    blocks = (padded.reshape(my, 8, mx, 8).transpose(0, 2, 1, 3)
              .reshape(my, mx, 64))

    buf, bits = pl.pallas_call(
        functools.partial(_k1a_gray_kernel, mx=mx, mps=mps, w_blk=w_blk),
        grid=(my,),
        in_specs=[
            pl.BlockSpec((1, mx, 64), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, mx, w_blk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mx, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((my, mx, w_blk), jnp.uint32),
            jax.ShapeDtypeStruct((my, mx, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((1, 128), _I32)],
        interpret=interpret,
    )(blocks, k, q, ac_rows, dc_rows, misc)
    return buf.reshape(my * mx, w_blk), bits.reshape(my * mx, 1)


def k1a_applicable(layout: FrameLayout, w_blk: int = 8) -> bool:
    """Static gate: MCU-row DMA block in budget (mirrors k1_dct's dense-DMA
    gate) and a supported w_blk tier. Oversize rows and the 56-word worst
    tier use the split K1 / kernel-A pipeline. Gray runs `_k1a_gray_kernel`
    (one 8x8 block per MCU).

    The paired merge flushes word columns in 8-word chunk stores (see
    `_pair_entropy`), so its scoped-VMEM live set no longer scales with
    w_blk — the old ~5.04 KB per w_blk*mcus_x model (29 MB at w_blk=24 x
    4K) is obsolete, and w_blk=32 is compile-validated on hardware at
    1080p. The cap stays at 32 because wider tiers measured strictly
    slower anyway (merge instruction count scales with w_blk); the gray /
    444 paths still build _pack_slots column lists (one block at a time,
    w_blk lane-padded [mx, 1] columns ~= w_blk*mx*512 B live), which the
    estimate below includes.

    No mcus_x % 8 rule anymore: outputs are 3-D [my, mx, ...] arrays whose
    blocks' last-two dims EQUAL the array dims, satisfying Mosaic's tiling
    rule at any width (the old rule came from (mx, ...) blocks sub-tiling
    the flattened (my*mx, ...) dim; found via an odd-width 480px encode,
    removed after the same fix was hardware-verified on the recon kernel
    at mcus_x=252)."""
    if w_blk > 32:
        return False
    if layout.is_gray:
        # _pack_slots column list + the lane-padded [mx, w_blk->128] u32
        # output block dominate
        est = layout.mcus_x * (w_blk * 512 + 128 * 4 + 64 * 8)
        return est <= (8 << 20)
    c0 = layout.comps[0]
    nb = c0.hs * c0.vs
    # live set per grid step: v/xf [mx, (nb+2)*64] i32+f32, ~24 [mx, 128]
    # temp vectors, the output block, and (444 only) one block's
    # _pack_slots columns
    cols = 0 if (nb + 2) % 2 == 0 else w_blk * 512
    est = layout.mcus_x * ((nb + 2) * 64 * 8 + 24 * 128 * 4
                           + (nb + 2) * w_blk * 4 + cols)
    if est > (10 << 20):
        return False
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

    assert k1a_applicable(layout, w_blk)
    if layout.is_gray:
        buf, bits = _fused_gray(img, layout, qtabs, tables, w_blk, interpret)
        buf = buf.reshape(-1, w_blk)
        bits = bits.reshape(-1)
        s_pad = layout.n_segments * layout.blocks_per_segment
        if s_pad > buf.shape[0]:
            buf = jnp.pad(buf, ((0, s_pad - buf.shape[0]), (0, 0)))
            bits = jnp.pad(bits, (0, s_pad - bits.shape[0]))
        return buf, bits
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
            pl.BlockSpec((1, mx, (nb + 2) * w_blk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mx, nb + 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((my, mx, (nb + 2) * w_blk), jnp.uint32),
            jax.ShapeDtypeStruct((my, mx, nb + 2), jnp.int32),
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
