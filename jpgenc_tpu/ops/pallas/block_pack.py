"""Pallas TPU kernel: fused entropy stage (SURVEY.md kernels K2+K3a+K3b).

One kernel pass takes quantized zigzag blocks straight to per-block packed
bitstreams, keeping every intermediate in VMEM:

  zz [T,64] -> AC run-length analysis (branch-free cummax prefix)
            -> SSSS/amplitude (float-exponent bit-length, no clz dependency)
            -> Huffman LUT lookup (take_along_axis lane gathers from
               VMEM-resident 128-wide table rows)
            -> per-slot 96-bit registers (ZRL lanes + code|amp piece)
            -> in-block exclusive bit-offset prefix (log-shift adds)
            -> word-level merge into a [T, W_BLK] buffer (static per-word
               one-hot accumulation; no scatter, no dynamic writes)

The jnp reference path (ops.entropy.make_pieces + ops.pack.block_pack)
produces bit-identical buffers; tests compare exactly. Platform notes: the
axon Mosaic backend rejects dynamic-start lane writes and 1-D gathers, so
the kernel uses only lane gathers via take_along_axis and static slicing.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpgenc_tpu.ops.entropy import EntropyLUTs, SymbolPlan

_I32 = jnp.int32
_U32 = jnp.uint32
TILE = 256          # slots (blocks) per grid step


def packed_tables(luts: EntropyLUTs) -> tuple:
    """LUTs in kernel-friendly layouts (traceable: works on traced luts).

    Entries are (code << 5) | code_len (code <= 16 bits, len <= 5 bits).
    ac_rows: [4, 128]  rows = tab0[0:128], tab0[128:256], tab1[...], tab1[...]
    dc_rows: [2, 128]  rows = tab0, tab1 (cols 0..11 used)
    misc:    [1, 4]    [zrl_tab0, zrl_tab1, eob_tab0, eob_tab1]
    """
    ac = jnp.asarray(luts.ac, jnp.int32)
    dc = jnp.asarray(luts.dc, jnp.int32)
    ac_rows = ac.reshape(4, 128)
    dc_rows = jnp.pad(dc[:, :16], ((0, 0), (0, 112)))
    misc = jnp.stack([ac[0, 0xF0], ac[1, 0xF0],
                      ac[0, 0], ac[1, 0]]).reshape(1, 4)
    return ac_rows, dc_rows, misc


def _lane_shift_right(x, n):
    """Shift values toward higher lane index by n (zero fill), axis=1."""
    if n == 0:
        return x
    return jnp.pad(x, ((0, 0), (n, 0)))[:, :-n]


def _ssss(v):
    """Bit length of |v| via the f32 exponent (exact for |v| < 2^24)."""
    av = jnp.abs(v)
    f = av.astype(jnp.float32)
    e = (jax.lax.bitcast_convert_type(f, _I32) >> 23) & 0xFF
    return jnp.where(av == 0, 0, e - 126)


def _shl(v, s):
    """u32 left shift with s in [0, 32] semantics (s>=32 -> 0)."""
    s32 = jnp.clip(s, 0, 31).astype(_U32)
    return jnp.where(s < 32, v << s32, _U32(0))


from jpgenc_tpu.ops.pack import _shift_into_word  # noqa: E402  (shared bit helper)


def _ac_analysis(v):
    """Zigzag rows [t, 64] i32 -> (pos, nz, run, s_ac, amp_ac, sym).

    Branch-free T.81 F.1.2.2 run-length analysis (cummax prefix) plus
    SSSS/amplitude coding per AC lane. Shared by the standalone entropy
    kernel below and the fused K1+A kernel (k1a_fused)."""
    t = v.shape[0]
    pos = jax.lax.broadcasted_iota(_I32, (t, 64), 1)
    nz = (v != 0) & (pos > 0)
    marker = jnp.where(nz, pos, 0)
    incl = marker
    for sh in (1, 2, 4, 8, 16, 32):
        incl = jnp.maximum(incl, _lane_shift_right(incl, sh))
    prev_nz = _lane_shift_right(incl, 1)
    run = pos - prev_nz - 1
    s_ac = _ssss(v)
    amp_ac = jnp.where(v >= 0, v, v + (_I32(1) << s_ac) - 1) & \
        ((_I32(1) << s_ac) - 1)
    sym = ((run & 15) << 4) | s_ac
    return pos, nz, run, s_ac, amp_ac, sym


def _dc_piece(dcdiff):
    """DC diff [t, 1] i32 -> (s_dc, amp_dc)."""
    s_dc = _ssss(dcdiff)
    amp_dc = jnp.where(dcdiff >= 0, dcdiff,
                       dcdiff + (_I32(1) << s_dc) - 1) & \
        ((_I32(1) << s_dc) - 1)
    return s_dc, amp_dc


def _kernel(zz_ref, dcdiff_ref, actab_ref, dctab_ref, valid_ref,
            ac_rows_ref, dc_rows_ref, misc_ref,
            buf_ref, bits_ref, *, w_blk: int):
    v = zz_ref[:].astype(_I32)                       # [T, 64] (i16 from K1)
    t = v.shape[0]
    pos, nz, run, s_ac, amp_ac, sym = _ac_analysis(v)

    # --- Huffman LUT lookups: 4 candidate lane-gathers + selects
    actab = actab_ref[:]                             # [T, 1]
    dctab = dctab_ref[:]
    valid = valid_ref[:] != 0
    # Mosaic's gather lowering requires idx.shape == operand.shape: pad the
    # 64-lane symbol indices to the table row width and slice the result.
    idx_lo = jnp.pad(sym & 127, ((0, 0), (0, 64)))   # [T, 128]
    cand = []
    for row in range(4):
        x = jnp.broadcast_to(ac_rows_ref[row:row + 1, :], (t, 128))
        cand.append(jnp.take_along_axis(x, idx_lo, axis=1)[:, :64])
    hi = sym >= 128
    e_t0 = jnp.where(hi, cand[1], cand[0])
    e_t1 = jnp.where(hi, cand[3], cand[2])
    e_ac = jnp.where(actab == 0, e_t0, e_t1)         # [T, 64]

    # --- DC piece (slot position 0)
    dcdiff = dcdiff_ref[:]                           # [T, 1]
    s_dc, amp_dc = _dc_piece(dcdiff)
    s_dc128 = jnp.broadcast_to(s_dc, (t, 128))
    d0 = jnp.take_along_axis(
        jnp.broadcast_to(dc_rows_ref[0:1, :], (t, 128)), s_dc128, axis=1)[:, :1]
    d1 = jnp.take_along_axis(
        jnp.broadcast_to(dc_rows_ref[1:2, :], (t, 128)), s_dc128, axis=1)[:, :1]
    e_dc = jnp.where(dctab == 0, d0, d1)             # [T, 1]

    # --- ZRL / EOB entries per slot row
    zrl = jnp.where(actab == 0, misc_ref[0, 0], misc_ref[0, 1])  # [T, 1]
    eob = jnp.where(actab == 0, misc_ref[0, 2], misc_ref[0, 3])

    buf, total = _pack_slots(pos, nz, run, s_ac, amp_ac, e_ac,
                             s_dc, amp_dc, e_dc, zrl, eob, valid, w_blk)
    buf_ref[:] = buf
    bits_ref[:] = total


def _pack_slots(pos, nz, run, s_ac, amp_ac, e_ac, s_dc, amp_dc, e_dc,
                zrl, eob, valid, w_blk: int):
    """Per-slot pieces -> (packed words [t, w_blk] u32, total bits [t, 1]).

    e_ac [t, 64] / e_dc [t, 1] / zrl / eob are packed (code<<5)|len entries;
    valid [t, 1] bool masks whole slots to zero length. Shared tail of the
    entropy kernels (registers, in-block prefix, funnel-shift merge)."""
    t = pos.shape[0]
    code_ac = (e_ac >> 5).astype(_U32)
    clen_ac = e_ac & 31
    main_val = (_shl(code_ac, s_ac)) | amp_ac.astype(_U32)
    main_len = jnp.where(nz & valid, clen_ac + s_ac, 0)

    at63 = pos == 63
    eob_here = ~nz[:, 63:64]                          # [T, 1]
    eob_val = (eob >> 5).astype(_U32)
    eob_len = eob & 31
    main_val = jnp.where(at63 & eob_here, jnp.broadcast_to(eob_val, (t, 64)),
                         main_val)
    main_len = jnp.where(at63 & eob_here & valid,
                         jnp.broadcast_to(eob_len, (t, 64)), main_len)

    at0 = pos == 0
    code_dc = (e_dc >> 5).astype(_U32)
    dc_val = _shl(code_dc, s_dc) | amp_dc.astype(_U32)
    dc_len = jnp.where(valid, (e_dc & 31) + s_dc, 0)
    main_val = jnp.where(at0, jnp.broadcast_to(dc_val, (t, 64)), main_val)
    main_len = jnp.where(at0, jnp.broadcast_to(dc_len, (t, 64)), main_len)

    # --- registers: up to 3 ZRL pieces then the main piece (96-bit, 3 words)
    n_zrl = jnp.where(nz & valid, run >> 4, 0)
    zval = (zrl >> 5).astype(_U32)
    zlen = zrl & 31
    reg = [jnp.zeros((t, 64), _U32) for _ in range(3)]
    p_off = jnp.zeros((t, 64), _I32)
    for p in range(4):
        if p < 3:
            on = n_zrl > p
            pv = jnp.where(on, jnp.broadcast_to(zval, (t, 64)), _U32(0))
            plen = jnp.where(on, jnp.broadcast_to(zlen, (t, 64)), 0)
        else:
            pv = main_val
            plen = main_len
        a = 96 - p_off - plen
        for w in range(3):
            reg[w] = reg[w] | _shift_into_word(pv, a - 64 + 32 * w)
        p_off = p_off + plen
    slen = p_off                                      # [T, 64] bits per slot

    # --- in-block exclusive prefix of bit offsets (log-shift adds)
    csum = slen
    for sh in (1, 2, 4, 8, 16, 32):
        csum = csum + _lane_shift_right(csum, sh)
    off = csum - slen                                 # exclusive
    total = csum[:, 63:64]                            # [T, 1]

    d = off >> 5
    r = off & 31

    # --- funnel-shift each register into word-aligned contributions
    w4 = []
    for j in range(4):
        lo = reg[j] if j <= 2 else jnp.zeros((t, 64), _U32)
        hi2 = reg[j - 1] if 1 <= j <= 3 else jnp.zeros((t, 64), _U32)
        w4.append(_shift_into_word(lo, -r) | _shift_into_word(hi2, 32 - r))

    # --- merge: static per-word one-hot accumulation (no scatter)
    # (sum in i32: Mosaic lacks unsigned reductions; contributions have
    # disjoint bits, so two's-complement addition is bit-identical to OR)
    cols = []
    for w in range(w_blk):
        acc = jnp.zeros((t, 64), _I32)
        for j in range(4):
            acc = acc | jnp.where(d == w - j,
                                  jax.lax.bitcast_convert_type(w4[j], _I32), 0)
        cols.append(jnp.sum(acc, axis=1))
    buf = jax.lax.bitcast_convert_type(jnp.stack(cols, axis=1), _U32)
    return buf, total


@functools.partial(jax.jit, static_argnames=("w_blk", "interpret"))
def fused_block_pack(zz_scan: jnp.ndarray, dcdiff: jnp.ndarray,
                     actab: jnp.ndarray, dctab: jnp.ndarray,
                     valid: jnp.ndarray, tables: tuple,
                     w_blk: int = 24, interpret: bool = False
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """zz blocks (+ per-slot metadata) -> per-block packed buffers.

    zz_scan: [S, 64] i32; dcdiff/actab/dctab/valid: [S] i32. S is padded to a
    TILE multiple internally. tables: (ac_rows, dc_rows, misc) from
    packed_tables(). Returns (buf [S, w_blk] u32, bits [S] i32) — bit-identical
    to ops.pack.block_pack over ops.entropy.make_pieces.
    """
    ac_rows, dc_rows, misc = tables
    s = zz_scan.shape[0]
    s_pad = -(-s // TILE) * TILE
    pad = s_pad - s

    def pad0(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) if pad else a

    zz_p = pad0(zz_scan)
    args = [pad0(x.reshape(-1, 1)) for x in (dcdiff, actab, dctab, valid)]

    grid = s_pad // TILE
    col = pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    buf, bits = pl.pallas_call(
        functools.partial(_kernel, w_blk=w_blk),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
            col, col, col, col,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE, w_blk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s_pad, w_blk), jnp.uint32),
            jax.ShapeDtypeStruct((s_pad, 1), jnp.int32),
        ),
        interpret=interpret,
    )(zz_p, *args, ac_rows, dc_rows, misc)
    return buf[:s], bits[:s, 0]


def slot_metadata(plan: SymbolPlan, zz_scan: jnp.ndarray):
    """XLA-side pre-pass: DC diffs (small gather) + per-slot table ids."""
    s = zz_scan.shape[0]
    dc = zz_scan[:, 0].astype(_I32)       # zz may arrive as i16 from K1
    prev_idx = jnp.clip(plan.prev_same, 0, s - 1)
    prev_dc = jnp.where(plan.prev_same >= 0, dc[prev_idx], 0)
    diff = dc - prev_dc
    return diff, plan.ac_tab, plan.dc_tab, plan.valid.astype(_I32)
