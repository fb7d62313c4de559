"""Pallas TPU kernel K1: pixels -> quantized zigzag blocks in scan order.

One kernel pass fuses the whole transform stage (SURVEY.md components #4-#8,
call stack 4.1/4.2 hot loop 1): u8 RGB -> YCbCr -> chroma subsample -> level
shift -> 8x8 FDCT -> quantize -> zigzag, with every intermediate in VMEM.
The XLA prologue only repacks bytes (pure layout): each MCU's pixels become
one row [3 * nb * 64] u8 (channel-major, Y-block order, row-major pixels),
so the kernel sees MXU-friendly [T, L] tiles and emits scan-ordered
[T, (nb+2)*64] zigzag coefficients directly — no gathers, no transposes.

The DCT/quant/zigzag is a single matmul per component against precomputed
operators (same _KDCT_ZZ construction as ops.transform, with the quant
reciprocal folded into the columns at trace time):

  Y:  [T, nb*64] @ blockdiag_nb(KDCT/q_y)      (nb = luma blocks per MCU)
  C:  [T, nb*64] @ (S_sub @ (KDCT/q_c))        (box-mean subsample folded in)

Numerics note: the fused operators reassociate float32 ops relative to the
jnp path (subsample-mean folded into the DCT matmul; MXU accumulation
order). Quantized INTEGER outputs agree except when a coefficient lands
within an ulp of the round-half-away boundary — measured 0 mismatches in
interpret mode and ~2e-5 of coefficients (all +-1) on hardware. Each
backend uses one path consistently, so no file ever mixes formulations;
the on-hardware lane (tests/test_hw_tpu.py) bounds the divergence.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpgenc_tpu import tables as T
from jpgenc_tpu.layout import FrameLayout
from jpgenc_tpu.ops.transform import _KDCT_ZZ, round_half_away

_F32 = jnp.float32
TILE_MCU = 128      # MCUs per grid step


# ---------------------------------------------------------------------------
# Host-side operator builders (cached per layout mode)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _subsample_matrix(nb: int, hs: int, vs: int) -> np.ndarray:
    """[nb*64, 64] box-mean matrix: full-res chroma pixels (Y-block layout)
    -> 8x8 subsampled chroma block (row-major), weights 1/(hs*vs)."""
    s = np.zeros((nb * 64, 64), np.float32)
    bw = 8 * hs    # MCU pixel width
    for i in range(8):
        for j in range(8):
            for di in range(vs):
                for dj in range(hs):
                    p, q = vs * i + di, hs * j + dj       # luma-grid pixel
                    v, h = p // 8, q // 8                 # luma block coords
                    blk = v * hs + h                      # row-major block id
                    lane = blk * 64 + (p % 8) * 8 + (q % 8)
                    s[lane, 8 * i + j] = 1.0 / (hs * vs)
    return s


def build_operators(layout: FrameLayout, qtabs: jnp.ndarray):
    """Trace-time fused operators for one layout (qtabs [2, 64] natural).

    Returns (bd_y [nb*64, nb*64], sc [nb*64, 64], q_out [1, (nb+2)*64]) f32:
    DCT+zigzag for luma (block-diagonal over the MCU's nb blocks),
    subsample+DCT+zigzag for chroma, and the per-output-lane quant divisors.
    The divide stays a separate in-kernel op (matching the jnp path's order —
    folding 1/q into the operator columns moves knife-edge coefficients
    across the round-half-away boundary)."""
    c0 = layout.comps[0]
    nb = c0.hs * c0.vs
    zz = np.asarray(T.ZIGZAG)
    k = jnp.asarray(_KDCT_ZZ)                       # [64, 64]
    q_y = qtabs[0].reshape(64).astype(_F32)[zz]
    q_c = qtabs[1].reshape(64).astype(_F32)[zz]
    eye = jnp.asarray(np.eye(nb, dtype=np.float32))
    bd_y = jnp.kron(eye, k)                         # [nb*64, nb*64]
    sc = jnp.asarray(_subsample_matrix(nb, c0.hs, c0.vs)) @ k
    q_out = jnp.concatenate([jnp.tile(q_y, nb), q_c, q_c]).reshape(1, -1)
    return bd_y, sc, q_out


#: color path variant: the dense byte-slot operator folds channel
#: deinterleave + color transform + subsample + DCT + zigzag into ONE
#: matmul, so the XLA prologue only moves u32 WORDS (4x fewer elements than
#: the u8 MCU repack, which ran at ~3.4 GB/s and dominated the kernel).
K1_DENSE = True


@functools.lru_cache(maxsize=16)
def _dense_operator(hs: int, vs: int, basis: str = "byte_slot"
                    ) -> tuple[np.ndarray, np.ndarray]:
    """(M [4L, (nb+2)*64], bias [1, (nb+2)*64]) fused color+subsample+DCT+
    zigzag operator over raw interleaved-RGB MCU bytes.

    basis selects the input-lane ordering:
      'byte_slot': lane = L*kb + (r*wpr + j) — byte kb of MCU word (r, j)
        (little-endian bitcast), the layout `_dense_kernel`'s 4-way
        shift-extract + concat produces.
      'row_major': lane = ((r*4 + kb)*wpr + j) — the layout
        `_dense_dma_kernel`'s per-row extract + concat produces.
    bias carries the luma level shift (DCT of the constant -128 plane —
    chroma's +-128 cancels exactly in the BT.601 affine).
    """
    mh, mw = 8 * vs, 8 * hs
    nb = hs * vs
    wpr = mw * 3 // 4                  # u32 words per MCU pixel row
    lw = mh * wpr                      # words per MCU
    n_out = (nb + 2) * 64
    k = np.asarray(_KDCT_ZZ, np.float64)     # [64, 64] pixel -> zz coef
    cy = (0.299, 0.587, 0.114)
    ccb = (-0.168735892, -0.331264108, 0.5)
    ccr = (0.5, -0.418687589, -0.081312411)
    m = np.zeros((4 * lw, n_out), np.float64)
    for w in range(lw):
        r, j = divmod(w, wpr)
        for kb in range(4):
            px, c = divmod(4 * j + kb, 3)
            if basis == "byte_slot":
                lane = lw * kb + w
            else:
                lane = (r * 4 + kb) * wpr + j
            blk = (r // 8) * hs + (px // 8)
            pos = (r % 8) * 8 + (px % 8)
            m[lane, blk * 64:(blk + 1) * 64] += cy[c] * k[pos]
            cpos = (r // vs) * 8 + (px // hs)
            wgt = 1.0 / (hs * vs)
            m[lane, nb * 64:(nb + 1) * 64] += ccb[c] * wgt * k[cpos]
            m[lane, (nb + 1) * 64:] += ccr[c] * wgt * k[cpos]
    bias = np.concatenate([np.tile(-128.0 * k.sum(axis=0), nb),
                           np.zeros(128)])
    return m.astype(np.float32), bias.astype(np.float32).reshape(1, -1)


def _dense_dma_kernel(x_ref, m_ref, bias_ref, q_ref, out_ref, *, mh: int):
    """One MCU row per grid step; the BlockSpec DMA already gathered the
    [1, mh, mx, wpr] word block, so the MCU 'transpose' is mh static
    sublane slices + a lane concat — no XLA transpose anywhere."""
    parts = []
    for r in range(mh):
        xr = x_ref[0, r]                             # [mx, wpr] i32
        for kb in range(4):
            parts.append(((xr >> (8 * kb)) & 255).astype(_F32))
    x = jnp.concatenate(parts, axis=1)               # [mx, mh*4*wpr]
    out = jnp.dot(x, m_ref[:],
                  precision=jax.lax.Precision.HIGHEST) + bias_ref[:]
    out_ref[0] = round_half_away(out / q_ref[:]).astype(jnp.int32).astype(
        jnp.int16)


def mcu_pack_words(img_padded: jnp.ndarray, layout: FrameLayout) -> jnp.ndarray:
    """Padded [Hp, Wp, 3] u8 -> [n_mcu, words_per_mcu] i32 (u32 bitcast).

    Word-granular MCU repack: 4x fewer elements to move than the u8 repack;
    byte order inside each word is the little-endian bitcast the dense
    operator's byte-slot basis assumes.
    """
    c0 = layout.comps[0]
    mh, mw = 8 * c0.vs, 8 * c0.hs
    my, mx = layout.mcus_y, layout.mcus_x
    wpr = mw * 3 // 4
    words = jax.lax.bitcast_convert_type(
        img_padded.reshape(c0.plane_h, -1, 4), jnp.uint32)  # [Hp, Wp*3/4]
    x = (words.reshape(my, mh, mx, wpr)
         .transpose(0, 2, 1, 3)
         .reshape(my * mx, mh * wpr))
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _dense_kernel(xw_ref, m_ref, bias_ref, q_ref, out_ref):
    xw = xw_ref[:]                                   # [T, L] words (i32)
    parts = [((xw >> (8 * kb)) & 255).astype(_F32) for kb in range(4)]
    x = jnp.concatenate(parts, axis=1)               # [T, 4L] byte-slot
    out = jnp.dot(x, m_ref[:],
                  precision=jax.lax.Precision.HIGHEST) + bias_ref[:]
    out_ref[:] = round_half_away(out / q_ref[:]).astype(jnp.int32).astype(
        jnp.int16)


def mcu_pack(img_padded: jnp.ndarray, layout: FrameLayout) -> jnp.ndarray:
    """Padded [Hp, Wp, 3] u8 -> [n_mcu, 3*nb*64] u8 (pure layout ops).

    Per MCU row: channels major, luma blocks in row-major (v, h) order,
    pixels row-major — the layout build_operators' matrices assume.
    """
    c0 = layout.comps[0]
    hs, vs = c0.hs, c0.vs
    my, mx = layout.mcus_y, layout.mcus_x
    x = img_padded.reshape(my, vs, 8, mx, hs, 8, 3)
    x = x.transpose(0, 3, 6, 1, 4, 2, 5)            # [my,mx,3,v,h,py,px]
    return x.reshape(my * mx, 3 * vs * hs * 64)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _color_kernel(x_ref, bdy_ref, sc_ref, q_ref, out_ref, *, nb: int):
    # Mosaic (axon) has no direct u8->f32 cast: hop through i32
    x = x_ref[:].astype(jnp.int32)                  # [T, 3*nb*64]
    n = nb * 64
    r = x[:, 0 * n:1 * n].astype(_F32)
    g = x[:, 1 * n:2 * n].astype(_F32)
    b = x[:, 2 * n:3 * n].astype(_F32)
    # BT.601 full-range with the level shift folded into the constants:
    # y-128, and (cb|cr)+128-128 = 0 (ops/color.py numerics)
    y = _F32(0.299) * r + _F32(0.587) * g + _F32(0.114) * b - _F32(128.0)
    cb = _F32(-0.168735892) * r + _F32(-0.331264108) * g + _F32(0.5) * b
    cr = _F32(0.5) * r + _F32(-0.418687589) * g + _F32(-0.081312411) * b
    hp = jax.lax.Precision.HIGHEST
    y_zz = jnp.dot(y, bdy_ref[:], precision=hp)     # [T, nb*64]
    cb_zz = jnp.dot(cb, sc_ref[:], precision=hp)    # [T, 64]
    cr_zz = jnp.dot(cr, sc_ref[:], precision=hp)
    out = jnp.concatenate([y_zz, cb_zz, cr_zz], axis=1) / q_ref[:]
    # quantized coefficients fit i16 (|coef| <= 1024): halves the HBM round
    # trip into the entropy kernel
    out_ref[:] = round_half_away(out).astype(jnp.int32).astype(jnp.int16)


def _gray_kernel(x_ref, k_ref, q_ref, out_ref):
    x = x_ref[:].astype(jnp.int32).astype(_F32) - _F32(128.0)   # [T, 64]
    out = jnp.dot(x, k_ref[:], precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = round_half_away(out / q_ref[:]).astype(jnp.int32).astype(
        jnp.int16)


# ---------------------------------------------------------------------------
# Entry points
# ---------------------------------------------------------------------------

def _pad_rows(x: jnp.ndarray, mult: int) -> tuple[jnp.ndarray, int]:
    n = x.shape[0]
    n_pad = -(-n // mult) * mult
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    return x, n_pad


def fused_pixels_to_scan(img: jnp.ndarray, layout: FrameLayout,
                         qtabs: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """u8 image -> [n_seg * blocks_per_segment, 64] int16 zigzag blocks in
    interleaved scan order — the Pallas form of engine.pixels_to_scan (the
    narrower dtype halves the HBM round trip into the entropy kernel; the
    values are identical). Supports every mode ('gray'/'444'/'422'/'420')."""
    from jpgenc_tpu.ops import color as C

    s_pad = layout.n_segments * layout.blocks_per_segment
    c0 = layout.comps[0]
    padded = C.pad_replicate(img, c0.plane_h, c0.plane_w)

    if layout.is_gray:
        zz = np.asarray(T.ZIGZAG)
        k = jnp.asarray(_KDCT_ZZ)
        q = qtabs[0].reshape(64).astype(_F32)[zz].reshape(1, 64)
        h, w = c0.plane_h, c0.plane_w
        blocks = (padded.reshape(h // 8, 8, w // 8, 8)
                  .transpose(0, 2, 1, 3).reshape(-1, 64))
        x, n_pad = _pad_rows(blocks, TILE_MCU)      # u8 straight into VMEM
        grid = n_pad // TILE_MCU
        out = pl.pallas_call(
            _gray_kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TILE_MCU, 64), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_MCU, 64), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, 64), jnp.int16),
            interpret=interpret,
        )(x, k, q)
        zzb = out[:blocks.shape[0]]
    else:
        nb = c0.hs * c0.vs
        l_out = (nb + 2) * 64
        if K1_DENSE:
            zzi = np.asarray(T.ZIGZAG)
            q_y = qtabs[0].reshape(64).astype(_F32)[zzi]
            q_c = qtabs[1].reshape(64).astype(_F32)[zzi]
            q_out = jnp.concatenate([jnp.tile(q_y, nb), q_c, q_c]
                                    ).reshape(1, -1)
            mh = 8 * c0.vs
            mx, my = layout.mcus_x, layout.mcus_y
            wpr = (8 * c0.hs) * 3 // 4
            # lane dim wpr pads to 128 in VMEM: bound the per-step block.
            # The 3-D [my, mx, l_out] output keeps every block's last-two
            # dims EQUAL to the array dims, which satisfies Mosaic's tiling
            # rule for ANY width (the old mx % 8 gate came from (mx, l_out)
            # blocks sub-tiling a flattened (my*mx, l_out) dim)
            if mh * mx * 128 * 4 <= (4 << 20):
                # preferred: BlockSpec DMA gathers each MCU row's words
                # straight from the natural image layout — no XLA transpose
                # (XLA u8/u32 transposes run at ~3.4 GB/s on this chip and
                # dominated the kernel)
                m_np, bias_np = _dense_operator(c0.hs, c0.vs, "row_major")
                words = jax.lax.bitcast_convert_type(
                    padded.reshape(c0.plane_h, -1, 4), jnp.uint32)
                x4 = jax.lax.bitcast_convert_type(words, jnp.int32).reshape(
                    my, mh, mx, wpr)
                out = pl.pallas_call(
                    functools.partial(_dense_dma_kernel, mh=mh),
                    grid=(my,),
                    in_specs=[
                        pl.BlockSpec((1, mh, mx, wpr),
                                     lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, mx, l_out),
                                           lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((my, mx, l_out),
                                                   jnp.int16),
                    interpret=interpret,
                )(x4, jnp.asarray(m_np), jnp.asarray(bias_np), q_out)
                out = out.reshape(my * mx, l_out)
            else:
                m_np, bias_np = _dense_operator(c0.hs, c0.vs)
                x, n_pad = _pad_rows(mcu_pack_words(padded, layout),
                                     TILE_MCU)
                grid = n_pad // TILE_MCU
                lw = x.shape[1]
                out = pl.pallas_call(
                    _dense_kernel,
                    grid=(grid,),
                    in_specs=[
                        pl.BlockSpec((TILE_MCU, lw), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((TILE_MCU, l_out),
                                           lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((n_pad, l_out),
                                                   jnp.int16),
                    interpret=interpret,
                )(x, jnp.asarray(m_np), jnp.asarray(bias_np), q_out)
        else:
            bd_y, sc, q_out = build_operators(layout, qtabs)
            mcus = mcu_pack(padded, layout)         # [n_mcu, 3*nb*64] u8
            x, n_pad = _pad_rows(mcus, TILE_MCU)    # u8 straight into VMEM
            grid = n_pad // TILE_MCU
            l_in = 3 * nb * 64
            out = pl.pallas_call(
                functools.partial(_color_kernel, nb=nb),
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((TILE_MCU, l_in), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TILE_MCU, l_out), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_pad, l_out), jnp.int16),
                interpret=interpret,
            )(x, bd_y, sc, q_out)
        # [n_mcu, (nb+2)*64] IS the interleaved scan order: trailing reshape
        zzb = out[:layout.n_mcus].reshape(-1, 64)
    if s_pad > zzb.shape[0]:
        zzb = jnp.pad(zzb, ((0, s_pad - zzb.shape[0]), (0, 0)))
    return zzb
