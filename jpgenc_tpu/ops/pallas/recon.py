"""Pallas TPU kernel: fused decoder reconstruction (SURVEY.md component #21,
TPU tier "jnp/Pallas (reuses K1 pieces transposed)").

One kernel pass per MCU row fuses the whole pixel reconstruction: dequant ->
dezigzag+IDCT -> fancy (triangle) chroma upsample -> YCbCr->RGB -> round/clip
-> byte packing, with every intermediate in VMEM. It replaces the vmapped XLA
chain in decoder._recon_jit (~4.3 ms/frame at 1080p on this chip — half
dequant/IDCT matmul, half upsample/color/assembly memory passes), which bound
decode-to-HBM at ~356 MPix/s (docs/PERFORMANCE.md round-3 findings).

Design (mirrors ops/pallas/k1_dct.py's dense operator, transposed):

- Input is the MCU-major coefficient tensor [B, my, mx, L] int16 with
  L = (nb+2)*64 lanes per MCU (luma blocks row-major, then Cb, Cr, zigzag
  order within each block) — which is exactly JPEG's interleaved SCAN-POSITION
  space, so the packed-upload densify scatter produces it directly with NO
  scan_flat table lookup (cheaper than the component-planar form).
- Dequantization is a per-lane multiply by the runtime quant row [B, L].
- TWO trace-time operators per mode (r5): stage 1 is the block-diagonal
  dezigzag+IDCT (+128) producing component SAMPLES, which the kernel
  rounds and range-limits to [0, 255] — the T.81 reconstruction semantic
  every libjpeg-family decoder applies, non-linear and therefore
  impossible to fold into a single operator; stage 2 spreads the CLAMPED
  samples through the triangle upsample x BT.601 weights (the -128 chroma
  offsets fold into its bias via the filter's partition of unity).
  Output lanes use a 128-aligned byte-slot basis — four groups of
  GPAD = align(mh*nw, 128) lanes, group k holding byte k of every output u32
  word at lane k*GPAD + r*nw + w — so the word packing is
  g0 | g1<<8 | g2<<16 | g3<<24 over four TILE-ALIGNED lane slices (the same
  trick k1_dct's dense encoder kernel uses in reverse).
- The triangle filter's cross-MCU taps enter as cheap tap vectors:
  left/right chroma columns from sublane shifts of the row's own lanes, and
  the vertically adjacent chroma pixel rows from two extra 128-lane halo
  BlockSpecs on the same input array (clamped index maps); plane edges
  replicate via masked selects, matching ops/color.upsample_fancy exactly.
- Output is [B, h, mx, NW] int32 words whose row-major flattening IS the
  natural [B, h, Wp, 3] u8 image (bitcast + reshape, no transpose); the
  height crop is free because Pallas masks the final row block's
  out-of-bounds writes.

Mosaic (axon) layout rules baked in, found the hard way: elementwise ops and
broadcasts over lane-OFFSET slices miscompile unless the offset is a multiple
of 128 (stores and sublane slices are fine) — hence the 128-aligned byte-slot
groups, the chroma quant row arriving as its own offset-0 block, separate
col-0/col-7 extractor operands, and matmul-based lane picks for the corner
taps.

Numerics: the two-stage operators share the jnp path's structure (IDCT ->
round/clamp samples -> upsample/color) but reassociate float32 ops (MXU
accumulation order; per-mode operator constants accumulated in float64).
Pixel outputs agree except when a value lands within an ulp of the .5
rounding boundary — bounded by tests at max |diff| <= 1 on a tiny fraction of
pixels (same discipline as the K1A encode kernel). Rounding itself is an
explicit round-half-even, identical to the jnp path's jnp.round.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpgenc_tpu.layout import FrameLayout
from jpgenc_tpu.ops.transform import _KIDCT_ZZ

_F32 = jnp.float32

# BT.601 full-range inverse (ops/color.ycbcr_to_rgb numerics)
_CCB = (0.0, -0.344136286, 1.772)           # Cb -> (r, g, b)
_CCR = (1.402, -0.714136286, 0.0)           # Cr -> (r, g, b)


def _vtaps(r: int, vs: int) -> list[tuple[int, float]]:
    """Chroma row taps (index, weight) for output luma row r — the centered
    3:1 triangle filter of ops/color._upsample2_axis; index -1/8 = halo."""
    if vs == 1:
        return [(r, 1.0)]
    t0 = r // 2
    return [(t0, 0.75), (t0 - 1, 0.25)] if r % 2 == 0 \
        else [(t0, 0.75), (t0 + 1, 0.25)]


def _align128(n: int) -> int:
    return -(-n // 128) * 128


@functools.lru_cache(maxsize=8)
def _operators(hs: int, vs: int) -> dict:
    """Trace-time constant operators for one subsampling mode (float64
    accumulation, cast to f32 once).

    TWO-STAGE since r5: T.81 reconstruction (and every libjpeg-family
    decoder) rounds and range-limits IDCT output SAMPLES to [0, 255] per
    component BEFORE chroma upsampling and color conversion — a clamp the
    old single fat operator could not express (it folded upsample+color
    into the IDCT matmul, so ringing overshoot leaked through the linear
    chain; measured up to 27/255 off at isolated overshoot pixels on
    noisy content). Stage 1 (`m1`+`b1`): block-diagonal dezigzag+IDCT,
    +128 level shift for every component (chroma samples become true
    [0,255] Cb/Cr) — the kernel rounds half-even and clamps the result.
    Stage 2 (`m2`+`b2`): Y permutation + triangle-upsample x BT.601
    weights over the CLAMPED samples; the -128 chroma offset of the
    color transform folds into `b2` because the upsample weights are a
    partition of unity per output pixel (across m2 AND the halo-tap
    spreads, whose extracted samples get the same +128/round/clamp in
    the kernel)."""
    nb = hs * vs
    mh, mw = 8 * vs, 8 * hs
    L = (nb + 2) * 64
    nw = mw * 3 // 4                 # u32 words per MCU pixel row
    gpad = _align128(mh * nw)        # lanes per byte-slot group
    n_out = 4 * gpad
    k = np.asarray(_KIDCT_ZZ, np.float64)      # [64 zz, 64 pos(row-major)]

    def col(r: int, px: int, c: int) -> int:
        b = px * 3 + c
        return (b % 4) * gpad + r * nw + (b // 4)

    # stage 1: zigzag coefficients -> spatial samples, lane g*64+pos
    m1 = np.zeros((L, L), np.float64)
    for g in range(nb + 2):
        m1[g * 64:(g + 1) * 64, g * 64:(g + 1) * 64] = k
    b1 = np.full((1, L), 128.0)

    # stage 2: clamped samples -> byte-slot pixels
    m2 = np.zeros((L, n_out), np.float64)
    b2 = np.zeros((1, n_out), np.float64)
    for r in range(mh):
        for px in range(mw):
            slot = (r // 8) * hs + (px // 8)
            pos = (r % 8) * 8 + (px % 8)
            vt = _vtaps(r, vs)
            ht = _vtaps(px, hs)
            for c in range(3):
                # total chroma weight is 1 per component (edge taps
                # included), so the color transform's (cb-128)/(cr-128)
                # offsets are one constant per output column
                b2[0, col(r, px, c)] = -128.0 * (_CCB[c] + _CCR[c])
                m2[slot * 64 + pos, col(r, px, c)] += 1.0
                for tv, wv in vt:
                    for tu, wu in ht:
                        if 0 <= tv < 8 and 0 <= tu < 8:
                            w = wv * wu
                            cp = tv * 8 + tu
                            m2[nb * 64 + cp, col(r, px, c)] += w * _CCB[c]
                            m2[(nb + 1) * 64 + cp, col(r, px, c)] += \
                                w * _CCR[c]
    ops = {"m1": m1.astype(np.float32), "b1": b1.astype(np.float32),
           "m2": m2.astype(np.float32), "b2": b2.astype(np.float32)}

    if hs == 2:
        # column extractors: chroma zz lanes (cb|cr, 128) -> 16 tap lanes
        # (cb rows 0..7, cr rows 0..7) at chroma column 0 / 7 — SEPARATE
        # operands (a lane-offset slice of one [128, 32] operand
        # miscompiles on this backend)
        ce0 = np.zeros((128, 16), np.float64)
        ce7 = np.zeros((128, 16), np.float64)
        for t in range(8):
            ce0[0:64, t] = k[:, t * 8 + 0]
            ce0[64:128, 8 + t] = k[:, t * 8 + 0]
            ce7[0:64, t] = k[:, t * 8 + 7]
            ce7[64:128, 8 + t] = k[:, t * 8 + 7]
        wlr = np.zeros((32, n_out), np.float64)
        for r in range(mh):
            for c in range(3):
                for tv, wv in _vtaps(r, vs):
                    if not 0 <= tv < 8:
                        continue
                    # left halo: output px 0's tu=-1 tap (weight 0.25)
                    wlr[tv, col(r, 0, c)] += wv * 0.25 * _CCB[c]
                    wlr[8 + tv, col(r, 0, c)] += wv * 0.25 * _CCR[c]
                    # right halo: output px mw-1's tu=8 tap
                    wlr[16 + tv, col(r, mw - 1, c)] += wv * 0.25 * _CCB[c]
                    wlr[24 + tv, col(r, mw - 1, c)] += wv * 0.25 * _CCR[c]
        ops["ce0"] = ce0.astype(np.float32)
        ops["ce7"] = ce7.astype(np.float32)
        ops["wlr"] = wlr.astype(np.float32)

    if vs == 2:
        # row extractors: chroma zz lanes -> 16 tap lanes (cb cols 0..7,
        # cr cols 0..7) at chroma row 0 / 7
        re0 = np.zeros((128, 16), np.float64)
        re7 = np.zeros((128, 16), np.float64)
        for u in range(8):
            re0[0:64, u] = k[:, 0 * 8 + u]
            re0[64:128, 8 + u] = k[:, 0 * 8 + u]
            re7[0:64, u] = k[:, 7 * 8 + u]
            re7[64:128, 8 + u] = k[:, 7 * 8 + u]
        # corner-tap lane picks as tiny matmuls (no lane-offset slicing):
        # s_first picks tap lanes (0, 8) = (cb, cr) col 0; s_last (7, 15)
        s_first = np.zeros((16, 2), np.float64)
        s_last = np.zeros((16, 2), np.float64)
        s_first[0, 0] = s_first[8, 1] = 1.0
        s_last[7, 0] = s_last[15, 1] = 1.0
        # spread for the halo pixel row above (tv=-1, output row 0) plus
        # its two corner lanes (16: up-left tap, 18: up-right tap; cb/cr)
        wu = np.zeros((20, n_out), np.float64)
        wd = np.zeros((20, n_out), np.float64)
        for px in range(mw):
            for c in range(3):
                for tu, wu_w in _vtaps(px, hs):
                    if 0 <= tu < 8:
                        wu[tu, col(0, px, c)] += 0.25 * wu_w * _CCB[c]
                        wu[8 + tu, col(0, px, c)] += 0.25 * wu_w * _CCR[c]
                        wd[tu, col(mh - 1, px, c)] += 0.25 * wu_w * _CCB[c]
                        wd[8 + tu, col(mh - 1, px, c)] += \
                            0.25 * wu_w * _CCR[c]
        for c in range(3):                          # corners: 0.25 * 0.25
            wu[16, col(0, 0, c)] += 0.0625 * _CCB[c]
            wu[17, col(0, 0, c)] += 0.0625 * _CCR[c]
            wu[18, col(0, mw - 1, c)] += 0.0625 * _CCB[c]
            wu[19, col(0, mw - 1, c)] += 0.0625 * _CCR[c]
            wd[16, col(mh - 1, 0, c)] += 0.0625 * _CCB[c]
            wd[17, col(mh - 1, 0, c)] += 0.0625 * _CCR[c]
            wd[18, col(mh - 1, mw - 1, c)] += 0.0625 * _CCB[c]
            wd[19, col(mh - 1, mw - 1, c)] += 0.0625 * _CCR[c]
        ops["re0"] = re0.astype(np.float32)
        ops["re7"] = re7.astype(np.float32)
        ops["s_first"] = s_first.astype(np.float32)
        ops["s_last"] = s_last.astype(np.float32)
        ops["wu"] = wu.astype(np.float32)
        ops["wd"] = wd.astype(np.float32)
    return ops


@functools.lru_cache(maxsize=2)
def _gray_operator() -> tuple[np.ndarray, np.ndarray]:
    """[64, 512] dequantized-zigzag -> byte-slot pixel operator for one
    8x8 gray block (nw=2 words per pixel row, gpad=128), plus bias."""
    k = np.asarray(_KIDCT_ZZ, np.float64)
    nw = 2
    gpad = 128
    m = np.zeros((64, 4 * gpad), np.float64)
    bias = np.zeros((1, 4 * gpad), np.float64)
    for r in range(8):
        for px in range(8):
            col = (px % 4) * gpad + r * nw + px // 4
            m[:, col] += k[:, r * 8 + px]
            bias[0, col] = 128.0
    return m.astype(np.float32), bias.astype(np.float32)


def _gray_kernel(x_ref, q_ref, m_ref, b_ref, out_ref):
    gpad = 128
    xf = x_ref[0, 0].astype(jnp.int32).astype(_F32) * q_ref[0]  # [bx, 64]
    acc = jnp.dot(xf, m_ref[:], precision=jax.lax.Precision.HIGHEST) \
        + b_ref[:]
    base = jnp.floor(acc)
    frac = acc - base
    bi = base.astype(jnp.int32)
    up = (frac > 0.5) | ((frac == 0.5) & ((bi & 1) == 1))
    px = jnp.clip(bi + up.astype(jnp.int32), 0, 255)
    words = (px[:, 0:gpad]
             | (px[:, gpad:2 * gpad] << 8)
             | (px[:, 2 * gpad:3 * gpad] << 16)
             | (px[:, 3 * gpad:4 * gpad] << 24))
    for r in range(8):
        out_ref[0, r] = words[:, r * 2:(r + 1) * 2]


def _round_clamp_samples(a):
    """Round-half-even + [0, 255] range limit on component SAMPLES (the
    T.81 reconstruction semantic; same arithmetic as the jnp path's
    jnp.clip(jnp.round(plane), 0, 255)). Returns f32 (feeds matmuls)."""
    base = jnp.floor(a)
    frac = a - base
    bi = base.astype(jnp.int32)
    up = (frac > 0.5) | ((frac == 0.5) & ((bi & 1) == 1))
    return jnp.clip(bi + up.astype(jnp.int32), 0, 255).astype(_F32)


def _make_kernel(nb: int, mh: int, nw: int, hs: int, vs: int):
    hp = jax.lax.Precision.HIGHEST
    gpad = _align128(mh * nw)

    def kernel(*refs):
        x_ref, q_ref, m1_ref, b1_ref, m2_ref, b2_ref = refs[0:6]
        pos = 6
        if hs == 2:
            ce0_ref, ce7_ref, wlr_ref = refs[pos:pos + 3]
            pos += 3
        if vs == 2:
            (xu_ref, xd_ref, qc_ref, re0_ref, re7_ref, s_first_ref,
             s_last_ref, wu_ref, wd_ref) = refs[pos:pos + 9]
            pos += 9
        out_ref = refs[pos]

        q = q_ref[0]                                    # [1, L]
        xf = x_ref[0, 0].astype(jnp.int32).astype(_F32) * q   # [mx, L]
        # stage 1: block-diag dezigzag+IDCT (+128 every component), then
        # the T.81 sample range limit — the non-linearity the old single
        # fat operator could not express
        s = _round_clamp_samples(
            jnp.dot(xf, m1_ref[:], precision=hp) + b1_ref[:])  # [mx, L]
        # stage 2: Y permutation + upsample x color over CLAMPED samples
        acc = jnp.dot(s, m2_ref[:], precision=hp) + b2_ref[:]

        if hs == 2:
            xc = xf[:, nb * 64:]                        # [mx, 128], aligned
            mx = xc.shape[0]
            rows = jax.lax.broadcasted_iota(jnp.int32, (mx, 1), 0)
            c0_own = jnp.dot(xc, ce0_ref[:], precision=hp)
            c7_own = jnp.dot(xc, ce7_ref[:], precision=hp)
            xl = jnp.concatenate([xc[:1], xc[:-1]], axis=0)
            xr = jnp.concatenate([xc[1:], xc[-1:]], axis=0)
            # image-left edge replicates chroma col 0; interior MCUs take
            # the LEFT neighbour's col 7 (ops/color._upsample2_axis edges).
            # Extractions produce (sample - 128) values: level-shift and
            # range-limit them exactly like the in-MCU samples (the -128
            # color offset is folded into b2)
            l_tap = _round_clamp_samples(
                jnp.where(rows == 0, c0_own,
                          jnp.dot(xl, ce7_ref[:], precision=hp))
                + _F32(128.0))
            r_tap = _round_clamp_samples(
                jnp.where(rows == mx - 1, c7_own,
                          jnp.dot(xr, ce0_ref[:], precision=hp))
                + _F32(128.0))
            acc = acc + jnp.dot(jnp.concatenate([l_tap, r_tap], axis=1),
                                wlr_ref[:], precision=hp)

        if vs == 2:
            i = pl.program_id(1)
            my = pl.num_programs(1)
            # chroma quant lanes arrive as their own 128-lane block of the
            # q array: Mosaic cannot broadcast a lane-OFFSET slice of q
            qc = qc_ref[0]                              # [1, 128]
            xuf = xu_ref[0, 0].astype(jnp.int32).astype(_F32) * qc
            xdf = xd_ref[0, 0].astype(jnp.int32).astype(_F32) * qc
            # pixel row above this MCU row: top edge replicates own row 0;
            # level-shift + range-limit the extracted sample rows
            u_px = _round_clamp_samples(
                jnp.where(i == 0,
                          jnp.dot(xc, re0_ref[:], precision=hp),
                          jnp.dot(xuf, re7_ref[:], precision=hp))
                + _F32(128.0))
            d_px = _round_clamp_samples(
                jnp.where(i == my - 1,
                          jnp.dot(xc, re7_ref[:], precision=hp),
                          jnp.dot(xdf, re0_ref[:], precision=hp))
                + _F32(128.0))

            def corner(pxrow, left: bool):
                # corner chroma taps via lane-pick matmuls (lane-offset
                # slices narrower than 128 miscompile on this backend);
                # picks of already-clamped samples
                if left:
                    own = jnp.dot(pxrow, s_first_ref[:], precision=hp)
                    sh = jnp.concatenate([pxrow[:1], pxrow[:-1]], axis=0)
                    nbr = jnp.dot(sh, s_last_ref[:], precision=hp)
                    return jnp.where(rows == 0, own, nbr)
                own = jnp.dot(pxrow, s_last_ref[:], precision=hp)
                sh = jnp.concatenate([pxrow[1:], pxrow[-1:]], axis=0)
                nbr = jnp.dot(sh, s_first_ref[:], precision=hp)
                return jnp.where(rows == mx - 1, own, nbr)

            u_ext = jnp.concatenate(
                [u_px, corner(u_px, True), corner(u_px, False)], axis=1)
            d_ext = jnp.concatenate(
                [d_px, corner(d_px, True), corner(d_px, False)], axis=1)
            acc = acc + jnp.dot(u_ext, wu_ref[:], precision=hp)
            acc = acc + jnp.dot(d_ext, wd_ref[:], precision=hp)

        # explicit round-half-even (== jnp.round; the (x + 2^23) - 2^23
        # magic-add trick gets algebraically simplified away by XLA),
        # then clip and pack the four 128-ALIGNED byte-slot groups into
        # u32 words
        base = jnp.floor(acc)
        frac = acc - base
        bi = base.astype(jnp.int32)
        up = (frac > 0.5) | ((frac == 0.5) & ((bi & 1) == 1))
        px = jnp.clip(bi + up.astype(jnp.int32), 0, 255)
        words = (px[:, 0:gpad]
                 | (px[:, gpad:2 * gpad] << 8)
                 | (px[:, 2 * gpad:3 * gpad] << 16)
                 | (px[:, 3 * gpad:4 * gpad] << 24))    # [mx, gpad]
        for r in range(mh):
            out_ref[0, r] = words[:, r * nw:(r + 1) * nw]

    return kernel


def recon_applicable(layout: FrameLayout) -> bool:
    """Static gate for the fused reconstruction kernel (all modes; gray
    uses the single-block `_gray_kernel` variant).

    No mcus_x % 8 rule here: every block's last-two dims EQUAL the array
    dims, which satisfies Mosaic's tiling constraint for any width —
    verified on chip at mcus_x=252 (4032-wide camera geometry, knife-edge
    parity only). k1a's rule comes from blocks that are strict
    sub-tilings of a flattened dim and does not transfer."""
    if layout.is_gray:
        return layout.mcus_x * (64 * 8 + 4 * 512 * 4 + 8 * 128 * 4) \
            <= (10 << 20)
    c0 = layout.comps[0]
    if (c0.hs, c0.vs) not in ((1, 1), (2, 1), (2, 2)):
        # rare decode-side samplings (411/440/410): the kernel's tap
        # structure models only the encoder's three color modes — the XLA
        # path handles the rest
        return False
    nb = c0.hs * c0.vs
    mh = 8 * c0.vs
    L = (nb + 2) * 64
    gpad = _align128(mh * (8 * c0.hs) * 3 // 4)
    # dominant VMEM: double-buffered x blocks + f32 xf + the stage-1
    # sample tensor s [mx, L] + acc/px/words + lane-padded out block;
    # operators (m1 [L,L] + m2 [L, 4*gpad]) are ~2 MB
    est = layout.mcus_x * (2 * L * 2 + 2 * L * 4 + 4 * gpad * 4 * 3
                           + mh * 128 * 4 * 2)
    return est <= (10 << 20)


def fused_recon_words(x4: jnp.ndarray, q_rows: jnp.ndarray,
                      layout: FrameLayout,
                      interpret: bool = False) -> jnp.ndarray:
    """[B, my, mx, L] int16 MCU-major zigzag coefficients + [B, L] f32 quant
    rows -> [B, h, mx, NW] int32 words (little-endian RGB bytes; flattening
    the last two dims gives the natural [h, Wp*3] byte image, height already
    cropped by the masked final row block)."""
    c0 = layout.comps[0]
    hs, vs = c0.hs, c0.vs
    nb = hs * vs
    mh = 8 * vs
    nw = (8 * hs) * 3 // 4
    L = (nb + 2) * 64
    B, my, mx = x4.shape[0], layout.mcus_y, layout.mcus_x
    h = layout.height

    if layout.is_gray:
        m_np, bias_np = _gray_operator()
        return pl.pallas_call(
            _gray_kernel,
            grid=(B, my),
            in_specs=[
                pl.BlockSpec((1, 1, mx, 64), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 64), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, mx, 2), lambda b, i: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, h, mx, 2), jnp.int32),
            interpret=interpret,
        )(x4, q_rows.reshape(B, 1, 64), jnp.asarray(m_np),
          jnp.asarray(bias_np))

    ops = _operators(hs, vs)

    # q rides as [B, 1, L]: a (1, 1, L) block keeps the last-two-dims
    # tiling rule satisfied for every batch size
    args = [x4, q_rows.reshape(B, 1, L),
            jnp.asarray(ops["m1"]), jnp.asarray(ops["b1"]),
            jnp.asarray(ops["m2"]), jnp.asarray(ops["b2"])]
    in_specs = [
        pl.BlockSpec((1, 1, mx, L), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, L), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if hs == 2:
        args += [jnp.asarray(ops["ce0"]), jnp.asarray(ops["ce7"]),
                 jnp.asarray(ops["wlr"])]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
    if vs == 2:
        cblk = nb * 64 // 128       # chroma lane-block index (128 granular)
        args += [x4, x4, q_rows.reshape(B, 1, L),
                 jnp.asarray(ops["re0"]), jnp.asarray(ops["re7"]),
                 jnp.asarray(ops["s_first"]), jnp.asarray(ops["s_last"]),
                 jnp.asarray(ops["wu"]), jnp.asarray(ops["wd"])]
        in_specs += [
            pl.BlockSpec((1, 1, mx, 128),
                         lambda b, i: (b, jnp.maximum(i - 1, 0), 0, cblk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mx, 128),
                         lambda b, i: (b, jnp.minimum(i + 1, my - 1), 0,
                                       cblk),
                         memory_space=pltpu.VMEM),
            # chroma quant lanes as an offset-0 block (Mosaic cannot
            # broadcast a lane-offset slice of the full q block)
            pl.BlockSpec((1, 1, 128), lambda b, i: (b, 0, cblk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
    return pl.pallas_call(
        _make_kernel(nb, mh, nw, hs, vs),
        grid=(B, my),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, mh, mx, nw), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, h, mx, nw), jnp.int32),
        interpret=interpret,
    )(*args)


def words_to_rgb(words: jnp.ndarray, layout: FrameLayout) -> jnp.ndarray:
    """[B, h, mx, NW] int32 -> [B, h, w, 3] uint8 ([B, h, w] for gray);
    bitcast + reshape, a lane slice-copy only when the width is not
    MCU-aligned."""
    B, h = words.shape[0], layout.height
    w = layout.width
    ch = 1 if layout.is_gray else 3
    u8 = jax.lax.bitcast_convert_type(words, jnp.uint8)   # [B,h,mx,NW,4]
    flat = u8.reshape(B, h, -1)                           # [B, h, Wp*ch]
    if flat.shape[2] != w * ch:
        flat = flat[:, :, :w * ch]
    return flat.reshape(B, h, w) if layout.is_gray else \
        flat.reshape(B, h, w, 3)


def fused_recon_rgb(x4: jnp.ndarray, q_rows: jnp.ndarray,
                    layout: FrameLayout,
                    interpret: bool = False) -> jnp.ndarray:
    """[B, my, mx, L] int16 + [B, L] quant rows -> [B, h, w, 3] uint8."""
    return words_to_rgb(fused_recon_words(x4, q_rows, layout,
                                          interpret=interpret), layout)
