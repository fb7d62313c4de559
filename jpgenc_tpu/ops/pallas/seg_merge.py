"""Pallas TPU kernel: per-block buffers -> per-segment bitstreams (kernel B).

Replaces ops.pack.segments_from_blocks' 25-tap scatter with a sequential-grid
merge. The TPU grid iterates (segment, tile-of-blocks) in order; each step:

  1. funnel-shifts its TB blocks' words by their bit offsets in VMEM
     (the [TB, w_blk+1] shifted form is computed in-kernel — it never
     round-trips HBM),
  2. places every block's words into a LANE-MAJOR span via one wide
     `take_along_axis` gather (idx[k, j] = j - word_offset[k]) and a single
     sublane reduction over the TB blocks — bit-disjoint contributions make
     i32 addition identical to OR. This keeps all 128 lanes busy, unlike a
     per-block dynamic-slice accumulation (word-per-sublane, 1/128 lanes),
  3. chains span content at/after the next tile's 128-aligned base through
     carry scratch (the TPU grid is sequential, so scratch persists),
  4. DMAs the span to its 128-aligned offset inside the segment row.

Correctness protocol for the fixed-size span writes: tile t covers words
[base_al_t, base_al_t + SPAN); a later tile's write only overlaps where it
carries t's boundary content (one block spans at most w_blk+1 words past the
next tile's base, and the carry window covers 128-alignment slack + that), so
every word's final value is correct. Words past each segment's content are
left uninitialized — nothing downstream reads them (compact_unstuffed slices
by seg_bits).

The jnp path (ops.pack.segments_from_blocks) is bit-identical and remains
the CPU/fallback implementation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32 = jnp.int32
_U32 = jnp.uint32

TB = 64             # blocks per grid step: per-tile chunk work grows with
                    # TB^2 while tile fixed overhead shrinks with TB — 64 is
                    # the measured sweet spot on this chip (3.8 ms/frame vs
                    # 4.0 at 32, 4.25 at 128 for 1080p 4:2:0)


def _kernel(bases_ref,                     # scalar prefetch: [n_tiles+1] i32
            buf_ref, w0_ref, r_ref,        # [TB, w_blk] i32, [TB,1], [TB,1]
            out_ref,                       # HBM [n_seg, rows, 128] i32
            acc2, carry, sem,              # scratch
            *, w_blk: int, span: int, tiles_per_seg: int, out_rows: int):
    from jpgenc_tpu.ops.pack import _shift_into_word

    seg = pl.program_id(0)
    tile = pl.program_id(1)
    gtile = seg * tiles_per_seg + tile
    base_al = (bases_ref[gtile] >> 7) << 7
    base_next_al = (bases_ref[gtile + 1] >> 7) << 7
    w1 = w_blk + 1
    tb = buf_ref.shape[0]
    n_chunks = span // 128

    # --- in-kernel funnel shift: block k's words shifted right by r[k] bits
    buf = jax.lax.bitcast_convert_type(buf_ref[:], _U32)
    lo = jnp.pad(buf, ((0, 0), (0, 1)))            # [TB, w1]: lo[t] = buf[t]
    hi = jnp.pad(buf, ((0, 0), (1, 0)))            # hi[t] = buf[t-1]
    r = r_ref[:]                                   # [TB, 1]
    sh = _shift_into_word(lo, -r) | _shift_into_word(hi, 32 - r)
    src = jnp.pad(jax.lax.bitcast_convert_type(sh, _I32),
                  ((0, 0), (0, 128 - w1)))         # [TB, 128]

    # --- chunked lane-major placement. Block k's w1 words start at span word
    # d_k = chunk g_k, lane m_k, spilling into chunk g_k+1 (w1 < 128). Mosaic
    # gathers require exactly 128 lanes, so each block's two chunk images are
    # built with two [TB, 128] gathers, then chunk c of the span is a masked
    # sublane reduction over the blocks that land there. All 128 lanes stay
    # busy — vs. 1 of 128 for a word-per-sublane dynamic-slice accumulation.
    d = w0_ref[:] - base_al                        # [TB, 1]
    g = d >> 7
    m = d & 127
    lanes = jax.lax.broadcasted_iota(_I32, (tb, 128), 1)
    rel0 = lanes - m                               # lane l of chunk g_k
    rel1 = lanes + 128 - m                         # lane l of chunk g_k+1
    img0 = jnp.where((rel0 >= 0) & (rel0 < w1),
                     jnp.take_along_axis(src, jnp.clip(rel0, 0, 127), axis=1),
                     0)
    img1 = jnp.where(rel1 < w1,
                     jnp.take_along_axis(src, jnp.clip(rel1, 0, 127), axis=1),
                     0)
    chunks = []
    for c in range(n_chunks):
        contrib = jnp.where(g == c, img0, 0) + jnp.where(g == c - 1, img1, 0)
        chunks.append(jnp.sum(contrib, axis=0, keepdims=True))
    acc = jnp.concatenate(chunks, axis=0)          # [n_chunks, 128] i32

    # fold in the previous tile's boundary words (garbage at tile 0 of the
    # very first call is masked off by the where)
    cin = jnp.where(tile != 0, carry[:], 0)        # [2, 128]
    acc = jnp.concatenate([acc[0:2] + cin, acc[2:]], axis=0)

    # hand everything at/after the next tile's aligned base onward. At a
    # segment's last tile the next base resets (next segment starts at word
    # 0) making delta negative — clamp; the next tile ignores the carry
    # anyway (tile == 0). delta is 128-aligned by construction.
    delta_c = jnp.maximum(base_next_al - base_al, 0) >> 7
    acc2[:] = jnp.pad(acc, ((0, 2), (0, 0)))
    carry[:] = acc2[pl.ds(delta_c, 2), :]

    # capacity-capped output (see fused_seg_merge cap_words): clamp the
    # DMA start so content past the cap scribbles IN BOUNDS instead of
    # out of them — the host's capacity check (seg_bits vs cap) discards
    # such results before anything reads them, and non-overflowing
    # content never reaches the clamp (base_al <= content <= cap)
    start = jnp.clip(base_al >> 7, 0, out_rows - n_chunks)
    copy = pltpu.make_async_copy(
        acc2.at[pl.ds(0, n_chunks), :],
        out_ref.at[seg, pl.ds(start, n_chunks), :], sem)
    copy.start()
    copy.wait()


@functools.partial(jax.jit, static_argnames=("n_seg", "w_blk", "tb",
                                             "interpret", "cap_words"))
def fused_seg_merge(buf: jnp.ndarray, bits: jnp.ndarray, n_seg: int,
                    w_blk: int, tb: int = TB, interpret: bool = False,
                    cap_words: int | None = None
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """buf [n_blocks, w_blk] u32 + bits [n_blocks] -> (seg_words, seg_bits).

    n_blocks must be n_seg * blocks_per_segment (scan order). Returns
    seg_words [n_seg, min(w_seg, cap-ish)] with w_seg = spb * w_blk + 2 —
    same layout and bit-identical content (within each segment's used
    words) as ops.pack.segments_from_blocks.

    cap_words bounds the OUTPUT allocation at the caller's capacity tier
    instead of the per-segment worst case. The worst-case buffer is ~8x
    the tight Q75 capacity at 1080p DRI0, and merely consuming any part
    of the oversized output forced its full ~1.5 MB/frame
    materialization at the ~3 GB/s relayout rate — 0.52 ms/frame, ~29%
    of the whole encode dispatch (measured r5; docs/PERFORMANCE.md).
    Content exceeding the cap writes clamped in-bounds garbage; callers
    already discard such results via the capacity check on seg_bits
    (retry at a bigger tier), and non-overflowing content never reaches
    the clamp.
    """
    n_blocks = buf.shape[0]
    spb = n_blocks // n_seg
    w1 = w_blk + 1
    w_seg = spb * w_blk + 2

    # A block overflowing w_blk*32 bits would push later offsets past the
    # span the kernel's indexing assumes (Mosaic does not bounds-check — an
    # overflow could corrupt scratch before the host ever sees the ovf
    # flag). Clamp per-block lengths for the offset math: outputs are
    # discarded whenever ovf is set, so clamping never changes valid results.
    bits = jnp.minimum(bits, w_blk * 32)

    # --- XLA prologue: bit offsets only (tiny [n_blocks] vectors; the
    # funnel-shifted form is built in-kernel)
    b2 = bits.reshape(n_seg, spb)
    csum = jnp.cumsum(b2, axis=1)
    seg_bits = csum[:, -1]
    off = (csum - b2).reshape(-1)
    w0 = (off >> 5).astype(_I32)
    ri = (off & 31).astype(_I32)

    # --- tile padding per segment: pad spb up to tiles_per_seg * tb with
    # empty blocks pinned at the segment's last offset (zero contributions)
    tiles_per_seg = -(-spb // tb)
    pad = tiles_per_seg * tb - spb
    if pad:
        buf = jnp.pad(buf.reshape(n_seg, spb, w_blk),
                      ((0, 0), (0, pad), (0, 0))).reshape(-1, w_blk)
        w0_r = w0.reshape(n_seg, spb)
        w0_r = jnp.concatenate(
            [w0_r, jnp.repeat(w0_r[:, -1:], pad, axis=1)], axis=1)
        w0 = w0_r.reshape(-1)
        ri = jnp.pad(ri.reshape(n_seg, spb), ((0, 0), (0, pad))).reshape(-1)

    n_tiles = n_seg * tiles_per_seg
    bases = w0.reshape(n_tiles, tb)[:, 0]
    bases = jnp.concatenate([bases, bases[-1:]])   # sentinel for last carry

    # span covers 128-alignment slack + the tile's blocks + one spill window
    span = -(-(128 + tb * w_blk + w1) // 128) * 128
    rows = -(-(w_seg + span + 256) // 128)
    if cap_words is not None:
        rows = min(rows, -(-(cap_words + span + 256) // 128))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_seg, tiles_per_seg),
        in_specs=[
            pl.BlockSpec((tb, w_blk),
                         lambda s, t, bases: (s * tiles_per_seg + t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1),
                         lambda s, t, bases: (s * tiles_per_seg + t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1),
                         lambda s, t, bases: (s * tiles_per_seg + t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((span // 128 + 2, 128), _I32),   # acc (+2 pad chunks)
            pltpu.VMEM((2, 128), _I32),                 # carry (2 chunks)
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, w_blk=w_blk, span=span,
                          tiles_per_seg=tiles_per_seg, out_rows=rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_seg, rows, 128), _I32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(bases,
      jax.lax.bitcast_convert_type(buf, _I32),
      w0.reshape(-1, 1),
      ri.reshape(-1, 1))
    flat = out.reshape(n_seg, rows * 128)[:, :min(w_seg, rows * 128)]
    return jax.lax.bitcast_convert_type(flat, _U32), seg_bits
