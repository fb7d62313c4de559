"""Pallas TPU kernel: per-block buffers -> per-segment bitstreams (kernel B).

Replaces ops.pack.segments_from_blocks' 25-tap scatter (the largest remaining
XLA stage) with a sequential-grid merge: the TPU grid iterates
(segment, tile-of-blocks) in order; each step accumulates its blocks'
pre-shifted words into a VMEM span buffer at dynamic sublane offsets, chains
boundary words to the next tile through carry scratch (the TPU grid is
sequential, so scratch persists across steps), reshapes the span to lane-major
and DMAs it to its 128-aligned word offset inside the segment row.

Correctness protocol for the fixed-size span writes: tile t covers rows
[base_al_t/128, +R); a later tile's write only overlaps where it carries t's
boundary content (one block spans at most w_blk+1 words past the next tile's
base, and the carry window covers 128-alignment slack + that), so every
word's final value is correct. Words past each segment's content are left
uninitialized — nothing downstream reads them (stuff_compact masks by
seg_bits).

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

TB = 64             # blocks per grid step (word-per-sublane buffers are
                    # lane-padded by Mosaic, so VMEM budget caps the tile)
CARRY = 256         # words handed to the next tile (>= 128 align slack + w_blk+1)


def _kernel(bases_ref,                     # scalar prefetch: [n_tiles+1] i32
            sh_ref, w0_ref,                # [TB*W1, 1] i32, [TB, 1] i32
            out_ref,                       # HBM [n_seg, rows, 128] i32
            acc, acc2, carry, sem,         # scratch
            *, w1: int, span_al: int, tiles_per_seg: int):
    seg = pl.program_id(0)
    tile = pl.program_id(1)
    gtile = seg * tiles_per_seg + tile
    base = bases_ref[gtile]
    base_al = (base >> 7) << 7
    base_next_al = (bases_ref[gtile + 1] >> 7) << 7

    acc[:] = jnp.zeros_like(acc)

    @pl.when(tile != 0)
    def _():                               # boundary words from previous tile
        acc[0:CARRY] = carry[:]

    def body(b, _):
        d = w0_ref[b, 0] - base_al
        acc[pl.ds(d, w1), :] += sh_ref[pl.ds(b * w1, w1), :]
        return 0

    jax.lax.fori_loop(0, TB, body, 0)

    # hand everything at/after the next tile's aligned base onward. At a
    # segment's last tile the next base resets to a smaller offset (next
    # segment starts at word 0), which would make the slice start negative —
    # clamp it; the next tile ignores the carry anyway (tile == 0).
    delta = jnp.maximum(base_next_al - base_al, 0)
    carry[:] = acc[pl.ds(delta, CARRY), :]

    acc2[:] = acc[:].reshape(span_al // 128, 128)
    copy = pltpu.make_async_copy(
        acc2, out_ref.at[seg, pl.ds(base_al >> 7, span_al // 128), :], sem)
    copy.start()
    copy.wait()


@functools.partial(jax.jit, static_argnames=("n_seg", "w_blk", "interpret"))
def fused_seg_merge(buf: jnp.ndarray, bits: jnp.ndarray, n_seg: int,
                    w_blk: int, interpret: bool = False
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """buf [n_blocks, w_blk] u32 + bits [n_blocks] -> (seg_words, seg_bits).

    n_blocks must be n_seg * blocks_per_segment (scan order). Returns
    seg_words [n_seg, w_seg] with w_seg = spb * w_blk + 2 — same layout and
    bit-identical content (within each segment's used words) as
    ops.pack.segments_from_blocks.
    """
    from jpgenc_tpu.ops.pack import _shift_into_word

    n_blocks = buf.shape[0]
    spb = n_blocks // n_seg
    w1 = w_blk + 1
    w_seg = spb * w_blk + 2

    # A block overflowing w_blk*32 bits would push later offsets past the
    # span the kernel's dynamic slices assume (Mosaic does not bounds-check —
    # an overflow could fault or corrupt scratch before the host ever sees
    # the ovf flag). Clamp per-block lengths for the offset math: outputs are
    # discarded whenever ovf is set, so clamping never changes valid results.
    bits = jnp.minimum(bits, w_blk * 32)

    # --- XLA prologue: offsets + per-block funnel shift (elementwise)
    b2 = bits.reshape(n_seg, spb)
    csum = jnp.cumsum(b2, axis=1)
    seg_bits = csum[:, -1]
    off = (csum - b2).reshape(-1)
    w0 = (off >> 5).astype(_I32)
    ri = (off & 31).astype(_I32)[:, None]
    prev = jnp.concatenate([jnp.zeros((n_blocks, 1), _U32), buf[:, :-1]], axis=1)
    lo = jnp.concatenate([buf, jnp.zeros((n_blocks, 1), _U32)], axis=1)
    hi = jnp.concatenate([prev, buf[:, -1:]], axis=1)
    sh = _shift_into_word(lo, -ri) | _shift_into_word(hi, 32 - ri)

    # --- tile padding per segment: pad spb up to tiles_per_seg * TB with
    # empty blocks pinned at the segment's last offset (zero contributions)
    tiles_per_seg = -(-spb // TB)
    pad = tiles_per_seg * TB - spb
    if pad:
        sh_r = jnp.pad(sh.reshape(n_seg, spb, w1), ((0, 0), (0, pad), (0, 0)))
        w0_r = w0.reshape(n_seg, spb)
        w0_r = jnp.concatenate(
            [w0_r, jnp.repeat(w0_r[:, -1:], pad, axis=1)], axis=1)
        sh = sh_r.reshape(-1, w1)
        w0 = w0_r.reshape(-1)

    n_tiles = n_seg * tiles_per_seg
    bases = w0.reshape(n_tiles, TB)[:, 0]
    bases = jnp.concatenate([bases, bases[-1:]])   # sentinel for last carry

    span_al = -(-(TB * w_blk + CARRY + 256) // 128) * 128
    rows = -(-(w_seg + span_al + 256) // 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_seg, tiles_per_seg),
        in_specs=[
            pl.BlockSpec((TB * w1, 1),
                         lambda s, t, bases: (s * tiles_per_seg + t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1),
                         lambda s, t, bases: (s * tiles_per_seg + t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((span_al, 1), _I32),
            pltpu.VMEM((span_al // 128, 128), _I32),
            pltpu.VMEM((CARRY, 1), _I32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, w1=w1, span_al=span_al,
                          tiles_per_seg=tiles_per_seg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_seg, rows, 128), _I32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(bases,
      jax.lax.bitcast_convert_type(sh, _I32).reshape(-1, 1),
      w0.reshape(-1, 1))
    flat = out.reshape(n_seg, rows * 128)[:, :w_seg]
    return jax.lax.bitcast_convert_type(flat, _U32), seg_bits
