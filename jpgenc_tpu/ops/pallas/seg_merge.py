"""Pallas TPU kernel: per-block buffers -> per-segment bitstreams (kernel B).

Replaces ops.pack.segments_from_blocks' 25-tap scatter (the largest remaining
XLA stage) with a sequential-grid merge: the TPU grid iterates
(segment, tile-of-blocks) in order, each step accumulates its blocks'
pre-shifted words into a VMEM span buffer at dynamic sublane offsets, chains
the boundary words to the next tile through a carry scratch (the grid is
sequential on TPU, so scratch persists), and DMAs the span to its dynamic
word offset inside the segment row.

Correctness protocol for the fixed-size span writes: tile t writes
[base_t, base_t + SPAN); a later tile's write only overlaps where it carries
t's boundary content (<= CARRY words past base_{t+1}, since one block spans
at most w_blk+1 words), so every word's final value is correct. The segment
row is padded by SPAN so the static-length DMA never runs out of range.

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

TB = 256            # blocks per grid step
CARRY = 64          # words handed to the next tile (>= w_blk + 1)


def _kernel(bases_ref,                     # scalar prefetch: [n_tiles+1] i32
            sh_ref, w0_ref,                # [TB*W1, 1] i32, [TB, 1] i32
            out_ref,                       # HBM [n_seg, w_seg_pad] i32
            acc, carry, sem,               # scratch
            *, w1: int, span: int, tiles_per_seg: int):
    seg = pl.program_id(0)
    tile = pl.program_id(1)
    gtile = seg * tiles_per_seg + tile
    base = bases_ref[gtile]
    base_next = bases_ref[gtile + 1]

    acc[:] = jnp.zeros_like(acc)

    @pl.when(tile != 0)
    def _():                               # boundary words from previous tile
        acc[0:CARRY] = carry[:]

    def body(b, _):
        d = w0_ref[b, 0] - base
        acc[pl.ds(d, w1), :] += sh_ref[pl.ds(b * w1, w1), :]
        return 0

    jax.lax.fori_loop(0, TB, body, 0)

    # hand the words at/after the next tile's base onward
    carry[:] = acc[pl.ds(base_next - base, CARRY), :]

    copy = pltpu.make_async_copy(
        acc, out_ref.at[seg, pl.ds(base, span), :], sem)
    copy.start()
    copy.wait()


@functools.partial(jax.jit, static_argnames=("n_seg", "w_blk", "interpret"))
def fused_seg_merge(buf: jnp.ndarray, bits: jnp.ndarray, n_seg: int,
                    w_blk: int, interpret: bool = False
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """buf [n_blocks, w_blk] u32 + bits [n_blocks] -> (seg_words, seg_bits).

    n_blocks must be n_seg * blocks_per_segment (scan order). Returns
    seg_words [n_seg, w_seg] with w_seg = spb * w_blk + 2 — the same layout
    and bit-identical content as ops.pack.segments_from_blocks.
    """
    n_blocks = buf.shape[0]
    spb = n_blocks // n_seg
    w1 = w_blk + 1
    w_seg = spb * w_blk + 2

    # --- XLA prologue: offsets + per-block funnel shift (elementwise)
    b2 = bits.reshape(n_seg, spb)
    csum = jnp.cumsum(b2, axis=1)
    seg_bits = csum[:, -1]
    off = (csum - b2).reshape(-1)
    w0 = (off >> 5).astype(_I32)

    from jpgenc_tpu.ops.pack import _shift_into_word
    ri = (off & 31).astype(_I32)[:, None]
    prev = jnp.concatenate([jnp.zeros((n_blocks, 1), _U32), buf[:, :-1]], axis=1)
    lo = jnp.concatenate([buf, jnp.zeros((n_blocks, 1), _U32)], axis=1)
    hi = jnp.concatenate([prev, buf[:, -1:]], axis=1)
    sh = _shift_into_word(lo, -ri) | _shift_into_word(hi, 32 - ri)

    # --- tile padding per segment: pad spb up to tiles_per_seg * TB with
    # empty blocks pinned at the segment's last offset (zero contributions)
    tiles_per_seg = -(-spb // TB)
    spb_pad = tiles_per_seg * TB
    pad = spb_pad - spb
    if pad:
        sh_r = sh.reshape(n_seg, spb, w1)
        w0_r = w0.reshape(n_seg, spb)
        sh_r = jnp.pad(sh_r, ((0, 0), (0, pad), (0, 0)))
        w0_r = jnp.concatenate(
            [w0_r, jnp.repeat(w0_r[:, -1:], pad, axis=1)], axis=1)
        sh = sh_r.reshape(-1, w1)
        w0 = w0_r.reshape(-1)

    n_tiles = n_seg * tiles_per_seg
    # per-tile base word offsets (+ sentinel so the last tile's carry slice
    # stays in range; its value is never used)
    bases = w0.reshape(n_tiles, TB)[:, 0]
    bases = jnp.concatenate([bases, bases[-1:]])

    span = TB * w_blk + CARRY + 8
    w_seg_pad = w_seg + span

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
            pltpu.VMEM((span, 1), _I32),
            pltpu.VMEM((CARRY, 1), _I32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, w1=w1, span=span,
                          tiles_per_seg=tiles_per_seg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_seg, w_seg_pad, 1), _I32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(bases,
      jax.lax.bitcast_convert_type(sh, _I32).reshape(-1, 1),
      w0.reshape(-1, 1))
    seg_words = jax.lax.bitcast_convert_type(out[:, :w_seg, 0], _U32)
    return seg_words, seg_bits
