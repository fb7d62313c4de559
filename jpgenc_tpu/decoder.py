"""Decoder (SURVEY.md components #19-#21, call stack 4.4).

Host side: marker parse + sequential Huffman scan decode (inherently serial —
T.81 section F.2.2) producing the exact quantized zigzag coefficient tensor the
encoder emitted. Device side: dezigzag, dequantize, IDCT, upsample, YCbCr->RGB.

The core invariant (BASELINE.json:5): decode_to_coefficients(encode(img))
is bit-identical to the encoder's quantized coefficients at matched tables.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from jpgenc_tpu import native
from jpgenc_tpu import tables as T
from jpgenc_tpu.container.parser import ParsedJpeg, parse_jpeg
from jpgenc_tpu.huffman import HuffTable
from jpgenc_tpu.layout import FrameLayout, make_layout
from jpgenc_tpu.ops import color as C
from jpgenc_tpu.ops import transform as X
from jpgenc_tpu.ref.bitio import unstuff_bytes


class _BitReader:
    """MSB-first bit reader over unstuffed entropy bytes."""

    __slots__ = ("bits", "pos", "n")

    def __init__(self, data: np.ndarray):
        self.bits = np.unpackbits(data)
        self.pos = 0
        self.n = self.bits.size

    def read_bit(self) -> int:
        if self.pos >= self.n:
            raise ValueError("bitstream exhausted")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.n:
            raise ValueError("bitstream exhausted")
        v = 0
        for b in self.bits[self.pos:self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v


def _decode_lut(tbl: HuffTable) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    out = {}
    for sym in range(256):
        l = int(tbl.length[sym])
        if l:
            out[(l, int(tbl.code[sym]))] = sym
    return out


def _read_symbol(br: _BitReader, lut: dict[tuple[int, int], int]) -> int:
    code = 0
    for l in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = lut.get((l, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: amplitude bits -> signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_scan_to_blocks(parsed: ParsedJpeg, layout: FrameLayout) -> np.ndarray:
    """Entropy-decode the scan into the concatenated [n_total, 64] block array.

    Uses the native C++ decoder (jpgenc_tpu.native) when available; the pure
    Python reader below is the reference fallback and stays test-covered.
    """
    if native.available():
        def by_id(d):
            return [d[i] for i in sorted(d)] or [None]
        out = native.decode_scan(
            parsed.scan_data, layout,
            [c.dc_tab for c in layout.comps], [c.ac_tab for c in layout.comps],
            by_id(parsed.dc_tables), by_id(parsed.ac_tables))
        if out is not None:
            return out
    dc_luts = {i: _decode_lut(t) for i, t in parsed.dc_tables.items()}
    ac_luts = {i: _decode_lut(t) for i, t in parsed.ac_tables.items()}

    # split at RST markers (they are never stuffed, so a raw byte scan is safe)
    segs: list[bytes] = []
    data = parsed.scan_data
    start = 0
    i = 0
    while i < len(data) - 1:
        if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7:
            segs.append(data[start:i])
            start = i + 2
            i += 2
        else:
            i += 1
    segs.append(data[start:])
    if len(segs) != layout.n_segments:
        raise ValueError(f"expected {layout.n_segments} restart segments, found {len(segs)}")

    n_total = sum(c.n_blocks for c in layout.comps)
    out = np.zeros((n_total, 64), dtype=np.int32)

    spb = layout.blocks_per_segment
    for s, seg in enumerate(segs):
        br = _BitReader(unstuff_bytes(seg))
        pred = [0] * len(layout.comps)
        j0 = s * spb
        j1 = min(j0 + spb, layout.n_scan)
        for j in range(j0, j1):
            ci = int(layout.scan_comp[j])
            comp = layout.comps[ci]
            blk = out[layout.scan_flat[j]]
            ssss = _read_symbol(br, dc_luts[comp.dc_tab])
            diff = _extend(br.read_bits(ssss), ssss)
            pred[ci] += diff
            blk[0] = pred[ci]
            k = 1
            while k < 64:
                rs = _read_symbol(br, ac_luts[comp.ac_tab])
                r, sz = rs >> 4, rs & 15
                if sz == 0:
                    if rs == T.ZRL:
                        k += 16
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("run overflows block")
                blk[k] = _extend(br.read_bits(sz), sz)
                k += 1
    return out


def reconstruct_pixels(layout: FrameLayout, all_blocks: np.ndarray,
                       qtables: dict[int, np.ndarray]) -> np.ndarray:
    """Device reconstruction: blocks -> uint8 image, cropped to original size."""
    offs = layout.comp_offsets
    planes = []
    for ci, comp in enumerate(layout.comps):
        zz = jnp.asarray(all_blocks[offs[ci]:offs[ci] + comp.n_blocks])
        qt = jnp.asarray(qtables[comp.qtab])
        plane = X.zigzag_to_plane(zz, qt, comp.plane_h, comp.plane_w)
        planes.append(plane)
    if layout.is_gray:
        out = jnp.clip(jnp.round(planes[0]), 0, 255).astype(jnp.uint8)
        return np.asarray(out)[:layout.height, :layout.width]
    c0 = layout.comps[0]
    y = planes[0]
    cb = C.upsample_fancy(planes[1], c0.hs, c0.vs)
    cr = C.upsample_fancy(planes[2], c0.hs, c0.vs)
    ycc = jnp.stack([y, cb, cr], axis=-1)
    rgb = C.ycbcr_to_rgb(ycc)
    out = jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)
    return np.asarray(out)[:layout.height, :layout.width]


def layout_from_parsed(parsed: ParsedJpeg) -> FrameLayout:
    return make_layout(parsed.height, parsed.width, parsed.subsampling,
                       parsed.restart_interval)


def decode_to_coefficients(data: bytes) -> tuple[FrameLayout, np.ndarray, dict]:
    """JPEG bytes -> (layout, [n_total, 64] zigzag int32 blocks, qtables)."""
    parsed = parse_jpeg(data)
    layout = layout_from_parsed(parsed)
    blocks = decode_scan_to_blocks(parsed, layout)
    return layout, blocks, parsed.qtables


def decode(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 image ([H,W] grayscale or [H,W,3] RGB)."""
    layout, blocks, qtables = decode_to_coefficients(data)
    return reconstruct_pixels(layout, blocks, qtables)
