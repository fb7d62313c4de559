"""Device color conversion + chroma sampling (SURVEY.md components #4, #5, layer B).

Full-range BT.601 (JFIF 1.02) in float32; box-mean subsampling. These are pure
jnp ops: XLA fuses them into the downstream DCT pipeline (SURVEY.md section 8).
Numerics are frozen to match `jpgenc_tpu.ref.encoder` exactly (same constants,
same float32 order of operations).
"""
from __future__ import annotations

import jax.numpy as jnp

_F = jnp.float32


def rgb_to_ycbcr(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] uint8 -> [..., 3] float32 YCbCr (Cb/Cr offset +128)."""
    r = rgb[..., 0].astype(_F)
    g = rgb[..., 1].astype(_F)
    b = rgb[..., 2].astype(_F)
    y = _F(0.299) * r + _F(0.587) * g + _F(0.114) * b
    cb = _F(-0.168735892) * r + _F(-0.331264108) * g + _F(0.5) * b + _F(128.0)
    cr = _F(0.5) * r + _F(-0.418687589) * g + _F(-0.081312411) * b + _F(128.0)
    return jnp.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] float32 YCbCr -> float32 RGB (unclipped)."""
    y = ycc[..., 0]
    cb = ycc[..., 1] - _F(128.0)
    cr = ycc[..., 2] - _F(128.0)
    r = y + _F(1.402) * cr
    g = y - _F(0.344136286) * cb - _F(0.714136286) * cr
    b = y + _F(1.772) * cb
    return jnp.stack([r, g, b], axis=-1)


def subsample(plane: jnp.ndarray, hs: int, vs: int) -> jnp.ndarray:
    """Box-mean subsample a [H, W] float32 plane by (vs, hs)."""
    if hs == 1 and vs == 1:
        return plane
    h, w = plane.shape
    p = plane.reshape(h // vs, vs, w // hs, hs)
    return jnp.mean(p, axis=(1, 3), dtype=_F)


def upsample(plane: jnp.ndarray, hs: int, vs: int) -> jnp.ndarray:
    """Nearest-neighbour (replication) upsample, decoder side."""
    if hs == 1 and vs == 1:
        return plane
    return jnp.repeat(jnp.repeat(plane, vs, axis=0), hs, axis=1)


def _upsample2_axis(plane: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Centered 2x upsample along one axis with a 3:1 triangle filter —
    the filter libjpeg calls "fancy" upsampling (JFIF centered chroma
    siting): out[2i] = (3*c[i] + c[i-1])/4, out[2i+1] = (3*c[i] + c[i+1])/4,
    edges replicated."""
    x = jnp.moveaxis(plane, axis, 0)
    prev = jnp.concatenate([x[:1], x[:-1]], axis=0)
    nxt = jnp.concatenate([x[1:], x[-1:]], axis=0)
    even = _F(0.75) * x + _F(0.25) * prev
    odd = _F(0.75) * x + _F(0.25) * nxt
    out = jnp.stack([even, odd], axis=1).reshape((-1,) + x.shape[1:])
    return jnp.moveaxis(out, 0, axis)


def upsample_fancy(plane: jnp.ndarray, hs: int, vs: int) -> jnp.ndarray:
    """Triangle-filter upsample matching libjpeg's default reconstruction;
    factors other than 2 fall back to replication."""
    out = plane
    if vs == 2:
        out = _upsample2_axis(out, 0)
    elif vs != 1:
        out = jnp.repeat(out, vs, axis=0)
    if hs == 2:
        out = _upsample2_axis(out, 1)
    elif hs != 1:
        out = jnp.repeat(out, hs, axis=1)
    return out


def pad_replicate(img: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """Replicate-pad [H, W] or [H, W, C] to (ph, pw) (SURVEY.md component #6)."""
    h, w = img.shape[0], img.shape[1]
    pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (img.ndim - 2)
    return jnp.pad(img, pad, mode="edge")
