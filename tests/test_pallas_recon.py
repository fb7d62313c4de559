"""Fused Pallas decode-reconstruction kernel (ops/pallas/recon.py) vs the
jnp/XLA reconstruction path — interpret-mode parity (SURVEY.md component #21
TPU tier; the race-detection analog of section 6: interpreter vs reference).

The fused operator reassociates float32 math (upsample/color folded into the
IDCT matmul), so parity is bounded, not bit-exact: max |diff| <= 1 with a
tiny mismatch fraction (same discipline as the K1A encode kernel tests).
"""
import io

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

import jpgenc_tpu.decoder as D
from jpgenc_tpu import tables as T
from jpgenc_tpu.layout import make_layout
from jpgenc_tpu.ops.pallas.recon import (fused_recon_rgb, recon_applicable,
                                         words_to_rgb)


def _parity(out, ref, max_frac=1e-3):
    d = np.abs(np.asarray(out).astype(np.int64) -
               np.asarray(ref).astype(np.int64))
    assert out.shape == ref.shape
    assert d.max() <= 1, f"max diff {d.max()}"
    frac = (d > 0).sum() / d.size
    assert frac < max_frac, f"mismatch fraction {frac}"


@pytest.fixture(autouse=True)
def _restore_override():
    yield
    D._FUSED_OVERRIDE = None


@pytest.mark.parametrize("sub,h,w", [
    ("420", 32, 128), ("420", 61, 128), ("420", 257, 1920),
    ("420", 64, 130),                   # mcus_x = 9: unaligned width
    ("422", 16, 128), ("422", 47, 250), ("444", 100, 64),
])
def test_kernel_vs_pixel_fn(sub, h, w):
    """Raw kernel on random dense coefficient tensors vs decoder.pixel_fn."""
    lay = make_layout(h, w, sub)
    assert recon_applicable(lay)
    n_total = sum(c.n_blocks for c in lay.comps)
    rng = np.random.default_rng(__import__("zlib").crc32(f"{sub}-{h}-{w}".encode()))
    blocks = rng.integers(-30, 30, (n_total, 64)).astype(np.int32)
    qts = [np.clip(rng.integers(1, 40, 64), 1, 255).astype(np.int32)
           for _ in lay.comps]

    ref = np.asarray(D.pixel_fn(lay)(jnp.asarray(blocks),
                                     [jnp.asarray(q) for q in qts]))
    c0 = lay.comps[0]
    nb = c0.hs * c0.vs
    L = (nb + 2) * 64
    zz = np.asarray(T.ZIGZAG)
    x4 = blocks[np.asarray(lay.scan_flat)].astype(np.int16).reshape(
        1, lay.mcus_y, lay.mcus_x, L)
    q_row = np.concatenate(
        [np.tile(qts[0].astype(np.float32)[zz], nb),
         qts[1].astype(np.float32)[zz],
         qts[2].astype(np.float32)[zz]]).reshape(1, L)
    out = np.asarray(fused_recon_rgb(jnp.asarray(x4), jnp.asarray(q_row),
                                     lay, interpret=True))[0]
    _parity(out, ref)


def test_recon_applicable_gate():
    assert recon_applicable(make_layout(64, 64, "gray"))
    # any width: recon blocks' last-two dims equal the array dims, so
    # Mosaic's tiling rule holds without the k1a-style mcus_x % 8 gate
    # (hardware-verified at mcus_x=252)
    assert recon_applicable(make_layout(64, 130, "420"))
    assert recon_applicable(make_layout(3024, 4032, "420"))
    assert recon_applicable(make_layout(64, 72, "gray"))
    # rare decode-side samplings stay on the XLA path
    assert not recon_applicable(make_layout(64, 96, "411"))


def _pillow_jpeg(img, q, subsampling, **kw):
    buf = io.BytesIO()
    if subsampling is not None:
        kw["subsampling"] = subsampling
    Image.fromarray(img).save(buf, "JPEG", quality=q, **kw)
    return buf.getvalue()


@pytest.mark.parametrize("sub,q,h,w", [
    (2, 75, 120, 128), (2, 50, 61, 128), (1, 90, 64, 128), (0, 35, 48, 128),
    (2, 92, 80, 250),          # width not MCU-aligned: lane crop path
    (2, 75, 64, 130),          # mcus_x = 9: unaligned sublane dim
])
def test_decode_fused_vs_xla(rng, sub, q, h, w):
    img = np.clip(rng.normal(128, 50, (h, w, 3)), 0, 255).astype(np.uint8)
    data = _pillow_jpeg(img, q, sub)
    D._FUSED_OVERRIDE = False
    ref = D.decode(data)
    D._FUSED_OVERRIDE = "interpret"
    out = D.decode(data)
    _parity(out, ref)


def test_decode_fused_exceptions_and_dri(rng):
    """High-contrast content at high quality produces |coef| > 127 escape
    entries in the packed stream; DRI exercises multi-segment scans."""
    img = (rng.integers(0, 2, (96, 128, 3)) * 255).astype(np.uint8)
    data = _pillow_jpeg(img, 95, 2, restart_marker_blocks=2)
    from jpgenc_tpu.container.parser import parse_jpeg
    parsed = parse_jpeg(data)
    lay = D.layout_from_parsed(parsed)
    pk = D.scan_packed(parsed, lay)
    if pk is not None:
        assert pk[1].size > 0, "expected escape exceptions in this fixture"
    D._FUSED_OVERRIDE = False
    ref = D.decode(data)
    D._FUSED_OVERRIDE = "interpret"
    out = D.decode(data)
    _parity(out, ref)


def test_decode_batch_fused_vs_xla(rng):
    imgs = [np.clip(rng.normal(128, 45, (61, 128, 3)), 0, 255).astype(np.uint8)
            for _ in range(5)]
    datas = [_pillow_jpeg(im, 75, 2) for im in imgs]
    D._FUSED_OVERRIDE = False
    refs = D.decode_batch(datas)
    D._FUSED_OVERRIDE = "interpret"
    outs = D.decode_batch(datas, chunk=2)
    for a, b in zip(outs, refs):
        _parity(a, b)


def test_words_to_rgb_crop():
    """words_to_rgb crops the padded width and keeps the natural layout."""
    lay = make_layout(16, 250, "422")
    words = jnp.zeros((2, 16, lay.mcus_x, 12), jnp.int32)
    out = words_to_rgb(words, lay)
    assert out.shape == (2, 16, 250, 3)


def test_mesh_decode_fused_vs_xla(rng):
    """Sharded decode_batch with the fused kernel (vmapped pallas_call over
    the batch axis) matches the XLA form on the 8-device CPU mesh."""
    from jpgenc_tpu.parallel import mesh as M
    imgs = [np.clip(rng.normal(128, 45, (61, 128, 3)), 0, 255)
            .astype(np.uint8) for _ in range(4)]
    datas = [_pillow_jpeg(im, 75, 2) for im in imgs]
    D._FUSED_OVERRIDE = False
    refs = M.decode_batch(datas, to_device=False)
    D._FUSED_OVERRIDE = "interpret"
    outs = M.decode_batch(datas, to_device=False)
    for a, b in zip(outs, refs):
        _parity(a, b)


@pytest.mark.parametrize("h,w", [(64, 64), (61, 128), (512, 512)])
def test_gray_kernel_vs_pixel_fn(h, w):
    """Gray variant (single dequant+IDCT block per grid cell)."""
    lay = make_layout(h, w, "gray")
    assert recon_applicable(lay)
    n_total = lay.comps[0].n_blocks
    rng = np.random.default_rng(h * 1000 + w)
    blocks = rng.integers(-60, 60, (n_total, 64)).astype(np.int32)
    qts = [np.clip(rng.integers(1, 40, 64), 1, 255).astype(np.int32)]
    ref = np.asarray(D.pixel_fn(lay)(jnp.asarray(blocks),
                                     [jnp.asarray(qts[0])]))
    x4 = blocks[np.asarray(lay.scan_flat)].astype(np.int16).reshape(
        1, lay.mcus_y, lay.mcus_x, 64)
    zz = np.asarray(T.ZIGZAG)
    q_row = qts[0].astype(np.float32)[zz].reshape(1, 64)
    out = np.asarray(fused_recon_rgb(jnp.asarray(x4), jnp.asarray(q_row),
                                     lay, interpret=True))[0]
    _parity(out, ref)


def test_decode_gray_fused_vs_xla(rng):
    img = np.clip(rng.normal(128, 50, (61, 128)), 0, 255).astype(np.uint8)
    data = _pillow_jpeg(img, 80, None)
    D._FUSED_OVERRIDE = False
    ref = D.decode(data)
    D._FUSED_OVERRIDE = "interpret"
    out = D.decode(data)
    _parity(out, ref)

    D._FUSED_OVERRIDE = False
    refs = D.decode_batch([data] * 3)
    D._FUSED_OVERRIDE = "interpret"
    outs = D.decode_batch([data] * 3, chunk=2)
    for a, b in zip(outs, refs):
        _parity(a, b)
