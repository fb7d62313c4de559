"""M0 gate: NumPy reference encoder vs the Pillow/libjpeg-turbo oracle.

Covers SURVEY.md section 5 levels 1 (constants), 3 (structural conformance,
headers byte-identical to Pillow at Q=50/75/90), and 5 (differential decode).
"""
import io

import numpy as np
import pytest
from PIL import Image

from jpgenc_tpu import tables as T
from jpgenc_tpu.ref import encoder as ref
from jpgenc_tpu.utils.metrics import psnr


def pillow_bytes(img: np.ndarray, **kw) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", **kw)
    return buf.getvalue()


def split_at_scan(jpeg: bytes) -> tuple[bytes, bytes]:
    """(headers incl. SOS segment, rest)."""
    i = jpeg.find(b"\xff\xda")
    assert i > 0
    seg_len = int.from_bytes(jpeg[i + 2:i + 4], "big")
    cut = i + 2 + seg_len
    return jpeg[:cut], jpeg[cut:]


# --- level 1: constants ----------------------------------------------------

def test_zigzag_involution():
    assert np.array_equal(T.ZIGZAG[T.INV_ZIGZAG], np.arange(64))
    assert np.array_equal(T.INV_ZIGZAG[T.ZIGZAG], np.arange(64))


@pytest.mark.parametrize("q", [10, 25, 50, 75, 90, 95])
def test_qtable_scaling_matches_pillow(q, gray_image):
    data = pillow_bytes(gray_image, quality=q)
    pil = Image.open(io.BytesIO(data))
    # Pillow's .quantization is in NATURAL order (SURVEY.md A.2)
    ours = T.scale_qtable(T.QTABLE_LUMA, q)
    assert np.array_equal(np.array(pil.quantization[0]), ours)


def test_q50_identity():
    assert np.array_equal(T.scale_qtable(T.QTABLE_LUMA, 50), T.QTABLE_LUMA)


def test_q75_first_row():
    assert list(T.scale_qtable(T.QTABLE_LUMA, 75)[:8]) == [8, 6, 5, 8, 12, 20, 26, 31]


# --- level 3: structural conformance (headers byte-identical to Pillow) -----

@pytest.mark.parametrize("q", [50, 75, 90])
def test_gray_headers_byte_identical(q, gray_image):
    ours = ref.encode(gray_image, quality=q)
    theirs = pillow_bytes(gray_image, quality=q)
    h_ours, _ = split_at_scan(ours)
    h_theirs, _ = split_at_scan(theirs)
    assert h_ours == h_theirs


@pytest.mark.parametrize("q", [50, 75, 90])
def test_color_headers_byte_identical(q, rgb_image):
    ours = ref.encode(rgb_image, quality=q, subsampling="420")
    theirs = pillow_bytes(rgb_image, quality=q, subsampling=2)
    h_ours, _ = split_at_scan(ours)
    h_theirs, _ = split_at_scan(theirs)
    assert h_ours == h_theirs


@pytest.mark.parametrize("sub,pil_sub", [("444", 0), ("422", 1)])
def test_other_subsampling_headers(sub, pil_sub, rgb_image):
    ours = ref.encode(rgb_image, quality=75, subsampling=sub)
    theirs = pillow_bytes(rgb_image, quality=75, subsampling=pil_sub)
    h_ours, _ = split_at_scan(ours)
    h_theirs, _ = split_at_scan(theirs)
    assert h_ours == h_theirs


# --- level 5: differential decode -------------------------------------------

@pytest.mark.parametrize("q", [10, 50, 75, 90, 95])
def test_gray_decodes_with_good_psnr(q, gray_image):
    ours = ref.encode(gray_image, quality=q)
    dec = np.asarray(Image.open(io.BytesIO(ours)))
    assert dec.shape == gray_image.shape
    p_ours = psnr(dec, gray_image)
    theirs = pillow_bytes(gray_image, quality=q)
    p_pil = psnr(np.asarray(Image.open(io.BytesIO(theirs))), gray_image)
    # ours must be within 1 dB of libjpeg at the same Q (float DCT vs islow)
    assert p_ours > p_pil - 1.0, (p_ours, p_pil)


@pytest.mark.parametrize("sub,pil_sub", [("420", 2), ("422", 1), ("444", 0)])
def test_color_decodes_with_good_psnr(sub, pil_sub, rgb_image):
    ours = ref.encode(rgb_image, quality=75, subsampling=sub)
    dec = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
    assert dec.shape == rgb_image.shape
    theirs = pillow_bytes(rgb_image, quality=75, subsampling=pil_sub)
    p_pil = psnr(np.asarray(Image.open(io.BytesIO(theirs)).convert("RGB")), rgb_image)
    # within 1 dB of libjpeg at identical settings (BASELINE.json:2 quality gate)
    assert psnr(dec, rgb_image) > p_pil - 1.0


def test_opencv_decodes_our_file(rgb_image):
    cv2 = pytest.importorskip("cv2")
    ours = ref.encode(rgb_image, quality=75)
    dec = cv2.imdecode(np.frombuffer(ours, np.uint8), cv2.IMREAD_COLOR)
    assert dec is not None and dec.shape == rgb_image.shape
    assert psnr(dec[..., ::-1], rgb_image) > 25.0  # second independent decode oracle


# --- restart intervals -------------------------------------------------------

def test_restart_markers_present_and_decodable(gray_image):
    ours = ref.encode(gray_image, quality=75, restart_interval=4)
    _, scan = split_at_scan(ours)
    # DRI segment present
    assert b"\xff\xdd\x00\x04\x00\x04" in ours
    # RST markers cycle 0..7
    body = scan[:-2]  # drop EOI
    rsts = []
    i = 0
    while i < len(body) - 1:
        if body[i] == 0xFF and 0xD0 <= body[i + 1] <= 0xD7:
            rsts.append(body[i + 1] - 0xD0)
            i += 2
        else:
            i += 1
    n_mcus = (128 // 8) * (128 // 8)
    assert len(rsts) == (n_mcus - 1) // 4
    assert rsts[:10] == [i % 8 for i in range(10)]
    dec = np.asarray(Image.open(io.BytesIO(ours)))
    base = np.asarray(Image.open(io.BytesIO(ref.encode(gray_image, quality=75))))
    # restart vs non-restart encode must decode to identical pixels
    assert np.array_equal(dec, base)


def test_restart_color(rgb_image):
    ours = ref.encode(rgb_image, quality=75, restart_interval=3)
    dec = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
    base = np.asarray(Image.open(io.BytesIO(ref.encode(rgb_image, quality=75))).convert("RGB"))
    assert np.array_equal(dec, base)


# --- optimized Huffman --------------------------------------------------------

def test_optimized_huffman_decodes_identical_and_smaller(gray_image):
    base = ref.encode(gray_image, quality=75)
    opt = ref.encode(gray_image, quality=75, optimize=True)
    assert len(opt) < len(base)
    a = np.asarray(Image.open(io.BytesIO(base)))
    b = np.asarray(Image.open(io.BytesIO(opt)))
    assert np.array_equal(a, b)


def test_optimized_huffman_color(rgb_image):
    base = ref.encode(rgb_image, quality=75)
    opt = ref.encode(rgb_image, quality=75, optimize=True)
    assert len(opt) < len(base)
    a = np.asarray(Image.open(io.BytesIO(base)).convert("RGB"))
    b = np.asarray(Image.open(io.BytesIO(opt)).convert("RGB"))
    assert np.array_equal(a, b)
