"""Device compact finalize (ops.pack.compact_unstuffed + engine.finalize_host)
vs the host reference path.

The production finalize — device emits a compact UNSTUFFED stream, host does
FF00 stuffing + RSTn joins (the one host pass the BASELINE.json:5 contract
keeps off-device) — must produce byte-identical scans to
engine.segments_to_scan for every config, and must flag capacity overflow
instead of emitting a truncated stream.
"""
import numpy as np
import pytest

from jpgenc_tpu.api import encode
from jpgenc_tpu.engine import (finalize_host, get_plan, luts_from_tables,
                               qtables_for_quality, scan_caps,
                               segments_to_scan)
from jpgenc_tpu.layout import make_layout
from jpgenc_tpu.ops.pack import compact_unstuffed
from jpgenc_tpu.ref.encoder import standard_tables


def _device_scan(layout, img, quality, first_rst=0, n_rst=None):
    plan = get_plan(layout)
    _, qt = qtables_for_quality(quality)
    dc_t, ac_t = standard_tables()
    luts = luts_from_tables(dc_t, ac_t)
    seg_w, seg_b = plan.encode_segments(img, qt, luts)
    cap_u = scan_caps(layout, quality)[0]
    if n_rst is None:
        n_rst = layout.n_segments - 1
    u, nbytes = compact_unstuffed(seg_w, seg_b, cap_u)
    u, nbytes = np.asarray(u), np.asarray(nbytes)
    assert int(nbytes.sum()) <= cap_u
    dev = finalize_host(u, nbytes, first_rst, n_rst)
    host = segments_to_scan(np.asarray(seg_w), np.asarray(seg_b),
                            first_rst=first_rst)
    return dev, host, (u, nbytes)


@pytest.mark.parametrize("restart", [0, 3, 7])
def test_compact_finalize_matches_host(gray_image, restart):
    layout = make_layout(*gray_image.shape, "gray", restart)
    dev, host, _ = _device_scan(layout, gray_image, 75)
    assert dev == host


@pytest.mark.parametrize("quality", [10, 75, 95])
def test_compact_finalize_color(rgb_image, quality):
    layout = make_layout(rgb_image.shape[0], rgb_image.shape[1], "420", 5)
    dev, host, _ = _device_scan(layout, rgb_image, quality)
    assert dev == host


def test_compact_finalize_stripe_numbering(gray_image):
    """first_rst offsets RSTn numbering; n_rst=n_seg adds the trailing RSTn."""
    layout = make_layout(*gray_image.shape, "gray", 4)
    n_seg = layout.n_segments
    dev, host, _ = _device_scan(layout, gray_image, 75, first_rst=5,
                                n_rst=n_seg)
    # host path emits no trailing RSTn: append it manually for comparison
    host += bytes([0xFF, 0xD0 + ((5 + n_seg - 1) % 8)])
    assert dev == host


def test_finalize_host_np_fallback_matches_native(gray_image, monkeypatch):
    """The NumPy fallback stuffing must equal the C++ finalize_compact."""
    from jpgenc_tpu import native
    if not native.available():
        pytest.skip("native tier unavailable")
    layout = make_layout(*gray_image.shape, "gray", 4)
    _, _, (u, nbytes) = _device_scan(layout, gray_image, 75)
    want = finalize_host(u, nbytes, 2, len(nbytes))
    monkeypatch.setattr(native, "available", lambda: False)
    got = finalize_host(u, nbytes, 2, len(nbytes))
    assert got == want


@pytest.mark.parametrize("mode,restart", [("gray", 0), ("gray", 3),
                                          ("420", 0), ("420", 5)])
def test_wcompact_matches_byte_compact(gray_image, rgb_image, mode, restart):
    """The word-granular device finalize (production path) must produce the
    same final scan as the byte-granular one for every segment config."""
    from jpgenc_tpu.engine import finalize_host_w
    from jpgenc_tpu.ops.pack import wcompact_unstuffed
    img = gray_image if mode == "gray" else rgb_image
    layout = make_layout(img.shape[0], img.shape[1], mode, restart)
    plan = get_plan(layout)
    _, qt = qtables_for_quality(75)
    luts = luts_from_tables(*standard_tables())
    seg_w, seg_b = plan.encode_segments(img, qt, luts)
    cap_u = scan_caps(layout, 75)[0]
    n_rst = layout.n_segments - 1
    u8, nbytes = compact_unstuffed(seg_w, seg_b, cap_u)
    want = finalize_host(np.asarray(u8), np.asarray(nbytes), 0, n_rst)
    from jpgenc_tpu.ops.pack import seg_nwords_aligned, walign_for
    wal = walign_for(layout.blocks_per_segment)
    uw, nbits = wcompact_unstuffed(seg_w, seg_b, cap_u // 4, wal)
    uw, nbits = np.asarray(uw), np.asarray(nbits)
    assert int(seg_nwords_aligned(nbits, wal).sum()) <= cap_u // 4
    got = finalize_host_w(uw, nbits, 0, n_rst, wal)
    assert got == want


def test_finalize_host_w_np_fallback_matches_native(rgb_image, monkeypatch):
    from jpgenc_tpu import native
    from jpgenc_tpu.engine import finalize_host_w
    from jpgenc_tpu.ops.pack import wcompact_unstuffed
    if not native.available():
        pytest.skip("native tier unavailable")
    layout = make_layout(rgb_image.shape[0], rgb_image.shape[1], "420", 4)
    plan = get_plan(layout)
    _, qt = qtables_for_quality(75)
    luts = luts_from_tables(*standard_tables())
    seg_w, seg_b = plan.encode_segments(rgb_image, qt, luts)
    cap_u = scan_caps(layout, 75)[0]
    from jpgenc_tpu.ops.pack import walign_for
    wal = walign_for(layout.blocks_per_segment)
    uw, nbits = wcompact_unstuffed(seg_w, seg_b, cap_u // 4, wal)
    uw, nbits = np.asarray(uw), np.asarray(nbits)
    want = finalize_host_w(uw, nbits, 2, len(nbits), wal)
    monkeypatch.setattr(native, "available", lambda: False)
    got = finalize_host_w(uw, nbits, 2, len(nbits), wal)
    assert got == want


def test_compact_overflow_flagged(gray_image):
    layout = make_layout(*gray_image.shape, "gray", 0)
    plan = get_plan(layout)
    _, qt = qtables_for_quality(75)
    dc_t, ac_t = standard_tables()
    luts = luts_from_tables(dc_t, ac_t)
    seg_w, seg_b = plan.encode_segments(gray_image, qt, luts)
    cap_u = 1024   # far too small
    _, nbytes = compact_unstuffed(seg_w, seg_b, cap_u)
    assert int(np.asarray(nbytes).sum()) > cap_u


def test_api_encode_unchanged_by_device_finalize(gray_image):
    """api.encode (compact finalize) == the reference host-finalize assembly."""
    ours = encode(gray_image, quality=75)
    layout = make_layout(*gray_image.shape, "gray", 0)
    plan = get_plan(layout)
    qt_host, qt = qtables_for_quality(75)
    dc_t, ac_t = standard_tables()
    luts = luts_from_tables(dc_t, ac_t)
    seg_w, seg_b = plan.encode_segments(gray_image, qt, luts)
    scan = segments_to_scan(np.asarray(seg_w), np.asarray(seg_b))
    from jpgenc_tpu.container.jfif import build_headers
    host = build_headers(layout, list(qt_host), dc_t, ac_t) + scan + b"\xff\xd9"
    assert ours == host


def test_block_overflow_falls_back(rng):
    """Pure noise at Q<=80 exceeds the 24-word block cap: output must come
    from the fallback path and still decode identically to the reference."""
    noise = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    data = encode(noise, quality=78, subsampling="444")
    from jpgenc_tpu.decoder import decode_to_coefficients
    layout, blocks, _ = decode_to_coefficients(data)
    plan = get_plan(make_layout(64, 64, "444", 0))
    _, qt = qtables_for_quality(78)
    enc_blocks = np.asarray(plan.blocks(noise, qt))
    np.testing.assert_array_equal(blocks, enc_blocks)
