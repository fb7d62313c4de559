"""Device-side finalize (ops.pack.stuff_compact) vs the host reference path.

The device path must produce byte-identical scans to engine.segments_to_scan
(slice + 1-pad + FF00 stuffing + RSTn joins) for every config, and must flag
capacity overflow instead of emitting a truncated stream.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from jpgenc_tpu.api import encode
from jpgenc_tpu.engine import (get_plan, luts_from_tables, qtables_for_quality,
                               scan_caps, segments_to_scan)
from jpgenc_tpu.layout import make_layout
from jpgenc_tpu.ops.pack import stuff_compact
from jpgenc_tpu.ref.encoder import encode as ref_encode
from jpgenc_tpu.ref.encoder import standard_tables


def _device_scan(layout, img, quality, first_rst=0, n_rst=None):
    plan = get_plan(layout)
    _, qt = qtables_for_quality(quality)
    dc_t, ac_t = standard_tables()
    luts = luts_from_tables(dc_t, ac_t)
    seg_w, seg_b = plan.encode_segments(img, qt, luts)
    cap_u, cap_s = scan_caps(layout, quality)
    if n_rst is None:
        n_rst = layout.n_segments - 1
    stuffed, out_len, raw_len = stuff_compact(
        seg_w, seg_b, jnp.int32(first_rst), jnp.int32(n_rst), cap_u, cap_s)
    assert int(raw_len) <= cap_u and int(out_len) <= cap_s
    dev = np.asarray(stuffed)[:int(out_len)].tobytes()
    host = segments_to_scan(np.asarray(seg_w), np.asarray(seg_b),
                            first_rst=first_rst)
    return dev, host, (np.asarray(seg_w), np.asarray(seg_b))


@pytest.mark.parametrize("restart", [0, 3, 7])
def test_stuff_compact_matches_host(gray_image, restart):
    layout = make_layout(*gray_image.shape, "gray", restart)
    dev, host, _ = _device_scan(layout, gray_image, 75)
    assert dev == host


@pytest.mark.parametrize("quality", [10, 75, 95])
def test_stuff_compact_color(rgb_image, quality):
    layout = make_layout(rgb_image.shape[0], rgb_image.shape[1], "420", 5)
    dev, host, _ = _device_scan(layout, rgb_image, quality)
    assert dev == host


def test_stuff_compact_stripe_numbering(gray_image):
    """first_rst offsets RSTn numbering; n_rst=n_seg adds the trailing RSTn."""
    layout = make_layout(*gray_image.shape, "gray", 4)
    n_seg = layout.n_segments
    dev, host, (seg_w, seg_b) = _device_scan(
        layout, gray_image, 75, first_rst=5, n_rst=n_seg)
    # host path emits no trailing RSTn: append it manually for comparison
    host += bytes([0xFF, 0xD0 + ((5 + n_seg - 1) % 8)])
    assert dev == host


def test_stuff_compact_overflow_flagged(gray_image):
    layout = make_layout(*gray_image.shape, "gray", 0)
    plan = get_plan(layout)
    _, qt = qtables_for_quality(75)
    dc_t, ac_t = standard_tables()
    luts = luts_from_tables(dc_t, ac_t)
    seg_w, seg_b = plan.encode_segments(gray_image, qt, luts)
    cap_u, cap_s = 1024, 1024 + 64   # far too small
    _, out_len, raw_len = stuff_compact(
        seg_w, seg_b, jnp.int32(0), jnp.int32(layout.n_segments - 1),
        cap_u, cap_s)
    assert int(raw_len) > cap_u


def test_api_encode_unchanged_by_device_finalize(gray_image):
    """api.encode (device finalize) == the previous host-finalize assembly."""
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
