"""On-hardware kernel equality lane (VERDICT r1 item 6; SURVEY §5 item 2).

Interpret-mode CI cannot catch Mosaic lowering quirks (gather shape rules,
relayouts, unsigned ops); this lane compiles every production kernel on the
REAL chip and compares against the jnp paths. Run it solo (never alongside a
bench — tunnel contention skews nothing here but compiles fight for the
remote compiler):

    JPGENC_HW=1 python -m pytest tests/test_hw_tpu.py -q

First run pays Pallas compile latency (minutes on this platform); reruns hit
the compilation cache. Skipped entirely unless JPGENC_HW=1 and a TPU is
present.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("JPGENC_HW") != "1", reason="hardware lane (JPGENC_HW=1)")


@pytest.fixture(scope="module")
def tpu():
    import jax
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU visible")
    return jax.devices()[0]


@pytest.fixture(scope="module")
def frame(rng):
    from jpgenc_tpu.utils.fixtures import synth_frame
    return synth_frame(256, 256)


def test_k1_fused_vs_jnp(tpu, frame, rng):
    from jpgenc_tpu.engine import pixels_to_scan, qtables_for_quality
    from jpgenc_tpu.layout import make_layout
    from jpgenc_tpu.ops.pallas.k1_dct import fused_pixels_to_scan
    _, qt = qtables_for_quality(75)
    for mode, img in [("420", frame), ("422", frame), ("444", frame),
                      ("gray", frame[:, :, 0])]:
        layout = make_layout(img.shape[0], img.shape[1], mode, 0)
        ref = np.asarray(pixels_to_scan(img, layout, qt))
        got = np.asarray(fused_pixels_to_scan(img, layout, qt))
        # MXU accumulation order differs between formulations; the only
        # permissible divergence is +-1 on coefficients within an ulp of the
        # round-half-away boundary, and only a vanishing fraction of them
        diff = np.abs(got.astype(np.int64) - ref)
        frac = float((diff > 0).mean())
        assert diff.max() <= 1 and frac <= 1e-4, (
            f"mode={mode}: {int((diff > 0).sum())} diffs "
            f"(max {int(diff.max())}, frac {frac:.2e})")


def test_kernel_a_vs_jnp(tpu, frame):
    from jpgenc_tpu.engine import (get_plan, luts_from_tables,
                                   pixels_to_scan, qtables_for_quality)
    from jpgenc_tpu.layout import make_layout
    from jpgenc_tpu.ops.entropy import make_pieces
    from jpgenc_tpu.ops.pack import block_pack
    from jpgenc_tpu.ops.pallas.block_pack import (fused_block_pack,
                                                  packed_tables,
                                                  slot_metadata)
    from jpgenc_tpu.ref.encoder import standard_tables
    layout = make_layout(256, 256, "420", 0)
    plan = get_plan(layout)
    _, qt = qtables_for_quality(75)
    luts = luts_from_tables(*standard_tables())
    zz = pixels_to_scan(frame, layout, qt)
    meta = slot_metadata(plan.plan, zz)
    buf, bits = fused_block_pack(zz, *meta, tables=packed_tables(luts),
                                 w_blk=24)
    pv, pl_ = make_pieces(zz, plan.plan, luts)
    rbuf, rbits = block_pack(pv, pl_, 24)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(rbits))
    np.testing.assert_array_equal(np.asarray(buf), np.asarray(rbuf))


def test_k1a_fused_vs_split(tpu, frame):
    """Fused K1+A == split K1 -> metadata -> kernel A, ON HARDWARE.

    Both paths use the same dense operator and matmul shape, so even the
    MXU accumulation order matches — outputs must be bit-identical."""
    from jpgenc_tpu.engine import (get_plan, luts_from_tables,
                                   qtables_for_quality)
    from jpgenc_tpu.layout import make_layout
    from jpgenc_tpu.ops.pallas.block_pack import (fused_block_pack,
                                                  packed_tables,
                                                  slot_metadata)
    from jpgenc_tpu.ops.pallas.k1_dct import fused_pixels_to_scan
    from jpgenc_tpu.ops.pallas.k1a_fused import (fused_pixels_to_pack,
                                                 k1a_applicable)
    from jpgenc_tpu.ref.encoder import standard_tables
    luts = luts_from_tables(*standard_tables())
    tabs = packed_tables(luts)
    _, qt = qtables_for_quality(75)
    # w_blk=12 covers the partial (<8-wide) final chunk store in the
    # paired merge ON HARDWARE — interpret mode cannot catch the Mosaic
    # lane-offset hazards that store shape is exposed to, and 12 is the
    # DEFAULT tier for Q81-90 (full buffer equality asserted below)
    for mode, dri, w_blk in [("420", 0, 8), ("420", 4, 24), ("420", 3, 12),
                             ("422", 0, 12), ("422", 0, 24),
                             ("gray", 0, 8), ("gray", 5, 8)]:
        img = frame[:, :, 0] if mode == "gray" else frame
        layout = make_layout(256, 256, mode, dri)
        assert k1a_applicable(layout)
        plan = get_plan(layout)
        zz = fused_pixels_to_scan(img, layout, qt)
        meta = slot_metadata(plan.plan, zz)
        ref_buf, ref_bits = fused_block_pack(zz, *meta, tables=tabs,
                                             w_blk=w_blk)
        buf, bits = fused_pixels_to_pack(img, layout, qt, tabs, w_blk)
        np.testing.assert_array_equal(np.asarray(bits), np.asarray(ref_bits),
                                      err_msg=f"{mode} dri={dri}")
        np.testing.assert_array_equal(np.asarray(buf), np.asarray(ref_buf),
                                      err_msg=f"{mode} dri={dri}")


def test_kernel_b_vs_jnp(tpu, frame):
    from jpgenc_tpu.engine import (get_plan, luts_from_tables,
                                   pixels_to_scan, qtables_for_quality)
    from jpgenc_tpu.layout import make_layout
    from jpgenc_tpu.ops.entropy import make_pieces
    from jpgenc_tpu.ops.pack import block_pack, segments_from_blocks
    from jpgenc_tpu.ops.pallas.seg_merge import fused_seg_merge
    from jpgenc_tpu.ref.encoder import standard_tables
    for restart in (0, 8):
        layout = make_layout(256, 256, "420", restart)
        plan = get_plan(layout)
        _, qt = qtables_for_quality(75)
        luts = luts_from_tables(*standard_tables())
        zz = pixels_to_scan(frame, layout, qt)
        pv, pl_ = make_pieces(zz, plan.plan, luts)
        buf, bits = block_pack(pv, pl_, 24)
        n_seg = layout.n_segments
        w_seg = layout.blocks_per_segment * 24 + 2
        ref_w, ref_b = segments_from_blocks(buf, bits, n_seg, w_seg)
        got_w, got_b = fused_seg_merge(buf, bits, n_seg, 24)
        ref_w, ref_b = np.asarray(ref_w), np.asarray(ref_b)
        got_w, got_b = np.asarray(got_w), np.asarray(got_b)
        np.testing.assert_array_equal(got_b, ref_b)
        for s in range(n_seg):
            nw = (int(ref_b[s]) + 31) // 32
            np.testing.assert_array_equal(got_w[s, :nw], ref_w[s, :nw],
                                          err_msg=f"restart={restart} seg={s}")


def test_full_encode_on_hw(tpu, frame):
    """End-to-end on the chip: production path == host reference finalize,
    decodes via Pillow, coefficients round-trip bit-identically."""
    import io as _io

    from PIL import Image

    from jpgenc_tpu.api import encode
    from jpgenc_tpu.decoder import decode_to_coefficients
    from jpgenc_tpu.utils.metrics import psnr

    for kwargs in ({}, {"restart_interval": 4}, {"optimize": True}):
        data = encode(frame, quality=75, **kwargs)
        pil = np.asarray(Image.open(_io.BytesIO(data)).convert("RGB"))
        # the CPU jnp path scores 27.59 dB on this noisy fixture at Q75;
        # the hardware path must land in the same regime
        assert float(psnr(pil, frame)) > 26.5
        layout, blocks, _ = decode_to_coefficients(data)
        assert blocks.shape[1] == 64


def test_packed_decode_on_hw(tpu, frame):
    """Round-3 decode path on the real chip: packed 2-byte coefficient
    upload + in-dispatch densify (single and chunk-flat batched) against
    the dense-forced reference path. Coefficient streams are bit-exact
    across forms; decoded PIXELS come out of separately compiled XLA
    recon executables, so the comparison uses the knife-edge parity
    bound (|diff| <= 1 on a vanishing fraction) — the same policy as the
    CPU suite's pixel_parity fixture."""
    import jpgenc_tpu.decoder as D
    from jpgenc_tpu import native
    from jpgenc_tpu.api import encode

    def parity(a, b):
        d = np.abs(np.asarray(a).astype(np.int64)
                   - np.asarray(b).astype(np.int64))
        assert d.max() <= 1 and (d > 0).sum() / d.size < 1e-3

    files = [encode(frame, quality=q, restart_interval=r)
             for q, r in ((75, 0), (92, 4), (50, 8))]
    D._FUSED_OVERRIDE = False     # pin the XLA recon: this test isolates
    try:                          # the upload FORMS
        got_single = [D.decode(f) for f in files]
        got_batch = D.decode_batch([files[0]] * 3, chunk=2)

        orig = native.available
        try:
            native.available = lambda: False  # python + dense upload path
            ref = [D.decode(f) for f in files]
        finally:
            native.available = orig
    finally:
        D._FUSED_OVERRIDE = None
    for g, r in zip(got_single, ref):
        parity(g, r)
    for g in got_batch:
        parity(g, ref[0])


def test_mesh_decode_on_hw(tpu, frame):
    """Sharded decode_batch (packed form) on the real chip matches
    per-image decode."""
    from jpgenc_tpu.api import decode, encode
    from jpgenc_tpu.parallel.mesh import decode_batch as decode_sharded

    files = [encode(frame, quality=80)] * 2
    out = decode_sharded(files, to_device=False)
    ref = decode(files[0])
    for o in out:
        np.testing.assert_array_equal(o, ref)


def test_fused_recon_on_hw(tpu, frame):
    """Round-4 fused Pallas reconstruction on the real chip — EVERY mode
    the auto-enable gate admits (420/422/444 color + gray; interpret-mode
    CI cannot catch the Mosaic lane-offset miscompiles the kernel docstring
    flags, and 422's non-128-aligned word-row slices are exactly that
    hazard class), single + batched: parity with the XLA recon bounded at
    |diff| <= 1 on a tiny knife-edge fraction (same discipline as the K1A
    encode lane)."""
    import jpgenc_tpu.decoder as D
    from jpgenc_tpu.api import encode
    from jpgenc_tpu.ops.pallas.recon import recon_applicable

    def parity(a, b):
        d = np.abs(np.asarray(a).astype(np.int64)
                   - np.asarray(b).astype(np.int64))
        assert d.max() <= 1 and (d > 0).sum() / d.size < 1e-3

    cases = [(frame, {"subsampling": s}) for s in ("420", "422", "444")]
    cases.append((frame[:, :, 0], {}))
    for img, kw in cases:
        data = encode(img, quality=75, **kw)
        lay = D.layout_from_parsed(D.parse_jpeg(data))
        assert recon_applicable(lay), kw
        D._FUSED_OVERRIDE = False
        ref = D.decode(data)
        refs = D.decode_batch([data] * 3, chunk=2)
        D._FUSED_OVERRIDE = None          # auto: fused on the real chip
        try:
            parity(D.decode(data), ref)
            for g, r in zip(D.decode_batch([data] * 3, chunk=2), refs):
                parity(g, r)
        finally:
            D._FUSED_OVERRIDE = None
