"""M3 gate: own decoder — bit-identical coefficient round-trip (BASELINE.json:5)
plus cross-decoder pixel agreement."""
import io

import numpy as np
import pytest
from PIL import Image

from jpgenc_tpu import api
from jpgenc_tpu.decoder import decode, decode_to_coefficients
from jpgenc_tpu.engine import get_plan, qtables_for_quality
from jpgenc_tpu.layout import make_layout
from jpgenc_tpu.utils.metrics import psnr


CASES = [
    ("gray", 0, 75, False),
    ("gray", 4, 75, False),
    ("gray", 0, 75, True),
    ("420", 0, 75, False),
    ("420", 3, 90, False),
    ("422", 0, 50, False),
    ("444", 0, 75, True),
]


@pytest.mark.parametrize("mode,rst,q,opt", CASES)
def test_coefficient_roundtrip_bit_identical(mode, rst, q, opt, gray_image, rgb_image):
    img = gray_image if mode == "gray" else rgb_image
    kw = {} if mode == "gray" else {"subsampling": mode}
    data = api.encode(img, quality=q, restart_interval=rst, optimize=opt, **kw)

    layout = make_layout(img.shape[0], img.shape[1], mode, rst)
    _, qt_dev = qtables_for_quality(q)
    enc_blocks = np.asarray(get_plan(layout).blocks(img, qt_dev))

    dec_layout, dec_blocks, dec_qt = decode_to_coefficients(data)
    assert dec_layout.subsampling == mode
    assert dec_layout.restart_interval == rst
    assert np.array_equal(dec_blocks, enc_blocks)          # THE invariant
    for tq in dec_qt:
        host_qt, _ = qtables_for_quality(q)
        assert np.array_equal(dec_qt[tq], host_qt[tq])


@pytest.mark.parametrize("mode", ["gray", "420"])
def test_own_decode_close_to_pillow_decode(mode, gray_image, rgb_image):
    img = gray_image if mode == "gray" else rgb_image
    kw = {} if mode == "gray" else {"subsampling": mode}
    data = api.encode(img, quality=75, **kw)
    ours = decode(data)
    pil = Image.open(io.BytesIO(data))
    theirs = np.asarray(pil.convert("RGB") if mode != "gray" else pil)
    assert ours.shape == theirs.shape
    # all decoders of the same baseline file agree up to IDCT/upsample rounding
    assert psnr(ours, theirs) > (40.0 if mode == "gray" else 30.0)


def test_decode_pillow_encoded_file(gray_image):
    buf = io.BytesIO()
    Image.fromarray(gray_image).save(buf, format="JPEG", quality=75)
    ours = decode(buf.getvalue())
    theirs = np.asarray(Image.open(buf))
    assert psnr(ours, theirs) > 40.0


def test_decode_pillow_optimized_restart_color(rgb_image):
    buf = io.BytesIO()
    Image.fromarray(rgb_image).save(buf, format="JPEG", quality=80,
                                    optimize=True, restart_marker_blocks=2)
    ours = decode(buf.getvalue())
    theirs = np.asarray(Image.open(buf).convert("RGB"))
    assert ours.shape == theirs.shape
    assert psnr(ours, theirs) > 30.0


def test_decode_batch_matches_single(rgb_image, gray_image):
    """Batched device reconstruction must agree with per-image decode
    (vmapped matmul reassociation may shift the odd pixel by 1)."""
    from jpgenc_tpu.api import decode_batch, encode
    files = [encode(rgb_image, quality=q) for q in (50, 75, 90)]
    batch = decode_batch(files)
    for data, got in zip(files, batch):
        one = decode(data)
        assert got.shape == one.shape
        assert np.abs(got.astype(int) - one.astype(int)).max() <= 1

    # mixed geometries fall back to per-image decode
    mixed = [api.encode(rgb_image, quality=75),
             api.encode(gray_image, quality=75)]
    outs = decode_batch(mixed)
    assert outs[0].ndim == 3 and outs[1].ndim == 2


def test_decode_batch_chunked(rgb_image):
    """chunk=N (pipelined sub-dispatches) must return the same images as the
    single-dispatch path, including a short remainder chunk; to_device=True
    returns a list of per-chunk stacked arrays covering the whole batch."""
    import jax
    from jpgenc_tpu.api import decode_batch, encode
    files = [encode(rgb_image, quality=q) for q in (50, 60, 75, 85, 90)]
    ref = decode_batch(files)
    got = decode_batch(files, chunk=2)          # chunks of 2, 2, 1
    assert len(got) == len(ref)
    for r, g in zip(ref, got):
        # different vmap batch sizes may reassociate the IDCT matmul:
        # knife-edge pixels can shift by 1 (same policy as the
        # batch-vs-single test above)
        assert r.shape == g.shape
        assert np.abs(r.astype(int) - g.astype(int)).max() <= 1

    chunks = decode_batch(files, to_device=True, chunk=2)
    assert isinstance(chunks, list) and len(chunks) == 3
    assert all(isinstance(c, jax.Array) for c in chunks)
    assert sum(c.shape[0] for c in chunks) == len(files)
    flat = [np.asarray(c[i]) for c in chunks for i in range(c.shape[0])]
    for r, g in zip(got, flat):                 # same chunking: exact
        np.testing.assert_array_equal(r, g)

    # type stability: chunk set -> ALWAYS a list, even when the batch fits
    # a single chunk (callers with a fixed chunk must see one return type
    # as the batch size crosses N); chunk=None -> stacked array
    one = decode_batch(files, to_device=True, chunk=16)
    assert isinstance(one, list) and len(one) == 1
    assert one[0].shape[0] == len(files)
    stacked = decode_batch(files, to_device=True)
    assert isinstance(stacked, jax.Array) and stacked.shape[0] == len(files)


def test_decode_to_device(rgb_image, pixel_parity):
    """to_device=True keeps pixels in HBM (jax.Array), values identical to
    the host-download path, cropped to true size on device."""
    import jax
    data = api.encode(rgb_image, quality=75)
    host = decode(data)
    dev = decode(data, to_device=True)
    assert isinstance(dev, jax.Array)
    assert dev.shape == host.shape and dev.dtype == host.dtype
    np.testing.assert_array_equal(np.asarray(dev), host)

    files = [data, api.encode(rgb_image, quality=90)]
    stacked = api.decode_batch(files, to_device=True)
    assert isinstance(stacked, jax.Array)
    assert stacked.shape == (2,) + host.shape
    singles = api.decode_batch(files)
    for i in range(2):                      # batch vs single executables
        pixel_parity(np.asarray(stacked[i]), singles[i])


def test_sparsify_densify_roundtrip():
    """The sparse coefficient upload form (decoder._sparsify/_densify) is
    exact: dense -> sparse -> device densify == dense, including the
    all-zero and the pathological-dense cases (the latter exercising the
    fallback cutoff in reconstruct_pixels)."""
    import jax
    from jpgenc_tpu.decoder import _densify, _sparsify

    rng = np.random.default_rng(7)
    for density in (0.0, 0.03, 1.0):
        blocks = np.where(rng.random((300, 64)) < density,
                          rng.integers(-1024, 1024, (300, 64)), 0) \
            .astype(np.int32)
        sp = _sparsify(blocks)
        assert sp.dtype == np.int16 and sp.shape[0] == 3
        back = np.asarray(jax.jit(
            lambda s: _densify(s, 300))(jnp_asarray(sp)))
        np.testing.assert_array_equal(back, blocks.astype(np.int16))


def jnp_asarray(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


def test_decode_batch_mixed_restart_interval(rgb_image):
    """Same size but different DRI is a GEOMETRY mismatch (the segment
    layout drives the scan decode): decoder.decode_batch falls back to
    per-image decode; the mesh path raises the up-front error."""
    from jpgenc_tpu.decoder import decode_batch as dec_batch
    a = api.encode(rgb_image, quality=75, restart_interval=0)
    b = api.encode(rgb_image, quality=75, restart_interval=3)
    outs = dec_batch([a, b])
    np.testing.assert_array_equal(outs[0], decode(a))
    np.testing.assert_array_equal(outs[1], decode(b))

    import pytest as _pytest

    from jpgenc_tpu.parallel.mesh import decode_batch as decode_sharded
    with _pytest.raises(ValueError, match="same-geometry"):
        decode_sharded([a, b])


def test_decode_opencv_and_tf_files(rgb_image):
    """Foreign-encoder breadth: files produced by OpenCV and TensorFlow
    (independent libjpeg lineages) decode through our (packed) path with
    pixels matching Pillow's decode of the same bytes."""
    import io
    cv2 = pytest.importorskip("cv2")
    from PIL import Image

    from jpgenc_tpu.utils.metrics import psnr
    ok, enc = cv2.imencode(".jpg", rgb_image[:, :, ::-1],
                           [cv2.IMWRITE_JPEG_QUALITY, 80])
    assert ok
    data = enc.tobytes()
    ours = decode(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert psnr(ours, ref) > 45.0        # IDCT rounding only

    tf = pytest.importorskip("tensorflow")
    data2 = tf.io.encode_jpeg(rgb_image, quality=85,
                              chroma_downsampling=True).numpy()
    ours2 = decode(data2)
    ref2 = np.asarray(Image.open(io.BytesIO(data2)).convert("RGB"))
    assert psnr(ours2, ref2) > 45.0


def test_stage_recon_matches_decode_batch(rgb_image):
    """stage_recon (the bench's device-only decode helper) must produce
    exactly the pixels decode_batch does, and repeat runs must be pure
    (device-resident inputs are never consumed)."""
    from jpgenc_tpu.decoder import decode_batch, stage_recon
    files = [api.encode(rgb_image, quality=q) for q in (75, 90, 75, 50)]
    ref = decode_batch(files, chunk=2)
    run, h2d = stage_recon(files, chunk=2)
    assert h2d > 0
    outs = [np.asarray(o) for o in run()]
    got = [a[i] for a in outs for i in range(a.shape[0])]
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(g, r)
    outs2 = [np.asarray(o) for o in run()]
    for a, b2 in zip(outs, outs2):
        np.testing.assert_array_equal(a, b2)


@pytest.mark.parametrize("mode", ["420", "422", "444", "gray"])
def test_decode_range_limit_semantics(mode):
    """T.81 sample range limiting on ringing-heavy content: decoded pixels
    must track the exact-arithmetic reconstruction tightly (the clamp on
    IDCT output samples, r5 fuzz-audit finding) — while the libjpeg-based
    oracles may legitimately deviate further, because their integer islow
    IDCT's accuracy guarantee (IEEE-1180 |coef| <= ~300 domain) is void on
    such coefficients (measured up to ~20/255 vs exact arithmetic, with
    PIL == cv2 == TF exactly, since they share the code)."""
    import io as _io

    from PIL import Image
    h, w = 54, 94
    # deterministic content: the session rng's stream depends on xdist
    # worker order, and this test's bounds are content-sensitive (NB:
    # hash() on str is salted per process — crc32 is stable)
    import zlib
    lrng = np.random.default_rng(zlib.crc32(mode.encode()))
    img = lrng.integers(0, 256, (h, w) if mode == "gray" else (h, w, 3),
                        np.uint8)
    kw = {} if mode == "gray" else {"subsampling": mode}
    from jpgenc_tpu.ref.decoder import exact_decode
    data = api.encode(img, quality=55, **kw)
    own = decode(data).astype(np.int64)
    ref = exact_decode(data).astype(np.int64)
    d = np.abs(own - ref)
    # magnitude-only bound: a tie-broken (.5-boundary) sample shifts RGB
    # by up to ceil(1.772)+1 after color amplification; tie frequency is
    # content-dependent (synthetic gradients hit whole blocks of ties)
    assert d.max() <= 3, f"own vs exact ref maxdiff {d.max()}"
    pil = np.asarray(Image.open(_io.BytesIO(data)).convert(
        "L" if mode == "gray" else "RGB")).astype(np.int64)
    # relative oracle control (same policy as scripts/audit_fuzz.py): our
    # decode must sit no farther from PIL than exact arithmetic does —
    # libjpeg's integer-IDCT deviation on noise is open-ended (53+
    # observed at single pixels here), so absolute caps are unprincipled
    dp = np.abs(own - pil)
    dref = np.abs(ref - pil)
    slack = 16.0 / dp.size
    assert (dp > 4).mean() <= (dref > 4).mean() + max(1e-3, slack), \
        f"own frac>4 {(dp > 4).mean():.4f} vs ref {(dref > 4).mean():.4f}"
