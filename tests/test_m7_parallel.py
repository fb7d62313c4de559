"""M7 gate: distribution layer on the 8-virtual-device CPU mesh.

Sharded outputs must be BYTE-IDENTICAL to single-device outputs per image, and
a striped single-image scan must equal the unsharded scan at the same restart
interval (SURVEY.md section 5 item 7).
"""
import jax
import numpy as np
import pytest

from jpgenc_tpu import api
from jpgenc_tpu.decoder import decode
from jpgenc_tpu.parallel.mesh import default_mesh, encode_batch, encode_striped
from jpgenc_tpu.utils.metrics import psnr


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def _batch(rng, b, h, w, c=None):
    shape = (b, h, w) if c is None else (b, h, w, c)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


def test_batch_encode_matches_single_device_gray(rng):
    imgs = _batch(rng, 8, 64, 64)
    outs = encode_batch(imgs, quality=75)
    assert len(outs) == 8
    for i in range(8):
        assert outs[i] == api.encode(imgs[i], quality=75)


def test_batch_encode_matches_single_device_color(rng):
    imgs = _batch(rng, 8, 64, 64, 3)
    outs = encode_batch(imgs, quality=75, subsampling="420", restart_interval=2)
    for i in range(8):
        assert outs[i] == api.encode(imgs[i], quality=75, subsampling="420",
                                     restart_interval=2)


def test_batch_not_divisible_by_mesh(rng):
    imgs = _batch(rng, 5, 64, 64)
    outs = encode_batch(imgs, quality=75)
    assert len(outs) == 5
    for i in range(5):
        assert outs[i] == api.encode(imgs[i], quality=75)


def test_batch_optimized_huffman(rng):
    imgs = _batch(rng, 4, 64, 64)
    outs = encode_batch(imgs, quality=75, optimize=True)
    for i in range(4):
        assert outs[i] == api.encode(imgs[i], quality=75, optimize=True)


def test_striped_equals_unsharded(gray_image):
    # 128x128 gray: 16 MCU rows; 4 stripes of 4 rows; R=16 (one MCU row)
    striped = encode_striped(gray_image, n_stripes=4, restart_interval=16)
    single = api.encode(gray_image, quality=75, restart_interval=16)
    assert striped == single


def test_striped_color_equals_unsharded(rgb_image):
    # rgb_image is 120x136 -> padded 128x144, 8x9 MCUs; 4 stripes of 2 MCU
    # rows = 18 MCUs/stripe; R=6 divides 18
    striped = encode_striped(rgb_image, n_stripes=4, subsampling="420",
                             restart_interval=6)
    single = api.encode(rgb_image, quality=75, subsampling="420",
                        restart_interval=6)
    assert striped == single


def test_striped_default_interval_decodes(gray_image):
    data = encode_striped(gray_image, n_stripes=8)
    dec = decode(data)
    assert psnr(dec, gray_image) > 28.0


def test_striped_optimized_huffman(gray_image):
    data = encode_striped(gray_image, n_stripes=4, restart_interval=16,
                          optimize=True)
    base = encode_striped(gray_image, n_stripes=4, restart_interval=16)
    assert len(data) < len(base)
    assert np.array_equal(decode(data), decode(base))


def test_multihost_helpers_single_process():
    """Degenerate (1-process) behavior of the multi-host control plane."""
    from jpgenc_tpu.parallel import multihost as mh
    mh.initialize()                        # no-op
    assert mh.process_count() == 1
    assert mh.gather_bytes(b"abc") == [b"abc"]
    assert list(mh.owned_indices(10)) == list(range(10))


def test_sharded_decode_batch_matches_single(rng, pixel_parity):
    """mesh.decode_batch: pixels decoded sharded over the batch axis equal
    per-image api.decode, color + gray, including a batch size that is not
    a multiple of the mesh (padding rows dropped)."""
    from jpgenc_tpu.parallel.mesh import decode_batch as decode_sharded

    imgs = _batch(rng, 8, 64, 64, 3)
    files = [api.encode(imgs[i], quality=75) for i in range(8)]
    out = decode_sharded(files)                      # sharded jax.Array
    assert isinstance(out, jax.Array) and out.shape[0] == 8
    arr = np.asarray(out)
    for i in range(8):                      # sharded vs local executables
        pixel_parity(arr[i], decode(files[i]))

    # non-divisible batch + to_device=False list form + gray
    gfiles = [api.encode(_batch(rng, 1, 48, 40)[0], quality=80)
              for _ in range(5)]
    outs = decode_sharded(gfiles, to_device=False)
    assert len(outs) == 5
    for d, got in zip(gfiles, outs):
        pixel_parity(got, decode(d))

    # heterogeneous geometry is an explicit error
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_sharded([files[0], gfiles[0]])


def test_sharded_decode_batch_sparse_branch(rng, pixel_parity):
    """Images large enough that the sparse coefficient upload wins
    (n_total*64 above the cap floor): exercises the sparse jit variant of
    mesh.decode_batch (small images take the dense branch)."""
    from jpgenc_tpu.parallel.mesh import decode_batch as decode_sharded
    from jpgenc_tpu.utils.fixtures import synth_frame

    imgs = np.stack([synth_frame(120, 264, seed=i) for i in range(8)])
    files = [api.encode(imgs[i], quality=75) for i in range(8)]
    arr = np.asarray(decode_sharded(files))
    for i in range(8):
        pixel_parity(arr[i], decode(files[i]))


def test_striped_ragged_equals_unsharded(gray_image):
    """Non-divisible MCU rows (SURVEY.md hard part 5 closed): 128x128 gray
    has 16 MCU rows; 3 stripes -> 6+6+4 rows. Standard tables: the emitted
    bytes must equal the unsharded encode at the same DRI (padding-row
    segments dropped, global RSTn numbering over kept segments only)."""
    striped = encode_striped(gray_image, n_stripes=3, restart_interval=16)
    single = api.encode(gray_image, quality=75, restart_interval=16)
    assert striped == single


def test_striped_ragged_color_default_interval(rng):
    """Ragged color: 120x136 4:2:0 -> 8 MCU rows / 3 stripes (3+3+2); the
    default DRI becomes one MCU row. Byte-equality vs unsharded, plus a
    clean decode."""
    img = _batch(rng, 1, 120, 136, 3)[0]
    striped = encode_striped(img, n_stripes=3, subsampling="420")
    # default ragged DRI = MCUs per row = ceil(136/16) = 9
    single = api.encode(img, quality=75, subsampling="420",
                        restart_interval=9)
    assert striped == single
    # decodes cleanly (noise content: JPEG PSNR is inherently low)
    assert decode(striped).shape == img.shape


def test_striped_ragged_pure_padding_stripe(rng):
    """Stripe count whose ceil split leaves a stripe fully past the image:
    7 MCU rows / 4 stripes -> 2+2+2+1 kept... and 5 stripes -> 2,2,2,1,0:
    the zero-row stripe contributes nothing."""
    img = _batch(rng, 1, 56, 64)[0]            # gray: 7 MCU rows
    striped = encode_striped(img, n_stripes=5, restart_interval=8)
    single = api.encode(img, quality=75, restart_interval=8)
    assert striped == single


def test_striped_ragged_validation(rng):
    img = _batch(rng, 1, 56, 64)[0]            # 7 MCU rows, 8 MCUs/row
    with pytest.raises(ValueError):            # 3 doesn't divide 8 MCUs/row
        encode_striped(img, n_stripes=3, restart_interval=3)
    with pytest.raises(ValueError):            # more stripes than MCU rows
        encode_striped(img, n_stripes=8)


def test_striped_ragged_optimize_decodes(gray_image):
    """Ragged + optimize: the SPMD histogram's padding-row counts are
    corrected (owner deltas), so the custom tables — and the whole file —
    equal the unsharded encode's."""
    data = encode_striped(gray_image, n_stripes=3, restart_interval=16,
                          optimize=True)
    single = api.encode(gray_image, quality=75, restart_interval=16,
                        optimize=True)
    assert data == single
    np.testing.assert_array_equal(decode(data), decode(single))


def test_encode_batch_device_resident_transcode(rng):
    """Producer interface (SURVEY layer G / ledger roadmap #1):
    decode_batch(to_device=True) pixels feed encode_batch DIRECTLY — a
    device-resident transcode with no host pixel staging — and the bytes
    equal the host-pixel encode's."""
    from jpgenc_tpu.parallel.mesh import decode_batch as decode_sharded

    imgs = _batch(rng, 8, 64, 80, 3)
    files = [api.encode(imgs[i], quality=90, subsampling="420")
             for i in range(8)]
    dev = decode_sharded(files)                      # [8, H, W, 3] in HBM
    out_dev = encode_batch(dev, quality=75, subsampling="420")
    ref = encode_batch(np.asarray(dev), quality=75, subsampling="420")
    assert out_dev == ref

    with pytest.raises(ValueError):                  # 3 doesn't divide 8
        encode_batch(dev[:3], quality=75, subsampling="420")


def test_batch_optimize_device_resident(rng):
    """Two-pass optimized-Huffman encode_batch with DEVICE-RESIDENT input
    (the transcode/production shape) must emit files byte-identical to
    per-image host encodes — covers the optimize x device-resident
    combination the bench's batched-optimize row rides."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jpgenc_tpu.parallel.mesh import default_mesh, encode_batch, put_batch
    imgs = _batch(rng, 8, 64, 80, 3)
    mesh = default_mesh()
    sh = NamedSharding(mesh, P("batch", None, None, None))
    dev = put_batch(imgs, sh)
    outs = encode_batch(dev, quality=75, mesh=mesh, optimize=True)
    for i in range(8):
        assert outs[i] == api.encode(imgs[i], quality=75, optimize=True)
