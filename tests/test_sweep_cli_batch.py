"""Quality-sweep differential tests (BASELINE.json config :9), CLI round
trips, and the checkpointed batch driver with fault injection."""
import io
import json
import os

import numpy as np
import pytest
from PIL import Image

from jpgenc_tpu.api import decode, encode
from jpgenc_tpu.batch import run_batch
from jpgenc_tpu.cli import main as cli_main
from jpgenc_tpu.utils.metrics import psnr


# ---------------------------------------------------------------------------
# Quality sweep Q=10..95 with restart intervals: every config must decode in
# all oracles and match Pillow's rate-distortion within tolerance.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("q", [10, 25, 50, 75, 90, 95])
def test_quality_sweep_differential(q, rgb_image):
    data = encode(rgb_image, quality=q, subsampling="420", restart_interval=4)

    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert pil.shape == rgb_image.shape

    import cv2
    cv = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    assert cv is not None and cv.shape == rgb_image.shape

    ours = decode(data)
    assert psnr(ours, pil) > 28.0       # decoders agree up to IDCT/upsample

    # rate-distortion vs Pillow at the same quality setting
    buf = io.BytesIO()
    Image.fromarray(rgb_image).save(buf, format="JPEG", quality=q,
                                    subsampling=2)
    pil_dec = np.asarray(Image.open(buf).convert("RGB"))
    our_psnr = psnr(pil, rgb_image)
    pil_psnr = psnr(pil_dec, rgb_image)
    our_bpp = 8 * len(data) / rgb_image[..., 0].size
    pil_bpp = 8 * buf.getbuffer().nbytes / rgb_image[..., 0].size
    assert our_psnr > pil_psnr - 1.0, (our_psnr, pil_psnr)
    assert our_bpp < pil_bpp * 1.25 + 0.05, (our_bpp, pil_bpp)


def test_tf_oracle_decodes(rgb_image):
    tf = pytest.importorskip("tensorflow")
    data = encode(rgb_image, quality=75, subsampling="420")
    out = tf.io.decode_jpeg(data, dct_method="INTEGER_ACCURATE").numpy()
    assert out.shape == rgb_image.shape
    # vs the original: bounded by 4:2:0 encode loss on the noisy fixture,
    # so this is a sanity bar, not a decoder-accuracy bar
    assert psnr(out, rgb_image) > 25.0


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def test_cli_encode_decode_roundtrip(tmp_path, rgb_image):
    src = tmp_path / "in.png"
    jpg = tmp_path / "out.jpg"
    png = tmp_path / "back.png"
    Image.fromarray(rgb_image).save(src)
    assert cli_main(["encode", str(src), str(jpg), "--quality", "85",
                     "--restart", "2"]) == 0
    assert jpg.read_bytes()[:2] == b"\xff\xd8"
    assert cli_main(["decode", str(jpg), str(png)]) == 0
    back = np.asarray(Image.open(png))
    assert psnr(back, rgb_image) > 25.0   # bounded by 4:2:0 loss on noise


def test_cli_striped_encode(tmp_path, gray_image):
    src = tmp_path / "in.png"
    jpg = tmp_path / "out.jpg"
    Image.fromarray(gray_image).save(src)
    assert cli_main(["encode", str(src), str(jpg), "--stripes", "4"]) == 0
    ref = encode(gray_image, quality=75, restart_interval=0)
    # striped files carry restart markers; both must decode identically
    a = decode(jpg.read_bytes())
    b = decode(ref)
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# Batch driver: resume + fault injection
# ---------------------------------------------------------------------------

def _mk_images(n=7, h=48, w=64):
    rng = np.random.default_rng(42)
    return rng.integers(0, 255, (n, h, w, 3), dtype=np.uint8)


def test_batch_driver_completes_and_resumes(tmp_path):
    imgs = _mk_images()
    outs = [str(tmp_path / f"img{i}.jpg") for i in range(len(imgs))]
    manifest = str(tmp_path / "manifest.jsonl")

    r1 = run_batch(imgs, outs, manifest, quality=75, chunk_size=3)
    assert r1.done == len(imgs) and r1.skipped == 0
    for i, p in enumerate(outs):
        assert open(p, "rb").read() == encode(imgs[i], quality=75)

    r2 = run_batch(imgs, outs, manifest, quality=75, chunk_size=3)
    assert r2.done == 0 and r2.skipped == len(imgs)


def test_batch_driver_fault_injection(tmp_path):
    imgs = _mk_images()
    outs = [str(tmp_path / f"img{i}.jpg") for i in range(len(imgs))]
    manifest = str(tmp_path / "manifest.jsonl")

    calls = {"n": 0}

    def flaky(chunk, **kw):
        from jpgenc_tpu.parallel.mesh import encode_batch
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected host failure")
        kw.pop("mesh", None)
        return encode_batch(chunk, mesh=None, **kw)

    with pytest.raises(RuntimeError):
        run_batch(imgs, outs, manifest, chunk_size=3, encode_chunk=flaky)
    done_before = len(open(manifest).readlines())
    assert 0 < done_before < len(imgs)

    # relaunch finishes only the remainder, and never rewrites finished files
    mtimes = {p: os.path.getmtime(p) for p in outs if os.path.exists(p)}
    r = run_batch(imgs, outs, manifest, chunk_size=3)
    assert r.skipped == done_before
    assert r.done == len(imgs) - done_before
    for p, t in mtimes.items():
        assert os.path.getmtime(p) == t
    recs = [json.loads(l) for l in open(manifest)]
    assert sorted(r["index"] for r in recs) == list(range(len(imgs)))


@pytest.mark.parametrize("h,w,sub", [
    (101, 53, "420"), (97, 129, "422"), (8, 8, "444"), (17, 1025, "420"),
])
def test_odd_dimensions(h, w, sub):
    """Non-MCU-multiple sizes: padding, headers, and all decoders agree."""
    rng = np.random.default_rng(h * 1000 + w)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    data = encode(img, quality=75, subsampling=sub)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert pil.shape == img.shape
    ours = decode(data)
    assert ours.shape == img.shape
    assert psnr(ours, pil) > 28.0


def test_tiny_gray():
    img = np.full((3, 5), 77, np.uint8)
    data = encode(img, quality=75)
    out = np.asarray(Image.open(io.BytesIO(data)))
    assert out.shape == (3, 5)
    assert np.abs(out.astype(int) - 77).max() <= 3
