"""Test harness config.

Tests run on CPU with 8 virtual devices so all multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md section 5 item 7). These env vars
must be set before jax is first imported anywhere.
"""
import os
import sys

# Force CPU regardless of ambient JAX_PLATFORMS (this box exports
# JAX_PLATFORMS=axon for the single real TPU chip; tests must not use it).
# NOTE: on this box the env var alone is ignored once the axon plugin is
# registered — jax.config.update is authoritative.
# Exception: JPGENC_HW=1 selects the on-hardware lane (tests/test_hw_tpu.py
# only) — the real chip stays visible and kernels compile on it.
HW_LANE = os.environ.get("JPGENC_HW") == "1"
if not HW_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
else:
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if not HW_LANE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def pixel_parity():
    """Pixel comparison across DIFFERENT recon executables (batch vs
    single, packed vs sparse vs dense upload forms, sharded vs local).

    Quantized coefficients are bit-exact across all paths — that contract
    is tested at the coefficient layer. Decoded PIXELS, however, come out
    of separately compiled float-IDCT programs, and XLA may reassociate
    the matmul/rounding chain differently per (form, batch) executable:
    knife-edge pixels can legitimately differ by 1 (measured: ~1 pixel per
    several Mpix of noise content; rng-order dependent, which made exact
    asserts flaky under xdist). Same discipline as the HW lane's parity().
    Comparisons of the SAME executable's output stay exact."""
    def check(a, b, frac=1e-3):
        a = np.asarray(a).astype(np.int64)
        b = np.asarray(b).astype(np.int64)
        assert a.shape == b.shape, (a.shape, b.shape)
        d = np.abs(a - b)
        assert d.max() <= 1, f"maxdiff {d.max()}"
        lim = max(frac, 4.0 / d.size)       # tiny images: allow a few px
        bad = (d > 0).mean()
        assert bad <= lim, f"knife-edge fraction {bad:.2e} > {lim:.2e}"
    return check


@pytest.fixture(autouse=True)
def _reset_fused_override():
    """The fused-recon override is module-global test plumbing; make sure
    no test can leak a forced mode into its worker's later tests."""
    yield
    import jpgenc_tpu.decoder as _D
    _D._FUSED_OVERRIDE = None


def _gradient_noise_image(rng, h, w, channels=None):
    """Deterministic structured test image: gradients + sinusoids + noise."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (
        96.0 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
        + 0.35 * xx + 0.2 * yy
    )
    if channels:
        chans = [base + 25.0 * c + rng.normal(0, 12, (h, w)) for c in range(channels)]
        img = np.stack(chans, axis=-1)
    else:
        img = base + rng.normal(0, 12, (h, w))
    return np.clip(img + 96.0, 0, 255).astype(np.uint8)


@pytest.fixture(scope="session")
def gray_image(rng):
    return _gradient_noise_image(rng, 128, 128)


@pytest.fixture(scope="session")
def rgb_image(rng):
    return _gradient_noise_image(rng, 120, 136, channels=3)


@pytest.fixture(scope="session")
def gray_image_512(rng):
    return _gradient_noise_image(rng, 512, 512)
