#!/usr/bin/env python
"""Benchmark driver (SURVEY.md component #23): one JSON line on stdout.

Metric: MPix/s/chip, baseline JPEG encode at Q=75, RGB 1080p 4:2:0 with the
standard Annex K tables — the BASELINE.json:2 north-star. `vs_baseline` is the
ratio against the implied per-chip target of 625 MPix/s (10 GPix/s aggregate
on a v5e-16, BASELINE.json:5; the reference itself publishes no numbers,
BASELINE.json:13).

Measures steady-state end-to-end encode-to-JFIF-bytes throughput: device
pipeline (color/DCT/quant/zigzag/entropy/bit-pack) + device->host copy of the
packed segments + host finalize (byte slice, 1-padding, FF00 stuffing, header
concat). Compile time excluded (persistent compilation cache enabled).
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

TARGET_MPIX_S = 625.0  # 10 GPix/s / 16 chips (BASELINE.json:5)


def _test_image(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 96.0 * np.sin(xx / 17.0) * np.cos(yy / 23.0) + 0.35 * xx + 0.2 * yy
    rng = np.random.default_rng(7)
    img = np.stack([base + 25.0 * c + rng.normal(0, 12, (h, w))
                    for c in range(3)], axis=-1)
    return np.clip(img + 96.0, 0, 255).astype(np.uint8)


def main() -> None:
    import jax

    from jpgenc_tpu.api import encode
    from jpgenc_tpu.engine import get_plan, luts_from_tables, qtables_for_quality
    from jpgenc_tpu.layout import make_layout
    from jpgenc_tpu.ref.encoder import standard_tables

    h, w = 1080, 1920
    img = _test_image(h, w)

    # Warm up / compile (also validates the output parses as a JFIF file).
    out = encode(img, quality=75, subsampling="420")
    assert out[:2] == b"\xff\xd8" and out[-2:] == b"\xff\xd9"

    layout = make_layout(h, w, "420", 0)
    plan = get_plan(layout)
    _, qt_dev = qtables_for_quality(75)
    dc_t, ac_t = standard_tables()
    luts = luts_from_tables(dc_t, ac_t)

    # --- device-pipeline-only steady state (diagnostic, stderr)
    img_dev = jax.device_put(img)
    jax.block_until_ready(plan.encode_segments(img_dev, qt_dev, luts))
    n_dev = 20
    t0 = time.perf_counter()
    for _ in range(n_dev):
        r = plan.encode_segments(img_dev, qt_dev, luts)
    jax.block_until_ready(r)
    dev_s = (time.perf_counter() - t0) / n_dev

    # --- end-to-end encode-to-bytes steady state (the reported metric)
    n_e2e = 10
    t0 = time.perf_counter()
    for _ in range(n_e2e):
        out = encode(img, quality=75, subsampling="420")
    e2e_s = (time.perf_counter() - t0) / n_e2e

    mpix = h * w / 1e6
    value = mpix / e2e_s
    print(f"# device-pipeline: {mpix / dev_s:.1f} MPix/s; "
          f"end-to-end: {value:.1f} MPix/s; "
          f"bpp: {8 * len(out) / (h * w):.3f}; backend: "
          f"{jax.devices()[0].platform}", file=sys.stderr)
    print(json.dumps({
        "metric": "MPix/s/chip baseline JPEG encode @ Q=75 (1080p RGB 4:2:0, end-to-end to JFIF bytes)",
        "value": round(value, 2),
        "unit": "MPix/s",
        "vs_baseline": round(value / TARGET_MPIX_S, 4),
    }))


if __name__ == "__main__":
    main()
