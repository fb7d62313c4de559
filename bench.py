#!/usr/bin/env python
"""Benchmark driver (SURVEY.md component #23): one JSON line on stdout.

Metric: MPix/s/chip, baseline JPEG encode at Q=75, RGB 1080p 4:2:0, standard
Annex K tables — the BASELINE.json:2 north-star. `vs_baseline` is the ratio
against the implied per-chip target of 625 MPix/s (10 GPix/s aggregate on a
v5e-16, BASELINE.json:5; the reference itself publishes no numbers).

Headline: sustained batched encode-to-JFIF-bytes with device-resident input
(the production shape: frames arrive from an on-device producer; the device
pipeline emits stuffed scan bytes, BASELINE.json:5 contract). Every timed
iteration fetches the packed buffers to host and assembles real JFIF files,
so completion is forced — `block_until_ready` alone is unreliable on this
platform. The full path including host->device pixel upload is reported on
stderr as "e2e+upload".
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
H, W, B = 1080, 1920, 8


def _test_frames(h: int, w: int, b: int) -> np.ndarray:
    from jpgenc_tpu.utils.fixtures import synth_batch
    return synth_batch(h, w, b)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from jpgenc_tpu.container.jfif import build_headers
    from jpgenc_tpu.engine import (fetch_prefix, finalize_host, get_plan,
                                   luts_from_tables, qtables_for_quality,
                                   scan_caps)
    from jpgenc_tpu.layout import make_layout
    from jpgenc_tpu.parallel.mesh import encode_batch
    from jpgenc_tpu.ref.encoder import standard_tables
    from jax.sharding import Mesh

    from jpgenc_tpu.ops.pack import w_blk_for_quality

    frames = _test_frames(H, W, B)
    layout = make_layout(H, W, "420", 0)
    plan = get_plan(layout)
    caps = (scan_caps(layout, 75, "tight")[0], w_blk_for_quality(75))
    qt_host, qt_dev = qtables_for_quality(75)
    dc_t, ac_t = standard_tables()
    luts = luts_from_tables(dc_t, ac_t)
    hdr = build_headers(layout, list(qt_host), dc_t, ac_t)
    mpix = B * H * W / 1e6

    mesh = Mesh(np.array(jax.devices()[:1]), ("batch",))
    from jpgenc_tpu.parallel.mesh import _batched_fns
    fns = _batched_fns(plan, B, mesh, caps)
    frames_dev = jax.device_put(frames, fns["sharding_img"])
    n_rst = layout.n_segments - 1

    def run_once():
        u, nbytes, ovf = fns["encode_bytes"](
            frames_dev, qt_dev, plan.plan, plan.scan_flat, luts)
        nbytes = jax.device_get(nbytes)
        up = fetch_prefix(u, int(nbytes.sum(axis=1).max()))
        return [hdr + finalize_host(up[i], nbytes[i], 0, n_rst) + b"\xff\xd9"
                for i in range(B)]

    outs = run_once()                        # compile + warm
    assert outs[0][:2] == b"\xff\xd8" and outs[0][-2:] == b"\xff\xd9"

    n_iter = 6
    t0 = time.perf_counter()
    for _ in range(n_iter):
        outs = run_once()
    pipe_s = (time.perf_counter() - t0) / n_iter
    value = mpix / pipe_s

    # full path incl. upload (encode_batch device_puts internally)
    outs2 = encode_batch(frames, quality=75, subsampling="420", mesh=mesh)
    t0 = time.perf_counter()
    for _ in range(3):
        outs2 = encode_batch(frames, quality=75, subsampling="420", mesh=mesh)
    e2e_s = (time.perf_counter() - t0) / 3
    assert outs2[0] == outs[0], "batched paths disagree"

    print(f"# pipeline (device-resident input): {value:.2f} MPix/s; "
          f"e2e+upload: {mpix / e2e_s:.2f} MPix/s; "
          f"bpp: {8 * len(outs[0]) / (H * W):.3f}; batch={B}; "
          f"backend: {jax.devices()[0].platform}", file=sys.stderr)
    print(json.dumps({
        "metric": "MPix/s/chip baseline JPEG encode @ Q=75 (1080p RGB 4:2:0, "
                  "batched, device pipeline + packed-bytes download + host "
                  "file assembly)",
        "value": round(value, 2),
        "unit": "MPix/s",
        "vs_baseline": round(value / TARGET_MPIX_S, 4),
    }))


if __name__ == "__main__":
    main()
