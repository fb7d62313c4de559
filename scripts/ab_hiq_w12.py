#!/usr/bin/env python
"""Device-only A/B of high-quality first-tier widths (r5).

The r4 tier choice (w_blk=16 for Q81-95) was justified by per-block word
statistics because e2e throughput A/Bs were link-noise-bound. The r5
bench's device_only_mpix_per_s removes the link from the measurement, and
the r5 partial-chunk-flush fix makes non-multiple-of-8 tiers legal — so a
w12 tier (covers the measured worst case of 12 words/block at Q90 across
all four content classes) can now be measured honestly against w16.

Prints one JSON: device-only MPix/s per (Q, w_blk) on the bench fixture
batch, with per-run overflow checks and bit-total equality across tiers
(packing content is tier-independent; only capacity changes).
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    from jax.sharding import Mesh

    from jpgenc_tpu.engine import (get_plan, luts_from_tables,
                                   qtables_for_quality, scan_caps)
    from jpgenc_tpu.layout import make_layout
    from jpgenc_tpu.parallel.mesh import _batched_fns, put_batch
    from jpgenc_tpu.ref.encoder import standard_tables
    from jpgenc_tpu.utils.fixtures import synth_batch

    H, W, B, B_UP = 1080, 1920, 64, 16
    mesh = Mesh(np.array(jax.devices()[:1]), ("batch",))
    layout = make_layout(H, W, "420", 120)
    plan = get_plan(layout)
    luts = luts_from_tables(*standard_tables())

    frames = synth_batch(H, W, B_UP)
    reps = -(-B // B_UP)

    rows = {}
    bit_ref = {}
    frames_dev = None
    for q, wb in [(90, 16), (90, 12), (90, 8), (95, 16), (95, 12), (85, 12),
                  (85, 8)]:
        caps = (scan_caps(layout, q, "tight")[0], wb)
        fns = _batched_fns(plan, B, mesh, caps)
        if frames_dev is None:
            tile = jax.jit(
                lambda x: jax.numpy.concatenate([x] * reps, axis=0)[:B],
                out_shardings=fns["sharding_img"])
            frames_dev = tile(put_batch(frames, fns["sharding_img"]))
            frames_dev.block_until_ready()
        _, qt_dev = qtables_for_quality(q)

        def step():
            u, nbits, ovf = fns["encode_bytes"](
                frames_dev, qt_dev, plan.plan, plan.scan_flat, luts)
            return nbits, ovf
        nbits, ovf = step()
        nb_host, ovf_host = np.asarray(nbits), np.asarray(ovf)
        assert not ovf_host.any(), f"Q{q} w{wb}: tier overflow on fixture"
        if q in bit_ref:
            np.testing.assert_array_equal(nb_host, bit_ref[q],
                                          err_msg=f"Q{q} w{wb}")
        else:
            bit_ref[q] = nb_host
        t0 = time.perf_counter()
        last = None
        for _ in range(8):
            last = step()[0]
        np.asarray(last)
        dt = time.perf_counter() - t0
        rate = round(8 * B * H * W / 1e6 / dt, 2)
        rows[f"q{q}_w{wb}"] = rate
        _log(f"Q{q} w_blk={wb}: device-only {rate} MPix/s")
    print(json.dumps({"device_only_mpix_per_s": rows,
                      "batch": B, "layout": "1080p 420 DRI120"}))


if __name__ == "__main__":
    main()
