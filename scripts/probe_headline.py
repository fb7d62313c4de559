#!/usr/bin/env python
"""Headline-only probe: per-iteration timings for the 1080p device pipeline.

Diagnoses run-to-run headline variance (533 vs 805 MPix/s across bench
processes) by printing every iteration's wall time in a fresh process with
minimal staging-pool usage.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

H, W = 1080, 1920
B = int(os.environ.get("BENCH_BATCH", "64"))
B_UP = min(B, 16)


def main():
    import jax
    from jax.sharding import Mesh

    from bench import _pipeline_fns
    from jpgenc_tpu.container.jfif import build_headers
    from jpgenc_tpu.engine import fetch_prefix, finalize_host_w, prefix_slice
    from jpgenc_tpu.layout import make_layout
    from jpgenc_tpu.parallel.mesh import put_batch
    from jpgenc_tpu.utils.fixtures import synth_batch

    mesh = Mesh(np.array(jax.devices()[:1]), ("batch",))
    frames = synth_batch(H, W, B_UP)
    layout = make_layout(H, W, "420", 0)
    plan, fns, qt_host, qt_dev, tabs, luts = _pipeline_fns(layout, 75, B, mesh)
    hdr = build_headers(layout, list(qt_host), *tabs)
    reps = -(-B // B_UP)
    tile = jax.jit(lambda x: jax.numpy.concatenate([x] * reps, axis=0)[:B],
                   out_shardings=fns["sharding_img"])
    frames_dev = tile(put_batch(frames, fns["sharding_img"]))
    frames_dev.block_until_ready()

    n_rst = layout.n_segments - 1
    cap_w = fns["caps"][0] // 4
    guess = [1024]

    def launch():
        u, nbits, ovf = fns["encode_bytes"](
            frames_dev, qt_dev, plan.plan, plan.scan_flat, luts)
        return prefix_slice(u, guess[0] - 1), nbits, ovf, u

    def collect(pend):
        up_dev, nbits, ovf, u = pend
        up, nb, ov = jax.device_get((up_dev, nbits, ovf))
        from jpgenc_tpu.ops.pack import seg_nwords_aligned, walign_for
        wal = walign_for(layout.blocks_per_segment)
        total_w = int(seg_nwords_aligned(nb, wal).sum(axis=1).max())
        assert not ov.any() and total_w <= cap_w
        if total_w > up.shape[-1]:
            up = fetch_prefix(u, total_w)
        guess[0] = max(total_w, 1024)
        return [hdr + finalize_host_w(up[i], nb[i], 0, n_rst, wal) + b"\xff\xd9"
                for i in range(B)]

    collect(launch())  # compile + warm
    mpix = B * H * W / 1e6
    n_iter = int(os.environ.get("PROBE_ITERS", "10"))
    pending = launch()
    for k in range(n_iter):
        t0 = time.perf_counter()
        nxt = launch()
        collect(pending)
        dt = time.perf_counter() - t0
        pending = nxt
        print(f"iter {k}: {dt*1e3:7.1f} ms  {mpix/dt:7.1f} MPix/s", flush=True)
    collect(pending)


if __name__ == "__main__":
    main()
