#!/usr/bin/env python
"""Scaling report: batched encode throughput vs device count.

On a box without a pod slice this runs on virtual CPU devices
(--xla_force_host_platform_device_count), which still exercises the real
sharding/collective code paths and shows the parallel fraction; on a real
v5e slice the same script reports chips-scaling (BASELINE.json:5 target:
near-linear frames/s from 1 chip to 2 hosts).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/scaling_report.py [--devices 1,2,4,8] [--batch 16]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", default="256x384")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    from jpgenc_tpu.parallel.mesh import encode_batch

    h, w = (int(x) for x in args.size.split("x"))
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (args.batch, h, w, 3), dtype=np.uint8)
    all_devs = jax.devices()
    base = None
    for n in [int(x) for x in args.devices.split(",")]:
        if n > len(all_devs):
            continue
        mesh = Mesh(np.array(all_devs[:n]), ("batch",))
        outs = encode_batch(imgs, quality=75, mesh=mesh)      # compile/warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            outs = encode_batch(imgs, quality=75, mesh=mesh)
        dt = (time.perf_counter() - t0) / args.iters
        fps = args.batch / dt
        if base is None:
            base = fps
        row = {
            "devices": n,
            "frames_per_s": round(fps, 2),
            "speedup": round(fps / base, 2),
            "efficiency": round(fps / base / n, 3),
            "bytes0": len(outs[0]),
        }
        if all_devs[0].platform == "cpu":
            # virtual CPU devices SHARE the host's physical cores: total
            # compute throughput is fixed, so speedup here validates the
            # sharding/collective semantics, not the chips-scaling curve —
            # run on a real slice for that (BASELINE.json:5 target)
            row["note"] = "virtual CPU devices share cores; semantics check"
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
