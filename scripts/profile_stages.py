#!/usr/bin/env python
"""Stage-cost profiler for the encode pipeline on the real chip.

Timing methodology per docs/PERFORMANCE.md: block_until_ready returns early
on this platform, so every timed loop chains iterations through a data
dependency and fetches a scalar at the end.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jpgenc_tpu.engine import (get_plan, luts_from_tables, pixels_to_scan,
                               qtables_for_quality, scan_caps,
                               scan_to_segments_blocked)
from jpgenc_tpu.layout import make_layout
from jpgenc_tpu.ops import color as C
from jpgenc_tpu.ops import transform as X
from jpgenc_tpu.ops.pack import compact_unstuffed, w_blk_for_quality
from jpgenc_tpu.ref.encoder import standard_tables
from jpgenc_tpu.utils.fixtures import synth_frame

H, W, B = 1080, 1920, 8
N_ITER = 6


def timed(name, fn, *args, n=N_ITER):
    out = fn(*args)
    jax.block_until_ready(out)
    # force completion by fetching a scalar derived from every output leaf
    def fetch(o):
        leaves = jax.tree.leaves(o)
        return float(sum(jnp.sum(jax.lax.bitcast_convert_type(
            l, jnp.int32) if l.dtype == jnp.uint32 else l.astype(jnp.float32)
        ).astype(jnp.float32) for l in leaves))
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        s = fetch(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s} {dt * 1e3 / B:8.2f} ms/frame   (chk {s:.3g})")
    return dt


def main():
    layout = make_layout(H, W, "420", 0)
    plan = get_plan(layout)
    qt_host, qt_dev = qtables_for_quality(75)
    dc_t, ac_t = standard_tables()
    luts = luts_from_tables(dc_t, ac_t)
    cap_u, cap_s = scan_caps(layout, 75, "tight")
    w_blk = w_blk_for_quality(75)
    n_seg = layout.n_segments

    frames = np.stack([synth_frame(H, W) for _ in range(B)])
    imgs = jax.device_put(frames)
    c0 = layout.comps[0]

    @jax.jit
    def f_k1(imgs):
        return jax.vmap(lambda im: pixels_to_scan(im, layout, qt_dev))(imgs)

    @jax.jit
    def f_color(imgs):
        def one(im):
            p = C.pad_replicate(im, c0.plane_h, c0.plane_w)
            ycc = C.rgb_to_ycbcr(p)
            return (ycc[..., 0], C.subsample(ycc[..., 1], c0.hs, c0.vs),
                    C.subsample(ycc[..., 2], c0.hs, c0.vs))
        return jax.vmap(one)(imgs)

    @jax.jit
    def f_dct(planes):
        y, cb, cr = planes
        def one(y1, cb1, cr1):
            return (X.plane_to_zigzag(y1, qt_dev[0]),
                    X.plane_to_zigzag(cb1, qt_dev[1]),
                    X.plane_to_zigzag(cr1, qt_dev[1]))
        return jax.vmap(one)(y, cb, cr)

    @jax.jit
    def f_entropy(zz):
        def one(z):
            return scan_to_segments_blocked(z, plan.plan, luts, n_seg, w_blk,
                                            use_pallas=True)
        return jax.vmap(one)(zz)

    @jax.jit
    def f_stuff(packed):
        w, b, ovf = packed
        def one(w1, b1):
            return compact_unstuffed(w1, b1, cap_u)
        return jax.vmap(one)(w, b)

    print(f"batch={B}, {H}x{W} 4:2:0 Q75; per-frame stage costs:")
    timed("K1 whole: pixels->scan-order zz", f_k1, imgs)
    planes = f_color(imgs)
    timed("  color+subsample only", f_color, imgs)
    timed("  DCT+quant+zigzag only (3 planes)", f_dct, planes)
    zz = f_k1(imgs)
    timed("entropy: kernel A + kernel B", f_entropy, zz)
    packed = f_entropy(zz)
    timed("stuff_compact", f_stuff, packed)


if __name__ == "__main__":
    main()
