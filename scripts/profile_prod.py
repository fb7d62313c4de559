#!/usr/bin/env python
"""Production-path stage profiler (the stages bench.py actually runs)."""
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

from jpgenc_tpu.engine import (get_plan, luts_from_tables, qtables_for_quality,
                               scan_caps)
from jpgenc_tpu.layout import make_layout
from jpgenc_tpu.ops.pack import compact_unstuffed, w_blk_for_quality
from jpgenc_tpu.ops.pallas.block_pack import (fused_block_pack, packed_tables,
                                              slot_metadata)
from jpgenc_tpu.ops.pallas.k1_dct import fused_pixels_to_scan
from jpgenc_tpu.ops.pallas.seg_merge import fused_seg_merge
from jpgenc_tpu.ref.encoder import standard_tables
from jpgenc_tpu.utils.fixtures import synth_frame

H, W, B = 1080, 1920, int(__import__("os").environ.get("PB", "8"))
N = 8


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)

    def fetch(o):
        leaves = jax.tree.leaves(o)
        return float(sum(jnp.sum(jax.lax.bitcast_convert_type(
            l, jnp.int32).astype(jnp.float32) if l.dtype == jnp.uint32
            else l.astype(jnp.float32)) for l in leaves))
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn(*args)
        s = fetch(out)
    dt = (time.perf_counter() - t0) / N
    print(f"{name:44s} {dt * 1e3 / B:7.2f} ms/frame  (chk {s:.4g})")
    return out


def main():
    layout = make_layout(H, W, "420", 0)
    plan_d = get_plan(layout)
    plan = plan_d.plan
    _, qt_dev = qtables_for_quality(75)
    dc_t, ac_t = standard_tables()
    luts = luts_from_tables(dc_t, ac_t)
    tabs = packed_tables(luts)
    cap_u, _ = scan_caps(layout, 75, "tight")
    w_blk = w_blk_for_quality(75)
    n_seg = layout.n_segments
    print(f"w_blk={w_blk} cap_u={cap_u} n_seg={n_seg} "
          f"spb={layout.blocks_per_segment}")

    imgs = jax.device_put(np.stack([synth_frame(H, W) for _ in range(B)]))

    f_k1 = jax.jit(jax.vmap(
        lambda im: fused_pixels_to_scan(im, layout, qt_dev)))
    f_meta = jax.jit(jax.vmap(lambda z: slot_metadata(plan, z)))
    f_a = jax.jit(lambda z, m: jax.vmap(
        lambda z1, dd, at, dt_, vl: fused_block_pack(
            z1, dd, at, dt_, vl, tables=tabs, w_blk=w_blk))(z, *m))
    f_b = jax.jit(jax.vmap(
        lambda buf, bits: fused_seg_merge(buf, bits, n_seg, w_blk)))
    f_cu = jax.jit(jax.vmap(lambda w, b: compact_unstuffed(w, b, cap_u)))

    fns = plan_d.bytes_fns(cap_u, w_blk)
    f_all = jax.jit(jax.vmap(
        lambda im: fns["encode"](im, qt_dev, plan, plan_d.scan_flat, luts)))

    zz = timed("K1 dense pixels->zz (Pallas)", f_k1, imgs)
    meta = timed("slot metadata (XLA)", f_meta, zz)
    ab = timed("kernel A fused_block_pack", f_a, zz, meta)
    segs = timed("kernel B fused_seg_merge", f_b, *ab)
    timed("compact_unstuffed", f_cu, *segs)
    timed("FULL encode->compact bytes", f_all, imgs)


if __name__ == "__main__":
    main()
