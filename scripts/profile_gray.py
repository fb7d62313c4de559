"""Stage split for the gray 512^2 batch-64 encode (bench c7). Run alone."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from jpgenc_tpu.container.jfif import build_headers
from jpgenc_tpu.engine import fetch_prefix, finalize_host_w, prefix_slice
from jpgenc_tpu.layout import make_layout
from jpgenc_tpu.ops.pack import seg_nwords_aligned, walign_for
from jpgenc_tpu.parallel.mesh import default_mesh, put_batch
from jpgenc_tpu.utils.fixtures import synth_frame

NB = 64
mesh = default_mesh()
gray = np.stack([synth_frame(512, 512)[:, :, 0] for _ in range(NB)])
layout = make_layout(512, 512, "gray", 0)
plan, fns, qt_host, qt_dev, tabs, luts = B._pipeline_fns(
    layout, 75, NB, mesh, tier="safe")
gdev = put_batch(gray, fns["sharding_img"])
gdev.block_until_ready()


def t(fn, n=8):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


# full encode_bytes dispatch, forced by a 1-word fetch
def enc():
    u, nbits, ovf = fns["encode_bytes"](gdev, qt_dev, plan.plan,
                                        plan.scan_flat, luts)
    jax.device_get(u[0, :1])
    return u, nbits, ovf

sec = t(enc)
print(f"encode_bytes dispatch (forced 1-word fetch): {sec*1e3:.1f} ms/batch")

u, nbits, ovf = fns["encode_bytes"](gdev, qt_dev, plan.plan,
                                    plan.scan_flat, luts)
nb = np.asarray(nbits)
_wal = walign_for(layout.blocks_per_segment)
total_w = int(seg_nwords_aligned(nb, _wal).sum(axis=-1).max())
print(f"total_w {total_w} words/frame ({total_w*4/1024:.0f} KB), "
      f"x{NB} = {total_w*4*NB/1e6:.1f} MB fetch")

def fetch():
    jax.device_get((prefix_slice(u, total_w - 1), nbits, ovf))
sec = t(fetch)
print(f"3-tuple metadata+prefix fetch: {sec*1e3:.1f} ms/batch")

from jpgenc_tpu.engine import combined_fetch, split_fetch
def fetch_c():
    h, k = combined_fetch(u, nbits, ovf, total_w)
    return split_fetch(np.asarray(h), k, layout.n_segments)
sec = t(fetch_c)
print(f"combined single-array fetch: {sec*1e3:.1f} ms/batch")

up, nb2, ov = fetch_c()
hdr = build_headers(layout, list(qt_host), *tabs)
def host():
    return [hdr + finalize_host_w(up[i], nb2[i], 0, layout.n_segments - 1,
                                  _wal)
            + b"\xff\xd9" for i in range(NB)]
sec = t(host)
print(f"host finalize x{NB}: {sec*1e3:.1f} ms/batch")
