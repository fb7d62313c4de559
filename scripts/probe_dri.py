"""Isolate the restart-interval cost: Q75 batch-64 1080p with and without
DRI=120, plus stagewise timing of the DRI path. Run alone."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import numpy as np


from jpgenc_tpu.container.jfif import build_headers
from jpgenc_tpu.layout import make_layout
from jpgenc_tpu.parallel.mesh import default_mesh, put_batch
from jpgenc_tpu.utils.fixtures import synth_frame

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B

H, W, NB = 1080, 1920, 64
mesh = default_mesh()
frames = np.stack([synth_frame(H, W, seed=7 + i) for i in range(16)])

for name, rst, q in (("q75_nodri", 0, 75), ("q75_dri120", 120, 75),
                     ("q50_dri120", 120, 50)):
    layout = make_layout(H, W, "420", rst)
    plan, fns, qt_host, qt_dev, tabs, luts = B._pipeline_fns(
        layout, q, NB, mesh)
    hdr = build_headers(layout, list(qt_host), *tabs)
    tile = jax.jit(lambda x: jax.numpy.tile(x, (NB // 16, 1, 1, 1)),
                   out_shardings=fns["sharding_img"])
    fdev = tile(put_batch(frames, fns["sharding_img"]))
    fdev.block_until_ready()
    sec, outs = B._run_pipeline(layout, plan, fns, qt_dev, luts, fdev,
                                hdr, NB, n_iter=10)
    print(f"{name}: {NB*H*W/1e6/sec:.1f} MPix/s "
          f"({len(outs[0])/1e3:.0f} KB/frame)")
