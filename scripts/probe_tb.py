"""Kernel B tile-size (TB) sweep at the current w_blk=8 operating point."""
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
from jax.sharding import NamedSharding, PartitionSpec as P

from jpgenc_tpu.engine import get_plan, luts_from_tables, qtables_for_quality
from jpgenc_tpu.layout import make_layout
from jpgenc_tpu.ops.pack import w_blk_for_quality
from jpgenc_tpu.ops.pallas.block_pack import packed_tables
from jpgenc_tpu.ops.pallas.k1a_fused import fused_pixels_to_pack
from jpgenc_tpu.ops.pallas.seg_merge import fused_seg_merge
from jpgenc_tpu.parallel.mesh import default_mesh, put_batch
from jpgenc_tpu.ref.encoder import standard_tables
from jpgenc_tpu.utils.fixtures import synth_frame

H, W, NB = 1080, 1920, 64
mesh = default_mesh()
sh = NamedSharding(mesh, P("batch", None, None, None))
frames = np.stack([synth_frame(H, W, seed=7 + i) for i in range(16)])
fdev = jax.jit(lambda x: jnp.tile(x, (4, 1, 1, 1)), out_shardings=sh)(
    put_batch(frames, sh))
fdev.block_until_ready()
layout = make_layout(H, W, "420", 0)
plan = get_plan(layout)
_, qt_dev = qtables_for_quality(75)
luts = luts_from_tables(*standard_tables())
ptabs = packed_tables(luts)
w_blk = w_blk_for_quality(75)
n_seg = layout.n_segments
print("w_blk", w_blk)


def bench(tb):
    @jax.jit
    def run(imgs):
        def one(img):
            buf, bits = fused_pixels_to_pack(img, layout, qt_dev, ptabs,
                                             w_blk)
            return fused_seg_merge(buf, bits, n_seg, w_blk, tb=tb)
        return jax.vmap(one)(imgs)

    out = run(fdev)
    jax.device_get(jax.tree.leaves(out)[0][0, :1])
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        out = run(fdev)
        jax.device_get(jax.tree.leaves(out)[0][0, :1])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


for tb in (32, 64, 128, 256):
    print(f"TB={tb}: {bench(tb)*1e3:.1f} ms/batch")
