"""Stage split of the restart-interval (DRI=120) encode penalty at batch 64.
Times the fused K1A+B pipeline with and without the wcompact stage, for
rst=0 vs rst=120. Run alone."""
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

from jpgenc_tpu.engine import get_plan, qtables_for_quality, luts_from_tables, scan_caps
from jpgenc_tpu.layout import make_layout
from jpgenc_tpu.ops.pack import (w_blk_for_quality, walign_for,
                                 wcompact_unstuffed)
from jpgenc_tpu.ops.pallas.block_pack import packed_tables
from jpgenc_tpu.ops.pallas.k1a_fused import fused_pixels_to_pack
from jpgenc_tpu.ops.pallas.seg_merge import fused_seg_merge
from jpgenc_tpu.parallel.mesh import default_mesh, put_batch
from jpgenc_tpu.ref.encoder import standard_tables
from jpgenc_tpu.utils.fixtures import synth_frame

H, W, NB = 1080, 1920, 64
mesh = default_mesh()
sh_img = NamedSharding(mesh, P("batch", None, None, None))
frames = np.stack([synth_frame(H, W, seed=7 + i) for i in range(16)])
frames_dev = jax.jit(lambda x: jnp.tile(x, (NB // 16, 1, 1, 1)),
                     out_shardings=sh_img)(put_batch(frames, sh_img))
frames_dev.block_until_ready()

_, qt_dev = qtables_for_quality(75)
luts = luts_from_tables(*standard_tables())
ptabs = packed_tables(luts)
w_blk = w_blk_for_quality(75)


def bench(fn, *args, n=8):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0][0, :1])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0][0, :1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


for rst in (0, 120):
    layout = make_layout(H, W, "420", rst)
    n_seg = layout.n_segments
    cap_u = scan_caps(layout, 75, "tight")[0]

    @jax.jit
    def pack_only(imgs):
        def one(img):
            return fused_pixels_to_pack(img, layout, qt_dev, ptabs, w_blk)
        return jax.vmap(one)(imgs)

    @jax.jit
    def pack_merge(imgs):
        def one(img):
            buf, bits = fused_pixels_to_pack(img, layout, qt_dev, ptabs,
                                             w_blk)
            return fused_seg_merge(buf, bits, n_seg, w_blk)
        return jax.vmap(one)(imgs)

    @jax.jit
    def full(imgs):
        def one(img):
            buf, bits = fused_pixels_to_pack(img, layout, qt_dev, ptabs,
                                             w_blk)
            w, b = fused_seg_merge(buf, bits, n_seg, w_blk)
            return wcompact_unstuffed(w, b, cap_u // 4,
                                      walign_for(layout.blocks_per_segment))
        return jax.vmap(one)(imgs)

    t1 = bench(pack_only, frames_dev)
    t2 = bench(pack_merge, frames_dev)
    t3 = bench(full, frames_dev)
    print(f"rst={rst} n_seg={n_seg}: K1A {t1*1e3:.1f} ms | +merge "
          f"{t2*1e3:.1f} | +wcompact {t3*1e3:.1f}  (batch {NB})")
