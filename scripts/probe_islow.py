"""islow-mode throughput on TPU: batched 1080p pixels->zigzag (integer
pipeline) vs the float K1 path, plus single-image api.encode. Run alone."""
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

from jpgenc_tpu.api import encode
from jpgenc_tpu.engine import get_plan, qtables_for_quality
from jpgenc_tpu.layout import make_layout
from jpgenc_tpu.ops.islow import image_to_zigzag_islow
from jpgenc_tpu.parallel.mesh import default_mesh, put_batch
from jpgenc_tpu.utils.fixtures import synth_frame

H, W, NB = 1080, 1920, 16
mesh = default_mesh()
sh = NamedSharding(mesh, P("batch", None, None, None))
frames = np.stack([synth_frame(H, W, seed=7 + i) for i in range(NB)])
fdev = put_batch(frames, sh)
fdev.block_until_ready()
layout = make_layout(H, W, "420", 0)
plan = get_plan(layout)
_, qt_dev = qtables_for_quality(75)


def t(fn, n=6):
    out = fn()
    jax.device_get(jax.tree.leaves(out)[0][0, :1])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.device_get(jax.tree.leaves(out)[0][0, :1])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


@jax.jit
def zz_islow_b(imgs):
    return jax.vmap(lambda im: image_to_zigzag_islow(im, layout, qt_dev)
                    [plan.scan_flat])(imgs)

sec = t(lambda: zz_islow_b(fdev))
print(f"islow pixels->zz batch{NB}: {sec*1e3:.1f} ms "
      f"({NB*H*W/1e6/sec:.1f} MPix/s)")

from jpgenc_tpu.engine import pixels_to_scan_auto, use_pallas_default
@jax.jit
def zz_float_b(imgs):
    return jax.vmap(lambda im: pixels_to_scan_auto(
        im, layout, qt_dev, use_pallas_default()))(imgs)

sec = t(lambda: zz_float_b(fdev))
print(f"float pixels->zz batch{NB}: {sec*1e3:.1f} ms "
      f"({NB*H*W/1e6/sec:.1f} MPix/s)")

img_dev = jax.device_put(frames[0])
img_dev.block_until_ready()
encode(img_dev, quality=75, dct_method="islow")
t0 = time.perf_counter()
for _ in range(3):
    data = encode(img_dev, quality=75, dct_method="islow")
sec = (time.perf_counter() - t0) / 3
print(f"api islow 1080p single: {sec*1e3:.1f} ms ({H*W/1e6/sec:.1f} MPix/s), "
      f"{len(data)/1e3:.0f} KB")
