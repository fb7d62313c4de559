#!/usr/bin/env python
"""A/B the K1 variants on the real chip: XLA vs Pallas-u8-repack vs dense."""
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

from jpgenc_tpu.engine import pixels_to_scan, qtables_for_quality
from jpgenc_tpu.layout import make_layout
from jpgenc_tpu.ops.pallas import k1_dct
from jpgenc_tpu.utils.fixtures import synth_frame

H, W, B = 1080, 1920, 8
N = 6


def timed(name, fn, imgs):
    out = fn(imgs)
    jax.block_until_ready(out)
    s = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn(imgs)
        s = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / N
    print(f"{name:36s} {dt * 1e3 / B:8.2f} ms/frame   (chk {s:.6g})")


def main():
    layout = make_layout(H, W, "420", 0)
    _, qt_dev = qtables_for_quality(75)
    imgs = jax.device_put(np.stack([synth_frame(H, W) for _ in range(B)]))

    @jax.jit
    def f_xla(imgs):
        return jax.vmap(lambda im: pixels_to_scan(im, layout, qt_dev))(imgs)

    def make_pallas():
        @jax.jit
        def f(imgs):
            return jax.vmap(lambda im: k1_dct.fused_pixels_to_scan(
                im, layout, qt_dev))(imgs)
        return f

    timed("XLA pixels_to_scan", f_xla, imgs)
    k1_dct.K1_DENSE = False
    timed("Pallas u8-repack", make_pallas(), imgs)
    k1_dct.K1_DENSE = True
    timed("Pallas dense (DMA/word)", make_pallas(), imgs)


if __name__ == "__main__":
    main()
