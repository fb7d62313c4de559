"""Stage split for 1080p decode: host entropy decode / coefficient upload /
recon dispatch / pixel download. Run alone (bench-isolation rules)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jpgenc_tpu.api import encode
from jpgenc_tpu.container.parser import parse_jpeg
from jpgenc_tpu.decoder import (decode_scan_to_blocks, layout_from_parsed,
                                reconstruct_pixels, _recon_jit)
from jpgenc_tpu.utils.fixtures import synth_frame


def t(fn, n=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    return (time.perf_counter() - t0) / n, out


img = synth_frame(1080, 1920)
data = encode(img, quality=75)
print(f"file {len(data)/1e3:.0f} KB")

parsed = parse_jpeg(data)
layout = layout_from_parsed(parsed)

sec, blocks = t(lambda: decode_scan_to_blocks(parsed, layout))
print(f"host entropy decode: {sec*1e3:.1f} ms")

nz = np.flatnonzero(blocks)
print(f"nonzeros: {nz.size} of {blocks.size} "
      f"({blocks.size*2/1e6:.1f} MB dense i16, "
      f"{nz.size*6/1e6:.2f} MB sparse)")

sec, _ = t(lambda: np.flatnonzero(blocks))
print(f"np.flatnonzero: {sec*1e3:.1f} ms")

blk16 = blocks.astype(np.int16)
sec, _ = t(lambda: blocks.astype(np.int16))
print(f"astype i16: {sec*1e3:.1f} ms")

def up():
    a = jax.device_put(blk16)
    a.block_until_ready()
    return a
sec, blk_dev = t(up)
print(f"upload dense i16 {blk16.nbytes/1e6:.1f} MB: {sec*1e3:.1f} ms")

vals = blocks.flat[nz].astype(np.int16)
idx = nz.astype(np.int32)
def up_sparse():
    a = jax.device_put(vals); b = jax.device_put(idx)
    b.block_until_ready()
    return a, b
sec, _ = t(up_sparse)
print(f"upload sparse {(vals.nbytes+idx.nbytes)/1e6:.2f} MB: {sec*1e3:.1f} ms")

# device densify: scatter-set into zeros
n_total = blocks.shape[0]
@jax.jit
def densify(v, i):
    flat = jnp.zeros((n_total * 64,), jnp.int16)
    return flat.at[i].set(v).reshape(n_total, 64)

v_dev, i_dev = up_sparse()
def dens():
    out = densify(v_dev, i_dev)
    jax.block_until_ready(out)
    return out
sec, dblk = t(dens)
print(f"device densify scatter ({nz.size} idx): {sec*1e3:.1f} ms")
assert np.array_equal(np.asarray(dblk), blk16), "densify mismatch"

# recon from device-resident blocks
qts = [jnp.asarray(np.asarray(parsed.qtables[c.qtab]).reshape(64)
                   .astype(np.int32)) for c in parsed.comps]
fn = _recon_jit(layout)
def recon():
    out = fn(blk_dev, qts)
    jax.block_until_ready(out)
    return out
sec, pix = t(recon)
print(f"recon dispatch (device-resident in, no download): {sec*1e3:.1f} ms")

sec, _ = t(lambda: np.asarray(pix))
print(f"pixel download {pix.nbytes/1e6:.1f} MB: {sec*1e3:.1f} ms")

sec, _ = t(lambda: reconstruct_pixels(layout, blocks, parsed.qtables,
                                      to_device=True))
print(f"reconstruct_pixels(to_device=True) total: {sec*1e3:.1f} ms")
