"""Quick TPU decode throughput probe (run alone)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from jpgenc_tpu.api import decode, decode_batch, encode
from jpgenc_tpu.utils.fixtures import synth_frame

H, W, NB = 1080, 1920, 8
img = synth_frame(H, W)
data = encode(img, quality=75)
files = [data] * NB

out1 = decode(data)
assert out1.shape == (H, W, 3)
t0 = time.perf_counter()
for _ in range(3):
    decode(data)
print(f"single: {H*W/1e6/((time.perf_counter()-t0)/3):.2f} MPix/s")

decode_batch(files)
t0 = time.perf_counter()
for _ in range(3):
    decode_batch(files)
print(f"batch{NB}: {NB*H*W/1e6/((time.perf_counter()-t0)/3):.2f} MPix/s")

def dev():
    out = decode_batch(files, to_device=True)
    np.asarray(out[-1, -1, -1])
dev()
t0 = time.perf_counter()
for _ in range(3):
    dev()
print(f"to_device{NB}: {NB*H*W/1e6/((time.perf_counter()-t0)/3):.2f} MPix/s")
