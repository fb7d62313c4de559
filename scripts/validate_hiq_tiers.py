"""Hardware validation for the high-quality w_blk tiers (round 4).

Compiles and runs the fused K1A kernel at w_blk 16/24/32 on a 4K frame
(the ladder's tiers at the largest production mcus_x=240) and checks the
per-block bit counts agree across tiers; then runs a full api.encode at
Q90/Q95 (new w16 first tier) and verifies the files decode via Pillow.

    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
        timeout 3000 python -u scripts/validate_hiq_tiers.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import io

    import jax.numpy as jnp
    from PIL import Image

    from jpgenc_tpu.engine import luts_from_tables, qtables_for_quality
    from jpgenc_tpu.ops.pallas.block_pack import packed_tables
    from jpgenc_tpu.layout import make_layout
    from jpgenc_tpu.ops.pallas.k1a_fused import (fused_pixels_to_pack,
                                                 k1a_applicable)
    from jpgenc_tpu.ref.encoder import standard_tables
    from jpgenc_tpu.utils.fixtures import synth_frame

    img4k = synth_frame(2160, 3840)
    lay = make_layout(2160, 3840, "420", 0)
    _, qt_dev = qtables_for_quality(90)
    dc_t, ac_t = standard_tables()
    tables = packed_tables(luts_from_tables(dc_t, ac_t))
    img_dev = jnp.asarray(img4k)

    bits_ref = None
    for wb in (16, 24, 32):
        assert k1a_applicable(lay, wb), wb
        t0 = time.time()
        buf, bits = fused_pixels_to_pack(img_dev, lay, qt_dev, tables, wb)
        b = np.asarray(bits)
        print(f"4K w_blk={wb}: ok in {time.time() - t0:.0f}s, "
              f"total bits {int(b.sum())}, max/block {int(b.max())}",
              flush=True)
        if bits_ref is None:
            bits_ref = b
        else:
            assert np.array_equal(b, bits_ref), f"bit counts differ at {wb}"

    from jpgenc_tpu.api import encode
    img = synth_frame(1080, 1920)
    for q in (90, 95):
        t0 = time.time()
        data = encode(img, quality=q, subsampling="420")
        dec = np.asarray(Image.open(io.BytesIO(data)))
        err = float(np.mean((dec.astype(np.float32)
                             - img.astype(np.float32)) ** 2))
        psnr = 10 * np.log10(255.0 ** 2 / max(err, 1e-9))
        print(f"Q{q} api.encode (w16 tier): {len(data)} bytes, "
              f"psnr {psnr:.1f} dB, {time.time() - t0:.0f}s", flush=True)
        assert psnr > 30
    print("VALIDATION OK", flush=True)


if __name__ == "__main__":
    main()
