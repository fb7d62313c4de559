#!/usr/bin/env python
"""Stage-level profile of the 4K optimized-Huffman encode (BASELINE config :10).

Chained data-forced timing in a fresh process (block_until_ready returns
early on this platform, so every stage fetches a scalar to stop the clock).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def t(label, fn, n=3):
    fn()  # warm
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:38s} {best*1e3:8.1f} ms", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from jpgenc_tpu.api import encode
    from jpgenc_tpu.engine import get_plan, luts_from_tables, qtables_for_quality, scan_caps
    from jpgenc_tpu.huffman import build_codes, optimize_tables
    from jpgenc_tpu.layout import make_layout
    from jpgenc_tpu.ops.pack import w_blk_for_quality
    from jpgenc_tpu.utils.fixtures import synth_frame

    img = synth_frame(2160, 3840)
    layout = make_layout(2160, 3840, "420", 0)
    plan = get_plan(layout)
    qt_host, qt_dev = qtables_for_quality(75)

    # end-to-end first (includes everything)
    sec = t("encode(optimize=True) e2e", lambda: encode(img, 75, optimize=True), n=3)
    print(f"  -> {2160*3840/1e6/sec:.1f} MPix/s")

    img_dev = jax.device_put(img)
    jax.block_until_ready(img_dev)

    # the bench c10 shape: device-resident input
    sec = t("encode(optimize=True) device-resident",
            lambda: encode(img_dev, 75, optimize=True), n=3)
    print(f"  -> {2160*3840/1e6/sec:.1f} MPix/s")

    # api path stage 1: fused K1 + histogram, then the freq fetch sync
    def p1():
        zz_, freq_ = plan.zz_and_histogram(img_dev, qt_dev)
        np.asarray(freq_)
    t("pass1 zz_and_histogram + freq fetch", p1)

    t("upload 4K frame (24 MB)",
      lambda: jax.block_until_ready(jax.device_put(img)))

    zz = plan.zz_scan(img_dev, qt_dev)
    t("zz_scan (K1, device-resident input)",
      lambda: np.asarray(plan.zz_scan(img_dev, qt_dev)[0, 0]))

    freq = None

    def hist():
        nonlocal freq
        freq = np.asarray(plan.histogram_zz(zz))
    t("histogram_zz + fetch", hist)

    def tabs():
        n_tabs = 2
        dc = [build_codes(*optimize_tables(freq[0, t_].astype(np.int64)))
              for t_ in range(n_tabs)]
        ac = [build_codes(*optimize_tables(freq[1, t_].astype(np.int64)))
              for t_ in range(n_tabs)]
        return luts_from_tables(dc, ac)
    t("optimize_tables + build_codes x4", tabs)
    luts = tabs()

    cap_u = scan_caps(layout, 75, "tight")[0]
    w_blk = w_blk_for_quality(75)
    t("entropy_scan_bytes_zz (pass 2)",
      lambda: plan.entropy_scan_bytes_zz(zz, luts, cap_u, w_blk))

    # what does pass 2 from PIXELS cost (the non-cached alternative)?
    t("encode_scan_bytes (pixels, std tables)",
      lambda: plan.encode_scan_bytes(img_dev, qt_dev, luts, cap_u, w_blk))


if __name__ == "__main__":
    main()
