#!/usr/bin/env python
"""Stage split of single-image decode + threaded host entropy decode scaling.

Decode = host entropy decode (C++, now segment-parallel over RSTn) +
coefficient upload + device reconstruction (+ optional pixel download).
This probe separates them to show where the time goes per shape.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def t(label, fn, n=5):
    fn()  # warm
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    print(f"{label:46s} {med*1e3:8.1f} ms", flush=True)
    return med


def main():
    from jpgenc_tpu.api import encode
    from jpgenc_tpu.container.parser import parse_jpeg
    from jpgenc_tpu.decoder import decode, layout_from_parsed, scan_pairs
    from jpgenc_tpu.utils.fixtures import synth_frame

    for (h, w, q, dri, tag) in [(1080, 1920, 75, 8, "1080p Q75"),
                                (2160, 3840, 95, 8, "4K Q95")]:
        img = synth_frame(h, w)
        data = encode(img, quality=q, restart_interval=dri)
        parsed = parse_jpeg(data)
        layout = layout_from_parsed(parsed)
        mp = h * w / 1e6
        print(f"--- {tag}: {len(parsed.scan_data)/1e6:.2f} MB scan, "
              f"{layout.n_segments} segments, {mp:.1f} MPix")
        s1 = t("host scan_pairs serial (n_threads=1)",
               lambda: scan_pairs(parsed, layout, n_threads=1))
        sN = t("host scan_pairs threaded (auto)",
               lambda: scan_pairs(parsed, layout, n_threads=0))
        print(f"  host decode speedup {s1/sN:.2f}x "
              f"({mp/s1:.1f} -> {mp/sN:.1f} MPix/s host-only)")
        sd = t("decode(to_device=True) e2e",
               lambda: np.asarray(decode(data, to_device=True)[-1, -1]))
        print(f"  -> {mp/sd:.1f} MPix/s (host + upload + recon, no download)")
        sf = t("decode() e2e incl. pixel download",
               lambda: decode(data), n=3)
        print(f"  -> {mp/sf:.1f} MPix/s")


if __name__ == "__main__":
    main()
