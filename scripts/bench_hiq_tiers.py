"""High-quality entropy-tier experiment (VERDICT r3 #3 / ADVICE low #4).

Measures the bench's Q-sweep configuration (1080p 4:2:0 + DRI120, batch 64,
pipelined, median) at Q85/Q90/Q95 for several w_blk tiers, fused (K1A) and
split, on the real chip. Run standalone:

    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
        timeout 580 python scripts/bench_hiq_tiers.py 24 32
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax
    from jax.sharding import Mesh

    import bench as BM
    from jpgenc_tpu.container.jfif import build_headers
    from jpgenc_tpu.layout import make_layout
    from jpgenc_tpu.ops import pack as P
    from jpgenc_tpu.parallel.mesh import put_batch

    from jpgenc_tpu.utils.fixtures import synth_batch

    w_blks = [int(a) for a in sys.argv[1:]] or [24, 32]
    qualities = [int(q) for q in os.environ.get("HIQ_QS", "90,95").split(",")]

    H, W, B, B_UP = BM.H, BM.W, BM.B, BM.B_UP
    mesh = Mesh(np.array(jax.devices()[:1]), ("batch",))
    frames = synth_batch(H, W, B_UP)
    rlayout = make_layout(H, W, "420", 120)
    mpix = B * H * W / 1e6

    if os.environ.get("HIQ_FORCE_FUSED") == "1":
        # probe the fused path beyond the current k1a_applicable w_blk cap
        # (the chunk-store merge bounds the scoped-VMEM live set)
        from jpgenc_tpu.ops.pallas import k1a_fused as KF
        KF.k1a_applicable = lambda lay, wb=8: (
            wb <= 56 and lay.mcus_x % 8 == 0 and not lay.is_gray)

    frames_dev = None
    orig = P.w_blk_for_quality
    try:
        for wb in w_blks:
            P.w_blk_for_quality = lambda q, _wb=wb: _wb
            for q in qualities:
                plan, fns, qt_host, qt_dev, tabs, luts = BM._pipeline_fns(
                    rlayout, q, B, mesh)
                if frames_dev is None:
                    reps = -(-B // B_UP)
                    tile = jax.jit(
                        lambda x: jax.numpy.concatenate([x] * reps, axis=0)[:B],
                        out_shardings=fns["sharding_img"])
                    frames_dev = tile(put_batch(frames, fns["sharding_img"]))
                    frames_dev.block_until_ready()
                hdr = build_headers(rlayout, list(qt_host), *tabs)
                t0 = time.time()
                sec, outs = BM._run_pipeline(rlayout, plan, fns, qt_dev, luts,
                                             frames_dev, hdr, B, n_iter=8)
                from jpgenc_tpu.engine import use_pallas_default
                from jpgenc_tpu.ops.pallas.k1a_fused import k1a_applicable
                fused = use_pallas_default() and k1a_applicable(rlayout, wb)
                print(f"Q{q} w_blk={wb} ({'fused' if fused else 'split'}): "
                      f"{mpix / sec:.0f} MPix/s "
                      f"(wall {time.time() - t0:.0f}s incl warm)",
                      flush=True)
    finally:
        P.w_blk_for_quality = orig


if __name__ == "__main__":
    main()
