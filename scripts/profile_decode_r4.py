"""Round-4 decode stage split at the bench operating point (64x1080p,
fused Pallas reconstruction): host phases, upload, scatter-only vs full
recon dispatch, and a chunk-size retune. Run alone (bench-isolation)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import jpgenc_tpu.decoder as D
from jpgenc_tpu.api import encode
from jpgenc_tpu.container.parser import parse_jpeg
from jpgenc_tpu.utils.fixtures import synth_frame

NB = 64
H, W = 1080, 1920


def med(fn, n=5, warm=1):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    frames = [synth_frame(H, W, seed=7 + i) for i in range(16)]
    files = [encode(f, quality=75) for f in frames] * (NB // 16)
    print("files ready", flush=True)

    # ---- host phases ----
    parsed = [parse_jpeg(d) for d in files]
    layout = D.layout_from_parsed(parsed[0])
    sec = med(lambda: [parse_jpeg(d) for d in files])
    print(f"parse x{NB}: {sec*1e3:.0f} ms", flush=True)

    from concurrent.futures import ThreadPoolExecutor

    def scan_all():
        with ThreadPoolExecutor(max_workers=8) as ex:
            return list(ex.map(
                lambda p: D.scan_packed(p, layout, n_threads=1), parsed))

    sec = med(scan_all)
    packed = scan_all()
    print(f"scan_packed x{NB} (8 threads): {sec*1e3:.0f} ms", flush=True)

    n_total = sum(c.n_blocks for c in layout.comps)
    n64 = n_total * 64
    n_scan64 = layout.n_scan * 64
    chunk = 16
    pk = [(m, D._scan_space_eidx(e, layout), v) for (m, e, v) in packed]

    def flatten_all():
        return [D._flatten_packed(pk[c0:c0 + chunk], n_scan64, n64)
                for c0 in range(0, NB, chunk)]

    sec = med(flatten_all)
    flats = flatten_all()
    print(f"flatten x{NB//chunk} chunks: {sec*1e3:.0f} ms", flush=True)

    cap_m = D._eighth_cap(max(m.shape[0] for m, _, _ in flats))
    cap_e = D._exc_cap(max(e.size for _, e, _ in flats))
    sec = med(lambda: [D._pad_packed(*f, cap_m, cap_e, chunk * n64)
                       for f in flats])
    pads = [D._pad_packed(*f, cap_m, cap_e, chunk * n64) for f in flats]
    print(f"pad x{NB//chunk}: {sec*1e3:.0f} ms "
          f"(cap_m {cap_m}, {cap_m*2/1e6:.1f} MB/chunk)", flush=True)

    # ---- upload ----
    def up():
        outs = [(jnp.asarray(mp), jnp.asarray(exc)) for mp, exc in pads]
        for a, b in outs:
            a.block_until_ready(), b.block_until_ready()
        return outs

    sec = med(up)
    ups = up()
    print(f"upload {4*cap_m*2/1e6:.0f} MB: {sec*1e3:.0f} ms", flush=True)

    # ---- device: scatter-only vs full recon ----
    c0l = layout.comps[0]
    L = (c0l.hs * c0l.vs + 2) * 64
    B = chunk

    @jax.jit
    def scatter_only(main, exc):
        pos = jnp.cumsum(main[:, 0].astype(jnp.int32)) - 1
        val = jax.lax.bitcast_convert_type(main[:, 1],
                                           jnp.int8).astype(jnp.int16)
        flat = jnp.zeros((B * n_scan64,), jnp.int16)
        hints = B * n_scan64 + 255 * main.shape[0] < 2**31
        flat = flat.at[pos].add(val, mode="drop",
                                indices_are_sorted=hints,
                                unique_indices=hints)
        eidx = (exc[0].astype(jnp.int32) & 0xFFFF) | \
            (exc[1].astype(jnp.int32) << 16)
        flat = flat.at[eidx].set(exc[2], mode="drop")
        return jnp.sum(flat.astype(jnp.int32))

    def run_scatter():
        outs = [scatter_only(a, b) for a, b in ups]
        [float(o) for o in outs]

    sec = med(run_scatter)
    print(f"scatter-only x{NB//chunk} chunks: {sec*1e3:.0f} ms", flush=True)

    qts = [jnp.asarray(np.stack([np.asarray(q).reshape(64).astype(np.int32)
                                 for q in D._qts_of(parsed[0])] * 1))
           for _ in range(1)]
    qts_b = [jnp.asarray(np.stack(
        [np.asarray(q).reshape(64).astype(np.int32)] * chunk))
        for q in D._qts_of(parsed[0])]
    fn = D._recon_jit(layout, batch=chunk, form="fused_packedflat")

    def run_full():
        outs = [fn(a, b, qts_b) for a, b in ups]
        for o in outs:
            np.asarray(o[-1, -1, -1])

    sec = med(run_full)
    print(f"scatter+recon x{NB//chunk} chunks: {sec*1e3:.0f} ms", flush=True)

    # ---- end-to-end chunk retune ----
    for ch in (8, 16, 32):
        def e2e():
            outs = D.decode_batch(files, to_device=True, chunk=ch)
            for o in outs:
                np.asarray(o[-1, -1, -1])

        sec = med(e2e, n=5, warm=2)
        print(f"decode_batch chunk={ch}: {sec*1e3:.0f} ms = "
              f"{NB*H*W/1e6/sec:.0f} MPix/s", flush=True)


if __name__ == "__main__":
    main()
