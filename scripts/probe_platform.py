#!/usr/bin/env python
"""Attestable platform cost-model probe (VERDICT r4 #6).

The performance ledger (docs/PERFORMANCE.md) rests on a handful of measured
platform constants — the host<->device link rates, the ~27-36 ms
sync-dispatch floor, the ~10 ns/data-dependent-index gather cost, the
~1.3 GB/process staging pool. Those constants DRIVE design decisions
(device-Huffman rejection, packed upload forms, e2e row interpretation), so
they must be re-measurable in one command rather than trusted as prose.
This script measures them and prints ONE JSON object.

Modes (flags compose):
    python scripts/probe_platform.py              # link + latency (no jit,
                                                  # ~40 MB pool, seconds)
    python scripts/probe_platform.py --full       # + compiled probes:
                                                  # on-device copy, gather
                                                  # ns/idx, bf16 matmul,
                                                  # cumsum (first run pays
                                                  # compile latency; use the
                                                  # shared .jax_cache)
    python scripts/probe_platform.py --pool-scan  # + staging-pool scan:
                                                  # uploads until the pool
                                                  # collapses (~1.3 GB) or a
                                                  # 120 s budget runs out.
                                                  # DESTROYS this process's
                                                  # transfer pool — run it
                                                  # standalone, never before
                                                  # other TPU work.

Timing discipline: `block_until_ready` returns early on this platform —
every probe forces completion by fetching data (np.asarray of a
previously-unfetched array; jax.Array caches the host copy after one
conversion, so each probe array is fetched exactly once).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def probe_latency(jax) -> dict:
    """Tiny-put round trip: the per-transfer sync floor (ledger: ~27-36 ms
    single-dispatch; pure transfers land lower)."""
    t0 = time.perf_counter()
    np.asarray(jax.device_put(np.zeros(4096, np.uint8)))
    first_ms = (time.perf_counter() - t0) * 1e3   # fresh-process stall, if any
    rts = []
    for i in range(8):
        buf = np.full(4096, i, np.uint8)
        t0 = time.perf_counter()
        np.asarray(jax.device_put(buf))
        rts.append((time.perf_counter() - t0) * 1e3)
    return {"first_put_ms": round(first_ms, 1),
            "rt_4kb_ms_median": round(_median(rts), 2),
            "rt_4kb_ms_min": round(min(rts), 2)}


def probe_link(jax, mb: int = 8, reps: int = 3,
               fence_ms: float = 0.0) -> dict:
    """H2D and D2H MB/s on fixed-size buffers (in-pool rates; the ledger's
    0.05-0.08 GB/s H2D / 0.07-0.085 D2H constants, session-dependent).
    fence_ms: the tiny-put round-trip latency (probe_latency) — the H2D
    fence IS one such round trip, so it is subtracted to keep this probe's
    h2d_mb_s comparable with bench.py's _link_probe (which subtracts it
    for the same reason)."""
    n = mb << 20
    h2d, d2h = [], []
    for i in range(reps):
        host = np.arange(i, n + i, dtype=np.uint64).view(np.uint8)[:n].copy()
        t0 = time.perf_counter()
        dev = jax.device_put(host)
        np.asarray(jax.device_put(np.zeros(4096, np.uint8)))  # ordered-DMA fence
        h2d.append(n / max(time.perf_counter() - t0 - fence_ms / 1e3, 1e-6))
        t0 = time.perf_counter()
        np.asarray(dev)                       # first fetch of this array
        d2h.append(n / (time.perf_counter() - t0))
    return {"buffer_mb": mb,
            "h2d_mb_s": round(_median(h2d) / 2**20, 1),
            "d2h_mb_s": round(_median(d2h) / 2**20, 1)}


def probe_pool(jax, chunk_mb: int = 64, budget_s: float = 120.0) -> dict:
    """Staging-pool scan: plain device_put of chunk_mb buffers until the
    sustained rate collapses (ledger: ~1.2-1.3 GB cumulative, then a
    PERMANENT drop to 0.02-0.1 GB/s) or the budget runs out. Keeps device
    references alive so the pool pressure is real."""
    n = chunk_mb << 20
    keep, rates = [], []
    staged = 0
    t_start = time.perf_counter()
    collapse_at = None
    while time.perf_counter() - t_start < budget_s and staged < (1600 << 20):
        host = np.random.default_rng(staged).integers(
            0, 255, n, dtype=np.uint8)
        t0 = time.perf_counter()
        dev = jax.device_put(host)
        np.asarray(jax.device_put(np.zeros(4096, np.uint8)))
        dt = time.perf_counter() - t0
        keep.append(dev)
        staged += n
        rates.append(round(n / dt / 2**30, 3))
        _log(f"pool scan: {staged >> 20} MB staged, {rates[-1]} GB/s")
        peak = max(rates)
        if collapse_at is None and peak > 0.5 and rates[-1] < 0.15:
            collapse_at = staged
            break
    return {"chunk_mb": chunk_mb, "staged_mb": staged >> 20,
            "rates_gb_s": rates,
            "collapse_at_mb": (collapse_at >> 20) if collapse_at else None,
            "note": "pool exhaustion is PERMANENT per process; this scan "
                    "intentionally spends it"}


def probe_compiled(jax) -> dict:
    """Compiled probes for the ledger's device-side constants. First run
    pays 80+ s compile per executable (cached afterwards)."""
    import jax.numpy as jnp
    out = {}

    # on-device copy bandwidth (ledger: ~0.7 GB/s effective)
    n = 100 << 20
    x = jax.device_put(np.zeros(n, np.uint8))
    f = jax.jit(lambda a: a + np.uint8(1))
    np.asarray(f(x)[:1].copy())  # compile+warm fence via tiny slice fetch
    t0 = time.perf_counter()
    y = f(x)
    for _ in range(2):
        y = f(y)
    np.asarray(y[:1].copy())
    dt = time.perf_counter() - t0
    out["ondevice_copy_gb_s"] = round(3 * 2 * n / dt / 2**30, 2)

    # random gather from a small table (ledger: ~10-11 ns/idx from 512)
    m = 3_100_000
    idx = jax.device_put(np.random.default_rng(0).integers(
        0, 512, m, dtype=np.int32))
    tab = jax.device_put(np.arange(512, dtype=np.int32))
    g = jax.jit(lambda t, i: t[i])
    np.asarray(g(tab, idx)[:1].copy())
    t0 = time.perf_counter()
    r = None
    for _ in range(3):
        r = g(tab, idx)
    np.asarray(r[:1].copy())
    out["gather_ns_per_idx_512"] = round(
        (time.perf_counter() - t0) / (3 * m) * 1e9, 2)

    # bf16 matmul (ledger: 0.04 TFLOP/s at 4096^3 on the tunnel chip)
    k = 4096
    a = jax.device_put(np.ones((k, k), np.float32).astype(jnp.bfloat16))
    mm = jax.jit(lambda p, q: p @ q)
    np.asarray(mm(a, a)[:1, :1].copy().astype(np.float32))
    t0 = time.perf_counter()
    c = mm(a, a)
    np.asarray(c[:1, :1].copy().astype(np.float32))
    out["bf16_matmul_4096_tflop_s"] = round(
        2 * k**3 / (time.perf_counter() - t0) / 1e12, 3)

    # cumsum 3.1M i32 (ledger: 5.4 ms)
    v = jax.device_put(np.ones(m, np.int32))
    cs = jax.jit(jnp.cumsum)
    np.asarray(cs(v)[:1].copy())
    t0 = time.perf_counter()
    r = None
    for _ in range(3):
        r = cs(v)
    np.asarray(r[:1].copy())
    out["cumsum_3m1_ms"] = round((time.perf_counter() - t0) / 3 * 1e3, 2)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--pool-scan", action="store_true")
    args = ap.parse_args()

    import jax
    lat = probe_latency(jax)
    result = {"backend": jax.devices()[0].platform,
              "ledger": "docs/PERFORMANCE.md platform characterization",
              "latency": lat,
              "link": probe_link(jax, fence_ms=lat["rt_4kb_ms_median"])}
    _log(f"latency: {result['latency']}")
    _log(f"link: {result['link']}")
    if args.full:
        result["compiled"] = probe_compiled(jax)
        _log(f"compiled: {result['compiled']}")
    if args.pool_scan:
        result["pool"] = probe_pool(jax)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
