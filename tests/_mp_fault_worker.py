"""Worker for the kill-one-process fault-injection test (run as a script).

SURVEY.md section 6 failure model: SPMD has no in-flight elasticity — a dead
host means the launcher tears the job down and relaunches it, and the batch
driver's manifest makes the relaunch resume instead of redo. This worker runs
`batch.run_batch` over a 2-process jax.distributed CPU job; with --die-after-
chunk=N it SIGKILLs ITSELF (exact pid, never a pattern) at the start of its
(N+1)-th chunk — after chunk N's files and manifest lines are flushed, mid-
batch from the job's point of view. The surviving peer blocks in the next
chunk's collective and is killed by the test harness, exactly as a gang
scheduler would.

Usage: python tests/_mp_fault_worker.py <pid> <nproc> <port> <outdir>
           [die_after_chunk]
"""
import json
import os
import signal
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

N_IMAGES = 12
CHUNK = 4


def make_images() -> np.ndarray:
    rng = np.random.default_rng(1234)
    return np.stack([
        np.clip(rng.normal(128, 40, (32, 48, 3)), 0, 255).astype(np.uint8)
        for _ in range(N_IMAGES)])


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outdir = sys.argv[4]
    die_after = int(sys.argv[5]) if len(sys.argv) > 5 else 0

    import jax
    jax.config.update("jax_platforms", "cpu")

    from jpgenc_tpu.parallel import multihost
    multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=nproc, process_id=pid)
    assert multihost.process_count() == nproc, "distributed init failed"

    from jpgenc_tpu.batch import run_batch
    from jpgenc_tpu.parallel.mesh import encode_batch

    imgs = make_images()
    # per-process output paths + manifest: on a real pod each host has its
    # own filesystem; here it also proves BOTH processes' manifests resume
    paths = [os.path.join(outdir, f"out_p{pid}_{i:02d}.jpg")
             for i in range(N_IMAGES)]
    manifest = os.path.join(outdir, f"manifest_p{pid}.jsonl")

    calls = {"n": 0}

    def chunky(chunk, **kw):
        calls["n"] += 1
        if die_after and calls["n"] > die_after:
            # mid-batch host death: the previous chunk's files + manifest
            # lines are on disk, this chunk is not — SIGKILL leaves no
            # chance for cleanup handlers, like a real machine loss
            os.kill(os.getpid(), signal.SIGKILL)
        kw.pop("staged", None)       # encode_chunk override disables staging
        return encode_batch(chunk, **kw)

    res = run_batch(imgs, paths, manifest, quality=75, subsampling="420",
                    chunk_size=CHUNK, encode_chunk=chunky)

    # byte-correctness of every output against the single-device encoder
    from jpgenc_tpu.api import encode
    for i in range(N_IMAGES):
        with open(paths[i], "rb") as f:
            data = f.read()
        ref = encode(imgs[i], quality=75, subsampling="420")
        assert data == ref, f"proc {pid}: image {i} bytes differ after resume"

    # manifest must cover every image exactly once (resume rewrote none)
    seen = [json.loads(l)["index"] for l in open(manifest)]
    assert sorted(set(seen)) == list(range(N_IMAGES))

    print(f"MP_FAULT_OK {pid} done={res.done} skipped={res.skipped}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
