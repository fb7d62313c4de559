"""Tracing/profiling utilities (SURVEY.md section 6).

- `trace(dir)` wraps `jax.profiler.trace` for Perfetto/TensorBoard captures.
- `StageTimer` produces trustworthy per-stage wall times on platforms where
  `block_until_ready` is unreliable (this box's axon tunnel): it forces each
  stage by fetching a scalar derived from the stage output.
- `flops_bytes_estimate(layout)` prints the roofline-style cost model for an
  encode of the given frame layout (the `pl.cost_estimate`-style accounting
  SURVEY.md section 6 asks the bench driver to expose).
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    with jax.profiler.trace(log_dir):
        yield


@dataclass
class StageTimer:
    """Forced-completion stage timing: `with t.stage("name"): out = f()`.

    Each stage context fetches a tiny reduction of the registered output, so
    the recorded time covers real device execution, not queueing.
    """
    records: dict[str, float] = field(default_factory=dict)
    _out: object = None

    def force(self, out):
        self._out = out
        return out

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        self._out = None
        yield self
        if self._out is not None:
            leaves = jax.tree.leaves(self._out)
            if leaves:
                np.asarray(jax.device_get(leaves[0])).ravel()[:1]
        self.records[name] = self.records.get(name, 0.0) + \
            (time.perf_counter() - t0)

    def report(self) -> str:
        total = sum(self.records.values()) or 1.0
        lines = [f"{k:32s} {v * 1e3:9.2f} ms  {100 * v / total:5.1f}%"
                 for k, v in self.records.items()]
        return "\n".join(lines)


def flops_bytes_estimate(layout) -> dict:
    """Analytic cost model for one encode (SURVEY.md section 7 feasibility)."""
    n_blocks = sum(c.n_blocks for c in layout.comps)
    px = sum(c.plane_h * c.plane_w for c in layout.comps)
    return {
        "pixels": px,
        "blocks": n_blocks,
        "dct_flops": n_blocks * 64 * 64 * 2,        # [n,64]@[64,64]
        "color_flops": layout.height * layout.width * 12,
        "hbm_bytes_min": px * (1 + 4 + 4 + 4),      # u8 in, f32, i32 zz, out
        "entropy_slots": n_blocks * 64,
    }
