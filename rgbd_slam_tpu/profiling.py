"""Per-stage timing statistics and device profiling hooks.

Parity with the reference's hand-rolled wall-clock accounting (per-class
``_mean*Duration`` members dumped by ``show_statistics`` cascades,
rgbd_slam.cpp:325-347) plus the TPU-native upgrade: ``jax.profiler`` trace capture
around any stage for real device timelines.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates wall-clock per named stage; prints a percentage breakdown like
    the reference's show_statistics (rgbd_slam.cpp:325-347)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block: bool = False):
        t0 = time.time()
        out = yield
        if block and out is not None:
            jax.block_until_ready(out)
        self.totals[name] += time.time() - t0
        self.counts[name] += 1

    def record(self, name: str, seconds: float):
        self.totals[name] += seconds
        self.counts[name] += 1

    def show_statistics(self, frame_count: int | None = None) -> str:
        """Formatted breakdown (reference: show_statistics cascades)."""
        total = sum(self.totals.values())
        lines = []
        if frame_count:
            lines.append(f"Mean frame treatment duration: "
                         f"{total / max(frame_count, 1) * 1000:.2f} ms "
                         f"over {frame_count} frames")
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            pct = 100.0 * t / total if total > 0 else 0.0
            mean_ms = 1000.0 * t / max(self.counts[name], 1)
            lines.append(f"\t{name}: {mean_ms:.2f} ms mean ({pct:.1f}%)")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace around a block (TPU timeline; view with
    TensorBoard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
