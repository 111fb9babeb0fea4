"""Per-iteration timing, ETA, meters, and device memory stats.

Equivalents of the reference's Timer / AverageMeter
(reference: utils/base.py:80-163) and gpu_mem_usage
(reference: utils/distributed.py:162-171 — here backed by the TPU
device's memory_stats).
"""

from __future__ import annotations

import collections
import datetime
import time
from typing import Optional

import jax


class Timer:
    """Moving-window per-iteration timer with ETA."""

    def __init__(self, start_from: int = 1, total_iterations: Optional[int] = None,
                 window_size: int = 20):
        self.current_iter = start_from
        self.total = total_iterations
        self.deltas = collections.deque(maxlen=window_size)
        self._start = time.perf_counter()

    def tic(self) -> None:
        self._start = time.perf_counter()

    def toc(self) -> None:
        self.deltas.append(time.perf_counter() - self._start)
        self.current_iter += 1

    @property
    def avg_iter_time(self) -> float:
        return sum(self.deltas) / max(1, len(self.deltas))

    @property
    def eta_hhmm(self) -> str:
        if not self.total or not self.deltas:
            return "N/A"
        remaining = max(0, (self.total - self.current_iter) * self.avg_iter_time)
        return str(datetime.timedelta(seconds=int(remaining)))

    @property
    def stats(self) -> str:
        return (f"Iter {self.current_iter - 1} | Time/iter "
                f"{self.avg_iter_time:.3f}s | ETA {self.eta_hhmm}")


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(1, self.count)


def device_mem_usage_mb() -> int:
    """Peak device memory in MB (TPU equivalent of
    torch.cuda.max_memory_allocated)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))
        return int(peak) // (1024 * 1024)
    except Exception:
        return 0
