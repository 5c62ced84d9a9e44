"""Profiling and device observability.

TPU-native analog of the reference's manual instrumentation
(reference: src/profiler.py:11 — cuda-sync context timer + memory deltas;
src/nvml.py — idle-GPU detection): region timers that block on device
results, `jax.profiler` trace capture, HBM stats, and per-kernel
speed-of-light accounting for a known chip generation.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax

# chip -> (HBM GB/s, bf16 TFLOP/s) peak specs for SoL accounting
CHIP_SPECS = {
    "v5e": (819.0, 197.0),
    "v5p": (2765.0, 459.0),
    "v4": (1228.0, 275.0),
    "cpu": (50.0, 1.0),
}


class PerformanceProfiler:
    """Region timer; entries accumulate into a printable summary."""

    def __init__(self, chip: str = "v5e"):
        self.chip = chip
        self.records: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def region(self, name: str, result=None):
        t0 = time.perf_counter()
        out = {}
        yield out
        if "result" in out:
            jax.block_until_ready(out["result"])
        elif result is not None:
            jax.block_until_ready(result)
        self.records.setdefault(name, []).append(time.perf_counter() - t0)

    def speed_of_light(self, bytes_accessed: float, flops: float = 0.0) -> float:
        """Lower-bound seconds for a kernel on this chip (max of the
        bandwidth and compute roofs)."""
        bw, tf = CHIP_SPECS.get(self.chip, CHIP_SPECS["v5e"])
        return max(bytes_accessed / (bw * 1e9), flops / (tf * 1e12))

    def efficiency(self, name: str, bytes_accessed: float, flops: float = 0.0):
        """Fraction of speed-of-light achieved by the median timing."""
        times = sorted(self.records.get(name, []))
        if not times:
            return None
        median = times[len(times) // 2]
        return self.speed_of_light(bytes_accessed, flops) / median

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, ts in self.records.items():
            ts_sorted = sorted(ts)
            out[name] = {
                "calls": len(ts),
                "total_s": sum(ts),
                "median_s": ts_sorted[len(ts) // 2],
                "min_s": ts_sorted[0],
            }
        return out

    def print_summary(self) -> None:
        for name, s in self.summary().items():
            print(
                f"{name:32s} calls={s['calls']:5d} total={s['total_s']:.3f}s "
                f"median={s['median_s'] * 1e3:.2f}ms"
            )


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace for the region (view with XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_device_memory() -> List[dict]:
    """Per-device HBM stats (the nvml analog)."""
    out = []
    for d in jax.devices():
        stats = {}
        try:
            stats = d.memory_stats() or {}
        except Exception:
            pass
        out.append(
            {
                "device": str(d),
                "bytes_in_use": stats.get("bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        )
    return out


def detect_available_devices(max_used_fraction: float = 0.5) -> List[int]:
    """Device ids whose HBM use is below the threshold (the reference's
    idle-GPU scheduling predicate, src/nvml.py:8-40)."""
    avail = []
    for i, info in enumerate(log_device_memory()):
        used, limit = info["bytes_in_use"], info["bytes_limit"]
        if used is None or limit in (None, 0) or used / limit < max_used_fraction:
            avail.append(i)
    return avail
