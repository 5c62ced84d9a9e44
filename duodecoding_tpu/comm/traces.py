"""Bandwidth trace handling for the stochastic communication simulator.

Parses the SIGCOMM 5G-mmWave uplink trace ``.list`` format used by the
reference (reference: src/utils.py:813-912 — run blocks separated by
``###...###`` lines, trailing sub-5-Mbps samples popped, remaining samples
clamped to a 5 Mbps floor). When no trace file is available (the reference
ships the traces as a git submodule that may be absent) a deterministic
synthetic 5G-like trace is generated instead, so the stochastic mode stays
reproducible everywhere.
"""

from __future__ import annotations

import math
import os

_SEPARATOR = "###############################"
_FLOOR_MBPS = 5.0


def _parse_blocks(content: str):
    for block in content.split(_SEPARATOR):
        block = block.strip()
        if not block:
            continue
        run_id, data_line = -1, ""
        for line in block.split("\n"):
            line = line.strip()
            if line.startswith("Run"):
                try:
                    run_id = int(line.split()[1])
                except (IndexError, ValueError):
                    pass
            elif line:
                data_line = line
        if run_id != -1 and data_line:
            try:
                data = [float(x) for x in data_line.split(",")]
            except ValueError:
                continue
            while data and data[-1] < _FLOOR_MBPS:
                data.pop()
            yield run_id, [max(_FLOOR_MBPS, x) for x in data]


def read_trace_file(trace_file: str, read_idx: int = 1) -> list[float]:
    """Return the Mbps samples of run ``read_idx`` (floor-clamped)."""
    with open(trace_file) as f:
        content = f.read()
    for run_id, data in _parse_blocks(content):
        if run_id == read_idx:
            return data
    raise ValueError(f"Run ID {read_idx} not found in trace file.")


def return_closest_mean_index(trace_file: str, mean_value: float | None = None) -> int:
    """Run ID whose mean Mbps is closest to ``mean_value`` (or the global mean)."""
    with open(trace_file) as f:
        content = f.read()
    run_means = {}
    for run_id, data in _parse_blocks(content):
        if data:
            run_means[run_id] = sum(data) / len(data)
    if not run_means:
        return -1
    if mean_value is None:
        mean_value = sum(run_means.values()) / len(run_means)
    return min(run_means, key=lambda rid: abs(run_means[rid] - mean_value))


def synthetic_trace(
    mean_mbps: float, n: int = 600, seed: int = 0, variability: float = 0.45
) -> list[float]:
    """Deterministic synthetic 5G-uplink-like trace (Mbps).

    A seeded AR(1) log-process with occasional deep fades, scaled to the
    requested mean with the same 5 Mbps floor the real traces get. Purely a
    stand-in for absent trace files; same shape of variability as the
    mmWave traces (bursty, heavy-tailed dips).
    """
    # simple deterministic LCG so the trace never depends on global RNG state
    state = (seed * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)

    def rand():
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
        return (state >> 11) / float(1 << 53)

    x = 0.0
    samples = []
    for _ in range(n):
        shock = (rand() - 0.5) * 2.0
        x = 0.9 * x + variability * shock
        fade = 0.15 if rand() < 0.05 else 1.0  # occasional deep fade
        samples.append(math.exp(x) * fade)
    raw_mean = sum(samples) / len(samples)
    scaled = [s * mean_mbps / raw_mean for s in samples]
    out = [max(_FLOOR_MBPS, s) for s in scaled]
    # one re-scale pass toward the target mean, mirroring the reference's
    # scale → floor → re-scale → floor pipeline (src/communication.py:131-160)
    actual = sum(out) / len(out)
    if actual > 0:
        out = [max(_FLOOR_MBPS, s * mean_mbps / actual) for s in out]
    return out


def load_trace(
    trace_file: str | None,
    target_mean_mbps: float | None,
    mode: str = "static",
    seed: int = 0,
) -> list[float]:
    """Load + scale a trace to ``target_mean_mbps`` (reference
    src/communication.py:118-168), falling back to a synthetic trace when
    the file is absent."""
    if trace_file and os.path.exists(trace_file):
        if target_mean_mbps is not None:
            run_id = return_closest_mean_index(trace_file, target_mean_mbps)
            if run_id == -1:
                run_id = 1
            data = read_trace_file(trace_file, run_id)
            if data:
                cur_mean = sum(data) / len(data)
                if cur_mean > 0:
                    data = [
                        max(_FLOOR_MBPS, x * target_mean_mbps / cur_mean) for x in data
                    ]
                    actual = sum(data) / len(data)
                    if actual > 0:
                        data = [
                            max(_FLOOR_MBPS, x * target_mean_mbps / actual)
                            for x in data
                        ]
                return data
            return [target_mean_mbps]
        return read_trace_file(trace_file, 1)
    mean = target_mean_mbps if target_mean_mbps is not None else 25.0
    mode_seed = {"static": 0, "driving": 1, "walking": 2}.get(mode, 0)
    return synthetic_trace(mean, seed=seed + mode_seed)
