"""Losslessness / consistency checking between two runs' generations.

Port of the reference's calculate_consistency.py: prefix-match similarity
between paired generated texts — the acceptance test that a speculative
mode is distribution-preserving vs its AR baseline.
"""

from __future__ import annotations

import json
from typing import Iterable


def prefix_match_ratio(a: str, b: str) -> float:
    """Length of the common prefix / length of the longer string."""
    if not a and not b:
        return 1.0
    n = 0
    for ca, cb in zip(a, b):
        if ca != cb:
            break
        n += 1
    return n / max(len(a), len(b))


def prefix_consistency(outputs_a: Iterable[str], outputs_b: Iterable[str]) -> float:
    """Mean prefix-match ratio over paired outputs."""
    ratios = [prefix_match_ratio(a, b) for a, b in zip(outputs_a, outputs_b)]
    return sum(ratios) / len(ratios) if ratios else 1.0


def consistency_from_transcripts(path_a: str, path_b: str, key: str = "output") -> float:
    def load(path):
        with open(path) as f:
            return [json.loads(line).get(key, "") for line in f if line.strip()]

    a, b = load(path_a), load(path_b)
    if a and isinstance(a[0], list):  # mt_bench "answers" lists
        a = ["\n".join(x) for x in a]
        b = ["\n".join(x) for x in b]
    return prefix_consistency(a, b)
