"""Metrics accumulation + JSON dumping.

Port of the reference's ``ExpPrint`` (reference: eval/utils.py:6-100):
accumulates per-request DecodingMetrics, splits printable vs dumpable keys
(per-step histories only dump with ``dump_network_stats``), and writes
``<exp_dir>/<mode>_<task>_metrics.json`` with the run config attached.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List

from duodecoding_tpu.engine.metrics import DecodingMetrics, get_empty_metrics

_HISTORY_KEYS = (
    "edge_cloud_bandwidth_history",
    "edge_cloud_topk_history",
    "edge_cloud_draft_len_history",
    "little_entropy_history",
    "draft_entropy_history",
    "little_accept_rate_history",
    "draft_accept_rate_history",
    "little_accepted_vocab_rank_history",
    "draft_accepted_vocab_rank_history",
    "little_accepted_in_transfer_topk_history",
    "draft_accepted_in_transfer_topk_history",
    "little_accepted_transfer_topk_rank_history",
    "draft_accepted_transfer_topk_rank_history",
)

_PRINTABLE_KEYS = (
    "generated_tokens",
    "throughput",
    "wall_time",
    "communication_time",
    "computation_time",
    "queuing_time",
    "draft_generated_tokens",
    "draft_accepted_tokens",
    "little_generated_tokens",
    "little_accepted_tokens",
    "avg_draft_len",
    "avg_top_k",
    "edge_cloud_data_bytes",
    "edge_end_data_bytes",
    "comm_energy",
)


class MetricsAccumulator:
    def __init__(self, config: Dict[str, Any] | None = None, dump_network_stats=False):
        self.config = config or {}
        self.dump_network_stats = dump_network_stats
        self.runs: List[DecodingMetrics] = []

    def add(self, metrics: DecodingMetrics) -> None:
        self.runs.append(metrics)

    @property
    def total(self) -> DecodingMetrics:
        agg = get_empty_metrics()
        for m in self.runs:
            for k, v in m.items():
                if k in _HISTORY_KEYS:
                    agg[k] = agg[k] + list(v)
                elif k == "connect_times":
                    for link, c in (v or {}).items():
                        agg[k][link] = agg[k].get(link, 0) + c
                elif isinstance(v, (int, float)) and v is not None:
                    # mode-specific extras (e.g. rest_* retrieval stats)
                    # accumulate from 0 like the schema keys
                    agg[k] = agg.get(k, 0) + v
        if agg["wall_time"] > 0:
            agg["throughput"] = agg["generated_tokens"] / agg["wall_time"]
        if agg.get("rest_lookups"):  # rate is derived, not summed
            agg["rest_hit_rate"] = agg["rest_hits"] / agg["rest_lookups"]
        n = max(len(self.runs), 1)
        agg["avg_draft_len"] = sum(m["avg_draft_len"] for m in self.runs) / n
        agg["avg_top_k"] = sum(m["avg_top_k"] for m in self.runs) / n
        return agg

    def printable_summary(self) -> Dict[str, Any]:
        t = self.total
        return {k: t[k] for k in _PRINTABLE_KEYS}

    def get_save_dict(self) -> Dict[str, Any]:
        t = self.total
        out = {k: v for k, v in t.items() if k not in _HISTORY_KEYS}
        if self.dump_network_stats:
            out.update({k: t[k] for k in _HISTORY_KEYS})
        out["num_runs"] = len(self.runs)
        out["config"] = self.config
        return out

    def dump(self, exp_dir: str, mode: str, task: str) -> str:
        os.makedirs(exp_dir, exist_ok=True)
        path = os.path.join(exp_dir, f"{mode}_{task}_metrics.json")
        with open(path, "w") as f:
            json.dump(self.get_save_dict(), f, indent=2, default=float)
        return path
