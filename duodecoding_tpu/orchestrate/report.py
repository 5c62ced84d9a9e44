"""Experiment summary -> results table.

Equivalent of the reference's table_generator notebook (reference:
notebooks/table_generator_ver2.ipynb + experiment_results_table.md): turns
``experiment_summary_*.json`` files into a markdown results table.
"""

from __future__ import annotations

import glob
import json
from typing import List, Optional


def load_summaries(pattern: str = "experiment_summary_*.json") -> List[dict]:
    out = []
    for path in sorted(glob.glob(pattern)):
        with open(path) as f:
            out.append(json.load(f))
    return out


def results_table(summaries: Optional[List[dict]] = None) -> str:
    summaries = summaries if summaries is not None else load_summaries()
    rows = []
    for s in summaries:
        for r in s.get("results", []):
            cfg = r.get("config", {})
            summ = r.get("summary") or {}
            rows.append(
                (
                    cfg.get("eval_mode", "?"),
                    cfg.get("task", "?"),
                    f"{cfg.get('draft_model', '?')}->{cfg.get('target_model', '?')}",
                    r.get("status", "?"),
                    summ.get("tokens_per_second"),
                    summ.get("accuracy"),
                    summ.get("wall_time"),
                )
            )
    lines = [
        "| mode | task | pair | status | tok/s | accuracy | wall (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for mode, task, pair, status, tps, acc, wall in rows:
        tps_s = f"{tps:.2f}" if isinstance(tps, (int, float)) else "-"
        acc_s = f"{acc:.3f}" if isinstance(acc, (int, float)) else "-"
        wall_s = f"{wall:.1f}" if isinstance(wall, (int, float)) else "-"
        lines.append(f"| {mode} | {task} | {pair} | {status} | {tps_s} | {acc_s} | {wall_s} |")
    return "\n".join(lines)


def main():
    print(results_table())


if __name__ == "__main__":
    main()
