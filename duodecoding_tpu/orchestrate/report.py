"""Experiment results -> analysis-grade report.

Covers the reference's analysis notebooks as library functions + a CLI
(reference: notebooks/table_generator_ver2.ipynb results table;
plot_acceptance_rates.ipynb accept-history analysis;
plot_walltime_composition.ipynb comm/compute/queuing split;
plot_throughput_vs_bandwidth.ipynb + plot_topk_bandwidth.ipynb
bandwidth grouping). Each section renders markdown from the dumped
``<mode>_<task>_metrics.json`` files (evalkit/dumper.py) and
``experiment_summary_*.json`` files (orchestrate/exp_runner.py) —
terminal- and commit-friendly where the reference needed a Jupyter
kernel.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, List, Optional


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


def load_metrics(exp_dir: str) -> List[dict]:
    """Load every ``*_metrics.json`` under ``exp_dir`` (recursively),
    attaching the mode/task parsed from the filename."""
    out = []
    for path in sorted(
        glob.glob(os.path.join(exp_dir, "**", "*_metrics.json"), recursive=True)
    ):
        try:
            with open(path) as f:
                m = json.load(f)
        except Exception:
            continue
        stem = os.path.basename(path)[: -len("_metrics.json")]
        task = stem.rsplit("_", 1)[-1] if "_" in stem else "?"
        m.setdefault("_mode", stem[: -(len(task) + 1)] if "_" in stem else stem)
        m.setdefault("_task", task)
        m.setdefault("_path", path)
        out.append(m)
    return out


def _quantiles(xs: List[float]) -> Dict[str, float]:
    if not xs:
        return {}
    s = sorted(xs)

    def q(p):
        i = min(int(p * (len(s) - 1) + 0.5), len(s) - 1)
        return s[i]

    return {
        "mean": sum(s) / len(s),
        "p10": q(0.10),
        "p50": q(0.50),
        "p90": q(0.90),
        "n": len(s),
    }


def mode_comparison(metrics: List[dict]) -> str:
    """Per-mode comparison table (the cross-notebook headline view):
    throughput, acceptance, draft length, and wall-time composition."""
    lines = [
        "| mode | task | tok/s | accept | avg draft len | comm % | "
        "compute % | queue % |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for m in metrics:
        wall = m.get("wall_time") or 0.0
        acc = (
            m.get("draft_accepted_tokens", 0)
            / max(m.get("draft_generated_tokens", 0), 1)
            if m.get("draft_generated_tokens")
            else None
        )

        def pct(key):
            v = m.get(key) or 0.0
            return f"{100 * v / wall:.0f}" if wall else "-"

        lines.append(
            "| {} | {} | {:.2f} | {} | {:.2f} | {} | {} | {} |".format(
                m.get("_mode", "?"),
                m.get("_task", "?"),
                m.get("throughput") or 0.0,
                f"{acc:.3f}" if acc is not None else "-",
                m.get("avg_draft_len") or 0.0,
                pct("communication_time"),
                pct("computation_time"),
                pct("queuing_time"),
            )
        )
    return "\n".join(lines)


def acceptance_summary(metrics: List[dict]) -> str:
    """Accept-rate history analysis (plot_acceptance_rates.ipynb role):
    distribution stats + a coarse over-time trend (history quartiles) per
    mode/tier. Histories dump with ``dump_network_stats``."""
    lines = [
        "| mode | tier | mean | p10 | p50 | p90 | trend (q1->q4 mean) | n |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for m in metrics:
        for tier in ("draft", "little"):
            hist = m.get(f"{tier}_accept_rate_history") or []
            hist = [float(x) for x in hist]
            if not hist:
                continue
            st = _quantiles(hist)
            k = max(len(hist) // 4, 1)
            quarts = [
                sum(hist[i : i + k]) / max(len(hist[i : i + k]), 1)
                for i in range(0, len(hist), k)
            ][:4]
            trend = " -> ".join(f"{q:.2f}" for q in quarts)
            lines.append(
                "| {} | {} | {:.3f} | {:.3f} | {:.3f} | {:.3f} | {} | {} |"
                .format(
                    m.get("_mode", "?"), tier, st["mean"], st["p10"],
                    st["p50"], st["p90"], trend, st["n"],
                )
            )
    if len(lines) == 2:
        lines.append("| (no accept histories dumped) | | | | | | | |")
    return "\n".join(lines)


def walltime_composition(metrics: List[dict]) -> str:
    """Comm/compute/queuing split (plot_walltime_composition.ipynb role)."""
    lines = [
        "| mode | wall (s) | comm (s) | compute (s) | queue (s) | "
        "other (s) |",
        "|---|---|---|---|---|---|",
    ]
    for m in metrics:
        wall = m.get("wall_time") or 0.0
        comm = m.get("communication_time") or 0.0
        comp = m.get("computation_time") or 0.0
        que = m.get("queuing_time") or 0.0
        lines.append(
            "| {} | {:.2f} | {:.2f} | {:.2f} | {:.2f} | {:.2f} |".format(
                m.get("_mode", "?"), wall, comm, comp, que,
                max(wall - comm - comp - que, 0.0),
            )
        )
    return "\n".join(lines)


def bandwidth_table(metrics: List[dict]) -> str:
    """Throughput/topk vs configured bandwidth
    (plot_throughput_vs_bandwidth.ipynb + plot_topk_bandwidth.ipynb role):
    groups runs by their config's edge-cloud bandwidth."""
    groups: Dict[Any, List[dict]] = {}
    for m in metrics:
        bw = (m.get("config") or {}).get("edge_cloud_bandwidth", "?")
        groups.setdefault(bw, []).append(m)
    lines = [
        "| edge-cloud BW (Mbps) | mode | tok/s | avg top-k | uplink MB |",
        "|---|---|---|---|---|",
    ]
    for bw in sorted(groups, key=str):
        for m in groups[bw]:
            lines.append(
                "| {} | {} | {:.2f} | {:.1f} | {:.2f} |".format(
                    bw,
                    m.get("_mode", "?"),
                    m.get("throughput") or 0.0,
                    m.get("avg_top_k") or 0.0,
                    (m.get("edge_cloud_data_bytes") or 0) / 1e6,
                )
            )
    return "\n".join(lines)


def full_report(exp_dir: str = ".") -> str:
    """All sections for one experiment directory."""
    metrics = load_metrics(exp_dir)
    summaries = load_summaries(os.path.join(exp_dir, "experiment_summary_*.json"))
    parts = [f"# Experiment report — {exp_dir}", ""]
    if summaries:
        parts += ["## Run results", "", results_table(summaries), ""]
    parts += [
        "## Mode comparison", "", mode_comparison(metrics), "",
        "## Acceptance rates", "", acceptance_summary(metrics), "",
        "## Wall-time composition", "", walltime_composition(metrics), "",
        "## Bandwidth regimes", "", bandwidth_table(metrics), "",
    ]
    return "\n".join(parts)


def main():
    import sys

    if len(sys.argv) > 1:
        print(full_report(sys.argv[1]))
    else:
        print(results_table())


if __name__ == "__main__":
    main()
