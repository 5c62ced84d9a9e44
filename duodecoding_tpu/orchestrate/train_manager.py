"""Automated RL training lifecycle manager.

Port of the reference's auto_train_manager.py: spawns the online-RL
training run (the `mixed` task in an adaptive mode with --use_rl_adapter),
tails its log for TPS/loss/reward lines, detects convergence stagnation
(moving-window relative improvement < 0.5% over 8 samples, reference:
auto_train_manager.py:49-68), rotates the best checkpoints into
``checkpoints/<series>/best/tps_<tps>_<ts>_<series>/`` and persists
``training_status.json`` so a restarted manager resumes where it left off.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import time
from typing import List, Optional

TPS_RE = re.compile(r"tokens_per_second[\"']?\s*[:=]\s*([0-9.]+)")
LOSS_RE = re.compile(r"Loss:\s*([0-9.]+)")
REWARD_RE = re.compile(r"Reward:\s*([0-9.\-]+)")


def parse_training_log(text: str) -> dict:
    return {
        "tps": [float(x) for x in TPS_RE.findall(text)],
        "loss": [float(x) for x in LOSS_RE.findall(text)],
        "reward": [float(x) for x in REWARD_RE.findall(text)],
    }


def is_stagnant(samples: List[float], window: int = 8, rel_eps: float = 0.005) -> bool:
    """Convergence = relative spread of the last `window` samples < rel_eps."""
    if len(samples) < window:
        return False
    tail = samples[-window:]
    lo, hi = min(tail), max(tail)
    base = max(abs(hi), 1e-9)
    return (hi - lo) / base < rel_eps


class AutoTrainManager:
    def __init__(
        self,
        series: str,
        train_argv: List[str],
        *,
        checkpoint_root: str = "checkpoints",
        status_path: str = "training_status.json",
        log_dir: str = "train_logs",
        max_rounds: int = 100,
        python: str = sys.executable,
    ):
        self.series = series
        self.train_argv = train_argv
        self.checkpoint_root = checkpoint_root
        self.status_path = status_path
        self.log_dir = log_dir
        self.max_rounds = max_rounds
        self.python = python
        self.status = self._load_status()

    def _load_status(self) -> dict:
        if os.path.exists(self.status_path):
            with open(self.status_path) as f:
                return json.load(f)
        return {"series": self.series, "rounds": 0, "best_tps": 0.0, "history": []}

    def _save_status(self) -> None:
        with open(self.status_path, "w") as f:
            json.dump(self.status, f, indent=2)

    def rotate_best(self, tps: float, agent_paths: List[str]) -> Optional[str]:
        """Copy the current agent checkpoints into the best/ rotation dir
        when a new TPS record is set (reference auto_train_manager.py
        checkpoint rotation)."""
        if tps <= self.status["best_tps"]:
            return None
        self.status["best_tps"] = tps
        ts = time.strftime("%m%d_%H%M")
        dst = os.path.join(
            self.checkpoint_root,
            self.series,
            "best",
            f"tps_{tps:.3f}_{ts}_{self.series}",
        )
        os.makedirs(dst, exist_ok=True)
        for p in agent_paths:
            if os.path.exists(p):
                shutil.copy2(p, os.path.join(dst, os.path.basename(p)))
                buf = p + ".buffer"
                if os.path.exists(buf):
                    shutil.copy2(buf, os.path.join(dst, os.path.basename(buf)))
        return dst

    def run_round(self, timeout: float = 7200.0) -> dict:
        os.makedirs(self.log_dir, exist_ok=True)
        log_path = os.path.join(
            self.log_dir, f"{self.series}_round{self.status['rounds']}.log"
        )
        env = dict(os.environ, MODEL_SERIES_NAME=self.series)
        with open(log_path, "w") as lf:
            proc = subprocess.run(
                [self.python, "main.py"] + self.train_argv,
                stdout=lf,
                stderr=subprocess.STDOUT,
                timeout=timeout,
                env=env,
            )
        with open(log_path) as lf:
            parsed = parse_training_log(lf.read())
        tps = parsed["tps"][-1] if parsed["tps"] else 0.0
        self.status["rounds"] += 1
        self.status["history"].append(
            {"round": self.status["rounds"], "tps": tps, "log": log_path,
             "returncode": proc.returncode}
        )
        self._save_status()
        return {"tps": tps, "parsed": parsed, "log": log_path}

    def run(self, agent_paths: List[str], timeout_per_round: float = 7200.0) -> dict:
        tps_history = [h["tps"] for h in self.status["history"]]
        while self.status["rounds"] < self.max_rounds:
            result = self.run_round(timeout=timeout_per_round)
            tps_history.append(result["tps"])
            self.rotate_best(result["tps"], agent_paths)
            if is_stagnant(tps_history):
                self.status["converged"] = True
                self._save_status()
                break
        return self.status
