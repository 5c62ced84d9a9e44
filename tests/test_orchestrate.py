"""Orchestration-layer tests: CLI end-to-end, consistency checker,
train-manager mechanics (stagnation, checkpoint rotation, status persist)."""

import json
import os

import numpy as np
import pytest

from duodecoding_tpu.orchestrate.consistency import (
    prefix_consistency,
    prefix_match_ratio,
)
from duodecoding_tpu.orchestrate.train_manager import (
    AutoTrainManager,
    is_stagnant,
    parse_training_log,
)


def test_prefix_match():
    assert prefix_match_ratio("hello world", "hello there") == 6 / 11
    assert prefix_match_ratio("same", "same") == 1.0
    assert prefix_match_ratio("", "") == 1.0
    assert prefix_consistency(["ab", "cd"], ["ab", "ce"]) == (1.0 + 0.5) / 2


def test_parse_training_log_and_stagnation():
    log = (
        '"tokens_per_second": 12.5\n[agent] Step: 1, Loss: 0.52, Reward: 3.1\n'
        '"tokens_per_second": 13.0\n'
    )
    parsed = parse_training_log(log)
    assert parsed["tps"] == [12.5, 13.0]
    assert parsed["loss"] == [0.52]
    assert parsed["reward"] == [3.1]
    assert not is_stagnant([1, 2, 3])
    assert is_stagnant([10.0] * 8)
    assert not is_stagnant([10, 11, 12, 13, 14, 15, 16, 17])


def test_train_manager_rotation_and_status(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    agent = tmp_path / "agent.pkl"
    agent.write_bytes(b"fake")
    mgr = AutoTrainManager(
        "llama",
        [],
        checkpoint_root=str(tmp_path / "checkpoints"),
        status_path=str(tmp_path / "training_status.json"),
        log_dir=str(tmp_path / "logs"),
    )
    dst = mgr.rotate_best(28.22, [str(agent)])
    assert dst is not None and "tps_28.220" in dst
    assert os.path.exists(os.path.join(dst, "agent.pkl"))
    # no rotation on worse TPS
    assert mgr.rotate_best(20.0, [str(agent)]) is None
    mgr._save_status()
    mgr2 = AutoTrainManager(
        "llama",
        [],
        status_path=str(tmp_path / "training_status.json"),
    )
    assert mgr2.status["best_tps"] == 28.22


def test_cli_end_to_end(tmp_path):
    from duodecoding_tpu.cli import main

    summary = main(
        [
            "--eval_mode", "sd",
            "--task", "specbench",
            "--sub_domain", "qa",
            "--draft_model", "test-tiny",
            "--target_model", "test-tiny-deep",
            "--random_weights",
            "--max_tokens", "8",
            "--gamma", "2",
            "--max_seq_len", "256",
            "--eval_data_num", "2",
            "--warmup", "1",
            "--exp_name", str(tmp_path / "exp"),
        ]
    )
    assert summary["n_items"] == 2
    assert summary["tokens_per_second"] > 0
    assert os.path.exists(summary["metrics_path"])


def test_exp_runner_subprocess_end_to_end(tmp_path):
    from duodecoding_tpu.orchestrate.exp_runner import ExpConfig, run_experiments

    cfg = ExpConfig(
        eval_mode="sd",
        task="specbench",
        draft_model="test-tiny",
        target_model="test-tiny-deep",
        max_tokens=8,
        gamma=2,
        eval_data_num=1,
        random_weights=True,
        exp_name=str(tmp_path / "exp"),
        extra_args=("--sub_domain", "qa", "--max_seq_len", "256", "--warmup", "0",
                    "--platform", "cpu"),
    )
    out = run_experiments(
        [cfg],
        log_dir=str(tmp_path / "logs"),
        summary_dir=str(tmp_path),
        timeout=500,
        repo_root=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out["n_runs"] == 1
    res = out["results"][0]
    assert res["status"] == "success", open(res["log"]).read()[-2000:]
    assert res["summary"]["tokens_per_second"] > 0
    assert os.path.exists(out["summary_path"])


def test_report_sections(tmp_path):
    """Analysis-grade report sections (the reference notebooks' roles):
    mode comparison, acceptance histories, wall-time composition,
    bandwidth grouping — rendered from dumped metrics files."""
    import json

    from duodecoding_tpu.orchestrate import report

    m1 = {
        "generated_tokens": 100, "wall_time": 10.0, "throughput": 10.0,
        "communication_time": 4.0, "computation_time": 5.0,
        "queuing_time": 0.5, "draft_generated_tokens": 80,
        "draft_accepted_tokens": 40, "avg_draft_len": 4.0, "avg_top_k": 512,
        "edge_cloud_data_bytes": 2_000_000,
        "draft_accept_rate_history": [0.2, 0.4, 0.6, 0.8],
        "config": {"edge_cloud_bandwidth": 23.6},
    }
    m2 = {
        "generated_tokens": 50, "wall_time": 2.0, "throughput": 25.0,
        "communication_time": 0.0, "computation_time": 2.0,
        "queuing_time": 0.0, "avg_draft_len": 0.0, "avg_top_k": 0,
        "config": {"edge_cloud_bandwidth": 563.0},
    }
    (tmp_path / "dssd_gsm8k_metrics.json").write_text(json.dumps(m1))
    (tmp_path / "large_gsm8k_metrics.json").write_text(json.dumps(m2))

    metrics = report.load_metrics(str(tmp_path))
    assert {m["_mode"] for m in metrics} == {"dssd", "large"}
    assert all(m["_task"] == "gsm8k" for m in metrics)

    cmp_tbl = report.mode_comparison(metrics)
    assert "| dssd |" in cmp_tbl and "0.500" in cmp_tbl  # accept 40/80
    assert "| 40 |" in cmp_tbl  # comm 4.0/10.0

    acc_tbl = report.acceptance_summary(metrics)
    assert "0.500" in acc_tbl  # mean of the history
    assert "0.20 -> 0.40 -> 0.60 -> 0.80" in acc_tbl  # per-quartile trend

    wt = report.walltime_composition(metrics)
    assert "| dssd | 10.00 | 4.00 | 5.00 | 0.50 | 0.50 |" in wt

    bw = report.bandwidth_table(metrics)
    assert "| 23.6 | dssd |" in bw and "| 563.0 | large |" in bw

    full = report.full_report(str(tmp_path))
    for section in ("Mode comparison", "Acceptance rates",
                    "Wall-time composition", "Bandwidth regimes"):
        assert section in full
