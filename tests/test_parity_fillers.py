"""Tests for the smaller parity components: adaptive debugger, scans,
report generator, quantization RL env, ground-truth cross-check."""

import json

import numpy as np
import pytest


def test_adaptive_debugger(tmp_path):
    from duodecoding_tpu.utils.adaptive_debug import AdaptiveDecodingDebugger

    path = str(tmp_path / "dbg.jsonl")
    dbg = AdaptiveDecodingDebugger(path)
    dbg.log_event("step", iter=3, accepted=2)
    dbg.log_tensor("probs", np.array([0.5, 0.5]))
    dbg.log_invalid_tokens("out", np.array([1, 999]), vocab_size=100)
    dbg.close()
    lines = [json.loads(l) for l in open(path)]
    assert [l["type"] for l in lines] == ["event", "tensor", "invalid_tokens"]
    assert lines[2]["count"] == 1
    # disabled mode is a no-op
    off = AdaptiveDecodingDebugger(None)
    off.log_event("x")
    assert not off.enabled


def test_scan_generators():
    from duodecoding_tpu.orchestrate.scans import (
        cee_cuhlm_threshold_scan,
        cee_sd_topk_scan,
    )

    topk = cee_sd_topk_scan()
    assert len(topk) == 11
    assert all(c.eval_mode == "adaptive_tridecoding" for c in topk)
    grid = cee_cuhlm_threshold_scan()
    assert len(grid) == 81
    assert "--small_draft_threshold" in grid[0].extra_args


def test_report_table(tmp_path):
    from duodecoding_tpu.orchestrate.report import results_table

    summaries = [
        {
            "results": [
                {
                    "config": {"eval_mode": "sd", "task": "gsm8k",
                               "draft_model": "a", "target_model": "b"},
                    "status": "success",
                    "summary": {"tokens_per_second": 30.01, "accuracy": 0.5,
                                "wall_time": 12.0},
                }
            ]
        }
    ]
    table = results_table(summaries)
    assert "| sd | gsm8k | a->b | success | 30.01 | 0.500 | 12.0 |" in table


def test_quant_env_reward_structure():
    from duodecoding_tpu.adaptive.quant_env import QuantizeSpecDecEnv

    def best_quant(bw):
        rewards = {}
        env = QuantizeSpecDecEnv(seed=0)
        for a in range(env.action_dim):
            e = QuantizeSpecDecEnv(seed=0)
            e.bandwidth_mbps = bw
            _, r, _, info = e.step(a)
            rewards[(info["quant"], info["gamma"])] = r
        return max(rewards, key=rewards.get)

    # compute-bound regime (fat link): cheap int4/int8 drafts win
    assert best_quant(1000.0)[0] in ("int4", "int8")
    # comm-bound regime (starved link): reject downlinks dominate, so the
    # higher-quality draft that rejects less wins
    assert best_quant(3.0)[0] == "bf16"


def test_ground_truth_cross_check_with_tiny_hf_model():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    import jax
    import jax.numpy as jnp

    from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
    from duodecoding_tpu.evalkit.ground_truth import cross_check_greedy
    from duodecoding_tpu.models.loader import config_from_hf, params_from_hf_state_dict

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
    )
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, "tiny")
    params = params_from_hf_state_dict(cfg, model.state_dict(), jnp.float32)
    engine = Engine(
        target=Tier(cfg, params),
        config=EngineConfig(
            max_tokens=8, max_seq_len=64,
            param_dtype=jnp.float32, cache_dtype=jnp.float32,
        ),
    )
    stats = cross_check_greedy(
        model, engine, [np.array([3, 17, 42, 7, 55])], max_new_tokens=8
    )
    assert stats["prefix_consistency"] == 1.0  # token-identical to HF
