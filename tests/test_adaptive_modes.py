"""Adaptive mode tests: adaptive_decoding, adaptive_tridecoding (cee_sd),
ceesd_without_arp — ARP early stop, RL online updates, comm accounting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.adaptive import RLNetworkAdapter, init_arp_head
from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
from duodecoding_tpu.models import init_random_params, resolve_config

PROMPT = np.array([[5, 9, 2, 14, 27, 3, 11, 8, 19, 4, 22, 31]], dtype=np.int32)


def _engine(with_little=False):
    d_cfg = resolve_config("test-tiny")
    t_cfg = resolve_config("test-tiny-deep")
    d = Tier(d_cfg, init_random_params(d_cfg, jax.random.PRNGKey(3), jnp.float32))
    t = Tier(t_cfg, init_random_params(t_cfg, jax.random.PRNGKey(7), jnp.float32))
    little = None
    if with_little:
        little = Tier(
            d_cfg, init_random_params(d_cfg, jax.random.PRNGKey(1), jnp.float32)
        )
    cfg = EngineConfig(
        max_tokens=12,
        gamma=3,
        gamma1=3,
        gamma2=2,
        max_seq_len=128,
        param_dtype=jnp.float32,
        cache_dtype=jnp.float32,
    )
    return Engine(target=t, draft=d, little=little, config=cfg)


def test_adaptive_decoding_without_rl_matches_budget():
    engine = _engine()
    head = init_arp_head(jax.random.PRNGKey(0), engine.draft.cfg.hidden_size, 16)
    out, m = engine.run(
        "adaptive_decoding", PROMPT, transfer_top_k=16,
        arp_params=head, arp_threshold=0.99,
    )
    assert m["generated_tokens"] == 12
    assert m["loop_times"] >= 1
    assert m["avg_draft_len"] <= engine.config.gamma
    assert m["edge_cloud_data_bytes"] > 0
    assert len(m["draft_entropy_history"]) == m["loop_times"]


def test_adaptive_decoding_low_threshold_shortens_drafts():
    engine = _engine()
    head = init_arp_head(jax.random.PRNGKey(0), engine.draft.cfg.hidden_size, 16)
    # threshold 0 -> stop after every first draft token
    out, m = engine.run(
        "adaptive_decoding", PROMPT, transfer_top_k=16,
        arp_params=head, arp_threshold=0.0,
    )
    lens = m["edge_cloud_draft_len_history"]
    # every iteration drafts exactly 1 token (the final budget-clamped
    # iteration may draft 0)
    assert max(lens) == 1
    assert all(g <= 1 for g in lens)


def test_adaptive_decoding_with_rl_updates(tmp_path):
    engine = _engine()
    head = init_arp_head(jax.random.PRNGKey(0), engine.draft.cfg.hidden_size, 16)
    rl = RLNetworkAdapter(model_path=str(tmp_path / "latest.pkl"), seed=0)
    out, m = engine.run(
        "adaptive_decoding", PROMPT, transfer_top_k=16,
        arp_params=head, arp_threshold=0.6, rl_adapter=rl, task_name="gsm8k",
    )
    assert m["generated_tokens"] == 12
    # transitions stored (one per iteration after the first)
    assert len(rl.agent.memory) == m["loop_times"] - 1
    assert m["dra_overhead_time"] > 0
    # checkpoint written by save()
    assert (tmp_path / "latest.pkl").exists()


def test_cee_sd_runs_with_arp_and_rl(tmp_path):
    engine = _engine(with_little=True)
    lhead = init_arp_head(jax.random.PRNGKey(0), engine.little.cfg.hidden_size, 16)
    dhead = init_arp_head(jax.random.PRNGKey(1), engine.draft.cfg.hidden_size, 16)
    lrl = RLNetworkAdapter(model_path=str(tmp_path / "little.pkl"), seed=0)
    mrl = RLNetworkAdapter(model_path=str(tmp_path / "main.pkl"), seed=1)
    out, m = engine.run(
        "adaptive_tridecoding", PROMPT, transfer_top_k=16,
        little_arp_params=lhead, draft_arp_params=dhead,
        little_rl=lrl, main_rl=mrl, task_name="mt_bench",
    )
    assert m["generated_tokens"] >= 12
    assert m["little_forward_times"] >= m["loop_times"]
    assert m["edge_end_data_bytes"] > 0
    assert m["edge_cloud_data_bytes"] > 0
    assert len(m["little_accept_rate_history"]) == m["loop_times"]
    assert (tmp_path / "little.pkl").exists()
    assert (tmp_path / "main.pkl").exists()


def test_cee_sd_lossless_vs_large_without_rl():
    engine = _engine(with_little=True)
    out_ar, _ = engine.run("large", PROMPT)
    out, m = engine.run("adaptive_tridecoding", PROMPT, transfer_top_k=32)
    n = min(out_ar.shape[1], out.shape[1])
    np.testing.assert_array_equal(out[0, :n], out_ar[0, :n])


def test_ceesd_without_arp_rl_steers_gammas(tmp_path):
    engine = _engine(with_little=True)
    lrl = RLNetworkAdapter(model_path=str(tmp_path / "l.pkl"), seed=0)
    mrl = RLNetworkAdapter(model_path=str(tmp_path / "m.pkl"), seed=1)
    out, m = engine.run(
        "ceesd_without_arp", PROMPT, transfer_top_k=16,
        little_rl=lrl, main_rl=mrl,
    )
    assert m["generated_tokens"] >= 12
    assert m["loop_times"] >= 1
