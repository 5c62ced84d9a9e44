"""cee_dssd / cee_dsd / cee_cuhlm variant tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
from duodecoding_tpu.models import init_random_params, resolve_config

PROMPT = np.array([[5, 9, 2, 14, 27, 3, 11, 8, 19, 4, 22, 31]], dtype=np.int32)


@pytest.fixture(scope="module")
def engine():
    l_cfg = resolve_config("test-tiny")
    t_cfg = resolve_config("test-tiny-deep")
    little = Tier(l_cfg, init_random_params(l_cfg, jax.random.PRNGKey(1), jnp.float32))
    draft = Tier(l_cfg, init_random_params(l_cfg, jax.random.PRNGKey(3), jnp.float32))
    target = Tier(t_cfg, init_random_params(t_cfg, jax.random.PRNGKey(7), jnp.float32))
    cfg = EngineConfig(
        max_tokens=12,
        gamma1=3,
        gamma2=2,
        max_seq_len=128,
        param_dtype=jnp.float32,
        cache_dtype=jnp.float32,
    )
    return Engine(target=target, draft=draft, little=little, config=cfg)


def test_cee_dssd_lossless_and_small_uplink(engine):
    out_ar, _ = engine.run("large", PROMPT)
    out, m = engine.run("cee_dssd", PROMPT, transfer_top_k=16)
    n = min(out.shape[1], out_ar.shape[1])
    np.testing.assert_array_equal(out[0, :n], out_ar[0, :n])
    assert m["edge_end_data_bytes"] > 0
    assert m["edge_cloud_data_bytes"] > 0


def test_cee_dsd_transfers_prob_windows(engine):
    out, m = engine.run("cee_dsd", PROMPT, transfer_top_k=16)
    assert m["generated_tokens"] >= 12
    # DSD uplinks a compressed window per stage -> strictly more bytes
    out2, m2 = engine.run("cee_dssd", PROMPT, transfer_top_k=16)
    assert m["edge_cloud_data_bytes"] > m2["edge_cloud_data_bytes"]


def test_cee_cuhlm_runs_and_gates(engine):
    out, m = engine.run("cee_cuhlm", PROMPT, transfer_top_k=16)
    assert m["generated_tokens"] >= 12
    assert m["loop_times"] >= 1
    assert m["little_accepted_tokens"] <= m["little_generated_tokens"]
    assert m["edge_end_data_bytes"] > 0
    assert len(m["edge_cloud_topk_history"]) == m["loop_times"]


def test_cee_cuhlm_threshold_extremes(engine):
    # threshold > 1: nothing is ever uncertain -> every draft accepted
    out, m = engine.run(
        "cee_cuhlm", PROMPT, transfer_top_k=16,
        little_threshold=1.5, draft_threshold=1.5,
    )
    assert m["little_accepted_tokens"] == m["little_generated_tokens"]
    assert m["draft_accepted_tokens"] == m["draft_generated_tokens"]
    # threshold 0: every position uncertain -> stage-1 rejects at 1st token
    out, m = engine.run(
        "cee_cuhlm", PROMPT, transfer_top_k=16,
        little_threshold=0.0, draft_threshold=0.0,
    )
    assert m["little_accepted_tokens"] == 0
    assert m["draft_accepted_tokens"] == 0
