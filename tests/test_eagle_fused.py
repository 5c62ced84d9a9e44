"""Device-resident EAGLE-2 (`eagle2_fused`): losslessness + parity with
the host-driven `eagle2` (shared beam-expansion code path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.adaptive.eagle import (
    collect_eagle_data,
    init_eagle_params,
    train_eagle,
)
from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
from duodecoding_tpu.models import init_random_params, resolve_config

CFG = resolve_config("test-tiny")


@pytest.fixture(scope="module")
def setup():
    params = init_random_params(CFG, jax.random.PRNGKey(7), jnp.float32)
    prompts = np.array(
        [[5, 9, 2, 14, 27, 3], [8, 1, 7, 22, 3, 9], [4, 4, 11, 30, 2, 6]]
    )
    data = collect_eagle_data(params, CFG, prompts, max_new=32)
    eparams = init_eagle_params(jax.random.PRNGKey(0), CFG)
    embed = params["embed"]
    head = params["embed"].T if CFG.tie_word_embeddings else params["lm_head"]
    eparams, _ = train_eagle(
        eparams, CFG, embed, head, *data, epochs=150, lr=2e-3
    )
    return params, eparams


def make_engine(params, max_tokens=16):
    return Engine(
        target=Tier(CFG, params),
        config=EngineConfig(
            max_tokens=max_tokens, max_seq_len=256,
            param_dtype=jnp.float32, cache_dtype=jnp.float32,
        ),
    )


@pytest.mark.parametrize("kw", [
    dict(depth=3, top_k=4, n_nodes=12),
    dict(depth=4, top_k=2, n_nodes=8),
])
def test_eagle2_fused_lossless(setup, kw):
    params, eparams = setup
    engine = make_engine(params)
    prompt = np.array([[5, 9, 2, 14, 27, 3]], dtype=np.int32)
    ar_out, _ = engine.run("large", prompt)
    out, m = engine.run("eagle2_fused", prompt, eagle_params=eparams, **kw)
    n = min(out.shape[1], ar_out.shape[1])
    np.testing.assert_array_equal(out[0, :n], ar_out[0, :n])
    assert m["generated_tokens"] >= 16
    assert m["draft_accepted_tokens"] > 0
    assert m["target_forward_times"] == m["loop_times"]


def test_eagle2_fused_long_prompt_seeding(setup):
    """Prompt longer than one seed chunk exercises the chunked catch-up."""
    from duodecoding_tpu.engine.modes import eagle_fused as ef

    params, eparams = setup
    engine = make_engine(params)
    rng = np.random.default_rng(3)
    prompt = rng.integers(1, CFG.vocab_size, (1, ef.SEED_CHUNK + 9))
    ar_out, _ = engine.run("large", prompt)
    out, _ = engine.run(
        "eagle2_fused", prompt, eagle_params=eparams,
        depth=3, top_k=4, n_nodes=12,
    )
    n = min(out.shape[1], ar_out.shape[1])
    np.testing.assert_array_equal(out[0, :n], ar_out[0, :n])


def test_eagle2_fused_int8_kv_target(setup):
    params, eparams = setup
    engine = Engine(
        target=Tier(CFG, params),
        config=EngineConfig(
            max_tokens=12, max_seq_len=256,
            param_dtype=jnp.float32, cache_dtype=jnp.float32,
            int8_kv_target=True,
        ),
    )
    prompt = np.array([[5, 9, 2, 14, 27, 3]], dtype=np.int32)
    ar_out, _ = engine.run("large", prompt)
    out, _ = engine.run(
        "eagle2_fused", prompt, eagle_params=eparams,
        depth=3, top_k=4, n_nodes=12,
    )
    n = min(out.shape[1], ar_out.shape[1])
    np.testing.assert_array_equal(out[0, :n], ar_out[0, :n])


def test_eagle2_fused_requires_params(setup):
    params, _ = setup
    engine = make_engine(params)
    with pytest.raises(ValueError):
        engine.run("eagle2_fused", np.array([[1, 2, 3]], dtype=np.int32))
