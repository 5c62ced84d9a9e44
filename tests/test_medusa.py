"""Medusa multi-head drafting: head training, candidate trees, mode
losslessness and acceptance with self-distilled heads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.adaptive.medusa import (
    collect_distill_data,
    generate_candidates,
    init_medusa_heads,
    medusa_apply,
    train_medusa_heads,
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
    hiddens, labels = collect_distill_data(
        params, CFG, prompts, max_new=24, num_heads=2
    )
    heads = init_medusa_heads(jax.random.PRNGKey(0), CFG.hidden_size, CFG.vocab_size, 2)
    heads, loss = train_medusa_heads(heads, hiddens, labels, epochs=60, batch_size=64)
    return params, heads, hiddens, labels


def test_heads_learn_above_chance(setup):
    params, heads, hiddens, labels = setup
    logits = np.asarray(medusa_apply(heads, jnp.asarray(hiddens)))
    acc0 = (logits[:, 0].argmax(-1) == labels[:, 0]).mean()
    # trained on the model's own greedy rollouts: way above 1/128 chance
    assert acc0 > 0.2


def test_generate_candidates_shapes():
    hl = np.random.default_rng(0).normal(size=(2, 50))
    paths = generate_candidates(hl, [3, 2])
    assert len(paths) == 6
    assert all(len(p) == 2 for p in paths)


def test_medusa_mode_lossless_and_accepts(setup):
    params, heads, _, _ = setup
    engine = Engine(
        target=Tier(CFG, params),
        config=EngineConfig(
            max_tokens=16, max_seq_len=128,
            param_dtype=jnp.float32, cache_dtype=jnp.float32,
        ),
    )
    prompt = np.array([[5, 9, 2, 14, 27, 3]], dtype=np.int32)
    ar_out, _ = engine.run("large", prompt)
    out, m = engine.run("medusa", prompt, medusa_heads=heads, top_per_head=(3, 2))
    n = min(out.shape[1], ar_out.shape[1])
    np.testing.assert_array_equal(out[0, :n], ar_out[0, :n])
    assert m["generated_tokens"] >= 16
    # trained heads should get some tree nodes accepted
    assert m["draft_accepted_tokens"] > 0
    # and fewer target forwards than tokens (speedup structure)
    assert m["target_forward_times"] < m["generated_tokens"]
