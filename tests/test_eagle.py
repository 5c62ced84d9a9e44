"""EAGLE feature-level drafting: draft-network training, beam-tree
expansion, tree selection, and mode losslessness/acceptance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.adaptive.eagle import (
    collect_eagle_data,
    eagle_draft_step,
    eagle_forward,
    init_eagle_cache,
    init_eagle_params,
    select_tree_dynamic,
    select_tree_static,
    train_eagle,
)
from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
from duodecoding_tpu.models import init_random_params, resolve_config
from duodecoding_tpu.ops.tree import tree_from_parents

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
    eparams, loss = train_eagle(
        eparams, CFG, embed, head, *data, epochs=150, lr=2e-3
    )
    return params, eparams, embed, head, data


def test_eagle_forward_shapes():
    eparams = init_eagle_params(jax.random.PRNGKey(0), CFG)
    cache = init_eagle_cache(CFG, 1, 32)
    toks = jnp.ones((1, 4), jnp.int32)
    hid = jnp.zeros((1, 4, CFG.hidden_size), jnp.float32)
    embed = jnp.zeros((CFG.vocab_size, CFG.hidden_size), jnp.float32)
    feats, cache2 = eagle_forward(eparams, CFG, embed, toks, hid, cache)
    assert feats.shape == (1, 4, CFG.hidden_size)
    assert int(cache2.length) == 4


def test_eagle_learns(setup):
    params, eparams, embed, head, data = setup
    ph, pt, fl, tl, w = data
    cache = init_eagle_cache(CFG, ph.shape[0], ph.shape[1])
    feats, _ = eagle_forward(
        eparams, CFG, embed, jnp.asarray(pt), jnp.asarray(ph), cache
    )
    logits = np.asarray(feats @ head)
    m = w > 0
    acc = (logits.argmax(-1) == tl)[m].mean()
    # self-distilled on the target's own rollouts: far above 1/128 chance
    assert acc > 0.2


def test_draft_step_and_selection(setup):
    params, eparams, embed, head, data = setup
    ph, pt, fl, tl, w = data
    depth, top_k = 3, 4
    cache = init_eagle_cache(CFG, 1, 64)
    out = eagle_draft_step(
        eparams,
        embed,
        head,
        CFG,
        cache,
        jnp.asarray(pt[:1, :6]),
        jnp.asarray(ph[:1, :6]),
        jnp.int32(6),
        depth=depth,
        top_k=top_k,
    )
    assert out.root_tokens.shape == (top_k,)
    assert out.cand_tokens.shape == (depth, top_k, top_k)
    assert int(out.new_length) == 6

    toks, parents = select_tree_static(out, (3, 2, 1))
    assert len(toks) <= 6 and len(toks) == len(parents)
    # parents precede children
    for i, p in enumerate(parents):
        assert p < i

    toks2, parents2 = select_tree_dynamic(out, 8)
    assert len(toks2) >= 8  # may slightly overshoot via ancestor closure
    for i, p in enumerate(parents2):
        assert p < i
    # cumulative scores are monotone: every parent present
    tree = tree_from_parents(toks2, parents2, 16)
    assert tree.n_nodes >= 8
    # mask rows mark ancestor chains
    for i in range(tree.n_nodes):
        p = tree.parent[i]
        if p >= 0:
            assert tree.mask[i, p]


@pytest.mark.parametrize("mode", ["eagle", "eagle2"])
def test_eagle_mode_lossless_and_accepts(setup, mode):
    params, eparams, _, _, _ = setup
    engine = Engine(
        target=Tier(CFG, params),
        config=EngineConfig(
            max_tokens=16, max_seq_len=256,
            param_dtype=jnp.float32, cache_dtype=jnp.float32,
        ),
    )
    prompt = np.array([[5, 9, 2, 14, 27, 3]], dtype=np.int32)
    ar_out, _ = engine.run("large", prompt)
    out, m = engine.run(
        mode, prompt, eagle_params=eparams, depth=3, top_k=4,
        max_tree_nodes=16, total_tokens=12, widths=(4, 2, 2, 1),
    )
    n = min(out.shape[1], ar_out.shape[1])
    np.testing.assert_array_equal(out[0, :n], ar_out[0, :n])
    assert m["generated_tokens"] >= 16
    assert m["draft_accepted_tokens"] > 0
    assert m["target_forward_times"] < m["generated_tokens"]


def test_eagle_requires_params():
    params = init_random_params(CFG, jax.random.PRNGKey(1), jnp.float32)
    engine = Engine(
        target=Tier(CFG, params),
        config=EngineConfig(max_tokens=8, max_seq_len=128,
                            param_dtype=jnp.float32, cache_dtype=jnp.float32),
    )
    with pytest.raises(ValueError):
        engine.run("eagle", np.array([[1, 2, 3]], dtype=np.int32))
