"""k-chain tree SD (`sd_tree` / `duodec`): losslessness + layout."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
from duodecoding_tpu.engine.tree_loops import tree_layout
from duodecoding_tpu.models import init_random_params, resolve_config

PROMPT = np.array([[5, 9, 2, 14, 27, 3, 11]], dtype=np.int32)


def make_engine(int8_kv=False, **kw):
    d_cfg = resolve_config("test-tiny")
    t_cfg = resolve_config("test-tiny-deep")
    d = Tier(d_cfg, init_random_params(d_cfg, jax.random.PRNGKey(3), jnp.float32))
    t = Tier(t_cfg, init_random_params(t_cfg, jax.random.PRNGKey(7), jnp.float32))
    cfg = EngineConfig(
        max_tokens=16,
        gamma=3,
        max_seq_len=128,
        param_dtype=jnp.float32,
        cache_dtype=jnp.float32,
        int8_kv_target=int8_kv,
        **kw,
    )
    return Engine(target=t, draft=d, config=cfg)


def test_tree_layout():
    offsets, mask = tree_layout(k=2, gamma=3)
    assert offsets.tolist() == [0, 1, 2, 3, 1, 2, 3]
    # every node sees the root token and its own chain prefix, nothing else
    assert mask[0].tolist() == [True] + [False] * 6
    assert mask[2].tolist() == [True, True, True, False, False, False, False]
    assert mask[6].tolist() == [True, False, False, False, True, True, True]


@pytest.mark.parametrize("k", [1, 2, 3])
def test_sd_tree_lossless_vs_large(k):
    eng = make_engine()
    out_ar, _ = eng.run("large", PROMPT)
    out_tree, m = eng.run("sd_tree", PROMPT, tree_k=k)
    np.testing.assert_array_equal(out_tree[0], out_ar[0])
    assert m["generated_tokens"] == 16
    assert m["target_forward_times"] == m["loop_times"]
    assert m["draft_accepted_tokens"] <= m["draft_generated_tokens"]


def test_sd_tree_int8_kv_target_lossless():
    eng = make_engine(int8_kv=True)
    out_ar, _ = eng.run("large", PROMPT)
    out_tree, _ = eng.run("sd_tree", PROMPT, tree_k=2)
    np.testing.assert_array_equal(out_tree[0], out_ar[0])


def test_sd_tree_wider_fork_never_fewer_commits():
    """At temp 0 a wider fork can only add accepted first tokens, so the
    iteration count is monotonically non-increasing in k (same pair)."""
    eng = make_engine()
    _, m1 = eng.run("sd_tree", PROMPT, tree_k=1)
    _, m3 = eng.run("sd_tree", PROMPT, tree_k=3)
    assert m3["loop_times"] <= m1["loop_times"]


def test_sd_tree_registered_aliases():
    from duodecoding_tpu.engine.registry import get_decoding_mode

    assert get_decoding_mode("duodec") is get_decoding_mode("sd_tree")
    assert get_decoding_mode("sd_kseq") is get_decoding_mode("sd_tree")


def test_sd_tree_rejects_sampling():
    eng = make_engine(temperature=0.7)
    with pytest.raises(NotImplementedError):
        eng.run("sd_tree", PROMPT)


def test_sd_tree_short_prompt_raises():
    eng = make_engine()
    with pytest.raises(ValueError):
        eng.run("sd_tree", np.array([[5, 9, 2]], dtype=np.int32))
