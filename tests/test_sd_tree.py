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


def test_sd_tree_temperature_typical_acceptance():
    """temp > 0: typical-acceptance sampled verification (reference medusa
    evaluate_posterior semantics). Runs to completion, emits the budget,
    accepts when the pair agrees, and is reproducible per engine seed."""
    eng = make_engine(temperature=0.7, seed=11)
    out, m = eng.run("sd_tree", PROMPT, tree_spec="3,2,1")
    assert m["generated_tokens"] == 16
    assert out.shape[1] == PROMPT.shape[1] + 16
    assert 0 <= m["draft_accepted_tokens"] <= m["draft_generated_tokens"]
    eng2 = make_engine(temperature=0.7, seed=11)
    out2, _ = eng2.run("sd_tree", PROMPT, tree_spec="3,2,1")
    np.testing.assert_array_equal(out, out2)


def test_sd_tree_typical_acceptance_formula():
    """The sampled walk implements the reference formula exactly: accept
    candidate x at a node iff p_parent(x) > min(eps, alpha*exp(-H(p)))
    (reference src/model/medusa/utils.py:274-320). Pinning eps/alpha at
    the extremes pins the accept behavior."""
    eng = make_engine(temperature=0.7, seed=3)
    # threshold -inf-ish: accept anything the draft proposes -> commits
    # gamma+1 per iteration, so loop count hits the minimum
    _, m_all = eng.run(
        "sd_tree", PROMPT, tree_spec="2,1,1",
        posterior_threshold=0.0, posterior_alpha=0.0,
    )
    # threshold 1: nothing can exceed prob 1 -> every iteration commits
    # exactly 1 (the sampled bonus)
    _, m_none = eng.run(
        "sd_tree", PROMPT, tree_spec="2,1,1",
        posterior_threshold=1.0, posterior_alpha=1e9,
    )
    assert m_all["draft_accepted_tokens"] == m_all["draft_generated_tokens"]
    assert m_none["draft_accepted_tokens"] == 0
    assert m_none["loop_times"] == 16


def test_sd_tree_short_prompt_raises():
    eng = make_engine()
    with pytest.raises(ValueError):
        eng.run("sd_tree", np.array([[5, 9, 2]], dtype=np.int32))


# --- branch-spec trees -------------------------------------------------


def test_spec_layout_invariants():
    from duodecoding_tpu.engine.tree_loops import spec_layout

    for spec in [(2, 1, 1), (2, 2, 1), (3, 2), (4, 2, 2, 1), (1, 1)]:
        lay = spec_layout(spec)
        gamma = len(spec)
        B = int(np.prod(spec))
        T = 1 + len(lay.node_from_lane)
        assert lay.offsets.shape == (T,)
        assert lay.mask.shape == (T, T)
        assert lay.lane_nodes.shape == (B, gamma)
        # relocation safety: a lane's level-i row is always >= i+1 and
        # strictly increases with depth
        for l in range(B):
            rows = lay.lane_nodes[l]
            assert all(rows[i] >= i + 1 for i in range(gamma))
            assert all(rows[i] < rows[i + 1] for i in range(gamma - 1))
        # parent rows: level 0's parent is the root row 0
        assert (lay.parent_rows[:, 0] == 0).all()
        np.testing.assert_array_equal(
            lay.parent_rows[:, 1:], lay.lane_nodes[:, :-1]
        )
        # every node sees exactly root + its ancestors + itself
        for l in range(B):
            for i in range(gamma):
                r = lay.lane_nodes[l, i]
                expect = {0, r} | {lay.lane_nodes[l, a] for a in range(i)}
                assert set(np.nonzero(lay.mask[r])[0].tolist()) == expect
        # node count = number of distinct prefixes
        prefixes = set()
        for l in range(B):
            for i in range(gamma):
                prefixes.add(tuple(lay.pick[: i + 1, l]))
        assert T == 1 + len(prefixes)


@pytest.mark.parametrize("spec", [(2, 2, 1), (3, 2), (2, 2, 2)])
def test_sd_tree_branch_spec_lossless(spec):
    eng = make_engine()
    out_ar, _ = eng.run("large", PROMPT)
    out_tree, m = eng.run("sd_tree", PROMPT, tree_spec=spec)
    np.testing.assert_array_equal(out_tree[0], out_ar[0])
    assert m["generated_tokens"] == 16


def test_sd_tree_branch_spec_int8_kv_lossless():
    eng = make_engine(int8_kv=True)
    out_ar, _ = eng.run("large", PROMPT)
    out_tree, _ = eng.run("sd_tree", PROMPT, tree_spec=(2, 2, 1))
    np.testing.assert_array_equal(out_tree[0], out_ar[0])


def test_sd_tree_spec_string_and_validation():
    from duodecoding_tpu.engine.modes.sd_tree import parse_spec

    assert parse_spec("4,2,2,1") == (4, 2, 2, 1)
    assert parse_spec("3x2x1") == (3, 2, 1)
    assert parse_spec((2, 2)) == (2, 2)
    with pytest.raises(ValueError):
        parse_spec("")
    with pytest.raises(ValueError):
        parse_spec((2, 0))


def test_sd_tree_deeper_hedge_never_fewer_commits():
    """Hedging level 2 as well can only extend accepted prefixes (the
    (k,1,..) tree's paths are a subset), so iterations never increase."""
    eng = make_engine()
    _, m_chain = eng.run("sd_tree", PROMPT, tree_spec=(2, 1, 1))
    _, m_deep = eng.run("sd_tree", PROMPT, tree_spec=(2, 2, 2))
    assert m_deep["loop_times"] <= m_chain["loop_times"]


def test_sd_tree_dynamic_width_lossless_and_switching():
    """Adaptive width (multiple specs + gap thresholds) stays lossless —
    every branch follows the target's argmax path — and actually switches
    (per-iteration actual_gamma varies when the threshold separates
    confident/uncertain steps)."""
    eng = make_engine()
    out_ar, _ = eng.run("large", PROMPT)
    out_d, m = eng.run(
        "sd_tree", PROMPT, tree_spec="3,2,1,1;2,1", tree_gap=(1.0,)
    )
    np.testing.assert_array_equal(out_d[0], out_ar[0])
    assert m["generated_tokens"] == 16
    # thresholds at the extremes pin the branch: gap < inf always -> wide;
    # gap < -inf never -> narrow. Both stay lossless.
    out_w, mw = eng.run(
        "sd_tree", PROMPT, tree_spec="3,2,1,1;2,1", tree_gap=(1e9,)
    )
    out_n, mn = eng.run(
        "sd_tree", PROMPT, tree_spec="3,2,1,1;2,1", tree_gap=(-1e9,)
    )
    np.testing.assert_array_equal(out_w[0], out_ar[0])
    np.testing.assert_array_equal(out_n[0], out_ar[0])
    # pinned-wide spec has gamma 2 rows, pinned-narrow gamma 4
    assert mw["avg_draft_len"] == 2.0
    assert mn["avg_draft_len"] == 4.0


def test_tree_sample_step_matches_reference_formula():
    """tree_sample_step's accept flags reproduce the reference formula
    p_parent(tok) > min(eps, alpha*exp(-H(p_parent)))
    (src/model/medusa/utils.py:274-320) against a numpy recomputation."""
    import jax
    import jax.numpy as jnp

    from duodecoding_tpu.engine.modes.rest import tree_sample_step
    from duodecoding_tpu.engine.sampling_config import SamplingConfig
    from duodecoding_tpu.models import init_random_params, resolve_config
    from duodecoding_tpu.models.transformer import init_cache

    cfg = resolve_config("test-tiny")
    params = init_random_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    cache = init_cache(cfg, 1, 64, jnp.float32)
    W = 8
    win = np.array([[5, 9, 2, 14, 27, 3, 11, 6]], np.int32)
    offsets = np.arange(W, dtype=np.int32)
    mask = np.tril(np.ones((W, W), bool))
    parent_rows = np.array([2, 3, 3], np.int32)
    node_tokens = np.array([14, 27, 9], np.int32)
    sampling = SamplingConfig(temperature=0.7, top_k=0, top_p=0.0)
    eps, alpha = 0.09, 0.3
    sampled, flags, hidden, _ = tree_sample_step(
        params.copy(), jnp.asarray(win), jnp.asarray(offsets),
        jnp.asarray(mask), jnp.asarray(parent_rows),
        jnp.asarray(node_tokens), jax.random.PRNGKey(1), cache,
        cfg=cfg, sampling=sampling, typical=(eps, alpha),
    )
    # numpy recomputation from raw logits
    from duodecoding_tpu.models.transformer import forward

    cache2 = init_cache(cfg, 1, 64, jnp.float32)
    logits, _ = forward(
        params, cfg, jnp.asarray(win), cache2,
        position_offsets=jnp.asarray(offsets), window_mask=jnp.asarray(mask),
    )
    p = np.asarray(jax.nn.softmax(np.asarray(logits[0]) / 0.7, axis=-1))
    h = -np.sum(p * np.log(np.maximum(p, 1e-12)), axis=-1)
    thr = np.minimum(eps, alpha * np.exp(-h))
    want = p[parent_rows, node_tokens] > thr[parent_rows]
    np.testing.assert_array_equal(np.asarray(flags), want)


def test_suite_runner_matches_sequential():
    """Fused multi-prompt suite (engine.run_suite; one lax.scan program)
    is token-identical to sequential per-prompt runs for both `large`
    and `sd_tree`, with matching per-prompt accept accounting."""
    rng = np.random.default_rng(5)
    prompts = rng.integers(1, 250, size=(3, 7)).astype(np.int32)

    eng = make_engine()
    seq = [eng.run("large", prompts[i][None, :]) for i in range(3)]
    suite = eng.run_suite("large", prompts)
    assert len(suite) == 3
    for (o_s, m_s), (o_q, m_q) in zip(seq, suite):
        np.testing.assert_array_equal(o_q[0], o_s[0])
        assert m_q["generated_tokens"] == m_s["generated_tokens"]
        assert m_q["loop_times"] == m_s["loop_times"]
        assert "suite_wall_time" in m_q

    spec = (2, 2, 1)
    seq = [
        eng.run("sd_tree", prompts[i][None, :], tree_spec=spec)
        for i in range(3)
    ]
    suite = eng.run_suite("sd_tree", prompts, tree_spec=spec)
    for (o_s, m_s), (o_q, m_q) in zip(seq, suite):
        np.testing.assert_array_equal(o_q[0], o_s[0])
        assert m_q["draft_accepted_tokens"] == m_s["draft_accepted_tokens"]
        assert m_q["draft_generated_tokens"] == m_s["draft_generated_tokens"]
        assert m_q["loop_times"] == m_s["loop_times"]


def test_suite_runner_int8_kv_matches_sequential():
    eng = make_engine(int8_kv=True)
    rng = np.random.default_rng(9)
    prompts = rng.integers(1, 250, size=(2, 7)).astype(np.int32)
    seq = [
        eng.run("sd_tree", prompts[i][None, :], tree_spec=(2, 1, 1))
        for i in range(2)
    ]
    suite = eng.run_suite("sd_tree", prompts, tree_spec=(2, 1, 1))
    for (o_s, _), (o_q, _) in zip(seq, suite):
        np.testing.assert_array_equal(o_q[0], o_s[0])


def test_suite_fallback_modes_run_sequentially():
    """Modes without a suite runner (and dynamic-width tree specs) fall
    back to per-prompt run() with identical outputs."""
    eng = make_engine()
    rng = np.random.default_rng(11)
    prompts = rng.integers(1, 250, size=(2, 7)).astype(np.int32)
    # `small` (draft-tier AR) has no suite runner: sequential fallback
    suite = eng.run_suite("small", prompts)
    seq = [eng.run("small", prompts[i][None, :]) for i in range(2)]
    for (o_s, m_s), (o_q, m_q) in zip(seq, suite):
        np.testing.assert_array_equal(o_q[0], o_s[0])
        assert "suite_wall_time" not in m_q
    # dynamic-width tree spec: suite runner raises SuiteFallback
    # internally; run_suite silently falls back
    dyn = eng.run_suite("sd_tree", prompts, tree_spec="2,1,1;1,1,1",
                        tree_gap=0.5)
    assert len(dyn) == 2


def test_sd_suite_runner_matches_sequential():
    """Round-5: fused chain-SD suite (loops.py:sd_generate_suite) is
    token-identical to sequential `sd` runs at greedy, with matching
    accept accounting and the fused suite_wall_time marker."""
    eng = make_engine()
    rng = np.random.default_rng(13)
    prompts = rng.integers(1, 250, size=(3, 7)).astype(np.int32)
    seq = [eng.run("sd", prompts[i][None, :]) for i in range(3)]
    suite = eng.run_suite("sd", prompts)
    assert len(suite) == 3
    for (o_s, m_s), (o_q, m_q) in zip(seq, suite):
        np.testing.assert_array_equal(o_q[0], o_s[0])
        assert m_q["draft_accepted_tokens"] == m_s["draft_accepted_tokens"]
        assert m_q["draft_generated_tokens"] == m_s["draft_generated_tokens"]
        assert m_q["loop_times"] == m_s["loop_times"]
        assert "suite_wall_time" in m_q


def test_sd_suite_runner_int8_kv_matches_sequential():
    eng = make_engine(int8_kv=True)
    rng = np.random.default_rng(17)
    prompts = rng.integers(1, 250, size=(2, 7)).astype(np.int32)
    seq = [eng.run("sd", prompts[i][None, :]) for i in range(2)]
    suite = eng.run_suite("sd", prompts)
    for (o_s, _), (o_q, _) in zip(seq, suite):
        np.testing.assert_array_equal(o_q[0], o_s[0])
