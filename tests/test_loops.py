"""Device-loop correctness: AR baseline, SD losslessness (greedy SD output
must equal greedy target-AR output — the consistency property the reference
checks with calculate_consistency.py), perfect-draft acceptance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duodecoding_tpu.engine.loops import ar_generate, prefill, sd_generate
from duodecoding_tpu.engine.sampling_config import SamplingConfig
from duodecoding_tpu.models import init_cache, init_random_params, resolve_config

CFG = resolve_config("test-tiny")
CFG_DEEP = resolve_config("test-tiny-deep")
S = 128
GREEDY = SamplingConfig(temperature=0.0)


def _setup(cfg, seed, prompt):
    params = init_random_params(cfg, jax.random.PRNGKey(seed), dtype=jnp.float32)
    cache = init_cache(cfg, 1, S, dtype=jnp.float32)
    tokens = jnp.zeros((1, S), jnp.int32)
    tokens = tokens.at[0, : len(prompt)].set(jnp.array(prompt))
    cache = prefill(params, cfg, cache, tokens[:, : len(prompt)])
    assert int(cache.length) == len(prompt) - 1
    return params, cache, tokens


PROMPT = [5, 9, 2, 14, 27, 3, 11]


def _ar(params, cfg, tokens, cache, max_new=24, sampling=GREEDY, eos=()):
    out_tokens, n, _, steps = ar_generate(
        params,
        cfg=cfg,
        tokens=tokens,
        cache=cache,
        n_tokens=jnp.int32(len(PROMPT)),
        key=jax.random.PRNGKey(0),
        sampling=sampling,
        max_new_tokens=max_new,
        eos_ids=eos,
    )
    return np.asarray(out_tokens[0, : int(n)]), int(steps)


def test_ar_generate_greedy_deterministic():
    params, cache, tokens = _setup(CFG, 0, PROMPT)
    seq1, steps = _ar(params, CFG, tokens, cache)
    assert steps == 24
    assert len(seq1) == len(PROMPT) + 24
    params, cache, tokens = _setup(CFG, 0, PROMPT)
    seq2, _ = _ar(params, CFG, tokens, cache)
    np.testing.assert_array_equal(seq1, seq2)


def _sd(draft_params, target_params, d_cfg, t_cfg, gamma=4, max_new=24, **kw):
    d_cache = init_cache(d_cfg, 1, S, dtype=jnp.float32)
    t_cache = init_cache(t_cfg, 1, S, dtype=jnp.float32)
    tokens = jnp.zeros((1, S), jnp.int32)
    tokens = tokens.at[0, : len(PROMPT)].set(jnp.array(PROMPT))
    d_cache = prefill(draft_params, d_cfg, d_cache, tokens[:, : len(PROMPT)])
    t_cache = prefill(target_params, t_cfg, t_cache, tokens[:, : len(PROMPT)])
    out = sd_generate(
        draft_params,
        target_params,
        tokens,
        jnp.int32(len(PROMPT)),
        d_cache,
        t_cache,
        jax.random.PRNGKey(1),
        draft_cfg=d_cfg,
        target_cfg=t_cfg,
        gamma=gamma,
        draft_sampling=GREEDY,
        target_sampling=GREEDY,
        max_new_tokens=max_new,
        **kw,
    )
    return out


def test_sd_greedy_is_lossless_vs_target_ar():
    t_params, t_cache, tokens = _setup(CFG_DEEP, 7, PROMPT)
    ar_seq, _ = _ar(t_params, CFG_DEEP, tokens, t_cache)

    d_params = init_random_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    out_tokens, n, records, iters, d_steps, t_steps = _sd(
        d_params, t_params, CFG, CFG_DEEP
    )
    sd_seq = np.asarray(out_tokens[0, : int(n)])
    m = min(len(ar_seq), len(sd_seq))
    np.testing.assert_array_equal(sd_seq[:m], ar_seq[:m])
    assert int(iters) >= 1
    assert int(t_steps) == int(iters)


def test_sd_perfect_draft_accepts_most():
    # identical draft/target: accept rate should be high. It is not exactly
    # 1.0 because the T=1 draft forward and the T=gamma+1 verify forward can
    # differ in float reduction order, flipping near-tie argmaxes on a tiny
    # random 128-vocab model.
    t_params = init_random_params(CFG, jax.random.PRNGKey(5), dtype=jnp.float32)
    out_tokens, n, records, iters, d_steps, t_steps = _sd(
        t_params, t_params, CFG, CFG, gamma=4, max_new=20
    )
    it = int(iters)
    acc = np.asarray(records.accepted[:it])
    ag = np.asarray(records.actual_gamma[:it])
    assert np.all(acc <= ag)
    assert acc.sum() >= 0.6 * ag.sum()
    em = np.asarray(records.emitted[:it])
    np.testing.assert_array_equal(em, acc + 1)
    assert int(n) - len(PROMPT) >= 20


def test_sd_records_accept_rate_bounds():
    t_params = init_random_params(CFG_DEEP, jax.random.PRNGKey(7), dtype=jnp.float32)
    d_params = init_random_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    out_tokens, n, records, iters, d_steps, t_steps = _sd(
        d_params, t_params, CFG, CFG_DEEP, gamma=3, max_new=12
    )
    it = int(iters)
    ar_ = np.asarray(records.accept_rate[:it])
    assert np.all(ar_ >= 0) and np.all(ar_ <= 1)
    ent = np.asarray(records.draft_entropy[:it])
    assert np.all(ent >= -1e-5)


def test_ar_eos_stops_generation():
    params, cache, tokens = _setup(CFG, 0, PROMPT)
    # find the first greedily generated token, then use it as "EOS"
    seq, _ = _ar(params, CFG, tokens, cache, max_new=8)
    eos = int(seq[len(PROMPT)])
    params, cache, tokens = _setup(CFG, 0, PROMPT)
    seq2, steps = _ar(params, CFG, tokens, cache, max_new=8, eos=(eos,))
    assert steps == 1
    assert len(seq2) == len(PROMPT) + 1


def test_sd_with_rebuild_topk_still_runs():
    t_params = init_random_params(CFG_DEEP, jax.random.PRNGKey(7), dtype=jnp.float32)
    d_params = init_random_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    out_tokens, n, records, iters, _, _ = _sd(
        d_params, t_params, CFG, CFG_DEEP, gamma=3, max_new=12, rebuild_top_k=16
    )
    assert int(n) >= len(PROMPT) + 12


def test_sd_respects_token_budget_exactly():
    t_params = init_random_params(CFG_DEEP, jax.random.PRNGKey(7), dtype=jnp.float32)
    d_params = init_random_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    for max_new in (5, 11, 24):
        out_tokens, n, *_ = _sd(d_params, t_params, CFG, CFG_DEEP, gamma=4, max_new=max_new)
        assert int(n) - len(PROMPT) == max_new


def test_prefill_chunk_sizes_padded_tail():
    from duodecoding_tpu.engine.loops import prefill_chunk_sizes

    # one padded power-of-two tail
    assert prefill_chunk_sizes(63) == [64]
    assert prefill_chunk_sizes(64) == [64]
    assert prefill_chunk_sizes(100) == [128]
    assert prefill_chunk_sizes(600) == [512, 128]
    assert prefill_chunk_sizes(0) == []
    # cap fallback: padded tail would overrun the cache -> binary chunks
    assert prefill_chunk_sizes(100, cap=110) == [64, 32, 4]
    assert sum(prefill_chunk_sizes(100, cap=110)) == 100


def test_prefill_padded_equals_exact():
    """Padded-tail prefill must yield the same decode continuation as an
    exact (unpadded) chunk plan."""
    import numpy as np

    from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
    from duodecoding_tpu.models import init_random_params, resolve_config

    cfg = resolve_config("test-tiny")
    t = Tier(cfg, init_random_params(cfg, jax.random.PRNGKey(5), jnp.float32))
    # prompt length 12 -> n=11 -> padded tail 16 > 11
    prompt = np.arange(3, 15, dtype=np.int32)[None, :]
    ec = EngineConfig(max_tokens=8, max_seq_len=64, param_dtype=jnp.float32,
                      cache_dtype=jnp.float32)
    eng = Engine(target=t, config=ec)
    out1, _ = eng.run("large", prompt)
    out2, _ = eng.run("large", prompt)
    np.testing.assert_array_equal(out1, out2)


def test_padded_int4_head_matches_unpadded():
    """quantize_params pads lm_head columns to full kernel tiles; logits
    must match the unpadded quantization on the real vocab columns."""
    import numpy as np

    from duodecoding_tpu.models import (
        forward, init_cache, init_random_params, resolve_config,
    )
    from duodecoding_tpu.models.quant import quantize_params

    cfg = resolve_config("test-tiny")  # untied by default
    params = init_random_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qp = quantize_params(params, group_size=16)
    assert qp["lm_head"]["packed"].shape[-1] % 512 == 0
    tokens = jnp.array([[3, 1, 4]], jnp.int32)
    logits, _ = forward(qp, cfg, tokens, init_cache(cfg, 1, 16, jnp.float32))
    assert logits.shape[-1] == cfg.vocab_size
