"""Device-resident decoding loops.

The reference decodes with a Python loop that round-trips host<->device
every draft token (reference: src/model_gpu.py:284-358,
src/engine.py:549-805). Here entire generations run as single
``lax.while_loop`` programs on device: the host dispatches ONE computation
per request and reads back the token buffer plus compact per-iteration
records, from which the communication simulator and metrics are replayed
exactly (the cost model depends only on per-iteration counts, never on
values, for the non-adaptive modes).

Invariants (established by prefill, preserved by every iteration):
- the target cache lags the token buffer by exactly 1 at iteration
  boundaries (the newest token is never cached — its KV is computed by the
  next forward, exactly like the reference's ``x[:, cached_len:]``
  slicing);
- the draft cache lags by 1 (reject path) or 2 (all-accept path: the bonus
  token AND the last draft token's KV are both absent, matching the
  reference's rollback clamp in src/model_gpu.py:362-383). The draft loop
  therefore starts every iteration by rewinding to ``n_tokens - 2`` and
  catching up with one T=2 forward — recomputing at most one identical KV
  row, which keeps every shape static;
- the token buffer is fixed-shape [B, S]; ``n_tokens`` is the only length.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.sampling_config import SamplingConfig
from duodecoding_tpu.models.config import ModelConfig
from duodecoding_tpu.models.transformer import KVCache, forward, set_cache_length
from duodecoding_tpu.ops.sampling import (
    max_fn,
    norm_logits,
    rebuild_topk_uniform_probs,
    rebuild_topk_uniform_probs_dynamic,
    sample,
)
from duodecoding_tpu.ops.verify import compute_acceptance


def entropy(probs: jax.Array) -> jax.Array:
    """Shannon entropy per row (nats)."""
    p = jnp.maximum(probs, 1e-12)
    return -jnp.sum(p * jnp.log(p), axis=-1)


def _sample_from_probs(key, probs, sampling: SamplingConfig):
    if sampling.greedy:
        return jnp.argmax(probs, axis=-1)[..., None].astype(jnp.int32)
    return sample(key, probs)


def _stops_hit(tokens, start, count, eos_ids, max_scan: int):
    """Whether any of the ``count`` tokens written at [start, start+count)
    is an EOS token. Static scan over max_scan positions."""
    if not eos_ids:
        return jnp.zeros((tokens.shape[0],), bool)
    hit = jnp.zeros((tokens.shape[0],), bool)
    for i in range(max_scan):
        pos = start + i
        tok = jax.lax.dynamic_index_in_dim(tokens, pos, axis=1, keepdims=False)
        is_eos = jnp.zeros_like(hit)
        for e in eos_ids:
            is_eos = is_eos | (tok == e)
        hit = hit | (is_eos & (i < count))
    return hit


# --------------------------------------------------------------------------
# Prefill
# --------------------------------------------------------------------------


def prefill_chunk_sizes(
    length: int, max_chunk: int = 512, cap: int | None = None
) -> list[int]:
    """Chunk plan for a prompt: full ``max_chunk`` chunks plus ONE
    power-of-two-padded tail. Each chunk is a full weight-stream over the
    model, so fewer chunks beat tighter chunks: the old binary
    decomposition ([32,16,8,4,2,1] for 63) streamed the weights log2(n)
    times per prompt (~84 ms each at 13B) where one padded forward
    suffices. The padded tail positions write garbage KV rows beyond the
    prompt; the caller clamps the cache length back (pure bookkeeping).
    ``cap`` (cache capacity) bounds the total written span — when the
    padded tail would overrun it, the tail falls back to binary chunks."""
    sizes = []
    rem = length
    while rem >= max_chunk:
        sizes.append(max_chunk)
        rem -= max_chunk
    if rem:
        tail = max(8, 1 << (rem - 1).bit_length())
        if cap is None or (length - rem) + tail <= cap:
            sizes.append(tail)
        else:  # binary decomposition of the remainder (no padding)
            c = max_chunk // 2
            while c >= 1:
                while rem >= c:
                    sizes.append(c)
                    rem -= c
                c //= 2
    return sizes


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2,))
def prefill_step(params, cfg: ModelConfig, cache: KVCache, tokens: jax.Array):
    """Advance the cache over ``tokens`` (one chunk)."""
    _, cache = forward(params, cfg, tokens, cache)
    return cache


def prefill_plan_for(
    length: int, cap: int | None = None, max_chunk: int = 512
) -> tuple[int, ...]:
    """STATIC chunk plan covering a ``length``-token prompt's lag-1 prefill.

    The plan — not the exact length — is what the fused generate programs
    specialise on: every prompt length whose (power-of-two-padded) plan
    matches shares ONE compiled program, fixing the per-prompt-length
    recompile (5-12 min each for the 13B nested decode programs on the
    remote backend) that an exact static prefill_len caused. Lengths
    bucket at powers of two: L in (33, 65] -> plan (64,), etc.
    """
    return tuple(prefill_chunk_sizes(length - 1, max_chunk, cap))


def prefill_by_plan(
    params, cfg: ModelConfig, cache, tokens: jax.Array,
    plan: tuple[int, ...], n_tokens: jax.Array,
):
    """Prefill driven by a static ``plan`` + TRACED token count.

    Processes ``sum(plan) >= n_tokens - 1`` buffer positions in
    static-shape chunks; positions at/beyond ``n_tokens - 1`` are buffer
    padding whose KV rows land past the clamped final length (the same
    staleness contract as the padded tail in ``prefill``/rollback). The
    final cache length is the traced ``n_tokens - 1`` (lag-1 invariant),
    so the compiled program is independent of the exact prompt length.
    """
    off = 0
    for c in plan:
        _, cache = forward(params, cfg, tokens[:, off : off + c], cache)
        off += c
    return set_cache_length(cache, jnp.asarray(n_tokens, jnp.int32) - 1)


def prefill(params, cfg: ModelConfig, cache: KVCache, prompt: jax.Array):
    """Process ``prompt[:, :-1]`` into the cache (lag-1 invariant).

    The final chunk is right-padded to a power of two: pad positions
    attend causally (their outputs are discarded) and their KV rows land
    beyond the clamped final cache length, where the next forward
    overwrites or ignores them — the same staleness contract as rollback
    (see module docstring)."""
    n = prompt.shape[1] - 1
    off = 0
    for c in prefill_chunk_sizes(n, cap=cache.max_len):
        chunk = prompt[:, off : off + c]
        if chunk.shape[1] < c:  # padded tail
            chunk = jnp.pad(chunk, ((0, 0), (0, c - chunk.shape[1])))
        cache = prefill_step(params, cfg, cache, chunk)
        off += c
    return set_cache_length(cache, jnp.int32(n))


# --------------------------------------------------------------------------
# Autoregressive generation (modes `small` / `large`)
# --------------------------------------------------------------------------


class ARState(NamedTuple):
    tokens: jax.Array  # [B, S]
    n_tokens: jax.Array  # int32
    cache: KVCache
    key: jax.Array
    done: jax.Array  # [B] bool
    steps: jax.Array  # int32 — forward count


def _ar_generate_impl(
    params,
    *,
    cfg: ModelConfig,
    tokens: jax.Array,
    cache: KVCache,
    n_tokens: jax.Array,
    key: jax.Array,
    sampling: SamplingConfig,
    max_new_tokens: int,
    eos_ids: tuple[int, ...] = (),
    prefill_plan: tuple[int, ...] | None = None,
):
    """Traceable core of ``ar_generate`` (also scanned by
    ``ar_generate_suite``); returns (tokens, n_tokens, cache, steps)."""
    if prefill_plan is not None:
        cache = prefill_by_plan(params, cfg, cache, tokens, prefill_plan, n_tokens)
    limit = n_tokens + max_new_tokens

    def cond(s: ARState):
        return jnp.logical_and(s.n_tokens < limit, ~jnp.all(s.done))

    def body(s: ARState):
        key, k_s = jax.random.split(s.key)
        last = jax.lax.dynamic_slice_in_dim(s.tokens, s.n_tokens - 1, 1, axis=1)
        logits, cache = forward(params, cfg, last, s.cache)
        probs = norm_logits(
            logits[:, -1, :], sampling.temperature, sampling.top_k, sampling.top_p
        )
        tok = _sample_from_probs(k_s, probs, sampling)
        tokens = jax.lax.dynamic_update_slice(
            s.tokens, tok, (0, s.n_tokens)
        )
        done = s.done | _stops_hit(tokens, s.n_tokens, 1, eos_ids, 1)
        return ARState(
            tokens=tokens,
            n_tokens=s.n_tokens + 1,
            cache=cache,
            key=key,
            done=done,
            steps=s.steps + 1,
        )

    init = ARState(
        tokens=tokens,
        n_tokens=jnp.asarray(n_tokens, jnp.int32),
        cache=cache,
        key=key,
        done=jnp.zeros((tokens.shape[0],), bool),
        steps=jnp.int32(0),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out.tokens, out.n_tokens, out.cache, out.steps


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sampling", "max_new_tokens", "eos_ids", "prefill_plan"),
    donate_argnames=("tokens", "cache"),
)
def ar_generate(
    params,
    *,
    cfg: ModelConfig,
    tokens: jax.Array,
    cache: KVCache,
    n_tokens: jax.Array,
    key: jax.Array,
    sampling: SamplingConfig,
    max_new_tokens: int,
    eos_ids: tuple[int, ...] = (),
    prefill_plan: tuple[int, ...] | None = None,
):
    """Vanilla AR decode with KV cache (reference src/engine.py:549-608),
    whole generation in one while_loop.

    With ``prefill_plan`` (see prefill_plan_for) the prompt prefill runs
    INSIDE this program (``cache`` comes in empty): each dispatch is a
    ~27 ms RPC round trip on the remote backend, so fusing prefill+decode
    into one dispatch is a direct per-run saving — and the program
    specialises on the bucketed plan, not the exact prompt length."""
    return _ar_generate_impl(
        params, cfg=cfg, tokens=tokens, cache=cache, n_tokens=n_tokens,
        key=key, sampling=sampling, max_new_tokens=max_new_tokens,
        eos_ids=eos_ids, prefill_plan=prefill_plan,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sampling", "max_new_tokens", "eos_ids", "prefill_plan"),
    donate_argnames=("prompts", "cache"),
)
def ar_generate_suite(
    params,
    *,
    cfg: ModelConfig,
    prompts: jax.Array,  # [P, 1, S] — equal-length prompts, right-padded
    cache: KVCache,
    n_tokens: jax.Array,  # scalar: shared prompt length
    key: jax.Array,
    sampling: SamplingConfig,
    max_new_tokens: int,
    eos_ids: tuple[int, ...] = (),
    prefill_plan: tuple[int, ...] | None = None,
):
    """P independent single-prompt AR generations in ONE device program
    (``lax.scan`` over prompts; the KV cache is length-reset and reused
    between prompts, so stale KV is invisible — the engine's rollback
    invariant). Each remote dispatch carries an ~90 ms launch/completion
    floor (tools/fixed_cost_probe.py); running an evaluation suite as one
    program pays it once instead of once per prompt. Returns
    (tokens [P, 1, S], n_tokens [P], steps [P])."""

    def step(carry, prompt):
        cache, key = carry
        key, sub = jax.random.split(key)
        cache = set_cache_length(cache, 0)
        toks, n, cache, steps = _ar_generate_impl(
            params, cfg=cfg, tokens=prompt, cache=cache, n_tokens=n_tokens,
            key=sub, sampling=sampling, max_new_tokens=max_new_tokens,
            eos_ids=eos_ids, prefill_plan=prefill_plan,
        )
        return (cache, key), (toks, n, steps)

    _, (toks, n, steps) = jax.lax.scan(step, (cache, key), prompts)
    return toks, n, steps


# --------------------------------------------------------------------------
# Speculative decoding (two tiers) — the shared core of sd / dsd / dssd
# --------------------------------------------------------------------------


class SDRecords(NamedTuple):
    """Per-iteration records for host-side comm/metrics replay. All arrays
    are pre-allocated at [max_iters, ...]; ``n_iters`` rows are valid."""

    actual_gamma: jax.Array  # [I] drafts produced this iteration
    accepted: jax.Array  # [I] continuously accepted drafts
    emitted: jax.Array  # [I] tokens appended (accepted + 1)
    draft_entropy: jax.Array  # [I] entropy of the last draft dist
    target_entropy: jax.Array  # [I] entropy of the decision row
    accept_rate: jax.Array  # [I] accepted / actual_gamma


class SDState(NamedTuple):
    tokens: jax.Array
    n_tokens: jax.Array
    draft_cache: KVCache
    target_cache: KVCache
    key: jax.Array
    done: jax.Array
    it: jax.Array  # iteration counter
    draft_steps: jax.Array
    target_steps: jax.Array
    records: SDRecords


def draft_tokens_loop(
    params,
    cfg: ModelConfig,
    tokens: jax.Array,
    n_tokens: jax.Array,
    cache: KVCache,
    key: jax.Array,
    gamma: int,
    sampling: SamplingConfig,
    rebuild_top_k: int | None = None,
    stop_fn=None,
    gamma_bound: jax.Array | None = None,
    catchup: int = 2,
    stop_carry_init: jax.Array | None = None,
):
    """Draft up to ``gamma`` tokens, writing them into the token buffer and
    producing the q window.

    Equivalent of the reference's ``KVCacheModel.generate`` /
    ``generate_with_rebuilt_topk`` (src/model_gpu.py:324-360): with
    ``rebuild_top_k`` the proposal is sampled from the top-k+uniform rebuilt
    distribution and that rebuilt row is recorded as q (verification
    parity). ``stop_fn(hidden, q_row, tok, i, carry)`` may stop drafting
    early (acceptance-prediction heads); it returns (stop?, carry).
    ``gamma_bound`` is a traced cap (token-budget clamp: the reference's
    ``min(gamma, remaining - 1)``); 0 drafts nothing (the mode then
    degenerates to a single target step).

    The drafting cache may lag the token buffer by up to ``catchup``
    positions (2 for two-tier SD; up to gamma1+gamma2+2 for the little tier
    of tridecoding, whose rollback is clamped by the stage-2 result); the
    loop starts by rewinding to ``n_tokens - catchup`` and catching up with
    one T=catchup forward whose last row is q_0. Rows recomputed below the
    cache's valid length are bit-identical. Requires ``n_tokens >= catchup``.

    Returns (tokens, cache, q_window [B, gamma, V], actual_gamma, key,
    stop_carry, l_window [B, gamma, V] raw logits). The logits window is
    consumed only by the CUHLM uncertainty gate; XLA dead-code-eliminates
    it everywhere else.
    """
    B = tokens.shape[0]
    V = cfg.vocab_size
    bound = (
        jnp.int32(gamma)
        if gamma_bound is None
        else jnp.clip(gamma_bound, 0, gamma).astype(jnp.int32)
    )

    def norm(logits_row):
        q = norm_logits(
            logits_row, sampling.temperature, sampling.top_k, sampling.top_p
        )
        if rebuild_top_k is None:
            return q
        if isinstance(rebuild_top_k, int):
            return rebuild_topk_uniform_probs(q, rebuild_top_k)
        # traced k (RL-tuned transfer_top_k): rank-mask variant, no recompile
        return rebuild_topk_uniform_probs_dynamic(q, rebuild_top_k)

    # catch-up: rewind to n_tokens - catchup and recompute; produces q_0 and
    # re-establishes lag 0.
    cache = set_cache_length(cache, jnp.minimum(cache.length, n_tokens - catchup))
    catch = jax.lax.dynamic_slice(tokens, (0, n_tokens - catchup), (B, catchup))
    logits, cache, hidden = forward(params, cfg, catch, cache, return_hidden=True)
    q0 = norm(logits[:, -1, :])
    h0 = hidden[:, -1, :]

    q_window = jnp.zeros((B, gamma, V), jnp.float32)
    l_window = jnp.zeros((B, gamma, V), jnp.float32)
    stop_carry0 = (
        stop_carry_init
        if stop_carry_init is not None
        else jnp.ones((B,), jnp.float32)  # cumulative accept prob
    )

    def emit(tokens, q_window, l_window, q_cur, l_cur, h_cur, i, k_s, stop_carry):
        """Sample draft token i from q_cur, record the rows, run stop_fn."""
        tok = _sample_from_probs(k_s, q_cur, sampling)
        tokens = jax.lax.dynamic_update_slice(tokens, tok, (0, n_tokens + i))
        q_window = jax.lax.dynamic_update_slice(q_window, q_cur[:, None, :], (0, i, 0))
        l_window = jax.lax.dynamic_update_slice(
            l_window, l_cur[:, None, :].astype(jnp.float32), (0, i, 0)
        )
        if stop_fn is not None:
            stop, stop_carry = stop_fn(h_cur, q_cur, tok, i, stop_carry)
        else:
            stop = jnp.zeros((), bool)
        return tokens, q_window, l_window, tok, stop, stop_carry

    # draft token 0 (guarded: with bound == 0 nothing is written)
    key, k0 = jax.random.split(key)
    l0 = logits[:, -1, :]
    t_new, q_new, l_new, _, stop0, carry0 = emit(
        tokens, q_window, l_window, q0, l0, h0, jnp.int32(0), k0, stop_carry0
    )
    has_any = bound >= 1
    tokens = jnp.where(has_any, t_new, tokens)
    q_window = jnp.where(has_any, q_new, q_window)
    l_window = jnp.where(has_any, l_new, l_window)
    stop0 = jnp.logical_or(~has_any, stop0 & has_any)
    stop_carry = jnp.where(has_any, carry0, stop_carry0)

    def body(carry):
        tokens, cache, q_window, l_window, i, key, stopped, stop_carry, steps = carry
        key, k_s = jax.random.split(key)
        # forward the previously sampled token to produce q_i
        prev = jax.lax.dynamic_slice(tokens, (0, n_tokens + i - 1), (B, 1))
        logits, cache, hidden = forward(params, cfg, prev, cache, return_hidden=True)
        q_cur = norm(logits[:, -1, :])
        tokens, q_window, l_window, _, stop, stop_carry = emit(
            tokens, q_window, l_window, q_cur, logits[:, -1, :],
            hidden[:, -1, :], i, k_s, stop_carry
        )
        return (
            tokens, cache, q_window, l_window, i + 1, key, stop, stop_carry,
            steps + 1,
        )

    def cond(carry):
        _, _, _, _, i, _, stopped, _, _ = carry
        return jnp.logical_and(i < bound, ~stopped)

    init = (
        tokens,
        cache,
        q_window,
        l_window,
        jnp.where(has_any, jnp.int32(1), jnp.int32(0)),
        key,
        stop0,
        stop_carry,
        jnp.int32(0),
    )
    tokens, cache, q_window, l_window, actual_gamma, key, _, stop_carry, steps = (
        jax.lax.while_loop(cond, body, init)
    )
    return tokens, cache, q_window, actual_gamma, key, stop_carry, l_window


def sd_iteration(
    draft_params,
    target_params,
    s: SDState,
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    gamma: int,
    draft_sampling: SamplingConfig,
    target_sampling: SamplingConfig,
    rebuild_top_k: int | None,
    eos_ids: tuple[int, ...],
    limit: jax.Array | None = None,
    stop_fn=None,
) -> SDState:
    """One draft-gamma/verify/accept/rollback iteration (the shared core of
    the reference's `sd` loop, src/engine.py:610-805). ``limit`` caps total
    tokens: gamma is clamped to ``limit - 1 - prefix`` (the reference's
    remaining-budget clamp; at 0 the iteration degenerates to a single
    target step)."""
    B = s.tokens.shape[0]
    verify_vocab = min(draft_cfg.vocab_size, target_cfg.vocab_size)
    prefix_len = s.n_tokens

    key, k_r, k_t = jax.random.split(s.key, 3)
    gamma_bound = None if limit is None else limit - 1 - prefix_len

    tokens, draft_cache, q_window, actual_gamma, key, stop_carry, _ = (
        draft_tokens_loop(
            draft_params,
            draft_cfg,
            s.tokens,
            prefix_len,
            s.draft_cache,
            key,
            gamma,
            draft_sampling,
            rebuild_top_k,
            stop_fn,
            gamma_bound,
        )
    )

    # verify forward: T = gamma + 1 tokens starting at target_cache.length
    # (= prefix_len - 1). Positions beyond actual_gamma carry padding; their
    # cache rows are discarded by the rollback below.
    ver_in = jax.lax.dynamic_slice(tokens, (0, prefix_len - 1), (B, gamma + 1))
    t_logits, target_cache = forward(target_params, target_cfg, ver_in, s.target_cache)
    p_window = norm_logits(
        t_logits,
        target_sampling.temperature,
        target_sampling.top_k,
        target_sampling.top_p,
    )  # [B, gamma+1, V_t]

    draft_toks = jax.lax.dynamic_slice(tokens, (0, prefix_len), (B, gamma))
    r = jax.random.uniform(k_r, (B, gamma))
    acc = compute_acceptance(
        q_window[:, :, :verify_vocab],
        p_window[:, :, :verify_vocab],
        draft_toks,
        r,
        prefix_len,
        actual_gamma,
    )
    all_accepted = acc.accepted_count >= actual_gamma

    # decision row: on full accept the target row at actual_gamma (the bonus
    # position); on reject the residual at the first rejected offset.
    off = acc.accepted_count  # [B]
    tgt_row = jnp.take_along_axis(p_window, off[:, None, None], axis=1)[:, 0, :]
    drf_off = jnp.minimum(off, jnp.maximum(actual_gamma - 1, 0))
    drf_row = jnp.take_along_axis(q_window, drf_off[:, None, None], axis=1)[:, 0, :]
    residual = max_fn(
        tgt_row[:, :verify_vocab] - drf_row[:, :verify_vocab]
    )
    if verify_vocab < target_cfg.vocab_size:
        pad = jnp.zeros((B, target_cfg.vocab_size - verify_vocab), jnp.float32)
        residual = jnp.concatenate([residual, pad], axis=-1)
    final_dist = jnp.where(all_accepted[:, None], tgt_row, residual)
    if target_sampling.greedy:
        # at temp 0 both branches are one-hot; sampling = argmax
        next_tok = jnp.argmax(final_dist, axis=-1)[:, None].astype(jnp.int32)
    else:
        next_tok = sample(k_t, final_dist)

    # commit: n_tokens = n + 2 (accepted drafts stay in the buffer; the
    # sampled token is written at n + 1)
    n = acc.n[0]
    tokens = jax.lax.dynamic_update_slice(tokens, next_tok, (0, n + 1))
    new_n_tokens = n + 2

    # rollback identity: both caches to n + 1 (see module docstring)
    draft_cache = set_cache_length(draft_cache, (n + 1).astype(jnp.int32))
    target_cache = set_cache_length(target_cache, (n + 1).astype(jnp.int32))

    emitted = new_n_tokens - prefix_len
    done = s.done | _stops_hit(tokens, prefix_len, emitted, eos_ids, gamma + 1)

    from duodecoding_tpu.utils.debug import emit_sd_align_inline

    emit_sd_align_inline(
        "sd", "post_commit",
        prefix_len=new_n_tokens, gamma=actual_gamma,
        accepted=acc.accepted_count[0], target_len=n + 1, draft_len=n + 1,
        max_len=tokens.shape[1],
    )

    last_q = jnp.take_along_axis(
        q_window, jnp.maximum(actual_gamma - 1, 0)[None, None, None], axis=1
    )[:, 0, :]
    rec = s.records
    records = SDRecords(
        actual_gamma=rec.actual_gamma.at[s.it].set(actual_gamma),
        accepted=rec.accepted.at[s.it].set(acc.accepted_count[0]),
        emitted=rec.emitted.at[s.it].set(emitted),
        draft_entropy=rec.draft_entropy.at[s.it].set(entropy(last_q)[0]),
        target_entropy=rec.target_entropy.at[s.it].set(entropy(tgt_row)[0]),
        accept_rate=rec.accept_rate.at[s.it].set(
            acc.accepted_count[0] / jnp.maximum(actual_gamma, 1)
        ),
    )

    return SDState(
        tokens=tokens,
        n_tokens=new_n_tokens,
        draft_cache=draft_cache,
        target_cache=target_cache,
        key=key,
        done=done,
        it=s.it + 1,
        draft_steps=s.draft_steps + actual_gamma,
        target_steps=s.target_steps + 1,
        records=records,
    )


def init_sd_records(max_iters: int) -> SDRecords:
    zi = jnp.zeros((max_iters,), jnp.int32)
    zf = jnp.zeros((max_iters,), jnp.float32)
    return SDRecords(
        actual_gamma=zi,
        accepted=zi,
        emitted=zi,
        draft_entropy=zf,
        target_entropy=zf,
        accept_rate=zf,
    )


def _sd_generate_impl(
    draft_params,
    target_params,
    tokens: jax.Array,
    n_tokens: jax.Array,
    draft_cache: KVCache,
    target_cache: KVCache,
    key: jax.Array,
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    gamma: int,
    draft_sampling: SamplingConfig,
    target_sampling: SamplingConfig,
    rebuild_top_k: int | None = None,
    max_new_tokens: int = 128,
    eos_ids: tuple[int, ...] = (),
    prefill_plan: tuple[int, ...] | None = None,
):
    """Unjitted SD generation body; also returns the final caches so the
    suite runner (``sd_generate_suite``) can thread them through a scan
    over prompts."""
    if prefill_plan is not None:
        draft_cache = prefill_by_plan(
            draft_params, draft_cfg, draft_cache, tokens, prefill_plan,
            n_tokens,
        )
        target_cache = prefill_by_plan(
            target_params, target_cfg, target_cache, tokens, prefill_plan,
            n_tokens,
        )
    limit = n_tokens + max_new_tokens
    max_iters = max_new_tokens  # worst case: 1 token per iteration

    def cond(s: SDState):
        return jnp.logical_and(s.n_tokens < limit, ~jnp.all(s.done))

    def body(s: SDState):
        return sd_iteration(
            draft_params,
            target_params,
            s,
            draft_cfg=draft_cfg,
            target_cfg=target_cfg,
            gamma=gamma,
            draft_sampling=draft_sampling,
            target_sampling=target_sampling,
            rebuild_top_k=rebuild_top_k,
            eos_ids=eos_ids,
            limit=limit,
        )

    init = SDState(
        tokens=tokens,
        n_tokens=jnp.asarray(n_tokens, jnp.int32),
        draft_cache=draft_cache,
        target_cache=target_cache,
        key=key,
        done=jnp.zeros((tokens.shape[0],), bool),
        it=jnp.int32(0),
        draft_steps=jnp.int32(0),
        target_steps=jnp.int32(0),
        records=init_sd_records(max_iters),
    )
    out = jax.lax.while_loop(cond, body, init)
    return (
        out.tokens,
        out.n_tokens,
        out.records,
        out.it,
        out.draft_steps,
        out.target_steps,
        out.draft_cache,
        out.target_cache,
    )


_SD_STATIC = (
    "draft_cfg",
    "target_cfg",
    "gamma",
    "draft_sampling",
    "target_sampling",
    "rebuild_top_k",
    "max_new_tokens",
    "eos_ids",
    "prefill_plan",
)


@functools.partial(
    jax.jit, static_argnames=_SD_STATIC, donate_argnums=(2, 4, 5)
)
def sd_generate(
    draft_params,
    target_params,
    tokens: jax.Array,
    n_tokens: jax.Array,
    draft_cache: KVCache,
    target_cache: KVCache,
    key: jax.Array,
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    gamma: int,
    draft_sampling: SamplingConfig,
    target_sampling: SamplingConfig,
    rebuild_top_k: int | None = None,
    max_new_tokens: int = 128,
    eos_ids: tuple[int, ...] = (),
    prefill_plan: tuple[int, ...] | None = None,
):
    """Full speculative-decoding generation on device.

    Returns (tokens, n_tokens, records, n_iters, draft_steps, target_steps).
    With ``prefill_plan`` both tiers' prompt prefills run INSIDE this
    program (caches come in empty) — one dispatch per generation instead
    of three (each is a ~27 ms RPC round trip on the remote backend) —
    and the program specialises on the bucketed plan, not the exact
    prompt length (prefill_plan_for).
    """
    return _sd_generate_impl(
        draft_params, target_params, tokens, n_tokens, draft_cache,
        target_cache, key, draft_cfg=draft_cfg, target_cfg=target_cfg,
        gamma=gamma, draft_sampling=draft_sampling,
        target_sampling=target_sampling, rebuild_top_k=rebuild_top_k,
        max_new_tokens=max_new_tokens, eos_ids=eos_ids,
        prefill_plan=prefill_plan,
    )[:6]


@functools.partial(
    jax.jit, static_argnames=_SD_STATIC, donate_argnums=(2, 4, 5)
)
def sd_generate_suite(
    draft_params,
    target_params,
    prompts: jax.Array,  # [P, 1, S] — equal-length prompts, right-padded
    n_tokens: jax.Array,  # scalar: shared prompt length
    draft_cache: KVCache,
    target_cache: KVCache,
    key: jax.Array,
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    gamma: int,
    draft_sampling: SamplingConfig,
    target_sampling: SamplingConfig,
    rebuild_top_k: int | None = None,
    max_new_tokens: int = 128,
    eos_ids: tuple[int, ...] = (),
    prefill_plan: tuple[int, ...] | None = None,
):
    """P independent chain-SD generations in ONE device program
    (``lax.scan`` over prompts; both tiers' caches are length-reset and
    reused between prompts — stale KV is invisible, the engine's rollback
    invariant). Amortizes the ~90 ms per-dispatch remote launch floor
    across an evaluation suite, same as ``ar_generate_suite`` /
    ``tree_generate_suite``.

    RNG: per-prompt keys split from ``key`` inside the scan — a different
    stream than sequential runs drawing engine.next_key() per prompt, so
    suite-vs-sequential parity is greedy-only (see Engine.run_suite).

    Returns (tokens [P, 1, S], n_tokens [P], records stacked [P, ...],
    n_iters [P], draft_steps [P], target_steps [P])."""

    def step(carry, prompt):
        d_cache, t_cache, key = carry
        key, sub = jax.random.split(key)
        d_cache = set_cache_length(d_cache, 0)
        t_cache = set_cache_length(t_cache, 0)
        toks, n, records, it, ds, ts, d_cache, t_cache = _sd_generate_impl(
            draft_params, target_params, prompt, n_tokens, d_cache,
            t_cache, sub, draft_cfg=draft_cfg, target_cfg=target_cfg,
            gamma=gamma, draft_sampling=draft_sampling,
            target_sampling=target_sampling, rebuild_top_k=rebuild_top_k,
            max_new_tokens=max_new_tokens, eos_ids=eos_ids,
            prefill_plan=prefill_plan,
        )
        return (d_cache, t_cache, key), (toks, n, records, it, ds, ts)

    _, ys = jax.lax.scan(step, (draft_cache, target_cache, key), prompts)
    return ys
