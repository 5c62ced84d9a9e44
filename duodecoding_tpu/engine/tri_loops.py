"""Three-tier (little / draft / target) staged speculative decoding loop.

Device-side implementation of the reference's ``tridecoding``
(reference: src/baselines.py:1350-1739) and the staged core reused by every
``cee_*`` variant. Per iteration, with prefix length p:

Stage 1 (end -> edge): the little model drafts gamma2 tokens (top-k rebuilt
proposals); the draft model verifies them in ONE forward over the gamma2+1
window; a continuation token t1 is sampled (bonus row on full accept,
residual on reject) — prefix grows to n1+2.

Stage 2 (edge -> cloud): the draft model drafts gamma1 MORE tokens; the
target verifies the whole carried window of total_gamma = (n1+2-p) + gamma1
tokens against draft q-rows assembled from BOTH stages (raw rows from the
stage-1 verify forward for carried positions, rebuilt rows for fresh
drafts — reference src/baselines.py:1560-1607). Stage-2 can therefore
re-reject tokens the draft tier accepted.

Rollback is `valid_len` arithmetic with the reference's clamps: the little
cache may lag by up to gamma1+gamma2+2 after a deep stage-2 reject
(the reference's `n2 <= little.current_length` guard is exactly the clamp
``min(n2+1, little_len)``); the next iteration's catch-up forward absorbs
any lag.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.loops import (
    _sample_from_probs,
    _stops_hit,
    draft_tokens_loop,
    entropy,
    init_sd_records,  # noqa: F401  (kept import surface symmetrical)
)
from duodecoding_tpu.engine.sampling_config import SamplingConfig
from duodecoding_tpu.models.config import ModelConfig
from duodecoding_tpu.models.transformer import KVCache, forward, set_cache_length
from duodecoding_tpu.ops.sampling import max_fn, norm_logits
from duodecoding_tpu.ops.verify import compute_acceptance


class TriRecords(NamedTuple):
    little_gamma: jax.Array  # [I] stage-1 drafts produced (gamma2_actual)
    little_accepted: jax.Array  # [I]
    draft_gamma: jax.Array  # [I] stage-2 fresh drafts (gamma1_actual)
    total_gamma: jax.Array  # [I] stage-2 verified window length
    draft_accepted: jax.Array  # [I]
    emitted: jax.Array  # [I] tokens appended this iteration
    s1_all_accept: jax.Array  # [I] int
    s2_all_accept: jax.Array  # [I] int
    little_entropy: jax.Array  # [I]
    draft_entropy: jax.Array  # [I]
    little_accept_rate: jax.Array  # [I]
    draft_accept_rate: jax.Array  # [I]
    little_acc_prob: jax.Array  # [I] — ARP head last P(accept), stage 1
    draft_acc_prob: jax.Array  # [I] — ARP head last P(accept), stage 2


def init_tri_records(max_iters: int) -> TriRecords:
    # distinct buffers per field — aliased arrays break donation
    zi = lambda: jnp.zeros((max_iters,), jnp.int32)
    zf = lambda: jnp.zeros((max_iters,), jnp.float32)
    return TriRecords(
        zi(), zi(), zi(), zi(), zi(), zi(), zi(), zi(), zf(), zf(), zf(), zf(),
        zf(), zf(),
    )


class TriState(NamedTuple):
    tokens: jax.Array
    n_tokens: jax.Array
    little_cache: KVCache
    draft_cache: KVCache
    target_cache: KVCache
    key: jax.Array
    done: jax.Array
    it: jax.Array
    little_steps: jax.Array
    draft_steps: jax.Array
    target_steps: jax.Array
    records: TriRecords


def _decision_row(p_window, q_window, accepted, bound, verify_vocab, full_vocab):
    """Pick the sampling distribution after verification: bonus target row on
    full accept, residual max(p-q, 0) at the first reject otherwise."""
    B = p_window.shape[0]
    all_accepted = accepted >= bound
    off = accepted  # [B]
    tgt_row = jnp.take_along_axis(p_window, off[:, None, None], axis=1)[:, 0, :]
    drf_off = jnp.minimum(off, jnp.maximum(bound - 1, 0))
    drf_row = jnp.take_along_axis(q_window, drf_off[:, None, None], axis=1)[:, 0, :]
    residual = max_fn(tgt_row[:, :verify_vocab] - drf_row[:, :verify_vocab])
    if verify_vocab < full_vocab:
        pad = jnp.zeros((B, full_vocab - verify_vocab), jnp.float32)
        residual = jnp.concatenate([residual, pad], axis=-1)
    final = jnp.where(all_accepted[:, None], tgt_row, residual)
    return final, all_accepted


def tri_iteration(
    little_params,
    draft_params,
    target_params,
    s: TriState,
    *,
    little_cfg: ModelConfig,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    gamma1: int,
    gamma2: int,
    little_sampling: SamplingConfig,
    draft_sampling: SamplingConfig,
    target_sampling: SamplingConfig,
    rebuild_top_k: int | None,
    verify_vocab: int,
    eos_ids: tuple[int, ...],
    little_stop_fn=None,
    draft_stop_fn=None,
    gamma1_bound: jax.Array | None = None,
    gamma2_bound: jax.Array | None = None,
    little_stop_carry_init: jax.Array | None = None,
    draft_stop_carry_init: jax.Array | None = None,
) -> TriState:
    B = s.tokens.shape[0]
    p = s.n_tokens
    gmax = gamma2 + 1 + gamma1  # stage-2 max verified window
    little_catchup = gamma1 + gamma2 + 2

    key, k_r1, k_t1, k_r2, k_t2 = jax.random.split(s.key, 5)

    # ---- stage 1: little drafts gamma2 ----
    tokens, little_cache, q1, g2_act, key, little_carry, _ = draft_tokens_loop(
        little_params,
        little_cfg,
        s.tokens,
        p,
        s.little_cache,
        key,
        gamma2,
        little_sampling,
        rebuild_top_k,
        little_stop_fn,
        gamma2_bound,
        catchup=little_catchup,
        stop_carry_init=little_stop_carry_init,
    )

    # stage-1 verify: draft forward over the gamma2+1 window (positions
    # p-1 .. p+gamma2-1); rows beyond g2_act are masked out downstream.
    ver1 = jax.lax.dynamic_slice(tokens, (0, p - 1), (B, gamma2 + 1))
    d_logits, draft_cache = forward(draft_params, draft_cfg, ver1, s.draft_cache)
    p1 = norm_logits(
        d_logits,
        draft_sampling.temperature,
        draft_sampling.top_k,
        draft_sampling.top_p,
    )  # [B, gamma2+1, Vd] — raw draft rows, reused as stage-2 carried q-rows

    s1_toks = jax.lax.dynamic_slice(tokens, (0, p), (B, gamma2))
    r1 = jax.random.uniform(k_r1, (B, gamma2))
    a1 = compute_acceptance(
        q1[:, :, :verify_vocab], p1[:, :, :verify_vocab], s1_toks, r1, p, g2_act
    )
    n1 = a1.n[0]
    acc1 = a1.accepted_count[0]

    t1_dist, s1_all = _decision_row(
        p1, q1, a1.accepted_count, g2_act, verify_vocab, draft_cfg.vocab_size
    )
    if draft_sampling.greedy:
        t1 = jnp.argmax(t1_dist, axis=-1)[:, None].astype(jnp.int32)
    else:
        t1 = _sample_from_probs(k_t1, t1_dist, draft_sampling)
    tokens = jax.lax.dynamic_update_slice(tokens, t1, (0, n1 + 1))
    n_after1 = n1 + 2

    # rollbacks with the reference clamps
    little_cache = set_cache_length(little_cache, jnp.minimum(n1 + 1, little_cache.length).astype(jnp.int32))
    draft_cache = set_cache_length(draft_cache, jnp.minimum(n1 + 1 + s1_all[0].astype(jnp.int32), p + g2_act).astype(
            jnp.int32
        ))

    # ---- stage 2: draft drafts gamma1 more ----
    tokens, draft_cache, q2_fresh, g1_act, key, draft_carry, _ = draft_tokens_loop(
        draft_params,
        draft_cfg,
        tokens,
        n_after1,
        draft_cache,
        key,
        gamma1,
        draft_sampling,
        rebuild_top_k,
        draft_stop_fn,
        gamma1_bound,
        catchup=2,
        stop_carry_init=draft_stop_carry_init,
    )
    carried = n_after1 - p  # acc1 + 1
    total_gamma = carried + g1_act

    # assemble the stage-2 q window: carried rows (<= acc1) come from the
    # stage-1 verify forward p1, fresh rows from q2_fresh
    ks = jnp.arange(gmax)
    row1 = jnp.take(p1, jnp.minimum(ks, gamma2), axis=1)  # [B, gmax, Vd]
    idx2 = jnp.clip(ks - carried, 0, max(gamma1 - 1, 0))
    row2 = jnp.take_along_axis(q2_fresh, idx2[None, :, None], axis=1)
    q2 = jnp.where((ks < carried)[None, :, None], row1, row2)

    # stage-2 verify: target forward over gmax+1 window from position p-1
    ver2 = jax.lax.dynamic_slice(tokens, (0, p - 1), (B, gmax + 1))
    t_logits, target_cache = forward(target_params, target_cfg, ver2, s.target_cache)
    p2 = norm_logits(
        t_logits,
        target_sampling.temperature,
        target_sampling.top_k,
        target_sampling.top_p,
    )

    s2_toks = jax.lax.dynamic_slice(tokens, (0, p), (B, gmax))
    r2 = jax.random.uniform(k_r2, (B, gmax))
    a2 = compute_acceptance(
        q2[:, :, :verify_vocab], p2[:, :, :verify_vocab], s2_toks, r2, p, total_gamma
    )
    n2 = a2.n[0]
    acc2 = a2.accepted_count[0]

    t2_dist, s2_all = _decision_row(
        p2, q2, a2.accepted_count, total_gamma, verify_vocab, target_cfg.vocab_size
    )
    if target_sampling.greedy:
        t2 = jnp.argmax(t2_dist, axis=-1)[:, None].astype(jnp.int32)
    else:
        t2 = _sample_from_probs(k_t2, t2_dist, target_sampling)
    tokens = jax.lax.dynamic_update_slice(tokens, t2, (0, n2 + 1))
    new_n = n2 + 2

    draft_valid = n_after1 + g1_act - 1
    draft_cache = set_cache_length(draft_cache, jnp.minimum(n2 + 1, draft_valid).astype(jnp.int32))
    little_cache = set_cache_length(little_cache, jnp.minimum(n2 + 1, little_cache.length).astype(jnp.int32))
    target_cache = set_cache_length(target_cache, (n2 + 1).astype(jnp.int32))

    emitted = new_n - p
    done = s.done | _stops_hit(tokens, p, emitted, eos_ids, gmax + 1)

    last_q1 = jnp.take_along_axis(
        q1, jnp.maximum(g2_act - 1, 0)[None, None, None], axis=1
    )[:, 0, :]
    last_q2 = jnp.take_along_axis(
        q2, jnp.maximum(total_gamma - 1, 0)[None, None, None], axis=1
    )[:, 0, :]
    rec = s.records
    i = s.it
    records = TriRecords(
        little_gamma=rec.little_gamma.at[i].set(g2_act),
        little_accepted=rec.little_accepted.at[i].set(acc1),
        draft_gamma=rec.draft_gamma.at[i].set(g1_act),
        total_gamma=rec.total_gamma.at[i].set(total_gamma),
        draft_accepted=rec.draft_accepted.at[i].set(acc2),
        emitted=rec.emitted.at[i].set(emitted),
        s1_all_accept=rec.s1_all_accept.at[i].set(s1_all[0].astype(jnp.int32)),
        s2_all_accept=rec.s2_all_accept.at[i].set(s2_all[0].astype(jnp.int32)),
        little_entropy=rec.little_entropy.at[i].set(entropy(last_q1)[0]),
        draft_entropy=rec.draft_entropy.at[i].set(entropy(last_q2)[0]),
        little_accept_rate=rec.little_accept_rate.at[i].set(
            acc1 / jnp.maximum(g2_act, 1)
        ),
        draft_accept_rate=rec.draft_accept_rate.at[i].set(
            acc2 / jnp.maximum(total_gamma, 1)
        ),
        little_acc_prob=rec.little_acc_prob.at[i].set(
            little_carry[0, 1] if little_carry.ndim == 2 else 0.5
        ),
        draft_acc_prob=rec.draft_acc_prob.at[i].set(
            draft_carry[0, 1] if draft_carry.ndim == 2 else 0.5
        ),
    )

    return TriState(
        tokens=tokens,
        n_tokens=new_n,
        little_cache=little_cache,
        draft_cache=draft_cache,
        target_cache=target_cache,
        key=key,
        done=done,
        it=i + 1,
        little_steps=s.little_steps + g2_act,
        draft_steps=s.draft_steps + g1_act + 1,  # +1: the stage-1 verify call
        target_steps=s.target_steps + 1,
        records=records,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "little_cfg",
        "draft_cfg",
        "target_cfg",
        "gamma1",
        "gamma2",
        "little_sampling",
        "draft_sampling",
        "target_sampling",
        "rebuild_top_k",
        "verify_vocab",
        "max_new_tokens",
        "eos_ids",
    ),
    donate_argnames=("tokens", "little_cache", "draft_cache", "target_cache"),
)
def tridecoding_generate(
    little_params,
    draft_params,
    target_params,
    tokens: jax.Array,
    n_tokens: jax.Array,
    little_cache: KVCache,
    draft_cache: KVCache,
    target_cache: KVCache,
    key: jax.Array,
    *,
    little_cfg: ModelConfig,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    gamma1: int,
    gamma2: int,
    little_sampling: SamplingConfig,
    draft_sampling: SamplingConfig,
    target_sampling: SamplingConfig,
    rebuild_top_k: int | None,
    verify_vocab: int,
    max_new_tokens: int,
    eos_ids: tuple[int, ...] = (),
):
    """Full tridecoding generation on device. Like the reference, gammas are
    not budget-clamped (the loop may overshoot by up to one window; the host
    truncates). Returns (tokens, n_tokens, records, iters, little_steps,
    draft_steps, target_steps)."""
    limit = n_tokens + max_new_tokens
    max_iters = max_new_tokens

    def cond(s: TriState):
        return jnp.logical_and(s.n_tokens < limit, ~jnp.all(s.done))

    def body(s: TriState):
        return tri_iteration(
            little_params,
            draft_params,
            target_params,
            s,
            little_cfg=little_cfg,
            draft_cfg=draft_cfg,
            target_cfg=target_cfg,
            gamma1=gamma1,
            gamma2=gamma2,
            little_sampling=little_sampling,
            draft_sampling=draft_sampling,
            target_sampling=target_sampling,
            rebuild_top_k=rebuild_top_k,
            verify_vocab=verify_vocab,
            eos_ids=eos_ids,
        )

    init = TriState(
        tokens=tokens,
        n_tokens=jnp.asarray(n_tokens, jnp.int32),
        little_cache=little_cache,
        draft_cache=draft_cache,
        target_cache=target_cache,
        key=key,
        done=jnp.zeros((tokens.shape[0],), bool),
        it=jnp.int32(0),
        little_steps=jnp.int32(0),
        draft_steps=jnp.int32(0),
        target_steps=jnp.int32(0),
        records=init_tri_records(max_iters),
    )
    out = jax.lax.while_loop(cond, body, init)
    return (
        out.tokens,
        out.n_tokens,
        out.records,
        out.it,
        out.little_steps,
        out.draft_steps,
        out.target_steps,
    )
