"""CUHLM device loop: uncertainty-gated opportunistic speculative decoding.

Device-side implementation of the reference's ``uncertainty_decoding``
(reference: src/baselines.py:1063-1348): gamma=1 per iteration; the draft
token's uncertainty (disagreement of M=20 temperature-perturbed samples) is
computed on device; below the threshold the draft token is accepted WITHOUT
rejection sampling (opportunistic transmission), above it standard gamma=1
rejection sampling runs. The compressed-vocabulary size k* (paper eq. 24)
is also computed on device so the whole generation is one while_loop; the
host replays transfer pricing from the per-iteration records.

State notes (mirroring the reference's cache handling):
- the target forwards EVERY iteration (even opportunistically-accepted
  ones); the `target_forward_times` metric skips iterations following an
  opportunistic accept — the reference's CUHLM-paper accounting quirk
  (src/baselines.py:1173-1177) — which the host reconstructs from the
  records;
- both the opportunistic and the verified-accept paths append (draft token,
  target bonus token) and leave the caches lagging (2, 1); the reject path
  appends only the residual-sampled token (lag 1, 1).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from duodecoding_tpu.comm.cuhlm import (
    calculate_uncertainty,
    compressed_vocab_size_jax,
)
from duodecoding_tpu.engine.loops import _sample_from_probs, _stops_hit
from duodecoding_tpu.engine.sampling_config import SamplingConfig
from duodecoding_tpu.models.config import ModelConfig
from duodecoding_tpu.models.transformer import KVCache, forward, set_cache_length
from duodecoding_tpu.ops.sampling import max_fn, norm_logits


class CUHLMRecords(NamedTuple):
    opportunistic: jax.Array  # [I] int — accepted without verification
    accepted: jax.Array  # [I] int — verified accept (0 on opp path)
    uncertainty: jax.Array  # [I] f32
    k_star: jax.Array  # [I] int32 (0 when not transferring probs)
    emitted: jax.Array  # [I] int


class CUHLMState(NamedTuple):
    tokens: jax.Array
    n_tokens: jax.Array
    draft_cache: KVCache
    target_cache: KVCache
    key: jax.Array
    done: jax.Array
    it: jax.Array
    records: CUHLMRecords


@functools.partial(
    jax.jit,
    static_argnames=(
        "draft_cfg",
        "target_cfg",
        "draft_sampling",
        "target_sampling",
        "verify_vocab",
        "uncertainty_threshold",
        "max_new_tokens",
        "eos_ids",
    ),
    donate_argnames=("tokens", "draft_cache", "target_cache"),
)
def cuhlm_generate(
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
    draft_sampling: SamplingConfig,
    target_sampling: SamplingConfig,
    verify_vocab: int,
    uncertainty_threshold: float = 0.8,
    max_new_tokens: int = 128,
    eos_ids: tuple[int, ...] = (),
):
    B = tokens.shape[0]
    limit = n_tokens + max_new_tokens
    max_iters = max_new_tokens

    def cond(s: CUHLMState):
        return jnp.logical_and(s.n_tokens < limit, ~jnp.all(s.done))

    def body(s: CUHLMState):
        p = s.n_tokens
        key, k_s, k_u, k_r, k_t = jax.random.split(s.key, 5)

        # draft one token (catch-up T=2: lag is 1 or 2)
        d_cache = set_cache_length(s.draft_cache, jnp.minimum(s.draft_cache.length, p - 2))
        catch = jax.lax.dynamic_slice(s.tokens, (0, p - 2), (B, 2))
        d_logits, d_cache, _ = forward(
            draft_params, draft_cfg, catch, d_cache, return_hidden=True
        )
        logit_row = d_logits[:, -1, :]
        q = norm_logits(
            logit_row,
            draft_sampling.temperature,
            draft_sampling.top_k,
            draft_sampling.top_p,
        )
        tok = _sample_from_probs(k_s, q, draft_sampling)
        tokens = jax.lax.dynamic_update_slice(s.tokens, tok, (0, p))

        # target forwards every iteration (prev token + draft token)
        ver = jax.lax.dynamic_slice(tokens, (0, p - 1), (B, 2))
        t_logits, t_cache = forward(target_params, target_cfg, ver, s.target_cache)
        p_rows = norm_logits(
            t_logits,
            target_sampling.temperature,
            target_sampling.top_k,
            target_sampling.top_p,
        )  # [B, 2, Vt]: row 0 verifies the draft token, row 1 is the bonus

        # uncertainty + k* on device (reference computes them on host,
        # src/baselines.py:1165-1176)
        unc = calculate_uncertainty(
            k_u, logit_row[0, :verify_vocab], tok[0, 0]
        )
        opp = unc < uncertainty_threshold
        k_star = jnp.where(
            opp, 0, jnp.maximum(compressed_vocab_size_jax(unc, q[0, :verify_vocab]), 1)
        )

        # gamma=1 rejection sampling (only consulted on the verify path)
        q_tok = jnp.take_along_axis(q[:, :verify_vocab], tok, axis=1)[:, 0]
        p_tok = jnp.take_along_axis(p_rows[:, 0, :verify_vocab], tok, axis=1)[:, 0]
        r = jax.random.uniform(k_r, (B,))
        accept_v = r <= (p_tok / q_tok)

        acceptedish = jnp.logical_or(opp, accept_v[0])
        n = jnp.where(acceptedish, p, p - 1)

        bonus = p_rows[:, 1, :]
        residual = max_fn(
            p_rows[:, 0, :verify_vocab] - q[:, :verify_vocab]
        )
        if verify_vocab < target_cfg.vocab_size:
            pad = jnp.zeros((B, target_cfg.vocab_size - verify_vocab), jnp.float32)
            residual = jnp.concatenate([residual, pad], axis=-1)
        t_dist = jnp.where(acceptedish, bonus, residual)
        if target_sampling.greedy:
            t_next = jnp.argmax(t_dist, axis=-1)[:, None].astype(jnp.int32)
        else:
            t_next = _sample_from_probs(k_t, t_dist, target_sampling)
        tokens = jax.lax.dynamic_update_slice(tokens, t_next, (0, n + 1))
        new_n = n + 2

        t_cache = set_cache_length(t_cache, jnp.where(acceptedish, p + 1, p).astype(jnp.int32))

        emitted = new_n - p
        done = s.done | _stops_hit(tokens, p, emitted, eos_ids, 2)

        rec = s.records
        i = s.it
        records = CUHLMRecords(
            opportunistic=rec.opportunistic.at[i].set(opp.astype(jnp.int32)),
            accepted=rec.accepted.at[i].set(
                jnp.logical_and(~opp, accept_v[0]).astype(jnp.int32)
            ),
            uncertainty=rec.uncertainty.at[i].set(unc),
            k_star=rec.k_star.at[i].set(k_star),
            emitted=rec.emitted.at[i].set(emitted),
        )
        return CUHLMState(
            tokens=tokens,
            n_tokens=new_n,
            draft_cache=d_cache,
            target_cache=t_cache,
            key=key,
            done=done,
            it=i + 1,
            records=records,
        )

    zi = jnp.zeros((max_iters,), jnp.int32)
    init = CUHLMState(
        tokens=tokens,
        n_tokens=jnp.asarray(n_tokens, jnp.int32),
        draft_cache=draft_cache,
        target_cache=target_cache,
        key=key,
        done=jnp.zeros((B,), bool),
        it=jnp.int32(0),
        records=CUHLMRecords(zi, zi, jnp.zeros((max_iters,), jnp.float32), zi, zi),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out.tokens, out.n_tokens, out.records, out.it
