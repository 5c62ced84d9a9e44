"""cee_cuhlm device loop: tri-tier staged decoding with per-stage CUHLM
uncertainty gating.

Reference: src/baselines.py:3078-3541. Unlike tridecoding's p/q rejection
sampling, each stage accepts drafted tokens in order while their proposer-
logits uncertainty (M=20 temperature perturbations) stays BELOW the stage
threshold; the first high-uncertainty token rejects the rest
(src/baselines.py:3223-3266). The continuation token is sampled from the
VERIFIER's distribution at the decision position (bonus row on full
accept). Per-stage thresholds come from the stage config hook
(_select_cuhlm_stage_config, src/baselines.py:459-489).

Everything — gating, the compressed-vocab k* for reject pricing — runs on
device; the host replays the per-token accept/reject message schedule from
the records.
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
from duodecoding_tpu.engine.loops import _stops_hit, draft_tokens_loop, entropy
from duodecoding_tpu.engine.sampling_config import SamplingConfig
from duodecoding_tpu.models.config import ModelConfig
from duodecoding_tpu.models.transformer import KVCache, forward, set_cache_length
from duodecoding_tpu.ops.sampling import norm_logits, sample


class CeeCuhlmRecords(NamedTuple):
    little_gamma: jax.Array  # [I]
    little_accepted: jax.Array
    s1_all_accept: jax.Array
    k1_star: jax.Array
    draft_gamma: jax.Array
    total_gamma: jax.Array
    draft_accepted: jax.Array
    s2_all_accept: jax.Array
    k2_star: jax.Array
    emitted: jax.Array
    little_entropy: jax.Array
    draft_entropy: jax.Array


class CeeCuhlmState(NamedTuple):
    tokens: jax.Array
    n_tokens: jax.Array
    little_cache: KVCache
    draft_cache: KVCache
    target_cache: KVCache
    key: jax.Array
    done: jax.Array
    it: jax.Array
    records: CeeCuhlmRecords


def _stage_gate(keys, logit_rows, tokens_row, valid_n, threshold, verify_vocab):
    """Accept drafted tokens while uncertainty < threshold; returns
    (accepted_count, all_accepted, per-position uncertainties)."""
    G = logit_rows.shape[0]
    unc = jax.vmap(
        lambda k, l, t: calculate_uncertainty(k, l[:verify_vocab], t)
    )(keys, logit_rows, tokens_row)
    gate = jnp.logical_and(unc >= threshold, jnp.arange(G) < valid_n)
    any_gate = jnp.any(gate)
    first = jnp.argmax(gate)
    accepted = jnp.where(any_gate, first, valid_n).astype(jnp.int32)
    return accepted, ~any_gate, unc


def _pick_row(window, idx):
    """window [B, R, V], idx scalar -> [B, V]."""
    return jnp.take_along_axis(window, idx[None, None, None], axis=1)[:, 0, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "little_cfg",
        "draft_cfg",
        "target_cfg",
        "gamma1",
        "gamma2",
        "sampling",
        "little_top_k",
        "draft_top_k",
        "little_threshold",
        "draft_threshold",
        "verify_vocab",
        "max_new_tokens",
        "eos_ids",
    ),
    donate_argnames=("tokens", "little_cache", "draft_cache", "target_cache"),
)
def cee_cuhlm_generate(
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
    sampling: SamplingConfig,
    little_top_k: int | None,
    draft_top_k: int | None,
    little_threshold: float,
    draft_threshold: float,
    verify_vocab: int,
    max_new_tokens: int,
    eos_ids: tuple[int, ...] = (),
):
    B = tokens.shape[0]
    limit = n_tokens + max_new_tokens
    gmax = gamma2 + 1 + gamma1
    little_catchup = gamma1 + gamma2 + 2

    def t_sample(k, row):
        if sampling.greedy:
            return jnp.argmax(row, axis=-1)[:, None].astype(jnp.int32)
        return sample(k, row)

    def body(s: CeeCuhlmState):
        p = s.n_tokens
        key, k_u1, k_u2, k_t1, k_t2 = jax.random.split(s.key, 5)

        # ---- stage 1: little drafts, uncertainty-gated by draft tier ----
        tokens, l_cache, q1, g2a, key, _, llog = draft_tokens_loop(
            little_params,
            little_cfg,
            s.tokens,
            p,
            s.little_cache,
            key,
            gamma2,
            sampling,
            little_top_k,
            catchup=little_catchup,
        )
        ver1 = jax.lax.dynamic_slice(tokens, (0, p - 1), (B, gamma2 + 1))
        d_logits, d_cache = forward(draft_params, draft_cfg, ver1, s.draft_cache)
        p1 = norm_logits(d_logits, sampling.temperature, 0, 0.0)

        s1_toks = jax.lax.dynamic_slice(tokens, (0, p), (B, gamma2))[0]
        acc1, all1, unc1 = _stage_gate(
            jax.random.split(k_u1, gamma2),
            llog[0],
            s1_toks,
            g2a,
            little_threshold,
            verify_vocab,
        )
        n1 = p + acc1 - 1
        dec1 = jnp.where(all1, g2a, jnp.minimum(acc1, gamma2 - 1)).astype(jnp.int32)
        # decision row: bonus (index g2a) on full accept, row at n1 otherwise
        row_idx1 = jnp.where(all1, g2a, acc1).astype(jnp.int32)
        t1 = t_sample(k_t1, _pick_row(p1, row_idx1))
        tokens = jax.lax.dynamic_update_slice(tokens, t1, (0, n1 + 1))
        n_after1 = n1 + 2
        k1 = jnp.maximum(
            compressed_vocab_size_jax(
                unc1[jnp.minimum(acc1, gamma2 - 1)],
                _pick_row(q1, jnp.minimum(acc1, gamma2 - 1))[0, :verify_vocab],
            ),
            1,
        )

        l_cache = set_cache_length(l_cache, jnp.minimum(n1 + 1, l_cache.length).astype(jnp.int32))
        d_cache = set_cache_length(d_cache, jnp.where(all1, p + g2a, n1 + 1).astype(jnp.int32))

        # ---- stage 2: draft drafts, uncertainty-gated by target tier ----
        tokens, d_cache, q2f, g1a, key, _, dlog2 = draft_tokens_loop(
            draft_params,
            draft_cfg,
            tokens,
            n_after1,
            d_cache,
            key,
            gamma1,
            sampling,
            draft_top_k,
            catchup=2,
        )
        carried = n_after1 - p
        total_gamma = carried + g1a

        ks = jnp.arange(gmax)
        lrow1 = jnp.take(d_logits, jnp.minimum(ks, gamma2), axis=1)
        idx2 = jnp.clip(ks - carried, 0, max(gamma1 - 1, 0))
        lrow2 = jnp.take_along_axis(dlog2, idx2[None, :, None], axis=1)
        lw = jnp.where((ks < carried)[None, :, None], lrow1, lrow2)
        qrow1 = jnp.take(p1, jnp.minimum(ks, gamma2), axis=1)
        qrow2 = jnp.take_along_axis(q2f, idx2[None, :, None], axis=1)
        q2 = jnp.where((ks < carried)[None, :, None], qrow1, qrow2)

        ver2 = jax.lax.dynamic_slice(tokens, (0, p - 1), (B, gmax + 1))
        t_logits, t_cache = forward(target_params, target_cfg, ver2, s.target_cache)
        p2 = norm_logits(t_logits, sampling.temperature, 0, 0.0)

        s2_toks = jax.lax.dynamic_slice(tokens, (0, p), (B, gmax))[0]
        acc2, all2, unc2 = _stage_gate(
            jax.random.split(k_u2, gmax),
            lw[0],
            s2_toks,
            total_gamma,
            draft_threshold,
            verify_vocab,
        )
        n2 = p + acc2 - 1
        row_idx2 = jnp.where(all2, total_gamma, acc2).astype(jnp.int32)
        t2 = t_sample(k_t2, _pick_row(p2, row_idx2))
        tokens = jax.lax.dynamic_update_slice(tokens, t2, (0, n2 + 1))
        new_n = n2 + 2
        k2 = jnp.maximum(
            compressed_vocab_size_jax(
                unc2[jnp.minimum(acc2, gmax - 1)],
                _pick_row(q2, jnp.minimum(acc2, gmax - 1))[0, :verify_vocab],
            ),
            1,
        )

        d_cache = set_cache_length(d_cache, jnp.minimum(n2 + 1, n_after1 + g1a - 1).astype(jnp.int32))
        l_cache = set_cache_length(l_cache, jnp.minimum(n2 + 1, l_cache.length).astype(jnp.int32))
        t_cache = set_cache_length(t_cache, (n2 + 1).astype(jnp.int32))

        emitted = new_n - p
        done = s.done | _stops_hit(tokens, p, emitted, eos_ids, gmax + 1)

        rec = s.records
        i = s.it
        records = CeeCuhlmRecords(
            little_gamma=rec.little_gamma.at[i].set(g2a),
            little_accepted=rec.little_accepted.at[i].set(acc1),
            s1_all_accept=rec.s1_all_accept.at[i].set(all1.astype(jnp.int32)),
            k1_star=rec.k1_star.at[i].set(k1),
            draft_gamma=rec.draft_gamma.at[i].set(g1a),
            total_gamma=rec.total_gamma.at[i].set(total_gamma),
            draft_accepted=rec.draft_accepted.at[i].set(acc2),
            s2_all_accept=rec.s2_all_accept.at[i].set(all2.astype(jnp.int32)),
            k2_star=rec.k2_star.at[i].set(k2),
            emitted=rec.emitted.at[i].set(emitted),
            little_entropy=rec.little_entropy.at[i].set(
                entropy(_pick_row(q1, jnp.maximum(g2a - 1, 0)))[0]
            ),
            draft_entropy=rec.draft_entropy.at[i].set(
                entropy(_pick_row(q2, jnp.maximum(total_gamma - 1, 0)))[0]
            ),
        )
        return CeeCuhlmState(
            tokens=tokens,
            n_tokens=new_n,
            little_cache=l_cache,
            draft_cache=d_cache,
            target_cache=t_cache,
            key=key,
            done=done,
            it=i + 1,
            records=records,
        )

    def cond(s: CeeCuhlmState):
        return jnp.logical_and(s.n_tokens < limit, ~jnp.all(s.done))

    zi = lambda: jnp.zeros((max_new_tokens,), jnp.int32)
    zf = lambda: jnp.zeros((max_new_tokens,), jnp.float32)
    init = CeeCuhlmState(
        tokens=tokens,
        n_tokens=jnp.asarray(n_tokens, jnp.int32),
        little_cache=little_cache,
        draft_cache=draft_cache,
        target_cache=target_cache,
        key=key,
        done=jnp.zeros((B,), bool),
        it=jnp.int32(0),
        records=CeeCuhlmRecords(
            zi(), zi(), zi(), zi(), zi(), zi(), zi(), zi(), zi(), zi(), zf(), zf()
        ),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out.tokens, out.n_tokens, out.records, out.it
