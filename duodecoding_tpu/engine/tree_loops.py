"""Device-resident k-chain tree speculative decoding.

TPU-native equivalent of the reference's multi-sequence drafting — the
original DuoDecoding headline: the GGUF CPU draft proposes k candidate
continuations per step (``generate_k_seq``, reference:
src/model_cpu.py:138-252, k in {1,2,4,6,8} from logprob gaps) and the
target verifies them together. Here the draft forks into the top-k first
tokens and continues each chain greedily — drafting runs with the chains
on the BATCH axis (weight-bound decode matmuls cost the same at B=k as at
B=1), and the target verifies the whole fork-at-root tree in ONE forward
using tree attention (window_mask / position_offsets, the same machinery
as ops/tree.py / the reference's medusa tree buffers,
src/model/medusa/utils.py:233).

Why it beats chain SD at a fixed draft quality: with per-position draft
accept rate beta, the first position gates the whole window; hedging it
with the draft's top-k (accept iff the target's argmax is ANY of the k
first tokens) lifts the gate from P(argmax = top1) to
P(argmax in top-k) at zero extra draft forwards and one identical-cost
verify forward (decode-time forwards are weight-bound; T = 1 + k*gamma
tokens stream the same weights as T = 1).

Greedy (temperature 0) only — the accepted prefix is the target's own
greedy path, so output is token-identical to ``large`` (the losslessness
contract). The draft-lane caches are re-synchronised every iteration by a
static-length catch-up forward (see loops.py's catch-up invariant; here
the rewind depth is gamma+2 because committed tokens may have been
computed in any lane).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.loops import (
    SDRecords,
    _stops_hit,
    entropy,
    init_sd_records,
)
from duodecoding_tpu.models.config import ModelConfig
from duodecoding_tpu.models.transformer import forward, set_cache_length
from duodecoding_tpu.ops.sampling import norm_logits


class KTreeState(NamedTuple):
    tokens: jax.Array  # [1, S]
    n_tokens: jax.Array
    draft_cache: object  # [L, k, S, ...] — chains on the batch axis
    target_cache: object  # [L, 1, S, ...]
    done: jax.Array
    it: jax.Array
    draft_steps: jax.Array
    target_steps: jax.Array
    records: SDRecords


def tree_layout(k: int, gamma: int):
    """Static verify-window layout for a fork-at-root k-chain tree.

    index 0 = the last committed token (depth offset 0); index
    1 + j*gamma + i = chain j's node i (depth offset i+1). Returns
    (position_offsets [T], window_mask [T, T]) as numpy constants.
    """
    T = 1 + k * gamma
    offsets = np.zeros((T,), np.int32)
    mask = np.zeros((T, T), bool)
    mask[0, 0] = True
    for j in range(k):
        for i in range(gamma):
            r = 1 + j * gamma + i
            offsets[r] = i + 1
            mask[r, 0] = True
            for a in range(i + 1):
                mask[r, 1 + j * gamma + a] = True
    return offsets, mask


def _relocate_rows(cache, src, dst, count: int):
    """Copy ``count`` sequence rows from ``src`` to ``dst`` in every cache
    buffer (axis 2 = sequence). Used to move the winning chain's verified
    KV rows from their tree positions to their linear positions — the
    reference medusa's KV gather (src/model/medusa/utils.py:274ff
    evaluate_posterior + cache reorder), as pure index bookkeeping."""

    def move(a):
        sl = jax.lax.dynamic_slice_in_dim(a, src, count, axis=2)
        return jax.lax.dynamic_update_slice_in_dim(a, sl, dst, axis=2)

    fields = {
        f: move(getattr(cache, f)) for f in cache._fields if f != "length"
    }
    return cache._replace(**fields)


def ktree_iteration(
    draft_params,
    target_params,
    s: KTreeState,
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    k: int,
    gamma: int,
    eos_ids: tuple[int, ...],
    limit: jax.Array,
) -> KTreeState:
    verify_vocab = min(draft_cfg.vocab_size, target_cfg.vocab_size)
    n = s.n_tokens
    CU = gamma + 2

    # --- draft: catch-up (re-sync all lanes), fork, greedy chains --------
    if "nocatchup" in os.environ.get("DUODEC_TREE_PROBE", ""):
        d_cache = s.draft_cache
        logits = jnp.zeros((k, 1, draft_cfg.vocab_size), jnp.float32)
        chain0 = (jnp.arange(k, dtype=jnp.int32) + 5) * (n % 7 + 1)
    else:
        d_cache = set_cache_length(
            s.draft_cache, jnp.minimum(s.draft_cache.length, n - CU)
        )
        catch = jax.lax.dynamic_slice(s.tokens, (0, n - CU), (1, CU))
        catch_k = jnp.broadcast_to(catch, (k, CU))
        logits, d_cache = forward(draft_params, draft_cfg, catch_k, d_cache)
        q0 = logits[0, -1, :verify_vocab]  # lanes identical after catch-up
        _, fork = jax.lax.top_k(q0, k)  # [k] distinct first tokens
        chain0 = fork.astype(jnp.int32)

    def draft_step(carry, _):
        last, d_cache = carry
        lg, d_cache = forward(draft_params, draft_cfg, last[:, None], d_cache)
        nxt = jnp.argmax(lg[:, -1, :verify_vocab], axis=-1).astype(jnp.int32)
        return (nxt, d_cache), nxt

    if "nodraft" in os.environ.get("DUODEC_TREE_PROBE", ""):
        chains = jnp.broadcast_to(chain0[:, None], (k, gamma))
    else:
        (_, d_cache), rest = jax.lax.scan(
            draft_step, (chain0, d_cache), None, length=gamma - 1
        )
        chains = jnp.concatenate([chain0[:, None], rest.T], axis=1)  # [k, gamma]

    # --- verify: one tree-attention forward ------------------------------
    probe = os.environ.get("DUODEC_TREE_PROBE", "")  # perf-bisect diagnostics
    offsets_np, mask_np = tree_layout(k, gamma)
    last_tok = jax.lax.dynamic_slice(s.tokens, (0, n - 1), (1, 1))[0]
    ver_in = jnp.concatenate([last_tok, chains.reshape(-1)])[None, :]
    if "noverify" in probe:
        t_cache = s.target_cache
        t_logits = (
            jnp.zeros((1, 1 + k * gamma, target_cfg.vocab_size), jnp.float32)
            .at[:, :, 7].set(ver_in.astype(jnp.float32))
        )
    else:
        t_logits, t_cache = forward(
            target_params,
            target_cfg,
            ver_in,
            s.target_cache,
            position_offsets=(
                None if "plaincausal" in probe else jnp.asarray(offsets_np)
            ),
            window_mask=None if "plaincausal" in probe else jnp.asarray(mask_np),
        )
    preds = jnp.argmax(t_logits[0, :, :verify_vocab], axis=-1).astype(
        jnp.int32
    )  # [T]

    # --- greedy walk (vectorized over chains) ----------------------------
    pred0 = preds[0]
    node_preds = preds[1:].reshape(k, gamma)  # target argmax AT each node
    match0 = chains[:, 0] == pred0  # [k]
    cons = chains[:, 1:] == node_preds[:, :-1]  # [k, gamma-1]
    run_len = jnp.sum(jnp.cumprod(cons.astype(jnp.int32), axis=1), axis=1)
    m_j = jnp.where(match0, 1 + run_len, 0)  # [k]
    w = jnp.argmax(m_j).astype(jnp.int32)
    m = m_j[w]
    # budget clamp: never commit past `limit` (the reference clamps gamma
    # to the remaining budget; with a static tree we clamp the commit)
    m = jnp.minimum(m, limit - 1 - n)
    win_chain = chains[w]  # [gamma]
    win_preds = node_preds[w]  # [gamma]
    bonus = jnp.where(m == 0, pred0, win_preds[jnp.maximum(m - 1, 0)])

    # --- commit -----------------------------------------------------------
    tokens = jax.lax.dynamic_update_slice(s.tokens, win_chain[None, :], (0, n))
    tokens = jax.lax.dynamic_update_slice(tokens, bonus[None, None], (0, n + m))
    n_new = n + m + 1

    # --- caches -----------------------------------------------------------
    # target: verified rows for the winning chain sit at tree positions
    # start+1+w*gamma...; move them to linear positions start+1... then
    # restore the lag-1 invariant (length = n_new - 1).
    start = n - 1
    if "norelocate" not in probe:
        t_cache = _relocate_rows(
            t_cache, start + 1 + w * gamma, start + 1, gamma
        )
    t_cache = set_cache_length(t_cache, n_new - 1)
    # draft lanes are rewound and re-synced next iteration; only the length
    # bookkeeping matters (it must stay >= n_new - CU, which holds: lanes
    # advanced to n + gamma - 1 >= n_new - 2).
    d_cache = set_cache_length(d_cache, jnp.minimum(d_cache.length, n_new - 1))

    emitted = m + 1
    done = s.done | _stops_hit(tokens, n, emitted, eos_ids, gamma + 1)

    q0_full = norm_logits(logits[:1, -1, :], 0.0, 0, 0.0)
    rec = s.records
    records = SDRecords(
        actual_gamma=rec.actual_gamma.at[s.it].set(gamma),
        accepted=rec.accepted.at[s.it].set(m),
        emitted=rec.emitted.at[s.it].set(emitted),
        draft_entropy=rec.draft_entropy.at[s.it].set(entropy(q0_full)[0]),
        target_entropy=rec.target_entropy.at[s.it].set(
            entropy(norm_logits(t_logits[:1, 0, :], 0.0, 0, 0.0))[0]
        ),
        accept_rate=rec.accept_rate.at[s.it].set(m / gamma),
    )
    return KTreeState(
        tokens=tokens,
        n_tokens=n_new,
        draft_cache=d_cache,
        target_cache=t_cache,
        done=done,
        it=s.it + 1,
        draft_steps=s.draft_steps + gamma,
        target_steps=s.target_steps + 1,
        records=records,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "draft_cfg",
        "target_cfg",
        "k",
        "gamma",
        "max_new_tokens",
        "eos_ids",
    ),
    donate_argnums=(2, 4, 5),
)
def ktree_generate(
    draft_params,
    target_params,
    tokens: jax.Array,
    n_tokens: jax.Array,
    draft_cache,
    target_cache,
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    k: int,
    gamma: int,
    max_new_tokens: int = 128,
    eos_ids: tuple[int, ...] = (),
):
    """Full k-chain tree-SD generation on device (greedy).

    Returns (tokens, n_tokens, records, n_iters, draft_steps, target_steps).
    """
    limit = n_tokens + max_new_tokens

    def cond(s: KTreeState):
        return jnp.logical_and(s.n_tokens < limit, ~jnp.all(s.done))

    def body(s: KTreeState):
        return ktree_iteration(
            draft_params,
            target_params,
            s,
            draft_cfg=draft_cfg,
            target_cfg=target_cfg,
            k=k,
            gamma=gamma,
            eos_ids=eos_ids,
            limit=limit,
        )

    init = KTreeState(
        tokens=tokens,
        n_tokens=jnp.asarray(n_tokens, jnp.int32),
        draft_cache=draft_cache,
        target_cache=target_cache,
        done=jnp.zeros((tokens.shape[0],), bool),
        it=jnp.int32(0),
        draft_steps=jnp.int32(0),
        target_steps=jnp.int32(0),
        records=init_sd_records(max_new_tokens),
    )
    out = jax.lax.while_loop(cond, body, init)
    return (
        out.tokens,
        out.n_tokens,
        out.records,
        out.it,
        out.draft_steps,
        out.target_steps,
    )
