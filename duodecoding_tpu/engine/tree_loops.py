"""Device-resident tree speculative decoding (branch-spec trees).

TPU-native generalisation of the reference's multi-sequence drafting — the
original DuoDecoding headline: the GGUF CPU draft proposes k candidate
continuations per step (``generate_k_seq``, reference:
src/model_cpu.py:138-252, k in {1,2,4,6,8} from logprob gaps) and the
target verifies them together.

A tree is described by a static branch spec ``(k1, ..., k_gamma)``: the
draft's top-``k1`` first tokens each fork into their top-``k2``
continuations, and so on (``k_i = 1`` continues greedily). The DuoDecoding
k-sequence tree is the special case ``(k, 1, ..., 1)``; deeper hedging
(e.g. ``(4, 2, 2, 1)``) lifts the expected accepted length further, the
same shape as SpecInfer/EAGLE-2 token trees.

Drafting runs with one lane per LEAF on the draft's BATCH axis — decode
matmuls are weight-bound, so B = prod(spec) lanes cost the same HBM
traffic as one — and lane ``l``'s token at level ``i`` is
``top_{k_i}(lane logits)[(l // stride_i) % k_i]``; lanes sharing a prefix
have identical caches/logits up to the fork, so the picks are consistent
by construction. The target verifies the whole deduplicated tree (one row
per distinct prefix) in ONE forward using tree attention (window_mask /
position_offsets, the same machinery as ops/tree.py / the reference's
medusa tree buffers, src/model/medusa/utils.py:233).

Why it beats chain SD at a fixed draft quality: with per-position draft
accept rate beta, every level gates the window behind it; hedging level i
with the draft's top-k lifts that gate from P(argmax = top1) to
P(argmax in top-k) at zero extra draft forwards and one identical-cost
verify forward (decode-time forwards are weight-bound; T tree tokens
stream the same weights as T = 1 while T stays modest).

Greedy (temperature 0) only — the accepted prefix is the target's own
greedy path, so output is token-identical to ``large`` (the losslessness
contract). The draft-lane caches are re-synchronised every iteration by a
static-length catch-up forward (see loops.py's catch-up invariant; the
rewind depth is gamma+2 because committed tokens may have been computed
in any lane).
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
from duodecoding_tpu.ops.sampling import norm_logits, top_k_via_argmax


class KTreeState(NamedTuple):
    tokens: jax.Array  # [1, S]
    n_tokens: jax.Array
    key: jax.Array  # PRNG state (sampled typical-acceptance verification)
    draft_cache: object  # [L, B, S, ...] — lanes on the batch axis
    target_cache: object  # [L, 1, S, ...]
    done: jax.Array
    it: jax.Array
    draft_steps: jax.Array
    target_steps: jax.Array
    records: SDRecords


class TreeLayout(NamedTuple):
    """Static (numpy) layout of a branch-spec tree's verify window."""

    offsets: np.ndarray  # [T] depth of each verify row (0 = committed token)
    mask: np.ndarray  # [T, T] ancestor visibility
    pick: np.ndarray  # [gamma, B] lane l's branch index at each level
    lane_nodes: np.ndarray  # [B, gamma] verify row of lane l's level-i node
    parent_rows: np.ndarray  # [B, gamma] verify row of that node's parent
    node_from_lane: np.ndarray  # [T-1] a lane containing row r+1
    node_level: np.ndarray  # [T-1] depth-1 of row r+1


def spec_layout(spec: tuple[int, ...]) -> TreeLayout:
    """Build the static layout for branch spec ``spec``.

    Rows are assigned lane-major, level-minor, so a lane's rows strictly
    increase with depth and the level-``i`` row is always >= i+1 — the
    commit relocation relies on this (moving row ``win[i]`` to row ``i+1``
    never clobbers a yet-unread source).
    """
    gamma = len(spec)
    B = int(np.prod(spec))
    strides = [int(np.prod(spec[i + 1 :])) for i in range(gamma)]
    pick = np.zeros((gamma, B), np.int32)
    for l in range(B):
        for i in range(gamma):
            pick[i, l] = (l // strides[i]) % spec[i]
    node_id: dict[tuple, int] = {}
    lane_nodes = np.zeros((B, gamma), np.int32)
    node_from_lane: list[int] = []
    node_level: list[int] = []
    offsets = [0]
    rows = 1
    for l in range(B):
        for i in range(gamma):
            prefix = tuple(pick[: i + 1, l])
            if prefix not in node_id:
                node_id[prefix] = rows
                node_from_lane.append(l)
                node_level.append(i)
                offsets.append(i + 1)
                rows += 1
            lane_nodes[l, i] = node_id[prefix]
    T = rows
    mask = np.zeros((T, T), bool)
    mask[0, 0] = True
    for l in range(B):
        for i in range(gamma):
            r = lane_nodes[l, i]
            mask[r, 0] = True
            mask[r, r] = True
            for a in range(i):
                mask[r, lane_nodes[l, a]] = True
    parent_rows = np.concatenate(
        [np.zeros((B, 1), np.int32), lane_nodes[:, :-1]], axis=1
    )
    return TreeLayout(
        offsets=np.asarray(offsets, np.int32),
        mask=mask,
        pick=pick,
        lane_nodes=lane_nodes,
        parent_rows=parent_rows,
        node_from_lane=np.asarray(node_from_lane, np.int32),
        node_level=np.asarray(node_level, np.int32),
    )


def _tree_branch(
    draft_params,
    target_params,
    s: KTreeState,
    logits,  # [lanes, CU, V] — shared catch-up logits (all lanes identical)
    d_cache,  # draft cache at length n (post catch-up)
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    spec: tuple[int, ...],
    eos_ids: tuple[int, ...],
    limit: jax.Array,
    sampling=None,  # SamplingConfig | None — None/greedy = argmax walk
    typical: tuple[float, float] = (0.09, 0.3),
) -> KTreeState:
    """Fork-draft + tree-verify + walk + commit for ONE branch spec,
    starting from the shared catch-up state. The draft cache may carry
    MORE lanes than prod(spec) (adaptive mode sizes it for the widest
    spec); extra lanes duplicate lane ``l % B`` — identical caches, picks
    consistent by construction, and only the first B lanes feed the
    verify window."""
    verify_vocab = min(draft_cfg.vocab_size, target_cfg.vocab_size)
    gamma = len(spec)
    B = int(np.prod(spec))
    kmax = max(spec)
    lay = spec_layout(spec)
    lanes = d_cache.k.shape[1]
    pick = lay.pick[:, np.arange(lanes) % B]  # [gamma, lanes]
    n = s.n_tokens

    q0 = logits[0, -1, :verify_vocab]  # lanes identical after catch-up
    _, top0 = top_k_via_argmax(q0, spec[0])
    chain0 = top0[pick[0]].astype(jnp.int32)  # [lanes]

    def draft_step(carry, pick_i):
        last, d_cache = carry
        lg, d_cache = forward(draft_params, draft_cfg, last[:, None], d_cache)
        _, topi = top_k_via_argmax(lg[:, -1, :verify_vocab], kmax)
        nxt = jnp.take_along_axis(topi, pick_i[:, None], axis=1)[:, 0].astype(
            jnp.int32
        )
        return (nxt, d_cache), nxt

    (_, d_cache), rest = jax.lax.scan(
        draft_step, (chain0, d_cache), jnp.asarray(pick[1:])
    )  # rest: [gamma-1, lanes]
    chains = jnp.concatenate([chain0[None, :], rest], axis=0).T[:B]  # [B, g]

    # --- verify: one tree-attention forward over the deduplicated tree ----
    last_tok = jax.lax.dynamic_slice(s.tokens, (0, n - 1), (1, 1))[0]
    ver_nodes = chains[lay.node_from_lane, lay.node_level]  # [T-1]
    ver_in = jnp.concatenate([last_tok, ver_nodes])[None, :]
    T = ver_in.shape[1]
    t_logits, t_cache = forward(
        target_params,
        target_cfg,
        ver_in,
        s.target_cache,
        position_offsets=jnp.asarray(lay.offsets),
        window_mask=jnp.asarray(lay.mask),
    )
    greedy = sampling is None or sampling.greedy
    key = s.key
    if greedy:
        preds = jnp.argmax(
            t_logits[0, :, :verify_vocab], axis=-1
        ).astype(jnp.int32)
        # --- greedy walk (vectorized over lanes) --------------------------
        preds_parent = jnp.take(preds, jnp.asarray(lay.parent_rows))
        cons = chains == preds_parent  # [B, gamma]
    else:
        # --- sampled walk: typical acceptance (reference medusa
        # evaluate_posterior, src/model/medusa/utils.py:274-320): accept a
        # candidate when its posterior prob at the PARENT node exceeds
        # min(threshold, alpha * exp(-H(posterior))). NOT an exact match
        # of the target's sampling distribution (candidates are draft
        # top-k, not draft samples — same semantics as the reference);
        # temperature->0 recovers the greedy walk exactly.
        from duodecoding_tpu.ops.sampling import sample

        eps, alpha = typical
        p_win = norm_logits(
            t_logits[0, :, :verify_vocab],
            sampling.temperature, sampling.top_k, sampling.top_p,
        )  # [T, Vv]
        h = entropy(p_win)  # [T]
        thr = jnp.minimum(eps, alpha * jnp.exp(-h))  # [T]
        prows = jnp.asarray(lay.parent_rows)  # [B, gamma]
        p_parent = jnp.take(p_win, prows, axis=0)  # [B, gamma, Vv]
        p_cand = jnp.take_along_axis(
            p_parent, chains[..., None], axis=-1
        )[..., 0]  # [B, gamma]
        cons = p_cand > jnp.take(thr, prows)
    m_l = jnp.sum(jnp.cumprod(cons.astype(jnp.int32), axis=1), axis=1)  # [B]
    w = jnp.argmax(m_l).astype(jnp.int32)
    m = jnp.minimum(m_l[w], limit - 1 - n)
    win_rows = jnp.take(jnp.asarray(lay.lane_nodes), w, axis=0)  # [gamma]
    win_chain = chains[w]
    if greedy:
        preds_at_w = jnp.take(preds, win_rows)
        bonus = jnp.where(m == 0, preds[0], preds_at_w[jnp.maximum(m - 1, 0)])
    else:
        key, k_b = jax.random.split(key)
        bonus_row = jnp.where(m == 0, 0, win_rows[jnp.maximum(m - 1, 0)])
        bonus = sample(k_b, jnp.take(p_win, bonus_row, axis=0)[None, :])[
            0, 0
        ].astype(jnp.int32)

    # --- commit ------------------------------------------------------------
    tokens = jax.lax.dynamic_update_slice(s.tokens, win_chain[None, :], (0, n))
    tokens = jax.lax.dynamic_update_slice(tokens, bonus[None, None], (0, n + m))
    n_new = n + m + 1

    # --- caches (see tree_iteration for the relocation rationale) ----------
    start = n - 1
    perm = jnp.arange(T, dtype=jnp.int32).at[1 : gamma + 1].set(win_rows)

    def move(a):
        win = jax.lax.dynamic_slice_in_dim(a, start, T, axis=2)
        return jax.lax.dynamic_update_slice_in_dim(
            a, jnp.take(win, perm, axis=2), start, axis=2
        )

    t_cache = t_cache._replace(
        **{f: move(getattr(t_cache, f)) for f in t_cache._fields if f != "length"}
    )
    t_cache = set_cache_length(t_cache, n_new - 1)
    d_cache = set_cache_length(d_cache, jnp.minimum(d_cache.length, n_new - 1))

    emitted = m + 1
    done = s.done | _stops_hit(tokens, n, emitted, eos_ids, gamma + 1)

    from duodecoding_tpu.utils.debug import emit_sd_align_inline

    emit_sd_align_inline(
        "sd_tree", "post_commit",
        prefix_len=n_new, gamma=gamma, accepted=m,
        target_len=n_new - 1, draft_len=d_cache.length,
        max_len=tokens.shape[1],
    )

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
        key=key,
        draft_cache=d_cache,
        target_cache=t_cache,
        done=done,
        it=s.it + 1,
        draft_steps=s.draft_steps + gamma,
        target_steps=s.target_steps + 1,
        records=records,
    )


def tree_iteration_adaptive(
    draft_params,
    target_params,
    s: KTreeState,
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    specs: tuple[tuple[int, ...], ...],
    gap_thresholds: tuple[float, ...],
    eos_ids: tuple[int, ...],
    limit: jax.Array,
    sampling=None,
    typical: tuple[float, float] = (0.09, 0.3),
) -> KTreeState:
    """Dynamic per-iteration tree-width selection (reference
    ``generate_k_seq`` parity: src/model_cpu.py:138-252 picks k in
    {1,2,4,6,8} from first-token logprob gaps).

    One shared catch-up forward re-syncs all lanes and yields the draft's
    first-token logits; the top1-top2 logit gap (= logprob gap — the
    normalizer cancels) selects a branch spec via ``gap_thresholds``
    (descending; branch i taken when gap < threshold passes i of them):
    a confident draft (large gap) takes the narrow/deep spec, an
    uncertain one (small gap) the wider fork. Each spec's full
    draft-fork/verify/commit compiles once into a ``lax.switch`` branch —
    the loop stays device-resident, only the taken branch executes."""
    gmax = max(len(sp) for sp in specs)
    CU = gmax + 2
    n = s.n_tokens
    lanes = s.draft_cache.k.shape[1]
    d_cache = set_cache_length(
        s.draft_cache, jnp.minimum(s.draft_cache.length, n - CU)
    )
    catch = jax.lax.dynamic_slice(s.tokens, (0, n - CU), (1, CU))
    catch_k = jnp.broadcast_to(catch, (lanes, CU))
    logits, d_cache = forward(draft_params, draft_cfg, catch_k, d_cache)

    verify_vocab = min(draft_cfg.vocab_size, target_cfg.vocab_size)
    v2, _ = top_k_via_argmax(logits[0, -1, :verify_vocab], 2)
    gap = v2[0] - v2[1]  # logit gap == logprob gap (logsumexp cancels)
    idx = sum(
        (gap < jnp.float32(t)).astype(jnp.int32) for t in gap_thresholds
    )

    def make_branch(sp):
        def branch(args):
            s, logits, d_cache = args
            return _tree_branch(
                draft_params,
                target_params,
                s,
                logits,
                d_cache,
                draft_cfg=draft_cfg,
                target_cfg=target_cfg,
                spec=sp,
                eos_ids=eos_ids,
                limit=limit,
                sampling=sampling,
                typical=typical,
            )

        return branch

    return jax.lax.switch(
        idx, [make_branch(sp) for sp in specs], (s, logits, d_cache)
    )


def tree_iteration(
    draft_params,
    target_params,
    s: KTreeState,
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    spec: tuple[int, ...],
    eos_ids: tuple[int, ...],
    limit: jax.Array,
    sampling=None,
    typical: tuple[float, float] = (0.09, 0.3),
) -> KTreeState:
    verify_vocab = min(draft_cfg.vocab_size, target_cfg.vocab_size)
    gamma = len(spec)
    B = int(np.prod(spec))
    kmax = max(spec)
    lay = spec_layout(spec)
    n = s.n_tokens
    CU = gamma + 2
    probe = os.environ.get("DUODEC_TREE_PROBE", "")  # perf-bisect diagnostics
    if not probe:
        # hot path: shared catch-up + _tree_branch (the same body the
        # adaptive-width mode switches over); the legacy inline body below
        # is kept only for the DUODEC_TREE_PROBE diagnostics
        d_cache = set_cache_length(
            s.draft_cache, jnp.minimum(s.draft_cache.length, n - CU)
        )
        catch = jax.lax.dynamic_slice(s.tokens, (0, n - CU), (1, CU))
        lanes = s.draft_cache.k.shape[1]
        logits, d_cache = forward(
            draft_params, draft_cfg, jnp.broadcast_to(catch, (lanes, CU)),
            d_cache,
        )
        return _tree_branch(
            draft_params,
            target_params,
            s,
            logits,
            d_cache,
            draft_cfg=draft_cfg,
            target_cfg=target_cfg,
            spec=spec,
            eos_ids=eos_ids,
            limit=limit,
            sampling=sampling,
            typical=typical,
        )

    # --- draft: catch-up (re-sync all lanes), branch, pick ----------------
    if "nodraft" in probe:
        d_cache = s.draft_cache
        logits = jnp.zeros((B, 1, draft_cfg.vocab_size), jnp.float32)
        chains = jnp.broadcast_to(
            ((jnp.arange(B, dtype=jnp.int32) + 5) * (n % 7 + 1))[:, None],
            (B, gamma),
        )
    else:
        d_cache = set_cache_length(
            s.draft_cache, jnp.minimum(s.draft_cache.length, n - CU)
        )
        catch = jax.lax.dynamic_slice(s.tokens, (0, n - CU), (1, CU))
        catch_k = jnp.broadcast_to(catch, (B, CU))
        logits, d_cache = forward(draft_params, draft_cfg, catch_k, d_cache)
        q0 = logits[0, -1, :verify_vocab]  # lanes identical after catch-up
        _, top0 = top_k_via_argmax(q0, spec[0])
        chain0 = top0[lay.pick[0]].astype(jnp.int32)  # [B]

        def draft_step(carry, pick_i):
            last, d_cache = carry
            lg, d_cache = forward(
                draft_params, draft_cfg, last[:, None], d_cache
            )
            _, topi = top_k_via_argmax(lg[:, -1, :verify_vocab], kmax)  # [B, kmax]
            nxt = jnp.take_along_axis(topi, pick_i[:, None], axis=1)[
                :, 0
            ].astype(jnp.int32)
            return (nxt, d_cache), nxt

        (_, d_cache), rest = jax.lax.scan(
            draft_step, (chain0, d_cache), jnp.asarray(lay.pick[1:])
        )  # rest: [gamma-1, B]
        chains = jnp.concatenate([chain0[None, :], rest], axis=0).T  # [B, g]

    # --- verify: one tree-attention forward over the deduplicated tree ----
    last_tok = jax.lax.dynamic_slice(s.tokens, (0, n - 1), (1, 1))[0]
    ver_nodes = chains[lay.node_from_lane, lay.node_level]  # [T-1]
    ver_in = jnp.concatenate([last_tok, ver_nodes])[None, :]
    T = ver_in.shape[1]
    if "noverify" in probe:
        t_cache = s.target_cache
        t_logits = (
            jnp.zeros((1, T, target_cfg.vocab_size), jnp.float32)
            .at[:, :, 7]
            .set(ver_in.astype(jnp.float32))
        )
    else:
        t_logits, t_cache = forward(
            target_params,
            target_cfg,
            ver_in,
            s.target_cache,
            position_offsets=jnp.asarray(lay.offsets),
            window_mask=jnp.asarray(lay.mask),
        )
    preds = jnp.argmax(t_logits[0, :, :verify_vocab], axis=-1).astype(
        jnp.int32
    )  # [T]

    # --- greedy walk (vectorized over lanes) ------------------------------
    # lane l's level-i token is accepted while it equals the target's
    # argmax at its PARENT node (row 0 = the committed token for level 0)
    preds_parent = jnp.take(preds, jnp.asarray(lay.parent_rows))  # [B, gamma]
    cons = chains == preds_parent
    m_l = jnp.sum(jnp.cumprod(cons.astype(jnp.int32), axis=1), axis=1)  # [B]
    w = jnp.argmax(m_l).astype(jnp.int32)
    m = m_l[w]
    # budget clamp: never commit past `limit` (the reference clamps gamma
    # to the remaining budget; with a static tree we clamp the commit)
    m = jnp.minimum(m, limit - 1 - n)
    win_rows = jnp.take(jnp.asarray(lay.lane_nodes), w, axis=0)  # [gamma]
    win_chain = chains[w]  # [gamma]
    preds_at_w = jnp.take(preds, win_rows)  # [gamma]
    bonus = jnp.where(m == 0, preds[0], preds_at_w[jnp.maximum(m - 1, 0)])

    # --- commit -----------------------------------------------------------
    tokens = jax.lax.dynamic_update_slice(s.tokens, win_chain[None, :], (0, n))
    tokens = jax.lax.dynamic_update_slice(tokens, bonus[None, None], (0, n + m))
    n_new = n + m + 1

    # --- caches -----------------------------------------------------------
    # target: the winning lane's verified rows sit at scattered tree
    # positions start+win_rows[i]; move them to linear positions start+1+i
    # then restore the lag-1 invariant (length = n_new - 1). One gather
    # over the T-row verify window per cache buffer (the earlier
    # per-row dynamic_slice/update chain was 4*gamma sequential ops);
    # reading the PRE-move window is equivalent to the sequential
    # relocation because win_rows[i] >= i+1 (see spec_layout), so a
    # source row is never a destination row that was already written.
    start = n - 1
    if "norelocate" not in probe:
        perm = (
            jnp.arange(T, dtype=jnp.int32)
            .at[1 : gamma + 1]
            .set(win_rows)
        )

        def move(a):
            win = jax.lax.dynamic_slice_in_dim(a, start, T, axis=2)
            return jax.lax.dynamic_update_slice_in_dim(
                a, jnp.take(win, perm, axis=2), start, axis=2
            )

        t_cache = t_cache._replace(
            **{
                f: move(getattr(t_cache, f))
                for f in t_cache._fields
                if f != "length"
            }
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
        key=s.key,
        draft_cache=d_cache,
        target_cache=t_cache,
        done=done,
        it=s.it + 1,
        draft_steps=s.draft_steps + gamma,
        target_steps=s.target_steps + 1,
        records=records,
    )


def _tree_generate_impl(
    draft_params,
    target_params,
    tokens: jax.Array,
    n_tokens: jax.Array,
    draft_cache,
    target_cache,
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    spec: tuple[int, ...],
    key: jax.Array | None = None,
    sampling=None,
    typical: tuple[float, float] = (0.09, 0.3),
    max_new_tokens: int = 128,
    eos_ids: tuple[int, ...] = (),
    prefill_plan: tuple[int, ...] | None = None,
):
    """Traceable core of ``tree_generate`` (also scanned by
    ``tree_generate_suite``); additionally returns both caches so a suite
    scan can carry them across prompts."""
    if prefill_plan is not None:
        from duodecoding_tpu.engine.loops import prefill_by_plan

        lanes = draft_cache.k.shape[1]
        span = sum(prefill_plan)
        draft_cache = prefill_by_plan(
            draft_params,
            draft_cfg,
            draft_cache,
            jnp.broadcast_to(tokens[:, :span], (lanes, span)),
            prefill_plan,
            n_tokens,
        )
        target_cache = prefill_by_plan(
            target_params, target_cfg, target_cache, tokens, prefill_plan,
            n_tokens,
        )
    limit = n_tokens + max_new_tokens

    def cond(s: KTreeState):
        return jnp.logical_and(s.n_tokens < limit, ~jnp.all(s.done))

    def body(s: KTreeState):
        return tree_iteration(
            draft_params,
            target_params,
            s,
            draft_cfg=draft_cfg,
            target_cfg=target_cfg,
            spec=spec,
            eos_ids=eos_ids,
            limit=limit,
            sampling=sampling,
            typical=typical,
        )

    gamma = len(spec)
    init = KTreeState(
        tokens=tokens,
        n_tokens=jnp.asarray(n_tokens, jnp.int32),
        key=key if key is not None else jax.random.PRNGKey(0),
        draft_cache=draft_cache,
        target_cache=target_cache,
        done=jnp.zeros((tokens.shape[0],), bool),
        it=jnp.int32(0),
        draft_steps=jnp.int32(0),
        target_steps=jnp.int32(0),
        records=init_sd_records(max_new_tokens),
    )
    del gamma
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "draft_cfg",
        "target_cfg",
        "spec",
        "sampling",
        "typical",
        "max_new_tokens",
        "eos_ids",
        "prefill_plan",
    ),
    donate_argnums=(2, 4, 5),
)
def tree_generate(
    draft_params,
    target_params,
    tokens: jax.Array,
    n_tokens: jax.Array,
    draft_cache,
    target_cache,
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    spec: tuple[int, ...],
    key: jax.Array | None = None,
    sampling=None,
    typical: tuple[float, float] = (0.09, 0.3),
    max_new_tokens: int = 128,
    eos_ids: tuple[int, ...] = (),
    prefill_plan: tuple[int, ...] | None = None,
):
    """Full branch-spec tree-SD generation on device (greedy argmax walk,
    or sampled typical-acceptance when ``sampling`` has temperature > 0).

    Returns (tokens, n_tokens, records, n_iters, draft_steps, target_steps).
    With ``prefill_plan`` (loops.py::prefill_plan_for) both tiers' prompt
    prefills run INSIDE this program (caches come in empty; the draft
    prefill broadcasts the prompt over the lanes) — one dispatch per
    generation instead of three, specialised on the bucketed plan rather
    than the exact prompt length.
    """
    return _tree_generate_impl(
        draft_params,
        target_params,
        tokens,
        n_tokens,
        draft_cache,
        target_cache,
        draft_cfg=draft_cfg,
        target_cfg=target_cfg,
        spec=spec,
        key=key,
        sampling=sampling,
        typical=typical,
        max_new_tokens=max_new_tokens,
        eos_ids=eos_ids,
        prefill_plan=prefill_plan,
    )[:6]


@functools.partial(
    jax.jit,
    static_argnames=(
        "draft_cfg",
        "target_cfg",
        "spec",
        "sampling",
        "typical",
        "max_new_tokens",
        "eos_ids",
        "prefill_plan",
    ),
    donate_argnums=(2, 4, 5),
)
def tree_generate_suite(
    draft_params,
    target_params,
    prompts: jax.Array,  # [P, 1, S] — equal-length prompts, right-padded
    n_tokens: jax.Array,  # scalar: shared prompt length
    draft_cache,
    target_cache,
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    spec: tuple[int, ...],
    key: jax.Array | None = None,
    sampling=None,
    typical: tuple[float, float] = (0.09, 0.3),
    max_new_tokens: int = 128,
    eos_ids: tuple[int, ...] = (),
    prefill_plan: tuple[int, ...] | None = None,
):
    """P independent tree-SD generations in ONE device program
    (``lax.scan`` over prompts; both tiers' caches are length-reset and
    reused between prompts — stale KV is invisible, the engine's rollback
    invariant). Amortizes the ~90 ms per-dispatch remote launch floor
    (tools/fixed_cost_probe.py) across the whole evaluation suite.

    RNG: per-prompt keys come from splitting ``key`` inside the scan —
    a DIFFERENT stream than sequential runs drawing engine.next_key()
    per prompt, so suite-vs-sequential output parity holds for greedy
    decoding only (sampling=None); at temperature>0 both are valid
    samples but not bitwise-comparable.

    Returns (tokens [P, 1, S], n_tokens [P], records stacked [P, ...],
    n_iters [P], draft_steps [P], target_steps [P])."""

    def step(carry, prompt):
        d_cache, t_cache, key = carry
        key, sub = jax.random.split(key)
        d_cache = set_cache_length(d_cache, 0)
        t_cache = set_cache_length(t_cache, 0)
        toks, n, records, it, ds, ts, d_cache, t_cache = _tree_generate_impl(
            draft_params,
            target_params,
            prompt,
            n_tokens,
            d_cache,
            t_cache,
            draft_cfg=draft_cfg,
            target_cfg=target_cfg,
            spec=spec,
            key=sub,
            sampling=sampling,
            typical=typical,
            max_new_tokens=max_new_tokens,
            eos_ids=eos_ids,
            prefill_plan=prefill_plan,
        )
        return (d_cache, t_cache, key), (toks, n, records, it, ds, ts)

    init_key = key if key is not None else jax.random.PRNGKey(0)
    _, outs = jax.lax.scan(step, (draft_cache, target_cache, init_key), prompts)
    return outs


@functools.partial(
    jax.jit,
    static_argnames=(
        "draft_cfg",
        "target_cfg",
        "specs",
        "gap_thresholds",
        "sampling",
        "typical",
        "max_new_tokens",
        "eos_ids",
        "prefill_plan",
    ),
    donate_argnums=(2, 4, 5),
)
def tree_generate_adaptive(
    draft_params,
    target_params,
    tokens: jax.Array,
    n_tokens: jax.Array,
    draft_cache,
    target_cache,
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    specs: tuple[tuple[int, ...], ...],
    gap_thresholds: tuple[float, ...],
    key: jax.Array | None = None,
    sampling=None,
    typical: tuple[float, float] = (0.09, 0.3),
    max_new_tokens: int = 128,
    eos_ids: tuple[int, ...] = (),
    prefill_plan: tuple[int, ...] | None = None,
):
    """Tree SD with per-iteration width selection.

    ``specs`` are ordered confident-to-uncertain (narrow/deep first);
    ``gap_thresholds`` (len == len(specs) - 1, descending) map the draft's
    first-token logit gap to a spec — reference ``generate_k_seq``
    semantics (src/model_cpu.py:138-252). The draft cache must carry
    max(prod(spec)) lanes. Greedy-lossless: every branch follows the
    target's argmax path, so the switch cannot change the emitted tokens,
    only the speed."""
    if len(gap_thresholds) != len(specs) - 1:
        raise ValueError("need len(specs) - 1 gap thresholds")
    if prefill_plan is not None:
        from duodecoding_tpu.engine.loops import prefill_by_plan

        lanes = draft_cache.k.shape[1]
        span = sum(prefill_plan)
        draft_cache = prefill_by_plan(
            draft_params,
            draft_cfg,
            draft_cache,
            jnp.broadcast_to(tokens[:, :span], (lanes, span)),
            prefill_plan,
            n_tokens,
        )
        target_cache = prefill_by_plan(
            target_params, target_cfg, target_cache, tokens, prefill_plan,
            n_tokens,
        )
    limit = n_tokens + max_new_tokens

    def cond(s: KTreeState):
        return jnp.logical_and(s.n_tokens < limit, ~jnp.all(s.done))

    def body(s: KTreeState):
        return tree_iteration_adaptive(
            draft_params,
            target_params,
            s,
            draft_cfg=draft_cfg,
            target_cfg=target_cfg,
            specs=specs,
            gap_thresholds=gap_thresholds,
            eos_ids=eos_ids,
            limit=limit,
            sampling=sampling,
            typical=typical,
        )

    init = KTreeState(
        tokens=tokens,
        n_tokens=jnp.asarray(n_tokens, jnp.int32),
        key=key if key is not None else jax.random.PRNGKey(0),
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


def ktree_generate(
    draft_params,
    target_params,
    tokens,
    n_tokens,
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
    """Fork-at-root k-chain tree (DuoDecoding generate_k_seq parity) — the
    ``spec = (k, 1, ..., 1)`` special case of ``tree_generate``."""
    return tree_generate(
        draft_params,
        target_params,
        tokens,
        n_tokens,
        draft_cache,
        target_cache,
        draft_cfg=draft_cfg,
        target_cfg=target_cfg,
        spec=(k,) + (1,) * (gamma - 1),
        max_new_tokens=max_new_tokens,
        eos_ids=eos_ids,
    )


def tree_layout(k: int, gamma: int):
    """Fork-at-root layout (kept for tests/back-compat): returns
    (position_offsets [T], window_mask [T, T]) for ``spec = (k, 1, ...)``.
    Note the general ``spec_layout`` orders rows lane-major (chain j's
    nodes contiguous), matching the historical layout."""
    lay = spec_layout((k,) + (1,) * (gamma - 1))
    return lay.offsets, lay.mask
