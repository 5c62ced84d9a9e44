"""Device-resident dynamic-tree speculative decoding (beam drafting +
EAGLE-2-style global top-N candidate selection).

Static branch specs (engine/tree_loops.py) spend verify rows uniformly:
level i always gets ``spec[i]`` branches regardless of how probability
mass is actually distributed this iteration. The reference's strongest
drafter instead grows a BEAM of candidate continuations and keeps the
global top-N nodes by cumulative logprob — EAGLE-2's ``topK_genrate``
(reference: src/model/eagle2/cnets.py:660-800, selection at 755-760).
That dynamic allocation lifts accepted-tokens-per-verify at the same
verify-row budget, which is exactly where the chain/static-tree path
plateaued on-chip (round-3 spec sweeps).

This module implements the machinery ONCE, device-resident (everything
inside one ``lax.while_loop`` program — the reference's host-side tensor
bookkeeping would cost a ~27 ms round-trip per step on a remote TPU
backend), and plugs in two drafters:

- ``beam_expand_slice``: the calibrated layer-slice draft model forks a
  K-wide beam with one lane per beam on its batch axis (weight-bound
  decode: K lanes stream the same weights as 1); beams are re-ranked by
  cumulative logprob each level and lane KV caches are permuted to their
  parent beams with a batch-axis gather (the draft slice is 3/40 layers,
  so the gather is ~100 MB — sub-millisecond);
- ``beam_expand_eagle`` (engine/modes/eagle_fused.py): the EAGLE feature
  network expands the same beam over its feature cache with ancestor-bit
  masks (adaptive/eagle.py) — no lane caches to permute.

Both produce a :class:`BeamOut`; :func:`select_topn` turns it into a
verify window (tokens, parents, depths, ancestor mask) ON DEVICE — the
host-side ``adaptive.eagle.select_tree_dynamic`` is the reference
implementation it is cross-checked against in tests. Verification is one
tree-attention target forward (models/transformer.py window_mask /
position_offsets); the greedy walk follows the target's own argmax chain,
so output is token-identical to ``large`` (the losslessness contract).

Selection correctness notes:
- cumulative logprobs are non-increasing along a path, so the global
  top-N set is closed under parents; a ``depth * 1e-6`` penalty makes the
  parent-over-child ordering STRICT even when a child adds logprob 0, and
  entry indices (roots first, then level blocks) break any remaining ties
  parent-first under ``lax.top_k``'s stable ordering;
- therefore ``parent_pos[j] < j`` for every selected node, which is what
  lets the ancestor-mask fori and the commit relocation (win row of the
  depth-i accepted node is >= i+1) reuse the static-tree arguments.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

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


class BeamOut(NamedTuple):
    """Candidate arrays of one beam expansion (static shapes).

    ``K`` beams, ``D`` expansion levels. Level 0 roots are candidates for
    the position right after the committed prefix; level ``l`` candidates
    (``cand_*[l-1]``) are the children of the K beams KEPT at level
    ``l-1`` (``kept_choice[l-1]`` = each kept beam's flat ``parent*K + j``
    index into that level's ``[K, K]`` candidate block).
    """

    root_tokens: jax.Array  # [K] int32
    root_scores: jax.Array  # [K] f32 logprobs
    cand_tokens: jax.Array  # [D, K, K] int32
    cand_scores: jax.Array  # [D, K, K] f32 cumulative logprobs
    kept_choice: jax.Array  # [D, K] int32 flat indices
    root_logits: jax.Array  # [V] f32 — draft dist at the root (records)


class SelectedTree(NamedTuple):
    """A verify-ready prefix tree (node 0 of the WINDOW is the committed
    token; these arrays describe the N candidate nodes after it)."""

    tokens: jax.Array  # [N] int32 (-1 = invalid, never accepted)
    parent_pos: jax.Array  # [N] int32 index into these arrays (-1 = root)
    depths: jax.Array  # [N] int32 (0 = child of the committed token)
    anc: jax.Array  # [N, N] bool — anc[i, j]: j is an ancestor of i (or i==j)


def select_topn(beam: BeamOut, n_nodes: int) -> SelectedTree:
    """Global top-``n_nodes`` candidates by cumulative logprob, EAGLE-2
    selection (reference eagle2/cnets.py:755-760) computed on device."""
    K = beam.root_tokens.shape[0]
    D = beam.cand_tokens.shape[0]
    KK = K * K

    tok_e = jnp.concatenate(
        [beam.root_tokens, beam.cand_tokens.reshape(-1)]
    )  # [E]
    score_e = jnp.concatenate(
        [beam.root_scores, beam.cand_scores.reshape(-1)]
    )
    depth_e = jnp.concatenate(
        [
            jnp.zeros((K,), jnp.int32),
            jnp.repeat(1 + jnp.arange(D, dtype=jnp.int32), KK),
        ]
    )
    # entry index of the kept beam b at level l (l = 0..D-1): level 0 beams
    # ARE the roots; level l >= 1 beams are the kept candidates of block l
    P = jnp.concatenate(
        [
            jnp.arange(K, dtype=jnp.int32)[None, :],
            K
            + jnp.arange(D - 1, dtype=jnp.int32)[:, None] * KK
            + beam.kept_choice[: D - 1],
        ],
        axis=0,
    )  # [D, K]
    # candidate (l, f)'s parent is kept beam f // K at level l - 1
    parent_blocks = jnp.take(P, jnp.arange(KK, dtype=jnp.int32) // K, axis=1)
    parent_e = jnp.concatenate(
        [jnp.full((K,), -1, jnp.int32), parent_blocks.reshape(-1)]
    )

    adj = score_e - depth_e.astype(jnp.float32) * 1e-6
    _, sel = jax.lax.top_k(adj, n_nodes)  # [N] entry ids, score-descending
    sel_tok = jnp.take(tok_e, sel)
    sel_depth = jnp.take(depth_e, sel)
    pe = jnp.take(parent_e, sel)  # [N] parent ENTRY ids
    is_parent = sel[None, :] == pe[:, None]  # [N, N]
    found = (pe < 0) | jnp.any(is_parent, axis=1)
    parent_pos = jnp.where(
        pe < 0, -1, jnp.argmax(is_parent, axis=1).astype(jnp.int32)
    )
    # a node whose parent fell outside the selection (possible only via
    # float ties beyond the tie-breaks above) can never be accepted
    sel_tok = jnp.where(found, sel_tok, -1)

    N = n_nodes

    def body(j, anc):
        pj = parent_pos[j]
        prow = anc[jnp.maximum(pj, 0)]
        row = jnp.where(pj >= 0, anc[j] | prow, anc[j])
        return anc.at[j].set(row)

    anc = jax.lax.fori_loop(0, N, body, jnp.eye(N, dtype=bool))
    return SelectedTree(
        tokens=sel_tok.astype(jnp.int32),
        parent_pos=parent_pos,
        depths=sel_depth,
        anc=anc,
    )


def greedy_walk(tree: SelectedTree, preds: jax.Array, max_depth: int):
    """Follow the target's argmax chain through the selected tree.

    ``preds`` are the target's argmax tokens over the verify window
    ([N + 1]; row 0 = the committed token's row). Returns
    ``(m, chain_nodes [max_depth])`` — the number of accepted nodes and
    the node index at each chain position (repeats the last accepted node
    past ``m``; entries are verify rows minus 1).
    """
    parent_row = jnp.where(tree.parent_pos < 0, 0, tree.parent_pos + 1)
    cons = tree.tokens == jnp.take(preds, parent_row)  # [N]

    def step(carry, lvl):
        cur, m, alive = carry
        match = (tree.depths == lvl) & (tree.parent_pos == cur) & cons & alive
        ex = jnp.any(match)
        nxt = jnp.argmax(match).astype(jnp.int32)
        cur2 = jnp.where(ex, nxt, cur)
        return (cur2, m + ex.astype(jnp.int32), alive & ex), cur2

    (_, m, _), chain_nodes = jax.lax.scan(
        step,
        (jnp.int32(-1), jnp.int32(0), jnp.bool_(True)),
        jnp.arange(max_depth, dtype=jnp.int32),
    )
    return m, chain_nodes


# --------------------------------------------------------------------------
# Slice-model beam drafting (lanes on the batch axis)
# --------------------------------------------------------------------------


def beam_expand_slice(
    draft_params,
    draft_cfg: ModelConfig,
    d_cache,
    tokens: jax.Array,  # [1, S] committed buffer
    n: jax.Array,  # committed count
    *,
    K: int,
    D: int,
    CU: int,
    verify_vocab: int,
):
    """Catch-up + K-wide beam expansion with the slice draft model.

    One lane per live beam on the batch axis; each level re-ranks the
    K*K children globally and permutes the lane caches to the kept beams'
    parents (batch-axis gather — the DYNAMIC generalisation of
    tree_loops.py's static ``pick`` consistency argument).
    Returns ``(BeamOut, d_cache)``; the beam rows the lanes wrote past
    ``n`` are stale for the committed chain, which the NEXT iteration's
    catch-up re-forwards (CU >= max committed per iteration + 1).
    """
    d_cache = set_cache_length(
        d_cache, jnp.minimum(d_cache.length, n - CU)
    )
    catch = jax.lax.dynamic_slice(tokens, (0, n - CU), (1, CU))
    catch_k = jnp.broadcast_to(catch, (K, CU))
    logits, d_cache = forward(draft_params, draft_cfg, catch_k, d_cache)
    root_logits = logits[0, -1, :]
    logp0 = jax.nn.log_softmax(root_logits[:verify_vocab])
    root_scores, root_tokens = top_k_via_argmax(logp0, K)

    def level(carry, _):
        lane_tok, lane_score, d_cache = carry
        lg, d_cache = forward(
            draft_params, draft_cfg, lane_tok[:, None], d_cache
        )
        logp = jax.nn.log_softmax(lg[:, -1, :verify_vocab], axis=-1)
        cand_s, cand_t = top_k_via_argmax(logp, K)  # [K, K]
        cu = cand_s + lane_score[:, None]
        kept_cu, kept_flat = top_k_via_argmax(cu.reshape(-1), K)
        parent = (kept_flat // K).astype(jnp.int32)
        new_tok = jnp.take(cand_t.reshape(-1), kept_flat).astype(jnp.int32)
        d_cache = d_cache._replace(
            **{
                f: jnp.take(getattr(d_cache, f), parent, axis=1)
                for f in d_cache._fields
                if f != "length"
            }
        )
        return (new_tok, kept_cu, d_cache), (
            cand_t.astype(jnp.int32),
            cu,
            kept_flat.astype(jnp.int32),
        )

    init = (root_tokens.astype(jnp.int32), root_scores, d_cache)
    (_, _, d_cache), (cand_t, cand_cu, kept_flat) = jax.lax.scan(
        level, init, None, length=D
    )
    return (
        BeamOut(
            root_tokens=root_tokens.astype(jnp.int32),
            root_scores=root_scores,
            cand_tokens=cand_t,
            cand_scores=cand_cu,
            kept_choice=kept_flat,
            root_logits=root_logits,
        ),
        d_cache,
    )


# --------------------------------------------------------------------------
# Shared verify + commit
# --------------------------------------------------------------------------


class BeamTreeState(NamedTuple):
    tokens: jax.Array  # [1, S]
    n_tokens: jax.Array
    draft_state: object  # drafter-specific pytree (slice: KV cache)
    target_cache: object
    done: jax.Array
    it: jax.Array
    draft_steps: jax.Array
    target_steps: jax.Array
    records: SDRecords


def verify_and_commit(
    target_params,
    s: BeamTreeState,
    beam: BeamOut,
    *,
    target_cfg: ModelConfig,
    n_nodes: int,
    max_depth: int,  # D + 1 (root level counts)
    eos_ids: tuple[int, ...],
    limit: jax.Array,
    verify_vocab: int,
    return_hidden: bool = False,
):
    """Select the top-N tree, verify it with ONE tree-attention target
    forward, commit the greedy chain + bonus, and relocate the accepted
    cache rows (same single-gather relocation as tree_loops.py — valid
    because the depth-i accepted node's window row is >= i + 1).

    Returns ``(new_state_sans_draft, aux)`` where aux carries what the
    drafters need post-commit (chain rows, hidden states when requested).
    """
    n = s.n_tokens
    tree = select_topn(beam, n_nodes)
    N = n_nodes
    T = N + 1

    last_tok = jax.lax.dynamic_slice(s.tokens, (0, n - 1), (1, 1))[0]
    ver_in = jnp.concatenate([last_tok, tree.tokens])[None, :]
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), tree.depths + 1]
    )
    mask = jnp.zeros((T, T), bool).at[0, 0].set(True)
    mask = mask.at[1:, 0].set(True)
    mask = mask.at[1:, 1:].set(tree.anc)

    fwd = forward(
        target_params,
        target_cfg,
        ver_in,
        s.target_cache,
        position_offsets=offsets,
        window_mask=mask,
        return_hidden=return_hidden,
    )
    if return_hidden:
        t_logits, t_cache, hidden = fwd
    else:
        (t_logits, t_cache), hidden = fwd, None

    preds = jnp.argmax(t_logits[0, :, :verify_vocab], axis=-1).astype(
        jnp.int32
    )
    m, chain_nodes = greedy_walk(tree, preds, max_depth)
    m = jnp.minimum(m, limit - 1 - n)
    chain_tokens = jnp.take(tree.tokens, chain_nodes)  # [max_depth]
    last_node = chain_nodes[jnp.maximum(m - 1, 0)]
    bonus_row = jnp.where(m == 0, 0, last_node + 1)
    bonus = jnp.take(preds, bonus_row)

    tokens = jax.lax.dynamic_update_slice(
        s.tokens, chain_tokens[None, :], (0, n)
    )
    tokens = jax.lax.dynamic_update_slice(tokens, bonus[None, None], (0, n + m))
    n_new = n + m + 1

    # relocation: move accepted window rows to linear positions; rows past
    # m stay identity (they land beyond the new cache length)
    start = n - 1
    lvl = jnp.arange(max_depth, dtype=jnp.int32)
    win_rows = jnp.where(lvl < m, chain_nodes + 1, lvl + 1)
    perm = (
        jnp.arange(T, dtype=jnp.int32).at[1 : max_depth + 1].set(win_rows)
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

    emitted = m + 1
    done = s.done | _stops_hit(tokens, n, emitted, eos_ids, max_depth + 1)

    from duodecoding_tpu.utils.debug import emit_sd_align_inline

    emit_sd_align_inline(
        "beam_tree", "post_commit",
        prefix_len=n_new, gamma=max_depth, accepted=m,
        target_len=n_new - 1, draft_len=n_new - 1,
        max_len=tokens.shape[1],
    )

    q0 = norm_logits(beam.root_logits[None, :], 0.0, 0, 0.0)
    rec = s.records
    records = SDRecords(
        actual_gamma=rec.actual_gamma.at[s.it].set(max_depth),
        accepted=rec.accepted.at[s.it].set(m),
        emitted=rec.emitted.at[s.it].set(emitted),
        draft_entropy=rec.draft_entropy.at[s.it].set(entropy(q0)[0]),
        target_entropy=rec.target_entropy.at[s.it].set(
            entropy(norm_logits(t_logits[:1, 0, :], 0.0, 0, 0.0))[0]
        ),
        accept_rate=rec.accept_rate.at[s.it].set(m / max_depth),
    )
    new_state = BeamTreeState(
        tokens=tokens,
        n_tokens=n_new,
        draft_state=s.draft_state,
        target_cache=t_cache,
        done=done,
        it=s.it + 1,
        draft_steps=s.draft_steps + max_depth,
        target_steps=s.target_steps + 1,
        records=records,
    )
    aux = {
        "m": m,
        "chain_nodes": chain_nodes,
        "chain_tokens": chain_tokens,
        "bonus": bonus,
        "hidden": hidden,
        "preds": preds,
    }
    return new_state, aux


# --------------------------------------------------------------------------
# Slice-draft generation loop
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "draft_cfg",
        "target_cfg",
        "beam_k",
        "beam_depth",
        "n_nodes",
        "max_new_tokens",
        "eos_ids",
        "prefill_plan",
    ),
    donate_argnums=(2, 4, 5),
)
def beam_tree_generate(
    draft_params,
    target_params,
    tokens: jax.Array,
    n_tokens: jax.Array,
    draft_cache,
    target_cache,
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    beam_k: int,
    beam_depth: int,
    n_nodes: int,
    max_new_tokens: int = 128,
    eos_ids: tuple[int, ...] = (),
    prefill_plan: tuple[int, ...] | None = None,
):
    """Dynamic-tree SD generation with the slice draft (greedy).

    Per iteration: one K-lane catch-up + ``beam_depth`` beam-forward draft
    levels, one global top-``n_nodes`` selection, one tree-attention
    verify, commit. Returns the tree_loops.tree_generate tuple. The draft
    cache must carry ``beam_k`` lanes.
    """
    K, D, N = beam_k, beam_depth, n_nodes
    CU = D + 3  # max committed per iteration (D + 2) + 1
    verify_vocab = min(draft_cfg.vocab_size, target_cfg.vocab_size)
    if prefill_plan is not None:
        from duodecoding_tpu.engine.loops import prefill_by_plan

        span = sum(prefill_plan)
        draft_cache = prefill_by_plan(
            draft_params,
            draft_cfg,
            draft_cache,
            jnp.broadcast_to(tokens[:, :span], (K, span)),
            prefill_plan,
            n_tokens,
        )
        target_cache = prefill_by_plan(
            target_params, target_cfg, target_cache, tokens, prefill_plan,
            n_tokens,
        )
    limit = n_tokens + max_new_tokens

    def cond(s: BeamTreeState):
        return jnp.logical_and(s.n_tokens < limit, ~jnp.all(s.done))

    def body(s: BeamTreeState):
        beam, d_cache = beam_expand_slice(
            draft_params,
            draft_cfg,
            s.draft_state,
            s.tokens,
            s.n_tokens,
            K=K,
            D=D,
            CU=CU,
            verify_vocab=verify_vocab,
        )
        s = s._replace(draft_state=d_cache)
        new_s, _aux = verify_and_commit(
            target_params,
            s,
            beam,
            target_cfg=target_cfg,
            n_nodes=N,
            max_depth=D + 1,
            eos_ids=eos_ids,
            limit=limit,
            verify_vocab=verify_vocab,
        )
        d_cache = set_cache_length(
            d_cache, jnp.minimum(d_cache.length, new_s.n_tokens - 1)
        )
        return new_s._replace(draft_state=d_cache)

    init = BeamTreeState(
        tokens=tokens,
        n_tokens=jnp.asarray(n_tokens, jnp.int32),
        draft_state=draft_cache,
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


# --------------------------------------------------------------------------
# EAGLE feature-draft generation loop
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "target_cfg",
        "beam_k",
        "beam_depth",
        "n_nodes",
        "max_new_tokens",
        "eos_ids",
    ),
    donate_argnums=(4, 5, 6),
)
def eagle_beam_generate(
    eagle_params,
    embed: jax.Array,  # [V, d] frozen target embedding
    head: jax.Array,  # [d, V] frozen target unembedding
    target_params,
    tokens: jax.Array,
    eagle_cache,
    target_cache,
    n_tokens: jax.Array,
    init_pair_tokens: jax.Array,  # [1, Wc]
    init_pair_hidden: jax.Array,  # [1, Wc, d]
    init_valid: jax.Array,
    *,
    target_cfg: ModelConfig,
    beam_k: int,
    beam_depth: int,
    n_nodes: int,
    max_new_tokens: int = 128,
    eos_ids: tuple[int, ...] = (),
):
    """Device-resident EAGLE-2 generation: feature-net beam expansion +
    dynamic top-N tree verify inside one while-loop program.

    The verify forward returns hidden states (``return_hidden``) at every
    window row; the accepted rows' hiddens become the next iteration's
    (hidden, token) catch-up pairs — the data dependence that makes EAGLE
    drafting inherently verify-coupled (reference ea_model.py:154
    ``eagenerate``). The caller seeds the eagle cache over the prompt and
    passes the LAST prompt pair as the initial window (valid = 1).
    """
    from duodecoding_tpu.adaptive.eagle import eagle_beam_expand

    K, D, N = beam_k, beam_depth, n_nodes
    Wc = D + 2  # max committed per iteration (chain D+1 + bonus)
    verify_vocab = target_cfg.vocab_size
    limit = n_tokens + max_new_tokens
    d = target_cfg.hidden_size

    def cond(s: BeamTreeState):
        return jnp.logical_and(s.n_tokens < limit, ~jnp.all(s.done))

    def body(s: BeamTreeState):
        ds = s.draft_state
        eo, root_logits = eagle_beam_expand(
            eagle_params,
            embed,
            head,
            target_cfg,
            ds["cache"],
            ds["pair_t"],
            ds["pair_h"],
            ds["valid"],
            depth=D,
            top_k=K,
        )
        beam = BeamOut(
            root_tokens=eo.root_tokens,
            root_scores=eo.root_scores,
            cand_tokens=eo.cand_tokens,
            cand_scores=eo.cand_scores,
            kept_choice=eo.kept_choice,
            root_logits=root_logits,
        )
        new_s, aux = verify_and_commit(
            target_params,
            s,
            beam,
            target_cfg=target_cfg,
            n_nodes=N,
            max_depth=D + 1,
            eos_ids=eos_ids,
            limit=limit,
            verify_vocab=verify_vocab,
            return_hidden=True,
        )
        # next catch-up pairs: committed token j's predecessor hidden is
        # window row 0 (j = 0) or the (j-1)-th accepted node's row
        m = aux["m"]
        chain_nodes = aux["chain_nodes"]  # [D + 1]
        hidden = aux["hidden"][0]  # [N + 1, d]
        j = jnp.arange(Wc, dtype=jnp.int32)
        new_toks = jnp.where(
            j < m,
            jnp.take(aux["chain_tokens"], jnp.minimum(j, D)),
            jnp.where(j == m, aux["bonus"], 0),
        )
        rows = jnp.where(
            j == 0,
            0,
            jnp.take(chain_nodes, jnp.minimum(jnp.maximum(j - 1, 0), D)) + 1,
        )
        pair_h = jnp.take(hidden, rows, axis=0).astype(ds["pair_h"].dtype)
        new_ds = {
            "cache": eo.cache,
            "pair_t": new_toks[None, :],
            "pair_h": pair_h[None, :, :],
            "valid": m + 1,
        }
        return new_s._replace(draft_state=new_ds)

    init = BeamTreeState(
        tokens=tokens,
        n_tokens=jnp.asarray(n_tokens, jnp.int32),
        draft_state={
            "cache": eagle_cache,
            "pair_t": jnp.asarray(init_pair_tokens, jnp.int32),
            "pair_h": init_pair_hidden,
            "valid": jnp.asarray(init_valid, jnp.int32),
        },
        target_cache=target_cache,
        done=jnp.zeros((tokens.shape[0],), bool),
        it=jnp.int32(0),
        draft_steps=jnp.int32(0),
        target_steps=jnp.int32(0),
        records=init_sd_records(max_new_tokens),
    )
    del d
    out = jax.lax.while_loop(cond, body, init)
    return (
        out.tokens,
        out.n_tokens,
        out.records,
        out.it,
        out.draft_steps,
        out.target_steps,
    )
