"""EAGLE feature-level drafting — TPU-native redesign.

The reference vendors EAGLE-1/2 as PyTorch baselines (reference:
src/model/eagle/cnets.py:454-505 — draft ``Model`` = fc(2d->d) over
``[embed(token_{t+1}); hidden_t]`` pairs followed by llama decoder layers;
src/model/eagle/ea_model.py:23; src/model/eagle2/cnets.py:660-800 —
``topK_genrate`` dynamic beam-tree expansion with cumulative-logprob
reranking). This module re-builds the same capability TPU-first:

- the draft network is a pure-jax pytree applied by :func:`eagle_forward`
  over a fixed-shape feature KV cache (``models.transformer.KVCache`` with
  one slot per eagle layer); rollback is ``set_cache_length``;
- drafting is a single jitted program (:func:`eagle_draft_step`): a
  catch-up forward over the newly committed (hidden, token) pairs followed
  by a ``lax.scan`` beam expansion with static ``depth``/``top_k`` — the
  dynamic tree-mask bookkeeping of the reference (eagle2 cnets.py:742,
  ``tree_mask = cat(tree_mask[:, :, out_ids], init)``) becomes a carried
  ancestor-bit matrix updated by gather;
- candidate selection (static per-level widths for `eagle`, global top-N
  over cumulative scores for `eagle2`, cnets.py:755-760) happens host-side
  on the tiny score arrays, and verification goes through the shared
  tree-attention machinery (ops/tree.py + engine/modes/rest.py
  ``tree_forward_step``), so greedy output is token-identical to AR.

Feature convention: the network predicts the target's *final-layer hidden
state after final_norm* (what ``models.transformer.forward`` returns with
``return_hidden=True``), so candidate logits are simply ``feat @ head``
with the target's own unembedding — no extra norm is applied, matching the
reference's ``head(last_hidden)`` (cnets.py:655).

Training is self-distillation on the target's own greedy rollouts (no
external data): smooth-L1 feature regression + 0.1-weighted token
cross-entropy, the EAGLE loss composition.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from duodecoding_tpu.models.config import ModelConfig
from duodecoding_tpu.models.transformer import KVCache, _rms_norm, _rope


# --------------------------------------------------------------------------
# Parameters
# --------------------------------------------------------------------------


def init_eagle_params(
    key: jax.Array, cfg: ModelConfig, num_layers: int = 1, dtype=jnp.float32
):
    """Draft-network parameters: fc(2d->d, bias) + ``num_layers`` stacked
    decoder layers (same pytree layout as the main transformer so the
    attention math is shared). The target's embedding/unembedding are NOT
    part of this pytree — they stay frozen and are passed in at apply time
    (reference freezes embed_tokens, cnets.py:495-496)."""
    d = cfg.hidden_size
    f = cfg.intermediate_size
    hd, h, hkv = cfg.head_dim_, cfg.num_heads, cfg.num_kv_heads
    L = num_layers
    ks = jax.random.split(key, 9)

    def norm(k, *shape, scale=None):
        scale = scale if scale is not None else (shape[-2] ** -0.5)
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    return {
        "fc_w": norm(ks[0], 2 * d, d),
        "fc_b": jnp.zeros((d,), dtype),
        "layers": {
            "attn_norm": jnp.ones((L, d), dtype),
            "wq": norm(ks[1], L, d, h * hd),
            "wk": norm(ks[2], L, d, hkv * hd),
            "wv": norm(ks[3], L, d, hkv * hd),
            "wo": norm(ks[4], L, h * hd, d),
            "mlp_norm": jnp.ones((L, d), dtype),
            "w_gate": norm(ks[5], L, d, f),
            "w_up": norm(ks[6], L, d, f),
            "w_down": norm(ks[7], L, f, d),
        },
    }


def init_eagle_cache(
    cfg: ModelConfig, batch: int, max_len: int, num_layers: int = 1,
    dtype=jnp.float32,
) -> KVCache:
    shape = (num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim_)
    return KVCache(
        k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype), length=jnp.int32(0)
    )


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------


def eagle_forward(
    eparams,
    cfg: ModelConfig,
    embed: jax.Array,  # [V, d] frozen target embedding
    tokens: jax.Array,  # [B, T] int32 — token_{t+1} of each pair
    hidden_prev: jax.Array,  # [B, T, d] — hidden_t of each pair
    cache: KVCache,
    positions: jax.Array | None = None,  # [B, T] rope positions
    attn_mask: jax.Array | None = None,  # [T, S] full visibility override
):
    """Apply the draft network to (hidden, token) pairs.

    Default attention is causal from ``cache.length``; ``attn_mask`` gives
    full [T, S] control for tree expansion (the reference threads a
    ``tree_mask`` through its attention, eagle/cnets.py:258-268).
    Returns ``(features [B, T, d], new_cache)``; new_cache.length advances
    by T (callers holding padded windows roll back with
    ``set_cache_length``).
    """
    B, T = tokens.shape
    S = cache.max_len
    start = cache.length
    emb = jnp.take(embed, tokens, axis=0)
    x = (
        jnp.concatenate([emb, hidden_prev.astype(emb.dtype)], axis=-1)
        @ eparams["fc_w"]
        + eparams["fc_b"]
    )

    if positions is None:
        positions = start + jnp.arange(T, dtype=jnp.int32)[None, :]
        positions = jnp.broadcast_to(positions, (B, T))
    if attn_mask is None:
        k_pos = jnp.arange(S, dtype=jnp.int32)
        q_pos = start + jnp.arange(T, dtype=jnp.int32)
        attn_mask = k_pos[None, :] <= q_pos[:, None]  # [T, S]

    scale = cfg.head_dim_**-0.5
    n_rep = cfg.num_heads // cfg.num_kv_heads
    h = x

    def layer_fn(h, xs):
        lp, k_cache, v_cache = xs
        y = _rms_norm(h, lp["attn_norm"], cfg.rms_norm_eps)
        q = (y @ lp["wq"]).reshape(B, T, cfg.num_heads, cfg.head_dim_)
        k = (y @ lp["wk"]).reshape(B, T, cfg.num_kv_heads, cfg.head_dim_)
        v = (y @ lp["wv"]).reshape(B, T, cfg.num_kv_heads, cfg.head_dim_)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, start, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, start, 0, 0))
        qg = q.reshape(B, T, cfg.num_kv_heads, n_rep, cfg.head_dim_)
        scores = (
            jnp.einsum(
                "btgrd,bsgd->bgrts", qg, k_cache,
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        scores = jnp.where(attn_mask[None, None, None, :, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum(
            "bgrts,bsgd->btgrd", probs.astype(v_cache.dtype), v_cache,
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        ctx = ctx.reshape(B, T, cfg.num_heads * cfg.head_dim_)
        h = h + ctx @ lp["wo"]
        y = _rms_norm(h, lp["mlp_norm"], cfg.rms_norm_eps)
        gate = jax.nn.silu((y @ lp["w_gate"]).astype(jnp.float32)).astype(y.dtype)
        h = h + (gate * (y @ lp["w_up"])) @ lp["w_down"]
        return h, (k_cache, v_cache)

    h, (new_k, new_v) = jax.lax.scan(
        layer_fn, h, (eparams["layers"], cache.k, cache.v)
    )
    return h, KVCache(k=new_k, v=new_v, length=start + T)


# --------------------------------------------------------------------------
# Drafting: catch-up + beam-tree expansion, one jitted program per iteration
# --------------------------------------------------------------------------


class EagleDraftOut(NamedTuple):
    """Device outputs of one draft step (all static shapes)."""

    root_tokens: jax.Array  # [K] level-0 candidate tokens
    root_scores: jax.Array  # [K] level-0 logprobs
    cand_tokens: jax.Array  # [D, K, K] level 1..D candidates per kept beam
    cand_scores: jax.Array  # [D, K, K] cumulative logprobs
    kept_parent: jax.Array  # [D, K] kept beam -> parent beam at prev level
    kept_choice: jax.Array  # [D, K] kept beam -> flat (parent*K + j) choice
    cache: KVCache  # advanced past catch-up (beam rows beyond valid length)
    new_length: jax.Array  # stable cache length after catch-up


def eagle_beam_expand(
    eparams,
    embed: jax.Array,  # [V, d]
    head: jax.Array,  # [d, V]
    cfg: ModelConfig,
    cache: KVCache,
    pair_tokens: jax.Array,  # [1, Wc] committed tokens (padded)
    pair_hidden: jax.Array,  # [1, Wc, d] their predecessor hiddens (padded)
    valid: jax.Array,  # scalar — number of valid pairs
    *,
    depth: int,
    top_k: int,
) -> Tuple[EagleDraftOut, jax.Array]:
    """Catch the feature cache up over the newly committed pairs, then
    expand a candidate beam tree of ``depth`` levels x ``top_k`` beams.
    Returns ``(EagleDraftOut, root logits [V])``.

    Mirrors the reference's ``topK_genrate`` (eagle2/cnets.py:660-800): the
    catch-up forward is its ``stable_kv`` extension (cnets.py:680-686), the
    scan body is its per-depth loop (cnets.py:704-742) with the tree mask
    carried as an ancestor-bit matrix instead of a concatenated tensor.

    Pure traced function — the host-driven modes call it through the
    jitted :func:`eagle_draft_step`; the device-resident loop
    (engine/modes/eagle_fused.py) traces it inline inside its while body.
    """
    B, Wc = pair_tokens.shape
    d = cfg.hidden_size
    S = cache.max_len
    stable0 = cache.length

    # --- catch-up over committed pairs (causal; padding rows are inert:
    # row i only sees rows <= i, and rows >= valid are rolled back) -------
    feats, cache = eagle_forward(
        eparams, cfg, embed, pair_tokens, pair_hidden, cache
    )
    root_feat = jax.lax.dynamic_index_in_dim(
        feats[0], jnp.maximum(valid - 1, 0), axis=0, keepdims=False
    )  # [d]
    stable = stable0 + valid
    cache = cache._replace(length=stable)

    # --- level 0: candidates for the next position ----------------------
    logits0 = (root_feat.astype(jnp.float32) @ head.astype(jnp.float32))
    logp0 = jax.nn.log_softmax(logits0)
    root_scores, root_tokens = jax.lax.top_k(logp0, top_k)

    k_pos = jnp.arange(S, dtype=jnp.int32)
    NB = depth * top_k  # beam-row region size

    def level(carry, i):
        cache_k, cache_v, tokens_i, feats_i, scores_i, bits = carry
        # bits: [K, NB] ancestor bits of each live beam (excl. self)
        write_at = stable + i * top_k
        own = jax.nn.one_hot(
            i * top_k + jnp.arange(top_k), NB, dtype=jnp.bool_
        )
        vis = bits | own  # [K, NB] ancestors + self
        prefix_vis = (k_pos[None, :] < stable) & (k_pos[None, :] < S)
        beam_vis = jnp.zeros((top_k, S), jnp.bool_)
        beam_vis = jax.lax.dynamic_update_slice(beam_vis, vis, (0, stable))
        mask = prefix_vis | beam_vis  # [K, S]
        positions = jnp.full((1, top_k), stable + i, jnp.int32)

        c = KVCache(k=cache_k, v=cache_v, length=write_at)
        f_out, c = eagle_forward(
            eparams,
            cfg,
            embed,
            tokens_i[None, :],
            feats_i[None, :, :],
            c,
            positions=positions,
            attn_mask=mask,
        )
        f_out = f_out[0]  # [K, d]
        logits = f_out.astype(jnp.float32) @ head.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)  # [K, V]
        cand_s, cand_t = jax.lax.top_k(logp, top_k)  # [K, K]
        cu = cand_s + scores_i[:, None]  # cumulative along path
        kept_cu, kept_flat = jax.lax.top_k(cu.reshape(-1), top_k)
        parent = kept_flat // top_k  # kept beam's parent beam
        new_tokens = cand_t.reshape(-1)[kept_flat]
        new_feats = f_out[parent]
        new_bits = bits[parent] | jax.nn.one_hot(
            i * top_k + parent, NB, dtype=jnp.bool_
        )
        return (
            (c.k, c.v, new_tokens, new_feats, kept_cu, new_bits),
            (cand_t, cu, parent, kept_flat),
        )

    feats0 = jnp.broadcast_to(root_feat[None, :], (top_k, d)).astype(
        pair_hidden.dtype
    )
    init = (
        cache.k,
        cache.v,
        root_tokens.astype(jnp.int32),
        feats0,
        root_scores,
        jnp.zeros((top_k, NB), jnp.bool_),
    )
    (ck, cv, *_rest), (cand_t, cand_cu, parent, kept_flat) = jax.lax.scan(
        level, init, jnp.arange(depth)
    )
    # beam rows in the cache are scratch; expose the stable length only
    out_cache = KVCache(k=ck, v=cv, length=stable)
    return EagleDraftOut(
        root_tokens=root_tokens.astype(jnp.int32),
        root_scores=root_scores,
        cand_tokens=cand_t.astype(jnp.int32),
        cand_scores=cand_cu,
        kept_parent=parent.astype(jnp.int32),
        kept_choice=kept_flat.astype(jnp.int32),
        cache=out_cache,
        new_length=stable,
    ), logits0


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "depth", "top_k"),
    donate_argnames=("cache",),
)
def eagle_draft_step(
    eparams,
    embed: jax.Array,
    head: jax.Array,
    cfg: ModelConfig,
    cache: KVCache,
    pair_tokens: jax.Array,
    pair_hidden: jax.Array,
    valid: jax.Array,
    *,
    depth: int,
    top_k: int,
) -> EagleDraftOut:
    """Jitted wrapper of :func:`eagle_beam_expand` (host-driven modes)."""
    out, _ = eagle_beam_expand(
        eparams, embed, head, cfg, cache, pair_tokens, pair_hidden, valid,
        depth=depth, top_k=top_k,
    )
    return out


@functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnames=("cache",)
)
def eagle_catchup(
    eparams,
    embed: jax.Array,
    cfg: ModelConfig,
    cache: KVCache,
    pair_tokens: jax.Array,  # [1, C] (padded)
    pair_hidden: jax.Array,  # [1, C, d]
    valid: jax.Array,  # scalar — number of valid pairs
) -> KVCache:
    """Advance the feature cache over ``valid`` committed pairs without
    beam expansion — prompt seeding for the fused device loop
    (engine/beam_tree.py::eagle_beam_generate). Padding rows are inert:
    causal attention keeps row i blind to rows > i, and the length
    rollback discards rows >= valid."""
    _, cache = eagle_forward(
        eparams, cfg, embed, pair_tokens, pair_hidden, cache
    )
    return cache._replace(
        length=cache.length - pair_tokens.shape[1] + valid
    )


# --------------------------------------------------------------------------
# Host-side tree selection
# --------------------------------------------------------------------------


def select_tree_static(out: EagleDraftOut, widths: Tuple[int, ...]):
    """EAGLE-1-style static tree: per level, the ``widths[l]`` best
    candidates along kept beams (the analog of the reference's fixed
    ``mc_sim_7b_63`` tree, eagle/cnets.py:498-501). Returns
    (tokens [N], parents [N]) with parents indexing the returned arrays
    (-1 = root)."""
    root_t = np.asarray(out.root_tokens)
    root_s = np.asarray(out.root_scores)
    K = root_t.shape[0]
    D = int(out.cand_tokens.shape[0])
    tokens: list[int] = []
    parents: list[int] = []
    # level 0
    w0 = min(widths[0] if widths else K, K)
    order0 = np.argsort(root_s)[::-1][:w0]
    beam_to_node: dict[int, int] = {}  # kept-beam index -> node id (prev lvl)
    for j in order0:
        beam_to_node[int(j)] = len(tokens)
        tokens.append(int(root_t[j]))
        parents.append(-1)
    kept_parent = np.asarray(out.kept_parent)
    kept_choice = np.asarray(out.kept_choice)
    cand_t = np.asarray(out.cand_tokens)
    cand_s = np.asarray(out.cand_scores)
    for lvl in range(1, min(D + 1, len(widths))):
        w = min(widths[lvl], K)
        cu = cand_s[lvl - 1]
        flat = np.argsort(cu.reshape(-1))[::-1]
        new_map: dict[int, int] = {}
        taken = 0
        for f in flat:
            if taken >= w:
                break
            pb = int(f // K)
            if pb not in beam_to_node:
                continue  # parent beam wasn't materialized at prev level
            node = len(tokens)
            tokens.append(int(cand_t[lvl - 1].reshape(-1)[f]))
            parents.append(beam_to_node[pb])
            # this candidate continues as a kept beam iff it was kept
            hits = np.nonzero(kept_choice[lvl - 1] == f)[0]
            if hits.size:
                new_map[int(hits[0])] = node
            taken += 1
        beam_to_node = new_map
        if not beam_to_node:
            break
    return np.asarray(tokens, np.int32), np.asarray(parents, np.int32)


def select_tree_dynamic(out: EagleDraftOut, total_tokens: int):
    """EAGLE-2 dynamic tree: global top-``total_tokens`` nodes by
    cumulative logprob across every level (eagle2/cnets.py:755-760).
    Ancestors always outscore descendants (logprobs are <= 0), so the
    top-N set is closed under parents up to ties; any gap is repaired by
    walking parent chains."""
    root_t = np.asarray(out.root_tokens)
    root_s = np.asarray(out.root_scores)
    K = root_t.shape[0]
    D = int(out.cand_tokens.shape[0])
    kept_parent = np.asarray(out.kept_parent)
    kept_choice = np.asarray(out.kept_choice)
    cand_t = np.asarray(out.cand_tokens)
    cand_s = np.asarray(out.cand_scores)

    # global candidate key: level 0 -> ("r", j); level l>=1 -> ("c", l, flat)
    entries: list[tuple[float, tuple]] = []
    for j in range(K):
        entries.append((float(root_s[j]), ("r", j)))
    for lvl in range(1, D + 1):
        cu = cand_s[lvl - 1].reshape(-1)
        for f in range(cu.shape[0]):
            entries.append((float(cu[f]), ("c", lvl, f)))
    entries.sort(key=lambda e: -e[0])

    # kept-beam lineage: beam b at level lvl corresponds to candidate key
    def beam_key(lvl: int, b: int):
        if lvl == 0:
            return ("r", b)
        return ("c", lvl, int(kept_choice[lvl - 1][b]))

    def parent_key(key):
        if key[0] == "r":
            return None
        _, lvl, f = key
        pb = f // K
        return beam_key(lvl - 1, int(pb))

    selected: dict[tuple, int] = {}
    tokens: list[int] = []
    parents: list[int] = []

    def add(key) -> int:
        if key in selected:
            return selected[key]
        pk = parent_key(key)
        pid = -1 if pk is None else add(pk)
        node = len(tokens)
        if key[0] == "r":
            tokens.append(int(root_t[key[1]]))
        else:
            _, lvl, f = key
            tokens.append(int(cand_t[lvl - 1].reshape(-1)[f]))
        parents.append(pid)
        selected[key] = node
        return node

    for score, key in entries:
        if len(tokens) >= total_tokens:
            break
        add(key)
    return np.asarray(tokens, np.int32), np.asarray(parents, np.int32)


# --------------------------------------------------------------------------
# Self-distillation training
# --------------------------------------------------------------------------


def collect_eagle_data(
    params, cfg: ModelConfig, prompts: np.ndarray, max_new: int, dtype=None
):
    """Greedy rollouts of the target, then a teacher-forced pass exposing
    hiddens. Returns (pair_hiddens [B, T, d], pair_tokens [B, T],
    feat_labels [B, T, d], tok_labels [B, T], weight [B, T]) where pair t
    is (hidden_t, token_{t+1}), the feature label is hidden_{t+1} and the
    token label is token_{t+2} (the EAGLE objective)."""
    from duodecoding_tpu.engine.loops import ar_generate, prefill
    from duodecoding_tpu.engine.sampling_config import SamplingConfig
    from duodecoding_tpu.models import forward, init_cache

    B, L = prompts.shape
    S = L + max_new
    if dtype is None:
        dtype = params["embed"].dtype  # match the model's compute dtype
    tokens = jnp.zeros((B, S), jnp.int32).at[:, :L].set(jnp.asarray(prompts))
    cache = init_cache(cfg, B, S, dtype)
    cache = prefill(params, cfg, cache, tokens[:, :L])
    tokens, n, _, _ = ar_generate(
        params,
        cfg=cfg,
        tokens=tokens,
        cache=cache,
        n_tokens=jnp.int32(L),
        key=jax.random.PRNGKey(0),
        sampling=SamplingConfig(0.0),
        max_new_tokens=max_new,
    )
    cache2 = init_cache(cfg, B, S, dtype)
    _, _, hidden = forward(params, cfg, tokens, cache2, return_hidden=True)
    toks = np.asarray(tokens)
    hid = np.asarray(hidden, np.float32)
    T = S - 2
    pair_hiddens = hid[:, :T]
    pair_tokens = toks[:, 1 : T + 1]
    feat_labels = hid[:, 1 : T + 1]
    tok_labels = toks[:, 2 : T + 2]
    weight = np.zeros((B, T), np.float32)
    weight[:, max(L - 1, 0) :] = 1.0  # train on generated region only
    return pair_hiddens, pair_tokens, feat_labels, tok_labels, weight


def train_eagle(
    eparams,
    cfg: ModelConfig,
    embed: jax.Array,
    head: jax.Array,
    pair_hiddens: np.ndarray,
    pair_tokens: np.ndarray,
    feat_labels: np.ndarray,
    tok_labels: np.ndarray,
    weight: np.ndarray,
    *,
    lr: float = 1e-3,
    epochs: int = 20,
    w_feat: float = 1.0,
    w_tok: float = 0.1,
):
    """Teacher-forced causal training over whole sequences; loss =
    w_feat * smooth_l1(feat, label) + w_tok * CE(head(feat), token) — the
    EAGLE loss composition (vloss + 0.1*ploss)."""
    tx = optax.adam(lr)
    opt_state = tx.init(eparams)
    B, T = pair_tokens.shape

    # embed/head are ARGUMENTS, never closure constants: a jit capturing
    # the 13B embedding/unembedding bakes ~660 MB of literals into the
    # program — 30-60x slower compiles (CLAUDE.md compile-probe trap) and
    # an outright remote-compile failure (HTTP 413 request-body limit).
    @jax.jit
    def step(eparams, opt_state, embed, head, ph, pt, fl, tl, w):
        def loss_fn(ep):
            cache = init_eagle_cache(
                cfg, B, T, num_layers=ep["layers"]["wq"].shape[0],
                dtype=ph.dtype,
            )
            feats, _ = eagle_forward(ep, cfg, embed, pt, ph, cache)
            diff = (feats - fl).astype(jnp.float32)
            ad = jnp.abs(diff)
            sl1 = jnp.where(ad < 1.0, 0.5 * diff * diff, ad - 0.5).mean(-1)
            logits = feats.astype(jnp.float32) @ head.astype(jnp.float32)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, tl)
            denom = jnp.maximum(w.sum(), 1.0)
            return (w * (w_feat * sl1 + w_tok * ce)).sum() / denom

        loss, grads = jax.value_and_grad(loss_fn)(eparams)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(eparams, updates), opt_state, loss

    ph = jnp.asarray(pair_hiddens)
    pt = jnp.asarray(pair_tokens, jnp.int32)
    fl = jnp.asarray(feat_labels)
    tl = jnp.asarray(tok_labels, jnp.int32)
    w = jnp.asarray(weight)
    loss = jnp.float32(0)
    for _ in range(epochs):
        eparams, opt_state, loss = step(
            eparams, opt_state, embed, head, ph, pt, fl, tl, w
        )
    return eparams, float(loss)
