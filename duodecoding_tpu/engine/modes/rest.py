"""`rest` — retrieval-based speculative decoding over the native
suffix-array datastore.

Equivalent of the reference's vendored REST baseline (reference:
src/model/rest/rest_model.py:105 + the Rust DraftRetriever): instead of a
draft model, continuations retrieved from a token datastore by
longest-suffix match are proposed and verified by the target in one
forward. The proposal is deterministic (q = one-hot), so each draft token
is accepted with probability p(x) — at temperature 0, exactly when it is
the target argmax. This round implements the linear (highest-frequency
path) variant; tree verification is the multi-path extension.
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.loops import _stops_hit, prefill
from duodecoding_tpu.models.transformer import rollback
from duodecoding_tpu.engine.metrics import finalize_throughput, get_empty_metrics
from duodecoding_tpu.engine.registry import register_mode
from duodecoding_tpu.engine.sampling_config import SamplingConfig
from duodecoding_tpu.models.config import ModelConfig
from duodecoding_tpu.models.transformer import KVCache, forward
from duodecoding_tpu.ops.sampling import max_fn, norm_logits, sample
from duodecoding_tpu.ops.verify import compute_acceptance


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sampling", "gamma", "eos_ids"),
    donate_argnames=("tokens", "cache"),
)
def rest_verify_step(
    target_params,
    tokens: jax.Array,
    n_tokens: jax.Array,
    draft_tokens: jax.Array,  # [gamma] retrieved continuation (padded)
    g_act: jax.Array,  # how many retrieved tokens are valid
    cache: KVCache,
    key: jax.Array,
    *,
    cfg: ModelConfig,
    sampling: SamplingConfig,
    gamma: int,
    eos_ids: tuple[int, ...] = (),
):
    B = tokens.shape[0]
    p = n_tokens
    tokens = jax.lax.dynamic_update_slice(
        tokens, draft_tokens[None, :], (0, p)
    )
    ver = jax.lax.dynamic_slice(tokens, (0, p - 1), (B, gamma + 1))
    logits, cache = forward(target_params, cfg, ver, cache)
    p_window = norm_logits(logits, sampling.temperature, sampling.top_k, sampling.top_p)

    # deterministic proposal: q = one-hot at the retrieved tokens
    q_window = jax.nn.one_hot(
        draft_tokens[None, :], cfg.vocab_size, dtype=jnp.float32
    )
    key, k_r, k_t = jax.random.split(key, 3)
    r = jax.random.uniform(k_r, (B, gamma))
    acc = compute_acceptance(
        q_window, p_window, draft_tokens[None, :], r, p, g_act
    )
    all_accepted = acc.accepted_count >= g_act
    off = acc.accepted_count
    tgt_row = jnp.take_along_axis(p_window, off[:, None, None], axis=1)[:, 0, :]
    drf_row = jnp.take_along_axis(
        q_window, jnp.minimum(off, jnp.maximum(g_act - 1, 0))[:, None, None], axis=1
    )[:, 0, :]
    residual = max_fn(tgt_row - drf_row)
    final = jnp.where(all_accepted[:, None], tgt_row, residual)
    if sampling.greedy:
        t = jnp.argmax(final, axis=-1)[:, None].astype(jnp.int32)
    else:
        t = sample(k_t, final)
    n = acc.n[0]
    tokens = jax.lax.dynamic_update_slice(tokens, t, (0, n + 1))
    new_n = n + 2
    cache = KVCache(cache.k, cache.v, (n + 1).astype(jnp.int32))
    emitted = new_n - p
    done = _stops_hit(tokens, p, emitted, eos_ids, gamma + 1)
    return tokens, new_n, cache, key, acc.accepted_count[0], emitted, done


@functools.partial(
    jax.jit, static_argnames=("cfg", "sampling"), donate_argnames=("tokens", "cache")
)
def rest_single_step(
    target_params, tokens, n_tokens, cache, key, *, cfg, sampling: SamplingConfig
):
    B = tokens.shape[0]
    last = jax.lax.dynamic_slice(tokens, (0, n_tokens - 1), (B, 1))
    logits, cache = forward(target_params, cfg, last, cache)
    probs = norm_logits(
        logits[:, -1, :], sampling.temperature, sampling.top_k, sampling.top_p
    )
    key, k = jax.random.split(key)
    if sampling.greedy:
        t = jnp.argmax(probs, axis=-1)[:, None].astype(jnp.int32)
    else:
        t = sample(k, probs)
    tokens = jax.lax.dynamic_update_slice(tokens, t, (0, n_tokens))
    return tokens, n_tokens + 1, cache, key


@register_mode("rest")
def rest(
    engine,
    prefix,
    datastore=None,
    max_suffix: int = 16,
    use_early_stopping=False,
    **kw,
):
    """``datastore``: a DraftReader instance or a path to a store built with
    DraftWriter. Falls back to plain target decoding when no match."""
    from duodecoding_tpu.engine.engine import Stopwatch, block
    from duodecoding_tpu.native import DraftReader

    cfg = engine.config
    target = engine.target
    if isinstance(datastore, str):
        datastore = DraftReader(datastore)
    if datastore is None:
        raise ValueError("rest mode requires a datastore (DraftReader or path)")

    tokens, L = engine.token_buffer(prefix)
    eos = cfg.eos_ids if use_early_stopping else ()
    gamma = cfg.gamma
    cache = engine.new_cache(target)

    with Stopwatch() as sw:
        cache = prefill(target.params, target.cfg, cache, tokens[:, :L])

    n_now = L
    key = engine.next_key()
    iters = 0
    drafted = 0
    hits = 0
    accepted_total = 0
    target_steps = 0
    compute = sw.elapsed
    host_tokens = list(np.asarray(tokens[0, :L]))
    done = False
    limit = L + cfg.max_tokens
    while n_now < limit and not done:
        t0 = time.perf_counter()
        conts, freqs, match_len = datastore.search(
            np.asarray(host_tokens[-max_suffix:], np.int32),
            max_suffix=max_suffix,
            draft_len=gamma,
            top_n=1,
        )
        if conts and len(conts[0]) > 0:
            hits += 1
            cont = conts[0]
            g_act = min(len(cont), gamma, limit - 1 - n_now)
            buf = np.zeros((gamma,), np.int32)
            buf[: len(cont[:gamma])] = cont[:gamma]
            tokens, n_dev, cache, key, acc_cnt, emitted, done_dev = rest_verify_step(
                target.params,
                tokens,
                jnp.int32(n_now),
                jnp.asarray(buf),
                jnp.int32(max(g_act, 0)),
                cache,
                key,
                cfg=target.cfg,
                sampling=engine.sampling,
                gamma=gamma,
                eos_ids=eos,
            )
            n_new = int(n_dev)
            drafted += max(g_act, 0)
            accepted_total += int(acc_cnt)
            target_steps += 1
        else:
            tokens, n_dev, cache, key = rest_single_step(
                target.params, tokens, jnp.int32(n_now), cache, key,
                cfg=target.cfg, sampling=engine.sampling,
            )
            n_new = int(n_dev)
            target_steps += 1
            done_dev = None
        new_toks = np.asarray(tokens[0, n_now:n_new])
        host_tokens.extend(int(t) for t in new_toks)
        if eos and any(int(t) in eos for t in new_toks):
            done = True
        n_now = n_new
        iters += 1
        compute += time.perf_counter() - t0

    block(tokens)
    out = np.asarray(tokens[:, :n_now])
    m = get_empty_metrics()
    m["generated_tokens"] = n_now - L
    m["target_forward_times"] = target_steps
    m["draft_generated_tokens"] = drafted
    m["draft_accepted_tokens"] = accepted_total
    m["loop_times"] = iters
    m["avg_draft_len"] = drafted / iters if iters else 0.0
    # retrieval hit stats (reference REST reports datastore effectiveness)
    m["rest_lookups"] = iters
    m["rest_hits"] = hits
    m["rest_hit_rate"] = hits / iters if iters else 0.0
    m["computation_time"] = compute
    m["wall_time"] = compute
    return out, finalize_throughput(m)


@functools.partial(
    jax.jit,
    static_argnames=("cfg",),
    donate_argnames=("cache",),
)
def tree_forward_step(
    target_params,
    window_tokens: jax.Array,  # [1, W] committed tail + tree nodes (padded)
    offsets: jax.Array,  # [W] rope offsets (tail: 0..; tree: tail_len+depth)
    window_mask: jax.Array,  # [W, W] visibility (tail causal; tree ancestors)
    cache: KVCache,
    *,
    cfg: ModelConfig,
):
    """One tree-attention forward; returns greedy argmax per window row,
    the final-layer hidden states (consumed by Medusa heads), and the cache
    advanced over the whole window (the caller rolls back to the valid
    contiguous tail)."""
    logits, cache, hidden = forward(
        target_params,
        cfg,
        window_tokens,
        cache,
        return_hidden=True,
        position_offsets=offsets,
        window_mask=window_mask,
    )
    return jnp.argmax(logits[0], axis=-1).astype(jnp.int32), hidden[0], cache


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sampling", "typical"),
    donate_argnames=("cache",),
)
def tree_sample_step(
    target_params,
    window_tokens: jax.Array,  # [1, W]
    offsets: jax.Array,  # [W]
    window_mask: jax.Array,  # [W, W]
    parent_rows: jax.Array,  # [N] window row of each tree node's parent
    node_tokens: jax.Array,  # [N] tree node tokens
    key: jax.Array,
    cache: KVCache,
    *,
    cfg: ModelConfig,
    sampling: SamplingConfig,
    typical: tuple[float, float],
):
    """Sampled (temperature > 0) tree verification step: typical
    acceptance (reference src/model/medusa/utils.py:274-320). Returns
    per-row SAMPLED tokens (bonus source), per-node accept flags
    (p_parent(token) > min(eps, alpha*exp(-H(p_parent)))), hidden states,
    and the advanced cache."""
    from duodecoding_tpu.engine.loops import entropy

    logits, cache, hidden = forward(
        target_params,
        cfg,
        window_tokens,
        cache,
        return_hidden=True,
        position_offsets=offsets,
        window_mask=window_mask,
    )
    p = norm_logits(
        logits[0], sampling.temperature, sampling.top_k, sampling.top_p
    )  # [W, V]
    eps, alpha = typical
    thr = jnp.minimum(eps, alpha * jnp.exp(-entropy(p)))  # [W]
    p_parent = jnp.take(p, parent_rows, axis=0)  # [N, V]
    p_cand = jnp.take_along_axis(p_parent, node_tokens[:, None], axis=-1)[:, 0]
    flags = p_cand > jnp.take(thr, parent_rows)
    sampled = sample(key, p)[:, 0].astype(jnp.int32)  # [W]
    return sampled, flags, hidden[0], cache


@register_mode("rest_tree")
def rest_tree(
    engine,
    prefix,
    datastore=None,
    max_suffix: int = 16,
    top_n: int = 4,
    max_tree_nodes: int = 16,
    use_early_stopping=False,
    **kw,
):
    """REST with tree attention: the top-N retrieved continuations merge
    into a prefix tree verified in ONE target forward (the reference
    zoo's Medusa-style tree decoding, src/model/medusa/utils.py:233;
    src/model/rest DraftRetriever tree buffers). Greedy acceptance walks
    the tree along the target's own argmax chain — token-identical to
    greedy AR output."""
    from duodecoding_tpu.engine.engine import Stopwatch, block
    from duodecoding_tpu.native import DraftReader
    from duodecoding_tpu.ops.tree import (
        best_accept_path, best_greedy_path, build_draft_tree,
    )

    cfg = engine.config
    target = engine.target
    if isinstance(datastore, str):
        datastore = DraftReader(datastore)
    if datastore is None:
        raise ValueError("rest_tree requires a datastore")
    # temp 0: greedy walk (token-identical to AR); temp > 0: typical
    # acceptance (tree_sample_step) with a device-sampled bonus
    greedy = engine.sampling.greedy
    typical = (
        float(kw.get("posterior_threshold", 0.09)),
        float(kw.get("posterior_alpha", 0.3)),
    )

    tokens, L = engine.token_buffer(prefix)
    eos = cfg.eos_ids if use_early_stopping else ()
    gamma = cfg.gamma
    W_tail = gamma + 2  # max uncached committed tail
    W = W_tail + max_tree_nodes
    cache = engine.new_cache(target)

    with Stopwatch() as sw:
        cache = prefill(target.params, target.cfg, cache, tokens[:, :L])

    host_tokens = [int(t) for t in np.asarray(tokens[0, :L])]
    n_now = L
    limit = L + cfg.max_tokens
    iters = drafted = accepted_total = hits = 0
    compute = sw.elapsed
    done = False
    cached = L - 1  # contiguous valid cache length
    while n_now < limit and not done:
        t0 = time.perf_counter()
        conts, freqs, match_len = datastore.search(
            np.asarray(host_tokens[-max_suffix:], np.int32),
            max_suffix=max_suffix,
            draft_len=gamma,
            top_n=top_n,
        )
        hits += 1 if conts else 0
        tree = build_draft_tree(conts or [], max_tree_nodes)

        # window: uncached committed tail (causal) + tree nodes
        tail = host_tokens[cached:n_now]
        tl = len(tail)
        win_tokens = np.zeros((1, W), np.int32)
        win_tokens[0, :tl] = tail
        win_tokens[0, W_tail : W_tail + max_tree_nodes] = tree.tokens
        offsets = np.zeros((W,), np.int32)
        offsets[:tl] = np.arange(tl)
        offsets[W_tail:] = tl + tree.depths
        mask = np.zeros((W, W), bool)
        mask[:tl, :tl] = np.tril(np.ones((tl, tl), bool))
        mask[W_tail:, W_tail:] = tree.mask
        mask[W_tail:, :tl] = True  # tree sees the whole committed tail

        if greedy:
            argmaxes, _hidden, cache = tree_forward_step(
                target.params,
                jnp.asarray(win_tokens),
                jnp.asarray(offsets),
                jnp.asarray(mask),
                cache,
                cfg=target.cfg,
            )
            am = np.asarray(argmaxes)
            root_pred = int(am[tl - 1])  # prediction after the last token
            chain, bonus = best_greedy_path(
                tree, am[W_tail : W_tail + max_tree_nodes], root_pred
            )
        else:
            parent_rows = np.where(
                tree.parent >= 0, W_tail + tree.parent, tl - 1
            ).astype(np.int32)
            sampled, flags, _hidden, cache = tree_sample_step(
                target.params,
                jnp.asarray(win_tokens),
                jnp.asarray(offsets),
                jnp.asarray(mask),
                jnp.asarray(parent_rows),
                jnp.asarray(tree.tokens),
                engine.next_key(),
                cache,
                cfg=target.cfg,
                sampling=engine.sampling,
                typical=typical,
            )
            sm = np.asarray(sampled)
            chain = best_accept_path(tree, np.asarray(flags))
        budget = limit - n_now
        chain = chain[: max(budget - 1, 0)]
        new_toks = [int(tree.tokens[i]) for i in chain]
        # recompute bonus if the chain was budget-truncated
        if greedy:
            bonus = int(am[W_tail + chain[-1]]) if chain else root_pred
        else:
            bonus = int(sm[W_tail + chain[-1]]) if chain else int(sm[tl - 1])
        new_toks.append(bonus)

        for j, t in enumerate(new_toks):
            tokens = tokens.at[0, n_now + j].set(t)
        host_tokens.extend(new_toks)
        drafted += tree.n_nodes
        accepted_total += len(chain)
        n_now += len(new_toks)
        # cache keeps only the contiguous committed tail rows
        cached = cached + tl
        cache = rollback(cache, cached)
        if eos and any(t in eos for t in new_toks):
            done = True
        iters += 1
        compute += time.perf_counter() - t0

    block(tokens)
    out = np.asarray(tokens[:, :n_now])
    m = get_empty_metrics()
    m["generated_tokens"] = n_now - L
    m["target_forward_times"] = iters
    m["draft_accepted_tokens"] = accepted_total
    m["draft_generated_tokens"] = max(drafted, accepted_total)
    m["loop_times"] = iters
    m["rest_lookups"] = iters
    m["rest_hits"] = hits
    m["rest_hit_rate"] = hits / iters if iters else 0.0
    m["computation_time"] = compute
    m["wall_time"] = compute
    return out, finalize_throughput(m)
