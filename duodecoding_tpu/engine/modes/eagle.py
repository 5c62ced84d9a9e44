"""`eagle` / `eagle2` — feature-level drafting modes.

TPU-native counterpart of the reference's vendored EAGLE baselines
(reference: src/model/eagle/ea_model.py:154 ``eagenerate`` loop,
src/model/eagle/cnets.py:454 draft network, src/model/eagle2/cnets.py:660
dynamic beam tree). Per iteration:

1. ONE tree-attention target forward verifies the current candidate tree
   (greedy walk along the target's own argmax chain — token-identical to
   greedy AR output) and exposes hidden states at the accepted positions;
2. ONE jitted eagle program (adaptive/eagle.py ``eagle_draft_step``)
   catches the feature cache up over the committed (hidden, token) pairs
   and beam-expands the next candidate tree;
3. host-side selection turns the beam arrays into a prefix tree —
   static per-level widths for `eagle` (the fixed-tree analog of
   mc_sim_7b_63) or global cumulative-score top-N for `eagle2`.

The draft network comes pre-trained via ``adaptive.eagle.train_eagle``
(self-distillation on the target's own rollouts).
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from duodecoding_tpu.adaptive.eagle import eagle_draft_step, init_eagle_cache
from duodecoding_tpu.engine.loops import prefill_chunk_sizes
from duodecoding_tpu.engine.metrics import finalize_throughput, get_empty_metrics
from duodecoding_tpu.engine.modes.rest import tree_forward_step
from duodecoding_tpu.engine.registry import register_mode
from duodecoding_tpu.models.transformer import forward, rollback
from duodecoding_tpu.ops.tree import best_greedy_path, tree_from_parents


@functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnames=("cache",)
)
def _prefill_hidden_step(params, cfg, cache, tokens):
    _, cache, hid = forward(params, cfg, tokens, cache, return_hidden=True)
    return cache, hid


def prefill_with_hidden(params, cfg, cache, prompt: jax.Array):
    """Chunked prefill over ``prompt[:, :-1]`` (lag-1 invariant, like
    engine/loops.py ``prefill``) that also returns the final-layer hidden
    states h_0..h_{L-2} needed to seed the eagle feature cache."""
    n = prompt.shape[1] - 1
    off = 0
    hiddens = []
    for c in prefill_chunk_sizes(n, cap=cache.max_len):
        chunk = prompt[:, off : off + c]
        if chunk.shape[1] < c:  # padded tail (see loops.prefill)
            chunk = jnp.pad(chunk, ((0, 0), (0, c - chunk.shape[1])))
        cache, hid = _prefill_hidden_step(params, cfg, cache, chunk)
        real = min(c, n - off)
        hiddens.append(np.asarray(hid[0][:real], np.float32))
        off += c
    from duodecoding_tpu.models.transformer import set_cache_length

    cache = set_cache_length(cache, jnp.int32(n))
    return cache, np.concatenate(hiddens, axis=0) if hiddens else np.zeros(
        (0, cfg.hidden_size), np.float32
    )


def _head_matrix(target):
    p = target.params
    if target.cfg.tie_word_embeddings:
        return p["embed"].T
    head = p["lm_head"]
    if isinstance(head, dict):  # INT4 target: eagle scoring needs a dense
        from duodecoding_tpu.models.quant import dequantize_int4

        head = dequantize_int4(head, p["embed"].dtype)
        if head.shape[-1] > target.cfg.vocab_size:  # tile-padded columns
            head = head[:, : target.cfg.vocab_size]
    return head


def _eagle_core(
    engine,
    prefix,
    eagle_params,
    select_fn,
    *,
    depth: int,
    top_k: int,
    max_tree_nodes: int,
    use_early_stopping: bool,
    mode_name: str,
):
    from duodecoding_tpu.engine.engine import Stopwatch, block

    if eagle_params is None:
        raise ValueError(
            f"{mode_name} requires a trained draft network (eagle_params); "
            "train one with adaptive.eagle.train_eagle"
        )
    cfg = engine.config
    target = engine.target
    # temp 0: greedy walk (token-identical to AR); temp > 0: typical
    # acceptance (reference src/model/medusa/utils.py:274-320) with a
    # device-sampled bonus token
    greedy = engine.sampling.greedy
    typical = (0.09, 0.3)

    tokens, L = engine.token_buffer(prefix)
    eos = cfg.eos_ids if use_early_stopping else ()
    Wc = depth + 2  # max pairs committed per iteration (chain + bonus)
    W_tail = Wc + 1
    W = W_tail + max_tree_nodes
    S = cfg.max_seq_len
    num_layers = eagle_params["layers"]["wq"].shape[0]
    if L + cfg.max_tokens + depth * top_k + Wc > S:
        raise ValueError(
            "max_seq_len too small for eagle beam scratch: need >= "
            f"{L + cfg.max_tokens + depth * top_k + Wc}, have {S}"
        )
    d = target.cfg.hidden_size
    embed = target.params["embed"]
    head = _head_matrix(target)

    cache = engine.new_cache(target)
    with Stopwatch() as sw:
        cache, prompt_hid = prefill_with_hidden(
            target.params, target.cfg, cache, tokens[:, :L]
        )
    compute = sw.elapsed

    e_cache = init_eagle_cache(
        target.cfg, 1, S, num_layers=num_layers,
        dtype=eagle_params["fc_w"].dtype,
    )
    host_tokens = [int(t) for t in np.asarray(tokens[0, :L])]

    t0 = time.perf_counter()
    # seed the eagle cache: pairs (h_t, token_{t+1}), t = 0..L-2.
    # All but the last <=Wc pairs go through plain catch-up draft calls with
    # a full window; the final call also produces the first candidate tree.
    M = L - 1
    r = ((M - 1) % Wc) + 1 if M > 0 else 0
    pos = 0
    draft_out = None
    if M < 1:
        raise ValueError("eagle modes need a prompt of at least 2 tokens")
    while pos < M:
        take = Wc if M - pos > r else r
        pt = np.zeros((1, Wc), np.int32)
        ph = np.zeros((1, Wc, d), np.float32)
        pt[0, :take] = host_tokens[pos + 1 : pos + 1 + take]
        ph[0, :take] = prompt_hid[pos : pos + take]
        draft_out = eagle_draft_step(
            eagle_params,
            embed,
            head,
            target.cfg,
            e_cache,
            jnp.asarray(pt),
            jnp.asarray(ph, eagle_params["fc_w"].dtype),
            jnp.int32(take),
            depth=depth,
            top_k=top_k,
        )
        e_cache = draft_out.cache
        pos += take
    compute += time.perf_counter() - t0

    n_now = L
    limit = L + cfg.max_tokens
    cached = L - 1
    iters = drafted = accepted_total = 0
    done = False

    while n_now < limit and not done:
        t0 = time.perf_counter()
        sel_tokens, sel_parents = select_fn(draft_out)
        tree = tree_from_parents(sel_tokens, sel_parents, max_tree_nodes)

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
        mask[W_tail:, :tl] = True

        if greedy:
            argmaxes, hidden, cache = tree_forward_step(
                target.params,
                jnp.asarray(win_tokens),
                jnp.asarray(offsets),
                jnp.asarray(mask),
                cache,
                cfg=target.cfg,
            )
            am = np.asarray(argmaxes)
            hid = np.asarray(hidden, np.float32)
            root_pred = int(am[tl - 1])
            chain, bonus = best_greedy_path(
                tree, am[W_tail : W_tail + max_tree_nodes], root_pred
            )
        else:
            from duodecoding_tpu.engine.modes.rest import tree_sample_step
            from duodecoding_tpu.ops.tree import best_accept_path

            parent_rows = np.where(
                tree.parent >= 0, W_tail + tree.parent, tl - 1
            ).astype(np.int32)
            sampled, flags, hidden, cache = tree_sample_step(
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
            hid = np.asarray(hidden, np.float32)
            chain = best_accept_path(tree, np.asarray(flags))
        budget = limit - n_now
        chain = chain[: max(budget - 1, 0)]
        new_toks = [int(tree.tokens[i]) for i in chain]
        if greedy:
            bonus = int(am[W_tail + chain[-1]]) if chain else root_pred
        else:
            bonus = int(sm[W_tail + chain[-1]]) if chain else int(sm[tl - 1])
        new_toks.append(bonus)

        # eagle catch-up pairs: (h_{t-1}, token_t) for each committed t.
        # h_{n_now-1} = last tail row; deeper hiddens = accepted node rows.
        valid = len(new_toks)
        pt = np.zeros((1, Wc), np.int32)
        ph = np.zeros((1, Wc, d), np.float32)
        pt[0, :valid] = new_toks
        ph[0, 0] = hid[tl - 1]
        for j, c in enumerate(chain):
            ph[0, j + 1] = hid[W_tail + c]
        draft_out = eagle_draft_step(
            eagle_params,
            embed,
            head,
            target.cfg,
            e_cache,
            jnp.asarray(pt),
            jnp.asarray(ph, eagle_params["fc_w"].dtype),
            jnp.int32(valid),
            depth=depth,
            top_k=top_k,
        )
        e_cache = draft_out.cache

        for j, t in enumerate(new_toks):
            tokens = tokens.at[0, n_now + j].set(t)
        host_tokens.extend(new_toks)
        drafted += tree.n_nodes
        accepted_total += len(chain)
        n_now += len(new_toks)
        cached += tl
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
    m["draft_generated_tokens"] = drafted
    m["draft_accepted_tokens"] = accepted_total
    m["loop_times"] = iters
    m["avg_draft_len"] = drafted / iters if iters else 0.0
    m["computation_time"] = compute
    m["wall_time"] = compute
    return out, finalize_throughput(m)


@register_mode("eagle")
def eagle(
    engine,
    prefix,
    eagle_params=None,
    depth: int = 4,
    top_k: int = 8,
    widths=(4, 4, 2, 2, 1),
    max_tree_nodes: int = 16,
    use_early_stopping=False,
    **kw,
):
    """EAGLE-1: feature-level drafting with a static tree shape
    (reference src/model/eagle/cnets.py:498 fixed ``mc_sim_7b_63``;
    here per-level widths over the beam arrays)."""
    from duodecoding_tpu.adaptive.eagle import select_tree_static

    return _eagle_core(
        engine,
        prefix,
        eagle_params,
        lambda out: select_tree_static(out, tuple(widths)),
        depth=depth,
        top_k=top_k,
        max_tree_nodes=max_tree_nodes,
        use_early_stopping=use_early_stopping,
        mode_name="eagle",
    )


@register_mode("eagle2")
def eagle2(
    engine,
    prefix,
    eagle_params=None,
    depth: int = 4,
    top_k: int = 8,
    total_tokens: int = 24,
    max_tree_nodes: int = 32,
    use_early_stopping=False,
    **kw,
):
    """EAGLE-2: dynamic tree — global top-``total_tokens`` candidates by
    cumulative logprob (reference src/model/eagle2/cnets.py:755-760)."""
    from duodecoding_tpu.adaptive.eagle import select_tree_dynamic

    return _eagle_core(
        engine,
        prefix,
        eagle_params,
        lambda out: select_tree_dynamic(out, total_tokens),
        depth=depth,
        top_k=top_k,
        max_tree_nodes=max_tree_nodes,
        use_early_stopping=use_early_stopping,
        mode_name="eagle2",
    )
