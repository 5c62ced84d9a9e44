"""`medusa` — multi-head tree-attention drafting mode.

Reference: the vendored Medusa baseline (src/model/medusa/medusa_model.py,
utils.py tree machinery). Per iteration:

1. one tree-attention target forward verifies the current candidate tree
   (greedy walk along the target's own argmax chain — token-identical to
   greedy AR output) and yields the hidden state at the last accepted
   position;
2. the Medusa heads (adaptive/medusa.py) propose the next candidate tree
   from that hidden state (per-head top-k cartesian product, deduplicated
   into a prefix tree).

Heads come pre-trained via ``train_medusa_heads`` (self-distillation on the
target's own rollouts); with no heads supplied the mode degenerates to AR.
"""

from __future__ import annotations

import time

import numpy as np

import jax.numpy as jnp

from duodecoding_tpu.engine.loops import prefill
from duodecoding_tpu.engine.metrics import finalize_throughput, get_empty_metrics
from duodecoding_tpu.engine.modes.rest import tree_forward_step, tree_sample_step
from duodecoding_tpu.engine.registry import register_mode
from duodecoding_tpu.models.transformer import rollback
from duodecoding_tpu.ops.tree import (
    best_accept_path, best_greedy_path, build_draft_tree,
)


def head_tree_mode_core(
    engine,
    prefix,
    propose_fn,
    *,
    tail_span: int,
    max_tree_nodes: int,
    use_early_stopping: bool,
    mode_name: str,
):
    """Shared loop for hidden-state-head drafting modes (medusa, hydra):
    per iteration, ONE tree-attention target forward verifies the current
    candidate tree (greedy walk — token-identical to greedy AR), then
    ``propose_fn(h_last, bonus_token) -> candidate paths`` builds the next
    tree from the hidden state at the decision position."""
    from duodecoding_tpu.engine.engine import Stopwatch, block

    cfg = engine.config
    target = engine.target
    # temp 0: greedy walk (token-identical to AR); temp > 0: typical
    # acceptance (reference src/model/medusa/utils.py:274-320) with a
    # device-sampled bonus token
    greedy = engine.sampling.greedy
    typical = (0.09, 0.3)

    tokens, L = engine.token_buffer(prefix)
    eos = cfg.eos_ids if use_early_stopping else ()
    W_tail = tail_span + 2
    W = W_tail + max_tree_nodes
    cache = engine.new_cache(target)
    with Stopwatch() as sw:
        cache = prefill(target.params, target.cfg, cache, tokens[:, :L])

    host_tokens = [int(t) for t in np.asarray(tokens[0, :L])]
    n_now = L
    limit = L + cfg.max_tokens
    cached = L - 1
    iters = drafted = accepted_total = 0
    compute = sw.elapsed
    done = False
    candidates: list[np.ndarray] = []

    while n_now < limit and not done:
        t0 = time.perf_counter()
        tree = build_draft_tree(candidates, max_tree_nodes)
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
            root_pred = int(am[tl - 1])
            chain, bonus = best_greedy_path(
                tree, am[W_tail : W_tail + max_tree_nodes], root_pred
            )
        else:
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
            chain = best_accept_path(tree, np.asarray(flags))
        budget = limit - n_now
        chain = chain[: max(budget - 1, 0)]
        new_toks = [int(tree.tokens[i]) for i in chain]
        if greedy:
            bonus = int(am[W_tail + chain[-1]]) if chain else root_pred
        else:
            bonus = int(sm[W_tail + chain[-1]]) if chain else int(sm[tl - 1])
        new_toks.append(bonus)

        # propose the next tree from the hidden at the decision position
        h_idx = (W_tail + chain[-1]) if chain else (tl - 1)
        candidates = propose_fn(np.asarray(hidden[h_idx]), bonus)

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


@register_mode("medusa")
def medusa(
    engine,
    prefix,
    medusa_heads=None,
    top_per_head=(3, 2, 2),
    max_tree_nodes: int = 16,
    use_early_stopping=False,
    **kw,
):
    from duodecoding_tpu.adaptive.medusa import generate_candidates, medusa_apply

    def propose(h_last: np.ndarray, bonus: int):
        if not medusa_heads:
            return []
        head_logits = np.asarray(medusa_apply(medusa_heads, jnp.asarray(h_last)))
        # head 0 predicts the token AFTER the bonus token
        return generate_candidates(head_logits, list(top_per_head))

    return head_tree_mode_core(
        engine,
        prefix,
        propose,
        tail_span=max(len(medusa_heads) if medusa_heads else 0, 1),
        max_tree_nodes=max_tree_nodes,
        use_early_stopping=use_early_stopping,
        mode_name="medusa",
    )


@register_mode("hydra")
def hydra(
    engine,
    prefix,
    hydra_heads=None,
    widths=(3, 2, 2),
    max_tree_nodes: int = 16,
    use_early_stopping=False,
    **kw,
):
    """Hydra sequentially-grounded heads (reference
    src/model/hydra/hydra_model.py:43, hydra_heads/mlp_head.py:160
    ``_grounded_proposal``): head k conditions on the tokens drafted by
    heads 0..k-1, giving better-calibrated deep candidates than Medusa's
    independent heads. Verification shares the tree-attention path."""
    from duodecoding_tpu.adaptive.hydra import hydra_propose

    if hydra_heads is None:
        raise ValueError(
            "hydra requires trained heads (adaptive.hydra.train_hydra_heads)"
        )
    embed = engine.target.params["embed"]

    def propose(h_last: np.ndarray, bonus: int):
        return hydra_propose(hydra_heads, embed, h_last, bonus, list(widths))

    return head_tree_mode_core(
        engine,
        prefix,
        propose,
        tail_span=max(len(hydra_heads), 1),
        max_tree_nodes=max_tree_nodes,
        use_early_stopping=use_early_stopping,
        mode_name="hydra",
    )
