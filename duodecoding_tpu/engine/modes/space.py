"""`space` — semi-autoregressive propose + auto-verify decoding.

TPU-native counterpart of the reference's vendored SPACE baseline
(reference: src/model/space/modeling_llama_space.py — SAR-SFT llama whose
appended [MASK] tokens predict several future tokens in parallel, and
whose single forward both verifies the previous proposal and produces the
next one). Per iteration ONE causal target forward over the window

    [ committed tail | pending drafts | k mask tokens ]

- draft rows auto-verify against the model's own argmax chain (greedy —
  token-identical to AR output);
- the bonus token comes from the last accepted row (exact AR
  distribution);
- mask rows (placeholders for the still-unknown bonus + successors)
  propose the next k-token draft batch — valid only when every draft was
  accepted (a rejection invalidates what the masks conditioned on, and
  the next iteration degrades to propose-only, which still commits the
  AR bonus token).

Mask-token embeddings come from adaptive/space.py self-distillation.
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.loops import prefill
from duodecoding_tpu.engine.metrics import finalize_throughput, get_empty_metrics
from duodecoding_tpu.engine.registry import register_mode
from duodecoding_tpu.models.config import ModelConfig
from duodecoding_tpu.models.transformer import KVCache, forward, rollback
from duodecoding_tpu.ops.sampling import norm_logits


@functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnames=("cache",)
)
def space_step(params, cfg: ModelConfig, win_tokens: jax.Array, cache: KVCache):
    """One causal window forward; returns per-row argmax and the advanced
    cache (caller rolls back to the committed contiguous length)."""
    logits, cache = forward(params, cfg, win_tokens, cache)
    return jnp.argmax(logits[0], axis=-1).astype(jnp.int32), cache


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sampling", "typical"),
    donate_argnames=("cache",),
)
def space_sample_step(
    params, cfg: ModelConfig, win_tokens: jax.Array, cache: KVCache,
    key: jax.Array, *, sampling, typical: tuple[float, float],
):
    """Sampled (temp > 0) variant: per-row typical-acceptance thresholds
    (reference src/model/medusa/utils.py:274-320) against the NEXT row's
    token in the causal window, plus per-row sampled tokens for the bonus.
    Returns (sampled [W], accept_next [W] — row r's threshold test for
    win_tokens[r+1], cache)."""
    from duodecoding_tpu.engine.loops import entropy
    from duodecoding_tpu.ops.sampling import sample

    logits, cache = forward(params, cfg, win_tokens, cache)
    p = norm_logits(
        logits[0], sampling.temperature, sampling.top_k, sampling.top_p
    )  # [W, V]
    eps, alpha = typical
    thr = jnp.minimum(eps, alpha * jnp.exp(-entropy(p)))  # [W]
    nxt = jnp.concatenate([win_tokens[0, 1:], win_tokens[0, :1]])  # [W]
    p_next = jnp.take_along_axis(p, nxt[:, None], axis=-1)[:, 0]
    accept_next = p_next > thr
    sampled = sample(key, p)[:, 0].astype(jnp.int32)
    return sampled, accept_next, cache


@register_mode("space")
def space(
    engine,
    prefix,
    space_mask_emb=None,
    num_masks: int = 4,
    use_early_stopping=False,
    **kw,
):
    from duodecoding_tpu.adaptive.space import (
        apply_mask_embeddings, space_mask_ids,
    )
    from duodecoding_tpu.engine.engine import Stopwatch, block

    cfg = engine.config
    target = engine.target
    # temp 0: greedy auto-verify (token-identical to AR); temp > 0:
    # typical acceptance along the draft chain with a sampled bonus
    greedy = engine.sampling.greedy
    typical = (
        float(kw.get("posterior_threshold", 0.09)),
        float(kw.get("posterior_alpha", 0.3)),
    )
    if space_mask_emb is None:
        raise ValueError(
            "space requires trained mask embeddings "
            "(adaptive.space.train_space_masks)"
        )
    k = int(space_mask_emb.shape[0]) if num_masks is None else num_masks
    k = min(k, space_mask_emb.shape[0])
    mask_ids = space_mask_ids(target.cfg, space_mask_emb.shape[0])[:k]
    params = apply_mask_embeddings(target.params, space_mask_emb, mask_ids)

    tokens, L = engine.token_buffer(prefix)
    eos = cfg.eos_ids if use_early_stopping else ()
    W_tail = k + 2  # max committed per iteration (k drafts + bonus), +1
    W = W_tail + k + k  # tail + drafts + masks
    cache = engine.new_cache(target)
    with Stopwatch() as sw:
        cache = prefill(params, target.cfg, cache, tokens[:, :L])

    host_tokens = [int(t) for t in np.asarray(tokens[0, :L])]
    n_now = L
    limit = L + cfg.max_tokens
    cached = L - 1
    iters = drafted = accepted_total = 0
    compute = sw.elapsed
    done = False
    drafts: list[int] = []

    while n_now < limit and not done:
        t0 = time.perf_counter()
        tail = host_tokens[cached:n_now]
        tl = len(tail)
        nd = len(drafts)
        win = np.zeros((1, W), np.int32)
        win[0, :tl] = tail
        win[0, tl : tl + nd] = drafts
        win[0, tl + nd : tl + nd + k] = mask_ids

        if greedy:
            am, cache = space_step(params, target.cfg, jnp.asarray(win), cache)
            am = np.asarray(am)

            # auto-verify the pending drafts along the model's argmax chain
            pred = int(am[tl - 1])
            a = 0
            while a < nd and drafts[a] == pred:
                pred = int(am[tl + a])
                a += 1
            bonus = pred
        else:
            sampled, acc_next, cache = space_sample_step(
                params, target.cfg, jnp.asarray(win), cache,
                engine.next_key(), sampling=engine.sampling, typical=typical,
            )
            sm = np.asarray(sampled)
            an = np.asarray(acc_next)
            # accept draft a while row tl-1+a accepts its next-row token
            a = 0
            while a < nd and bool(an[tl - 1 + a]):
                a += 1
            bonus = int(sm[tl - 1 + a])
            am = None
        budget = limit - n_now
        new_toks = (drafts[:a] + [bonus])[:budget]

        # mask proposals are conditioned on ALL drafts: valid only when
        # every draft was accepted
        if a == nd:
            src_row = am if greedy else sm
            drafts = [int(src_row[tl + nd + j]) for j in range(k)]
        else:
            drafts = []

        for j, t in enumerate(new_toks):
            tokens = tokens.at[0, n_now + j].set(t)
        host_tokens.extend(new_toks)
        drafted += nd
        accepted_total += min(a, len(new_toks))
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
