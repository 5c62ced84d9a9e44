"""Pure-jnp sampling math shared by every decoding mode.

Behavioral contract mirrors the reference framework's sampling utilities
(reference: src/utils.py:650-810) but is written as pure, jit-able JAX
functions with explicit PRNG keys and static configuration:

- ``top_k_top_p_filter``   — top-k / nucleus logit filtering.
- ``norm_logits``          — temperature-0 one-hot argmax, else softmax of the
                             filtered, temperature-scaled logits.
- ``sample``               — NaN/Inf-hardened categorical sampling with an
                             argmax fallback for degenerate rows.
- ``rebuild_topk_uniform_probs`` — top-k compression with uniform residual
                             redistribution over the non-top-k support (the
                             distribution the *receiver* of a top-k-compressed
                             payload can reconstruct).
- ``max_fn``               — normalized positive part ``norm(max(x, 0))`` used
                             for residual (rejection) sampling, with argmax
                             fallback for all-nonpositive rows.

All functions are batch-first and accept ``(..., vocab)`` shaped arrays.
Temperature / top_k / top_p are static Python numbers: decoding modes are
specialised (re-jitted) per sampling configuration, which is the idiomatic
XLA treatment of what the reference handles with Python branches per call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")


def top_k_top_p_filter(logits: jax.Array, top_k: int = 0, top_p: float = 0.0) -> jax.Array:
    """Mask logits outside the top-k set and/or the top-p nucleus with -inf.

    Mirrors reference src/utils.py:650-684: top-k keeps every logit >= the
    k-th largest; top-p keeps the smallest prefix of the descending-sorted
    logits whose cumulative softmax mass exceeds ``top_p`` (always keeping
    the first token).
    """
    if top_k and top_k > 0:
        k = min(int(top_k), logits.shape[-1])
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, _NEG_INF, logits)

    if top_p and top_p > 0.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        over = cum > top_p
        # keep the first token that crosses top_p (shift mask right by one)
        over = jnp.concatenate(
            [jnp.zeros_like(over[..., :1]), over[..., :-1]], axis=-1
        )
        # threshold = smallest kept logit; everything strictly below is dropped
        kept_min = jnp.min(
            jnp.where(over, jnp.inf, sorted_logits), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < kept_min, _NEG_INF, logits)

    return logits


def norm_logits(
    logits: jax.Array, temperature: float, top_k: int = 0, top_p: float = 0.0
) -> jax.Array:
    """Logits -> probability rows.

    temperature == 0 reproduces the reference's greedy semantics
    (src/utils.py:686-710): a float32 one-hot at the argmax. Otherwise
    softmax(top_k_top_p_filter(logits / T)).
    """
    if temperature == 0:
        idx = jnp.argmax(logits, axis=-1)
        return jax.nn.one_hot(idx, logits.shape[-1], dtype=jnp.float32)
    logits = logits.astype(jnp.float32) / float(temperature)
    logits = top_k_top_p_filter(logits, top_k=int(top_k), top_p=float(top_p))
    return jax.nn.softmax(logits, axis=-1)


def _sanitize_probs(probs: jax.Array) -> jax.Array:
    """NaN/Inf -> 0, clamp negatives, argmax-fallback degenerate rows.

    Matches the hardening in reference src/utils.py:727-748: rows whose
    sanitized mass is <= 0 fall back to a one-hot at the argmax of the
    (sanitized) row.
    """
    probs = probs.astype(jnp.float32)
    probs = jnp.nan_to_num(probs, nan=0.0, posinf=0.0, neginf=0.0)
    probs = jnp.maximum(probs, 0.0)
    row_sum = jnp.sum(probs, axis=-1, keepdims=True)
    fallback = jax.nn.one_hot(
        jnp.argmax(probs, axis=-1), probs.shape[-1], dtype=jnp.float32
    )
    probs = jnp.where(row_sum > 0, probs, fallback)
    row_sum = jnp.sum(probs, axis=-1, keepdims=True)
    return probs / row_sum


def sample(key: jax.Array, probs: jax.Array, dtype=jnp.int32) -> jax.Array:
    """Categorical sample per row; hardened like reference ``sample``.

    ``probs``: (..., vocab). Returns (..., 1) token indices (the reference
    returns multinomial's (batch, 1) shape; we keep a trailing singleton for
    drop-in concatenation).
    """
    probs = _sanitize_probs(probs)
    idx = jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-38)), axis=-1)
    return idx[..., None].astype(dtype)


def rebuild_topk_uniform_probs(probs: jax.Array, top_k: int | None) -> jax.Array:
    """Top-k compress a prob row and redistribute the residual mass uniformly.

    Mirrors reference src/utils.py:751-785 (strategy="uniform"): keep the
    top-k probabilities at their indices, spread ``1 - sum(topk)`` uniformly
    over the zeroed (non-top-k) support, renormalize. With
    ``top_k >= vocab`` or ``top_k <= 0`` the input is returned unchanged.

    This is the distribution a receiver reconstructs from a top-k-compressed
    payload, so the *sender* must also sample from it for rejection-sampling
    correctness (used by generate_with_rebuilt_topk-style drafting).
    """
    if top_k is None or top_k <= 0 or top_k >= probs.shape[-1]:
        return probs
    k = int(top_k)
    vocab = probs.shape[-1]
    vals, idxs = jax.lax.top_k(probs, k)
    # scatter exactly k entries per row (ties broken by top_k order, matching
    # the reference's topk+scatter semantics)
    flat_p = probs.reshape(-1, vocab)
    flat_i = idxs.reshape(-1, k)
    flat_v = vals.reshape(-1, k)
    compressed = jax.vmap(lambda i, v: jnp.zeros((vocab,), probs.dtype).at[i].set(v))(
        flat_i, flat_v
    ).reshape(probs.shape)

    top_k_sum = jnp.sum(compressed, axis=-1, keepdims=True)
    residual = jnp.maximum(1.0 - top_k_sum, 0.0)
    zero_mask = compressed == 0
    zero_count = jnp.sum(zero_mask, axis=-1, keepdims=True)
    uniform = jnp.where(zero_count > 0, residual / jnp.maximum(zero_count, 1), 0.0)
    rebuilt = jnp.where(zero_mask, uniform, compressed)
    rebuilt_sum = jnp.maximum(jnp.sum(rebuilt, axis=-1, keepdims=True), 1e-12)
    return rebuilt / rebuilt_sum


def max_fn(x: jax.Array) -> jax.Array:
    """``norm(max(x, 0))`` residual distribution (reference src/utils.py:787-810).

    Rows with no positive mass fall back to one-hot(argmax(x)) — the
    reference's "target barely differs from draft" degenerate case.
    """
    x = jnp.nan_to_num(x.astype(jnp.float32), nan=0.0, posinf=0.0, neginf=0.0)
    x_max = jnp.maximum(x, 0.0)
    s = jnp.sum(x_max, axis=-1, keepdims=True)
    fallback = jax.nn.one_hot(jnp.argmax(x, axis=-1), x.shape[-1], dtype=jnp.float32)
    return jnp.where(s > 0, x_max / jnp.where(s > 0, s, 1.0), fallback)


def rebuild_topk_uniform_probs_dynamic(probs: jax.Array, k: jax.Array) -> jax.Array:
    """``rebuild_topk_uniform_probs`` with a TRACED k (rank-mask instead of
    lax.top_k), so RL-tuned transfer_top_k values don't force recompiles.
    k >= vocab or k <= 0 returns the input unchanged (same contract)."""
    vocab = probs.shape[-1]
    k = jnp.asarray(k, jnp.int32)
    order = jnp.argsort(probs, axis=-1, descending=True)
    rank = jnp.argsort(order, axis=-1)  # rank[i] = descending rank of entry i
    keep = rank < k
    compressed = jnp.where(keep, probs, 0.0)
    top_k_sum = jnp.sum(compressed, axis=-1, keepdims=True)
    residual = jnp.maximum(1.0 - top_k_sum, 0.0)
    zero_mask = compressed == 0
    zero_count = jnp.sum(zero_mask, axis=-1, keepdims=True)
    uniform = jnp.where(zero_count > 0, residual / jnp.maximum(zero_count, 1), 0.0)
    rebuilt = jnp.where(zero_mask, uniform, compressed)
    rebuilt_sum = jnp.maximum(jnp.sum(rebuilt, axis=-1, keepdims=True), 1e-12)
    rebuilt = rebuilt / rebuilt_sum
    passthrough = jnp.logical_or(k <= 0, k >= vocab)
    return jnp.where(passthrough, probs, rebuilt)


def top_k_via_argmax(x: jax.Array, k: int):
    """Exact top-k over the last axis via k argmax+mask rounds.

    XLA lowers ``lax.top_k`` to a full-width sort on TPU — measured at the
    millisecond scale for [lanes, 32000] logits inside the tree-drafting
    loop (engine/tree_loops.py), where it dominated the 3-layer draft's
    own forward cost. For small static k, k max-reductions over the row
    are far cheaper and select the same elements in the same (stable,
    descending, earliest-index-first) order as ``lax.top_k``.

    Returns ``(values [..., k], indices [..., k])``. Falls back to
    ``lax.top_k`` for k > 16 where the sort starts to win back.

    PRECONDITION: every row must have at least k entries above -inf.
    Selected positions are masked with -inf, so a row with fewer finite
    entries repeats index 0 for the exhausted rounds (unlike ``lax.top_k``,
    which always returns k distinct indices). Call sites here feed raw
    logits (all finite); do not feed already-top-k/top-p-filtered rows.
    """
    if k > 16:
        return jax.lax.top_k(x, k)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    vals, idxs = [], []
    xc = x
    for _ in range(k):
        i = jnp.argmax(xc, axis=-1)
        v = jnp.take_along_axis(xc, i[..., None], axis=-1)[..., 0]
        vals.append(v)
        idxs.append(i.astype(jnp.int32))
        xc = jnp.where(cols == i[..., None], _NEG_INF, xc)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)
