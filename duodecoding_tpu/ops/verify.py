"""Pure-jnp speculative-decoding verification math.

Re-designs the reference's verification pipeline (reference:
src/decoding_ops.py:50-442) as static-shape, jit-able functions:

- probability "windows" instead of O(L*V) prob-history buffers: a draft
  window is the gamma rows q(. | x_<t) produced while drafting, a target
  window is the gamma+1 rows p(. | x_<t) produced by the single verify
  forward (positions prefix_len-1 .. prefix_len+gamma-1). These windows are
  exactly the slices the reference reads
  (src/decoding_ops.py:90-95), so nothing else is materialised.
- acceptance is the batched rejection rule ``r <= p(x)/q(x)`` with a
  cumulative-product "first reject stops the prefix" reduction (the
  reference's int8 ``cummin``, src/decoding_ops.py:144-150).
- rollback is arithmetic on a ``valid_len`` scalar (build_rollback_plan,
  src/decoding_ops.py:168-175) — the KV cache itself is fixed-shape and is
  never cropped.

``actual_gamma`` masking replaces the reference's dynamic array clamping:
positions >= actual_gamma are treated as rejected so the continuous-accept
prefix can never extend past the clamp.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from duodecoding_tpu.ops.sampling import max_fn, sample


class AcceptanceResult(NamedTuple):
    """Outcome of batched rejection sampling over a draft window."""

    accepted_count: jax.Array  # [B] int32 — length of continuous accepted prefix
    n: jax.Array  # [B] int32 — last verified position: prefix_len + accepted - 1
    accept_mask: jax.Array  # [B, G] bool — raw per-position accepts (pre-cummin)
    selected_draft_p: jax.Array  # [B, G] q(x_t)
    selected_target_p: jax.Array  # [B, G] p(x_t)


class RollbackPlan(NamedTuple):
    """Where each tier's cache ``valid_len`` is reset after verification."""

    draft_end_pos: jax.Array  # n + 1
    target_end_pos: jax.Array  # n + 2 if all accepted else n + 1
    all_accepted: jax.Array  # bool


def gather_token_probs(prob_rows: jax.Array, tokens: jax.Array) -> jax.Array:
    """prob_rows: [B, G, V], tokens: [B, G] -> [B, G] probs of those tokens."""
    return jnp.take_along_axis(prob_rows, tokens[..., None], axis=-1)[..., 0]


def compute_acceptance(
    draft_window: jax.Array,  # [B, G, V] q rows for positions prefix..prefix+G-1
    target_window: jax.Array,  # [B, >=G, V] p rows, same positions first
    draft_tokens: jax.Array,  # [B, G]
    r: jax.Array,  # [B, G] uniforms
    prefix_len: jax.Array,  # scalar int32
    actual_gamma: jax.Array | int | None = None,  # scalar; None -> full G
) -> AcceptanceResult:
    """Vectorized ``r <= p/q`` acceptance with first-reject cutoff.

    Mirrors reference compute_acceptance_result (src/decoding_ops.py:109-158)
    with masking instead of slicing: the continuous accepted prefix is
    ``sum(cumprod(accept & pos < actual_gamma))``.
    """
    gamma = draft_tokens.shape[1]
    q = gather_token_probs(draft_window, draft_tokens)
    p = gather_token_probs(target_window[:, :gamma, :], draft_tokens)
    accept = r <= (p / q)
    if actual_gamma is None:
        valid = jnp.ones((gamma,), dtype=bool)
    else:
        valid = jnp.arange(gamma) < actual_gamma
    masked = jnp.logical_and(accept, valid[None, :])
    continuous = jnp.cumprod(masked.astype(jnp.int32), axis=1)
    accepted_count = jnp.sum(continuous, axis=1).astype(jnp.int32)
    n = prefix_len + accepted_count - 1
    return AcceptanceResult(
        accepted_count=accepted_count,
        n=n.astype(jnp.int32),
        accept_mask=accept,
        selected_draft_p=q,
        selected_target_p=p,
    )


def compute_residual_distribution(
    target_probs: jax.Array, draft_probs: jax.Array
) -> jax.Array:
    """``norm(max(p - q, 0))`` (reference src/decoding_ops.py:161-165)."""
    return max_fn(target_probs - draft_probs)


def build_rollback_plan(
    prefix_len: jax.Array, gamma: jax.Array | int, n: jax.Array
) -> RollbackPlan:
    """reference src/decoding_ops.py:168-175: draft keeps n+1 positions;
    target keeps n+2 when every draft token was accepted (the bonus row was
    consumed) else n+1."""
    all_accepted = n >= prefix_len + gamma - 1
    return RollbackPlan(
        draft_end_pos=(n + 1).astype(jnp.int32)
        if hasattr(n, "astype")
        else jnp.int32(n + 1),
        target_end_pos=jnp.where(all_accepted, n + 2, n + 1).astype(jnp.int32),
        all_accepted=all_accepted,
    )


class VerifyOutcome(NamedTuple):
    accepted_count: jax.Array  # [B]
    n: jax.Array  # [B]
    next_token: jax.Array  # [B, 1]
    all_accepted: jax.Array  # [B] bool
    rollback: RollbackPlan
    accept_mask: jax.Array  # [B, G]


def verify_and_sample(
    key: jax.Array,
    draft_window: jax.Array,  # [B, G, V]
    target_window: jax.Array,  # [B, G+1, V] — last row is the bonus position
    draft_tokens: jax.Array,  # [B, G]
    r: jax.Array,  # [B, G]
    prefix_len: jax.Array,
    actual_gamma: jax.Array | int | None = None,
) -> VerifyOutcome:
    """One fused verification step: accept, pick the next token, plan rollback.

    Equivalent to the reference's resolve_stage_verification
    (src/decoding_ops.py:353-397): on full acceptance the next token is
    sampled from the target's bonus row; on rejection it is sampled from the
    residual ``max(p - q, 0)`` at the first rejected position.
    """
    gamma = draft_tokens.shape[1]
    acc = compute_acceptance(
        draft_window, target_window, draft_tokens, r, prefix_len, actual_gamma
    )
    eff_gamma = gamma if actual_gamma is None else actual_gamma
    all_accepted = acc.accepted_count >= eff_gamma

    # offset of the decision row: first rejected position, clamped for the
    # all-accept case where the bonus row (index gamma) is used instead.
    off = acc.accepted_count  # [B], in [0, gamma]
    tgt_row = jnp.take_along_axis(
        target_window, off[:, None, None], axis=1
    )[:, 0, :]
    drf_off = jnp.minimum(off, gamma - 1)
    drf_row = jnp.take_along_axis(
        draft_window, drf_off[:, None, None], axis=1
    )[:, 0, :]
    residual = compute_residual_distribution(tgt_row, drf_row)
    final_dist = jnp.where(all_accepted[:, None], tgt_row, residual)
    next_token = sample(key, final_dist)

    plan = build_rollback_plan(prefix_len, eff_gamma, acc.n)
    return VerifyOutcome(
        accepted_count=acc.accepted_count,
        n=acc.n,
        next_token=next_token,
        all_accepted=all_accepted,
        rollback=plan,
        accept_mask=acc.accept_mask,
    )
