"""Per-iteration jitted steps for the adaptive (ARP + RL) decoding modes.

Unlike the static modes (whole generations in one device while_loop), the
adaptive modes round-trip to the host once per iteration: the RL adapter
(a stateful host object with replay buffer and epsilon-greedy exploration,
adaptive/rl.py) picks (transfer_top_k, ARP threshold) from live telemetry,
exactly like the reference (src/baselines.py:2287-2306). Both knobs enter
the jitted step as TRACED scalars (dynamic top-k rebuild + threshold
compare), so the step compiles ONCE — the reference pays a fresh Python
loop per token; here one fused device program runs per iteration.

The ARP early-stop runs inside the drafting while_loop via a stop_fn whose
carry tracks (cumulative accept prob, last accept prob); the reference's
``DecodingAdapter.predict`` host round-trip per draft token
(src/adapter.py:25-66) has no TPU equivalent cost, so arp_overhead_time
is structurally ~0 in this framework.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from duodecoding_tpu.adaptive.arp import acc_prob
from duodecoding_tpu.engine.loops import (
    _sample_from_probs,
    _stops_hit,
    draft_tokens_loop,
    entropy,
)
from duodecoding_tpu.engine.sampling_config import SamplingConfig
from duodecoding_tpu.engine.tri_loops import _decision_row
from duodecoding_tpu.models.config import ModelConfig
from duodecoding_tpu.models.transformer import KVCache, forward, set_cache_length
from duodecoding_tpu.ops.sampling import norm_logits
from duodecoding_tpu.ops.verify import compute_acceptance


def make_tracked_arp_stop_fn(arp_params, threshold: jax.Array):
    """ARP stop_fn with traced threshold; carry [B, 2] = (cum prod, last p)."""

    def stop_fn(hidden, q_row, tok, i, carry):
        p = acc_prob(arp_params, hidden)  # [B]
        prod = carry[:, 0] * p
        rej = 1.0 - prod
        new_carry = jnp.stack([prod, p], axis=1)
        return jnp.any(rej > threshold), new_carry

    return stop_fn


class AdaptiveStepInfo(NamedTuple):
    actual_gamma: jax.Array  # scalar
    accepted: jax.Array  # scalar
    emitted: jax.Array  # scalar
    entropy: jax.Array  # scalar — entropy of the last draft dist
    last_acc_prob: jax.Array  # scalar — ARP head's last P(accept)
    all_accepted: jax.Array  # scalar bool
    done: jax.Array  # [B]


class AdaptiveState(NamedTuple):
    tokens: jax.Array
    n_tokens: jax.Array
    draft_cache: KVCache
    target_cache: KVCache
    key: jax.Array
    done: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=(
        "draft_cfg",
        "target_cfg",
        "gamma",
        "draft_sampling",
        "target_sampling",
        "verify_vocab",
        "eos_ids",
        "use_arp",
    ),
    donate_argnames=("s",),
)
def adaptive_sd_step(
    draft_params,
    target_params,
    arp_params,
    s: AdaptiveState,
    transfer_top_k: jax.Array,  # traced i32 (RL-tuned)
    arp_threshold: jax.Array,  # traced f32 (RL-tuned)
    limit: jax.Array,  # traced i32 token budget
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    gamma: int,
    draft_sampling: SamplingConfig,
    target_sampling: SamplingConfig,
    verify_vocab: int,
    eos_ids: tuple[int, ...] = (),
    use_arp: bool = True,
):
    """One adaptive SD iteration (reference src/baselines.py:2162-2498):
    draft up to gamma with ARP early stop, verify, accept/rollback."""
    B = s.tokens.shape[0]
    p = s.n_tokens
    key, k_r, k_t = jax.random.split(s.key, 3)

    stop_fn = (
        make_tracked_arp_stop_fn(arp_params, arp_threshold) if use_arp else None
    )
    carry0 = jnp.concatenate(
        [jnp.ones((B, 1)), jnp.full((B, 1), 0.5)], axis=1
    )
    gamma_bound = limit - 1 - p

    tokens, draft_cache, q_window, g_act, key, stop_carry, _ = draft_tokens_loop(
        draft_params,
        draft_cfg,
        s.tokens,
        p,
        s.draft_cache,
        key,
        gamma,
        draft_sampling,
        transfer_top_k,
        stop_fn,
        gamma_bound,
        stop_carry_init=carry0,
    )

    ver = jax.lax.dynamic_slice(tokens, (0, p - 1), (B, gamma + 1))
    t_logits, target_cache = forward(target_params, target_cfg, ver, s.target_cache)
    p_window = norm_logits(
        t_logits,
        target_sampling.temperature,
        target_sampling.top_k,
        target_sampling.top_p,
    )

    draft_toks = jax.lax.dynamic_slice(tokens, (0, p), (B, gamma))
    r = jax.random.uniform(k_r, (B, gamma))
    acc = compute_acceptance(
        q_window[:, :, :verify_vocab],
        p_window[:, :, :verify_vocab],
        draft_toks,
        r,
        p,
        g_act,
    )

    final_dist, all_accepted = _decision_row(
        p_window, q_window, acc.accepted_count, g_act, verify_vocab,
        target_cfg.vocab_size,
    )
    if target_sampling.greedy:
        next_tok = jnp.argmax(final_dist, axis=-1)[:, None].astype(jnp.int32)
    else:
        next_tok = _sample_from_probs(k_t, final_dist, target_sampling)

    n = acc.n[0]
    tokens = jax.lax.dynamic_update_slice(tokens, next_tok, (0, n + 1))
    new_n = n + 2
    draft_cache = set_cache_length(draft_cache, jnp.minimum(n + 1, p + g_act - 1 + jnp.where(g_act > 0, 0, 1)).astype(
            jnp.int32
        ))
    target_cache = set_cache_length(target_cache, (n + 1).astype(jnp.int32))

    emitted = new_n - p
    done = s.done | _stops_hit(tokens, p, emitted, eos_ids, gamma + 1)

    last_q = jnp.take_along_axis(
        q_window, jnp.maximum(g_act - 1, 0)[None, None, None], axis=1
    )[:, 0, :]
    info = AdaptiveStepInfo(
        actual_gamma=g_act,
        accepted=acc.accepted_count[0],
        emitted=emitted,
        entropy=entropy(last_q)[0],
        last_acc_prob=stop_carry[0, 1],
        all_accepted=all_accepted[0],
        done=done,
    )
    new_state = AdaptiveState(
        tokens=tokens,
        n_tokens=new_n,
        draft_cache=draft_cache,
        target_cache=target_cache,
        key=key,
        done=done,
    )
    return new_state, info


@functools.partial(
    jax.jit,
    static_argnames=(
        "little_cfg",
        "draft_cfg",
        "target_cfg",
        "gamma1",
        "gamma2",
        "little_sampling",
        "draft_sampling",
        "target_sampling",
        "verify_vocab",
        "eos_ids",
        "use_little_arp",
        "use_draft_arp",
    ),
    donate_argnames=("s",),
)
def adaptive_tri_step(
    little_params,
    draft_params,
    target_params,
    little_arp_params,
    draft_arp_params,
    s,
    transfer_top_k: jax.Array,  # traced i32
    little_threshold: jax.Array,  # traced f32
    draft_threshold: jax.Array,  # traced f32
    gamma1_bound: jax.Array,  # traced i32 (RL-tuned in ceesd_without_arp)
    gamma2_bound: jax.Array,  # traced i32
    *,
    little_cfg,
    draft_cfg,
    target_cfg,
    gamma1: int,
    gamma2: int,
    little_sampling,
    draft_sampling,
    target_sampling,
    verify_vocab: int,
    eos_ids: tuple = (),
    use_little_arp: bool = True,
    use_draft_arp: bool = True,
):
    """One adaptive tridecoding iteration (the flagship cee_sd step,
    reference src/baselines.py:2500-3075): tri_iteration with traced RL
    knobs — dynamic top-k rebuild, per-stage ARP thresholds, per-stage
    gamma bounds. Compiles once for all RL actions."""
    from duodecoding_tpu.engine.tri_loops import tri_iteration

    B = s.tokens.shape[0]
    carry0 = jnp.concatenate([jnp.ones((B, 1)), jnp.full((B, 1), 0.5)], axis=1)
    little_stop = (
        make_tracked_arp_stop_fn(little_arp_params, little_threshold)
        if use_little_arp
        else None
    )
    draft_stop = (
        make_tracked_arp_stop_fn(draft_arp_params, draft_threshold)
        if use_draft_arp
        else None
    )
    new_s = tri_iteration(
        little_params,
        draft_params,
        target_params,
        s,
        little_cfg=little_cfg,
        draft_cfg=draft_cfg,
        target_cfg=target_cfg,
        gamma1=gamma1,
        gamma2=gamma2,
        little_sampling=little_sampling,
        draft_sampling=draft_sampling,
        target_sampling=target_sampling,
        rebuild_top_k=transfer_top_k,
        verify_vocab=verify_vocab,
        eos_ids=eos_ids,
        little_stop_fn=little_stop,
        draft_stop_fn=draft_stop,
        gamma1_bound=gamma1_bound,
        gamma2_bound=gamma2_bound,
        little_stop_carry_init=carry0 if use_little_arp else None,
        draft_stop_carry_init=carry0 if use_draft_arp else None,
    )
    return new_s
