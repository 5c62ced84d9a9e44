"""Acceptance-confidence data collection for ARP head training.

Port of the reference's collect_confidence.py (a forked decoding loop that
records per-draft-token acceptance outcomes): runs full-gamma SD iterations
and records, for every drafted position, the draft model's last hidden
state (the ARP head input, reference src/adapter.py:40) and whether the
token survived continuous acceptance. ``collect_confidence`` drives an
engine over prompts and returns (hiddens [N, H], labels [N]);
``train_arp_for_pair`` fits and registers a head for the directed pair.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.loops import prefill
from duodecoding_tpu.engine.sampling_config import SamplingConfig
from duodecoding_tpu.models.config import ModelConfig
from duodecoding_tpu.models.transformer import KVCache, forward
from duodecoding_tpu.ops.sampling import norm_logits
from duodecoding_tpu.ops.verify import compute_acceptance


@functools.partial(
    jax.jit,
    static_argnames=("draft_cfg", "target_cfg", "gamma", "sampling", "verify_vocab"),
    donate_argnames=("tokens", "d_cache", "t_cache"),
)
def collect_sd_step(
    draft_params,
    target_params,
    tokens: jax.Array,
    n_tokens: jax.Array,
    d_cache: KVCache,
    t_cache: KVCache,
    key: jax.Array,
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    gamma: int,
    sampling: SamplingConfig,
    verify_vocab: int,
):
    """One full-gamma SD iteration that records (hidden, accepted) pairs.

    Returns (tokens, n_tokens, caches, key, hiddens [gamma, H],
    labels [gamma] — continuous-accept flags)."""
    B = tokens.shape[0]
    p = n_tokens
    key, k_r = jax.random.split(key)

    # catch-up + unrolled drafting (full gamma, recording hiddens)
    d_cache = KVCache(d_cache.k, d_cache.v, jnp.minimum(d_cache.length, p - 2))
    catch = jax.lax.dynamic_slice(tokens, (0, p - 2), (B, 2))
    logits, d_cache, hidden = forward(
        draft_params, draft_cfg, catch, d_cache, return_hidden=True
    )
    q_cur = norm_logits(
        logits[:, -1, :], sampling.temperature, sampling.top_k, sampling.top_p
    )
    h_cur = hidden[:, -1, :]

    hiddens = []
    q_rows = []
    for i in range(gamma):
        key, k_s = jax.random.split(key)
        if sampling.greedy:
            tok = jnp.argmax(q_cur, axis=-1)[:, None].astype(jnp.int32)
        else:
            from duodecoding_tpu.ops.sampling import sample

            tok = sample(k_s, q_cur)
        tokens = jax.lax.dynamic_update_slice(tokens, tok, (0, p + i))
        hiddens.append(h_cur[0])
        q_rows.append(q_cur)
        if i < gamma - 1:
            logits, d_cache, hidden = forward(
                draft_params, draft_cfg, tok, d_cache, return_hidden=True
            )
            q_cur = norm_logits(
                logits[:, -1, :], sampling.temperature, sampling.top_k, sampling.top_p
            )
            h_cur = hidden[:, -1, :]

    q_window = jnp.stack(q_rows, axis=1)  # [B, gamma, V]
    ver = jax.lax.dynamic_slice(tokens, (0, p - 1), (B, gamma + 1))
    t_logits, t_cache = forward(target_params, target_cfg, ver, t_cache)
    p_window = norm_logits(
        t_logits, sampling.temperature, sampling.top_k, sampling.top_p
    )
    draft_toks = jax.lax.dynamic_slice(tokens, (0, p), (B, gamma))
    r = jax.random.uniform(k_r, (B, gamma))
    acc = compute_acceptance(
        q_window[:, :, :verify_vocab],
        p_window[:, :, :verify_vocab],
        draft_toks,
        r,
        p,
        gamma,
    )
    continuous = jnp.cumprod(
        jnp.logical_and(
            acc.accept_mask, jnp.ones((B, gamma), bool)
        ).astype(jnp.int32),
        axis=1,
    )[0]

    # commit like sd_iteration (bonus token from the decision row)
    n = acc.n[0]
    all_acc = acc.accepted_count >= gamma
    off = acc.accepted_count
    tgt_row = jnp.take_along_axis(p_window, off[:, None, None], axis=1)[:, 0, :]
    from duodecoding_tpu.ops.sampling import max_fn

    drf_row = jnp.take_along_axis(
        q_window, jnp.minimum(off, gamma - 1)[:, None, None], axis=1
    )[:, 0, :]
    resid = max_fn(tgt_row[:, :verify_vocab] - drf_row[:, :verify_vocab])
    if verify_vocab < target_cfg.vocab_size:
        resid = jnp.concatenate(
            [resid, jnp.zeros((B, target_cfg.vocab_size - verify_vocab))], axis=-1
        )
    final = jnp.where(all_acc[:, None], tgt_row, resid)
    t = jnp.argmax(final, axis=-1)[:, None].astype(jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, t, (0, n + 1))
    new_n = n + 2
    d_cache = KVCache(d_cache.k, d_cache.v, (n + 1).astype(jnp.int32))
    t_cache = KVCache(t_cache.k, t_cache.v, (n + 1).astype(jnp.int32))

    return (
        tokens,
        new_n,
        d_cache,
        t_cache,
        key,
        jnp.stack(hiddens),  # [gamma, H]
        continuous,  # [gamma] 1 while accepted
    )


def collect_confidence(
    engine, prompts: np.ndarray, max_new_tokens: int | None = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Run SD over prompts, returning (hiddens [N, H], labels [N])."""
    cfg = engine.config
    draft, target = engine.draft, engine.target
    max_new = max_new_tokens or cfg.max_tokens
    all_h, all_y = [], []
    for prompt in prompts:
        tokens, L = engine.token_buffer(np.asarray(prompt)[None, :])
        d_cache = engine.new_cache(draft)
        t_cache = engine.new_cache(target)
        d_cache = prefill(draft.params, draft.cfg, d_cache, tokens[:, :L])
        t_cache = prefill(target.params, target.cfg, t_cache, tokens[:, :L])
        key = engine.next_key()
        n = L
        limit = L + max_new
        while n < limit - cfg.gamma - 1:
            tokens, n_dev, d_cache, t_cache, key, h, y = collect_sd_step(
                draft.params,
                target.params,
                tokens,
                jnp.int32(n),
                d_cache,
                t_cache,
                key,
                draft_cfg=draft.cfg,
                target_cfg=target.cfg,
                gamma=cfg.gamma,
                sampling=engine.sampling,
                verify_vocab=engine.vocab_size,
            )
            all_h.append(np.asarray(h))
            all_y.append(np.asarray(y))
            n = int(n_dev)
    return np.concatenate(all_h), np.concatenate(all_y)


def train_arp_for_pair(
    engine,
    prompts: np.ndarray,
    *,
    source: str,
    target: str,
    checkpoint_root: str = "checkpoints",
    width: int = 256,
    epochs: int = 20,
    seed: int = 0,
):
    """Collect, fit, save, and register an ARP head for a model pair."""
    import os

    import jax as _jax

    from duodecoding_tpu.adaptive.arp import init_arp_head, save_arp_head, train_arp_head
    from duodecoding_tpu.adaptive.registries import pair_key, register_acc_head

    hiddens, labels = collect_confidence(engine, prompts)
    params = init_arp_head(
        _jax.random.PRNGKey(seed), engine.draft.cfg.hidden_size, width
    )
    params, loss = train_arp_head(params, hiddens, labels, epochs=epochs)
    path = os.path.join(
        checkpoint_root, "acc_heads", pair_key(source, target), "head.pkl"
    )
    save_arp_head(params, path)
    register_acc_head(
        source,
        target,
        path,
        registry_path=os.path.join(checkpoint_root, "acc_head_registry.json"),
    )
    acc = float(
        np.mean(
            (
                np.asarray(
                    jnp.argmax(
                        __import__(
                            "duodecoding_tpu.adaptive.arp", fromlist=["arp_apply"]
                        ).arp_apply(params, jnp.asarray(hiddens)),
                        axis=-1,
                    )
                )
                == labels
            )
        )
    )
    return params, {"loss": loss, "train_accuracy": acc, "n_samples": len(labels), "path": path}
