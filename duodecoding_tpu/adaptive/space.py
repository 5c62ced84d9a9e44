"""SPACE-style semi-autoregressive drafting (mask tokens + auto-verify).

The reference vendors SPACE as a legacy baseline (reference:
src/model/space/modeling_llama_space.py — a llama variant fine-tuned with
SAR-SFT so appended [MASK] tokens yield parallel predictions of several
future tokens, verified in the same forward as the next batch is
proposed). TPU-native redesign without touching the base architecture:

- k vocabulary ids at the top of the vocab act as mask tokens; ONLY their
  embedding rows are trained (self-distillation on the target's own greedy
  rollouts — the SAR-SFT analog when no fine-tuned checkpoint exists);
- the decode loop (engine/modes/space.py) drives windows
  ``[tail, drafts, masks]`` through the shared window-attention forward:
  draft rows auto-verify against the model's own argmax chain (greedy
  lossless) while mask rows simultaneously propose the next draft batch —
  SPACE's "auto-correct" single-forward propose+verify.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from duodecoding_tpu.models.config import ModelConfig


def space_mask_ids(cfg: ModelConfig, k: int) -> List[int]:
    """The top-k vocab ids serve as mask tokens (rare/unused in practice;
    the reference's fine-tune adds dedicated [MASK] ids instead)."""
    return list(range(cfg.vocab_size - k, cfg.vocab_size))


def apply_mask_embeddings(params: dict, mask_emb: jax.Array, ids) -> dict:
    """Return params with the mask rows of the embedding replaced."""
    out = dict(params)
    out["embed"] = params["embed"].at[jnp.asarray(ids)].set(
        mask_emb.astype(params["embed"].dtype)
    )
    return out


def collect_space_data(params, cfg, prompts: np.ndarray, max_new: int):
    """Greedy rollouts used as distillation targets."""
    from duodecoding_tpu.engine.loops import ar_generate, prefill
    from duodecoding_tpu.engine.sampling_config import SamplingConfig
    from duodecoding_tpu.models import init_cache

    B, L = prompts.shape
    S = L + max_new
    dtype = params["embed"].dtype
    tokens = jnp.zeros((B, S), jnp.int32).at[:, :L].set(jnp.asarray(prompts))
    cache = init_cache(cfg, B, S, dtype)
    cache = prefill(params, cfg, cache, tokens[:, :L])
    tokens, n, _, _ = ar_generate(
        params, cfg=cfg, tokens=tokens, cache=cache, n_tokens=jnp.int32(L),
        key=jax.random.PRNGKey(0), sampling=SamplingConfig(0.0),
        max_new_tokens=max_new,
    )
    return np.asarray(tokens), L


def train_space_masks(
    params,
    cfg: ModelConfig,
    rollouts: np.ndarray,  # [B, S] greedy rollouts
    prompt_len: int,
    k: int = 4,
    *,
    lr: float = 5e-2,
    epochs: int = 30,
    anchors: int = 4,
    seed: int = 0,
) -> Tuple[jax.Array, float]:
    """Fit the k mask-embedding rows: window = rollout[:p] + masks, CE of
    mask row j against rollout[p+j+1] (the j+1-th unknown future token).
    Returns (mask_emb [k, d], final loss)."""
    from duodecoding_tpu.models import forward, init_cache

    ids = space_mask_ids(cfg, k)
    B, S = rollouts.shape
    d = cfg.hidden_size
    dtype = params["embed"].dtype
    key = jax.random.PRNGKey(seed)
    mask_emb = (
        jax.random.normal(key, (k, d), jnp.float32) * 0.02
    ).astype(jnp.float32)
    tx = optax.adam(lr)
    opt_state = tx.init(mask_emb)
    roll = jnp.asarray(rollouts)

    import functools

    @functools.partial(jax.jit, static_argnames=("p",))
    def step(mask_emb, opt_state, p):
        # window [B, p + k]: prefix + masks; static p via jit cache per p
        win = jnp.concatenate(
            [
                roll[:, :p],
                jnp.broadcast_to(
                    jnp.asarray(ids, jnp.int32)[None, :], (B, k)
                ),
            ],
            axis=1,
        )
        labels = jax.lax.dynamic_slice(roll, (0, p + 1), (B, k))

        def loss_fn(me):
            pp = apply_mask_embeddings(params, me, ids)
            cache = init_cache(cfg, B, p + k, dtype)
            logits, _ = forward(pp, cfg, win, cache)
            lg = logits[:, p:, :]  # mask rows
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(lg, labels)
            )

        loss, grads = jax.value_and_grad(loss_fn)(mask_emb)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(mask_emb, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    lo = max(prompt_len - 1, 1)
    hi = S - k - 2
    anchor_ps = sorted(
        set(int(x) for x in rng.integers(lo, max(hi, lo + 1), anchors))
    )
    loss = jnp.float32(0)
    for _ in range(epochs):
        for p in anchor_ps:
            mask_emb, opt_state, loss = step(mask_emb, opt_state, p)
    return mask_emb, float(loss)
