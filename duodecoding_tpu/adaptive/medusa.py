"""Medusa-style multi-head drafting.

The reference vendors Medusa as a legacy baseline (reference:
src/model/medusa/medusa_model.py:69 — K ResBlock heads over the target's
last hidden state, each predicting the token k+1 steps ahead; candidates
expand into a tree verified with tree attention, src/model/medusa/utils.py).

Here: pure-jax heads (residual block + vocab projection per head),
self-distillation training (head k fits token t+k+1 from hidden_t on the
target's own greedy rollouts — no external data needed), candidate tree
generation from per-head top-k products, and verification through the
shared tree-attention machinery (ops/tree.py + the rest_tree forward).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax


def init_medusa_heads(
    key: jax.Array, hidden_size: int, vocab_size: int, num_heads: int = 3,
    dtype=jnp.float32,
):
    ks = jax.random.split(key, num_heads * 2)
    heads = []
    for h in range(num_heads):
        heads.append(
            {
                "res_w": jax.random.normal(
                    ks[2 * h], (hidden_size, hidden_size), jnp.float32
                ).astype(dtype)
                * (hidden_size**-0.5),
                "res_b": jnp.zeros((hidden_size,), dtype),
                "out_w": jax.random.normal(
                    ks[2 * h + 1], (hidden_size, vocab_size), jnp.float32
                ).astype(dtype)
                * (hidden_size**-0.5),
            }
        )
    return heads


def medusa_apply(heads, hidden: jax.Array) -> jax.Array:
    """hidden (..., H) -> logits (..., K, V) — ResBlock + projection per
    head (reference src/model/medusa/medusa_model.py:37)."""
    outs = []
    for head in heads:
        x = hidden + jax.nn.silu(hidden @ head["res_w"] + head["res_b"])
        outs.append(x @ head["out_w"])
    return jnp.stack(outs, axis=-2)


def collect_distill_data(
    params, cfg, prompts: np.ndarray, max_new: int, num_heads: int, dtype=None
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy rollouts of the target; returns (hiddens [N, H],
    labels [N, K]) where labels[:, k] = the token k+2 steps ahead of the
    hidden position (position +1 belongs to the LM head / bonus token;
    Medusa head k predicts t+2+k)."""
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
    # teacher-forced pass to get hiddens at every position
    cache2 = init_cache(cfg, B, S, dtype)
    _, _, hidden = forward(params, cfg, tokens, cache2, return_hidden=True)
    hs, ys = [], []
    toks = np.asarray(tokens)
    hid = np.asarray(hidden)
    for t in range(L - 1, S - num_heads - 2):
        hs.append(hid[:, t])
        ys.append(np.stack([toks[:, t + 2 + k] for k in range(num_heads)], axis=1))
    return np.concatenate(hs), np.concatenate(ys)


def train_medusa_heads(
    heads, hiddens: np.ndarray, labels: np.ndarray, *, lr=1e-3, epochs=20,
    batch_size=256, seed=0,
):
    """Cross-entropy fit of every head jointly; returns (heads, loss)."""
    tx = optax.adam(lr)
    opt_state = tx.init(heads)

    @jax.jit
    def step(heads, opt_state, h, y):
        def loss_fn(hd):
            logits = medusa_apply(hd, h)  # [N, K, V]
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, y)
            )

        loss, grads = jax.value_and_grad(loss_fn)(heads)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(heads, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    n = len(hiddens)
    loss = jnp.float32(0)
    for _ in range(epochs):
        order = rng.permutation(n)
        for s in range(0, n, batch_size):
            idx = order[s : s + batch_size]
            heads, opt_state, loss = step(
                heads, opt_state, jnp.asarray(hiddens[idx]), jnp.asarray(labels[idx])
            )
    return heads, float(loss)


def generate_candidates(
    head_logits: np.ndarray, top_per_head: List[int]
) -> List[np.ndarray]:
    """Cartesian product of per-head top-k tokens -> candidate paths
    (reference src/model/medusa/utils.py:196 generate_candidates, with the
    standard decreasing per-head widths)."""
    K = head_logits.shape[0]
    tops = [
        np.argsort(head_logits[k])[::-1][: top_per_head[min(k, len(top_per_head) - 1)]]
        for k in range(K)
    ]
    paths: List[np.ndarray] = []

    def rec(prefix, k):
        if k == K:
            paths.append(np.array(prefix, np.int32))
            return
        for t in tops[k]:
            rec(prefix + [int(t)], k + 1)

    rec([], 0)
    return paths
