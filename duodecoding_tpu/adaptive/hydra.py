"""Hydra sequentially-grounded drafting heads.

The reference vendors Hydra as a legacy baseline (reference:
src/model/hydra/hydra_model.py:43 — MLP heads over the base hidden state;
src/model/hydra/hydra_heads/mlp_head.py:41 ``HydraMLP`` with
``grounded_heads``: head k's input is ``[hidden_t; emb(x_{t+1}); ...;
emb(x_{t+1+k})]`` — unlike Medusa, each head conditions on the tokens the
previous heads already drafted, which is Hydra's core idea).

TPU-native redesign: pure-jax heads (a dimension-reducing residual block
per head — mlp_head.py:16-39 ``ResBlock`` with ``res_connection`` — plus a
vocab projection), self-distillation training on the target's own greedy
rollouts, and sequential beam proposal that expands a candidate tree
verified through the shared tree-attention machinery (ops/tree.py).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax


def init_hydra_heads(
    key: jax.Array,
    hidden_size: int,
    vocab_size: int,
    num_heads: int = 3,
    dtype=jnp.float32,
):
    """Head k consumes ``(k+2)``-wide input: hidden + (k+1) token
    embeddings (grounded; mlp_head.py:71-77)."""
    d = hidden_size
    ks = jax.random.split(key, num_heads * 3)
    heads = []
    for h in range(num_heads):
        din = (h + 2) * d
        heads.append(
            {
                "lin_w": jax.random.normal(ks[3 * h], (din, d), jnp.float32)
                .astype(dtype) * (din**-0.5),
                "lin_b": jnp.zeros((d,), dtype),
                "res_w": jax.random.normal(ks[3 * h + 1], (din, d), jnp.float32)
                .astype(dtype) * (din**-0.5),
                "out_w": jax.random.normal(ks[3 * h + 2], (d, vocab_size),
                                           jnp.float32).astype(dtype)
                * (d**-0.5),
            }
        )
    return heads


def hydra_head_apply(head, x: jax.Array) -> jax.Array:
    """x (..., (k+2)*d) -> logits (..., V): reducing ResBlock + vocab
    projection (mlp_head.py:29-39)."""
    h = x @ head["res_w"] + jax.nn.silu(x @ head["lin_w"] + head["lin_b"])
    return h @ head["out_w"]


def collect_hydra_data(
    params, cfg, prompts: np.ndarray, max_new: int, num_heads: int,
    dtype=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy rollouts; returns (hiddens [N, d], tok_windows [N, K+1],
    labels [N, K]): at position t, tok_windows = x_{t+1}..x_{t+1+K} (the
    grounding tokens) and labels[k] = x_{t+2+k}."""
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
        params, cfg=cfg, tokens=tokens, cache=cache, n_tokens=jnp.int32(L),
        key=jax.random.PRNGKey(0), sampling=SamplingConfig(0.0),
        max_new_tokens=max_new,
    )
    cache2 = init_cache(cfg, B, S, dtype)
    _, _, hidden = forward(params, cfg, tokens, cache2, return_hidden=True)
    toks = np.asarray(tokens)
    hid = np.asarray(hidden, np.float32)
    hs, tws, ys = [], [], []
    for t in range(L - 1, S - num_heads - 2):
        hs.append(hid[:, t])
        tws.append(np.stack([toks[:, t + 1 + k] for k in range(num_heads + 1)], 1))
        ys.append(np.stack([toks[:, t + 2 + k] for k in range(num_heads)], 1))
    return np.concatenate(hs), np.concatenate(tws), np.concatenate(ys)


def train_hydra_heads(
    heads, embed: jax.Array, hiddens: np.ndarray, tok_windows: np.ndarray,
    labels: np.ndarray, *, lr=1e-3, epochs=20, batch_size=256, seed=0,
):
    """Joint CE fit, teacher-forced grounding (true tokens as conditioning,
    the reference's training mode, mlp_head.py:106-118)."""
    tx = optax.adam(lr)
    opt_state = tx.init(heads)
    K = len(heads)

    # embed is an ARGUMENT, not a closure constant: capturing a 13B-scale
    # embedding bakes ~330 MB of literals into the program (30-60x slower
    # compiles; outright remote-compile HTTP 413 failure)
    @jax.jit
    def step(heads, opt_state, embed, h, tw, y):
        emb = jnp.take(embed, tw, axis=0)  # [N, K+1, d]

        def loss_fn(hd):
            total = 0.0
            for k in range(K):
                x = jnp.concatenate(
                    [h] + [emb[:, j] for j in range(k + 1)], axis=-1
                )
                logits = hydra_head_apply(hd[k], x)
                total = total + jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(
                        logits, y[:, k]
                    )
                )
            return total / K

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
                heads, opt_state, embed, jnp.asarray(hiddens[idx]),
                jnp.asarray(tok_windows[idx]), jnp.asarray(labels[idx]),
            )
    return heads, float(loss)


def hydra_propose(
    heads, embed: jax.Array, hidden: np.ndarray, root_token: int,
    widths: List[int],
) -> List[np.ndarray]:
    """Sequential grounded beam proposal (the reference's
    ``_grounded_proposal``, mlp_head.py:160+): head k scores continuations
    of each kept partial path, conditioned on that path's actual tokens.
    Returns candidate paths (token sequences after ``root_token``)."""
    K = min(len(heads), len(widths))
    h = jnp.asarray(hidden)[None, :]  # [1, d]
    paths: List[List[int]] = [[]]
    for k in range(K):
        grounded = [[root_token] + p for p in paths]
        emb = jnp.take(embed, jnp.asarray(grounded, jnp.int32), axis=0)
        x = jnp.concatenate(
            [jnp.broadcast_to(h, (len(paths), h.shape[1]))]
            + [emb[:, j] for j in range(k + 1)],
            axis=-1,
        )
        logits = hydra_head_apply(heads[k], x)  # [P, V]
        top = np.asarray(
            jax.lax.top_k(logits, widths[k])[1]
        )  # [P, w]
        paths = [p + [int(t)] for p, row in zip(paths, top) for t in row]
    return [np.asarray(p, np.int32) for p in paths]
