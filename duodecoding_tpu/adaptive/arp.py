"""Acceptance-prediction (ARP) heads — SpecDec++-style draft-length control.

The reference wraps an external ``AcceptancePredictionHead`` (a small
classifier over the draft's last hidden state) in a ``DecodingAdapter``
that stops drafting when the cumulative rejection probability exceeds a
threshold (reference: src/adapter.py:8-78; the head checkpoints live in a
registry, src/acc_head_registry.py). Here the head is a pure-jax MLP
(hidden -> width -> width -> 2 logits) and the adapter is a ``stop_fn``
closed over the head parameters, plugged straight into the drafting
while_loop (engine/loops.py:draft_tokens_loop) — the early stop costs no
extra host round-trips.

Training (the reference trains heads offline in the SpecDec_pp submodule):
``train_arp_head`` fits the head with optax on (hidden_state, accepted)
pairs collected from decoding runs (evalkit/collect_confidence.py is the
collector).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

import jax
import jax.numpy as jnp
import optax


def init_arp_head(key: jax.Array, hidden_size: int, width: int = 256, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)

    def lin(k, i, o):
        return {
            "w": (jax.random.normal(k, (i, o), jnp.float32) * (i**-0.5)).astype(dtype),
            "b": jnp.zeros((o,), dtype),
        }

    return {
        "fc1": lin(k1, hidden_size, width),
        "fc2": lin(k2, width, width),
        "out": lin(k3, width, 2),
    }


def arp_apply(params, hidden: jax.Array) -> jax.Array:
    """hidden: (..., hidden_size) -> 2-class logits (index 1 = accept)."""
    x = hidden.astype(params["fc1"]["w"].dtype)
    x = jax.nn.relu(x @ params["fc1"]["w"] + params["fc1"]["b"])
    x = jax.nn.relu(x @ params["fc2"]["w"] + params["fc2"]["b"])
    return x @ params["out"]["w"] + params["out"]["b"]


def acc_prob(params, hidden: jax.Array) -> jax.Array:
    """P(accept) per row (softmax index 1; reference src/adapter.py:47)."""
    logits = arp_apply(params, hidden).astype(jnp.float32)
    return jax.nn.softmax(logits, axis=-1)[..., 1]


def make_arp_stop_fn(params, threshold: float | None):
    """Build a ``stop_fn(hidden, q_row, tok, i, carry)`` for the drafting
    loop. ``carry`` is the cumulative product of per-token accept probs;
    drafting stops when ``1 - prod > threshold`` (reference
    src/adapter.py:55-66). With ``threshold is None`` the head's argmax
    decides directly (class 0 = stop)."""

    def stop_fn(hidden, q_row, tok, i, carry):
        p = acc_prob(params, hidden)  # [B]
        if threshold is None:
            pred = jnp.argmax(arp_apply(params, hidden), axis=-1)
            stop = jnp.any(pred == 0)
            new_carry = jnp.where(pred == 1, carry, 0.0)
            return stop, new_carry
        new_carry = carry * p
        rej = 1.0 - new_carry
        return jnp.any(rej > threshold), new_carry

    return stop_fn


def train_arp_head(
    params,
    hiddens: np.ndarray,  # [N, hidden]
    labels: np.ndarray,  # [N] {0, 1} accepted?
    *,
    lr: float = 1e-3,
    epochs: int = 5,
    batch_size: int = 256,
    seed: int = 0,
):
    """Cross-entropy fit; returns (params, final_loss)."""
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, h, y):
        def loss_fn(p):
            logits = arp_apply(p, h)
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, y)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(hiddens)
    rng = np.random.default_rng(seed)
    loss = jnp.float32(0)
    for _ in range(epochs):
        order = rng.permutation(n)
        for s in range(0, n, batch_size):
            idx = order[s : s + batch_size]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(hiddens[idx]), jnp.asarray(labels[idx])
            )
    return params, float(loss)


def save_arp_head(params, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, params), f)


def load_arp_head(path: str):
    with open(path, "rb") as f:
        return jax.tree.map(jnp.asarray, pickle.load(f))
