"""DRA — the DDQN+LSTM RL adapter that tunes (transfer_top_k, threshold).

Pure-jax/optax port of the reference's RL stack (reference:
src/rl_adapter.py): a dueling recurrent Q-network (Linear embed -> 2-layer
LSTM -> value/advantage heads), a Double-DQN agent with epsilon-greedy
exploration, a 5000-transition replay deque, reward scaling x0.01, target
sync every 20 updates and gradient clipping at 1.0 — trained ONLINE inside
the decoding loop. The ``RLNetworkAdapter`` state is a sequence of 8
frames ``[bw, lat, entropy, last_acc_prob, task-onehot]`` and the action
decodes to ``(top_k, threshold)`` over the same candidate grids.

Checkpoints are pickled numpy pytrees (``latest`` + ``best``-by-TPS plus a
replay-buffer sidecar, matching the reference's latest/best/.buffer layout,
src/rl_adapter.py:163-183, 363-377) guarded by MODEL_SERIES_NAME.
"""

from __future__ import annotations

import os
import pickle
import random
from collections import deque
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

TOPK_CANDIDATES = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024]
THRESHOLD_CANDIDATES = [0.1, 0.2, 0.4, 0.6, 0.8, 0.9, 0.95, 0.99]

KNOWN_TASKS = ["mt_bench", "gsm8k", "cnndm", "xsum", "humaneval"]
TASK_MAP = {name: i for i, name in enumerate(KNOWN_TASKS)}
UNKNOWN_TASK_ID = len(KNOWN_TASKS)


# ---------------------------------------------------------------------------
# Recurrent dueling Q-network (pure jax)
# ---------------------------------------------------------------------------


def _linear(key, i, o):
    return {
        "w": jax.random.normal(key, (i, o), jnp.float32) * (i**-0.5),
        "b": jnp.zeros((o,), jnp.float32),
    }


def init_q_network(key, feature_dim, action_dim, hidden_dim=128, num_layers=2):
    ks = jax.random.split(key, 4 + num_layers)
    lstm = []
    for layer in range(num_layers):
        in_dim = hidden_dim
        lstm.append(
            {
                "wi": jax.random.normal(ks[layer], (in_dim + hidden_dim, 4 * hidden_dim))
                * ((in_dim + hidden_dim) ** -0.5),
                "b": jnp.zeros((4 * hidden_dim,), jnp.float32),
            }
        )
    return {
        "embed": _linear(ks[num_layers], feature_dim, hidden_dim),
        "lstm": lstm,
        "val1": _linear(ks[num_layers + 1], hidden_dim, hidden_dim),
        "val2": _linear(ks[num_layers + 2], hidden_dim, 1),
        "adv1": _linear(ks[num_layers + 3], hidden_dim, hidden_dim),
        "adv2": _linear(jax.random.fold_in(ks[0], 99), hidden_dim, action_dim),
    }


def _lstm_layer(cell, xs):
    """xs: [B, T, H] -> [B, T, H]. Standard LSTM cell (i, f, g, o gating)."""
    B, T, H = xs.shape

    def step(carry, x):
        h, c = carry
        z = jnp.concatenate([x, h], axis=-1) @ cell["wi"] + cell["b"]
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H)), jnp.zeros((B, H)))
    _, hs = jax.lax.scan(step, init, jnp.swapaxes(xs, 0, 1))
    return jnp.swapaxes(hs, 0, 1)


def q_network_apply(params, x):
    """x: [B, T, feature_dim] -> Q-values [B, action_dim] (dueling combine)."""
    h = jax.nn.relu(x @ params["embed"]["w"] + params["embed"]["b"])
    for cell in params["lstm"]:
        h = _lstm_layer(cell, h)
    last = h[:, -1, :]
    val = jax.nn.relu(last @ params["val1"]["w"] + params["val1"]["b"])
    val = val @ params["val2"]["w"] + params["val2"]["b"]
    adv = jax.nn.relu(last @ params["adv1"]["w"] + params["adv1"]["b"])
    adv = adv @ params["adv2"]["w"] + params["adv2"]["b"]
    return val + adv - jnp.mean(adv, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# Double-DQN agent
# ---------------------------------------------------------------------------


class DDQNAgent:
    def __init__(
        self,
        feature_dim,
        action_dim,
        seq_len=8,
        hidden_dim=128,
        lr=1e-4,
        gamma=0.99,
        epsilon=1.0,
        epsilon_decay=0.9995,
        epsilon_min=0.01,
        buffer_size=5000,
        batch_size=32,
        target_update_freq=20,
        name="RL-Agent",
        seed=0,
    ):
        self.feature_dim = feature_dim
        self.action_dim = action_dim
        self.seq_len = seq_len
        self.gamma = gamma
        self.epsilon = epsilon
        self.epsilon_decay = epsilon_decay
        self.epsilon_min = epsilon_min
        self.batch_size = batch_size
        self.target_update_freq = target_update_freq
        self.update_count = 0
        self.name = name
        self.reward_history: deque = deque(maxlen=100)
        self.memory: deque = deque(maxlen=buffer_size)
        self._rng = random.Random(seed)

        self.policy_params = init_q_network(
            jax.random.PRNGKey(seed), feature_dim, action_dim, hidden_dim
        )
        self.target_params = jax.tree.map(jnp.copy, self.policy_params)
        self._tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
        self.opt_state = self._tx.init(self.policy_params)

        @jax.jit
        def _select(params, state_seq):
            return jnp.argmax(q_network_apply(params, state_seq[None]), axis=1)[0]

        @jax.jit
        def _update(policy, target, opt_state, states, actions, rewards, next_states, dones):
            rewards = rewards * 0.01  # reference reward scaling
            next_actions = jnp.argmax(q_network_apply(policy, next_states), axis=1)
            next_q = jnp.take_along_axis(
                q_network_apply(target, next_states), next_actions[:, None], axis=1
            )
            target_q = rewards[:, None] + (1 - dones[:, None]) * self.gamma * next_q

            def loss_fn(p):
                q = jnp.take_along_axis(
                    q_network_apply(p, states), actions[:, None], axis=1
                )
                return jnp.mean(optax.huber_loss(q, target_q))

            loss, grads = jax.value_and_grad(loss_fn)(policy)
            updates, opt_state = self._tx.update(grads, opt_state)
            return optax.apply_updates(policy, updates), opt_state, loss

        self._select_jit = _select
        self._update_jit = _update

    def select_action(self, state_seq: np.ndarray, training=True) -> int:
        if training and self._rng.random() < self.epsilon:
            return self._rng.randrange(self.action_dim)
        return int(self._select_jit(self.policy_params, jnp.asarray(state_seq, jnp.float32)))

    def store_transition(self, state, action, reward, next_state, done):
        self.memory.append((state, action, reward, next_state, done))
        self.reward_history.append(reward)

    def update(self):
        if len(self.memory) < self.batch_size:
            return None
        batch = self._rng.sample(list(self.memory), self.batch_size)
        states, actions, rewards, next_states, dones = zip(*batch)
        self.policy_params, self.opt_state, loss = self._update_jit(
            self.policy_params,
            self.target_params,
            self.opt_state,
            jnp.asarray(np.array(states), jnp.float32),
            jnp.asarray(np.array(actions), jnp.int32),
            jnp.asarray(np.array(rewards), jnp.float32),
            jnp.asarray(np.array(next_states), jnp.float32),
            jnp.asarray(np.array(dones), jnp.float32),
        )
        self.update_count += 1
        if self.update_count % self.target_update_freq == 0:
            self.target_params = jax.tree.map(jnp.copy, self.policy_params)
        self.epsilon = max(self.epsilon_min, self.epsilon * self.epsilon_decay)
        return float(loss)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {
            "policy_net": jax.tree.map(np.asarray, self.policy_params),
            "target_net": jax.tree.map(np.asarray, self.target_params),
            "epsilon": self.epsilon,
            "update_count": self.update_count,
            "model_series": os.environ.get("MODEL_SERIES_NAME", "unknown"),
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        try:
            with open(path + ".buffer", "wb") as f:
                pickle.dump(list(self.memory)[-2000:], f)
        except Exception:
            pass

    def load(self, path: str) -> bool:
        if not os.path.exists(path):
            return False
        try:
            with open(path, "rb") as f:
                ckpt = pickle.load(f)
            current = os.environ.get("MODEL_SERIES_NAME")
            saved = ckpt.get("model_series")
            if current and saved and saved not in ("unknown", current):
                print(
                    f"CRITICAL WARNING: checkpoint {path} belongs to series "
                    f"{saved!r} but current is {current!r}"
                )
            self.policy_params = jax.tree.map(jnp.asarray, ckpt["policy_net"])
            self.target_params = jax.tree.map(jnp.asarray, ckpt["target_net"])
            self.epsilon = ckpt["epsilon"]
            self.update_count = ckpt.get("update_count", 0)
            buf = path + ".buffer"
            if os.path.exists(buf):
                with open(buf, "rb") as f:
                    self.memory.extend(pickle.load(f))
            return True
        except Exception as e:  # pragma: no cover
            print(f"Failed to load checkpoint: {e}. Starting fresh.")
            return False


# ---------------------------------------------------------------------------
# The adapter the decoding loops talk to
# ---------------------------------------------------------------------------


class RLNetworkAdapter:
    def __init__(
        self,
        model_path="checkpoints/rl_adapter.pkl",
        best_model_path=None,
        agent_name=None,
        legacy_load_paths=None,
        k_candidates=None,
        threshold_candidates=None,
        seed=0,
    ):
        self.task_dim = len(KNOWN_TASKS) + 1
        self.feature_dim = 3 + 1 + self.task_dim
        self.seq_len = 8
        self.state_history: deque = deque(
            [np.zeros(self.feature_dim, np.float32) for _ in range(self.seq_len)],
            maxlen=self.seq_len,
        )
        self.topk_candidates = (
            k_candidates if k_candidates is not None else TOPK_CANDIDATES
        )
        self.threshold_candidates = (
            threshold_candidates
            if threshold_candidates is not None
            else THRESHOLD_CANDIDATES
        )
        self.action_dim = len(self.topk_candidates) * len(self.threshold_candidates)
        self.model_path = model_path
        self.best_model_path = best_model_path or model_path
        agent_name = agent_name or os.path.basename(model_path).split(".")[0]
        self.agent = DDQNAgent(
            feature_dim=self.feature_dim,
            action_dim=self.action_dim,
            seq_len=self.seq_len,
            name=agent_name,
            seed=seed,
        )
        self.max_bandwidth = 1000.0
        self.max_latency = 500.0
        self.last_state_seq = None
        self.last_action = None
        self.last_reward = None
        self.best_tps = -1.0

        if not self.agent.load(self.best_model_path):
            if not self.agent.load(self.model_path):
                for p in legacy_load_paths or []:
                    if self.agent.load(p):
                        self.agent.save(self.model_path)
                        break

    def _feature_vector(self, bw, lat, entropy, last_acc, task_name):
        task_vec = np.zeros(self.task_dim, np.float32)
        task_vec[TASK_MAP.get(task_name, UNKNOWN_TASK_ID)] = 1.0
        return np.concatenate(
            [
                [
                    min(bw / self.max_bandwidth, 1.0),
                    min(lat / self.max_latency, 1.0),
                    min(entropy / 10.0, 1.0),
                    last_acc,
                ],
                task_vec,
            ]
        ).astype(np.float32)

    def select_config(
        self,
        bandwidth_mbps: float,
        latency_ms: float,
        acc_probs: List[float],
        entropy: float,
        task_name: str = "unknown",
        training=True,
    ) -> Tuple[int, float]:
        last_acc = acc_probs[-1] if acc_probs else 0.5
        feat = self._feature_vector(bandwidth_mbps, latency_ms, entropy, last_acc, task_name)
        self.state_history.append(feat)
        state_seq = np.array(self.state_history)

        if (
            self.last_state_seq is not None
            and self.last_action is not None
            and self.last_reward is not None
        ):
            self.agent.store_transition(
                self.last_state_seq, self.last_action, self.last_reward, state_seq, False
            )
            self.agent.update()

        action = self.agent.select_action(state_seq, training=training)
        topk_idx = action // len(self.threshold_candidates)
        thr_idx = action % len(self.threshold_candidates)
        self.last_state_seq = state_seq
        self.last_action = action
        self.last_reward = None
        return self.topk_candidates[topk_idx], self.threshold_candidates[thr_idx]

    def step(self, reward: float) -> None:
        self.last_reward = reward

    def save(self, current_tps: Optional[float] = None) -> None:
        self.agent.save(self.model_path)
        if current_tps is not None and current_tps > self.best_tps:
            self.best_tps = current_tps
            self.agent.save(self.best_model_path)
        if self.agent.update_count % 100 == 0:
            self.agent.save(self.model_path)
