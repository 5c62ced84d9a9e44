"""CUHLM: uncertainty-gated opportunistic transmission policy + simulator.

Port of the reference's ``CUHLM`` / ``PreciseCUHLM``
(reference: src/communication.py:500-789, 875-943):

- draft-token *uncertainty* is the disagreement rate of M temperature-
  perturbed samples of the draft logits (MC-dropout-style; here a
  vectorized jnp computation usable inside jitted steps);
- below the uncertainty threshold the draft token is accepted WITHOUT
  target verification (opportunistic transmission);
- above it, the transmitted vocabulary size k* is the smallest k whose
  total-variation bound ``U_TV <= theta`` holds (paper equation 24;
  the reference's O(V^2) python search is replaced by an O(V) suffix-sum
  vectorization with identical results);
- ``terminal_prob`` returns the compress-then-rebuild distribution the
  cloud would see.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from duodecoding_tpu.comm.simulator import CommSimulator
from duodecoding_tpu.ops.sampling import rebuild_topk_uniform_probs


def calculate_uncertainty(
    key: jax.Array,
    logits: jax.Array,  # [V]
    draft_token: jax.Array,  # scalar int
    M: int = 20,
    theta_max: float = 2.0,
) -> jax.Array:
    """Disagreement rate of M temperature-perturbed samples vs the draft token.

    jnp port of reference CUHLM.calculate_uncertainty
    (src/communication.py:541-575); jit-able, runs on device inside the
    decoding step.
    """
    k_temp, k_sample = jax.random.split(key)
    temps = jnp.maximum(jax.random.uniform(k_temp, (M,)) * theta_max, 1e-6)
    perturbed = logits[None, :].astype(jnp.float32) / temps[:, None]
    perturbed = perturbed - jnp.max(perturbed, axis=1, keepdims=True)
    samples = jax.random.categorical(k_sample, perturbed, axis=-1)  # [M]
    disagree = jnp.sum(samples != draft_token)
    return disagree.astype(jnp.float32) / M


def compressed_vocab_size_for_uncertainty(
    uncertainty: float,
    probs: np.ndarray,  # [V] full prob row
    theta: float = 0.1,
    draft_token: Optional[int] = None,
) -> int:
    """Smallest k with U_TV(beta_d) <= theta (reference paper eq. 24,
    src/communication.py:681-755), vectorized over k via suffix sums."""
    probs = np.asarray(probs, dtype=np.float64).reshape(-1)
    vocab = probs.shape[0]
    if vocab == 0:
        return 0

    a, b = 0.815, -0.066
    beta_d = max(0.0, min(1.0, a * uncertainty + b))

    sorted_probs = np.sort(probs)[::-1]
    x_d = (
        sorted_probs[0]
        if draft_token is None or not (0 <= draft_token < vocab)
        else probs[draft_token]
    )

    eta = 1.0
    softplus = lambda z: math.log1p(math.exp(eta * z)) / eta
    denominator = (1 - x_d) * softplus(-1.0) + x_d * softplus(-beta_d)
    if denominator <= 0:
        return 30

    # numerator(k) = sum_{i >= k} |p_i - u_k|, u_k = max(1 - topk_sum, 0)/(V-k)
    cumsum = np.cumsum(sorted_probs)
    ks = np.arange(1, vocab)  # candidate k values 1..V-1
    topk_sum = cumsum[ks - 1]
    residual = 1.0 - topk_sum
    tail_count = vocab - ks
    uniform = np.where(residual > 0, residual / tail_count, 0.0)

    # tail elements are sorted descending; |p_i - u| splits at the first
    # index where p_i < u. suffix sums give both halves in O(V).
    suffix = cumsum[-1] - cumsum[ks - 1]  # sum of tail probs for each k
    # count of tail elements >= u_k: searchsorted on the descending array
    asc = sorted_probs[::-1]
    # for each k: number of elements in sorted_probs[k:] that are >= uniform[k]
    # elements >= u among the whole array:
    ge_total = vocab - np.searchsorted(asc, uniform, side="left")
    # elements >= u among the top-k head (head values are the k largest;
    # head min = sorted_probs[k-1]):
    ge_head = np.minimum(ge_total, ks)
    m = ge_total - ge_head  # tail elements >= u
    # sum of the m largest tail elements = cumsum[k+m-1] - cumsum[k-1]
    idx = ks + m - 1
    sum_ge = np.where(m > 0, cumsum[np.minimum(idx, vocab - 1)] - cumsum[ks - 1], 0.0)
    n_lt = tail_count - m
    sum_lt = suffix - sum_ge
    numerator = (sum_ge - m * uniform) + (n_lt * uniform - sum_lt)

    u_tv = numerator / denominator
    ok = np.nonzero(u_tv <= theta)[0]
    if ok.size:
        return int(ks[ok[0]])
    return min(CUHLMPolicy.DEFAULT_COMPRESSED_VOCAB_SIZE, vocab // 100)


class CUHLMPolicy(CommSimulator):
    """CommSimulator + CUHLM gating (reference src/communication.py:500-789)."""

    DEFAULT_COMPRESSED_VOCAB_SIZE = 300

    def __init__(
        self,
        bandwidth_edge_cloud: float,
        bandwidth_edge_end: float = float("inf"),
        bandwidth_cloud_end: float = float("inf"),
        uncertainty_threshold: float = 0.8,
        vocab_size: int = 32000,
        dimension: str = "Mbps",
        ntt_ms_edge_end: float = 20,
        ntt_ms_edge_cloud: float = 200,
        use_stochastic: bool = False,
        set_mean_bandwidth: bool = True,
        mode: str = "static",
        **kw,
    ):
        super().__init__(
            bandwidth_edge_cloud,
            bandwidth_edge_end,
            bandwidth_cloud_end,
            dimension=dimension,
            ntt_ms_edge_end=ntt_ms_edge_end,
            ntt_ms_edge_cloud=ntt_ms_edge_cloud,
            use_stochastic=use_stochastic,
            set_mean_bandwidth=set_mean_bandwidth,
            mode=mode,
            **kw,
        )
        self.uncertainty_threshold = uncertainty_threshold
        self.vocab_size = vocab_size

    def determine_transfer_strategy(
        self, uncertainty: float, current_probs: np.ndarray | None
    ) -> Tuple[bool, int]:
        """(should_transfer, compressed_vocab_size) for this step
        (reference src/communication.py:637-654)."""
        if current_probs is None or np.size(current_probs) == 0:
            return False, 0
        if uncertainty >= self.uncertainty_threshold:
            k = max(
                1,
                compressed_vocab_size_for_uncertainty(
                    uncertainty, np.asarray(current_probs).reshape(-1)
                ),
            )
            return True, k
        return False, 0

    def terminal_prob(
        self,
        key: jax.Array,
        current_probs: jax.Array,  # [V]
        logits: Optional[jax.Array] = None,
        draft_token: Optional[int] = None,
    ) -> jax.Array:
        """Compress-then-rebuild distribution the verifier sees
        (reference src/communication.py:757-789)."""
        if logits is None:
            p = jnp.maximum(current_probs, 1e-8)
            logits = jnp.log(p) - jnp.max(jnp.log(p))
        tok = (
            jnp.argmax(logits)
            if draft_token is None
            else jnp.asarray(draft_token)
        )
        unc = float(calculate_uncertainty(key, logits, tok))
        should, k = self.determine_transfer_strategy(
            unc, np.asarray(current_probs)
        )
        if not should or k >= self.vocab_size:
            return current_probs
        return rebuild_topk_uniform_probs(current_probs[None, :], k)[0]


class PreciseCUHLM(CUHLMPolicy):
    """CUHLM over Shannon-capacity links with energy accounting
    (reference src/communication.py:875-943)."""

    def __init__(
        self,
        bandwidth_hz: float,
        channel_gain: float,
        send_power_watt: float,
        noise_power_watt: float,
        uncertainty_threshold: float = 0.8,
        vocab_size: int = 32000,
        ntt_ms_edge_cloud: float = 200,
        ntt_ms_edge_end: float = 20,
    ):
        snr = channel_gain * send_power_watt / noise_power_watt
        capacity_bps = bandwidth_hz * math.log2(1 + snr)
        super().__init__(
            bandwidth_edge_cloud=capacity_bps,
            bandwidth_edge_end=capacity_bps / 10,
            bandwidth_cloud_end=capacity_bps / 10,
            uncertainty_threshold=uncertainty_threshold,
            vocab_size=vocab_size,
            dimension="bps",
            ntt_ms_edge_cloud=ntt_ms_edge_cloud,
            ntt_ms_edge_end=ntt_ms_edge_end,
        )
        self.bandwidth_hz = bandwidth_hz
        self.channel_gain = channel_gain
        self.send_power_watt = send_power_watt
        self.noise_power_watt = noise_power_watt
        self.snr = snr
        self.channel_capacity_bps = capacity_bps

    @property
    def total_comm_energy(self) -> float:
        return sum(
            u["transfer_time"] * self.send_power_watt
            for link in ("edge_cloud", "edge_end", "cloud_end")
            for u in self.stats[link]
        )


def compressed_vocab_size_jax(
    uncertainty: jax.Array,  # scalar f32
    probs: jax.Array,  # [V] full prob row
    theta: float = 0.1,
    default_k: int = 300,
) -> jax.Array:
    """jnp port of ``compressed_vocab_size_for_uncertainty`` so the CUHLM
    gate runs inside jitted decoding steps (same suffix-sum vectorization;
    identical results on fp32 inputs)."""
    probs = probs.astype(jnp.float32)
    vocab = probs.shape[0]

    a, b = 0.815, -0.066
    beta_d = jnp.clip(a * uncertainty + b, 0.0, 1.0)
    sorted_probs = jnp.sort(probs)[::-1]
    x_d = sorted_probs[0]
    softplus = lambda z: jnp.log1p(jnp.exp(z))
    denominator = (1 - x_d) * softplus(-1.0) + x_d * softplus(-beta_d)

    cumsum = jnp.cumsum(sorted_probs)
    ks = jnp.arange(1, vocab)
    topk_sum = cumsum[ks - 1]
    residual = 1.0 - topk_sum
    tail_count = (vocab - ks).astype(jnp.float32)
    uniform = jnp.where(residual > 0, residual / tail_count, 0.0)

    suffix = cumsum[-1] - cumsum[ks - 1]
    asc = sorted_probs[::-1]
    ge_total = vocab - jnp.searchsorted(asc, uniform, side="left")
    ge_head = jnp.minimum(ge_total, ks)
    m = ge_total - ge_head
    idx = jnp.minimum(ks + m - 1, vocab - 1)
    sum_ge = jnp.where(m > 0, cumsum[idx] - cumsum[ks - 1], 0.0)
    n_lt = tail_count - m
    sum_lt = suffix - sum_ge
    numerator = (sum_ge - m * uniform) + (n_lt * uniform - sum_lt)

    u_tv = numerator / denominator
    ok = u_tv <= theta
    first_ok = jnp.argmax(ok)  # first True index, 0 if none
    any_ok = jnp.any(ok)
    fallback = min(default_k, vocab // 100)
    k = jnp.where(any_ok, ks[first_ok], fallback)
    return jnp.where(denominator <= 0, 30, k).astype(jnp.int32)
