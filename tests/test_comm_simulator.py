"""Tests for the communication cost model (time model, payload sizing,
stochastic traces, CUHLM k* search, Shannon/energy variant)."""

import math

import numpy as np
import pytest

from duodecoding_tpu.comm import CommSimulator, PreciseCommSimulator
from duodecoding_tpu.comm.cuhlm import (
    CUHLMPolicy,
    compressed_vocab_size_for_uncertainty,
)
from duodecoding_tpu.comm.traces import synthetic_trace


def test_transfer_time_model():
    sim = CommSimulator(
        bandwidth_edge_cloud=8.0,  # Mbps -> 1e6 bytes/s
        bandwidth_edge_end=80.0,
        ntt_ms_edge_cloud=200,
        ntt_ms_edge_end=20,
    )
    t = sim.simulate_transfer(500_000, "edge_cloud")
    assert t == pytest.approx(0.5 + 0.2)
    t = sim.simulate_transfer(1_000_000, "edge_end")
    assert t == pytest.approx(0.1 + 0.02)
    # cloud_end NTT is the sum of both links' NTTs
    t = sim.simulate_transfer(0, "cloud_end")
    assert t == pytest.approx(0.22)
    assert sim.connect_times == {"edge_cloud": 1, "edge_end": 1, "cloud_end": 1}
    assert sim.edge_cloud_data == 500_000


def test_bandwidth_floor_5mbps():
    sim = CommSimulator(1e-6, 1e-6, 1e-6, ntt_ms_edge_cloud=0, ntt_ms_edge_end=0)
    t = sim.simulate_transfer(625_000, "edge_cloud")  # 5 Mbps = 625000 B/s
    assert t == pytest.approx(1.0)


def test_compressed_payload_sizing():
    sim = CommSimulator(8.0, 8.0, ntt_ms_edge_cloud=0, ntt_ms_edge_end=0)
    probs = np.zeros((1, 4, 32000), dtype=np.float32)
    tokens = np.zeros((1, 4), dtype=np.int32)
    sim.transfer(tokens, probs, "edge_cloud", is_compressed=True, compressed_k=300)
    # bytes = 4 tokens * 4B + 300 * 4B * 4 rows
    assert sim.edge_cloud_data == 4 * 4 + 300 * 4 * 4
    assert sim.edge_cloud_topk_history == [300]
    assert sim.edge_cloud_draft_len_history == [4]


def test_uncompressed_payload_sizing_and_control_msgs():
    sim = CommSimulator(8.0, 8.0, ntt_ms_edge_cloud=0, ntt_ms_edge_end=0)
    sim.transfer(5, None, "edge_end", token_elem_size=4)
    assert sim.edge_end_data == 20
    sim.send_reject_message("edge_end")
    assert sim.edge_end_data == 26


def test_stochastic_trace_replay_round_robin():
    sim = CommSimulator(
        23.6, 563.0, use_stochastic=True, ntt_ms_edge_cloud=0, ntt_ms_edge_end=0
    )
    assert len(sim.trace_data) > 1
    mean = sum(sim.trace_data) / len(sim.trace_data)
    assert mean == pytest.approx(23.6, rel=0.05)
    assert min(sim.trace_data) >= 5.0
    n = len(sim.trace_data)
    for _ in range(n + 3):
        sim.simulate_transfer(1000, "edge_cloud")
    assert sim.trace_index == 3
    # bandwidth history tracks the replayed trace
    assert len(sim.edge_cloud_bandwidth_history) == n + 3


def test_synthetic_trace_deterministic():
    a = synthetic_trace(25.0, seed=7)
    b = synthetic_trace(25.0, seed=7)
    assert a == b
    assert min(a) >= 5.0


def test_precise_simulator_shannon_capacity_and_energy():
    sim = PreciseCommSimulator(
        bandwidth_hz=1e8,
        channel_gain=1.0,
        send_power_watt=2.0,
        noise_power_watt=2.0,
        ntt_ms_edge_cloud=0,
        ntt_ms_edge_end=0,
    )
    capacity = 1e8 * math.log2(2)
    assert sim.channel_capacity_bps == pytest.approx(capacity)
    # edge_cloud link = capacity/10 bps (above the 5 Mbps floor)
    t = sim.simulate_transfer(capacity / 10 / 8, "edge_cloud")
    assert t == pytest.approx(1.0)
    assert sim.total_comm_energy == pytest.approx(2.0)


def _ref_k_search(uncertainty, probs, theta=0.1):
    """Brute-force transcription of the paper equation for cross-checking."""
    vocab = len(probs)
    a, b = 0.815, -0.066
    beta_d = max(0.0, min(1.0, a * uncertainty + b))
    sp = np.sort(probs)[::-1]
    x_d = sp[0]
    softplus = lambda z: math.log1p(math.exp(z))
    denom = (1 - x_d) * softplus(-1.0) + x_d * softplus(-beta_d)
    if denom <= 0:
        return 30
    for k in range(1, vocab):
        topk = sp[:k].sum()
        residual = 1.0 - topk
        uniform = residual / (vocab - k) if (k < vocab and residual > 0) else 0.0
        numer = float(np.abs(sp[k:] - uniform).sum())
        if numer / denom <= theta:
            return k
    return min(300, vocab // 100)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("unc", [0.3, 0.8, 1.0])
def test_cuhlm_k_search_matches_bruteforce(seed, unc):
    rng = np.random.default_rng(seed)
    logits = rng.normal(scale=3.0, size=200)
    probs = np.exp(logits) / np.exp(logits).sum()
    fast = compressed_vocab_size_for_uncertainty(unc, probs)
    slow = _ref_k_search(unc, probs)
    assert fast == slow


def test_cuhlm_transfer_strategy_gate():
    policy = CUHLMPolicy(23.6, uncertainty_threshold=0.8, vocab_size=200)
    probs = np.full(200, 1 / 200)
    should, k = policy.determine_transfer_strategy(0.3, probs)
    assert not should and k == 0
    should, k = policy.determine_transfer_strategy(0.9, probs)
    assert should and k >= 1
