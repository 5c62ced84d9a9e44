"""Continuous-batching server tests: per-slot correctness vs sequential AR,
admission/retirement, occupancy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
from duodecoding_tpu.engine.sampling_config import SamplingConfig
from duodecoding_tpu.models import init_random_params, resolve_config
from duodecoding_tpu.serving import BatchedServer, Request

CFG = resolve_config("test-tiny")


@pytest.fixture(scope="module")
def params():
    return init_random_params(CFG, jax.random.PRNGKey(7), jnp.float32)


def _reference_ar(params, prompt, max_new):
    engine = Engine(
        target=Tier(CFG, params),
        config=EngineConfig(
            max_tokens=max_new, max_seq_len=128,
            param_dtype=jnp.float32, cache_dtype=jnp.float32,
        ),
    )
    out, _ = engine.run("large", np.asarray(prompt)[None, :])
    return np.asarray(out[0])


def test_batched_matches_sequential_greedy(params):
    prompts = [
        [5, 9, 2, 14, 27],
        [8, 1, 7, 22, 3, 9, 4],
        [11, 12, 13],
    ]
    server = BatchedServer(
        params, CFG, batch_size=4, max_seq_len=128,
        sampling=SamplingConfig(0.0), dtype=jnp.float32,
    )
    for i, p in enumerate(prompts):
        server.submit(Request(i, np.asarray(p, np.int32), max_new_tokens=10))
    stats = server.run_until_drained()
    assert stats["completed"] == 3
    assert stats["generated_tokens"] == 30
    by_id = {r.request_id: r for r in server.completed}
    for i, p in enumerate(prompts):
        ref = _reference_ar(params, p, 10)
        np.testing.assert_array_equal(by_id[i].output, ref)


def test_continuous_admission_refills_slots(params):
    server = BatchedServer(
        params, CFG, batch_size=2, max_seq_len=128,
        sampling=SamplingConfig(0.0), dtype=jnp.float32,
    )
    for i in range(5):
        server.submit(
            Request(i, np.array([3 + i, 9, 2, 14], np.int32), max_new_tokens=6)
        )
    stats = server.run_until_drained()
    assert stats["completed"] == 5
    # with 2 slots and 5 requests, occupancy must exceed 1 slot on average
    assert stats["mean_batch_occupancy"] > 1.0
    assert all(r.n_generated == 6 for r in server.completed)


def test_spec_batched_lossless_vs_sequential(params):
    from duodecoding_tpu.serving.scheduler import SpecBatchedServer

    d_params = init_random_params(CFG, jax.random.PRNGKey(3), jnp.float32)
    server = SpecBatchedServer(
        d_params, CFG, params, CFG, gamma=3,
        batch_size=2, max_seq_len=128,
        sampling=SamplingConfig(0.0), dtype=jnp.float32,
    )
    prompts = [
        [5, 9, 2, 14, 27],
        [8, 1, 7, 22, 3, 9, 4],
        [11, 12, 13, 14],
    ]
    for i, p in enumerate(prompts):
        server.submit(Request(i, np.asarray(p, np.int32), max_new_tokens=10))
    stats = server.run_until_drained()
    assert stats["completed"] == 3
    by_id = {r.request_id: r for r in server.completed}
    for i, p in enumerate(prompts):
        ref = _reference_ar(params, p, 10)
        n = min(len(ref), len(by_id[i].output))
        np.testing.assert_array_equal(by_id[i].output[:n], ref[:n])
        assert by_id[i].n_generated >= 10
    # speculation happened and some drafts were accepted
    assert server.total_drafted > 0
    assert 0 <= server.total_accepted <= server.total_drafted


def test_multistep_server_matches_sequential(params):
    from duodecoding_tpu.serving.scheduler import MultiStepBatchedServer

    server = MultiStepBatchedServer(
        params, CFG, batch_size=2, max_seq_len=128,
        sampling=SamplingConfig(0.0), dtype=jnp.float32,
        steps_per_dispatch=4,
    )
    prompts = [[5, 9, 2, 14, 27], [8, 1, 7, 22, 3, 9, 4], [11, 12, 13]]
    for i, p in enumerate(prompts):
        server.submit(Request(i, np.asarray(p, np.int32), max_new_tokens=10))
    stats = server.run_until_drained()
    assert stats["completed"] == 3
    by_id = {r.request_id: r for r in server.completed}
    for i, p in enumerate(prompts):
        ref = _reference_ar(params, p, 10)
        np.testing.assert_array_equal(by_id[i].output, ref)
        assert by_id[i].n_generated == 10
