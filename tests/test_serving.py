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


def _reference_ar(params, prompt, max_new, int8_kv=False):
    engine = Engine(
        target=Tier(CFG, params),
        config=EngineConfig(
            max_tokens=max_new, max_seq_len=128,
            param_dtype=jnp.float32, cache_dtype=jnp.float32,
            int8_kv_target=int8_kv,
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


def test_batched_int8_kv_matches_engine(params):
    """INT8 KV on the serving path (shared forward): per-row quantized
    caches must reproduce the engine's scalar-length int8 decode exactly."""
    prompts = [[5, 9, 2, 14, 27], [8, 1, 7, 22, 3, 9, 4]]
    server = BatchedServer(
        params, CFG, batch_size=2, max_seq_len=128,
        sampling=SamplingConfig(0.0), dtype=jnp.float32, int8_kv=True,
    )
    for i, p in enumerate(prompts):
        server.submit(Request(i, np.asarray(p, np.int32), max_new_tokens=8))
    stats = server.run_until_drained()
    assert stats["completed"] == 2
    by_id = {r.request_id: r for r in server.completed}
    for i, p in enumerate(prompts):
        ref = _reference_ar(params, p, 8, int8_kv=True)
        np.testing.assert_array_equal(by_id[i].output, ref)


def test_batched_int4_weights_match_engine(params):
    """INT4 weights on the serving path (shared forward kernels): the
    batched server with quantized params matches the engine's INT4 AR."""
    from duodecoding_tpu.models.quant import quantize_params

    qp = quantize_params(params, group_size=32)
    prompts = [[5, 9, 2, 14, 27], [11, 12, 13]]
    server = BatchedServer(
        qp, CFG, batch_size=2, max_seq_len=128,
        sampling=SamplingConfig(0.0), dtype=jnp.float32,
    )
    for i, p in enumerate(prompts):
        server.submit(Request(i, np.asarray(p, np.int32), max_new_tokens=8))
    stats = server.run_until_drained()
    assert stats["completed"] == 2
    by_id = {r.request_id: r for r in server.completed}
    for i, p in enumerate(prompts):
        ref = _reference_ar(qp, p, 8)
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


def test_spec_tree_batched_lossless_vs_sequential(params):
    """Multi-slot TREE speculative serving (spec_tree_batched_step) is
    token-identical to sequential AR per slot at temperature 0."""
    from duodecoding_tpu.serving.scheduler import SpecTreeBatchedServer

    d_params = init_random_params(CFG, jax.random.PRNGKey(3), jnp.float32)
    server = SpecTreeBatchedServer(
        d_params, CFG, params, CFG, tree_spec=(2, 1, 1),
        batch_size=2, max_seq_len=128,
        sampling=SamplingConfig(0.0), dtype=jnp.float32,
    )
    prompts = [
        [5, 9, 2, 14, 27],
        [8, 1, 7, 22, 3, 9, 4],
        [11, 12, 13, 14, 15, 16],
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
    assert server.total_drafted > 0
    assert 0 <= server.total_accepted <= server.total_drafted


def test_spec_tree_batched_int4_int8kv(params):
    """Tree serving with INT4 weights + INT8 KV target stays lossless vs
    the engine's INT4+INT8KV AR."""
    from duodecoding_tpu.models.quant import quantize_params
    from duodecoding_tpu.serving.scheduler import SpecTreeBatchedServer

    qp = quantize_params(params, group_size=32)
    d_params = init_random_params(CFG, jax.random.PRNGKey(3), jnp.float32)
    server = SpecTreeBatchedServer(
        d_params, CFG, qp, CFG, tree_spec=(2, 1),
        batch_size=2, max_seq_len=128,
        sampling=SamplingConfig(0.0), dtype=jnp.float32, int8_kv=True,
    )
    prompts = [[5, 9, 2, 14, 27], [8, 1, 7, 22, 3, 9, 4]]
    for i, p in enumerate(prompts):
        server.submit(Request(i, np.asarray(p, np.int32), max_new_tokens=8))
    stats = server.run_until_drained()
    assert stats["completed"] == 2
    by_id = {r.request_id: r for r in server.completed}
    for i, p in enumerate(prompts):
        ref = _reference_ar(qp, p, 8, int8_kv=True)
        n = min(len(ref), len(by_id[i].output))
        np.testing.assert_array_equal(by_id[i].output[:n], ref[:n])


def test_spec_tree_multistep_lossless(params):
    """Fused multi-iteration tree serving (one dispatch, device-resident
    while) matches sequential AR and never overruns slot deadlines."""
    from duodecoding_tpu.serving.scheduler import SpecTreeBatchedServer

    d_params = init_random_params(CFG, jax.random.PRNGKey(3), jnp.float32)
    server = SpecTreeBatchedServer(
        d_params, CFG, params, CFG, tree_spec=(2, 1, 1),
        batch_size=2, max_seq_len=128, steps_per_dispatch=4,
        sampling=SamplingConfig(0.0), dtype=jnp.float32,
    )
    prompts = [
        [5, 9, 2, 14, 27],
        [8, 1, 7, 22, 3, 9, 4],
        [11, 12, 13, 14, 15, 16],
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
