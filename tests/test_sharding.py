"""Multi-device sharding tests on the virtual 8-CPU mesh: TP parity of the
forward pass, sharded SD generation, and the dryrun entry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.models import (
    forward,
    init_cache,
    init_random_params,
    resolve_config,
)
from duodecoding_tpu.parallel import make_mesh, shard_cache, shard_params

CFG = resolve_config("test-tiny")  # 2 kv heads -> model axis up to 2


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return make_mesh(model_axis=2, data_axis=4)


def test_tp_forward_matches_single_device(mesh):
    params = init_random_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    tokens = jnp.array([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)
    cache = init_cache(CFG, 1, 16, jnp.float32)
    ref_logits, ref_cache = forward(params, CFG, tokens, cache)

    with mesh:
        sp = shard_params(params, CFG, mesh)
        sc = shard_cache(init_cache(CFG, 1, 16, jnp.float32), mesh)
        sh_logits, sh_cache = jax.jit(
            lambda p, t, c: forward(p, CFG, t, c)
        )(sp, tokens, sc)

    np.testing.assert_allclose(
        np.asarray(sh_logits), np.asarray(ref_logits), atol=1e-4, rtol=1e-4
    )
    assert int(sh_cache.length) == int(ref_cache.length)


def test_sharded_sd_generation_runs(mesh):
    from duodecoding_tpu.engine.loops import prefill, sd_generate
    from duodecoding_tpu.engine.sampling_config import SamplingConfig

    t_params = init_random_params(CFG, jax.random.PRNGKey(7), jnp.float32)
    d_params = init_random_params(CFG, jax.random.PRNGKey(3), jnp.float32)
    S = 64
    tokens = jnp.zeros((1, S), jnp.int32).at[0, :8].set(jnp.arange(1, 9))
    with mesh:
        tp = shard_params(t_params, CFG, mesh)
        dp = shard_params(d_params, CFG, mesh)
        d_cache = shard_cache(init_cache(CFG, 1, S, jnp.float32), mesh)
        t_cache = shard_cache(init_cache(CFG, 1, S, jnp.float32), mesh)
        d_cache = prefill(dp, CFG, d_cache, tokens[:, :8])
        t_cache = prefill(tp, CFG, t_cache, tokens[:, :8])
        out_tokens, n, *_ = sd_generate(
            dp,
            tp,
            tokens,
            jnp.int32(8),
            d_cache,
            t_cache,
            jax.random.PRNGKey(2),
            draft_cfg=CFG,
            target_cfg=CFG,
            gamma=3,
            draft_sampling=SamplingConfig(0.0),
            target_sampling=SamplingConfig(0.0),
            max_new_tokens=8,
        )
    assert int(n) == 16

    # parity with unsharded run (rebuild tokens: the first call donated it)
    tokens = jnp.zeros((1, S), jnp.int32).at[0, :8].set(jnp.arange(1, 9))
    d_cache2 = init_cache(CFG, 1, S, jnp.float32)
    t_cache2 = init_cache(CFG, 1, S, jnp.float32)
    d_cache2 = prefill(d_params, CFG, d_cache2, tokens[:, :8])
    t_cache2 = prefill(t_params, CFG, t_cache2, tokens[:, :8])
    ref_tokens, ref_n, *_ = sd_generate(
        d_params,
        t_params,
        tokens,
        jnp.int32(8),
        d_cache2,
        t_cache2,
        jax.random.PRNGKey(2),
        draft_cfg=CFG,
        target_cfg=CFG,
        gamma=3,
        draft_sampling=SamplingConfig(0.0),
        target_sampling=SamplingConfig(0.0),
        max_new_tokens=8,
    )
    np.testing.assert_array_equal(
        np.asarray(out_tokens[0, :16]), np.asarray(ref_tokens[0, :16])
    )


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
