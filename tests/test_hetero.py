"""Heterogeneous tier placement + pipelined overlap on the virtual mesh:
disjoint device sets, greedy losslessness, acceptance accounting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
from duodecoding_tpu.models import init_random_params, resolve_config
from duodecoding_tpu.models.surgery import scale_residual, truncate_model
from duodecoding_tpu.parallel.hetero import (
    HeteroPlacement,
    hetero_sd_generate,
)

CFG = resolve_config("test-tiny-deep")


@pytest.fixture(scope="module")
def pair():
    params = init_random_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    tp = scale_residual(params, 0.002)  # slice agrees often -> accepts
    dcfg, dp = truncate_model(CFG, tp, 2)
    return tp, dcfg, dp


def test_placement_disjoint():
    pl = HeteroPlacement.split(n_draft_devices=4)
    t = {str(d) for d in pl.target_mesh.devices.flatten()}
    d = {str(d) for d in pl.draft_mesh.devices.flatten()}
    assert len(t) == 4 and len(d) == 4
    assert not (t & d)


def test_hetero_lossless_vs_ar(pair):
    tp, dcfg, dp = pair
    placement = HeteroPlacement.split(n_draft_devices=6)
    t_sharded = placement.place_target(tp, CFG)
    d_placed = placement.place_draft(dp)

    prompt = np.array([[5, 9, 2, 14, 27, 3]], dtype=np.int32)
    out, stats = hetero_sd_generate(
        placement, d_placed, t_sharded, dcfg, CFG, prompt,
        gamma=3, max_new_tokens=16, max_seq_len=128,
        cache_dtype=jnp.float32,
    )
    # AR reference on a single-device engine
    engine = Engine(
        target=Tier(CFG, tp),
        config=EngineConfig(max_tokens=16, max_seq_len=128,
                            param_dtype=jnp.float32,
                            cache_dtype=jnp.float32),
    )
    ar_out, _ = engine.run("large", prompt)
    nmin = min(out.shape[1], ar_out.shape[1])
    np.testing.assert_array_equal(out[0, :nmin], ar_out[0, :nmin])
    assert stats["generated_tokens"] >= 16
    assert stats["accepted"] > 0
    assert not (set(stats["target_devices"]) & set(stats["draft_devices"]))


def test_hetero_rejection_path(pair):
    """A garbage draft still yields correct output (every chunk rejected at
    position 0 -> pure AR via corrections)."""
    tp, dcfg, _ = pair
    bad = init_random_params(CFG, jax.random.PRNGKey(99), jnp.float32)
    bcfg, bp = truncate_model(CFG, bad, 2)
    placement = HeteroPlacement.split(n_draft_devices=6)
    t_sharded = placement.place_target(tp, CFG)
    d_placed = placement.place_draft(bp)
    prompt = np.array([[5, 9, 2, 14, 27, 3]], dtype=np.int32)
    out, stats = hetero_sd_generate(
        placement, d_placed, t_sharded, bcfg, CFG, prompt,
        gamma=3, max_new_tokens=8, max_seq_len=128,
        cache_dtype=jnp.float32,
    )
    engine = Engine(
        target=Tier(CFG, tp),
        config=EngineConfig(max_tokens=8, max_seq_len=128,
                            param_dtype=jnp.float32,
                            cache_dtype=jnp.float32),
    )
    ar_out, _ = engine.run("large", prompt)
    nmin = min(out.shape[1], ar_out.shape[1])
    np.testing.assert_array_equal(out[0, :nmin], ar_out[0, :nmin])
    assert stats["reject_resyncs"] > 0
