"""Profiler / debug utility tests."""

import os

import numpy as np
import pytest

from duodecoding_tpu.utils.debug import (
    filter_invalid_tokens,
    log_prob_tensor_if_invalid,
    log_ratio_if_invalid,
)
from duodecoding_tpu.utils.profiler import (
    PerformanceProfiler,
    detect_available_devices,
    log_device_memory,
)


def test_profiler_regions_and_sol():
    prof = PerformanceProfiler(chip="v5e")
    with prof.region("work"):
        sum(range(1000))
    s = prof.summary()
    assert s["work"]["calls"] == 1
    # 819 GB/s -> 1 GB takes ~1.22 ms
    assert prof.speed_of_light(1e9) == pytest.approx(1e9 / 819e9)
    assert prof.speed_of_light(0, 197e12) == pytest.approx(1.0)


def test_debug_checks_gated_by_env(monkeypatch):
    bad = np.array([[0.5, 0.6]])  # sums to 1.1
    monkeypatch.delenv("DUODEC_DEBUG_NUMERICS", raising=False)
    assert not log_prob_tensor_if_invalid(bad, "t")
    monkeypatch.setenv("DUODEC_DEBUG_NUMERICS", "1")
    with pytest.warns(UserWarning):
        assert log_prob_tensor_if_invalid(bad, "t2")
    good = np.array([[0.4, 0.6]])
    assert not log_prob_tensor_if_invalid(good, "t3")
    with pytest.warns(UserWarning):
        assert log_ratio_if_invalid(np.array([1.0]), np.array([0.0]), "r")


def test_filter_invalid_tokens(monkeypatch):
    monkeypatch.setenv("DUODEC_DEBUG_TOKEN_CHECKS", "1")
    with pytest.warns(UserWarning):
        out = filter_invalid_tokens(np.array([1, 5, 999, -2]), vocab_size=100)
    np.testing.assert_array_equal(out, [1, 5])


def test_device_detection_runs():
    mem = log_device_memory()
    assert len(mem) >= 1
    avail = detect_available_devices()
    assert isinstance(avail, list)


def test_sd_alignment_replay_logs_and_detects(monkeypatch):
    """SD-alignment forensics (reference src/debug_logs.py): env-gated
    replay emits [SD-ALIGN] snapshots and flags invariant violations."""
    import numpy as np

    from duodecoding_tpu.utils.debug import log_sd_alignment_replay

    monkeypatch.delenv("DUODEC_DEBUG_SD_ALIGNMENT", raising=False)
    off = log_sd_alignment_replay(
        "sd", 8, 14, np.array([4, 4]), np.array([2, 1]),
        np.array([3, 3]), 2, gamma=4, max_len=64,
    )
    assert off == []

    monkeypatch.setenv("DUODEC_DEBUG_SD_ALIGNMENT", "1")
    ok = log_sd_alignment_replay(
        "sd", 8, 14, np.array([4, 4]), np.array([2, 2]),
        np.array([3, 3]), 2, gamma=4, max_len=64,
    )
    assert len(ok) == 2
    assert all("[SD-ALIGN]" in ln and "note=" not in ln for ln in ok)

    bad = log_sd_alignment_replay(
        "sd", 8, 20, np.array([4, 4]), np.array([5, 2]),
        np.array([6, 3]), 2, gamma=4, max_len=64,
    )
    assert any("INVARIANT-VIOLATION" in ln for ln in bad)
    assert any("MISMATCH" in ln for ln in bad)  # replayed n != reported


def test_sd_mode_emits_alignment_replay(monkeypatch, capsys):
    """The sd mode routes its records through the forensics replay when
    the env gate is on (end-to-end wiring, not just the helper)."""
    import logging

    import numpy as np
    import jax.numpy as jnp

    from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
    from duodecoding_tpu.models import init_random_params, resolve_config

    cfg = resolve_config("test-tiny")
    import jax

    params = init_random_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    dparams = init_random_params(cfg, jax.random.PRNGKey(1), jnp.float32)
    engine = Engine(
        target=Tier(cfg, params), draft=Tier(cfg, dparams),
        config=EngineConfig(
            max_tokens=8, gamma=3, max_seq_len=64,
            param_dtype=jnp.float32, cache_dtype=jnp.float32,
        ),
    )
    monkeypatch.setenv("DUODEC_DEBUG_SD_ALIGNMENT", "1")
    records = []
    h = logging.Handler()
    h.emit = lambda rec: records.append(rec.getMessage())
    logging.getLogger("duodecoding_tpu.sd_align").addHandler(h)
    try:
        engine.run("sd", np.array([[3, 9, 2, 14, 8]]))
    finally:
        logging.getLogger("duodecoding_tpu.sd_align").removeHandler(h)
    assert any("[SD-ALIGN]" in m for m in records)
    assert not any("INVARIANT-VIOLATION" in m for m in records)


def test_sd_mode_inline_alignment_callbacks(monkeypatch):
    """Inline [SD-ALIGN] snapshots stream from INSIDE the device loop via
    jax.debug.callback when DUODEC_DEBUG_SD_ALIGNMENT_INLINE=1 at trace
    time (reference src/debug_logs.py:25 inline-snapshot parity)."""
    import logging

    import numpy as np
    import jax
    import jax.numpy as jnp

    from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
    from duodecoding_tpu.models import init_random_params, resolve_config

    cfg = resolve_config("test-tiny")
    params = init_random_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    dparams = init_random_params(cfg, jax.random.PRNGKey(1), jnp.float32)
    engine = Engine(
        target=Tier(cfg, params), draft=Tier(cfg, dparams),
        config=EngineConfig(
            max_tokens=8, gamma=3, max_seq_len=64,
            param_dtype=jnp.float32, cache_dtype=jnp.float32,
        ),
    )
    monkeypatch.setenv("DUODEC_DEBUG_SD_ALIGNMENT_INLINE", "1")
    jax.clear_caches()  # the gate acts at trace time; drop cached programs
    records = []
    h = logging.Handler()
    h.emit = lambda rec: records.append(rec.getMessage())
    logging.getLogger("duodecoding_tpu.sd_align").addHandler(h)
    try:
        _, m = engine.run("sd", np.array([[3, 9, 2, 14, 8]]))
    finally:
        logging.getLogger("duodecoding_tpu.sd_align").removeHandler(h)
        monkeypatch.delenv("DUODEC_DEBUG_SD_ALIGNMENT_INLINE")
        jax.clear_caches()  # don't leak callback-instrumented programs
    inline = [r for r in records if "stage=post_commit" in r]
    assert len(inline) == m["loop_times"]
    assert all("target(current=" in r for r in inline)
