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
