"""Eval harness tests with tiny models + byte tokenizer (the reference's
fake-backend test seam, upgraded to tiny real models)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
from duodecoding_tpu.evalkit import MetricsAccumulator, get_task
from duodecoding_tpu.evalkit.tasks import check_correctness, extract_gsm8k_answer
from duodecoding_tpu.models import init_random_params, resolve_config
from duodecoding_tpu.utils import ByteTokenizer, get_tokenizer


@pytest.fixture(scope="module")
def engine():
    d_cfg = resolve_config("test-tiny")
    t_cfg = resolve_config("test-tiny-deep")
    d = Tier(d_cfg, init_random_params(d_cfg, jax.random.PRNGKey(3), jnp.float32))
    t = Tier(t_cfg, init_random_params(t_cfg, jax.random.PRNGKey(7), jnp.float32))
    cfg = EngineConfig(
        max_tokens=8, gamma=2, max_seq_len=256,
        param_dtype=jnp.float32, cache_dtype=jnp.float32,
    )
    return Engine(target=t, draft=d, config=cfg)


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    ids = tok.encode("hello, world")
    assert tok.decode(ids) == "hello, world"
    assert tok("hi", return_tensors="np")["input_ids"].shape[0] == 1


def test_get_tokenizer_fallback():
    tok = get_tokenizer("nonexistent/model-xyz")
    assert isinstance(tok, ByteTokenizer)


def test_gsm8k_answer_extraction():
    assert extract_gsm8k_answer("blah blah\n#### 42") == "42"
    assert extract_gsm8k_answer("The answer is 1,234.") == "1234"
    assert extract_gsm8k_answer("therefore 7 wins. #### 7.") == "7"


def test_humaneval_check_correctness():
    prob = {
        "prompt": "def add(a, b):\n",
        "test": "def check(f):\n    assert f(1, 2) == 3\n",
        "entry_point": "add",
    }
    # generous timeouts: spawn-interpreter startup is slow on loaded CI hosts
    assert check_correctness(prob, "    return a + b\n", timeout=60.0)
    assert not check_correctness(prob, "    return a - b\n", timeout=60.0)
    assert not check_correctness(
        prob, "    import time; time.sleep(300)\n", timeout=8.0
    )


def test_metrics_accumulator_aggregates():
    from duodecoding_tpu.engine.metrics import get_empty_metrics

    acc = MetricsAccumulator(config={"x": 1})
    m1 = get_empty_metrics()
    m1["generated_tokens"] = 10
    m1["wall_time"] = 2.0
    m2 = get_empty_metrics()
    m2["generated_tokens"] = 20
    m2["wall_time"] = 3.0
    acc.add(m1)
    acc.add(m2)
    t = acc.total
    assert t["generated_tokens"] == 30
    assert t["throughput"] == pytest.approx(6.0)
    d = acc.get_save_dict()
    assert d["num_runs"] == 2 and d["config"] == {"x": 1}


@pytest.mark.parametrize("task_name", ["mt_bench", "gsm8k", "specbench"])
def test_task_runs_end_to_end(engine, tmp_path, task_name):
    tok = ByteTokenizer(vocab_size=engine.vocab_size)
    task_cls = get_task(task_name)
    task = task_cls(
        engine, tok, exp_dir=str(tmp_path), eval_data_num=2, warmup=1,
        use_early_stopping=False,
    )
    summary = task.run("sd")
    assert summary["n_items"] == 2
    assert summary["tokens_per_second"] > 0
    assert os.path.exists(summary["metrics_path"])
    with open(summary["metrics_path"]) as f:
        dumped = json.load(f)
    assert dumped["num_runs"] >= 2


def test_humaneval_task_with_synthetic_problem(engine, tmp_path, monkeypatch):
    # force the built-in synthetic problem (random models won't solve it;
    # accuracy just must be computable)
    import duodecoding_tpu.evalkit.base as base

    monkeypatch.setattr(base, "_DATA_DIR_CANDIDATES", ["/nonexistent"])
    tok = ByteTokenizer(vocab_size=engine.vocab_size)
    task = get_task("humaneval")(
        engine, tok, exp_dir=str(tmp_path), eval_data_num=1, warmup=0,
        use_early_stopping=False,
    )
    summary = task.run("large")
    assert summary["accuracy"] is not None
    assert 0.0 <= summary["accuracy"] <= 1.0
