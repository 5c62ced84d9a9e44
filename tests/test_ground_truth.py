"""Independent accuracy harness + MT-Bench judge: extraction parity,
pass@1 execution, offline judge skip, loud data_source reporting."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
from duodecoding_tpu.models import init_random_params, resolve_config


@pytest.fixture(scope="module")
def engine():
    t_cfg = resolve_config("test-tiny-deep")
    t = Tier(t_cfg, init_random_params(t_cfg, jax.random.PRNGKey(7), jnp.float32))
    cfg = EngineConfig(
        max_tokens=8, max_seq_len=256,
        param_dtype=jnp.float32, cache_dtype=jnp.float32,
    )
    return Engine(target=t, config=cfg)


from duodecoding_tpu.evalkit.ground_truth import (
    build_gsm8k_prompt,
    eval_gsm8k,
    eval_humaneval,
    extract_gold_answer,
    extract_pred_answer,
    is_correct,
    postprocess_completion,
)
from duodecoding_tpu.evalkit.judge import extract_rating


def test_gold_extraction():
    assert extract_gold_answer("blah blah\n#### 42") == "42"
    assert extract_gold_answer("x #### 1,234.") == "1234"
    assert extract_gold_answer("no marker") is None


def test_pred_extraction_fallbacks():
    assert extract_pred_answer("so #### 7") == "7"
    assert extract_pred_answer("The answer is 12.") == "12"
    assert extract_pred_answer("we get 3 then 5 and finally 9") == "9"
    assert extract_pred_answer("$1,000 total. The answer is $1,000") == "1000"
    assert extract_pred_answer("") is None


def test_is_correct_numeric_compare():
    assert is_correct("The answer is 42.0", "#### 42")
    assert not is_correct("The answer is 41", "#### 42")


def test_eval_gsm8k_with_scripted_backend(tmp_path):
    items = [
        {"question": "1+1?", "answer": "#### 2"},
        {"question": "2+2?", "answer": "#### 4"},
        {"question": "3+3?", "answer": "#### 6"},
    ]

    def fake_gen(prompt):
        # answers the last Q correctly for 2 of 3
        if "1+1" in prompt:
            return " The answer is 2"
        if "2+2" in prompt:
            return " I think 5"
        return " #### 6"

    out = tmp_path / "gsm8k.jsonl"
    res = eval_gsm8k(fake_gen, items, output_file=str(out))
    assert res["n"] == 3
    assert res["accuracy"] == pytest.approx(2 / 3)
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    assert recs[1]["correct"] is False
    assert recs[0]["extracted_pred"] == "2"


def test_gsm8k_prompt_has_shots():
    p = build_gsm8k_prompt("What is 5+5?", num_shots=2)
    assert p.count("Q:") == 3
    assert p.endswith("A:")


def test_eval_humaneval_pass_at_1(tmp_path):
    items = [
        {
            "task_id": "T/0",
            "prompt": "def add(a, b):\n",
            "test": "def check(f):\n    assert f(1, 2) == 3\n",
            "entry_point": "add",
        },
        {
            "task_id": "T/1",
            "prompt": "def sub(a, b):\n",
            "test": "def check(f):\n    assert f(3, 2) == 1\n",
            "entry_point": "sub",
        },
    ]

    def fake_gen(prompt):
        if "add" in prompt:
            return "    return a + b\n\ndef main():\n    pass\n"
        return "    return a * b\n"  # wrong

    res = eval_humaneval(fake_gen, items, output_file=str(tmp_path / "he.jsonl"))
    assert res["n"] == 2
    assert res["pass@1"] == pytest.approx(0.5)


def test_postprocess_truncates():
    c = "    return 1\n\ndef other():\n    pass"
    assert postprocess_completion(c) == "    return 1\n"


def test_rating_extraction():
    assert extract_rating("Good answer. Rating: [[8]]") == 8.0
    assert extract_rating("Rating: 7") == 7.0
    assert extract_rating("[[9.5]]") == 9.5
    assert extract_rating("no rating here") is None
    assert extract_rating("[[99]]") is None


def test_judge_task_skips_offline(engine, tmp_path, monkeypatch):
    from duodecoding_tpu.evalkit import get_task
    from duodecoding_tpu.utils import get_tokenizer

    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    tok = get_tokenizer(None, vocab_size=engine.vocab_size)
    task = get_task("mt_bench_judge")(
        engine, tok, exp_dir=str(tmp_path), eval_data_num=1, warmup=0
    )
    summary = task.run("large")
    assert summary["judge"] == "skipped (no OPENAI_API_KEY)"
    assert summary["judge_mean_rating"] is None
    assert "data_source" in summary


def test_data_source_reported(engine, tmp_path):
    from duodecoding_tpu.evalkit import get_task
    from duodecoding_tpu.utils import get_tokenizer

    tok = get_tokenizer(None, vocab_size=engine.vocab_size)
    task = get_task("gsm8k")(
        engine, tok, exp_dir=str(tmp_path), eval_data_num=1, warmup=0
    )
    summary = task.run("large")
    # repo ships data/ — a real file must resolve (not synthetic)
    assert summary["data_source"] != "synthetic"


def test_synthetic_fallback_warns(engine, tmp_path, monkeypatch):
    import warnings

    from duodecoding_tpu.evalkit import base as eb
    from duodecoding_tpu.evalkit import get_task
    from duodecoding_tpu.utils import get_tokenizer

    monkeypatch.setattr(eb, "_DATA_DIR_CANDIDATES", ["/nonexistent"])
    tok = get_tokenizer(None, vocab_size=engine.vocab_size)
    task = get_task("mt_bench")(
        engine, tok, exp_dir=str(tmp_path), eval_data_num=1, warmup=0
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        task.load_data()
    assert any("SYNTHETIC" in str(x.message) for x in w)
    assert task.data_source == "synthetic"


def test_task_metric_parity_tiny_hf():
    """End-task metric parity vs the independent HF stack (the
    ACCURACY_PARITY.json artifact's machinery, tools/accuracy_parity.py)."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    import jax
    import jax.numpy as jnp

    from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
    from duodecoding_tpu.evalkit.ground_truth import task_metric_parity
    from duodecoding_tpu.models.loader import (
        config_from_hf,
        params_from_hf_state_dict,
    )
    from duodecoding_tpu.models.surgery import truncate_model

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
    )
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, "tiny")
    params = params_from_hf_state_dict(cfg, model.state_dict(), jnp.float32)
    dcfg, dparams = truncate_model(cfg, params, 1)
    engine = Engine(
        target=Tier(cfg, params), draft=Tier(dcfg, dparams),
        config=EngineConfig(
            max_tokens=8, gamma=2, max_seq_len=64,
            param_dtype=jnp.float32, cache_dtype=jnp.float32,
        ),
    )
    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, cfg.vocab_size, 7) for _ in range(2)]
    rep = task_metric_parity(
        model, {"ar": (engine, "large", {}), "sd": (engine, "sd", {})},
        prompts, max_new_tokens=8,
    )
    for v in rep["variants"].values():
        assert v["task_metric_agreement"] == 1.0
        assert v["prefix_consistency"] == 1.0
