"""Independent accuracy ground-truthing outside the SD engine.

The reference ships a separate vLLM harness (reference:
test/eval_gsm8k_vllm.py:1-303, test/eval_humaneval_vllm.py:1-392) to
verify task accuracy with an engine that shares no code with the
speculative stack. The TPU-framework analog:

- a backend-agnostic harness: any ``generate_fn(prompt_text) -> str`` —
  the bundled one wraps HF transformers (torch CPU) greedy generation, a
  stack with zero code shared with the jnp engine;
- GSM8K: Q/A few-shot prompt construction, gold ``#### n`` extraction and
  prediction extraction with "answer is"/last-number fallbacks, numeric
  comparison (reference test/eval_gsm8k_vllm.py:35-97, 100-128);
- HumanEval: prompt-completion postprocessing (truncate at the next
  top-level definition), sandboxed functional-correctness subprocess with
  timeout, pass@1 (reference test/eval_humaneval_vllm.py:35-118, 265);
- token-identity cross-check of our engine against HF greedy on the same
  checkpoints, for environments where real weights exist.
"""

from __future__ import annotations

import json
import re
from typing import Callable, List, Optional

import numpy as np

ANSWER_TRIGGERS = ("The answer is", "the answer is", "answer is")


def extract_gold_answer(completion: str) -> Optional[str]:
    """Gold GSM8K answers carry a ``#### n`` marker (reference
    test/eval_gsm8k_vllm.py:35-41)."""
    m = re.search(r"####\s*([\-0-9\.,/]+)", completion)
    return _norm_number(m.group(1)) if m else None


def extract_pred_answer(completion: str) -> Optional[str]:
    """Prediction extraction: ``####`` marker, then "answer is", then the
    last number in the text (reference test/eval_gsm8k_vllm.py:43-82)."""
    m = re.search(r"####\s*([\-0-9\.,/]+)", completion)
    if m:
        return _norm_number(m.group(1))
    for trig in ANSWER_TRIGGERS:
        idx = completion.rfind(trig)
        if idx >= 0:
            tail = completion[idx + len(trig):]
            m = re.search(r"[\-0-9\.,/]+", tail)
            if m:
                return _norm_number(m.group(0))
    nums = re.findall(r"-?\d[\d,]*\.?\d*", completion)
    return _norm_number(nums[-1]) if nums else None


def _norm_number(s: str) -> Optional[str]:
    s = s.strip().rstrip(".").replace(",", "").replace("$", "")
    if not s or s in ("-", "."):
        return None
    try:
        v = float(s)
    except ValueError:
        return None
    return str(int(v)) if v == int(v) else str(v)


def is_correct(pred_text: str, gold_answer: str) -> bool:
    gold = extract_gold_answer(gold_answer)
    if gold is None:
        gold = _norm_number(gold_answer)
    pred = extract_pred_answer(pred_text)
    return pred is not None and gold is not None and pred == gold


def build_gsm8k_prompt(question: str, num_shots: int = 3) -> str:
    """Q:/A: few-shot prompt (reference test/eval_gsm8k_vllm.py:100-128).
    Shots come from the harness's own few-shot pool."""
    from duodecoding_tpu.evalkit.tasks import GSM8K_FEW_SHOT

    parts = []
    for q, a in GSM8K_FEW_SHOT[:num_shots]:
        parts.append(f"Q: {q}\nA: {a}\n")
    parts.append(f"Q: {question}\nA:")
    return "\n".join(parts)


def eval_gsm8k(
    generate_fn: Callable[[str], str],
    items: List[dict],
    *,
    num_shots: int = 3,
    output_file: Optional[str] = None,
) -> dict:
    """Accuracy over GSM8K-schema items ({question, answer})."""
    records = []
    correct = 0
    graded = 0
    for item in items:
        gold = item.get("answer", "") or ""
        if extract_gold_answer(gold) is None and _norm_number(gold) is None:
            continue
        prompt = build_gsm8k_prompt(item["question"], num_shots)
        text = generate_fn(prompt)
        # cut at the next question the model may hallucinate
        text = text.split("\nQ:")[0]
        ok = is_correct(text, gold)
        graded += 1
        correct += int(ok)
        records.append(
            {
                "question": item["question"],
                "output": text,
                "extracted_gold": extract_gold_answer(gold) or _norm_number(gold),
                "extracted_pred": extract_pred_answer(text),
                "correct": ok,
            }
        )
    result = {
        "task": "gsm8k",
        "n": graded,
        "accuracy": correct / graded if graded else None,
    }
    if output_file:
        with open(output_file, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
        result["records_path"] = output_file
    return result


def postprocess_completion(completion: str) -> str:
    """Truncate a HumanEval completion at the next top-level statement
    (reference test/eval_humaneval_vllm.py:80-117)."""
    for stop in ("\ndef ", "\nclass ", "\nif __name__", "\nprint(", "\n#"):
        idx = completion.find(stop)
        if idx > 0:
            completion = completion[:idx]
    return completion


def eval_humaneval(
    generate_fn: Callable[[str], str],
    items: List[dict],
    *,
    timeout: float = 20.0,
    output_file: Optional[str] = None,
) -> dict:
    """pass@1 over HumanEval-schema items ({prompt, test, entry_point})
    via the sandboxed subprocess checker (shared with the in-engine task;
    reference test/eval_humaneval_vllm.py:35-78, 265). The timeout covers
    the spawned child's interpreter startup too (it re-imports heavy
    modules), so it is far larger than the reference's 3 s execution cap."""
    from duodecoding_tpu.evalkit.tasks import check_correctness

    records = []
    passed = 0
    graded = 0
    for item in items:
        if "test" not in item:
            continue
        completion = postprocess_completion(generate_fn(item["prompt"]))
        ok = check_correctness(item, completion, timeout=timeout)
        graded += 1
        passed += int(ok)
        records.append(
            {
                "task_id": item.get("task_id"),
                "completion": completion,
                "passed": ok,
            }
        )
    result = {
        "task": "humaneval",
        "n": graded,
        "pass@1": passed / graded if graded else None,
    }
    if output_file:
        with open(output_file, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
        result["records_path"] = output_file
    return result


# --------------------------------------------------------------------------
# Backends
# --------------------------------------------------------------------------


def hf_text_backend(model, tokenizer, max_new_tokens: int = 256):
    """generate_fn over HF transformers greedy decoding (torch CPU) — an
    implementation stack fully independent of the jnp engine."""

    def generate(prompt: str) -> str:
        import torch

        ids = tokenizer(prompt, return_tensors="pt")["input_ids"]
        with torch.no_grad():
            out = model.generate(
                ids,
                max_new_tokens=max_new_tokens,
                do_sample=False,
                num_beams=1,
                pad_token_id=getattr(tokenizer, "eos_token_id", 0) or 0,
            )
        return tokenizer.decode(
            out[0, ids.shape[1]:], skip_special_tokens=True
        )

    return generate


def engine_text_backend(engine, tokenizer, mode: str = "large", **mode_kw):
    """generate_fn over a framework engine mode — lets the same accuracy
    protocol grade speculative modes for parity checks."""

    def generate(prompt: str) -> str:
        ids = tokenizer(prompt, return_tensors="np")["input_ids"].astype(
            np.int32
        )
        out, _ = engine.run(mode, ids, **mode_kw)
        gen = np.asarray(out)[0, ids.shape[1]:]
        eos = getattr(tokenizer, "eos_token_id", None)
        if eos is not None:
            hits = np.nonzero(gen == eos)[0]
            if hits.size:
                gen = gen[: hits[0]]
        return tokenizer.decode(gen, skip_special_tokens=True)

    return generate


def hf_greedy_generate(
    model, input_ids: np.ndarray, max_new_tokens: int,
    eos_token_id: Optional[int] = None,
) -> np.ndarray:
    """Greedy token generation via HF transformers (torch, CPU)."""
    import torch

    with torch.no_grad():
        out = model.generate(
            torch.tensor(input_ids, dtype=torch.long),
            max_new_tokens=max_new_tokens,
            do_sample=False,
            num_beams=1,
            eos_token_id=eos_token_id,
            pad_token_id=eos_token_id if eos_token_id is not None else 0,
        )
    return out.numpy()


def cross_check_greedy(
    hf_model,
    engine,
    prompts: List[np.ndarray],
    max_new_tokens: int,
    mode: str = "large",
) -> dict:
    """Run the same prompts through HF generate and the engine's mode;
    return prefix-agreement statistics (1.0 = token-identical)."""
    from duodecoding_tpu.orchestrate.consistency import prefix_consistency

    ours, theirs = [], []
    for p in prompts:
        p = np.asarray(p, np.int64)
        hf_out = hf_greedy_generate(hf_model, p[None, :], max_new_tokens)
        out, _ = engine.run(mode, p[None, :].astype(np.int32))
        theirs.append(" ".join(str(t) for t in hf_out[0]))
        ours.append(" ".join(str(t) for t in np.asarray(out)[0]))
    return {
        "n_prompts": len(prompts),
        "prefix_consistency": prefix_consistency(ours, theirs),
    }


def task_metric_parity(
    hf_model,
    variants: dict,
    prompts: List[np.ndarray],
    max_new_tokens: int,
) -> dict:
    """END-TASK metric parity across engine variants vs the independent
    HF stack (the BASELINE.json "accuracy parity" clause, measured within
    sandbox limits — no real checkpoints, so the GOLD label is the HF
    greedy output's own extracted answer and the metric is per-variant
    agreement with it through the real GSM8K extraction machinery).

    ``variants``: name -> (engine, mode, mode_kwargs). Token ids are
    rendered as whitespace-separated decimal strings (the sandbox has no
    tokenizer), which the ``####``/last-number extraction consumes like
    any other completion text.

    All outputs are compared over the SAME horizon (exactly
    ``max_new_tokens`` new tokens): tree/beam/staged modes may legally
    overshoot ``max_tokens`` by part of an accepted window, and the
    last-number extraction is horizon-sensitive, so unequal lengths
    would register as false metric disagreements.

    Returns per-variant ``task_metric_agreement`` (extracted-answer
    match rate vs HF), ``prefix_consistency`` (token identity vs HF),
    and ``lossless_vs_own_ar`` (exact token identity vs the SAME
    engine's `large` output — the in-framework greedy-losslessness
    contract). For quantized engines (INT8 KV target) the HF columns
    measure quantization fidelity against the fp32 gold, while
    ``lossless_vs_own_ar`` isolates the decoding stack: 1.0 there means
    any HF divergence is the bit-width, not speculation."""
    from duodecoding_tpu.orchestrate.consistency import prefix_consistency

    def render(ids) -> str:
        return " ".join(str(int(t)) for t in ids)

    golds, hf_texts = [], []
    for p in prompts:
        p64 = np.asarray(p, np.int64)
        hf_out = hf_greedy_generate(hf_model, p64[None, :], max_new_tokens)
        tail = hf_out[0][len(p):][:max_new_tokens]
        hf_texts.append(render(np.concatenate([p64, tail])))
        golds.append(extract_pred_answer(render(tail)))

    report = {
        "gold_backend": "hf-transformers-torch-greedy",
        "n_prompts": len(prompts),
        "max_new_tokens": max_new_tokens,
        "variants": {},
    }
    ar_cache: dict = {}

    def own_ar_tail(engine, p) -> np.ndarray:
        key = (id(engine), p.tobytes())
        if key not in ar_cache:
            out, _ = engine.run("large", np.asarray(p, np.int32)[None, :])
            ar_cache[key] = np.asarray(out)[0][len(p):][:max_new_tokens]
        return ar_cache[key]

    for name, (engine, mode, kw) in variants.items():
        preds, texts = [], []
        lossless = 0
        for p in prompts:
            out, _ = engine.run(
                mode, np.asarray(p, np.int32)[None, :], **kw
            )
            ids = np.asarray(out)[0]
            tail = ids[len(p):][:max_new_tokens]
            texts.append(render(np.concatenate([ids[: len(p)], tail])))
            preds.append(extract_pred_answer(render(tail)))
            ar_tail = own_ar_tail(engine, p)
            n = min(len(tail), len(ar_tail))
            lossless += int(
                n > 0 and np.array_equal(tail[:n], ar_tail[:n])
            )
        agree = sum(
            1 for g, q in zip(golds, preds) if g is not None and g == q
        ) / max(len(prompts), 1)
        report["variants"][name] = {
            "task_metric_agreement": agree,
            "prefix_consistency": prefix_consistency(texts, hf_texts),
            "lossless_vs_own_ar": lossless / max(len(prompts), 1),
        }
    return report
