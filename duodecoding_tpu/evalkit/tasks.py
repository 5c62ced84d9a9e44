"""The evaluation task zoo.

Ports of the reference harnesses (reference: eval/):
- mt_bench_noeval — multi-turn MT-Bench generation without the LLM judge,
  per-category tokens/s (eval/eval_mt_bench_noeval.py);
- gsm8k — few-shot chain-of-thought with ``####`` / "answer is" extraction
  accuracy (eval/eval_gsm8k.py:26-60, 173-180);
- humaneval — functional-correctness check by sandboxed execution with a
  3 s timeout (eval/eval_humaneval.py:32);
- cnndm / xsum — summarization with ROUGE (eval/eval_cnndm.py,
  eval/eval_xsum.py);
- specbench — per-sub-domain jsonl suites (eval/eval_specbench.py);
- mixed — multi-task interleave used for online RL training
  (eval/eval_mixed.py).
"""

from __future__ import annotations

import json
import multiprocessing
import re
from typing import List, Optional

from duodecoding_tpu.evalkit.base import (
    EvalTask,
    read_jsonl,
    register_task,
    resolve_data_file,
)

# Fresh few-shot examples (same 3-5-shot protocol as the reference's
# few_shot_examples.py; examples authored for this framework).
GSM8K_FEW_SHOT = [
    (
        "A baker makes 24 rolls and sells 3 trays of 6 rolls each. How many "
        "rolls are left?",
        "The baker sells 3 * 6 = 18 rolls. So 24 - 18 = 6 rolls are left.\n"
        "#### 6",
    ),
    (
        "Tom has 5 boxes with 12 pencils each. He gives away 17 pencils. How "
        "many pencils does he keep?",
        "Tom starts with 5 * 12 = 60 pencils. After giving away 17 he keeps "
        "60 - 17 = 43.\n#### 43",
    ),
    (
        "A train travels 60 miles per hour for 2 hours and then 40 miles per "
        "hour for 3 hours. How far does it travel?",
        "First leg: 60 * 2 = 120 miles. Second leg: 40 * 3 = 120 miles. "
        "Total: 120 + 120 = 240 miles.\n#### 240",
    ),
]

_SYNTH_QUESTIONS = [
    {"question_id": i, "category": "synthetic", "turns": [f"Count from {i} upward."]}
    for i in range(1, 9)
]


def _load_specbench_file(task: EvalTask, sub_domain: str) -> List[dict]:
    return task.load_jsonl_data(f"{sub_domain}.jsonl", synth=_SYNTH_QUESTIONS)


def extract_gsm8k_answer(text: str) -> Optional[str]:
    """`####`-marker extraction with an "answer is" fallback (reference
    eval/eval_gsm8k.py:26-60)."""
    m = re.search(r"####\s*([\-0-9\.,]+)", text)
    if not m:
        m = re.search(r"answer is\s*\$?([\-0-9\.,]+)", text, re.IGNORECASE)
    if not m:
        nums = re.findall(r"[\-0-9\.,]+", text)
        if not nums:
            return None
        m_val = nums[-1]
    else:
        m_val = m.group(1)
    return m_val.strip().rstrip(".").replace(",", "")


@register_task("mt_bench")
class MTBenchNoEval(EvalTask):
    """Single-pass variant: each turn is evaluated independently with the
    chat template (multi-turn context carried between turns)."""

    def load_data(self):
        return self.load_jsonl_data("mt_bench.jsonl", synth=_SYNTH_QUESTIONS)

    def build_prompt(self, item):
        return self.template([(item["turns"][0], None)])

    def run(self, mode: str, **mode_kw):
        # multi-turn: run turn 1, feed the answer back for turn 2
        import numpy as np
        import os, time, json as _json

        from duodecoding_tpu.evalkit.dumper import MetricsAccumulator

        kw = {**self.mode_kwargs, **mode_kw}
        kw.setdefault("use_early_stopping", self.use_early_stopping)
        self.data = self.load_data()
        if self.eval_data_num is not None:
            self.data = self.data[: self.eval_data_num]
        acc = MetricsAccumulator(
            config={"mode": mode, "task": self.name},
            dump_network_stats=self.dump_network_stats,
        )
        os.makedirs(self.exp_dir, exist_ok=True)
        transcript_path = os.path.join(self.exp_dir, f"{mode}_{self.name}.jsonl")
        per_category: dict[str, list[float]] = {}

        if self.data and self.warmup:
            ids = self._encode(self.build_prompt(self.data[0]))
            for _ in range(self.warmup):
                self.engine.run(mode, ids, **kw)

        t0 = time.time()
        with open(transcript_path, "w") as tf:
            for item in self.data:
                turns: list[tuple[str, str | None]] = []
                answers = []
                for user_msg in item["turns"]:
                    turns.append((user_msg, None))
                    ids = self._encode(self.template(turns))
                    out_ids, metrics = self.engine.run(mode, ids, **kw)
                    text = self.postprocess(
                        self._decode_generated(np.asarray(out_ids), ids.shape[1])
                    )
                    answers.append(text)
                    turns[-1] = (user_msg, text)
                    acc.add(metrics)
                    per_category.setdefault(item.get("category", "?"), []).append(
                        metrics["throughput"]
                    )
                tf.write(
                    _json.dumps(
                        {
                            "question_id": item.get("question_id"),
                            "category": item.get("category"),
                            "answers": answers,
                        }
                    )
                    + "\n"
                )

        total = acc.total
        return {
            "task": self.name,
            "mode": mode,
            "n_items": len(self.data),
            "tokens_per_second": total["throughput"],
            "accuracy": None,
            "per_category_tps": {
                c: sum(v) / len(v) for c, v in per_category.items()
            },
            "wall_time": total["wall_time"],
            "harness_time": time.time() - t0,
            "metrics_path": acc.dump(self.exp_dir, mode, self.name),
            "transcript_path": transcript_path,
            "data_source": self.data_source,
        }


@register_task("gsm8k")
class GSM8K(EvalTask):
    num_shots = 3

    def load_data(self):
        path = resolve_data_file("gsm8k.jsonl")
        if path:
            self.data_source = path
            return read_jsonl(path)
        # SpecBench math_reasoning shares the schema (turns + reference)
        path = resolve_data_file("math_reasoning.jsonl")
        if path:
            self.data_source = path
            data = read_jsonl(path)
            return [
                {
                    "question_id": d["question_id"],
                    "question": d["turns"][0],
                    "answer": (d.get("reference") or [""])[0],
                }
                for d in data
            ]
        try:
            from datasets import load_dataset

            ds = load_dataset("gsm8k", "main", split="test")
            self.data_source = "hf:gsm8k"
            return [dict(x) for x in ds]
        except Exception:
            import warnings

            warnings.warn(
                "[evalkit:gsm8k] no gsm8k/math_reasoning data found; "
                "degrading to 8 SYNTHETIC items — results are not "
                "benchmark-comparable"
            )
            self.data_source = "synthetic"
            return [
                {"question_id": i, "question": f"What is {i} + {i}?", "answer": f"#### {2 * i}"}
                for i in range(1, 9)
            ]

    def build_prompt(self, item):
        shots = GSM8K_FEW_SHOT[: self.num_shots]
        turns = [(q, a) for q, a in shots] + [(item["question"], None)]
        return self.template(turns)

    def evaluate(self, items, outputs):
        correct = 0
        graded = 0
        for item, out in zip(items, outputs):
            gold = extract_gsm8k_answer(item.get("answer", "") or "")
            if gold is None:
                continue
            graded += 1
            pred = extract_gsm8k_answer(out)
            if pred is not None and pred == gold:
                correct += 1
        return correct / graded if graded else None


def _exec_check(payload):
    """Run a HumanEval candidate program; used in a subprocess."""
    program, queue = payload
    try:
        exec_globals: dict = {}
        exec(program, exec_globals)
        queue.put("passed")
    except BaseException as e:  # noqa: BLE001
        queue.put(f"failed: {e}")


def check_correctness(problem: dict, completion: str, timeout: float = 3.0) -> bool:
    """Sandboxed functional-correctness check (reference
    eval/eval_humaneval.py:32): candidate + test + entry-point call executed
    in a subprocess with a hard timeout."""
    program = (
        problem["prompt"]
        + completion
        + "\n"
        + problem["test"]
        + "\n"
        + f"check({problem['entry_point']})\n"
    )
    # spawn, not fork: forking a live JAX process can deadlock its threads
    ctx = multiprocessing.get_context("spawn")
    queue = ctx.Queue()
    proc = ctx.Process(target=_exec_check, args=((program, queue),))
    proc.start()
    proc.join(timeout)
    if proc.is_alive():
        proc.terminate()
        proc.join()
        return False
    try:
        return queue.get_nowait() == "passed"
    except Exception:
        return False


@register_task("humaneval")
class HumanEval(EvalTask):
    def load_data(self):
        return self.load_jsonl_data("humaneval.jsonl", synth=[
            {
                "task_id": "Synthetic/0",
                "question_id": 0,
                "prompt": "def add(a, b):\n    \"\"\"Add two numbers.\"\"\"\n",
                "test": "def check(f):\n    assert f(1, 2) == 3\n",
                "entry_point": "add",
            }
        ])

    def build_prompt(self, item):
        return item["prompt"]

    def postprocess(self, text):
        # cut at the first top-level definition/class after the body
        for stop in ("\ndef ", "\nclass ", "\nif __name__", "\nprint("):
            idx = text.find(stop)
            if idx > 0:
                text = text[:idx]
        return text

    def evaluate(self, items, outputs):
        if not items:
            return None
        passed = sum(
            1
            for item, out in zip(items, outputs)
            if "test" in item and check_correctness(item, out)
        )
        graded = sum(1 for item in items if "test" in item)
        return passed / graded if graded else None


class _SummarizationTask(EvalTask):
    dataset_name = ""
    text_key = "article"
    summary_key = "highlights"

    def load_data(self):
        path = resolve_data_file("summarization.jsonl")
        if path:
            self.data_source = path
            data = read_jsonl(path)
            return [
                {
                    "question_id": d["question_id"],
                    "article": d["turns"][0].removeprefix("Summarize: "),
                    "highlights": (d.get("reference") or [""])[0],
                }
                for d in data
            ]
        try:
            import datasets

            ds = datasets.load_dataset(*self.dataset_name, split="test")
            self.data_source = f"hf:{self.dataset_name[0]}"
            return [dict(x) for x in ds]
        except Exception:
            import warnings

            warnings.warn(
                f"[evalkit:{self.name}] no summarization data found; "
                "degrading to 4 SYNTHETIC items"
            )
            self.data_source = "synthetic"
            return [
                {
                    "question_id": i,
                    "article": "The quick brown fox jumps over the lazy dog. " * 5,
                    "highlights": "A fox jumps over a dog.",
                }
                for i in range(4)
            ]

    def build_prompt(self, item):
        article = item[self.text_key]
        return self.template(
            [(f"Summarize the following article in a few sentences:\n{article}", None)]
        )

    def evaluate(self, items, outputs):
        try:
            from rouge_score import rouge_scorer
        except Exception:
            return None
        scorer = rouge_scorer.RougeScorer(["rouge1", "rouge2", "rougeL"], use_stemmer=True)
        scores = []
        for item, out in zip(items, outputs):
            ref = item.get(self.summary_key, "")
            if ref and out:
                s = scorer.score(ref, out)
                scores.append(s["rougeL"].fmeasure)
        return sum(scores) / len(scores) if scores else None


@register_task("cnndm")
class CNNDM(_SummarizationTask):
    dataset_name = ("cnn_dailymail", "3.0.0")
    text_key = "article"
    summary_key = "highlights"


@register_task("xsum")
class XSum(_SummarizationTask):
    dataset_name = ("xsum",)
    text_key = "article"
    summary_key = "highlights"


@register_task("specbench")
class SpecBench(EvalTask):
    sub_domain = "mt_bench"

    def __init__(self, *args, sub_domain: str = "mt_bench", **kw):
        super().__init__(*args, **kw)
        self.sub_domain = sub_domain

    def load_data(self):
        return _load_specbench_file(self, self.sub_domain)

    def build_prompt(self, item):
        return self.template([(item["turns"][0], None)])


@register_task("mixed")
class Mixed(EvalTask):
    """Multi-task interleave for online RL training (reference
    eval/eval_mixed.py): cycles through the SpecBench sub-domains so the RL
    agents see every task one-hot during training."""

    SUB_DOMAINS = ("mt_bench", "math_reasoning", "summarization", "translation", "qa")

    def load_data(self):
        by_cat: dict[str, list] = {}
        for sd in self.SUB_DOMAINS:
            for it in _load_specbench_file(self, sd):
                it = dict(it)
                it["category"] = sd
                by_cat.setdefault(sd, []).append(it)
        # round-robin interleave across sub-domains
        out = []
        while any(by_cat.values()):
            for sd in self.SUB_DOMAINS:
                if by_cat.get(sd):
                    out.append(by_cat[sd].pop(0))
        return out

    def build_prompt(self, item):
        return self.template([(item["turns"][0], None)])

    def run(self, mode: str, **mode_kw):
        # thread the task name through so the RL state one-hot is correct
        summaries = []
        self.data = self.load_data()
        if self.eval_data_num is not None:
            self.data = self.data[: self.eval_data_num]
        data = self.data
        import numpy as np

        from duodecoding_tpu.evalkit.dumper import MetricsAccumulator

        kw = {**self.mode_kwargs, **mode_kw}
        kw.setdefault("use_early_stopping", self.use_early_stopping)
        acc = MetricsAccumulator(config={"mode": mode, "task": self.name})
        if data and self.warmup:
            ids = self._encode(self.build_prompt(data[0]))
            for _ in range(self.warmup):
                self.engine.run(mode, ids, **kw)
        for item in data:
            ids = self._encode(self.build_prompt(item))
            task_kw = dict(kw)
            # map sub-domain to the RL task vocabulary
            cat = item.get("category", "unknown")
            task_kw["task_name"] = {
                "math_reasoning": "gsm8k",
                "summarization": "cnndm",
            }.get(cat, cat)
            out_ids, metrics = self.engine.run(mode, ids, **task_kw)
            acc.add(metrics)
        total = acc.total
        return {
            "task": self.name,
            "mode": mode,
            "n_items": len(data),
            "tokens_per_second": total["throughput"],
            "accuracy": None,
            "wall_time": total["wall_time"],
            "metrics_path": acc.dump(self.exp_dir, mode, self.name),
        }
