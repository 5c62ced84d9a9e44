"""Evaluation task base class.

Port of the reference's ``Eval`` ABC + per-task harness pattern
(reference: eval/eval.py:8, eval/eval_mt_bench_noeval.py): each task loads
its dataset, builds prompts, runs the selected decoding mode per item,
accumulates the DecodingMetrics contract, writes generation transcripts as
JSONL and a metrics JSON, and computes a task accuracy where defined.

Data resolution: ``data_dir`` (default $DUODEC_DATA_DIR, then ./data, then
the mounted reference datasets) → HF datasets hub → small built-in
synthetic samples, so the harness runs end-to-end in offline environments.
"""

from __future__ import annotations

import abc
import json
import os
import time
from typing import Any, Dict, List, Optional

import numpy as np

from duodecoding_tpu.evalkit.dumper import MetricsAccumulator
from duodecoding_tpu.evalkit.templates import get_template

_DATA_DIR_CANDIDATES = [
    os.environ.get("DUODEC_DATA_DIR", ""),
    "data",
    "/root/reference/data",
]

_TASKS: Dict[str, type] = {}


def register_task(name: str):
    def deco(cls):
        _TASKS[name] = cls
        cls.name = name
        return cls

    return deco


def get_task(name: str) -> type:
    if name not in _TASKS:
        raise KeyError(f"unknown eval task {name!r}; known: {sorted(_TASKS)}")
    return _TASKS[name]


def resolve_data_file(filename: str) -> Optional[str]:
    for d in _DATA_DIR_CANDIDATES:
        if d and os.path.exists(os.path.join(d, filename)):
            return os.path.join(d, filename)
    return None


def read_jsonl(path: str) -> List[dict]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


class EvalTask(abc.ABC):
    name = "base"

    def __init__(
        self,
        engine,
        tokenizer,
        *,
        exp_dir: str = "exp/run",
        eval_data_num: Optional[int] = None,
        template: str = "plain",
        dump_network_stats: bool = False,
        use_early_stopping: bool = True,
        warmup: int = 2,
        mode_kwargs: Optional[dict] = None,
    ):
        self.engine = engine
        self.tokenizer = tokenizer
        self.exp_dir = exp_dir
        self.eval_data_num = eval_data_num
        self.template = get_template(template)
        self.dump_network_stats = dump_network_stats
        self.use_early_stopping = use_early_stopping
        self.warmup = warmup
        self.mode_kwargs = mode_kwargs or {}
        eos = getattr(tokenizer, "eos_token_id", None)
        if eos is not None and use_early_stopping:
            engine.config.eos_ids = (int(eos),)
        self.data: List[dict] = []
        self.data_source: str = "unknown"

    def load_jsonl_data(self, *filenames: str, synth: List[dict]) -> List[dict]:
        """Resolve the first available data file; degrade LOUDLY to the
        synthetic sample otherwise (the reference vendors its datasets in
        data/*.jsonl — this repo ships the same files under ./data; a
        synthetic fallback keeps offline smoke runs alive but is flagged
        in every summary via ``data_source``)."""
        import warnings

        for fn in filenames:
            path = resolve_data_file(fn)
            if path:
                self.data_source = path
                return read_jsonl(path)
        warnings.warn(
            f"[evalkit:{self.name}] none of {filenames} found in any data "
            f"dir ({[d for d in _DATA_DIR_CANDIDATES if d]}); degrading to "
            f"{len(synth)} SYNTHETIC items — results are not "
            "benchmark-comparable",
            stacklevel=2,
        )
        self.data_source = "synthetic"
        return list(synth)

    # -- per-task hooks ---------------------------------------------------
    @abc.abstractmethod
    def load_data(self) -> List[dict]: ...

    @abc.abstractmethod
    def build_prompt(self, item: dict) -> str: ...

    def postprocess(self, text: str) -> str:
        return text.strip()

    def evaluate(self, items: List[dict], outputs: List[str]) -> Optional[float]:
        """Task accuracy (None when the task has no automatic metric)."""
        return None

    # -- shared driver ----------------------------------------------------
    def _encode(self, prompt: str) -> np.ndarray:
        ids = self.tokenizer(prompt, return_tensors="np")["input_ids"]
        max_prompt = (
            self.engine.config.max_seq_len
            - self.engine.config.max_tokens
            - self.engine.config.gamma1
            - self.engine.config.gamma2
            - 4
        )
        if ids.shape[1] > max_prompt:
            ids = ids[:, -max_prompt:]
        min_prompt = self.engine.config.gamma1 + self.engine.config.gamma2 + 2
        if ids.shape[1] < min_prompt:
            pad = np.full(
                (1, min_prompt - ids.shape[1]),
                getattr(self.tokenizer, "bos_token_id", 1) or 1,
                dtype=ids.dtype,
            )
            ids = np.concatenate([pad, ids], axis=1)
        return ids.astype(np.int32)

    def _decode_generated(self, out_ids: np.ndarray, prompt_len: int) -> str:
        gen = out_ids[0, prompt_len:]
        eos = getattr(self.tokenizer, "eos_token_id", None)
        if eos is not None:
            hits = np.nonzero(gen == eos)[0]
            if hits.size:
                gen = gen[: hits[0]]
        return self.tokenizer.decode(gen, skip_special_tokens=True)

    def run(self, mode: str, **mode_kw) -> Dict[str, Any]:
        kw = {**self.mode_kwargs, **mode_kw}
        kw.setdefault("use_early_stopping", self.use_early_stopping)
        self.data = self.load_data()
        if self.eval_data_num is not None:
            self.data = self.data[: self.eval_data_num]

        acc = MetricsAccumulator(
            config={"mode": mode, "task": self.name, **{k: str(v) for k, v in kw.items()}},
            dump_network_stats=self.dump_network_stats,
        )
        os.makedirs(self.exp_dir, exist_ok=True)
        transcript_path = os.path.join(self.exp_dir, f"{mode}_{self.name}.jsonl")

        # warmup (compile) on the first item
        if self.data and self.warmup:
            ids = self._encode(self.build_prompt(self.data[0]))
            for _ in range(self.warmup):
                self.engine.run(mode, ids, **kw)

        outputs: List[str] = []
        t_start = time.time()
        with open(transcript_path, "w") as tf:
            for item in self.data:
                prompt = self.build_prompt(item)
                ids = self._encode(prompt)
                out_ids, metrics = self.engine.run(mode, ids, **kw)
                text = self.postprocess(
                    self._decode_generated(np.asarray(out_ids), ids.shape[1])
                )
                outputs.append(text)
                acc.add(metrics)
                tf.write(
                    json.dumps(
                        {
                            "question_id": item.get("question_id"),
                            "category": item.get("category", self.name),
                            "output": text,
                            "throughput": metrics["throughput"],
                            "generated_tokens": metrics["generated_tokens"],
                        }
                    )
                    + "\n"
                )

        accuracy = self.evaluate(self.data, outputs)
        total = acc.total
        total["accuracy"] = accuracy
        summary = {
            "task": self.name,
            "mode": mode,
            "n_items": len(self.data),
            "tokens_per_second": total["throughput"],
            "accuracy": accuracy,
            "wall_time": total["wall_time"],
            "harness_time": time.time() - t_start,
            "metrics_path": acc.dump(self.exp_dir, mode, self.name),
            "transcript_path": transcript_path,
            "data_source": self.data_source,
        }
        return summary
