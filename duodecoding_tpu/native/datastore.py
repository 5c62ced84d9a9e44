"""Datastore build pipeline for REST retrieval drafting.

Equivalent of the reference's datastore builder
(reference: src/model/rest/datastore/get_datastore_chat.py — tokenizes a
chat corpus and streams the sequences into the Rust ``Writer``): here the
corpus is any set of jsonl files (by default the repo's task data under
``data/``), tokenized with the active tokenizer and streamed into the C++
suffix-array ``DraftWriter`` (native/draft_retriever.cpp). Zero-egress
sandboxes have no ShareGPT dump, so the task jsonls — prompts plus any
reference answers — are the self-build corpus; the pipeline is identical
for a real corpus file.

CLI integration: ``--eval_mode rest|rest_tree`` auto-builds a store for
the task when ``--datastore`` is absent or points to a missing file (and
saves it there for reuse); see cli.py::resolve_datastore.
"""

from __future__ import annotations

import json
import os
import sys
from typing import Iterable, Iterator

from duodecoding_tpu.native.draft_retriever import DraftReader, DraftWriter


def iter_jsonl_texts(path: str) -> Iterator[str]:
    """Yield every string payload in a jsonl file (nested lists/dicts are
    walked; the task files keep text under 'turns', 'reference',
    'question', 'prompt', ...)."""

    def walk(v):
        if isinstance(v, str):
            if v.strip():
                yield v
        elif isinstance(v, list):
            for x in v:
                yield from walk(x)
        elif isinstance(v, dict):
            for x in v.values():
                yield from walk(x)

    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            yield from walk(json.loads(line))


def build_datastore(
    jsonl_paths: Iterable[str],
    tokenizer,
    out_path: str,
    vocab_size: int | None = None,
    min_len: int = 8,
) -> dict:
    """Tokenize every text in ``jsonl_paths`` and build a searchable
    suffix-array datastore at ``out_path``.

    ``vocab_size`` drops out-of-range token ids (a byte tokenizer against
    a small random-weight model, or a tokenizer/model vocab mismatch) so
    retrieved drafts are always embeddable by the verifier. Returns build
    stats ({'sequences', 'tokens', 'path'})."""
    w = DraftWriter()
    n_seq = n_tok = 0
    try:
        for path in jsonl_paths:
            for text in iter_jsonl_texts(path):
                ids = tokenizer.encode(text)
                if vocab_size is not None:
                    ids = [t for t in ids if 0 <= t < vocab_size]
                if len(ids) < min_len:
                    continue
                w.append(ids)
                n_seq += 1
                n_tok += len(ids)
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        w.finalize(out_path)
    finally:
        w.close()
    return {"sequences": n_seq, "tokens": n_tok, "path": out_path}


# task -> corpus jsonls (mirrors evalkit/tasks.py data resolution)
TASK_DATA_FILES = {
    "mt_bench": ["mt_bench.jsonl"],
    "gsm8k": ["math_reasoning.jsonl"],
    "humaneval": ["humaneval.jsonl"],
    "cnndm": ["summarization.jsonl"],
    "xsum": ["summarization.jsonl"],
    "specbench": [
        "qa.jsonl", "rag.jsonl", "summarization.jsonl", "translation.jsonl",
        "math_reasoning.jsonl",
    ],
    "mixed": [
        "mt_bench.jsonl", "math_reasoning.jsonl", "summarization.jsonl",
    ],
}


def resolve_datastore(
    path: str | None,
    task: str,
    tokenizer,
    vocab_size: int,
    data_files: list[str] | None = None,
    default_dir: str | None = None,
    log=lambda *a: print(*a, file=sys.stderr),
):
    """Open ``path`` if it exists; otherwise build a store for ``task``
    from its data jsonls (saved to ``path`` or a per-task default) and
    open that. Returns a DraftReader."""
    from duodecoding_tpu.evalkit.base import resolve_data_file

    if path and os.path.exists(path):
        return DraftReader(path)
    if data_files is None:
        names = TASK_DATA_FILES.get(task, ["mt_bench.jsonl"])
        data_files = [p for p in (resolve_data_file(n) for n in names) if p]
    if not data_files:
        raise ValueError(
            f"no datastore at {path!r} and no corpus jsonls found for task "
            f"{task!r} — pass --datastore or --datastore_data"
        )
    out = path or os.path.join(
        default_dir or os.path.dirname(data_files[0]),
        f"datastore_{task}.idx",
    )
    stats = build_datastore(data_files, tokenizer, out, vocab_size=vocab_size)
    log(
        f"[rest] built datastore: {stats['sequences']} sequences, "
        f"{stats['tokens']} tokens -> {stats['path']}"
    )
    return DraftReader(out)
