"""MT-Bench LLM-judge evaluation (`mt_bench_judge`).

Port of the reference's judged MT-Bench harness (reference:
eval/eval_mt_bench.py — 562 LoC variant whose answers are scored 1-10 by
an OpenAI-API judge model; judge flags at src/utils.py:371-388). The
generation protocol is identical to `mt_bench` (multi-turn, chat
template); scoring is API-optional:

- with ``OPENAI_API_KEY`` set (plus optional ``OPENAI_BASE_URL`` /
  ``DUODEC_JUDGE_MODEL``), each answer is graded by the judge with the
  canonical single-answer prompt and the ``[[N]]`` rating extracted;
- offline (this sandbox has zero egress), judging is SKIPPED cleanly: the
  summary carries ``judge: "skipped (no OPENAI_API_KEY)"`` and
  ``accuracy: None`` instead of failing — the generation transcript is
  still written for later offline judging.

Requests go through urllib (no SDK dependency).
"""

from __future__ import annotations

import json
import os
import re
import urllib.request
from typing import List, Optional

from duodecoding_tpu.evalkit.base import register_task
from duodecoding_tpu.evalkit.tasks import MTBenchNoEval

JUDGE_PROMPT = (
    "[Instruction]\nPlease act as an impartial judge and evaluate the "
    "quality of the response provided by an AI assistant to the user "
    "question displayed below. Your evaluation should consider factors "
    "such as the helpfulness, relevance, accuracy, depth, creativity, and "
    "level of detail of the response. Begin your evaluation by providing a "
    "short explanation. Be as objective as possible. After providing your "
    "explanation, you must rate the response on a scale of 1 to 10 by "
    "strictly following this format: \"[[rating]]\", for example: "
    "\"Rating: [[5]]\".\n\n[Question]\n{question}\n\n[The Start of "
    "Assistant's Answer]\n{answer}\n[The End of Assistant's Answer]"
)


def extract_rating(text: str) -> Optional[float]:
    """``[[N]]`` extraction with a bare "Rating: N" fallback (reference
    eval/eval_mt_bench.py rating parse)."""
    m = re.search(r"\[\[(\d+(?:\.\d+)?)\]\]", text)
    if not m:
        m = re.search(r"[Rr]ating:?\s*(\d+(?:\.\d+)?)", text)
    if not m:
        return None
    val = float(m.group(1))
    return val if 0 <= val <= 10 else None


def call_judge(
    question: str,
    answer: str,
    *,
    api_key: str,
    base_url: str = "https://api.openai.com/v1",
    model: str = "gpt-4o-mini",
    timeout: float = 60.0,
) -> Optional[float]:
    """One judge call via the OpenAI-compatible chat completions API."""
    body = json.dumps(
        {
            "model": model,
            "messages": [
                {
                    "role": "user",
                    "content": JUDGE_PROMPT.format(
                        question=question, answer=answer
                    ),
                }
            ],
            "temperature": 0,
            "max_tokens": 512,
        }
    ).encode()
    req = urllib.request.Request(
        base_url.rstrip("/") + "/chat/completions",
        data=body,
        headers={
            "Content-Type": "application/json",
            "Authorization": f"Bearer {api_key}",
        },
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            out = json.loads(resp.read())
        return extract_rating(out["choices"][0]["message"]["content"])
    except Exception:
        return None


def judge_transcript(
    transcript_path: str,
    questions: List[dict],
    *,
    api_key: str,
    base_url: str,
    model: str,
) -> dict:
    """Grade every answer of a generation transcript; returns
    {mean_rating, n_rated, per_category}."""
    by_id = {q.get("question_id"): q for q in questions}
    ratings: List[float] = []
    per_cat: dict[str, List[float]] = {}
    with open(transcript_path) as f:
        for line in f:
            rec = json.loads(line)
            q = by_id.get(rec.get("question_id"))
            if not q:
                continue
            for turn, ans in zip(q.get("turns", []), rec.get("answers", [])):
                r = call_judge(
                    turn, ans, api_key=api_key, base_url=base_url, model=model
                )
                if r is not None:
                    ratings.append(r)
                    per_cat.setdefault(
                        rec.get("category", "?"), []
                    ).append(r)
    return {
        "mean_rating": sum(ratings) / len(ratings) if ratings else None,
        "n_rated": len(ratings),
        "per_category": {
            c: sum(v) / len(v) for c, v in per_cat.items()
        },
    }


@register_task("mt_bench_judge")
class MTBenchJudge(MTBenchNoEval):
    """MT-Bench with the LLM judge. Generation == `mt_bench`; scoring via
    the OpenAI-compatible API when credentials exist, else skipped with an
    explicit marker (never a crash — offline environments still get the
    transcript)."""

    def run(self, mode: str, **mode_kw):
        summary = super().run(mode, **mode_kw)
        api_key = os.environ.get("OPENAI_API_KEY")
        if not api_key:
            summary["judge"] = "skipped (no OPENAI_API_KEY)"
            summary["judge_mean_rating"] = None
            return summary
        base_url = os.environ.get(
            "OPENAI_BASE_URL", "https://api.openai.com/v1"
        )
        model = os.environ.get("DUODEC_JUDGE_MODEL", "gpt-4o-mini")
        res = judge_transcript(
            summary["transcript_path"],
            self.data,
            api_key=api_key,
            base_url=base_url,
            model=model,
        )
        summary["judge"] = model
        summary["judge_mean_rating"] = res["mean_rating"]
        summary["judge_n_rated"] = res["n_rated"]
        summary["judge_per_category"] = res["per_category"]
        summary["accuracy"] = res["mean_rating"]
        return summary
