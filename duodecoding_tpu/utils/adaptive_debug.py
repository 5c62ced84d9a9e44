"""JSONL event logger for adaptive-mode debugging.

Port of the reference's AdaptiveDecodingDebugger (reference:
src/adaptive_debug.py:8 — JSONL event / tensor-stat / invalid-token records
behind the --adaptive_debug_log flag).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional

import numpy as np


class AdaptiveDecodingDebugger:
    def __init__(self, log_path: Optional[str] = None):
        self.log_path = log_path
        self._fh = None
        if log_path:
            os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
            self._fh = open(log_path, "a")

    @property
    def enabled(self) -> bool:
        return self._fh is not None

    def _write(self, record: dict) -> None:
        if self._fh:
            record["ts"] = time.time()
            self._fh.write(json.dumps(record, default=float) + "\n")
            self._fh.flush()

    def log_event(self, event: str, **fields: Any) -> None:
        self._write({"type": "event", "event": event, **fields})

    def log_tensor(self, name: str, tensor) -> None:
        if not self.enabled:
            return
        arr = np.asarray(tensor)
        self._write(
            {
                "type": "tensor",
                "name": name,
                "shape": list(arr.shape),
                "dtype": str(arr.dtype),
                "min": float(arr.min()) if arr.size else None,
                "max": float(arr.max()) if arr.size else None,
                "mean": float(arr.mean()) if arr.size else None,
                "finite": bool(np.isfinite(arr).all()),
            }
        )

    def log_invalid_tokens(self, name: str, ids, vocab_size: int) -> None:
        if not self.enabled:
            return
        arr = np.asarray(ids)
        bad = arr[(arr < 0) | (arr >= vocab_size)]
        if bad.size:
            self._write(
                {
                    "type": "invalid_tokens",
                    "name": name,
                    "count": int(bad.size),
                    "examples": [int(x) for x in bad[:8]],
                    "vocab_size": vocab_size,
                }
            )

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
