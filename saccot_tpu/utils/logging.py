"""Structured JSONL logging + host-0 gating (SURVEY.md section 5).

The reference logs to stdout; here every pair/sequence result is a JSONL
record the benchmark harness and regression tooling can read back, and in
multi-host runs only process 0 writes.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional, TextIO


def is_host0() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


class JsonlLogger:
    """Append-only JSONL sink; silently no-ops on non-zero hosts."""

    def __init__(self, path: Optional[str] = None, stream: Optional[TextIO] = None):
        self._enabled = is_host0()
        self._fh: Optional[TextIO] = None
        if not self._enabled:
            return
        if path is not None:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        else:
            self._fh = stream or sys.stderr

    def log(self, record: Dict[str, Any]) -> None:
        if not self._enabled or self._fh is None:
            return
        record = dict(record)
        record.setdefault("ts", time.time())
        self._fh.write(json.dumps(record, default=_np_default) + "\n")

    def close(self) -> None:
        if self._fh is not None and self._fh not in (sys.stderr, sys.stdout):
            self._fh.close()
        self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _np_default(o):
    import numpy as np

    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    return str(o)
