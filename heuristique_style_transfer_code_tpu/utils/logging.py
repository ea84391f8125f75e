"""Observability: structured JSONL logging + optional jax.profiler tracing.

The reference logs with bare print() and optional TensorBoard scalars
(SURVEY.md §5); this adds a machine-readable JSONL stream next to the same
console surface, and a --profile_dir flag that captures a real XLA trace.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


class StructuredLogger:
    """print-compatible logger that mirrors events to <dir>/events.jsonl."""

    def __init__(self, save_dir: Optional[str] = None, echo: bool = True):
        self.echo = echo
        self._fh = None
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            self._fh = open(os.path.join(save_dir, "events.jsonl"), "a")

    def __call__(self, message: str, **fields):
        if self.echo:
            print(message)
        if self._fh is not None:
            # record keys win: a caller field named 't'/'msg' must not
            # clobber the stream's timestamp/message
            rec = {**fields, "t": time.time(), "msg": message}
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def event(self, kind: str, **fields):
        if self._fh is not None:
            rec = {**fields, "t": time.time(), "kind": kind}
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None


@contextlib.contextmanager
def maybe_profile(profile_dir: Optional[str]):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto) when a
    directory is given; no-op otherwise."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"Profiler trace written to {profile_dir}")
