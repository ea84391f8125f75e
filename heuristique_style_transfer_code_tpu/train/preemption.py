"""Preemption-safe training: SIGTERM → stop at a safe point → ``--resume``.

Preemptible TPU fleets deliver SIGTERM with a short grace window. The
reference train loop would die mid-epoch losing everything since its last
full save; here the elastic-resume machinery (epoch-granular in-progress
checkpoints, train/kfold.py) already keeps durable state one epoch behind,
so the right reaction is: stop dispatching batches NOW, let the process
exit cleanly, and print the resume instruction. The partial epoch is
discarded by design (resume is epoch-granular and bit-identical), so the
stop is immediate — no risk of overrunning the grace window waiting for an
epoch boundary.

Wiring: ``run_kfold(resume=True)`` installs the handler; the batch loop and
the epoch boundary check the flag and raise :class:`PreemptedError`, which
the train CLIs catch and turn into a clean exit-0 with the resume hint.
"""
from __future__ import annotations

import signal
import threading

_PREEMPT = threading.Event()


class PreemptedError(RuntimeError):
    """Raised at a safe point after a preemption request. Everything up to
    ``epochs_done`` of ``fold`` is durable on disk; rerun with --resume."""

    def __init__(self, fold: int, epochs_done: int, message: str = None):
        self.fold = int(fold)
        self.epochs_done = int(epochs_done)
        super().__init__(
            message
            or f"preempted: progress through epoch {self.epochs_done} of fold "
            f"{self.fold} is checkpointed; rerun with --resume to continue"
        )


def request_preemption(signum=None, frame=None) -> None:
    """Signal-handler-compatible; also callable directly (tests, custom
    orchestration)."""
    _PREEMPT.set()


def preemption_requested() -> bool:
    return _PREEMPT.is_set()


def clear_preemption() -> None:
    _PREEMPT.clear()


def install_sigterm_handler() -> bool:
    """Route SIGTERM to ``request_preemption``. Returns False when not on
    the main thread (programmatic use) — the flag can still be set
    directly."""
    try:
        signal.signal(signal.SIGTERM, request_preemption)
        return True
    except ValueError:
        return False
