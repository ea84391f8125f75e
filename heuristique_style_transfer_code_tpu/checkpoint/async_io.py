"""Asynchronous checkpoint writes: training never waits on the disk.

The reference saves checkpoints inline with torch.save (e.g.
functions/functions_RESNET50_Truncate.py save_model call sites), stalling
the train loop for the full serialise+write. TPU-first version: ``submit``
takes a device-side snapshot of the tree (a cheap HBM→HBM copy dispatched
asynchronously — so the caller may immediately feed the live buffers to a
donating train step) and returns; a single worker thread performs the
device→host fetch and the atomic npz write in FIFO order, overlapped with
the next epoch's compute.

Durability contract: ``wait()`` blocks until everything submitted is on
disk and re-raises the first worker error. A crash before ``wait()`` can
lose only the newest submissions — never corrupt one (same atomic
tmp+rename as ``save_pytree_npz``). ``max_pending`` bounds the in-flight
snapshots (device memory) by blocking ``submit``.

Note for relay-attached TPUs (this dev environment): the worker's D2H
fetch serialises with other fetches through the relay, so the overlap
mostly hides the host serialise+write; on directly-attached hardware the
fetch overlaps with compute too.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Optional

import numpy as np


def _snapshot(tree: Any):
    """Device-side copy of every jax-array leaf (host leaves are copied on
    the host). The copy owns its buffers, so later donation/mutation of the
    originals cannot affect the pending write."""
    import jax
    import jax.numpy as jnp

    def cp(x):
        if isinstance(x, jax.Array):
            return jnp.array(x, copy=True)  # async device copy
        if isinstance(x, np.ndarray):
            return np.array(x, copy=True)
        return x  # python scalars / strings are immutable

    return jax.tree_util.tree_map(cp, tree)


class AsyncCheckpointWriter:
    """FIFO background writer producing files identical to
    ``checkpoint.io.save_pytree_npz``. Use as a context manager or call
    ``wait()``/``close()`` explicitly."""

    def __init__(self, max_pending: int = 2, save_fn=None):
        """``save_fn(tree, path)`` overrides the npz writer — e.g.
        ``sharded_io.save_sharded_pytree`` for asynchronous DISTRIBUTED
        checkpoints (each process's writer saves only its own shards; the
        commit barrier inside it is coordination-service based, so it is
        thread-safe next to training collectives — every process must
        submit the same checkpoint sequence, the usual collective-ordering
        contract). See ``sharded_io.make_async_sharded_writer``."""
        import atexit

        self._save_fn = save_fn
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, int(max_pending)))
        self._error: Optional[BaseException] = None
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._started = False
        self._closed = False
        # flush pending writes even when the process exits on an unhandled
        # exception (atexit runs before daemon threads are killed): a crash
        # then loses nothing already submitted
        self._atexit = atexit
        atexit.register(self._atexit_close)

    def submit(self, tree: Any, path: str) -> None:
        """Snapshot ``tree`` and enqueue its write to ``path``. Blocks only
        when ``max_pending`` writes are already in flight (backpressure)."""
        if self._closed:
            raise RuntimeError("writer is closed")
        self._raise_pending()
        if not self._started:
            self._worker.start()
            self._started = True
        self._q.put((_snapshot(tree), path))

    def wait(self) -> None:
        """Block until every submitted checkpoint is durable on disk; then
        re-raise the first worker error, if any."""
        self._q.join()
        self._raise_pending()

    def close(self) -> None:
        """wait() + stop the worker. Idempotent."""
        if self._closed:
            return
        try:
            self.wait()
        finally:
            self._closed = True
            if self._started:
                self._q.put(None)
                self._worker.join()
            self._atexit.unregister(self._atexit_close)

    def _atexit_close(self):
        try:
            self.close()
        except Exception:
            pass  # interpreter is exiting; nothing to surface errors to

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if exc[0] is None:
            self.close()
        else:  # flush, but don't mask the in-flight exception
            self._atexit_close()

    def _raise_pending(self):
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def _run(self):
        from .io import save_pytree_npz

        save_fn = self._save_fn or save_pytree_npz
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()  # balance the sentinel: wait()-after-close must not hang
                break
            tree, path = item
            try:
                # np.asarray on jax leaves = the D2H fetch, here in the
                # worker; save_pytree_npz flattens + atomically writes
                save_fn(tree, path)
            except BaseException as e:  # surfaced on the next submit/wait
                if self._error is None:
                    self._error = e
            finally:
                self._q.task_done()
