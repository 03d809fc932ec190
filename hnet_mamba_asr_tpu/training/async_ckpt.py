"""Background checkpoint writer: overlap device->host fetch + disk IO with
the next epoch's compute.

The reference trainer saves synchronously (reference:
src/dcasr/training/trainer.py checkpoint block) — cheap on a locally-attached
GPU. On a remote-attached TPU the device->host fetch dominates save time
(~30 s per 100 MB through the relay), so the TPU build hands the save to a
single worker thread and lets the train loop dispatch the next epoch
immediately.

Correctness constraints this design answers:
- The train step donates params/opt_state buffers (trainer jit
  ``donate_argnums``), so the caller must snapshot ON DEVICE (a jitted
  ``jnp.copy`` tree) before the next step dispatches; the worker fetches from
  the copies at leisure.
- All checkpoint-dir file operations (writes, best-symlinks, pruning) go
  through the same FIFO queue, so their relative order is exactly the
  synchronous order and no two threads ever touch the directory at once.
- Decisions that read mutable trainer state (metric_history) are computed on
  the main thread at enqueue time; the worker closure only does IO.
- Failures are not silent: the first worker exception re-raises on the next
  ``submit``/``flush`` on the main thread.
"""
from __future__ import annotations

import atexit
import queue
import threading

__all__ = ["AsyncWriter"]


class AsyncWriter:
    """Single-threaded FIFO executor for checkpoint IO.

    ``maxsize`` bounds how many closures (and therefore how many snapshotted
    device-state generations) can be outstanding; at epoch-cadence saves the
    bound is never hit and ``submit`` returns immediately.
    """

    def __init__(self, name: str = "ckpt-writer", maxsize: int = 8):
        self._q: queue.Queue = queue.Queue(maxsize=maxsize)
        self._exc: BaseException | None = None
        self._closed = False
        self._thread = threading.Thread(target=self._run, name=name, daemon=True)
        self._thread.start()
        # the worker is a daemon thread: without this, a save still in flight
        # at normal interpreter exit would be silently dropped
        atexit.register(self.close)

    def _run(self) -> None:
        while True:
            fn = self._q.get()
            if fn is None:
                self._q.task_done()
                return
            try:
                if self._exc is None:     # after a failure, drain without running
                    fn()
            except BaseException as e:    # noqa: BLE001 — must cross threads
                self._exc = e
            finally:
                self._q.task_done()

    def _check(self) -> None:
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise RuntimeError("async checkpoint write failed") from exc

    def submit(self, fn) -> None:
        """Enqueue ``fn`` for ordered execution; raises any prior failure."""
        if self._closed:
            raise RuntimeError("AsyncWriter is closed")
        self._check()
        self._q.put(fn)

    def flush(self) -> None:
        """Block until everything enqueued so far has run; raise failures."""
        self._q.join()
        self._check()

    def close(self) -> None:
        """Flush, then stop the worker thread (idempotent)."""
        if self._closed:
            return
        self._q.join()
        self._closed = True
        self._q.put(None)
        self._q.join()
        self._thread.join(timeout=60)
        self._check()
