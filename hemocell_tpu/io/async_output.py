"""Asynchronous output pipeline: overlap HDF5/CSV writing with compute.

The reference blocks the whole MPI job inside writeOutput (every rank
serialises its blocks to HDF5, core/hemoCell.cpp:221-287).  On TPU the
device keeps stepping while the host writes: snapshots are brought to host
(one device->host copy), then serialised on a worker thread.  A bounded
queue (depth 2) applies back-pressure so an output burst can't exhaust
host memory.
"""

from __future__ import annotations

import queue
import threading
import traceback
from typing import Callable


class AsyncWriter:
    """Single worker thread draining a bounded job queue."""

    def __init__(self, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while True:
            job = self._q.get()
            if job is None:
                return
            try:
                job()
            except Exception:  # surfaced on the next submit/flush
                self._err = traceback.format_exc()
            finally:
                self._q.task_done()

    def submit(self, job: Callable[[], None]):
        """Enqueue a write job; blocks only when ``depth`` jobs are
        already pending (back-pressure)."""
        if self._err:
            err, self._err = self._err, None
            raise RuntimeError(f"async output writer failed:\n{err}")
        self._q.put(job)

    def flush(self):
        """Wait for all pending writes to land on disk."""
        self._q.join()
        if self._err:
            err, self._err = self._err, None
            raise RuntimeError(f"async output writer failed:\n{err}")

    def close(self):
        self.flush()
        self._q.put(None)
        self._thread.join()
