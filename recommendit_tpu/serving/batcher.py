"""Request micro-batcher for TPU serving.

Single-request dispatch wastes the MXU (a batch-1 serve call costs nearly
the same device time as batch-256). The micro-batcher coalesces concurrent
HTTP requests into one fused `serve_batch` device call: requests enqueue,
the dispatch thread drains the queue every `max_wait_ms` or as soon as
`max_batch` are waiting, and each caller gets its row back via a per-request
event.

This is a green-field production-serving component (the reference serves
strictly one request per model call, `src/serving/recommender.py:269`).
"""
from __future__ import annotations

import logging
import queue
import threading
from dataclasses import dataclass, field
from typing import Any, Callable, List, Optional, Sequence

logger = logging.getLogger(__name__)


@dataclass
class _Pending:
    user_id: int
    event: threading.Event = field(default_factory=threading.Event)
    result: Any = None
    error: Optional[BaseException] = None


class MicroBatcher:
    """Coalesces scalar requests into batched backend calls.

    Args:
        batch_fn: callable taking a list of user ids → sequence of
            per-user results (ordered).
        max_batch: dispatch immediately once this many requests wait.
        max_wait_ms: dispatch whatever is queued after this long.
    """

    def __init__(
        self,
        batch_fn: Callable[[List[int]], Sequence[Any]],
        max_batch: int = 256,
        max_wait_ms: float = 2.0,
    ):
        self.batch_fn = batch_fn
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self.batches_dispatched = 0
        self.requests_served = 0

    # ------------------------------------------------------------------ #

    def submit(self, user_id: int, timeout: float = 10.0) -> Any:
        """Enqueue a request and block until its result is ready."""
        p = _Pending(user_id=user_id)
        self._queue.put(p)
        if not p.event.wait(timeout):
            raise TimeoutError(f"batched request for user {user_id} timed out")
        if p.error is not None:
            raise p.error
        return p.result

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2.0)

    @property
    def stats(self) -> dict:
        return {
            "batches_dispatched": self.batches_dispatched,
            "requests_served": self.requests_served,
            "avg_batch_size": (
                self.requests_served / max(1, self.batches_dispatched)
            ),
        }

    # ------------------------------------------------------------------ #

    def _drain(self) -> List[_Pending]:
        """Collect up to max_batch requests, waiting max_wait for stragglers."""
        try:
            first = self._queue.get(timeout=0.05)
        except queue.Empty:
            return []
        batch = [first]
        deadline = self.max_wait_s
        import time

        t0 = time.monotonic()
        while len(batch) < self.max_batch:
            remaining = deadline - (time.monotonic() - t0)
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self) -> None:
        while not self._stop.is_set():
            batch = self._drain()
            if not batch:
                continue
            try:
                results = self.batch_fn([p.user_id for p in batch])
                for p, r in zip(batch, results):
                    p.result = r
            except BaseException as exc:  # propagate to every waiter
                for p in batch:
                    p.error = exc
            finally:
                self.batches_dispatched += 1
                self.requests_served += len(batch)
                for p in batch:
                    p.event.set()
