"""Request micro-batching for the jit'd query step.

The reference served each HTTP request straight into the engine
(``/root/reference/src/api.rs:113-157``). On TPU the engine's hot path is a
batched device program, so the serving layer coalesces concurrent requests:
requests enqueue; a dispatcher drains the queue every ``window_ms`` (or as
soon as ``max_batch`` accumulate), runs one ``SearchEngine.search_batch``
in a worker thread, and resolves each request's future. Single in-flight
batch at a time keeps device occupancy high and latency bounded at
``window + batch_exec``.
"""

from __future__ import annotations

import asyncio
import logging
from typing import Any, Callable, Optional, Sequence

_log = logging.getLogger("tss_tpu.api.batching")


class BatchingQueue:
    def __init__(
        self,
        run_batch: Callable[[Sequence[Any]], list[Any]],
        max_batch: int = 64,
        window_ms: float = 2.0,
    ):
        self.run_batch = run_batch
        self.max_batch = max_batch
        self.window_s = window_ms / 1000.0
        self._queue: asyncio.Queue[tuple[Any, asyncio.Future]] = asyncio.Queue()
        self._task: Optional[asyncio.Task] = None
        self._closed = False

    async def start(self) -> None:
        if self._task is None:
            self._task = asyncio.create_task(self._dispatch_loop())

    async def stop(self) -> None:
        self._closed = True
        if self._task is not None:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
            self._task = None

    async def submit(self, item: Any) -> Any:
        """Enqueue one request; resolves with its result (or raises)."""
        if self._closed:
            raise RuntimeError("batching queue is stopped")
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        await self._queue.put((item, fut))
        return await fut

    async def _dispatch_loop(self) -> None:
        while True:
            item, fut = await self._queue.get()
            batch = [(item, fut)]
            # Collect more requests until the window closes or the batch fills.
            deadline = asyncio.get_running_loop().time() + self.window_s
            while len(batch) < self.max_batch:
                timeout = deadline - asyncio.get_running_loop().time()
                if timeout <= 0:
                    break
                try:
                    batch.append(
                        await asyncio.wait_for(self._queue.get(), timeout)
                    )
                except asyncio.TimeoutError:
                    break
            items = [b[0] for b in batch]
            try:
                results = await asyncio.to_thread(self.run_batch, items)
                if len(results) != len(items):
                    raise RuntimeError(
                        f"batch returned {len(results)} results for {len(items)} items"
                    )
                for (_, f), r in zip(batch, results):
                    if not f.done():
                        f.set_result(r)
            except Exception as e:
                # Per-item fallback: one poisoned request must not fail the
                # whole batch (mirrors the pipeline's per-item tolerance).
                _log.debug("batch failed (%s); retrying items singly", e)
                for it, f in batch:
                    if f.done():
                        continue
                    try:
                        r = await asyncio.to_thread(self.run_batch, [it])
                        f.set_result(r[0])
                    except Exception as single_e:
                        f.set_exception(single_e)
