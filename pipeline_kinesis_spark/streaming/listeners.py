"""Streaming metrics collection (SURVEY.md A14).

The reference surfaces one lag metric, millis_behind_latest, per batch
(kinesis_consumer.cpp:446-450). Structured Streaming's listener gives the
fuller picture: rows/sec, batch durations, state size. This listener keeps
a bounded in-memory history per query — the engine's observability analog.
"""

from __future__ import annotations

import threading
from collections import defaultdict, deque

from pyspark.sql.streaming import StreamingQueryListener


class QueryMetricsListener(StreamingQueryListener):
    """Collects per-query progress history (bounded ring buffer)."""

    def __init__(self, max_history: int = 100):
        self.max_history = max_history
        self._lock = threading.Lock()
        self._history: dict[str, deque] = defaultdict(
            lambda: deque(maxlen=self.max_history)
        )
        # cumulative per-query-NAME counters — the ring buffer above is
        # for recent-batch inspection; these survive its eviction and
        # back the pipeline_query_stats catalog relation
        self._totals: dict[str, dict] = {}

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        with self._lock:
            self._history[str(p.id)].append(
                {
                    "name": p.name,
                    "batch_id": p.batchId,
                    "num_input_rows": p.numInputRows,
                    "input_rows_per_second": p.inputRowsPerSecond,
                    "processed_rows_per_second": p.processedRowsPerSecond,
                    "duration_ms": dict(p.durationMs or {}),
                }
            )
            if p.name:
                t = self._totals.setdefault(
                    p.name,
                    {
                        "batches": 0,
                        "input_rows": 0,
                        "last_batch_id": -1,
                        "errors": 0,
                        "last_error": None,
                    },
                )
                if p.numInputRows:
                    t["batches"] += 1
                    t["input_rows"] += p.numInputRows
                t["last_batch_id"] = max(t["last_batch_id"], p.batchId)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        exc = getattr(event, "exception", None)
        if not exc:
            return
        with self._lock:
            # terminated-with-error events carry no name; count it under
            # every known name is wrong — keep a global error ledger
            t = self._totals.setdefault(
                "__terminated__",
                {
                    "batches": 0,
                    "input_rows": 0,
                    "last_batch_id": -1,
                    "errors": 0,
                    "last_error": None,
                },
            )
            t["errors"] += 1
            t["last_error"] = str(exc)[:500]

    def totals(self) -> dict[str, dict]:
        """Cumulative per-query-name stats since this listener attached
        (batches with input, rows in, high-water batch id, errors)."""
        with self._lock:
            return {k: dict(v) for k, v in self._totals.items()}

    def history(self, query_id: str | None = None) -> list[dict]:
        with self._lock:
            if query_id is not None:
                return list(self._history.get(query_id, []))
            return [h for dq in self._history.values() for h in dq]

    def total_rows(self) -> int:
        return sum(h["num_input_rows"] for h in self.history())
