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

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def history(self, query_id: str | None = None) -> list[dict]:
        with self._lock:
            if query_id is not None:
                return list(self._history.get(query_id, []))
            return [h for dq in self._history.values() for h in dq]

    def total_rows(self) -> int:
        return sum(h["num_input_rows"] for h in self.history())
