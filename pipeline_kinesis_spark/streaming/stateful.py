"""Custom stateful streaming operators (applyInPandasWithState).

SURVEY.md B24/B27: PipelineDB's continuous views keep arbitrary per-group
state machines alive across stream batches; Spark's built-in session_window
(B24) covers gap sessionization only when the output is a plain aggregate.
This module is the escape hatch for session semantics that need an explicit
state machine — per-session payloads (event counts, first/last timestamps,
duration) emitted exactly once when the session CLOSES, driven by
event-time timeout against the watermark.

Scale notes: applyInPandasWithState shuffles once on the grouping key and
keeps one state row per open session in the state store — O(live keys), not
O(events). Arrow batches the per-key event pandas frames, so the Python
boundary is vectorized, not per-row. At 100 TB the knobs are the state-store
provider (RocksDB on a real cluster) and watermark delay (bounds state
lifetime); the operator itself is already partition-parallel.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pipeline_kinesis_spark.shipping import ship_package

SESSION_SCHEMA = (
    "key STRING, session_start TIMESTAMP, session_end TIMESTAMP, "
    "n_events BIGINT, duration_secs DOUBLE"
)
_STATE_SCHEMA = "start LONG, last LONG, n LONG"

_US = 1_000_000  # state timestamps kept as int64 epoch-micros (Arrow-exact)


def _close_session(key: Any, start_us: int, last_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "key": [key],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
            "duration_secs": [(last_us - start_us) / _US],
        }
    )


def make_sessionizer(gap_secs: float):
    """Build the per-key state-update function. Sessions close when the
    event-time watermark passes last_event + gap (EventTimeTimeout), the
    exact semantics of PipelineDB-style gap sessionization."""
    gap_us = int(gap_secs * _US)

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield _close_session(key[0], start_us, last_us, n)
            return

        ts_us = (
            pd.concat([pdf["ts"] for pdf in pdfs])
            .astype("datetime64[us]")
            .astype("int64")
            .sort_values()
            .to_numpy()
        )
        # split the batch into gap-separated runs, vectorized
        breaks = (ts_us[1:] - ts_us[:-1]) > gap_us
        run_starts = [0] + [i + 1 for i, b in enumerate(breaks) if b]
        run_ends = run_starts[1:] + [len(ts_us)]
        runs = [
            (int(ts_us[s]), int(ts_us[e - 1]), e - s)
            for s, e in zip(run_starts, run_ends)
        ]
        if state.exists:
            runs.append(state.get)
            runs.sort(key=lambda r: r[0])

        # merge runs whose inter-gap is within the session gap
        merged = [runs[0]]
        for start_us, last_us, n in runs[1:]:
            p_start, p_last, p_n = merged[-1]
            if start_us - p_last <= gap_us:
                merged[-1] = (
                    min(p_start, start_us),
                    max(p_last, last_us),
                    p_n + n,
                )
            else:
                merged.append((start_us, last_us, n))

        # every run but the newest is closed by the arrival of a later one
        for start_us, last_us, n in merged[:-1]:
            yield _close_session(key[0], start_us, last_us, n)

        start_us, last_us, n = merged[-1]
        state.update((start_us, last_us, n))
        # close when the watermark passes the gap after the last event
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)

    return update


def sessionize(
    records: DataFrame,
    key_col: str,
    ts_col: str,
    gap_secs: float,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Gap-based sessionization with per-session payload, emitted on close.

    ``records`` is a streaming DataFrame; output schema is SESSION_SCHEMA.
    Use ``F.session_window`` (B24) when a plain aggregate per session is
    enough — this operator exists for close-triggered emission and custom
    state (reference analog: continuous-view incremental state,
    pipeline_kinesis README.md:66).
    """
    ship_package(records.sparkSession)
    prepared = (
        records.selectExpr(
            f"CAST({key_col} AS STRING) AS key", f"{ts_col} AS ts"
        )
        .withWatermark("ts", watermark_delay)
    )
    return prepared.groupBy("key").applyInPandasWithState(
        make_sessionizer(gap_secs),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --------------------------------------------------------------------------
# Streaming space-saving top-k (PipelineDB's continuous topk analog)

TOPK_SCHEMA = "grp STRING, item STRING, est_count BIGINT, max_err BIGINT"
_TOPK_STATE_SCHEMA = (
    "items ARRAY<STRING>, counts ARRAY<LONG>, errs ARRAY<LONG>"
)


def make_streaming_topk(capacity: int, k: int):
    """Per-group space-saving summary maintained across micro-batches.

    Classic Metwally et al. semantics: a bounded summary of ``capacity``
    (item, count, err) rows; an unseen item evicts the current minimum,
    inheriting its count as overestimation error. Guarantees carried
    across batches: est_count >= true count, est_count - max_err <= true
    count, and any item with true count > min-summary-count is present.
    Batch items merge in deterministic (batch_count DESC, item ASC)
    order so results are independent of pandas hash order.
    """

    def update(key, pdfs, state):
        if state.exists:
            items, counts, errs = state.get
            summary = {
                i: [c, e] for i, c, e in zip(items, counts, errs)
            }
        else:
            summary = {}

        batch = pd.concat([pdf["item"] for pdf in pdfs])
        bc = batch.value_counts()
        for item in sorted(bc.index, key=lambda i: (-bc[i], i)):
            c = int(bc[item])
            if item in summary:
                summary[item][0] += c
            elif len(summary) < capacity:
                summary[item] = [c, 0]
            else:
                evict = min(summary.items(), key=lambda kv: (kv[1][0], kv[0]))
                min_item, (min_c, _) = evict
                del summary[min_item]
                summary[item] = [min_c + c, min_c]

        rows = sorted(summary.items(), key=lambda kv: (-kv[1][0], kv[0]))
        state.update((
            [i for i, _ in rows],
            [c for _, (c, _) in rows],
            [e for _, (_, e) in rows],
        ))
        top = rows[:k]
        yield pd.DataFrame(
            {
                "grp": [key[0]] * len(top),
                "item": [i for i, _ in top],
                "est_count": [c for _, (c, _) in top],
                "max_err": [e for _, (_, e) in top],
            }
        )

    return update


def streaming_topk(
    records: DataFrame,
    group_col: str,
    item_col: str,
    capacity: int = 100,
    k: int = 10,
) -> DataFrame:
    """Continuous heavy hitters: the current top-k per group re-emitted
    every micro-batch (update mode) — the standing-query form of the
    batch FSS sketch (operators/sketches.py), i.e. PipelineDB's
    continuously-maintained topk.

    Scale shape: one shuffle on the group key; state is O(capacity) per
    group regardless of stream length; the Python boundary is one Arrow
    batch per group per trigger.
    """
    ship_package(records.sparkSession)
    prepared = records.selectExpr(
        f"CAST({group_col} AS STRING) AS grp",
        f"CAST({item_col} AS STRING) AS item",
    )
    return prepared.groupBy("grp").applyInPandasWithState(
        make_streaming_topk(capacity, k),
        outputStructType=TOPK_SCHEMA,
        stateStructType=_TOPK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
