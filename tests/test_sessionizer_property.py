"""Property test: the stateful sessionizer's emitted sessions are
invariant to how events are split across micro-batches, and always equal
the reference gaps-and-islands sessionization. Drives the update function
directly with a stub GroupState — no Spark session, so hypothesis can
explore many cases."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pipeline_kinesis_spark.streaming.stateful import make_sessionizer

GAP_US = 300 * 1_000_000


class StubState:
    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def reference_sessions(ts_us: list[int]) -> list[tuple[int, int, int]]:
    """Gaps-and-islands over the full sorted event list."""
    out = []
    for t in sorted(ts_us):
        if out and t - out[-1][1] <= GAP_US:
            s, _last, n = out[-1]
            out[-1] = (s, t, n + 1)
        else:
            out.append((t, t, 1))
    return out


def drive(batches: list[list[int]]):
    """Feed timestamp batches through the update fn; return (closed
    sessions, open state)."""
    update = make_sessionizer(300)
    state = StubState()
    closed = []
    for batch in batches:
        pdfs = [pd.DataFrame({"ts": pd.to_datetime(batch, unit="us")})]
        for out in update(("k",), iter(pdfs), state):
            for r in out.itertuples():
                closed.append(
                    (
                        int(r.session_start.value // 1000),
                        int(r.session_end.value // 1000),
                        int(r.n_events),
                    )
                )
    return closed, state._v


@settings(max_examples=200, deadline=None)
@given(
    ts=st.lists(
        st.integers(min_value=0, max_value=4 * 10**9),
        min_size=1,
        max_size=40,
    ),
    splits=st.lists(st.integers(min_value=0, max_value=39), max_size=5),
)
def test_batch_split_invariance(ts, splits):
    """However the (time-ordered) event stream is chopped into batches,
    closed+open sessions together must equal the reference sessionization
    of the whole list."""
    ts = sorted(ts)
    cuts = sorted({s for s in splits if s < len(ts)})
    batches, prev = [], 0
    for c in cuts:
        if c > prev:
            batches.append(ts[prev:c])
            prev = c
    batches.append(ts[prev:])
    batches = [b for b in batches if b]

    closed, open_state = drive(batches)
    got = closed + ([tuple(open_state)] if open_state else [])
    assert sorted(got) == reference_sessions(ts)


@settings(max_examples=100, deadline=None)
@given(
    ts=st.lists(
        st.integers(min_value=0, max_value=4 * 10**9),
        min_size=1,
        max_size=30,
    )
)
def test_single_batch_matches_reference(ts):
    closed, open_state = drive([ts])
    got = closed + ([tuple(open_state)] if open_state else [])
    assert sorted(got) == reference_sessions(ts)


def test_timeout_emits_open_session():
    update = make_sessionizer(300)
    state = StubState()
    list(update(("k",), iter([pd.DataFrame({"ts": pd.to_datetime([0], unit="us")})]), state))
    assert state.exists
    state.hasTimedOut = True
    out = list(update(("k",), iter([]), state))
    assert len(out) == 1 and int(out[0]["n_events"].iloc[0]) == 1
    assert not state.exists
