"""Streaming sessionization — event-time session windows ON INGEST.

The batch operator (``relational.sessionize_events``) is gaps-and-islands:
lag + cumulative sum over a per-user window, then a groupBy per session.
A streaming ingest pipeline wants the same sessions as events arrive,
without re-scanning history; windows over unbounded preceding rows do
not exist on streaming frames, so the operator re-expresses as
``applyInPandasWithState`` keyed on ``user_id``:

- state = the user's OPEN session (session_no counter, start/end
  microtimestamps, event count, integer cents sum);
- each micro-batch folds the user's arrivals in (ts, event_id) order:
  a gap > ``gap_minutes`` CLOSES the open session (emitting one result
  row — append-sink compatible, no retraction needed) and opens the
  next;
- a FLUSH sentinel (``event_id < 0``) closes and emits whatever is open
  at its event-time position (later events in the same micro-batch open
  a fresh session) — the replay-end marker a bounded differential
  needs; a production deployment would instead use ``state_timeout``
  (idle users are then emitted-and-evicted when the timeout fires;
  numbering restarts if they return — the documented price of bounding
  state) or simply leave the last session open (it is, by definition,
  still in progress).

ORDER CONTRACT: within one micro-batch the fold sorts; ACROSS
micro-batches each user's events must arrive in non-decreasing event
time — the same per-key order contract every stateful stage in this
repo inherits from the event-time reorderer (``streaming/reorder.py``
provides exactly that under a watermark; the capture chain composes
reorder → stateful stage the same way).

VALUE ARITHMETIC: the batch operator sums PER-ROW integer cents
(``round(value*100, 0)`` cast to bigint) so the aggregate is
order-independent; the pandas fold reproduces Spark's rounding exactly —
double multiply first, then HALF_UP on the exact decimal expansion of
the product (java.math.BigDecimal(double) semantics) — proven by the
batch-vs-stream differential over the driver events fabric.

Scale posture: state is five scalars per EVER-SEEN user (not the
session's events — the counter survives a flush so numbering stays
batch-parallel); the only shuffle is the groupBy on user_id, the same
key the batch window partitions by. At 100 TB the operator is a single
keyed stateful pass; ``state_timeout`` bounds state to ACTIVE users by
emitting-and-evicting idle ones (numbering continuity across the idle
gap is the trade).

Driver gate since r12 (``sessionize_stream`` row: the sf events table
replayed through the operator, hashed against the batch islands SQL);
the batch≡stream differentials in tests/test_sessionize_stream.py pin
the fold semantics, including the timeout and sentinel paths.
"""
from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState
from pyspark.sql.types import LongType, StructField, StructType

EVENTS_IN_SCHEMA = ("event_id long, ts_us long, user_id long, "
                    "value double")

SESSIONS_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_no", LongType()),
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("n_events", LongType()),
    StructField("value_cents", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("session_no", LongType()),
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("n_events", LongType()),
    StructField("value_cents", LongType()),
])


def _cents(value: float) -> int:
    """Spark's ``round(value * 100, 0)`` on a double: the multiply
    happens in IEEE double, THEN the exact decimal expansion of that
    double rounds HALF_UP (java.math.BigDecimal(double) semantics —
    Decimal(p) is the same exact expansion)."""
    p = float(value) * 100.0
    return int(Decimal(p).quantize(Decimal(1), rounding=ROUND_HALF_UP))


# shared TTL policy (re-exported: tests and older callers import the
# underscore name from here)
from obadiah_spark.streaming.state_ttl import (  # noqa: E402,F401
    arm_event_timeout, duration_ms as _duration_ms, resolve_timeout)


def _fold_factory(gap_us: int, state_timeout: str | None,
                  timeout_mode: str = "processing",
                  sentinels: bool = True):
    """The per-key stateful fold, exposed for direct unit tests (the
    GroupState protocol is five methods — tests drive it with a fake).

    ``timeout_mode="event"`` arms ``setTimeoutTimestamp`` at (open
    session's end + TTL) in EVENT time, clamped above the current
    watermark — so eviction is a function of the DATA, and a replay
    produces byte-identical output including the evicted sessions
    (VERDICT r11 #5: processing-time eviction fires differently on
    replay vs live, which breaks the replay-equals-live property the
    differentials otherwise guarantee)."""
    ttl_ms = (_duration_ms(state_timeout)
              if state_timeout is not None and timeout_mode == "event"
              else None)

    def fold(key: tuple, pdfs: Iterable[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            sess_no, start, end, n, cents = state.get
        else:
            sess_no, start, end, n, cents = 0, None, None, 0, 0
        out = []
        if state.hasTimedOut:
            # idle eviction: close and emit whatever is open, then drop
            # the state row entirely. Numbering restarts at 1 if the
            # user ever returns — the documented price of bounding
            # state (the batch operator, which sees all history, keeps
            # counting; parity holds only for users that never time
            # out).
            if start is not None:
                out.append((user_id, sess_no, start, end, n, cents))
            state.remove()
            if out:
                yield pd.DataFrame(
                    out, columns=[f.name for f in SESSIONS_SCHEMA])
            return
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_us", "event_id"])
            for ev_id, ts, val in zip(pdf["event_id"], pdf["ts_us"],
                                      pdf["value"]):
                if int(ev_id) < 0:
                    if not sentinels:
                        # sentinel ids disabled: a negative event_id is
                        # corrupt input, not a flush — fail loudly
                        # instead of silently closing the session and
                        # dropping the event (ADVICE r11)
                        raise ValueError(
                            f"negative event_id {int(ev_id)} for user "
                            f"{user_id} with sentinels disabled")
                    # flush sentinel, applied IN EVENT-TIME POSITION:
                    # close whatever is open here; later events in the
                    # same micro-batch start a fresh session
                    if start is not None:
                        out.append((user_id, sess_no, start, end, n,
                                    cents))
                        start, end, n, cents = None, None, 0, 0
                    continue
                ts = int(ts)
                # the batch operator's F.sum(_cents(value)) skips NULLs
                # and is itself NULL when every value in the session is
                # NULL; mirror both (count the event either way)
                c = None if pd.isna(val) else _cents(val)
                if start is None:
                    sess_no, start, end, n, cents = (
                        sess_no + 1, ts, ts, 1, c)
                elif ts - end > gap_us:
                    out.append((user_id, sess_no, start, end, n, cents))
                    sess_no, start, end, n, cents = (
                        sess_no + 1, ts, ts, 1, c)
                else:
                    end = ts
                    n += 1
                    if c is not None:
                        cents = c if cents is None else cents + c
        # the session_no counter must survive a flush so later sessions
        # continue the batch numbering — so the state row persists for
        # ever-seen users under NoTimeout (O(ever-seen users), five
        # scalars each); pass state_timeout to bound it at the cost of
        # numbering continuity across the idle gap
        state.update((int(sess_no), start, end, int(n),
                      None if cents is None else int(cents)))
        if state_timeout is not None:
            if ttl_ms is not None:
                # event-time eviction: fire when the watermark passes
                # (open end + TTL); an all-sentinel batch leaves end
                # None — arm_event_timeout then re-arms relative to
                # the watermark so the empty state row is still reaped
                arm_event_timeout(
                    state, None if end is None else end // 1000, ttl_ms)
            else:
                state.setTimeoutDuration(state_timeout)
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in SESSIONS_SCHEMA])

    return fold


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      state_timeout: str | None = None,
                      timeout_mode: str = "event",
                      watermark_delay: str | None = None,
                      sentinels: bool = True) -> DataFrame:
    """Per-user session windows over a (streaming or batch) frame with
    columns ``event_id, ts_us, user_id, value``. Emits one row per
    CLOSED session; ``event_id < 0`` rows are flush sentinels.

    ``state_timeout`` bounds state to active users by emitting-and-
    evicting idle ones.  The default ``timeout_mode="event"`` derives a
    watermark from ``ts_us`` (delay = ``watermark_delay`` or the TTL
    itself) and evicts in EVENT time — replay-deterministic, so the
    batch≡stream differentials extend to the timeout path.  Pass
    ``timeout_mode="processing"`` for wall-clock eviction (live
    deployments that must reap users even when the stream goes silent —
    a watermark only advances with data).

    ``sentinels=False`` rejects negative event_ids loudly (ValueError in
    the fold) for deployments that never send flush markers — corrupt
    ids then cannot silently corrupt session boundaries (ADVICE r11)."""
    gap_us = gap_minutes * 60 * 1_000_000
    # sessionize derives its own event-time column from ts_us, so the
    # sentinel "present" satisfies resolve_timeout's column requirement
    timeout, _, use_event = resolve_timeout(state_timeout, timeout_mode)
    if use_event:
        from pyspark.sql import functions as F

        events = events.withColumn(
            "_ts", F.timestamp_micros("ts_us")
        ).withWatermark("_ts", watermark_delay or state_timeout)
    fold = _fold_factory(gap_us, state_timeout,
                         "event" if use_event else "processing",
                         sentinels)
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(fold, SESSIONS_SCHEMA, _STATE_SCHEMA,
                                "append", timeout)
    )
