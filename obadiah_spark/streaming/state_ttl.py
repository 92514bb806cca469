"""Shared state-TTL policy for the stateful ingest operators.

Every applyInPandasWithState operator in this package (MinHash dedup,
embedding near-dup, sessionization, first-seen corpus dedup) bounds its
state the same way: a TTL that defaults to EVENT-time timeouts under a
watermark — eviction is then a function of the data, so a replay evicts
the same keys at the same micro-batches as the live run (VERDICT r11
#5) — with processing-time reaping as an explicit opt-in for streams
that go silent. One definition here so the knob resolution, the
missing-column error, and the watermark clamp cannot drift apart
between operators (review r12 finding)."""

from __future__ import annotations

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def duration_ms(d: str) -> int:
    """'<n> <unit>' duration string → milliseconds (the subset of
    CalendarInterval syntax the timeout knobs use)."""
    n, unit = d.split()
    unit = unit.rstrip("s")
    scale = {"millisecond": 1, "second": 1000, "minute": 60_000,
             "hour": 3_600_000, "day": 86_400_000}[unit]
    return int(n) * scale


def resolve_timeout(state_timeout: str | None, timeout_mode: str,
                    needs_time_col: str | None = "present"):
    """→ (GroupStateTimeout conf, ttl_ms or None, use_event flag).

    ``needs_time_col``: pass the caller's event_time_col when the
    operator requires one for event mode (None raises the shared
    error); pass the sentinel "present" when the operator derives its
    own event-time column (sessionize)."""
    use_event = state_timeout is not None and timeout_mode == "event"
    if state_timeout is None:
        return GroupStateTimeout.NoTimeout, None, False
    if use_event:
        if needs_time_col is None:
            raise ValueError(
                "timeout_mode='event' needs event_time_col (a timestamp "
                "column on the input); pass timeout_mode='processing' "
                "for wall-clock TTL")
        return (GroupStateTimeout.EventTimeTimeout,
                duration_ms(state_timeout), True)
    if timeout_mode == "processing":
        return GroupStateTimeout.ProcessingTimeTimeout, None, False
    raise ValueError(f"unknown timeout_mode {timeout_mode!r}")


def arm_event_timeout(state: GroupState, last_ms: int | None,
                      ttl_ms: int) -> None:
    """Arm the event-time timeout at (last event time + TTL), clamped
    one tick past the current watermark (the engine rejects a timeout
    at or before it; a key fed only very-late data arms one tick ahead
    and is evicted at the next advance)."""
    wm = state.getCurrentWatermarkMs()
    base = wm if last_ms is None else last_ms
    state.setTimeoutTimestamp(max(base + ttl_ms, wm + 1))
