"""Streaming ingestion differential: any batch split of the event stream
must reproduce the one-shot batch level3 synthesis bit-for-bit (the
reference's trigger-based chaining is order-insensitive the same way)."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from obadiah_spark.streaming.ingest import Level3Ingestor, run_streaming_ingest  # noqa: E402
from tools.verify_local import canonicalize, compare  # noqa: E402

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
                 "value double, props string")


def _batch_l3(level3):
    return level3.toPandas()


def _split_frame(df, n):
    """np.array_split for DataFrames without tripping the
    DataFrame.swapaxes deprecation (np.array_split swaps axes
    internally): split positions, slice with iloc."""
    return [df.iloc[idx] for idx in np.array_split(np.arange(len(df)), n)]


def test_ingestor_state_machine_vs_batch(spark, level3):
    """Unit: 4 ts-ordered pandas chunks through the state machine."""
    events = spark.table("events").toPandas().sort_values("ts").reset_index(drop=True)
    ing = Level3Ingestor()
    for chunk in _split_frame(events, 4):
        ing.process_batch(chunk)
    got = ing.finalize()
    want = _batch_l3(level3)
    assert not compare("stream-vs-batch", got, want)


def test_ingestor_single_batch_equals_many(spark):
    events = spark.table("events").toPandas().sort_values("ts").reset_index(drop=True)
    one = Level3Ingestor()
    one.process_batch(events)
    many = Level3Ingestor()
    for chunk in _split_frame(events, 7):
        many.process_batch(chunk)
    a, b = one.finalize(), many.finalize()
    assert canonicalize(a).equals(canonicalize(b))


def _write_event_chunks(spark, events, d, n_chunks=4):
    src = os.path.join(d, "events")
    os.makedirs(src)
    for i, chunk in enumerate(_split_frame(events, n_chunks)):
        spark.createDataFrame(chunk).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"chunk_{i:03d}"))
    flat = os.path.join(d, "flat")
    os.makedirs(flat)
    n = 0
    for root, _, files in sorted(os.walk(src)):
        for f in sorted(files):
            if f.endswith(".parquet"):
                os.rename(os.path.join(root, f), os.path.join(flat, f"{n:03d}.parquet"))
                n += 1
    return flat


def test_chain_stream_executor_side(spark, level3):
    """The production streaming path: applyInPandasWithState keyed by
    (pair, exchange, era, order) — state in the Spark state store, update-mode
    upsert emissions, latest-wins materialization, era-close finalization.
    Must reproduce the one-shot batch synthesis bit-for-bit."""
    from obadiah_spark.streaming.chain import finalize_open_chains, run_chain_stream

    events = spark.table("events").toPandas().sort_values("ts").reset_index(drop=True)
    with tempfile.TemporaryDirectory() as d:
        flat = _write_event_chunks(spark, events, d)
        latest = run_chain_stream(spark, flat, EVENTS_SCHEMA,
                                  os.path.join(d, "ckpt"))
    got = finalize_open_chains(latest)
    want = _batch_l3(level3)
    assert not compare("chain-stream-vs-batch", got, want)


def test_side_is_data_not_formula(spark):
    """Round-4 decoupling: feed a side assignment that BREAKS the synth
    modular formula (all sides flipped); the driver-side mirror must carry
    the data through unchanged."""
    from obadiah_spark.streaming.ingest import Level3Ingestor, keyed_events

    flip = {"b": "s", "s": "b"}

    class FlippedIngestor(Level3Ingestor):
        @staticmethod
        def _keyed(ev):
            out = keyed_events(ev)
            out["side"] = out["side"].map(flip)
            return out

    events = spark.table("events").toPandas().sort_values("ts").reset_index(drop=True)
    ing = FlippedIngestor()
    ing.process_batch(events)
    got = ing.finalize()
    formula = (got["order_id"] % 4 < 2).map({True: "b", False: "s"})
    assert (got["side"] == formula.map(flip)).all()
    assert not (got["side"] == formula).any()


def test_chain_events_carries_side_and_payload_in_state():
    """Executor-side: the stateful processor must emit the side/price given
    as DATA — including the tail re-emission restored from the state store,
    which previously had no side and was recomputed from order_id % 4."""
    import pandas as pd

    from obadiah_spark.streaming.chain import chain_events

    class FakeState:
        def __init__(self):
            self._t = None

        @property
        def exists(self):
            return self._t is not None

        @property
        def get(self):
            return self._t

        def update(self, t):
            self._t = t

    era = pd.Timestamp("2024-01-01")
    key = (1, 1, era, 5)  # order_id 5: the synth formula would say 'b'

    def batch(eid, ts_min):
        return pd.DataFrame([{
            "event_id": eid, "order_id": 5, "pair_id": 1, "exchange_id": 1,
            "era": era, "side": "s",              # contradicts the formula
            "price": 123.0, "amount": 1.5, "is_delete": False,
            "microtimestamp": era + pd.Timedelta(minutes=ts_min),
            "local_timestamp": era + pd.Timedelta(minutes=ts_min, seconds=1),
        }])

    st = FakeState()
    out1 = pd.concat(list(chain_events(key, iter([batch(5, 0)]), st)))
    out2 = pd.concat(list(chain_events(key, iter([batch(245, 1)]), st)))
    # drop all-NA object columns (unset fill/link fields) before concat:
    # pandas deprecated letting them ride through dtype resolution
    rows = pd.concat([f.dropna(axis=1, how="all") for f in (out1, out2)])
    assert len(rows) == 3  # new, chained re-emit of the tail, new
    assert (rows["side"] == "s").all()
    assert (rows["price"] == 123.0).all()


def test_streaming_end_to_end(spark, level3):
    """Real Structured Streaming run: file source, one file per micro-batch,
    availableNow trigger, watermark declared, foreachBatch chaining."""
    events = spark.table("events").toPandas().sort_values("ts").reset_index(drop=True)
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "events")
        os.makedirs(src)
        for i, chunk in enumerate(_split_frame(events, 4)):
            spark.createDataFrame(chunk).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, f"chunk_{i:03d}"))
        # flatten: file source wants files in one dir
        flat = os.path.join(d, "flat")
        os.makedirs(flat)
        n = 0
        for root, _, files in sorted(os.walk(src)):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    os.rename(os.path.join(root, f), os.path.join(flat, f"{n:03d}.parquet"))
                    n += 1
        got = run_streaming_ingest(spark, flat, EVENTS_SCHEMA,
                                   os.path.join(d, "ckpt"))
    want = _batch_l3(level3)
    assert not compare("streaming-vs-batch", got, want)


def test_streaming_spread_equals_batch(spark, level3):
    """§2.9 stateful op: the spread fold fed by time-ordered micro-batches
    (episodes splitting across batch boundaries included) must equal the
    one-shot batch fold bit-for-bit."""
    from obadiah_spark.fold import _EVENT_COLS, spread_fold
    from obadiah_spark.streaming.spread import StreamingSpread

    events = (level3.select(*_EVENT_COLS).toPandas()
              .sort_values(["microtimestamp", "order_id", "event_no"])
              .reset_index(drop=True))
    acc = StreamingSpread()
    for chunk in _split_frame(events, 5):
        acc.process_batch(chunk)
    got = acc.flush()
    want = spread_fold(level3).toPandas()
    assert len(got) > 0
    assert not compare("streaming-spread-vs-batch", got, want)


def test_streaming_spread_end_to_end(spark, level3):
    """Real Structured Streaming run of the level1 fold: file source, one
    file per micro-batch, availableNow trigger."""
    from obadiah_spark.fold import _EVENT_COLS, spread_fold
    from obadiah_spark.streaming.spread import run_streaming_spread

    schema = ("pair_id int, exchange_id int, era timestamp, "
              "microtimestamp timestamp, order_id long, event_no int, "
              "side string, price double, amount double, chain_state string")
    events = (level3.select(*_EVENT_COLS).toPandas()
              .sort_values(["microtimestamp", "order_id", "event_no"])
              .reset_index(drop=True))
    with tempfile.TemporaryDirectory() as d:
        flat = _write_event_chunks(spark, events, d)
        got = run_streaming_spread(spark, flat, schema, os.path.join(d, "ckpt"))
    want = spread_fold(level3).toPandas()
    assert not compare("streaming-spread-e2e", got, want)


def test_streaming_depth_change_equals_batch(spark, level3):
    """VERDICT r4 #5 — streaming level2: the depth fold fed by time-ordered
    micro-batches (episodes splitting across batch boundaries included)
    must equal the one-shot batch depth_change_fold bit-for-bit."""
    from obadiah_spark.fold import _EVENT_COLS, depth_change_fold
    from obadiah_spark.streaming.spread import StreamingDepthChange

    events = (level3.select(*_EVENT_COLS).toPandas()
              .sort_values(["microtimestamp", "order_id", "event_no"])
              .reset_index(drop=True))
    acc = StreamingDepthChange()
    for chunk in _split_frame(events, 5):
        acc.process_batch(chunk)
    got = acc.flush()
    want = depth_change_fold(level3).toPandas()
    assert len(got) > 0
    assert not compare("streaming-depth-vs-batch", got, want)


def test_streaming_depth_change_end_to_end(spark, level3):
    """Real Structured Streaming run of the level2 fold: file source, one
    file per micro-batch, availableNow trigger."""
    from obadiah_spark.fold import _EVENT_COLS, depth_change_fold
    from obadiah_spark.streaming.spread import run_streaming_depth_change

    schema = ("pair_id int, exchange_id int, era timestamp, "
              "microtimestamp timestamp, order_id long, event_no int, "
              "side string, price double, amount double, chain_state string")
    events = (level3.select(*_EVENT_COLS).toPandas()
              .sort_values(["microtimestamp", "order_id", "event_no"])
              .reset_index(drop=True))
    with tempfile.TemporaryDirectory() as d:
        flat = _write_event_chunks(spark, events, d)
        got = run_streaming_depth_change(spark, flat, schema,
                                         os.path.join(d, "ckpt"))
    want = depth_change_fold(level3).toPandas()
    assert not compare("streaming-depth-e2e", got, want)
