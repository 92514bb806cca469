"""SRC4 wire-half end-to-end: bitstamp channel JSON → streaming query →
transient bronze → I7 chaining transform, differentially checked against a
driver-side replay of the reference handler rules
(python/obadiah/bitstamp.py:27-148)."""

from __future__ import annotations

import json
import os
import time

from obadiah_spark.streaming.capture import (
    BitstampCaptureSink, capture_bitstamp, parse_bitstamp_frames,
    route_bitstamp_batch)

PAIR = "btcusd"


def _order_msg(event: str, oid: int, us: int, amount: float, price: float,
               order_type: int) -> str:
    return json.dumps({
        "event": event,
        "channel": f"live_orders_{PAIR}",
        "data": {
            "id": oid,
            "microtimestamp": str(us),
            "datetime": f"{us // 1_000_000}.0",
            "amount": amount, "amount_str": f"{amount:.8f}",
            "price": price, "price_str": f"{price:.2f}",
            "order_type": order_type,
        },
    })


def _trade_msg(tid: int, us: int, amount: float, price: float,
               buy_oid: int, sell_oid: int, ttype: int) -> str:
    return json.dumps({
        "event": "trade",
        "channel": f"live_trades_{PAIR}",
        "data": {
            "id": tid,
            "microtimestamp": str(us),
            "amount": amount, "amount_str": f"{amount:.8f}",
            "price": price, "price_str": f"{price:.2f}",
            "buy_order_id": buy_oid, "sell_order_id": sell_oid,
            "type": ttype,
        },
    })


def _wire_lines() -> list[str]:
    t0 = 1_700_000_000_000_000
    lines = [
        json.dumps({"event": "bts:subscription_succeeded",
                    "channel": f"live_orders_{PAIR}", "data": {}}),
        json.dumps({"event": "bts:subscription_succeeded",
                    "channel": f"live_trades_{PAIR}", "data": {}}),
    ]
    # 20 order lifecycles: create → change → (delete for even ids)
    for i in range(20):
        oid, side = 500 + i, i % 2
        base = t0 + i * 1_000_000
        lines.append(_order_msg("order_created", oid, base,
                                1.0 + i, 100.0 + i, side))
        lines.append(_order_msg("order_changed", oid, base + 400_000,
                                0.5 + i, 100.0 + i, side))
        if i % 2 == 0:
            lines.append(_order_msg("order_deleted", oid, base + 800_000,
                                    0.5 + i, 100.0 + i, side))
        if i % 5 == 3:
            lines.append(_trade_msg(9000 + i, base + 500_000, 0.5,
                                    100.0 + i, 500 + i, 400 + i, side))
    lines.append("not json")                       # tolerance check
    lines.append(json.dumps({"no_event_key": 1}))  # malformed dict
    return lines


def _expected_counts(lines):
    orders = trades = 0
    for ln in lines:
        try:
            m = json.loads(ln)
        except ValueError:
            continue
        if not isinstance(m, dict):
            continue
        ev = m.get("event")
        if ev in ("order_created", "order_changed", "order_deleted"):
            orders += 1
        elif ev == "trade":
            trades += 1
    return orders, trades


def test_parse_and_route_batch(spark):
    import pyspark.sql.functions as F

    lines = _wire_lines()
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    parsed = parse_bitstamp_frames(df.coalesce(1)).withColumn(
        "_lts", F.current_timestamp()).cache()
    want_o, want_t = _expected_counts(lines)
    assert parsed.filter("kind = 'order'").count() == want_o
    assert parsed.filter("kind = 'trade'").count() == want_t
    # "not json" + the keyless dict (the reference would KeyError on it —
    # our tolerance contract quarantines instead)
    assert parsed.filter("kind = 'garbage'").count() == 2
    assert parsed.filter("kind = 'event'").count() == 2  # the two acks

    era_us = 1_700_000_000_000_000
    orders, trades, garbage = route_bitstamp_batch(parsed, pair_id=3,
                                                   era_us=era_us)
    o = orders.collect()
    assert len(o) == want_o
    assert all(r.pair_id == 3 for r in o)
    assert all(r.era is not None for r in o)
    by_evt = {r.event_id: r for r in o}
    assert len(by_evt) == want_o  # event ids unique
    # order_type decoding: 1 = sell
    first = min(o, key=lambda r: r.event_id)
    assert first.event == "order_created" and first.order_type == "buy"
    t = trades.collect()
    assert len(t) == want_t
    assert {r.trade_type for r in t} <= {"buy", "sell"}
    assert garbage.count() == 2
    parsed.unpersist()


def test_bitstamp_capture_files_end_to_end(spark, tmp_path):
    lines = _wire_lines()
    src = tmp_path / "bs_wire"
    src.mkdir()
    (src / "a.txt").write_text("\n".join(lines[:2]) + "\n")
    (src / "b.txt").write_text("\n".join(lines[2:30]) + "\n")
    (src / "c.txt").write_text("\n".join(lines[30:]) + "\n")
    now = time.time()
    for i, f in enumerate(["a.txt", "b.txt", "c.txt"]):
        os.utime(src / f, (now + 10 * i, now + 10 * i))
    bronze = str(tmp_path / "bs_bronze")
    q = capture_bitstamp(spark, bronze, str(tmp_path / "bs_ckpt"), pair_id=1,
                         files_dir=str(src), max_files_per_trigger=1)
    want_o, want_t = _expected_counts(lines)
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                no = spark.read.parquet(
                    os.path.join(bronze, "transient_live_orders")).count()
                nt = spark.read.parquet(
                    os.path.join(bronze, "transient_live_trades")).count()
                if no >= want_o and nt >= want_t:
                    break
            except Exception:
                pass
            time.sleep(1)
    finally:
        q.stop()

    orders = spark.read.parquet(
        os.path.join(bronze, "transient_live_orders"))
    trades = spark.read.parquet(
        os.path.join(bronze, "transient_live_trades"))
    assert orders.count() == want_o
    assert trades.count() == want_t
    # era sidecar: resolved to the FIRST order event's microtimestamp and
    # stamped on every order row (bitstamp.py:84-90)
    eras = orders.select("era").distinct().collect()
    assert len(eras) == 1
    assert q.capture_sink.era_us == 1_700_000_000_000_000

    # downstream: the captured stream feeds the I7 chaining transform
    from obadiah_spark.sources.bitstamp import capture_transient_orders

    chained = capture_transient_orders(orders).cache()
    assert chained.count() == want_o
    # every created chain numbers its events 1..n with a terminal state
    import pyspark.sql.functions as F
    created = chained.filter(F.col("event_no").isNotNull())
    assert created.filter("event_no = 1").count() == 20
    deleted = created.filter("chain_state = 'deleted'")
    assert deleted.count() == 10  # even ids got a delete
    # chained rows carry a forward pointer, terminals none
    bad_ptr = created.filter(
        ((F.col("chain_state") == "chained")
         & F.col("next_microtimestamp").isNull())
        | (F.col("chain_state").isin("alive", "deleted")
           & F.col("next_microtimestamp").isNotNull()))
    assert bad_ptr.count() == 0
    chained.unpersist()


def test_bitstamp_replayed_batch_idempotent(spark, tmp_path):
    import pyspark.sql.functions as F

    lines = _wire_lines()
    sink = BitstampCaptureSink(str(tmp_path / "bz"), pair_id=1)
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    sink(df, 0)
    p = str(tmp_path / "bz" / "transient_live_orders")
    n1 = spark.read.parquet(p).count()
    sink(df, 0)  # replay
    assert spark.read.parquet(p).count() == n1
    sink(df, 1)  # new batch: distinct event ids
    full = spark.read.parquet(p)
    assert full.select("event_id").distinct().count() == full.count()


def test_bitstamp_capture_socket_transport(spark, tmp_path):
    """The production transport for the bitstamp channels: a localhost TCP
    server replays the wire (mirror of the bitfinex socket test)."""
    import socketserver
    import threading

    import pytest

    lines = _wire_lines()
    payload = ("\n".join(lines) + "\n").encode()

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            self.request.sendall(payload)
            time.sleep(30)

    server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    server.daemon_threads = True
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    bronze = str(tmp_path / "bs_sock")
    want_o, want_t = _expected_counts(lines)
    try:
        q = capture_bitstamp(spark, bronze, str(tmp_path / "bs_sock_ckpt"),
                             pair_id=1, host="127.0.0.1", port=port)
        deadline = time.time() + 90
        done = False
        try:
            while time.time() < deadline:
                try:
                    no = spark.read.parquet(os.path.join(
                        bronze, "transient_live_orders")).count()
                    nt = spark.read.parquet(os.path.join(
                        bronze, "transient_live_trades")).count()
                    if no >= want_o and nt >= want_t:
                        done = True
                        break
                except Exception:
                    pass
                time.sleep(1)
        finally:
            q.stop()
        if not done:
            pytest.skip("socket transport did not drain in time (CI timing)")
        assert spark.read.parquet(os.path.join(
            bronze, "transient_live_orders")).count() == want_o
    finally:
        server.shutdown()
        server.server_close()


def test_bitstamp_fresh_session_never_clobbers_bronze(spark, tmp_path):
    """A new capture session (fresh checkpoint/era dir — how a new era
    opens after a gap) must not overwrite the prior era's transient
    bronze leaves even though streaming batch ids restart at 0."""
    lines = _wire_lines()
    bronze = str(tmp_path / "bz")
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")

    s1 = BitstampCaptureSink(bronze, pair_id=1,
                             era_dir=str(tmp_path / "ck1"))
    s1(df, 0)
    p = os.path.join(bronze, "transient_live_orders")
    n1 = spark.read.parquet(p).count()
    assert n1 > 0

    s2 = BitstampCaptureSink(bronze, pair_id=1,
                             era_dir=str(tmp_path / "ck2"))
    s2(df, 0)
    full = spark.read.parquet(p)
    assert full.count() == 2 * n1
    assert full.select("event_id").distinct().count() == full.count()


def test_reassign_transient_eras_restores_and_falls_back(spark):
    """Era reassignment (pga_capture_transient opener): future-stamped rows
    move to the as-of era; rows whose pair has no era at or before the
    event keep their (wrong) era rather than going NULL — the documented
    deviation."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from obadiah_spark.sources.bitstamp import reassign_transient_eras

    w1, w2 = datetime(2024, 1, 1), datetime(2024, 1, 8)
    rows = [
        # (event_id, pair, ts, era) — era column possibly misassigned
        (1, 1, datetime(2024, 1, 3), w1),    # correct: untouched
        (2, 1, datetime(2024, 1, 9), w2),    # correct: untouched
        (3, 1, datetime(2024, 1, 4), w2),    # future-stamped -> back to w1
        (4, 1, datetime(2024, 1, 10), datetime(2024, 1, 15)),  # unknown
        # future era, as-of exists -> w2
        (5, 2, datetime(2024, 1, 5), w2),    # pair 2 NOT in registry:
        # era > ts but no as-of era -> kept as-is (fallback)
    ]
    t = spark.createDataFrame(
        rows, "event_id int, pair_id int, microtimestamp timestamp, "
              "era timestamp")
    eras = spark.createDataFrame([(1, w1), (1, w2)],
                                 "pair_id int, era timestamp")
    got = {r.event_id: r.era for r in reassign_transient_eras(t, eras).collect()}
    assert got == {1: w1, 2: w2, 3: w1, 4: w2, 5: w2}
    # zero-shuffle contract: the plan is a broadcast join over a map-side
    # projection — no Exchange on the transient side
    plan = reassign_transient_eras(t, eras)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
