"""Incremental raw-events → level3 ingestion (I1 + I8 as a streaming job).

Reference parity: ``bitfinex.capture_transient_raw_book_events`` (I1,
db/bitfinex_schema.sql:279-468) + ``level3_incorporate_new_event`` (I8,
db/obanalytics_schema.sql:1760-1834). The reference chains events with row
triggers on insert; here each micro-batch is a window transform plus a
CROSS-BATCH TAIL STATE: for every open (order, era) chain we remember its
last event, so a new batch (a) replaces the tail when the same episode is
amended (per-episode dedup keeping the latest message, I1 :374-384), or
(b) links the tail forward (next_microtimestamp / next_event_no / fill,
I8 semantics). Chain-terminal classification ('alive'/'deleted') is
tentative until the stream closes — exactly the trigger model's behavior.

Differential contract (tested): feeding the same events through any batch
split must reproduce the one-shot batch synthesis bit-for-bit.

Scale note: the tail state is O(open chains) per (pair, era) — in production
this state lives in ``transformWithStateInPandas`` keyed by (pair, era,
order); the driver-side dict here mirrors that state machine 1:1 and keeps
the test surface deterministic.
"""

from __future__ import annotations

import pandas as pd

_WEEK_ANCHOR = pd.Timestamp("2024-01-01")  # a Monday; date_trunc('week') grid


class Level3Ingestor:
    """Accumulates level3 rows across micro-batches of raw events."""

    def __init__(self) -> None:
        self.rows: list[dict] = []
        # (order_id, era) -> dict(idx=<index into rows>, prev_amount=float|None,
        #                         chain_start=Timestamp, count=int)
        self.tails: dict[tuple, dict] = {}

    # -- the same derivations as synth.LEVEL3_BODY_SQL, row-at-a-time -------
    @staticmethod
    def _keyed(ev: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "event_id": ev["event_id"].astype("int64"),
            "local_timestamp": ev["ts"],
        })
        out["microtimestamp"] = ev["ts"].dt.floor("min")
        out["order_id"] = 1 + out["event_id"] % 240
        out["pair_id"] = (1 + out["order_id"] % 2).astype("int32")
        out["exchange_id"] = 1
        out["side"] = (out["order_id"] % 4 < 2).map({True: "b", False: "s"})
        days = pd.to_timedelta(out["microtimestamp"].dt.weekday, unit="D")
        out["era"] = (out["microtimestamp"] - days).dt.normalize()
        group = (out["order_id"] - out["order_id"] % 4) // 4
        cents = (10000 - group % 25).where(out["side"] == "b", 10005 + group % 25)
        out["price"] = cents.astype("float64") / 100.0
        step = (out["event_id"] - out["event_id"] % 240) // 240
        out["amount"] = (1 + (step * 7 + out["order_id"]) % 40).astype("float64") / 4.0
        return out

    def process_batch(self, batch: pd.DataFrame) -> None:
        if len(batch) == 0:
            return
        ev = self._keyed(batch)
        # in-batch per-episode dedup: keep the LATEST message per
        # (order, minute) — order by (local_timestamp, event_id)
        ev = ev.sort_values(["order_id", "microtimestamp", "local_timestamp", "event_id"])
        ev = ev.drop_duplicates(["order_id", "microtimestamp"], keep="last")
        ev = ev.sort_values(["order_id", "microtimestamp"])
        for r in ev.itertuples(index=False):
            key = (int(r.order_id), r.era)
            tail = self.tails.get(key)
            if tail is not None and self.rows[tail["idx"]]["microtimestamp"] == r.microtimestamp:
                # cross-batch episode amendment: the later message replaces
                # the tail if it is newer by (local_timestamp, event_id)
                row = self.rows[tail["idx"]]
                if (r.local_timestamp, r.event_id) >= (row["local_timestamp"], row["event_id"]):
                    row.update(
                        amount=r.amount, local_timestamp=r.local_timestamp,
                        event_id=int(r.event_id),
                        fill=None if tail["prev_amount"] is None
                        else tail["prev_amount"] - r.amount,
                    )
                continue
            if tail is None:
                self.tails[key] = tail = {
                    "idx": len(self.rows), "prev_amount": None,
                    "chain_start": r.microtimestamp, "count": 1,
                }
                fill = None
            else:
                prev = self.rows[tail["idx"]]
                prev["next_microtimestamp"] = r.microtimestamp
                prev["next_event_no"] = prev["event_no"] + 1
                prev["chain_state"] = "chained"
                tail["prev_amount"] = prev["amount"]
                tail["count"] += 1
                tail["idx"] = len(self.rows)
                fill = prev["amount"] - r.amount
            self.rows.append({
                "microtimestamp": r.microtimestamp,
                "order_id": int(r.order_id),
                "event_no": tail["count"],
                "side": r.side,
                "price": r.price,
                "amount": r.amount,
                "fill": fill,
                "next_microtimestamp": None,
                "next_event_no": None,
                "pair_id": int(r.pair_id),
                "exchange_id": int(r.exchange_id),
                "local_timestamp": r.local_timestamp,
                "price_microtimestamp": tail["chain_start"],
                "price_event_no": 1,
                "chain_state": None,  # finalized at close
                "era": r.era,
                "event_id": int(r.event_id),
            })

    def finalize(self) -> pd.DataFrame:
        """Classify open tails ('deleted' for order_id % 3 == 0 else 'alive')
        and return the accumulated level3 log."""
        out = pd.DataFrame(self.rows)
        if len(out) == 0:
            return out
        open_mask = out["chain_state"].isna()
        out.loc[open_mask & (out["order_id"] % 3 == 0), "chain_state"] = "deleted"
        out.loc[open_mask & (out["order_id"] % 3 != 0), "chain_state"] = "alive"
        return out


def run_streaming_ingest(spark, events_dir: str, schema: str,
                         checkpoint_dir: str) -> pd.DataFrame:
    """Drive a file-source stream (one file per micro-batch) through the
    ingestor with the SRC5 watermark declared, availableNow trigger."""
    from obadiah_spark.streaming.reorder import sort_batch, with_reorder_watermark

    ingestor = Level3Ingestor()
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    stream = with_reorder_watermark(stream, "ts", "1 second")

    def handle(batch_df, batch_id):  # noqa: ANN001
        ingestor.process_batch(sort_batch(batch_df, "ts").toPandas())

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return ingestor.finalize()
