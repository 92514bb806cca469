"""Streaming ``corpus_clean`` — the training-shard pipeline ON INGEST.

The batch composition (``pipelines.docquality.corpus_clean``) is
exact-dedup ∘ Gopher quality ∘ PII scrub. Re-expressed for Structured
Streaming, the decomposition is:

* **dedup is the ONLY cross-document stage** — it becomes
  ``applyInPandasWithState`` keyed on the SAME normalized-text md5
  fingerprint the batch window partitions by; state = one boolean per
  ever-seen fingerprint; an arriving document is emitted iff its
  fingerprint is new (first-seen-wins canonical — equal to the batch
  min-doc_id canonical whenever replay order is doc_id-ascending per
  fingerprint, which the differential pins);
* **quality + scrub are per-document** — so applying the BATCH
  operators to each micro-batch inside ``foreachBatch`` is not an
  approximation: ``gopher_quality`` and ``pii_scrub`` read nothing
  outside the document, hence batch-local application equals global
  application verbatim, with zero reimplementation to diverge.

Scale posture: the stateful stage shuffles once on the fingerprint (the
batch plan's own key), state is O(distinct documents) × (16-byte key +
a long), and every downstream stage is map-side per micro-batch. TTL
semantics follow the other ingest operators: ``state_timeout`` with the
event-time default bounds state to recently-seen fingerprints (a
re-seen fingerprint past the TTL is re-admitted — the standard
streaming-dedup recall trade, replay-deterministic under a watermark).

Registered r13 gate candidate; until then
tests/test_corpus_stream.py's batch≡stream differential (chunked replay
of the sf corpus must equal ``corpus_clean`` exactly) carries the
claim.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType, TimestampType)

_SURVIVOR_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
])

_SEEN_SCHEMA = StructType([
    StructField("seen", LongType()),
])


def fingerprinted(docs: DataFrame) -> DataFrame:
    """Adds the batch operator's exact fingerprint column (md5 of
    whitespace-normalized lowercase text) — a pure expression, legal on
    streams."""
    norm = F.lower(F.trim(F.regexp_replace(
        F.col("text"), r"[ \t\n\r\x0B\f]+", " ")))
    return docs.withColumn("fingerprint", F.md5(norm))


def dedup_first_seen_stream(docs: DataFrame,
                            state_timeout: str | None = None,
                            event_time_col: str | None = None,
                            timeout_mode: str = "event",
                            watermark_delay: str | None = None) -> DataFrame:
    """(doc_id, text[, ts]) stream → first-seen documents only.

    Within a micro-batch, ties on a new fingerprint break to the
    SMALLEST doc_id (matching the batch min-doc_id canonical for
    same-batch arrivals); across micro-batches, first arrival wins.
    Timeout knobs as in :mod:`.dedup_stream` (event-time default)."""
    from obadiah_spark.streaming.sessionize_stream import _duration_ms

    use_event = state_timeout is not None and timeout_mode == "event"
    if state_timeout is None:
        timeout = GroupStateTimeout.NoTimeout
    elif use_event:
        if event_time_col is None:
            raise ValueError(
                "timeout_mode='event' needs event_time_col; pass "
                "timeout_mode='processing' for wall-clock TTL")
        timeout = GroupStateTimeout.EventTimeTimeout
    elif timeout_mode == "processing":
        timeout = GroupStateTimeout.ProcessingTimeTimeout
    else:
        raise ValueError(f"unknown timeout_mode {timeout_mode!r}")
    ttl_ms = _duration_ms(state_timeout) if use_event else None

    def fn(key, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        out = []
        last_ms = None
        for pdf in pdfs:
            if use_event and len(pdf):
                mx = int(pdf["ts"].astype("datetime64[us]")
                         .astype("int64").max() // 1000)
                last_ms = mx if last_ms is None else max(last_ms, mx)
            if seen or len(pdf) == 0:
                continue
            i = int(pdf["doc_id"].astype("int64").idxmin())
            out.append((int(pdf["doc_id"].loc[i]), pdf["text"].loc[i]))
            seen = True
        state.update((1,))
        if state_timeout:
            if use_event:
                wm = state.getCurrentWatermarkMs()
                base = wm if last_ms is None else last_ms
                state.setTimeoutTimestamp(max(base + ttl_ms, wm + 1))
            else:
                state.setTimeoutDuration(state_timeout)
        if out:
            yield pd.DataFrame(out, columns=["doc_id", "text"])

    sel = ["doc_id", "text"]
    fp = fingerprinted(docs)
    if use_event:
        fp = (fp.withColumn("ts", F.col(event_time_col)
                            .cast(TimestampType()))
              .withWatermark("ts", watermark_delay or state_timeout))
        sel.append("ts")
    return (
        fp.select("fingerprint", *sel)
        .groupBy("fingerprint")
        .applyInPandasWithState(fn, _SURVIVOR_SCHEMA, _SEEN_SCHEMA,
                                outputMode="append", timeoutConf=timeout)
    )


def quality_scrub(survivors: DataFrame, dup_n: int | None = None) -> DataFrame:
    """The per-document tail of ``corpus_clean`` (Gopher keep-filter +
    PII scrub + audit projection), applied to an already-deduplicated
    batch frame. Shared verbatim by the batch composition's semantics:
    both read nothing outside the document."""
    from obadiah_spark.pipelines.docquality import (
        DUP_NGRAM_N, gopher_quality, pii_scrub)

    dup_n = DUP_NGRAM_N if dup_n is None else dup_n
    keep = (gopher_quality(survivors, dup_n=dup_n)
            .select("doc_id", "n_words", "keep"))
    kept = (survivors.join(keep, "doc_id")
            .filter(F.col("keep")).drop("keep"))
    return (
        pii_scrub(kept)
        .select("doc_id", "n_words",
                F.md5("redacted").alias("redacted_md5"),
                F.length("redacted").alias("redacted_len"))
    )


def run_corpus_clean_stream(spark, src_path: str, schema: str,
                            checkpoint: str, sink_table: str,
                            dup_n: int | None = None,
                            max_files_per_trigger: int = 1) -> None:
    """Drive the full ingest composition over a file-replay stream into
    an in-memory sink table: stateful first-seen dedup, then the batch
    quality/scrub tail per micro-batch via ``foreachBatch``."""
    rows: list = []

    def handle(batch_df, _batch_id: int) -> None:
        out = quality_scrub(batch_df, dup_n=dup_n)
        rows.extend(out.collect())

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(src_path))
    q = (dedup_first_seen_stream(stream)
         .writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if rows:
        spark.createDataFrame(
            rows, "doc_id long, n_words long, redacted_md5 string, "
                  "redacted_len int").createOrReplaceTempView(sink_table)
    else:
        spark.sql(
            "SELECT CAST(NULL AS LONG) doc_id, CAST(NULL AS LONG) n_words,"
            " CAST(NULL AS STRING) redacted_md5,"
            " CAST(NULL AS INT) redacted_len WHERE FALSE"
        ).createOrReplaceTempView(sink_table)
