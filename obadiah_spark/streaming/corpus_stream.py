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

Driver gate since r12 (``corpus_clean_stream`` row: the documents table
replayed in doc_id order, hashed against the batch corpus_clean SQL);
tests/test_corpus_stream.py's batch≡stream differentials pin the
semantics, including cross-micro-batch duplicates.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType, TimestampType)

from obadiah_spark.streaming.state_ttl import (arm_event_timeout,
                                               resolve_timeout)

_SURVIVOR_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
])

_SEEN_SCHEMA = StructType([
    StructField("seen", LongType()),
])


def fingerprinted(docs: DataFrame) -> DataFrame:
    """Adds the batch operator's exact fingerprint column — the
    normalizer expression is SHARED with ``exact_dedup`` (one
    definition, so the batch window and the ingest state can never
    fingerprint differently); a pure expression, legal on streams."""
    from obadiah_spark.pipelines.dedup import norm_text_expr

    return docs.withColumn("fingerprint", F.md5(norm_text_expr()))


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
    timeout, ttl_ms, use_event = resolve_timeout(
        state_timeout, timeout_mode, event_time_col)

    def fn(key, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        # the min must span EVERY Arrow chunk of the group — a
        # micro-batch larger than maxRecordsPerBatch arrives in several
        # pdfs, and the minimum doc_id may sit in a later one (review
        # r12 finding: first-chunk-only broke the min-doc_id tie-break)
        best_id = None
        best_text = None
        last_ms = None
        for pdf in pdfs:
            if use_event and len(pdf):
                mx = int(pdf["ts"].astype("datetime64[us]")
                         .astype("int64").max() // 1000)
                last_ms = mx if last_ms is None else max(last_ms, mx)
            if seen or len(pdf) == 0:
                continue
            i = int(pdf["doc_id"].astype("int64").idxmin())
            did = int(pdf["doc_id"].loc[i])
            if best_id is None or did < best_id:
                best_id, best_text = did, pdf["text"].loc[i]
        state.update((1,))
        if state_timeout:
            if use_event:
                arm_event_timeout(state, last_ms, ttl_ms)
            else:
                state.setTimeoutDuration(state_timeout)
        if best_id is not None:
            yield pd.DataFrame([(best_id, best_text)],
                               columns=["doc_id", "text"])

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


def quality_scrub(survivors: DataFrame, dup_n: int | None = None,
                  materialize: bool = True) -> DataFrame:
    """The per-document tail of ``corpus_clean`` (Gopher keep-filter +
    PII scrub + audit projection), applied to an already-deduplicated
    batch frame. Shared verbatim by the batch composition's semantics:
    both read nothing outside the document.

    ``materialize`` localCheckpoints the survivors frame (and the token
    frame) first — the same scan discipline as batch corpus_clean:
    gopher's three aggregates + the scrub join would otherwise re-plan
    the input subtree ~5 times, and when that subtree is the stateful
    first-seen fold of a micro-batch, re-executing a state-store read
    five times per trigger is both slow and an idempotence gamble
    (review r12 finding)."""
    from obadiah_spark.pipelines.docquality import (
        DUP_NGRAM_N, _words, gopher_quality, pii_scrub)

    dup_n = DUP_NGRAM_N if dup_n is None else dup_n
    tok = None
    if materialize:
        survivors = survivors.localCheckpoint()
        tok = _words(survivors).localCheckpoint()
    keep = (gopher_quality(survivors, dup_n=dup_n, tok=tok)
            .select("doc_id", "n_words", "keep"))
    kept = (survivors.join(keep, "doc_id")
            .filter(F.col("keep")).drop("keep"))
    return (
        pii_scrub(kept)
        .select("doc_id", "n_words",
                F.md5("redacted").alias("redacted_md5"),
                F.length("redacted").alias("redacted_len"))
    )


_SINK_SCHEMA = ("doc_id long, n_words long, redacted_md5 string, "
                "redacted_len int")


def run_corpus_clean_stream(spark, src_path: str, schema: str,
                            checkpoint: str, sink_table: str | None = None,
                            dup_n: int | None = None,
                            max_files_per_trigger: int = 1,
                            sink_path: str | None = None) -> str:
    """Drive the full ingest composition over a file-replay stream:
    stateful first-seen dedup, then the batch quality/scrub tail per
    micro-batch via ``foreachBatch``.

    The sink is DISTRIBUTED (VERDICT r12 what's-wrong #1): each
    micro-batch's cleaned projection APPENDS to a parquet directory
    executor-side — no output row ever crosses the driver, so the
    runner scales with the cluster's write bandwidth, not driver heap
    (at 100 TB the audit projection alone is 10⁸–10¹⁰ rows).
    ``sink_path`` defaults to a ``_sink`` sibling of the checkpoint —
    the pairing a restart needs anyway, since the checkpoint's replay
    position and the appended output advance together.  The write is
    IDEMPOTENT per micro-batch (ADVICE r13 #1): each batch OVERWRITES
    its own batch-scoped subdir, and Structured Streaming replays a
    retried or restart-recovered batch under the SAME ``batch_id``, so
    a partial write or a post-crash replay lands on the identical
    subdir instead of appending duplicate rows — effectively
    exactly-once end-to-end, matching the checkpoint pairing the
    docstring promises.  ``sink_table`` optionally registers a temp
    view READING BACK the parquet (the gate harness consumes that
    view; the view is a scan, not a driver-side row list).  Returns
    the sink path."""
    import os

    if sink_path is None:
        sink_path = checkpoint.rstrip("/") + "_sink"

    def handle(batch_df, batch_id: int) -> None:
        (quality_scrub(batch_df, dup_n=dup_n)
         .write.mode("overwrite")
         .parquet(os.path.join(sink_path, f"batch-{batch_id:09d}")))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(src_path))
    q = (dedup_first_seen_stream(stream)
         .writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if sink_table is not None:
        if os.path.isdir(sink_path):
            # batch-NNN subdirs are not hive partitions, so the read
            # needs the recursive lookup; any real read failure
            # (corrupt footer, permissions) propagates to the caller
            # instead of masquerading as an empty source (ADVICE r13 #3)
            out = (spark.read.schema(_SINK_SCHEMA)
                   .option("recursiveFileLookup", "true")
                   .parquet(sink_path))
        else:
            # an empty source never fired the handler — empty typed view
            out = spark.createDataFrame([], _SINK_SCHEMA)
        out.createOrReplaceTempView(sink_table)
    return sink_path
