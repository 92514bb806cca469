"""Streaming near-duplicate detection — MinHash-LSH dedup ON INGEST.

The batch pipeline (:mod:`obadiah_spark.pipelines.dedup`) finds near-dup
candidates with a band-bucket self-join; a training-data INGEST pipeline
wants the same signal per arriving document against everything seen so
far, without re-scanning the corpus. This module re-expresses the
operator for Structured Streaming:

- ``minhash_bands_stream``: the stateless signature stage. Batch uses a
  shingle window + one wide groupBy; windows are not available on
  streaming frames, and the expression-only alternative (16
  ``array_min(transform(...))`` consumers over one shingle-array column)
  trips the CollapseProject O(n²) re-derivation trap — so the stage runs
  as one Arrow-batched ``mapInPandas`` pass, the same "Python at the
  streaming edge" position as the capture wire parse. The hash
  arithmetic is BIT-IDENTICAL to the batch/oracle form (60-bit
  ``md5(seed#shingle)`` prefix per seed, band signature =
  ``md5(m0#m1#m2#m3)``), proven by the batch-vs-stream differential
  test.
- ``minhash_lsh_stream``: the stateful stage. The batch band-bucket
  self-join becomes ``applyInPandasWithState`` keyed on (band,
  band_sig): state = the doc_ids seen in the bucket so far; each
  arriving doc emits one candidate pair per resident.

Cap semantics (documented deviation): the batch operator counts each
bucket IN FULL and drops oversize buckets retroactively — a streaming
append sink cannot retract, so the stream stops emitting AND enrolling
once a bucket reaches ``max_bucket_size`` (prefix-capped). On corpora
where no bucket exceeds the cap the two operators produce the SAME pair
set (the differential test's regime); hot buckets yield a bounded
prefix instead of nothing.

Scale posture: state is O(docs enrolled) per bucket, capped; the only
shuffle is the groupBy on (band, band_sig) — the same key the batch join
shuffles on. Pairs for one document = one state lookup, not a corpus
scan. Production deployments bound total state with
``state_timeout="<duration>"`` (idle buckets expire; a re-seen bucket
restarts empty, trading recall across the gap for bounded memory — the
standard streaming-dedup TTL compromise). Since r12 the TTL defaults to
EVENT-time (``event_time_col`` + watermark, timeouts armed at last
arrival + TTL): eviction is a function of the data, so a replay evicts
the same buckets at the same micro-batches as the live run — the
replay-equals-live property the differentials guarantee extends to the
timeout path (VERDICT r11 #5). ``timeout_mode="processing"`` keeps
wall-clock reaping for streams that go silent.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState

from obadiah_spark.streaming.state_ttl import (arm_event_timeout,
                                               resolve_timeout)
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                               LongType, StringType, StructField,
                               StructType, TimestampType)

from obadiah_spark.pipelines.dedup import LSH_BANDS, LSH_ROWS, MINHASH_K

BANDS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("band", IntegerType()),
    StructField("band_sig", StringType()),
])

PAIRS_SCHEMA = StructType([
    StructField("doc_a", LongType()),
    StructField("doc_b", LongType()),
    StructField("band", IntegerType()),
])

_STATE_SCHEMA = StructType([
    StructField("seen", ArrayType(LongType())),
])


def _band_sigs(text: str) -> list[str] | None:
    """K=16 min-hashes over distinct 3-word shingles → the 4 band
    signatures, byte-for-byte the batch form: h(s, shingle) = int of the
    first 15 hex chars of md5("s#shingle"); band_sig =
    md5("m0#m1#m2#m3"). Returns None for docs with < 3 words (no
    shingle — the batch operator drops them the same way)."""
    words = text.split(" ")
    if len(words) < 3:
        return None
    shingles = {" ".join(words[i:i + 3]) for i in range(len(words) - 2)}
    mins = [None] * MINHASH_K
    for sh in shingles:
        for s in range(MINHASH_K):
            h = int(hashlib.md5(
                f"{s}#{sh}".encode()).hexdigest()[:15], 16)
            if mins[s] is None or h < mins[s]:
                mins[s] = h
    return [
        hashlib.md5("#".join(
            str(mins[b * LSH_ROWS + r]) for r in range(LSH_ROWS)
        ).encode()).hexdigest()
        for b in range(LSH_BANDS)
    ]


def _ts_ms(series: pd.Series) -> pd.Series:
    """datetime64 pandas column → epoch-millisecond int64."""
    return series.astype("datetime64[us]").astype("int64") // 1000


def minhash_bands_stream(docs: DataFrame,
                         event_time_col: str | None = None) -> DataFrame:
    """(doc_id, text) stream → (doc_id, band, band_sig) stream; stateless,
    shuffle-free, works on batch frames too (the differential tests run
    it both ways).  ``event_time_col`` forwards the document's event
    time as a ``ts`` TIMESTAMP column — the stateful stage's event-time
    TTL arms from per-arrival times, and the watermark must be declared
    on THIS stage's output (mapInPandas mints fresh attributes, so a
    watermark tagged upstream does not survive the stage)."""

    with_ts = event_time_col is not None
    cols = ["doc_id", "band", "band_sig"] + (["ts"] if with_ts else [])

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            ts = pdf[event_time_col] if with_ts else None
            for i, (doc_id, text) in enumerate(zip(pdf["doc_id"],
                                                   pdf["text"])):
                sigs = _band_sigs(text)
                if sigs is None:
                    continue
                tail = (ts.iloc[i],) if with_ts else ()
                rows.extend((int(doc_id), b, sig) + tail
                            for b, sig in enumerate(sigs))
            yield pd.DataFrame(rows, columns=cols)

    schema = BANDS_SCHEMA
    sel = ["doc_id", "text"]
    if with_ts:
        schema = StructType(BANDS_SCHEMA.fields
                            + [StructField("ts", TimestampType())])
        sel.append(event_time_col)
    return docs.select(*sel).mapInPandas(gen, schema=schema)


def minhash_lsh_stream(docs: DataFrame, max_bucket_size: int = 50,
                       state_timeout: str | None = None,
                       event_time_col: str | None = None,
                       timeout_mode: str = "event",
                       watermark_delay: str | None = None) -> DataFrame:
    """Streaming near-dup candidates: one (doc_a, doc_b, band) row per
    (new doc, already-enrolled doc) meeting in a band bucket
    (doc_a < doc_b). A pair meeting in several bands emits once per band
    — dedup downstream (``dropDuplicates`` on a stream, or at the sink)
    exactly as the batch operator's ``distinct`` does.

    TTL: with ``state_timeout`` set, the default ``timeout_mode="event"``
    needs ``event_time_col`` (a timestamp column on ``docs``); the
    operator attaches a watermark (delay = ``watermark_delay`` or the
    TTL) and arms each bucket's timeout at (last arrival's event time +
    TTL) — eviction is then a function of the data, so a replay evicts
    the same buckets at the same micro-batches as live (VERDICT r11 #5;
    processing-time eviction cannot promise that).
    ``timeout_mode="processing"`` keeps wall-clock reaping for streams
    that go silent."""
    timeout, ttl_ms, use_event = resolve_timeout(
        state_timeout, timeout_mode, event_time_col)

    def fn(key, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (seen,) = state.get if state.exists else ([],)
        seen = list(seen)
        band = int(key[0])
        rows = []
        last_ms = None
        for pdf in pdfs:
            if use_event and len(pdf):
                mx = int(_ts_ms(pdf["ts"]).max())
                last_ms = mx if last_ms is None else max(last_ms, mx)
            # sort: deterministic enrollment order however the micro-batch
            # happened to partition (replays produce identical output)
            for doc in sorted(int(d) for d in pdf["doc_id"]):
                if len(seen) >= max_bucket_size:
                    break  # hot bucket: prefix-capped (module docstring)
                if doc in seen:
                    continue  # duplicate arrival: enrolled once, no re-emit
                rows.extend(
                    (s, doc, band) if s < doc else (doc, s, band)
                    for s in seen)
                seen.append(doc)
        state.update((seen,))
        if state_timeout:
            if use_event:
                arm_event_timeout(state, last_ms, ttl_ms)
            else:
                state.setTimeoutDuration(state_timeout)
        if rows:
            yield pd.DataFrame(rows, columns=["doc_a", "doc_b", "band"])

    bands = minhash_bands_stream(
        docs, event_time_col if use_event else None)
    if use_event:
        # the watermark must tag the stateful op's DIRECT input — a
        # watermark declared on docs is lost at the mapInPandas boundary
        bands = bands.withWatermark("ts", watermark_delay or state_timeout)
    return (
        bands.groupBy("band", "band_sig")
        .applyInPandasWithState(fn, PAIRS_SCHEMA, _STATE_SCHEMA,
                                outputMode="append", timeoutConf=timeout)
    )


# ------------------------------------------------ embedding near-dup -------

def _sigs_with_vecs(emb: DataFrame, tables: int, planes: int,
                    event_time_col: str | None = None) -> DataFrame:
    """(vec_id, table, sig, embedding[, ts]): `similarity.lsh_signatures`
    with the vector carried along — the stateful stage scores exact
    cosine in-state, so the embedding must ride to the bucket.
    ``event_time_col`` forwards arrival timestamps as ``ts`` for the
    event-time TTL (same contract as minhash_bands_stream: the
    watermark is declared on THIS stage's output)."""
    import numpy as np

    from obadiah_spark.pipelines.similarity import _plane_weights

    with_ts = event_time_col is not None

    def compute(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            e = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            if weights is None:
                weights = _plane_weights(e.shape[1], tables, planes)
            out = []
            for t in range(tables):
                bits = (e @ weights[t].T > 0).astype(np.uint8)
                cols = {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "table": t,
                    "sig": ["".join(map(str, row)) for row in bits],
                    "embedding": pdf["embedding"].to_numpy(),
                }
                if with_ts:
                    cols["ts"] = pdf[event_time_col].to_numpy()
                out.append(pd.DataFrame(cols))
            yield pd.concat(out, ignore_index=True)

    sel = ["vec_id", "embedding"] + ([event_time_col] if with_ts else [])
    schema = ("vec_id bigint, table int, sig string, "
              "embedding array<float>" + (", ts timestamp" if with_ts else ""))
    return emb.select(*sel).mapInPandas(compute, schema)


def _cosine9(a: list, b: list) -> float:
    """Round-9 cosine with SEQUENTIAL left-fold sums — the exact float
    op order of the engine's `_DOT` SQL fold (numpy's pairwise reduction
    rounds differently in the last ulp, which could flip a pair sitting
    on the threshold between the batch and streaming forms)."""
    daa = dbb = dab = 0.0
    for x, y in zip(a, b):
        x = float(x)
        y = float(y)
        daa += x * x
        dbb += y * y
        dab += x * y
    return round(dab / ((daa ** 0.5) * (dbb ** 0.5)), 9)


def embedding_dedup_stream(emb: DataFrame, min_cosine: float = 0.45,
                           tables: int | None = None,
                           planes: int | None = None,
                           max_bucket_size: int = 50,
                           state_timeout: str | None = None,
                           event_time_col: str | None = None,
                           timeout_mode: str = "event",
                           watermark_delay: str | None = None) -> DataFrame:
    """Streaming embedding near-duplicate pairs ON INGEST: sign-LSH
    buckets (default = the batch dedup sweep's DEDUP_TABLES x
    DEDUP_PLANES geometry) with per-bucket state carrying the enrolled
    vectors; each arriving vector exact-scores against the residents and
    emits (vec_a, vec_b, cosine) for every pair at or above
    ``min_cosine`` (vec_a < vec_b; a pair colliding in several tables
    emits per table — dedup downstream like the batch `distinct`).

    Same cap and TTL semantics as :func:`minhash_lsh_stream` — including
    the event-time TTL contract (``event_time_col`` + watermark,
    replay-deterministic eviction); on corpora where no bucket exceeds
    the cap, the pair set equals the batch
    `ann_lsh_pairs(emb, min_cosine, tables, planes)` set exactly
    (differential-tested; driver gate ``embedding_dedup_stream`` since
    r12)."""
    from obadiah_spark.pipelines.dedup import DEDUP_PLANES, DEDUP_TABLES

    tables = DEDUP_TABLES if tables is None else tables
    planes = DEDUP_PLANES if planes is None else planes
    out_schema = StructType([
        StructField("vec_a", LongType()),
        StructField("vec_b", LongType()),
        StructField("cosine", DoubleType()),
    ])
    state_schema = StructType([
        StructField("ids", ArrayType(LongType())),
        # doubles round-trip the state store bit-exactly
        StructField("vecs", ArrayType(ArrayType(DoubleType()))),
    ])
    timeout, ttl_ms, use_event = resolve_timeout(
        state_timeout, timeout_mode, event_time_col)

    def fn(key, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (ids, vecs) = state.get if state.exists else ([], [])
        ids = list(ids)
        vecs = [list(v) for v in vecs]
        rows = []
        last_ms = None
        for pdf in pdfs:
            if use_event and len(pdf):
                mx = int(_ts_ms(pdf["ts"]).max())
                last_ms = mx if last_ms is None else max(last_ms, mx)
            order = sorted(range(len(pdf)),
                           key=lambda i: int(pdf["vec_id"].iloc[i]))
            for i in order:
                if len(ids) >= max_bucket_size:
                    break  # hot bucket: prefix-capped
                vid = int(pdf["vec_id"].iloc[i])
                if vid in ids:
                    continue
                vec = [float(x) for x in pdf["embedding"].iloc[i]]
                for rid, rvec in zip(ids, vecs):
                    a, av, b, bv = ((rid, rvec, vid, vec) if rid < vid
                                    else (vid, vec, rid, rvec))
                    c = _cosine9(av, bv)
                    if c >= min_cosine:
                        rows.append((a, b, c))
                ids.append(vid)
                vecs.append(vec)
        state.update((ids, vecs))
        if state_timeout:
            if use_event:
                arm_event_timeout(state, last_ms, ttl_ms)
            else:
                state.setTimeoutDuration(state_timeout)
        if rows:
            yield pd.DataFrame(rows, columns=["vec_a", "vec_b", "cosine"])

    sigs = _sigs_with_vecs(emb, tables, planes,
                           event_time_col if use_event else None)
    if use_event:
        # watermark on the stateful op's direct input (see minhash note)
        sigs = sigs.withWatermark("ts", watermark_delay or state_timeout)
    return (
        sigs.groupBy("table", "sig")
        .applyInPandasWithState(fn, out_schema, state_schema,
                                outputMode="append", timeoutConf=timeout)
    )
