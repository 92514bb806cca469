"""Streaming IVF-PQ index maintenance — similarity search ON INGEST.

At 100 TB the vector corpus is not loaded once; it arrives. The batch
half of this story already exists: ``write_ivfpq_index`` builds the
persisted cell-partitioned index and ``append_ivfpq_index`` grows it
without retraining (codebooks FROZEN — the standard IVF discipline
where retraining is a deliberate offline event, never an ingest side
effect).  This module is the Structured-Streaming driver for the same
contract: a vector stream flows through ``foreachBatch`` and each
micro-batch runs the exact ``_encode_vectors`` pass the batch build
runs, under codebooks written ONCE before the stream starts — so a
streamed index is row-identical to a single-shot batch build over the
same corpus (the differential ``tests/test_ann_ingest.py`` pins, the
same property ``append_ivfpq_index`` already carries in batch form).

Idempotence (the corpus_stream sink precedent, ADVICE r13 #1 family):
each micro-batch writes its encoded rows with ``partitionBy
("ingest_batch", "cell")`` in dynamic-partition-overwrite mode, so a
batch retried after a partial write — or replayed after a restart
against the same checkpoint, which reuses the SAME ``batch_id`` —
OVERWRITES its own ``ingest_batch=N`` partitions instead of appending
duplicates: effectively exactly-once end-to-end.

Query compatibility: ``ann_ivfpq_query`` reads ``<index>/vectors``
with partition discovery and joins probes on ``cell``; the extra
``ingest_batch`` partition level changes neither the join nor the
pruning (Spark prunes on any partition column, so a probed query
still reads only the ``cell=K`` leaf directories across batches).

Reference parity note: the reference's capture loop persists an
ever-growing raw stream and derives silver tables incrementally
(db/obanalytics_schema.sql checkpoint tables); this operator is the
same persist-incrementally discipline applied to the ANN index family
instead of the order-book family.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from obadiah_spark.pipelines.similarity import (IVF_CELLS, IVF_ITERS,
                                                IVF_STRIDE, IVF_TRAIN_MAX,
                                                IVF_TRAIN_STRIDE, PQ_DIM,
                                                PQ_KSUB, PQ_M,
                                                _encode_vectors,
                                                pq_subcodebooks,
                                                pq_train_subcodebooks,
                                                train_ivf_codebook)


def prepare_index_codebooks(spark, index_path: str,
                            train_emb: DataFrame | None = None,
                            codebook: DataFrame | None = None,
                            subcodebook: DataFrame | None = None,
                            n_cells: int = IVF_CELLS,
                            stride: int = IVF_STRIDE,
                            iters: int = IVF_ITERS,
                            train_stride: int = IVF_TRAIN_STRIDE,
                            train_max: int = IVF_TRAIN_MAX,
                            m: int = PQ_M, ksub: int = PQ_KSUB,
                            dim: int = PQ_DIM,
                            train_pq: bool = True):
    """Write (or reuse) the index's frozen ``codebook/`` and
    ``subcodebook/`` and return them as DataFrames.

    Resume rule: when both directories already exist they are REUSED
    verbatim and every training argument is ignored — a restarted
    ingest must encode under the same books as the rows already in the
    index, or old and new rows silently live in different quantization
    spaces.  On first run the books come from the supplied frames (the
    production path: trained offline on a sample) or are trained here
    from ``train_emb``."""
    from obadiah_spark.streaming.corpus_stream import _hadoop_fs

    cb_path = os.path.join(index_path, "codebook")
    sub_path = os.path.join(index_path, "subcodebook")
    # existence probed explicitly (Hadoop FS API — works on any
    # configured scheme); a present-but-unreadable book then FAILS the
    # read instead of silently retraining over the index, which would
    # fork the quantization space from the resident rows (the
    # error-masking trap ADVICE r13 #3 closed for the corpus sink)
    fs, cb_p = _hadoop_fs(spark, cb_path)
    _, sub_p = _hadoop_fs(spark, sub_path)
    cb_exists, sub_exists = fs.exists(cb_p), fs.exists(sub_p)
    if cb_exists != sub_exists:
        raise ValueError(
            f"index {index_path!r} holds only one of codebook/"
            f"subcodebook — a partial prior initialization; delete the "
            f"surviving half (or restore the missing one) before "
            f"ingesting")
    if cb_exists:
        return (spark.read.parquet(cb_path),
                spark.read.parquet(sub_path))

    # fresh index: validate BEFORE any write — a half-written index
    # (codebook persisted, then the subcodebook argument check fails)
    # would manufacture the partial-initialization state the guard
    # above permanently rejects
    if train_emb is None and (codebook is None or subcodebook is None):
        raise ValueError(
            "first ingest into a fresh index needs either BOTH "
            "codebook= and subcodebook= frames or train_emb= to train "
            "the missing ones from (the frozen-codebook discipline: "
            "books never derive from the stream)")
    if codebook is not None:
        got_cols = set(codebook.columns)
        if not {"cell", "c_emb"} <= got_cols:
            raise ValueError(
                f"codebook must be a (cell, c_emb) frame from "
                f"train_ivf_codebook, got columns {sorted(got_cols)}")
        got_cells = codebook.count()
        if got_cells > n_cells:
            raise ValueError(
                f"supplied codebook has {got_cells} cells but the index "
                f"was asked for n_cells={n_cells}: the persisted books "
                f"would not match the arguments (write_ivfpq_index's "
                f"ADVICE r14 #4 check, applied to the streaming path)")
    if subcodebook is not None:
        got_cols = set(subcodebook.columns)
        if not {"m", "j", "sc"} <= got_cols:
            raise ValueError(
                f"subcodebook must be an (m, j, sc) frame from "
                f"pq_subcodebooks/pq_train_subcodebooks, got columns "
                f"{sorted(got_cols)}")

    if codebook is None:
        codebook = train_ivf_codebook(train_emb, n_cells=n_cells,
                                      stride=stride, iters=iters,
                                      train_stride=train_stride,
                                      train_max=train_max)
    if subcodebook is None:
        subcodebook = (pq_train_subcodebooks(train_emb, iters, stride, m,
                                             ksub, dim, train_stride,
                                             train_max)
                       if train_pq
                       else pq_subcodebooks(train_emb, stride, m, ksub,
                                            dim))
    codebook.write.mode("overwrite").parquet(cb_path)
    subcodebook.write.mode("overwrite").parquet(sub_path)
    return (spark.read.parquet(cb_path), spark.read.parquet(sub_path))


def _check_no_stale_ingest_batches(spark, vectors_path: str,
                                   checkpoint: str) -> None:
    """Post-run guard (the corpus_stream stale-batch discipline): every
    ``ingest_batch=N`` partition must be ≤ the checkpoint's last
    committed batch.  A reused index with a FRESH or re-batched
    checkpoint replays fewer/larger batches, overwrites the low batch
    ids and silently KEEPS the higher ones from the longer prior run —
    duplicated vectors that inflate every ADC sum downstream."""
    from obadiah_spark.streaming.corpus_stream import (_hadoop_fs,
                                                       _max_committed_batch)

    fs, p = _hadoop_fs(spark, vectors_path)
    if not fs.exists(p):
        return
    last = _max_committed_batch(spark, checkpoint)
    stale = [n for n in
             (s.getPath().getName() for s in fs.listStatus(p))
             if n.startswith("ingest_batch=")
             and int(n[len("ingest_batch="):]) > last]
    if stale:
        raise ValueError(
            f"index vectors at {vectors_path!r} hold partitions beyond "
            f"the checkpoint's last committed batch {last} "
            f"({stale[:3]}…): stale output from a longer prior run "
            f"whose rows would duplicate vectors in every query — "
            f"delete them or restore the matching checkpoint")


def run_ann_index_ingest(spark, src_path: str, schema: str,
                         checkpoint: str, index_path: str,
                         train_emb: DataFrame | None = None,
                         codebook: DataFrame | None = None,
                         subcodebook: DataFrame | None = None,
                         m: int = PQ_M, ksub: int = PQ_KSUB,
                         dim: int = PQ_DIM, train_pq: bool = True,
                         max_files_per_trigger: int = 1) -> str:
    """Drive a vector file-stream into a persisted IVF-PQ index.

    ``src_path`` replays parquet files of ``(vec_id, embedding)`` rows
    (``schema``); each micro-batch assigns cells and PQ-encodes under
    the frozen books and lands in
    ``<index>/vectors/ingest_batch=N/cell=K/`` via an idempotent
    dynamic-partition overwrite.  Returns ``index_path``; query with
    :func:`~obadiah_spark.pipelines.similarity.ann_ivfpq_query`."""
    cb, subcb = prepare_index_codebooks(
        spark, index_path, train_emb=train_emb, codebook=codebook,
        subcodebook=subcodebook, m=m, ksub=ksub, dim=dim,
        train_pq=train_pq)
    vectors_path = os.path.join(index_path, "vectors")

    def handle(batch_df, batch_id: int) -> None:
        from pyspark.sql import functions as F

        (_encode_vectors(batch_df, cb, subcb, m, dim)
         .withColumn("ingest_batch", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("ingest_batch", "cell")
         .parquet(vectors_path))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(src_path))
    q = (stream.writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    _check_no_stale_ingest_batches(spark, vectors_path, checkpoint)
    return index_path
