"""Document chunking — the embedding-prep step of a RAG/retrieval
pipeline: split each document into fixed-size word windows with
overlap, carrying provenance (doc_id, chunk_no, word offset) so chunks
join back to their sources.

Pure JVM array expressions (split → filter → sequence → slice →
array_join): no Python in the loop, no shuffle — chunking is a flat
map, and downstream embedding/indexing sees (chunk_id, text) rows whose
count is ~n_words / stride per document.  The window grid is
deterministic: chunks start at word offsets 0, stride, 2·stride, …
(stride = chunk_words − overlap_words), and the FINAL window is the
one that first covers the document's tail (no degenerate sub-overlap
tail chunks; a document shorter than one window yields exactly one
chunk).  The DuckDB oracle rebuilds the identical grid, so a value gate
pins every boundary and every chunk's text.

No reference-repo counterpart (market-data engine); LLM-pipeline brief.
r13 gate candidate (the r12 rotation window is full); the oracle below
is exercised in-pytest meanwhile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from obadiah_spark.pipelines.docquality import WS_CLASS

CHUNK_WORDS = 32
CHUNK_OVERLAP = 8


def chunk_documents(docs: DataFrame, chunk_words: int = CHUNK_WORDS,
                    overlap_words: int = CHUNK_OVERLAP) -> DataFrame:
    """(doc_id, chunk_no, start_word, n_words, chunk) — word windows of
    ``chunk_words`` overlapping by ``overlap_words``.  The last window
    starts at the largest grid offset that still adds new words, i.e.
    chunk starts run over [0, ceil((len - chunk)/stride)] ∩ grid."""
    if not 0 <= overlap_words < chunk_words:
        raise ValueError("need 0 <= overlap_words < chunk_words")
    stride = chunk_words - overlap_words
    arr = F.filter(F.split(F.col("text"), WS_CLASS),
                   lambda w: F.length(w) > 0)
    # number of chunks: 1 + ceil(max(len - chunk, 0) / stride)
    n_chunks = (F.lit(1) + F.ceil(
        F.greatest(F.size("arr") - chunk_words, F.lit(0))
        / F.lit(stride)).cast("int"))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_no"),
            (i * stride).alias("start_word"),
            F.slice("arr", i * stride + 1, chunk_words).alias("w")))
    return (docs.select("doc_id", arr.alias("arr"))
            .filter(F.size("arr") > 0)
            .select("doc_id", F.explode(chunks).alias("c"))
            .select("doc_id",
                    F.col("c.chunk_no").cast("long").alias("chunk_no"),
                    F.col("c.start_word").cast("long").alias("start_word"),
                    F.size("c.w").cast("long").alias("n_words"),
                    F.array_join("c.w", " ").alias("chunk")))


def chunk_documents_oracle_sql(chunk_words: int = CHUNK_WORDS,
                               overlap_words: int = CHUNK_OVERLAP,
                               table: str = "documents") -> str:
    """DuckDB replica of :func:`chunk_documents`."""
    stride = chunk_words - overlap_words
    return f"""
WITH w AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '{WS_CLASS}'),
                       x -> length(x) > 0) AS ws
    FROM {table}
), g AS (
    SELECT doc_id, ws,
           1 + CAST(ceil(greatest(len(ws) - {chunk_words}, 0)
                         / {stride}.0) AS BIGINT) AS n_chunks
    FROM w WHERE len(ws) > 0
), c AS (
    SELECT doc_id, ws,
           unnest(generate_series(0, n_chunks - 1)) AS chunk_no
    FROM g
)
SELECT doc_id,
       CAST(chunk_no AS BIGINT) AS chunk_no,
       CAST(chunk_no * {stride} AS BIGINT) AS start_word,
       CAST(len(ws[chunk_no * {stride} + 1:
                   chunk_no * {stride} + {chunk_words}]) AS BIGINT)
           AS n_words,
       array_to_string(ws[chunk_no * {stride} + 1:
                          chunk_no * {stride} + {chunk_words}], ' ')
           AS chunk
FROM c
"""
