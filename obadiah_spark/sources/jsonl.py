"""JSONL document connector — the wire format text corpora ship in.

Real LLM corpora arrive as newline-delimited JSON (one document object
per line: Common Crawl derivatives, HF datasets exports, internal
dumps).  :func:`read_documents_jsonl` reads them with the capture
loop's discipline: a STRICT declared schema, and garbage lines
quarantined as raw text instead of silently dropped or job-fatally
raised (the streaming capture's rule — nothing is silently lost,
nothing kills the job; `streaming/capture.py`).

Spark mechanics: the file is read ONCE as plain text, so every line's
original bytes ride alongside its ``from_json`` parse (PERMISSIVE with
``columnNameOfCorruptRecord``).  The quarantine is therefore VERBATIM
for every failure mode — malformed JSON, type mismatches, AND
syntactically-valid objects missing ``doc_id``/``text`` — including
any extra fields the line carried that the declared schema would have
dropped (ADVICE r12 #2: re-serializing the parsed struct loses those).
One scan, no shuffle; at 100 TB parallelism = line-splittable input
files.

``write_documents_jsonl`` is the inverse (one compact object per line,
Spark's native JSON sink), so round-trips are pytest-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_CORRUPT = "_corrupt_record"
DOCS_JSONL_SCHEMA = ("doc_id long, text string, lang string, "
                     "source string, n_chars long, "
                     f"{_CORRUPT} string")
REQUIRED = ("doc_id", "text")
_FIELDS = ("doc_id", "text", "lang", "source", "n_chars")


def read_documents_jsonl(spark: SparkSession, path: str,
                         cache: bool = True
                         ) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean carries the documents schema rows
    whose required fields parsed; quarantine carries one ``raw`` column
    with every malformed or incomplete line VERBATIM (the original
    line, not a re-serialized projection).

    Caching contract (ADVICE r12 #3): with ``cache=True`` (default)
    the parsed frame is ``cache()``-d so materializing both halves
    costs one parse; the blocks are released by Spark's ContextCleaner
    once neither returned frame is referenced, or eagerly via
    ``spark.catalog.clearCache()``.  Long-lived sessions that prefer
    recompute over pinned storage pass ``cache=False`` (each half then
    re-parses on materialization)."""
    parsed = (spark.read.text(path)
              .select(F.col("value").alias("_line"),
                      F.from_json(
                          "_line", DOCS_JSONL_SCHEMA,
                          {"mode": "PERMISSIVE",
                           "columnNameOfCorruptRecord": _CORRUPT})
                      .alias("_p")))
    if cache:
        parsed = parsed.cache()
    ok = F.col(f"_p.{_CORRUPT}").isNull()
    for c in REQUIRED:
        ok = ok & F.col(f"_p.{c}").isNotNull()
    clean = parsed.filter(ok).select(
        *[F.col(f"_p.{c}").alias(c) for c in _FIELDS])
    quarantine = parsed.filter(~ok).select(F.col("_line").alias("raw"))
    return clean, quarantine


def write_documents_jsonl(docs: DataFrame, path: str,
                          n_files: int = 1) -> None:
    """One compact JSON object per line (Spark's native JSON sink)."""
    docs.repartition(n_files).write.mode("overwrite").json(path)
