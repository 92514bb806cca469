"""JSONL document connector — the wire format text corpora ship in.

Real LLM corpora arrive as newline-delimited JSON (one document object
per line: Common Crawl derivatives, HF datasets exports, internal
dumps).  :func:`read_documents_jsonl` reads them with the capture
loop's discipline: a STRICT declared schema, and garbage lines
quarantined as raw text instead of silently dropped or job-fatally
raised (the streaming capture's rule — nothing is silently lost,
nothing kills the job; `streaming/capture.py`).

Spark mechanics: ``PERMISSIVE`` mode with ``columnNameOfCorruptRecord``
keeps every malformed line's raw text in a side column; the reader
splits the frame into (clean, quarantine) on it.  The required-field
check runs AFTER the JSON parse (a syntactically valid object missing
``doc_id``/``text`` is quarantined too, carrying its raw line).  One
scan, no shuffle; at 100 TB parallelism = line-splittable input files.

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


def read_documents_jsonl(spark: SparkSession, path: str
                         ) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean carries the documents schema rows
    whose required fields parsed; quarantine carries one ``raw`` column
    with every malformed or incomplete line verbatim."""
    raw = (spark.read.schema(DOCS_JSONL_SCHEMA)
           .option("mode", "PERMISSIVE")
           .option("columnNameOfCorruptRecord", _CORRUPT)
           .json(path)
           # the corrupt column is only materialized when referenced
           # alongside others; cache so the split reads one parse
           .cache())
    ok = F.col(_CORRUPT).isNull()
    for c in REQUIRED:
        ok = ok & F.col(c).isNotNull()
    clean = raw.filter(ok).drop(_CORRUPT)
    # a missing-required line has no corrupt record (it parsed) — carry
    # the re-serialized object so the quarantine is still actionable
    quarantine = (raw.filter(~ok)
                  .select(F.coalesce(
                      F.col(_CORRUPT),
                      F.to_json(F.struct(*[c for c in raw.columns
                                           if c != _CORRUPT])))
                      .alias("raw")))
    return clean, quarantine


def write_documents_jsonl(docs: DataFrame, path: str,
                          n_files: int = 1) -> None:
    """One compact JSON object per line (Spark's native JSON sink)."""
    docs.repartition(n_files).write.mode("overwrite").json(path)
