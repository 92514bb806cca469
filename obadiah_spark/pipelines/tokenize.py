"""Regex pre-tokenization over ``documents`` — the "BPE-ish" token counter
the LLM-pipeline brief asks for, as a first-class gate-verified op (the
``subword_count`` in :mod:`.text` is the cruder ceil(len/4) arithmetic
approximation; this one runs a real GPT-2-style pre-tokenizer pattern).

The pattern splits on the same boundaries a byte-pair-encoding
pre-tokenizer would: an optional leading space glued to a letter run, a
digit run, or a symbol run. Text is whitespace-normalized FIRST (the
module-shared normalization), so the pattern only ever needs the literal
space character — no ``\\s`` class, whose dialect semantics could drift
between Java regex (Spark) and RE2 (DuckDB). Alternation is
leftmost-first in both engines.

Scale posture: one narrow projection, all work inside whole-stage codegen
(``regexp_extract_all`` + array expressions, no Python, no shuffle, no
join) — per-doc cost linear in text length, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# GPT-2-ish pre-tokenizer over normalized (single-space) text
BPE_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


def _norm_expr(col):
    return F.lower(F.trim(F.regexp_replace(col, r"[ \t\n\r\x0B\f]+", " ")))


def tokenize_regex(docs: DataFrame) -> DataFrame:
    """Per-doc token counts under the regex pre-tokenizer vs whitespace.

    Columns: ``doc_id, bpe_token_count, bpe_distinct, ws_token_count,
    bpe_char_sum, tokens_per_word`` — the last is the fertility ratio a
    corpus-cost estimate needs (BPE tokens per whitespace word).
    """
    t = _norm_expr(F.col("text"))
    toks = F.regexp_extract_all(t, F.lit(BPE_PATTERN), F.lit(0))
    bpe = F.size(toks).cast("bigint")
    ws = F.size(F.split(t, " ")).cast("bigint")
    return docs.select(
        "doc_id",
        bpe.alias("bpe_token_count"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("bpe_distinct"),
        ws.alias("ws_token_count"),
        F.aggregate(toks, F.lit(0).cast("bigint"),
                    lambda acc, x: acc + F.length(x)).alias("bpe_char_sum"),
        (bpe / ws).alias("tokens_per_word"),
    )


TOKENIZE_REGEX_ORACLE = r"""
WITH t AS (
    SELECT doc_id,
           lower(trim(regexp_replace(text, '[ \t\n\r\x0B\f]+', ' ', 'g'))) AS t
    FROM documents
), toks AS (
    SELECT doc_id, t, regexp_extract_all(t, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+') AS tok
    FROM t
)
SELECT doc_id,
       CAST(len(tok) AS BIGINT) AS bpe_token_count,
       CAST(len(list_distinct(tok)) AS BIGINT) AS bpe_distinct,
       CAST(len(string_split(t, ' ')) AS BIGINT) AS ws_token_count,
       CAST(list_sum(list_transform(tok, x -> length(x))) AS BIGINT) AS bpe_char_sum,
       CAST(len(tok) AS BIGINT) / CAST(len(string_split(t, ' ')) AS BIGINT) AS tokens_per_word
FROM toks
"""
