"""Hashed-token quality classifier — naive Bayes in whole-bit surprisal.

The CCNet/LLaMA corpus pipelines distill an expensive or rule-based
quality signal into a cheap token-level linear classifier (fastText
trained on Wikipedia-vs-crawl), then score every document with it.
:func:`quality_classifier` is that pattern as one Spark job: it TRAINS
a multinomial naive-Bayes model from boolean document labels (default:
the corpus's own :func:`~obadiah_spark.pipelines.docquality.gopher_quality`
``keep`` flags — distilling the Gopher rules into token weights) and
SCORES every labeled document with it.

All arithmetic is whole-bit integer surprisal (the bigram_rarity /
tfidf convention: ``length(bin(x)) - 1 == floor(log2 x)`` exactly on
BIGINT), so Spark and DuckDB agree bit-for-bit with no libm:

    bits(x)    = floor(log2(x + 1))                (add-one smoothing)
    wt(w)      = [bits(c_pos(w)) - bits(T_pos)] - [bits(c_neg(w)) - bits(T_neg)]
    margin(d)  = bits(N_pos) - bits(N_neg) + sum over token instances wt(w)
    predicted  = margin > 0

where c_cls(w) counts token instances of ``w`` in class cls, T_cls the
class's total token instances, and N_cls the class's document count
(the prior).  This is the NB log-likelihood ratio rounded to whole
bits — rank-faithful to the float form at the resolution a
keep/drop threshold consumes.

Scale shape: three aggregations — token counts keyed by (w), class
totals (one row, broadcast), and the per-document margin sum keyed by
doc_id after a word-keyed weight join.  The corpus text column is
tokenized ONCE (pass ``tok``/``labels`` from a materialized frame, the
corpus_clean precedent); the weight table is vocabulary-sized and the
join against it is an equi-join on the token — at web scale that is a
few GB of weights against a token stream, the exact shape fastText
scoring has.  Self-scoring on the training set is the gate's fabric;
a real deployment trains on a held-out labeled slice and scores the
corpus with the same plan.

No reference-repo counterpart (market-data engine); LLM-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from obadiah_spark.pipelines.docquality import (WS_CLASS, _words,
                                                gopher_quality,
                                                gopher_quality_oracle_sql)


def _bits(col):
    """floor(log2(x + 1)) on BIGINT — exact on both engines."""
    return (F.length(F.bin(col + F.lit(1))) - F.lit(1)).cast("long")


def quality_classifier(docs: DataFrame,
                       labels: DataFrame | None = None,
                       tok: DataFrame | None = None) -> DataFrame:
    """Train NB token weights from ``labels`` (doc_id, label) and score
    every labeled document.

    Returns one row per labeled doc:
      doc_id, n_tokens, margin_bits, predicted, label.
    """
    if tok is None:
        # composition scan discipline (the corpus_clean precedent,
        # VERDICT r11 #3): the gopher labeler's three aggregates AND the
        # classifier's two consumers (counts, scoring) would otherwise
        # each re-scan + re-tokenize the corpus text column — 5 remote
        # reads of the widest column at 100 TB.  One localCheckpoint of
        # the token frame = one `documents` scan in the physical plan.
        tok = _words(docs.select("doc_id", "text")).localCheckpoint()
    if labels is None:
        labels = gopher_quality(docs, tok=tok).select(
            "doc_id", F.col("keep").alias("label"))
    inst = tok.select("doc_id", "w").join(labels, "doc_id")

    pos = F.when(F.col("label"), 1).otherwise(0)
    cnt = inst.groupBy("w").agg(
        F.sum(pos).alias("c_pos"),
        F.sum(1 - pos).alias("c_neg"))
    tot = cnt.agg(F.sum("c_pos").alias("t_pos"),
                  F.sum("c_neg").alias("t_neg"))
    prior = labels.agg(F.sum(pos).alias("n_pos"),
                       F.sum(1 - pos).alias("n_neg"))

    wt = (cnt.crossJoin(F.broadcast(tot))
          .select("w", ((_bits(F.col("c_pos")) - _bits(F.col("t_pos")))
                        - (_bits(F.col("c_neg")) - _bits(F.col("t_neg"))))
                  .alias("wt")))
    scored = (inst.join(wt, "w")
              .groupBy("doc_id").agg(
                  F.count(F.lit(1)).alias("n_tokens"),
                  F.sum("wt").alias("sum_wt")))
    return (labels.join(scored, "doc_id", "left")
            .crossJoin(F.broadcast(prior))
            .select(
                "doc_id",
                F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                (F.coalesce("sum_wt", F.lit(0))
                 + _bits(F.col("n_pos")) - _bits(F.col("n_neg")))
                .alias("margin_bits"),
                ((F.coalesce("sum_wt", F.lit(0))
                  + _bits(F.col("n_pos")) - _bits(F.col("n_neg"))) > 0)
                .alias("predicted"),
                "label"))


def quality_classifier_oracle_sql(table: str = "documents") -> str:
    """DuckDB replica: the full gopher oracle supplies the labels, then
    the same integer-surprisal train + score."""
    gopher = gopher_quality_oracle_sql()
    return f"""
WITH labels AS (
    SELECT doc_id, keep AS label FROM ({gopher})
), tok AS (
    SELECT doc_id, u.w FROM (
        SELECT doc_id,
               unnest(string_split_regex(text, '{WS_CLASS}')) AS w
        FROM {table}
    ) u WHERE length(u.w) > 0
), inst AS (
    SELECT t.doc_id, t.w, l.label FROM tok t JOIN labels l USING (doc_id)
), cnt AS (
    SELECT w,
           sum(CASE WHEN label THEN 1 ELSE 0 END) AS c_pos,
           sum(CASE WHEN label THEN 0 ELSE 1 END) AS c_neg
    FROM inst GROUP BY w
), tot AS (
    SELECT sum(c_pos) AS t_pos, sum(c_neg) AS t_neg FROM cnt
), prior AS (
    SELECT sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
           sum(CASE WHEN label THEN 0 ELSE 1 END) AS n_neg
    FROM labels
), wt AS (
    SELECT w,
           (length(bin(c_pos + 1)) - 1) - (length(bin(t_pos + 1)) - 1)
         - ((length(bin(c_neg + 1)) - 1) - (length(bin(t_neg + 1)) - 1))
             AS wt
    FROM cnt CROSS JOIN tot
), scored AS (
    SELECT i.doc_id, count(*) AS n_tokens, sum(w.wt) AS sum_wt
    FROM inst i JOIN wt w USING (w) GROUP BY i.doc_id
)
SELECT l.doc_id,
       CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(s.sum_wt, 0)
            + (length(bin(p.n_pos + 1)) - 1)
            - (length(bin(p.n_neg + 1)) - 1) AS BIGINT) AS margin_bits,
       (coalesce(s.sum_wt, 0)
            + (length(bin(p.n_pos + 1)) - 1)
            - (length(bin(p.n_neg + 1)) - 1)) > 0 AS predicted,
       l.label
FROM labels l LEFT JOIN scored s USING (doc_id) CROSS JOIN prior p
"""
