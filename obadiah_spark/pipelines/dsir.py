"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

The pretraining-data selection method behind several public LLM data
recipes: estimate a cheap generative model of a small TARGET corpus
(the domain/benchmark you want more of) and of the RAW corpus, weight
every raw document by its target-vs-raw log-likelihood ratio under
hashed n-gram features, and sample documents with probability
proportional to the importance weight.  Spark-first decomposition:

* **features** — word bigrams (the paper's hashed n-gram model) hashed
  into ``n_buckets`` buckets with the repo's shared md5/60-bit
  convention (:func:`~obadiah_spark.pipelines.sampling.sample_key_expr`
  — one definition with the row samplers, so no engine fork);
* **bucket model** — unigram-of-buckets counts per corpus; the weight
  of bucket ``b`` in whole-bit integer surprisal (the bigram_rarity /
  tfidf / quality_classifier convention — ``length(bin(x+1)) - 1 ==
  floor(log2(x+1))`` exactly on BIGINT, no libm to fork engines):

      wt(b) = [bits(c_tgt(b)) - bits(T_tgt)] - [bits(c_raw(b)) - bits(T_raw)]

  i.e. the add-one-smoothed NB log-ratio rounded to whole bits — the
  same arithmetic shape :mod:`.classifier` uses, which IS the DSIR
  log importance weight at whole-bit resolution;
* **document weight** — sum of wt over the document's hashed bigram
  INSTANCES (``log p_tgt(d) - log p_raw(d)`` under the bucket model);
* **resampling** — the paper samples ∝ exp(weight) with Gumbel noise;
  the deterministic engine form is a hash-threshold race in the
  hash_sample idiom: keep document d iff

      sample_u(d) < floor(base_fraction · 2^60) >> ((max_w - w(d)) div T)

  Acceptance probability is exactly ``base_fraction ·
  2^-floor((max_w - w)/T)`` — proportional to the tempered
  exponential of the integer-bits importance weight, deterministic,
  order/partition-independent, reproducible across engines, and
  monotone in the weight.  ``temperature`` T flattens the raw
  ∝ 2^w law (T=1): hashed-bigram log ratios legitimately span tens of
  bits across a corpus, so the untempered race accepts only the
  extreme tail — the same reason the paper's practice smooths the
  importance distribution before resampling.  No RNG state, no global
  sort, no driver-side k-th-element pass (the paper's fixed-k top-k
  needs a global order; the proportional race is the shape that
  survives 100 TB — a pure map after one broadcast of the corpus max
  weight).

Scale shape: two gram-keyed groupBys (raw + target bucket censuses —
map-side combinable, at most ``n_buckets`` output rows each), a
broadcast join of the bucket-weight table (n_buckets rows) onto the
raw gram stream, one doc-keyed aggregation, a one-row broadcast max,
then a pure-map accept test.  The raw corpus text column is tokenized
once (pass ``tok`` from a materialized frame — the corpus_clean scan
discipline).  No reference-repo counterpart (market-data engine);
LLM-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from obadiah_spark.pipelines.classifier import _bits
from obadiah_spark.pipelines.sampling import (_threshold, sample_key,
                                              sample_key_expr)

DSIR_BUCKETS = 4096
_GRAM_SALT = "dsir"  # bucket-hash salt (fixed: the model IS the salt)


def _grams(docs: DataFrame, n_buckets: int,
           tok: DataFrame | None = None) -> DataFrame:
    """(doc_id, bkt) — one row per word-bigram instance, hashed into
    ``n_buckets`` buckets with the shared 60-bit md5 convention."""
    from obadiah_spark.pipelines.docquality import _words

    if tok is None:
        tok = _words(docs.select("doc_id", "text"))
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    bi = (tok.withColumn("w2", F.lead("w", 1).over(w_doc))
          .filter(F.col("w2").isNotNull())
          .select("doc_id", F.concat_ws(" ", "w", "w2").alias("g")))
    return bi.select(
        "doc_id",
        F.pmod(sample_key_expr(F.col("g"), _GRAM_SALT),
               F.lit(n_buckets)).alias("bkt"))


def dsir_weights(docs: DataFrame, target: DataFrame,
                 n_buckets: int = DSIR_BUCKETS,
                 tok: DataFrame | None = None) -> DataFrame:
    """One row per raw document: ``(doc_id, n_grams, weight_bits)``.

    ``weight_bits`` = the hashed-bigram importance weight in whole
    bits (see module docstring); documents with fewer than two words
    carry ``n_grams = 0, weight_bits = 0`` (an empty product — the
    neutral weight, as in the paper's implementation)."""
    raw_g = _grams(docs, n_buckets, tok=tok)
    tgt_g = _grams(target, n_buckets)
    cnt_r = raw_g.groupBy("bkt").agg(F.count(F.lit(1)).alias("c_raw"))
    cnt_t = tgt_g.groupBy("bkt").agg(F.count(F.lit(1)).alias("c_tgt"))
    tot = (cnt_r.agg(F.sum("c_raw").alias("t_raw"))
           .crossJoin(F.broadcast(
               cnt_t.agg(F.sum("c_tgt").alias("t_tgt")))))
    # buckets never seen in RAW cannot score a raw instance; buckets
    # never seen in TARGET smooth to bits(0) = 0 via the coalesce
    wt = (cnt_r.join(cnt_t, "bkt", "left")
          .crossJoin(F.broadcast(tot))
          .select(
              "bkt",
              ((_bits(F.coalesce(F.col("c_tgt"), F.lit(0)))
                - _bits(F.col("t_tgt")))
               - (_bits(F.col("c_raw")) - _bits(F.col("t_raw"))))
              .alias("wt")))
    scored = (raw_g.join(F.broadcast(wt), "bkt")
              .groupBy("doc_id").agg(
                  F.count(F.lit(1)).alias("n_grams"),
                  F.sum("wt").alias("weight_bits")))
    return (docs.select("doc_id").join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                    F.coalesce("weight_bits", F.lit(0))
                    .alias("weight_bits")))


DSIR_TEMPERATURE = 8


def dsir_sample(docs: DataFrame, target: DataFrame,
                base_fraction: float = 0.5,
                temperature: int = DSIR_TEMPERATURE,
                n_buckets: int = DSIR_BUCKETS,
                tok: DataFrame | None = None,
                salt: str = "dsir_accept") -> DataFrame:
    """Deterministic importance resampling: keep raw documents with
    probability ``base_fraction · 2^-floor((max_w - weight_bits)/T)``
    via the shared hash-threshold race (see module docstring for the
    temperature rationale).  Returns the accepted rows: ``(doc_id,
    n_grams, weight_bits, sample_u)`` — ``sample_u`` kept so audits
    (and the oracle) verify membership exactly, the hash_sample
    convention."""
    if temperature < 1:
        raise ValueError("temperature must be a positive integer")
    w = dsir_weights(docs, target, n_buckets=n_buckets, tok=tok)
    shift = w.agg(F.max("weight_bits").alias("max_w"))
    base = _threshold(base_fraction)
    delta = F.expr(f"(max_w - weight_bits) div {int(temperature)}")
    # Java/DuckDB >> masks the shift amount, so an un-clamped
    # tempered delta >= 64 would WRAP instead of flooring to 0; expr()
    # because the Python shiftright() binding takes only literal bits
    thr = (F.when(delta >= 63, F.lit(0))
           .otherwise(F.expr(
               f"shiftright({base}L, cast((max_w - weight_bits) "
               f"div {int(temperature)} as int))")))
    return (w.crossJoin(F.broadcast(shift))
            .withColumn("sample_u", sample_key("doc_id", salt))
            .filter(F.col("sample_u") < thr)
            .select("doc_id", "n_grams", "weight_bits", "sample_u"))


def _grams_sql(src: str, n_buckets: int) -> str:
    """DuckDB replica of :func:`_grams` over ``src`` (a table or
    subquery alias providing doc_id, text)."""
    from obadiah_spark.pipelines.docquality import WS_CLASS
    from obadiah_spark.pipelines.sampling import sample_u_sql

    return f"""
    SELECT doc_id,
           ({sample_u_sql("g", _GRAM_SALT)}) % {n_buckets} AS bkt
    FROM (
        SELECT doc_id,
               w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos)
                 AS g
        FROM (
            SELECT doc_id, u.w, u.pos FROM (
                SELECT doc_id,
                       unnest(string_split_regex(text, '{WS_CLASS}')) AS w,
                       generate_subscripts(
                           string_split_regex(text, '{WS_CLASS}'), 1) - 1
                         AS pos
                FROM {src}
            ) u WHERE length(u.w) > 0
        ) t QUALIFY g IS NOT NULL
    ) b
"""


def dsir_weights_oracle_sql(target_sql: str,
                            n_buckets: int = DSIR_BUCKETS,
                            table: str = "documents") -> str:
    """DuckDB replica of :func:`dsir_weights`; ``target_sql`` is a
    subquery text yielding the target corpus (doc_id, text)."""
    return f"""
WITH raw_g AS MATERIALIZED ({_grams_sql(table, n_buckets)}),
tgt_g AS ({_grams_sql(f"({target_sql}) tgt", n_buckets)}),
cnt_r AS (SELECT bkt, count(*) AS c_raw FROM raw_g GROUP BY bkt),
cnt_t AS (SELECT bkt, count(*) AS c_tgt FROM tgt_g GROUP BY bkt),
tot AS (
    SELECT (SELECT CAST(sum(c_raw) AS BIGINT) FROM cnt_r) AS t_raw,
           (SELECT CAST(sum(c_tgt) AS BIGINT) FROM cnt_t) AS t_tgt
),
wt AS (
    SELECT cnt_r.bkt,
           CAST((length(bin(COALESCE(cnt_t.c_tgt, 0) + 1)) - 1)
                - (length(bin(tot.t_tgt + 1)) - 1)
                - ((length(bin(cnt_r.c_raw + 1)) - 1)
                   - (length(bin(tot.t_raw + 1)) - 1)) AS BIGINT) AS wt
    FROM cnt_r LEFT JOIN cnt_t ON cnt_r.bkt = cnt_t.bkt CROSS JOIN tot
),
scored AS (
    SELECT raw_g.doc_id, count(*) AS n_grams, sum(wt.wt) AS weight_bits
    FROM raw_g JOIN wt ON raw_g.bkt = wt.bkt GROUP BY raw_g.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(s.weight_bits, 0) AS BIGINT) AS weight_bits
FROM {table} d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


def dsir_sample_oracle_sql(target_sql: str, base_fraction: float = 0.5,
                           temperature: int = DSIR_TEMPERATURE,
                           n_buckets: int = DSIR_BUCKETS,
                           table: str = "documents",
                           salt: str = "dsir_accept") -> str:
    """DuckDB replica of :func:`dsir_sample` (``//`` is DuckDB's
    integer floor division — exact twin of Spark's ``div`` on the
    non-negative delta)."""
    from obadiah_spark.pipelines.sampling import sample_u_sql

    base = _threshold(base_fraction)
    t = int(temperature)
    weights = dsir_weights_oracle_sql(target_sql, n_buckets, table)
    return f"""
WITH w AS ({weights}),
mx AS (SELECT max(weight_bits) AS max_w FROM w)
SELECT doc_id, n_grams, weight_bits, sample_u FROM (
    SELECT w.doc_id, w.n_grams, w.weight_bits,
           {sample_u_sql("w.doc_id", salt)} AS sample_u,
           CASE WHEN (mx.max_w - w.weight_bits) // {t} >= 63 THEN 0
                ELSE {base} >> CAST((mx.max_w - w.weight_bits) // {t}
                                    AS BIGINT) END AS thr
    FROM w CROSS JOIN mx
) s WHERE sample_u < thr
"""
