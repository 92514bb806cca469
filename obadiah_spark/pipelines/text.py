"""Text analysis over ``documents``: token stats, quality scoring, language
heuristic, document fingerprinting.

All expressions are rational arithmetic on integers (single final division),
so Spark and DuckDB produce bit-identical doubles — no libm functions in the
oracle-checked path. Scale: one narrow projection + per-doc aggregation of
exploded tokens; shuffles once on doc_id, map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# intersects the synthetic vocabulary; order matters nowhere
STOPWORDS = ("the", "a", "of", "in", "on", "is", "to", "and")


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token/char statistics + quality score + language heuristic +
    fingerprint. ``subword_count`` approximates a BPE token count as
    sum(ceil(len(word)/4)) — deterministic arithmetic, no tokenizer dep."""
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    stop_set = F.array(*[F.lit(s) for s in STOPWORDS])
    agg = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("token_count"),
        F.count_distinct(F.col("w")).alias("distinct_tokens"),
        F.sum(F.length("w")).alias("char_sum"),
        F.sum(F.when(F.array_contains(stop_set, F.col("w")), 1).otherwise(0)).alias("stop_count"),
        F.sum(-F.floor(-F.length("w") / 4).cast("bigint")).alias("subword_count"),
    )
    base = docs.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        F.md5(_norm_text()).alias("fingerprint"),
    )
    out = base.join(agg, "doc_id")
    avg_len = F.col("char_sum") / F.col("token_count")
    stop_ratio = F.col("stop_count") / F.col("token_count")
    ttr = F.col("distinct_tokens") / F.col("token_count")  # type-token ratio
    quality = (
        F.least(F.col("token_count"), F.lit(100)) / 100 * 0.4
        + stop_ratio * 0.3
        + F.when((avg_len >= 3) & (avg_len <= 8), 0.3).otherwise(0.0)
    )
    lang_pred = (
        F.when(stop_ratio >= 0.05, "en").otherwise("unknown")
    )
    return out.select(
        "doc_id", "token_count", "distinct_tokens", "subword_count",
        "n_chars_measured",
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        ttr.alias("type_token_ratio"),
        quality.alias("quality_score"),
        lang_pred.alias("lang_pred"),
        "fingerprint",
    )


TEXT_STATS_ORACLE = r"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), agg AS (
    SELECT doc_id,
           count(*) AS token_count,
           count(DISTINCT w) AS distinct_tokens,
           sum(length(w)) AS char_sum,
           sum(CASE WHEN w IN ('the','a','of','in','on','is','to','and') THEN 1 ELSE 0 END) AS stop_count,
           CAST(sum(-floor(-length(w) / 4)) AS BIGINT) AS subword_count
    FROM tok GROUP BY doc_id
), base AS (
    SELECT doc_id,
           length(text) AS n_chars_measured,
           md5(lower(trim(regexp_replace(text, '[ \t\n\r\x0B\f]+', ' ', 'g')))) AS fingerprint
    FROM documents
)
SELECT b.doc_id, token_count, distinct_tokens, subword_count, n_chars_measured,
       char_sum / token_count AS avg_token_len,
       stop_count / token_count AS stopword_ratio,
       distinct_tokens / token_count AS type_token_ratio,
       least(token_count, 100) / 100 * 0.4
         + stop_count / token_count * 0.3
         + CASE WHEN char_sum / token_count >= 3 AND char_sum / token_count <= 8
                THEN 0.3 ELSE 0.0 END AS quality_score,
       CASE WHEN stop_count / token_count >= 0.05 THEN 'en' ELSE 'unknown' END AS lang_pred,
       fingerprint
FROM base b JOIN agg a ON a.doc_id = b.doc_id
"""


# ---------------------------------------------------- winnowing ------------
# Local document fingerprinting by winnowing (Schleimer, Wilkerson, Aiken,
# SIGMOD 2003): hash all character k-grams of the normalized text, slide a
# window of WINNOW_WIN consecutive hashes, keep the minimum of each window,
# dedupe. Guarantees: any shared substring of length >= WINNOW_K +
# WINNOW_WIN - 1 yields a shared fingerprint (coverage), and an edit
# perturbs only the fingerprints whose k-gram/window touches it (locality)
# — both pytest-checked. The per-doc selection is a pure map (array
# expressions, no shuffle); the pair form additionally shuffles for the
# per-doc window, the distinct, the fp-frequency cap + join, and the final
# pair aggregate — all key-partitioned, none all-pairs.

WINNOW_K = 8
WINNOW_WIN = 4
WINNOW_PAIRS_CAP = 20      # drop fps shared by more docs (stop-gram analog)
WINNOW_MIN_SHARED = 5      # candidate pair needs this many shared fps


def _norm_text():
    """The ONE whitespace-normalization expression (class must stay in
    parity with the oracle CTEs and text_stats' fingerprint)."""
    return F.lower(F.trim(F.regexp_replace(
        F.col("text"), r"[ \t\n\r\x0B\f]+", " ")))


# the ONE k-gram hash-array expression (over a column named `t`), shared by
# the array and row forms so the selection rule cannot fork
_KGRAM_HASHES_EXPR = (
    f"transform(sequence(1, greatest(length(t) - {WINNOW_K - 1}, 1)),"
    f" i -> md5(substring(t, i, {WINNOW_K})))")


def winnow_fp_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, fps array<string>): the deduped, sorted winnowing
    fingerprint set per document, computed in one map-side projection."""
    return (
        docs.select(F.col("doc_id"), _norm_text().alias("t"))
        .withColumn("hs", F.expr(_KGRAM_HASHES_EXPR))
        .select("doc_id", F.expr(
            f"array_sort(array_distinct(transform(sequence(1, size(hs)),"
            f" j -> array_min(slice(hs, j, {WINNOW_WIN})))))").alias("fps"))
    )


def _winnow_fp_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) fingerprint rows via posexplode + per-doc sliding-min
    window — one shuffle on doc_id, memory O(k-gram row) instead of
    O(|text|) arrays. Same selection as :func:`winnow_fp_sets` (tail
    windows shorten identically); the row form exists for consumers that
    explode anyway (the pair join) and as the unbounded-document
    fallback."""
    from pyspark.sql.window import Window as W

    grams = docs.select(F.col("doc_id"), _norm_text().alias("t")).select(
        "doc_id",
        F.posexplode(F.expr(_KGRAM_HASHES_EXPR)).alias("pos", "h"),
    )
    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WINNOW_WIN - 1)
    return grams.select("doc_id", F.min("h").over(w).alias("fp")).distinct()


# above this raw-text length the per-row hash array (~80x the text bytes:
# O(|text|) 32-char md5 strings) stops fitting a task's row buffer and the
# row form takes over; 1 MB of text ~ 80 MB of array — the practical ceiling
WINNOW_ARRAY_MAX_CHARS = 1_000_000


def winnow_fingerprints(docs: DataFrame,
                        array_max_chars: int = WINNOW_ARRAY_MAX_CHARS,
                        ) -> DataFrame:
    """Per-doc winnowing summary: fingerprint count + order-insensitive md5
    of the fingerprint set (sorted-concat), deterministic on both engines
    (md5 hex sorts identically in ASCII).

    FORM DISPATCH (VERDICT r6 task #6): documents up to
    ``array_max_chars`` take the array form — winnowing is per-doc local,
    so it is ONE map-side projection over array expressions (no explode,
    no shuffle, no window; parallelism = input splits; the sliding min is
    `array_min(slice(hs, j, WIN))` per window start, tail windows
    shortening exactly like ROWS BETWEEN CURRENT AND WIN-1 FOLLOWING).
    Documents past the threshold route through the explode + per-doc
    sliding-window row form, which streams k-gram ROWS through one
    doc_id shuffle instead of holding an O(|text|) hash array in a single
    task's row buffer — the unbounded-document path. Both forms implement
    the identical selection rule from the shared ``_KGRAM_HASHES_EXPR``
    (differential pytest on a mixed corpus, tests/test_pipelines.py), so
    the dispatch threshold is a pure memory/perf knob, never a semantics
    knob. The giant-doc branch is a second scan of (doc_id, text) that
    almost always deletes everything; at 100 TB, pre-partitioning the
    corpus by size removes it entirely."""
    small = docs.filter(F.length("text") <= array_max_chars)
    big = docs.filter(F.length("text") > array_max_chars)
    out_small = winnow_fp_sets(small).select(
        "doc_id",
        F.size("fps").cast("bigint").alias("n_fingerprints"),
        F.md5(F.array_join("fps", "")).alias("fp_hash"),
    )
    out_big = _winnow_fp_rows(big).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fingerprints"),
        F.md5(F.array_join(F.array_sort(F.collect_list("fp")), ""))
        .alias("fp_hash"),
    )
    return out_small.unionByName(out_big)


def winnow_pairs(docs: DataFrame, min_shared: int = WINNOW_MIN_SHARED,
                 max_bucket: int = WINNOW_PAIRS_CAP) -> DataFrame:
    """Near-duplicate candidate pairs: documents sharing >= ``min_shared``
    winnowing fingerprints. Fingerprints shared by more than ``max_bucket``
    documents are dropped first (the stop-gram analog of minhash's
    hot-bucket cap — on a small shared vocabulary almost every doc collides
    on the commonest grams, and at any scale the cap bounds the self-join's
    per-bucket fanout at max_bucket², never all-pairs).

    The fingerprint rows come from the explode+window form, NOT by
    exploding :func:`winnow_fp_sets`'s array column: when that array is
    consumed by a Generate, Catalyst collapses the hs/fps projections and
    inlines the k-gram-hash array into the sliding-min lambda, re-deriving
    the whole array per window position — O(|text|²) md5 evaluations per
    doc (measured: hangs at 50 docs). The pair path explodes to rows
    anyway, so the per-doc window shuffle is the natural shape.

    The fingerprint frame is materialized once (EAGER localCheckpoint):
    it feeds the frequency census AND both self-join sides, and with the
    census broadcast back only the census's exchange is reusable — the
    join sides would otherwise re-derive the posexplode + md5 +
    sliding-min subtree from the raw corpus (optimization guide §3.3:
    materialise a multiply-consumed intermediate to truncate repeated
    subtrees). Fingerprint rows are ~50 B — orders of magnitude narrower
    than the corpus they summarize, the same storage class as the
    dup_spans gram census.

    Eager, not lazy (r16): a lazily-checkpointed frame consumed by TWO
    CONCURRENT jobs is materialized by BOTH — the broadcast-exchange job
    (the census side) and the main collect job launch in parallel under
    AQE, and whichever tasks start before the other job's blocks land
    recompute the whole fingerprint pipeline. Measured at sf0.1: the
    duplicated race doubles the pass's executor CPU (69 s → 128 s) and
    its wall time 3-4× at random (~1 in 3 passes: 3.0-4.8 s vs
    11.5-16.7 s) — the round-15/16 "in-bench inflation" on this gate.
    The eager job pins the materialization before any consumer plans."""
    s = _winnow_fp_rows(docs).localCheckpoint(eager=True)
    keep = (s.groupBy("fp").agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") <= max_bucket).select("fp"))
    # BOTH sides filter through keep: hot fps are by definition the most
    # skewed join keys, and an unfiltered b side would shuffle every hot-fp
    # row into one task just to be discarded by the probe
    a = s.join(keep, "fp").select(F.col("doc_id").alias("doc_a"), "fp")
    b = s.join(keep, "fp").select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# shared CTE prefix: per-doc fingerprint sets `s(doc_id, fp)`; `s` is
# MATERIALIZED for the pairs oracle, which references it three times
_WINNOW_SETS_CTES = rf"""
WITH d AS (
    SELECT doc_id,
           lower(trim(regexp_replace(text, '[ \t\n\r\x0B\f]+', ' ', 'g'))) AS t
    FROM documents
), p AS (
    SELECT doc_id, t,
           unnest(generate_series(1, greatest(length(t) - {WINNOW_K - 1}, 1))) AS pos
    FROM d
), g AS (
    SELECT doc_id, pos, md5(substr(t, CAST(pos AS INTEGER), {WINNOW_K})) AS h
    FROM p
), m AS (
    SELECT doc_id,
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {WINNOW_WIN - 1} FOLLOWING) AS fp
    FROM g
), s AS MATERIALIZED (
    SELECT DISTINCT doc_id, fp FROM m
)"""

WINNOW_ORACLE = _WINNOW_SETS_CTES + """
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints,
       md5(string_agg(fp, '' ORDER BY fp)) AS fp_hash
FROM s GROUP BY doc_id
"""

WINNOW_PAIRS_ORACLE = _WINNOW_SETS_CTES + rf"""
, keep AS (
    SELECT fp FROM s GROUP BY fp HAVING count(*) <= {WINNOW_PAIRS_CAP}
), j AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM s a JOIN keep USING (fp)
    JOIN s b ON a.fp = b.fp AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_shared
FROM j GROUP BY doc_a, doc_b HAVING count(*) >= {WINNOW_MIN_SHARED}
"""


# ------------------------------------------------- keyword extraction ------
# TF-IDF-style top terms WITHOUT libm: instead of tf*log(N/df) — whose
# floating log would have to agree bit-for-bit across engines — terms rank
# lexicographically by (tf DESC, df ASC, term ASC). For a fixed doc this
# induces the same ordering as tf * idf whenever tf dominates (and a
# deterministic, integer-exact one everywhere), so the gate hash covers the
# whole extraction. Stopwords drop out naturally: their df is corpus-wide,
# so any content term with equal tf outranks them; the explicit STOPWORDS
# filter removes the degenerate case of a doc made mostly of them.
TFIDF_TOP_K = 5


def tfidf_top_terms(docs: DataFrame, k: int = TFIDF_TOP_K) -> DataFrame:
    """Top-``k`` characteristic terms per document by (tf DESC, df ASC,
    term ASC) — integer arithmetic end-to-end.

    Scale: one (doc, term) groupBy (map-side combinable), one term-keyed
    groupBy for document frequency, one equi-join on term (fanout = 1 row
    per (doc, term) — bounded), one per-doc window. No all-pairs, no
    Python."""
    tok = docs.select(
        "doc_id", F.explode(F.split(_norm_text(), " ")).alias("term"))
    tok = tok.filter(~F.col("term").isin(*STOPWORDS) & (F.col("term") != ""))
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term"))
    return (
        tf.join(df, "term")
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "rank")
    )


def tfidf_top_terms_oracle(k: int = TFIDF_TOP_K) -> str:
    stop = ", ".join("'%s'" % s for s in STOPWORDS)
    return f"""
WITH tok AS (
    SELECT doc_id,
           unnest(string_split(lower(trim(regexp_replace(text,
               '[ \\t\\n\\r\\x0B\\f]+', ' ', 'g'))), ' ')) AS term
    FROM documents
), tf AS (
    SELECT doc_id, term, count(*) AS tf FROM tok
    WHERE term NOT IN ({stop}) AND term <> ''
    GROUP BY doc_id, term
), df AS (
    SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
)
SELECT doc_id, term, tf, df, rank FROM (
    SELECT t.doc_id, t.term, t.tf, d.df,
           CAST(row_number() OVER (PARTITION BY t.doc_id
               ORDER BY t.tf DESC, d.df ASC, t.term ASC) AS BIGINT) AS rank
    FROM tf t JOIN df d USING (term)
) x WHERE rank <= {k}
"""


# ------------------------------------------------- bigram rarity ---------
# The CCNet/RedPajama-style "perplexity filter" signal with the repo's
# integer-exact discipline: documents are scored against the CORPUS'S
# OWN bigram distribution, but in whole-bit surprisal —
# floor(log2(N)) - floor(log2(count)) per bigram instance — instead of
# a floating -log p. length(bin(c)) - 1 == floor(log2(c)) exactly on
# both engines (no libm call whose last ulp could fork them — the same
# reasoning that made tfidf_top_terms log-free). High mean_bits =
# unusual word transitions = the docs a perplexity filter would flag;
# rank ordering is what the filter consumes, and whole-bit resolution
# preserves it to ±1 bit.
#
# Scale shape: doc-keyed bigram window → ONE corpus-wide gram-keyed
# groupBy (map-side combinable) → gram-keyed join back → doc-keyed
# aggregation. The corpus-total row is a broadcast one-row frame
# (a degenerate one-row join, not a data cross join).

def bigram_rarity(docs: DataFrame) -> DataFrame:
    """One row per document with >= 1 bigram: n_bigrams, rarity_bits
    (sum of whole-bit surprisals), min_count (the rarest transition's
    corpus count), max_bits, mean_bits."""
    from obadiah_spark.pipelines.docquality import _words

    tok = _words(docs.select("doc_id", "text"))
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    bi = (tok.withColumn("w2", F.lead("w", 1).over(w_doc))
          .filter(F.col("w2").isNotNull())
          .select("doc_id", F.concat_ws(" ", "w", "w2").alias("g")))
    cnt = bi.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    total = cnt.agg(F.sum("c").alias("n_total"))
    bits = (F.length(F.bin(F.col("n_total")))
            - F.length(F.bin(F.col("c")))).cast("long")
    scored = (bi.join(cnt, "g").crossJoin(F.broadcast(total))
              .select("doc_id", F.col("c"), bits.alias("bits")))
    return (scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("bits").alias("rarity_bits"),
        F.min("c").alias("min_count"),
        F.max("bits").alias("max_bits"))
        .select("doc_id", "n_bigrams", "rarity_bits", "min_count",
                "max_bits",
                (F.col("rarity_bits") / F.col("n_bigrams"))
                .alias("mean_bits")))


def bigram_rarity_oracle_sql(table: str = "documents") -> str:
    from obadiah_spark.pipelines.docquality import WS_CLASS

    return f"""
WITH tok AS (
    SELECT doc_id, u.w, u.pos FROM (
        SELECT doc_id,
               unnest(string_split_regex(text, '{WS_CLASS}')) AS w,
               generate_subscripts(string_split_regex(text, '{WS_CLASS}'), 1) - 1 AS pos
        FROM {table}
    ) u WHERE length(u.w) > 0
), bi AS (
    SELECT doc_id,
           w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS g
    FROM tok QUALIFY g IS NOT NULL
), cnt AS (
    SELECT g, count(*) AS c FROM bi GROUP BY g
), total AS (
    SELECT CAST(sum(c) AS BIGINT) AS n_total FROM cnt
), scored AS (
    SELECT bi.doc_id, cnt.c,
           CAST(length(bin(total.n_total)) - length(bin(cnt.c)) AS BIGINT)
             AS bits
    FROM bi JOIN cnt USING (g) CROSS JOIN total
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(bits) AS BIGINT) AS rarity_bits,
       CAST(min(c) AS BIGINT) AS min_count,
       CAST(max(bits) AS BIGINT) AS max_bits,
       CAST(sum(bits) AS BIGINT) / CAST(count(*) AS BIGINT) AS mean_bits
FROM scored GROUP BY doc_id
"""


# ------------------------------------- perplexity buckets (CCNet) --------
# CCNet §4.2 (Wenzek et al. 2020, "CCNet: Extracting High Quality
# Monolingual Datasets from Web Crawl Data") splits each language's
# documents into head/middle/tail thirds by language-model perplexity;
# training pipelines then keep the head (or head+middle) per language.
# Re-expressed with the repo's integer-exact discipline: the perplexity
# surrogate is the corpus-self bigram surprisal (bigram_rarity above —
# the CCNet/RedPajama signal in whole bits), per-milli-bigram integer
# scaled, and the language is lang_id_ngram's trigram-displacement
# prediction.
#
# Scale shape — the part that matters at 100 TB: a naive per-language
# NTILE is a window over DOCUMENTS partitioned by language, and a
# dominant language (most of the web is English) serializes onto one
# task. Instead the thirds come from the CDF over the (lang, score)
# CENSUS: one map-side-combinable groupBy to count docs per distinct
# score, a window over the census rows only (≤ langs × distinct scores
# — thousands, not billions; scores are integer milli-bits so the
# domain is bounded), and a broadcast join back. Ties share a score,
# hence a bucket — boundaries are value-based, not rank-based, so the
# result is deterministic cross-engine with no per-doc ordering.

def perplexity_buckets(docs: DataFrame) -> DataFrame:
    """One row per document with ≥ 1 bigram: ``doc_id, lang,
    n_bigrams, rarity_bits, ppl_milli, bucket`` where ``ppl_milli`` =
    (rarity_bits × 1000) div n_bigrams (integer milli-bits per bigram)
    and ``bucket`` ∈ head/middle/tail by the per-language score CDF
    (head = lowest surprisal = most fluent, CCNet's keep side).
    Documents under two words carry no bigram signal and are dropped,
    as in CCNet's length prefilter."""
    from obadiah_spark.pipelines.langid import lang_id_ngram

    lang = lang_id_ngram(docs).select(
        "doc_id", F.col("lang_pred").alias("lang"))
    rar = bigram_rarity(docs).select("doc_id", "n_bigrams", "rarity_bits")
    j = (lang.join(rar, "doc_id")
         .withColumn("ppl_milli", F.expr(
             "(rarity_bits * 1000) div n_bigrams")))
    census = (j.groupBy("lang", "ppl_milli")
              .agg(F.count(F.lit(1)).alias("n")))
    w_lang = Window.partitionBy("lang")
    w_cum = (w_lang.orderBy("ppl_milli")
             .rowsBetween(Window.unboundedPreceding, -1))
    cum = census.select(
        "lang", "ppl_milli",
        F.coalesce(F.sum("n").over(w_cum), F.lit(0)).alias("cum_before"),
        F.sum("n").over(w_lang).alias("n_lang"))
    bucket = (F.when(F.col("cum_before") * 3 < F.col("n_lang"), "head")
              .when(F.col("cum_before") * 3 < 2 * F.col("n_lang"),
                    "middle")
              .otherwise("tail"))
    return (j.join(F.broadcast(cum.withColumn("bucket", bucket)
                               .drop("cum_before", "n_lang")),
                   ["lang", "ppl_milli"])
            .select("doc_id", "lang", "n_bigrams", "rarity_bits",
                    "ppl_milli", "bucket"))


def perplexity_buckets_oracle_sql(table: str = "documents") -> str:
    """DuckDB replica: the lang_id and bigram-surprisal oracles
    composed verbatim, then the same census CDF (integer arithmetic
    end-to-end: `//` div, ×3 threshold compare — no float crosses the
    bucket boundary on either engine)."""
    from obadiah_spark.pipelines.langid import lang_id_ngram_oracle_sql

    return f"""
WITH lang_pred AS (
{lang_id_ngram_oracle_sql(table)}
), rar AS (
{bigram_rarity_oracle_sql(table)}
), j AS (
    SELECT l.doc_id, l.lang_pred AS lang,
           r.n_bigrams, r.rarity_bits,
           (r.rarity_bits * 1000) // r.n_bigrams AS ppl_milli
    FROM lang_pred l JOIN rar r USING (doc_id)
), census AS (
    SELECT lang, ppl_milli, count(*) AS n FROM j GROUP BY lang, ppl_milli
), cum AS (
    SELECT lang, ppl_milli,
           coalesce(sum(n) OVER (PARTITION BY lang ORDER BY ppl_milli
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS cum_before,
           sum(n) OVER (PARTITION BY lang) AS n_lang
    FROM census
)
SELECT j.doc_id, j.lang, j.n_bigrams, j.rarity_bits, j.ppl_milli,
       CASE WHEN cum.cum_before * 3 < cum.n_lang THEN 'head'
            WHEN cum.cum_before * 3 < 2 * cum.n_lang THEN 'middle'
            ELSE 'tail' END AS bucket
FROM j JOIN cum USING (lang, ppl_milli)
"""
