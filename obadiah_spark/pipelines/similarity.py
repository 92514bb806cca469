"""Similarity search over ``embeddings(vec_id, embedding float[], label)``.

- ``ann_bruteforce`` — exact cosine top-k: broadcast the (small) query set
  against a full scan. The correctness baseline; one pass, no shuffle of the
  big side. Dot products fold left-to-right in double on both engines and
  cosines are rounded to 9 dp so the cross-engine hash is stable.
- ``lsh_signatures`` / ``ann_lsh_pairs`` — random-hyperplane (sign) LSH: T
  tables × P hyperplanes with ±1 weights derived deterministically from md5,
  signatures computed batch-vectorized in numpy via mapInPandas (the 100 TB
  path: signature computation is embarrassingly parallel, candidate
  generation is a bucket equi-join, never all-pairs). Verified by a recall
  test against brute force (tests/test_pipelines.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def _cosine(a: str, b: str):
    dot = F.expr(_DOT.format(a=a, b=b))
    na = F.sqrt(F.expr(_DOT.format(a=a, b=a)))
    nb = F.sqrt(F.expr(_DOT.format(a=b, b=b)))
    return F.round(dot / (na * nb), 9)


def ann_bruteforce(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors of the first ``n_queries`` vectors."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", _cosine("embedding", "q_emb").alias("cosine"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "cosine", "rank")
    )


def ann_bruteforce_oracle(n_queries: int = 10, k: int = 5) -> str:
    return f"""
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), q AS (
    SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < {n_queries}
), d AS (
    SELECT q_id, vec_id,
           round(list_dot_product(emb, q_emb)
                 / (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(q_emb, q_emb))),
                 9) AS cosine
    FROM e CROSS JOIN q WHERE vec_id <> q_id
)
SELECT q_id, vec_id, cosine, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
    FROM d
) t WHERE rank <= {k}
"""


# -------------------------------------------------------------- LSH ANN ----

LSH_TABLES = 4
LSH_PLANES = 12


def _plane_weights(dim: int, tables: int = LSH_TABLES,
                   planes: int = LSH_PLANES) -> np.ndarray:
    """(tables, planes, dim) ±1 weights — deterministic from md5, no RNG."""
    w = np.empty((tables, planes, dim), dtype=np.float64)
    for t in range(tables):
        for p in range(planes):
            h = hashlib.md5(f"{t}#{p}".encode()).digest()
            # expand 16 bytes deterministically to dim bits
            bits = np.frombuffer(
                b"".join(hashlib.md5(h + bytes([i])).digest() for i in range(dim // 128 + 1)),
                dtype=np.uint8,
            )
            bits = np.unpackbits(bits)[:dim]
            w[t, p] = bits.astype(np.float64) * 2 - 1
    return w


def lsh_signatures(emb: DataFrame, tables: int = LSH_TABLES,
                   planes: int = LSH_PLANES) -> DataFrame:
    """(vec_id, table, sig): sign-pattern bucket id per hash table.
    mapInPandas → one numpy matmul per Arrow batch; no shuffle."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights: np.ndarray | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            e = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            if weights is None:
                weights = _plane_weights(e.shape[1], tables, planes)
            out = []
            for t in range(tables):
                proj = e @ weights[t].T  # (n, planes)
                bits = (proj > 0).astype(np.uint8)
                sigs = ["".join(map(str, row)) for row in bits]
                out.append(pd.DataFrame({
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "table": t,
                    "sig": sigs,
                }))
            yield pd.concat(out, ignore_index=True)

    return emb.select("vec_id", "embedding").mapInPandas(
        compute, "vec_id bigint, table int, sig string"
    )


def ann_lsh_pairs_oracle_sql(dim: int, min_cosine: float = 0.0,
                             tables: int = LSH_TABLES,
                             planes: int = LSH_PLANES) -> str:
    """Value-level DuckDB oracle for :func:`ann_lsh_pairs` (VERDICT r8
    task #3): the md5-seeded ±1 plane weights are DATA, not randomness, so
    they emit as a VALUES CTE (one bitstring per (table, plane), expanded
    to ±1.0 by list_transform) and DuckDB recomputes signatures, bucket
    pairs, and exact cosines from scratch. Sign agreement is exact on this
    fabric: list_dot_product reproduces the numpy projections bitwise and
    the smallest |projection| margin is ~3e-6 (tests pin the margin), so
    the > 0 threshold cannot flip between engines."""
    w = _plane_weights(dim, tables, planes)
    rows = ",\n        ".join(
        "({}, {}, '{}')".format(
            t, p, "".join("1" if x > 0 else "0" for x in w[t, p]))
        for t in range(tables) for p in range(planes))
    return f"""
WITH planes AS (
    SELECT tbl, plane,
           list_transform(generate_series(1, {dim}),
                          i -> CASE WHEN bits[i] = '1'
                               THEN CAST(1.0 AS DOUBLE)
                               ELSE CAST(-1.0 AS DOUBLE) END) AS w
    FROM (VALUES
        {rows}) AS v(tbl, plane, bits)
), e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), sig AS (
    SELECT vec_id, tbl,
           string_agg(CASE WHEN list_dot_product(emb, w) > 0
                      THEN '1' ELSE '0' END, '' ORDER BY plane) AS sig
    FROM e CROSS JOIN planes
    GROUP BY vec_id, tbl
), cand AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.sig = b.sig
                         AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       round(list_dot_product(ea.emb, eb.emb)
             / (sqrt(list_dot_product(ea.emb, ea.emb))
                * sqrt(list_dot_product(eb.emb, eb.emb))), 9) AS cosine
FROM cand c
JOIN e ea ON ea.vec_id = c.vec_a
JOIN e eb ON eb.vec_id = c.vec_b
WHERE round(list_dot_product(ea.emb, eb.emb)
            / (sqrt(list_dot_product(ea.emb, ea.emb))
               * sqrt(list_dot_product(eb.emb, eb.emb))), 9) >= {min_cosine!r}
"""


def exact_strong_pairs(emb: DataFrame, min_cosine: float,
                       max_id: int) -> DataFrame:
    """The exact ground-truth pair set: every (vec_a < vec_b) whose
    round-9 cosine is >= min_cosine, bounded to ``vec_id < max_id``.

    ONE definition of the exact rule, shared by :func:`ann_lsh_recall` and
    the embedding-dedup family (dedup.embedding_dedup derives its dup_of
    as min(vec_a) per vec_b over this set) — so the cosine convention
    (norm precompute, rounding precision) cannot fork between them. Norms
    are precomputed once per vector (same float ops as _cosine, just not
    per pair); dot/norm products commute exactly in IEEE, so the pair set
    is orientation-independent."""
    emb = emb.filter(F.col("vec_id") < max_id)
    normed = emb.withColumn(
        "_n", F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding"))))
    ea = normed.select(F.col("vec_id").alias("vec_a"),
                       F.col("embedding").alias("emb_a"),
                       F.col("_n").alias("_na"))
    eb = normed.select(F.col("vec_id").alias("vec_b"),
                       F.col("embedding").alias("emb_b"),
                       F.col("_n").alias("_nb"))
    dot = F.expr(_DOT.format(a="emb_a", b="emb_b"))
    return (
        ea.crossJoin(eb)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(F.round(dot / (F.col("_na") * F.col("_nb")), 9) >= min_cosine)
        .select("vec_a", "vec_b")
    )


def ann_lsh_pairs(emb: DataFrame, min_cosine: float = 0.0,
                  tables: int = LSH_TABLES,
                  planes: int = LSH_PLANES) -> DataFrame:
    """Candidate neighbor pairs from LSH buckets, scored with exact cosine.
    Candidate generation is a per-(table, sig) equi-join — at 100 TB the
    bucket sizes bound the work, not n²."""
    sigs = lsh_signatures(emb, tables, planes)
    a = sigs.select(F.col("vec_id").alias("vec_a"), "table", "sig")
    b = sigs.select(F.col("vec_id").alias("vec_b"), "table", "sig")
    cand = (
        a.join(b, ["table", "sig"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    return (
        cand.join(ea, "vec_a").join(eb, "vec_b")
        .select("vec_a", "vec_b", _cosine("emb_a", "emb_b").alias("cosine"))
        .filter(F.col("cosine") >= min_cosine)
    )


# -------------------------------------------------------------- IVF ANN ----

IVF_CELLS = 16
IVF_STRIDE = 61
IVF_PROBE = 4
IVF_ITERS = 3
IVF_TRAIN_STRIDE = 3
# Hard cap on the k-means training sample: the strided sample is
# proportional to corpus size (n / train_stride), so without a cap the
# three Lloyd shuffles would push O(n) x dim elements per training run —
# ~33 TB at the 100 TB design point (VERDICT r7 #2). 512 vectors saturate
# a 16-cell codebook (32 per cell) and make training O(1) in corpus size;
# the deterministic ORDER BY vec_id LIMIT keeps the sample, and hence the
# codebook, reproducible in the DuckDB oracle.
IVF_TRAIN_MAX = 512

_CAST_DOUBLE_ARR = "transform({col}, x -> CAST(x AS DOUBLE))"


def ivf_seed_centroids(emb: DataFrame, n_cells: int = IVF_CELLS,
                       stride: int = IVF_STRIDE) -> DataFrame:
    """Iteration-0 codebook (the k-means seed): every ``stride``-th vec_id,
    the first ``n_cells`` of them, each seed's vec_id doubling as its
    stable cell id across training iterations."""
    return (
        emb.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id").limit(n_cells)
        .select(F.col("vec_id").alias("cell"),
                F.expr(_CAST_DOUBLE_ARR.format(col="embedding"))
                .alias("c_emb"))
    )


def _fold_mean_centroids(ex: DataFrame) -> DataFrame:
    """Element-wise centroid means from exploded (cell, vec_id, pos, v)
    rows, summed as a LEFT FOLD in vec_id order — not ``avg()``.

    A plain ``avg`` sums in partition order, so the trained centroids
    would differ in the last ulp run-to-run and engine-to-engine, and a
    round-9 cosine on the argmax boundary could flip a cell assignment.
    The sorted fold is bitwise reproducible on any partitioning and is
    exactly DuckDB's ``list_reduce(list(v ORDER BY vec_id), ...)``, so
    the gate hash covers the training pass itself (a left fold seeded
    with 0.0 equals the seedless fold: 0.0 + v1 == v1 in IEEE)."""
    per_dim = (
        ex.groupBy("cell", "pos")
        .agg(
            (F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("vec_id", "v"))),
                    lambda s: s["v"]),
                F.lit(0.0), lambda acc, v: acc + v)
             / F.count(F.lit(1))).alias("m"))
    )
    return (
        per_dim.groupBy("cell")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"]).alias("c_emb"))
    )


def ivf_centroids(emb: DataFrame, n_cells: int = IVF_CELLS,
                  stride: int = IVF_STRIDE, iters: int = IVF_ITERS,
                  train_stride: int = IVF_TRAIN_STRIDE,
                  train_max: int = IVF_TRAIN_MAX) -> DataFrame:
    """Trained coarse-quantizer codebook: ``iters`` fixed Lloyd's k-means
    iterations (assign to argmax-cosine centroid, recompute element-wise
    means; an emptied cell keeps its previous centroid) over a BOUNDED
    training sample — every ``train_stride``-th vec_id, capped at the
    first ``train_max`` of them — seeded by :func:`ivf_seed_centroids`.

    Every step is deterministic — strided-then-limited sample (a global
    TakeOrdered top-``train_max``: one scan, no full sort), round-9 cosine
    with cell-asc argmax tiebreak, fold-ordered means — so the identical
    codebook is reproducible in DuckDB SQL (:func:`_ivf_codebook_ctes`)
    and the ``ann_ivf`` gate hash covers training, not just search. At
    100 TB training is O(1) in corpus size: per iteration one broadcast
    join against n_cells centroids and one element-wise shuffle of the
    <= train_max-row sample only; ``iters=0`` degrades to the seed
    codebook. Train once and reuse via :func:`train_ivf_codebook` /
    ``ann_ivf(codebook=...)`` — the same materialize-once pattern as the
    order-book checkpoints (operators/order_book.py:255)."""
    cents = ivf_seed_centroids(emb, n_cells, stride)
    sample = (
        emb.filter(F.col("vec_id") % train_stride == 0)
        .orderBy("vec_id").limit(train_max)
        .select("vec_id",
                F.expr(_CAST_DOUBLE_ARR.format(col="embedding")).alias("s_emb"))
    )
    if iters > 0:
        # the loop references `cents` twice per iteration (assignment +
        # empty-cell fallback); checkpoint the tiny frame so the plan does
        # not double per iteration. EAGER (r16): `cents` is consumed by a
        # broadcast-exchange job AND the main job — a lazy checkpoint is
        # materialized by both when they launch concurrently under AQE,
        # re-running the subtree twice (the winnow_pairs race, measured
        # 2x executor CPU); the frames are tiny, so the eager job is
        # milliseconds
        sample = sample.localCheckpoint(eager=True)
    for _ in range(iters):
        cents = cents.localCheckpoint(eager=True)
        assigned = (
            _rank_cells(sample, cents, "vec_id", "s_emb")
            .filter(F.col("cr") == 1).select("vec_id", "cell")
        )
        ex = (
            assigned.join(sample, "vec_id")
            .select("cell", "vec_id",
                    F.posexplode("s_emb").alias("pos", "v"))
        )
        trained = _fold_mean_centroids(ex)
        cents = (
            cents.withColumnRenamed("c_emb", "_prev")
            .join(trained, "cell", "left")
            .select("cell", F.coalesce("c_emb", "_prev").alias("c_emb"))
        )
    return cents


def _rank_cells(df: DataFrame, cents: DataFrame, id_col: str,
                emb_col: str) -> DataFrame:
    """Rank the (broadcast, n_cells-row) codebook per input row by cosine —
    the IVF coarse-quantization step: O(n x n_cells), never all-pairs."""
    scored = df.crossJoin(F.broadcast(cents)).select(
        id_col, "cell", _cosine(emb_col, "c_emb").alias("c_cos"))
    w = W.partitionBy(id_col).orderBy(F.desc("c_cos"), "cell")
    return scored.withColumn("cr", F.row_number().over(w))


def train_ivf_codebook(emb: DataFrame, path: str | None = None,
                       n_cells: int = IVF_CELLS, stride: int = IVF_STRIDE,
                       iters: int = IVF_ITERS,
                       train_stride: int = IVF_TRAIN_STRIDE,
                       train_max: int = IVF_TRAIN_MAX) -> DataFrame:
    """Train the IVF codebook ONCE and materialize it for reuse across
    ``ann_ivf`` calls — the reference's pattern for every expensive derived
    state (book checkpoints / ``snapshot_from_silver``,
    reference db/obanalytics_schema.sql order-book checkpoint tables).

    With ``path`` the n_cells-row frame is written to parquet and read
    back (survives the session; ship the path to other jobs); without, it
    is eagerly localCheckpoint-ed so the in-session plan is a tiny scan
    instead of three Lloyd iterations re-derived per query."""
    cents = ivf_centroids(emb, n_cells, stride, iters, train_stride,
                          train_max)
    if path is not None:
        cents.write.mode("overwrite").parquet(path)
        return emb.sparkSession.read.parquet(path)
    return cents.localCheckpoint(eager=True)


def ann_ivf(emb: DataFrame, n_queries: int = 10, k: int = 5,
            n_cells: int = IVF_CELLS, n_probe: int = IVF_PROBE,
            stride: int = IVF_STRIDE, iters: int = IVF_ITERS,
            train_stride: int = IVF_TRAIN_STRIDE,
            train_max: int = IVF_TRAIN_MAX,
            codebook: DataFrame | None = None) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid's cell,
    probe each query's ``n_probe`` nearest cells, re-score the candidates
    with exact cosine, keep top ``k``. Candidate generation is an equi-join
    on ``cell`` — at scale the inverted lists bound the work, and the big
    side is shuffled once on a key with ~n/n_cells fanout. Every step is
    deterministic (trained codebook included — see :func:`ivf_centroids`;
    round-9 cosine, cell-asc tiebreak), so the whole operator
    is SQL-oracle-checkable; with ``n_probe >= n_cells`` it degenerates to
    exactly :func:`ann_bruteforce` (pytest invariant).

    Pass ``codebook`` (an (cell, c_emb) frame from
    :func:`train_ivf_codebook`) to skip in-query training entirely —
    the production path: train offline on the bounded sample, broadcast
    the materialized n_cells-row frame into every search."""
    cents = codebook if codebook is not None else ivf_centroids(
        emb, n_cells, stride, iters, train_stride, train_max)
    assign = (
        _rank_cells(emb.select("vec_id", "embedding"), cents,
                    "vec_id", "embedding")
        .filter(F.col("cr") == 1).select("vec_id", "cell")
    )
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    probes = (
        _rank_cells(q, cents, "q_id", "q_emb")
        .filter(F.col("cr") <= n_probe).select("q_id", "cell")
    )
    cand = (
        probes.join(assign, "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
    )
    ev = emb.select("vec_id", F.col("embedding").alias("emb_v"))
    scored = (
        cand.join(ev, "vec_id").join(F.broadcast(q), "q_id")
        .select("q_id", "vec_id", _cosine("emb_v", "q_emb").alias("cosine"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "cosine", "rank")
    )


def _ivf_codebook_ctes(n_cells: int, stride: int, iters: int,
                       train_stride: int,
                       train_max: int = IVF_TRAIN_MAX) -> str:
    """CTE chain reproducing :func:`ivf_centroids` bit-for-bit in DuckDB:
    ``c0`` is the strided seed, each iteration assigns the bounded training
    sample (strided, ORDER BY vec_id LIMIT ``train_max`` — same cap as the
    Spark side) to its argmax-cosine centroid (round 9, cell-asc
    tiebreak), recomputes element-wise means with ``list_reduce`` over a
    vec_id-ORDERED list (the same left fold as the Spark side), and keeps
    the previous centroid for an emptied cell. The final codebook CTE is
    named ``c``."""
    ctes = [f"""c0 AS (
    SELECT vec_id AS cell, emb AS c_emb FROM e
    WHERE vec_id % {stride} = 0 ORDER BY vec_id LIMIT {n_cells}
)""", f"""s AS MATERIALIZED (
    SELECT vec_id, emb AS s_emb FROM e WHERE vec_id % {train_stride} = 0
    ORDER BY vec_id LIMIT {train_max}
)"""]
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        ctes.append(f"""ta{i} AS (
    SELECT vec_id, cell FROM (
        SELECT s.vec_id, c.cell,
               row_number() OVER (PARTITION BY s.vec_id ORDER BY
                   round(list_dot_product(s.s_emb, c.c_emb)
                         / (sqrt(list_dot_product(s.s_emb, s.s_emb))
                            * sqrt(list_dot_product(c.c_emb, c.c_emb))), 9)
                   DESC, c.cell) AS cr
        FROM s CROSS JOIN {prev} c
    ) t WHERE cr = 1
)""")
        ctes.append(f"""tx{i} AS (
    SELECT a.cell, s.vec_id,
           unnest(s.s_emb) AS v, generate_subscripts(s.s_emb, 1) AS pos
    FROM ta{i} a JOIN s USING (vec_id)
)""")
        ctes.append(f"""tm{i} AS (
    SELECT cell, pos,
           list_reduce(list(v ORDER BY vec_id), (x, y) -> x + y)
           / count(*) AS m
    FROM tx{i} GROUP BY cell, pos
)""")
        ctes.append(f"""tc{i} AS (
    SELECT cell, list(m ORDER BY pos) AS c_emb FROM tm{i} GROUP BY cell
)""")
        ctes.append(f"""c{i} AS (
    SELECT p.cell, coalesce(t.c_emb, p.c_emb) AS c_emb
    FROM {prev} p LEFT JOIN tc{i} t USING (cell)
)""")
    ctes.append(f"c AS (SELECT cell, c_emb FROM c{iters})")
    return ", ".join(ctes)


def ann_ivf_oracle(n_queries: int = 10, k: int = 5,
                   n_cells: int = IVF_CELLS, n_probe: int = IVF_PROBE,
                   stride: int = IVF_STRIDE, iters: int = IVF_ITERS,
                   train_stride: int = IVF_TRAIN_STRIDE,
                   train_max: int = IVF_TRAIN_MAX) -> str:
    """Same codebook-training / assignment / probe / re-score pipeline in
    DuckDB SQL; cosines round to 9 dp at every ranking site so argmax ties
    agree. ``e`` is referenced five times — MATERIALIZED so the parquet
    scan+cast runs once, not per reference."""
    return f"""
WITH e AS MATERIALIZED (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), {_ivf_codebook_ctes(n_cells, stride, iters, train_stride, train_max)}, ar AS (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_dot_product(e.emb, c.c_emb)
                     / (sqrt(list_dot_product(e.emb, e.emb))
                        * sqrt(list_dot_product(c.c_emb, c.c_emb))), 9) DESC,
               c.cell) AS cr
    FROM e CROSS JOIN c
), assign AS (
    SELECT vec_id, cell FROM ar WHERE cr = 1
), q AS (
    SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < {n_queries}
), pr AS (
    SELECT q.q_id, c.cell,
           row_number() OVER (PARTITION BY q.q_id ORDER BY
               round(list_dot_product(q.q_emb, c.c_emb)
                     / (sqrt(list_dot_product(q.q_emb, q.q_emb))
                        * sqrt(list_dot_product(c.c_emb, c.c_emb))), 9) DESC,
               c.cell) AS cr
    FROM q CROSS JOIN c
), probes AS (
    SELECT q_id, cell FROM pr WHERE cr <= {n_probe}
), cand AS (
    SELECT p.q_id, a.vec_id
    FROM probes p JOIN assign a ON a.cell = p.cell
    WHERE a.vec_id <> p.q_id
), d AS (
    SELECT cand.q_id, cand.vec_id,
           round(list_dot_product(ev.emb, eq.q_emb)
                 / (sqrt(list_dot_product(ev.emb, ev.emb))
                    * sqrt(list_dot_product(eq.q_emb, eq.q_emb))), 9) AS cosine
    FROM cand
    JOIN e ev ON ev.vec_id = cand.vec_id
    JOIN q eq ON eq.q_id = cand.q_id
)
SELECT q_id, vec_id, cosine, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY cosine DESC, vec_id) AS rank
    FROM d
) t WHERE rank <= {k}
"""


# ------------------------------------------------------------- IVF-PQ ----
# Product quantization (Jegou, Douze, Schmid, TPAMI 2011) on top of the
# IVF coarse quantizer: the memory-bound 100 TB path. Vectors are encoded
# ONCE as PQ_M sub-codes (one byte each — a 64-dim float vector compresses
# 64x), queries scan candidates with an asymmetric-distance (ADC) lookup
# table of PQ_M x PQ_KSUB precomputed sub-distances, and only the top
# ``rerank*k`` ADC candidates pay an exact re-score. Every step is
# deterministic — seed sub-codebooks from the same stride-sampled vectors
# as the IVF seeds (the offline k-means slot, same argument as
# IVF_TRAIN_MAX: training must be O(1) in corpus size), L2^2 from three
# dot products rounded to 9 dp, m-ordered left-fold ADC sums — so the
# whole operator hash-checks against DuckDB.
PQ_DIM = 64       # embeddings column width (driver testdata contract)
PQ_M = 4          # subspaces of PQ_DIM / PQ_M dims each
PQ_KSUB = 16      # sub-centroids per subspace (4-bit codes)
# Exact re-score depth = rerank * k ADC survivors. 16 is tuned to the
# testdata's worst case: these embeddings are UNIFORM random (no planted
# cluster structure), which is adversarial for PQ — the ADC error is
# comparable to the whole cosine spread, so a deep-ish re-rank recovers
# most of the IVF probe ceiling (measured: recall 0.43/0.60 ceiling at
# rerank=16, 0.53 at 32; 3-iter Lloyd sub-training lifts ADC by only
# ~0.03 here, which is why the sub-codebooks stay stride-seeded). On a
# real corpus with manifold structure the ADC ordering is far tighter
# and rerank can drop.
PQ_RERANK = 16
# Adaptive depth floor (VERDICT r11 #4): a FIXED rerank*k survivor depth
# is a shrinking fraction of the probed candidates as the corpus grows —
# SCALE.md §7 measured the 10x clustered fabric dropping 0.93 → 0.55
# recall at the same probe count purely from the depth cap. The re-rank
# depth is therefore max(rerank * k, ceil(PQ_RERANK_FRAC * per-query
# candidate count)): constant ADC selectivity under corpus growth, so
# exact-rescore work stays a fixed fraction of the probed lists (which
# the probe count already bounds) instead of a fixed absolute number.
PQ_RERANK_FRAC = 0.25


def _l2sq(a: str, b: str):
    """||a - b||^2 via three dot products (the one array-fold primitive
    both engines already agree on bit-for-bit), rounded to 9 dp so argmin
    ties break identically cross-engine."""
    daa = F.expr(_DOT.format(a=a, b=a))
    dbb = F.expr(_DOT.format(a=b, b=b))
    dab = F.expr(_DOT.format(a=a, b=b))
    return F.round(daa + dbb - 2 * dab, 9)


def _subvectors(df: DataFrame, id_col: str, emb_col: str,
                m: int = PQ_M, dim: int = PQ_DIM) -> DataFrame:
    """(id, m, sv): the m-th contiguous subvector of each embedding."""
    sub = dim // m
    pieces = F.array(*[
        F.struct(F.lit(mm).alias("m"),
                 F.slice(F.col(emb_col), mm * sub + 1, sub).alias("sv"))
        for mm in range(m)])
    return df.select(id_col, F.explode(pieces).alias("p")).select(
        id_col, F.col("p.m").alias("m"), F.col("p.sv").alias("sv"))


def pq_subcodebooks(emb: DataFrame, stride: int = IVF_STRIDE,
                    m: int = PQ_M, ksub: int = PQ_KSUB,
                    dim: int = PQ_DIM) -> DataFrame:
    """(m, j, sc): sub-codebooks seeded from the first ``ksub``
    stride-sampled vectors (j = rank of the seed's vec_id) — the
    deterministic stand-in for an offline per-subspace k-means, O(1) in
    corpus size by the same argument as the IVF codebook cap."""
    w = W.orderBy("vec_id")
    seeds = (
        emb.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id").limit(ksub)
        .select(F.expr(_CAST_DOUBLE_ARR.format(col="embedding")).alias("emb"),
                (F.row_number().over(w) - 1).alias("j"), "vec_id")
    )
    return _subvectors(seeds, "j", "emb", m, dim).select(
        "m", "j", F.col("sv").alias("sc"))


def pq_train_subcodebooks(emb: DataFrame, iters: int = IVF_ITERS,
                          stride: int = IVF_STRIDE, m: int = PQ_M,
                          ksub: int = PQ_KSUB, dim: int = PQ_DIM,
                          train_stride: int = IVF_TRAIN_STRIDE,
                          train_max: int = IVF_TRAIN_MAX) -> DataFrame:
    """Per-subspace Lloyd refinement of the stride-seeded sub-codebooks
    (same (m, j, sc) schema as :func:`pq_subcodebooks`), trained over the
    same capped deterministic sample as the IVF codebook — O(1) in corpus
    size by the identical argument. Assignment = L2 argmin with j-asc
    tiebreak (exactly :func:`pq_encode`); means are fold-ordered
    (:func:`_fold_mean_centroids` rationale); an emptied sub-cell keeps
    its previous centroid.

    On UNIFORM random embeddings training gains ~0.03 recall (why the
    ``ann_ivfpq`` GATE stays stride-seeded: the DuckDB oracle mirrors the
    seed deterministically); on a clustered corpus — the realistic shape —
    the trained books are the scale path; SCALE.md §7 records the
    measured delta on a mixture-of-Gaussians fabric."""
    cb = pq_subcodebooks(emb, stride, m, ksub, dim)
    sample = (
        emb.filter(F.col("vec_id") % train_stride == 0)
        .orderBy("vec_id").limit(train_max)
        .select("vec_id",
                F.expr(_CAST_DOUBLE_ARR.format(col="embedding")).alias("emb"))
    )
    sv = _subvectors(sample, "vec_id", "emb", m, dim)
    if iters > 0:
        # referenced twice per iteration (assignment + mean recompute);
        # eager for the same concurrent-consumer race reason as
        # ivf_centroids (the broadcast build of `cb` is its own job)
        sv = sv.localCheckpoint(eager=True)
    for _ in range(iters):
        cb = cb.localCheckpoint(eager=True)
        scored = sv.join(F.broadcast(cb), "m").select(
            "vec_id", "m", "j", _l2sq("sv", "sc").alias("d"))
        w = W.partitionBy("vec_id", "m").orderBy(F.asc("d"), F.asc("j"))
        assign = (scored.withColumn("r", F.row_number().over(w))
                  .filter("r = 1").select("vec_id", "m", "j"))
        ex = (assign.join(sv, ["vec_id", "m"])
              .select("m", "j", "vec_id",
                      F.posexplode("sv").alias("pos", "v")))
        per_dim = (
            ex.groupBy("m", "j", "pos")
            .agg((F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("vec_id", "v"))),
                    lambda s: s["v"]),
                F.lit(0.0), lambda acc, v: acc + v)
                / F.count(F.lit(1))).alias("mu"))
        )
        trained = (
            per_dim.groupBy("m", "j")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mu"))),
                lambda s: s["mu"]).alias("sc"))
        )
        cb = (cb.withColumnRenamed("sc", "_prev")
              .join(trained, ["m", "j"], "left")
              .select("m", "j", F.coalesce("sc", "_prev").alias("sc")))
    return cb


def pq_encode(emb: DataFrame, subcb: DataFrame, m: int = PQ_M,
              dim: int = PQ_DIM) -> DataFrame:
    """(vec_id, m, code): nearest sub-centroid per subspace (L2, j-asc
    tiebreak). One broadcast join against the m x ksub codebook + one
    per-(vec, subspace) argmin — the encode pass is a single shuffle-free
    scan at scale, run ONCE per corpus."""
    sv = _subvectors(
        emb.select("vec_id",
                   F.expr(_CAST_DOUBLE_ARR.format(col="embedding"))
                   .alias("emb")),
        "vec_id", "emb", m, dim)
    scored = sv.join(F.broadcast(subcb), "m").select(
        "vec_id", "m", "j", _l2sq("sv", "sc").alias("d"))
    w = W.partitionBy("vec_id", "m").orderBy(F.asc("d"), F.asc("j"))
    return (scored.withColumn("r", F.row_number().over(w))
            .filter("r = 1").select("vec_id", "m", F.col("j").alias("code")))


def ann_ivfpq(emb: DataFrame, n_queries: int = 10, k: int = 5,
              n_cells: int = IVF_CELLS, n_probe: int = IVF_PROBE,
              stride: int = IVF_STRIDE, iters: int = IVF_ITERS,
              train_stride: int = IVF_TRAIN_STRIDE,
              train_max: int = IVF_TRAIN_MAX, m: int = PQ_M,
              ksub: int = PQ_KSUB, rerank: int = PQ_RERANK,
              dim: int = PQ_DIM,
              codebook: DataFrame | None = None,
              subcodebook: DataFrame | None = None,
              rerank_frac: float = PQ_RERANK_FRAC) -> DataFrame:
    """IVF-PQ ANN: coarse-probe the IVF cells, rank the candidates by the
    ADC lookup-table distance over their PQ codes, exact-re-score only
    the ADC survivors — depth = max(``rerank*k``,
    ceil(``rerank_frac`` × the query's candidate count)), so the exact
    pass keeps a constant share of the probed lists as the corpus grows
    (VERDICT r11 #4: the fixed-depth form lost recall linearly with
    corpus size). With ``n_probe >= n_cells`` and a ``rerank`` covering
    the corpus it degenerates to exactly :func:`ann_bruteforce` (pytest
    invariant). Output schema matches ``ann_ivf``: (q_id, vec_id,
    cosine, rank). ``subcodebook`` injects pre-trained PQ sub-codebooks
    (:func:`pq_train_subcodebooks`) in place of the default stride seed
    — the same materialize-once pattern as ``codebook``."""
    cents = codebook if codebook is not None else ivf_centroids(
        emb, n_cells, stride, iters, train_stride, train_max)
    assign = (
        _rank_cells(emb.select("vec_id", "embedding"), cents,
                    "vec_id", "embedding")
        .filter(F.col("cr") == 1).select("vec_id", "cell")
    )
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    probes = (
        _rank_cells(q, cents, "q_id", "q_emb")
        .filter(F.col("cr") <= n_probe).select("q_id", "cell")
    )
    cand = (
        probes.join(assign, "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
    )
    subcb = (subcodebook if subcodebook is not None
             else pq_subcodebooks(emb, stride, m, ksub, dim))
    codes = pq_encode(emb, subcb, m, dim)
    # ADC lookup table: distance from each query subvector to every
    # sub-centroid — m x ksub rows per query, broadcast everywhere
    lut = _subvectors(
        q.select(F.col("q_id"),
                 F.expr(_CAST_DOUBLE_ARR.format(col="q_emb")).alias("emb")),
        "q_id", "emb", m, dim).join(F.broadcast(subcb), "m").select(
        "q_id", "m", F.col("j").alias("code"), _l2sq("sv", "sc").alias("d"))
    # m-ordered left-fold sum (4 doubles — a groupBy sum would add in
    # partition order and drift in the last ulp engine-to-engine)
    adc = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(lut), ["q_id", "m", "code"])
        .groupBy("q_id", "vec_id")
        .agg(F.round(F.aggregate(
            F.transform(F.array_sort(F.collect_list(F.struct("m", "d"))),
                        lambda s: s["d"]),
            F.lit(0.0), lambda acc, v: acc + v), 9).alias("adc"))
    )
    wa = W.partitionBy("q_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    wq = W.partitionBy("q_id")
    survivors = (adc.withColumn("ar", F.row_number().over(wa))
                 .withColumn("n_cand", F.count(F.lit(1)).over(wq))
                 .filter(F.col("ar") <= F.greatest(
                     F.lit(rerank * k),
                     F.ceil(F.lit(rerank_frac) * F.col("n_cand"))))
                 .select("q_id", "vec_id"))
    ev = emb.select("vec_id", F.col("embedding").alias("emb_v"))
    scored = (
        survivors.join(ev, "vec_id").join(F.broadcast(q), "q_id")
        .select("q_id", "vec_id", _cosine("emb_v", "q_emb").alias("cosine"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "cosine", "rank")
    )


def ann_ivfpq_oracle(n_queries: int = 10, k: int = 5,
                     n_cells: int = IVF_CELLS, n_probe: int = IVF_PROBE,
                     stride: int = IVF_STRIDE, iters: int = IVF_ITERS,
                     train_stride: int = IVF_TRAIN_STRIDE,
                     train_max: int = IVF_TRAIN_MAX, m: int = PQ_M,
                     ksub: int = PQ_KSUB, rerank: int = PQ_RERANK,
                     dim: int = PQ_DIM,
                     rerank_frac: float = PQ_RERANK_FRAC,
                     train_pq: bool = False) -> str:
    """The full IVF-PQ pipeline in DuckDB: same coarse codebook CTEs as
    ``ann_ivf``, sub-codebooks as slices of the rank-ordered seed vectors,
    L2^2 via three list_dot_products rounded 9 dp, ADC sums as m-ordered
    list_reduce folds, and the same adaptive re-rank depth.

    ``train_pq=True`` additionally replays :func:`pq_train_subcodebooks`
    — per-subspace Lloyd refinement of the seed books over the capped
    deterministic sample — as a CTE chain (the same fold-ordered means
    and argmin/tiebreak discipline as the coarse `_ivf_codebook_ctes`),
    so the PRODUCTION sub-codebook path (write_ivfpq_index's default)
    is value-pinnable too, not just the stride-seeded gate form."""
    sub = dim // m
    slices = " UNION ALL ".join(
        f"SELECT {mm} AS m, j, emb[{mm * sub + 1}:{(mm + 1) * sub}] AS sc "
        f"FROM seeds" for mm in range(m))
    qslices = " UNION ALL ".join(
        f"SELECT q_id, {mm} AS m, q_emb[{mm * sub + 1}:{(mm + 1) * sub}] "
        f"AS sv FROM q" for mm in range(m))
    vslices = " UNION ALL ".join(
        f"SELECT vec_id, {mm} AS m, emb[{mm * sub + 1}:{(mm + 1) * sub}] "
        f"AS sv FROM e" for mm in range(m))

    def l2(a, b):
        return (f"round(list_dot_product({a}, {a}) "
                f"+ list_dot_product({b}, {b}) "
                f"- 2 * list_dot_product({a}, {b}), 9)")

    if train_pq:
        pslices = " UNION ALL ".join(
            f"SELECT vec_id, {mm} AS m, emb[{mm * sub + 1}:{(mm + 1) * sub}]"
            f" AS sv FROM ps" for mm in range(m))
        tc = [f"pq0 AS ({slices}\n)", f"""ps AS MATERIALIZED (
    SELECT vec_id, emb FROM e WHERE vec_id % {train_stride} = 0
    ORDER BY vec_id LIMIT {train_max}
)""", f"psv AS MATERIALIZED ({pslices}\n)"]
        for i in range(1, iters + 1):
            prev = f"pq{i - 1}"
            tc.append(f"""pqa{i} AS (
    SELECT vec_id, m, j FROM (
        SELECT v.vec_id, v.m, s.j,
               row_number() OVER (PARTITION BY v.vec_id, v.m ORDER BY
                   {l2('v.sv', 's.sc')} ASC, s.j ASC) AS r
        FROM psv v JOIN {prev} s USING (m)
    ) t WHERE r = 1
)""")
            tc.append(f"""pqx{i} AS (
    SELECT a.m, a.j, v.vec_id,
           unnest(v.sv) AS val, generate_subscripts(v.sv, 1) AS pos
    FROM pqa{i} a JOIN psv v ON v.vec_id = a.vec_id AND v.m = a.m
)""")
            tc.append(f"""pqm{i} AS (
    SELECT m, j, pos,
           list_reduce(list(val ORDER BY vec_id), (x, y) -> x + y)
           / count(*) AS mu
    FROM pqx{i} GROUP BY m, j, pos
)""")
            tc.append(f"""pqt{i} AS (
    SELECT m, j, list(mu ORDER BY pos) AS sc FROM pqm{i} GROUP BY m, j
)""")
            tc.append(f"""pq{i} AS (
    SELECT p.m, p.j, coalesce(t.sc, p.sc) AS sc
    FROM {prev} p LEFT JOIN pqt{i} t USING (m, j)
)""")
        subcb_sql = (", ".join(tc)
                     + f", subcb AS MATERIALIZED (\n"
                       f"    SELECT m, j, sc FROM pq{iters}\n)")
    else:
        subcb_sql = f"subcb AS MATERIALIZED ({slices}\n)"

    return f"""
WITH e AS MATERIALIZED (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), {_ivf_codebook_ctes(n_cells, stride, iters, train_stride, train_max)}, ar AS (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_dot_product(e.emb, c.c_emb)
                     / (sqrt(list_dot_product(e.emb, e.emb))
                        * sqrt(list_dot_product(c.c_emb, c.c_emb))), 9) DESC,
               c.cell) AS cr
    FROM e CROSS JOIN c
), assign AS (
    SELECT vec_id, cell FROM ar WHERE cr = 1
), q AS MATERIALIZED (
    SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < {n_queries}
), pr AS (
    SELECT q.q_id, c.cell,
           row_number() OVER (PARTITION BY q.q_id ORDER BY
               round(list_dot_product(q.q_emb, c.c_emb)
                     / (sqrt(list_dot_product(q.q_emb, q.q_emb))
                        * sqrt(list_dot_product(c.c_emb, c.c_emb))), 9) DESC,
               c.cell) AS cr
    FROM q CROSS JOIN c
), probes AS (
    SELECT q_id, cell FROM pr WHERE cr <= {n_probe}
), cand AS (
    SELECT p.q_id, a.vec_id
    FROM probes p JOIN assign a ON a.cell = p.cell
    WHERE a.vec_id <> p.q_id
), seeds AS MATERIALIZED (
    SELECT emb, row_number() OVER (ORDER BY vec_id) - 1 AS j FROM (
        SELECT vec_id, emb FROM e WHERE vec_id % {stride} = 0
        ORDER BY vec_id LIMIT {ksub})
), {subcb_sql}, vsv AS ({vslices}
), codes AS MATERIALIZED (
    SELECT vec_id, m, code FROM (
        SELECT v.vec_id, v.m, s.j AS code,
               row_number() OVER (PARTITION BY v.vec_id, v.m ORDER BY
                   {l2('v.sv', 's.sc')} ASC, s.j ASC) AS r
        FROM vsv v JOIN subcb s USING (m)
    ) t WHERE r = 1
), qsv AS ({qslices}
), lut AS (
    SELECT qs.q_id, qs.m, s.j AS code, {l2('qs.sv', 's.sc')} AS d
    FROM qsv qs JOIN subcb s USING (m)
), adc AS (
    SELECT cand.q_id, cand.vec_id,
           round(list_reduce(list(l.d ORDER BY l.m), (x, y) -> x + y), 9)
           AS adc
    FROM cand
    JOIN codes co ON co.vec_id = cand.vec_id
    JOIN lut l ON l.q_id = cand.q_id AND l.m = co.m AND l.code = co.code
    GROUP BY cand.q_id, cand.vec_id
), survivors AS (
    SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY adc ASC, vec_id ASC) AS ar,
               count(*) OVER (PARTITION BY q_id) AS n_cand
        FROM adc
    ) t WHERE ar <= greatest({rerank * k},
                             CAST(ceil({rerank_frac!r} * n_cand) AS BIGINT))
), d AS (
    SELECT s.q_id, s.vec_id,
           round(list_dot_product(ev.emb, eq.q_emb)
                 / (sqrt(list_dot_product(ev.emb, ev.emb))
                    * sqrt(list_dot_product(eq.q_emb, eq.q_emb))), 9) AS cosine
    FROM survivors s
    JOIN e ev ON ev.vec_id = s.vec_id
    JOIN q eq ON eq.q_id = s.q_id
)
SELECT q_id, vec_id, cosine, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY cosine DESC, vec_id) AS rank
    FROM d
) t WHERE rank <= {k}
"""


# Recall-metric parameterization: the testdata embeddings have no planted
# near-duplicates (max pairwise cosine ~0.51 at sf0.01), and at cosine ~0.5
# the default 12-plane signature collides with probability ~2% — fine for
# near-dup hunting, vacuous for a recall bound. The metric therefore runs the
# SAME signature/bucket/score machinery at a denser, recall-oriented setting
# (16 tables x 6 planes: per-pair collision ~0.9 at cosine 0.45; measured
# recall 13/14 on the sf0.01 corpus), bounding it by 0.5 with wide margin.
RECALL_TABLES = 16
RECALL_PLANES = 6


def ann_lsh_recall(emb: DataFrame, min_cosine: float = 0.45,
                   threshold: float = 0.5, max_id: int = 800) -> DataFrame:
    """One-row recall metric gating the approximate LSH machinery: of ALL
    vector pairs whose exact cosine >= min_cosine, the fraction surfaced by
    the LSH candidate join must be >= threshold.

    The gate oracle recomputes the exact half (n_strong) and asserts the
    bound — a hash match proves (a) the exact all-pairs cosine side bitwise
    and (b) that LSH recall did not silently regress below threshold.
    The exact side is O(n²) by construction (it IS the ground truth the
    approximate operator exists to avoid), so the audit is bounded to the
    deterministic subset ``vec_id < max_id`` on BOTH sides — a no-op at the
    gate corpus size, a cost cap at larger sf."""
    strong = exact_strong_pairs(emb, min_cosine, max_id)
    emb = emb.filter(F.col("vec_id") < max_id)
    cand = (
        ann_lsh_pairs(emb, tables=RECALL_TABLES, planes=RECALL_PLANES)
        .select("vec_a", "vec_b").distinct()
        .withColumn("hit", F.lit(1))
    )
    # a LEFT OUTER join can only broadcast its right (non-preserved) side —
    # hint cand (bucket-bounded, small); hinting strong would be ignored
    flagged = strong.join(F.broadcast(cand), ["vec_a", "vec_b"], "left")
    return flagged.agg(
        F.lit("ann_lsh_recall").alias("metric"),
        F.count(F.lit(1)).cast("bigint").alias("n_strong"),
        (F.coalesce(F.sum("hit"), F.lit(0))
         >= F.count(F.lit(1)) * F.lit(threshold)).alias(
            f"recall_ge_{str(threshold).replace('.', '_')}"),
    )


def ann_lsh_recall_oracle(min_cosine: float = 0.45,
                          threshold: float = 0.5,
                          max_id: int = 800) -> str:
    """Exact half recomputed in SQL; the recall bound asserted TRUE
    (0 >= 0*t holds, so an empty strong set is vacuously true on both
    sides). Cosines round to 9 dp as in _cosine so the >= boundary agrees."""
    flag = f"recall_ge_{str(threshold).replace('.', '_')}"
    return f"""
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    WHERE vec_id < {max_id}
), d AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.emb, b.emb)
                 / (sqrt(list_dot_product(a.emb, a.emb))
                    * sqrt(list_dot_product(b.emb, b.emb))), 9) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT 'ann_lsh_recall' AS metric,
       CAST(count(*) AS BIGINT) AS n_strong,
       TRUE AS {flag}
FROM d WHERE cosine >= {min_cosine!r}
"""


# ---- persisted IVF-PQ index -------------------------------------------
# The codebooks were already materialize-once (train_ivf_codebook /
# pq_train_subcodebooks); at 100 TB the OTHER two derived states are
# the expensive ones — the per-vector cell ASSIGNMENT and the PQ CODES
# are full corpus passes.  A real vector index persists all of it:
# write (vec_id, embedding, codes, cell) partitioned by cell, so a
# query's n_probe cell reads become DIRECTORY reads (Spark partition
# pruning / dynamic partition pruning on the probe join) — query cost
# is proportional to the probed lists, enforced by the storage layout
# rather than by a filter the scan might not push.


def write_ivfpq_index(emb: DataFrame, path: str,
                      n_cells: int = IVF_CELLS, stride: int = IVF_STRIDE,
                      iters: int = IVF_ITERS,
                      train_stride: int = IVF_TRAIN_STRIDE,
                      train_max: int = IVF_TRAIN_MAX, m: int = PQ_M,
                      ksub: int = PQ_KSUB, dim: int = PQ_DIM,
                      train_pq: bool = True,
                      train_emb: DataFrame | None = None,
                      codebook: DataFrame | None = None) -> None:
    """Build the full IVF-PQ index at ``path``: ``codebook/`` (n_cells
    rows), ``subcodebook/`` (m × ksub rows, Lloyd-trained by default),
    and ``vectors/`` — one row per vector with its raw embedding (for
    the exact re-rank), its PQ code array (m entries, subspace order)
    and its IVF cell, PARTITIONED BY cell.  Train + assign + encode run
    once; every later query reads only its probed cell directories.

    ``train_emb`` decouples the TRAINING corpus from the INDEXED one
    (default: train on ``emb`` itself) — the production shape where
    codebooks come from an offline sample or a reference snapshot and
    the index then grows past it via :func:`append_ivfpq_index` under
    those frozen codebooks.  An index built over a subset with
    ``train_emb`` = the full set and then appended up to the full set
    is row-identical to a single-shot full build (pytest-pinned via
    ``_encode_vectors`` being the one shared encode pass).

    ``codebook`` skips the in-build coarse training and persists the
    given frame as the index's ``codebook/`` instead — for sessions
    that already trained one (the gate runners share a per-session
    codebook across semdedup / ann_ivfpq / the index gates; Lloyd is
    deterministic, so a codebook trained with the same knobs over the
    same corpus is row-identical to what the build would derive).
    When ``codebook`` is given, the coarse-training knobs (``n_cells``,
    ``stride``, ``iters``, ``train_stride``, ``train_max``) are IGNORED
    for the coarse stage — the frame is the codebook; the build asserts
    its schema and that its cell count is ≤ ``n_cells`` (Lloyd drops
    empty cells, so a trained codebook may hold fewer rows than asked —
    but never more) so a cached frame trained under LARGER knobs (e.g.
    semdedup's corpus-proportional auto sizing) cannot silently fork
    the persisted index from what the arguments claim (ADVICE r14
    #4)."""
    import os

    spark = emb.sparkSession
    tr = emb if train_emb is None else train_emb
    if codebook is not None:
        got_cols = set(codebook.columns)
        if not {"cell", "c_emb"} <= got_cols:
            raise ValueError(
                f"codebook must be a (cell, c_emb) frame from "
                f"train_ivf_codebook, got columns {sorted(got_cols)}")
        got_cells = codebook.count()
        if got_cells > n_cells:
            raise ValueError(
                f"supplied codebook has {got_cells} cells but the build "
                f"was asked for n_cells={n_cells}: the persisted index "
                f"would not match its arguments — pass the codebook's "
                f"real cell count (training knobs are otherwise ignored "
                f"when codebook= is given)")
        codebook.write.mode("overwrite").parquet(
            os.path.join(path, "codebook"))
        cb = spark.read.parquet(os.path.join(path, "codebook"))
    else:
        cb = train_ivf_codebook(tr, os.path.join(path, "codebook"),
                                n_cells, stride, iters, train_stride,
                                train_max)
    subcb = (pq_train_subcodebooks(tr, iters, stride, m, ksub, dim,
                                   train_stride, train_max)
             if train_pq else pq_subcodebooks(tr, stride, m, ksub, dim))
    subcb.write.mode("overwrite").parquet(os.path.join(path,
                                                       "subcodebook"))
    subcb = spark.read.parquet(os.path.join(path, "subcodebook"))
    _encode_vectors(emb, cb, subcb, m, dim).write.mode(
        "overwrite").partitionBy("cell").parquet(
        os.path.join(path, "vectors"))


def _encode_vectors(emb: DataFrame, cb: DataFrame, subcb: DataFrame,
                    m: int, dim: int) -> DataFrame:
    """(vec_id, embedding, cell, codes) under FROZEN codebooks — the
    one assignment + PQ-encode pass both the initial build and every
    later increment run, so batch and incremental index rows cannot
    diverge by construction."""
    assign = (
        _rank_cells(emb.select("vec_id", "embedding"), cb,
                    "vec_id", "embedding")
        .filter(F.col("cr") == 1).select("vec_id", "cell")
    )
    codes = (pq_encode(emb, subcb, m, dim)
             .groupBy("vec_id")
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("m", "code"))),
                 lambda s: s["code"]).alias("codes")))
    return (emb.select("vec_id", "embedding")
            .join(assign, "vec_id").join(codes, "vec_id"))


def append_ivfpq_index(spark, path: str, new_emb: DataFrame,
                       m: int = PQ_M, dim: int = PQ_DIM) -> None:
    """Grow a :func:`write_ivfpq_index` index WITHOUT retraining — the
    100 TB ingest path (the minhash_lsh_incremental twin for ANN): at
    corpus scale you cannot re-encode the index every time a batch of
    new vectors arrives.  The codebooks are FROZEN (the standard IVF
    discipline — retrain is a deliberate offline event on drift, never
    an ingest side effect), so only the increment pays assignment + PQ
    encoding, and the new rows APPEND into the same cell-partitioned
    layout: existing cell files are untouched, queries prune over
    old ∪ new identically, and — because the increment runs the exact
    `_encode_vectors` pass the initial build ran — an appended index is
    row-identical to one built in a single shot under the same
    codebooks (pytest-pinned)."""
    import os

    cb = spark.read.parquet(os.path.join(path, "codebook"))
    subcb = spark.read.parquet(os.path.join(path, "subcodebook"))
    _encode_vectors(new_emb, cb, subcb, m, dim).write.mode(
        "append").partitionBy("cell").parquet(
        os.path.join(path, "vectors"))


def ann_ivfpq_query(spark, path: str, q: DataFrame, k: int = 5,
                    n_probe: int = IVF_PROBE, m: int = PQ_M,
                    rerank: int = PQ_RERANK, dim: int = PQ_DIM,
                    rerank_frac: float = PQ_RERANK_FRAC) -> DataFrame:
    """Search a :func:`write_ivfpq_index` index: ``q`` is (q_id, q_emb).
    Identical math to :func:`ann_ivfpq` (ADC fold order, adaptive
    re-rank depth, round-9 cosine, tiebreaks), so results are
    bit-identical to the in-memory operator given the same codebooks —
    pytest-pinned.  The probe join hits the cell-partitioned vectors
    table, so only the probed directories are read."""
    import os

    cb = spark.read.parquet(os.path.join(path, "codebook"))
    subcb = spark.read.parquet(os.path.join(path, "subcodebook"))
    vec = spark.read.parquet(os.path.join(path, "vectors"))
    probes = (
        _rank_cells(q, cb, "q_id", "q_emb")
        .filter(F.col("cr") <= n_probe).select("q_id", "cell")
    )
    cand = (
        F.broadcast(probes).join(vec, "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
    )
    lut = _subvectors(
        q.select("q_id",
                 F.expr(_CAST_DOUBLE_ARR.format(col="q_emb")).alias("emb")),
        "q_id", "emb", m, dim).join(F.broadcast(subcb), "m").select(
        "q_id", "m", F.col("j").alias("code"), _l2sq("sv", "sc").alias("d"))
    # the raw embedding rides THROUGH the ADC aggregation (functionally
    # dependent on vec_id, so first() is deterministic): the exact
    # re-rank then needs NO second read of the vectors table — a
    # survivors-join back to `vec` would full-scan every cell directory
    # and defeat the pruned-probe contract the index exists for
    adc = (
        cand.select("q_id", "vec_id", "embedding",
                    F.posexplode("codes").alias("m", "code"))
        .join(F.broadcast(lut), ["q_id", "m", "code"])
        .groupBy("q_id", "vec_id")
        .agg(F.first("embedding").alias("emb_v"),
             F.round(F.aggregate(
                 F.transform(
                     F.array_sort(F.collect_list(F.struct("m", "d"))),
                     lambda s: s["d"]),
                 F.lit(0.0), lambda acc, v: acc + v), 9).alias("adc"))
    )
    wa = W.partitionBy("q_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    wq = W.partitionBy("q_id")
    survivors = (adc.withColumn("ar", F.row_number().over(wa))
                 .withColumn("n_cand", F.count(F.lit(1)).over(wq))
                 .filter(F.col("ar") <= F.greatest(
                     F.lit(rerank * k),
                     F.ceil(F.lit(rerank_frac) * F.col("n_cand"))))
                 .select("q_id", "vec_id", "emb_v"))
    scored = (
        survivors.join(F.broadcast(q), "q_id")
        .select("q_id", "vec_id", _cosine("emb_v", "q_emb").alias("cosine"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "cosine", "rank")
    )
