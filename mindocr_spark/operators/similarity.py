"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

- ``cosine_topk``: brute-force exact top-k for a query set — the baseline.
  Dot products run JVM-side via ``aggregate(zip_with(...))`` in double
  precision with index-order folds, which both Spark and DuckDB evaluate in
  the same IEEE order; results rounded to 4dp before ranking so both
  engines rank identically.
- ``ann_lsh_topk``: the scale path — sign-LSH bucketing on the first 6
  coordinates (deterministic hyperplanes), then exact rerank within the
  bucket. At 10^12 rows the bucket column is the shuffle/partition key and
  the query set is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_QUERIES = 20
TOP_K = 3
LSH_DIMS = 6

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "0D, (acc, v) -> acc + v)"
)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _with_norm(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "norm", F.expr(f"sqrt({_DOT.format(a='embedding', b='embedding')})")
    )


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-3 cosine neighbors for vec_id < 20 (brute force)."""
    emb = _with_norm(_emb(spark, sf_dir))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("norm").alias("cn"),
    )
    # broadcast the small query side; the corpus side streams
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sims = pairs.withColumn(
        "sim", F.round(F.expr(_DOT.format(a="qe", b="ce")) / (F.col("qn") * F.col("cn")), 4)
    ).select("query_id", "neighbor_id", "sim")
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


_DOT_DUCK = "list_sum([cast({a}[i] as double) * cast({b}[i] as double) for i in range(1, 65)])"

COSINE_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt({_DOT_DUCK.format(a='embedding', b='embedding')}) AS norm
  FROM embeddings
),
sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_DOT_DUCK.format(a='q.embedding', b='c.embedding')} / (q.norm * c.norm), 4) AS sim
  FROM e q JOIN e c ON c.vec_id != q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {TOP_K}
"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: sign-LSH on first 6 dims, exact top-1 within bucket."""
    bucket = F.expr(
        "aggregate(sequence(0, %d), 0, (acc, i) -> "
        "acc + shiftleft(case when element_at(embedding, i + 1) >= 0F then 1 else 0 end, i))"
        % (LSH_DIMS - 1)
    )
    emb = _with_norm(_emb(spark, sf_dir)).withColumn("bucket", bucket)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qn"),
        "bucket",
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("norm").alias("cn"),
        "bucket",
    )
    pairs = c.join(F.broadcast(q), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sims = pairs.withColumn(
        "sim", F.round(F.expr(_DOT.format(a="qe", b="ce")) / (F.col("qn") * F.col("cn")), 4)
    ).select("query_id", "neighbor_id", "sim")
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 1)
        .select("query_id", "neighbor_id", "sim")
    )


ANN_LSH_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt({_DOT_DUCK.format(a='embedding', b='embedding')}) AS norm,
         list_sum([CASE WHEN embedding[i] >= 0 THEN 1 << (i - 1) ELSE 0 END
                   for i in range(1, {LSH_DIMS + 1})]) AS bucket
  FROM embeddings
),
sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_DOT_DUCK.format(a='q.embedding', b='c.embedding')} / (q.norm * c.norm), 4) AS sim
  FROM e q JOIN e c ON c.bucket = q.bucket AND c.vec_id != q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, sim FROM ranked WHERE rank = 1
"""


N_IVF_CENTROIDS = 8


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: deterministic "trained" centroids (the first 8
    vectors), every embedding assigned to its nearest centroid (L2, rounded,
    ties to the lower centroid id), queries probe only their own cell and
    exact-rank top-1 by cosine inside it.

    At 10^12 rows the cell id is the partition key; centroids are broadcast
    (a ~KB table), so assignment is a map-side broadcast nested-loop, and
    search shuffles only the probed cells.
    """
    emb = _with_norm(_emb(spark, sf_dir))
    cents = emb.filter(F.col("vec_id") < N_IVF_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce")
    )
    dists = emb.crossJoin(F.broadcast(cents)).withColumn(
        "dist",
        F.round(
            F.expr(
                "aggregate(zip_with(embedding, ce, (x, y) -> "
                "(cast(x as double) - cast(y as double)) * "
                "(cast(x as double) - cast(y as double))), 0D, (a, v) -> a + v)"
            ),
            4,
        ),
    )
    from pyspark.sql.window import Window

    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("dist").asc(), F.col("cent_id").asc()
    )
    assigned = (
        dists.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "norm", F.col("cent_id").alias("cell"))
    )
    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qn"),
        "cell",
    )
    c = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        F.col("norm").alias("nn"),
        "cell",
    )
    sims = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim",
            F.round(
                F.expr(_DOT.format(a="qe", b="ne")) / (F.col("qn") * F.col("nn")), 4
            ),
        )
        .select("query_id", "neighbor_id", "sim")
    )
    from pyspark.sql.window import Window as W2

    w = W2.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 1)
        .select("query_id", "neighbor_id", "sim")
    )


_L2_DUCK = (
    "list_sum([(cast({a}[i] as double) - cast({b}[i] as double)) * "
    "(cast({a}[i] as double) - cast({b}[i] as double)) for i in range(1, 65)])"
)

IVF_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt({_DOT_DUCK.format(a='embedding', b='embedding')}) AS norm
  FROM embeddings
),
cents AS (SELECT vec_id AS cent_id, embedding AS ce FROM e WHERE vec_id < {N_IVF_CENTROIDS}),
dists AS (
  SELECT e.vec_id, e.embedding, e.norm, c.cent_id,
         round({_L2_DUCK.format(a='e.embedding', b='c.ce')}, 4) AS dist
  FROM e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id, embedding, norm, cent_id AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist ASC, cent_id ASC) AS rn
        FROM dists)
  WHERE rn = 1
),
sims AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         round({_DOT_DUCK.format(a='q.embedding', b='n.embedding')} / (q.norm * n.norm), 4) AS sim
  FROM assigned q JOIN assigned n ON n.cell = q.cell AND n.vec_id != q.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id, neighbor_id, sim
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM sims)
WHERE rank = 1
"""


NEAR_DUP_COS = 0.45


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= threshold; 0.45 here so the synthetic corpus yields pairs), all-pairs exact.

    The scale path prefilters candidates with the sign-LSH buckets
    (``ann_lsh_topk``) before the exact pass; at sf scale the exact
    quadratic form doubles as the oracle-checkable ground truth.
    """
    emb = _with_norm(_emb(spark, sf_dir))
    a = emb.select(
        F.col("vec_id").alias("doc_a"), F.col("embedding").alias("ea"),
        F.col("norm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("doc_b"), F.col("embedding").alias("eb"),
        F.col("norm").alias("nb"),
    )
    pairs = a.crossJoin(b).filter(F.col("doc_a") < F.col("doc_b"))
    return (
        pairs.withColumn(
            "cos",
            F.round(
                F.expr(_DOT.format(a="ea", b="eb")) / (F.col("na") * F.col("nb")), 4
            ),
        )
        .filter(F.col("cos") >= NEAR_DUP_COS)
        .select("doc_a", "doc_b", "cos")
    )


EMBEDDING_NEAR_DUP_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt({_DOT_DUCK.format(a='embedding', b='embedding')}) AS norm
  FROM embeddings
)
SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
       round({_DOT_DUCK.format(a='a.embedding', b='b.embedding')} / (a.norm * b.norm), 4) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round({_DOT_DUCK.format(a='a.embedding', b='b.embedding')} / (a.norm * b.norm), 4) >= {NEAR_DUP_COS}
"""
