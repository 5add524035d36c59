"""Deduplication operators over the ``documents`` table.

Training-data-pipeline first-class ops (exact, prefix-key, MinHash+LSH,
SimHash, n-gram Jaccard). Each has a Spark DataFrame implementation and an
ANSI-SQL oracle (DuckDB) built from primitives verified to agree bit-for-bit
across engines: md5, substr, conv/0x-cast for hex->int64, split/slice,
lexicographic string min.

Scale notes: every op is a shuffle-on-key groupBy/self-join — at 10^12 docs
the shingle self-join (Jaccard) and band-bucket join (LSH) dominate; both
key on high-cardinality deterministic hashes, so they salt/AQE cleanly and
broadcast nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_MINHASH = 8
N_BANDS = 4  # rows-per-band = 2
SIMHASH_BITS = 60  # 15 hex chars -> fits signed int64 in both engines
JACCARD_THRESHOLD = 0.12
SHINGLE_N = 3


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle): distinct word n-grams, n=3."""
    toks = F.split(F.col("text"), " ")
    grams = F.expr(
        f"transform(sequence(1, greatest(size(split(text,' ')) - {SHINGLE_N - 1}, 1)), "
        f"i -> array_join(slice(split(text,' '), i, {SHINGLE_N}), ' '))"
    )
    _ = toks
    return (
        docs.select("doc_id", F.explode(grams).alias("shingle"))
        .distinct()
    )


_SHINGLES_SQL = (
    "SELECT doc_id, unnest(["
    "array_to_string(string_split(text,' ')[i:i+{n1}], ' ') "
    "for i in range(1, greatest(len(string_split(text,' ')) - {n1}, 1) + 1)"
    "]) AS shingle FROM documents"
).format(n1=SHINGLE_N - 1)


def exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on full text (map-side combinable)."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("keeper"),
        )
        .filter(F.col("n_docs") >= 1)
    )


EXACT_DUP_SQL = """
SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS keeper
FROM documents GROUP BY md5(text)
"""


def prefix_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-exact dedup on a normalized prefix key (first 5 words)."""
    key = F.md5(F.array_join(F.slice(F.split("text", " "), 1, 5), " "))
    return (
        _docs(spark, sf_dir)
        .groupBy(key.alias("prefix_hash"))
        .agg(F.count("*").cast("long").alias("n_docs"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_docs") > 1)
    )


PREFIX_DUP_SQL = """
SELECT md5(array_to_string(string_split(text,' ')[1:5],' ')) AS prefix_hash,
       count(*) AS n_docs, min(doc_id) AS keeper
FROM documents
GROUP BY 1 HAVING count(*) > 1
"""


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (8 md5 permutations) + LSH banding (4 bands x 2 rows):
    candidate near-dup pairs = docs sharing any band signature.

    shingle -> minhash -> band -> bucket-join, all on deterministic md5
    strings (lexicographic min == numeric min of the hash)."""
    sh = _shingles(_docs(spark, sf_dir))
    mh = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(str(s)), F.lit("|"), F.col("shingle")))).alias(
                f"mh{s}"
            )
            for s in range(N_MINHASH)
        ]
    )
    bands = mh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"b{b}:"), F.col(f"mh{2*b}"), F.lit("|"), F.col(f"mh{2*b+1}")
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).cache()  # both join sides; uncached, the minhash agg runs twice
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, "band")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


MINHASH_LSH_SQL = f"""
WITH shingles AS ({_SHINGLES_SQL}),
sh AS (SELECT DISTINCT doc_id, shingle FROM shingles),
mh AS (
  SELECT doc_id,
         {", ".join(f"min(md5('{s}' || '|' || shingle)) AS mh{s}" for s in range(N_MINHASH))}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, unnest([
    {", ".join(f"'b{b}:' || mh{2*b} || '|' || mh{2*b+1}" for b in range(N_BANDS))}
  ]) AS band FROM mh
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
"""


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document from md5-hashed tokens.

    Folded JVM-side: one groupBy(doc_id) with 60 bit-count aggregates plus a
    token count, instead of exploding every token into 60 bit rows (a 60x
    row blow-up whose second shuffle dominated the r01 profile). Identical
    integer math: the per-bit vote s = sum(2*bit - 1) = 2*cnt_b - n, bit set
    iff s >= 0 — all map-side combinable."""
    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .withColumn(
            "h", F.expr("cast(conv(substr(md5(tok),1,15),16,10) as bigint)")
        )
    )
    aggs = [
        F.sum(F.expr(f"cast(shiftright(h, {b}) & 1 as bigint)")).alias(f"c{b}")
        for b in range(SIMHASH_BITS)
    ]
    per_doc = toks.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n"), *aggs
    )
    sig_expr = " + ".join(
        f"(case when 2 * c{b} - n >= 0 then shiftleft(1L, {b}) else 0L end)"
        for b in range(SIMHASH_BITS)
    )
    return per_doc.select(
        "doc_id", F.expr(sig_expr).cast("bigint").alias("simhash")
    )


SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, ('0x' || substr(md5(unnest(string_split(text,' '))),1,15))::BIGINT AS h
  FROM documents
),
bits AS (
  SELECT doc_id, b, sum(2 * ((h >> b) & 1) - 1) AS s
  FROM toks, (SELECT unnest(range(0, {SIMHASH_BITS})) AS b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       sum((CASE WHEN s >= 0 THEN 1::BIGINT ELSE 0 END) << b)::BIGINT AS simhash
FROM bits GROUP BY doc_id
"""


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEST ORACLE ONLY (not registered as a production query since round 2):
    all-pairs word-3-gram Jaccard via a raw shingle self-join — hot
    stop-grams make the join key distribution unboundedly skewed at scale.
    The production operator is :func:`ngram_jaccard_filtered` (identical
    semantics over the surviving shingle sets, hot shingles dropped before
    the join); this raw form remains as its small-scale comparison point.
    """
    sh = _shingles(_docs(spark, sf_dir))
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "inter", "jaccard")
    )


NGRAM_JACCARD_SQL = f"""
WITH shingles AS ({_SHINGLES_SQL}),
sh AS (SELECT DISTINCT doc_id, shingle FROM shingles),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.inter,
       round(i.inter / (na.n + nb.n - i.inter), 4) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE round(i.inter / (na.n + nb.n - i.inter), 4) >= {JACCARD_THRESHOLD}
"""


SIMHASH_HAMMING_MAX = 20


def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEST ORACLE ONLY (not registered as a production query since round 2):
    exact all-pairs SimHash hamming <= 20 via crossJoin — O(N^2), cannot
    survive scale. The production operator is
    :func:`simhash_near_dup_banded`; this quadratic form remains as the
    ground truth the banded operator is verified against in tests/."""
    sig = simhash_signatures(spark, sf_dir)
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    pairs = a.crossJoin(b).filter(F.col("doc_a") < F.col("doc_b"))
    return (
        pairs.withColumn(
            "hamming", F.expr("cast(bit_count(ha ^ hb) as int)")
        )
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


SIMHASH_NEAR_PAIRS_SQL = f"""
WITH toks AS (
  SELECT doc_id, ('0x' || substr(md5(unnest(string_split(text,' '))),1,15))::BIGINT AS h
  FROM documents
),
bits AS (
  SELECT doc_id, b, sum(2 * ((h >> b) & 1) - 1) AS s
  FROM toks, (SELECT unnest(range(0, {SIMHASH_BITS})) AS b)
  GROUP BY doc_id, b
),
sig AS (
  SELECT doc_id,
         sum((CASE WHEN s >= 0 THEN 1::BIGINT ELSE 0 END) << b)::BIGINT AS simhash
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_HAMMING_MAX}
"""


SIMHASH_BANDED_HAMMING_MAX = 3
N_SIMHASH_BANDS = 4  # 4 bands x 15 bits; pigeonhole: hamming<=3 => shared band


def simhash_near_dup_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production SimHash near-dup: banded bucket-join candidate generation,
    then the exact hamming check.

    The 60-bit signature splits into 4 disjoint 15-bit bands. Two signatures
    at hamming distance <= 3 differ in at most 3 bands (pigeonhole), so they
    MUST agree on at least one band — the band-equality equi-join generates
    every qualifying pair with zero false negatives, and the exact
    ``bit_count(xor)`` filter removes false positives. Result is therefore
    IDENTICAL to the quadratic all-pairs form at threshold 3 (the oracle SQL
    is exactly that form), but the plan is a shuffle-on-band-key equi-join:
    no crossJoin, candidate volume ~ sum of per-bucket squares (bounded by
    near-dup cluster sizes, not corpus size).

    At 100 TB: band keys are 4 rows/doc, high-cardinality (2^15 values x 4
    band ids, widen bands to taste); a pathological bucket (mass-duplicated
    content) is exactly a giant duplicate cluster — AQE skew-join splits it,
    and the downstream distinct caps output. Reference semantics:
    near-duplicate detection per Charikar SimHash, the operator the
    reference's corpus tooling lacks but a training-data pipeline needs.
    """
    sig = simhash_signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_no"),
                        F.expr(f"(simhash >> {15 * b}) & 32767").alias("band_key"),
                    )
                    for b in range(N_SIMHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_no", "band.band_key")
    # both join sides reuse the band table; without a cache Catalyst
    # recomputes the full signature aggregation twice
    bands = bands.cache()
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, ["band_no", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("cast(bit_count(ha ^ hb) as int)"))
        .filter(F.col("hamming") <= SIMHASH_BANDED_HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


# oracle = the exact quadratic form at the same threshold: the banded plan is
# provably equivalent (pigeonhole), so DuckDB may do the O(N^2) the engine
# must not.
SIMHASH_NEAR_DUP_BANDED_SQL = f"""
WITH toks AS (
  SELECT doc_id, ('0x' || substr(md5(unnest(string_split(text,' '))),1,15))::BIGINT AS h
  FROM documents
),
bits AS (
  SELECT doc_id, b, sum(2 * ((h >> b) & 1) - 1) AS s
  FROM toks, (SELECT unnest(range(0, {SIMHASH_BITS})) AS b)
  GROUP BY doc_id, b
),
sig AS (
  SELECT doc_id,
         sum((CASE WHEN s >= 0 THEN 1::BIGINT ELSE 0 END) << b)::BIGINT AS simhash
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_BANDED_HAMMING_MAX}
"""


MAX_SHINGLE_FREQ = 25


def ngram_jaccard_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard near-dup with hot-shingle removal — the production scale
    path: shingles occurring in more than MAX_SHINGLE_FREQ docs are dropped
    BEFORE the self-join (they are stop-gram noise and the join-skew risk),
    then pair Jaccard is computed over each doc's surviving shingle set."""
    sh = _shingles(_docs(spark, sf_dir)).cache()  # feeds freq AND kept
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    kept = sh.join(
        freq.filter(F.col("df") <= MAX_SHINGLE_FREQ).select("shingle"), "shingle"
    ).cache()  # reused by sizes and both self-join sides (3 recomputes)
    sizes = kept.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    a = kept.alias("a")
    b = kept.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "inter", "jaccard")
    )


NGRAM_JACCARD_FILTERED_SQL = f"""
WITH shingles AS ({_SHINGLES_SQL}),
sh AS (SELECT DISTINCT doc_id, shingle FROM shingles),
hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > {MAX_SHINGLE_FREQ}),
kept AS (SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.inter,
       round(i.inter / (na.n + nb.n - i.inter), 4) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE round(i.inter / (na.n + nb.n - i.inter), 4) >= {JACCARD_THRESHOLD}
"""


MAX_CC_ITERS = 30


def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the MinHash-LSH
    candidate-pair graph, each document labeled with the smallest doc_id
    reachable from it (the canonical "keeper" of its duplicate cluster —
    the dedup decision a training-data pipeline actually applies).

    Spark implementation: iterative Hash-Min label propagation — labels
    start as doc_id; each round every vertex takes the min of its own label
    and its neighbors' labels; converged when a round changes nothing
    (checked with one count per round). ``localCheckpoint`` truncates the
    growing lineage each round (else the plan doubles per iteration).
    Deterministic: the fixpoint is exactly min-reachable-id. At 10^12 docs
    Hash-Min needs O(diameter) rounds; duplicate clusters are shallow
    (diameter is small for near-dup graphs), and the production upgrade is
    the alternating small-star/large-star contraction (O(log n) rounds) —
    same fixpoint, so the oracle is unchanged.

    Oracle: a DuckDB recursive CTE computing min-reachable-id directly.
    """
    docs = _docs(spark, sf_dir).select("doc_id")
    pairs = minhash_lsh_pairs(spark, sf_dir)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .cache()
    )
    labels = docs.select("doc_id", F.col("doc_id").alias("cluster_id"))
    labels = labels.localCheckpoint()
    for _ in range(MAX_CC_ITERS):
        nbr_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, labels.doc_id == nbr_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(f"CC did not converge in {MAX_CC_ITERS} rounds")
    return labels.select("doc_id", "cluster_id")


NEAR_DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE shingles AS ({_SHINGLES_SQL}),
sh AS (SELECT DISTINCT doc_id, shingle FROM shingles),
mh AS (
  SELECT doc_id,
         {", ".join(f"min(md5('{s}' || '|' || shingle)) AS mh{s}" for s in range(N_MINHASH))}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, unnest([
    {", ".join(f"'b{b}:' || mh{2*b} || '|' || mh{2*b+1}" for b in range(N_BANDS))}
  ]) AS band FROM mh
),
pr AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pr
  UNION ALL SELECT doc_b, doc_a FROM pr
),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.s, reach.r FROM reach JOIN edges e ON e.d = reach.doc_id
)
SELECT doc_id, min(r)::BIGINT AS cluster_id FROM reach GROUP BY doc_id
"""
