"""Relational skeleton queries mapping SURVEY.md §2 operator classes onto
the driver's TPC-H-ish tables (explode/join/groupBy/window/set-op/metrics).

Each maps a reference operator to native Catalyst:
- collect-by-key  ~ CollectNode merge (collect_node.py:75-131)
- window ordering ~ sorted_boxes reading order (utils.py:95-103)
- drop-score      ~ predict_system.py:327-336 confidence filter
- det/rec metrics ~ mindocr/metrics (det_metrics.py:98-167,
  rec_metrics.py:16-158): per-row labels then partial+final aggregation
  (the Spark analogue of the reference's AllReduce(sum)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style aggregation (partial+final agg, codegen-friendly)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def order_revenue_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-style join + agg + deterministic top-10 (broadcastable dim)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return rev.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc()).limit(10)


ORDER_REVENUE_SQL = """
SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def collect_lines_by_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollectNode analogue: ordered re-assembly per key after a shuffle —
    groupBy + sorted collect replaces the reference's remaining-counter."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("l_linenumber", "l_partkey"))
                    ),
                    lambda x: x["l_partkey"].cast("string"),
                ),
                ",",
            ).alias("parts_in_line_order"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


COLLECT_LINES_SQL = """
SELECT l_orderkey,
       string_agg(l_partkey::VARCHAR, ',' ORDER BY l_linenumber, l_partkey) AS parts_in_line_order,
       count(*) AS n_lines
FROM lineitem GROUP BY l_orderkey
"""


def reading_order_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sorted_boxes analogue: deterministic per-partition ordering via a
    window (top-3 earliest events per user)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "user_id",
            "event_id",
            F.col("rn").cast("int").alias("rn"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
    )


READING_ORDER_SQL = """
WITH r AS (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
)
SELECT user_id, event_id, CAST(rn AS INT) AS rn,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM r WHERE rn <= 3
"""


def drop_score_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-Catalyst confidence predicate (drop_score semantics)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value") >= 0.5)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


DROP_SCORE_SQL = """
SELECT event_type, count(*) AS n_kept, round(avg(value), 4) AS avg_value
FROM events WHERE value >= 0.5 GROUP BY event_type
"""


def user_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: users who both clicked and purchased (intersect)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    b = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return a.intersect(b)


USER_INTERSECTION_SQL = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session counting with a 30-minute inactivity gap (lag window):
    the batch analogue of a session window (SURVEY.md §2.11)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gaps = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > 1800),
            1,
        ).otherwise(0),
    )
    return gaps.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count("*").cast("long").alias("n_events"),
    )


SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
  FROM events
)
SELECT user_id,
       sum(CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800
                THEN 1 ELSE 0 END)::BIGINT AS n_sessions,
       count(*) AS n_events
FROM g GROUP BY user_id
"""


def rec_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RecMetric analogue (rec_metrics.py:115-158): normalize (strip spaces,
    lower), exact-match accuracy + 1 - mean normalized edit distance over
    (doc i, doc i+1) surrogate pred/gt pairs."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.regexp_replace("text", " ", "")).alias("norm")
    )
    a = d.alias("a")
    b = d.select((F.col("doc_id") - 1).alias("doc_id"), F.col("norm").alias("norm_b"))
    pairs = a.join(b, "doc_id").select(
        F.col("norm").alias("pred"), F.col("norm_b").alias("gt")
    )
    scored = pairs.select(
        F.when(F.col("pred") == F.col("gt"), 1).otherwise(0).alias("correct"),
        (
            F.levenshtein("pred", "gt")
            / F.greatest(F.length("pred"), F.length("gt"))
        ).alias("ned"),
    )
    return scored.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(F.avg("correct"), 4).alias("acc"),
        F.round(F.lit(1.0) - F.avg("ned"), 4).alias("norm_edit_sim"),
    )


REC_METRIC_SQL = """
WITH d AS (
  SELECT doc_id, lower(regexp_replace(text, ' ', '', 'g')) AS norm FROM documents
),
pairs AS (
  SELECT a.norm AS pred, b.norm AS gt
  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
),
scored AS (
  SELECT CASE WHEN pred = gt THEN 1 ELSE 0 END AS correct,
         levenshtein(pred, gt)::DOUBLE / greatest(length(pred), length(gt)) AS ned
  FROM pairs
)
SELECT count(*) AS n_pairs, round(avg(correct), 4) AS acc,
       round(1.0 - avg(ned), 4) AS norm_edit_sim
FROM scored
"""


def det_metric_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DetMetric analogue (det_metrics.py:98-167): per-row tp/fp/fn labels,
    then global precision/recall/f — partial+final agg ≡ AllReduce(sum)."""
    ev = _t(spark, sf_dir, "events")
    lab = ev.select(
        F.when((F.col("value") >= 0.5) & (F.col("event_type") == "click"), 1)
        .otherwise(0)
        .alias("tp"),
        F.when((F.col("value") >= 0.5) & (F.col("event_type") != "click"), 1)
        .otherwise(0)
        .alias("fp"),
        F.when((F.col("value") < 0.5) & (F.col("event_type") == "click"), 1)
        .otherwise(0)
        .alias("fn"),
    )
    agg = lab.agg(
        F.sum("tp").cast("long").alias("tp"),
        F.sum("fp").cast("long").alias("fp"),
        F.sum("fn").cast("long").alias("fn"),
    )
    # metrics as integer basis points: float round(x, 4) on a ratio can land
    # on a representation that differs between engines past 6 significant
    # digits (the CLAUDE.md decimal-boundary landmine; driver gate r01 caught
    # it) — pure integer division is bit-identical everywhere.
    return agg.select(
        "tp",
        "fp",
        "fn",
        F.expr("(10000 * tp) div (tp + fp)").alias("precision_bp"),
        F.expr("(10000 * tp) div (tp + fn)").alias("recall_bp"),
        F.expr("(20000 * tp) div (2 * tp + fp + fn)").alias("f_score_bp"),
    )


DET_METRIC_SQL = """
WITH lab AS (
  SELECT CASE WHEN value >= 0.5 AND event_type = 'click' THEN 1 ELSE 0 END AS tp,
         CASE WHEN value >= 0.5 AND event_type != 'click' THEN 1 ELSE 0 END AS fp,
         CASE WHEN value < 0.5 AND event_type = 'click' THEN 1 ELSE 0 END AS fn
  FROM events
),
agg AS (SELECT sum(tp)::BIGINT AS tp, sum(fp)::BIGINT AS fp, sum(fn)::BIGINT AS fn FROM lab)
SELECT tp, fp, fn,
       ((10000 * tp) // (tp + fp))::BIGINT AS precision_bp,
       ((10000 * tp) // (tp + fn))::BIGINT AS recall_bp,
       ((20000 * tp) // (2 * tp + fp + fn))::BIGINT AS f_score_bp
FROM agg
"""


def supplier_part_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way equi-join with two broadcastable dims + grouped agg."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_lineitems"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


SUPPLIER_PART_SQL = """
SELECT n_name, count(*) AS n_lineitems, round(sum(l_extendedprice), 2) AS total_price
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def explode_reassemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode -> per-element transform -> ordered re-assembly: the exact
    relational skeleton of the span pipeline (explode spans / collect by
    doc), on the documents table."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    upper3 = toks.withColumn("tok3", F.upper(F.substring("tok", 1, 3)))
    return (
        upper3.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "tok3"))),
                    lambda x: x["tok3"],
                ),
                " ",
            ).alias("reassembled"),
            F.count("*").cast("long").alias("n_tokens"),
        )
    )


EXPLODE_REASSEMBLE_SQL = """
WITH toks AS (
  SELECT doc_id, i - 1 AS pos, upper(substr(string_split(text,' ')[i], 1, 3)) AS tok3
  FROM documents, LATERAL (SELECT unnest(range(1, len(string_split(text,' ')) + 1)) AS i)
)
SELECT doc_id,
       string_agg(tok3, ' ' ORDER BY pos) AS reassembled,
       count(*) AS n_tokens
FROM toks GROUP BY doc_id
"""


def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (EXISTS): customers having at least one order."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


CUSTOMERS_WITH_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (NOT EXISTS): orders with no lineitem rows."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
        .select("o_orderkey", "o_custkey")
    )


ORDERS_WITHOUT_LINEITEMS_SQL = """
SELECT o_orderkey, o_custkey FROM orders
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
"""


def returnflag_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation with NULL grouping levels normalized to 'ALL'."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
            "sum_qty",
        )
    )


RETURNFLAG_ROLLUP_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch form of a streaming window):
    hourly event counts and value sums per type."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


HOURLY_EVENT_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def event_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile window: quartile assignment by value within each event type,
    counted per bucket (deterministic tie-break on event_id)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("event_type", "quartile")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .withColumn("quartile", F.col("quartile").cast("int"))
    )


EVENT_QUARTILES_SQL = """
WITH q AS (
  SELECT event_type, value,
         ntile(4) OVER (PARTITION BY event_type
                        ORDER BY value ASC, event_id ASC) AS quartile
  FROM events
)
SELECT event_type, CAST(quartile AS INT) AS quartile, count(*) AS n,
       round(min(value), 4) AS min_value, round(max(value), 4) AS max_value
FROM q GROUP BY event_type, quartile
"""


def type_medians(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median + distinct users per event type."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("median_value"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count("*").cast("long").alias("n"),
    )


TYPE_MEDIANS_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS median_value,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n
FROM events GROUP BY event_type
"""


def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured field extraction: parse the events.props JSON column
    (the from_json/get_json_object operator class) and aggregate."""
    ev = _t(spark, sf_dir, "events")
    k = F.expr("cast(get_json_object(props, '$.k') as int)")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


PROPS_JSON_SQL = """
SELECT event_type, count(*) AS n,
       sum(json_extract(props, '$.k')::INT)::BIGINT AS sum_k,
       min(json_extract(props, '$.k')::INT)::INT AS min_k,
       max(json_extract(props, '$.k')::INT)::INT AS max_k
FROM events GROUP BY event_type
"""
