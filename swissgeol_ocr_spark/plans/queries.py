"""Driver-contract queries: every SQL-expressible operator from SURVEY §2
plus the training-data operators (dedup / similarity / text analysis),
each as a Spark DataFrame callable with a matching DuckDB oracle.

Contract (see /root/repo/__spark_entry__.py): the driver runs the Spark
query and the oracle SQL side-by-side at sf=0.01 and compares row count,
schema and an order-insensitive value hash — so every computed column is
aliased identically on both sides, float outputs are rounded, and all
hashing is md5 (reproducible across engines, unlike xxhash64).

Operator ↔ reference mapping (file:line in /root/reference):
  c5_confidence_filter   applyocr.py:94-112 (two-tier window filter)
  s3_resume_antijoin     main.py:36-41, target.py:29-33 (skip-existing)
  p3_pagecount_check     ocr/__init__.py:88-97 (output verification)
  agg_block_stats        readingorder.py:10-16, util.py:20-29 (rect folds →
                         classic grouped aggregation)
  r1_span_ordering       readingorder.py:49-52 (sort key → row_number)
  t1_tiles               textract.py:98-117 (tile explode)
  join_broadcast_dim     block-graph child resolution S7 as hash equi-join
  topk_orders            deterministic top-k
  event_windows          tumbling-window rollup (streaming-ish batch form)
  sessionize             gap-based per-user sessionization (batch twin of a
                         session window; one user_id exchange)
  asof_join              point-in-time as-of join via union-tag +
                         last(ignorenulls) — linear, never range-explosion
  funnel_stages          sequential funnel as chained running-min windows
  percentiles            exact quantiles via histogram aggregation
  star_join_q5           TPC-H Q5-shaped multi-way star join
  cube_rollup / pivot_events / retention_cohorts — OLAP subtotal, pivot
                         and cohort surfaces
plus the training-data family documented in functions/textops.py and
functions/simsearch.py.
"""

from __future__ import annotations

import math
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swissgeol_ocr_spark.functions import simsearch, textops
from swissgeol_ocr_spark.plans.config import DedupConfig

# module-level default: the Spark query face AND the generated SQL oracles
# read the same instance, so changing the scale knobs re-sizes both sides
_DEDUP_CFG = DedupConfig()

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


# Inferred-schema memo for _t: driver-side parquet schema inference costs
# ~75 ms per read (footer fetch + merge) and the bench re-builds every
# query from scratch each pass, so the suite paid it ~25× per pass. The
# cached artifact is the pure-Python StructType ONLY — never file
# listings, plans or data; every call still returns a FRESH DataFrame
# (fresh expr IDs, so self-joins of the same table keep working) and
# every action still scans the parquet. Keyed by the file fingerprint
# (size + mtime of the file or directory entries) so a rewritten test
# fixture re-infers; any stat failure (remote paths) falls back to the
# plain inferring read.
_T_SCHEMA_CACHE: dict = {}


def _parquet_fingerprint(path: str):
    ap = os.path.realpath(path)
    if os.path.isdir(ap):
        entries = []
        with os.scandir(ap) as it:   # close the fd on every exit path
            for e in it:
                if e.is_dir():
                    # nested (partitioned) layout: an in-place rewrite
                    # inside a subdirectory would not move any top-level
                    # size/mtime, so the flat fingerprint cannot see it —
                    # opt out (OSError takes the plain inferring read)
                    raise OSError("nested layout — not fingerprintable flat")
                entries.append((e.name, e.stat().st_size, e.stat().st_mtime_ns))
                if len(entries) > 4096:
                    # a table with thousands of local part files would pay
                    # more for the fingerprint walk than inference saves
                    raise OSError("too many entries to fingerprint")
        return ap, tuple(sorted(entries))
    st = os.stat(ap)
    return ap, (st.st_size, st.st_mtime_ns)


# session confs that change what parquet schema inference RETURNS for the
# same file — they must be part of the memo key or a differently-configured
# session in the same process would be served the other session's types
_T_INFER_CONFS = (
    "spark.sql.parquet.binaryAsString",
    "spark.sql.parquet.int96AsTimestamp",
    "spark.sql.parquet.inferTimestampNTZ.enabled",
    "spark.sql.caseSensitive",
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    try:
        fp = _parquet_fingerprint(path)
    except OSError:
        return spark.read.parquet(path)
    key = (fp, tuple(spark.conf.get(c, None) for c in _T_INFER_CONFS))
    schema = _T_SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        if len(_T_SCHEMA_CACHE) > 512:
            _T_SCHEMA_CACHE.clear()
        _T_SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def _spread(df: DataFrame, *cols: str, min_bytes: int = 512 * 1024) -> DataFrame:
    """Guarantee a CPU-heavy per-row derivation runs at cluster width even
    when the scan cannot (guide §2.5 'input skew': a single-file,
    single-ROW-GROUP parquet table arrives as ONE scan task no matter how
    small ``maxPartitionBytes`` is — splits align to row groups — and
    Catalyst fuses per-row projections into the scan, so the whole regex/
    md5 sweep serializes on one core while the rest idle; measured
    quality_score 1.61s → 0.34s at the 10×-replica corpus). Hash-
    repartitions on ``cols`` (deterministic — never round-robin, which
    pays a local sort and is retry-unsafe on nondeterministic input) ONLY
    when the scan has fewer partitions than the cluster has cores; a real
    100 TB table arrives as ~10^6 splits, so at scale this is a no-op and
    no shuffle is ever added. Callers must only pass relations whose
    downstream results are partitioning-independent (per-row projections,
    keyed aggregates over integers/min/max — never a float running sum).

    The ``min_bytes`` floor keeps the exchange out of *small* jobs, where
    the whole sweep costs less than a shuffle round-trip. NOTE the floor
    compares the COMPRESSED relation estimate (plan stats = file size):
    a highly-duplicated corpus can compress 10× (measured: 50k docs in
    877 KB), so the floor is deliberately low — mis-spreading a small
    table costs ~0.1s once, while missing the spread on a big one
    serializes the whole sweep (measured +1.5s on the replica when a
    2 MB floor skipped a 50k-doc table)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    size = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    if size < min_bytes:
        return df
    return df.repartition(n, *[F.col(c) for c in cols])


# ---------------------------------------------------------------------------
# Reference-operator queries
# ---------------------------------------------------------------------------


def q_c5_confidence_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 two-tier confidence filter in pure DataFrame form: block = source,
    confidence = deterministic proxy in [0,1); keep a row iff its confidence
    clears the block's two-tier threshold (T=0.7)."""
    docs = _t(spark, sf_dir, "documents")
    # exact integer micro-units end-to-end: conf_1m = round(k*1e6/96) is a
    # k*31250/3 rational (thirds — never a .5 boundary, so round() agrees
    # across engines); the window aggregate is then a LONG sum + integer
    # division, making the threshold comparison bit-exact in any engine.
    # A float window-average here would be summation-order-dependent, and
    # both round() and floor() quantizations diverge when the true average
    # sits on (or half-off) the quantization grid — which 6dp-rounded
    # inputs regularly produce.
    conf1m = F.round((F.col("n_chars") % 97).cast("double") * 1_000_000.0 / 96.0).cast(
        "long"
    )
    d = docs.select("doc_id", "source", conf1m.alias("c1m"))
    w = Window.partitionBy("source")
    d = d.withColumn("sum1m", F.sum("c1m").over(w))
    d = d.withColumn("n_blk", F.count("*").over(w))
    # integer division (`div`), not float `/`: at corpus scale the long sum
    # exceeds 2^53 and float division stops being exact
    d = d.withColumn("avg1m", F.expr("sum1m div n_blk"))
    thr_hit = F.when(
        F.col("avg1m") < 700_000, F.col("c1m").cast("double") > 850_000.0
    ).otherwise(F.col("c1m") * 2 > F.col("avg1m"))
    return d.filter(thr_hit).select(
        "doc_id",
        "source",
        (F.col("c1m").cast("double") / 1_000_000.0).alias("conf"),
        (F.col("avg1m").cast("double") / 1_000_000.0).alias("avg_conf"),
    )


SQL_C5 = """
WITH d AS (
  -- exact integer micro-units (k*1e6/96 is a thirds rational, never .5)
  SELECT doc_id, source,
         CAST(round((n_chars % 97) * 1000000.0 / 96.0) AS BIGINT) AS c1m
  FROM documents
), w AS (
  SELECT doc_id, source, c1m,
         sum(c1m) OVER (PARTITION BY source) AS sum1m,
         count(*) OVER (PARTITION BY source) AS n_blk
  FROM d
), a AS (
  SELECT doc_id, source, c1m, sum1m // n_blk AS avg1m FROM w
)
SELECT doc_id, source,
       CAST(c1m AS DOUBLE) / 1000000.0 AS conf,
       CAST(avg1m AS DOUBLE) / 1000000.0 AS avg_conf
FROM a
WHERE CASE WHEN avg1m < 700000 THEN CAST(c1m AS DOUBLE) > 850000.0
           ELSE c1m * 2 > avg1m END
"""


def q_s3_resume_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 skip-existing: anti-join the input against the committed set
    (docs with doc_id % 7 == 0 standing in for already-extracted output)."""
    docs = _t(spark, sf_dir, "documents")
    done = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    return docs.join(done, "doc_id", "left_anti").select("doc_id", "source")


SQL_S3 = """
SELECT doc_id, source FROM documents
WHERE doc_id % 7 <> 0
"""


def q_p3_pagecount_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 output-verification invariant as an agg-join: per-order line
    counts with the order's attributes (mismatch filter = empty gate)."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    counts = lineitem.groupBy("l_orderkey").agg(F.count("*").alias("n_lines"))
    return (
        orders.join(counts, orders.o_orderkey == counts.l_orderkey, "inner")
        .select("o_orderkey", "o_orderstatus", "n_lines")
    )


SQL_P3 = """
SELECT o_orderkey, o_orderstatus, CAST(count(*) AS BIGINT) AS n_lines
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_orderstatus
"""


def q_agg_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped min/max/sum/avg folds (TPC-H-Q1-shaped); partial aggregation
    (map-side combine) + one shuffle on the tiny group key."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.count("*").alias("count_order"),
        )
    )


SQL_AGG = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_r1_span_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 sort-key ordering as a window rank: dense per-partition offsets
    (row_number over the scan order) — the relational face of the spans'
    dense ``offset`` assignment."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id", F.row_number().over(w).alias("span_rank")
    )


SQL_R1 = """
SELECT event_id, user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT)
         AS span_rank
FROM events
"""


def q_t1_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 tile generation as a deterministic explode over synthetic page
    dims derived from ``part`` (textract.py:98-117 semantics: single tile
    for small pages, else full page + 2000pt grid with 400pt overlap)."""
    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        (500 + (F.col("p_partkey") % 40) * 100).cast("double").alias("w"),
        (500 + (F.col("p_partkey") % 53) * 80).cast("double").alias("h"),
    )
    small = part.filter((F.col("w") <= 2000) & (F.col("h") <= 2000)).select(
        "p_partkey",
        F.lit(0.0).alias("x0"),
        F.lit(0.0).alias("y0"),
        F.col("w").alias("x1"),
        F.col("h").alias("y1"),
    )
    big = part.filter((F.col("w") > 2000) | (F.col("h") > 2000))
    starts = lambda dim: F.sequence(F.lit(0), (dim - 400).cast("int") - 1, F.lit(1600))
    grid = (
        big.select("p_partkey", "w", "h", F.explode(starts(F.col("w"))).alias("gx"))
        .select("p_partkey", "w", "h", "gx", F.explode(starts(F.col("h"))).alias("gy"))
        .select(
            "p_partkey",
            F.col("gx").cast("double").alias("x0"),
            F.col("gy").cast("double").alias("y0"),
            F.least(F.col("gx") + 2000, F.col("w")).cast("double").alias("x1"),
            F.least(F.col("gy") + 2000, F.col("h")).cast("double").alias("y1"),
        )
    )
    full = big.select(
        "p_partkey",
        F.lit(0.0).alias("x0"),
        F.lit(0.0).alias("y0"),
        F.col("w").alias("x1"),
        F.col("h").alias("y1"),
    )
    return small.unionByName(full).unionByName(grid)


SQL_T1 = """
WITH p AS (
  SELECT p_partkey,
         CAST(500 + (p_partkey % 40) * 100 AS DOUBLE) AS w,
         CAST(500 + (p_partkey % 53) * 80 AS DOUBLE) AS h
  FROM part
), small AS (
  SELECT p_partkey, 0.0 AS x0, 0.0 AS y0, w AS x1, h AS y1
  FROM p WHERE w <= 2000 AND h <= 2000
), big AS (
  SELECT * FROM p WHERE w > 2000 OR h > 2000
), fullpage AS (
  SELECT p_partkey, 0.0 AS x0, 0.0 AS y0, w AS x1, h AS y1 FROM big
), grid AS (
  SELECT p_partkey,
         CAST(gx AS DOUBLE) AS x0,
         CAST(gy AS DOUBLE) AS y0,
         CAST(least(gx + 2000, w) AS DOUBLE) AS x1,
         CAST(least(gy + 2000, h) AS DOUBLE) AS y1
  FROM big,
       LATERAL unnest(range(0, CAST(w - 400 AS INT), 1600)) AS tx(gx),
       LATERAL unnest(range(0, CAST(h - 400 AS INT), 1600)) AS ty(gy)
)
SELECT * FROM small UNION ALL SELECT * FROM fullpage UNION ALL SELECT * FROM grid
"""


def q_join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash equi-join with an explicitly broadcast dimension (the S7
    id→block resolution shape): revenue per brand."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


SQL_JOIN = """
SELECT p_brand,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-k (TakeOrderedAndProject — no full sort)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .limit(100)
    )


SQL_TOPK = """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour rollup per event type (batch form of the streaming
    windowed agg; see streaming/ for the readStream variant)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


SQL_WINDOWS = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_json_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface: pull a typed field out of the events
    table's JSON props column and roll it up per event_type. JSON
    extraction stays JVM-side (get_json_object — codegen'd Jackson path,
    no Python) and the rollup is one combinable groupBy; at 100 TB the
    cost is the scan plus one tiny shuffle. Sums are integers (k is an
    integer field) so nothing float crosses the engine boundary; rows
    with unparsable/missing k are counted, not dropped silently. try_cast,
    not cast: under ANSI mode (Spark 4 default) a single non-numeric k
    anywhere in a 100 TB crawl would otherwise throw and kill the job —
    caught by the planted-malformed-props test. An explicit integer-shape
    guard precedes the cast on BOTH faces: the engines' lenient numeric
    casts disagree ('5.7' → NULL in Spark try_cast, 6 in DuckDB TRY_CAST),
    so only \\A-?[0-9]+\\z strings are accepted as k. Anchors are \\A/\\z,
    not ^/$: Java's $ matches BEFORE a trailing newline while RE2's does
    not, so '5\\n' would count on the Spark face and null on the DuckDB
    face — \\A/\\z mean absolute start/end in both engines."""
    ev = _t(spark, sf_dir, "events")
    raw = F.get_json_object(F.col("props"), "$.k")
    k = F.when(raw.rlike(r"\A-?[0-9]+\z"), raw).try_cast("long")
    d = ev.select("event_type", k.alias("k"))
    return d.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


SQL_JSON_STATS = """
WITH d AS (
  -- json_valid guard: DuckDB's json_extract_string THROWS on malformed
  -- JSON (the implicit VARCHAR->JSON cast), where Spark's get_json_object
  -- returns NULL; the regexp guard mirrors the Spark face's integer-shape
  -- rule (lenient numeric casts disagree across engines on '5.7')
  -- nested CASE, not AND: vectorized AND may evaluate both conjuncts,
  -- and only CASE branches are guaranteed lazy
  -- absolute anchors (backslash-A / backslash-z), same reason as the
  -- Spark face: Java dollar tolerates a trailing newline, RE2 does not
  SELECT event_type,
         TRY_CAST(
           CASE WHEN json_valid(props) THEN
             CASE WHEN regexp_matches(
                         json_extract_string(props, '$.k'), '\\A-?[0-9]+\\z')
                  THEN json_extract_string(props, '$.k') END
           END AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(k) AS BIGINT) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM d GROUP BY event_type
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: per-user sessions split on ≥30 min of
    inactivity — the standard event-stream building block. The streaming
    twin is streaming/pipeline.py `sessionize_stream` (built-in
    session_window, same gap); session_window is half-open [ts, ts+gap),
    so the split here is `>=` to agree with it event-for-event (equality
    pinned in tests). This is the batch form the oracle can pin. One hash exchange on user_id, then two linear window
    walks inside each user's partition — nothing quadratic at 100 TB; a
    pathological single-user firehose would serialize into one task, the
    same caveat every per-key sessionizer has. Ties on ts break by
    event_id so the walk is deterministic across engines; value totals are
    integer cents (2-decimal inputs) because a per-session double sum is
    summation-order-dependent."""
    ev = _t(spark, sf_dir, "events")
    walk = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).withColumn("prev_ts", F.lag("ts").over(walk))
    # timestampdiff, not unix_micros: the parquet column is TIMESTAMP_NTZ,
    # and a cast to TIMESTAMP would interpret it in the session timezone —
    # a DST-straddling gap would then disagree with DuckDB's epoch_us math
    gap_us = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    d = d.withColumn(
        "is_new",
        F.when(gap_us.isNull() | (gap_us >= 30 * 60 * 1_000_000), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    d = d.withColumn(
        "session_seq",
        F.sum("is_new")
        .over(walk.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return d.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))").alias("duration_us"),
        F.sum("cents").alias("sum_value_cents"),
    )


# session CTE chain shared by the batch oracle and the streaming-face
# oracle (one literal so both faces sessionize identically)
_SQL_SESSION_CTES = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, event_id, cents,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_seq
  FROM g
)
"""

SQL_SESSIONIZE = _SQL_SESSION_CTES + """
SELECT user_id, session_seq,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us,
       CAST(sum(cents) AS BIGINT) AS sum_value_cents
FROM s GROUP BY user_id, session_seq
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each 'click' matched to the latest prior-or-equal 'view'
    by the same user — the point-in-time join Spark has no built-in for.
    Expressed as union-tag + last(ignorenulls) over ONE user_id exchange:
    both sides shuffle once on the equi-key and the match is a single
    linear in-partition pass — never the range-explosion join (clicks ×
    candidate views) a naive BETWEEN formulation produces at 100 TB. At
    equal timestamps views sort before clicks (is_probe tiebreak), so
    'prior-or-equal' includes a same-microsecond view, deterministically."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isin("view", "click"))
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", F.col("event_id")).alias("view_id"),
        F.when(F.col("event_type") == "view", F.col("ts")).alias("view_ts"),
        F.when(F.col("event_type") == "view", F.lit(0)).otherwise(F.lit(1)).alias(
            "is_probe"
        ),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "is_probe", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    m = tagged.withColumn(
        "matched_view_id", F.last("view_id", ignorenulls=True).over(w)
    ).withColumn("matched_view_ts", F.last("view_ts", ignorenulls=True).over(w))
    return m.filter(F.col("is_probe") == 1).select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
        "matched_view_id",
        # NTZ-safe and timezone-free (see q_sessionize)
        F.expr("timestampdiff(MICROSECOND, matched_view_ts, ts)").alias("lag_us"),
    )


def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential conversion funnel (view → click → purchase) per user:
    first view, first click at-or-after it, first purchase at-or-after
    that. ONE user_id exchange: the three stages are chained running-min
    windows over the same (ts, event_id) walk — each stage's predicate
    reads the previous stage's running column, so no per-stage self-join
    and no re-shuffle (the same window spec chains Window nodes on one
    Exchange, and the final per-user rollup reuses the subset
    partitioning). 'After' is by the deterministic (ts, event_id) order,
    so a same-microsecond earlier-id view legitimately satisfies a click."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = ev.select("user_id", "ts", "event_id", "event_type")
    d = d.withColumn(
        "v1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    d = d.withColumn(
        "c1",
        F.min(
            F.when(
                (F.col("event_type") == "click") & F.col("v1").isNotNull(),
                F.col("ts"),
            )
        ).over(w),
    )
    d = d.withColumn(
        "p1",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & F.col("c1").isNotNull(),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = d.groupBy("user_id").agg(
        F.min("v1").alias("first_view"),
        F.min("c1").alias("first_click_after"),
        F.min("p1").alias("first_purchase_after"),
    )
    reached = (
        F.when(F.col("first_purchase_after").isNotNull(), F.lit(3))
        .when(F.col("first_click_after").isNotNull(), F.lit(2))
        .when(F.col("first_view").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
    )
    return per_user.select(
        "user_id",
        "first_view",
        "first_click_after",
        "first_purchase_after",
        reached.alias("reached_stage"),
    )


SQL_FUNNEL = """
WITH s1 AS (
  SELECT user_id, ts, event_id, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END) OVER w AS v1
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), s2 AS (
  SELECT user_id, ts, event_id, event_type, v1,
         min(CASE WHEN event_type = 'click' AND v1 IS NOT NULL THEN ts END)
           OVER w AS c1
  FROM s1
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), s3 AS (
  SELECT user_id, ts, event_id, v1, c1,
         min(CASE WHEN event_type = 'purchase' AND c1 IS NOT NULL THEN ts END)
           OVER w AS p1
  FROM s2
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), u AS (
  SELECT user_id, min(v1) AS first_view, min(c1) AS first_click_after,
         min(p1) AS first_purchase_after
  FROM s3 GROUP BY user_id
)
SELECT user_id, first_view, first_click_after, first_purchase_after,
       CASE WHEN first_purchase_after IS NOT NULL THEN 3
            WHEN first_click_after IS NOT NULL THEN 2
            WHEN first_view IS NOT NULL THEN 1 ELSE 0 END AS reached_stage
FROM u
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles (p50/p90/p99) of event value per event_type,
    via HISTOGRAM aggregation: groupBy (type, cents) first — a partial agg
    that collapses 100 TB of rows map-side into at most |value domain|
    rows per type — then one cumulative window over DISTINCT values only.
    The naive per-row window (rank over every event) would funnel each
    type's full row set into one task; this shape's window input is bounded
    by value cardinality, not row count. All arithmetic is integer (cents,
    ceil via (a+b-1) div b), so no float quantile interpolation crosses the
    engine boundary (HALF_UP/HALF_EVEN and interpolation order both differ
    between engines). NULL values are excluded from the distribution
    explicitly: the engines disagree on default null ORDER (Spark NULLS
    FIRST ascending, DuckDB NULLS LAST), which would shift every
    cumulative count past the null group."""
    ev = _t(spark, sf_dir, "events")
    h = (
        ev.filter(F.col("value").isNotNull())
        .select(
            "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
        )
        .groupBy("event_type", "cents")
        .agg(F.count("*").alias("cnt"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    h = h.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(wall)
    )
    ranks = {"p50": 50, "p90": 90, "p99": 99}
    aggs = [F.max("n").alias("n")]
    for name, p in ranks.items():
        rank = F.expr(f"(n * {p} + 99) div 100")  # ceil(n*p/100), integer
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, F.col("cents"))).alias(
                f"{name}_cents"
            )
        )
    aggs.append(F.max("cents").alias("max_cents"))
    return h.groupBy("event_type").agg(*aggs)


SQL_PERCENTILES = """
WITH h AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), c AS (
  SELECT event_type, cents, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM h
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n,
       min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN cents END) AS p50_cents,
       min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN cents END) AS p90_cents,
       min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN cents END) AS p99_cents,
       max(cents) AS max_cents
FROM c GROUP BY event_type
"""


SQL_ASOF = """
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'view' THEN event_id END AS view_id,
         CASE WHEN event_type = 'view' THEN ts END AS view_ts,
         CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS is_probe
  FROM events WHERE event_type IN ('view', 'click')
), m AS (
  SELECT user_id, ts, event_id, is_probe,
         last_value(view_id IGNORE NULLS) OVER w AS matched_view_id,
         last_value(view_ts IGNORE NULLS) OVER w AS matched_view_ts
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_probe, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS click_id, user_id, ts AS click_ts, matched_view_id,
       epoch_us(ts) - epoch_us(matched_view_ts) AS lag_us
FROM m WHERE is_probe = 1
"""


# ---------------------------------------------------------------------------
# Streaming faces as driver-checkable queries: each runs the REAL
# Structured Streaming operator bounded (two file micro-batches,
# availableNow trigger, state store engaged across the batch boundary)
# and returns the drained result, so the same hard cross-engine oracle
# that pins the batch face pins the streaming face. The reference has no
# streaming surface (SURVEY §2.8) — these are the training-pipeline
# extensions' continuous forms, held to batch-grade correctness checks
# instead of the weaker rows-only check streaming ops usually get.
# ---------------------------------------------------------------------------

_EVENT_DDL = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)


def _stream_workdir() -> str:
    """Temp working tree for a bounded streaming run, reclaimed at process
    exit (atexit, best-effort). NOT reclaimed earlier on purpose: the
    returned DataFrames read the sink directory LAZILY, so the files must
    outlive the call until the driver/test collects them."""
    import atexit
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="sgs_stream_q_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    return work


def _drain(q, timeout_s: int = 600) -> None:
    """Block until the bounded (availableNow) streaming query finishes.
    A timeout STOPS the query and raises — silently reading a
    half-drained sink would surface as an oracle value mismatch blamed on
    the operator, and the still-running query would compete with every
    subsequent query in the session."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise RuntimeError(
            f"bounded streaming run did not drain within {timeout_s}s"
        )


def _staged_two_file_stream(first: DataFrame, second: DataFrame, schema: str):
    """Stage two DataFrames as a two-file micro-batch stream
    (maxFilesPerTrigger=1 → exactly two triggers, so per-key state MUST
    carry across a micro-batch boundary — the path that distinguishes a
    streaming operator from a warm re-run of the batch one). The file
    source processes oldest-first, so ``first`` is trigger one. Returns
    (stream_df, workdir)."""
    work = _stream_workdir()
    in_dir = f"{work}/in"
    first.repartition(1).write.parquet(in_dir)
    second.repartition(1).write.mode("append").parquet(in_dir)
    spark = first.sparkSession
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    return stream, work


def _staged_event_stream(spark: SparkSession, sf_dir: str, split: str):
    """Events-table staging: split='parity' interleaves halves across the
    full time range (hardest for session merging; order-insensitive
    consumers only); split='time' cuts at the median timestamp so
    per-user event-time order holds across batches — the
    kafka-partition-by-user deployment shape the order-sensitive stateful
    operators (as-of, funnel) are specified against."""
    ev = _t(spark, sf_dir, "events")
    if split == "parity":
        first = ev.filter(F.col("event_id") % 2 == 0)
        second = ev.filter(F.col("event_id") % 2 == 1)
    else:
        mid = ev.selectExpr("percentile_approx(ts, 0.5) AS m").first().m
        first = ev.filter(F.col("ts") <= mid)
        second = ev.filter(F.col("ts") > mid)
    return _staged_two_file_stream(first, second, _EVENT_DDL)


def q_sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded run of the streaming session_window face
    (streaming/pipeline.py sessionize_stream): parity-split feed, so
    nearly every session is MERGED across the micro-batch boundary in the
    state store; complete-mode memory sink. The oracle is the batch
    sessionize SQL re-projected to the stream's output shape
    (window_end = last event + gap, session_window's half-open end)."""
    import uuid

    from swissgeol_ocr_spark.streaming.pipeline import sessionize_stream

    stream, work = _staged_event_stream(spark, sf_dir, "parity")
    name = f"sess_stream_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    # decouple from the memory-sink temp view so it can be dropped now
    # instead of accumulating one uuid-named table per invocation
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


def q_asof_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded run of the streaming as-of enrichment
    (streaming/pipeline.py asof_stream, applyInPandasWithState): time-
    median split, so second-batch clicks must match views remembered in
    STATE from the first; parquet sink (the deployment sink shape).
    Oracle: the batch as-of SQL verbatim — the stream's output schema is
    the batch schema by construction."""
    from swissgeol_ocr_spark.streaming.pipeline import asof_stream

    stream, work = _staged_event_stream(spark, sf_dir, "time")
    out_dir = f"{work}/out"
    q = (
        asof_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.read.parquet(out_dir).select(
        "click_id", "user_id", "click_ts", "matched_view_id", "lag_us"
    )


def q_funnel_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded run of the streaming change-data funnel
    (streaming/pipeline.py funnel_stream): time-median split so stage
    advances span micro-batches; the change-data emits are rolled up to
    the per-user FINAL row (highest reached_stage — emits are strictly
    stage-increasing per user, so the max is unique), which must equal
    the batch funnel on the stage>0 users. Oracle: the batch funnel SQL
    filtered to reached_stage > 0 (stage-0 users never emit a change)."""
    from swissgeol_ocr_spark.streaming.pipeline import funnel_stream

    stream, work = _staged_event_stream(spark, sf_dir, "time")
    out_dir = f"{work}/out"
    q = (
        funnel_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    emits = spark.read.parquet(out_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("reached_stage"))
    return (
        emits.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "first_view",
            "first_click_after",
            "first_purchase_after",
            "reached_stage",
        )
    )


def q_extract_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded run of the end-to-end streaming extraction job
    (streaming/pipeline.py run_stream_to_parquet: file-source spans
    stream → mapInArrow kernel → exactly-once parquet sink with
    checkpoint). Stateless, so the drained output is the batch pipeline's
    output document-for-document; exploded to the span-sequence surface
    so the flagship's HARD oracle (SQL_EXTRACT_SEQUENCE — closed-form
    DuckDB regeneration + the pure-python twin's golden for the
    reading-order layout) pins the streaming face too."""
    from swissgeol_ocr_spark.sources.corpus import documents_to_spans
    from swissgeol_ocr_spark.streaming.pipeline import run_stream_to_parquet

    docs = _t(spark, sf_dir, "documents")
    # materialize the synthesis ONCE: the two parity writes are separate
    # actions and Spark has no cross-action common-subplan elimination
    # (the dedup_clusters lineage-cut precedent)
    spans = documents_to_spans(docs).localCheckpoint(eager=True)
    work = _stream_workdir()
    in_dir, out_dir = f"{work}/in", f"{work}/out"
    # internal-invariant cast: the synthesis mints numeric-string doc_ids
    spans.filter(F.col("doc_id").cast("bigint") % 2 == 0).write.parquet(in_dir)
    spans.filter(F.col("doc_id").cast("bigint") % 2 == 1).write.mode(
        "append"
    ).parquet(in_dir)
    q = run_stream_to_parquet(spark, in_dir, out_dir, f"{work}/ckpt")
    _drain(q)
    out = spark.read.parquet(out_dir)
    return out.select("doc_id", F.explode("spans_out").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


def q_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded run of the streaming exact dedup
    (streaming/pipeline.py dedup_stream — dropDuplicatesWithinWatermark
    on md5(text)): parity-split feed so duplicates recur across the
    micro-batch boundary and must be dropped from STATE, not within one
    batch. WHICH doc survives a group is arrival-order-dependent (the
    operator's keep-first contract), so the oracled projection is the
    emitted fingerprint SET — exactly one row per distinct text —
    which is deterministic and engine-checkable.

    The synthetic corpora are duplicate-free, which would make the fp-set
    oracle vacuous (removing the dedup would still pass), so every 10th
    document is re-fed as a PLANTED duplicate in the second file: even
    originals land in file one, so their copies cross the micro-batch
    boundary and must be dropped from state; odd originals' copies
    exercise the in-batch leg. The oracle stays `DISTINCT md5(text)` —
    planted rows add no new fingerprint, but a broken dedup now emits
    extra rows and fails the row-count gate."""
    from swissgeol_ocr_spark.streaming.pipeline import dedup_stream

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    stream, work = _staged_two_file_stream(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1).unionByName(dups),
        "doc_id bigint, text string",
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.read.parquet(f"{work}/out").select("fp")


def q_minhash_neardup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded run of the incremental banded near-dup
    (streaming/pipeline.py minhash_neardup_stream — foreachBatch against
    the accumulated band index): feed split at the median doc_id so
    arrival is id-ordered, making the stream's keep-first representative
    equal the batch min-id representative; a pair then surfaces in the
    batch where its LATER member arrives, and the drained pair set equals
    the batch dedup_minhash_lsh pairs (the operator's documented
    equality precondition, pinned by the streaming tests). Oracle: the
    batch MinHash pair SQL projected to (a_id, b_id)."""
    from swissgeol_ocr_spark.streaming.pipeline import (
        _try_read_parquet,
        minhash_neardup_stream,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    mid = docs.selectExpr("percentile_approx(doc_id, 0.5) AS m").first().m
    stream, work = _staged_two_file_stream(
        docs.filter(F.col("doc_id") <= mid),
        docs.filter(F.col("doc_id") > mid),
        "doc_id bigint, text string",
    )
    q = minhash_neardup_stream(
        stream,
        index_path=f"{work}/idx",
        pairs_path=f"{work}/pairs",
        checkpoint_path=f"{work}/ckpt",
    )
    _drain(q)
    # _try_read_parquet absorbs ONLY path-not-found (no batch emitted a
    # pair → the append sink dir was never created); any other
    # AnalysisException — schema mismatch, corrupted sink — propagates
    # instead of masquerading as an empty-but-valid pair set (ADVICE r5)
    pairs = _try_read_parquet(spark, f"{work}/pairs")
    if pairs is None:
        return spark.createDataFrame([], "a_id bigint, b_id bigint")
    return pairs.select("a_id", "b_id")


SQL_SESSIONIZE_STREAM = _SQL_SESSION_CTES + """
SELECT user_id,
       min(ts) AS window_start,
       max(ts) + INTERVAL 30 MINUTE AS window_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS sum_value_cents
FROM s GROUP BY user_id, session_seq
"""

SQL_ASOF_STREAM = SQL_ASOF

SQL_FUNNEL_STREAM = (
    "SELECT * FROM (" + SQL_FUNNEL.strip() + ") WHERE reached_stage > 0"
)


# RAG-style chunking: words per chunk / stride (overlap = CHUNK_W - CHUNK_STRIDE)
CHUNK_W, CHUNK_STRIDE = 64, 48


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping retrieval chunks (the RAG ingestion primitive): each
    document split into CHUNK_W-word windows every CHUNK_STRIDE words,
    the last chunk ragged. MAP-ONLY — words array materialized once (the
    HOF re-evaluation trap), chunk starts from sequence(), one explode,
    md5 chunk fingerprints; the executed plan has ZERO Exchanges, so at
    100 TB this is scan-bandwidth-bound by construction, like pii_scrub.
    Chunk text itself is not emitted (the fingerprint pins it) — at corpus
    scale the ~1.33× text blow-up of overlapping chunks is the sink's
    decision, not the operator's."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select("doc_id", textops.words(F.col("text")).alias("warr"))
    d = d.filter(F.size("warr") > 0).select(
        "doc_id",
        "warr",
        F.explode(
            F.sequence(
                F.lit(0), F.size("warr") - 1, F.lit(CHUNK_STRIDE)
            )
        ).alias("start"),
    )
    chunk = F.slice(F.col("warr"), F.col("start") + 1, CHUNK_W)
    return d.select(
        "doc_id",
        # integer div, not float-divide-then-cast (the engine-portable rule:
        # DuckDB CAST(double) rounds where Spark truncates)
        F.expr(f"start div {CHUNK_STRIDE}").cast("long").alias("chunk_idx"),
        F.col("start").cast("long").alias("start_word"),
        F.least(F.lit(CHUNK_W), F.size("warr") - F.col("start"))
        .cast("long")
        .alias("n_words"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_fp"),
    )


SQL_CHUNKS = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS warr FROM documents
), s AS (
  SELECT doc_id, warr,
         unnest(range(0, len(warr), {CHUNK_STRIDE})) AS start
  FROM w WHERE len(warr) > 0
)
SELECT doc_id,
       CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(start AS BIGINT) AS start_word,
       CAST(least({CHUNK_W}, len(warr) - start) AS BIGINT) AS n_words,
       md5(array_to_string(warr[start + 1 : start + {CHUNK_W}], ' ')) AS chunk_fp
FROM s
"""


def q_star_join_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped multi-way star join: local-supplier revenue per
    nation inside one region and date window. The plan Catalyst should —
    and does — produce: region/nation/supplier/customer broadcast up the
    join tree (no fact-side shuffle for any dimension), the date + region
    predicates pushed into the parquet scans (PushedFilters verified:
    GreaterThanOrEqual/LessThan on o_orderdate reach the orders scan), and
    at 100 TB one SMJ shuffle for the lineitem⋈orders fact-fact equi-join
    (at test SF the filtered orders side fits under the broadcast
    threshold, so the executed plan is ALL BroadcastHashJoin with the
    final rollup as the only exchange — strictly better), plus the
    same-nation (c_nationkey = s_nationkey) constraint applied as a join
    condition, never as a post-join filter over the cross of nations.
    Declarative join order is deliberately 'wrong' (facts first) to let
    the optimizer reorder — the point of the query."""
    # the fact-side scan is the per-core work (BHJ probes + partial agg);
    # a single-row-group file serializes it (see _spread) — the rollup is
    # integer units, so partitioning cannot perturb the result. The
    # per-row work here is hash probes (cheap vs the text regex sweeps),
    # so the spread only pays for itself on a bigger relation (A/B:
    # +0.33s at the 11 MB sf0.1 lineitem, −0.39s at the 108 MB replica).
    li = _spread(_t(spark, sf_dir, "lineitem"), "l_orderkey", min_bytes=32 * 1024 * 1024)
    o = _t(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00' "
            "AND o_orderdate < TIMESTAMP_NTZ '1998-01-01 00:00:00'"
        )
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            # exact integer 1e-4-dollar units: price and discount are both
            # 2-decimal, so cents × (100 - pct) is an exact long and the
            # grouped sum is summation-order-free across engines (a double
            # sum over a large group drifts ~sqrt(n)·eps·|sum| — at corpus
            # scale that reaches the rounding grid). A true 100 TB rollup
            # would lift the sum to decimal(38,0); long covers ~9e18.
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
            ).alias("revenue_e4"),
            F.count("*").alias("n_items"),
        )
    )


SQL_STAR_Q5 = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def q_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation with grouping ids — the OLAP subtotal surface.
    One pass over lineitem: Spark expands the cube grouping sets and the
    partial aggregation still combines map-side before the single shuffle
    (4 grouping sets × |keys| rows, not 4 scans). Revenue is summed in
    exact integer 1e-4-dollar units (2-decimal price × 2-decimal discount):
    the cube's () grouping set sums the ENTIRE table into one group, where
    a double sum's ~sqrt(n)·eps·|sum| summation-order drift reaches the
    0.005 rounding grid at corpus scale and a round-after-sum oracle goes
    latently flaky. grouping_id bit order (first cube column = high bit)
    matches DuckDB's GROUPING(a, b)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
            ).alias("revenue_e4"),
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sum_qty"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


SQL_CUBE = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_e4,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): per-user event counts, one column per event
    type. The pivot values are EXPLICIT — at corpus scale an implicit
    pivot runs a distinct-values job first (a full extra pass); with the
    list given, this is a single combinable groupBy on user_id. DuckDB
    face: FILTER aggregates, count() naturally 0 where Spark's pivot
    yields null (coalesced to match)."""
    ev = _t(spark, sf_dir, "events")
    types = ["view", "click", "purchase", "signup", "error"]
    wide = ev.groupBy("user_id").pivot("event_type", types).agg(
        F.count(F.lit(1))  # count(*) is rejected inside a pivot aggregate
    )
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    )


SQL_PIVOT = """
SELECT user_id,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error
FROM events GROUP BY user_id
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week,
    counted per week-offset of later activity. Three combinable aggregates
    (per-user first week, distinct user-weeks, final cohort rollup) and
    one user_id-keyed join — every shuffle key is user_id or the tiny
    (cohort, offset) pair; nothing quadratic, nothing single-task. Both
    engines truncate weeks to ISO Monday; offsets are integer day-diffs
    div 7, no timezone or float in the arithmetic."""
    ev = _t(spark, sf_dir, "events")
    # weeks stay TIMESTAMP on both faces: a DATE column round-trips as
    # python date objects on the Spark side but datetime64 on the DuckDB
    # side, and the driver's stringified value hash sees different text
    first = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    weeks = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("aw")
    ).distinct()
    j = weeks.join(first, "user_id")
    return (
        j.select(
            "cohort_week",
            F.expr("datediff(aw, cohort_week) div 7").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(F.col("user_id")).alias("n_users"))
    )


SQL_RETENTION = """
WITH f AS (
  SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
), w AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS aw
  FROM events
)
SELECT f.cohort_week,
       datediff('day', f.cohort_week, w.aw) // 7 AS week_offset,
       CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_users
FROM w JOIN f USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Training-data operators: dedup family
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5-fingerprint groupBy; keeper = min doc_id."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_dups"))
    )


SQL_DEDUP_EXACT = """
SELECT md5(text) AS fp, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY md5(text)
"""


JACCARD_DF_CAP = 50  # max docs (within a source) a shingle may appear in
# ~1 in 37 docs gets a deterministic near-dup clone (one appended token →
# Jaccard |S|/(|S|+1) ≥ 0.5 by construction), so the oracle discriminates
# on a double-digit pair set instead of the single organic pair the driver
# corpus happens to contain (round-4 verdict: 1 row is weak evidence).
# Same precedent as _augmented_embeddings_bucketed: the driver tables are
# immutable, so controlled near-dup structure is synthesized identically
# on both engines from the tables themselves.
JACCARD_CLONE_STRIDE = 37


def _augmented_documents_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ deterministic near-dup clones: every doc with
    doc_id % JACCARD_CLONE_STRIDE == 0 reappears as doc_id + 1,000,000 with
    ONE token appended — shared shingles |S|, clone adds exactly one, so
    the pair's Jaccard is |S|/(|S|+1) ≥ 0.5 for any text with ≥ 3 words."""
    base = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    clones = base.filter(
        F.col("doc_id") % JACCARD_CLONE_STRIDE == 0
    ).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "source",
        F.concat(F.col("text"), F.lit(" neardupz")).alias("text"),
    )
    return base.unionByName(clones)


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by word-3-gram Jaccard ≥ 0.5 within the same
    source (shingle equi-join, pair counts vs per-doc shingle counts).

    Hot-shingle cap: a shingle shared by k docs contributes k² join rows, so
    one viral shingle would blow the pair join up quadratically at corpus
    scale. Shingles with document frequency > JACCARD_DF_CAP (within their
    source) are dropped BEFORE the pair join — this can only lower ``inter``
    (never add a false positive). The denominator keeps the full per-doc
    shingle counts.

    KNOWN RECALL LIMIT of the cap (deliberate tradeoff, mirrored exactly in
    the SQL oracle): a duplicate/boilerplate cluster wider than the cap —
    >JACCARD_DF_CAP near-identical docs in one source — makes ALL of its
    shingles viral, so such clusters lose every candidate pair here
    (inter = 0). This operator is the *n-gram* leg of a dedup ensemble, not
    the whole spine: byte-identical wide clusters are caught by
    ``dedup_exact`` (no cap), near-identical wide clusters by
    ``dedup_minhash_lsh`` / ``dedup_simhash_pairs`` (band keys group the
    whole cluster into shared buckets; cost grows with cluster size, not
    with a per-shingle k² blowup)."""
    docs = (
        _augmented_documents_neardup(spark, sf_dir)
        .select("doc_id", "source", F.split("text", " ").alias("w"))
        .select("doc_id", "source", textops.shingles_of_words(F.col("w")).alias("sh"))
    )
    sizes = docs.select("doc_id", F.size("sh").alias("n_sh"))
    ex = docs.select("doc_id", "source", F.explode("sh").alias("shingle"))
    rare = (
        ex.groupBy("source", "shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= JACCARD_DF_CAP)
        .select("source", "shingle")
    )
    kept = ex.join(rare, ["source", "shingle"])
    pairs = (
        kept.alias("a")
        .join(
            kept.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("inter"))
    )
    raw = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "na"), "a_id")
        .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "nb"), "b_id")
        # threshold on the RAW ratio (like the oracle SQL); round only the
        # reported value — boundary pairs must not diverge between engines
        .filter(raw >= 0.5)
        .select("a_id", "b_id", F.round(raw, 6).alias("jaccard"))
    )


SQL_JACCARD = f"""
WITH aug AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, source, text || ' neardupz' AS text
  FROM documents WHERE doc_id % {JACCARD_CLONE_STRIDE} = 0
), sh AS (
  SELECT doc_id, source,
         list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3 THEN
           list_transform(range(1, len(string_split(text, ' ')) - 1),
             i -> string_split(text, ' ')[i] || ' ' ||
                  string_split(text, ' ')[i+1] || ' ' ||
                  string_split(text, ' ')[i+2])
         ELSE [text] END) AS shingles
  FROM aug
), sizes AS (
  SELECT doc_id, len(shingles) AS n_sh FROM sh
), ex AS (
  SELECT doc_id, source, unnest(shingles) AS shingle FROM sh
), rare AS (
  SELECT source, shingle FROM ex GROUP BY source, shingle HAVING count(*) <= 50
), kept AS (
  SELECT ex.doc_id, ex.source, ex.shingle FROM ex JOIN rare USING (source, shingle)
), pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(count(*) AS BIGINT) AS inter
  FROM kept a JOIN kept b
    ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       round(inter / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.5
"""


def minhash_pair_relation(docs: DataFrame, cap: int | None = None) -> DataFrame:
    """(a_id, b_id, a_dups, b_dups) — MinHash-LSH near-dup candidate pairs
    over an arbitrary (doc_id, text) relation, with the two round-5 scale
    bounds applied: exact duplicates collapse to one representative BEFORE
    banding (a k-wide boilerplate cluster costs O(1) banded rows, not O(k)
    rows minting k² in-bucket candidates), and band buckets whose
    representative population exceeds ``cap`` are routed out of the join
    (``textops.cap_band_buckets`` — visible via dedup_band_stats, never
    silent). Output pairs relate DISTINCT texts only; byte-identical
    membership is ``dedup_exact``'s relation (fp → keeper + n_dups) and is
    re-expanded linearly where wanted (clusters, curation). Shared by the
    batch query and the incremental streaming leg."""
    cap = cap if cap is not None else _DEDUP_CFG.band_bucket_cap
    reps = textops.exact_collapse(docs.select("doc_id", "text"))
    return minhash_pairs_from_reps(reps, cap)


def minhash_pairs_from_reps(reps: DataFrame, cap: int | None = None) -> DataFrame:
    """``minhash_pair_relation`` over an ALREADY-collapsed representative
    set — split out so a composed consumer (corpus_curation) can share
    one ``exact_collapse`` between the banding subtree and its own
    exact-duplicate membership logic instead of re-running the md5
    groupBy over the corpus."""
    cap = cap if cap is not None else _DEDUP_CFG.band_bucket_cap
    banded = textops.cap_band_buckets(textops.minhash_band_relation(reps), cap)
    # Lineage cut before the self-join (the dedup_clusters / training_mix
    # precedent): the capped relation feeds BOTH join sides, Spark does no
    # common-subplan elimination, and runtime ReuseExchange is best-effort
    # (CLAUDE.md: fires standalone, not mid-suite) — so without the cut the
    # whole collapse → shingle → md5 → signature → band subtree (the
    # query's entire CPU cost) can evaluate once per side. localCheckpoint
    # converts it to ONE RDD both sides share structurally: the map stages
    # below the band-key exchange run exactly once, guaranteed, and the
    # preserved hash partitioning still feeds the join shuffle-free. The
    # checkpointed relation is the slim (doc_id, n_dups, band_key) rows —
    # never texts, never pairs. (A/B at the 10× corpus: 1.68s → 1.23s;
    # corpus_curation inherits the same cut.) Cluster deployments should
    # point spark.checkpoint.dir at durable storage if they need fault
    # tolerance across the cut.
    banded = banded.localCheckpoint(eager=False)
    return (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.n_dups").alias("a_dups"),
            F.col("b.n_dups").alias("b_dups"),
        )
        .distinct()
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: 8 md5-min signatures, 4 bands × 2
    rows; candidate pairs collide on a band key (one shuffle on the band
    key instead of an all-pairs product). Round-5 hardening: exact
    duplicates are collapsed to representatives before banding and hot
    band buckets are capped — see ``minhash_pair_relation``. a_dups/b_dups
    carry each representative's exact-duplicate multiplicity."""
    return minhash_pair_relation(_t(spark, sf_dir, "documents"))


# the shingle→digest→signature→band CTE chain over the exact-collapsed
# representative set, reused by the minhash oracle, the band-stats oracle
# and the curation oracle (kept as one literal so all three band the same)
_SQL_MINHASH_BANDED = f"""reps AS (
  {textops.SQL_EXACT_COLLAPSE}
), sh AS (
  SELECT doc_id, n_dups,
         list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3 THEN
           list_transform(range(1, len(string_split(text, ' ')) - 1),
             i -> string_split(text, ' ')[i] || ' ' ||
                  string_split(text, ' ')[i+1] || ' ' ||
                  string_split(text, ' ')[i+2])
         ELSE [text] END) AS shingles
  FROM reps
), dg AS (
  SELECT doc_id, n_dups, list_transform(shingles, s -> md5(s)) AS digests FROM sh
), sig AS (
  SELECT doc_id, n_dups,
         [list_min(list_transform(digests, d -> substr(d, 1, 4))),
          list_min(list_transform(digests, d -> substr(d, 5, 4))),
          list_min(list_transform(digests, d -> substr(d, 9, 4))),
          list_min(list_transform(digests, d -> substr(d, 13, 4))),
          list_min(list_transform(digests, d -> substr(d, 17, 4))),
          list_min(list_transform(digests, d -> substr(d, 21, 4))),
          list_min(list_transform(digests, d -> substr(d, 25, 4))),
          list_min(list_transform(digests, d -> substr(d, 29, 4)))] AS sig
  FROM dg
), banded AS (
  SELECT doc_id, n_dups, unnest([
    '0:' || sig[1] || ':' || sig[2],
    '1:' || sig[3] || ':' || sig[4],
    '2:' || sig[5] || ':' || sig[6],
    '3:' || sig[7] || ':' || sig[8]]) AS band_key
  FROM sig
)"""


def sql_dedup_minhash(cap: int | None = None) -> str:
    """DuckDB oracle for ``q_dedup_minhash_lsh``, generated from the same
    ``band_bucket_cap`` the Spark query runs with."""
    cap = cap if cap is not None else _DEDUP_CFG.band_bucket_cap
    return f"""
WITH {_SQL_MINHASH_BANDED}, admitted AS (
  SELECT band_key FROM banded GROUP BY band_key HAVING count(*) <= {cap}
), kept AS (
  SELECT banded.* FROM banded JOIN admitted USING (band_key)
)
SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       a.n_dups AS a_dups, b.n_dups AS b_dups
FROM kept a JOIN kept b
  ON a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


SQL_MINHASH = sql_dedup_minhash(_DEDUP_CFG.band_bucket_cap)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprints (engine-portable nibble voting; one md5
    per token, materialized)."""
    # per-row md5-per-token sweep — spread a narrow scan first (_spread)
    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id",
        textops.md5_digests(F.split("text", " ")).alias("dg"),
    )
    return docs.select("doc_id", textops.simhash16(F.col("dg")).alias("simhash"))


def _simhash_bit_terms(bits: int) -> str:
    """DuckDB twin of textops.simhash: bit j < 32 votes on the top bit of
    md5 nibble j (value ≥ 8); bit j ≥ 32 reuses nibble j−32's second bit
    ((value mod 8) ≥ 4) — two vote bits per nibble, up to 62 bits from one
    digest."""
    terms = []
    for j in range(bits):
        if j < 32:
            pred = f"instr('0123456789abcdef', substr(d, {j + 1}, 1)) >= 9"
        else:
            pred = (
                f"(instr('0123456789abcdef', substr(d, {j - 32 + 1}, 1)) - 1) % 8 >= 4"
            )
        terms.append(
            "(CASE WHEN list_sum(list_transform(dgs, d -> CASE WHEN "
            f"{pred} "
            f"THEN 1 ELSE -1 END)) > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        )
    return " + ".join(terms)


def _simhash_band_terms(bands: int, band_bits: int) -> str:
    """DuckDB twin of textops.simhash_band_keys over a non-negative fp."""
    return ",\n    ".join(
        f"'{b}:' || CAST((fp // {1 << (b * band_bits)}) % {1 << band_bits} AS VARCHAR)"
        for b in range(bands)
    )


SQL_SIMHASH = f"""
WITH dg AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), t -> md5(t)) AS dgs
  FROM documents
)
SELECT doc_id, CAST({_simhash_bit_terms(16)} AS INT) AS simhash
FROM dg
"""


def q_dedup_simhash_pairs(
    spark: SparkSession, sf_dir: str, config: "DedupConfig | None" = None
) -> DataFrame:
    """SimHash near-dup pairs via the banded Hamming-neighbor join, sized
    by plans.config.DedupConfig (default: the CORPUS-SCALE setting —
    128-bit fingerprints as two BIGINT halves, 8 bands × 16 bits, so the
    band-key equi-join keeps d ≤ 7 pigeonhole completeness AND 65k buckets
    per band; at 10^12 docs the old single-BIGINT 8×7 setting had only 128
    buckets per band and went quadratic within buckets). Any two
    fingerprints within Hamming distance bands−1 agree on ≥1 band
    (pigeonhole), so candidates meet in an equi-join on the compact band
    key — one shuffle, never an all-pairs product — and are then verified
    with an exact two-half popcount. The SQL oracle is generated from the
    SAME config values by ``sql_dedup_simhash_pairs``, so ANY setting can
    be paired with its oracle (configs ≤ 62 bits take the legacy
    single-BIGINT path).

    Round-5 hardening (both representations): exact duplicates collapse to
    one representative before fingerprinting (``textops.exact_collapse`` —
    a k-wide boilerplate cluster costs O(1) banded rows, not O(k) rows
    minting k² in-bucket candidates) and band buckets whose representative
    population exceeds ``cfg.band_bucket_cap`` are routed out of the join
    (``textops.cap_band_buckets``; counted by dedup_band_stats.n_over_cap).
    a_dups/b_dups carry the representatives' exact multiplicities.

    Reference analogue: the T6-style near-dup relation
    (/root/reference/ocr/textract/textract.py:120-131) at north-rule
    corpus scale."""
    cfg = config or _DEDUP_CFG
    bits, bands, band_bits = cfg.simhash_bits, cfg.simhash_bands, cfg.simhash_band_bits
    reps = textops.exact_collapse(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    # width pin before the per-token md5 sweep + 128 vote aggregates —
    # see textops.pin_width (AQE size-coalesce is blind to per-row CPU)
    docs = textops.pin_width(reps, "doc_id").select(
        "doc_id", "n_dups", textops.md5_digests(F.split("text", " ")).alias("dg")
    )
    if bits <= 62:
        fp = docs.select(
            "doc_id", "n_dups", textops.simhash(F.col("dg"), bits).alias("fp")
        )
        banded = fp.select(
            "doc_id", "n_dups", "fp",
            # explode_outer: see q_dedup_minhash_lsh — keeps the inferred
            # size()>0 filter from inlining the 56-aggregate fingerprint
            F.explode_outer(
                textops.simhash_band_keys(F.col("fp"), bands=bands, band_bits=band_bits)
            ).alias("bk"),
        )
        banded = textops.cap_band_buckets(banded, cfg.band_bucket_cap, "bk")
        cand = (
            banded.alias("a")
            .join(
                banded.alias("b"),
                (F.col("a.bk") == F.col("b.bk")) & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("a_id"),
                F.col("b.doc_id").alias("b_id"),
                F.col("a.n_dups").alias("a_dups"),
                F.col("b.n_dups").alias("b_dups"),
                F.col("a.fp").alias("fa"),
                F.col("b.fp").alias("fb"),
            )
            .distinct()
        )
        ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).cast("int")
        return cand.select(
            "a_id", "b_id", "a_dups", "b_dups", ham.alias("hamming")
        ).filter(F.col("hamming") <= bands - 1)

    # wide path: > 62 bits can't live in one signed BIGINT — band values
    # come out of ONE aggregate pass, band keys are derived BEFORE packing
    # (no shift arithmetic ever touches a possibly-negative half), and the
    # exact verify popcounts the two halves
    packed = _simhash_wide_packed(docs, bands, band_bits, extra=("n_dups",))
    # explode_outer: the inferred size()>0 filter would otherwise push
    # below the packing projects, inlining the vote aggregate ~16×/row
    banded = packed.select(
        "doc_id", "n_dups", "lo", "hi", F.explode_outer("keys").alias("bk")
    )
    banded = textops.cap_band_buckets(banded, cfg.band_bucket_cap, "bk")
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.bk") == F.col("b.bk")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.n_dups").alias("a_dups"),
            F.col("b.n_dups").alias("b_dups"),
            F.col("a.lo").alias("a_lo"), F.col("a.hi").alias("a_hi"),
            F.col("b.lo").alias("b_lo"), F.col("b.hi").alias("b_hi"),
        )
        .distinct()
    )
    ham = textops.hamming_two_bigint(
        F.col("a_lo"), F.col("a_hi"), F.col("b_lo"), F.col("b_hi")
    )
    return cand.select(
        "a_id", "b_id", "a_dups", "b_dups", ham.alias("hamming")
    ).filter(F.col("hamming") <= bands - 1)


def _simhash_wide_packed(
    docs: DataFrame, bands: int, band_bits: int, extra: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, *extra, lo, hi, keys) — the two-BIGINT-half wide
    fingerprint relation over a materialized ``dg`` md5-digest column
    (shared by the pairs query and the band-stats metrics); ``extra``
    names passthrough columns (e.g. the exact-collapse multiplicity).
    Band values are materialized as real columns between the aggregate and
    the packing so the one aggregate pass runs exactly once per row
    (CollapseProject keeps a multi-referenced non-trivial alias in its own
    Project)."""
    assert bands % 2 == 0 and (bands // 2) * band_bits <= 64, (bands, band_bits)
    half = bands // 2
    bv = docs.select(
        "doc_id",
        *extra,
        textops.simhash_wide_band_values(F.col("dg"), bands, band_bits).alias("bv"),
    )
    # coalesce makes the band columns (hence lo/hi) provably NON-NULLABLE:
    # otherwise InferFiltersFromConstraints adds isnotnull(lo/hi) under the
    # downstream join and predicate pushdown substitutes the full vote
    # aggregate into that filter — ~12 inlined copies evaluated per row
    # (bv is never null for a non-null text, so this is a no-op at runtime)
    bcols = bv.select(
        "doc_id",
        *extra,
        *[
            F.coalesce(F.element_at("bv", b + 1), F.lit(0).cast("long")).alias(f"_b{b}")
            for b in range(bands)
        ],
    )
    return bcols.select(
        "doc_id",
        *extra,
        textops.pack_band_half(
            [F.col(f"_b{b}") for b in range(half)], band_bits
        ).alias("lo"),
        textops.pack_band_half(
            [F.col(f"_b{b}") for b in range(half, bands)], band_bits
        ).alias("hi"),
        textops.band_keys_from_values(
            [F.col(f"_b{b}") for b in range(bands)]
        ).alias("keys"),
    )


def _simhash_wide_band_term(b: int, band_bits: int) -> str:
    """DuckDB twin of ONE band value under the wide vote scheme
    (textops.simhash_wide_band_values: fingerprint bit j votes on bit
    (j mod 4) of md5 nibble (j div 4))."""
    terms = []
    for k in range(band_bits):
        j = b * band_bits + k
        nib, bitk = j // 4, j % 4
        pred = (
            f"((instr('0123456789abcdef', substr(d, {nib + 1}, 1)) - 1) "
            f"// {1 << bitk}) % 2 = 1"
        )
        terms.append(
            "(CASE WHEN list_sum(list_transform(dgs, d -> CASE WHEN "
            f"{pred} THEN 1 ELSE -1 END)) > 0 "
            f"THEN CAST({1 << k} AS BIGINT) ELSE 0 END)"
        )
    return " + ".join(terms)


def _sql_pack_half(band_cols: list[str], band_bits: int) -> str:
    """DuckDB twin of textops.pack_band_half: little-endian band packing
    with the top band sign-adjusted before a shift-by-multiply (DuckDB
    refuses ``<<`` past bit 62; (b − 2^bb)·2^shift is the identical
    two's-complement bit pattern and never overflows a signed multiply)."""
    total = len(band_cols) * band_bits
    assert total <= 64
    parts = [f"CAST({band_cols[0]} AS BIGINT)"]
    for i, c in enumerate(band_cols[1:], start=1):
        shift = i * band_bits
        if shift + band_bits == 64:
            adj = (
                f"(CASE WHEN {c} >= {1 << (band_bits - 1)} "
                f"THEN {c} - {1 << band_bits} ELSE {c} END)"
            )
        else:
            adj = c
        parts.append(f"(CAST({adj} AS BIGINT) * {1 << shift})")
    return " | ".join(parts)


def sql_dedup_simhash_pairs(cfg: "DedupConfig | None" = None) -> str:
    """Generate the DuckDB oracle for ``q_dedup_simhash_pairs`` from the
    SAME config the Spark query runs with — any setting gets matching
    oracle coverage (the round-3 advice: the oracle used to be frozen at
    import time from the default config). Configs ≤ 62 bits emit the
    legacy single-BIGINT twin; wider ones the two-BIGINT-half twin."""
    cfg = cfg or _DEDUP_CFG
    bits, bands, band_bits = cfg.simhash_bits, cfg.simhash_bands, cfg.simhash_band_bits
    cap = cfg.band_bucket_cap
    if bits <= 62:
        return f"""
WITH reps AS (
  {textops.SQL_EXACT_COLLAPSE}
), dg AS (
  SELECT doc_id, n_dups,
         list_transform(string_split(text, ' '), t -> md5(t)) AS dgs
  FROM reps
), fp AS (
  SELECT doc_id, n_dups, CAST({_simhash_bit_terms(bits)} AS BIGINT) AS fp
  FROM dg
), banded AS (
  SELECT doc_id, n_dups, fp, unnest([
    {_simhash_band_terms(bands, band_bits)}]) AS bk
  FROM fp
), admitted AS (
  SELECT bk FROM banded GROUP BY bk HAVING count(*) <= {cap}
), kept AS (
  SELECT banded.* FROM banded JOIN admitted USING (bk)
), cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         a.n_dups AS a_dups, b.n_dups AS b_dups, a.fp AS fa, b.fp AS fb
  FROM kept a JOIN kept b ON a.bk = b.bk AND a.doc_id < b.doc_id
)
SELECT a_id, b_id, a_dups, b_dups,
       CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(fa, fb)) <= {bands - 1}
"""
    assert bands % 2 == 0 and (bands // 2) * band_bits <= 64, cfg
    half = bands // 2
    band_defs = ",\n         ".join(
        f"({_simhash_wide_band_term(b, band_bits)}) AS b{b}" for b in range(bands)
    )
    keys = ",\n    ".join(f"'{b}:' || CAST(b{b} AS VARCHAR)" for b in range(bands))
    lo = _sql_pack_half([f"b{b}" for b in range(half)], band_bits)
    hi = _sql_pack_half([f"b{b}" for b in range(half, bands)], band_bits)
    ham = "bit_count(xor(a_lo, b_lo)) + bit_count(xor(a_hi, b_hi))"
    return f"""
WITH reps AS (
  {textops.SQL_EXACT_COLLAPSE}
), dg AS (
  SELECT doc_id, n_dups,
         list_transform(string_split(text, ' '), t -> md5(t)) AS dgs
  FROM reps
), bands AS (
  SELECT doc_id, n_dups,
         {band_defs}
  FROM dg
), fp AS (
  SELECT doc_id, n_dups, {lo} AS lo, {hi} AS hi,
         [{keys}] AS keys
  FROM bands
), banded AS (
  SELECT doc_id, n_dups, lo, hi, unnest(keys) AS bk FROM fp
), admitted AS (
  SELECT bk FROM banded GROUP BY bk HAVING count(*) <= {cap}
), kept AS (
  SELECT banded.* FROM banded JOIN admitted USING (bk)
), cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         a.n_dups AS a_dups, b.n_dups AS b_dups,
         a.lo AS a_lo, a.hi AS a_hi, b.lo AS b_lo, b.hi AS b_hi
  FROM kept a JOIN kept b ON a.bk = b.bk AND a.doc_id < b.doc_id
)
SELECT a_id, b_id, a_dups, b_dups, CAST({ham} AS INT) AS hamming
FROM cand WHERE {ham} <= {bands - 1}
"""


SQL_SIMHASH_PAIRS = sql_dedup_simhash_pairs(_DEDUP_CFG)


def dedup_band_stats_relation(
    spark: SparkSession, sf_dir: str, config: "DedupConfig | None" = None
) -> DataFrame:
    """The band-stats relation for a given config (the query face below
    runs it at the default). The simhash leg mirrors the pairs query's
    representation branch — legacy single-BIGINT banding for configs ≤ 62
    bits, wide two-half banding otherwise — so these metrics always
    describe the SAME bucket distribution the pairs join shuffles on
    (round-4 advice: deriving stats from the wide scheme unconditionally
    would mis-describe a narrowed config and hit the wide path's
    bands%2==0 assert)."""
    cfg = config or _DEDUP_CFG
    cap = cfg.band_bucket_cap
    reps = textops.exact_collapse(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    docs = reps.select(
        "doc_id", textops.md5_digests(F.split("text", " ")).alias("dg")
    )
    if cfg.simhash_bits <= 62:
        fp = docs.select(
            "doc_id", textops.simhash(F.col("dg"), cfg.simhash_bits).alias("fp")
        )
        sim_banded = fp.select(
            F.explode_outer(
                textops.simhash_band_keys(
                    F.col("fp"),
                    bands=cfg.simhash_bands,
                    band_bits=cfg.simhash_band_bits,
                )
            ).alias("bk")
        )
    else:
        sim_banded = _simhash_wide_packed(
            docs, cfg.simhash_bands, cfg.simhash_band_bits
        ).select(F.explode_outer("keys").alias("bk"))
    sim = textops.band_population_stats(sim_banded, "simhash", cap=cap)

    mh_banded = textops.minhash_band_relation(reps).select(
        F.col("band_key").alias("bk")
    )
    mh = textops.band_population_stats(mh_banded, "minhash", cap=cap)

    emb_banded = _augmented_embeddings_bucketed(spark, sf_dir).select(
        F.concat_ws(
            ":", F.lit("0"), F.col("label").cast("string"),
            F.col("_bucket").cast("string"),
        ).alias("bk")
    )
    emb = textops.band_population_stats(emb_banded, "embedding", cap=cap)

    return sim.unionByName(mh).unionByName(emb)


def q_dedup_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-population skew metrics for EVERY banded dedup family
    (simhash bands, minhash LSH bands, embedding sign-buckets) — the 'no
    silent caps' surface: the max bucket population is exactly what goes
    quadratic in each family's band-key self-join, so a skewed corpus is
    visible in this metrics table BEFORE it is slow. One row per
    (family, band): bucket count, max population, total banded rows, and
    n_over_cap — how many buckets the ``band_bucket_cap`` routing drops
    from the pair join (the cap's recall cost as a metric, never a silent
    truncation). Round-5: the text-family stats run over the SAME
    exact-collapsed representative relation the pairs joins consume, so
    max_bucket is exactly the quantity the cap bounds; byte-identical
    duplication skew lives in ``dedup_exact.n_dups``. Never materializes
    candidate pairs — two compact-key partial-agg shuffles per family
    (textops.band_population_stats)."""
    return dedup_band_stats_relation(spark, sf_dir)


def _sql_band_stats(family: str, banded_cte: str) -> str:
    return f"""
  SELECT '{family}' AS family,
         CAST(string_split(bk, ':')[1] AS INT) AS band,
         count(*) AS n_buckets,
         max(n) AS max_bucket,
         CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN n > {_DEDUP_CFG.band_bucket_cap} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_over_cap
  FROM (SELECT bk, count(*) AS n FROM {banded_cte} GROUP BY bk)
  GROUP BY band"""


SQL_BAND_STATS = f"""
WITH reps AS (
  {textops.SQL_EXACT_COLLAPSE}
), dg AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), t -> md5(t)) AS dgs
  FROM reps
), simbands AS (
  SELECT doc_id,
         {",".join(f"({_simhash_wide_band_term(b, _DEDUP_CFG.simhash_band_bits)}) AS b{b}" for b in range(_DEDUP_CFG.simhash_bands))}
  FROM dg
), sim_banded AS (
  SELECT unnest([
    {",".join(f"'{b}:' || CAST(b{b} AS VARCHAR)" for b in range(_DEDUP_CFG.simhash_bands))}]) AS bk
  FROM simbands
), sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3 THEN
           list_transform(range(1, len(string_split(text, ' ')) - 1),
             i -> string_split(text, ' ')[i] || ' ' ||
                  string_split(text, ' ')[i+1] || ' ' ||
                  string_split(text, ' ')[i+2])
         ELSE [text] END) AS shingles
  FROM reps
), mhdg AS (
  SELECT doc_id, list_transform(shingles, s -> md5(s)) AS digests FROM sh
), sig AS (
  SELECT doc_id,
         [list_min(list_transform(digests, d -> substr(d, 1, 4))),
          list_min(list_transform(digests, d -> substr(d, 5, 4))),
          list_min(list_transform(digests, d -> substr(d, 9, 4))),
          list_min(list_transform(digests, d -> substr(d, 13, 4))),
          list_min(list_transform(digests, d -> substr(d, 17, 4))),
          list_min(list_transform(digests, d -> substr(d, 21, 4))),
          list_min(list_transform(digests, d -> substr(d, 25, 4))),
          list_min(list_transform(digests, d -> substr(d, 29, 4)))] AS sig
  FROM mhdg
), mh_banded AS (
  SELECT unnest([
    '0:' || sig[1] || ':' || sig[2],
    '1:' || sig[3] || ':' || sig[4],
    '2:' || sig[5] || ':' || sig[6],
    '3:' || sig[7] || ':' || sig[8]]) AS bk
  FROM sig
), base AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), clones AS (
  SELECT vec_id + 100000 AS vec_id, label,
         list_transform(v, (x, i) -> CASE WHEN i = 1 THEN x * 1.02 ELSE x END) AS v
  FROM base WHERE vec_id % 5 = 0
), aug AS (
  SELECT * FROM base UNION ALL SELECT * FROM clones
), planes AS (
  SELECT p.plane, j.j,
         ((p.plane * 8191 + j.j * 127 + 13) * 2654435761) % 1000 / 1000.0 - 0.5
           AS comp
  FROM (SELECT unnest(range(0, 8)) AS plane) p,
       (SELECT unnest(range(0, 64)) AS j) j
), vecs AS (
  SELECT vec_id, generate_subscripts(v, 1) - 1 AS j, unnest(v) AS x FROM aug
), proj AS (
  SELECT vec_id, plane, sum(x * comp) AS dotp
  FROM vecs JOIN planes ON vecs.j = planes.j
  GROUP BY vec_id, plane
), buckets AS (
  SELECT vec_id, CAST(sum(CASE WHEN round(dotp, 6) > 0 THEN 1 << plane ELSE 0 END) AS INT)
           AS bucket
  FROM proj GROUP BY vec_id
), emb_banded AS (
  SELECT '0:' || CAST(label AS VARCHAR) || ':' || CAST(bucket AS VARCHAR) AS bk
  FROM aug JOIN buckets USING (vec_id)
)
{_sql_band_stats("simhash", "sim_banded")}
UNION ALL
{_sql_band_stats("minhash", "mh_banded")}
UNION ALL
{_sql_band_stats("embedding", "emb_banded")}
"""


def q_p7_downscale_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 size-budget loop (reference applyocr.py:34-49) as pure column
    math over synthesized media metadata: number of ×2 downscales needed to
    fit the 10MB budget (≤10 iterations), and the skip flag for items that
    still don't fit — the relational face of functions/multimodal.
    downscale_oversized."""
    from swissgeol_ocr_spark.functions.multimodal import downscale_oversized

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.concat(F.lit("m-"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("image").alias("kind"),
        F.lit(None).cast("binary").alias("payload"),
        F.struct(
            F.lit("jpg").alias("format"),
            F.lit(1000).alias("width"),
            F.lit(800).alias("height"),
            ((F.col("n_chars") + 1) * ((F.col("doc_id") % 997) * 131072 + 1)).alias("n_bytes"),
            F.lit(0).cast("bigint").alias("duration_ms"),
        ).alias("meta"),
    )
    out = downscale_oversized(media)
    return out.select(
        "media_ref",
        F.col("meta.n_bytes").alias("n_bytes"),
        "downscale_iters",
        "skip_oversized",
        "eff_width",
        "eff_height",
    )


SQL_P7 = """
WITH m AS (
  SELECT 'm-' || CAST(doc_id AS VARCHAR) AS media_ref,
         CAST((n_chars + 1) * ((doc_id % 997) * 131072 + 1) AS BIGINT) AS n_bytes
  FROM documents
), k0 AS (
  SELECT media_ref, n_bytes,
         CAST(greatest(0, least(10,
             CAST(ceil(log(4.0, n_bytes / 10485760.0)) AS INT))) AS INT) AS ke
  FROM m
), k AS (
  -- boundary correction: smallest k with n/4^k STRICTLY below the budget
  SELECT media_ref, n_bytes,
         CASE WHEN ke < 10 AND n_bytes / pow(4.0, ke) >= 10485760.0
              THEN ke + 1 ELSE ke END AS downscale_iters
  FROM k0
)
SELECT media_ref, n_bytes, downscale_iters,
       NOT (n_bytes / pow(4.0, downscale_iters) < 10485760.0) AS skip_oversized,
       CAST(floor(1000 / pow(2.0, downscale_iters)) AS INT) AS eff_width,
       CAST(floor(800 / pow(2.0, downscale_iters)) AS INT) AS eff_height
FROM k
"""


def q_p6_crop_accept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 crop-to-page cost rule (reference crop.py:85-123): crop each
    image to its visible region, accept only if ≥20% smaller. Media +
    visible rects synthesized deterministically from ``documents``; the
    accept/skip decision is functions/multimodal.crop_to_visible."""
    from swissgeol_ocr_spark.functions.multimodal import crop_to_visible

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.concat(F.lit("m-"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("image").alias("kind"),
        F.lit(None).cast("binary").alias("payload"),
        F.struct(
            F.lit("jpg").alias("format"),
            (F.col("doc_id") % 900 + 100).cast("int").alias("width"),
            (F.col("doc_id") % 700 + 100).cast("int").alias("height"),
            ((F.col("n_chars") + 1) * 4096).cast("bigint").alias("n_bytes"),
            F.lit(0).cast("bigint").alias("duration_ms"),
        ).alias("meta"),
        # visible region: deterministic sub-rect (sometimes nearly the whole
        # image → crop rejected; sometimes a corner → accepted)
        (F.col("doc_id") % 37).cast("double").alias("vx0"),
        (F.col("doc_id") % 23).cast("double").alias("vy0"),
        ((F.col("doc_id") % 900 + 100) * (F.lit(0.35) + (F.col("doc_id") % 13).cast("double") / 20.0)).alias("vx1"),
        ((F.col("doc_id") % 700 + 100) * (F.lit(0.35) + (F.col("doc_id") % 11).cast("double") / 16.0)).alias("vy1"),
    )
    out = crop_to_visible(media)
    return out.select(
        "media_ref", "crop_w", "crop_h", "est_bytes", "crop_accepted",
        "eff_width", "eff_height", "eff_bytes",
    )


SQL_P6 = """
WITH m AS (
  SELECT 'm-' || CAST(doc_id AS VARCHAR) AS media_ref,
         CAST(doc_id % 900 + 100 AS INT) AS w,
         CAST(doc_id % 700 + 100 AS INT) AS h,
         CAST((n_chars + 1) * 4096 AS BIGINT) AS n,
         CAST(doc_id % 37 AS DOUBLE) AS vx0,
         CAST(doc_id % 23 AS DOUBLE) AS vy0,
         (doc_id % 900 + 100) * (0.35 + (doc_id % 13) / 20.0) AS vx1,
         (doc_id % 700 + 100) * (0.35 + (doc_id % 11) / 16.0) AS vy1
  FROM documents
), c AS (
  SELECT media_ref, w, h, n,
         greatest(0, CAST(ceil(least(CAST(w AS DOUBLE), vx1)) AS INT)
                   - CAST(floor(greatest(0.0, vx0)) AS INT)) AS crop_w,
         greatest(0, CAST(ceil(least(CAST(h AS DOUBLE), vy1)) AS INT)
                   - CAST(floor(greatest(0.0, vy0)) AS INT)) AS crop_h
  FROM m
), e AS (
  SELECT *, CAST(floor(n * CAST(crop_w * crop_h AS DOUBLE)
                         / CAST(w * h AS DOUBLE)) AS BIGINT) AS est_bytes
  FROM c
)
SELECT media_ref, crop_w, crop_h, est_bytes,
       (crop_w > 0 AND crop_h > 0 AND NOT (est_bytes > 0.8 * n)) AS crop_accepted,
       CASE WHEN crop_w > 0 AND crop_h > 0 AND NOT (est_bytes > 0.8 * n)
            THEN crop_w ELSE w END AS eff_width,
       CASE WHEN crop_w > 0 AND crop_h > 0 AND NOT (est_bytes > 0.8 * n)
            THEN crop_h ELSE h END AS eff_height,
       CASE WHEN crop_w > 0 AND crop_h > 0 AND NOT (est_bytes > 0.8 * n)
            THEN est_bytes ELSE n END AS eff_bytes
FROM e
"""


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-pixel media features: decode the corpus's codec-free Netpbm
    rasters (P6/PPM RGB, P5/PGM stencil) inside the mapInPandas kernel,
    invert stencils first (P8, reference crop.py:187-190), and reduce the
    actual pixel bytes to per-image statistics. The DuckDB oracle
    reconstructs the same raster byte stream in closed form (substring/
    repeat/ascii arithmetic over the deterministic generator) and reduces
    it relationally — a hash match means the decode → invert → reduce path
    produced exactly the right pixels."""
    from swissgeol_ocr_spark.functions.multimodal import extract_media_features
    from swissgeol_ocr_spark.sources.corpus import media_table_from_documents

    media = media_table_from_documents(_t(spark, sf_dir, "documents"))
    feats = extract_media_features(media.filter(F.col("kind") == "image"))
    return feats.select(
        "media_ref", "doc_id", "is_stencil", "px_w", "px_h",
        "n_samples", "sum_px", "min_px", "max_px", "n_dark", "mean_px",
    )


SQL_MEDIA_FEATURES = """
WITH m AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':media'), 1, 8)
              AS BIGINT) AS h
  FROM documents
), img AS (
  SELECT doc_id, text, h,
         CAST(h % 13 + 4 AS INT) AS px_w,
         CAST(h % 7 + 3 AS INT) AS px_h,
         (h % 7 = 0) AS is_stencil,
         CASE WHEN h % 7 = 0 THEN 1 ELSE 3 END AS depth
  FROM m WHERE h % 3 = 0
), body AS (
  SELECT doc_id, px_w, px_h, is_stencil,
         substr(repeat(regexp_replace(text, '[^ -~]', '?', 'g') || ' ',
                       CAST(ceil(432.0 / (length(regexp_replace(text, '[^ -~]', '?', 'g')) + 1)) AS INT) + 1),
                1, px_w * px_h * depth) AS s
  FROM img
), px AS (
  SELECT doc_id, px_w, px_h, is_stencil,
         list_transform(string_split(s, ''),
             c -> CASE WHEN is_stencil THEN 255 - ascii(c) ELSE ascii(c) END)
           AS codes
  FROM body
)
SELECT 'media-' || doc_id AS media_ref, doc_id, is_stencil, px_w, px_h,
       CAST(len(codes) AS BIGINT) AS n_samples,
       CAST(list_sum(codes) AS BIGINT) AS sum_px,
       CAST(list_min(codes) AS INT) AS min_px,
       CAST(list_max(codes) AS INT) AS max_px,
       CAST(len(list_filter(codes, c -> c < 64)) AS BIGINT) AS n_dark,
       floor(list_sum(codes) * 1000000.0 / len(codes)) / 1000000.0 AS mean_px
FROM px
"""


def q_media_downscale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-pixel half-resolution resize composed with feature extraction:
    ``extract_media_features(downscale_media(images))`` — the pixel leg of
    the P7 budget loop (reference crop.py:145-180 halves with
    ``img.resize((w//2, h//2))``; here stride-2 sampling over the decoded
    raster, re-encoded and re-decoded). The oracle reconstructs the same
    byte stream and applies the identical stride-2 index filter
    relationally, so a hash match proves the resize produced exactly the
    right pixels."""
    from swissgeol_ocr_spark.functions.multimodal import (
        downscale_media,
        extract_media_features,
    )
    from swissgeol_ocr_spark.sources.corpus import media_table_from_documents

    media = media_table_from_documents(_t(spark, sf_dir, "documents"))
    feats = extract_media_features(
        downscale_media(media.filter(F.col("kind") == "image"))
    )
    return feats.select(
        "media_ref", "doc_id", "is_stencil", "px_w", "px_h",
        "n_samples", "sum_px", "min_px", "max_px", "n_dark", "mean_px",
    )


SQL_MEDIA_DOWNSCALE = """
WITH m AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':media'), 1, 8)
              AS BIGINT) AS h
  FROM documents
), img AS (
  SELECT doc_id, text, h,
         CAST(h % 13 + 4 AS INT) AS pw,
         CAST(h % 7 + 3 AS INT) AS ph,
         (h % 7 = 0) AS is_stencil,
         CASE WHEN h % 7 = 0 THEN 1 ELSE 3 END AS depth
  FROM m WHERE h % 3 = 0
), body AS (
  SELECT doc_id, pw, ph, is_stencil, depth,
         substr(repeat(regexp_replace(text, '[^ -~]', '?', 'g') || ' ',
                       CAST(ceil(432.0 / (length(regexp_replace(text, '[^ -~]', '?', 'g')) + 1)) AS INT) + 1),
                1, pw * ph * depth) AS s
  FROM img
), px AS (
  -- stride-2 sample: keep sample i (1-based) whose pixel lands on an even
  -- row/col inside the floor-halved extent (pixel = (i-1)//depth,
  -- row = pixel//pw, col = pixel%pw)
  SELECT doc_id, pw, ph, is_stencil, depth,
         list_transform(
           list_filter(string_split(s, ''),
             (c, i) -> ((i - 1) // depth // pw) % 2 = 0
                   AND ((i - 1) // depth // pw) < 2 * (ph // 2)
                   AND ((i - 1) // depth % pw) % 2 = 0
                   AND ((i - 1) // depth % pw) < 2 * (pw // 2)),
           c -> CASE WHEN is_stencil THEN 255 - ascii(c) ELSE ascii(c) END)
           AS codes
  FROM body
)
SELECT 'media-' || doc_id AS media_ref, doc_id, is_stencil,
       CAST(pw // 2 AS INT) AS px_w, CAST(ph // 2 AS INT) AS px_h,
       CAST(len(codes) AS BIGINT) AS n_samples,
       CAST(list_sum(codes) AS BIGINT) AS sum_px,
       CAST(list_min(codes) AS INT) AS min_px,
       CAST(list_max(codes) AS INT) AS max_px,
       CAST(len(list_filter(codes, c -> c < 64)) AS BIGINT) AS n_dark,
       floor(list_sum(codes) * 1000000.0 / len(codes)) / 1000000.0 AS mean_px
FROM px
"""


def q_media_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 format normalization (reference crop.py:126-142: viewer-hostile
    JPX/JP2 re-encoded to JPG) as an oracled relational face."""
    from swissgeol_ocr_spark.functions.multimodal import normalize_media
    from swissgeol_ocr_spark.sources.corpus import media_table_from_documents

    media = media_table_from_documents(_t(spark, sf_dir, "documents"))
    return normalize_media(media).select(
        "media_ref",
        "kind",
        F.col("meta.format").alias("norm_format"),
    )


SQL_MEDIA_NORMALIZE = """
WITH m AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':media'), 1, 8)
              AS BIGINT) AS h
  FROM documents
)
SELECT 'media-' || doc_id AS media_ref,
       CASE WHEN h % 3 = 0 THEN 'image'
            WHEN h % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       CASE WHEN h % 5 IN (0, 1) THEN 'jpg'
            WHEN h % 5 = 2 THEN 'jpg'
            WHEN h % 5 = 3 THEN 'png' ELSE 'mp4' END AS norm_format
FROM m
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame offset (an
    explode over a generated sequence — frames inherit the media row's
    partition, no shuffle)."""
    from swissgeol_ocr_spark.functions.multimodal import sample_frames
    from swissgeol_ocr_spark.sources.corpus import media_table_from_documents

    media = media_table_from_documents(_t(spark, sf_dir, "documents"))
    return sample_frames(media, every_ms=1000).select(
        "media_ref", "doc_id", F.col("frame_offset_ms").cast("bigint").alias("frame_offset_ms")
    )


SQL_FRAME_SAMPLE = """
WITH m AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':media'), 1, 8)
              AS BIGINT) AS h
  FROM documents
), v AS (
  SELECT doc_id, h % 60000 + 1000 AS duration_ms FROM m WHERE h % 3 = 2
)
SELECT 'media-' || doc_id AS media_ref, doc_id,
       CAST(unnest(range(0, duration_ms, 1000)) AS BIGINT) AS frame_offset_ms
FROM v
"""


def q_c6_spatial_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 mask suppression as a relational spatial anti-join: candidate
    rects that do NOT intersect any keep-out rect (the reference's
    mask.intersects test, applyocr.py:109 / util.py:53-66, open-interval
    overlap semantics). Rects synthesized deterministically from ``part``:
    a 50×40 grid (stride 20/25) of 30×40 rects — wider/taller than the
    stride, so keep-outs block NEIGHBORING cells too and the overlap
    predicate is exercised in both dimensions. Keep-outs are the sparse
    p_size = 50 slice (~2%), so the survivor set is NONZERO at every SF
    (an empty↔empty hash match could not distinguish a correct anti-join
    from a broken predicate — round-3 verdict) while still blocking a
    nonzero share of candidates (5/109 at sf0.001, 449/962 at sf0.01,
    9569/9620 at sf0.1)."""
    part = _t(spark, sf_dir, "part")
    rect = lambda df: df.select(
        "p_partkey",
        ((F.col("p_partkey") % 50) * 20).cast("double").alias("x0"),
        ((F.col("p_partkey") % 40) * 25).cast("double").alias("y0"),
        ((F.col("p_partkey") % 50) * 20 + 30).cast("double").alias("x1"),
        ((F.col("p_partkey") % 40) * 25 + 40).cast("double").alias("y1"),
    )
    cand = rect(part.filter(F.col("p_size") < 25))
    keep_out = rect(part.filter(F.col("p_size") >= 50)).select(
        F.col("x0").alias("kx0"), F.col("y0").alias("ky0"),
        F.col("x1").alias("kx1"), F.col("y1").alias("ky1"),
    ).distinct()
    overlap = (
        (F.col("x0") < F.col("kx1")) & (F.col("kx0") < F.col("x1"))
        & (F.col("y0") < F.col("ky1")) & (F.col("ky0") < F.col("y1"))
    )
    return cand.join(F.broadcast(keep_out), overlap, "left_anti").select(
        "p_partkey", "x0", "y0", "x1", "y1"
    )


SQL_C6 = """
WITH r AS (
  SELECT p_partkey, p_size,
         CAST((p_partkey % 50) * 20 AS DOUBLE) AS x0,
         CAST((p_partkey % 40) * 25 AS DOUBLE) AS y0,
         CAST((p_partkey % 50) * 20 + 30 AS DOUBLE) AS x1,
         CAST((p_partkey % 40) * 25 + 40 AS DOUBLE) AS y1
  FROM part
), cand AS (SELECT * FROM r WHERE p_size < 25),
keep_out AS (SELECT DISTINCT x0 kx0, y0 ky0, x1 kx1, y1 ky1 FROM r WHERE p_size >= 50)
SELECT p_partkey, x0, y0, x1, y1 FROM cand
WHERE NOT EXISTS (
  SELECT 1 FROM keep_out
  WHERE cand.x0 < kx1 AND kx0 < cand.x1 AND cand.y0 < ky1 AND ky0 < cand.y1
)
"""


def _augmented_embeddings_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings + the deterministic near-dup clone set, sign-hyperplane
    bucketed (shared by the cosine near-dup query and the band-stats
    metrics so both see the same join-key distribution)."""
    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    clones = base.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        "label",
        F.transform(
            "embedding", lambda x, j: F.when(j == 0, x * 1.02).otherwise(x)
        ).alias("embedding"),
    )
    aug = base.unionByName(clones)
    return aug.withColumn("_bucket", simsearch.lsh_bucket(F.col("embedding"), 8))


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed: candidates must share
    (label, sign-hyperplane bucket) — an equi-join on a compact key, NEVER
    the O(n²)-per-label all-pairs product of round 1 — then exact cosine
    rescoring keeps pairs ≥ 0.95.

    The raw table has no near-duplicates (max within-label cosine ≈ 0.47),
    so a deterministic clone set (every vec_id % 5 == 0, first component
    × 1.02 → cosine ≈ 0.9998) is planted identically in both engines,
    making the check exercise bucket collision + rescoring for real."""
    bkt = _augmented_embeddings_bucketed(spark, sf_dir)
    pairs = bkt.alias("a").join(
        bkt.alias("b"),
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a._bucket") == F.col("b._bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    sim = F.round(simsearch.cosine(F.col("a.embedding"), F.col("b.embedding")), 6)
    return (
        pairs.select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.95)
    )


SQL_DEDUP_EMBED = """
WITH base AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), clones AS (
  SELECT vec_id + 100000 AS vec_id, label,
         list_transform(v, (x, i) -> CASE WHEN i = 1 THEN x * 1.02 ELSE x END) AS v
  FROM base WHERE vec_id % 5 = 0
), aug AS (
  SELECT * FROM base UNION ALL SELECT * FROM clones
), planes AS (
  SELECT p.plane, j.j,
         ((p.plane * 8191 + j.j * 127 + 13) * 2654435761) % 1000 / 1000.0 - 0.5
           AS comp
  FROM (SELECT unnest(range(0, 8)) AS plane) p,
       (SELECT unnest(range(0, 64)) AS j) j
), vecs AS (
  SELECT vec_id, generate_subscripts(v, 1) - 1 AS j, unnest(v) AS x FROM aug
), proj AS (
  SELECT vec_id, plane, sum(x * comp) AS dotp
  FROM vecs JOIN planes ON vecs.j = planes.j
  GROUP BY vec_id, plane
), buckets AS (
  SELECT vec_id, CAST(sum(CASE WHEN round(dotp, 6) > 0 THEN 1 << plane ELSE 0 END) AS INT)
           AS bucket
  FROM proj GROUP BY vec_id
), pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.v AS va, b.v AS vb
  FROM (SELECT aug.*, bucket FROM aug JOIN buckets USING (vec_id)) a
  JOIN (SELECT aug.*, bucket FROM aug JOIN buckets USING (vec_id)) b
    ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
), expl AS (
  SELECT a_id, b_id, unnest(va) AS x, unnest(vb) AS y
  FROM pairs
), scored AS (
  SELECT a_id, b_id,
         round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) AS cos_sim
  FROM expl GROUP BY a_id, b_id
)
SELECT a_id, b_id, cos_sim FROM scored WHERE cos_sim >= 0.95
"""


SEMDEDUP_THR = 0.4
"""Within-cluster cosine above which the later vector is a semantic dup.

Deliberately low for the synthetic table (max corpus cosine ≈ 0.51 — there
are no planted clones on this path; the decision logic, not the corpus, is
under test). Production SemDeDup uses ~0.95+."""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023 shape):
    partition the embedding space with the deterministic IVF codebook
    (first-8-by-id centroids, max-cosine assignment — simsearch.ivf_assign),
    then prune WITHIN each cluster only: a vector is a semantic duplicate
    if an earlier-id clustermate scores ≥ SEMDEDUP_THR cosine; its keeper
    is the minimum such clustermate. One keep-decision row per vector.

    100 TB shape: the quadratic compare is confined to one cluster — k-means
    granularity (n_lists ∝ √N in the SemDeDup paper) is the scale lever that
    bounds every cluster's pair join, and the cluster id is the single
    equi-join/shuffle key. The shared `assigned` subtree ends in an explicit
    hash Exchange on ivf_list so the self-join's two consumers and the final
    decision join all sit on the SAME canonical Exchange (runtime
    ReuseExchange — the cap_band_buckets lesson); an adversarial
    mega-cluster would be bounded by cap_band_buckets(key_col='ivf_list')
    exactly as the banded text families are. Complements
    `dedup_embedding_cosine` (LSH-bucket recall path): clustering here is
    exhaustive within a cell, so within-cluster recall is 1.0 by
    construction. No reference counterpart (LLM-pipeline family)."""
    emb = _t(spark, sf_dir, "embeddings")
    assigned = simsearch.ivf_assign(emb, n_lists=8).repartition("ivf_list")
    sim = F.round(
        simsearch.cosine(F.col("a.embedding"), F.col("b.embedding")), 6
    )
    dup_pairs = (
        assigned.alias("a")
        .join(
            assigned.alias("b"),
            (F.col("a.ivf_list") == F.col("b.ivf_list"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("src"),
            F.col("b.vec_id").alias("dst"),
            sim.alias("cs"),
        )
        .filter(F.col("cs") >= SEMDEDUP_THR)
    )
    dup_of = dup_pairs.groupBy("dst").agg(F.min("src").alias("dup_of"))
    return (
        assigned.join(dup_of, assigned.vec_id == dup_of.dst, "left")
        .select(
            "vec_id",
            F.col("ivf_list").cast("int").alias("ivf_list"),
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
        )
    )


SQL_SEMANTIC_DEDUP = f"""
WITH cents AS (
  SELECT vec_id AS cent_rank, embedding AS cvec
  FROM embeddings ORDER BY vec_id LIMIT 8
), cpairs AS (
  SELECT e.vec_id, c.cent_rank,
         CAST(unnest(e.embedding) AS DOUBLE) AS v,
         CAST(unnest(c.cvec) AS DOUBLE) AS cv
  FROM embeddings e CROSS JOIN cents c
), csims AS (
  SELECT vec_id, cent_rank,
         round(sum(v*cv) / (sqrt(sum(v*v)) * sqrt(sum(cv*cv))), 9) AS csim
  FROM cpairs GROUP BY vec_id, cent_rank
), assigned AS (
  SELECT vec_id, cent_rank AS ivf_list
  FROM (SELECT vec_id, cent_rank,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cent_rank ASC) AS rn
        FROM csims)
  WHERE rn = 1
), pp AS (
  SELECT aa.vec_id AS src, bb.vec_id AS dst,
         CAST(unnest(a.embedding) AS DOUBLE) AS av,
         CAST(unnest(b.embedding) AS DOUBLE) AS bv
  FROM assigned aa
  JOIN assigned bb ON aa.ivf_list = bb.ivf_list AND aa.vec_id < bb.vec_id
  JOIN embeddings a ON a.vec_id = aa.vec_id
  JOIN embeddings b ON b.vec_id = bb.vec_id
), pc AS (
  SELECT src, dst,
         round(sum(av*bv) / (sqrt(sum(av*av)) * sqrt(sum(bv*bv))), 6) AS cs
  FROM pp GROUP BY src, dst
), dup AS (
  SELECT dst, min(src) AS dup_of FROM pc WHERE cs >= {SEMDEDUP_THR} GROUP BY dst
)
SELECT a.vec_id, CAST(a.ivf_list AS INT) AS ivf_list,
       dup.dup_of IS NULL AS keep, dup.dup_of
FROM assigned a LEFT JOIN dup ON a.vec_id = dup.dst
"""


def q_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode ordering (the relational face of span offset assignment,
    SURVEY §2.8): one row per word with its dense position."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).filter(F.col("doc_id") % 25 == 0)


SQL_WORD_POS = """
SELECT doc_id,
       CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos,
       unnest(string_split(text, ' ')) AS word
FROM documents WHERE doc_id % 25 = 0
"""


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (T6's fuzzy union-distinct has this as its exact
    relational face): n_chars values realized ONLY by odd-id documents —
    a genuine, NONZERO difference at every SF (120/121/6 rows at
    sf0.001/0.01/0.1; the round-3 form was empty↔empty, which a broken
    EXCEPT would also satisfy)."""
    docs = _t(spark, sf_dir, "documents")
    all_vals = docs.select("n_chars").distinct()
    even = docs.filter(F.col("doc_id") % 2 == 0).select("n_chars").distinct()
    return all_vals.exceptAll(even)


SQL_SET_EXCEPT = """
SELECT DISTINCT n_chars FROM documents
EXCEPT
SELECT DISTINCT n_chars FROM documents WHERE doc_id % 2 = 0
"""


def q_set_except_empty_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assert-style companion (the P3 pattern — EXPECTED empty, and the
    oracle agrees for the same structural reason): sources whose every
    document is long. The corpus invariant is that every source mixes
    short and long docs, so a nonzero row here means either the corpus
    drifted or the EXCEPT is broken in an asymmetric way."""
    docs = _t(spark, sf_dir, "documents")
    all_sources = docs.select("source").distinct()
    low = docs.filter(F.col("n_chars") < 160).select("source").distinct()
    return all_sources.exceptAll(low)


SQL_SET_EXCEPT_EMPTY_GUARD = """
SELECT DISTINCT source FROM documents
EXCEPT
SELECT DISTINCT source FROM documents WHERE n_chars < 160
"""


# ---------------------------------------------------------------------------
# Training-data operators: similarity search
# ---------------------------------------------------------------------------


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-row dot-product fold over the vector array — spread the narrow
    # single-row-group embeddings scan first (see _spread); the result is
    # per-row (then TakeOrdered with a deterministic tie-break), so it is
    # partitioning-independent
    emb = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    return simsearch.cosine_topk(emb, query_vec_id=0, k=10)


SQL_COSINE_TOPK = """
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
expl AS (
  SELECT e.vec_id,
         CAST(unnest(e.embedding) AS DOUBLE) AS v,
         CAST(unnest(q.qvec) AS DOUBLE) AS qv
  FROM embeddings e, q WHERE e.vec_id <> 0
),
scored AS (
  SELECT vec_id,
         sum(v * qv) AS dot,
         sqrt(sum(v * v)) AS na,
         sqrt(sum(qv * qv)) AS nb
  FROM expl GROUP BY vec_id
)
SELECT vec_id, round(dot / (na * nb), 6) AS cos_sim
FROM scored ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
"""


def q_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table multi-probe LSH ANN (2 independent hash tables × the
    Hamming-2 probe ring — measured recall@10 0.5 vs 0.175 for the
    round-3 single-table H1 ring, pinned in tests/test_ann_recall)."""
    emb = _t(spark, sf_dir, "embeddings")
    return simsearch.lsh_ann(
        emb, query_vec_id=0, k=10, n_planes=8, n_tables=2, probe_hamming=2
    )


def _sql_lsh_ann(
    n_planes: int = 8,
    n_tables: int = 2,
    probe_hamming: int = 2,
    query_vec_id: int = 0,
    k: int = 10,
) -> str:
    """DuckDB twin of simsearch.lsh_ann, generated from the SAME knobs:
    per-table buckets from the shared plane family (table t = planes
    [t·n_planes, (t+1)·n_planes)), identical probe-mask enumeration
    (simsearch.probe_masks), UNION-deduped candidates, exact rescoring."""
    masks = simsearch.probe_masks(n_planes, probe_hamming)
    bucket_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN plane // {n_planes} = {t} AND round(dotp, 6) > 0 "
        f"THEN 1 << (plane % {n_planes}) ELSE 0 END) AS INT) AS b{t}"
        for t in range(n_tables)
    )
    q_ctes = ",\n".join(
        f"""q{t} AS (
  SELECT e.embedding AS qvec,
         unnest([{", ".join(f"xor(b.b{t}, {m})" for m in masks)}]) AS probe
  FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
  WHERE e.vec_id = {query_vec_id}
)"""
        for t in range(n_tables)
    )
    cand_union = "\n  UNION\n".join(
        f"""  SELECT e.vec_id, e.embedding, q{t}.qvec
  FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
  JOIN q{t} ON b.b{t} = q{t}.probe
  WHERE e.vec_id <> {query_vec_id}"""
        for t in range(n_tables)
    )
    return f"""
WITH planes AS (
  SELECT p.plane, j.j,
         ((p.plane * 8191 + j.j * 127 + 13) * 2654435761) % 1000 / 1000.0 - 0.5
           AS comp
  FROM (SELECT unnest(range(0, {n_tables * n_planes})) AS plane) p,
       (SELECT unnest(range(0, 64)) AS j) j
), vecs AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS j,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
), proj AS (
  SELECT vec_id, plane, sum(v * comp) AS dotp
  FROM vecs JOIN planes ON vecs.j = planes.j
  GROUP BY vec_id, plane
), buckets AS (
  SELECT vec_id,
         {bucket_cols}
  FROM proj GROUP BY vec_id
),
{q_ctes},
cand AS (
{cand_union}
), expl AS (
  SELECT vec_id,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         CAST(unnest(qvec) AS DOUBLE) AS qv
  FROM cand
), scored AS (
  SELECT vec_id,
         sum(v * qv) AS dot,
         sqrt(sum(v * v)) AS na,
         sqrt(sum(qv * qv)) AS nb
  FROM expl GROUP BY vec_id
)
SELECT vec_id, round(dot / (na * nb), 6) AS cos_sim
FROM scored ORDER BY cos_sim DESC, vec_id ASC LIMIT {k}
"""


SQL_LSH_ANN = _sql_lsh_ann()


# ---------------------------------------------------------------------------
# Training-data operators: text analysis
# ---------------------------------------------------------------------------


def q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return simsearch.ivf_ann(emb, query_vec_id=0, k=10, n_lists=8)


SQL_IVF_ANN = """
WITH cents AS (
  SELECT vec_id AS cent_rank, embedding AS cvec
  FROM embeddings ORDER BY vec_id LIMIT 8
), pairs AS (
  SELECT e.vec_id, e.embedding, c.cent_rank,
         CAST(unnest(e.embedding) AS DOUBLE) AS v,
         CAST(unnest(c.cvec) AS DOUBLE) AS cv
  FROM embeddings e CROSS JOIN cents c
), csims AS (
  SELECT vec_id, cent_rank,
         round(sum(v*cv) / (sqrt(sum(v*v)) * sqrt(sum(cv*cv))), 9) AS csim
  FROM pairs GROUP BY vec_id, cent_rank
), assigned AS (
  SELECT vec_id, cent_rank AS ivf_list
  FROM (SELECT vec_id, cent_rank,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cent_rank ASC) AS rn
        FROM csims)
  WHERE rn = 1
), q AS (
  SELECT e.embedding AS qvec, a.ivf_list AS qlist
  FROM embeddings e JOIN assigned a ON e.vec_id = a.vec_id
  WHERE e.vec_id = 0
), cand AS (
  SELECT e.vec_id, CAST(unnest(e.embedding) AS DOUBLE) AS v,
         CAST(unnest(q.qvec) AS DOUBLE) AS qv
  FROM embeddings e JOIN assigned a ON e.vec_id = a.vec_id, q
  WHERE a.ivf_list = q.qlist AND e.vec_id <> 0
), scored AS (
  SELECT vec_id,
         round(sum(v*qv) / (sqrt(sum(v*v)) * sqrt(sum(qv*qv))), 6) AS cos_sim
  FROM cand GROUP BY vec_id
)
SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
"""


def q_ivf_ann_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a Lloyd-TRAINED codebook (2 deterministic k-means rounds,
    integer-quantized means — see simsearch.ivf_train) and 2-list probing
    (the standard recall knob), exactly reproducible in DuckDB. Assignment
    similarities are rounded to 6dp before comparison: a float sum's last
    bits differ by summation order across engines, and the coarser grid
    makes a boundary flip ~1000x less likely than 9dp (ties break on
    cent_rank deterministically either way)."""
    emb = _t(spark, sf_dir, "embeddings")
    return simsearch.ivf_ann_trained(
        emb, query_vec_id=0, k=10, n_lists=8, iters=2, n_probes=2
    )


def _assign_block(cents: str, prefix: str) -> str:
    """One k-means assignment round as DuckDB CTEs (max-cosine, rank tie)."""
    return f"""
{prefix}_expl AS (
  SELECT b.vec_id, c.cent_rank, unnest(b.v) AS v, unnest(c.cvec) AS cv
  FROM base b CROSS JOIN {cents} c
), {prefix}_csims AS (
  SELECT vec_id, cent_rank,
         round(sum(v*cv) / (sqrt(sum(v*v)) * sqrt(sum(cv*cv))), 6) AS csim
  FROM {prefix}_expl GROUP BY vec_id, cent_rank
), {prefix}_assigned AS (
  SELECT vec_id, cent_rank FROM (
    SELECT vec_id, cent_rank,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY csim DESC, cent_rank ASC) AS rn
    FROM {prefix}_csims)
  WHERE rn = 1
)"""


def _update_block(assigned: str, prev_cents: str, new_cents: str, prefix: str) -> str:
    """Centroid recentering as DuckDB CTEs: integer-quantized member means
    ((sum(floor(v*1e6))/count)/1e6 — associative, identical in Spark)."""
    return f"""
{prefix}_ex AS (
  SELECT a.cent_rank, generate_subscripts(b.v, 1) AS pos, unnest(b.v) AS v
  FROM {assigned} a JOIN base b USING (vec_id)
), {prefix}_sums AS (
  SELECT cent_rank, pos,
         CAST(sum(CAST(floor(v * 1000000.0) AS BIGINT)) AS DOUBLE)
           / count(*) / 1000000.0 AS m
  FROM {prefix}_ex GROUP BY cent_rank, pos
), {prefix}_new AS (
  SELECT cent_rank, list(m ORDER BY pos) AS cvec FROM {prefix}_sums GROUP BY cent_rank
), {new_cents} AS (
  SELECT c0.cent_rank, coalesce(n.cvec, c0.cvec) AS cvec
  FROM {prev_cents} c0 LEFT JOIN {prefix}_new n USING (cent_rank)
)"""


def _ivf_trained_sql(n_lists: int = 8, iters: int = 2, k: int = 10, qid: int = 0) -> str:
    parts = [f"""WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), cents0 AS (
  SELECT vec_id AS cent_rank,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
  FROM embeddings ORDER BY vec_id LIMIT {n_lists}
)"""]
    for i in range(iters):
        parts.append("," + _assign_block(f"cents{i}", f"a{i}"))
        parts.append("," + _update_block(f"a{i}_assigned", f"cents{i}", f"cents{i + 1}", f"u{i}"))
    parts.append("," + _assign_block(f"cents{iters}", "fin"))
    parts.append(f""", qlists AS (
  SELECT cent_rank AS qlist FROM (
    SELECT vec_id, cent_rank,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY csim DESC, cent_rank ASC) AS rn
    FROM fin_csims)
  WHERE vec_id = {qid} AND rn <= {{n_probes}}
), qv AS (
  SELECT v AS qvec FROM base WHERE vec_id = {qid}
), cand AS (
  SELECT b.vec_id, unnest(b.v) AS v, unnest(qv.qvec) AS qv
  FROM base b JOIN fin_assigned a USING (vec_id)
       JOIN qlists ON a.cent_rank = qlists.qlist, qv
  WHERE b.vec_id <> {qid}
), scored AS (
  SELECT vec_id,
         round(sum(v*qv) / (sqrt(sum(v*v)) * sqrt(sum(qv*qv))), 6) AS cos_sim
  FROM cand GROUP BY vec_id
)
SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id ASC LIMIT {k}""")
    return "\n".join(parts)


SQL_IVF_ANN_TRAINED = _ivf_trained_sql().replace("{n_probes}", "2")


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-row marker scoring — spread a narrow scan first (see _spread)
    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    return docs.select(
        "doc_id",
        textops.predicted_lang(F.col("text")).alias("pred_lang"),
        textops.lang_score(F.col("text"), "en").cast("long").alias("en_score"),
    )


SQL_LANGID = """
WITH scores AS (
  SELECT doc_id,
    len(list_filter(string_split(lower(text), ' '),
        w -> w IN ('the','a','of','and'))) AS s_en,
    len(list_filter(string_split(lower(text), ' '),
        w -> w IN ('der','die','das','und'))) AS s_de,
    len(list_filter(string_split(lower(text), ' '),
        w -> w IN ('le','la','les','et'))) AS s_fr,
    len(list_filter(string_split(lower(text), ' '),
        w -> w IN ('el','los','las','y'))) AS s_es
  FROM documents
)
SELECT doc_id,
       CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
            WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
            WHEN s_fr >= s_es THEN 'fr'
            ELSE 'es' END AS pred_lang,
       CAST(s_en AS BIGINT) AS en_score
FROM scores
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-row regex/ratio sweep — spread a narrow scan first (see _spread)
    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    feats = textops.quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["mean_word_len"].alias("mean_word_len"),
        textops.quality_score(F.col("text")).alias("quality"),
    )


SQL_QUALITY = """
WITH f AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))
           AS n_punct,
         len(list_filter(list_transform(string_split(text, ' '), w -> lower(w)),
             w -> w IN ('the','a','of','and','in','to','is'))) AS n_stop
  FROM documents
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(n_punct / n_chars, 6) AS punct_ratio,
       round(n_stop / n_tokens, 6) AS stopword_ratio,
       round((n_chars - (n_tokens - 1)) / n_tokens, 6) AS mean_word_len,
       round(0.4 * least(1.0, n_tokens / 100.0)
           + 0.2 * least(1.0, round(n_stop / n_tokens, 6) * 5)
           + 0.4 * greatest(0.0, 1.0 - round(n_punct / n_chars, 6) * 10), 6)
         AS quality
FROM f
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-row regex segmentation — spread a narrow scan first (see _spread)
    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    counts = textops.token_counts(F.col("text"))
    return docs.select(
        "doc_id",
        counts["ws_tokens"].alias("ws_tokens"),
        counts["bpe_ish_tokens"].alias("bpe_ish_tokens"),
    )


SQL_TOKEN_COUNT = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
            AS BIGINT) AS bpe_ish_tokens
FROM documents
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-row normalize+md5 — spread a narrow scan first (see _spread)
    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    return docs.select(
        "doc_id", textops.normalized_fingerprint(F.col("text")).alias("fp")
    )


SQL_FINGERPRINT = """
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                               ' +', ' ', 'g'))) AS fp
FROM documents
"""


# Robust winnowing (Schleimer, Wilkerson & Aiken, SIGMOD 2003): the
# guarantee-carrying fingerprint selection — every shared substring of at
# least WINNOW_W + WINNOW_K - 1 words is caught by at least one shared
# selected fingerprint, while only ~2/(w+1) of gram hashes are kept.
WINNOW_K = 4  # gram width (words)
WINNOW_W = 4  # window size (grams)


def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed document fingerprints: hash every 4-word gram to an
    engine-portable md5-prefix BIGINT, then in every window of 4
    consecutive gram hashes select the minimum (rightmost on ties — the
    paper's canonical tie-break), and emit per document the gram count,
    the selected-fingerprint count, and the md5 of the selected hash
    sequence in position order. Documents with fewer grams than one
    window carry an empty signature (the paper assumes n ≥ w; a length
    gate upstream is the deployment answer).

    Scale shape (100 TB): the textbook formulation (argmin over a
    trailing window with rightmost tie-break) needs next-smaller-element
    run lengths that bounded window frames cannot express, so instead
    each gram hash is exploded into the ≤ w windows it participates in
    (a constant ×4 fanout of slim (doc_id, i, h) rows — same order as
    the gram explosion itself) and each window's selection is ONE
    COMBINABLE aggregate: ``min(struct(h, -i, i))`` grouped on
    (doc_id, window_end) — rightmost-min via the struct ordering, partial
    aggregation absorbing everything map-side, keys uniform in the
    document id. Dedup of selections and the signature rollup are two
    more doc-keyed combinable aggregates. No window function ever runs,
    nothing is corpus-wide; the collected signature array is bounded by
    ~2/(w+1) of a document's grams. The sorted array is materialized in
    the aggregate BEFORE the transform lambda (higher-order-function
    lambdas re-evaluate inlined expressions per element)."""
    # md5-per-gram sweep inside _winnow_relations — spread first (_spread)
    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    sized, positions = _winnow_relations(docs)
    per_doc = positions.groupBy("doc_id").agg(
        F.count("*").alias("n_selected"),
        F.array_sort(F.collect_list(F.struct("i", "h"))).alias("_sorted"),
    ).select(
        "doc_id",
        "n_selected",
        F.md5(
            F.concat_ws(
                ",", F.transform(F.col("_sorted"), lambda s: s["h"].cast("string"))
            )
        ).alias("sig_md5"),
    )
    return (
        sized.select("doc_id", "n_grams")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.coalesce(F.col("n_selected"), F.lit(0))
            .cast("bigint")
            .alias("n_selected"),
            F.coalesce(F.col("sig_md5"), F.md5(F.lit(""))).alias("sig_md5"),
        )
    )


def _winnow_relations(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The two winnowing relations shared by the per-doc signature query
    and the MOSS-style pair query: ``sized`` (doc_id, wd, n_grams) and
    ``positions`` (doc_id, i, h) — the selected fingerprints with their
    gram positions. See q_winnow_fingerprint for the scale argument."""
    k, w = WINNOW_K, WINNOW_W
    sized = docs.select("doc_id", F.split("text", " ").alias("wd")).select(
        "doc_id",
        "wd",
        F.greatest(F.size("wd") - (k - 1), F.lit(0)).alias("n_grams"),
    )
    grams = sized.filter(F.col("n_grams") >= w).select(
        "doc_id",
        "n_grams",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_grams") - 1),
                lambda i: F.conv(
                    F.substring(
                        F.md5(F.concat_ws(" ", F.slice(F.col("wd"), i + 1, k))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint"),
            )
        ).alias("i", "h"),
    )
    wins = grams.select(
        "doc_id",
        "i",
        "h",
        F.explode(
            F.sequence(
                F.greatest(F.col("i"), F.lit(w - 1)),
                F.least(F.col("i") + (w - 1), F.col("n_grams") - 1),
            )
        ).alias("e"),
    )
    sel = wins.groupBy("doc_id", "e").agg(
        F.min(F.struct("h", (-F.col("i")).alias("ni"), F.col("i"))).alias("m")
    )
    positions = sel.groupBy("doc_id", F.col("m.i").alias("i")).agg(
        F.first(F.col("m.h")).alias("h")
    )
    return sized, positions


_WINNOW_CTES = f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS wd FROM documents
), sized AS (
  SELECT doc_id, wd, greatest(len(wd) - {WINNOW_K - 1}, 0) AS n_grams
  FROM words
), grams AS (
  SELECT doc_id, n_grams, CAST(t.i AS INT) AS i,
         CAST('0x' || substr(md5(array_to_string(
             wd[CAST(t.i+1 AS INT) : CAST(t.i+{WINNOW_K} AS INT)], ' ')), 1, 8)
              AS BIGINT) AS h
  FROM sized, LATERAL unnest(range(0, n_grams)) AS t(i)
  WHERE n_grams >= {WINNOW_W}
), wins AS (
  SELECT doc_id, i, h, CAST(t.e AS INT) AS e
  FROM grams, LATERAL unnest(range(greatest(i, {WINNOW_W - 1}),
                                   least(i + {WINNOW_W - 1}, n_grams - 1) + 1))
       AS t(e)
), sel AS (
  SELECT doc_id, e, i, h,
         row_number() OVER (PARTITION BY doc_id, e
                            ORDER BY h ASC, i DESC) AS rn
  FROM wins
), pos AS (
  SELECT DISTINCT doc_id, i, h FROM sel WHERE rn = 1
)"""

SQL_WINNOW = _WINNOW_CTES + """, agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_selected,
         md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY i)) AS sig_md5
  FROM pos GROUP BY doc_id
)
SELECT s.doc_id, CAST(s.n_grams AS BIGINT) AS n_grams,
       coalesce(a.n_selected, 0) AS n_selected,
       coalesce(a.sig_md5, md5('')) AS sig_md5
FROM sized s LEFT JOIN agg a USING (doc_id)
"""


# MOSS-style pair detection over winnowed fingerprints: a fingerprint
# shared by more documents than the cap is boilerplate, not evidence.
# MIN_SHARED=1 reports every sharing pair (production raises it; on this
# corpus the >=2 pairs are all FULL overlaps, so the single-print pairs
# are what give the overlap_ppm column discriminating variety)
WINNOW_HOT_CAP = 64
WINNOW_MIN_SHARED = 1


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style near-dup/plagiarism pair detection (Schleimer et al.,
    SIGMOD 2003 §5): documents meet through an inverted index on their
    winnowed fingerprints — pairs sharing ≥ WINNOW_MIN_SHARED selected
    prints are reported with the shared count and an overlap ratio in
    integer ppm of the smaller document's print set (floor(k·1e6/n): the
    engine-portable ppm idiom — round() halves differ cross-engine).

    Winnowing's guarantee makes the index sound: any shared word run of
    ≥ WINNOW_W + WINNOW_K − 1 words surfaces at least one shared print,
    so substantial textual overlap cannot hide. Scale shape (100 TB):
    identical to the banded dedup families — candidates meet in an
    equi-join on the print hash, never all-pairs; a print held by more
    than WINNOW_HOT_CAP documents is boilerplate and is routed OUT by the
    same one-Exchange COUNT-window cap the band joins use
    (cap_band_buckets — both self-join consumers and the per-doc print
    counts sit on shared canonical Exchanges), bounding any print's
    candidate contribution at cap². The per-doc print count rides the
    capped relation as a window column (no extra corpus joins), so the
    denominator is exact while capped prints only LOWER the measured
    overlap — a routed recall cap, visible, like the Jaccard hot-shingle
    cap. No reference counterpart (LLM-pipeline family)."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    _sized, positions = _winnow_relations(docs)
    fps = positions.select("doc_id", "h").distinct().withColumn(
        "n_fp", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    capped = textops.cap_band_buckets(fps, WINNOW_HOT_CAP, key_col="h")
    pairs = (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.min("a.n_fp").alias("_na"),
            F.min("b.n_fp").alias("_nb"),
        )
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )
    return pairs.select(
        "a_id",
        "b_id",
        F.col("n_shared").cast("bigint").alias("n_shared"),
        F.floor(
            F.col("n_shared") * F.lit(1000000) / F.least("_na", "_nb")
        ).cast("bigint").alias("overlap_ppm"),
    )


SQL_WINNOW_PAIRS = _WINNOW_CTES + f""", fps AS (
  SELECT DISTINCT doc_id, h FROM pos
), counted AS (
  SELECT doc_id, h, count(*) OVER (PARTITION BY doc_id) AS n_fp FROM fps
), capped AS (
  SELECT doc_id, h, n_fp FROM (
    SELECT doc_id, h, n_fp, count(*) OVER (PARTITION BY h) AS hot
    FROM counted
  ) WHERE hot <= {WINNOW_HOT_CAP}
), pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         CAST(count(*) AS BIGINT) AS n_shared,
         min(a.n_fp) AS na, min(b.n_fp) AS nb
  FROM capped a JOIN capped b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT a_id, b_id, n_shared,
       CAST(floor(n_shared * 1000000 / least(na, nb)) AS BIGINT)
         AS overlap_ppm
FROM pairs WHERE n_shared >= {WINNOW_MIN_SHARED}
"""


# thresholds for the composite curation decision — chosen so both keep and
# drop are nonzero at every driver scale factor (an all-true or all-false
# decision column would be a trivially-satisfiable oracle)
CURATION_MIN_QUALITY = 0.55
CURATION_MIN_TOKENS = 20


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data curation decision — what an LLM-corpus
    job actually materializes before tokenization: one row per document
    with the signals (language, quality, token count, near-dup
    canonicality) and the final ``keep`` verdict.

    keep = canonical (not the larger member of any MinHash-LSH candidate
    pair — keep-first semantics matching dedup_exact/dedup_clusters) AND
    quality ≥ CURATION_MIN_QUALITY AND ws_tokens ≥ CURATION_MIN_TOKENS.

    Scale shape: the signal columns are one linear codegen'd scan; the
    dup-id relation reuses the banded LSH equi-join (never all-pairs,
    round-5: over exact-collapsed representatives with the hot-bucket cap
    — see minhash_pair_relation) and lands back on the corpus as a left
    join keyed by doc_id — one shuffle each side, NOT broadcast by hint
    because at web scale the dup set is a large fraction of the corpus.
    Non-canonical = the larger member of a near-dup REPRESENTATIVE pair, OR
    any non-keeper member of a byte-identical cluster (the exact-collapse
    membership re-expanded LINEARLY via the fp→keeper relation — the k²
    pair product the collapse removed is never rebuilt). All signals
    compute in the SAME scan — composing the per-signal queries would
    re-read the corpus four times."""
    docs = _t(spark, sf_dir, "documents")
    # ONE exact_collapse feeds both the banded near-dup subtree and the
    # exact-duplicate membership (round 6): the former keepers-join
    # formulation re-ran the md5 groupBy over the corpus a second time.
    # A non-keeper is exactly a doc whose id is NOT a representative id
    # (keeper = min id of its fp group, ids unique), so the membership
    # re-expansion is a slim doc_id anti-join against the shared
    # (lineage-cut) representative set — same rows, one pass fewer.
    reps = textops.exact_collapse(docs.select("doc_id", "text")).localCheckpoint(
        eager=False
    )
    near = minhash_pairs_from_reps(reps).select(F.col("b_id").alias("doc_id"))
    exact_nonreps = docs.select("doc_id").join(
        reps.select("doc_id"), "doc_id", "left_anti"
    )
    dups = (
        near.unionByName(exact_nonreps)
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    counts = textops.token_counts(F.col("text"))
    # width pin BEFORE the feature sweep (langid trigram regexes + quality
    # ratios + token counts are per-row CPU an unsplittable scan would
    # serialize — measured 2.85s in one task at sf0.1); the pin's
    # hash(doc_id) exchange doubles as the join's required partitioning,
    # so the text shuffles exactly once either way
    feats = textops.pin_width(docs, "doc_id").select(
        "doc_id",
        textops.predicted_lang(F.col("text")).alias("pred_lang"),
        textops.quality_score(F.col("text")).alias("quality"),
        counts["ws_tokens"].alias("ws_tokens"),
    )
    cur = feats.join(dups, "doc_id", "left")
    is_canonical = F.col("_dup").isNull()
    return cur.select(
        "doc_id",
        "pred_lang",
        "quality",
        "ws_tokens",
        is_canonical.alias("is_canonical"),
        (
            is_canonical
            & (F.col("quality") >= F.lit(CURATION_MIN_QUALITY))
            & (F.col("ws_tokens") >= F.lit(CURATION_MIN_TOKENS))
        ).alias("keep"),
    )


SQL_CURATION = f"""
WITH dups AS (
  SELECT DISTINCT doc_id FROM (
    SELECT b_id AS doc_id FROM ({SQL_MINHASH.strip()}) p
    UNION ALL
    SELECT d.doc_id
    FROM documents d
    JOIN (SELECT md5(text) AS fp, min(doc_id) AS keep_id
          FROM documents GROUP BY md5(text)) k
      ON md5(d.text) = k.fp AND d.doc_id > k.keep_id
  )
), lang AS (
  {SQL_LANGID.strip()}
), qual AS (
  {SQL_QUALITY.strip()}
), tok AS (
  {SQL_TOKEN_COUNT.strip()}
)
SELECT d.doc_id,
       lang.pred_lang,
       qual.quality,
       tok.ws_tokens,
       dups.doc_id IS NULL AS is_canonical,
       (dups.doc_id IS NULL AND qual.quality >= {CURATION_MIN_QUALITY}
        AND tok.ws_tokens >= {CURATION_MIN_TOKENS}) AS keep
FROM documents d
JOIN lang USING (doc_id)
JOIN qual USING (doc_id)
JOIN tok USING (doc_id)
LEFT JOIN dups ON d.doc_id = dups.doc_id
"""


# per-language sampling rates (basis points of 10000) — deterministic
# stratified downsampling, the standard rebalancing step between curation
# and tokenization in an LLM corpus pipeline
SAMPLE_RATES_BP = {"en": 8000, "de": 5000, "fr": 2500, "es": 1000}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sampling: per-language keep rates
    (over the declared ``lang`` metadata column — en 80%, de 50%, fr 25%,
    es 10%, anything else 0%) applied via an md5-prefix hash of doc_id,
    NOT rand(): the inclusion decision is a pure function of the row, so
    the sample is reproducible across engines, retries, partitionings and
    reruns, and composable with resume (a re-executed task keeps exactly
    the same rows).

    Scale shape: one linear codegen'd scan, zero shuffles; the rate lookup
    is a constant-folded CASE on the stratum. Hash arithmetic is the
    engine-portable md5-prefix pattern (conv(substr(md5,1,8),16,10) ==
    DuckDB CAST('0x'||substr AS BIGINT)) used throughout the corpus."""
    docs = _t(spark, sf_dir, "documents")
    u = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":sample"))),
                1, 8,
            ),
            16, 10,
        ).cast("bigint"),
        F.lit(10000),
    )
    rate = None
    for lang_key, bp in SAMPLE_RATES_BP.items():
        clause = F.when(F.col("lang") == lang_key, F.lit(bp))
        rate = clause if rate is None else rate.when(F.col("lang") == lang_key, F.lit(bp))
    rate = rate.otherwise(F.lit(0))
    d = docs.select("doc_id", "lang", u.alias("u"))
    return d.filter(F.col("u") < rate).select("doc_id", "lang", "u")


SQL_STRATIFIED_SAMPLE = f"""
WITH hashed AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':sample'), 1, 8)
              AS BIGINT) % 10000 AS u
  FROM documents
)
SELECT doc_id, lang, u
FROM hashed
WHERE u < CASE lang
            WHEN 'en' THEN {SAMPLE_RATES_BP['en']}
            WHEN 'de' THEN {SAMPLE_RATES_BP['de']}
            WHEN 'fr' THEN {SAMPLE_RATES_BP['fr']}
            WHEN 'es' THEN {SAMPLE_RATES_BP['es']}
            ELSE 0 END
"""


# Corpus-level boilerplate detection (CCNet/RefinedWeb-style): a text unit
# is boilerplate when it recurs across a domain's documents. The unit here
# is a non-overlapping BOILER_CHUNK_WORDS-word chunk; the threshold is
# RELATIVE (appears in ≥ half the source's docs, and in ≥ 2 docs) so the
# query discriminates at every driver scale factor. The per-source header
# prepended by _augmented_documents_boiler plays the role of site chrome
# (nav bars, footers) — every real page on a domain carries it; the driver
# tables are immutable, so the structure is synthesized identically on both
# engines (same precedent as _augmented_documents_neardup).
BOILER_CHUNK_WORDS = 4
BOILER_HEADER = "nav home about contact privacy terms login"


def _augmented_documents_boiler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with the deterministic per-source site chrome prepended:
    ``nav home about contact privacy terms login <source>`` — 8 words, i.e.
    exactly two 4-word chunks, shared by every doc of the source."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.concat(
            F.lit(BOILER_HEADER + " "), F.col("source"), F.lit(" "), F.col("text")
        ).alias("text"),
    )


def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate line/segment strip — the web analogue of the
    reference's header/footer confidence stripping (C2/C3,
    /root/reference/ocr/applyocr.py:94-112 strips recurring page furniture
    per document; at corpus scale the recurring unit is cross-document site
    chrome). A chunk (non-overlapping 4-word window) is boilerplate iff it
    appears in ≥ 2 docs AND ≥ half of its source's documents; the query
    emits one row per doc with chunk counts, the boilerplate ratio and the
    md5 of the chunk-stripped text (order-preserving reassembly).

    Scale shape (100 TB): three keyed shuffles, never a pair join —
    (1) chunk doc-frequency: partial-agg'd groupBy on (source, chunk);
    (2) flagging: equi-join of the exploded chunks against the boiler set
    on (source, chunk) — NOT broadcast: across millions of domains the
    union of boilerplate is a large relation, so it meets the chunks in a
    hash join keyed the same way as the DF agg (one exchange reused);
    (3) per-doc reassembly: groupBy doc_id. A k-doc-wide boilerplate chunk
    costs k join rows — linear, the quadratic shape a pair-join formulation
    would have. Source-relative threshold in pure integer arithmetic
    (df*2 >= n_src) — portable across engines."""
    aug = _augmented_documents_boiler(spark, sf_dir)
    # materialize the split BEFORE the transform lambda (HOF lambdas
    # re-evaluate inlined expressions per element)
    words = aug.select("doc_id", "source", F.split("text", " ").alias("w"))
    k = BOILER_CHUNK_WORDS
    chunks = words.select(
        "doc_id",
        "source",
        F.transform(
            F.sequence(F.lit(1), F.ceil(F.size("w") / F.lit(k)).cast("int")),
            lambda i: F.concat_ws(" ", F.slice(F.col("w"), (i - 1) * k + 1, k)),
        ).alias("chunks"),
    )
    ex = chunks.select(
        "doc_id", "source", F.posexplode("chunks").alias("pos", "chunk")
    )
    src_n = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n_src"))
    )
    boiler = (
        ex.groupBy("source", "chunk")
        .agg(F.countDistinct("doc_id").alias("df"))
        .join(src_n, "source")
        .filter((F.col("df") >= 2) & (F.col("df") * 2 >= F.col("n_src")))
        .select("source", "chunk", F.lit(True).alias("_boiler"))
    )
    flagged = ex.join(boiler, ["source", "chunk"], "left")
    per_doc = flagged.groupBy("doc_id", "source").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("_boiler"), 1).otherwise(0)).alias("n_boiler"),
        F.sort_array(
            F.collect_list(
                F.when(F.col("_boiler").isNull(), F.struct("pos", "chunk"))
            )
        ).alias("_kept"),
    )
    return per_doc.select(
        "doc_id",
        "source",
        "n_chunks",
        "n_boiler",
        F.round(F.col("n_boiler") / F.col("n_chunks"), 6).alias("boiler_ratio"),
        F.md5(
            F.concat_ws(" ", F.transform(F.col("_kept"), lambda s: s["chunk"]))
        ).alias("kept_fp"),
    )


SQL_BOILERPLATE = f"""
WITH aug AS (
  SELECT doc_id, source,
         '{BOILER_HEADER} ' || source || ' ' || text AS text
  FROM documents
), words AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM aug
), chunks AS (
  SELECT doc_id, source, i AS pos,
         array_to_string(
           list_slice(w, (i-1)*{BOILER_CHUNK_WORDS}+1, i*{BOILER_CHUNK_WORDS}),
           ' ') AS chunk
  FROM words,
       UNNEST(generate_series(
         1, CAST(ceil(len(w) / {BOILER_CHUNK_WORDS}.0) AS INT))) t(i)
), srcn AS (
  SELECT source, count(*) AS n_src FROM documents GROUP BY source
), boiler AS (
  SELECT c.source, c.chunk
  FROM (SELECT source, chunk, count(DISTINCT doc_id) AS df
        FROM chunks GROUP BY source, chunk) c
  JOIN srcn USING (source)
  WHERE df >= 2 AND df * 2 >= n_src
), flagged AS (
  SELECT c.doc_id, c.source, c.pos, c.chunk,
         (b.chunk IS NOT NULL) AS is_boiler
  FROM chunks c
  LEFT JOIN boiler b ON c.source = b.source AND c.chunk = b.chunk
)
SELECT doc_id, source,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       round(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) / count(*), 6)
         AS boiler_ratio,
       md5(coalesce(
         string_agg(CASE WHEN NOT is_boiler THEN chunk END, ' ' ORDER BY pos),
         '')) AS kept_fp
FROM flagged
GROUP BY doc_id, source
"""


# Benchmark decontamination: training docs sharing any word-4-gram with the
# held-out benchmark slice are flagged (Brown/GPT-3-style n-gram overlap).
# The benchmark here is the deterministic doc_id % DECON_STRIDE == 0 slice
# of the immutable driver corpus — at production scale it is an actual eval
# suite, MBs against a 100 TB corpus.
DECON_STRIDE = 10
DECON_NGRAM = 4


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination by n-gram overlap: one row per TRAINING
    document (the corpus minus the benchmark slice) with the number of
    distinct word-4-grams it shares with any benchmark document and the
    resulting ``contaminated`` flag.

    Scale shape (100 TB): the benchmark gram set is benchmark-suite-sized
    (eval suites are MBs by definition), so it is broadcast and every
    training gram meets it map-side — zero shuffle for the membership
    probe; the only exchange is the per-doc hit regroup on doc_id. Grams
    are per-doc distinct BEFORE the join (array_distinct at extraction),
    so count(*) after the join IS the distinct-hit count and a gram
    repeated inside one doc costs one row, not many. Guarded for docs
    shorter than the gram width (Spark's sequence() would count DOWN for
    stop < start — the empty-array branch is explicit)."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.split("text", " ").alias("w"))
    n = DECON_NGRAM
    grams = words.select(
        "doc_id",
        F.when(
            F.size("w") >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("w"), i, n)),
                )
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("gs"),
    )
    ex = grams.select("doc_id", F.explode("gs").alias("g"))
    bench = (
        ex.filter(F.col("doc_id") % DECON_STRIDE == 0).select("g").distinct()
    )
    hits = (
        ex.filter(F.col("doc_id") % DECON_STRIDE != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
    )
    train = docs.filter(F.col("doc_id") % DECON_STRIDE != 0).select("doc_id")
    return train.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_gram_hits"),
        F.col("n").isNotNull().alias("contaminated"),
    )


SQL_DECONTAMINATE = f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id,
         CASE WHEN len(w) >= {DECON_NGRAM} THEN
           list_distinct(list_transform(
             range(1, len(w) - {DECON_NGRAM - 2}),
             i -> array_to_string(list_slice(w, i, i + {DECON_NGRAM - 1}), ' ')))
         ELSE CAST([] AS VARCHAR[]) END AS gs
  FROM words
), ex AS (
  SELECT doc_id, unnest(gs) AS g FROM grams
), bench AS (
  SELECT DISTINCT g FROM ex WHERE doc_id % {DECON_STRIDE} = 0
), hits AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n
  FROM ex JOIN bench USING (g)
  WHERE doc_id % {DECON_STRIDE} != 0
  GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(hits.n, 0) AS n_gram_hits,
       hits.n IS NOT NULL AS contaminated
FROM documents d
LEFT JOIN hits ON d.doc_id = hits.doc_id
WHERE d.doc_id % {DECON_STRIDE} != 0
"""


# Sequence packing: greedy document-contiguous assignment of curated docs
# into fixed token-budget training sequences — the step between curation
# and tokenization. Packing is inherently order-dependent, so at corpus
# scale it runs per bounded block (real pipelines pack per input shard);
# the deterministic proxy block is doc_id ÷ PACK_BLOCK_DOCS.
PACK_BLOCK_DOCS = 100
PACK_SEQ_TOKENS = 512


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: each document lands in training
    sequence ``seq_id`` at token offset ``tok_offset``, where sequences are
    filled greedily in doc_id order within a block (a doc that crosses the
    budget boundary opens the next sequence — document-contiguous packing).

    Scale shape (100 TB): ONE hash exchange on the block key, then a
    bounded window (≤ PACK_BLOCK_DOCS rows per partition key) — blocks pack
    embarrassingly parallel, and no global ORDER BY window ever exists (a
    corpus-wide cumulative sum would serialize into one partition). All
    boundary arithmetic is floor() on BIGINTs — portable (DuckDB CAST
    rounds where Spark truncates, the documented trap)."""
    docs = _t(spark, sf_dir, "documents")
    counts = textops.token_counts(F.col("text"))
    return _pack_assign(
        docs.select("doc_id", counts["ws_tokens"].alias("ws_tokens"))
    )


def _pack_assign(d: DataFrame) -> DataFrame:
    """Greedy block-local sequence packing over any (doc_id, ws_tokens, …)
    relation — the shared kernel of q_pack_sequences (whole corpus) and
    q_training_mix (mixed curation survivors). Blocks key on
    doc_id // PACK_BLOCK_DOCS even when the input is a filtered subset:
    blocks then hold fewer docs (never more), so the bounded-window
    guarantee is preserved and the assignment for a given keep-set is
    deterministic under resume."""
    d = d.withColumn(
        "block",
        F.floor(F.col("doc_id") / F.lit(PACK_BLOCK_DOCS)).cast("bigint"),
    )
    w = Window.partitionBy("block").orderBy("doc_id")
    start = (F.sum("ws_tokens").over(w) - F.col("ws_tokens")).alias("_start")
    d = d.select(*d.columns, start)
    seq_in_block = F.floor(F.col("_start") / F.lit(float(PACK_SEQ_TOKENS))).cast(
        "bigint"
    )
    return d.select(
        *[c for c in d.columns if c != "_start"],
        (F.col("block") * 1_000_000 + seq_in_block).alias("seq_id"),
        (F.col("_start") - seq_in_block * PACK_SEQ_TOKENS).alias("tok_offset"),
    )


SQL_PACK_SEQUENCES = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
         doc_id // {PACK_BLOCK_DOCS} AS block
  FROM documents
), cum AS (
  SELECT doc_id, ws_tokens, block,
         sum(ws_tokens) OVER (PARTITION BY block ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - ws_tokens AS start
  FROM toks
)
SELECT doc_id, ws_tokens, block,
       block * 1000000
         + CAST(floor(start / {PACK_SEQ_TOKENS}.0) AS BIGINT) AS seq_id,
       start - CAST(floor(start / {PACK_SEQ_TOKENS}.0) AS BIGINT)
         * {PACK_SEQ_TOKENS} AS tok_offset
FROM cum
"""


# Gopher-style repetition signals: the share of a document made of repeated
# word n-grams. Boilerplate-heavy or degenerate generated text shows a high
# duplicate-gram ratio / a single dominant gram; quality filters drop docs
# past a threshold (Rae et al. 2021 use 2-gram top-share and duplicate
# 3-/4-gram character fractions).
REP_NGRAM = 2
REP_TOP_SHARE_MAX = 0.20


def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals over word-2-grams: total grams,
    distinct grams, the duplicate-gram ratio (1 - distinct/total), the
    most-frequent gram's share of the doc, and the Gopher-style ``repetitive``
    flag (top share > REP_TOP_SHARE_MAX). Web analogue of the reference's
    per-document recurring-furniture strip (C2,
    /root/reference/ocr/applyocr.py:94-112) as a *scored signal* rather than
    a strip — the form a curation pipeline composes into its keep decision.

    Scale shape (100 TB): two keyed shuffles, both partial-agg'd —
    groupBy(doc_id, gram) then groupBy(doc_id); a doc's grams land in at
    most gram-count rows (linear), never a pair join. Short docs
    (< REP_NGRAM words → zero grams) are routed explicitly (size(null)
    is NULL, the documented trap) and emit zero ratios, not NULLs."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.split("text", " ").alias("w"))
    n = REP_NGRAM
    grams = words.select(
        "doc_id",
        F.when(
            F.size("w") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("w") - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(F.col("w"), i, n)),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("gs"),
    )
    per_gram = grams.select(
        "doc_id", F.explode("gs").alias("g")
    ).groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    per_doc = per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce(F.col("n_distinct"), F.lit(0))
            .cast("bigint")
            .alias("n_distinct"),
            F.when(
                F.col("n_grams").isNotNull(),
                F.round(1 - F.col("n_distinct") / F.col("n_grams"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_gram_ratio"),
            F.when(
                F.col("n_grams").isNotNull(),
                F.round(F.col("top_c") / F.col("n_grams"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("top_gram_share"),
            F.when(
                F.col("n_grams").isNotNull(),
                F.col("top_c") / F.col("n_grams") > REP_TOP_SHARE_MAX,
            )
            .otherwise(F.lit(False))
            .alias("repetitive"),
        )
    )


SQL_REPETITION = f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id,
         CASE WHEN len(w) >= {REP_NGRAM} THEN
           list_transform(
             range(1, len(w) - {REP_NGRAM - 2}),
             i -> array_to_string(list_slice(w, i, i + {REP_NGRAM - 1}), ' '))
         ELSE CAST([] AS VARCHAR[]) END AS gs
  FROM words
), per_gram AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest(gs) AS g FROM grams)
  GROUP BY doc_id, g
), per_doc AS (
  SELECT doc_id, sum(c) AS n_grams, count(*) AS n_distinct, max(c) AS top_c
  FROM per_gram GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(p.n_distinct, 0) AS BIGINT) AS n_distinct,
       CASE WHEN p.n_grams IS NOT NULL
            THEN round(1 - p.n_distinct / CAST(p.n_grams AS DOUBLE), 6)
            ELSE 0.0 END AS dup_gram_ratio,
       CASE WHEN p.n_grams IS NOT NULL
            THEN round(p.top_c / CAST(p.n_grams AS DOUBLE), 6)
            ELSE 0.0 END AS top_gram_share,
       CASE WHEN p.n_grams IS NOT NULL
            THEN p.top_c / CAST(p.n_grams AS DOUBLE) > {REP_TOP_SHARE_MAX}
            ELSE FALSE END AS repetitive
FROM documents d
LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


# Domain-level curation (C4/RefinedWeb-style): entire sources are dropped
# when their duplicate or low-quality fraction is excessive — the per-domain
# analogue of the per-document keep decision. Thresholds are in integer
# percent and the flag compares in INTEGER arithmetic (n*100 > n_docs*pct):
# a float `frac > 0.18` can flip between engines when n/n_docs lands on a
# representation boundary; integers cannot. Chosen so both kept and dropped
# sources exist at every driver SF (non-trivial oracle).
DOMAIN_MAX_DUP_PCT = 10
DOMAIN_MAX_LOWQ_PCT = 18


def q_source_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source (domain-level) curation stats and drop decision: one row
    per ``source`` with its doc count, non-canonical (near/exact-dup) count
    and fraction, low-quality count and fraction, and ``drop_domain`` —
    true when dups exceed DOMAIN_MAX_DUP_PCT% or low-quality docs exceed
    DOMAIN_MAX_LOWQ_PCT%. Web-pipeline analogue of the reference's
    skip-existing *source-prefix* gate (S3, /root/reference/main.py:27-47)
    lifted to a quality policy: domains, not files, are the unit a corpus
    operator blocks.

    Scale shape (100 TB): the per-doc signals reuse the corpus_curation
    scan (near-dup relation = banded LSH over exact-collapsed
    representatives — never all-pairs); the domain rollup is ONE keyed
    shuffle on ``source`` with partial aggregation, so a giant domain
    (millions of docs on one key) is absorbed map-side — each task
    contributes one partial row per source, the reduce side sees
    #tasks × #sources rows, not #docs. The decision is computed in the
    same agg projection; no second pass over the corpus."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    cur = q_corpus_curation(spark, sf_dir).select(
        "doc_id", "is_canonical", "quality"
    )
    agg = (
        docs.join(cur, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(~F.col("is_canonical"), 1).otherwise(0)).alias("n_dup"),
            F.sum(
                F.when(F.col("quality") < CURATION_MIN_QUALITY, 1).otherwise(0)
            ).alias("n_lowq"),
        )
    )
    return agg.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_dup").cast("bigint").alias("n_dup"),
        F.round(F.col("n_dup") / F.col("n_docs"), 6).alias("dup_frac"),
        F.col("n_lowq").cast("bigint").alias("n_lowq"),
        F.round(F.col("n_lowq") / F.col("n_docs"), 6).alias("lowq_frac"),
        (
            (F.col("n_dup") * 100 > F.col("n_docs") * DOMAIN_MAX_DUP_PCT)
            | (F.col("n_lowq") * 100 > F.col("n_docs") * DOMAIN_MAX_LOWQ_PCT)
        ).alias("drop_domain"),
    )


SQL_DOMAIN_FILTER = f"""
WITH cur AS (
  {SQL_CURATION.strip()}
), per_source AS (
  SELECT d.source,
         count(*) AS n_docs,
         sum(CASE WHEN NOT cur.is_canonical THEN 1 ELSE 0 END) AS n_dup,
         sum(CASE WHEN cur.quality < {CURATION_MIN_QUALITY} THEN 1 ELSE 0 END)
           AS n_lowq
  FROM documents d
  JOIN cur ON d.doc_id = cur.doc_id
  GROUP BY d.source
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_dup AS BIGINT) AS n_dup,
       round(n_dup / CAST(n_docs AS DOUBLE), 6) AS dup_frac,
       CAST(n_lowq AS BIGINT) AS n_lowq,
       round(n_lowq / CAST(n_docs AS DOUBLE), 6) AS lowq_frac,
       (n_dup * 100 > n_docs * {DOMAIN_MAX_DUP_PCT}
        OR n_lowq * 100 > n_docs * {DOMAIN_MAX_LOWQ_PCT}) AS drop_domain
FROM per_source
"""


# Corpus vocabulary analysis: exact top-K word n-grams per language —
# the standard "what is the corpus made of" audit (boilerplate discovery,
# tokenizer-vocabulary sanity, contamination triage).
TOPK_NGRAM = 3
TOPK_K = 10
TOPK_SALTS = 16


def q_topk_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language top-K word 3-grams with deterministic
    tie-breaking (count desc, gram asc). Corpus-level sibling of the
    per-document repetition signals; the aggregate the reference's
    recurring-furniture heuristic (C2, /root/reference/ocr/applyocr.py:
    94-112) would read at corpus scope.

    Scale shape (100 TB): a naive ``Window.partitionBy(lang)`` over the
    gram counts puts an entire language — billions of distinct grams —
    into ONE task: the same adversarial-skew shape as the hot duplicate
    bucket. Instead, exact two-phase top-K: the salt is derived FROM the
    gram (xxhash64 % TOPK_SALTS), so each gram's complete count lives in
    exactly one (lang, salt) group; any gram in the global top-K is
    necessarily in its group's local top-K (everything beating it locally
    beats it globally), so ranking the ≤ K×SALTS survivors per language
    is exact, and that final window sees at most K×SALTS rows per
    language instead of the whole vocabulary. Gram counting itself is one
    partial-agg'd shuffle on the high-cardinality (lang, gram) key.
    The salt never leaves the plan, so the DuckDB twin is the plain
    single-window formulation — same rows, engine-checkable."""
    # gram explode + integer partial aggs fuse into the scan — spread it
    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    n = TOPK_NGRAM
    words = docs.select("lang", F.split("text", " ").alias("w"))
    grams = words.select(
        "lang",
        F.when(
            F.size("w") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("w") - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(F.col("w"), i, n)),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("gs"),
    )
    counts = (
        grams.select("lang", F.explode("gs").alias("gram"))
        .groupBy("lang", "gram")
        .agg(F.count("*").alias("c"))
    )
    salted = counts.withColumn(
        "_salt", F.pmod(F.xxhash64("gram"), F.lit(TOPK_SALTS))
    )
    w_local = Window.partitionBy("lang", "_salt").orderBy(
        F.col("c").desc(), F.col("gram").asc()
    )
    survivors = (
        salted.withColumn("_r", F.row_number().over(w_local))
        .filter(F.col("_r") <= TOPK_K)
        .drop("_salt", "_r")
    )
    w_final = Window.partitionBy("lang").orderBy(
        F.col("c").desc(), F.col("gram").asc()
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= TOPK_K)
        .select(
            "lang",
            "gram",
            F.col("c").cast("bigint").alias("c"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


SQL_TOPK_NGRAMS = f"""
WITH words AS (
  SELECT lang, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT lang,
         CASE WHEN len(w) >= {TOPK_NGRAM} THEN
           list_transform(
             range(1, len(w) - {TOPK_NGRAM - 2}),
             i -> array_to_string(list_slice(w, i, i + {TOPK_NGRAM - 1}), ' '))
         ELSE CAST([] AS VARCHAR[]) END AS gs
  FROM words
), counts AS (
  SELECT lang, g AS gram, count(*) AS c
  FROM (SELECT lang, unnest(gs) AS g FROM grams)
  GROUP BY lang, g
), ranked AS (
  SELECT lang, gram, CAST(c AS BIGINT) AS c,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY c DESC, gram ASC) AS INT) AS rank
  FROM counts
)
SELECT lang, gram, c, rank FROM ranked WHERE rank <= {TOPK_K}
"""


# C4-style duplicate-line removal: the corpus analogue of the reference's
# recurring-furniture strip (C2, /root/reference/ocr/applyocr.py:94-112) —
# there a line repeated across pages of ONE document is furniture; at corpus
# scope a line repeated across DOCUMENTS is boilerplate, and every
# occurrence after the global first is dropped. Lines are the corpus's own
# 8-word segmentation (sources/corpus.py — the same width the extraction
# corpus renders), so the operator composes with the extraction family.
DEDUP_LINE_WORDS = 8


def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicate-line removal (C4 §2.2 shape): split every
    document into 8-word lines, keep only the globally-first occurrence
    of each distinct line (first = smallest (doc_id, line_idx)), and emit
    one row per document with the surviving line count and the md5 of the
    re-assembled (order-preserving) text.

    Scale shape (100 TB): the first-occurrence decision is a groupBy on
    the line fingerprint computing ``min(struct(doc_id, i))`` — a
    COMBINABLE aggregate, so a boilerplate line repeated 100M times
    collapses map-side and never concentrates in one reducer (the window
    formulation ``row_number() over (partition by fp)`` would put every
    occurrence of the hottest line into ONE task — exactly the skew this
    avoids; cf. the hot-duplicate-bucket lesson in the banded dedup
    family). The join back (lines ⨝ firsts on fp) is one-row-per-fp on
    the build side, so a hot fp fans out 1→M and AQE's skew-join split
    handles the probe side. Reassembly groups on doc_id — the uniform
    natural key. Total: two combinable-agg shuffles + one equi-join, all
    on hashed keys; only (doc_id, text) is ever scanned."""
    # md5-per-line sweep fuses into the scan — spread it (_spread)
    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    n = DEDUP_LINE_WORDS
    sized = docs.select(
        "doc_id", F.split("text", " ").alias("w")
    ).select(
        "doc_id",
        "w",
        F.floor((F.size("w") + (n - 1)) / n).cast("int").alias("n_lines"),
    )
    lines = (
        sized.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n_lines") - 1),
                    lambda i: F.concat_ws(" ", F.slice(F.col("w"), i * n + 1, n)),
                )
            ).alias("i", "line"),
        )
        .withColumn("fp", F.md5("line"))
    )
    firsts = lines.groupBy("fp").agg(
        F.min(F.struct("doc_id", "i")).alias("first")
    )
    kept = lines.join(firsts, "fp").filter(
        (F.col("doc_id") == F.col("first.doc_id"))
        & (F.col("i") == F.col("first.i"))
    )
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_sort(F.collect_list(F.struct("i", "line"))).alias("_sorted"),
    ).select(
        "doc_id",
        "n_kept",
        F.md5(
            F.concat_ws(
                " ", F.transform(F.col("_sorted"), lambda s: s["line"])
            )
        ).alias("kept_md5"),
    )
    return sized.select("doc_id", "n_lines").join(agg, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("int").alias("n_kept"),
        F.coalesce(F.col("kept_md5"), F.md5(F.lit(""))).alias("kept_md5"),
    )


SQL_DEDUP_LINES = f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sized AS (
  SELECT doc_id, w,
         CAST(floor((len(w) + {DEDUP_LINE_WORDS - 1}) / {DEDUP_LINE_WORDS}.0) AS INT) AS n_lines
  FROM words
), lines AS (
  SELECT doc_id, CAST(t.i AS INT) AS i,
         array_to_string(w[CAST(t.i*{DEDUP_LINE_WORDS}+1 AS INT) :
                           CAST(t.i*{DEDUP_LINE_WORDS}+{DEDUP_LINE_WORDS} AS INT)], ' ') AS line
  FROM sized, LATERAL unnest(range(0, n_lines)) AS t(i)
), firsts AS (
  SELECT doc_id, i, line,
         row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, i) AS rn
  FROM lines
), kept AS (
  SELECT doc_id, i, line FROM firsts WHERE rn = 1
), agg AS (
  SELECT doc_id, CAST(count(*) AS INT) AS n_kept,
         md5(string_agg(line, ' ' ORDER BY i)) AS kept_md5
  FROM kept GROUP BY doc_id
)
SELECT s.doc_id, s.n_lines,
       coalesce(a.n_kept, 0) AS n_kept,
       coalesce(a.kept_md5, md5('')) AS kept_md5
FROM sized s LEFT JOIN agg a USING (doc_id)
"""


# Exact-substring dedup (sliding-window n-gram marking): the
# alignment-insensitive complement to q_dedup_lines. dedup_lines cuts the
# corpus on a fixed 8-word grid, so a duplicated passage that starts
# mid-line is invisible to it; here EVERY w-word window is fingerprinted,
# any occurrence other than the global first of a repeated window marks
# its token range as duplicated, and overlapping marks merge per document
# (the distributed adaptation of suffix-array substring dedup — the
# suffix array itself is not expressible as a dataflow, the sliding-gram
# cover is the standard approximation). Reference analogue: the T6
# cross-tile 60%-containment dedup (/root/reference/ocr/textract/
# textract.py:120-131) — drop text already covered by an overlapping
# earlier extraction — lifted from tile geometry to corpus substrings.
SUBSTR_GRAM_WORDS = 10


def q_dedup_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window exact-substring duplication marking: fingerprint
    every 10-word window, keep the global first occurrence (smallest
    (doc_id, start)) of each repeated window, mark every other
    occurrence's token interval, merge overlapping intervals per doc, and
    emit per-document coverage stats — n_tokens, n_dup_tokens (union of
    marked intervals), dup_frac_ppm (integer parts-per-million — floor'd
    BIGINT arithmetic on both engine faces, no float crosses the
    boundary), and n_islands (merged runs).

    Scale shape (100 TB): the gram relation is ~one row per corpus token
    carrying only (doc_id, start, md5) — never the gram text. The
    first-occurrence decision is the same COMBINABLE
    ``count + min(struct(doc_id, start))`` groupBy on the fingerprint as
    dedup_lines (a boilerplate passage repeated 100M times collapses
    map-side; a per-fp window would funnel it into one task). The
    mark join is 1-row-per-fp on the build side (AQE skew split covers a
    hot probe fp). Interval merging is a window over (doc_id, start) —
    bounded by tokens-per-document, never corpus-wide — and the stats
    groupBy reuses the window's doc_id partitioning, so merging costs ONE
    Exchange. Docs shorter than the window width have no grams and are
    restored by the left join with zero coverage."""
    # md5-per-gram sweep fuses into the scan — spread it (_spread)
    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    n = SUBSTR_GRAM_WORDS
    sized = docs.select(
        "doc_id", F.split("text", " ").alias("w")
    ).select(
        "doc_id",
        "w",
        F.size("w").alias("n_tokens"),
        F.greatest(F.size("w") - (n - 1), F.lit(0)).alias("n_grams"),
    )
    grams = (
        sized.filter(F.col("n_grams") > 0)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n_grams") - 1),
                    lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("w"), i + 1, n))),
                )
            ).alias("start", "fp"),
        )
    )
    firsts = grams.groupBy("fp").agg(
        F.count("*").alias("occ"),
        F.min(F.struct("doc_id", "start")).alias("first"),
    )
    marked = grams.join(firsts, "fp").filter(
        (F.col("occ") >= 2)
        & ~(
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("start") == F.col("first.start"))
        )
    )
    w_prev = Window.partitionBy("doc_id").orderBy("start").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev_end = F.max(F.col("start") + n).over(w_prev)
    covered = marked.select(
        "doc_id",
        (
            F.col("start") + n
            - F.greatest(F.col("start"), F.coalesce(prev_end, F.col("start")))
        ).alias("inc"),
        F.when(prev_end.isNull() | (F.col("start") > prev_end), 1)
        .otherwise(0)
        .alias("new_island"),
    )
    stats = covered.groupBy("doc_id").agg(
        F.sum("inc").alias("n_dup_tokens"),
        F.sum("new_island").alias("n_islands"),
    )
    return (
        sized.select("doc_id", "n_tokens")
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.coalesce(F.col("n_dup_tokens"), F.lit(0))
            .cast("bigint")
            .alias("n_dup_tokens"),
            F.floor(
                F.coalesce(F.col("n_dup_tokens"), F.lit(0))
                * F.lit(1000000.0)
                / F.col("n_tokens")
            )
            .cast("bigint")
            .alias("dup_frac_ppm"),
            F.coalesce(F.col("n_islands"), F.lit(0)).cast("int").alias("n_islands"),
        )
    )


SQL_DEDUP_SUBSTRINGS = f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sized AS (
  SELECT doc_id, w, len(w) AS n_tokens,
         greatest(len(w) - {SUBSTR_GRAM_WORDS - 1}, 0) AS n_grams
  FROM words
), grams AS (
  SELECT doc_id, CAST(t.i AS INT) AS start,
         md5(array_to_string(w[CAST(t.i+1 AS INT) :
                               CAST(t.i+{SUBSTR_GRAM_WORDS} AS INT)], ' ')) AS fp
  FROM sized, LATERAL unnest(range(0, n_grams)) AS t(i)
  WHERE n_grams > 0
), marked AS (
  SELECT doc_id, start FROM (
    SELECT doc_id, start,
           row_number() OVER (PARTITION BY fp ORDER BY doc_id, start) AS rn,
           count(*) OVER (PARTITION BY fp) AS occ
    FROM grams)
  WHERE occ >= 2 AND rn > 1
), covered AS (
  SELECT doc_id,
         start + {SUBSTR_GRAM_WORDS}
           - greatest(start, coalesce(max(start + {SUBSTR_GRAM_WORDS}) OVER (
               PARTITION BY doc_id ORDER BY start
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), start)) AS inc,
         CASE WHEN max(start + {SUBSTR_GRAM_WORDS}) OVER (
               PARTITION BY doc_id ORDER BY start
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR start > max(start + {SUBSTR_GRAM_WORDS}) OVER (
               PARTITION BY doc_id ORDER BY start
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM marked
), stats AS (
  SELECT doc_id, sum(inc) AS n_dup_tokens, sum(new_island) AS n_islands
  FROM covered GROUP BY doc_id
)
SELECT s.doc_id, CAST(s.n_tokens AS BIGINT) AS n_tokens,
       CAST(coalesce(st.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens,
       CAST(floor(coalesce(st.n_dup_tokens, 0) * 1000000.0 / s.n_tokens) AS BIGINT)
         AS dup_frac_ppm,
       CAST(coalesce(st.n_islands, 0) AS INT) AS n_islands
FROM sized s LEFT JOIN stats st USING (doc_id)
"""


# PII scrubbing: the synthetic corpus carries no contact strings, so —
# following the decontaminate precedent of deterministic in-query
# synthesis — a md5-free doc_id-stride rule plants emails / phone numbers /
# IPv4s into a known subset on BOTH engine faces, and the scrub is graded
# on the augmented text. Patterns are written once here and shared by the
# Spark calls and the generated SQL (Java regex and DuckDB's RE2 agree on
# this subset: ASCII classes, \\b word boundary, bounded repetition).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+\d{2}-\d{2}-\d{4}-\d{2}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the documents table: plant deterministic
    contact strings (email for doc_id%5==1, phone for doc_id%7==2, IPv4
    for doc_id%11==3 — a doc can carry several), then scrub them with
    anchored ASCII regexes in email→phone→IP order (emails first so the
    IP pattern can't fire inside a dotted mail domain). Emits per-doc
    redaction counts plus the md5 of the scrubbed text.

    Scale shape (100 TB): a pure map-only plan — no exchange anywhere;
    regexp_count/regexp_replace run JVM-side inside one
    WholeStageCodegen span over a (doc_id, text) pruned scan, so the
    operator scales embarrassingly with input splits and the only limit
    is scan bandwidth. This is the deliberate contrast case to the
    shuffle-bearing dedup family: .explain shows zero Exchange nodes."""
    # map-only regex sweep — one row group would serialize it (_spread);
    # at real input widths this stays the zero-Exchange scan below
    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 1,
                F.concat(
                    F.lit(" reach admin"),
                    F.col("doc_id").cast("string"),
                    F.lit("@geo.example.org for access"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 2,
                F.concat(
                    F.lit(" hotline +41-44-"),
                    (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
                    F.lit("-22 open"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 3,
                F.concat(
                    F.lit(" origin 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit("."),
                    ((F.col("doc_id") * 7) % 256).cast("string"),
                    F.lit(" logged"),
                ),
            ).otherwise(F.lit("")),
        ).alias("aug"),
    )
    return aug.select(
        "doc_id",
        F.regexp_count("aug", F.lit(PII_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count("aug", F.lit(PII_PHONE_RE)).cast("int").alias("n_phones"),
        F.regexp_count("aug", F.lit(PII_IP_RE)).cast("int").alias("n_ips"),
        F.md5(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace("aug", PII_EMAIL_RE, "<EMAIL>"),
                    PII_PHONE_RE,
                    "<PHONE>",
                ),
                PII_IP_RE,
                "<IP>",
            )
        ).alias("scrubbed_md5"),
    )


SQL_PII_SCRUB = f"""
WITH aug AS (
  SELECT doc_id,
         text ||
         CASE WHEN doc_id % 5 = 1
              THEN ' reach admin' || CAST(doc_id AS VARCHAR) || '@geo.example.org for access'
              ELSE '' END ||
         CASE WHEN doc_id % 7 = 2
              THEN ' hotline +41-44-' || CAST(1000 + doc_id % 9000 AS VARCHAR) || '-22 open'
              ELSE '' END ||
         CASE WHEN doc_id % 11 = 3
              THEN ' origin 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
                   || CAST((doc_id * 7) % 256 AS VARCHAR) || ' logged'
              ELSE '' END AS aug
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(aug, '{PII_EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(aug, '{PII_PHONE_RE}')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(aug, '{PII_IP_RE}')) AS INT) AS n_ips,
       md5(regexp_replace(
             regexp_replace(
               regexp_replace(aug, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
               '{PII_PHONE_RE}', '<PHONE>', 'g'),
             '{PII_IP_RE}', '<IP>', 'g')) AS scrubbed_md5
FROM aug
"""


# tf-idf keyword extraction: per-document top-K terms by smoothed tf-idf
# (the textbook sklearn-style smoothing ln((N+1)/(df+1)) + 1). Ranking is
# over the ROUNDED score on both engine faces so the row_number tie-break
# (score desc, word asc) is engine-deterministic.
TFIDF_K = 5


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-K keywords by smoothed tf-idf.

    Scale shape (100 TB): tf is one combinable groupBy on (doc_id, word);
    df re-aggregates the SAME tf relation on word — and the word-explosion
    subtree (scan + split + explode + partial agg + shuffle, the dominant
    cost) must be computed ONCE, not once per consumer. The trap: with a
    bare ``count(*)`` df, Catalyst prunes the tf column from the df branch
    (distinct-keys-only aggregate), the two (doc_id, word) exchanges stop
    canonicalizing equal, and the corpus is exploded twice. Aggregating
    ``sum(tf)`` (corpus frequency — a column the output wants anyway)
    alongside df forces both branches to the byte-identical subtree, and
    the EXECUTED plan shows one ReusedExchange (asserted in
    tests/test_queries.py::test_tfidf_topk_ranks_rare_terms). The df side
    is one row per distinct word, so the tf ⨝ df equi-join is 1→M on a
    zipfian key ("the" joins every doc) — the hot-probe shape AQE's skew
    split handles; the window formulation (``count(*) over (partition by
    word)``) was rejected because it would put every occurrence of the
    hottest word into ONE task. N is a scalar broadcast. The final top-K
    window partitions on doc_id — bounded by per-document vocabulary,
    never corpus-wide — and WindowGroupLimit prunes to K rows per doc
    BEFORE the exchange."""
    # word explode + integer partial aggs fuse into the scan — spread it
    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df = tf.groupBy("word").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            "tf",
            "df",
            "cf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_K)
        .select(
            "doc_id",
            "word",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.col("cf").cast("bigint").alias("cf"),
            "score",
            F.col("rank").cast("int").alias("rank"),
        )
    )


SQL_TFIDF_TOPK = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), tf AS (
  SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word
), df AS (
  SELECT word, count(*) AS df, sum(tf) AS cf FROM tf GROUP BY word
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT doc_id, word, tf, df, cf,
         round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS score
  FROM tf JOIN df USING (word) CROSS JOIN n
), ranked AS (
  SELECT doc_id, word, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
         CAST(cf AS BIGINT) AS cf, score,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, word ASC) AS INT) AS rank
  FROM scored
)
SELECT doc_id, word, tf, df, cf, score, rank FROM ranked WHERE rank <= {TFIDF_K}
"""


BM25_TERMS = ("hash", "merge", "vector", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_K = 50
# Scores are emitted as INTEGER micro-units: floor(score*1e6 + eps), the
# same engine-portable quantization as the temperature-mix basis points.
# round(double, 6) would put the top-K membership on a HALF_UP-vs-HALF_EVEN
# knife edge fed by ln() — JVM Math.log and DuckDB's libm are each 1-ulp
# accurate but need not agree bit-for-bit. ln noise is ≲1e-14 abs on these
# magnitudes (≲1e-8 micro-units); 1e-6 absorbs it, six orders below the
# 1-micro quantum.
BM25_SCORE_EPS = 1e-6


def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval: rank the corpus against a fixed multi-term
    query (Robertson/Sparck-Jones idf, k1/b length normalization) — the
    classical relevance scorer a curation pipeline uses to mine documents
    matching a topic seed. Reference analogue: tfidf_topk's keyword
    surface, extended from per-document keywords to corpus-wide retrieval.

    Scale shape (100 TB): ONE combinable explode+groupBy(doc_id) computes
    per-doc length and per-term tfs in the same pass (the term tfs are
    conditional aggregates, not joins — the query is a literal term set,
    so there is no second shuffle and no zipfian-key join anywhere); the
    corpus stats (N, Σdl, per-term df) re-aggregate that relation to ONE
    broadcast row; the final top-K is TakeOrderedAndProject, never a
    global sort, and the rank window runs over the already-limited K rows.

    Cross-engine determinism: the per-term score parts are summed in
    FIXED left-to-right term order (a groupBy-sum over per-term rows
    would be summation-order-dependent across engines); avgdl is one
    double division of two exact integers (sum(dl)/N), not a float avg();
    the emitted score is INTEGER micro-units (floor(score*1e6 +
    BM25_SCORE_EPS)) so ln()'s 1-ulp engine divergence can neither flip a
    rounding boundary nor change top-K membership; both faces are
    generated from the same constants."""
    # conditional integer aggregates fuse into the scan — spread it
    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    aggs = [F.count("*").alias("dl")]
    for t in BM25_TERMS:
        aggs.append(
            F.sum(F.when(F.col("word") == t, 1).otherwise(0))
            .cast("bigint").alias(f"tf_{t}")
        )
    pertf = words.groupBy("doc_id").agg(*aggs)
    stat_aggs = [
        F.count("*").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    ]
    for t in BM25_TERMS:
        stat_aggs.append(
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0))
            .cast("bigint").alias(f"df_{t}")
        )
    stats = pertf.agg(*stat_aggs)
    # materialize avgdl/norm as real columns so both engines evaluate the
    # shared subexpressions once and in the same shape
    joined = (
        pertf.crossJoin(F.broadcast(stats))
        .withColumn("avgdl", F.col("sum_dl").cast("double") / F.col("n_docs"))
        .withColumn(
            "bm25_norm",
            F.lit(BM25_K1)
            * (F.lit(1.0) - F.lit(BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")),
        )
    )
    score = None
    for t in BM25_TERMS:
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5))
        )
        part = (
            idf * (F.col(f"tf_{t}") * F.lit(BM25_K1 + 1.0))
            / (F.col(f"tf_{t}") + F.col("bm25_norm"))
        )
        score = part if score is None else score + part
    scored = joined.select(
        "doc_id",
        F.col("dl").cast("bigint").alias("dl"),
        *[F.col(f"tf_{t}") for t in BM25_TERMS],
        F.floor(score * F.lit(1e6) + F.lit(BM25_SCORE_EPS))
        .cast("bigint")
        .alias("score_micro"),
    )
    top = scored.orderBy(F.desc("score_micro"), F.asc("doc_id")).limit(BM25_K)
    w = Window.orderBy(F.desc("score_micro"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def _sql_bm25() -> str:
    """DuckDB face generated from the SAME constants as the Spark face
    (the sql_dedup_simhash_pairs precedent): term list, k1, b, K and the
    exact operand order of every float expression."""
    tf_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN word = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf_{t}"
        for t in BM25_TERMS
    )
    df_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in BM25_TERMS
    )
    parts = " + ".join(
        f"(ln(1.0 + (n_docs - df_{t} + 0.5) / (df_{t} + 0.5))"
        f" * (tf_{t} * {BM25_K1 + 1.0!r}) / (tf_{t} + bm25_norm))"
        for t in BM25_TERMS
    )
    tf_names = ", ".join(f"tf_{t}" for t in BM25_TERMS)
    return f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), pertf AS (
  SELECT doc_id, count(*) AS dl,
         {tf_cols}
  FROM words GROUP BY doc_id
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
         {df_cols}
  FROM pertf
), normed AS (
  SELECT doc_id, dl, {tf_names}, n_docs, sum_dl,
         {BM25_K1!r} * (1.0 - {BM25_B!r} + {BM25_B!r} * dl
                        / (CAST(sum_dl AS DOUBLE) / n_docs)) AS bm25_norm,
         {", ".join(f"df_{t}" for t in BM25_TERMS)}
  FROM pertf CROSS JOIN stats
), scored AS (
  SELECT doc_id, CAST(dl AS BIGINT) AS dl, {tf_names},
         CAST(floor(({parts}) * 1000000.0 + {BM25_SCORE_EPS!r}) AS BIGINT)
           AS score_micro
  FROM normed
), top AS (
  SELECT * FROM scored ORDER BY score_micro DESC, doc_id ASC LIMIT {BM25_K}
)
SELECT doc_id, dl, {tf_names}, score_micro,
       CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS INT)
         AS rank
FROM top
"""


SQL_BM25 = _sql_bm25()


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained unigram-LM quality score (the KenLM-perplexity-filter
    analogue with the corpus as its own language model): train unigram
    frequencies over the whole corpus in-query, score each document by
    its token-weighted mean log-probability, and bucket it into integer
    bits-per-token (``floor(-mean_lp / ln 2)``) — the coarse perplexity
    band a curation pipeline thresholds on. Reference analogue: the
    two-tier confidence filter (C5, /root/reference/ocr/textract/
    textract.py:61-72) — a per-unit quality scalar gating what survives —
    lifted from OCR confidence to corpus statistics.

    Scale shape (100 TB): identical to the audited tfidf_topk subtree —
    ONE combinable groupBy on (doc_id, word) feeds both the corpus
    frequency rollup and the scoring join, and both branches aggregate
    the same columns so the exchanges canonicalize equal and the executed
    plan shows a ReusedExchange (the word-explosion scan runs once; the
    bare-count trap documented there applies here too). The vocabulary
    side of the scoring join is one row per distinct word (zipfian probe
    → AQE skew split); the corpus token total is a one-row broadcast. A
    window over ``partition by word`` was rejected for the same
    hottest-word-in-one-task reason as in tfidf."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    cf = tf.groupBy("word").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    total = cf.agg(F.sum("cf").alias("total_tokens"))
    scored = (
        tf.join(cf.select("word", "cf"), "word")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            (
                F.sum(F.col("tf") * F.log(F.col("cf") / F.col("total_tokens")))
                / F.sum("tf")
            ).alias("_mean_lp"),
        )
    )
    return scored.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round("_mean_lp", 6).alias("mean_lp"),
        F.floor(-F.round("_mean_lp", 6) / math.log(2.0))
        .cast("int")
        .alias("bits_bucket"),
    )


SQL_LM_SCORE = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), tf AS (
  SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word
), cf AS (
  SELECT word, count(*) AS df, sum(tf) AS cf FROM tf GROUP BY word
), total AS (
  SELECT sum(cf) AS total_tokens FROM cf
), scored AS (
  SELECT doc_id, sum(tf) AS n_tokens,
         sum(tf * ln(cf / total_tokens)) / sum(tf) AS _mean_lp
  FROM tf JOIN cf USING (word) CROSS JOIN total
  GROUP BY doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(_mean_lp, 6) AS mean_lp,
       CAST(floor(-round(_mean_lp, 6) / ln(2.0)) AS INT) AS bits_bucket
FROM scored
"""


# Temperature-scaled source mixing (multinomial sampling with exponent
# alpha < 1, the standard multilingual/multi-source rebalance): target
# share t_s ∝ n_s^alpha, budget M = MIX_FRAC · N, per-source keep
# probability q_s = min(1, t_s·M / n_s). The keep decision is the
# md5-prefix basis-point pattern (stratified_sample precedent) — a pure
# function of the row, so the mix is reproducible across engines, retries
# and reruns, and the float q_s is quantized to integer basis points
# BEFORE the compare (floor, never round: engine-portable).
MIX_ALPHA = 0.7
MIX_FRAC = 0.5
# Epsilon added INSIDE the basis-point floor on both engine faces. When
# source counts are equal, q_s is EXACTLY 0.5 in real arithmetic, and the
# double paths differ between engines only in z's summation order — Spark
# landed at 5000 bp and DuckDB at 4999 on the same corpus. Cross-engine
# disagreement is ulp-scale (≲1e-10 bp); 1e-6 bp absorbs it while being
# six orders of magnitude below the 1 bp quantum, so no honestly-interior
# value can cross a boundary because of it.
MIX_BP_EPS = 1e-6


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling: upweights small sources
    (alpha=0.7) under a global budget of MIX_FRAC·N docs.

    Scale shape (100 TB): per-source counts are one combinable groupBy on
    source (partial agg absorbs a giant domain map-side); the share
    normalizer is a one-row broadcast; the per-source keep_bp dim is
    #sources rows — broadcast-joined, so the corpus pass is map-only after
    one small agg. No corpus-side shuffle beyond the source rollup."""
    docs = _t(spark, sf_dir, "documents")
    return _temperature_keep(docs).select("doc_id", "source", "u", "keep_bp")


def _temperature_keep(docs: DataFrame) -> DataFrame:
    """Temperature-mix keep filter over any (doc_id, source, …) relation:
    returns the surviving rows with the ``u`` draw and per-source
    ``keep_bp`` attached. Shared by q_temperature_mix (whole corpus) and
    q_training_mix (curation survivors)."""
    ns = docs.groupBy("source").agg(F.count("*").alias("n_s"))
    tot = ns.agg(
        F.sum(F.pow(F.col("n_s").cast("double"), F.lit(MIX_ALPHA))).alias("z"),
        F.sum("n_s").alias("n"),
    )
    q = (
        ns.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.floor(
                F.least(
                    F.lit(1.0),
                    (F.pow(F.col("n_s").cast("double"), F.lit(MIX_ALPHA)) / F.col("z"))
                    * (F.col("n") * F.lit(MIX_FRAC))
                    / F.col("n_s"),
                )
                * 10000
                + F.lit(MIX_BP_EPS)
            )
            .cast("int")
            .alias("keep_bp"),
        )
    )
    u = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))),
                1, 8,
            ),
            16, 10,
        ).cast("bigint"),
        F.lit(10000),
    )
    return (
        docs.withColumn("u", u)
        .join(F.broadcast(q), "source")
        .filter(F.col("u") < F.col("keep_bp"))
    )


SQL_TEMPERATURE_MIX = f"""
WITH ns AS (
  SELECT source, count(*) AS n_s FROM documents GROUP BY source
), tot AS (
  SELECT sum(pow(n_s, {MIX_ALPHA})) AS z, sum(n_s) AS n FROM ns
), q AS (
  SELECT source,
         CAST(floor(least(1.0, (pow(n_s, {MIX_ALPHA}) / z)
                               * (n * {MIX_FRAC}) / n_s) * 10000
                    + {MIX_BP_EPS}) AS INT)
           AS keep_bp
  FROM ns CROSS JOIN tot
), hashed AS (
  SELECT doc_id, source,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8)
              AS BIGINT) % 10000 AS u
  FROM documents
)
SELECT h.doc_id, h.source, h.u, q.keep_bp
FROM hashed h JOIN q USING (source)
WHERE h.u < q.keep_bp
"""


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus shape statistics: one row per (source,
    length-bucket) with document count and token mass, where the bucket
    is the log2 band of the whitespace token count computed EXACTLY as
    the bit length of the integer (``length(bin(t))`` on both engine
    faces) — ``floor(log2(t))`` through doubles can disagree across
    engines at exact powers of two, a bit-string length cannot. The
    operational dashboard a 100 TB ingest watches: where the token mass
    sits per source, and whether a source's distribution drifts.

    Scale shape: one combinable groupBy on (source, bucket) — partial
    aggregation absorbs any giant source map-side; the scan is pruned to
    (source, text). Zero joins, zero windows."""
    docs = _t(spark, sf_dir, "documents")
    t = F.size(F.split("text", " "))
    return (
        docs.select(
            "source",
            F.length(F.bin(t.cast("bigint"))).cast("int").alias("len_bucket"),
            t.alias("_t"),
        )
        .groupBy("source", "len_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("_t").cast("bigint").alias("sum_tokens"),
        )
    )


SQL_CORPUS_STATS = """
WITH toks AS (
  SELECT source, len(string_split(text, ' ')) AS t FROM documents
)
SELECT source, CAST(length(bin(t)) AS INT) AS len_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(t) AS BIGINT) AS sum_tokens
FROM toks GROUP BY source, length(bin(t))
"""


def q_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data assembly a corpus job materializes:
    curation keep-set (near-dup canonicality ∧ quality ∧ token floor)
    → temperature-scaled source rebalance over the SURVIVORS (the mix
    shares are recomputed post-curation — rebalancing the raw corpus
    would re-inflate sources whose bulk was just deduplicated away)
    → block-local greedy sequence packing of the mixed set. One row per
    packed document: its source, token count, and (block, seq_id,
    tok_offset) placement.

    This is deliberately a COMPOSITION of the three audited operators —
    q_corpus_curation's signal scan + banded LSH, _temperature_keep's
    map-only basis-point filter, _pack_assign's bounded block window —
    not a re-implementation; every stage keeps its own oracle and plan
    audit, and this query pins that they compose without a seam.

    Scale shape (100 TB): the curation subtree is unchanged (audited in
    PLANS.md); the survivors join is one doc_id-keyed shuffle; the mix
    adds one combinable source rollup + a broadcast dim (corpus pass
    stays map-only); packing adds the single bounded block Exchange.
    The slim survivors relation (doc_id, source, ws_tokens) is
    ``localCheckpoint(eager=False)``-ed: downstream the mix consumes it
    TWICE (source rollup + keep probe), and without the lineage cut Spark
    re-evaluates the whole curation/LSH subtree per consumer (measured
    25 corpus scans vs 9 for curation alone — the multi-consumer
    re-evaluation documented for cap_band_buckets). The checkpoint is the
    single-query stand-in for what the deployment pipeline does anyway —
    materialize the curation decision at a stage boundary with a resume
    manifest (plans/pipeline.py) — and follows the q_dedup_clusters
    precedent for lineage cuts inside query construction. Packing keys
    blocks on doc_id // PACK_BLOCK_DOCS of the ORIGINAL ids, so a
    filtered block holds fewer docs (never more) and the placement of a
    given keep-set is deterministic under resume."""
    docs = _t(spark, sf_dir, "documents")
    kept = (
        q_corpus_curation(spark, sf_dir)
        .filter("keep")
        .select("doc_id", F.col("ws_tokens").cast("bigint").alias("ws_tokens"))
    )
    survivors = kept.join(docs.select("doc_id", "source"), "doc_id").localCheckpoint(
        eager=False
    )
    mixed = _temperature_keep(survivors)
    return _pack_assign(mixed.select("doc_id", "source", "ws_tokens"))


SQL_TRAINING_MIX = f"""
WITH survivors AS (
  SELECT c.doc_id, d.source, CAST(c.ws_tokens AS BIGINT) AS ws_tokens
  FROM ({SQL_CURATION.strip()}) c JOIN documents d USING (doc_id)
  WHERE c.keep
), ns AS (
  SELECT source, count(*) AS n_s FROM survivors GROUP BY source
), tot AS (
  SELECT sum(pow(n_s, {MIX_ALPHA})) AS z, sum(n_s) AS n FROM ns
), q AS (
  SELECT source,
         CAST(floor(least(1.0, (pow(n_s, {MIX_ALPHA}) / z)
                               * (n * {MIX_FRAC}) / n_s) * 10000
                    + {MIX_BP_EPS}) AS INT)
           AS keep_bp
  FROM ns CROSS JOIN tot
), mixed AS (
  SELECT s.doc_id, s.source, s.ws_tokens
  FROM survivors s JOIN q USING (source)
  WHERE CAST('0x' || substr(md5(CAST(s.doc_id AS VARCHAR) || ':mix'), 1, 8)
             AS BIGINT) % 10000 < q.keep_bp
), cum AS (
  SELECT doc_id, source, ws_tokens, doc_id // {PACK_BLOCK_DOCS} AS block,
         sum(ws_tokens) OVER (PARTITION BY doc_id // {PACK_BLOCK_DOCS}
                              ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
           - ws_tokens AS start
  FROM mixed
)
SELECT doc_id, source, ws_tokens, block,
       block * 1000000
         + CAST(floor(start / {PACK_SEQ_TOKENS}.0) AS BIGINT) AS seq_id,
       start - CAST(floor(start / {PACK_SEQ_TOKENS}.0) AS BIGINT)
         * {PACK_SEQ_TOKENS} AS tok_offset
FROM cum
"""


# ---------------------------------------------------------------------------
# Extraction pipeline queries (kernel-backed → rows-only oracle)
# ---------------------------------------------------------------------------


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the MinHash-LSH
    candidate pairs; cluster_id = smallest member doc_id.

    The registered implementation is the large-star/small-star alternation
    (textops.connected_components_star) — O(log² n) rounds on ANY graph, so
    an adversarial chain of pairwise-similar documents can't force
    O(diameter) driver-side iterations the way plain min-label propagation
    (textops.connected_components, kept for shallow-cluster workloads)
    would. Oracle: golden parquet computed by a pure-python union-find over
    the DuckDB-generated MinHash pair list (scripts/make_golden.py) — the
    edge set itself is independently hash-verified by the
    ``dedup_minhash_lsh`` oracle.

    Round-5: the near-dup pairs are REPRESENTATIVE-level (exact duplicates
    collapse before banding — see minhash_pair_relation), so byte-identical
    membership re-enters here as LINEAR (keeper → member) edges from the
    fp→keeper relation: a k-wide exact cluster contributes k−1 edges, never
    the k² pair product the collapse removed, and every member still lands
    in its representative's component."""
    from swissgeol_ocr_spark.functions.textops import connected_components_star

    pairs = q_dedup_minhash_lsh(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    fp_docs = docs.select(F.md5("text").alias("_fp"), "doc_id")
    keepers = fp_docs.groupBy("_fp").agg(F.min("doc_id").alias("_keep_id"))
    exact_edges = (
        fp_docs.join(keepers, "_fp")
        .filter(F.col("doc_id") > F.col("_keep_id"))
        .select(F.col("_keep_id").alias("src"), F.col("doc_id").alias("dst"))
    )
    edges = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).unionByName(exact_edges)
    return connected_components_star(
        docs.select(F.col("doc_id").alias("id")), edges
    ).select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def q_extract_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full extraction pipeline on the synthesized spans corpus; the
    oracle checks per-document metrics (input span count, output span
    count, page count) against the DuckDB-regenerated corpus + the
    expected-sequence union of SQL_EXTRACT_SEQUENCE."""
    from swissgeol_ocr_spark.plans.pipeline import extract_pipeline
    from swissgeol_ocr_spark.sources.corpus import documents_to_spans

    docs = _t(spark, sf_dir, "documents")
    spans = documents_to_spans(docs)
    # metrics-only output: Catalyst prunes spans_out through both consumer
    # branches, so re-evaluating the (pruned) synthesis per branch beats a
    # second exchange (interleaved best-of A/B at sf0.1: pre+norep 1.82s,
    # old serial-synthesis 1.90s, pre+rep 2.17s). The full-output
    # extract_sequence keeps the exchange instead.
    out = extract_pipeline(
        spans, repartition=False,
        has_mega=_mega_hint(spans, key=(sf_dir, "spans"))
    )
    return out.select("doc_id", "n_spans_in", "n_spans_out", "n_pages")


def q_extract_aggressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extraction pipeline under the aggressive strategy (C3 visibility
    sweep on every page + C6 mask suppression), as the exploded span
    sequence. Oracle: golden parquet precomputed by the pure-python
    corpus+kernel twin (scripts/make_golden.py)."""
    from swissgeol_ocr_spark.plans.config import ExtractConfig
    from swissgeol_ocr_spark.plans.pipeline import extract_pipeline
    from swissgeol_ocr_spark.sources.corpus import documents_to_spans

    docs = _t(spark, sf_dir, "documents")
    spans = documents_to_spans(docs)
    out = extract_pipeline(
        # aggressive strategy disables the passthrough: single consumer, same
        # rule as extract_words — no second exchange
        spans, ExtractConfig(use_aggressive_strategy=True), repartition=False,
        has_mega=_mega_hint(spans, key=(sf_dir, "spans"))
    )
    return out.select("doc_id", F.explode("spans_out").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


def q_extract_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extraction pipeline over WORD-granularity scanned input (the raw
    detection shape — Textract WORD blocks in the reference,
    textract_api_schema.py:64-78): build_lines_from_words exercises the
    from-scratch layout detection (assemble.lines_from_words band grouping
    + the draw.py:34-39 space rule) on every page. Oracle: golden parquet
    from the pure-python corpus+kernel twin (scripts/make_golden.py)."""
    from swissgeol_ocr_spark.plans.config import ExtractConfig
    from swissgeol_ocr_spark.plans.pipeline import extract_pipeline
    from swissgeol_ocr_spark.sources.corpus import documents_to_word_spans

    docs = _t(spark, sf_dir, "documents")
    spans = documents_to_word_spans(docs)
    out = extract_pipeline(
        # single consumer (all word docs are scanned: no passthrough branch) —
        # the pre-partitioned synthesis feeds the kernel directly; a second
        # exchange only re-shuffles (A/B at sf0.1: 1.57s vs 1.83s)
        spans, ExtractConfig(build_lines_from_words=True), repartition=False,
        has_mega=_mega_hint(spans, key=(sf_dir, "words"))
    )
    return out.select("doc_id", F.explode("spans_out").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


def q_extract_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded output span sequences — the north rule's span-sequence
    equality surface, now with a HARD oracle (SQL_EXTRACT_SEQUENCE): the
    corpus is a pure function of (doc_id, text) under engine-portable md5
    hashing, so DuckDB regenerates the exact expected sequence for layouts
    0/2/3 in closed form; the reading-order-heavy layout 1 is pinned by a
    golden parquet precomputed by the PURE-PYTHON corpus+kernel twin
    (scripts/make_golden.py — independent of all Spark plumbing).
    Reference semantics pinned end-to-end: ocr/readingorder.py:178-223 +
    ocr/applyocr.py:94-112."""
    from swissgeol_ocr_spark.plans.pipeline import extract_pipeline
    from swissgeol_ocr_spark.sources.corpus import documents_to_spans

    docs = _t(spark, sf_dir, "documents")
    spans = documents_to_spans(docs)
    # two consumer branches (JVM passthrough + kernel): keep the pipeline's
    # hash(doc_id) exchange — it materializes the pre-partitioned synthesis
    # ONCE for both (runtime ReuseExchange), where repartition=False would
    # re-evaluate the span synthesis per branch (A/B at sf0.1: 2.47s vs
    # 2.91s; serial-synthesis old shape 3.33s)
    out = extract_pipeline(
        spans, has_mega=_mega_hint(spans, key=(sf_dir, "spans"))
    )
    return out.select("doc_id", F.explode("spans_out").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


_MEGA_HINT_CACHE: dict[tuple, bool] = {}


def _mega_hint(
    spans_df: DataFrame, cutoff: int = 20_000, key: tuple | None = None
) -> bool:
    """Table-stats lookup for extract_pipeline's ``has_mega`` hint: on an
    Iceberg table this is a free column-max read; here it is one cheap agg
    over the materialized ``n_spans`` hint column (never the spans structs).
    Passing the result drops (False) or keeps (True) the page-split salting
    subtree instead of building both branches.

    ``key`` memoizes the answer per (source, granularity) so repeated
    registry calls don't re-run the stats job — the local stand-in for an
    Iceberg metadata read, which is per-snapshot cached by nature. The
    driver testdata is immutable, so the cache never goes stale here;
    mutable deployments should key on the snapshot id."""
    if key is not None and key in _MEGA_HINT_CACHE:
        return _MEGA_HINT_CACHE[key]
    row = spans_df.agg(F.max("n_spans")).first()
    val = bool(row[0] is not None and row[0] > cutoff)
    if key is not None:
        _MEGA_HINT_CACHE[key] = val
    return val


def _golden_path(name: str) -> str:
    import os

    return os.path.normpath(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", "..", "tests", "golden", name)
    )


# Queries whose DuckDB oracle reads a golden parquet precomputed at
# sf=0.01 (the driver's gate SF). Their oracles are only meaningful
# there — a sweep at another SF must annotate, not fail, them. (Their
# second-SF coverage is tests/test_twin.py: twin==kernel per document at
# sf0.001, plus the golden-drift test in tests/test_pipeline.py.)
GOLDEN_SF01_QUERIES = frozenset({
    "extract_flagship", "extract_sequence", "extract_words",
    "extract_aggressive", "extract_stream", "dedup_clusters",
})


# Expected extraction output, regenerated inside DuckDB (driver runs the
# oracle at sf=0.01, where the layout-1 golden below was precomputed):
#   layout 0 — born-digital passthrough: lines in index order
#   layout 2 — text-under-image (Tiefenbrunnen): per page, the media span
#              then the re-detected lines as ocr-text (conf 1.0 → all kept;
#              reading order over the 2×20 grid = line index order)
#   layout 3 — passthrough re-sorted by (page_no, offset): page-0 lines,
#              hidden overlay, path, then later pages' lines
#   layout 1 — golden parquet (scripts/make_golden.py: pure-python corpus
#              synthesis + local kernel, no Spark)
SQL_EXTRACT_SEQUENCE = f"""
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':m'), 1, 4) AS BIGINT) % 101 = 0
              THEN string_split(repeat(text || ' ', 39) || text, ' ')
              ELSE string_split(text, ' ') END AS w,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':l'), 1, 4) AS BIGINT) % 4 AS layout
  FROM documents
), sized AS (
  SELECT doc_id, w, layout,
         greatest(1, CAST(ceil(len(w) / 8.0) AS INT)) AS n_lines
  FROM base
), lines AS (
  SELECT doc_id, layout, n_lines, CAST(t.i AS INT) AS i,
         array_to_string(w[CAST(t.i*8+1 AS INT) : CAST(t.i*8+8 AS INT)], ' ') AS line_text
  FROM sized, LATERAL unnest(range(0, n_lines)) AS t(i)
), l0 AS (
  SELECT doc_id, 'text' AS kind, line_text AS text, '' AS media_ref, i AS "offset"
  FROM lines WHERE layout = 0
), l2_media AS (
  SELECT s.doc_id, 'media' AS kind, '' AS text,
         'img-' || s.doc_id || '-' || CAST(t.p AS VARCHAR) AS media_ref,
         CAST(t.p * 41 AS INT) AS "offset"
  FROM sized s, LATERAL unnest(range(0, CAST(ceil(n_lines / 40.0) AS INT))) AS t(p)
  WHERE layout = 2
), l2_lines AS (
  SELECT doc_id, 'ocr-text' AS kind, line_text AS text, '' AS media_ref,
         CAST((i // 40) * 41 + 1 + (i % 40) AS INT) AS "offset"
  FROM lines WHERE layout = 2 AND line_text <> ''
), l3 AS (
  SELECT doc_id, kind, text, media_ref, CAST(o AS INT) AS "offset" FROM (
    SELECT doc_id, 'text' AS kind, line_text AS text, '' AS media_ref,
           CASE WHEN i < 40 THEN i ELSE i + 2 END AS o
    FROM lines WHERE layout = 3
    UNION ALL
    SELECT doc_id, 'ocr-text', 'hidden overlay', '', least(n_lines, 40)
    FROM sized WHERE layout = 3
    UNION ALL
    SELECT doc_id, 'path', '', '', least(n_lines, 40) + 1
    FROM sized WHERE layout = 3
  )
), l1 AS (
  SELECT doc_id, kind, text, media_ref, "offset"
  FROM read_parquet('{_golden_path("extract_layout1_sf0.01.parquet")}')
)
SELECT * FROM l0 UNION ALL SELECT * FROM l2_media UNION ALL
SELECT * FROM l2_lines UNION ALL SELECT * FROM l3 UNION ALL SELECT * FROM l1
"""

# Flagship metrics oracle: n_spans_in / n_pages from the regenerated corpus
# arithmetic, n_spans_out by counting the expected-sequence union above.
SQL_EXTRACT_FLAGSHIP = f"""
WITH seq AS ({SQL_EXTRACT_SEQUENCE}),
meta AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':l'), 1, 4) AS BIGINT) % 4 AS layout,
         greatest(1, CAST(ceil(len(
           CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':m'), 1, 4) AS BIGINT) % 101 = 0
                THEN string_split(repeat(text || ' ', 39) || text, ' ')
                ELSE string_split(text, ' ') END
         ) / 8.0) AS INT)) AS n_lines
  FROM documents
)
SELECT m.doc_id,
       CAST(n_lines + CASE WHEN layout IN (1, 2) THEN CAST(ceil(n_lines / 40.0) AS INT)
                           WHEN layout = 3 THEN 2 ELSE 0 END AS INT) AS n_spans_in,
       CAST(c.n AS INT) AS n_spans_out,
       CAST(ceil(n_lines / 40.0) AS INT) AS n_pages
FROM meta m JOIN (SELECT doc_id, count(*) AS n FROM seq GROUP BY doc_id) c USING (doc_id)
"""

SQL_EXTRACT_AGGRESSIVE = f"""
SELECT doc_id, kind, text, media_ref, "offset"
FROM read_parquet('{_golden_path("extract_aggressive_sf0.01.parquet")}')
"""

SQL_EXTRACT_WORDS = f"""
SELECT doc_id, kind, text, media_ref, "offset"
FROM read_parquet('{_golden_path("extract_words_sf0.01.parquet")}')
"""

# Golden precomputed by scripts/make_golden.py: pure-python union-find over
# the DuckDB-run SQL_MINHASH pair list (independent of the Spark CC code).
SQL_DEDUP_CLUSTERS = f"""
SELECT doc_id, cluster_id
FROM read_parquet('{_golden_path("dedup_clusters_sf0.01.parquet")}')
"""


# streaming-face oracles that derive from SQL literals defined above
# (the q_* functions live with the other streaming faces near SQL_ASOF)
SQL_DEDUP_STREAM = "SELECT DISTINCT md5(text) AS fp FROM documents"
SQL_NEARDUP_STREAM = (
    "SELECT a_id, b_id FROM (" + SQL_MINHASH.strip() + ")"
)


# Queries that EXECUTE a bounded streaming job when called and return a
# read of the drained sink. Registry-wide PLAN sweeps should skip these:
# the returned DataFrame is a trivial sink scan (asserting no-cartesian
# on it is vacuous — the interesting plans run inside the streaming
# query/foreachBatch, guarded by the dedicated streaming tests), and
# each call costs a full staged run rather than lazy plan construction.
RUN_ON_CALL = frozenset({
    "sessionize_stream",
    "asof_stream",
    "funnel_stream",
    "extract_stream",
    "dedup_stream",
    "minhash_neardup_stream",
})


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# REGISTRY ORDER IS LOAD-BEARING (round-5 verdict #1): the driver's
# external correctness gate verifies the FIRST 50 entries in dict order.
# Round 5's mid-dict insertions silently pushed the flagship extraction
# composites (the north-rule span-equality oracles) past position 50, so
# they were green locally but invisible to the external auditor. The first
# 50 entries below are therefore the highest-information faces — the
# extraction composites, the dedup spine, the composed curation/mix
# pipeline, the scoring family, and one face per SURVEY §2 operator ID —
# with thin companions (0-row guards, per-face duplicates of a composed
# query, stream twins of batch faces already verified both ways) demoted
# past 50. tests/test_queries.py::test_registry_prefix_covers_flagship
# pins the prefix so a future edit cannot reshuffle the verified set
# unnoticed. The VERIFIED_PREFIX marker below is position 50.
QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # --- extraction composites: the north-rule span-sequence equality
    # surface (reference readingorder.py:178-223 + applyocr.py:94-112)
    "extract_flagship": (q_extract_flagship, SQL_EXTRACT_FLAGSHIP),
    "extract_sequence": (q_extract_sequence, SQL_EXTRACT_SEQUENCE),
    "extract_words": (q_extract_words, SQL_EXTRACT_WORDS),
    "extract_aggressive": (q_extract_aggressive, SQL_EXTRACT_AGGRESSIVE),
    "extract_stream": (q_extract_stream, SQL_EXTRACT_SEQUENCE),
    "dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    # --- dedup spine
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, SQL_MINHASH),
    "dedup_simhash_pairs": (q_dedup_simhash_pairs, SQL_SIMHASH_PAIRS),
    "dedup_band_stats": (q_dedup_band_stats, SQL_BAND_STATS),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, SQL_JACCARD),
    "minhash_neardup_stream": (q_minhash_neardup_stream, SQL_NEARDUP_STREAM),
    "dedup_lines": (q_dedup_lines, SQL_DEDUP_LINES),
    "dedup_substrings": (q_dedup_substrings, SQL_DEDUP_SUBSTRINGS),
    "winnow_fingerprint": (q_winnow_fingerprint, SQL_WINNOW),
    "winnow_pairs": (q_winnow_pairs, SQL_WINNOW_PAIRS),
    # --- composed curation / sampling / mixing pipeline
    "corpus_curation": (q_corpus_curation, SQL_CURATION),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "training_mix": (q_training_mix, SQL_TRAINING_MIX),
    "temperature_mix": (q_temperature_mix, SQL_TEMPERATURE_MIX),
    "corpus_stats": (q_corpus_stats, SQL_CORPUS_STATS),
    "pack_sequences": (q_pack_sequences, SQL_PACK_SEQUENCES),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "boilerplate_strip": (q_boilerplate_strip, SQL_BOILERPLATE),
    "pii_scrub": (q_pii_scrub, SQL_PII_SCRUB),
    "topk_ngrams": (q_topk_ngrams, SQL_TOPK_NGRAMS),
    "repetition_ratio": (q_repetition_ratio, SQL_REPETITION),
    "source_domain_filter": (q_source_domain_filter, SQL_DOMAIN_FILTER),
    # --- scoring family
    "bm25_rank": (q_bm25_rank, SQL_BM25),
    "tfidf_topk": (q_tfidf_topk, SQL_TFIDF_TOPK),
    "lm_score": (q_lm_score, SQL_LM_SCORE),
    "quality_score": (q_quality_score, SQL_QUALITY),
    "token_count": (q_token_count, SQL_TOKEN_COUNT),
    # --- similarity search
    "cosine_topk": (q_cosine_topk, SQL_COSINE_TOPK),
    "lsh_ann": (q_lsh_ann, SQL_LSH_ANN),
    "ivf_ann_trained": (q_ivf_ann_trained, SQL_IVF_ANN_TRAINED),
    # --- one face per SURVEY §2 operator ID
    "c5_confidence_filter": (q_c5_confidence_filter, SQL_C5),
    "s3_resume_antijoin": (q_s3_resume_antijoin, SQL_S3),
    "p3_pagecount_check": (q_p3_pagecount_check, SQL_P3),
    "agg_block_stats": (q_agg_block_stats, SQL_AGG),
    "r1_span_ordering": (q_r1_span_ordering, SQL_R1),
    "t1_tiles": (q_t1_tiles, SQL_T1),
    "join_broadcast_dim": (q_join_broadcast_dim, SQL_JOIN),
    "c6_spatial_antijoin": (q_c6_spatial_antijoin, SQL_C6),
    "p6_crop_accept": (q_p6_crop_accept, SQL_P6),
    "p7_downscale_budget": (q_p7_downscale_budget, SQL_P7),
    "media_features": (q_media_features, SQL_MEDIA_FEATURES),
    "media_normalize": (q_media_normalize, SQL_MEDIA_NORMALIZE),
    # --- event-family representatives (headline queries)
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "star_join_q5": (q_star_join_q5, SQL_STAR_Q5),
    # === VERIFIED_PREFIX: everything above is position ≤ 50 (driver gate);
    # === everything below is pytest-verified (75-query oracle replica +
    # === second-SF sweep) but outside the driver's 50-entry window.
    "langid": (q_langid, SQL_LANGID),
    "fingerprint": (q_fingerprint, SQL_FINGERPRINT),
    "semantic_dedup": (q_semantic_dedup, SQL_SEMANTIC_DEDUP),
    "dedup_embedding_cosine": (q_dedup_embedding_cosine, SQL_DEDUP_EMBED),
    "dedup_simhash": (q_dedup_simhash, SQL_SIMHASH),
    "ivf_ann": (q_ivf_ann, SQL_IVF_ANN),
    "dedup_stream": (q_dedup_stream, SQL_DEDUP_STREAM),
    "sessionize_stream": (q_sessionize_stream, SQL_SESSIONIZE_STREAM),
    "asof_stream": (q_asof_stream, SQL_ASOF_STREAM),
    "funnel_stream": (q_funnel_stream, SQL_FUNNEL_STREAM),
    "asof_join": (q_asof_join, SQL_ASOF),
    "percentiles": (q_percentiles, SQL_PERCENTILES),
    "funnel_stages": (q_funnel_stages, SQL_FUNNEL),
    "event_windows": (q_event_windows, SQL_WINDOWS),
    "json_extract_stats": (q_json_extract_stats, SQL_JSON_STATS),
    "cube_rollup": (q_cube_rollup, SQL_CUBE),
    "pivot_events": (q_pivot_events, SQL_PIVOT),
    "retention_cohorts": (q_retention_cohorts, SQL_RETENTION),
    "topk_orders": (q_topk_orders, SQL_TOPK),
    "chunk_documents": (q_chunk_documents, SQL_CHUNKS),
    "media_downscale": (q_media_downscale, SQL_MEDIA_DOWNSCALE),
    "frame_sample": (q_frame_sample, SQL_FRAME_SAMPLE),
    "word_positions": (q_word_positions, SQL_WORD_POS),
    "set_except": (q_set_except, SQL_SET_EXCEPT),
    "set_except_empty_guard": (q_set_except_empty_guard, SQL_SET_EXCEPT_EMPTY_GUARD),
}
