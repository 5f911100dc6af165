"""Coverage extras beyond the SURVEY §2 inventory: subqueries, pivot/
unpivot, percentile aggregates, deterministic mode, percent_rank/cume_dist,
time-series resample + gap-fill + moving averages, and the SQL API entry
point. Same rules as everywhere else: oracled, deterministic, shuffle-lean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lambdatotheslaughter_spark.bucketed import bucketed_order
from lambdatotheslaughter_spark.determinism import (
    iround,
    cavg, csum, dsum, oracle_cavg, oracle_csum, oracle_dsum)
from lambdatotheslaughter_spark.registry import register
from lambdatotheslaughter_spark.tables import load_table


@register("agg_percentiles", oracle="""
SELECT c_mktsegment,
       round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 6) AS p99,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""")
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per segment. Rounded to 6 dp: linear
    interpolation ((a+b)/2 vs a+(b-a)*f) can differ in the last ulp."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    j = o.join(c, o.o_custkey == c.c_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 6).alias("p99"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register("agg_mode_deterministic", oracle="""
SELECT user_id, event_type AS top_type, cnt AS top_type_count FROM (
  SELECT user_id, event_type, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY COUNT(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
""")
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type. Built from count + row_number instead of
    mode(): both engines' mode() break frequency ties arbitrarily — this
    formulation pins the tie-break (count desc, type asc)."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("cnt").desc(), F.col("event_type"))
    return (
        ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_type"),
                F.col("cnt").alias("top_type_count"))
    )


def _pivot_cell(etype: str) -> str:
    return (f"(CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) "
            f"FILTER (WHERE event_type = '{etype}') AS DOUBLE) / 100.0)")


_PIVOT_ORACLE = f"""
SELECT user_id,
       {_pivot_cell('click')} AS click,
       {_pivot_cell('view')} AS view,
       {_pivot_cell('purchase')} AS purchase,
       {_pivot_cell('signup')} AS signup,
       {_pivot_cell('error')} AS error
FROM events
GROUP BY user_id
"""


@register("pivot_wide", oracle=_PIVOT_ORACLE)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with EXPLICIT pivot values — never let Spark infer
    them (extra job + nondeterministic column order). Single shuffle."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(csum("value"))
    )


_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT user_id,
         COUNT(*) FILTER (WHERE event_type = 'click') AS click,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase
  FROM events GROUP BY user_id
)
SELECT user_id, 'click' AS event_type, click AS n FROM wide
UNION ALL
SELECT user_id, 'purchase' AS event_type, purchase AS n FROM wide
"""


@register("unpivot_long", oracle=_UNPIVOT_ORACLE)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot (wide → long), the inverse of pivot_wide."""
    ev = load_table(spark, "events", sf_dir)
    wide = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("click"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchase"),
    )
    return wide.unpivot("user_id", ["click", "purchase"], "event_type", "n")


_SUB_SCALAR_ORACLE = f"""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > 2 * (SELECT {oracle_cavg('o_totalprice')} FROM orders)
"""


@register("sub_scalar", oracle=_SUB_SCALAR_ORACLE)
def sub_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above 2× the global average price. The scalar
    is a 1-row broadcast cross join — no driver-side collect, so the plan
    stays fully distributed and re-optimizable."""
    o = load_table(spark, "orders", sf_dir)
    avg_df = o.agg(cavg("o_totalprice").alias("avg_price"))
    return (
        o.crossJoin(F.broadcast(avg_df))
        .where(F.col("o_totalprice") > 2 * F.col("avg_price"))
        .select("o_orderkey", "o_totalprice")
    )


_SUB_CORR_ORACLE = f"""
SELECT p_partkey, p_brand, p_retailprice, brand_avg
FROM (
  SELECT p_partkey, p_brand, p_retailprice,
         (SELECT {oracle_cavg('p2.p_retailprice')}
          FROM part p2 WHERE p2.p_brand = part.p_brand) AS brand_avg
  FROM part
)
WHERE p_retailprice > 1.5 * brand_avg
"""


@register("sub_correlated", oracle=_SUB_CORR_ORACLE)
def sub_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subquery (parts priced ≥1.5× their brand average),
    hand-decorrelated into a window aggregate — the rewrite Catalyst itself
    performs (SURVEY §4), checked against DuckDB's genuinely correlated
    form."""
    p = load_table(spark, "part", sf_dir)
    w = Window.partitionBy("p_brand")
    brand_avg = (F.sum(iround(F.col("p_retailprice") * 100)).over(w)
                 .cast("double") / 100.0
                 / F.count(F.lit(1)).over(w))
    return (
        p.select("p_partkey", "p_brand", "p_retailprice", brand_avg.alias("brand_avg"))
        .where(F.col("p_retailprice") > 1.5 * F.col("brand_avg"))
    )


@register("win_percent_rank_cume", oracle="""
SELECT s_suppkey, s_acctbal,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM supplier
WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
""")
def win_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist over a total order: pure integer-ratio
    doubles, bit-identical unrounded."""
    s = load_table(spark, "supplier", sf_dir)
    w = Window.orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_suppkey", "s_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


_GAPFILL_ORACLE = f"""
WITH days AS (
  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-29',
                                     INTERVAL 1 DAY)) AS DATE) AS day
), daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
         {oracle_csum('value')} AS sum_value
  FROM events GROUP BY CAST(ts AS DATE)
)
SELECT CAST(days.day AS VARCHAR) AS day,
       COALESCE(daily.n_events, 0) AS n_events,
       COALESCE(daily.sum_value, 0.0) AS sum_value
FROM days LEFT JOIN daily ON days.day = daily.day
"""


@register("ts_resample_gapfill", oracle=_GAPFILL_ORACLE)
def ts_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample to daily grain with gap fill: calendar spine
    (sequence) LEFT JOIN daily aggregates, zeros for missing days. The
    spine is generated, not scanned — no shuffle for it; broadcast join."""
    ev = load_table(spark, "events", sf_dir)
    spine = spark.range(1).select(F.explode(F.sequence(
        F.lit("2024-01-01").cast("date"), F.lit("2024-01-29").cast("date"),
        F.expr("INTERVAL 1 DAY"))).alias("day"))
    daily = (ev.groupBy(F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("n_events"),
                  csum("value").alias("sum_value")))
    return (
        spine.join(daily, "day", "left")
        .select(F.col("day").cast("string").alias("day"),
                F.coalesce("n_events", F.lit(0)).alias("n_events"),
                F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"))
    )


_MOVAVG_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(CAST(round(value * 100, 0) AS BIGINT)) AS cents
  FROM events GROUP BY CAST(ts AS DATE)
)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(SUM(cents) OVER w AS DOUBLE) / 100.0 AS sum_7d,
       CAST(SUM(cents) OVER w AS DOUBLE) / 100.0 / COUNT(*) OVER w AS avg_7d
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@register("ts_moving_avg", oracle=_MOVAVG_ORACLE)
def ts_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing sum/average of daily event value — integer-cents in
    the window frame, so the moving sums are exact at any frame position."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(iround(F.col("value") * 100)).alias("cents"))
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    mov_cents = F.sum("cents").over(w).cast("double") / 100.0
    return daily.select(
        F.col("day").cast("string").alias("day"),
        mov_cents.alias("sum_7d"),
        (mov_cents / F.count(F.lit(1)).over(w)).alias("avg_7d"),
    )


_SQL_ENTRY = """
SELECT n_name,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       COUNT(*) AS n_orders,
       (CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
        / 100.0) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
"""


@register("sql_api_entry", oracle=_SQL_ENTRY)
def sql_api_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point (SURVEY §3): IDENTICAL SQL text runs on Spark
    (over temp views) and DuckDB — the dialect-portable subset in action."""
    for name in ("orders", "customer", "nation"):
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
    return spark.sql(_SQL_ENTRY)


_FUNNEL_ORACLE = """
WITH steps AS (
  SELECT user_id,
         MIN(ts) FILTER (WHERE event_type = 'view') AS t_view,
         MIN(ts) FILTER (WHERE event_type = 'click') AS t_click,
         MIN(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(t_view) AS step_view,
       COUNT(CASE WHEN t_click > t_view THEN 1 END) AS step_click_after_view,
       COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
         AS step_full_funnel
FROM steps
"""


@register("funnel_view_click_purchase", oracle=_FUNNEL_ORACLE)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view precedes their first click
    precedes their first purchase. One groupBy with conditional MIN per
    step — a single shuffle however many steps, the scalable funnel shape
    (per-user event sorting never materializes)."""
    ev = load_table(spark, "events", sf_dir)

    def first_ts(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    steps = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"))
    return steps.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("step_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1))
         .alias("step_click_after_view"),
        F.count(F.when((F.col("t_purchase") > F.col("t_click"))
                       & (F.col("t_click") > F.col("t_view")), 1))
         .alias("step_full_funnel"),
    )


_RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
       COUNT(DISTINCT user_id) AS cohort_size,
       COUNT(DISTINCT CASE WHEN day_offset = 1 THEN user_id END) AS d1,
       COUNT(DISTINCT CASE WHEN day_offset = 7 THEN user_id END) AS d7,
       COUNT(DISTINCT CASE WHEN day_offset = 14 THEN user_id END) AS d14
FROM activity
GROUP BY cohort_day
"""


@register("retention_cohorts", oracle=_RETENTION_ORACLE)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted again
    at day +1/+7/+14. Two shuffles total (first-day computation, cohort
    rollup) — no per-user timelines are ever materialized."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", F.to_date("ts").alias("day"))
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (ev.join(firsts, "user_id")
                .select("user_id", "cohort_day",
                        F.datediff("day", "cohort_day").alias("day_offset"))
                .distinct())

    def retained(n):
        return F.countDistinct(
            F.when(F.col("day_offset") == n, F.col("user_id")))

    return (activity.groupBy("cohort_day")
            .agg(F.countDistinct("user_id").alias("cohort_size"),
                 retained(1).alias("d1"),
                 retained(7).alias("d7"),
                 retained(14).alias("d14"))
            .withColumn("cohort_day", F.col("cohort_day").cast("string")))


_ROLLUP_ORACLE = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS o_quarter,
       CAST(GROUPING(CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)) * 2
            + GROUPING(CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT))
            AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice')} AS revenue
FROM orders
GROUP BY ROLLUP (CAST(EXTRACT(year FROM o_orderdate) AS BIGINT),
                 CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT))
"""


@register("agg_rollup", oracle=_ROLLUP_ORACLE)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the (year, quarter) time hierarchy — the prefix-chain
    subtotal lattice (year totals + grand total, without cube's
    quarter-only cut). grouping_id disambiguates Expand's synthesized
    NULLs from real ones. Scale shape: Expand emits 3 grouping sets
    BEFORE the shuffle but partial agg collapses each set map-side, so
    the exchange carries ~3× the small key space, not 3× the rows."""
    o = load_table(spark, "orders", sf_dir)
    yr = F.year("o_orderdate").cast("bigint").alias("o_year")
    qtr = F.quarter("o_orderdate").cast("bigint").alias("o_quarter")
    return o.select(yr, qtr, "o_totalprice").rollup("o_year", "o_quarter").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


_MINMAX_BY_ORACLE = """
WITH ranked AS (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment,
       MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS top_orderkey,
       MAX(CASE WHEN rmax = 1 THEN o_totalprice END) AS top_price,
       MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS bottom_orderkey,
       MAX(CASE WHEN rmin = 1 THEN o_totalprice END) AS bottom_price
FROM ranked GROUP BY c_mktsegment
"""


@register("agg_minmax_by", oracle=_MINMAX_BY_ORACLE)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin) per segment, tie-pinned by ordering on
    struct(price, orderkey) — Spark compares structs lexicographically, so
    frequency ties can never flip the answer between runs or partial-agg
    orders. ONE shuffle (the groupBy); the oracle's two window passes show
    what max_by saves: no per-group sort ever happens, each partial keeps
    a single running champion row. That constant-state property is what
    makes argmax safe on a 100 TB fact table."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    j = o.join(c, o.o_custkey == c.c_custkey)
    key = F.struct("o_totalprice", "o_orderkey")
    return j.groupBy("c_mktsegment").agg(
        F.max_by("o_orderkey", key).alias("top_orderkey"),
        F.max("o_totalprice").alias("top_price"),
        F.min_by("o_orderkey", key).alias("bottom_orderkey"),
        F.min("o_totalprice").alias("bottom_price"),
    )


_CORR_ORACLE = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(covar_pop(l_quantity, l_extendedprice), 4) AS qty_price_covp,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covs,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS price_per_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_corr_covar", oracle=_CORR_ORACLE)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical aggregates (corr / covar_pop / covar_samp /
    regr_slope) per return flag. Both engines use one-pass co-moment
    updates whose partial-merge order differs, so results are rounded
    (corr is O(1): 6 dp; covariances are O(1e4): 4 dp — both leave >10³
    headroom over the ~1e-8 accumulated ulp drift). Scale shape: constant
    per-group state (5 running moments), map-side combinable."""
    li = load_table(spark, "lineitem", sf_dir)
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(q, p), 6).alias("qty_price_corr"),
        F.round(F.covar_pop(q, p), 4).alias("qty_price_covp"),
        F.round(F.covar_samp(q, p), 4).alias("qty_price_covs"),
        F.round(F.regr_slope(p, q), 4).alias("price_per_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_RANGE_WIN_ORACLE = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_trailing_1h,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS BIGINT)
         AS cents_trailing_1h
FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


@register("win_range_interval", oracle=_RANGE_WIN_ORACLE)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per user, count + exact-cents sum of events
    in the trailing hour — a VALUE-based frame (rows whose timestamp is
    within 3600 s), not a row-count frame, so ties share identical frames
    in both engines by definition. Ordering key is epoch seconds (cast
    truncates identically in both). Scale shape: one shuffle on user_id;
    frames never materialize — Spark keeps a sliding aggregate as it walks
    each partition in ts order."""
    ev = load_table(spark, "events", sf_dir)
    sec = F.col("ts").cast("long")
    w = (Window.partitionBy("user_id").orderBy(sec)
         .rangeBetween(-3600, Window.currentRow))
    cents = iround(F.col("value") * 100)
    return ev.select(
        "event_id", "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.sum(cents).over(w).cast("bigint").alias("cents_trailing_1h"),
    )


_POSEXPLODE_ORACLE = """
SELECT * FROM (
  SELECT doc_id,
         CAST(unnest(range(len(string_split(text, ' ')))) AS BIGINT) AS pos,
         unnest(string_split(text, ' ')) AS token
  FROM documents WHERE doc_id < 40
) WHERE pos < 8
"""


@register("explode_posexplode", oracle=_POSEXPLODE_ORACLE)
def explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (explode WITH ORDINALITY): tokenize and keep each token's
    position — the order-preserving flatten that plain explode loses.
    DuckDB's zipped-unnest idiom is the oracle twin. Generators run inside
    whole-stage codegen (no UDF); the doc_id/pos filters land before/after
    the generate respectively, and column pruning drops `text` right after
    the split."""
    d = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 40)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " "))
                 .alias("pos", "token"))
        .where(F.col("pos") < 8)
        .withColumn("pos", F.col("pos").cast("bigint"))
    )


_REGEXP_ALL_ORACLE = """
SELECT doc_id,
       COALESCE(array_to_string(regexp_extract_all(text, 's\\w+'), ' '), '')
         AS s_words,
       CAST(len(regexp_extract_all(text, 's\\w+')) AS INTEGER) AS n_s_words
FROM documents
"""


@register("str_regexp_extract_all", oracle=_REGEXP_ALL_ORACLE)
def str_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all: every s-prefixed token per document, flattened to
    a joined string (arrays stringified for repr-stable hashing, the house
    convention). Both regex engines agree on this portable \\w+ subset.
    JVM-side codegen — the regex never leaves the executor row loop."""
    d = load_table(spark, "documents", sf_dir)
    arr = F.regexp_extract_all("text", F.lit(r"s\w+"), 0)
    return d.select(
        "doc_id",
        F.array_join(arr, " ").alias("s_words"),
        F.size(arr).alias("n_s_words"),
    )


_BITWISE_ORACLE = """
SELECT l_returnflag,
       CAST(bit_and(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS and_ln,
       CAST(bit_or(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS or_ln,
       CAST(bit_xor(CAST(l_orderkey AS BIGINT)) AS BIGINT) AS xor_key,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


@register("agg_bitwise", oracle=_BITWISE_ORACLE)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates — flag-mask consolidation and the
    XOR-checksum idiom (a missing-row detector: XOR of a key column is
    order-independent and cancels on pairs). Exact integer ops, fully
    associative/commutative — deterministic under any partial-agg order,
    no rounding discipline needed."""
    li = load_table(spark, "lineitem", sf_dir)
    ln = F.col("l_linenumber").cast("bigint")
    return li.groupBy("l_returnflag").agg(
        F.bit_and(ln).alias("and_ln"),
        F.bit_or(ln).alias("or_ln"),
        F.bit_xor(F.col("l_orderkey").cast("bigint")).alias("xor_key"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_BOOL_ORACLE = """
SELECT o_orderstatus,
       bool_and(o_totalprice > 1000.0) AS all_over_1k,
       bool_or(o_totalprice > 400000.0) AS any_over_400k,
       CAST(count_if(o_totalprice > 100000.0) AS BIGINT) AS n_over_100k,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


@register("agg_boolean", oracle=_BOOL_ORACLE)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates: bool_and / bool_or (ANSI EVERY/ANY) and
    count_if — the assertion-style data-quality checks ("every order
    positive", "any outlier present") pushed into one aggregation pass.
    Associative/commutative, deterministic under any partial-agg order."""
    o = load_table(spark, "orders", sf_dir)
    p = F.col("o_totalprice")
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(p > 1000.0).alias("all_over_1k"),
        F.bool_or(p > 400000.0).alias("any_over_400k"),
        F.count_if(p > 100000.0).cast("bigint").alias("n_over_100k"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_INTERP_ORACLE = """
WITH spine AS (
  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-29',
                                     INTERVAL 1 DAY)) AS DATE) AS day
), known AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events
  WHERE EXTRACT(day FROM CAST(ts AS DATE)) % 3 <> 0
  GROUP BY CAST(ts AS DATE)
), marked AS (
  SELECT spine.day, known.cents,
         CAST(datediff('day', DATE '2024-01-01', spine.day) AS BIGINT) AS dn,
         CASE WHEN known.cents IS NOT NULL
              THEN CAST(datediff('day', DATE '2024-01-01', spine.day) AS BIGINT)
         END AS dnk
  FROM spine LEFT JOIN known ON spine.day = known.day
), bounds AS (
  SELECT day, cents, dn,
         last_value(cents IGNORE NULLS) OVER
           (ORDER BY dn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS pv,
         last_value(dnk IGNORE NULLS) OVER
           (ORDER BY dn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS pd,
         first_value(cents IGNORE NULLS) OVER
           (ORDER BY dn ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS nv,
         first_value(dnk IGNORE NULLS) OVER
           (ORDER BY dn ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS nd
  FROM marked
)
SELECT CAST(day AS VARCHAR) AS day,
       cents IS NOT NULL AS observed,
       round(CASE
         WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
         WHEN pv IS NULL THEN CAST(nv AS DOUBLE)
         WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
         ELSE pv + CAST((nv - pv) * (dn - pd) AS DOUBLE) / (nd - pd)
       END / 100.0, 6) AS value_interp
FROM bounds
"""


@register("ts_interpolate_linear", oracle=_INTERP_ORACLE)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over time-series gaps: days divisible by 3 are
    withheld as 'missing', then reconstructed from the neighboring known
    points (flat extrapolation at the edges) — the imputation step between
    zero-fill (ts_resample_gapfill) and a model. Known values are exact
    int cents, the interpolation ratio is an integer-over-integer double,
    rounded 6 dp.

    Scale shape: the forward/backward scans are two frames over ONE
    date-ordered window; at 100 TB the series would partition by entity
    (per-metric, per-device) exactly like win_range_interval — the global
    order here exists only because a calendar spine is 29 rows."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    spine = spark.range(1).select(F.explode(F.sequence(
        F.lit("2024-01-01").cast("date"), F.lit("2024-01-29").cast("date"),
        F.expr("INTERVAL 1 DAY"))).alias("day"))
    known = (ev.where(F.dayofmonth(F.to_date("ts")) % 3 != 0)
             .groupBy(F.to_date("ts").alias("day"))
             .agg(F.sum(iround(F.col("value") * 100))
                  .cast("bigint").alias("cents")))
    marked = (spine.join(known, "day", "left")
              .withColumn("dn", F.datediff("day", F.lit("2024-01-01"))
                          .cast("bigint")))
    dn_if_known = F.when(F.col("cents").isNotNull(), F.col("dn"))
    w_prev = Window.orderBy("dn").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy("dn").rowsBetween(0, Window.unboundedFollowing)
    b = marked.select(
        "day", "cents", "dn",
        F.last("cents", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(dn_if_known, ignorenulls=True).over(w_prev).alias("pd"),
        F.first("cents", ignorenulls=True).over(w_next).alias("nv"),
        F.first(dn_if_known, ignorenulls=True).over(w_next).alias("nd"),
    )
    interp = (F.when(F.col("cents").isNotNull(), F.col("cents").cast("double"))
              .when(F.col("pv").isNull(), F.col("nv").cast("double"))
              .when(F.col("nv").isNull(), F.col("pv").cast("double"))
              .otherwise(F.col("pv") + ((F.col("nv") - F.col("pv"))
                         * (F.col("dn") - F.col("pd"))).cast("double")
                         / (F.col("nd") - F.col("pd"))))
    return b.select(
        F.col("day").cast("string").alias("day"),
        F.col("cents").isNotNull().alias("observed"),
        F.round(interp / 100.0, 6).alias("value_interp"),
    )


_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
           AS dn
  FROM events
), grp AS (
  SELECT user_id, dn,
         dn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dn) AS g
  FROM days
), runs AS (
  SELECT user_id, g, COUNT(*) AS run_len, MIN(dn) AS run_start
  FROM grp GROUP BY user_id, g
)
SELECT user_id,
       MAX(run_len) AS longest_streak,
       CAST(MIN(CASE WHEN run_len = ms THEN run_start END) AS BIGINT)
         AS streak_start_dn,
       COUNT(*) AS n_runs
FROM (SELECT *, MAX(run_len) OVER (PARTITION BY user_id) AS ms FROM runs)
GROUP BY user_id
"""


@register("win_streaks_islands", oracle=_STREAK_ORACLE)
def win_streaks_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-active-day streak per user via
    the classic dn − row_number() grouping trick (consecutive days share
    the difference). Earliest start pins the tie when two streaks share
    the max length. Scale shape: everything partitions by user_id — one
    shuffle, bounded per-user state, no cross-user dependency."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    days = (ev.select("user_id",
                      F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
                      .cast("bigint").alias("dn"))
            .distinct())
    g = F.col("dn") - F.row_number().over(
        Window.partitionBy("user_id").orderBy("dn"))
    runs = (days.withColumn("g", g)
            .groupBy("user_id", "g")
            .agg(F.count(F.lit(1)).alias("run_len"),
                 F.min("dn").alias("run_start")))
    ms = F.max("run_len").over(Window.partitionBy("user_id"))
    return (runs.withColumn("ms", ms)
            .groupBy("user_id")
            .agg(F.max("run_len").alias("longest_streak"),
                 F.min(F.when(F.col("run_len") == F.col("ms"),
                              F.col("run_start"))).cast("bigint")
                  .alias("streak_start_dn"),
                 F.count(F.lit(1)).alias("n_runs")))


_SEQ_PATTERN_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, COUNT(*) AS n_matches,
       CAST(MIN(event_id) AS BIGINT) AS first_match_event
FROM ordered
WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
GROUP BY user_id
"""


@register("seq_pattern_match", oracle=_SEQ_PATTERN_ORACLE)
def seq_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern matching: strictly consecutive view→click→
    purchase triples in each user's event stream (MATCH_RECOGNIZE-lite,
    expressed with lead) — stricter than the funnel, which allows
    arbitrary events between steps. Ordering is (ts, event_id): unique,
    so both engines see identical sequences. One shuffle on user_id."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id", "event_id", "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"))
    return (o.where((F.col("event_type") == "view") & (F.col("t1") == "click")
                    & (F.col("t2") == "purchase"))
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_matches"),
                 F.min("event_id").cast("bigint").alias("first_match_event")))


_SLIDING_DISTINCT_ORACLE = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), days AS (
  SELECT DISTINCT day FROM du
)
SELECT CAST(d.day AS VARCHAR) AS t_day,
       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_users_7d
FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
GROUP BY d.day
"""


@register("agg_sliding_distinct_users", oracle=_SLIDING_DISTINCT_ORACLE)
def agg_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day (rolling MAU/WAU shape) —
    COUNT(DISTINCT) over a sliding window, which no SQL window frame can
    express (DISTINCT isn't frameable) and the naive form computes as one
    self-join per day. The scalable shape is contribute-then-count:
    dedup to (day, user), explode each observation to the ≤7 target days
    it influences (a forward date `sequence` — pure arithmetic, no join),
    dedup (target_day, user) again since a user active on several source
    days still counts once, and count per target day. Three
    map-side-combinable distinct/count aggregations, zero self-joins,
    volume bounded by 7× the daily-active table — the same pattern
    extends to any trailing-k-period distinct. Target days are clamped to
    observed days with a broadcast semi-join (~30 rows). Day emitted as
    an ISO string (DATE cells cross the Spark/DuckDB pandas boundary as
    different types)."""
    ev = load_table(spark, "events", sf_dir)
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = du.select(F.col("day").alias("t_day")).distinct()
    contrib = (
        du.select(
            F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6)))
             .alias("t_day"),
            "user_id")
        .join(F.broadcast(days), "t_day", "left_semi")
        .distinct()
    )
    return (contrib.groupBy("t_day")
            .agg(F.count(F.lit(1)).alias("n_users_7d"))
            .select(F.col("t_day").cast("string").alias("t_day"),
                    "n_users_7d"))


_OHLC_ORACLE = """
SELECT event_type,
       CAST(time_bucket(INTERVAL 6 HOURS, ts) AS VARCHAR) AS bucket,
       round(arg_min(value, ts + INTERVAL (event_id % 1000000) MICROSECONDS), 6) AS open,
       round(MAX(value), 6) AS high,
       round(MIN(value), 6) AS low,
       round(arg_max(value, ts + INTERVAL (event_id % 1000000) MICROSECONDS), 6) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type, time_bucket(INTERVAL 6 HOURS, ts)
"""


@register("ts_ohlc_resample", oracle=_OHLC_ORACLE)
def ts_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (open/high/low/close) resampling per (series, 6-hour bucket) —
    the canonical financial/metrics downsample. open/close are
    ``min_by``/``max_by`` on a TOTAL order (ts is not unique per type at
    µs grain, so the order key is ts perturbed by event_id micros — the
    same tie-pinning discipline as agg_minmax_by; both engines use the
    identical composite key, making first/last deterministic instead of
    arrival-order luck). Single map-side-combinable groupBy: min_by/
    max_by carry one (key, value) pair of state per group, so the shape
    is one shuffle of 4-tuples regardless of corpus size."""
    ev = load_table(spark, "events", sf_dir)
    bucket = F.timestamp_seconds(
        (F.unix_timestamp("ts") / (6 * 3600)).cast("bigint") * (6 * 3600))
    order_key = F.timestamp_micros(
        F.unix_micros("ts") + F.col("event_id") % 1_000_000)
    return (
        ev.select("event_type", bucket.alias("bucket"), "value",
                  order_key.alias("ok"))
        .groupBy("event_type", "bucket")
        .agg(F.round(F.min_by("value", "ok"), 6).alias("open"),
             F.round(F.max("value"), 6).alias("high"),
             F.round(F.min("value"), 6).alias("low"),
             F.round(F.max_by("value", "ok"), 6).alias("close"),
             F.count(F.lit(1)).alias("n_events"))
        .withColumn("bucket", F.col("bucket").cast("string"))
    )


_SCD2_ORACLE = """
WITH feed AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
), chg AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey FROM feed
  WHERE prev IS NULL OR prev <> o_orderpriority
)
SELECT o_custkey AS custkey, o_orderpriority AS priority,
       CAST(o_orderdate AS VARCHAR) AS valid_from,
       CAST(LEAD(o_orderdate) OVER w AS VARCHAR) AS valid_to,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
       (LEAD(o_orderdate) OVER w IS NULL) AS is_current
FROM chg
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("scd2_dimension_merge", oracle=_SCD2_ORACLE)
def scd2_dimension_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build — the warehouse MERGE shape:
    a change feed (orders as per-customer priority observations) collapses
    into versioned half-open validity ranges [valid_from, valid_to) with an
    `is_current` flag. Two window passes over the SAME (custkey) partition
    and (date, orderkey) sort: lag() drops consecutive no-op observations,
    then lead()/row_number() assign ranges and versions — Catalyst reuses
    one shuffle + sort for both (a single Exchange in the plan). At 100 TB
    this is one shuffle of the change feed, no self-joins; the incremental
    variant (merge today's feed into yesterday's dimension) follows by
    unioning the open-ended current rows with the new feed and re-running
    the same two windows over only the affected keys. Tie-break on
    (o_orderdate, o_orderkey) makes same-day flip-flops deterministic in
    both engines. Dates emitted as ISO strings (timestamp cells cross the
    Spark/DuckDB pandas boundary as different types)."""
    o = load_table(spark, "orders", sf_dir)
    feed = o.select("o_custkey", "o_orderpriority", "o_orderdate",
                    "o_orderkey")
    scd = scd2_collapse(feed, key="o_custkey", attr="o_orderpriority",
                        ord_cols=["o_orderdate", "o_orderkey"],
                        valid_col="o_orderdate")
    return scd.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("string").alias("valid_from"),
        F.col("valid_to").cast("string").alias("valid_to"),
        "version",
        "is_current")


def scd2_collapse(feed: DataFrame, key: str, attr: str,
                  ord_cols: list, valid_col: str) -> DataFrame:
    """The SCD2 core, shared by the batch operator and the streaming
    foreachBatch incremental merge (tests/test_streaming.py): collapse a
    change feed into versioned ranges. Output keeps the feed columns and
    adds version / valid_to (the NEXT range's `valid_col`) / is_current.
    Both window passes share one (key) shuffle + one sort — plan-pinned
    in tests/test_plans.py."""
    w = Window.partitionBy(key).orderBy(*ord_cols)
    chg = (feed.withColumn("prev", F.lag(attr).over(w))
           .where(F.col("prev").isNull() | (F.col("prev") != F.col(attr)))
           .drop("prev"))
    return (chg.withColumn("version", F.row_number().over(w).cast("bigint"))
            .withColumn("valid_to", F.lead(valid_col).over(w))
            .withColumn("is_current", F.col("valid_to").isNull()))


_EXISTS_ORACLE = """
SELECT c.c_custkey, c.c_mktsegment, round(c.c_acctbal, 2) AS acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '5-LOW')
"""


@register("sub_exists_not_exists", oracle=_EXISTS_ORACLE)
def sub_exists_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS subqueries — the remaining subquery
    surface beyond sub_scalar/sub_correlated: customers with at least one
    big-ticket order and zero low-priority orders. IDENTICAL SQL text runs
    on both engines (dialect-portable subset). Catalyst rewrites the pair
    into a LEFT SEMI + LEFT ANTI join on o_custkey — hash joins, not
    per-row subquery execution, so the shape is two shuffles of the
    (filtered, column-pruned) orders key column at any scale."""
    for name in ("orders", "customer"):
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
    return spark.sql(_EXISTS_ORACLE)


_CDC_ORACLE = """
WITH last AS (
  SELECT user_id, event_type, value FROM (
    SELECT user_id, event_type, value,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1
)
SELECT COALESCE(c.c_custkey, l.user_id) AS key,
       round(CASE WHEN l.user_id IS NULL THEN c.c_acctbal
                  ELSE l.value END, 6) AS value,
       CASE WHEN l.user_id IS NULL THEN 'base' ELSE 'cdc' END AS src
FROM customer c FULL JOIN last l ON c.c_custkey = l.user_id
WHERE l.user_id IS NULL OR l.event_type <> 'purchase'
"""


@register("cdc_apply_changelog", oracle=_CDC_ORACLE)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply — the MERGE INTO shape completing the
    warehouse trio (scd2_dimension_merge keeps history,
    stream_upsert_latest serves the stream, this APPLIES a change batch
    to a base snapshot): events act as a changelog keyed by user
    (purchase = delete, anything else = upsert of `value`), customers are
    the base. Latest-wins per key (total order ts desc, event_id desc),
    then a FULL OUTER join merges: unchanged base rows pass through,
    upserts replace or insert, deletes drop the key. Scale shape: one
    window shuffle on the changelog key + one co-partitioned outer join —
    the changelog never amplifies, and in production the same dataflow is
    the idempotent MERGE a transactional table format executes."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    last = (ev.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "event_type", "value"))
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_acctbal")
    m = c.join(last, c.c_custkey == last.user_id, "full_outer")
    return (
        m.where(F.col("user_id").isNull() | (F.col("event_type") != "purchase"))
        .select(
            F.coalesce("c_custkey", "user_id").alias("key"),
            F.round(F.when(F.col("user_id").isNull(), F.col("c_acctbal"))
                    .otherwise(F.col("value")), 6).alias("value"),
            F.when(F.col("user_id").isNull(), F.lit("base"))
            .otherwise(F.lit("cdc")).alias("src"))
    )


_LISTAGG_SPARK = """
SELECT c_mktsegment,
       listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name) AS names,
       COUNT(*) AS n
FROM customer WHERE c_custkey <= 200
GROUP BY c_mktsegment
"""

_LISTAGG_ORACLE = """
SELECT c_mktsegment,
       string_agg(c_name, ',' ORDER BY c_name) AS names,
       CAST(COUNT(*) AS BIGINT) AS n
FROM customer WHERE c_custkey <= 200
GROUP BY c_mktsegment
"""


@register("agg_listagg_ordered", oracle=_LISTAGG_ORACLE)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL:2016 LISTAGG ... WITHIN GROUP,
    Spark 4): concatenate group members in a PINNED order — without the
    WITHIN GROUP clause the concatenation order is partition-arrival
    luck, the exact nondeterminism this engine's discipline forbids
    (same reason agg_collect_sorted sorts its arrays). DuckDB's dialect
    spells it string_agg(x, sep ORDER BY x) — one of the few places the
    portable-SQL twin needs different text for identical semantics.
    Scale: the per-group string grows with group size — LISTAGG is for
    bounded groups (the c_custkey cap here stands in for that contract);
    unbounded concatenation belongs in arrays/files, not a cell."""
    load_table(spark, "customer", sf_dir).createOrReplaceTempView("customer")
    return spark.sql(_LISTAGG_SPARK)


_MOVMED_ORACLE = """
SELECT user_id, event_id,
       round(quantile_cont(value, 0.5) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS med5
FROM events
"""


@register("win_moving_median", oracle=_MOVMED_ORACLE)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 5-row moving MEDIAN per user — robust smoothing where
    ts_moving_avg's mean is outlier-hostage. Spark's `median()` refuses a
    window frame, but `percentile(x, 0.5)` over a ROWS frame is the same
    interpolated statistic and IS frameable. The frame is anchored on a
    TOTAL order (ts, event_id — unique per user), so both engines see
    identical 5-row windows; rounded to 6 dp because the two engines'
    linear interpolation can differ in the last ulp (same discipline as
    agg_percentiles). Scale: one shuffle on user_id, per-row O(frame)
    work — frame-bounded order statistics, not a per-group sort."""
    ev = load_table(spark, "events", sf_dir)
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_micros("ts"), "event_id")
         .rowsBetween(-4, 0))
    return ev.select(
        "user_id", "event_id",
        F.round(F.percentile("value", F.lit(0.5)).over(w), 6).alias("med5"))


_IN_SUBQ_ORACLE = """
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 350000)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderstatus = 'P')
GROUP BY n_name
"""


@register("sub_in_not_in", oracle=_IN_SUBQ_ORACLE)
def sub_in_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subqueries — the membership-subquery surface
    completing sub_scalar / sub_correlated / sub_exists_not_exists:
    per-nation count of customers with a big-ticket order and no pending
    order. IDENTICAL SQL text on both engines. Catalyst plans IN as LEFT
    SEMI and NOT IN as null-aware LEFT ANTI — hash joins on the
    (filtered, pruned) key column. NOT IN's three-valued logic is the
    trap (one NULL in the subquery empties the result); o_custkey is
    non-nullable here, and at scale the null-aware anti join is why NOT
    IN on a nullable key forces a broadcast — prefer NOT EXISTS there."""
    for name in ("orders", "customer", "nation"):
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
    return spark.sql(_IN_SUBQ_ORACLE)


_LATERAL_ORACLE = """
SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
WHERE c.c_custkey <= 300
"""


@register("join_lateral_topn", oracle=_LATERAL_ORACLE)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL subquery (correlated derived table): top-2 orders PER
    customer written the way an analyst writes it — identical SQL text
    on both engines. The tie on o_totalprice is pinned by o_orderkey in
    the lateral ORDER BY, making LIMIT deterministic. Catalyst rewrites
    the lateral into the same window/topk-per-group machinery as
    win_topk_per_group (DomainJoin → rank filter), so the declarative
    per-row subquery costs one partitioned window at scale, not a
    per-customer re-execution."""
    for name in ("orders", "customer"):
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
    return spark.sql(_LATERAL_ORACLE)


_EWMA_K = 8
_EWMA_DECAY = 0.75  # 1 - alpha, alpha = 0.25

_EWMA_ORACLE = f"""
WITH t AS (
  SELECT user_id, event_id,
         list(value) OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id
                           ROWS BETWEEN {_EWMA_K - 1} PRECEDING
                                    AND CURRENT ROW) AS l
  FROM events
)
SELECT user_id, event_id,
       round(list_sum(list_transform(
               l, (x, i) -> x * {_EWMA_DECAY} ** (len(l) - i)))
             / ((1 - {_EWMA_DECAY} ** len(l)) / {1 - _EWMA_DECAY}), 6)
         AS ewma8
FROM t
"""


@register("ts_ewma_bounded", oracle=_EWMA_ORACLE)
def ts_ewma_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-horizon EWMA (α=0.25 over the trailing 8 observations per
    user) — the streaming-metrics smoother. TRUE EWMA is a recursion no
    SQL window frame can express; truncating at K observations makes it
    a frame computation with < (1-α)^K ≈ 10% residual weight, and the
    truncated form re-normalizes so weights always sum to 1. The frame's
    collect_list preserves frame order on a TOTAL order (ts, event_id),
    weights come from an indexed transform (Spark indexes 0-based, DuckDB
    1-based — the exponent is written per-engine so the weight vectors
    are identical), and the normalizer is the closed-form geometric sum.
    Both engines fold the same ≤8 doubles in the same order; 6-dp
    rounding absorbs the last ulp. One shuffle on user_id, O(K) per row."""
    ev = load_table(spark, "events", sf_dir)
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_micros("ts"), "event_id")
         .rowsBetween(-( _EWMA_K - 1), 0))
    lst = ev.select("user_id", "event_id",
                    F.collect_list("value").over(w).alias("l"))
    n = F.size("l")
    decay = F.lit(_EWMA_DECAY)
    num = F.aggregate(
        F.transform("l", lambda x, i: x * F.pow(decay, n - 1 - i)),
        F.lit(0.0), lambda acc, x: acc + x)
    den = (F.lit(1.0) - F.pow(decay, n)) / F.lit(1 - _EWMA_DECAY)
    return lst.select("user_id", "event_id",
                      F.round(num / den, 6).alias("ewma8"))


_NTH_ORACLE = """
SELECT c_mktsegment,
       o_orderkey,
       nth_value(o_orderkey, 3) OVER w AS third_orderkey,
       first_value(o_orderkey) OVER w AS first_orderkey
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey <= 2000
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register("win_nth_value", oracle=_NTH_ORACLE)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value / first_value over a running frame — the remaining
    window-navigation surface beyond win_first_last's lead/lag/last:
    'the 3rd-biggest order seen so far per segment'. NULL until the
    frame holds 3 rows (both engines agree on the NULL prefix by
    definition). Total order (price desc, orderkey) pins ties; the
    frame is the default running frame so nth_value scans no further
    than the current row. One shuffle on the window partition key."""
    o = load_table(spark, "orders", sf_dir).where(F.col("o_orderkey") <= 2000)
    c = load_table(spark, "customer", sf_dir)
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    w = (Window.partitionBy("c_mktsegment")
         .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return j.select(
        "c_mktsegment", "o_orderkey",
        F.nth_value("o_orderkey", 3).over(w).alias("third_orderkey"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
    )


_REPORT_SQL = """
WITH seg_rev AS (
  SELECT c_mktsegment AS segment, c_custkey,
         SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents,
         COUNT(*) AS n_orders
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, c_custkey
), seg_stats AS (
  SELECT segment,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(cents) AS BIGINT) AS seg_cents
  FROM seg_rev GROUP BY segment
), ranked AS (
  SELECT segment, c_custkey, cents,
         ROW_NUMBER() OVER (PARTITION BY segment
                            ORDER BY cents DESC, c_custkey) AS rn
  FROM seg_rev
)
SELECT s.segment, s.n_customers, s.seg_cents,
       (CAST(s.seg_cents AS DOUBLE) / s.n_customers / 100.0)
         AS avg_cust_revenue,
       r.c_custkey AS top_custkey,
       (CAST(r.cents AS DOUBLE) / 100.0) AS top_cust_revenue
FROM seg_stats s JOIN ranked r ON s.segment = r.segment AND r.rn = 1
"""


@register("sql_report_cte_chain", oracle=_REPORT_SQL)
def sql_report_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analyst-report shape: a 3-CTE chain (per-customer revenue →
    per-segment stats → tie-pinned top customer) joined into one result,
    IDENTICAL SQL text on both engines — sql_api_entry's single-block
    portability claim extended to the multi-CTE programs real dashboards
    run. Money stays in exact integer cents through every CTE and
    converts to double exactly once at the edge (the engine's
    determinism discipline, expressed in portable SQL). Catalyst plans
    the chain as ordinary nested plans — CTEs are not materialization
    barriers — so the whole report is one optimizable tree: segment agg
    reuses the seg_rev shuffle, the window tops it, no CTE re-execution."""
    for name in ("orders", "customer"):
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
    return spark.sql(_REPORT_SQL)


_ZSCORE_ORACLE = """
WITH scored AS (
  SELECT event_id, event_type, ts, value,
         COUNT(*) OVER wp AS n_prior,
         AVG(value) OVER wp AS mu,
         STDDEV_SAMP(value) OVER wp AS sigma
  FROM events
  WINDOW wp AS (PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, event_type, ts, value,
       round((value - mu) / sigma, 6) AS z
FROM scored
WHERE n_prior >= 10 AND sigma > 0
  AND abs(round((value - mu) / sigma, 6)) >= 2.5
"""


@register("ts_anomaly_zscore", oracle=_ZSCORE_ORACLE)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection per event-type series: each value
    scored against the mean/stddev of the 20 PRIOR observations (frame ends
    at 1 PRECEDING — the online-monitoring form, where the current point
    must not contaminate its own baseline), flagged at |z| >= 2.5 once the
    baseline has >= 10 points. One window pass over a (series, time) sort —
    the same single-shuffle shape as the other ts_* ops, embarrassingly
    parallel across series at 100 TB.

    Determinism: the frame is anchored on the (ts, event_id) total order;
    the threshold is applied to the 6-dp-ROUNDED z on both engines (the
    radius-search discipline — an unrounded comparison could admit a pair
    on one engine and not the other within one ulp)."""
    ev = load_table(spark, "events", sf_dir)
    wp = (Window.partitionBy("event_type").orderBy("ts", "event_id")
          .rowsBetween(-20, -1))
    scored = ev.select(
        "event_id", "event_type", "ts", "value",
        F.count(F.lit(1)).over(wp).alias("n_prior"),
        F.avg("value").over(wp).alias("mu"),
        F.stddev_samp("value").over(wp).alias("sigma"))
    z = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 6)
    return (scored
            .where((F.col("n_prior") >= 10) & (F.col("sigma") > 0)
                   & (F.abs(z) >= 2.5))
            .select("event_id", "event_type", "ts", "value", z.alias("z")))


_SCD2_PIT_ORACLE = """
WITH feed AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
), chg AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey FROM feed
  WHERE prev IS NULL OR prev <> o_orderpriority
), dim AS (
  SELECT o_custkey AS custkey, o_orderpriority AS priority,
         o_orderdate AS valid_from,
         LEAD(o_orderdate) OVER w AS valid_to,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS version
  FROM chg
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
)
SELECT f.o_orderkey AS fact_key, f.o_custkey AS custkey,
       CAST(f.o_orderdate AS VARCHAR) AS fact_date,
       d.version, d.priority AS dim_priority,
       (f.o_orderpriority = d.priority) AS priority_matches
FROM orders f JOIN dim d
  ON f.o_custkey = d.custkey
 AND f.o_orderdate >= d.valid_from
 AND (d.valid_to IS NULL OR f.o_orderdate < d.valid_to)
"""


@register("join_scd2_point_in_time", oracle=_SCD2_PIT_ORACLE)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup — the query SCD2 exists FOR: each
    fact row joined to the dimension version that was valid at the fact's
    own date (valid_from <= t < valid_to, open current range matches
    everything after valid_from). Half-open ranges tile the timeline, so
    every fact matches EXACTLY one version — no post-dedup, and the
    `priority_matches` flag surfaces the one honest subtlety (same-day
    flip-flops: a fact can predate its date's final version in the
    (date, orderkey) feed order).

    Scale shape: the EQUI key (custkey) carries the join — one shuffle,
    hash or sort-merge — and the range predicate filters inside each
    key's version list (bounded by versions-per-key, typically a
    handful); never a time-theta join across keys. Shares scd2_collapse
    with the dimension build and the streaming incremental merge, so
    serving lookups and dimension maintenance cannot drift."""
    o = load_table(spark, "orders", sf_dir)
    feed = o.select("o_custkey", "o_orderpriority", "o_orderdate",
                    "o_orderkey")
    dim = (scd2_collapse(feed, key="o_custkey", attr="o_orderpriority",
                         ord_cols=["o_orderdate", "o_orderkey"],
                         valid_col="o_orderdate")
           .select(F.col("o_custkey").alias("custkey"),
                   F.col("o_orderpriority").alias("dim_priority"),
                   F.col("o_orderdate").alias("valid_from"),
                   "valid_to", "version"))
    facts = o.select(F.col("o_orderkey").alias("fact_key"),
                     F.col("o_custkey").alias("custkey"),
                     F.col("o_orderdate").alias("fact_date"),
                     F.col("o_orderpriority").alias("fact_priority"))
    return (facts.join(
                dim,
                (facts.custkey == dim.custkey)
                & (F.col("fact_date") >= F.col("valid_from"))
                & (F.col("valid_to").isNull()
                   | (F.col("fact_date") < F.col("valid_to"))))
            .select("fact_key", facts.custkey.alias("custkey"),
                    F.col("fact_date").cast("string").alias("fact_date"),
                    "version", "dim_priority",
                    (F.col("fact_priority") == F.col("dim_priority"))
                    .alias("priority_matches")))


_RCTE_SQL = """
WITH RECURSIVE chain(custkey, root, k) AS (
  SELECT o_custkey, o_orderkey, o_orderkey FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM orders p
                    WHERE p.o_custkey = o.o_custkey
                      AND p.o_orderkey = o.o_orderkey - 1)
  UNION ALL
  SELECT c.custkey, c.root, n.o_orderkey
  FROM chain c JOIN orders n
    ON n.o_custkey = c.custkey AND n.o_orderkey = c.k + 1
)
SELECT custkey, root AS chain_start, CAST(COUNT(*) AS BIGINT) AS chain_len,
       CAST(MAX(k) AS BIGINT) AS chain_end
FROM chain GROUP BY custkey, root
"""


@register("sql_recursive_cte", oracle=_RCTE_SQL)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (SQL:1999, new in Spark 4) running the IDENTICAL
    query text on both engines: per-customer chains of CONSECUTIVE order
    keys, found by anchoring on chain heads (no predecessor key for the
    same customer — a portable NOT EXISTS) and recursively extending by
    key+1. Genuine fixpoint recursion — iteration depth is the longest
    chain in the data, not a constant — where every prior iterative op
    (PageRank, BPE, CC) had to drive the loop from Python; this moves the
    loop INTO the engine. Each recursive step is an equi-join of the
    frontier against orders; termination is structural (keys strictly
    increase and are finite). Scale: the frontier shrinks every round and
    joins on the (custkey, key) composite — a bounded-fan hash join per
    step, embarrassingly parallel across chains."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    return spark.sql(_RCTE_SQL)


_PIPE_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS rev_cents,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderpriority
"""


@register("sql_pipe_syntax", oracle=_PIPE_ORACLE)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4's `|>` operator chaining — the
    FROM-first dataflow form): filter → aggregate → project reads in
    EXECUTION order instead of inside-out SQL. Same Catalyst plan as the
    classic formulation — pipes are pure surface syntax, so pushdown,
    partial aggregation, and codegen are unchanged; the DuckDB oracle IS
    the classic formulation of the same query (pipe syntax is
    Spark-side), making the op a two-dialect equivalence check. Money in
    integer cents end-to-end."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    return spark.sql("""
FROM orders
|> WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
|> AGGREGATE COUNT(*) AS n_orders,
             SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rev_cents,
             COUNT(DISTINCT o_custkey) AS n_customers
   GROUP BY o_orderpriority
|> SELECT o_orderpriority, CAST(n_orders AS BIGINT) AS n_orders,
          CAST(rev_cents AS BIGINT) AS rev_cents,
          CAST(n_customers AS BIGINT) AS n_customers
""")


_PARAM_SQL_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS rev_cents
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-06-01 00:00:00'
  AND o_totalprice < 150000.0
GROUP BY o_orderpriority
"""


@register("sql_parameterized", oracle=_PARAM_SQL_ORACLE)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (named parameter markers, Spark >= 3.4): the
    query text carries `:cutoff` / `:price_cap` placeholders and values
    arrive via `args` — the injection-safe templating surface every
    dashboard and report runner needs (string-concatenated literals are
    both a correctness and a security bug at that layer). The markers
    bind as typed literals BEFORE analysis, so constant folding and
    pushdown see real constants — same plan as hand-inlined literals;
    the oracle is the literal-inlined twin."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders
        WHERE o_orderdate >= :cutoff AND o_totalprice < :price_cap
        GROUP BY o_orderpriority
        """,
        args={"cutoff": "1996-06-01 00:00:00", "price_cap": 150000.0})


_TRANSPOSE_ORACLE = """
WITH m AS (
  SELECT r_name,
         CAST(COUNT(*) AS DOUBLE) AS n_nations,
         CAST(SUM(n_nationkey) AS DOUBLE) AS key_sum
  FROM region JOIN nation ON r_regionkey = n_regionkey
  GROUP BY r_name
)
SELECT 'n_nations' AS key,
       MAX(CASE WHEN r_name = 'AFRICA' THEN n_nations END) AS "AFRICA",
       MAX(CASE WHEN r_name = 'AMERICA' THEN n_nations END) AS "AMERICA",
       MAX(CASE WHEN r_name = 'ASIA' THEN n_nations END) AS "ASIA",
       MAX(CASE WHEN r_name = 'EUROPE' THEN n_nations END) AS "EUROPE",
       MAX(CASE WHEN r_name = 'MIDDLE EAST' THEN n_nations END) AS "MIDDLE EAST"
FROM m
UNION ALL
SELECT 'key_sum',
       MAX(CASE WHEN r_name = 'AFRICA' THEN key_sum END),
       MAX(CASE WHEN r_name = 'AMERICA' THEN key_sum END),
       MAX(CASE WHEN r_name = 'ASIA' THEN key_sum END),
       MAX(CASE WHEN r_name = 'EUROPE' THEN key_sum END),
       MAX(CASE WHEN r_name = 'MIDDLE EAST' THEN key_sum END)
FROM m
"""


@register("df_transpose", oracle=_TRANSPOSE_ORACLE)
def df_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.transpose (new in Spark 4): flip a small per-region
    metrics table so metrics become rows and regions become columns —
    the report-orientation swap analysts otherwise hand-write as N CASE
    projections (the oracle IS that hand-written form, making this a
    semantics cross-check of the new API). Contractually driver-bounded:
    the transposed schema = one column per input ROW, so it is for
    aggregate summaries (here 5 regions), never fact tables; metric
    values are cast to a common double type since a transposed column
    mixes former row cells."""
    r = load_table(spark, "region", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    m = (r.join(n, r.r_regionkey == n.n_regionkey)
         .groupBy("r_name")
         .agg(F.count(F.lit(1)).cast("double").alias("n_nations"),
              F.sum("n_nationkey").cast("double").alias("key_sum"))
         .orderBy("r_name"))
    return m.transpose(F.col("r_name"))


@register("agg_sliding_distinct_hll", oracle=None)
def agg_sliding_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day from PERSISTED per-day HLL
    sketches — the approximate twin of agg_sliding_distinct_users and
    the shape that actually survives 100 TB of history: the exact op
    re-reads 7 days of raw (day, user) observations per answer, while
    this one stores ONE mergeable sketch per day (a few KB) and answers
    any trailing window by unioning ≤7 sketches. The union runs as a
    bounded range join against the days-sized sketch store (7 tiny rows
    per output day — the raw events never move), so re-answering a year
    of rolling MAU touches 365 sketches, not the lake.

    Rows-only by design (HLL estimates are approximate); the pytest gate
    pins every day's estimate within ±5% of the exact op's answer and
    determinism across runs (sketches are deterministic for a given
    input set). Day emitted as ISO string like the exact twin."""
    ev = load_table(spark, "events", sf_dir)
    daily = (ev.select(F.to_date("ts").alias("day"), "user_id")
             .groupBy("day")
             .agg(F.hll_sketch_agg("user_id").alias("sk")))
    a, b = daily.alias("a"), daily.alias("b")
    return (a.join(b, (F.col("b.day") <= F.col("a.day"))
                   & (F.col("b.day") >= F.date_sub(F.col("a.day"), 6)))
            .groupBy(F.col("a.day").alias("t_day"))
            .agg(F.hll_sketch_estimate(F.hll_union_agg(F.col("b.sk")))
                 .cast("bigint").alias("n_users_7d_est"))
            .select(F.col("t_day").cast("string").alias("t_day"),
                    "n_users_7d_est"))


# ---------------------------------------------------------------------------
# month-over-month growth (round 4)
# ---------------------------------------------------------------------------

_MOM_ORACLE = """
WITH monthly AS (
  SELECT n_name,
         date_trunc('month', o_orderdate) AS month,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, date_trunc('month', o_orderdate)
)
SELECT n_name, month, rev_cents,
       LAG(rev_cents) OVER (PARTITION BY n_name ORDER BY month)
         AS prev_rev_cents,
       CAST(rev_cents AS DOUBLE)
         / CAST(LAG(rev_cents) OVER (PARTITION BY n_name ORDER BY month)
                AS DOUBLE) AS growth
FROM monthly
"""


@register("ts_mom_growth", oracle=_MOM_ORACLE)
def ts_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per nation — the standard KPI
    report shape: calendar rollup, then a lag ratio along each entity's
    monthly series (NULL on the first month: no prior period, not 0%).
    Money stays in exact integer cents through the rollup; the final
    growth ratio is one int→double division per row, bit-identical
    across engines.

    Scale shape: the dims broadcast into the orders scan, the rollup
    shuffles only (nation, month) partial sums — group count is
    25 nations × months regardless of fact size — and the lag window
    partitions by nation over that already-tiny table."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name",
                 F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.sum(iround(F.col("o_totalprice") * 100))
             .cast("bigint").alias("rev_cents")))
    w = Window.partitionBy("n_name").orderBy("month")
    prev = F.lag("rev_cents").over(w)
    return monthly.select(
        "n_name", "month", "rev_cents", prev.alias("prev_rev_cents"),
        (F.col("rev_cents").cast("double") / prev.cast("double"))
        .alias("growth"))


# ---------------------------------------------------------------------------
# seasonal decomposition + percent-of-total (round 4)
# ---------------------------------------------------------------------------

_SEASONAL_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS day_cents
  FROM events GROUP BY event_type, date_trunc('day', ts)
), framed AS (
  SELECT event_type, day, day_cents,
         SUM(day_cents) OVER w AS frame_sum,
         COUNT(*) OVER w AS frame_n
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
)
SELECT event_type, day, day_cents,
       CAST(frame_sum AS DOUBLE) / 7.0 AS trend_cents,
       CAST(day_cents AS DOUBLE) - CAST(frame_sum AS DOUBLE) / 7.0
         AS seasonal_cents
FROM framed WHERE frame_n = 7
"""


@register("ts_seasonal_decompose_ma", oracle=_SEASONAL_ORACLE)
def ts_seasonal_decompose_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition, the moving-average form: per
    event_type daily series, trend = CENTERED 7-observation mean (only
    complete frames — edges carry no honest trend), seasonal residual =
    observation − trend. Money stays integer cents through the rollup
    and the frame sum; the two double ops at the end (one divide by the
    literal 7.0, one subtract) are each single correctly-rounded IEEE
    operations, bit-identical across engines.

    Scale shape: the daily rollup shuffles (type, day) partial sums — the
    grain is calendar-bounded regardless of event volume — and the
    centered frame is a per-type ROWS window over that tiny series."""
    ev = load_table(spark, "events", sf_dir)
    daily = (ev.groupBy("event_type",
                         F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum(iround(F.col("value") * 100))
                  .cast("bigint").alias("day_cents")))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    framed = daily.select(
        "event_type", "day", "day_cents",
        F.sum("day_cents").over(w).alias("frame_sum"),
        F.count(F.lit(1)).over(w).alias("frame_n"))
    trend = F.col("frame_sum").cast("double") / F.lit(7.0)
    return (framed.where(F.col("frame_n") == 7)
            .select("event_type", "day", "day_cents",
                    trend.alias("trend_cents"),
                    (F.col("day_cents").cast("double") - trend)
                    .alias("seasonal_cents")))


_PCT_TOTAL_ORACLE = """
WITH monthly AS (
  SELECT n_name, date_trunc('month', o_orderdate) AS month,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, date_trunc('month', o_orderdate)
), tot AS (
  SELECT CAST(SUM(rev_cents) AS BIGINT) AS grand_cents FROM monthly
)
SELECT n_name, month, rev_cents,
       CAST(rev_cents AS DOUBLE)
         / CAST(SUM(rev_cents) OVER (PARTITION BY n_name) AS DOUBLE)
         AS share_of_nation,
       CAST(rev_cents AS DOUBLE) / CAST(grand_cents AS DOUBLE)
         AS share_of_total
FROM monthly CROSS JOIN tot
"""


@register("win_pct_of_total", oracle=_PCT_TOTAL_ORACLE)
def win_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation-month's revenue as a share of its
    nation's total AND of the grand total. The nation share is a
    partitioned window sum; the grand total is a 1-row aggregate
    crossJoined in — NOT an empty-partition window, which would
    single-task the table (the same discipline as llm_vocab_coverage).
    Integer cents throughout; each share is one int→double division.

    Scale shape: one (nation, month) rollup shuffle, a nation-partitioned
    window over the calendar-bounded result, and a broadcast-sized scalar."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name", F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.sum(iround(F.col("o_totalprice") * 100))
             .cast("bigint").alias("rev_cents"))
        .localCheckpoint(eager=False))  # window branch + grand total share it
    tot = monthly.agg(F.sum("rev_cents").cast("bigint").alias("grand_cents"))
    w = Window.partitionBy("n_name")
    return (monthly.crossJoin(tot)
            .select("n_name", "month", "rev_cents",
                    (F.col("rev_cents").cast("double") /
                     F.sum("rev_cents").over(w).cast("double"))
                    .alias("share_of_nation"),
                    (F.col("rev_cents").cast("double") /
                     F.col("grand_cents").cast("double"))
                    .alias("share_of_total")))


# ---------------------------------------------------------------------------
# CUSUM drift / drawdown
# ---------------------------------------------------------------------------

_DRIFT_K_CENTS = 100_000  # |cum deviation| > 1000.00 x n flags drift

_CUSUM_ORACLE = f"""
WITH c AS (
  SELECT event_id, event_type, ts,
         CAST(round(value * 100, 0) AS BIGINT) AS vc
  FROM events
), g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(vc) AS BIGINT) AS s
  FROM c GROUP BY event_type
), d AS (
  SELECT c.event_id, c.event_type, c.ts, c.vc * g.n - g.s AS dev, g.n
  FROM c JOIN g USING (event_type)
), r AS (
  SELECT event_id, event_type, ts, n,
         CAST(SUM(dev) OVER (PARTITION BY event_type ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cusum_fp
  FROM d
), m AS (
  SELECT event_id, event_type, n, cusum_fp,
         CAST(MAX(cusum_fp) OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS runmax_fp
  FROM r
)
SELECT event_id, event_type, cusum_fp,
       runmax_fp - cusum_fp AS drawdown_fp,
       abs(cusum_fp) > {_DRIFT_K_CENTS} * n AS is_drift
FROM m
"""


@register("ts_cusum_drift", oracle=_CUSUM_ORACLE)
def ts_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM-style drift detection per event type: the running sum of
    each observation's deviation from the series mean, plus the running
    peak and the drawdown from it — the change-detection primitive a
    quality dashboard runs over ingestion metrics. All arithmetic is
    integral: deviations are cross-multiplied (vc·n − S instead of
    vc − S/n) so the cumulative sum is an exact BIGINT at every row and
    the drift verdict (|cum| > K·n) cannot flake on a float ulp.
    Int64 bound: |vc·n| ≈ 5e4·n cents — safe past 1e7 rows per type;
    beyond that the same expressions lift to decimal(38,0) unchanged.

    Scale shape: one combinable groupBy for (n, S), broadcast back, then
    a per-type ordered running frame — partitioned by event_type, the
    same bounded-window shape as win_running_frame; a single dominant
    type would call for the range-bucketed two-pass rank instead
    (llm_shuffle_deterministic shows it)."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "ts",
        iround(F.col("value") * 100).alias("vc"))
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("vc").cast("bigint").alias("s"))
    d = ev.join(F.broadcast(g), "event_type").select(
        "event_id", "event_type", "ts", "n",
        (F.col("vc") * F.col("n") - F.col("s")).alias("dev"))
    w = (Window.partitionBy("event_type").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    r = d.select("event_id", "event_type", "ts", "n",
                 F.sum("dev").over(w).cast("bigint").alias("cusum_fp"))
    r = r.select("event_id", "event_type", "n", "cusum_fp",
                 F.max("cusum_fp").over(w).cast("bigint")
                 .alias("runmax_fp"))
    return r.select(
        "event_id", "event_type", "cusum_fp",
        (F.col("runmax_fp") - F.col("cusum_fp")).alias("drawdown_fp"),
        (F.abs(F.col("cusum_fp")) > _DRIFT_K_CENTS * F.col("n"))
        .alias("is_drift"))


# ---------------------------------------------------------------------------
# exact discrete percentiles
# ---------------------------------------------------------------------------

_PCTL_DISC_ORACLE = """
WITH r AS (
  SELECT c_mktsegment, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice, o_orderkey) AS rk,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment,
       MIN(o_totalprice) FILTER (WHERE rk >= (n + 1) // 2) AS p50_disc,
       MIN(o_totalprice) FILTER (WHERE rk >= (9 * n + 9) // 10) AS p90_disc,
       MIN(o_totalprice) FILTER (WHERE rk >= (99 * n + 99) // 100)
         AS p99_disc,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM r GROUP BY c_mktsegment
"""


@register("agg_percentile_disc_exact", oracle=_PCTL_DISC_ORACLE)
def agg_percentile_disc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_DISC per market segment — the discrete complement to
    agg_percentiles' interpolated quantiles. The percentile is an ACTUAL
    data value (the one at rank ceil(p·n)), so the result is bit-exact
    with NO rounding caveat: rank thresholds are pure integer
    arithmetic (ceil(k·n/d) = (k·n + k) DIV d, valid because each
    numerator k here equals d − 1), and the pick is a conditional MIN
    over the ranked rows — identical semantics in both engines, no
    interpolation ulp to round away.

    Scale shape: one window shuffle partitioned by segment (rank + count
    share the exchange), then a combinable conditional-MIN groupBy; the
    same single-exchange shape as any partitioned ranking. A segment
    with billions of rows would switch to the two-pass bucketed rank
    (llm_shuffle_deterministic's scheme) per segment."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    wp = Window.partitionBy("c_mktsegment")
    r = j.select(
        "c_mktsegment", "o_totalprice",
        F.row_number().over(wp.orderBy("o_totalprice", "o_orderkey"))
        .alias("rk"),
        F.count(F.lit(1)).over(wp).alias("n"))
    def pick(num: int, den: int, name: str):
        # integer DIV keeps the ceil exact at any n (no double rounding)
        thresh = F.expr(f"({num} * n + {num}) div {den}")
        return F.min(F.when(F.col("rk") >= thresh,
                            F.col("o_totalprice"))).alias(name)
    return (r.groupBy("c_mktsegment")
            .agg(pick(1, 2, "p50_disc"), pick(9, 10, "p90_disc"),
                 pick(99, 100, "p99_disc"),
                 F.count(F.lit(1)).cast("bigint").alias("n_orders")))


# ---------------------------------------------------------------------------
# ANY/ALL quantified-comparison subqueries (round 5)
# ---------------------------------------------------------------------------

_ANY_ALL_ORACLE = """
SELECT s_suppkey, s_acctbal,
       s_acctbal > ALL (SELECT s_acctbal FROM supplier s2
                        JOIN nation n ON s2.s_nationkey = n.n_nationkey
                        WHERE n.n_name = 'NATION_7') AS beats_all_n7,
       s_acctbal > ANY (SELECT s_acctbal FROM supplier s2
                        JOIN nation n ON s2.s_nationkey = n.n_nationkey
                        WHERE n.n_name = 'NATION_3') AS beats_any_n3
FROM supplier
WHERE s_suppkey <= 500
"""


@register("sub_any_all_rewrite", oracle=_ANY_ALL_ORACLE)
def sub_any_all_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparisons (`> ALL` / `> ANY`) — SQL surface Spark's
    parser does NOT accept, so the engine provides the standard rewrite:
    for a null-free subquery set, ``x > ALL S ⟺ S = ∅ OR x > max(S)``
    and ``x > ANY S ⟺ S ≠ ∅ AND x > min(S)``. The extrema and the row
    counts (the empty-set legs) are scalar aggregates broadcast as a
    1-row cross join, exactly how a correlated decorrelation pass would
    plan it; the oracle runs DuckDB's NATIVE ALL/ANY, so the rewrite is
    value-verified, not self-certified.

    Scale shape: one tiny scalar-aggregate pass (map-side combine to one
    row) + a broadcast nested-loop of width 1 — no shuffle of the outer
    table at any scale."""
    s = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_acctbal", "s_nationkey")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    in_a = F.col("n_name") == "NATION_7"
    in_b = F.col("n_name") == "NATION_3"
    extrema = sn.agg(
        F.max(F.when(in_a, F.col("s_acctbal"))).alias("max_a"),
        F.count(F.when(in_a, F.lit(1))).alias("n_a"),
        F.min(F.when(in_b, F.col("s_acctbal"))).alias("min_b"),
        F.count(F.when(in_b, F.lit(1))).alias("n_b"))
    return (s.where(F.col("s_suppkey") <= 500)
            .crossJoin(F.broadcast(extrema))
            .select("s_suppkey", "s_acctbal",
                    F.when(F.col("n_a") == 0, F.lit(True))
                    .otherwise(F.col("s_acctbal") > F.col("max_a"))
                    .alias("beats_all_n7"),
                    F.when(F.col("n_b") == 0, F.lit(False))
                    .otherwise(F.col("s_acctbal") > F.col("min_b"))
                    .alias("beats_any_n3")))


# ---------------------------------------------------------------------------
# conditional / boolean / any_value aggregate surface (round 5)
# ---------------------------------------------------------------------------

_COUNT_IF_ORACLE = """
SELECT l_returnflag,
       CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk,
       bool_and(l_quantity > 0) AS all_positive,
       bool_or(l_discount > 0.05) AS some_discounted,
       any_value(substring(l_returnflag, 1, 1)) AS flag_initial,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_count_if_any_value", oracle=_COUNT_IF_ORACLE)
def agg_count_if_any_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The predicate-aggregate quartet: count_if / bool_and / bool_or /
    any_value. any_value is nondeterministic BY CONTRACT (either engine
    may pick any row), so the hash-matched usage here applies it to an
    expression constant within each group — the one shape where it is
    both legal and reproducible; arbitrary-column any_value belongs
    behind min_by/max_by (agg_minmax_by) when determinism matters.

    Scale shape: all four are partial-aggregatable (AND/OR/count are
    semilattice folds), so the shuffle carries one row per group."""
    li = load_table(spark, "lineitem", sf_dir)
    return (li.groupBy("l_returnflag")
            .agg(F.count_if(F.col("l_quantity") > 25).cast("bigint")
                 .alias("n_bulk"),
                 F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
                 F.bool_or(F.col("l_discount") > 0.05)
                 .alias("some_discounted"),
                 F.any_value(F.substring("l_returnflag", 1, 1))
                 .alias("flag_initial"),
                 F.count(F.lit(1)).cast("bigint").alias("n_rows")))


# ---------------------------------------------------------------------------
# exact rolling correlation (round 5)
# ---------------------------------------------------------------------------

_ROLLING_CORR_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         SUM(CAST(round(value * 100, 0) AS BIGINT)) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), sums AS (
  -- HUGEINT moments: BIGINT x*x would overflow two orders of scale out
  SELECT event_type, h, x, y,
         CAST(COUNT(*) OVER w AS BIGINT) AS k,
         SUM(CAST(x AS HUGEINT)) OVER w AS sx,
         SUM(CAST(y AS HUGEINT)) OVER w AS sy,
         SUM(CAST(x AS HUGEINT) * x) OVER w AS sxx,
         SUM(CAST(y AS HUGEINT) * y) OVER w AS syy,
         SUM(CAST(x AS HUGEINT) * y) OVER w AS sxy
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
)
SELECT event_type, h, CAST(x AS BIGINT) AS x, y,
       CAST(CAST(k * sxy - sx * sy AS DOUBLE)
            / NULLIF(sqrt(CAST(k * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(k * syy - sy * sy AS DOUBLE)), 0.0)
         AS DOUBLE) AS rolling_corr
FROM sums
WHERE k = 6
"""


@register("ts_rolling_corr", oracle=_ROLLING_CORR_ORACLE)
def ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 6-hour Pearson correlation between hourly revenue and
    hourly event count, per event type — the co-movement monitor behind
    'is spend tracking traffic?' dashboards. Bit-exact despite being a
    float statistic: every frame moment (Σx, Σy, Σxx, Σyy, Σxy) is an
    int64 sum of fixed-point cents, and the final Pearson ratio is the
    same three-operation double expression in both engines (numerator /
    (sqrt·sqrt)), so each step is a single correctly-rounded IEEE op.
    Frames shorter than the full 6 hours are suppressed (k = 6), which
    also dodges the 0/0 warm-up edge.

    Scale shape: the hourly pre-aggregate is the only corpus-sized
    shuffle (map-side combinable); the window runs over (type, hour)
    rows — thousands per type, not events."""
    ev = load_table(spark, "events", sf_dir)
    hourly = (ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
              .agg(F.sum(iround(F.col("value") * 100)).alias("x"),
                   F.count(F.lit(1)).cast("bigint").alias("y")))
    w = (Window.partitionBy("event_type").orderBy("h")
         .rowsBetween(-5, 0))
    # decimal moments (the HUGEINT twin): int64 x*x would overflow once
    # hourly cents pass ~3e9 — two orders of scale from here, which is
    # exactly where this has to keep working
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    sums = hourly.select(
        "event_type", "h", "x", "y",
        F.count(F.lit(1)).over(w).cast("bigint").alias("k"),
        F.sum(xd).over(w).alias("sx"), F.sum(yd).over(w).alias("sy"),
        F.sum(xd * xd).over(w).alias("sxx"),
        F.sum(yd * yd).over(w).alias("syy"),
        F.sum(xd * yd).over(w).alias("sxy"))
    num = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        .cast("double")
    den = (F.sqrt((F.col("k") * F.col("sxx")
                   - F.col("sx") * F.col("sx")).cast("double"))
           * F.sqrt((F.col("k") * F.col("syy")
                     - F.col("sy") * F.col("sy")).cast("double")))
    return (sums.where(F.col("k") == 6)
            .select("event_type", "h", F.col("x").cast("bigint").alias("x"),
                    "y",
                    (num / F.nullif(den, F.lit(0.0))).cast("double")
                    .alias("rolling_corr")))


# ---------------------------------------------------------------------------
# deterministic stride downsampling (round 5)
# ---------------------------------------------------------------------------

_STRIDE_ORACLE = """
SELECT event_id, event_type, ts, value
FROM (
  SELECT event_id, event_type, ts, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY ts, event_id) AS rn
  FROM events
) t
WHERE (rn - 1) % 5 = 0
"""


@register("ts_downsample_stride", oracle=_STRIDE_ORACLE)
def ts_downsample_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-5th-point downsampling per (event_type, day) — the
    deterministic thinning used to cap chart/monitor cardinality while
    keeping temporal coverage (contrast llm_sample_* which sample by
    hash, losing time structure). Partitioning by day, not just type,
    keeps the row_number partitions bounded (one day of one type) so no
    single task ever owns a whole series — the scale property a naive
    PARTITION BY type stride loses.

    (ts, event_id) is the tie-safe total order on both sides."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type", F.date_trunc("day", "ts")) \
        .orderBy("ts", "event_id")
    return (ev.select("event_id", "event_type", "ts", "value",
                      F.row_number().over(w).alias("rn"))
            .where((F.col("rn") - 1) % 5 == 0)
            .select("event_id", "event_type", "ts", "value"))


# ---------------------------------------------------------------------------
# EXECUTE IMMEDIATE (round 5)
# ---------------------------------------------------------------------------

_EXEC_IMM_ORACLE = """
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders WHERE o_orderkey < 500 AND o_orderpriority = '1-URGENT'
"""


@register("sql_execute_immediate", oracle=_EXEC_IMM_ORACLE)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE (Spark 4 SQL scripting surface): a query held as
    a STRING, executed with positional parameters — the dynamic-SQL
    entry point migrations from stored-procedure warehouses expect.
    Complements sql_parameterized (API-level spark.sql(args=...)): here
    the parameter binding happens inside the SQL language itself, so a
    pure-SQL client can do it. Parameters are real bind values, not
    string splices — the injection-safe path."""
    load_table(spark, "orders", sf_dir) \
        .createOrReplaceTempView("lts_orders_exec_v")
    return spark.sql("""
        EXECUTE IMMEDIATE
          'SELECT o_orderkey, o_orderpriority, o_totalprice
           FROM lts_orders_exec_v
           WHERE o_orderkey < ? AND o_orderpriority = ?'
          USING 500, '1-URGENT'
    """)


# ---------------------------------------------------------------------------
# Gini impurity of categorical distributions (round 5)
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH c AS (
  SELECT user_id % 50 AS bucket, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_i
  FROM events GROUP BY user_id % 50, event_type
)
SELECT bucket,
       CAST(SUM(n_i) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       1.0 - CAST(SUM(CAST(n_i AS HUGEINT) * n_i) AS DOUBLE)
           / CAST(CAST(SUM(n_i) AS HUGEINT) * SUM(n_i) AS DOUBLE) AS gini
FROM c GROUP BY bucket
"""


@register("agg_gini_impurity", oracle=_GINI_ORACLE)
def agg_gini_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity (1 − Σpᵢ²) of each user-bucket's event-type mix —
    the category-concentration statistic behind split scoring, audience
    homogeneity, and mixture drift alerts. Chosen over Shannon entropy
    DELIBERATELY: entropy needs ln(), and libm rounding differs across
    engines, while Gini is pure integer counts until one division —
    hash-exact with no tolerance.

    Scale shape: two cascaded combinable groupBys, both shrinking
    ((bucket, type) → bucket); decimal moments so n_i² can't wrap."""
    ev = load_table(spark, "events", sf_dir)
    c = (ev.groupBy((F.col("user_id") % 50).alias("bucket"), "event_type")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_i")))
    ni = F.col("n_i").cast("decimal(19,0)")
    return (c.groupBy("bucket")
            .agg(F.sum("n_i").cast("bigint").alias("n"),
                 F.count(F.lit(1)).cast("bigint").alias("n_types"),
                 (F.lit(1.0) - F.sum(ni * ni).cast("double")
                  / (F.sum(ni) * F.sum(ni)).cast("double")).alias("gini")))


# ---------------------------------------------------------------------------
# per-group linear trend slope (round 5)
# ---------------------------------------------------------------------------

_TREND_ORACLE = """
WITH pts AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(date_part('hour', ts) AS BIGINT) AS x,
         CAST(round(value * 100, 0) AS BIGINT) AS y
  FROM events
), m AS (
  SELECT event_type, day,
         CAST(COUNT(*) AS BIGINT) AS k,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(x AS HUGEINT) * y) AS sxy
  FROM pts GROUP BY event_type, day
)
SELECT event_type, day, k,
       CAST(CAST(k * sxy - sx * sy AS DOUBLE)
            / NULLIF(CAST(k * sxx - sx * sx AS DOUBLE), 0.0) AS DOUBLE)
         AS slope_cents_per_hour
FROM m
"""


@register("ts_trend_slope", oracle=_TREND_ORACLE)
def ts_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(type, day) least-squares TREND SLOPE of value against
    hour-of-day — 'is spend rising through the day?' as one number per
    series. Spark ships regr_slope, but its internal double sums are
    aggregation-order-dependent; this computes the same β̂ =
    (kΣxy−ΣxΣy)/(kΣxx−(Σx)²) from EXACT integer moments (decimal /
    HUGEINT — overflow-proof at any scale) with the division as the
    single double op, so the slope is bit-identical across engines,
    partition counts, and AQE re-plans.

    Scale shape: one combinable groupBy; moments are 5 numbers per
    group regardless of group size."""
    ev = load_table(spark, "events", sf_dir)
    pts = ev.select(
        "event_type", F.date_trunc("day", "ts").alias("day"),
        F.hour("ts").cast("bigint").alias("x"),
        iround(F.col("value") * 100).alias("y"))
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    m = (pts.groupBy("event_type", "day")
         .agg(F.count(F.lit(1)).cast("bigint").alias("k"),
              F.sum(xd).alias("sx"), F.sum(yd).alias("sy"),
              F.sum(xd * xd).alias("sxx"), F.sum(xd * yd).alias("sxy")))
    num = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        .cast("double")
    den = (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")) \
        .cast("double")
    return m.select("event_type", "day", "k",
                    (num / F.nullif(den, F.lit(0.0))).cast("double")
                    .alias("slope_cents_per_hour"))


# ---------------------------------------------------------------------------
# time-series gap detection (round 5)
# ---------------------------------------------------------------------------

_GAP_MINUTES = 180

_GAP_ORACLE = f"""
SELECT user_id,
       prev_ts AS gap_start, ts AS gap_end,
       CAST(date_diff('second', prev_ts, ts) AS BIGINT) AS gap_seconds
FROM (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_ts
  FROM events
) t
WHERE prev_ts IS NOT NULL
  AND ts > prev_ts + INTERVAL {_GAP_MINUTES} MINUTE
"""


@register("ts_gap_detection", oracle=_GAP_ORACLE)
def ts_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence-gap detection: per-user intervals with no events for over
    3 hours — the monitoring primitive behind sensor-dropout, churn-risk
    and pipeline-stall alerts (sessionization's complement: it reports
    the HOLES, not the activity). Strict > on the boundary: a gap of
    exactly the threshold is not an alert, matching the oracle's
    interval comparison.

    Scale shape: one lag window partitioned by user (the same single
    (user, time) exchange the sessionizers use); output is gap-sized,
    not event-sized."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id", "ts", F.lag("ts").over(w).alias("prev_ts"))
    return (lagged
            .where(F.col("prev_ts").isNotNull()
                   & (F.col("ts") > F.col("prev_ts")
                      + F.expr(f"INTERVAL {_GAP_MINUTES} MINUTE")))
            .select("user_id", F.col("prev_ts").alias("gap_start"),
                    F.col("ts").alias("gap_end"),
                    (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts"))
                    .cast("bigint").alias("gap_seconds")))


# ---------------------------------------------------------------------------
# forward fill (last observation carried forward, round 5)
# ---------------------------------------------------------------------------

_FFILL_ORACLE = """
WITH sampled AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_id % 3 = 0
              THEN CAST(round(value * 100, 0) AS BIGINT) END AS reading
  FROM events
)
SELECT user_id, ts, event_id, reading,
       LAST_VALUE(reading IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
FROM sampled
"""


@register("ts_forward_fill", oracle=_FFILL_ORACLE)
def ts_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (LOCF): carry each user's last non-null reading
    forward over the rows where the sensor was silent (every 3rd event
    carries a reading here; the rest are the gaps to fill) — the
    standard sparse-telemetry densification, complementing
    ts_interpolate_linear (which needs BOTH endpoints; LOCF is causal
    and streaming-safe). Readings are integer cents so the fill is
    hash-exact; leading rows before a user's first reading stay NULL
    in both engines.

    Scale shape: one user-partitioned window, running last(ignorenulls)
    over a growing frame — O(1) state per row, the same shape a
    stateful streaming LOCF keeps per key."""
    ev = load_table(spark, "events", sf_dir)
    reading = F.when(F.col("event_id") % 3 == 0,
                     iround(F.col("value") * 100))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (ev.select("user_id", "ts", "event_id",
                      reading.alias("reading"))
            .withColumn("filled",
                        F.last("reading", ignorenulls=True).over(w)))


# ---------------------------------------------------------------------------
# SQL-language scalar function DDL (round 5)
# ---------------------------------------------------------------------------

_SQL_FN_ORACLE = """
SELECT l_orderkey, l_linenumber, l_discount,
       CASE WHEN l_discount < 0.02 THEN 'low'
            WHEN l_discount < 0.06 THEN 'mid'
            ELSE 'high' END AS disc_band
FROM lineitem WHERE l_orderkey < 2000
"""


@register("sql_scalar_function_ddl", oracle=_SQL_FN_ORACLE)
def sql_scalar_function_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language scalar function (CREATE FUNCTION … RETURN expr,
    Spark 3.5 SQL UDFs): the analyst extension point that needs NO
    Python at all — the body is an expression the catalyst inlines into
    the calling plan, so unlike udf_python_scalar (same banding logic,
    serde boundary) this stays in whole-stage codegen; it is the
    preferred form for any UDF expressible as SQL. Registration is
    session-idempotent via OR REPLACE."""
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION lts_disc_band(d DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN d < 0.02 THEN 'low'
                    WHEN d < 0.06 THEN 'mid'
                    ELSE 'high' END
    """)
    load_table(spark, "lineitem", sf_dir) \
        .createOrReplaceTempView("lts_lineitem_fn_v")
    return spark.sql("""
        SELECT l_orderkey, l_linenumber, l_discount,
               lts_disc_band(l_discount) AS disc_band
        FROM lts_lineitem_fn_v WHERE l_orderkey < 2000
    """)


# ---------------------------------------------------------------------------
# numeric RANGE window frame (round 5)
# ---------------------------------------------------------------------------

_RANGE_NUM_ORACLE = """
WITH c AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderkey, o_orderpriority, cents,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_within_100,
       CAST(SUM(cents) OVER w AS BIGINT) AS cents_within_100
FROM c
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents
             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
"""


@register("win_range_between_numeric", oracle=_RANGE_NUM_ORACLE)
def win_range_between_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-based RANGE frame on a NUMERIC key (win_range_interval's
    sibling is time-based): per priority class, how many orders — and
    how much money — sit within $100 BELOW each order's price. RANGE
    frames are tie-safe by definition (peers enter the frame together,
    so no ORDER BY tie-break is needed — the property ROWS frames lack);
    integer cents keep the running sums hash-exact.

    Scale shape: one exchange on the partition key, one sort per
    partition, frame maintained by two pointers — same cost class as
    any windowed aggregate."""
    o = load_table(spark, "orders", sf_dir)
    c = o.select("o_orderkey", "o_orderpriority",
                 iround(F.col("o_totalprice") * 100).alias("cents"))
    w = (Window.partitionBy("o_orderpriority").orderBy("cents")
         .rangeBetween(-10000, 0))
    return c.select(
        "o_orderkey", "o_orderpriority", "cents",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_within_100"),
        F.sum("cents").over(w).cast("bigint").alias("cents_within_100"))


# ---------------------------------------------------------------------------
# SQL session variables (round 5)
# ---------------------------------------------------------------------------

_SESSION_VAR_ORACLE = """
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders WHERE o_orderkey < 800
"""


@register("sql_session_variables", oracle=_SESSION_VAR_ORACLE)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session VARIABLES (Spark 4 DECLARE / SET VAR): typed,
    session-scoped state referenced directly in query text — the
    pure-SQL scripting companion to sql_parameterized (API binds) and
    sql_execute_immediate (dynamic SQL): parameterize once, reuse
    across statements, no string splicing. The variable is set to a
    DIFFERENT value than its DEFAULT so the test proves SET VAR is
    actually read."""
    spark.sql("DECLARE OR REPLACE VARIABLE lts_key_cap BIGINT DEFAULT 500")
    spark.sql("SET VAR lts_key_cap = 800")
    load_table(spark, "orders", sf_dir) \
        .createOrReplaceTempView("lts_orders_var_v")
    return spark.sql("""
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM lts_orders_var_v WHERE o_orderkey < lts_key_cap
    """)


# ---------------------------------------------------------------------------
# cumulative distinct users via the first-occurrence rewrite (round 5)
# ---------------------------------------------------------------------------

_CUMDIST_ORACLE = """
WITH f AS (
  SELECT event_type, user_id, MIN(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY event_type, user_id
), n AS (
  SELECT event_type, first_day AS day, COUNT(*) AS new_users
  FROM f GROUP BY event_type, first_day
)
SELECT event_type, CAST(day AS VARCHAR) AS day,
       CAST(new_users AS BIGINT) AS new_users,
       CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day)
            AS BIGINT) AS cum_users
FROM n
"""


@register("ts_cumulative_distinct_users", oracle=_CUMDIST_ORACLE)
def ts_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per event type by day — the growth-
    accounting curve ('total unique users ever') that a naive
    COUNT(DISTINCT) OVER (ORDER BY day) recomputes quadratically and
    neither engine's window path supports efficiently. The classic
    FIRST-OCCURRENCE REWRITE makes it linear: a user contributes to the
    distinct total exactly once, on their first active day, so
    min(day) per (type, user) -> count per (type, first_day) -> running
    sum IS the cumulative distinct count. Complements
    agg_sliding_distinct_users (bounded sliding windows, where eviction
    forbids this trick).

    Scale shape: two shrinking combinable aggregates (events ->
    (type, user) -> (type, day)) and a window over day-count-sized
    partitions — the only full-data exchange is the first groupBy; the
    running sum never sees raw events."""
    ev = load_table(spark, "events", sf_dir)
    f = (ev.groupBy("event_type", "user_id")
         .agg(F.min(F.col("ts").cast("date")).alias("first_day")))
    n = (f.groupBy("event_type", F.col("first_day").alias("day"))
         .agg(F.count(F.lit(1)).alias("new_users")))
    w = Window.partitionBy("event_type").orderBy("day") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return n.select(
        "event_type", F.col("day").cast("string").alias("day"),
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"))


# ---------------------------------------------------------------------------
# GROUP BY ALL / ORDER BY ALL (round 5, batch 8)
# ---------------------------------------------------------------------------

_GBY_ALL_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_qty_cents,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY ALL ORDER BY ALL
"""


@register("sql_group_by_all", oracle=_GBY_ALL_ORACLE)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL — the analyst-ergonomics SQL surface
    (Spark 3.4+/4) that infers the grouping key set from the
    non-aggregate select items and the sort key from the whole select
    list. The oracle runs the IDENTICAL text on DuckDB (which pioneered
    the syntax), so the inference itself — not a hand-expanded rewrite —
    is what parity verifies.

    Scale shape: identical plan to the explicit GROUP BY (one partial +
    final hash aggregate on a 6-group key space); the sugar is resolved
    entirely in the analyzer, so nothing changes at the physical layer —
    which is exactly the claim worth pinning."""
    load_table(spark, "lineitem", sf_dir) \
        .createOrReplaceTempView("lts_li_gba_v")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_qty_cents,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lts_li_gba_v WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY ALL ORDER BY ALL
    """)


# ---------------------------------------------------------------------------
# named WINDOW clause (round 5, batch 8)
# ---------------------------------------------------------------------------

_WIN_CLAUSE_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(SUM(cents) OVER w AS BIGINT) AS run_cents
FROM (SELECT o_custkey, o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM {src} WHERE o_orderkey < 20000)
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
"""


@register("sql_window_clause_named",
          oracle=_WIN_CLAUSE_SQL.format(src="orders"))
def sql_window_clause_named(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause in SQL text: one `WINDOW w AS (...)` spec
    shared by several window functions — the declare-once surface that
    keeps multi-function analytic queries maintainable (and guarantees
    the functions share one frame definition rather than drifting
    apart). Same text runs on both engines.

    Scale shape: Spark resolves every `OVER w` to the same
    (partition, order) spec, so ALL window functions share ONE exchange
    and one sort — the named clause is how the SQL author gets the
    shared-exchange plan the DataFrame API gets from reusing a Window
    object."""
    load_table(spark, "orders", sf_dir) \
        .createOrReplaceTempView("lts_ord_winclause_v")
    return spark.sql(_WIN_CLAUSE_SQL.format(src="lts_ord_winclause_v"))


# ---------------------------------------------------------------------------
# VALUES inline table (round 5, batch 9)
# ---------------------------------------------------------------------------

_VALUES_SQL = """
SELECT g.tier, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS cents
FROM {src} o
JOIN (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'), ('3-MEDIUM', 'warm'),
             ('4-NOT SPECIFIED', 'cold'), ('5-LOW', 'cold'))
     AS g(prio, tier)
  ON o.o_orderpriority = g.prio
GROUP BY g.tier
"""


@register("sql_values_inline_table", oracle=_VALUES_SQL.format(src="orders"))
def sql_values_inline_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES table in the FROM clause — the zero-ceremony lookup/
    mapping table every analyst reaches for (priority → tier here)
    without creating a view or a temp table. Same text runs on both
    engines.

    Scale shape: the VALUES relation is a LocalRelation — Catalyst
    broadcast-joins it against the fact scan (5 rows never shuffle the
    600k side), then the tier aggregate collapses map-side. This is the
    canonical tiny-dim pattern expressed purely in SQL."""
    load_table(spark, "orders", sf_dir) \
        .createOrReplaceTempView("lts_ord_vals_v")
    return spark.sql(_VALUES_SQL.format(src="lts_ord_vals_v"))


# ---------------------------------------------------------------------------
# HiveQL LATERAL VIEW (round 5, batch 9)
# ---------------------------------------------------------------------------

_LATERAL_VIEW_ORACLE = """
SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
       CAST(unnest(range(0, len(string_split(text, ' ')))) AS BIGINT) AS pos
FROM documents WHERE doc_id < 50
"""


@register("sql_lateral_view_explode", oracle=_LATERAL_VIEW_ORACLE)
def sql_lateral_view_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HiveQL `LATERAL VIEW posexplode(...) t AS pos, tok` — the legacy
    warehouse syntax a decade of Hive pipelines are written in; Spark
    keeps it as a first-class generator surface beside the ANSI
    DataFrame explode (explode_posexplode tests that one). The oracle
    re-expresses it with DuckDB's parallel-unnest zip, so parity checks
    generator SEMANTICS (per-row fan-out + 0-based position) across
    three different spellings.

    Scale shape: identical Generate node to the DataFrame explode —
    narrow per-row fan-out, no shuffle; the WHERE prunes at the scan
    below the generator."""
    load_table(spark, "documents", sf_dir) \
        .createOrReplaceTempView("lts_doc_lv_v")
    return spark.sql("""
        SELECT doc_id, tok, CAST(pos AS BIGINT) AS pos
        FROM lts_doc_lv_v
        LATERAL VIEW posexplode(split(text, ' ')) t AS pos, tok
        WHERE doc_id < 50
    """)


# ---------------------------------------------------------------------------
# DISTRIBUTE BY / SORT BY physical-layout clauses (round 5, batch 9)
# ---------------------------------------------------------------------------

_DIST_SORT_ORACLE = """
SELECT event_type, CAST(user_id AS BIGINT) AS user_id,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY event_type, user_id
"""


@register("sql_distribute_sort_by", oracle=_DIST_SORT_ORACLE)
def sql_distribute_sort_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTE BY / SORT BY — the Spark-SQL clauses that give a SQL
    author direct control over the PHYSICAL layout (partitioning
    exchange + within-partition order) without a total sort. This is
    how SQL users pre-shape data for a downstream partitioned write or
    a merge-friendly consumer at 100 TB: DISTRIBUTE BY hashes rows to
    partitions (one exchange, no global order), SORT BY orders inside
    each partition only — a total ORDER BY would add a range exchange
    and a global merge this query provably avoids.

    Values are partition-layout-independent (the aggregate is exact
    integer cents), so the oracle is the plain aggregate — layout
    clauses must never change CONTENT, which is exactly what parity
    pins."""
    load_table(spark, "events", sf_dir) \
        .createOrReplaceTempView("lts_ev_dist_v")
    return spark.sql("""
        SELECT event_type, CAST(user_id AS BIGINT) AS user_id,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lts_ev_dist_v GROUP BY event_type, user_id
        DISTRIBUTE BY event_type SORT BY event_type, user_id
    """)


# ---------------------------------------------------------------------------
# SQL join hints (round 5, batch 9)
# ---------------------------------------------------------------------------

_JOIN_HINT_SQL = """
SELECT {hint}c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS cents
FROM {o} o JOIN {c} c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("sql_join_hints",
          oracle=_JOIN_HINT_SQL.format(hint="", o="orders", c="customer"))
def sql_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL join-strategy HINT (`/*+ BROADCAST(c) */`) — the escape hatch
    when statistics mislead the planner at scale (a "small" dim that
    stats say is big, a filtered side the optimizer can't size). The
    hint forces a BroadcastHashJoin regardless of
    autoBroadcastJoinThreshold; tests/test_plans.py pins the plan, and
    the oracle (the same query, no hint) pins that hints never change
    RESULTS — the two invariants that make hints safe to ship in
    production SQL."""
    load_table(spark, "orders", sf_dir) \
        .createOrReplaceTempView("lts_ord_hint_v")
    load_table(spark, "customer", sf_dir) \
        .createOrReplaceTempView("lts_cust_hint_v")
    return spark.sql(_JOIN_HINT_SQL.format(
        hint="/*+ BROADCAST(c) */ ", o="lts_ord_hint_v",
        c="lts_cust_hint_v"))


# ---------------------------------------------------------------------------
# time-weighted average (round 5, batch 10)
# ---------------------------------------------------------------------------

_TWA_ORACLE = """
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS day, epoch_us(ts) AS t,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         lead(epoch_us(ts)) OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                  ORDER BY ts, event_id) AS t_next,
         epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP)) + 86400000000 AS day_end
  FROM events
), w AS (
  SELECT event_type, day, cents,
         CAST(COALESCE(t_next, day_end) - t AS BIGINT) AS wus
  FROM s
)
SELECT event_type, CAST(day AS VARCHAR) AS day,
       CAST(SUM(cents * wus) AS BIGINT) AS num_cents_us,
       CAST(SUM(wus) AS BIGINT) AS den_us,
       CAST(SUM(cents * wus) AS DOUBLE) / CAST(SUM(wus) AS DOUBLE) / 100.0
         AS twa_value
FROM w GROUP BY event_type, day
"""


@register("ts_time_weighted_avg", oracle=_TWA_ORACLE)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-weighted average per (type, day) — the correct daily mean for
    IRREGULARLY sampled series (sensor readings, account balances,
    prices): each sample holds until the next one, so it is weighted by
    its holding duration, not counted once. A plain AVG over-weights
    bursts — the metric every balance/exposure report gets wrong first.
    The last sample of a day holds to day end (86,400 s), so day
    weights sum to a full day from the first sample onward.

    Determinism: holding times are EXACT integer microseconds
    (unix_micros here, epoch_us in the oracle — sub-second parts must
    not truncate, which a seconds-based epoch() silently does and WAS
    the first draft's parity failure), values are integer cents, and
    the single double division is the only float op.

    Scale shape: one (type, day) exchange shared by the lead window and
    the aggregate; day-bounded partitions keep the window state O(1)
    per row at any history length."""
    ev = load_table(spark, "events", sf_dir)
    day = F.col("ts").cast("date")
    t = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("event_type", day).orderBy("ts", "event_id")
    s = ev.select(
        "event_type", day.alias("day"), t.alias("t"),
        iround(F.col("value") * 100).alias("cents"),
        F.lead(t).over(w).alias("t_next"),
        (F.unix_micros(day.cast("timestamp")) + F.lit(86400000000))
        .alias("day_end"))
    wdf = s.select(
        "event_type", "day", "cents",
        (F.coalesce("t_next", "day_end") - F.col("t")).cast("bigint")
        .alias("wus"))
    return (wdf.groupBy("event_type", "day")
            .agg(F.sum(F.col("cents") * F.col("wus")).cast("bigint")
                 .alias("num_cents_us"),
                 F.sum("wus").cast("bigint").alias("den_us"))
            .select("event_type", F.col("day").cast("string").alias("day"),
                    "num_cents_us", "den_us",
                    (F.col("num_cents_us").cast("double")
                     / F.col("den_us").cast("double") / F.lit(100.0))
                    .alias("twa_value")))


# ---------------------------------------------------------------------------
# SQL merge-join hint (round 5, batch 10)
# ---------------------------------------------------------------------------

_MERGE_HINT_SQL = """
SELECT {hint}c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS cents
FROM {o} o JOIN {c} c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("sql_join_hint_merge",
          oracle=_MERGE_HINT_SQL.format(hint="", o="orders", c="customer"))
def sql_join_hint_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`/*+ SHUFFLE_MERGE(c) */` — the OTHER direction of the hint
    surface (sql_join_hints forces broadcast): force a SortMergeJoin
    when the planner would pick hash. The production case is memory
    safety at 100 TB: a hash join builds an in-memory table of the
    build side, and when stats under-estimate it (post-filter skew, a
    fat payload column) the executor OOMs — SMJ spills sort runs to
    disk instead and degrades gracefully. The plan is pinned in
    tests/test_plans.py; the no-hint oracle pins result invariance."""
    load_table(spark, "orders", sf_dir) \
        .createOrReplaceTempView("lts_ord_mhint_v")
    load_table(spark, "customer", sf_dir) \
        .createOrReplaceTempView("lts_cust_mhint_v")
    return spark.sql(_MERGE_HINT_SQL.format(
        hint="/*+ SHUFFLE_MERGE(c) */ ", o="lts_ord_mhint_v",
        c="lts_cust_mhint_v"))


# ---------------------------------------------------------------------------
# top-k WITH TIES (round 5, batch 11)
# ---------------------------------------------------------------------------

_TOPK_TIES_ORACLE = """
SELECT o_orderpriority, o_orderkey, band, rnk FROM (
  SELECT o_orderpriority, o_orderkey,
         CAST(floor(o_totalprice / 1000) AS BIGINT) AS band,
         CAST(rank() OVER (PARTITION BY o_orderpriority
                           ORDER BY CAST(floor(o_totalprice / 1000) AS BIGINT)
                                    DESC) AS BIGINT) AS rnk
  FROM orders)
WHERE rnk <= 3
"""


@register("win_topk_with_ties", oracle=_TOPK_TIES_ORACLE)
def win_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group WITH TIES (rank() <= k) — the fetch-first-WITH-TIES
    semantic: every row tying the k-th value survives, so group sizes
    exceed k on tie-heavy keys (this banded price key yields up to 7
    rows for k=3 at sf0.01). The deliberate contrast is
    win_topk_per_group's row_number(), which cuts ties arbitrarily
    unless the order is total — rank() is what a correct leaderboard /
    price-band report needs when the ranking key is coarse.

    Scale shape: identical single exchange + sort to the row_number
    variant; Spark's WindowGroupLimit pushdown applies to rank() too,
    so each task keeps only its local rank<=k heads before the
    exchange."""
    o = load_table(spark, "orders", sf_dir)
    band = F.floor(F.col("o_totalprice") / 1000).cast("bigint")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("band").desc())
    return (o.select("o_orderpriority", "o_orderkey", band.alias("band"))
            .withColumn("rnk", F.rank().over(w).cast("bigint"))
            .where(F.col("rnk") <= 3)
            .select("o_orderpriority", "o_orderkey", "band", "rnk"))


# ---------------------------------------------------------------------------
# IDENTIFIER() dynamic-name resolution (round 5, batch 11)
# ---------------------------------------------------------------------------

_IDENT_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders GROUP BY o_orderpriority
"""


@register("sql_identifier_clause", oracle=_IDENT_ORACLE)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`IDENTIFIER('...' || '...')` — SQL-injection-safe DYNAMIC object
    names (Spark 3.5+): the table/view name is computed from an
    expression but parsed as an IDENTIFIER, never spliced as SQL text.
    Together with sql_parameterized (value binds) and
    sql_execute_immediate (dynamic statements) this completes the
    dynamic-SQL triad: values, names, statements — each with its own
    safe mechanism. The name here is assembled from two fragments at
    parse time, so the test proves resolution actually goes through
    the clause."""
    load_table(spark, "orders", sf_dir) \
        .createOrReplaceTempView("lts_ident_orders_v")
    return spark.sql("""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM IDENTIFIER('lts_ident_' || 'orders_v')
        GROUP BY o_orderpriority
    """)


# ---------------------------------------------------------------------------
# SELECT * EXCEPT (round 5, batch 13)
# ---------------------------------------------------------------------------

_STAR_EXCEPT_ORACLE = """
SELECT * EXCLUDE (o_orderstatus, o_orderdate, o_totalprice)
FROM orders WHERE o_orderkey < 500
"""


@register("sql_star_except", oracle=_STAR_EXCEPT_ORACLE)
def sql_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SELECT * EXCEPT (cols)` — subtractive projection (Spark 4 /
    Databricks SQL dialect; DuckDB spells it EXCLUDE): keep everything
    BUT the named columns, the ergonomic way to drop a few heavy or
    sensitive fields from a wide table without enumerating dozens of
    survivors. Parity across the two spellings pins the expansion
    semantics, and column PRUNING still applies — the excluded columns
    never leave the scan, so on a wide 100 TB table this reads less,
    not just projects less."""
    load_table(spark, "orders", sf_dir) \
        .createOrReplaceTempView("lts_ord_sexc_v")
    return spark.sql("""
        SELECT * EXCEPT (o_orderstatus, o_orderdate, o_totalprice)
        FROM lts_ord_sexc_v WHERE o_orderkey < 500
    """)


# ---------------------------------------------------------------------------
# aggregate FILTER clause (round 5, batch 13)
# ---------------------------------------------------------------------------

_AGG_FILTER_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT)
         AS n_big,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS cents_f,
       CAST(COUNT(*) AS BIGINT) AS n_all
FROM {src} GROUP BY o_orderpriority
"""


@register("agg_filter_clause", oracle=_AGG_FILTER_SQL.format(src="orders"))
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard-SQL `agg(...) FILTER (WHERE ...)` — per-aggregate
    predicates in one pass over the data (the ANSI form of the
    CASE-WHEN-inside-SUM idiom agg_conditional exercises through the
    DataFrame API). One scan computes differently-filtered aggregates
    side by side, which is exactly how a 100 TB segmentation report
    avoids N passes for N segments. Identical text both engines.

    Scale shape: all FILTER aggregates share one partial+final hash
    aggregate; the predicates evaluate per row map-side — no extra
    scans, no extra shuffles vs the unfiltered aggregate."""
    load_table(spark, "orders", sf_dir) \
        .createOrReplaceTempView("lts_ord_aggf_v")
    return spark.sql(_AGG_FILTER_SQL.format(src="lts_ord_aggf_v"))


# ---------------------------------------------------------------------------
# range() table function (round 5, batch 14)
# ---------------------------------------------------------------------------

_RANGE_TF_ORACLE = """
SELECT CAST(r.range AS BIGINT) AS price_band,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
FROM range(0, 12) r
LEFT JOIN orders o
  ON CAST(floor(o.o_totalprice / 50000) AS BIGINT) = r.range
GROUP BY r.range
"""


@register("sql_table_function_range", oracle=_RANGE_TF_ORACLE)
def sql_table_function_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`range()` TABLE FUNCTION in the FROM clause — generated relations
    without a source table. The canonical use is exactly this query: a
    DENSE dimension (every price band 0..11) LEFT-joined against facts
    so empty bands report 0 instead of vanishing — the same
    no-gaps-in-the-report problem ts_resample_gapfill solves with a
    calendar spine, solved here with a generated integer spine in pure
    SQL.

    Scale shape: range() is a LocalRelation-like leaf parallelized by
    Spark's Range exec (no IO); the 12-row spine broadcasts against
    the fact scan."""
    load_table(spark, "orders", sf_dir) \
        .createOrReplaceTempView("lts_ord_range_v")
    return spark.sql("""
        SELECT r.id AS price_band,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
        FROM range(0, 12) r
        LEFT JOIN lts_ord_range_v o
          ON CAST(floor(o.o_totalprice / 50000) AS BIGINT) = r.id
        GROUP BY r.id
    """)


# ---------------------------------------------------------------------------
# DataFrameStatFunctions crosstab (round 5, batch 15)
# ---------------------------------------------------------------------------

_CROSSTAB_ORACLE = """
SELECT o_orderpriority AS o_orderpriority_k3,
       CAST(COUNT(*) FILTER (WHERE o_orderkey % 3 = 0) AS BIGINT) AS "0",
       CAST(COUNT(*) FILTER (WHERE o_orderkey % 3 = 1) AS BIGINT) AS "1",
       CAST(COUNT(*) FILTER (WHERE o_orderkey % 3 = 2) AS BIGINT) AS "2"
FROM orders GROUP BY o_orderpriority
"""


@register("stat_crosstab", oracle=_CROSSTAB_ORACLE)
def stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`df.stat.crosstab` — the contingency-table member of Spark's
    DataFrameStatFunctions surface: pairwise frequency counts with the
    second column's values becoming columns. The pivot key is
    `o_orderkey % 3` (all residues present at every SF, so the output
    schema is corpus-independent — a data-dependent category set would
    make the column list itself flaky at small scales). The oracle is
    the FILTER-clause expansion, proving crosstab is exactly a
    conditional-count pivot.

    Scale shape: one hash aggregate on the pair key then a tiny pivot;
    the category space, not the row count, bounds the output."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderpriority", (F.col("o_orderkey") % 3).cast("string").alias("k3"))
    ct = o.stat.crosstab("o_orderpriority", "k3")
    return ct.select("o_orderpriority_k3",
                     F.col("0").cast("bigint").alias("0"),
                     F.col("1").cast("bigint").alias("1"),
                     F.col("2").cast("bigint").alias("2"))


# ---------------------------------------------------------------------------
# SQL PIVOT clause (round 5, batch 15)
# ---------------------------------------------------------------------------

_PIVOT_SQL_ORACLE = """
SELECT CAST(user_id % 3 AS BIGINT) AS ubucket,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
            FILTER (WHERE event_type = 'click') AS BIGINT) AS click_c,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
            FILTER (WHERE event_type = 'view') AS BIGINT) AS view_c,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
            FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase_c
FROM events GROUP BY CAST(user_id % 3 AS BIGINT)
"""


@register("sql_pivot_clause", oracle=_PIVOT_SQL_ORACLE)
def sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text `PIVOT (agg FOR col IN (...))` clause — the declarative
    long-to-wide rotation in pure SQL (pivot_wide covers the DataFrame
    API; this is the language surface). The IN list is EXPLICIT, so the
    output schema is static regardless of which categories appear —
    the property that makes PIVOT safe in production SQL where a
    data-dependent column set would break downstream consumers. The
    oracle is the FILTER-clause desugaring.

    Scale shape: one hash aggregate on (ubucket, event_type) collapsed
    map-side, then the analyzer's pivot projection — no second pass."""
    load_table(spark, "events", sf_dir) \
        .createOrReplaceTempView("lts_ev_pivot_v")
    return spark.sql("""
        SELECT ubucket, CAST(click AS BIGINT) AS click_c,
               CAST(view AS BIGINT) AS view_c,
               CAST(purchase AS BIGINT) AS purchase_c
        FROM (SELECT event_type, CAST(user_id % 3 AS BIGINT) AS ubucket,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
              FROM lts_ev_pivot_v)
        PIVOT (SUM(cents) FOR event_type IN ('click' AS click,
                                             'view' AS view,
                                             'purchase' AS purchase))
    """)


# ---------------------------------------------------------------------------
# SQL UNPIVOT clause (round 5, batch 15)
# ---------------------------------------------------------------------------

_UNPIVOT_SQL_ORACLE = """
SELECT o_orderkey, metric, val FROM (
  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey < 2000) t
UNPIVOT (val FOR metric IN (custkey, cents))
"""


@register("sql_unpivot_clause", oracle=_UNPIVOT_SQL_ORACLE)
def sql_unpivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text `UNPIVOT (val FOR metric IN (...))` — wide-to-long in the
    language itself (unpivot_long covers the DataFrame API). Identical
    text runs on DuckDB, pinning the shared semantics: one output row
    per (row, listed column), NULL cells dropped by default.

    Scale shape: a per-row Expand (rows × metrics), no shuffle — the
    long form is produced streaming at scan rate."""
    load_table(spark, "orders", sf_dir) \
        .createOrReplaceTempView("lts_ord_unpiv_v")
    return spark.sql("""
        SELECT o_orderkey, metric, val FROM (
          SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS custkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          FROM lts_ord_unpiv_v WHERE o_orderkey < 2000) t
        UNPIVOT (val FOR metric IN (custkey, cents))
    """)


# ---------------------------------------------------------------------------
# AQE REBALANCE hint (round 5, batch 15)
# ---------------------------------------------------------------------------

_REBALANCE_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders GROUP BY o_orderpriority
"""


@register("sql_hint_rebalance", oracle=_REBALANCE_ORACLE)
def sql_hint_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`/*+ REBALANCE(col) */` — the AQE output-layout hint: redistribute
    rows so downstream partitions are evenly sized (splitting skewed
    ones, coalescing small ones at runtime). The production use is the
    WRITE path at 100 TB: a sink fed by a skewed computation emits one
    5 GB file and four hundred 2 MB ones; REBALANCE before the sink
    yields uniform files without a full sort (contrast
    sql_distribute_sort_by: fixed hash layout, no runtime adaptation).
    The aggregate downstream of the rebalance pins result invariance —
    layout hints must never change content."""
    load_table(spark, "orders", sf_dir) \
        .createOrReplaceTempView("lts_ord_rebal_v")
    return spark.sql("""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM (SELECT /*+ REBALANCE(o_orderpriority) */ *
              FROM lts_ord_rebal_v)
        GROUP BY o_orderpriority
    """)


# ---------------------------------------------------------------------------
# lag IGNORE NULLS (round 5, batch 17)
# ---------------------------------------------------------------------------

_LAG_IN_ORACLE = """
SELECT event_id, user_id,
  lag(nv, 1 IGNORE NULLS) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev_big
FROM (SELECT event_id, user_id, ts,
             CASE WHEN value > 500
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END AS nv
      FROM events WHERE user_id < 50)
"""


@register("win_lag_ignore_nulls", oracle=_LAG_IN_ORACLE)
def win_lag_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`lag(...) IGNORE NULLS` — navigation that skips over null rows:
    "the previous LARGE reading", not "the previous row's (possibly
    null) value". This is the sparse-signal companion to
    ts_forward_fill's last(ignorenulls): LOCF carries the latest value
    forward, lag-ignore-nulls REFERENCES the previous occurrence
    without filling — the distinction matters for change-detection
    (compare each large event to the prior large event, however long
    ago). The two engines spell the modifier differently (Spark:
    `IGNORE NULLS` after the call; DuckDB: inside the argument list) —
    parity pins the shared semantics under both spellings.

    Scale shape: one (user, time) exchange, O(1) state per row (the
    window operator tracks one last-non-null slot)."""
    load_table(spark, "events", sf_dir) \
        .createOrReplaceTempView("lts_ev_lagin_v")
    return spark.sql("""
        SELECT event_id, user_id,
          lag(nv, 1) IGNORE NULLS OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev_big
        FROM (SELECT event_id, user_id, ts,
                     CASE WHEN value > 500
                          THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                     END AS nv
              FROM lts_ev_lagin_v WHERE user_id < 50)
    """)


# ---------------------------------------------------------------------------
# LEFT SEMI / ANTI JOIN SQL keywords (round 5, batch 17)
# ---------------------------------------------------------------------------

_SEMI_SQL_ORACLE = """
SELECT c.c_custkey, c.c_mktsegment FROM customer c
SEMI JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
  ON o.o_custkey = c.c_custkey
"""


@register("sql_semi_anti_join_syntax", oracle=_SEMI_SQL_ORACLE)
def sql_semi_anti_join_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`LEFT SEMI JOIN` as SQL-text syntax — existence filtering in the
    language itself, with the filter condition INSIDE the join (the
    o_totalprice predicate is part of the ON clause, so it narrows the
    existence test, not the output). join_semi/join_anti cover the
    DataFrame API; sub_exists_not_exists covers the EXISTS spelling;
    this pins that all three spellings plan to the same LeftSemi join.
    DuckDB spells it `SEMI JOIN` — parity across dialects.

    Scale shape: semi join never materializes matches (first hit wins),
    and the probe side streams — the cheapest existence check at any
    scale."""
    load_table(spark, "orders", sf_dir) \
        .createOrReplaceTempView("lts_ord_semi_v")
    load_table(spark, "customer", sf_dir) \
        .createOrReplaceTempView("lts_cust_semi_v")
    return spark.sql("""
        SELECT c.c_custkey, c.c_mktsegment FROM lts_cust_semi_v c
        LEFT SEMI JOIN lts_ord_semi_v o
          ON o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    """)


# ---------------------------------------------------------------------------
# LTTB downsampling (round 5, batch 18)
# ---------------------------------------------------------------------------

_LTTB_K = 12


def lttb_select(xs: list, ys: list, k: int) -> list:
    """Pure-Python largest-triangle-three-buckets (Steinarsson 2013):
    keep first and last points; for each interior bucket pick the point
    forming the LARGEST triangle with the previously selected point and
    the AVERAGE of the next bucket. Sequential by construction (each
    choice conditions the next), which is why the operator is rows-only:
    no SQL oracle can express the recursion. Shared by the Spark UDF and
    the pytest reference so both sides run the IDENTICAL float
    arithmetic in the identical order (the BPE-train precedent).
    Returns the selected indices."""
    n = len(xs)
    if n <= k:
        return list(range(n))
    sel = [0]
    # k-2 interior buckets over points 1..n-2, float bucket edges
    step = (n - 2) / float(k - 2)
    for b in range(k - 2):
        lo = 1 + int(b * step)
        hi = 1 + int((b + 1) * step)
        hi = min(hi, n - 1)
        nlo, nhi = hi, (1 + int((b + 2) * step) if b + 2 < k - 1 else n)
        nhi = min(nhi, n)
        ax, ay = xs[sel[-1]], ys[sel[-1]]
        if nlo < nhi:
            cx = sum(xs[nlo:nhi]) / float(nhi - nlo)
            cy = sum(ys[nlo:nhi]) / float(nhi - nlo)
        else:
            cx, cy = xs[n - 1], ys[n - 1]
        best, best_area = lo, -1.0
        for i in range(lo, hi):
            area = abs((ax - cx) * (ys[i] - ay) - (ax - xs[i]) * (cy - ay))
            if area > best_area:  # strict > : first-index tie-break
                best, best_area = i, area
        sel.append(best)
    sel.append(n - 1)
    return sel


@register("ts_downsample_lttb", oracle=None)
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB (largest-triangle-three-buckets) downsampling of each
    event-type's daily-mean series to 12 points — THE standard
    decimation for monitoring charts: unlike stride thinning
    (ts_downsample_stride), LTTB keeps the visually load-bearing points
    (peaks, inflections) by maximizing triangle area against what was
    just kept and what comes next. Sequential by construction — each
    selection conditions the next bucket's anchor — so no SQL oracle
    exists (rows-only); tests/test_llm_quality.py pins the ENTIRE
    selection against :func:`lttb_select` run on the same series
    driver-side, plus the standard double-run determinism gate.

    Determinism: the daily series is exact (integer-cents means at
    fixed precision), each series lives in ONE group (applyInPandas),
    and the arithmetic is the shared pure-Python routine — same floats,
    same order, every run and every partitioning.

    Scale shape: the pre-aggregate collapses raw events to (type, day)
    map-side; the sequential kernel then sees only chart-sized series
    (one group per key, bounded by the calendar, not the corpus) —
    LTTB at 100 TB is a per-series post-pass over tiny aggregates,
    which is exactly how dashboards run it."""
    import pandas as pd

    ev = load_table(spark, "events", sf_dir)
    daily = (ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
             .agg(F.avg(iround(F.col("value") * 100)).alias("cents_mean")))

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        xs = [float(i) for i in range(len(pdf))]
        ys = [float(v) for v in pdf["cents_mean"]]
        sel = lttb_select(xs, ys, _LTTB_K)
        out = pdf.iloc[sel].copy()
        out["pos"] = sel
        return out[["event_type", "day", "cents_mean", "pos"]]

    return (daily.groupBy("event_type")
            .applyInPandas(pick, schema="event_type string, day date, "
                                        "cents_mean double, pos bigint")
            .select("event_type", F.col("day").cast("string").alias("day"),
                    F.round("cents_mean", 6).alias("cents_mean"),
                    F.col("pos").cast("bigint").alias("pos")))


# ---------------------------------------------------------------------------
# outer generators: empty arrays must keep their row (round 6)
# ---------------------------------------------------------------------------

_EXPLODE_OUTER_ORACLE = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, 'q\w+') AS arr FROM documents
)
SELECT doc_id,
       CAST(i - 1 AS BIGINT) AS pos,
       arr[i] AS qword
FROM t LEFT JOIN LATERAL (
  SELECT unnest(generate_series(1, len(arr))) AS i) u ON TRUE
"""


@register("explode_outer_nulls", oracle=_EXPLODE_OUTER_ORACLE)
def explode_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`posexplode_outer`: flattening that PRESERVES rows whose array is
    empty (NULL pos/element) — the anti-join-free way to keep "documents
    with no matches" visible in the flattened view. Plain explode drops
    them, and the classic workaround (flatten + left anti + union) is two
    extra shuffles; the outer generator is zero extra shuffles (generate
    is map-side). The q-word extraction leaves most docs with an empty
    array, so the outer semantics carry real weight here. Oracle: DuckDB
    LEFT JOIN LATERAL over generate_series(1, len(arr)) — its unnest
    drops empty rows exactly like plain explode, so the lateral left join
    is the porting idiom."""
    d = load_table(spark, "documents", sf_dir)
    return (d.select(
        "doc_id",
        F.posexplode_outer(F.expr(r"regexp_extract_all(text, 'q\\w+', 0)"))
        .alias("pos", "qword"))
        .withColumn("pos", F.col("pos").cast("bigint")))


# ---------------------------------------------------------------------------
# IQR fence outliers (round 6)
# ---------------------------------------------------------------------------

_IQR_ORACLE = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
), fences AS (
  SELECT event_type,
         MIN(CASE WHEN rk >= (n + 3) // 4 THEN value END) AS q1,
         MIN(CASE WHEN rk >= (3 * n + 3) // 4 THEN value END) AS q3
  FROM ranked GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       f.q1 - 1.5 * (f.q3 - f.q1) AS lo_fence,
       f.q3 + 1.5 * (f.q3 - f.q1) AS hi_fence,
       e.value > f.q3 + 1.5 * (f.q3 - f.q1) AS is_high
FROM events e JOIN fences f ON e.event_type = f.event_type
WHERE e.value < f.q1 - 1.5 * (f.q3 - f.q1)
   OR e.value > f.q3 + 1.5 * (f.q3 - f.q1)
"""


@register("ts_outlier_iqr", oracle=_IQR_ORACLE)
def ts_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outliers per event_type: values outside
    [q1 − 1.5·IQR, q3 + 1.5·IQR] with DISCRETE quartiles — actual data
    values at rank ceil(p·n) via pure integer arithmetic
    ((p·n + den − 1) div den), the agg_percentile_disc_exact discipline,
    so no interpolation ulp exists and the fences are the same IEEE ops
    in the same order on both engines. Complements ts_anomaly_zscore
    (moment-based) and agg_mad_robust (median-based) with the
    quartile-based detector that ignores distribution shape.

    Scale shape: one window shuffle per event_type for the ranks (rank +
    count share the exchange), a combinable conditional-MIN groupBy to a
    types-sized fence table, then a BROADCAST fence join back — the scan
    side never reshuffles."""
    ev = load_table(spark, "events", sf_dir)
    wp = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type", "value",
        F.row_number().over(wp.orderBy("value", "event_id")).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("n"))

    def disc(num: int, den: int, name: str):
        thresh = F.expr(f"({num} * n + {den} - 1) div {den}")
        return F.min(F.when(F.col("rk") >= thresh, F.col("value"))) \
            .alias(name)

    fences = (ranked.groupBy("event_type")
              .agg(disc(1, 4, "q1"), disc(3, 4, "q3")))
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (ev.join(F.broadcast(fences), "event_type")
            .where((F.col("value") < lo) | (F.col("value") > hi))
            .select("event_id", "event_type", "value",
                    lo.alias("lo_fence"), hi.alias("hi_fence"),
                    (F.col("value") > hi).alias("is_high")))


# ---------------------------------------------------------------------------
# chi-square independence cells (round 6)
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH cells AS (
  SELECT event_type, CAST(user_id % 3 AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS obs
  FROM events GROUP BY event_type, CAST(user_id % 3 AS BIGINT)
), tot AS (
  SELECT event_type, bucket, obs,
         SUM(obs) OVER (PARTITION BY event_type) AS row_n,
         SUM(obs) OVER (PARTITION BY bucket) AS col_n,
         SUM(obs) OVER () AS grand_n
  FROM cells
)
SELECT event_type, bucket, obs,
       CAST(row_n * col_n AS DOUBLE) / CAST(grand_n AS DOUBLE) AS expected,
       (CAST(obs AS DOUBLE)
        - CAST(row_n * col_n AS DOUBLE) / CAST(grand_n AS DOUBLE))
       * (CAST(obs AS DOUBLE)
          - CAST(row_n * col_n AS DOUBLE) / CAST(grand_n AS DOUBLE))
       / (CAST(row_n * col_n AS DOUBLE) / CAST(grand_n AS DOUBLE))
         AS chi2_contrib
FROM tot
"""


@register("stat_chi_square_independence", oracle=_CHI2_ORACLE)
def stat_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test cells for event_type × user-bucket —
    the drift/bias check a data team runs on categorical columns (is the
    event mix independent of the user cohort?). Emits PER-CELL observed,
    expected (row·col/grand, all integer counts until the final
    division) and chi² contribution — per-cell rather than the summed
    statistic, deliberately: the cross-cell float SUM is
    association-order-dependent across engines, while each cell's value
    is a fixed tree of correctly-rounded IEEE ops (int→double divisions,
    one subtract, one multiply, one divide) and hashes exactly. The cell
    table is also the more useful artifact (WHICH cell drives the
    drift).

    Scale shape: one groupBy to a (types × buckets)-sized cell table;
    marginals are windows over that tiny table, not the events."""
    ev = load_table(spark, "events", sf_dir)
    cells = (ev.groupBy("event_type",
                        (F.col("user_id") % 3).cast("bigint").alias("bucket"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("obs")))
    tot = cells.select(
        "event_type", "bucket", "obs",
        F.sum("obs").over(Window.partitionBy("event_type")).alias("row_n"),
        F.sum("obs").over(Window.partitionBy("bucket")).alias("col_n"),
        F.sum("obs").over(
            Window.partitionBy(F.lit(1))).alias("grand_n"))
    expected = ((F.col("row_n") * F.col("col_n")).cast("double")
                / F.col("grand_n").cast("double"))
    dev = F.col("obs").cast("double") - expected
    return tot.select("event_type", "bucket", "obs",
                      expected.alias("expected"),
                      (dev * dev / expected).alias("chi2_contrib"))


# ---------------------------------------------------------------------------
# lag-k autocorrelation (round 6)
# ---------------------------------------------------------------------------

_AUTOCORR_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         SUM(CAST(round(value * 100, 0) AS BIGINT)) AS x
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), pairs AS (
  SELECT event_type, x,
         lag(x) OVER (PARTITION BY event_type ORDER BY h) AS xp
  FROM hourly
), m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS k,
         SUM(CAST(x AS HUGEINT)) AS sx,
         SUM(CAST(xp AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(xp AS HUGEINT) * xp) AS syy,
         SUM(CAST(x AS HUGEINT) * xp) AS sxy
  FROM pairs WHERE xp IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, k,
       CAST(CAST(k * sxy - sx * sy AS DOUBLE)
            / NULLIF(sqrt(CAST(k * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(k * syy - sy * sy AS DOUBLE)), 0.0)
         AS DOUBLE) AS autocorr_lag1
FROM m
"""


@register("ts_autocorr_lag", oracle=_AUTOCORR_ORACLE)
def ts_autocorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the hourly revenue series per event
    type — THE one-number seasonality/persistence probe (high r₁: the
    series trends; near 0: hourly noise; negative: mean-reverting),
    read before anyone fits a forecast. Bit-exact by the
    ts_rolling_corr discipline: the series is fixed-point cents, every
    moment (Σx, Σx², Σxxₚ…) is an exact integer sum (decimal(38,0) in
    Spark ≙ HUGEINT in DuckDB), and the final Pearson ratio is the same
    fixed tree of correctly-rounded double ops on both engines.

    Scale shape: hourly pre-agg is the only corpus-sized (combinable)
    shuffle; the lag window and moment aggregate run over (type, hour)
    rows — thousands, not events."""
    ev = load_table(spark, "events", sf_dir)
    hourly = (ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
              .agg(F.sum(iround(F.col("value") * 100)).alias("x")))
    w = Window.partitionBy("event_type").orderBy("h")
    pairs = (hourly.select("event_type", "x",
                           F.lag("x").over(w).alias("xp"))
             .where(F.col("xp").isNotNull()))
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("xp").cast("decimal(38,0)")
    m = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(xd).alias("sx"), F.sum(yd).alias("sy"),
        F.sum(xd * xd).alias("sxx"), F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"))
    num = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        .cast("double")
    den = (F.sqrt((F.col("k") * F.col("sxx")
                   - F.col("sx") * F.col("sx")).cast("double"))
           * F.sqrt((F.col("k") * F.col("syy")
                     - F.col("sy") * F.col("sy")).cast("double")))
    return m.select("event_type", "k",
                    (num / F.nullif(den, F.lit(0.0))).cast("double")
                    .alias("autocorr_lag1"))


# ---------------------------------------------------------------------------
# ORDER BY ALL (round 6)
# ---------------------------------------------------------------------------

_ORDER_ALL_ORACLE = """
SELECT o_orderstatus,
       strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
GROUP BY ALL
ORDER BY ALL
LIMIT 10
"""


@register("sql_order_by_all", oracle=_ORDER_ALL_ORACLE)
def sql_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ORDER BY ALL` (with `GROUP BY ALL`): the every-column
    lexicographic sort without spelling the list — the report-SQL
    convenience DuckDB popularized and Spark 4 adopted. The LIMIT makes
    the ordering SEMANTIC (the kept rows depend on the full-row order),
    so the oracle verifies ORDER BY ALL's column-order contract (select
    order, left to right), not just syntax. Identical text runs on both
    engines.

    Scale shape: combinable groupBy; ORDER BY + LIMIT plans as
    TakeOrderedAndProject (per-partition top-N, never a global sort)."""
    load_table(spark, "orders", sf_dir) \
        .createOrReplaceTempView("lts_order_all_v")
    return spark.sql("""
        SELECT o_orderstatus,
               date_format(date_trunc('month', o_orderdate), 'yyyy-MM')
                 AS month,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(sign(o_totalprice * 100)
                             * floor(abs(o_totalprice * 100) + 0.5)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM lts_order_all_v
        GROUP BY ALL
        ORDER BY ALL
        LIMIT 10
    """)


# ---------------------------------------------------------------------------
# global temp views (round 6)
# ---------------------------------------------------------------------------

_GLOBAL_TEMP_ORACLE = """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM orders WHERE o_orderkey < 5000
GROUP BY o_orderstatus
"""


@register("sql_global_temp_view", oracle=_GLOBAL_TEMP_ORACLE)
def sql_global_temp_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL temp views (`global_temp` database): session-scoped temp
    views die with the session, global ones are visible to EVERY session
    of the application — the handoff surface between a notebook cell
    that prepares a slice and a job thread that consumes it. The op
    registers the view, then reads it back through a NEW session
    (`spark.newSession()`) — proving the cross-session visibility that
    is the feature's whole point — and aggregates there.

    Scale shape: a view is a named plan, zero materialization; the read
    is the same pruned scan the base query would run."""
    (load_table(spark, "orders", sf_dir)
     .where(F.col("o_orderkey") < 5000)
     .createOrReplaceGlobalTempView("lts_orders_global"))
    other = spark.newSession()
    return other.sql("""
        SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM global_temp.lts_orders_global
        GROUP BY o_orderstatus
    """)


# ---------------------------------------------------------------------------
# day-of-week × hour activity profile (round 6)
# ---------------------------------------------------------------------------

_DOW_HOUR_ORACLE = """
-- DuckDB dayofweek is 0-based Sunday, Spark's is 1-based Sunday: +1
SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
       CAST(COUNT(*) FILTER (WHERE hour(ts) < 6) AS BIGINT) AS h_night,
       CAST(COUNT(*) FILTER (WHERE hour(ts) >= 6 AND hour(ts) < 12)
            AS BIGINT) AS h_morning,
       CAST(COUNT(*) FILTER (WHERE hour(ts) >= 12 AND hour(ts) < 18)
            AS BIGINT) AS h_afternoon,
       CAST(COUNT(*) FILTER (WHERE hour(ts) >= 18) AS BIGINT) AS h_evening,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
FROM events
GROUP BY CAST(dayofweek(ts) + 1 AS BIGINT)
"""


@register("ts_dow_hour_profile", oracle=_DOW_HOUR_ORACLE)
def ts_dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × day-part activity heat profile — the calendar
    seasonality matrix behind every traffic dashboard, as a PIVOTED
    conditional aggregation (one row per weekday, one column per day
    part) rather than a tall (dow, hour, n) table: the wide shape is
    what the chart consumes and what makes the weekday/weekend contrast
    scannable. Day-part buckets are conditional counts (Spark
    count_if ≙ DuckDB COUNT FILTER), Sunday=1 in both engines'
    dayofweek.

    Scale shape: one combinable groupBy to 7 rows; the 'pivot' is four
    conditional aggregates, so no second pass and no pivot shuffle."""
    ev = load_table(spark, "events", sf_dir)
    h = F.hour("ts")

    def part(cond, name):
        return F.count_if(cond).cast("bigint").alias(name)

    return (ev.groupBy(F.dayofweek("ts").cast("bigint").alias("dow"))
            .agg(part(h < 6, "h_night"),
                 part((h >= 6) & (h < 12), "h_morning"),
                 part((h >= 12) & (h < 18), "h_afternoon"),
                 part(h >= 18, "h_evening"),
                 F.sum(iround(F.col("value") * 100)).cast("bigint")
                 .alias("cents")))


# ---------------------------------------------------------------------------
# local-maximum peak detection (round 6)
# ---------------------------------------------------------------------------

_PEAK_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), nav AS (
  SELECT event_type, hr, cents,
         lag(cents) OVER (PARTITION BY event_type ORDER BY hr) AS prev_cents,
         lead(cents) OVER (PARTITION BY event_type ORDER BY hr) AS next_cents
  FROM hourly
)
SELECT event_type, hr, cents, prev_cents, next_cents
FROM nav
WHERE prev_cents IS NOT NULL AND next_cents IS NOT NULL
  AND cents > prev_cents AND cents > next_cents
"""


@register("ts_peak_detect_local", oracle=_PEAK_ORACLE)
def ts_peak_detect_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum peaks in the hourly revenue series per event type —
    an hour strictly above both its neighbors — the primitive beneath
    burst detection, alert de-bouncing, and periodicity eyeballing
    (complements ts_anomaly_zscore's global-moment detector with a
    purely LOCAL one that needs no distribution assumption). The series
    aggregates to exact integer cents first, so peak comparison is pure
    BIGINT — no float anywhere, no tolerance. Interior hours only (first
    and last hour of each series can't certify both sides).

    Scale shape: one combinable groupBy collapses the corpus to the
    calendar (hours × types — data-size-free after the pre-agg), then a
    single lag/lead window per type over the tiny hourly table."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents")))
    w = Window.partitionBy("event_type").orderBy("hr")
    nav = hourly.select(
        "event_type", "hr", "cents",
        F.lag("cents").over(w).alias("prev_cents"),
        F.lead("cents").over(w).alias("next_cents"))
    return nav.where(F.col("prev_cents").isNotNull()
                     & F.col("next_cents").isNotNull()
                     & (F.col("cents") > F.col("prev_cents"))
                     & (F.col("cents") > F.col("next_cents")))


# ---------------------------------------------------------------------------
# percent_rank / cume_dist (round 6)
# ---------------------------------------------------------------------------

_PCTRANK_ORACLE = """
WITH c AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderkey, o_orderpriority, cents,
       percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY cents)
         AS pct_rank,
       cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY cents)
         AS cume_dist
FROM c
"""


@register("win_percent_rank_cume_dist", oracle=_PCTRANK_ORACLE)
def win_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank() and cume_dist() of each order's total within its
    priority class — the two RELATIVE-position window functions
    (complementing win_rank_dense_ntile's ordinal ones): "this order is
    in the 93rd percentile of its class" is how SLA and anomaly
    thresholds get stated. Both are exact rational functions of integer
    ranks — (rank−1)/(n−1) and peers_below_or_equal/n — and both
    engines define them identically over ties (tied rows share rank for
    percent_rank and share the HIGHEST cumulative count for cume_dist),
    so ordering by the exact cent amount alone is deterministic: one
    correctly-rounded double division per value, no rounding discipline
    needed.

    Scale shape: one window shuffle keyed by priority class; both
    functions share the single sort — no second exchange."""
    o = load_table(spark, "orders", sf_dir)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    w = Window.partitionBy("o_orderpriority").orderBy("cents")
    return (o.select("o_orderkey", "o_orderpriority", cents.alias("cents"))
            .select("o_orderkey", "o_orderpriority", "cents",
                    F.percent_rank().over(w).alias("pct_rank"),
                    F.cume_dist().over(w).alias("cume_dist")))


# ---------------------------------------------------------------------------
# multi-lag autocorrelation function (round 6)
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 24

_ACF_ORACLE = f"""
WITH hourly AS (
  SELECT event_type,
         CAST(date_diff('hour', TIMESTAMP '1970-01-01 00:00:00',
                        date_trunc('hour', ts)) AS BIGINT) AS h,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), lags AS (
  SELECT CAST(unnest(range(1, {_ACF_MAX_LAG + 1})) AS BIGINT) AS lag
), paired AS (
  SELECT a.event_type, lags.lag, a.cents AS x, b.cents AS y
  FROM hourly a CROSS JOIN lags
  JOIN hourly b ON b.event_type = a.event_type AND b.h = a.h + lags.lag
), s AS (
  SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM paired GROUP BY event_type, lag
), a AS (
  -- HUGEINT -> DOUBLE via VARCHAR: the skew_kurt correct-rounding hop
  SELECT event_type, lag, n,
         CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS ax,
         CAST(CAST(sy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS ay,
         CAST(CAST(sxy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS axy,
         CAST(CAST(sxx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS axx,
         CAST(CAST(syy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS ayy
  FROM s
)
SELECT event_type, lag, n AS n_pairs,
       (axy - ax * ay)
         / sqrt((axx - ax * ax) * (ayy - ay * ay)) AS acf
FROM a
"""


@register("ts_acf_multi_lag", oracle=_ACF_ORACLE)
def ts_acf_multi_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The autocorrelation function at lags 1…24 of the hourly revenue
    series per event type — the full periodicity probe (a lag-24 spike
    is daily seasonality, a slow decay is trend) that generalizes
    ts_autocorr_lag's single lag-1 number. Sums of cents and their
    cross-products aggregate in decimal(38,0)/HUGEINT space (hourly
    cents ~2·10⁶, squares ~4·10¹² — a 100× corpus would overflow BIGINT
    sums, so wide-decimal from the start, the skew_kurt discipline);
    the Pearson assembly is an average-based double tree identical in
    both engines, with the oracle's HUGEINT sums reaching double via
    the VARCHAR correct-rounding hop.

    Scale shape: the combinable hourly pre-agg collapses the corpus to
    the calendar; the 24-lag spine is a broadcast cross join over the
    HOURLY table (24×hours rows — calendar-bounded, corpus-free); the
    per-(type, lag) moment fold is one combinable groupBy."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents"))
              .select("event_type",
                      (F.unix_timestamp("hr") / 3600).cast("bigint")
                      .alias("h"),
                      "cents")
              .localCheckpoint(eager=False))  # both join sides share it
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = hourly.alias("a")
    b = hourly.alias("b")
    paired = (a.crossJoin(F.broadcast(lags))
              .join(b, (F.col("b.event_type") == F.col("a.event_type"))
                    & (F.col("b.h") == F.col("a.h") + F.col("lag")))
              .select(F.col("a.event_type").alias("event_type"), "lag",
                      F.col("a.cents").alias("x"),
                      F.col("b.cents").alias("y")))
    dec = "decimal(38,0)"
    s = paired.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        # cast BEFORE multiplying: a bigint*bigint product would wrap at
        # ~9·10¹⁸ before the decimal cast could see it
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("syy"))
    nd = F.col("n").cast("double")
    ax = F.col("sx").cast("double") / nd
    ay = F.col("sy").cast("double") / nd
    axy = F.col("sxy").cast("double") / nd
    axx = F.col("sxx").cast("double") / nd
    ayy = F.col("syy").cast("double") / nd
    return s.select(
        "event_type", "lag", F.col("n").alias("n_pairs"),
        ((axy - ax * ay)
         / F.sqrt((axx - ax * ax) * (ayy - ay * ay))).alias("acf"))


# ---------------------------------------------------------------------------
# cross-correlation lead/lag (round 6)
# ---------------------------------------------------------------------------

_XCORR_MAX_LAG = 12

_XCORR_ORACLE = f"""
WITH hourly AS (
  SELECT event_type,
         CAST(date_diff('hour', TIMESTAMP '1970-01-01 00:00:00',
                        date_trunc('hour', ts)) AS BIGINT) AS h,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY event_type, date_trunc('hour', ts)
), x AS (SELECT h, cents FROM hourly WHERE event_type = 'click'),
y AS (SELECT h, cents FROM hourly WHERE event_type = 'purchase'),
lags AS (
  SELECT CAST(unnest(range(-{_XCORR_MAX_LAG}, {_XCORR_MAX_LAG + 1}))
              AS BIGINT) AS lag
), paired AS (
  SELECT lags.lag, x.cents AS xv, y.cents AS yv
  FROM x CROSS JOIN lags
  JOIN y ON y.h = x.h + lags.lag
), s AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(xv) AS sx, SUM(yv) AS sy, SUM(xv * yv) AS sxy,
         SUM(xv * xv) AS sxx, SUM(yv * yv) AS syy
  FROM paired GROUP BY lag
), a AS (
  SELECT lag, n,
         CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS ax,
         CAST(CAST(sy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS ay,
         CAST(CAST(sxy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS axy,
         CAST(CAST(sxx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS axx,
         CAST(CAST(syy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS ayy
  FROM s
)
SELECT lag, n AS n_pairs,
       (axy - ax * ay)
         / sqrt((axx - ax * ax) * (ayy - ay * ay)) AS xcorr
FROM a
"""


@register("ts_xcorr_lead_lag", oracle=_XCORR_ORACLE)
def ts_xcorr_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between the hourly click and purchase revenue
    series at lags −12…+12 — the lead/lag detector ("clicks lead
    purchases by N hours") that turns two KPI series into an actionable
    offset; the CROSS-series sibling of ts_acf_multi_lag, sharing its
    wide-decimal moment discipline and VARCHAR correct-rounding hop.
    A peak at positive lag means the purchase series follows clicks.

    Scale shape: the corpus collapses to two calendar-bounded hourly
    series; the 25-lag spine is a broadcast cross join over the click
    series; one combinable moment fold per lag."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents"))
              .select("event_type",
                      (F.unix_timestamp("hr") / 3600).cast("bigint")
                      .alias("h"),
                      "cents")
              .localCheckpoint(eager=False))
    x = hourly.where(F.col("event_type") == "click").select("h", "cents")
    y = (hourly.where(F.col("event_type") == "purchase")
         .select(F.col("h").alias("hy"), F.col("cents").alias("yv")))
    lags = (spark.range(-_XCORR_MAX_LAG, _XCORR_MAX_LAG + 1)
            .select(F.col("id").alias("lag")))
    paired = (x.crossJoin(F.broadcast(lags))
              .join(y, F.col("hy") == F.col("h") + F.col("lag"))
              .select("lag", F.col("cents").alias("xv"), "yv"))
    dec = "decimal(38,0)"
    s = paired.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("xv").cast(dec)).alias("sx"),
        F.sum(F.col("yv").cast(dec)).alias("sy"),
        F.sum(F.col("xv").cast(dec) * F.col("yv").cast(dec)).alias("sxy"),
        F.sum(F.col("xv").cast(dec) * F.col("xv").cast(dec)).alias("sxx"),
        F.sum(F.col("yv").cast(dec) * F.col("yv").cast(dec)).alias("syy"))
    nd = F.col("n").cast("double")
    ax = F.col("sx").cast("double") / nd
    ay = F.col("sy").cast("double") / nd
    axy = F.col("sxy").cast("double") / nd
    axx = F.col("sxx").cast("double") / nd
    ayy = F.col("syy").cast("double") / nd
    return s.select(
        "lag", F.col("n").alias("n_pairs"),
        ((axy - ax * ay)
         / F.sqrt((axx - ax * ax) * (ayy - ay * ay))).alias("xcorr"))


# ---------------------------------------------------------------------------
# burstiness / Fano factor (round 6)
# ---------------------------------------------------------------------------

_FANO_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s1, CAST(SUM(c * c) AS BIGINT) AS s2
  FROM hourly GROUP BY event_type
), a AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS var_pop
  FROM s
)
SELECT event_type, n AS n_hours, mu AS mean_per_hour,
       var_pop / mu AS fano_factor,
       (sqrt(var_pop) - mu) / (sqrt(var_pop) + mu) AS burstiness
FROM a
"""


@register("ts_burstiness_fano", oracle=_FANO_ORACLE)
def ts_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance/mean of hourly event counts — 1 under a
    Poisson process, >1 = clumped arrivals) and the Goh–Barabási
    burstiness score (σ−μ)/(σ+μ) ∈ [−1, 1) per event type — the
    dispersion diagnostics that tell an autoscaler whether traffic is
    smooth or bursty BEFORE it trusts a mean-based capacity plan
    (complements ts_peak_detect_local's where-are-the-bursts with
    how-bursty-overall). Hourly counts are exact integers; population
    moments assemble through the standard identical double tree.

    Scale shape: hourly pre-agg collapses the corpus to the calendar;
    one combinable three-sum fold per type."""
    ev = load_table(spark, "events", sf_dir)
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    s = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"))
    nd = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / nd
    var_pop = F.col("s2").cast("double") / nd - mu * mu
    return s.select(
        "event_type", F.col("n").alias("n_hours"),
        mu.alias("mean_per_hour"),
        (var_pop / mu).alias("fano_factor"),
        ((F.sqrt(var_pop) - mu) / (F.sqrt(var_pop) + mu))
        .alias("burstiness"))


# ---------------------------------------------------------------------------
# SQL scripting procedural block (round 6)
# ---------------------------------------------------------------------------

_SCRIPT_ORACLE = """
WITH ks AS (
  SELECT CAST(unnest(range(0, 41)) AS BIGINT) AS k
), oc AS (
  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders
), counts AS (
  SELECT ks.k,
         CAST(100 * (CAST(1 AS BIGINT) << ks.k) AS BIGINT) AS thr,
         CAST(COUNT(CASE WHEN oc.cents > 100 * (CAST(1 AS BIGINT) << ks.k)
                         THEN 1 END) AS BIGINT) AS cnt
  FROM ks CROSS JOIN oc GROUP BY ks.k
)
SELECT thr AS threshold_cents, k AS n_doublings, cnt AS n_above
FROM counts WHERE cnt < 100 ORDER BY k LIMIT 1
"""


@register("sql_scripting_block", oracle=_SCRIPT_ORACLE)
def sql_scripting_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI SQL scripting (Spark 4's BEGIN…END procedural blocks):
    DECLARE'd variables and a DATA-DEPENDENT WHILE loop — double a cent
    threshold until fewer than 100 orders exceed it — the migration
    target for every stored-procedure workload a warehouse refugee
    brings (no driver-side Python loop: the control flow runs inside
    the SQL engine, each iteration one scalar-subquery job). The oracle
    is the closed form the loop computes: the least k with
    count(cents > 100·2^k) < 100, found by grading all 41 candidate
    thresholds in one conditional-count pass — loop and closed form
    must agree bit-for-bit on (threshold, k, count).

    Scale shape: fold the corpus ONCE, loop over the fold. The scan
    collapses to a 41-row (k, threshold, count-above) table in one
    combinable pass — per row the highest threshold exceeded is
    floor(log₂((cents−1) div 100)) read off the BINARY STRING LENGTH
    (no float log at a power-of-two boundary), bucket counts suffix-sum
    against the 41-row spine — and that table localCheckpoints, so each
    WHILE iteration is a scalar lookup against 41 cached rows, never a
    corpus re-scan. (A first draft issued the conditional COUNT against
    the corpus view per iteration: ~20 sequential full scans, 6.6 s at
    sf0.1 and scan-bound at 100 TB; this shape runs the same script
    text over the same semantics at corpus-independent loop cost.)"""
    old = spark.conf.get("spark.sql.scripting.enabled", "false")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        oc = (load_table(spark, "orders", sf_dir)
              .select(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
                      .alias("cents")))
        # highest k with cents > 100·2^k  ⟺  k ≤ floor(log2(q)), q=(cents−1)÷100
        q = F.expr("(cents - 1) div 100")
        hk = (F.length(F.bin(q)) - 1).cast("bigint")
        buckets = (oc.where(q >= 1)
                   .groupBy(hk.alias("hk"))
                   .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
        spine = spark.range(0, 41).select(F.col("id").alias("k"))
        hist = (spine.join(F.broadcast(buckets), F.col("hk") >= F.col("k"),
                           "left")
                .groupBy("k")
                .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint")
                     .alias("cnt"))
                .select("k",
                        F.expr("cast(100 * (cast(1 as bigint) "
                               "<< cast(k as int)) as bigint)").alias("thr"),
                        "cnt")
                # r11: ONE partition — every WHILE iteration's scalar
                # subquery launches a job over this table, and at the
                # session's 32 shuffle partitions each of those ~20
                # sequential jobs scheduled 32 tasks to scan 41 rows;
                # coalesce(1) makes each loop job a single task
                .coalesce(1)
                .localCheckpoint())  # loop queries hit 41 cached rows
        hist.createOrReplaceTempView("lts_script_hist")
        return spark.sql("""
        BEGIN
          DECLARE thr BIGINT DEFAULT 100;
          DECLARE kv INT DEFAULT 0;
          DECLARE cnt BIGINT DEFAULT 0;
          SET cnt = (SELECT cnt FROM lts_script_hist WHERE k = 0);
          WHILE cnt >= 100 AND kv < 40 DO
            SET kv = kv + 1;
            -- one multiple-assignment scalar subquery per iteration
            -- (round 9: two separate SETs doubled the sequential job
            -- count, and each scripting scalar job costs ~70 ms of pure
            -- scheduling against the 41 cached rows)
            SET (thr, cnt) = (SELECT thr, cnt FROM lts_script_hist
                              WHERE k = kv);
          END WHILE;
          SELECT thr AS threshold_cents, CAST(kv AS BIGINT) AS n_doublings,
                 cnt AS n_above;
        END
        """)
    finally:
        spark.conf.set("spark.sql.scripting.enabled", old)


# ---------------------------------------------------------------------------
# Markov transition matrix of user journeys (round 6)
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
), c AS (
  SELECT prev_type AS from_type, event_type AS to_type,
         CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT from_type, to_type, n_transitions,
       CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS BIGINT)
         AS from_total,
       CAST(n_transitions AS DOUBLE)
         / CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE)
         AS p_transition
FROM c
"""


@register("seq_markov_transitions", oracle=_MARKOV_ORACLE)
def seq_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user journeys — counts
    and row-normalized probabilities of event_type → event_type steps
    within each user's time-ordered stream; THE product-analytics flow
    diagram ("after an error, 23% of next actions are churn-shaped")
    and the generative model behind session simulators. The lag
    ordering carries the (ts, event_id) total-order tiebreak so
    same-timestamp events sequence identically in both engines; counts
    are exact; each probability is one int/int division over the
    25-cell matrix.

    Scale shape: one (user) window shuffle for the lag, one combinable
    25-cell groupBy, marginals as windows over the cell table."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "event_type",
                    F.lag("event_type").over(w).alias("prev_type"))
    c = (seq.where(F.col("prev_type").isNotNull())
         .groupBy(F.col("prev_type").alias("from_type"),
                  F.col("event_type").alias("to_type"))
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions")))
    wf = Window.partitionBy("from_type")
    tot = F.sum("n_transitions").over(wf).cast("bigint")
    return c.select(
        "from_type", "to_type", "n_transitions",
        tot.alias("from_total"),
        (F.col("n_transitions").cast("double") / tot.cast("double"))
        .alias("p_transition"))


# ---------------------------------------------------------------------------
# sorted-neighborhood blocking for entity resolution (round 6)
# ---------------------------------------------------------------------------

_SNM_W = 3
_SNM_DIFF_CENTS = 100

_SNM_ORACLE = f"""
WITH keyed AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY round(c_acctbal * 100, 0), c_custkey)
           AS rk
  FROM customer
)
SELECT a.c_mktsegment, a.c_custkey AS a_custkey, b.c_custkey AS b_custkey,
       CAST(b.rk - a.rk AS BIGINT) AS rank_dist,
       CAST(abs(b.cents - a.cents) AS BIGINT) AS diff_cents
FROM keyed a JOIN keyed b
  ON a.c_mktsegment = b.c_mktsegment
  AND b.rk > a.rk AND b.rk <= a.rk + {_SNM_W}
WHERE abs(b.cents - a.cents) <= {_SNM_DIFF_CENTS}
"""


@register("er_sorted_neighborhood_pairs", oracle=_SNM_ORACLE)
def er_sorted_neighborhood_pairs(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking for entity resolution — sort each
    segment by account balance, compare every record ONLY to its w=3
    successors in rank order, keep pairs within 100 cents: the classic
    duplicate-account screen whose candidate volume is w·n by
    construction (contrast the hash blocking of
    join_fuzzy_levenshtein_blocked: hash blocks catch exact-key
    collisions, sorted neighborhoods catch NEAR-key neighbors hash
    blocking spreads across blocks — real ER stacks run both and union
    candidates). Generated WITHOUT a self-join: the w successors come
    off lead() columns over the already-sorted window, so candidate
    generation is map-side after the one sort shuffle.

    Scale shape: one window shuffle per segment; w lead columns; the
    unpivot to pairs and the distance filter are map-side. The oracle
    uses the equivalent rank-band self-join."""
    c = load_table(spark, "customer", sf_dir)
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    w = Window.partitionBy("c_mktsegment").orderBy("cents", "c_custkey")
    keyed = c.select("c_custkey", "c_mktsegment", cents.alias("cents")) \
             .withColumn("rk", F.row_number().over(w))
    leads = keyed.select(
        "c_mktsegment", "c_custkey", "cents",
        F.array(*[
            F.struct(F.lead("c_custkey", k).over(w).alias("b_custkey"),
                     F.lead("cents", k).over(w).alias("b_cents"),
                     F.lit(k).cast("bigint").alias("rank_dist"))
            for k in range(1, _SNM_W + 1)]).alias("nbrs"))
    pairs = (leads.select(
        "c_mktsegment", F.col("c_custkey").alias("a_custkey"), "cents",
        F.explode("nbrs").alias("nb"))
        .where(F.col("nb.b_custkey").isNotNull()))
    diff = F.abs(F.col("nb.b_cents") - F.col("cents")).cast("bigint")
    return (pairs.where(diff <= _SNM_DIFF_CENTS)
            .select("c_mktsegment", "a_custkey",
                    F.col("nb.b_custkey").alias("b_custkey"),
                    F.col("nb.rank_dist").alias("rank_dist"),
                    diff.alias("diff_cents")))


# ---------------------------------------------------------------------------
# cumulative sum with reset-on-flag (round 6)
# ---------------------------------------------------------------------------

_RESET_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg_no
  FROM events
)
SELECT user_id, event_id, cents, seg_no,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 0 ELSE cents END)
            OVER (PARTITION BY user_id, seg_no ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
FROM seq
"""


@register("win_cumsum_reset_on_flag", oracle=_RESET_ORACLE)
def win_cumsum_reset_on_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total that RESETS whenever a flag event occurs (here: an
    'error' zeroes the user's accumulator) — the counter/balance/streak
    pattern plain window frames cannot express because the reset points
    are DATA-dependent. Solved with the two-window segment trick (the
    win_streaks_islands discipline): the cumulative count of reset
    events IS the segment id, and the running sum re-windows on
    (user, segment). The reset row itself restarts at 0 (its cents are
    excluded via the CASE), matching how a real balance reset posts.
    All integer cents — no float anywhere.

    Scale shape: both windows share the one (user, time) sort exchange
    (same partition key, same order); everything else is map-side."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    w1 = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seq = ev.select(
        "user_id", "event_id", "ts", "event_type", cents.alias("cents"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .over(w1).cast("bigint").alias("seg_no"))
    w2 = Window.partitionBy("user_id", "seg_no").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return seq.select(
        "user_id", "event_id", "cents", "seg_no",
        F.sum(F.when(F.col("event_type") == "error", 0)
              .otherwise(F.col("cents")))
        .over(w2).cast("bigint").alias("run_cents"))


# ---------------------------------------------------------------------------
# data-quality expectations report (round 6)
# ---------------------------------------------------------------------------

_DQ_ORACLE = """
SELECT * FROM (
  SELECT 'row_count_min_1000' AS expectation,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS metric,
         CAST(1000 AS BIGINT) AS threshold,
         (SELECT COUNT(*) FROM orders) >= 1000 AS passed
  UNION ALL
  SELECT 'custkey_null_violations',
         (SELECT CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
          FROM orders),
         CAST(0 AS BIGINT),
         (SELECT COUNT(*) FILTER (WHERE o_custkey IS NULL) FROM orders) <= 0
  UNION ALL
  SELECT 'status_domain_violations',
         (SELECT CAST(COUNT(*) FILTER (
            WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
          FROM orders),
         CAST(0 AS BIGINT),
         (SELECT COUNT(*) FILTER (
            WHERE o_orderstatus NOT IN ('O', 'F', 'P')) FROM orders) <= 0
  UNION ALL
  SELECT 'orderkey_duplicate_rows',
         (SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
          FROM orders),
         CAST(0 AS BIGINT),
         (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) <= 0
  UNION ALL
  SELECT 'custkey_fk_orphans',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey)),
         CAST(0 AS BIGINT),
         (SELECT COUNT(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey)) <= 0
  UNION ALL
  SELECT 'totalprice_nonpositive',
         (SELECT CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
          FROM orders),
         CAST(0 AS BIGINT),
         (SELECT COUNT(*) FILTER (WHERE o_totalprice <= 0) FROM orders) <= 0
)
"""


@register("dq_expectations_report", oracle=_DQ_ORACLE)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality expectations report over the orders
    feed — the batch-layer validation gate a lambda pipeline runs
    BEFORE publishing a batch view: minimum row count, null-rate,
    value-domain, primary-key uniqueness, referential integrity to
    customer, and range sanity, each emitted as a
    (expectation, metric, threshold, passed) row so the sink can
    quarantine on any failed row. All metrics are exact integer counts;
    five of six fold map-side in ONE pass over the scan (conditional
    counts) — only the FK orphan check needs the anti-join.

    Scale shape: one combinable multi-count aggregate + one broadcast
    anti join (customer is the dim side); output is 6 rows."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir).select("c_custkey")
    base = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).cast("bigint")
        .alias("n_null_cust"),
        F.count(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1))
        .cast("bigint").alias("n_bad_status"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).cast("bigint")
        .alias("n_dup_keys"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).cast("bigint")
        .alias("n_nonpos"))
    orphans = (o.join(F.broadcast(c),
                      o.o_custkey == c.c_custkey, "left_anti")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans")))
    b = base.crossJoin(orphans)

    def row(name: str, metric, threshold: int, ge: bool = False):
        passed = metric >= threshold if ge else metric <= threshold
        return b.select(F.lit(name).alias("expectation"),
                        metric.cast("bigint").alias("metric"),
                        F.lit(threshold).cast("bigint").alias("threshold"),
                        passed.alias("passed"))

    out = row("row_count_min_1000", F.col("n_rows"), 1000, ge=True)
    for name, colname in [("custkey_null_violations", "n_null_cust"),
                          ("status_domain_violations", "n_bad_status"),
                          ("orderkey_duplicate_rows", "n_dup_keys"),
                          ("custkey_fk_orphans", "n_orphans"),
                          ("totalprice_nonpositive", "n_nonpos")]:
        out = out.unionAll(row(name, F.col(colname), 0))
    return out


# ---------------------------------------------------------------------------
# exact weighted median (round 6)
# ---------------------------------------------------------------------------

_WMEDIAN_ORACLE = """
WITH base AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
         CAST(round(l_quantity, 0) AS BIGINT) AS w
  FROM lineitem
), cum AS (
  SELECT l_returnflag, cents, w,
         CAST(SUM(w) OVER (PARTITION BY l_returnflag
                           ORDER BY cents, w
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
         CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
  FROM base
)
SELECT l_returnflag, MAX(tw) AS total_weight,
       MIN(CASE WHEN 2 * cw >= tw THEN cents END) AS weighted_median_cents
FROM cum GROUP BY l_returnflag
"""


@register("agg_weighted_median", oracle=_WMEDIAN_ORACLE)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median of line-item price, weighted by quantity,
    per return flag — the robust center for "typical unit price" where
    each row speaks for its quantity (the plain median of
    agg_mad_robust treats a 1-unit and a 50-unit line identically).
    Discrete definition: the smallest value whose cumulative weight
    reaches half the total (2·cw ≥ tw in pure integers — no halves, no
    interpolation, no floats anywhere).

    Scale shape — TWO-PASS BUCKETED cumulative (a naive per-flag
    cumulative window measured 5.1× at the 10× probe: 3 flags = 3-way
    parallelism sorting the whole corpus). Pass 1 folds weights into
    fixed-width value buckets (cents div 2¹⁶ — combinable, fully
    parallel); the cumulative scan runs over the tiny (flag × bucket)
    table to locate each flag's MEDIAN BUCKET and its preceding weight;
    pass 2 sorts ONLY inside that one bucket (~1/160th of the rows) and
    offsets its running weight by the bucket prefix. Same integer
    definition, same result, no corpus-sized single-partition sort."""
    bucket_w = 1 << 16
    li = load_table(spark, "lineitem", sf_dir)
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    wgt = F.round(F.col("l_quantity"), 0).cast("bigint")
    base = (li.select("l_returnflag", cents.alias("cents"),
                      wgt.alias("w"))
            .withColumn("b", F.expr(f"cents div {bucket_w}"))
            .localCheckpoint(eager=False))  # both passes share it
    # pass 1: combinable bucket fold, then a cumulative scan over the
    # (flag x ~160 buckets) table
    buckets = (base.groupBy("l_returnflag", "b")
               .agg(F.sum("w").cast("bigint").alias("bw")))
    wp = Window.partitionBy("l_returnflag")
    cumb = buckets.select(
        "l_returnflag", "b", "bw",
        F.sum("bw").over(wp.orderBy("b")
                         .rowsBetween(Window.unboundedPreceding,
                                      Window.currentRow))
        .cast("bigint").alias("cum_incl"),
        F.sum("bw").over(wp).cast("bigint").alias("tw"))
    target = (cumb.where(2 * F.col("cum_incl") >= F.col("tw"))
              .groupBy("l_returnflag")
              .agg(F.min_by(F.struct("b", "cum_incl", "bw", "tw"),
                            F.col("b")).alias("t"))
              .select("l_returnflag", F.col("t.b").alias("tb"),
                      (F.col("t.cum_incl") - F.col("t.bw"))
                      .alias("cum_before"),
                      F.col("t.tw").alias("tw")))
    # pass 2: cumulative only inside each flag's median bucket
    inb = (base.join(F.broadcast(target), "l_returnflag")
           .where(F.col("b") == F.col("tb")))
    cw = (F.col("cum_before")
          + F.sum("w").over(wp.orderBy("cents", "w")
                            .rowsBetween(Window.unboundedPreceding,
                                         Window.currentRow))
          .cast("bigint"))
    return (inb.select("l_returnflag", "cents", "tw", cw.alias("cw"))
            .groupBy("l_returnflag")
            .agg(F.max("tw").alias("total_weight"),
                 F.min(F.when(2 * F.col("cw") >= F.col("tw"),
                              F.col("cents")))
                 .alias("weighted_median_cents")))


# ---------------------------------------------------------------------------
# rolling regression slope (round 6)
# ---------------------------------------------------------------------------

_ROLL_SLOPE_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         CAST(date_diff('hour', TIMESTAMP '1970-01-01 00:00:00',
                        date_trunc('hour', ts)) AS BIGINT) AS h,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), m AS (
  SELECT event_type, h, cents,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(h) OVER w AS BIGINT) AS sx,
         CAST(SUM(cents) OVER w AS BIGINT) AS sy,
         CAST(SUM(h * cents) OVER w AS BIGINT) AS sxy,
         CAST(SUM(h * h) OVER w AS BIGINT) AS sxx
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT event_type, h, cents, n AS n_obs,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_hour
FROM m WHERE n >= 2
"""


@register("win_rolling_slope", oracle=_ROLL_SLOPE_ORACLE)
def win_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h least-squares slope of the hourly revenue series per
    type — the "rolling beta" every monitoring dashboard draws: is the
    last day trending up or down, per hour, with no global fit? All
    five frame moments (n, Σx, Σy, Σxy, Σx²) are exact BIGINT window
    sums over the SAME 24-row frame (one exchange, five shared
    aggregates); the numerator n·Σxy − Σx·Σy and denominator
    n·Σx² − (Σx)² ship as EXACT INTEGER columns, with the slope their
    single-division quotient — the oracle hash covers the integers, so
    the float column can never mask an arithmetic drift.

    Scale shape: calendar-bounded hourly pre-agg; one frame window per
    type; everything combinable before it."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents"))
              .select("event_type",
                      (F.unix_timestamp("hr") / 3600).cast("bigint")
                      .alias("h"),
                      "cents"))
    w = Window.partitionBy("event_type").orderBy("h") \
        .rowsBetween(-23, Window.currentRow)
    m = hourly.select(
        "event_type", "h", "cents",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("h").over(w).cast("bigint").alias("sx"),
        F.sum("cents").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("h") * F.col("cents")).over(w).cast("bigint")
        .alias("sxy"),
        F.sum(F.col("h") * F.col("h")).over(w).cast("bigint").alias("sxx"))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        .cast("bigint")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) \
        .cast("bigint")
    return (m.where(F.col("n") >= 2)
            .select("event_type", "h", "cents",
                    F.col("n").alias("n_obs"),
                    num.alias("slope_num"), den.alias("slope_den"),
                    (num.cast("double") / den.cast("double"))
                    .alias("slope_cents_per_hour")))


# ---------------------------------------------------------------------------
# forecast-accuracy eval (round 6)
# ---------------------------------------------------------------------------

_WAPE_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), pred AS (
  SELECT event_type, hr, cents,
         lag(cents, 24) OVER (PARTITION BY event_type ORDER BY hr) AS yhat
  FROM hourly
), err AS (
  SELECT event_type, cents, yhat,
         abs(cents - yhat) AS abs_err, cents - yhat AS err
  FROM pred WHERE yhat IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(abs_err) AS BIGINT) AS sum_abs_err,
       CAST(SUM(abs(cents)) AS BIGINT) AS sum_abs_actual,
       CAST(SUM(abs_err) AS DOUBLE) / CAST(SUM(abs(cents)) AS DOUBLE)
         AS wape,
       CAST(SUM(abs_err) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0
         AS mae_dollars,
       CAST(SUM(err) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0
         AS bias_dollars
FROM err GROUP BY event_type
"""


@register("ts_forecast_eval_wape", oracle=_WAPE_ORACLE)
def ts_forecast_eval_wape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-accuracy scorecard — WAPE, MAE and signed bias of the
    seasonal-naive forecast (ŷₜ = yₜ₋₂₄, "same hour yesterday") per
    event type: the baseline every real forecasting deployment must
    beat, and the eval harness that scores it. All error sums are exact
    BIGINT cents (WAPE chosen over sMAPE deliberately: sMAPE's per-term
    float ratios would need an order-pinned sum, WAPE's Σ|e|/Σ|y| is
    two integer sums and one division).

    Scale shape: hourly pre-agg collapses the corpus; one lag window
    per type; one combinable four-sum fold."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents")))
    w = Window.partitionBy("event_type").orderBy("hr")
    pred = hourly.select(
        "event_type", "cents",
        F.lag("cents", 24).over(w).alias("yhat"))
    err = (pred.where(F.col("yhat").isNotNull())
           .select("event_type", "cents",
                   F.abs(F.col("cents") - F.col("yhat")).alias("abs_err"),
                   (F.col("cents") - F.col("yhat")).alias("err")))
    s = err.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("abs_err").cast("bigint").alias("sum_abs_err"),
        F.sum(F.abs("cents")).cast("bigint").alias("sum_abs_actual"),
        F.sum("err").cast("bigint").alias("sum_err"))
    return s.select(
        "event_type", "n_hours", "sum_abs_err", "sum_abs_actual",
        (F.col("sum_abs_err").cast("double")
         / F.col("sum_abs_actual").cast("double")).alias("wape"),
        (F.col("sum_abs_err").cast("double")
         / F.col("n_hours").cast("double") / F.lit(100.0))
        .alias("mae_dollars"),
        (F.col("sum_err").cast("double")
         / F.col("n_hours").cast("double") / F.lit(100.0))
        .alias("bias_dollars"))


# ---------------------------------------------------------------------------
# Hampel outlier filter (round 6)
# ---------------------------------------------------------------------------

# 3 * 1.4826 = 4.4478 — compare 10000*dev > 44478*MAD in pure integers
_HAMPEL_NUM = 44478
_HAMPEL_DEN = 10000

_HAMPEL_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), framed AS (
  SELECT event_type, hr, cents,
         list(cents) OVER (PARTITION BY event_type ORDER BY hr
                           ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
           AS frame
  FROM hourly
), med AS (
  SELECT event_type, hr, cents,
         list_sort(frame)[(len(frame) + 1) // 2] AS med, frame
  FROM framed
), mad AS (
  SELECT event_type, hr, cents, med,
         list_sort(list_transform(frame, x -> abs(x - med)))
           [(len(frame) + 1) // 2] AS mad
  FROM med
)
SELECT event_type, hr, cents,
       CAST(med AS BIGINT) AS rolling_median,
       CAST(mad AS BIGINT) AS rolling_mad,
       {_HAMPEL_DEN} * abs(cents - med) > {_HAMPEL_NUM} * mad AS is_outlier
FROM mad
"""


@register("ts_hampel_filter", oracle=_HAMPEL_ORACLE)
def ts_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel outlier filter over the hourly series per type — flag an
    hour when its deviation from the ROLLING median exceeds
    3·1.4826·(rolling MAD of the same ±12h frame): the robust detector
    that, unlike ts_anomaly_zscore, a single spike cannot blind,
    because both center and spread are medians. Entirely integer: the
    frame materializes as a 25-element array (collect_list over the
    frame), medians are DISCRETE lower-median picks from the sorted
    array, and the 1.4826 Gaussian consistency constant is applied as
    the integer cross-multiplication 10000·dev > 44478·MAD — no float
    exists anywhere in the operator.

    Scale shape: hourly pre-agg collapses the corpus; one frame window
    per type over the calendar-sized table; the 25-element array sorts
    are per-row constant work."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents")))
    w = Window.partitionBy("event_type").orderBy("hr").rowsBetween(-12, 12)
    framed = hourly.select(
        "event_type", "hr", "cents",
        F.collect_list("cents").over(w).alias("frame"))
    n = F.size("frame")
    med = F.element_at(F.array_sort("frame"),
                       ((n + 1) / 2).cast("int"))
    withmed = framed.withColumn("med", med)
    mad = F.element_at(
        F.array_sort(F.transform("frame",
                                 lambda x: F.abs(x - F.col("med")))),
        ((n + 1) / 2).cast("int"))
    withmad = withmed.withColumn("mad", mad)
    return withmad.select(
        "event_type", "hr", "cents",
        F.col("med").cast("bigint").alias("rolling_median"),
        F.col("mad").cast("bigint").alias("rolling_mad"),
        (F.lit(_HAMPEL_DEN) * F.abs(F.col("cents") - F.col("med"))
         > F.lit(_HAMPEL_NUM) * F.col("mad")).alias("is_outlier"))


# ---------------------------------------------------------------------------
# pinball-loss quantile-forecast eval (round 6)
# ---------------------------------------------------------------------------

# tau in tenths: loss*10 = sum(max(tau10*(y-q), (tau10-10)*(y-q))) stays
# INTEGER for every tau on the grid — no per-term float ratios
_PINBALL_TAUS = (1, 5, 9)

_PINBALL_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), pred AS (
  SELECT event_type, cents,
         lag(cents, 24) OVER (PARTITION BY event_type ORDER BY hr) AS q
  FROM hourly
), err AS (
  SELECT event_type, cents - q AS d FROM pred WHERE q IS NOT NULL
), taus AS (
  SELECT CAST(unnest([{", ".join(str(t) for t in _PINBALL_TAUS)}])
              AS BIGINT) AS tau10
)
SELECT event_type, tau10,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(GREATEST(tau10 * d, (tau10 - 10) * d)) AS BIGINT)
         AS pinball_x10_cents,
       CAST(SUM(GREATEST(tau10 * d, (tau10 - 10) * d)) AS DOUBLE)
         / (10.0 * CAST(COUNT(*) AS DOUBLE) * 100.0)
         AS mean_pinball_dollars
FROM err CROSS JOIN taus
GROUP BY event_type, tau10
"""


@register("ts_pinball_loss_eval", oracle=_PINBALL_ORACLE)
def ts_pinball_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss of the seasonal-naive forecast at
    τ ∈ {0.1, 0.5, 0.9} per event type — the scoring rule for quantile
    forecasts (a P90 capacity forecast is judged by pinball@0.9, not by
    MAE; this extends ts_forecast_eval_wape's point-forecast scorecard
    to the quantile world). The τ grid is expressed in TENTHS so the
    per-term loss max(τ₁₀·d, (τ₁₀−10)·d) is pure BIGINT — the whole sum
    is exact and order-free, with one division into dollars at the end.

    Scale shape: hourly pre-agg → lag window → broadcast 3-row τ spine
    → one combinable fold per (type, τ)."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents")))
    w = Window.partitionBy("event_type").orderBy("hr")
    err = (hourly.select("event_type", "cents",
                         F.lag("cents", 24).over(w).alias("q"))
           .where(F.col("q").isNotNull())
           .select("event_type", (F.col("cents") - F.col("q")).alias("d")))
    taus = spark.createDataFrame([(t,) for t in _PINBALL_TAUS],
                                 "tau10 bigint")
    loss = F.greatest(F.col("tau10") * F.col("d"),
                      (F.col("tau10") - 10) * F.col("d"))
    return (err.crossJoin(F.broadcast(taus))
            .groupBy("event_type", "tau10")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hours"),
                 F.sum(loss).cast("bigint").alias("pinball_x10_cents"))
            .select("event_type", "tau10", "n_hours", "pinball_x10_cents",
                    (F.col("pinball_x10_cents").cast("double")
                     / (F.lit(10.0) * F.col("n_hours").cast("double")
                        * F.lit(100.0)))
                    .alias("mean_pinball_dollars")))


# ---------------------------------------------------------------------------
# column-entropy data profile (round 6)
# ---------------------------------------------------------------------------

_ENTROPY_PROFILE_ORACLE = """
WITH cols AS (
  SELECT 'event_type' AS col_name, event_type AS v FROM events
  UNION ALL
  SELECT 'dow', CAST(dayofweek(ts) + 1 AS VARCHAR) FROM events
  UNION ALL
  SELECT 'value_band', CAST(CAST(round(value * 100, 0) AS BIGINT)
                            // 10000 AS VARCHAR) FROM events
), c AS (
  SELECT col_name, v, CAST(COUNT(*) AS BIGINT) AS n
  FROM cols GROUP BY col_name, v
), t AS (
  SELECT col_name, v, n,
         CAST(SUM(n) OVER (PARTITION BY col_name) AS BIGINT) AS tot,
         CAST(COUNT(*) OVER (PARTITION BY col_name) AS BIGINT) AS k
  FROM c
)
SELECT col_name, CAST(MAX(k) AS BIGINT) AS n_distinct,
       CAST(MAX(tot) AS BIGINT) AS n_rows,
       round(list_sum(list(
         round(-(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
               * ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)), 9)
         ORDER BY v)), 6) AS entropy_nats,
       round(round(list_sum(list(
         round(-(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
               * ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)), 9)
         ORDER BY v)), 6) / round(ln(CAST(MAX(k) AS DOUBLE)), 6), 6)
         AS entropy_normalized
FROM t GROUP BY col_name
"""


@register("dq_column_entropy_profile", oracle=_ENTROPY_PROFILE_ORACLE)
def dq_column_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon-entropy data profile of three categorical projections of
    the event feed (type, day-of-week, value band) — the profiling
    metric behind "this column became constant" / "this id column
    exploded" drift alarms, complementing dq_expectations_report's
    hard gates with distribution-shape monitoring. Each column's
    entropy is a cross-category float sum, pinned the ANOVA way: the
    per-category terms round to 9 dp and fold in a FIXED category order
    (DuckDB ordered list fold == Spark sorted-array F.aggregate fold),
    then the sum rounds to 6; normalization divides by ln(k) rounded
    the same way.

    Scale shape: one union-of-projections pass (map-side), a combinable
    (col, value) count, and per-column folds over category-bounded
    tables."""
    ev = load_table(spark, "events", sf_dir)
    cols = (ev.select(F.lit("event_type").alias("col_name"),
                      F.col("event_type").alias("v"))
            .unionAll(ev.select(F.lit("dow"),
                                F.dayofweek("ts").cast("string")))
            .unionAll(ev.select(
                F.lit("value_band"),
                F.expr("cast(cast(round(value * 100, 0) as bigint) "
                       "div 10000 as string)"))))
    c = (cols.groupBy("col_name", "v")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    wcol = Window.partitionBy("col_name")
    t = c.select("col_name", "v", "n",
                 F.sum("n").over(wcol).cast("bigint").alias("tot"),
                 F.count(F.lit(1)).over(wcol).cast("bigint").alias("k"))
    term = F.round(-(F.col("n").cast("double")
                     / F.col("tot").cast("double"))
                   * F.log(F.col("n").cast("double")
                           / F.col("tot").cast("double")), 9)
    ent = F.round(F.aggregate(
        F.array_sort(F.collect_list(F.struct(F.col("v"),
                                             term.alias("t")))),
        F.lit(0.0), lambda acc, x: acc + x["t"]), 6)
    return (t.groupBy("col_name")
            .agg(F.max("k").cast("bigint").alias("n_distinct"),
                 F.max("tot").cast("bigint").alias("n_rows"),
                 ent.alias("entropy_nats"))
            .select("col_name", "n_distinct", "n_rows", "entropy_nats",
                    F.round(F.col("entropy_nats")
                            / F.round(F.log(F.col("n_distinct")
                                            .cast("double")), 6), 6)
                    .alias("entropy_normalized")))


# ---------------------------------------------------------------------------
# banded DTW series similarity (round 6 — rows-only)
# ---------------------------------------------------------------------------

_DTW_BAND = 48


def dtw_banded_cost(xs, ys, band: int = _DTW_BAND) -> int:
    """Sakoe–Chiba banded DTW with |x−y| integer step cost — the shared
    reference kernel (pure Python ints, no float ever): the operator's
    executors and the pytest gate both call THIS function, and the gate
    additionally re-derives it against an independently-written
    recursive implementation on small series."""
    n, m = len(xs), len(ys)
    big = 1 << 62
    prev = [big] * (m + 1)
    prev[0] = 0
    for i in range(1, n + 1):
        cur = [big] * (m + 1)
        lo = max(1, i - band)
        hi = min(m, i + band)
        for j in range(lo, hi + 1):
            c = abs(xs[i - 1] - ys[j - 1])
            best = prev[j - 1]
            if prev[j] < best:
                best = prev[j]
            if cur[j - 1] < best:
                best = cur[j - 1]
            cur[j] = c + best
        prev = cur
    return prev[m]


@register("ts_dtw_banded_pairs")
def ts_dtw_banded_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded Dynamic Time Warping distance between every pair of
    event-type hourly revenue series — the time-series similarity join
    of the retrieved paper corpus (PAPERS.md: streaming time-series /
    trajectory similarity), answering "which KPIs move together even
    when one lags the other" where plain correlation demands exact
    alignment. Sakoe–Chiba band 48 (two days) bounds the warp; step
    cost |Δcents| keeps the whole DP in INTEGERS (bit-deterministic —
    the rows-only gate is two-run identity plus a pin of the kernel
    against an independently-written recursive DTW in
    test_llm_quality.py; no SQL oracle BY DESIGN: an O(n·band) DP
    recurrence has no DuckDB expression).

    Scale shape: the corpus collapses to K calendar-bounded series
    (combinable hourly pre-agg + per-type sorted pack); the K(K−1)/2
    pair table fans out via broadcast; each DP runs where its pair row
    lives — mapInPandas on executors, nothing on the driver. Wall is
    O(K² · hours · band) with hours calendar-bounded, corpus-free."""
    import pandas as pd

    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents")))
    series = (hourly.groupBy("event_type")
              .agg(F.array_sort(F.collect_list(F.struct("hr", "cents")))
                   .alias("pts"))
              .select("event_type",
                      F.col("pts.cents").alias("series"))
              .localCheckpoint(eager=False))  # both pair sides share it
    a = series.select(F.col("event_type").alias("type_a"),
                      F.col("series").alias("sa"))
    b = series.select(F.col("event_type").alias("type_b"),
                      F.col("series").alias("sb"))
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))

    def _dp(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                xs = [int(v) for v in r.sa]
                ys = [int(v) for v in r.sb]
                cost = dtw_banded_cost(xs, ys)
                rows.append((r.type_a, r.type_b, len(xs), len(ys),
                             cost, cost // (len(xs) + len(ys))))
            yield pd.DataFrame(rows, columns=[
                "type_a", "type_b", "n_a", "n_b",
                "dtw_cost_cents", "dtw_per_step_cents"])

    return pairs.mapInPandas(
        _dp, "type_a string, type_b string, n_a bigint, n_b bigint, "
             "dtw_cost_cents bigint, dtw_per_step_cents bigint")


# ---------------------------------------------------------------------------
# SAX symbolic aggregate approximation (round 6)
# ---------------------------------------------------------------------------

_SAX_ORACLE = """
WITH hourly AS (
  SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         (hour(ts) // 6) AS blk,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS bs
  FROM events
  GROUP BY event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d'),
           (hour(ts) // 6)
), mom AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(bs) AS BIGINT) AS s1,
         CAST(SUM(bs * bs) AS BIGINT) AS s2
  FROM hourly GROUP BY event_type
), z AS (
  SELECT h.event_type, h.day, h.blk,
         CAST(h.bs AS DOUBLE) AS bsd,
         CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE) AS mu,
         sqrt((CAST(m.s2 AS DOUBLE) / CAST(m.n AS DOUBLE)
               - (CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE))
                 * (CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE)))
              * (CAST(m.n AS DOUBLE) / (CAST(m.n AS DOUBLE) - 1.0))) AS sig
  FROM hourly h JOIN mom m ON h.event_type = m.event_type
), sym AS (
  SELECT event_type, day, blk,
         CASE WHEN bsd < mu - 0.6745 * sig THEN 'a'
              WHEN bsd < mu THEN 'b'
              WHEN bsd < mu + 0.6745 * sig THEN 'c'
              ELSE 'd' END AS s
  FROM z
)
SELECT event_type, day,
       COALESCE(MIN(CASE WHEN blk = 0 THEN s END), '_')
       || COALESCE(MIN(CASE WHEN blk = 1 THEN s END), '_')
       || COALESCE(MIN(CASE WHEN blk = 2 THEN s END), '_')
       || COALESCE(MIN(CASE WHEN blk = 3 THEN s END), '_') AS sax_word
FROM sym GROUP BY event_type, day
"""


@register("ts_sax_symbolize", oracle=_SAX_ORACLE)
def ts_sax_symbolize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation) of each event type's
    revenue series: PAA into four 6-hour blocks per day, z-scored
    against the type's own block distribution, mapped to the alphabet-4
    Gaussian breakpoints (-0.6745, 0, +0.6745) and packed into one
    4-char word per day -- the representation that turns time-series
    motif/novelty discovery into plain string operations (two days
    behave alike iff their words match; a never-seen word IS the
    anomaly). The ts_dtw_banded_pairs genre at per-day granularity with
    O(1) comparisons instead of O(n*band) DP.

    Determinism: block sums are exact BIGINT cents; mu/sigma come from
    integer moments through the standard identical tree; each symbol is
    a float comparison of identically-computed doubles (breakpoint
    constants are exact literals, the ts_anomaly_zscore precedent);
    word assembly is four conditional MINs -- no float ever leaves the
    comparison, so the OUTPUT is pure strings (the day projects as
    yyyy-MM-dd, the portable projection), hash-exact by construction.

    Scale shape: one combinable (type, day, blk) groupBy collapses the
    corpus to the calendar; the 5-row moment table broadcasts back; the
    word pack is a 4-rows-per-group fold over calendar-sized data."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy(F.col("event_type"),
                         F.date_format("ts", "yyyy-MM-dd").alias("day"),
                         F.floor(F.hour("ts") / 6).alias("blk"))
              .agg(F.sum(cents).cast("bigint").alias("bs")))
    mom = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("bs").cast("bigint").alias("s1"),
        F.sum(F.col("bs") * F.col("bs")).cast("bigint").alias("s2"))
    nd = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / nd
    sig = F.sqrt((F.col("s2").cast("double") / nd - mu * mu)
                 * (nd / (nd - F.lit(1.0))))
    z = (hourly.join(F.broadcast(mom), "event_type")
         .select("event_type", "day", "blk",
                 F.col("bs").cast("double").alias("bsd"),
                 mu.alias("mu"), sig.alias("sig")))
    s = (F.when(F.col("bsd") < F.col("mu") - F.lit(0.6745) * F.col("sig"),
                F.lit("a"))
         .when(F.col("bsd") < F.col("mu"), F.lit("b"))
         .when(F.col("bsd") < F.col("mu") + F.lit(0.6745) * F.col("sig"),
               F.lit("c"))
         .otherwise(F.lit("d")))
    sym = z.select("event_type", "day", "blk", s.alias("s"))
    blk_min = [F.coalesce(F.min(F.when(F.col("blk") == i, F.col("s"))),
                          F.lit("_")) for i in range(4)]
    return (sym.groupBy("event_type", "day")
            .agg(F.concat(*blk_min).alias("sax_word")))


# ---------------------------------------------------------------------------
# funnel time-to-convert quantiles (round 6)
# ---------------------------------------------------------------------------

_TTC_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
), conv AS (
  SELECT v.user_id,
         CAST(epoch_us(MIN(e.ts)) - epoch_us(v.v_ts) AS BIGINT)
           AS elapsed_us,
         date_trunc('week', v.v_ts) AS week
  FROM v JOIN events e
    ON e.user_id = v.user_id AND e.event_type = 'purchase'
       AND e.ts >= v.v_ts
  GROUP BY v.user_id, v.v_ts
), ranked AS (
  SELECT week, elapsed_us,
         row_number() OVER (PARTITION BY week ORDER BY elapsed_us) AS rn,
         COUNT(*) OVER (PARTITION BY week) AS n
  FROM conv
)
SELECT week, CAST(MAX(n) AS BIGINT) AS n_converted,
       CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN elapsed_us END) // 1000000
            AS BIGINT) AS median_s,
       CAST(MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN elapsed_us END)
            // 1000000 AS BIGINT) AS p90_s
FROM ranked GROUP BY week
"""


@register("seq_funnel_time_to_convert", oracle=_TTC_ORACLE)
def seq_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel LATENCY: for each user whose first 'view' is later followed
    by a 'purchase', the elapsed seconds between them, rolled up per
    first-view week as converting-user count plus DISCRETE median and
    p90 -- funnel_view_click_purchase says HOW MANY convert; this says
    HOW LONG conversion takes, the number a checkout-flow change
    actually moves. Quantiles are rank-picked integers (the
    ts_outlier_iqr rule: values at sorted positions ceil(n/2) and
    ceil(9n/10)), elapsed times are exact epoch-second differences --
    the whole output is BIGINTs and week timestamps, hash-exact with no
    float anywhere.

    Elapsed times rank in exact MICROSECONDS (epoch_us both engines --
    per-timestamp second-flooring would shift ranks) and report floored
    to whole seconds.

    Scale shape: first-view extraction is one combinable user-keyed
    groupBy; the purchase match is a user-keyed equi-join (both sides
    hash the same key, no broadcast needed at any scale); quantile
    windows partition by WEEK, so no global sort -- per-week two-pass
    bucketed rank is the documented swap if single weeks outgrow a
    partition."""
    ev = load_table(spark, "events", sf_dir)
    v = (ev.where(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("v_ts")))
    p = ev.where(F.col("event_type") == "purchase") \
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    conv = (v.join(p, (F.col("user_id") == F.col("p_user"))
                   & (F.col("p_ts") >= F.col("v_ts")))
            .groupBy("user_id", "v_ts")
            .agg(F.min("p_ts").alias("c_ts"))
            .select(F.date_trunc("week", "v_ts").alias("week"),
                    (F.unix_micros(F.col("c_ts").cast("timestamp"))
                     - F.unix_micros(F.col("v_ts").cast("timestamp")))
                    .cast("bigint").alias("elapsed_us")))
    w = Window.partitionBy("week").orderBy("elapsed_us")
    ranked = conv.select(
        "week", "elapsed_us",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("week")).alias("n"))
    med = F.min(F.when(F.col("rn") == F.floor((F.col("n") + 1) / 2),
                       F.col("elapsed_us")))
    p90 = F.min(F.when(F.col("rn") == F.floor((9 * F.col("n") + 9) / 10),
                       F.col("elapsed_us")))
    return (ranked.groupBy("week")
            .agg(F.max("n").cast("bigint").alias("n_converted"),
                 F.floor(med / 1000000).cast("bigint").alias("median_s"),
                 F.floor(p90 / 1000000).cast("bigint").alias("p90_s")))


# ---------------------------------------------------------------------------
# population-stability-index distribution drift (round 6)
# ---------------------------------------------------------------------------

_PSI_ORACLE = """
WITH base AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
         dayofmonth(ts) <= 15 AS first_half
  FROM events WHERE event_type = 'purchase'
), bucketed AS (
  SELECT LEAST(9, cents // 5000) AS bucket,
         CAST(COUNT(*) FILTER (WHERE first_half) AS BIGINT) AS n_first,
         CAST(COUNT(*) FILTER (WHERE NOT first_half) AS BIGINT) AS n_second
  FROM base GROUP BY LEAST(9, cents // 5000)
), shared AS (
  SELECT bucket, n_first, n_second,
         CAST(SUM(n_first) OVER () AS BIGINT) AS tot_first,
         CAST(SUM(n_second) OVER () AS BIGINT) AS tot_second,
         CAST(COUNT(*) OVER () AS BIGINT) AS n_buckets
  FROM bucketed
), contrib AS (
  SELECT bucket, n_first, n_second,
         -- Laplace +1 on counts (documented): PSI's ln blows up on an
         -- empty bucket; the +1 floor is the standard production guard
         (CAST(n_first + 1 AS DOUBLE)
            / CAST(tot_first + n_buckets AS DOUBLE)
          - CAST(n_second + 1 AS DOUBLE)
            / CAST(tot_second + n_buckets AS DOUBLE))
         * ln((CAST(n_first + 1 AS DOUBLE)
               / CAST(tot_first + n_buckets AS DOUBLE))
              / (CAST(n_second + 1 AS DOUBLE)
                 / CAST(tot_second + n_buckets AS DOUBLE))) AS c
  FROM shared
), fp AS (
  SELECT bucket, n_first, n_second,
         CAST(round(c * 1000000, 0) AS BIGINT) AS psi_contrib_micros
  FROM contrib
)
SELECT bucket, n_first, n_second, psi_contrib_micros,
       CAST(SUM(psi_contrib_micros) OVER () AS BIGINT) AS psi_total_micros
FROM fp
"""


@register("dq_distribution_drift_psi", oracle=_PSI_ORACLE)
def dq_distribution_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the month's purchase-value distribution -- THE model-monitoring
    drift number (PSI < 0.1 stable, > 0.25 retrain) that tells a
    pipeline its feature distribution moved BEFORE the model's accuracy
    does. Ten fixed-width cent buckets (fixed boundaries, not learned
    quantiles, so the bucketing itself cannot drift), Laplace +1 count
    floors (PSI's ln is undefined on empty buckets -- the standard
    production guard, spelled identically in both engines), and each
    bucket's (p-q)*ln(p/q) contribution converted ONCE to exact
    integer MICRO-units (round(c*1e6) as BIGINT, the fixed-point
    recipe) -- so the per-bucket rows AND the total are plain integer
    arithmetic, order-free and hash-exact; ln is the one 6-dp-class
    transcendental (regr_*/zipf precedent).

    Scale shape: one combinable conditional groupBy collapses the
    corpus to <= 10 bucket rows; windows and the total fold run over
    those 10 rows -- data-size-free after the first exchange."""
    ev = load_table(spark, "events", sf_dir) \
        .where(F.col("event_type") == "purchase")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    first = F.dayofmonth("ts") <= 15
    bucketed = (ev.select(F.least(F.lit(9), F.floor(cents / 5000))
                          .alias("bucket"), first.alias("fh"))
                .groupBy("bucket")
                .agg(F.count(F.when(F.col("fh"), 1)).cast("bigint")
                     .alias("n_first"),
                     F.count(F.when(~F.col("fh"), 1)).cast("bigint")
                     .alias("n_second")))
    w = Window.partitionBy()
    shared = bucketed.select(
        "bucket", "n_first", "n_second",
        F.sum("n_first").over(w).cast("bigint").alias("tot_first"),
        F.sum("n_second").over(w).cast("bigint").alias("tot_second"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_buckets"))
    p = ((F.col("n_first") + 1).cast("double")
         / (F.col("tot_first") + F.col("n_buckets")).cast("double"))
    q = ((F.col("n_second") + 1).cast("double")
         / (F.col("tot_second") + F.col("n_buckets")).cast("double"))
    c = (p - q) * F.log(p / q)
    fp = shared.select(
        "bucket", "n_first", "n_second",
        F.round(c * 1000000, 0).cast("bigint").alias("psi_contrib_micros"))
    return fp.select(
        "bucket", "n_first", "n_second", "psi_contrib_micros",
        F.sum("psi_contrib_micros").over(Window.partitionBy())
        .cast("bigint").alias("psi_total_micros"))


# ---------------------------------------------------------------------------
# top user journey paths (round 6)
# ---------------------------------------------------------------------------

_PATH_TOPK_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
), paths AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
         bool_or(event_type = 'purchase') AS converted
  FROM ranked WHERE rn <= 8
  GROUP BY user_id
), agg AS (
  SELECT path,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(COUNT(*) FILTER (WHERE converted) AS BIGINT) AS n_converted
  FROM paths GROUP BY path
)
SELECT path, n_users, n_converted,
       CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE) AS conv_share
FROM agg
ORDER BY n_users DESC, path
LIMIT 20
"""


@register("seq_path_topk", oracle=_PATH_TOPK_ORACLE)
def seq_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 user journey paths: each user's first eight events as an
    ordered 'view>click>...' string, ranked by how many users walk that
    exact path, with the conversion share riding along -- the flow
    diagram product analytics reads before funnel design
    (seq_markov_transitions gives the one-step probabilities; this
    gives the WHOLE-WALK frequencies those steps compose into). Path
    assembly orders by (ts, event_id) -- a total order, so the string
    is deterministic; counts are exact; the share is one int/int
    division; top-20 ranks on (n_users desc, path) -- a total order
    again.

    Scale shape: one user-keyed window + groupBy builds paths (prefix
    length caps the string at 8 tokens); the path groupBy is combinable
    (paths are low-cardinality relative to users -- 5^8 max, far fewer
    in practice); top-20 is TakeOrderedAndProject, never a global
    sort."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select("user_id", "event_type", "ts", "event_id",
                       F.row_number().over(w).alias("rn")) \
        .where(F.col("rn") <= 8)
    paths = (ranked.groupBy("user_id")
             .agg(F.array_join(F.transform(
                 F.array_sort(F.collect_list(F.struct(
                     "ts", "event_id", "event_type"))),
                 lambda s: s["event_type"]), ">").alias("path"),
                 F.max(F.col("event_type") == "purchase")
                 .alias("converted")))
    agg = (paths.groupBy("path")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"),
                F.count(F.when(F.col("converted"), 1)).cast("bigint")
                .alias("n_converted")))
    return (agg.select(
        "path", "n_users", "n_converted",
        (F.col("n_converted").cast("double")
         / F.col("n_users").cast("double")).alias("conv_share"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(20))


# ---------------------------------------------------------------------------
# seasonal strength via the hour-of-day ANOVA identity (round 6)
# ---------------------------------------------------------------------------

_SEAS_STRENGTH_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), framed AS (
  SELECT event_type, hr, cents,
         SUM(cents) OVER w AS fsum, COUNT(*) OVER w AS fn
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)
), det AS (
  -- detrended x24 stays BIGINT: 24*y - sum24 (centered-MA removal
  -- scaled by the frame length; variance ratios are scale-invariant)
  SELECT event_type, hour(hr) AS hod,
         CAST(24 * cents - fsum AS BIGINT) AS d24
  FROM framed WHERE fn = 24
), hod_sums AS (
  SELECT event_type, hod, CAST(COUNT(*) AS BIGINT) AS n_h,
         CAST(SUM(d24) AS BIGINT) AS s1_h
  FROM det GROUP BY event_type, hod
), totals AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(d24) AS BIGINT) AS s1,
         CAST(SUM(d24 * d24) AS BIGINT) AS s2
  FROM det GROUP BY event_type
), folds AS (
  SELECT event_type,
         list_sum(list(CAST(s1_h AS DOUBLE) * CAST(s1_h AS DOUBLE)
                       / CAST(n_h AS DOUBLE) ORDER BY hod)) AS ssb_term
  FROM hod_sums GROUP BY event_type
)
SELECT g.event_type, g.n AS n_points,
       1.0 - (CAST(g.s2 AS DOUBLE) - f.ssb_term)
             / (CAST(g.s2 AS DOUBLE)
                - CAST(g.s1 AS DOUBLE) * CAST(g.s1 AS DOUBLE)
                  / CAST(g.n AS DOUBLE)) AS seasonal_strength
FROM totals g JOIN folds f ON g.event_type = f.event_type
"""


@register("ts_seasonal_strength", oracle=_SEAS_STRENGTH_ORACLE)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strength of daily seasonality per event type: detrend the hourly
    series with a centered 24-hour moving average, then measure how much
    of the remaining variance the HOUR-OF-DAY explains -- via the ANOVA
    identity strength = 1 - SSW/SST over hour-of-day groups, i.e. the
    R-squared of 'hour explains the detrended series' (the
    Hyndman-style seasonal-strength statistic a forecasting deploy
    checks before trusting ts_forecast_eval_wape's seasonal-naive
    baseline). The detrended value stays an exact BIGINT by scaling:
    24*y - sum24 (variance ratios are scale-invariant); SST and SSW
    assemble from integer moments with the one cross-group float term
    folded in FIXED hour order (the stat_anova_oneway_f rule).

    Scale shape: calendar-bounded hourly pre-agg -> one frame window ->
    two combinable groupBys (24 hod rows, 1 global row per type) -> a
    24-element ordered fold. Data-size-free past the first exchange."""
    ev = load_table(spark, "events", sf_dir)
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(iround(F.col("value") * 100))
                   .cast("bigint").alias("cents")))
    w = (Window.partitionBy("event_type").orderBy("hr")
         .rowsBetween(-12, 11))
    framed = hourly.select(
        "event_type", "hr", "cents",
        F.sum("cents").over(w).alias("fsum"),
        F.count(F.lit(1)).over(w).alias("fn"))
    det = (framed.where(F.col("fn") == 24)
           .select("event_type", F.hour("hr").alias("hod"),
                   (24 * F.col("cents") - F.col("fsum")).cast("bigint")
                   .alias("d24")))
    hod_sums = det.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum("d24").cast("bigint").alias("s1_h"))
    glob = det.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d24").cast("bigint").alias("s1"),
        F.sum(F.col("d24") * F.col("d24")).cast("bigint").alias("s2"))
    term = (F.col("s1_h").cast("double") * F.col("s1_h").cast("double")
            / F.col("n_h").cast("double"))
    folds = hod_sums.groupBy("event_type").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("hod"),
                                                 term.alias("t")))),
            F.lit(0.0),
            lambda acc, x: acc + x["t"]).alias("ssb_term"))
    sst = (F.col("s2").cast("double")
           - F.col("s1").cast("double") * F.col("s1").cast("double")
           / F.col("n").cast("double"))
    ssw = F.col("s2").cast("double") - F.col("ssb_term")
    return (glob.join(folds, "event_type")
            .select("event_type", F.col("n").alias("n_points"),
                    (F.lit(1.0) - ssw / sst).alias("seasonal_strength")))


# ---------------------------------------------------------------------------
# bitemporal as-of revision report (round 6)
# ---------------------------------------------------------------------------

_BITEMP_ASOF = "2024-01-20 00:00:00"

_BITEMP_ORACLE = f"""
WITH base AS (
  SELECT event_id, ts, CAST(round(value * 100, 0) AS BIGINT) AS cents,
         ts AS knowledge_ts, 0 AS version
  FROM events WHERE event_type = 'purchase'
), corrections AS (
  -- every 50th purchase gets a +$10 correction that ARRIVES two days
  -- after the fact (late-arriving upstream fix, deterministic fixture)
  SELECT event_id, ts, cents + 1000 AS cents,
         ts + INTERVAL 2 DAY AS knowledge_ts, 1 AS version
  FROM base WHERE event_id % 50 = 0
), versions AS (
  SELECT * FROM base UNION ALL SELECT * FROM corrections
), known AS (
  SELECT event_id, ts, cents, version,
         row_number() OVER (PARTITION BY event_id
                            ORDER BY version DESC) AS rn
  FROM versions WHERE knowledge_ts <= TIMESTAMP '{_BITEMP_ASOF}'
), final AS (
  SELECT event_id, ts, cents, version,
         row_number() OVER (PARTITION BY event_id
                            ORDER BY version DESC) AS rn
  FROM versions
), a AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(cents) AS BIGINT) AS rev_as_of_cents,
         CAST(COUNT(*) FILTER (WHERE version = 1) AS BIGINT)
           AS n_corrections_visible
  FROM known WHERE rn = 1 GROUP BY date_trunc('day', ts)
), f AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(cents) AS BIGINT) AS rev_final_cents,
         CAST(COUNT(*) FILTER (WHERE version = 1) AS BIGINT)
           AS n_corrections_total
  FROM final WHERE rn = 1 GROUP BY date_trunc('day', ts)
)
SELECT f.day, a.rev_as_of_cents, f.rev_final_cents,
       CAST(f.rev_final_cents - a.rev_as_of_cents AS BIGINT)
         AS revision_cents,
       a.n_corrections_visible, f.n_corrections_total
FROM f JOIN a ON f.day = a.day
"""


@register("ts_bitemporal_asof_revision", oracle=_BITEMP_ORACLE)
def ts_bitemporal_asof_revision(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """BITEMPORAL revenue: what we BELIEVED each day's purchase revenue
    was as of a knowledge cutoff, next to what it finally became after
    late-arriving corrections -- the two-timeline (valid time vs
    transaction time) query every restated-metrics postmortem needs,
    and the reason serious warehouses version facts instead of
    updating them in place. The fixture plants a +$10 correction on
    every 50th purchase arriving TWO DAYS late; the as-of view picks
    each event's latest version whose knowledge timestamp precedes the
    cutoff, the final view picks the overall latest; the report shows
    per valid-day revenue under both timelines plus the revision and
    correction visibility counts. All exact cents.

    Scale shape: version picking is an event-keyed window (latest of
    <= 2 versions -- the scd2_dimension_merge discipline); daily rollups
    are combinable; the two timelines join on the calendar-bounded day
    grain."""
    ev = load_table(spark, "events", sf_dir) \
        .where(F.col("event_type") == "purchase")
    base = ev.select(
        "event_id", "ts",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.col("ts").alias("knowledge_ts"), F.lit(0).alias("version"))
    corrections = (base.where(F.col("event_id") % 50 == 0)
                   .select("event_id", "ts",
                           (F.col("cents") + 1000).alias("cents"),
                           (F.col("knowledge_ts")
                            + F.expr("INTERVAL 2 DAY"))
                           .alias("knowledge_ts"),
                           F.lit(1).alias("version")))
    versions = base.unionByName(corrections)
    w = Window.partitionBy("event_id").orderBy(F.col("version").desc())

    def latest(df):
        return (df.select("event_id", "ts", "cents", "version",
                          F.row_number().over(w).alias("rn"))
                .where(F.col("rn") == 1))

    asof = latest(versions.where(
        F.col("knowledge_ts") <= F.lit(_BITEMP_ASOF).cast("timestamp")))
    final = latest(versions)

    def daily(df, rev_name, corr_name):
        return (df.groupBy(F.date_trunc("day", "ts").alias("day"))
                .agg(F.sum("cents").cast("bigint").alias(rev_name),
                     F.count(F.when(F.col("version") == 1, 1))
                     .cast("bigint").alias(corr_name)))

    a = daily(asof, "rev_as_of_cents", "n_corrections_visible")
    f = daily(final, "rev_final_cents", "n_corrections_total")
    return (f.join(a, "day")
            .select("day", "rev_as_of_cents", "rev_final_cents",
                    (F.col("rev_final_cents") - F.col("rev_as_of_cents"))
                    .cast("bigint").alias("revision_cents"),
                    "n_corrections_visible", "n_corrections_total"))


# ---------------------------------------------------------------------------
# first-touch / last-touch attribution (round 6)
# ---------------------------------------------------------------------------

_ATTRIB_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type, ts, event_id,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
), ft AS (
  SELECT user_id, event_type AS touch FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM ev) WHERE rn = 1
), lt AS (
  SELECT user_id, event_id,
         COALESCE(lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id),
                  'direct') AS touch,
         event_type, cents
  FROM ev
), purchases AS (
  SELECT user_id, event_id, cents FROM ev WHERE event_type = 'purchase'
), first_model AS (
  SELECT 'first_touch' AS model, ft.touch,
         CAST(SUM(p.cents) AS BIGINT) AS attributed_cents,
         CAST(COUNT(*) AS BIGINT) AS n_purchases
  FROM purchases p JOIN ft ON p.user_id = ft.user_id
  GROUP BY ft.touch
), last_model AS (
  SELECT 'last_touch' AS model, touch,
         CAST(SUM(cents) AS BIGINT) AS attributed_cents,
         CAST(COUNT(*) AS BIGINT) AS n_purchases
  FROM lt WHERE event_type = 'purchase'
  GROUP BY touch
)
SELECT * FROM first_model UNION ALL SELECT * FROM last_model
"""


@register("seq_attribution_first_last", oracle=_ATTRIB_ORACLE)
def seq_attribution_first_last(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Marketing attribution under BOTH classic single-touch models in
    one result: every purchase's revenue credited 100% to the user's
    FIRST-ever event type (first-touch: what acquired them) and,
    separately, to the event type immediately PRECEDING the purchase
    (last-touch: what converted them; 'direct' when the purchase is the
    user's first event) -- the two ends of the attribution spectrum
    whose disagreement IS the insight (a channel strong in first-touch
    but absent in last-touch acquires users someone else converts).
    Orders ride the (ts, event_id) total order; revenue is exact cents.

    Scale shape: first-touch is one user-keyed rank window; last-touch
    is a lag over the same user-keyed sort (ONE exchange serves both);
    the per-model rollups are combinable groupBys over five touch
    values."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts", "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    decorated = ev.select(
        "user_id", "event_type", "cents",
        F.row_number().over(w).alias("rn"),
        F.coalesce(F.lag("event_type").over(w), F.lit("direct"))
        .alias("prev_type"))
    ft = (decorated.where(F.col("rn") == 1)
          .select("user_id", F.col("event_type").alias("touch")))
    purchases = decorated.where(F.col("event_type") == "purchase")
    first_model = (purchases.join(ft, "user_id")
                   .groupBy("touch")
                   .agg(F.sum("cents").cast("bigint")
                        .alias("attributed_cents"),
                        F.count(F.lit(1)).cast("bigint")
                        .alias("n_purchases"))
                   .select(F.lit("first_touch").alias("model"), "touch",
                           "attributed_cents", "n_purchases"))
    last_model = (purchases
                  .groupBy(F.col("prev_type").alias("touch"))
                  .agg(F.sum("cents").cast("bigint")
                       .alias("attributed_cents"),
                       F.count(F.lit(1)).cast("bigint")
                       .alias("n_purchases"))
                  .select(F.lit("last_touch").alias("model"), "touch",
                          "attributed_cents", "n_purchases"))
    return first_model.unionByName(last_model)


# ---------------------------------------------------------------------------
# weekly growth accounting (round 6)
# ---------------------------------------------------------------------------

_GROWTH_ORACLE = """
WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week
  FROM events
), firsts AS (
  SELECT user_id, MIN(week) AS first_week FROM uw GROUP BY user_id
), act AS (
  SELECT uw.user_id, uw.week,
         f.first_week = uw.week AS is_new,
         p.user_id IS NOT NULL AS was_prev,
         n.user_id IS NULL AS gone_next
  FROM uw
  JOIN firsts f ON uw.user_id = f.user_id
  LEFT JOIN uw p ON p.user_id = uw.user_id
                AND p.week = uw.week - INTERVAL 7 DAY
  LEFT JOIN uw n ON n.user_id = uw.user_id
                AND n.week = uw.week + INTERVAL 7 DAY
), maxw AS (
  SELECT MAX(week) AS max_week FROM uw
)
SELECT week,
       CAST(COUNT(*) FILTER (WHERE is_new) AS BIGINT) AS n_new,
       CAST(COUNT(*) FILTER (WHERE was_prev) AS BIGINT) AS n_retained,
       CAST(COUNT(*) FILTER (WHERE NOT is_new AND NOT was_prev)
            AS BIGINT) AS n_resurrected,
       CAST(COUNT(*) FILTER (WHERE gone_next AND week < max_week)
            AS BIGINT) AS n_churning_out
FROM act CROSS JOIN maxw
GROUP BY week, max_week
"""


@register("seq_growth_accounting_weekly", oracle=_GROWTH_ORACLE)
def seq_growth_accounting_weekly(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Weekly growth accounting -- the MAU-accounting matrix every
    growth team maintains: per week, how many active users are NEW
    (first-ever week), RETAINED (also active the previous week),
    RESURRECTED (returning after a gap), and how many of this week's
    actives CHURN OUT (absent next week; the final week abstains --
    censored, not churned). Activity is the distinct (user, week)
    grain; the three flags come from two self-joins at week +/- 7 days
    and the first-week table -- all exact set logic, no floats anywhere.

    Scale shape: the distinct (user, week) grain is one combinable
    exchange; both adjacency probes are equi-joins on (user, week+/-7d)
    -- same-key hash joins, no windows over users; the rollup is
    calendar-bounded."""
    ev = load_table(spark, "events", sf_dir)
    uw = (ev.select("user_id", F.date_trunc("week", "ts").alias("week"))
          .distinct().localCheckpoint(eager=False))
    firsts = uw.groupBy("user_id").agg(F.min("week").alias("first_week"))
    p = uw.select(F.col("user_id").alias("pu"),
                  (F.col("week") + F.expr("INTERVAL 7 DAY")).alias("pw"))
    n = uw.select(F.col("user_id").alias("nu"),
                  (F.col("week") - F.expr("INTERVAL 7 DAY")).alias("nw"))
    maxw = uw.agg(F.max("week").alias("max_week"))
    act = (uw.join(firsts, "user_id")
           .join(p, (F.col("user_id") == F.col("pu"))
                 & (F.col("week") == F.col("pw")), "left")
           .join(n, (F.col("user_id") == F.col("nu"))
                 & (F.col("week") == F.col("nw")), "left")
           .crossJoin(F.broadcast(maxw))
           .select("week",
                   (F.col("first_week") == F.col("week")).alias("is_new"),
                   F.col("pu").isNotNull().alias("was_prev"),
                   F.col("nu").isNull().alias("gone_next"),
                   "max_week"))
    return (act.groupBy("week", "max_week")
            .agg(F.count(F.when(F.col("is_new"), 1)).cast("bigint")
                 .alias("n_new"),
                 F.count(F.when(F.col("was_prev"), 1)).cast("bigint")
                 .alias("n_retained"),
                 F.count(F.when(~F.col("is_new") & ~F.col("was_prev"), 1))
                 .cast("bigint").alias("n_resurrected"),
                 F.count(F.when(F.col("gone_next")
                                & (F.col("week") < F.col("max_week")), 1))
                 .cast("bigint").alias("n_churning_out"))
            .drop("max_week"))


# ---------------------------------------------------------------------------
# interval-union active time (round 6)
# ---------------------------------------------------------------------------

_IVU_WINDOW_US = 5 * 60 * 1_000_000  # each event opens a 5-minute window

_IVU_ORACLE = f"""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + {_IVU_WINDOW_US} AS e
  FROM events
), flagged AS (
  SELECT user_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                -9223372036854775807)
              THEN 1 ELSE 0 END AS is_new
  FROM iv
), islands AS (
  SELECT user_id, s, e,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
), merged AS (
  SELECT user_id, island, MIN(s) AS ms, MAX(e) AS me
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_active_spans,
       CAST(SUM(me - ms) // 1000000 AS BIGINT) AS active_seconds
FROM merged GROUP BY user_id
"""


@register("win_interval_union_length", oracle=_IVU_ORACLE)
def win_interval_union_length(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Interval-UNION active time per user: each event opens a 5-minute
    activity window; overlapping windows merge, and the answer is the
    union's total length plus the span count -- the active-minutes /
    uptime / billing-meter computation naive SUM(duration) double-counts
    (the win_streaks_islands gaps-and-islands trick lifted from integer
    sequences to real intervals: a window starts a new island iff its
    start exceeds the running MAX of prior ends, handling contained
    intervals that a lag-based check misses). All epoch-microsecond
    integers; seconds report by floor division.

    Scale shape: one user-keyed sort exchange serves the running-max
    flag AND the island cumsum (same-window trick); merge and rollup
    are combinable groupBys."""
    ev = load_table(spark, "events", sf_dir)
    s = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.select("user_id", s.alias("s"),
                   (s + F.lit(_IVU_WINDOW_US)).alias("e"))
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.select(
        "user_id", "s", "e",
        F.when(F.col("s") > F.coalesce(prev_max_e,
                                       F.lit(-9223372036854775807)),
               F.lit(1)).otherwise(F.lit(0)).alias("is_new"))
    islands = flagged.select(
        "user_id", "s", "e",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("island"))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me"))
    return (merged.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_active_spans"),
                 F.floor(F.sum(F.col("me") - F.col("ms")) / 1000000)
                 .cast("bigint").alias("active_seconds")))


# ---------------------------------------------------------------------------
# revenue concentration: HHI + CR-k (round 6)
# ---------------------------------------------------------------------------

_HHI_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT rev, row_number() OVER (ORDER BY rev DESC, o_custkey) AS rk
  FROM cust
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(rev) AS BIGINT) AS total_cents,
       -- HHI = sum(share^2) == sum(rev^2)/total^2: exact integers until
       -- ONE final division; the square sum rides HUGEINT/decimal(38,0)
       -- (rev^2 overflows int64 -- the wide-decimal moment discipline)
       CAST(SUM(CAST(rev AS HUGEINT) * rev) AS DOUBLE)
         / (CAST(SUM(rev) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE)) AS hhi,
       CAST(SUM(CASE WHEN rk <= 10 THEN rev ELSE 0 END) AS DOUBLE)
         / CAST(SUM(rev) AS DOUBLE) AS cr10
FROM ranked
"""


@register("agg_concentration_hhi_crk", oracle=_HHI_ORACLE)
def agg_concentration_hhi_crk(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Revenue concentration: the Herfindahl-Hirschman index and CR-10
    (top-10-customer revenue share) over per-customer spend -- the
    customer-concentration risk numbers a revenue review reads before
    trusting any average. HHI's float hazard (summing thousands of
    squared shares) disappears through the identity
    sum(share_i^2) = sum(rev_i^2)/total^2: both sums are exact BIGINTs
    off one combinable fold, and the single division happens once. CR-10
    ranks on the (rev desc, custkey) total order.

    Scale shape: customer-grain groupBy (40x smaller than orders), one
    combinable moment fold; CR-10's numerator is a TakeOrdered top-10
    head (sort-limit fuses to per-partition heaps + a 10-row merge —
    the r7 swap that retires the full global rank window entirely),
    broadcast back beside the one-row moment fold."""
    o = load_table(spark, "orders", sf_dir)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    cust = o.groupBy("o_custkey").agg(
        F.sum(cents).cast("bigint").alias("rev"))
    top10 = (cust.orderBy(F.col("rev").desc(), "o_custkey").limit(10)
             .agg(F.sum("rev").cast("bigint").alias("top_rev")))
    moments = cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("rev").cast("bigint").alias("total_cents"),
        F.sum(F.col("rev").cast("decimal(38,0)") * F.col("rev"))
        .alias("sq"))
    return (moments.crossJoin(F.broadcast(top10))
            .select("n_customers", "total_cents",
                    (F.col("sq").cast("double")
                     / (F.col("total_cents").cast("double")
                        * F.col("total_cents").cast("double")))
                    .alias("hhi"),
                    (F.col("top_rev").cast("double")
                     / F.col("total_cents").cast("double")).alias("cr10")))


# ---------------------------------------------------------------------------
# Haar wavelet detail energy by timescale (round 6)
# ---------------------------------------------------------------------------

_HAAR_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hh,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY event_type, epoch_us(ts) // 3600000000
), levels(level, half_div, block_div) AS (
  VALUES (1, 1, 2), (2, 2, 4), (3, 4, 8), (4, 8, 16)
), coeffs AS (
  SELECT h.event_type, l.level, h.hh // l.block_div AS block,
         CAST(SUM(h.cents
                  * (1 - 2 * ((h.hh // l.half_div) % 2))) AS BIGINT) AS c
  FROM hourly h CROSS JOIN levels l
  GROUP BY h.event_type, l.level, h.hh // l.block_div
)
SELECT event_type, CAST(level AS BIGINT) AS level,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       -- energy sums c^2 in HUGEINT (c^2 can pass int64 at high sf);
       -- the one int->double conversion is correctly rounded in both
       -- engines, so the DOUBLE projection is portable
       CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) AS detail_energy
FROM coeffs GROUP BY event_type, level
"""


@register("ts_haar_energy_levels", oracle=_HAAR_ORACLE)
def ts_haar_energy_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet detail energy per timescale: the hourly revenue
    series decomposed into 2/4/8/16-hour detail coefficients (each
    block's first-half-minus-second-half sum -- the unnormalized Haar
    detail), with per-(type, level) coefficient energy -- WHICH
    TIMESCALE carries the variance: burst-dominated types load level 1,
    daily-cycle types load the 8-16h levels; the multi-resolution
    screen before committing to any single-window statistic
    (ts_acf_multi_lag asks 'is it periodic', this asks 'how coarse').
    Coefficients are exact BIGINT signed sums (sign = 1 - 2*half-bit,
    pure integer arithmetic off the epoch-hour index); energy rides
    HUGEINT/decimal(38,0) and projects through ONE correctly-rounded
    int->double conversion.

    Scale shape: calendar-bounded hourly pre-agg; the x4 level fan-out
    is a broadcast spine; coefficient and energy folds are combinable
    groupBys over calendar-sized tables."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hh = F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                 / 3600000000).cast("bigint")
    hourly = (ev.select("event_type", hh.alias("hh"), cents.alias("c0"))
              .groupBy("event_type", "hh")
              .agg(F.sum("c0").cast("bigint").alias("cents")))
    levels = spark.createDataFrame(
        [(1, 1, 2), (2, 2, 4), (3, 4, 8), (4, 8, 16)],
        "level long, half_div long, block_div long")
    sign = 1 - 2 * (F.floor(F.col("hh") / F.col("half_div"))
                    .cast("bigint") % 2)
    coeffs = (hourly.crossJoin(F.broadcast(levels))
              .groupBy("event_type", "level",
                       F.floor(F.col("hh") / F.col("block_div"))
                       .cast("bigint").alias("block"))
              .agg(F.sum(F.col("cents") * sign).cast("bigint").alias("c")))
    return (coeffs.groupBy("event_type",
                           F.col("level").cast("bigint").alias("level"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
                 F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
                 .cast("double").alias("detail_energy")))


# ---------------------------------------------------------------------------
# Markov entropy rate (round 6)
# ---------------------------------------------------------------------------

_ENTROPY_RATE_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
), cells AS (
  SELECT prev, event_type AS cur, CAST(COUNT(*) AS BIGINT) AS c
  FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type
), rows_ AS (
  SELECT prev, cur, c,
         CAST(SUM(c) OVER (PARTITION BY prev) AS BIGINT) AS c_i,
         CAST(SUM(c) OVER () AS BIGINT) AS n
  FROM cells
), contrib AS (
  SELECT prev, cur,
         -(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
           * ln(CAST(c AS DOUBLE) / CAST(c_i AS DOUBLE)) AS t,
         n
  FROM rows_
)
SELECT CAST(MAX(n) AS BIGINT) AS n_transitions,
       round(list_sum(list(t ORDER BY prev, cur)), 6)
         AS entropy_rate_nats
FROM contrib
"""


@register("stat_entropy_rate_markov", oracle=_ENTROPY_RATE_ORACLE)
def stat_entropy_rate_markov(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Entropy rate of the first-order journey process:
    H(X_t | X_{t-1}) = -sum_ij p(i,j) ln p(j|i) over
    seq_markov_transitions' own cell table -- HOW PREDICTABLE the next
    user step is in one number (0 = deterministic flows, ln 5 =
    uniform), the summary that says whether the transition matrix is
    worth acting on at all. Cell and row-marginal counts are exact
    integers; each cell's contribution is the standard tree; the ONE
    cross-cell float sum folds in FIXED (prev, cur) order (the
    stat_anova_oneway_f rule) and rounds 6 dp (ln).

    Scale shape: one user-keyed lag window, a 25-cell combinable
    groupBy, windows and the ordered fold over those 25 rows."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(F.col("event_type").alias("cur"),
                    F.lag("event_type").over(w).alias("prev"))
    cells = (seq.where(F.col("prev").isNotNull())
             .groupBy("prev", "cur")
             .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    c_i = F.sum("c").over(Window.partitionBy("prev")).cast("bigint")
    n = F.sum("c").over(Window.partitionBy()).cast("bigint")
    rows_ = cells.select("prev", "cur", "c", c_i.alias("c_i"),
                         n.alias("n"))
    t = (-(F.col("c").cast("double") / F.col("n").cast("double"))
         * F.log(F.col("c").cast("double") / F.col("c_i").cast("double")))
    contrib = rows_.select("prev", "cur", t.alias("t"), "n")
    return contrib.agg(
        F.max("n").cast("bigint").alias("n_transitions"),
        F.round(F.aggregate(
            F.array_sort(F.collect_list(
                F.struct(F.col("prev"), F.col("cur"), F.col("t")))),
            F.lit(0.0), lambda acc, x: acc + x["t"]), 6)
        .alias("entropy_rate_nats"))


# ---------------------------------------------------------------------------
# log2-bucketed inter-event gap histogram (round 6)
# ---------------------------------------------------------------------------

_GAP_HIST_ORACLE = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
  FROM events
), bucketed AS (
  -- power-of-two buckets (the HDR-histogram shape): floor(log2) moves
  -- only at exact powers of two, where log2 is exact in BOTH libms
  SELECT event_type,
         CAST(floor(log2(CAST(gap_us AS DOUBLE))) AS BIGINT) AS bucket
  FROM gaps WHERE gap_us IS NOT NULL AND gap_us > 0
)
SELECT event_type, bucket,
       CAST(power(2, bucket) AS BIGINT) AS lo_us,
       CAST(power(2, bucket + 1) AS BIGINT) AS hi_us,
       CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM bucketed GROUP BY event_type, bucket
"""


@register("ts_gap_log_histogram", oracle=_GAP_HIST_ORACLE)
def ts_gap_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-style latency histogram of inter-event gaps: per event type,
    gap counts in power-of-two microsecond buckets -- the
    constant-relative-error histogram observability systems standardize
    on (fixed-width buckets either blur the fast tail or explode on the
    slow one; log2 buckets give ~1 significant digit everywhere).
    Gaps are exact epoch-microsecond differences off one per-type lag;
    floor(log2(gap)) changes value only AT exact powers of two, where
    log2 is exactly representable in both libms, so the bucketing is
    portable; bounds report as exact 2^k integers.

    Scale shape: the lag is (type, day)-subkeyed (parallel across the
    calendar) with a boundary stitch over the tiny per-day summary --
    the same gap multiset without the one-task-per-type funnel a plain
    per-type window creates (probed 15.7x at 100x before the split);
    the rollup is a combinable (type, bucket) groupBy."""
    ev = load_table(spark, "events", sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    # (type, DAY)-subkeyed lag + a boundary stitch over the per-day
    # summary: a plain per-type lag serializes each type into ONE task
    # (5 windows for the whole corpus -- probed 15.7x at 100x); the
    # same gap multiset splits into in-day gaps (150 parallel groups)
    # plus one boundary gap per consecutive data-day pair, computed
    # from the calendar-sized (type, day, first, last) table
    base = ev.select("event_type",
                     F.date_format("ts", "yyyy-MM-dd").alias("day"),
                     us.alias("us"), "ts", "event_id")
    wd = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    in_day = base.select("event_type",
                         (F.col("us") - F.lag("us").over(wd))
                         .alias("gap_us"))
    days = base.groupBy("event_type", "day").agg(
        F.min("us").alias("first_us"), F.max("us").alias("last_us"))
    wt = Window.partitionBy("event_type").orderBy("day")
    boundary = days.select(
        "event_type",
        (F.col("first_us") - F.lag("last_us").over(wt)).alias("gap_us"))
    gaps = in_day.unionByName(boundary)
    bucketed = (gaps.where(F.col("gap_us").isNotNull()
                           & (F.col("gap_us") > 0))
                .select("event_type",
                        F.floor(F.log2(F.col("gap_us").cast("double")))
                        .cast("bigint").alias("bucket")))
    return (bucketed.groupBy("event_type", "bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_gaps"))
            .select("event_type", "bucket",
                    F.pow(F.lit(2.0), F.col("bucket")).cast("bigint")
                    .alias("lo_us"),
                    F.pow(F.lit(2.0), F.col("bucket") + 1).cast("bigint")
                    .alias("hi_us"),
                    "n_gaps"))


# ---------------------------------------------------------------------------
# incremental materialized-view refresh (round 6)
# ---------------------------------------------------------------------------

_MV_ORACLE = """
SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents
FROM events
GROUP BY event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d')
"""


@register("sql_incremental_mv_refresh", oracle=_MV_ORACLE)
def sql_incremental_mv_refresh(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh: the daily (type, day)
    aggregate is 'materialized' from the first 20 days, then the last
    10 days arrive as a DELTA and refresh it by partial-aggregate MERGE
    (sum the partials, never rescan the base) -- the maintenance loop
    behind every serving-layer rollup, and the lambda architecture's
    batch+speed merge expressed as one query. The oracle recomputes
    from scratch: the driver hash PROVES merge == full recompute, which
    is exactly the invariant an incremental pipeline must hold
    (count/sum are self-mergeable; avg would need sum+count carried --
    the classic MV-maintenance trap, documented by construction here).

    Scale shape: base and delta each fold map-side to the (type, day)
    grain before the union; the merge re-aggregates calendar-bounded
    partials -- refresh cost scales with the DELTA, not the history."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    # day projects as yyyy-MM-dd (the portable projection rule)
    day = F.date_format("ts", "yyyy-MM-dd")

    def rollup(df):
        return (df.groupBy("event_type", day.alias("day"))
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                     F.sum(cents).cast("bigint").alias("cents")))

    base = rollup(ev.where(day <= F.lit("2024-01-20")))
    delta = rollup(ev.where(day > F.lit("2024-01-20")))
    return (base.unionByName(delta)
            .groupBy("event_type", "day")
            .agg(F.sum("n_events").cast("bigint").alias("n_events"),
                 F.sum("cents").cast("bigint").alias("cents")))


# ---------------------------------------------------------------------------
# ER blocking quality report (round 6)
# ---------------------------------------------------------------------------

_BQ_W = 3
_BQ_DIFF = 100

_ER_QUALITY_ORACLE = f"""
WITH keyed AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer
), truth AS (
  SELECT a.c_mktsegment, a.c_custkey AS a_key, b.c_custkey AS b_key
  FROM keyed a JOIN keyed b
    ON a.c_mktsegment = b.c_mktsegment AND a.c_custkey < b.c_custkey
  WHERE abs(a.cents - b.cents) <= {_BQ_DIFF}
), ranked AS (
  SELECT c_mktsegment, c_custkey, cents,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY cents, c_custkey) AS rk
  FROM keyed
), cand AS (
  SELECT a.c_mktsegment,
         LEAST(a.c_custkey, b.c_custkey) AS a_key,
         GREATEST(a.c_custkey, b.c_custkey) AS b_key,
         abs(a.cents - b.cents) <= {_BQ_DIFF} AS survives
  FROM ranked a JOIN ranked b
    ON a.c_mktsegment = b.c_mktsegment
   AND b.rk BETWEEN a.rk + 1 AND a.rk + {_BQ_W}
), seg AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
  FROM keyed GROUP BY c_mktsegment
), stats AS (
  SELECT s.c_mktsegment, s.n,
         s.n * (s.n - 1) // 2 AS n_all_pairs,
         (SELECT COUNT(*) FROM truth t
          WHERE t.c_mktsegment = s.c_mktsegment) AS n_true,
         (SELECT COUNT(*) FROM cand c
          WHERE c.c_mktsegment = s.c_mktsegment) AS n_candidates,
         (SELECT COUNT(*) FROM cand c JOIN truth t
          ON c.c_mktsegment = t.c_mktsegment
         AND c.a_key = t.a_key AND c.b_key = t.b_key
          WHERE c.c_mktsegment = s.c_mktsegment) AS n_caught
  FROM seg s
)
SELECT c_mktsegment,
       CAST(n_true AS BIGINT) AS n_true,
       CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_caught AS BIGINT) AS n_caught,
       1.0 - CAST(n_candidates AS DOUBLE) / CAST(n_all_pairs AS DOUBLE)
         AS reduction_ratio,
       CASE WHEN n_true = 0 THEN 1.0
            ELSE CAST(n_caught AS DOUBLE) / CAST(n_true AS DOUBLE) END
         AS pairs_completeness
FROM stats
"""


@register("er_blocking_quality_report", oracle=_ER_QUALITY_ORACLE)
def er_blocking_quality_report(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Blocking-quality audit for the sorted-neighborhood ER scheme:
    per segment, REDUCTION RATIO (share of the quadratic pair space the
    w=3 window never generates) against PAIRS COMPLETENESS (share of
    true <=100-cent pairs the window actually catches) -- the
    two-number tradeoff every blocking design is judged by (the
    llm_lsh_tuning_report of classical ER). Ground truth comes from a
    value-BANDED self-join (each true pair differs by <=100 cents, so
    bucketing by cents//100 and probing the 3 adjacent buckets finds
    all of them -- the join_interval_binned discipline, never the
    quadratic join the ORACLE is allowed to run at its scale);
    candidates replay the lead()-window generation. All counts exact;
    two divisions per segment.

    Scale shape: ground truth is the banded equi-join (density-bounded
    per bucket); candidates are map-side off one segment sort; the
    intersection is a pair-keyed join; everything folds to 5 segment
    rows."""
    c = load_table(spark, "customer", sf_dir)
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    keyed = c.select("c_custkey", "c_mktsegment", cents.alias("cents"))
    # ground truth via value-banded self-join
    a = keyed.select("c_mktsegment", F.col("c_custkey").alias("ak"),
                     F.col("cents").alias("ac"),
                     F.floor(F.col("cents") / _BQ_DIFF).alias("bucket"))
    boff = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    b = (keyed.select("c_mktsegment", F.col("c_custkey").alias("bk"),
                      F.col("cents").alias("bc"),
                      F.floor(F.col("cents") / _BQ_DIFF).alias("bb"))
         .select("*", boff.alias("off"))
         .select("c_mktsegment", "bk", "bc",
                 (F.col("bb") + F.col("off")).alias("bucket")))
    truth = (a.join(b, ["c_mktsegment", "bucket"])
             .where((F.col("ak") < F.col("bk"))
                    & (F.abs(F.col("ac") - F.col("bc")) <= _BQ_DIFF))
             .select("c_mktsegment", F.col("ak").alias("a_key"),
                     F.col("bk").alias("b_key"))
             .distinct())
    # candidates replay the lead()-window generation
    w = Window.partitionBy("c_mktsegment").orderBy("cents", "c_custkey")
    leads = keyed.select(
        "c_mktsegment", "c_custkey", "cents",
        F.array(*[F.struct(F.lead("c_custkey", k).over(w).alias("bk"))
                  for k in range(1, _BQ_W + 1)]).alias("nbrs"))
    cand = (leads.select("c_mktsegment",
                         F.col("c_custkey").alias("a0"),
                         F.explode("nbrs").alias("nb"))
            .where(F.col("nb.bk").isNotNull())
            .select("c_mktsegment",
                    F.least("a0", F.col("nb.bk")).alias("a_key"),
                    F.greatest("a0", F.col("nb.bk")).alias("b_key")))
    seg = keyed.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    nt = truth.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true"))
    nc = cand.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
    caught = (cand.join(truth, ["c_mktsegment", "a_key", "b_key"])
              .groupBy("c_mktsegment")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_caught")))
    # Coalesce BEFORE deriving the ratios: after the left joins a segment
    # with zero true pairs carries NULL, and a `when(col == 0, ...)` guard
    # on the raw column is never true for NULL — the sf0.001 corpus (no
    # within-band duplicate pair anywhere) turned completeness NULL where
    # the vacuous-truth convention (and the oracle) says 1.0.
    nt_c = F.coalesce("n_true", F.lit(0)).cast("bigint")
    nc_c = F.coalesce("n_candidates", F.lit(0)).cast("bigint")
    ng_c = F.coalesce("n_caught", F.lit(0)).cast("bigint")
    out = (seg.join(nt, "c_mktsegment", "left")
           .join(nc, "c_mktsegment", "left")
           .join(caught, "c_mktsegment", "left")
           .select("c_mktsegment",
                   nt_c.alias("n_true"),
                   nc_c.alias("n_candidates"),
                   ng_c.alias("n_caught"),
                   (F.lit(1.0) - nc_c.cast("double")
                    / (F.col("n") * (F.col("n") - 1) / 2).cast("double"))
                   .alias("reduction_ratio"),
                   F.when(nt_c == 0, F.lit(1.0))
                   .otherwise(ng_c.cast("double") / nt_c.cast("double"))
                   .alias("pairs_completeness")))
    return out


# ---------------------------------------------------------------------------
# hierarchical ratio-to-parent rollup (round 6)
# ---------------------------------------------------------------------------

_HIER_ORACLE = """
WITH nat AS (
  SELECT n.n_regionkey, c.c_nationkey,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_regionkey, c.c_nationkey
)
SELECT r.r_name AS region, nn.n_name AS nation, nat.rev AS rev_cents,
       CAST(nat.rev AS DOUBLE)
         / CAST(SUM(nat.rev) OVER (PARTITION BY nat.n_regionkey)
                AS DOUBLE) AS share_of_region,
       CAST(SUM(nat.rev) OVER (PARTITION BY nat.n_regionkey) AS DOUBLE)
         / CAST(SUM(nat.rev) OVER () AS DOUBLE) AS region_share_of_total
FROM nat
JOIN nation nn ON nat.c_nationkey = nn.n_nationkey
JOIN region r ON nat.n_regionkey = r.r_regionkey
"""


@register("agg_hierarchy_share_rollup", oracle=_HIER_ORACLE)
def agg_hierarchy_share_rollup(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Hierarchical ratio-to-parent: every nation's revenue as a share
    of ITS REGION, and every region's share of the grand total, in one
    table -- the drill-down tree a BI layer renders as nested bars
    (win_pct_of_total does one level; this composes the two-level
    geography). Revenue folds to the 25-nation grain first; both share
    levels are windows over that tiny table; exact cents until the two
    divisions.

    Scale shape: one combinable fact fold to 25 rows (dims broadcast);
    windows and dimension joins run entirely on the 25-row table."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir) \
        .select("c_custkey", "c_nationkey")
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    nat = (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
           .join(F.broadcast(n),
                 F.col("c_nationkey") == F.col("n_nationkey"))
           .groupBy("n_regionkey", "c_nationkey")
           .agg(F.sum(cents).cast("bigint").alias("rev")))
    wr = Window.partitionBy("n_regionkey")
    wall = Window.partitionBy()
    shares = nat.select(
        "n_regionkey", "c_nationkey", "rev",
        (F.col("rev").cast("double")
         / F.sum("rev").over(wr).cast("double")).alias("share_of_region"),
        (F.sum("rev").over(wr).cast("double")
         / F.sum("rev").over(wall).cast("double"))
        .alias("region_share_of_total"))
    return (shares
            .join(F.broadcast(n.select("n_nationkey", "n_name")),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(r),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .select(F.col("r_name").alias("region"),
                    F.col("n_name").alias("nation"),
                    F.col("rev").alias("rev_cents"),
                    "share_of_region", "region_share_of_total"))


# ---------------------------------------------------------------------------
# strict-order window funnel (round 6)
# ---------------------------------------------------------------------------

_WFUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT v.user_id, MIN(e.ts) AS t2
  FROM v JOIN events e
    ON e.user_id = v.user_id AND e.event_type = 'click'
   AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 1 DAY
  GROUP BY v.user_id
), p AS (
  SELECT c.user_id, MIN(e.ts) AS t3
  FROM c JOIN v ON c.user_id = v.user_id
  JOIN events e
    ON e.user_id = c.user_id AND e.event_type = 'purchase'
   AND e.ts > c.t2 AND e.ts <= v.t1 + INTERVAL 1 DAY
  GROUP BY c.user_id
), depth AS (
  SELECT v.user_id,
         1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
           + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS d
  FROM v LEFT JOIN c ON v.user_id = c.user_id
  LEFT JOIN p ON v.user_id = p.user_id
)
SELECT CAST(d AS BIGINT) AS funnel_depth,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM depth GROUP BY d
"""


@register("seq_window_funnel_strict", oracle=_WFUNNEL_ORACLE)
def seq_window_funnel_strict(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """STRICT-ORDER window funnel (the ClickHouse windowFunnel
    semantics): view, then a click STRICTLY AFTER the first view, then
    a purchase STRICTLY AFTER that click -- all inside a 1-day horizon
    anchored at the first view; users counted at their deepest step.
    Differs from funnel_view_click_purchase's set-membership funnel
    exactly where product analysis needs it: a purchase BEFORE the
    click does not count as conversion THROUGH the funnel. Each step is
    a conditional MIN anchored on the previous step's timestamp --
    sequential semantics, but each stage is one user-keyed equi-join +
    groupBy, never a per-user sort.

    Scale shape: three user-keyed joins/folds (same-key hash
    partitioning reuses the exchange); depth rollup folds to <= 3
    rows."""
    ev = load_table(spark, "events", sf_dir)
    v = (ev.where(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t1")))
    horizon = F.col("t1") + F.expr("INTERVAL 1 DAY")
    clicks = ev.where(F.col("event_type") == "click") \
        .select(F.col("user_id").alias("cu"), F.col("ts").alias("cts"))
    c = (v.join(clicks, (F.col("user_id") == F.col("cu"))
                & (F.col("cts") > F.col("t1"))
                & (F.col("cts") <= horizon))
         .groupBy("user_id").agg(F.min("cts").alias("t2")))
    purchases = ev.where(F.col("event_type") == "purchase") \
        .select(F.col("user_id").alias("pu"), F.col("ts").alias("pts"))
    p = (c.join(v.select(F.col("user_id").alias("vu"), "t1"),
                F.col("user_id") == F.col("vu"))
         .join(purchases, (F.col("user_id") == F.col("pu"))
               & (F.col("pts") > F.col("t2"))
               & (F.col("pts") <= F.col("t1") + F.expr("INTERVAL 1 DAY")))
         .groupBy("user_id").agg(F.min("pts").alias("t3")))
    depth = (v.select("user_id")
             .join(c.select(F.col("user_id").alias("c2")).distinct(),
                   F.col("user_id") == F.col("c2"), "left")
             .join(p.select(F.col("user_id").alias("p2")).distinct(),
                   F.col("user_id") == F.col("p2"), "left")
             .select((F.lit(1)
                      + F.when(F.col("c2").isNull(), 0).otherwise(1)
                      + F.when(F.col("p2").isNull(), 0).otherwise(1))
                     .cast("bigint").alias("funnel_depth")))
    return (depth.groupBy("funnel_depth")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users")))


# ---------------------------------------------------------------------------
# RFM customer segmentation (round 6)
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         CAST(epoch_us(MAX(ts)) AS BIGINT) AS last_us,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS monetary
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), scored AS (
  SELECT user_id, monetary,
         ntile(4) OVER (ORDER BY last_us, user_id) AS r_q,
         ntile(4) OVER (ORDER BY freq, user_id) AS f_q,
         ntile(4) OVER (ORDER BY monetary, user_id) AS m_q
  FROM per_user
)
SELECT r_q || '' || f_q || '' || m_q AS rfm_segment,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(monetary) AS BIGINT) AS revenue_cents
FROM scored GROUP BY r_q || '' || f_q || '' || m_q
"""


@register("seq_rfm_segments", oracle=_RFM_ORACLE)
def seq_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation -- the marketing-ops classic: every purchasing
    user scored into recency/frequency/monetary quartiles (NTILE over
    total orders: metric then user_id, so ties are deterministic) and
    rolled up per 3-digit segment code with user counts and revenue --
    '444' is the champions cell, '111' the lost cell, and the table is
    the campaign-targeting input seq_user-level analytics feed. All
    inputs are exact integers (epoch-microsecond recency, counts,
    cents).

    Scale shape: one combinable user-grain fold; the three quartile
    assignments are three chained two-pass bucketed ranks
    (bucketed.py + the exact NTILE formula — no single-partition
    window over the purchaser table at any user count, the r7
    entity-grain sweep); a <=64-cell rollup."""
    ev = load_table(spark, "events", sf_dir) \
        .where(F.col("event_type") == "purchase")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    per_user = ev.groupBy("user_id").agg(
        F.unix_micros(F.max("ts").cast("timestamp")).cast("bigint")
        .alias("last_us"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum(cents).cast("bigint").alias("monetary"))
    # localCheckpoint between the three chained rank layers: each
    # bucketed_order reads its input in up to four plan branches
    # (min/max, rows, bucket stats, output join); without the pin the
    # chain recompounds the whole upstream per layer (measured 6.5 s →
    # 1.9 s at sf0.1 after pinning; each pin is one linear user-grain
    # materialization, the llm_pipeline staging discipline)
    s1 = bucketed_order(per_user.localCheckpoint(eager=False),
                        "last_us", ["user_id"], ntile={"r_q": 4}) \
        .localCheckpoint(eager=False)
    s2 = bucketed_order(s1, "freq", ["user_id"], ntile={"f_q": 4}) \
        .localCheckpoint(eager=False)
    scored = bucketed_order(s2, "monetary", ["user_id"],
                            ntile={"m_q": 4})
    return (scored.groupBy(F.concat_ws("", F.col("r_q"), F.col("f_q"),
                                       F.col("m_q")).alias("rfm_segment"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"),
                 F.sum("monetary").cast("bigint").alias("revenue_cents")))


# ---------------------------------------------------------------------------
# daily bounce rate over 30-minute sessions (round 6)
# ---------------------------------------------------------------------------

_BOUNCE_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts,
                                 event_id) IS NULL
              OR ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts,
                                    event_id) + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
), numbered AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
), sessions AS (
  SELECT user_id, session_no,
         strftime(CAST(MIN(ts) AS DATE), '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM numbered GROUP BY user_id, session_no
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) FILTER (WHERE n_events = 1) AS BIGINT) AS n_bounces,
       CAST(COUNT(*) FILTER (WHERE n_events = 1) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS bounce_rate
FROM sessions GROUP BY day
"""


@register("seq_bounce_rate_daily", oracle=_BOUNCE_ORACLE)
def seq_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate over 30-minute-gap sessions: the share of
    sessions (attributed to their START day, the analytics convention)
    that contain exactly ONE event -- the engagement-health headline on
    every web dashboard, here composed from the same gaps-and-islands
    sessionization the stream_session_window twin pins (lag + cumsum
    over a (ts, event_id) total order). Counts exact; one division per
    day; the day projects yyyy-MM-dd (portable projection).

    Scale shape: one user-keyed sort serves the gap flag AND the island
    cumsum; sessions and the daily rollup are combinable groupBys."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    marked = ev.select(
        "user_id", "ts", "event_id",
        F.when(prev.isNull()
               | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTE")),
               F.lit(1)).otherwise(F.lit(0)).alias("is_new"))
    numbered = marked.select(
        "user_id", "ts",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_no"))
    sessions = (numbered.groupBy("user_id", "session_no")
                .agg(F.date_format(F.min("ts"), "yyyy-MM-dd").alias("day"),
                     F.count(F.lit(1)).cast("bigint").alias("n_events")))
    return (sessions.groupBy("day")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
                 F.count(F.when(F.col("n_events") == 1, 1)).cast("bigint")
                 .alias("n_bounces"),
                 (F.count(F.when(F.col("n_events") == 1, 1)).cast("double")
                  / F.count(F.lit(1)).cast("double")).alias("bounce_rate")))


# ---------------------------------------------------------------------------
# Pareto cutoff point (round 6)
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT rev,
         row_number() OVER (ORDER BY rev DESC, o_custkey) AS rk,
         CAST(SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_rev,
         CAST(SUM(rev) OVER () AS BIGINT) AS total,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM cust
)
SELECT CAST(MIN(rk) AS BIGINT) AS k_customers,
       MAX(n) AS n_customers,
       CAST(MIN(rk) AS DOUBLE) / CAST(MAX(n) AS DOUBLE)
         AS customer_share,
       -- integer-safe 80% test: 5*cum >= 4*total
       0.8 AS revenue_share_target
FROM ranked WHERE 5 * cum_rev >= 4 * total
"""


@register("agg_pareto_cutoff", oracle=_PARETO_ORACLE)
def agg_pareto_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pareto cutoff: the smallest k such that the top-k customers
    (by revenue, custkey tie-break) cover >= 80% of total revenue --
    the is-it-really-80/20 check behind agg_concentration_hhi_crk's
    summary indices, reported as k and its share of the customer base.
    The 80% test is INTEGER-safe (5*cum >= 4*total -- no float
    threshold anywhere); the pick is a conditional MIN over ranks.

    Scale shape: customer-grain fold, then the two-pass bucketed
    rank+cumsum (bucketed.py — revenue buckets, broadcast prefix
    offsets; no single-partition window even at fact-scale customer
    counts, the r7 entity-grain sweep); totals broadcast back as one
    row; one fold to a single row."""
    o = load_table(spark, "orders", sf_dir)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    cust = o.groupBy("o_custkey").agg(
        F.sum(cents).cast("bigint").alias("rev"))
    tot = cust.agg(F.sum("rev").cast("bigint").alias("total"),
                   F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked = (bucketed_order(cust, "rev", ["o_custkey"], descending=True,
                             rank_col="rk", cumsum={"cum_rev": "rev"})
              .crossJoin(F.broadcast(tot))
              .select("rk", "cum_rev", "total", "n"))
    return (ranked.where(5 * F.col("cum_rev") >= 4 * F.col("total"))
            .agg(F.min("rk").cast("bigint").alias("k_customers"),
                 F.max("n").alias("n_customers"),
                 (F.min("rk").cast("double") / F.max("n").cast("double"))
                 .alias("customer_share"),
                 F.lit(0.8).alias("revenue_share_target")))


# ---------------------------------------------------------------------------
# new-vs-returning revenue split (round 6)
# ---------------------------------------------------------------------------

_NVR_ORACLE = """
WITH firsts AS (
  SELECT user_id, strftime(CAST(MIN(ts) AS DATE), '%Y-%m-%d') AS first_day
  FROM events GROUP BY user_id
), daily AS (
  SELECT strftime(CAST(e.ts AS DATE), '%Y-%m-%d') AS day,
         f.first_day = strftime(CAST(e.ts AS DATE), '%Y-%m-%d') AS is_new,
         CAST(round(e.value * 100, 0) AS BIGINT) AS cents
  FROM events e JOIN firsts f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
)
SELECT day,
       CAST(SUM(CASE WHEN is_new THEN cents ELSE 0 END) AS BIGINT)
         AS new_user_cents,
       CAST(SUM(CASE WHEN is_new THEN 0 ELSE cents END) AS BIGINT)
         AS returning_cents,
       CAST(COUNT(*) FILTER (WHERE is_new) AS BIGINT) AS n_new_purchases,
       CAST(COUNT(*) FILTER (WHERE NOT is_new) AS BIGINT)
         AS n_returning_purchases
FROM daily GROUP BY day
"""


@register("agg_new_vs_returning_daily", oracle=_NVR_ORACLE)
def agg_new_vs_returning_daily(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Daily purchase revenue split by NEW vs RETURNING users (new =
    purchasing on their first-ever active day) -- the growth-vs-base
    decomposition every revenue dashboard leads with, and the
    seq_growth_accounting_weekly companion at the money grain. One
    user-grain first-day fold, one user-keyed join back, exact cents;
    days project yyyy-MM-dd (portable projection).

    Scale shape: combinable first-day fold; user-keyed equi-join (both
    sides hash the same key); combinable daily rollup."""
    ev = load_table(spark, "events", sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("first_day"))
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    daily = (ev.where(F.col("event_type") == "purchase")
             .join(firsts, "user_id")
             .select(F.date_format("ts", "yyyy-MM-dd").alias("day"),
                     (F.col("first_day")
                      == F.date_format("ts", "yyyy-MM-dd"))
                     .alias("is_new"),
                     cents.alias("cents")))
    return (daily.groupBy("day")
            .agg(F.sum(F.when(F.col("is_new"), F.col("cents"))
                       .otherwise(F.lit(0))).cast("bigint")
                 .alias("new_user_cents"),
                 F.sum(F.when(F.col("is_new"), F.lit(0))
                       .otherwise(F.col("cents"))).cast("bigint")
                 .alias("returning_cents"),
                 F.count(F.when(F.col("is_new"), 1)).cast("bigint")
                 .alias("n_new_purchases"),
                 F.count(F.when(~F.col("is_new"), 1)).cast("bigint")
                 .alias("n_returning_purchases")))


# ---------------------------------------------------------------------------
# maximum drawdown of the daily net series (round 6)
# ---------------------------------------------------------------------------

_MDD_ORACLE = """
WITH daily AS (
  SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)
                  * CASE WHEN event_type = 'error' THEN -1 ELSE 1 END)
              AS BIGINT) AS net_cents
  FROM events WHERE event_type IN ('purchase', 'error')
  GROUP BY event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d')
), series AS (
  SELECT day, CAST(SUM(net_cents) AS BIGINT) AS net_cents
  FROM daily GROUP BY day
), cum AS (
  SELECT day, net_cents,
         CAST(SUM(net_cents) OVER (ORDER BY day
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS equity
  FROM series
), dd AS (
  SELECT day, equity,
         CAST(MAX(equity) OVER (ORDER BY day
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS peak
  FROM cum
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MAX(peak - equity) AS BIGINT) AS max_drawdown_cents,
       CAST(MIN(CASE WHEN peak - equity = (SELECT MAX(peak - equity)
                                           FROM dd) THEN day END)
            AS VARCHAR) AS trough_day
FROM dd
"""


@register("win_max_drawdown", oracle=_MDD_ORACLE)
def win_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative net series (purchases minus
    error-event penalties, the fixture's P&L stand-in): the largest
    peak-to-trough fall of the running total, plus its trough day --
    THE risk statistic equity curves are judged by, and a three-window
    classic (cumulative sum -> running max -> max gap) that
    mis-composes silently if any window frame is wrong. All exact
    integer cents over the calendar-bounded daily series; the trough
    day is the FIRST day attaining the max (deterministic tie-break);
    days project yyyy-MM-dd.

    Scale shape: one combinable daily fold; three windows over the
    ~30-row calendar series -- data-size-free past the first
    exchange."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("purchase", "error")))
    cents = (F.round(F.col("value") * 100, 0).cast("bigint")
             * F.when(F.col("event_type") == "error", F.lit(-1))
             .otherwise(F.lit(1)))
    series = (ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
              .agg(F.sum(cents).cast("bigint").alias("net_cents")))
    wc = (Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = series.select(
        "day", F.sum("net_cents").over(wc).cast("bigint").alias("equity"))
    dd = cum.select(
        "day", "equity",
        F.max("equity").over(wc).cast("bigint").alias("peak"))
    mdd = dd.select("day", (F.col("peak") - F.col("equity")).alias("gap"))
    top = mdd.agg(F.max("gap").cast("bigint").alias("mx"))
    return (mdd.crossJoin(F.broadcast(top))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_days"),
                 F.max("gap").cast("bigint").alias("max_drawdown_cents"),
                 F.min(F.when(F.col("gap") == F.col("mx"),
                              F.col("day"))).cast("string")
                 .alias("trough_day")))


# ---------------------------------------------------------------------------
# cohort LTV curve (round 6)
# ---------------------------------------------------------------------------

_LTV_ORACLE = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
), sizes AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users
  FROM firsts GROUP BY cohort_week
), rev AS (
  SELECT f.cohort_week,
         CAST(date_diff('day', f.cohort_week,
                        date_trunc('week', e.ts)) // 7 AS BIGINT)
           AS age_weeks,
         CAST(SUM(CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events e JOIN firsts f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY f.cohort_week, date_diff('day', f.cohort_week,
                                    date_trunc('week', e.ts)) // 7
), cum AS (
  SELECT cohort_week, age_weeks,
         CAST(SUM(cents) OVER (PARTITION BY cohort_week ORDER BY age_weeks
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_cents
  FROM rev
)
SELECT c.cohort_week, c.age_weeks, s.cohort_users, c.cum_cents,
       CAST(c.cum_cents AS DOUBLE) / CAST(s.cohort_users AS DOUBLE)
         / 100.0 AS ltv_dollars_per_user
FROM cum c JOIN sizes s ON c.cohort_week = s.cohort_week
"""


@register("agg_cohort_ltv_curve", oracle=_LTV_ORACLE)
def agg_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: cumulative purchase revenue PER USER by
    (signup-week cohort, weeks since signup) -- retention_cohorts'
    money-grain sibling and the payback-period input every acquisition
    budget is set against (which week does cumulative LTV cross CAC?).
    Cohort assignment is the user's first-ever week; age buckets are
    integer week differences; cumulative cents ride an exact window
    over the cohort-age grid; the single division normalizes per
    cohort user.

    Scale shape: user-grain first-week fold; user-keyed join back;
    (cohort, age) rollup is calendar-squared-bounded, and the cumsum
    runs over that tiny grid."""
    ev = load_table(spark, "events", sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_users"))
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    rev = (ev.where(F.col("event_type") == "purchase")
           .join(firsts, "user_id")
           .groupBy("cohort_week",
                    F.floor(F.datediff(
                        F.date_trunc("week", "ts"),
                        F.col("cohort_week")) / 7).cast("bigint")
                    .alias("age_weeks"))
           .agg(F.sum(cents).cast("bigint").alias("cents")))
    wc = (Window.partitionBy("cohort_week").orderBy("age_weeks")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = rev.select("cohort_week", "age_weeks",
                     F.sum("cents").over(wc).cast("bigint")
                     .alias("cum_cents"))
    return (cum.join(sizes, "cohort_week")
            .select("cohort_week", "age_weeks", "cohort_users",
                    "cum_cents",
                    (F.col("cum_cents").cast("double")
                     / F.col("cohort_users").cast("double")
                     / F.lit(100.0)).alias("ltv_dollars_per_user")))


# ---------------------------------------------------------------------------
# Ljung-Box white-noise test on the ACF chain (round 6)
# ---------------------------------------------------------------------------

_LJUNG_ORACLE = f"""
WITH acf_tab AS ({_ACF_ORACLE}
), nser AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT DISTINCT event_type, date_trunc('hour', ts)
        FROM events) GROUP BY event_type
), terms AS (
  SELECT a.event_type, a.lag, nser.n,
         a.acf * a.acf / (CAST(nser.n AS DOUBLE) - CAST(a.lag AS DOUBLE))
           AS t
  FROM acf_tab a JOIN nser ON a.event_type = nser.event_type
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_obs,
       CAST(COUNT(*) AS BIGINT) AS n_lags,
       round(CAST(MAX(n) AS DOUBLE) * (CAST(MAX(n) AS DOUBLE) + 2.0)
             * list_sum(list(t ORDER BY lag)), 6) AS ljung_box_q
FROM terms GROUP BY event_type
"""


@register("stat_ljung_box_q", oracle=_LJUNG_ORACLE)
def stat_ljung_box_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box Q over ts_acf_multi_lag's OWN 24-lag ACF table -- is
    the hourly series white noise, or is the autocorrelation structure
    real? Q = n(n+2) * sum_k r_k^2/(n-k): large Q rejects
    independence, the formal gate before trusting any of the
    periodicity/trend readouts the ACF suggests visually. The r_k come
    off the same bit-identical Pearson chain as the ACF operator
    (shared HUGEINT moments + identical tree); the ONE cross-lag float
    sum folds in FIXED lag order (the stat_anova_oneway_f rule) and Q
    rounds 6 dp.

    Scale shape: the ACF chain's own shapes (calendar-bounded series,
    broadcast lag spine); the Q fold runs over 24 rows per type."""
    acf = ts_acf_multi_lag(spark, sf_dir) \
        .select("event_type", "lag", "acf")
    ev = load_table(spark, "events", sf_dir)
    nser = (ev.select("event_type",
                      F.date_trunc("hour", "ts").alias("hr")).distinct()
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    terms = (acf.join(nser, "event_type")
             .select("event_type", "lag", "n",
                     (F.col("acf") * F.col("acf")
                      / (F.col("n").cast("double")
                         - F.col("lag").cast("double"))).alias("t")))
    nd = F.max("n").cast("double")
    return (terms.groupBy("event_type")
            .agg(F.max("n").cast("bigint").alias("n_obs"),
                 F.count(F.lit(1)).cast("bigint").alias("n_lags"),
                 F.round(nd * (nd + F.lit(2.0))
                         * F.aggregate(
                             F.array_sort(F.collect_list(
                                 F.struct(F.col("lag"),
                                          F.col("t").alias("v")))),
                             F.lit(0.0),
                             lambda acc, x: acc + x["v"]), 6)
                 .alias("ljung_box_q")))


# ---------------------------------------------------------------------------
# ABC inventory classification (round 6)
# ---------------------------------------------------------------------------

_ABC_ORACLE = """
WITH part_rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
              AS BIGINT) AS rev
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT rev,
         CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_rev,
         CAST(SUM(rev) OVER () AS BIGINT) AS total
  FROM part_rev
), classed AS (
  -- integer-safe class edges: A <= 80%, B <= 95% (5*cum vs 4*total;
  -- 20*cum vs 19*total)
  SELECT rev,
         CASE WHEN 5 * cum_rev <= 4 * total THEN 'A'
              WHEN 20 * cum_rev <= 19 * total THEN 'B'
              ELSE 'C' END AS abc
  FROM ranked
)
SELECT abc, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS revenue_cents,
       CAST(SUM(rev) AS DOUBLE)
         / CAST(MAX((SELECT total FROM ranked LIMIT 1)) AS DOUBLE)
         AS revenue_share
FROM classed GROUP BY abc
"""


@register("agg_abc_classification", oracle=_ABC_ORACLE)
def agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification of parts by revenue: A-class up to
    the 80% cumulative-revenue edge, B to 95%, C the tail -- the
    supply-chain attention allocator (count A-parts daily, C-parts
    yearly) and the item-grain sibling of agg_pareto_cutoff. Class
    edges are INTEGER-safe cross-multiplications (5*cum <= 4*total,
    20*cum <= 19*total) on the (revenue desc, partkey) total order; no
    float threshold anywhere, one share division per class.

    Scale shape: part-grain fold (30x smaller than lineitem), then the
    two-pass bucketed cumsum over the part table (bucketed.py — no
    single-partition window at any part count, the r7 entity-grain
    sweep), 3-row rollup."""
    li = load_table(spark, "lineitem", sf_dir)
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    part_rev = li.groupBy("l_partkey").agg(
        F.sum(cents).cast("bigint").alias("rev"))
    tot = part_rev.agg(F.sum("rev").cast("bigint").alias("total"))
    ranked = (bucketed_order(part_rev, "rev", ["l_partkey"],
                             descending=True, cumsum={"cum_rev": "rev"})
              .crossJoin(F.broadcast(tot))
              .select("rev", "cum_rev", "total"))
    abc = (F.when(5 * F.col("cum_rev") <= 4 * F.col("total"), F.lit("A"))
           .when(20 * F.col("cum_rev") <= 19 * F.col("total"), F.lit("B"))
           .otherwise(F.lit("C")))
    return (ranked.select(abc.alias("abc"), "rev", "total")
            .groupBy("abc")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"),
                 F.sum("rev").cast("bigint").alias("revenue_cents"),
                 (F.sum("rev").cast("double")
                  / F.max("total").cast("double")).alias("revenue_share")))


# ---------------------------------------------------------------------------
# year-over-year growth (round 6)
# ---------------------------------------------------------------------------

_YOY_ORACLE = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(month(o_orderdate) AS BIGINT) AS mo,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY year(o_orderdate), month(o_orderdate)
)
SELECT yr, mo, rev AS rev_cents,
       lag(rev) OVER (PARTITION BY mo ORDER BY yr) AS prev_year_cents,
       CAST(rev AS DOUBLE)
         / CAST(lag(rev) OVER (PARTITION BY mo ORDER BY yr) AS DOUBLE)
         - 1.0 AS yoy_growth
FROM monthly
"""


@register("ts_yoy_growth", oracle=_YOY_ORACLE)
def ts_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth per calendar month over the multi-year
    orders history -- the seasonality-honest growth comparison
    (ts_mom_growth's month-over-month conflates growth with seasonal
    swing; YoY compares each month to ITSELF a year earlier). The lag
    partitions BY MONTH-OF-YEAR and orders by year, so each of the 12
    partitions is a tiny independent series; first years report NULL
    (no base), exact cents until the one growth division.

    Scale shape: combinable (year, month) fold to ~84 rows; 12
    month-keyed lag partitions over that tiny table."""
    o = load_table(spark, "orders", sf_dir)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    monthly = (o.groupBy(F.year("o_orderdate").cast("bigint").alias("yr"),
                         F.month("o_orderdate").cast("bigint").alias("mo"))
               .agg(F.sum(cents).cast("bigint").alias("rev")))
    w = Window.partitionBy("mo").orderBy("yr")
    prev = F.lag("rev").over(w)
    return monthly.select(
        "yr", "mo", F.col("rev").alias("rev_cents"),
        prev.alias("prev_year_cents"),
        (F.col("rev").cast("double") / prev.cast("double") - F.lit(1.0))
        .alias("yoy_growth"))


# ---------------------------------------------------------------------------
# peer-group z-score benchmarking (round 6)
# ---------------------------------------------------------------------------

_PEER_Z_ORACLE = """
WITH c AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer
), seg AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s1,
         CAST(SUM(cents * cents) AS BIGINT) AS s2
  FROM c GROUP BY c_mktsegment
)
SELECT c.c_custkey, c.c_mktsegment,
       (CAST(c.cents AS DOUBLE)
        - CAST(seg.s1 AS DOUBLE) / CAST(seg.n AS DOUBLE))
       / sqrt((CAST(seg.s2 AS DOUBLE) / CAST(seg.n AS DOUBLE)
               - (CAST(seg.s1 AS DOUBLE) / CAST(seg.n AS DOUBLE))
                 * (CAST(seg.s1 AS DOUBLE) / CAST(seg.n AS DOUBLE)))
              * (CAST(seg.n AS DOUBLE) / (CAST(seg.n AS DOUBLE) - 1.0)))
         AS peer_z
FROM c JOIN seg ON c.c_mktsegment = seg.c_mktsegment
"""


@register("win_peer_group_zscore", oracle=_PEER_Z_ORACLE)
def win_peer_group_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peer-group z-score benchmarking: every customer's account
    balance standardized against their OWN market segment's mean and
    sample stddev -- the normalize-before-you-compare step behind every
    cross-segment league table (a raw balance means nothing until its
    peer distribution prices it). Segment moments are exact integer
    cent sums folded once; each row's z assembles through the standard
    identical tree -- the moments travel as a broadcast 5-row dim, NOT
    a per-row window (same values, one less sort).

    Scale shape: one combinable segment fold; broadcast join back;
    pure map-side z."""
    c = load_table(spark, "customer", sf_dir)
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    base = c.select("c_custkey", "c_mktsegment", cents.alias("cents"))
    seg = base.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("s2"))
    nd = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / nd
    var = (F.col("s2").cast("double") / nd - mu * mu) \
        * (nd / (nd - F.lit(1.0)))
    return (base.join(F.broadcast(seg), "c_mktsegment")
            .select("c_custkey", "c_mktsegment",
                    ((F.col("cents").cast("double") - mu) / F.sqrt(var))
                    .alias("peer_z")))


# ---------------------------------------------------------------------------
# year-to-date running total (round 6)
# ---------------------------------------------------------------------------

_YTD_ORACLE = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(month(o_orderdate) AS BIGINT) AS mo,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY year(o_orderdate), month(o_orderdate)
)
SELECT yr, mo, rev AS rev_cents,
       CAST(SUM(rev) OVER (PARTITION BY yr ORDER BY mo
                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS ytd_cents
FROM monthly
"""


@register("win_ytd_running_total", oracle=_YTD_ORACLE)
def win_ytd_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-to-date running revenue per (year, month) -- the fiscal
    dashboard staple whose window frame (partition by YEAR, order by
    month, unbounded preceding) resets exactly at the year boundary;
    pairs with ts_yoy_growth the way every finance view pairs YTD with
    YoY. Exact cents throughout.

    Scale shape: (year, month) fold to ~84 rows; year-keyed running
    windows over that tiny grid."""
    o = load_table(spark, "orders", sf_dir)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    monthly = (o.groupBy(F.year("o_orderdate").cast("bigint").alias("yr"),
                         F.month("o_orderdate").cast("bigint").alias("mo"))
               .agg(F.sum(cents).cast("bigint").alias("rev")))
    w = (Window.partitionBy("yr").orderBy("mo")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return monthly.select(
        "yr", "mo", F.col("rev").alias("rev_cents"),
        F.sum("rev").over(w).cast("bigint").alias("ytd_cents"))


# ---------------------------------------------------------------------------
# classical monthly seasonal indices (round 6)
# ---------------------------------------------------------------------------

_SEAS_IDX_ORACLE = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(month(o_orderdate) AS BIGINT) AS mo,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY year(o_orderdate), month(o_orderdate)
), agg AS (
  SELECT mo,
         CAST(COUNT(*) AS BIGINT) AS n_years,
         CAST(SUM(rev) AS BIGINT) AS mo_rev,
         CAST((SELECT SUM(rev) FROM monthly) AS BIGINT) AS tot_rev,
         CAST((SELECT COUNT(*) FROM monthly) AS BIGINT) AS n_cells
  FROM monthly GROUP BY mo
)
SELECT mo, n_years, mo_rev,
       -- index = month's avg cell / grand avg cell; >1 = high season
       (CAST(mo_rev AS DOUBLE) / CAST(n_years AS DOUBLE))
         / (CAST(tot_rev AS DOUBLE) / CAST(n_cells AS DOUBLE))
         AS seasonal_index
FROM agg
"""


@register("ts_seasonal_index_monthly", oracle=_SEAS_IDX_ORACLE)
def ts_seasonal_index_monthly(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Classical monthly seasonal indices over the multi-year orders
    history: each calendar month's average revenue relative to the
    grand monthly average (1.1 = structurally 10% above trend) -- the
    ratio-to-moving-average method's simple-mean form, and the index
    table a demand planner divides by BEFORE comparing months
    (ts_seasonal_strength asks IS there seasonality; this quantifies
    its monthly shape). Exact integer sums; two divisions in an
    identical tree.

    Scale shape: one (year, month) fold; 12-row aggregation; the grand
    totals broadcast as scalar subqueries."""
    o = load_table(spark, "orders", sf_dir)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    monthly = (o.groupBy(F.year("o_orderdate").cast("bigint").alias("yr"),
                         F.month("o_orderdate").cast("bigint").alias("mo"))
               .agg(F.sum(cents).cast("bigint").alias("rev")))
    tot = monthly.agg(F.sum("rev").cast("bigint").alias("tot_rev"),
                      F.count(F.lit(1)).cast("bigint").alias("n_cells"))
    agg = (monthly.groupBy("mo")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_years"),
                F.sum("rev").cast("bigint").alias("mo_rev"))
           .crossJoin(F.broadcast(tot)))
    return agg.select(
        "mo", "n_years", "mo_rev",
        ((F.col("mo_rev").cast("double") / F.col("n_years").cast("double"))
         / (F.col("tot_rev").cast("double")
            / F.col("n_cells").cast("double"))).alias("seasonal_index"))


# ---------------------------------------------------------------------------
# reorder cadence (round 6)
# ---------------------------------------------------------------------------

_CADENCE_ORACLE = """
WITH gaps AS (
  SELECT o_custkey,
         CAST(date_diff('day',
                        lag(o_orderdate) OVER (PARTITION BY o_custkey
                                               ORDER BY o_orderdate,
                                                        o_orderkey),
                        o_orderdate) AS BIGINT) AS gap_days
  FROM orders
), g AS (
  SELECT gap_days FROM gaps WHERE gap_days IS NOT NULL
), ranked AS (
  SELECT gap_days,
         row_number() OVER (ORDER BY gap_days) AS rn,
         COUNT(*) OVER () AS n
  FROM g
)
SELECT CAST(MAX(n) AS BIGINT) AS n_gaps,
       CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN gap_days END) AS BIGINT)
         AS median_gap_days,
       CAST(MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN gap_days END)
            AS BIGINT) AS p90_gap_days
FROM ranked
"""


@register("seq_reorder_cadence", oracle=_CADENCE_ORACLE)
def seq_reorder_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder cadence: the distribution of day gaps between a
    customer's consecutive orders -- DISCRETE median and p90 (the
    ts_outlier_iqr rank rule) over all inter-order gaps, the
    replenishment-cycle number that sets reminder timing and churn
    cutoffs (a customer 2x past the p90 gap is the churn-risk
    definition seq_user_lifecycle-style stages need). Gaps are exact
    integer day differences off one customer-keyed lag; quantiles are
    rank-picked integers.

    Scale shape: customer-keyed lag (key-parallel); the global rank is
    the two-pass bucketed rank (bucketed.py — gap-value buckets are
    monotone in the order, so ALL inter-order gap rows rank in
    parallel; the r6 'No Partition Defined' fix, pinned in
    test_plans.py); the total count broadcasts back as one row."""
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate",
                                                "o_orderkey")
    gaps = (o.select(F.datediff("o_orderdate",
                                F.lag("o_orderdate").over(w))
                     .cast("bigint").alias("gap_days"))
            .where(F.col("gap_days").isNotNull()))
    # ties in gap_days rank in arbitrary order WITHIN one value, exactly
    # as the plain window did — only the value at the target rank is
    # read, and all tied rows carry that same value
    tot = gaps.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked = (bucketed_order(gaps, "gap_days", rank_col="rn")
              .crossJoin(F.broadcast(tot)))
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_gaps"),
        F.min(F.when(F.col("rn") == F.floor((F.col("n") + 1) / 2),
                     F.col("gap_days"))).cast("bigint")
        .alias("median_gap_days"),
        F.min(F.when(F.col("rn") == F.floor((9 * F.col("n") + 9) / 10),
                     F.col("gap_days"))).cast("bigint")
        .alias("p90_gap_days"))


# ---------------------------------------------------------------------------
# repeat-purchase rate by segment (round 6)
# ---------------------------------------------------------------------------

_REPEAT_ORACLE = """
WITH per_cust AS (
  SELECT c.c_mktsegment, o.o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_custkey
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_buyers,
       CAST(COUNT(*) FILTER (WHERE n_orders >= 2) AS BIGINT)
         AS n_repeat_buyers,
       CAST(COUNT(*) FILTER (WHERE n_orders >= 2) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS repeat_rate
FROM per_cust GROUP BY c_mktsegment
"""


@register("agg_repeat_purchase_rate", oracle=_REPEAT_ORACLE)
def agg_repeat_purchase_rate(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Repeat-purchase rate per market segment: share of buyers with a
    second order -- the one-number loyalty readout every retention
    budget starts from, and the denominator discipline matters (buyers,
    not customers: never-buyers dilute the rate into meaninglessness).
    One customer-grain count fold, one segment rollup, exact integers
    and a single division.

    Scale shape: customer-keyed fold (combinable), broadcast dim join,
    5-row rollup."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir) \
        .select("c_custkey", "c_mktsegment")
    per_cust = (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
                .groupBy("c_mktsegment", "o_custkey")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders")))
    return (per_cust.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_buyers"),
                 F.count(F.when(F.col("n_orders") >= 2, 1)).cast("bigint")
                 .alias("n_repeat_buyers"),
                 (F.count(F.when(F.col("n_orders") >= 2, 1)).cast("double")
                  / F.count(F.lit(1)).cast("double"))
                 .alias("repeat_rate")))


# ---------------------------------------------------------------------------
# permutation entropy of the hourly series (round 6)
# ---------------------------------------------------------------------------

_PERM_ENT_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), lagged AS (
  SELECT event_type,
         cents AS a,
         lead(cents, 1) OVER w AS b,
         lead(cents, 2) OVER w AS c
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hr)
), patterns AS (
  -- ordinal pattern of (a,b,c): ties break toward the earlier index
  -- (the standard Bandt-Pompe convention), spelled as one CASE ladder
  SELECT event_type,
         CASE WHEN a <= b AND b <= c THEN '012'
              WHEN a <= c AND c < b  THEN '021'
              WHEN b < a  AND a <= c THEN '102'
              WHEN c < a  AND a <= b THEN '120'
              WHEN b <= c AND c < a  THEN '201'
              ELSE '210' END AS pat
  FROM lagged WHERE b IS NOT NULL AND c IS NOT NULL
), counts AS (
  SELECT event_type, pat, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM patterns GROUP BY event_type, pat
), tot AS (
  SELECT event_type, pat, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM counts
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_windows,
       CAST(COUNT(*) AS BIGINT) AS n_patterns,
       -- ordered fold over <= 6 patterns (the ANOVA rule); /ln(6)
       -- normalizes to [0,1]
       round(-list_sum(list((CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE))
                            * ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE))
                            ORDER BY pat))
             / ln(6.0), 6) AS perm_entropy_norm
FROM tot GROUP BY event_type
"""


@register("ts_permutation_entropy", oracle=_PERM_ENT_ORACLE)
def ts_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation entropy (Bandt-Pompe, order 3) of each type's hourly
    series: the Shannon entropy of ORDINAL PATTERNS of three
    consecutive points, normalized by ln 6 -- the
    complexity-vs-determinism dial (0 = monotone/deterministic motion,
    1 = pattern-uniform noise) that is robust to any monotone
    transformation of the values, unlike every moment-based statistic
    in the family. Patterns come from two leads and a six-branch CASE
    ladder on exact integers (ties break toward the earlier index, the
    standard convention, stated identically in both engines); the one
    cross-pattern float fold is FIXED-ORDER (the ANOVA rule) and rounds
    6 dp (ln).

    Scale shape: calendar-bounded series; (type, day)-style lead
    windows over ~700 rows/type; folds over <= 6 pattern rows."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents")))
    w = Window.partitionBy("event_type").orderBy("hr")
    lagged = hourly.select(
        "event_type", F.col("cents").alias("a"),
        F.lead("cents", 1).over(w).alias("b"),
        F.lead("cents", 2).over(w).alias("c"))
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    pat = (F.when((a <= b) & (b <= c), F.lit("012"))
           .when((a <= c) & (c < b), F.lit("021"))
           .when((b < a) & (a <= c), F.lit("102"))
           .when((c < a) & (a <= b), F.lit("120"))
           .when((b <= c) & (c < a), F.lit("201"))
           .otherwise(F.lit("210")))
    patterns = (lagged.where(b.isNotNull() & c.isNotNull())
                .select("event_type", pat.alias("pat")))
    counts = patterns.groupBy("event_type", "pat").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"))
    tot = counts.select(
        "event_type", "pat", "cnt",
        F.sum("cnt").over(Window.partitionBy("event_type"))
        .cast("bigint").alias("n"))
    share = F.col("cnt").cast("double") / F.col("n").cast("double")
    term = share * F.log(share)
    return (tot.select("event_type", "pat", "n", term.alias("t"))
            .groupBy("event_type")
            .agg(F.max("n").cast("bigint").alias("n_windows"),
                 F.count(F.lit(1)).cast("bigint").alias("n_patterns"),
                 F.round(-F.aggregate(
                     F.array_sort(F.collect_list(
                         F.struct(F.col("pat"), F.col("t").alias("v")))),
                     F.lit(0.0), lambda acc, x: acc + x["v"])
                     / F.log(F.lit(6.0)), 6)
                 .alias("perm_entropy_norm")))


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto frontier) operator (round 6)
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH pts AS (
  SELECT c.c_custkey,
         CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS bal_cents,
         CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey, c.c_acctbal
), per_bal AS (
  SELECT bal_cents, MAX(n_orders) AS best FROM pts GROUP BY bal_cents
), pb AS (
  -- per-balance keys are UNIQUE here, so the ROWS frame is well-defined
  SELECT bal_cents, best,
         MAX(best) OVER (ORDER BY bal_cents DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS best_above
  FROM per_bal
), champs AS (
  -- ALL customers tying the per-balance max are mutually non-dominated
  SELECT p.c_custkey, p.bal_cents, p.n_orders
  FROM pts p JOIN per_bal b
    ON p.bal_cents = b.bal_cents AND p.n_orders = b.best
)
SELECT c.c_custkey, c.bal_cents, c.n_orders
FROM champs c JOIN pb ON c.bal_cents = pb.bal_cents
WHERE pb.best_above IS NULL OR c.n_orders > pb.best_above
"""


@register("win_skyline_2d", oracle=_SKYLINE_ORACLE)
def win_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKYLINE operator (Borzsony/Kossmann/Stocker's classic), 2-D
    maximization form: customers not DOMINATED on (account balance,
    order count) -- no other customer is at least as good on both and
    strictly better on one; the multi-criteria shortlist behind
    best-tradeoff queries that no single score can express. Tie
    semantics follow the dominance definition exactly (the r6 ADVICE
    fix): customers with IDENTICAL (balance, orders) are mutually
    non-dominated, so ALL of them are kept — champions are "everyone
    tying the per-balance max", not one row_number survivor. A point
    survives iff its orders beat the best over STRICTLY higher
    balances. All exact integers; the dominance test is two
    comparisons.

    Scale shape: customer-grain fold; a per-balance max fold + equi
    join picks champions (no window at all), and the running max over
    strictly-higher balances is the two-pass bucketed prefix-max
    (bucketed.py — the distinct-balance table never collapses to one
    partition, the r7 entity-grain sweep)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir) \
        .select("o_custkey", "o_orderkey")
    bal = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    pts = (c.join(o, c.c_custkey == o.o_custkey, "left")
           .groupBy("c_custkey", bal.alias("bal_cents"))
           .agg(F.count("o_orderkey").cast("bigint").alias("n_orders")))
    per_bal = pts.groupBy("bal_cents").agg(
        F.max("n_orders").alias("best"))
    pb = bucketed_order(per_bal, "bal_cents", descending=True,
                        prefix_max={"best_above": "best"})
    champs = (pts.alias("p")
              .join(per_bal.alias("b"),
                    (F.col("p.bal_cents") == F.col("b.bal_cents"))
                    & (F.col("p.n_orders") == F.col("b.best")))
              .select("p.c_custkey",
                      F.col("p.bal_cents").alias("bal_cents"),
                      "p.n_orders"))
    sky = champs.join(pb.select("bal_cents", "best_above"), "bal_cents")
    return (sky.where(F.col("best_above").isNull()
                      | (F.col("n_orders") > F.col("best_above")))
            .select("c_custkey", "bal_cents", "n_orders"))
