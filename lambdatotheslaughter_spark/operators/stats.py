"""Statistical-inference operators (SURVEY.md §2.16).

The batch layer of a lambda pipeline is where A/B readouts, drift checks
and data-quality audits run; the representatives here are the classical
two-sample tests (Welch t, Kolmogorov–Smirnov), association measures
(mutual information next to the existing χ² cells), a fraud/staleness
screen (Benford first-digit), and an inequality rollup (Gini over
customer spend).

Determinism discipline (the agg_skew_kurt_exact precedent): every
statistic is assembled from EXACT integer power sums (cents as
BIGINT/decimal), combined in a DOUBLE expression tree spelled
IDENTICALLY in the Spark query and the DuckDB oracle — each step one
correctly-rounded IEEE op, so results are bit-identical with no
tolerance. Transcendentals (ln/log10) are the one non-portable step
(libm vs java.lang.Math are both ≤1 ulp but not correctly rounded), so
any column that passes through them rounds to 6 dp, the regr_*/zipf
precedent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lambdatotheslaughter_spark.registry import register
from lambdatotheslaughter_spark.tables import load_table

# ---------------------------------------------------------------------------
# Welch's unequal-variance t-test (click vs purchase event values)
# ---------------------------------------------------------------------------

_WELCH_ORACLE = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events WHERE event_type IN ('click', 'purchase')
), s AS (
  SELECT
    CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n1,
    CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n2,
    CAST(SUM(xc) FILTER (WHERE event_type = 'click') AS BIGINT) AS s1a,
    CAST(SUM(xc * xc) FILTER (WHERE event_type = 'click') AS BIGINT) AS s2a,
    CAST(SUM(xc) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS s1b,
    CAST(SUM(xc * xc) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS s2b
  FROM c
), t AS (
  SELECT n1, n2,
         CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
         CAST(s1a AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
         CAST(s2a AS DOUBLE) / CAST(n1 AS DOUBLE) AS e2a,
         CAST(s1b AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
         CAST(s2b AS DOUBLE) / CAST(n2 AS DOUBLE) AS e2b
  FROM s
), v AS (
  SELECT n1, n2, n1d, n2d, m1, m2,
         (e2a - m1 * m1) * (n1d / (n1d - 1.0)) AS v1,
         (e2b - m2 * m2) * (n2d / (n2d - 1.0)) AS v2
  FROM t
)
SELECT n1 AS n_click, n2 AS n_purchase,
       (m1 - m2) / 100.0 AS mean_diff_dollars,
       (m1 - m2) / sqrt(v1 / n1d + v2 / n2d) AS t_stat,
       (v1 / n1d + v2 / n2d) * (v1 / n1d + v2 / n2d)
         / ((v1 / n1d) * (v1 / n1d) / (n1d - 1.0)
            + (v2 / n2d) * (v2 / n2d) / (n2d - 1.0)) AS welch_df
FROM v
"""


@register("stat_welch_ttest", oracle=_WELCH_ORACLE)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between click and purchase event
    values — the A/B readout that does NOT assume pooled variance, so a
    heavier-tailed treatment arm cannot fake significance through the
    variance estimate. Two-sided t statistic plus the Welch–Satterthwaite
    effective df, assembled from exact integer cent sums (n, Σx, Σx² per
    arm) through an expression tree written identically in both engines:
    sample variance as (E[x²] − m²)·n/(n−1), standard error as
    √(v₁/n₁ + v₂/n₂). t and df are scale-invariant so computing in cents
    equals computing in dollars; the reported mean gap converts /100 at
    the end.

    Scale shape: ONE combinable conditional aggregate over the event
    scan (six FILTER sums) to a single row — the cheapest possible
    two-sample test at any corpus size; no shuffle carries more than the
    six partials per partition."""
    ev = load_table(spark, "events", sf_dir) \
        .where(F.col("event_type").isin("click", "purchase"))
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    is1 = F.col("event_type") == "click"
    is2 = F.col("event_type") == "purchase"
    s = ev.agg(
        F.count(F.when(is1, 1)).cast("bigint").alias("n1"),
        F.count(F.when(is2, 1)).cast("bigint").alias("n2"),
        F.sum(F.when(is1, xc)).cast("bigint").alias("s1a"),
        F.sum(F.when(is1, xc * xc)).cast("bigint").alias("s2a"),
        F.sum(F.when(is2, xc)).cast("bigint").alias("s1b"),
        F.sum(F.when(is2, xc * xc)).cast("bigint").alias("s2b"))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    m1 = F.col("s1a").cast("double") / n1d
    e2a = F.col("s2a").cast("double") / n1d
    m2 = F.col("s1b").cast("double") / n2d
    e2b = F.col("s2b").cast("double") / n2d
    v1 = (e2a - m1 * m1) * (n1d / (n1d - F.lit(1.0)))
    v2 = (e2b - m2 * m2) * (n2d / (n2d - F.lit(1.0)))
    se2 = v1 / n1d + v2 / n2d
    return s.select(
        F.col("n1").alias("n_click"),
        F.col("n2").alias("n_purchase"),
        ((m1 - m2) / F.lit(100.0)).alias("mean_diff_dollars"),
        ((m1 - m2) / F.sqrt(se2)).alias("t_stat"),
        (se2 * se2 / ((v1 / n1d) * (v1 / n1d) / (n1d - F.lit(1.0))
                      + (v2 / n2d) * (v2 / n2d) / (n2d - F.lit(1.0))))
        .alias("welch_df"))


# ---------------------------------------------------------------------------
# Kolmogorov–Smirnov two-sample distance (click vs purchase)
# ---------------------------------------------------------------------------

_KS_ORACLE = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS v
  FROM events WHERE event_type IN ('click', 'purchase')
), pts AS (
  SELECT v,
         CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS c1,
         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS c2
  FROM c GROUP BY v
), cum AS (
  SELECT
    CAST(SUM(c1) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
    CAST(SUM(c2) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2,
    CAST(SUM(c1) OVER () AS BIGINT) AS n1,
    CAST(SUM(c2) OVER () AS BIGINT) AS n2
  FROM pts
)
SELECT MAX(n1) AS n_click, MAX(n2) AS n_purchase,
       MAX(abs(cum1 * n2 - cum2 * n1)) AS d_num,
       CAST(MAX(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
         / (CAST(MAX(n1) AS DOUBLE) * CAST(MAX(n2) AS DOUBLE)) AS ks_d
FROM cum
"""


@register("stat_ks_two_sample", oracle=_KS_ORACLE)
def stat_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the click and
    purchase value distributions — the nonparametric drift detector a
    data-quality gate runs between ingestion batches. EXACT integer
    formulation: at each distinct cent value, D's numerator is
    |cum₁·n₂ − cum₂·n₁| (supremum over the merged support), so the
    entire sup runs in BIGINT and only the final D = num/(n₁·n₂)
    division touches floating point — one correctly-rounded op, no
    tolerance needed. (The cross products stay under 2⁶³ until both
    arms exceed ~3·10⁹ rows; past that the same sums lift to
    decimal(38,0)/HUGEINT unchanged.)

    Scale shape: the groupBy collapses the scan to DISTINCT cent values
    (bounded by the value domain — 17.8k points at sf0.1 — not by row
    count), so the one global cumulative window runs over a
    domain-sized, not corpus-sized, table; the documented 100 TB swap
    for a wide domain is the two-pass bucketed rank used by
    llm_shuffle_deterministic."""
    ev = load_table(spark, "events", sf_dir) \
        .where(F.col("event_type").isin("click", "purchase"))
    v = F.round(F.col("value") * 100, 0).cast("bigint")
    pts = (ev.select(v.alias("v"), "event_type")
           .groupBy("v")
           .agg(F.count(F.when(F.col("event_type") == "click", 1))
                .cast("bigint").alias("c1"),
                F.count(F.when(F.col("event_type") == "purchase", 1))
                .cast("bigint").alias("c2")))
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow)
    wall = Window.partitionBy()
    cum = pts.select(
        F.sum("c1").over(wcum).cast("bigint").alias("cum1"),
        F.sum("c2").over(wcum).cast("bigint").alias("cum2"),
        F.sum("c1").over(wall).cast("bigint").alias("n1"),
        F.sum("c2").over(wall).cast("bigint").alias("n2"))
    num = F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
    return cum.agg(
        F.max("n1").alias("n_click"),
        F.max("n2").alias("n_purchase"),
        F.max(num).alias("d_num"),
        (F.max(num).cast("double")
         / (F.max("n1").cast("double") * F.max("n2").cast("double")))
        .alias("ks_d"))


# ---------------------------------------------------------------------------
# Mutual information cells (event_type × user bucket)
# ---------------------------------------------------------------------------

_MI_ORACLE = """
WITH cells AS (
  SELECT event_type, CAST(user_id % 3 AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS obs
  FROM events GROUP BY event_type, CAST(user_id % 3 AS BIGINT)
), tot AS (
  SELECT event_type, bucket, obs,
         CAST(SUM(obs) OVER (PARTITION BY event_type) AS BIGINT) AS row_n,
         CAST(SUM(obs) OVER (PARTITION BY bucket) AS BIGINT) AS col_n,
         CAST(SUM(obs) OVER () AS BIGINT) AS grand_n
  FROM cells
)
SELECT event_type, bucket, obs, row_n, col_n,
       round((CAST(obs AS DOUBLE) / CAST(grand_n AS DOUBLE))
             * ln(CAST(obs * grand_n AS DOUBLE)
                  / CAST(row_n * col_n AS DOUBLE)), 6) AS mi_contrib
FROM tot
"""


@register("stat_mutual_information", oracle=_MI_ORACLE)
def stat_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-information contributions for the same event_type ×
    user-bucket contingency table as stat_chi_square_independence — the
    information-theoretic association measure next to the χ² one, per
    cell (p(x,y)·ln(p(x,y)/(p(x)p(y)))) rather than summed, because a
    cross-cell float sum is association-order-dependent. The log's
    argument is the exact integer ratio obs·grand/(row·col) lifted to
    double; ln itself is the one ≤1-ulp-divergent step (libm vs
    java.lang.Math), so mi_contrib rounds to 6 dp, the zipf/regr
    precedent. Marginals ship as exact BIGINTs.

    Scale shape: one combinable groupBy to the 15-cell table; marginals
    are windows OVER the cell table (data-size-free); nothing after the
    first aggregate depends on corpus size."""
    ev = load_table(spark, "events", sf_dir)
    cells = (ev.groupBy("event_type",
                        (F.col("user_id") % 3).cast("bigint").alias("bucket"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("obs")))
    tot = cells.select(
        "event_type", "bucket", "obs",
        F.sum("obs").over(Window.partitionBy("event_type"))
        .cast("bigint").alias("row_n"),
        F.sum("obs").over(Window.partitionBy("bucket"))
        .cast("bigint").alias("col_n"),
        F.sum("obs").over(Window.partitionBy()).cast("bigint")
        .alias("grand_n"))
    return tot.select(
        "event_type", "bucket", "obs", "row_n", "col_n",
        F.round((F.col("obs").cast("double")
                 / F.col("grand_n").cast("double"))
                * F.log((F.col("obs") * F.col("grand_n")).cast("double")
                        / (F.col("row_n") * F.col("col_n")).cast("double")),
                6).alias("mi_contrib"))


# ---------------------------------------------------------------------------
# Benford first-digit audit (order totals)
# ---------------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
), c AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS obs FROM d GROUP BY digit
), t AS (
  SELECT digit, obs, CAST(SUM(obs) OVER () AS BIGINT) AS total FROM c
)
SELECT digit, obs,
       round(CAST(obs AS DOUBLE) / CAST(total AS DOUBLE), 6) AS obs_share,
       round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_share,
       round(CAST(obs AS DOUBLE) / CAST(total AS DOUBLE), 6)
         - round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS excess
FROM t
"""


@register("stat_benford_first_digit", oracle=_BENFORD_ORACLE)
def stat_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    fabricated-data / unit-mixup screen a finance-grade pipeline runs on
    every new feed. The first significant digit comes from the DECIMAL
    STRING of the exact cent amount (substr of the bigint's varchar —
    no float log10 in the digit extraction, so digit assignment is
    exact); observed shares and the Benford expectation
    log10(1 + 1/d) round to 6 dp (shares are rationals; log10 is the
    ≤1-ulp transcendental), and the excess column subtracts the two
    ALREADY-ROUNDED doubles — identical inputs, identical IEEE subtract.

    Scale shape: pure map-side digit extraction, one combinable groupBy
    to ≤9 rows, share windows over the 9-row table — nothing downstream
    of the scan scales with the corpus."""
    o = load_table(spark, "orders", sf_dir)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("bigint")
    c = (o.select(digit.alias("digit"))
         .groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("obs")))
    t = c.select("digit", "obs",
                 F.sum("obs").over(Window.partitionBy()).cast("bigint")
                 .alias("total"))
    share = F.round(F.col("obs").cast("double")
                    / F.col("total").cast("double"), 6)
    benford = F.round(F.log10(F.lit(1.0)
                              + F.lit(1.0) / F.col("digit").cast("double")),
                      6)
    return t.select("digit", "obs", share.alias("obs_share"),
                    benford.alias("benford_share"),
                    (share - benford).alias("excess"))


# ---------------------------------------------------------------------------
# Gini coefficient of customer spend
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT cents,
         CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS rk
  FROM spend
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS total_cents,
         CAST(SUM(rk * cents) AS BIGINT) AS weighted
  FROM ranked
)
SELECT n AS n_customers, total_cents,
       (2.0 * CAST(weighted AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(total_cents AS DOUBLE))
         - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
FROM s
"""


@register("stat_gini_coefficient", oracle=_GINI_ORACLE)
def stat_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer spend — the single-number
    concentration readout ("do 1% of customers carry 50% of revenue?")
    next to agg_gini_impurity's classification-split variant. Uses the
    rank formulation G = 2·Σᵢ i·xᵢ/(n·Σx) − (n+1)/n over spend sorted
    ascending (ties broken by custkey, so the rank — and therefore the
    weighted sum — is deterministic: equal-spend permutations leave
    Σ i·xᵢ unchanged only in aggregate, the explicit tiebreak makes the
    per-row products identical too). All sums are exact BIGINT cents;
    only the final three-op expression tree touches doubles.

    Scale shape: one combinable groupBy to customer grain, then a global
    rank window over the CUSTOMER table (already 40× smaller than
    orders). The single-partition rank is the documented trade at test
    scale; the 100 TB swap is the two-pass range-bucketed rank
    (llm_shuffle_deterministic's recipe) which assigns bucket offsets
    from a count pre-pass."""
    o = load_table(spark, "orders", sf_dir)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    spend = (o.groupBy("o_custkey")
             .agg(F.sum(cents).cast("bigint").alias("cents")))
    ranked = spend.select(
        "cents",
        F.row_number().over(Window.orderBy("cents", "o_custkey"))
        .cast("bigint").alias("rk"))
    s = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(F.col("rk") * F.col("cents")).cast("bigint").alias("weighted"))
    nd = F.col("n").cast("double")
    return s.select(
        F.col("n").alias("n_customers"),
        "total_cents",
        ((F.lit(2.0) * F.col("weighted").cast("double"))
         / (nd * F.col("total_cents").cast("double"))
         - (nd + F.lit(1.0)) / nd).alias("gini"))
