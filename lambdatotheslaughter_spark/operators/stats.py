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

from lambdatotheslaughter_spark.bucketed import bucketed_order
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

    Scale shape: one combinable groupBy to customer grain, then the
    two-pass bucketed rank over the customer table (bucketed.py —
    spend-cents buckets, broadcast prefix offsets; zero
    single-partition windows even if customer counts reach fact
    scale, the r7 entity-grain sweep)."""
    o = load_table(spark, "orders", sf_dir)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    spend = (o.groupBy("o_custkey")
             .agg(F.sum(cents).cast("bigint").alias("cents")))
    ranked = bucketed_order(spend, "cents", ["o_custkey"],
                            rank_col="rk").select("cents", "rk")
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


# ---------------------------------------------------------------------------
# deterministic Poisson bootstrap CI (round 6)
# ---------------------------------------------------------------------------

# Poisson(1) CDF thresholds in 2^-32 units: weight k iff
# t_{k-1} <= u32 < t_k (u32 uniform on [0, 2^32) from md5 bits). Pure
# integer comparisons — the float CDF appears only in these frozen
# literals, never at query time.
_POIS_T = (1580030168, 3160060337, 3950075421,
           4213413783, 4279248373, 4292415291)
_BOOT_B = 64
_BOOT_LO_RANK = 2    # ceil(0.025 * 64)
_BOOT_HI_RANK = 63   # ceil(0.975 * 64)


def _boot_weight_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_T))
    return f"CASE {branches} ELSE {len(_POIS_T)} END"


_BOOT_ORACLE = f"""
WITH base AS (
  SELECT event_id, CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), grp AS (
  SELECT CAST(unnest(range({_BOOT_B // 4})) AS BIGINT) AS g
), digests AS (
  -- one md5 per (row, group); each digest yields FOUR u32 draws
  SELECT base.cents, grp.g,
         md5(concat(CAST(base.event_id AS VARCHAR), ':',
                    CAST(grp.g AS VARCHAR))) AS m
  FROM base CROSS JOIN grp
), js AS (
  SELECT CAST(unnest([0, 1, 2, 3]) AS BIGINT) AS j
), weighted AS (
  SELECT digests.g * 4 + js.j AS b, digests.cents,
         {_boot_weight_sql("CAST(concat('0x', substring(digests.m, "
                           "CAST(1 + 8 * js.j AS INTEGER), 8)) AS BIGINT)")}
           AS w
  FROM digests CROSS JOIN js
), means AS (
  SELECT b,
         CAST(CAST(SUM(w * cents) AS BIGINT) AS DOUBLE)
           / CAST(CAST(SUM(w) AS BIGINT) AS DOUBLE) AS m
  FROM weighted GROUP BY b
), ranked AS (
  SELECT m, row_number() OVER (ORDER BY m, b) AS rk FROM means
), ci AS (
  SELECT MIN(CASE WHEN rk = {_BOOT_LO_RANK} THEN m END) AS lo,
         MIN(CASE WHEN rk = {_BOOT_HI_RANK} THEN m END) AS hi,
         CAST(COUNT(*) AS BIGINT) AS n_reps
  FROM ranked
), pt AS (
  SELECT CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS m0
  FROM base
)
SELECT n_reps,
       m0 / 100.0 AS est_mean_dollars,
       lo / 100.0 AS ci_lo_dollars,
       hi / 100.0 AS ci_hi_dollars
FROM ci CROSS JOIN pt
"""


@register("stat_bootstrap_poisson_ci", oracle=_BOOT_ORACLE)
def stat_bootstrap_poisson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% CI for the mean purchase value — the
    distributed bootstrap (each row draws an independent Poisson(1)
    resample weight per replicate, so no replicate ever needs a
    row-count barrier or a shared sample index: the streaming-friendly
    formulation MapReduce bootstrap papers standardized). Replicate
    randomness is DETERMINISTIC: u32 from md5(event_id:replicate) bits,
    weight from frozen INTEGER CDF thresholds (the float Poisson CDF
    exists only in the six pasted literals) — both engines draw
    bit-identical weights, so every replicate mean is one int/int
    division and the rank-picked 2.5%/97.5% bounds hash-match exactly.

    Scale shape: the ×64 replicate fan-out is map-side (broadcast of a
    64-row spine); each replicate folds to two BIGINT partials in ONE
    combinable groupBy — 100 TB cost is 64 weighted sums, not 64 corpus
    copies; the rank window runs over 64 rows."""
    ev = load_table(spark, "events", sf_dir) \
        .where(F.col("event_type") == "purchase")
    base = ev.select(
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"))
    # one md5 per (row, replicate GROUP); each 128-bit digest yields
    # FOUR independent u32 draws (the stat_bh_fdr_permutation recipe)
    groups = spark.range(_BOOT_B // 4).toDF("g")
    m = F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":"),
                       F.col("g").cast("string")))

    def pois_w(u):
        w = F.when(u < _POIS_T[0], 0)
        for k, t in enumerate(_POIS_T[1:], start=1):
            w = w.when(u < t, k)
        return w.otherwise(len(_POIS_T))

    # r11 (the stat_bh_fdr_permutation finding): parse each digest HALF
    # with ONE conv (16 hex chars, toBase -10 = signed 64-bit so the
    # string always casts exactly) and split the two u32 draws with
    # shift/mask bit ops — half the conv calls, identical u32 values
    half = [F.conv(F.substring("m", 1 + 16 * h, 16), 16, -10)
            .cast("bigint").alias(f"h{h}") for h in range(2)]
    u_of = [F.shiftrightunsigned("h0", 32),
            F.col("h0").bitwiseAND(F.lit(4294967295)),
            F.shiftrightunsigned("h1", 32),
            F.col("h1").bitwiseAND(F.lit(4294967295))]
    draws = F.array(*[
        F.struct((F.col("g") * 4 + j).cast("bigint").alias("b"),
                 pois_w(u_of[j].cast("bigint")).alias("w"))
        for j in range(4)])
    weighted = (base.crossJoin(F.broadcast(groups))
                .select("cents", m.alias("m"), "g")
                .select("cents", "g", *half)
                .select("cents", F.explode(draws).alias("dr"))
                .select(F.col("dr.b").alias("b"), "cents",
                        F.col("dr.w").alias("w")))
    means = (weighted.groupBy("b")
             .agg((F.sum(F.col("w") * F.col("cents")).cast("bigint")
                   .cast("double")
                   / F.sum("w").cast("bigint").cast("double")).alias("m")))
    ranked = means.select(
        "m", F.row_number().over(Window.orderBy("m", "b")).alias("rk"))
    ci = ranked.agg(
        F.min(F.when(F.col("rk") == _BOOT_LO_RANK, F.col("m"))).alias("lo"),
        F.min(F.when(F.col("rk") == _BOOT_HI_RANK, F.col("m"))).alias("hi"),
        F.count(F.lit(1)).cast("bigint").alias("n_reps"))
    pt = base.agg(
        (F.sum("cents").cast("bigint").cast("double")
         / F.count(F.lit(1)).cast("double")).alias("m0"))
    return ci.crossJoin(pt).select(
        "n_reps",
        (F.col("m0") / F.lit(100.0)).alias("est_mean_dollars"),
        (F.col("lo") / F.lit(100.0)).alias("ci_lo_dollars"),
        (F.col("hi") / F.lit(100.0)).alias("ci_hi_dollars"))


# ---------------------------------------------------------------------------
# closed-form two-feature OLS (round 6)
# ---------------------------------------------------------------------------

_OLS_ORACLE = """
WITH base AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS y,
         CAST(hour(ts) AS BIGINT) AS x1,
         -- DuckDB dayofweek is 0-based Sunday, Spark is 1-based: +1
         -- (the ts_dow_hour_profile offset rule)
         CAST(dayofweek(ts) + 1 AS BIGINT) AS x2
  FROM events
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1) AS BIGINT) AS sx1, CAST(SUM(x2) AS BIGINT) AS sx2,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x1 * x1) AS BIGINT) AS sx1x1,
         CAST(SUM(x1 * x2) AS BIGINT) AS sx1x2,
         CAST(SUM(x2 * x2) AS BIGINT) AS sx2x2,
         CAST(SUM(x1 * y) AS BIGINT) AS sx1y,
         CAST(SUM(x2 * y) AS BIGINT) AS sx2y,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM base
), d AS (
  SELECT n, sy, sx1y, sx2y, syy,
         CAST(n AS DOUBLE) AS a, CAST(sx1 AS DOUBLE) AS b,
         CAST(sx2 AS DOUBLE) AS c,
         CAST(sx1x1 AS DOUBLE) AS e, CAST(sx1x2 AS DOUBLE) AS f,
         CAST(sx2x2 AS DOUBLE) AS g,
         CAST(sy AS DOUBLE) AS r0, CAST(sx1y AS DOUBLE) AS r1,
         CAST(sx2y AS DOUBLE) AS r2v
  FROM s
), betas AS (
  SELECT n, sy, sx1y, sx2y, syy,
         a * (e * g - f * f) - b * (b * g - f * c)
           + c * (b * f - e * c) AS det,
         r0 * (e * g - f * f) - b * (r1 * g - f * r2v)
           + c * (r1 * f - e * r2v) AS det0,
         a * (r1 * g - r2v * f) - r0 * (b * g - f * c)
           + c * (b * r2v - r1 * c) AS det1,
         a * (e * r2v - f * r1) - b * (b * r2v - r1 * c)
           + r0 * (b * f - e * c) AS det2
  FROM d
)
SELECT n,
       (det0 / det) / 100.0 AS intercept_dollars,
       (det1 / det) / 100.0 AS beta_hour_dollars,
       (det2 / det) / 100.0 AS beta_dow_dollars,
       1.0 - (CAST(syy AS DOUBLE)
              - (det0 / det) * CAST(sy AS DOUBLE)
              - (det1 / det) * CAST(sx1y AS DOUBLE)
              - (det2 / det) * CAST(sx2y AS DOUBLE))
             / (CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                  / CAST(n AS DOUBLE)) AS r_squared
FROM betas
"""


@register("stat_ols_two_feature", oracle=_OLS_ORACLE)
def stat_ols_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form two-feature OLS — value-in-cents regressed on
    hour-of-day and day-of-week with intercept, solved by Cramer's rule
    on the 3×3 normal equations (the multi-feature step past
    agg_regr_builtins' single-regressor fits; the shape feature stores
    use for cheap trend-adjustment without an ML library). All ten
    moment sums are exact BIGINTs (every one < 2⁵³, so the double lift
    is exact); determinants expand through a FIXED cofactor tree spelled
    identically in both engines; R² reuses the normal-equation identity
    SSE = Σy² − β·(Σy, Σx₁y, Σx₂y). DuckDB's dayofweek is 0-based
    Sunday while Spark's is 1-based, so the oracle applies the +1 shim
    to mirror Spark's values (the stat_two_proportion_z convention;
    this docstring previously claimed no shim was needed -- fixed per
    r6 ADVICE).

    Scale shape: ONE combinable ten-sum aggregate over the scan to a
    single row; the solve is constant work after the fold — the
    canonical 100 TB regression recipe (normal equations, not gradient
    descent)."""
    ev = load_table(spark, "events", sf_dir)
    y = F.round(F.col("value") * 100, 0).cast("bigint")
    x1 = F.hour("ts").cast("bigint")
    x2 = F.dayofweek("ts").cast("bigint")
    base = ev.select(y.alias("y"), x1.alias("x1"), x2.alias("x2"))
    s = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("sx1"),
        F.sum("x2").cast("bigint").alias("sx2"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("sx1x1"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("sx1x2"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("sx2x2"),
        F.sum(F.col("x1") * F.col("y")).cast("bigint").alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).cast("bigint").alias("sx2y"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"))
    a = F.col("n").cast("double")
    b = F.col("sx1").cast("double")
    c = F.col("sx2").cast("double")
    e = F.col("sx1x1").cast("double")
    f = F.col("sx1x2").cast("double")
    g = F.col("sx2x2").cast("double")
    r0 = F.col("sy").cast("double")
    r1 = F.col("sx1y").cast("double")
    r2v = F.col("sx2y").cast("double")
    det = a * (e * g - f * f) - b * (b * g - f * c) + c * (b * f - e * c)
    det0 = (r0 * (e * g - f * f) - b * (r1 * g - f * r2v)
            + c * (r1 * f - e * r2v))
    det1 = (a * (r1 * g - r2v * f) - r0 * (b * g - f * c)
            + c * (b * r2v - r1 * c))
    det2 = (a * (e * r2v - f * r1) - b * (b * r2v - r1 * c)
            + r0 * (b * f - e * c))
    b0 = det0 / det
    b1 = det1 / det
    b2 = det2 / det
    syyd = F.col("syy").cast("double")
    sse = syyd - b0 * r0 - b1 * r1 - b2 * r2v
    sst = syyd - r0 * r0 / a
    return s.select(
        "n",
        (b0 / F.lit(100.0)).alias("intercept_dollars"),
        (b1 / F.lit(100.0)).alias("beta_hour_dollars"),
        (b2 / F.lit(100.0)).alias("beta_dow_dollars"),
        (F.lit(1.0) - sse / sst).alias("r_squared"))


# ---------------------------------------------------------------------------
# Theil–Sen robust slope (round 6)
# ---------------------------------------------------------------------------

_THEIL_SEN_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         CAST(date_diff('hour', TIMESTAMP '1970-01-01 00:00:00',
                        date_trunc('hour', ts)) AS BIGINT) AS h,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), pairs AS (
  SELECT a.event_type,
         CAST(b.cents - a.cents AS DOUBLE)
           / CAST(b.h - a.h AS DOUBLE) AS slope
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type AND a.h < b.h
), ranked AS (
  SELECT event_type, slope,
         row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM pairs
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_pairs,
       MIN(CASE WHEN rk = (n + 1) // 2 THEN slope END)
         AS sen_slope_cents_per_hour
FROM ranked GROUP BY event_type
"""


@register("ts_theil_sen_slope", oracle=_THEIL_SEN_ORACLE)
def ts_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type — the MEDIAN of all
    pairwise slopes of the hourly revenue series, the estimator that
    shrugs off the outlier hours that poison ts_trend_slope's
    least-squares fit (29% breakdown point vs 0). The O(k²) pair
    expansion runs over the HOURLY pre-aggregate, so the quadratic term
    is bounded by the calendar (720 points/month → ~260k pairs per
    type), never by corpus size — the same pre-agg-bounds-the-kernel
    discipline as ts_downsample_lttb. Each slope is one Δcents/Δhours
    division of exact BIGINTs (identical IEEE op both engines); the
    median is the DISCRETE lower median picked by rank, so an actual
    pair's slope ships out, not an interpolation.

    Scale shape: combinable hourly groupBy collapses the corpus; the
    pair self-join co-partitions on event_type; one ranked window per
    type over calendar-bounded pairs."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents"))
              .select("event_type",
                      (F.unix_timestamp("hr") / 3600).cast("bigint")
                      .alias("h"),
                      "cents"))
    a = hourly.alias("a")
    b = hourly.alias("b")
    pairs = (a.join(b, (F.col("a.event_type") == F.col("b.event_type"))
                    & (F.col("a.h") < F.col("b.h")))
             .select(F.col("a.event_type").alias("event_type"),
                     ((F.col("b.cents") - F.col("a.cents")).cast("double")
                      / (F.col("b.h") - F.col("a.h")).cast("double"))
                     .alias("slope")))
    wp = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type", "slope",
        F.row_number().over(wp.orderBy("slope")).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("n"))
    return (ranked.groupBy("event_type")
            .agg(F.max("n").cast("bigint").alias("n_pairs"),
                 F.min(F.when(F.col("rk") == F.expr("(n + 1) div 2"),
                              F.col("slope")))
                 .alias("sen_slope_cents_per_hour")))


# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test (round 6)
# ---------------------------------------------------------------------------

_RUNS_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), med AS (
  SELECT event_type,
         MIN(CASE WHEN rk = (n + 1) // 2 THEN cents END) AS m
  FROM (SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cents, hr) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM hourly) GROUP BY event_type
), signed AS (
  SELECT h.event_type, h.hr,
         CASE WHEN h.cents > med.m THEN 1 ELSE 0 END AS s
  FROM hourly h JOIN med ON h.event_type = med.event_type
  WHERE h.cents <> med.m
), runs AS (
  SELECT event_type, s,
         CASE WHEN lag(s) OVER (PARTITION BY event_type ORDER BY hr)
                   IS DISTINCT FROM s THEN 1 ELSE 0 END AS new_run
  FROM signed
), agg AS (
  SELECT event_type,
         CAST(SUM(new_run) AS BIGINT) AS r,
         CAST(SUM(s) AS BIGINT) AS n1,
         CAST(COUNT(*) - SUM(s) AS BIGINT) AS n2
  FROM runs GROUP BY event_type
)
SELECT event_type, r AS n_runs, n1 AS n_above, n2 AS n_below,
       (CAST(r AS DOUBLE)
        - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
           / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0))
       / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
              * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))
              / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                 * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                 * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))
         AS z_stat
FROM agg
"""


@register("stat_runs_test_wald_wolfowitz", oracle=_RUNS_ORACLE)
def stat_runs_test_wald_wolfowitz(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test per event type — is the hourly revenue
    series RANDOM around its median, or does it clump (trend/seasonality
    → too few runs; alternation → too many)? The nonparametric
    randomness gate that needs no distribution at all: dichotomize the
    series against its DISCRETE median (rank-picked, exact-median hours
    dropped — the classical treatment), count runs with one lag
    comparison, then the normal approximation z from pure integer
    (R, n₁, n₂) through an identical double tree.

    Scale shape: hourly pre-agg collapses the corpus to the calendar;
    the rank-median, sign lag, and run count are all windows over the
    calendar-sized series; one final five-integer fold per type."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents"))
              .localCheckpoint(eager=False))  # median + signing share it
    wp = Window.partitionBy("event_type")
    ranked = hourly.select(
        "event_type", "cents",
        F.row_number().over(wp.orderBy("cents", "hr")).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("n"))
    med = (ranked.groupBy("event_type")
           .agg(F.min(F.when(F.col("rk") == F.expr("(n + 1) div 2"),
                             F.col("cents"))).alias("m")))
    signed = (hourly.join(F.broadcast(med), "event_type")
              .where(F.col("cents") != F.col("m"))
              .select("event_type", "hr",
                      F.when(F.col("cents") > F.col("m"), 1).otherwise(0)
                      .alias("s")))
    new_run = F.when(
        ~F.lag("s").over(wp.orderBy("hr")).eqNullSafe(F.col("s")), 1) \
        .otherwise(0)
    runs = signed.select("event_type", "s", new_run.alias("new_run"))
    agg = runs.groupBy("event_type").agg(
        F.sum("new_run").cast("bigint").alias("r"),
        F.sum("s").cast("bigint").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).cast("bigint").alias("n2"))
    rd = F.col("r").cast("double")
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    mu = F.lit(2.0) * n1d * n2d / (n1d + n2d) + F.lit(1.0)
    var = (F.lit(2.0) * n1d * n2d
           * (F.lit(2.0) * n1d * n2d - n1d - n2d)
           / ((n1d + n2d) * (n1d + n2d) * (n1d + n2d - F.lit(1.0))))
    return agg.select(
        "event_type", F.col("r").alias("n_runs"),
        F.col("n1").alias("n_above"), F.col("n2").alias("n_below"),
        ((rd - mu) / F.sqrt(var)).alias("z_stat"))


# ---------------------------------------------------------------------------
# Kendall tau-b (round 6)
# ---------------------------------------------------------------------------

_KENDALL_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY event_type, date_trunc('hour', ts)
), paired AS (
  SELECT x.hr, x.cents AS xv, y.cents AS yv
  FROM (SELECT hr, cents FROM hourly WHERE event_type = 'click') x
  JOIN (SELECT hr, cents FROM hourly WHERE event_type = 'purchase') y
    ON x.hr = y.hr
), pp AS (
  SELECT a.xv AS x1, a.yv AS y1, b.xv AS x2, b.yv AS y2
  FROM paired a JOIN paired b ON a.hr < b.hr
), s AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS n0,
    CAST(COUNT(CASE WHEN (x1 - x2) * (y1 - y2) > 0 THEN 1 END) AS BIGINT)
      AS c,
    CAST(COUNT(CASE WHEN (x1 - x2) * (y1 - y2) < 0 THEN 1 END) AS BIGINT)
      AS d,
    -- ALL x-tied pairs (both-tied included) count in n1, and all
    -- y-tied pairs in n2 -- the classical tau-b denominator (r6 ADVICE)
    CAST(COUNT(CASE WHEN x1 = x2 THEN 1 END) AS BIGINT) AS tx,
    CAST(COUNT(CASE WHEN y1 = y2 THEN 1 END) AS BIGINT) AS ty
  FROM pp
)
SELECT n0 AS n_pairs, c AS n_concordant, d AS n_discordant,
       tx AS n_ties_x, ty AS n_ties_y,
       (CAST(c AS DOUBLE) - CAST(d AS DOUBLE))
         / sqrt((CAST(n0 AS DOUBLE) - CAST(tx AS DOUBLE))
                * (CAST(n0 AS DOUBLE) - CAST(ty AS DOUBLE))) AS tau_b
FROM s
"""


@register("stat_kendall_tau", oracle=_KENDALL_ORACLE)
def stat_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b between the hourly click and purchase revenue
    series — the rank-concordance association that is exactly
    distribution-free AND tie-corrected (Pearson's ts_rolling_corr
    reads co-movement magnitude; τ reads co-movement DIRECTION only,
    immune to any monotone distortion of either series). Concordant /
    discordant / tie counts are pure integer comparisons over the
    calendar-bounded pair expansion; τ-b assembles in one identical
    four-op tree with the CLASSICAL denominator √((n₀−n₁)(n₀−n₂)) where
    n₁ counts ALL x-tied pairs and n₂ all y-tied pairs (both-tied pairs
    belong to both terms). The sign product (x₁−x₂)(y₁−y₂) stays in
    BIGINT.

    Scale shape: the corpus collapses to one paired hourly series; the
    O(k²) pair self-join is calendar-bounded (the Theil–Sen
    discipline); one combinable five-count fold."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents")))
    x = (hourly.where(F.col("event_type") == "click")
         .select("hr", F.col("cents").alias("xv")))
    y = (hourly.where(F.col("event_type") == "purchase")
         .select(F.col("hr").alias("hry"), F.col("cents").alias("yv")))
    paired = (x.join(y, F.col("hr") == F.col("hry"))
              .select("hr", "xv", "yv")
              .localCheckpoint(eager=False))  # both pair sides share it
    a = paired.alias("a")
    b = paired.alias("b")
    pp = (a.join(b, F.col("a.hr") < F.col("b.hr"))
          .select((F.col("a.xv") - F.col("b.xv")).alias("dx"),
                  (F.col("a.yv") - F.col("b.yv")).alias("dy")))
    s = pp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.count(F.when(F.col("dx") * F.col("dy") > 0, 1))
        .cast("bigint").alias("c"),
        F.count(F.when(F.col("dx") * F.col("dy") < 0, 1))
        .cast("bigint").alias("d"),
        # classical tau-b tie terms: EVERY pair tied on x counts in tx
        # and every pair tied on y in ty, so a pair tied on BOTH series
        # appears in both terms (the r6 ADVICE fix -- the previous
        # AND-differing variant inflated tau_b under both-tied pairs)
        F.count(F.when(F.col("dx") == 0, 1)).cast("bigint").alias("tx"),
        F.count(F.when(F.col("dy") == 0, 1)).cast("bigint").alias("ty"))
    return s.select(
        F.col("n0").alias("n_pairs"),
        F.col("c").alias("n_concordant"),
        F.col("d").alias("n_discordant"),
        F.col("tx").alias("n_ties_x"),
        F.col("ty").alias("n_ties_y"),
        ((F.col("c").cast("double") - F.col("d").cast("double"))
         / F.sqrt((F.col("n0").cast("double") - F.col("tx").cast("double"))
                  * (F.col("n0").cast("double")
                     - F.col("ty").cast("double")))).alias("tau_b"))


# ---------------------------------------------------------------------------
# Spearman rank correlation (round 6)
# ---------------------------------------------------------------------------

_SPEARMAN_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY event_type, date_trunc('hour', ts)
), paired AS (
  SELECT x.hr, x.cents AS xv, y.cents AS yv
  FROM (SELECT hr, cents FROM hourly WHERE event_type = 'click') x
  JOIN (SELECT hr, cents FROM hourly WHERE event_type = 'purchase') y
    ON x.hr = y.hr
), r AS (
  -- doubled average rank 2r = 2*min_rank + ties - 1 stays INTEGER
  SELECT
    CAST(2 * rank() OVER (ORDER BY xv)
         + COUNT(*) OVER (PARTITION BY xv) - 1 AS BIGINT) AS rx2,
    CAST(2 * rank() OVER (ORDER BY yv)
         + COUNT(*) OVER (PARTITION BY yv) - 1 AS BIGINT) AS ry2
  FROM paired
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rx2) AS BIGINT) AS sx, CAST(SUM(ry2) AS BIGINT) AS sy,
         CAST(SUM(rx2 * ry2) AS BIGINT) AS sxy,
         CAST(SUM(rx2 * rx2) AS BIGINT) AS sxx,
         CAST(SUM(ry2 * ry2) AS BIGINT) AS syy
  FROM r
), a AS (
  SELECT n,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS ax,
         CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ay,
         CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE) AS axy,
         CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) AS axx,
         CAST(syy AS DOUBLE) / CAST(n AS DOUBLE) AS ayy
  FROM s
)
SELECT n AS n_hours,
       (axy - ax * ay)
         / sqrt((axx - ax * ax) * (ayy - ay * ay)) AS spearman_rho
FROM a
"""


@register("stat_spearman_rho", oracle=_SPEARMAN_ORACLE)
def stat_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between the hourly click and purchase
    series — Pearson on AVERAGE ranks, the monotone-association measure
    between Kendall's τ (pure concordance) and raw Pearson (magnitude).
    Tie handling is exact-integer: the doubled average rank
    2r̄ = 2·min_rank + ties − 1 is always an INTEGER, so all five moment
    sums stay BIGINT (ρ is invariant under the common ×2 scaling) and
    the correlation assembles through the standard identical tree — no
    fractional ranks, no float sums, no rounding.

    Scale shape: calendar-bounded series; two rank windows over it; one
    combinable five-sum fold. At a corpus where the series itself were
    huge, the two-pass bucketed rank substitutes (the house recipe)."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents")))
    x = (hourly.where(F.col("event_type") == "click")
         .select("hr", F.col("cents").alias("xv")))
    y = (hourly.where(F.col("event_type") == "purchase")
         .select(F.col("hr").alias("hry"), F.col("cents").alias("yv")))
    paired = x.join(y, F.col("hr") == F.col("hry")).select("xv", "yv")
    rx2 = (F.lit(2) * F.rank().over(Window.orderBy("xv"))
           + F.count(F.lit(1)).over(Window.partitionBy("xv")) - 1) \
        .cast("bigint")
    ry2 = (F.lit(2) * F.rank().over(Window.orderBy("yv"))
           + F.count(F.lit(1)).over(Window.partitionBy("yv")) - 1) \
        .cast("bigint")
    r = paired.select(rx2.alias("rx2"), ry2.alias("ry2"))
    s = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rx2").cast("bigint").alias("sx"),
        F.sum("ry2").cast("bigint").alias("sy"),
        F.sum(F.col("rx2") * F.col("ry2")).cast("bigint").alias("sxy"),
        F.sum(F.col("rx2") * F.col("rx2")).cast("bigint").alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).cast("bigint").alias("syy"))
    nd = F.col("n").cast("double")
    ax = F.col("sx").cast("double") / nd
    ay = F.col("sy").cast("double") / nd
    axy = F.col("sxy").cast("double") / nd
    axx = F.col("sxx").cast("double") / nd
    ayy = F.col("syy").cast("double") / nd
    return s.select(
        F.col("n").alias("n_hours"),
        ((axy - ax * ay)
         / F.sqrt((axx - ax * ax) * (ayy - ay * ay)))
        .alias("spearman_rho"))


# ---------------------------------------------------------------------------
# one-way ANOVA F (round 6)
# ---------------------------------------------------------------------------

_ANOVA_ORACLE = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS xc FROM events
), per AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xc) AS BIGINT) AS s1, CAST(SUM(xc * xc) AS BIGINT) AS s2
  FROM c GROUP BY event_type
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS n_tot,
         CAST(SUM(s1) AS BIGINT) AS s1_tot,
         CAST(SUM(s2) AS BIGINT) AS s2_tot,
         -- group-mean term Σ s1ᵢ²/nᵢ: per-group exact rational, summed
         -- in a FIXED order (event_type) via an ordered list fold so the
         -- float sum is associatively identical in both engines
         list_sum(list(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                       / CAST(n AS DOUBLE) ORDER BY event_type))
           AS ssb_term
  FROM per
)
SELECT k AS n_groups, n_tot,
       (ssb_term - CAST(s1_tot AS DOUBLE) * CAST(s1_tot AS DOUBLE)
                   / CAST(n_tot AS DOUBLE)) / 100.0 / 100.0 AS ss_between_d2,
       (CAST(s2_tot AS DOUBLE) - ssb_term) / 100.0 / 100.0 AS ss_within_d2,
       ((ssb_term - CAST(s1_tot AS DOUBLE) * CAST(s1_tot AS DOUBLE)
                    / CAST(n_tot AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
         / ((CAST(s2_tot AS DOUBLE) - ssb_term)
            / (CAST(n_tot AS DOUBLE) - CAST(k AS DOUBLE))) AS f_stat
FROM tot
"""


@register("stat_anova_oneway_f", oracle=_ANOVA_ORACLE)
def stat_anova_oneway_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across all five event types — does event type
    explain ANY of the value variance? — the k-group generalization of
    stat_welch_ttest's pairwise readout. Per-group n, Σx, Σx² are exact
    BIGINTs; the one cross-group float reduction (Σᵢ s1ᵢ²/nᵢ) is summed
    over a FIXED ORDER (the k=5 per-group terms sorted by event_type and
    folded left-to-right in both engines — a list fold in DuckDB, an
    ordered-array aggregate fold in Spark), so the only associativity
    hazard in the statistic is pinned; everything after is the standard
    identical tree. SS columns report in dollars² (÷100²), which is an
    exact power-of-two-free scaling applied identically.

    Scale shape: one combinable three-sum groupBy to k=5 rows; the
    fixed-order fold runs over those 5 rows — data-size-free."""
    ev = load_table(spark, "events", sf_dir)
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xc).cast("bigint").alias("s1"),
        F.sum(xc * xc).cast("bigint").alias("s2"))
    term = (F.col("s1").cast("double") * F.col("s1").cast("double")
            / F.col("n").cast("double"))
    tot = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n_tot"),
        F.sum("s1").cast("bigint").alias("s1_tot"),
        F.sum("s2").cast("bigint").alias("s2_tot"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("event_type"),
                                                 term.alias("t")))),
            F.lit(0.0),
            lambda acc, x: acc + x["t"]).alias("ssb_term"))
    kd = F.col("k").cast("double")
    nd = F.col("n_tot").cast("double")
    ssb = (F.col("ssb_term")
           - F.col("s1_tot").cast("double") * F.col("s1_tot").cast("double")
           / nd)
    ssw = F.col("s2_tot").cast("double") - F.col("ssb_term")
    return tot.select(
        F.col("k").alias("n_groups"), "n_tot",
        (ssb / F.lit(100.0) / F.lit(100.0)).alias("ss_between_d2"),
        (ssw / F.lit(100.0) / F.lit(100.0)).alias("ss_within_d2"),
        ((ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd))).alias("f_stat"))


# ---------------------------------------------------------------------------
# two-proportion z-test (round 6)
# ---------------------------------------------------------------------------

_TWO_PROP_ORACLE = """
WITH c AS (
  SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS is_wkend,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv
  FROM events
), s AS (
  SELECT
    CAST(SUM(CASE WHEN is_wkend = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN is_wkend = 1 THEN is_conv ELSE 0 END) AS BIGINT)
      AS x1,
    CAST(SUM(CASE WHEN is_wkend = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    CAST(SUM(CASE WHEN is_wkend = 0 THEN is_conv ELSE 0 END) AS BIGINT)
      AS x2
  FROM c
)
SELECT n1 AS n_weekend, x1 AS conv_weekend, n2 AS n_weekday,
       x2 AS conv_weekday,
       CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
         - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p_diff,
       (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))
       / sqrt((CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
              * (1.0 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
              * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
         AS z_stat
FROM s
"""


@register("stat_two_proportion_z", oracle=_TWO_PROP_ORACLE)
def stat_two_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test — does the purchase-conversion rate differ
    between weekend and weekday traffic? — the conversion-rate
    counterpart of stat_welch_ttest's value test, with the pooled
    standard error under H₀ (the form every A/B dashboard implements
    first). Four integer counts from ONE conditional aggregate; p̂'s and
    z assemble through the identical tree. Weekend uses DuckDB's
    0-based dayofweek (0=Sun, 6=Sat) mirrored on the Spark side by
    shifting its 1-based values.

    Scale shape: a single combinable four-sum fold over the scan."""
    ev = load_table(spark, "events", sf_dir)
    # Spark dayofweek: 1=Sunday..7=Saturday → weekend = {1, 7}
    is_wkend = F.dayofweek("ts").isin(1, 7)
    is_conv = F.col("event_type") == "purchase"
    s = ev.agg(
        F.count(F.when(is_wkend, 1)).cast("bigint").alias("n1"),
        F.count(F.when(is_wkend & is_conv, 1)).cast("bigint").alias("x1"),
        F.count(F.when(~is_wkend, 1)).cast("bigint").alias("n2"),
        F.count(F.when(~is_wkend & is_conv, 1)).cast("bigint").alias("x2"))
    p1 = F.col("x1").cast("double") / F.col("n1").cast("double")
    p2 = F.col("x2").cast("double") / F.col("n2").cast("double")
    pp = ((F.col("x1") + F.col("x2")).cast("double")
          / (F.col("n1") + F.col("n2")).cast("double"))
    se = F.sqrt(pp * (F.lit(1.0) - pp)
                * (F.lit(1.0) / F.col("n1").cast("double")
                   + F.lit(1.0) / F.col("n2").cast("double")))
    return s.select(
        F.col("n1").alias("n_weekend"), F.col("x1").alias("conv_weekend"),
        F.col("n2").alias("n_weekday"), F.col("x2").alias("conv_weekday"),
        (p1 - p2).alias("p_diff"),
        ((p1 - p2) / se).alias("z_stat"))


# ---------------------------------------------------------------------------
# Mann-Whitney U (rank-sum) two-sample test (round 6)
# ---------------------------------------------------------------------------

_MWU_ORACLE = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events WHERE event_type IN ('click', 'purchase')
), r AS (
  SELECT event_type,
         CAST(2 * rank() OVER (ORDER BY xc)
              + COUNT(*) OVER (PARTITION BY xc) - 1 AS BIGINT) AS r2
  FROM c
), ties AS (
  SELECT CAST(COALESCE(SUM(cnt * cnt * cnt - cnt), 0) AS BIGINT) AS tt
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM c GROUP BY xc)
), s AS (
  SELECT
    CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n1,
    CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n2,
    CAST(SUM(r2) FILTER (WHERE event_type = 'click') AS BIGINT) AS sr2
  FROM r
)
SELECT n1 AS n_click, n2 AS n_purchase,
       (CAST(sr2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0))
         / 2.0 AS u_click,
       ((CAST(sr2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0))
          / 2.0
        - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
       / sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
              * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                 - CAST(tt AS DOUBLE)
                   / (CAST(n1 + n2 AS DOUBLE)
                      * (CAST(n1 + n2 AS DOUBLE) - 1.0)))) AS z_stat,
       1.0 - (CAST(sr2 AS DOUBLE)
              - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0))
             / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS rank_biserial
FROM s, ties
"""


@register("stat_mann_whitney_u", oracle=_MWU_ORACLE)
def stat_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between click and purchase
    event values -- the distribution-free partner of stat_welch_ttest:
    does one arm stochastically dominate the other, with NO normality
    assumption? Ranks use the doubled-average-rank trick from
    stat_spearman_rho (2*avg-rank = 2*min_rank + ties - 1 is always an
    INTEGER), so the rank sum stays BIGINT; the tie correction
    sum(t^3 - t) is a pure integer fold over the value domain; U, the
    normal-approximation z with tie-corrected variance
    (n1*n2/12)*((N+1) - T/(N(N-1))), and the rank-biserial effect size
    1 - 2U/(n1*n2) assemble through an expression tree written
    identically in both engines.

    Scale shape: the corpus folds to the value DOMAIN (~18k distinct
    cents at sf0.1, the stat_ks_two_sample observation) in one
    combinable groupBy; the only global window runs over that
    domain-sized table (100x probe: 5.6x row-level -> 1.2x collapsed);
    everything after is one combinable fold."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    # DOMAIN-COLLAPSED ranks (the stat_ks_two_sample discipline): the
    # doubled average rank of every row at value v is 2*cum_below + t_v
    # + 1, a pure function of per-value counts -- so the corpus folds
    # to the ~18k-value domain FIRST and the rank window runs over the
    # domain, not the rows. The first draft's row-level global rank
    # window funneled every row through one partition (probed 5.6x for
    # 100x data; this shape keeps the only global window domain-sized).
    dom = (ev.select((F.col("event_type") == "click").alias("is1"),
                     xc.alias("xc"))
           .groupBy("xc")
           .agg(F.count(F.lit(1)).cast("bigint").alias("t"),
                F.count(F.when(F.col("is1"), 1)).cast("bigint")
                .alias("p")))
    wcum = (Window.orderBy("xc")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_below = (F.sum("t").over(wcum) - F.col("t")).cast("bigint")
    r = dom.select(
        "t", "p",
        (F.col("p") * (F.lit(2) * cum_below + F.col("t") + 1))
        .cast("bigint").alias("pr2"),
        (F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint").alias("t3t"))
    j = r.agg(
        F.sum("p").cast("bigint").alias("n1"),
        F.sum(F.col("t") - F.col("p")).cast("bigint").alias("n2"),
        F.sum("pr2").cast("bigint").alias("sr2"),
        F.coalesce(F.sum("t3t"), F.lit(0)).cast("bigint").alias("tt"))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u1 = (F.col("sr2").cast("double") - n1d * (n1d + F.lit(1.0))) / F.lit(2.0)
    var_u = (n1d * n2d / F.lit(12.0)) \
        * ((nd + F.lit(1.0))
           - F.col("tt").cast("double") / (nd * (nd - F.lit(1.0))))
    return j.select(
        F.col("n1").alias("n_click"),
        F.col("n2").alias("n_purchase"),
        u1.alias("u_click"),
        ((u1 - n1d * n2d / F.lit(2.0)) / F.sqrt(var_u)).alias("z_stat"),
        (F.lit(1.0) - (F.col("sr2").cast("double")
                       - n1d * (n1d + F.lit(1.0))) / (n1d * n2d))
        .alias("rank_biserial"))


# ---------------------------------------------------------------------------
# Cohen's d / Hedges' g effect size (round 6)
# ---------------------------------------------------------------------------

_COHENS_D_ORACLE = """
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
), v AS (
  SELECT n1, n2,
         CAST(s1a AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
         CAST(s1b AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
         (CAST(s2a AS DOUBLE) / CAST(n1 AS DOUBLE)
          - (CAST(s1a AS DOUBLE) / CAST(n1 AS DOUBLE))
            * (CAST(s1a AS DOUBLE) / CAST(n1 AS DOUBLE)))
           * (CAST(n1 AS DOUBLE) / (CAST(n1 AS DOUBLE) - 1.0)) AS v1,
         (CAST(s2b AS DOUBLE) / CAST(n2 AS DOUBLE)
          - (CAST(s1b AS DOUBLE) / CAST(n2 AS DOUBLE))
            * (CAST(s1b AS DOUBLE) / CAST(n2 AS DOUBLE)))
           * (CAST(n2 AS DOUBLE) / (CAST(n2 AS DOUBLE) - 1.0)) AS v2
  FROM s
), d AS (
  SELECT n1, n2,
         (m1 - m2) / sqrt(((CAST(n1 AS DOUBLE) - 1.0) * v1
                           + (CAST(n2 AS DOUBLE) - 1.0) * v2)
                          / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0))
           AS cohens_d
  FROM v
)
SELECT n1 AS n_click, n2 AS n_purchase, cohens_d,
       cohens_d * (1.0 - 3.0 / (4.0 * CAST(n1 + n2 AS DOUBLE) - 9.0))
         AS hedges_g
FROM d
"""


@register("stat_cohens_d", oracle=_COHENS_D_ORACLE)
def stat_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d pooled-SD effect size between click and purchase values,
    plus the Hedges small-sample correction g = d*(1 - 3/(4N - 9)) --
    the HOW-BIG companion to stat_welch_ttest's IS-IT-REAL: at 100-TB
    row counts every difference is 'significant', so the effect size is
    the number a decision actually turns on. Same six exact integer cent
    sums as the t-test; pooled variance ((n1-1)v1 + (n2-1)v2)/(n1+n2-2)
    and both standardized effects are scale-invariant, so cents equal
    dollars; the whole assembly is one identical expression tree.

    Scale shape: ONE combinable conditional aggregate (six FILTER sums)
    to a single row -- no shuffle carries more than six partials."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    is1 = F.col("event_type") == "click"
    s = ev.agg(
        F.count(F.when(is1, 1)).cast("bigint").alias("n1"),
        F.count(F.when(~is1, 1)).cast("bigint").alias("n2"),
        F.sum(F.when(is1, xc)).cast("bigint").alias("s1a"),
        F.sum(F.when(is1, xc * xc)).cast("bigint").alias("s2a"),
        F.sum(F.when(~is1, xc)).cast("bigint").alias("s1b"),
        F.sum(F.when(~is1, xc * xc)).cast("bigint").alias("s2b"))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    m1 = F.col("s1a").cast("double") / n1d
    m2 = F.col("s1b").cast("double") / n2d
    v1 = (F.col("s2a").cast("double") / n1d - m1 * m1) \
        * (n1d / (n1d - F.lit(1.0)))
    v2 = (F.col("s2b").cast("double") / n2d - m2 * m2) \
        * (n2d / (n2d - F.lit(1.0)))
    d = (m1 - m2) / F.sqrt(((n1d - F.lit(1.0)) * v1
                            + (n2d - F.lit(1.0)) * v2)
                           / (n1d + n2d - F.lit(2.0)))
    return s.select(
        F.col("n1").alias("n_click"),
        F.col("n2").alias("n_purchase"),
        d.alias("cohens_d"),
        (d * (F.lit(1.0) - F.lit(3.0)
              / (F.lit(4.0) * (n1d + n2d) - F.lit(9.0)))).alias("hedges_g"))


# ---------------------------------------------------------------------------
# Cramer's V association strength (round 6)
# ---------------------------------------------------------------------------

_CRAMERS_V_ORACLE = """
WITH cells AS (
  SELECT event_type, CAST(user_id % 3 AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS obs
  FROM events GROUP BY event_type, CAST(user_id % 3 AS BIGINT)
), m AS (
  SELECT event_type, bucket, obs,
         CAST(SUM(obs) OVER (PARTITION BY event_type) AS BIGINT) AS row_n,
         CAST(SUM(obs) OVER (PARTITION BY bucket) AS BIGINT) AS col_n,
         CAST(SUM(obs) OVER () AS BIGINT) AS n
  FROM cells
), contrib AS (
  SELECT event_type, bucket, n,
         (CAST(obs AS DOUBLE)
          - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
            / CAST(n AS DOUBLE))
         * (CAST(obs AS DOUBLE)
            - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
              / CAST(n AS DOUBLE))
         / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
            / CAST(n AS DOUBLE)) AS c
  FROM m
), fold AS (
  SELECT MAX(n) AS n_total,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
         CAST(COUNT(DISTINCT bucket) AS BIGINT) AS cc,
         -- cross-cell float sum pinned to a FIXED (event_type, bucket)
         -- order via an ordered list fold (the stat_anova_oneway_f rule)
         list_sum(list(c ORDER BY event_type, bucket)) AS chi2
  FROM contrib
)
SELECT n_total, r AS n_rows, cc AS n_cols, chi2,
       sqrt(chi2 / (CAST(n_total AS DOUBLE)
                    * CAST(least(r - 1, cc - 1) AS DOUBLE))) AS cramers_v
FROM fold
"""


@register("stat_cramers_v", oracle=_CRAMERS_V_ORACLE)
def stat_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V over the same event_type x user-bucket contingency
    table as stat_chi_square_independence -- the [0,1]-normalized
    association strength that makes tables of different shapes
    comparable (chi-squared itself grows with n, so it cannot be read
    across datasets). Observed counts and both marginals are exact
    BIGINTs from one groupBy plus windows over the 15-cell table; the
    one cross-cell float reduction (sum of (O-E)^2/E) folds over the
    FIXED (event_type, bucket) order in both engines (the
    stat_anova_oneway_f discipline), then V = sqrt(chi2/(n*min(r-1,c-1)))
    is the standard identical tree.

    Scale shape: the corpus collapses to r*c = 15 cells in one
    combinable groupBy; windows and the ordered fold run over those 15
    rows -- data-size-free after the first exchange."""
    ev = load_table(spark, "events", sf_dir)
    cells = (ev.groupBy("event_type",
                        F.pmod(F.col("user_id"), F.lit(3)).cast("bigint")
                        .alias("bucket"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("obs")))
    row_n = F.sum("obs").over(Window.partitionBy("event_type")) \
        .cast("bigint")
    col_n = F.sum("obs").over(Window.partitionBy("bucket")).cast("bigint")
    n = F.sum("obs").over(Window.partitionBy()).cast("bigint")
    m = cells.select("event_type", "bucket", "obs",
                     row_n.alias("row_n"), col_n.alias("col_n"),
                     n.alias("n"))
    exp = (F.col("row_n").cast("double") * F.col("col_n").cast("double")
           / F.col("n").cast("double"))
    contrib = m.select(
        "event_type", "bucket", "n",
        ((F.col("obs").cast("double") - exp)
         * (F.col("obs").cast("double") - exp) / exp).alias("c"))
    fold = contrib.agg(
        F.max("n").alias("n_total"),
        F.countDistinct("event_type").cast("bigint").alias("r"),
        F.countDistinct("bucket").cast("bigint").alias("cc"),
        F.aggregate(
            F.array_sort(F.collect_list(
                F.struct(F.col("event_type"), F.col("bucket"),
                         F.col("c").alias("t")))),
            F.lit(0.0),
            lambda acc, x: acc + x["t"]).alias("chi2"))
    return fold.select(
        "n_total", F.col("r").alias("n_rows"), F.col("cc").alias("n_cols"),
        "chi2",
        F.sqrt(F.col("chi2")
               / (F.col("n_total").cast("double")
                  * F.least(F.col("r") - 1, F.col("cc") - 1).cast("double")))
        .alias("cramers_v"))


# ---------------------------------------------------------------------------
# Brown-Forsythe (median-centered Levene) equality of variances (round 6)
# ---------------------------------------------------------------------------

_BROWN_FORSYTHE_ORACLE = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS xc FROM events
), ranked AS (
  SELECT event_type, xc,
         row_number() OVER (PARTITION BY event_type ORDER BY xc) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM c
), med AS (
  -- discrete lower median: the value at sorted position ceil(n/2)
  SELECT event_type,
         CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN xc END) AS BIGINT)
           AS med
  FROM ranked GROUP BY event_type
), dev AS (
  SELECT c.event_type, CAST(abs(c.xc - med.med) AS BIGINT) AS d
  FROM c JOIN med ON c.event_type = med.event_type
), per AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(d) AS BIGINT) AS s1, CAST(SUM(d * d) AS BIGINT) AS s2
  FROM dev GROUP BY event_type
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS n_tot,
         CAST(SUM(s1) AS BIGINT) AS s1_tot,
         CAST(SUM(s2) AS BIGINT) AS s2_tot,
         list_sum(list(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                       / CAST(n AS DOUBLE) ORDER BY event_type))
           AS ssb_term
  FROM per
)
SELECT k AS n_groups, n_tot,
       ((ssb_term - CAST(s1_tot AS DOUBLE) * CAST(s1_tot AS DOUBLE)
                    / CAST(n_tot AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
         / ((CAST(s2_tot AS DOUBLE) - ssb_term)
            / (CAST(n_tot AS DOUBLE) - CAST(k AS DOUBLE))) AS w_stat,
       CAST(k - 1 AS BIGINT) AS df1,
       CAST(n_tot - k AS BIGINT) AS df2
FROM tot
"""


@register("stat_brown_forsythe", oracle=_BROWN_FORSYTHE_ORACLE)
def stat_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (median-centered Levene) for equality of
    variances across the five event types -- the gatekeeper BEFORE a
    pooled-variance test: stat_anova_oneway_f's F is only trustworthy if
    spreads are comparable, and centering on the MEDIAN (not the mean)
    keeps the test honest under the skewed value distributions real
    event data has. Per-group DISCRETE medians are rank-picked integers
    (the ts_outlier_iqr quartile rule: smallest value whose running
    count reaches ceil(n/2)); absolute deviations |x - med| stay
    BIGINT, so the whole statistic is the one-way ANOVA F machinery
    applied to integer deviations -- per-group (n, sum d, sum d^2)
    folds plus the one FIXED-ORDER cross-group float fold.

    Scale shape: the corpus folds to (type, value) counts; the median
    comes off per-type running counts over that DOMAIN (100x probe:
    10.1x row-level -> 0.6x collapsed), deviations are count-weighted
    sums over the same table, then one groupBy to k=5 rows and a
    5-element ordered fold -- nothing past the first exchange is ever
    row-sized."""
    ev = load_table(spark, "events", sf_dir)
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    # DOMAIN-COLLAPSED: per-(type, value) counts replace both the
    # per-type row_number sort (median = smallest value whose running
    # count reaches ceil(n/2)) and the row-level deviation pass
    # (|x - med| moments are count-weighted sums over the same domain
    # table). The row-level draft probed 10.1x for 100x data; here
    # every post-collapse stage is domain-sized.
    dom = (ev.select("event_type", xc.alias("xc"))
           .groupBy("event_type", "xc")
           .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))
    wn = Window.partitionBy("event_type")
    wcum = (Window.partitionBy("event_type").orderBy("xc")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = dom.select(
        "event_type", "xc", "cnt",
        F.sum("cnt").over(wcum).cast("bigint").alias("cum"),
        F.sum("cnt").over(wn).cast("bigint").alias("n"))
    med = (cum.where(F.col("cum") >= F.floor((F.col("n") + 1) / 2))
           .groupBy("event_type")
           .agg(F.min("xc").cast("bigint").alias("med")))
    dev = (dom.join(F.broadcast(med), "event_type")
           .select("event_type", "cnt",
                   F.abs(F.col("xc") - F.col("med")).cast("bigint")
                   .alias("d")))
    per = dev.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.col("cnt") * F.col("d")).cast("bigint").alias("s1"),
        F.sum(F.col("cnt") * F.col("d") * F.col("d")).cast("bigint")
        .alias("s2"))
    term = (F.col("s1").cast("double") * F.col("s1").cast("double")
            / F.col("n").cast("double"))
    tot = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n_tot"),
        F.sum("s1").cast("bigint").alias("s1_tot"),
        F.sum("s2").cast("bigint").alias("s2_tot"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("event_type"),
                                                 term.alias("t")))),
            F.lit(0.0),
            lambda acc, x: acc + x["t"]).alias("ssb_term"))
    kd = F.col("k").cast("double")
    nd = F.col("n_tot").cast("double")
    ssb = (F.col("ssb_term")
           - F.col("s1_tot").cast("double") * F.col("s1_tot").cast("double")
           / nd)
    ssw = F.col("s2_tot").cast("double") - F.col("ssb_term")
    return tot.select(
        F.col("k").alias("n_groups"), "n_tot",
        ((ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd))).alias("w_stat"),
        (F.col("k") - 1).cast("bigint").alias("df1"),
        (F.col("n_tot") - F.col("k")).cast("bigint").alias("df2"))


# ---------------------------------------------------------------------------
# deterministic randomization (permutation) test (round 6)
# ---------------------------------------------------------------------------

# B halved 64 -> 32 in round 9 (VERDICT r8 ask #5: the key straddled the
# 2 s bar at B=64; the add-one p-value (1+k)/(1+B) stays exact in both
# engines at any B, and 32 exchangeable relabelings still bound the
# add-one p at ~0.03 resolution — the same contract change the judge
# prescribed). The ±4x-per-md5 draw packing is unchanged.
_PERM_B = 32
# u32 < 2^31  <=>  the md5 bit stream assigns the row to pseudo-arm A
_PERM_HALF = 2147483648

_PERM_ORACLE = f"""
WITH base AS (
  SELECT event_id, event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('click', 'purchase')
), obs AS (
  SELECT
    CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n1,
    CAST(SUM(cents) FILTER (WHERE event_type = 'click') AS BIGINT) AS s1,
    CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n2,
    CAST(SUM(cents) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS s2
  FROM base
), grp AS (
  SELECT CAST(unnest(range({_PERM_B // 4})) AS BIGINT) AS g
), digests AS (
  -- one md5 per (row, group); each digest yields FOUR u32 draws
  SELECT base.cents, grp.g,
         md5(concat(CAST(base.event_id AS VARCHAR), ':',
                    CAST(grp.g AS VARCHAR))) AS m
  FROM base CROSS JOIN grp
), js AS (
  SELECT CAST(unnest([0, 1, 2, 3]) AS BIGINT) AS j
), relabeled AS (
  SELECT digests.g * 4 + js.j AS b, digests.cents,
         CAST(concat('0x', substring(digests.m,
                                     CAST(1 + 8 * js.j AS INTEGER), 8))
              AS BIGINT) < {_PERM_HALF} AS in_a
  FROM digests CROSS JOIN js
), rep_diff AS (
  SELECT b,
         CAST(CAST(SUM(cents) FILTER (WHERE in_a) AS BIGINT) AS DOUBLE)
           / CAST(COUNT(*) FILTER (WHERE in_a) AS DOUBLE)
         - CAST(CAST(SUM(cents) FILTER (WHERE NOT in_a) AS BIGINT)
                AS DOUBLE)
           / CAST(COUNT(*) FILTER (WHERE NOT in_a) AS DOUBLE) AS d
  FROM relabeled GROUP BY b
), fold AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
         CAST(COUNT(*) FILTER (WHERE abs(rep_diff.d) >= abs(
              CAST(obs.s1 AS DOUBLE) / CAST(obs.n1 AS DOUBLE)
              - CAST(obs.s2 AS DOUBLE) / CAST(obs.n2 AS DOUBLE)))
              AS BIGINT) AS n_extreme
  FROM rep_diff CROSS JOIN obs
)
SELECT obs.n1 AS n_click, obs.n2 AS n_purchase,
       (CAST(obs.s1 AS DOUBLE) / CAST(obs.n1 AS DOUBLE)
        - CAST(obs.s2 AS DOUBLE) / CAST(obs.n2 AS DOUBLE)) / 100.0
         AS diff_obs_dollars,
       fold.n_reps, fold.n_extreme,
       CAST(1 + fold.n_extreme AS DOUBLE)
         / CAST(1 + fold.n_reps AS DOUBLE) AS p_value
FROM fold CROSS JOIN obs
"""


@register("stat_permutation_test", oracle=_PERM_ORACLE)
def stat_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization (permutation) test for the click-vs-purchase mean
    gap: 32 deterministic pseudo-relabelings of the pooled sample (each
    row joins pseudo-arm A iff the top 32 md5(event_id:replicate) bits
    fall below 2^31 -- the stat_bootstrap_poisson_ci randomness recipe),
    a mean difference per relabeling, and the add-one p-value
    (1 + #extreme)/(1 + B) -- the assumption-free significance readout
    that needs NO variance formula, normal approximation, or rank
    theory: under H0 the labels are exchangeable, full stop. The
    trio's closer: Welch assumes little, Mann-Whitney less, this
    nothing.

    Determinism: arm assignment is a pure integer comparison on md5
    bits; per-replicate sums/counts are exact BIGINTs via conditional
    folds; each replicate's mean difference and the observed difference
    assemble through identical trees, and the extreme-count comparison
    |d_b| >= |d_obs| compares identically-computed doubles.

    Scale shape: the x32 fan-out is map-side against a broadcast spine;
    each replicate folds to four partials in ONE combinable groupBy (the
    bootstrap shape exactly); the extreme count folds over 32 rows."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    base = ev.select(
        "event_id", "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"))
    is1 = F.col("event_type") == "click"
    obs = base.agg(
        F.count(F.when(is1, 1)).cast("bigint").alias("n1"),
        F.sum(F.when(is1, F.col("cents"))).cast("bigint").alias("s1"),
        F.count(F.when(~is1, 1)).cast("bigint").alias("n2"),
        F.sum(F.when(~is1, F.col("cents"))).cast("bigint").alias("s2"))
    groups = spark.range(_PERM_B // 4).toDF("g")
    # one md5 per (row, replicate GROUP); each 128-bit digest yields
    # FOUR independent u32 draws (the stat_bh_fdr_permutation recipe) --
    # a 4x digest-count cut over one-draw-per-md5
    m = F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":"),
                       F.col("g").cast("string")))
    # r11 (the stat_bh_fdr_permutation finding): parse each digest HALF
    # with ONE conv (16 hex chars, toBase -10 = signed 64-bit so the
    # string always casts exactly) and split the two u32 draws with
    # shift/mask bit ops — half the conv calls, identical u32 values
    half = [F.conv(F.substring("m", 1 + 16 * h, 16), 16, -10)
            .cast("bigint").alias(f"h{h}") for h in range(2)]
    u_of = [F.shiftrightunsigned("h0", 32),
            F.col("h0").bitwiseAND(F.lit(4294967295)),
            F.shiftrightunsigned("h1", 32),
            F.col("h1").bitwiseAND(F.lit(4294967295))]
    draws = F.array(*[
        F.struct((F.col("g") * 4 + j).cast("bigint").alias("b"),
                 (u_of[j].cast("bigint") < F.lit(_PERM_HALF)).alias("in_a"))
        for j in range(4)])
    relabeled = (base.crossJoin(F.broadcast(groups))
                 .select("cents", m.alias("m"), "g")
                 .select("cents", "g", *half)
                 .select("cents", F.explode(draws).alias("dr"))
                 .select(F.col("dr.b").alias("b"), "cents",
                         F.col("dr.in_a").alias("in_a")))
    rep_diff = (relabeled.groupBy("b")
                .agg((F.sum(F.when(F.col("in_a"), F.col("cents")))
                      .cast("bigint").cast("double")
                      / F.count(F.when(F.col("in_a"), 1)).cast("double")
                      - F.sum(F.when(~F.col("in_a"), F.col("cents")))
                      .cast("bigint").cast("double")
                      / F.count(F.when(~F.col("in_a"), 1)).cast("double"))
                     .alias("d")))
    d_obs = (F.col("s1").cast("double") / F.col("n1").cast("double")
             - F.col("s2").cast("double") / F.col("n2").cast("double"))
    fold = (rep_diff.crossJoin(F.broadcast(obs))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_reps"),
                 F.count(F.when(F.abs(F.col("d")) >= F.abs(d_obs), 1))
                 .cast("bigint").alias("n_extreme"),
                 F.max("n1").alias("n1"), F.max("s1").alias("s1"),
                 F.max("n2").alias("n2"), F.max("s2").alias("s2")))
    return fold.select(
        F.col("n1").alias("n_click"), F.col("n2").alias("n_purchase"),
        (d_obs / F.lit(100.0)).alias("diff_obs_dollars"),
        "n_reps", "n_extreme",
        ((F.lit(1) + F.col("n_extreme")).cast("double")
         / (F.lit(1) + F.col("n_reps")).cast("double")).alias("p_value"))


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR over per-type permutation p-values (round 6)
# ---------------------------------------------------------------------------

_BH_B = 64
_BH_Q = 0.10
_BH_U32 = 4294967296  # 2^32

_BH_ORACLE = f"""
WITH base AS (
  SELECT event_id, event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
), per AS (
  SELECT event_type AS t, CAST(COUNT(*) AS BIGINT) AS n_t,
         CAST(SUM(cents) AS BIGINT) AS s_t
  FROM base GROUP BY event_type
), tot AS (
  SELECT CAST(SUM(n_t) AS BIGINT) AS n, CAST(SUM(s_t) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM per
), tests AS (
  SELECT per.t, per.n_t, per.s_t, tot.n, tot.s, tot.m,
         CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)
           - CAST(s - s_t AS DOUBLE) / CAST(n - n_t AS DOUBLE) AS d_obs,
         ({_BH_U32} * n_t) // n AS thresh
  FROM per CROSS JOIN tot
), grp AS (
  SELECT CAST(unnest(range({_BH_B // 4})) AS BIGINT) AS g
), digests AS (
  -- one md5 per (row, group); each digest yields FOUR u32 draws
  SELECT base.cents, grp.g,
         md5(concat(CAST(base.event_id AS VARCHAR), ':',
                    CAST(grp.g AS VARCHAR))) AS m
  FROM base CROSS JOIN grp
), js AS (
  SELECT CAST(unnest([0, 1, 2, 3]) AS BIGINT) AS j
), fan AS (
  SELECT tests.t, tests.thresh, digests.g * 4 + js.j AS b, digests.cents,
         CAST(concat('0x', substring(digests.m,
                                     CAST(1 + 8 * js.j AS INTEGER), 8))
              AS BIGINT) AS u
  FROM digests CROSS JOIN js CROSS JOIN tests
), rep_diff AS (
  SELECT t, b,
         CAST(CAST(SUM(cents) FILTER (WHERE u < thresh) AS BIGINT)
              AS DOUBLE)
           / CAST(COUNT(*) FILTER (WHERE u < thresh) AS DOUBLE)
         - CAST(CAST(SUM(cents) FILTER (WHERE u >= thresh) AS BIGINT)
                AS DOUBLE)
           / CAST(COUNT(*) FILTER (WHERE u >= thresh) AS DOUBLE) AS d
  FROM fan GROUP BY t, b
), pvals AS (
  SELECT tests.t, tests.m,
         CAST(1 + COUNT(*) FILTER (WHERE abs(rep_diff.d)
                                   >= abs(tests.d_obs)) AS BIGINT)
           AS p_num
  FROM rep_diff JOIN tests ON rep_diff.t = tests.t
  GROUP BY tests.t, tests.m
), ranked AS (
  SELECT t, m, p_num,
         CAST(p_num AS DOUBLE) / {_BH_B + 1}.0 AS p_value,
         row_number() OVER (ORDER BY p_num, t) AS rk
  FROM pvals
), adj AS (
  SELECT t, p_value, CAST(rk AS BIGINT) AS rank,
         MIN(p_value * CAST(m AS DOUBLE) / CAST(rk AS DOUBLE))
           OVER (ORDER BY rk DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS p_adj
  FROM ranked
)
SELECT t AS event_type, p_value, rank, p_adj,
       p_adj <= {_BH_Q} AS discovery
FROM adj
"""


@register("stat_bh_fdr_permutation", oracle=_BH_ORACLE)
def stat_bh_fdr_permutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over a FAMILY of tests: each event
    type's one-vs-rest mean-value gap gets a deterministic randomization
    p-value (64 md5-bit relabelings per test, Bernoulli(n_t/N) arm
    assignment from an exact integer threshold -- the streaming-friendly
    relabeling, same spirit as the Poisson bootstrap's independent
    weights), then the five p-values are BH-adjusted (suffix-min of
    p*m/rank) and flagged at q = 0.10 -- the multiple-testing discipline
    every metrics platform needs once dashboards run one test per
    segment. Every p-value is an exact multiple of 1/65 (add-one over 64
    replicates); ranks tie-break on event_type; the suffix-min is a
    5-row window.

    Scale shape: the fan-out is rows x 64 replicates x k=5 tests, all
    map-side against two broadcast spines, folding to 320 rows in ONE
    combinable conditional groupBy -- the bootstrap shape with a test
    dimension; everything after runs on <= 320 rows."""
    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        "event_id", "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"))
    per = base.groupBy(F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_t"),
        F.sum("cents").cast("bigint").alias("s_t"))
    tot = per.agg(F.sum("n_t").cast("bigint").alias("n"),
                  F.sum("s_t").cast("bigint").alias("s"),
                  F.count(F.lit(1)).cast("bigint").alias("m"))
    d_obs = (F.col("s_t").cast("double") / F.col("n_t").cast("double")
             - (F.col("s") - F.col("s_t")).cast("double")
             / (F.col("n") - F.col("n_t")).cast("double"))
    # r11: checkpoint the k-row test table — it feeds the threshold
    # literals, the rank spine and the p-value join, so uncheckpointed
    # the events groupBy re-ran for each
    tests = (per.crossJoin(F.broadcast(tot))
             .select("t", "n_t", "m", d_obs.alias("d_obs"),
                     F.floor(F.lit(_BH_U32) * F.col("n_t") / F.col("n"))
                     .cast("bigint").alias("thresh"))
             .localCheckpoint(eager=False))
    # ONE md5 per (row, replicate GROUP): a 128-bit digest carries FOUR
    # independent u32 draws (hex chars 1-8, 9-16, 17-24, 25-32), so
    # replicate b = 4g + j costs a quarter of an md5 -- the md5 fan-out
    # dominates this query (one-draw-per-md5 measured 7.9 s at sf0.1;
    # this shape cuts digest count 4x). The k thresholds then partition
    # the u32 domain into k+1 intervals, so the corpus folds ONCE to
    # (replicate, interval) partials and each test's arm sums are
    # prefix sums over <= 6 rows -- the original draft cross-joined the
    # test dimension BEFORE the fold and recomputed the md5 k times
    # (measured 39 s at sf0.1).
    groups = spark.range(_BH_B // 4).toDF("g")
    m = F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":"),
                       F.col("g").cast("string")))
    # r11 (guide §1.1 measured): conv() dominated this stage — four
    # 8-hex-char parses per digest cost ~2.4 s of the key's 7.5 s at
    # sf0.1. Parse each digest HALF once (16 hex chars -> one bigint;
    # toBase -10 = signed 64-bit so the string always casts exactly,
    # and the two's-complement bits are the same bits) and split it
    # into its two u32 draws with shift/mask bit ops: half the conv
    # calls, identical u32 values.
    half = [F.conv(F.substring("m", 1 + 16 * h, 16), 16, -10)
            .cast("bigint").alias(f"h{h}") for h in range(2)]
    u_of = [F.shiftrightunsigned("h0", 32),
            F.col("h0").bitwiseAND(F.lit(4294967295)),
            F.shiftrightunsigned("h1", 32),
            F.col("h1").bitwiseAND(F.lit(4294967295))]
    draws = F.array(*[
        F.struct((F.col("g") * 4 + j).cast("bigint").alias("b"),
                 u_of[j].cast("bigint").alias("u"))
        for j in range(4)])
    fan0 = (base.crossJoin(F.broadcast(groups))
            .select("cents", m.alias("m"), "g")
            .select("cents", "g", *half)
            .select("cents", F.explode(draws).alias("d"))
            .select(F.col("d.b").alias("b"), "cents",
                    F.col("d.u").alias("u")))
    # r11: the interval index used to be size(filter(ta, th -> u >= th))
    # — an INTERPRETED higher-order lambda per fan row (~1 s at sf0.1).
    # The k thresholds are a bounded driver scalar (one per event type,
    # the query's own output grain), so collect them once off the
    # checkpointed test table and grade each u with a codegen'd literal
    # comparison chain — bit-identical counts, no lambda, no crossJoin.
    ths = sorted(r[0] for r in tests.select("thresh").collect())
    idx = F.lit(0)
    for th in ths:
        idx = idx + F.when(F.col("u") >= F.lit(th), 1).otherwise(0)
    partial = (fan0
               .select("b", "cents", idx.alias("idx"))
               .groupBy("b", "idx")
               .agg(F.sum("cents").cast("bigint").alias("sc"),
                    F.count(F.lit(1)).cast("bigint").alias("nc")))
    # rank of each test's threshold among the sorted thresholds:
    # in_a(test)  <=>  idx < rank  (prefix property, tie-safe)
    tranked = tests.select(
        "t", F.row_number().over(Window.orderBy("thresh", "t"))
        .alias("trk"))
    below = F.col("idx") < F.col("trk")
    rep_diff = (partial.join(F.broadcast(tranked))
                .groupBy("t", "b")
                .agg((F.sum(F.when(below, F.col("sc"))).cast("bigint")
                      .cast("double")
                      / F.sum(F.when(below, F.col("nc"))).cast("bigint")
                      .cast("double")
                      - F.sum(F.when(~below, F.col("sc"))).cast("bigint")
                      .cast("double")
                      / F.sum(F.when(~below, F.col("nc"))).cast("bigint")
                      .cast("double"))
                     .alias("d")))
    pvals = (rep_diff.join(F.broadcast(tests.select("t", "m", "d_obs")),
                           "t")
             .groupBy("t", "m")
             .agg((F.lit(1) + F.count(F.when(
                 F.abs(F.col("d")) >= F.abs(F.col("d_obs")), 1)))
                 .cast("bigint").alias("p_num")))
    ranked = pvals.select(
        "t", "m",
        (F.col("p_num").cast("double") / F.lit(float(_BH_B + 1)))
        .alias("p_value"),
        F.row_number().over(Window.orderBy("p_num", "t")).alias("rk"))
    wsuf = (Window.orderBy(F.col("rk").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    adj = ranked.select(
        "t", "p_value", F.col("rk").cast("bigint").alias("rank"),
        F.min(F.col("p_value") * F.col("m").cast("double")
              / F.col("rk").cast("double")).over(wsuf).alias("p_adj"))
    return adj.select(
        F.col("t").alias("event_type"), "p_value", "rank", "p_adj",
        (F.col("p_adj") <= F.lit(_BH_Q)).alias("discovery"))


# ---------------------------------------------------------------------------
# exact ROC-AUC as the rank statistic (round 6)
# ---------------------------------------------------------------------------

_AUC_ORACLE = """
WITH c AS (
  SELECT event_type = 'purchase' AS pos,
         CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events WHERE event_type IN ('click', 'purchase')
), r AS (
  SELECT pos,
         CAST(2 * rank() OVER (ORDER BY xc)
              + COUNT(*) OVER (PARTITION BY xc) - 1 AS BIGINT) AS r2
  FROM c
), s AS (
  SELECT
    CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS n_pos,
    CAST(COUNT(*) FILTER (WHERE NOT pos) AS BIGINT) AS n_neg,
    CAST(SUM(r2) FILTER (WHERE pos) AS BIGINT) AS sr2
  FROM r
)
SELECT n_pos, n_neg,
       CAST(sr2 - n_pos * (n_pos + 1) AS DOUBLE)
         / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc
FROM s
"""


@register("ml_roc_auc_exact", oracle=_AUC_ORACLE)
def ml_roc_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC of 'event value predicts purchase vs click' -- via
    the identity AUC = U/(n_pos*n_neg): the area under the ROC curve IS
    the Mann-Whitney U statistic normalized, so the doubled-average-rank
    machinery (stat_mann_whitney_u) computes it with NO curve
    construction, no threshold grid, no trapezoid approximation -- and
    ties (heavily present in cent-quantized scores) are handled exactly
    where the naive sort-and-sweep miscounts them. The one float is the
    final division.

    Scale shape: the corpus folds to per-value counts (one combinable
    groupBy); the only global window is domain-sized (100x probe: 12x
    row-level -> 2.0x collapsed) -- AUC at 100 TB without materializing
    a curve OR sorting the rows."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    # domain-collapsed rank sums (the stat_mann_whitney_u rewrite): the
    # row-level global rank window probed 12x for 100x data -- the
    # corpus folds to per-value counts first and the one global window
    # is domain-sized
    dom = (ev.select((F.col("event_type") == "purchase").alias("pos"),
                     xc.alias("xc"))
           .groupBy("xc")
           .agg(F.count(F.lit(1)).cast("bigint").alias("t"),
                F.count(F.when(F.col("pos"), 1)).cast("bigint")
                .alias("p")))
    wcum = (Window.orderBy("xc")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_below = (F.sum("t").over(wcum) - F.col("t")).cast("bigint")
    r = dom.select(
        "t", "p",
        (F.col("p") * (F.lit(2) * cum_below + F.col("t") + 1))
        .cast("bigint").alias("pr2"))
    s = r.agg(
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum(F.col("t") - F.col("p")).cast("bigint").alias("n_neg"),
        F.sum("pr2").cast("bigint").alias("sr2"))
    return s.select(
        "n_pos", "n_neg",
        ((F.col("sr2") - F.col("n_pos") * (F.col("n_pos") + 1))
         .cast("double")
         / (F.lit(2.0) * F.col("n_pos").cast("double")
            * F.col("n_neg").cast("double"))).alias("auc"))


# ---------------------------------------------------------------------------
# confusion-matrix threshold sweep (round 6)
# ---------------------------------------------------------------------------

_SWEEP_ORACLE = """
WITH c AS (
  SELECT event_type = 'purchase' AS pos,
         CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events WHERE event_type IN ('click', 'purchase')
), thresholds AS (
  SELECT CAST(unnest(range(1, 10)) * 5000 AS BIGINT) AS thr
), cells AS (
  SELECT thr,
         CAST(COUNT(*) FILTER (WHERE pos AND xc >= thr) AS BIGINT) AS tp,
         CAST(COUNT(*) FILTER (WHERE NOT pos AND xc >= thr) AS BIGINT)
           AS fp,
         CAST(COUNT(*) FILTER (WHERE NOT pos AND xc < thr) AS BIGINT)
           AS tn,
         CAST(COUNT(*) FILTER (WHERE pos AND xc < thr) AS BIGINT) AS fn
  FROM c CROSS JOIN thresholds
  GROUP BY thr
)
SELECT thr AS threshold_cents, tp, fp, tn, fn,
       CASE WHEN tp + fp = 0 THEN 0.0
            ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END
         AS precision_at,
       CASE WHEN tp + fn = 0 THEN 0.0
            ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END
         AS recall_at,
       CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
            ELSE 2.0 * CAST(tp AS DOUBLE)
                 / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1_at
FROM cells
"""


@register("ml_confusion_threshold_sweep", oracle=_SWEEP_ORACLE)
def ml_confusion_threshold_sweep(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Confusion matrix swept over nine decision thresholds for the same
    value-predicts-purchase classifier ml_roc_auc_exact scores globally
    -- the operating-point table (TP/FP/TN/FN, precision, recall, F1
    per threshold) a deployment actually picks from: AUC says the
    ranking is good, THIS says where to cut it. Counts are exact
    integers from one conditional fold per threshold; P/R/F1 use the
    2tp/(2tp+fp+fn) F1 identity and spell every 0/0 guard as the same
    CASE in both engines.

    Scale shape: the x9 threshold fan-out is map-side against a
    broadcast spine folding to 9 rows in ONE combinable groupBy (the
    bootstrap shape) -- at 100 TB the sweep costs one pass, not nine."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    c = ev.select((F.col("event_type") == "purchase").alias("pos"),
                  xc.alias("xc"))
    thresholds = spark.range(1, 10).select(
        (F.col("id") * 5000).cast("bigint").alias("thr"))
    pred = F.col("xc") >= F.col("thr")
    cells = (c.crossJoin(F.broadcast(thresholds))
             .groupBy("thr")
             .agg(F.count(F.when(F.col("pos") & pred, 1)).cast("bigint")
                  .alias("tp"),
                  F.count(F.when(~F.col("pos") & pred, 1)).cast("bigint")
                  .alias("fp"),
                  F.count(F.when(~F.col("pos") & ~pred, 1)).cast("bigint")
                  .alias("tn"),
                  F.count(F.when(F.col("pos") & ~pred, 1)).cast("bigint")
                  .alias("fn")))
    prec = F.when(F.col("tp") + F.col("fp") == 0, F.lit(0.0)) \
        .otherwise(F.col("tp").cast("double")
                   / (F.col("tp") + F.col("fp")).cast("double"))
    rec = F.when(F.col("tp") + F.col("fn") == 0, F.lit(0.0)) \
        .otherwise(F.col("tp").cast("double")
                   / (F.col("tp") + F.col("fn")).cast("double"))
    f1 = F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") == 0,
                F.lit(0.0)) \
        .otherwise(F.lit(2.0) * F.col("tp").cast("double")
                   / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
                   .cast("double"))
    return cells.select(
        F.col("thr").alias("threshold_cents"), "tp", "fp", "tn", "fn",
        prec.alias("precision_at"), rec.alias("recall_at"),
        f1.alias("f1_at"))


# ---------------------------------------------------------------------------
# K-fold cross-validated AUC (round 6)
# ---------------------------------------------------------------------------

_CV_FOLDS = 4

_CV_AUC_ORACLE = f"""
WITH c AS (
  SELECT event_type = 'purchase' AS pos,
         CAST(concat('0x', substring(md5(CAST(event_id AS VARCHAR)),
                                     1, 8)) AS BIGINT) % {_CV_FOLDS}
           AS fold,
         CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events WHERE event_type IN ('click', 'purchase')
), r AS (
  SELECT pos, fold,
         CAST(2 * rank() OVER (PARTITION BY fold ORDER BY xc)
              + COUNT(*) OVER (PARTITION BY fold, xc) - 1 AS BIGINT)
           AS r2
  FROM c
), s AS (
  SELECT fold,
         CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS n_pos,
         CAST(COUNT(*) FILTER (WHERE NOT pos) AS BIGINT) AS n_neg,
         CAST(SUM(r2) FILTER (WHERE pos) AS BIGINT) AS sr2
  FROM r GROUP BY fold
)
SELECT CAST(fold AS BIGINT) AS fold, n_pos, n_neg,
       CAST(sr2 - n_pos * (n_pos + 1) AS DOUBLE)
         / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
         AS auc_fold
FROM s
"""


@register("ml_cv_auc_per_fold", oracle=_CV_AUC_ORACLE)
def ml_cv_auc_per_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fold ROC-AUC under the same deterministic md5 %4 folds as
    ml_target_encode_kfold -- the cross-validation spread that tells a
    modeler whether ml_roc_auc_exact's single global number is STABLE
    or an artifact of one lucky slice; four rank identities instead of
    four model fits. Fold-local doubled-average ranks (the
    stat_mann_whitney_u machinery PARTITIONED BY fold) keep every sum
    BIGINT; one combinable three-sum fold per fold; the single float is
    each fold's final division.

    Scale shape: the corpus folds to (fold, value) counts; the
    cumulative-count pass runs as the two-pass bucketed cumsum
    partitioned BY FOLD (bucketed.py — 4 folds × 256 value buckets of
    parallelism instead of 4 fold-wide window partitions, the r7
    entity-grain sweep); one combinable groupBy to 4 rows."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    fold = (F.conv(F.substring(F.md5(F.col("event_id").cast("string")),
                               1, 8), 16, 10).cast("bigint") % _CV_FOLDS)
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    # per-fold domain collapse (the ml_roc_auc_exact rewrite): fold the
    # corpus to (fold, value) counts, run the rank arithmetic over the
    # fold-partitioned domain windows
    dom = (ev.select((F.col("event_type") == "purchase").alias("pos"),
                     fold.alias("fold"), xc.alias("xc"))
           .groupBy("fold", "xc")
           .agg(F.count(F.lit(1)).cast("bigint").alias("t"),
                F.count(F.when(F.col("pos"), 1)).cast("bigint")
                .alias("p")))
    cum = bucketed_order(dom, "xc", partition_by=["fold"],
                         cumsum={"cum_t": "t"})
    cum_below = (F.col("cum_t") - F.col("t")).cast("bigint")
    r = cum.select(
        "fold", "t", "p",
        (F.col("p") * (F.lit(2) * cum_below + F.col("t") + 1))
        .cast("bigint").alias("pr2"))
    s = r.groupBy("fold").agg(
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum(F.col("t") - F.col("p")).cast("bigint").alias("n_neg"),
        F.sum("pr2").cast("bigint").alias("sr2"))
    return s.select(
        F.col("fold").cast("bigint").alias("fold"), "n_pos", "n_neg",
        ((F.col("sr2") - F.col("n_pos") * (F.col("n_pos") + 1))
         .cast("double")
         / (F.lit(2.0) * F.col("n_pos").cast("double")
            * F.col("n_neg").cast("double"))).alias("auc_fold"))


# ---------------------------------------------------------------------------
# chi-square goodness-of-fit: day-of-week uniformity (round 6)
# ---------------------------------------------------------------------------

_GOF_ORACLE = """
WITH cells AS (
  SELECT CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS obs
  FROM orders GROUP BY dayofweek(o_orderdate)
), tot AS (
  SELECT CAST(SUM(obs) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM cells
)
SELECT dow, obs,
       CAST(n AS DOUBLE) / CAST(k AS DOUBLE) AS expected,
       (CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) / CAST(k AS DOUBLE))
       * (CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) / CAST(k AS DOUBLE))
       / (CAST(n AS DOUBLE) / CAST(k AS DOUBLE)) AS chi2_contrib
FROM cells CROSS JOIN tot
"""


@register("stat_chi_square_gof_dow", oracle=_GOF_ORACLE)
def stat_chi_square_gof_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square GOODNESS-OF-FIT of order volume against a uniform
    day-of-week distribution -- the one-sample counterpart of
    stat_chi_square_independence's two-way table: is traffic flat across
    the week, or does the calendar drive it? Per-cell
    (O-E)^2/E contributions are emitted per dow, never cross-summed
    (the chi-square house rule -- a cross-cell float sum is
    association-order-dependent); observed counts and the total are
    exact BIGINTs; expected = n/7 and each contribution assemble through
    identical trees. DuckDB's 0-based dayofweek is mirrored by shifting
    Spark's 1-based values.

    Scale shape: one combinable groupBy to 7 cells; the 1-row total
    broadcasts back."""
    o = load_table(spark, "orders", sf_dir)
    cells = (o.groupBy((F.dayofweek("o_orderdate") - 1).cast("bigint")
                       .alias("dow"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("obs")))
    tot = cells.agg(F.sum("obs").cast("bigint").alias("n"),
                    F.count(F.lit(1)).cast("bigint").alias("k"))
    exp = F.col("n").cast("double") / F.col("k").cast("double")
    return (cells.crossJoin(F.broadcast(tot))
            .select("dow", "obs", exp.alias("expected"),
                    ((F.col("obs").cast("double") - exp)
                     * (F.col("obs").cast("double") - exp) / exp)
                    .alias("chi2_contrib")))


# ---------------------------------------------------------------------------
# cumulative gains / lift table (round 6)
# ---------------------------------------------------------------------------

_LIFT_ORACLE = """
WITH c AS (
  SELECT event_type = 'purchase' AS pos,
         CAST(round(value * 100, 0) AS BIGINT) AS xc,
         event_id
  FROM events WHERE event_type IN ('click', 'purchase')
), ranked AS (
  SELECT pos,
         ntile(10) OVER (ORDER BY xc DESC, event_id) AS decile
  FROM c
), cells AS (
  SELECT CAST(decile AS BIGINT) AS decile,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS n_pos
  FROM ranked GROUP BY decile
), cum AS (
  SELECT decile, n, n_pos,
         CAST(SUM(n) OVER w AS BIGINT) AS cum_n,
         CAST(SUM(n_pos) OVER w AS BIGINT) AS cum_pos,
         CAST(SUM(n) OVER () AS BIGINT) AS tot_n,
         CAST(SUM(n_pos) OVER () AS BIGINT) AS tot_pos
  FROM cells
  WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
)
SELECT decile, n, n_pos,
       CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE) AS gains,
       (CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE))
         / (CAST(tot_pos AS DOUBLE) / CAST(tot_n AS DOUBLE)) AS lift
FROM cum
"""


@register("ml_lift_gains_table", oracle=_LIFT_ORACLE)
def ml_lift_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains and lift by score decile for the
    value-predicts-purchase ranking -- the campaign-targeting table
    next to ml_roc_auc_exact (AUC scores the whole ranking; gains/lift
    answers 'mail the top 2 deciles, capture what share?'). Deciles
    come from NTILE over the (score desc, event_id) TOTAL order;
    per-decile and cumulative counts are exact integers; gains and lift
    are two exact divisions per row.

    Scale shape: the decile assignment is the two-pass bucketed rank
    (bucketed.py — arithmetic score buckets, broadcast prefix offsets,
    SQL-standard NTILE formula from the exact global rank), so the raw
    EVENT rows never pass through a single-partition window (the r6
    'No Partition Defined' fix, pinned in test_plans.py); cumulative
    windows then run over the 10 decile cells."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    c = ev.select((F.col("event_type") == "purchase").alias("pos"),
                  xc.alias("xc"), "event_id")
    ranked = bucketed_order(c, "xc", ["event_id"], descending=True,
                            ntile={"decile": 10}).select("pos", "decile")
    cells = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.when(F.col("pos"), 1)).cast("bigint").alias("n_pos"))
    # r11: the 10-row cell table feeds THREE subtrees (x, y, totals), and
    # Catalyst does not share subplans across join branches — without the
    # pin the whole events bucketed-rank lineage ran 3x per query
    cells = cells.localCheckpoint(eager=False)
    # cumulative + totals over the 10 decile cells as a broadcast
    # self-join (y.decile <= x.decile) — even the 10-row windows would
    # be global WindowExecs, and this query's contract is ZERO of them
    x, y = cells.alias("x"), cells.alias("y")
    cum = (x.join(F.broadcast(y), F.col("y.decile") <= F.col("x.decile"))
           .groupBy(F.col("x.decile").alias("decile"))
           .agg(F.max("x.n").cast("bigint").alias("n"),
                F.max("x.n_pos").cast("bigint").alias("n_pos"),
                F.sum("y.n").cast("bigint").alias("cum_n"),
                F.sum("y.n_pos").cast("bigint").alias("cum_pos"))
           .crossJoin(F.broadcast(cells.agg(
               F.sum("n").cast("bigint").alias("tot_n"),
               F.sum("n_pos").cast("bigint").alias("tot_pos")))))
    return cum.select(
        "decile", "n", "n_pos",
        (F.col("cum_pos").cast("double") / F.col("tot_pos").cast("double"))
        .alias("gains"),
        ((F.col("cum_pos").cast("double") / F.col("cum_n").cast("double"))
         / (F.col("tot_pos").cast("double")
            / F.col("tot_n").cast("double"))).alias("lift"))


# ---------------------------------------------------------------------------
# minimum detectable effect / power planning (round 6)
# ---------------------------------------------------------------------------

# two-sided alpha=0.05 and power=0.80 normal quantiles, frozen literals
# (the Poisson-CDF-thresholds discipline: transcendental constants exist
# only as pasted decimals, never computed at query time)
_Z_ALPHA_2 = 1.959963985
_Z_BETA = 0.841621234
# the SUM is itself a frozen literal: computing z_a + z_b at query time
# parses two decimals and adds (engine-side), which can differ by 1 ulp
# from the Python-side sum -- one shared decimal string removes the add
_Z_SUM = 2.801585219

_MDE_ORACLE = f"""
WITH c AS (
  SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS is_wkend,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv
  FROM events
), s AS (
  SELECT
    CAST(SUM(CASE WHEN is_wkend = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN is_wkend = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    CAST(SUM(is_conv) AS BIGINT) AS x,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM c
)
SELECT n1 AS n_weekend, n2 AS n_weekday,
       CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p_base,
       {_Z_SUM}
         * sqrt((CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
         AS mde_abs,
       {_Z_SUM}
         * sqrt((CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
         / (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)) AS mde_rel
FROM s
"""


@register("stat_mde_power_binary", oracle=_MDE_ORACLE)
def stat_mde_power_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect for the weekend-vs-weekday conversion
    comparison at alpha = 0.05 (two-sided), power = 0.80 -- the A/B
    PLANNING readout that belongs BEFORE stat_two_proportion_z's
    verdict: with these arm sizes and this base rate, how small a lift
    could the test even see? MDE = (z_a/2 + z_b) * sqrt(p(1-p)(1/n1 +
    1/n2)); the two normal quantiles are frozen literals (the
    Poisson-threshold discipline -- no inverse CDF at query time), arm
    sizes and the base rate come from one combinable four-sum fold, and
    the absolute + relative MDE assemble through identical trees.

    Scale shape: a single conditional aggregate over the scan -- the
    cheapest possible planning query at any corpus size."""
    ev = load_table(spark, "events", sf_dir)
    is_wkend = F.dayofweek("ts").isin(1, 7)
    is_conv = (F.col("event_type") == "purchase").cast("int")
    s = ev.agg(
        F.count(F.when(is_wkend, 1)).cast("bigint").alias("n1"),
        F.count(F.when(~is_wkend, 1)).cast("bigint").alias("n2"),
        F.sum(is_conv).cast("bigint").alias("x"),
        F.count(F.lit(1)).cast("bigint").alias("n"))
    p = F.col("x").cast("double") / F.col("n").cast("double")
    mde = (F.lit(_Z_SUM)
           * F.sqrt(p * (F.lit(1.0) - p)
                    * (F.lit(1.0) / F.col("n1").cast("double")
                       + F.lit(1.0) / F.col("n2").cast("double"))))
    return s.select(
        F.col("n1").alias("n_weekend"), F.col("n2").alias("n_weekday"),
        p.alias("p_base"), mde.alias("mde_abs"),
        (mde / p).alias("mde_rel"))


# ---------------------------------------------------------------------------
# 2x2 difference-in-differences (round 6)
# ---------------------------------------------------------------------------

_DID_ORACLE = """
WITH c AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
         dayofweek(ts) IN (0, 6) AS treated,
         dayofmonth(ts) > 15 AS post
  FROM events WHERE event_type = 'purchase'
), s AS (
  SELECT
    CAST(SUM(cents) FILTER (WHERE treated AND post) AS BIGINT) AS s_tp,
    CAST(COUNT(*) FILTER (WHERE treated AND post) AS BIGINT) AS n_tp,
    CAST(SUM(cents) FILTER (WHERE treated AND NOT post) AS BIGINT) AS s_t0,
    CAST(COUNT(*) FILTER (WHERE treated AND NOT post) AS BIGINT) AS n_t0,
    CAST(SUM(cents) FILTER (WHERE NOT treated AND post) AS BIGINT) AS s_cp,
    CAST(COUNT(*) FILTER (WHERE NOT treated AND post) AS BIGINT) AS n_cp,
    CAST(SUM(cents) FILTER (WHERE NOT treated AND NOT post) AS BIGINT)
      AS s_c0,
    CAST(COUNT(*) FILTER (WHERE NOT treated AND NOT post) AS BIGINT)
      AS n_c0
  FROM c
)
SELECT n_tp, n_t0, n_cp, n_c0,
       CAST(s_tp AS DOUBLE) / CAST(n_tp AS DOUBLE) / 100.0
         AS mean_treat_post,
       CAST(s_t0 AS DOUBLE) / CAST(n_t0 AS DOUBLE) / 100.0
         AS mean_treat_pre,
       CAST(s_cp AS DOUBLE) / CAST(n_cp AS DOUBLE) / 100.0
         AS mean_ctrl_post,
       CAST(s_c0 AS DOUBLE) / CAST(n_c0 AS DOUBLE) / 100.0
         AS mean_ctrl_pre,
       (CAST(s_tp AS DOUBLE) / CAST(n_tp AS DOUBLE)
        - CAST(s_t0 AS DOUBLE) / CAST(n_t0 AS DOUBLE)
        - (CAST(s_cp AS DOUBLE) / CAST(n_cp AS DOUBLE)
           - CAST(s_c0 AS DOUBLE) / CAST(n_c0 AS DOUBLE))) / 100.0
         AS did_dollars
FROM s
"""


@register("stat_diff_in_diff_2x2", oracle=_DID_ORACLE)
def stat_diff_in_diff_2x2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences, the 2x2 canonical form: weekend
    purchases (treated) vs weekday (control), second half-month (post)
    vs first (pre) -- the causal-inference workhorse that nets out BOTH
    the group's fixed gap and the period's common shock, leaving
    (T_post - T_pre) - (C_post - C_pre) as the effect estimate under
    parallel trends. All four cell means come from ONE conditional
    eight-sum fold over exact cents; the estimator is the standard
    identical tree ending in a single /100 projection to dollars.

    Scale shape: a single combinable conditional aggregate over the
    scan -- the bootstrap-family shape with no spine at all."""
    ev = load_table(spark, "events", sf_dir) \
        .where(F.col("event_type") == "purchase")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    treated = F.dayofweek("ts").isin(1, 7)
    post = F.dayofmonth("ts") > 15
    c = ev.select(cents.alias("cents"), treated.alias("t"),
                  post.alias("p"))
    s = c.agg(
        F.sum(F.when(F.col("t") & F.col("p"), F.col("cents")))
        .cast("bigint").alias("s_tp"),
        F.count(F.when(F.col("t") & F.col("p"), 1)).cast("bigint")
        .alias("n_tp"),
        F.sum(F.when(F.col("t") & ~F.col("p"), F.col("cents")))
        .cast("bigint").alias("s_t0"),
        F.count(F.when(F.col("t") & ~F.col("p"), 1)).cast("bigint")
        .alias("n_t0"),
        F.sum(F.when(~F.col("t") & F.col("p"), F.col("cents")))
        .cast("bigint").alias("s_cp"),
        F.count(F.when(~F.col("t") & F.col("p"), 1)).cast("bigint")
        .alias("n_cp"),
        F.sum(F.when(~F.col("t") & ~F.col("p"), F.col("cents")))
        .cast("bigint").alias("s_c0"),
        F.count(F.when(~F.col("t") & ~F.col("p"), 1)).cast("bigint")
        .alias("n_c0"))
    def m(sc, nc):
        return F.col(sc).cast("double") / F.col(nc).cast("double")
    return s.select(
        "n_tp", "n_t0", "n_cp", "n_c0",
        (m("s_tp", "n_tp") / F.lit(100.0)).alias("mean_treat_post"),
        (m("s_t0", "n_t0") / F.lit(100.0)).alias("mean_treat_pre"),
        (m("s_cp", "n_cp") / F.lit(100.0)).alias("mean_ctrl_post"),
        (m("s_c0", "n_c0") / F.lit(100.0)).alias("mean_ctrl_pre"),
        ((m("s_tp", "n_tp") - m("s_t0", "n_t0")
          - (m("s_cp", "n_cp") - m("s_c0", "n_c0"))) / F.lit(100.0))
        .alias("did_dollars"))


# ---------------------------------------------------------------------------
# Wilson score interval for proportions (round 6)
# ---------------------------------------------------------------------------

_WILSON_ORACLE = f"""
WITH s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
           AS x
  FROM events
), t AS (
  SELECT n, x,
         CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p,
         {_Z_ALPHA_2} * {_Z_ALPHA_2} / CAST(n AS DOUBLE) AS z2n
  FROM s
)
SELECT n, x, p AS p_hat,
       (p + z2n / 2.0
        - {_Z_ALPHA_2} * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
                              + z2n / (4.0 * CAST(n AS DOUBLE))))
         / (1.0 + z2n) AS wilson_lo,
       (p + z2n / 2.0
        + {_Z_ALPHA_2} * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
                              + z2n / (4.0 * CAST(n AS DOUBLE))))
         / (1.0 + z2n) AS wilson_hi
FROM t
"""


@register("stat_proportion_ci_wilson", oracle=_WILSON_ORACLE)
def stat_proportion_ci_wilson(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Wilson score 95% interval for the purchase-conversion rate --
    the proportion CI that stays honest near 0/1 and at small n, where
    the naive Wald interval collapses or escapes [0,1] (why every
    serious A/B platform defaults to Wilson). Two integer counts from
    one fold; the interval assembles through the standard identical
    tree with the z quantile frozen as a literal (the
    stat_mde_power_binary discipline); z^2 appears only as the literal
    times itself, one correctly-rounded multiply in both engines.

    Scale shape: one combinable two-count fold -- nothing else."""
    ev = load_table(spark, "events", sf_dir)
    s = ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("bigint").alias("x"))
    nd = F.col("n").cast("double")
    p = F.col("x").cast("double") / nd
    z = F.lit(_Z_ALPHA_2)
    z2n = z * z / nd
    half = z * F.sqrt(p * (F.lit(1.0) - p) / nd
                      + z2n / (F.lit(4.0) * nd))
    return s.select(
        "n", "x", p.alias("p_hat"),
        ((p + z2n / F.lit(2.0) - half) / (F.lit(1.0) + z2n))
        .alias("wilson_lo"),
        ((p + z2n / F.lit(2.0) + half) / (F.lit(1.0) + z2n))
        .alias("wilson_hi"))


# ---------------------------------------------------------------------------
# Brier score of the rank-calibrated score (round 6)
# ---------------------------------------------------------------------------

_BRIER_ORACLE = """
WITH c AS (
  SELECT event_type = 'purchase' AS pos,
         CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events WHERE event_type IN ('click', 'purchase')
), dom AS (
  SELECT xc, CAST(COUNT(*) AS BIGINT) AS t,
         CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS p
  FROM c GROUP BY xc
), r AS (
  SELECT t, p,
         CAST(2 * (SUM(t) OVER (ORDER BY xc ROWS UNBOUNDED PRECEDING)
                   - t) + t + 1 AS BIGINT) AS r2
  FROM dom
), s AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n, CAST(SUM(p) AS BIGINT) AS x,
         -- Brier*(2N)^2*N in exact HUGEINT: positives contribute
         -- (r2-2N)^2, negatives r2^2, counted per domain value
         SUM(CAST(p AS HUGEINT)
             * (r2 - 2 * (SELECT SUM(t) FROM dom))
             * (r2 - 2 * (SELECT SUM(t) FROM dom))
             + CAST(t - p AS HUGEINT) * r2 * r2) AS ss
  FROM r
)
SELECT n, x,
       CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS base_rate,
       CAST(ss AS DOUBLE)
         / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
            * CAST(n AS DOUBLE)) AS brier
FROM s
"""


@register("ml_brier_score_rank", oracle=_BRIER_ORACLE)
def ml_brier_score_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score of the rank-calibrated classifier p-hat = midrank/N
    (each row's predicted purchase probability is its value's average
    rank position) -- the CALIBRATION metric that completes the ranking
    trio: AUC says the ORDER is right, lift says WHERE to cut, Brier
    says whether the probabilities themselves can be trusted (mean
    squared (p-hat - y)^2). Scaling by (2N)^2 makes every squared
    residual an exact integer -- positives contribute (r2 - 2N)^2,
    negatives r2^2, both per domain VALUE with multiplicity, summed in
    HUGEINT/decimal(38,0) -- so the whole statistic is one wide-integer
    fold over the ~18k-value domain and a single final division.

    Scale shape: the domain-collapse recipe (ml_roc_auc_exact): one
    combinable groupBy to per-value counts, one domain-sized cumulative
    window, one wide-integer fold."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    dom = (ev.select((F.col("event_type") == "purchase").alias("pos"),
                     xc.alias("xc"))
           .groupBy("xc")
           .agg(F.count(F.lit(1)).cast("bigint").alias("t"),
                F.count(F.when(F.col("pos"), 1)).cast("bigint")
                .alias("p")))
    wcum = (Window.orderBy("xc")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wall = Window.partitionBy()
    r = dom.select(
        "t", "p",
        (F.lit(2) * (F.sum("t").over(wcum) - F.col("t"))
         + F.col("t") + 1).cast("bigint").alias("r2"),
        F.sum("t").over(wall).cast("bigint").alias("n_tot"))
    d38 = "decimal(38,0)"
    pos_term = (F.col("p").cast(d38)
                * (F.col("r2") - 2 * F.col("n_tot"))
                * (F.col("r2") - 2 * F.col("n_tot")))
    neg_term = ((F.col("t") - F.col("p")).cast(d38)
                * F.col("r2") * F.col("r2"))
    s = r.agg(
        F.sum("t").cast("bigint").alias("n"),
        F.sum("p").cast("bigint").alias("x"),
        F.sum(pos_term + neg_term).alias("ss"))
    nd = F.col("n").cast("double")
    return s.select(
        "n", "x",
        (F.col("x").cast("double") / nd).alias("base_rate"),
        (F.col("ss").cast("double") / (F.lit(4.0) * nd * nd * nd))
        .alias("brier"))


# ---------------------------------------------------------------------------
# interrupted time series: pre/post slopes + level shift (round 6)
# ---------------------------------------------------------------------------

_ITS_CUT = "2024-01-16 00:00:00"

_ITS_ORACLE = f"""
WITH hourly AS (
  SELECT CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT)
           AS hh,
         date_trunc('hour', ts) < TIMESTAMP '{_ITS_CUT}' AS pre,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
), centered AS (
  -- x centered at the cut hour: the intercept IS the fitted value at
  -- the cut, so no large-magnitude extrapolation ever mixes with the
  -- regression's merge-order noise
  SELECT pre, cents,
         hh - (SELECT CAST(epoch_us(TIMESTAMP '{_ITS_CUT}')
                           // 3600000000 AS BIGINT)) AS xc
  FROM hourly
)
SELECT pre AS is_pre, CAST(COUNT(*) AS BIGINT) AS n,
       round(regr_slope(CAST(cents AS DOUBLE), CAST(xc AS DOUBLE)), 6)
         AS slope_cents_per_hr,
       round(regr_intercept(CAST(cents AS DOUBLE), CAST(xc AS DOUBLE)), 6)
         AS fitted_at_cut_cents
FROM centered GROUP BY pre
"""


@register("stat_interrupted_time_series", oracle=_ITS_ORACLE)
def stat_interrupted_time_series(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Interrupted time series, the segmented-regression form: separate
    least-squares trends for the hourly purchase series BEFORE and
    AFTER a cutover date, each extrapolated to the cut point -- the
    pre/post slope change and the fitted LEVEL SHIFT at the boundary
    are the two numbers an ITS analysis reads (the launch/incident
    readout when no control group exists; stat_diff_in_diff_2x2 is the
    with-control sibling). Trends ride the SQL:2003 regr_* builtins
    over exact integer (CUT-CENTERED hour index, cents) pairs, 6-dp
    rounded (merge-order, the agg_regr_builtins precedent); centering
    makes the intercept BE the fitted value at the cut, so no
    large-magnitude extrapolation amplifies regression noise (the
    uncentered draft failed parity at the 6th decimal).

    Scale shape: calendar-bounded hourly pre-agg; one combinable
    two-group regression fold."""
    ev = load_table(spark, "events", sf_dir) \
        .where(F.col("event_type") == "purchase")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hr = F.date_trunc("hour", "ts")
    hh = F.floor(F.unix_micros(hr.cast("timestamp")) / 3600000000) \
        .cast("bigint")
    cut = F.lit(_ITS_CUT).cast("timestamp")
    hourly = (ev.groupBy(hh.alias("hh"), (hr < cut).alias("pre"))
              .agg(F.sum(cents).cast("bigint").alias("cents")))
    cut_hh = F.floor(F.unix_micros(cut) / 3600000000).cast("bigint")
    centered = hourly.select("pre", "cents",
                             (F.col("hh") - cut_hh).alias("xc"))
    return (centered.groupBy(F.col("pre").alias("is_pre"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.round(F.regr_slope(F.col("cents").cast("double"),
                                      F.col("xc").cast("double")), 6)
                 .alias("slope_cents_per_hr"),
                 F.round(F.regr_intercept(F.col("cents").cast("double"),
                                          F.col("xc").cast("double")), 6)
                 .alias("fitted_at_cut_cents")))


# ---------------------------------------------------------------------------
# learning curve: AUC at deterministic subsample rates (round 6)
# ---------------------------------------------------------------------------

# u32 thresholds for 25% / 50% / 100% md5 subsamples
_LC_RATES = ((25, 1073741824), (50, 2147483648), (100, 4294967296))

_LC_VALUES = ", ".join(f"({p}, {t})" for p, t in _LC_RATES)

_LC_ORACLE = f"""
WITH rates(pct, thresh) AS (VALUES {_LC_VALUES}),
c AS (
  SELECT event_id, event_type = 'purchase' AS pos,
         CAST(round(value * 100, 0) AS BIGINT) AS xc,
         CAST(concat('0x', substring(md5(CAST(event_id AS VARCHAR)
                                         || ':lc'), 1, 8)) AS BIGINT) AS u
  FROM events WHERE event_type IN ('click', 'purchase')
), dom AS (
  SELECT r.pct, c.xc, CAST(COUNT(*) AS BIGINT) AS t,
         CAST(COUNT(*) FILTER (WHERE c.pos) AS BIGINT) AS p
  FROM c JOIN rates r ON c.u < r.thresh
  GROUP BY r.pct, c.xc
), r AS (
  SELECT pct, t, p,
         CAST(2 * (SUM(t) OVER (PARTITION BY pct ORDER BY xc
                                ROWS UNBOUNDED PRECEDING) - t)
              + t + 1 AS BIGINT) AS r2
  FROM dom
), s AS (
  SELECT pct,
         CAST(SUM(p) AS BIGINT) AS n_pos,
         CAST(SUM(t - p) AS BIGINT) AS n_neg,
         CAST(SUM(p * r2) AS BIGINT) AS sr2
  FROM r GROUP BY pct
)
SELECT CAST(pct AS BIGINT) AS sample_pct, n_pos, n_neg,
       CAST(sr2 - n_pos * (n_pos + 1) AS DOUBLE)
         / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc
FROM s
"""


@register("ml_learning_curve_auc", oracle=_LC_ORACLE)
def ml_learning_curve_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning curve for the ranking metric: exact AUC at 25%, 50% and
    100% deterministic md5 subsamples of the two-class data -- the
    does-more-data-still-help readout every scaling decision wants
    BEFORE paying for the next data doubling (a flat curve means the
    metric is saturated; AUC here is data-stable by construction, which
    is exactly what the table demonstrates). Subsampling is the md5
    u32-threshold recipe (bit-identical membership in both engines);
    each rate's AUC rides the domain-collapsed rank identity
    (ml_roc_auc_exact), fanned by a 3-row rate spine BEFORE the domain
    fold, so the whole curve costs one pass plus rate-partitioned
    domain windows.

    Scale shape: x3 spine join (theta on u < thresh -- broadcast
    nested-loop over 3 rows, the sweep discipline); one combinable
    (rate, value) groupBy; rate-partitioned domain windows."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    u = F.conv(F.substring(F.md5(F.concat(
        F.col("event_id").cast("string"), F.lit(":lc"))), 1, 8),
        16, 10).cast("bigint")
    c = ev.select((F.col("event_type") == "purchase").alias("pos"),
                  xc.alias("xc"), u.alias("u"))
    rates = spark.createDataFrame(list(_LC_RATES), "pct long, thresh long")
    dom = (c.join(F.broadcast(rates), F.col("u") < F.col("thresh"))
           .groupBy("pct", "xc")
           .agg(F.count(F.lit(1)).cast("bigint").alias("t"),
                F.count(F.when(F.col("pos"), 1)).cast("bigint")
                .alias("p")))
    wcum = (Window.partitionBy("pct").orderBy("xc")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    r = dom.select(
        "pct", "t", "p",
        (F.lit(2) * (F.sum("t").over(wcum) - F.col("t"))
         + F.col("t") + 1).cast("bigint").alias("r2"))
    s = r.groupBy("pct").agg(
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum(F.col("t") - F.col("p")).cast("bigint").alias("n_neg"),
        F.sum(F.col("p") * F.col("r2")).cast("bigint").alias("sr2"))
    return s.select(
        F.col("pct").cast("bigint").alias("sample_pct"), "n_pos", "n_neg",
        ((F.col("sr2") - F.col("n_pos") * (F.col("n_pos") + 1))
         .cast("double")
         / (F.lit(2.0) * F.col("n_pos").cast("double")
            * F.col("n_neg").cast("double"))).alias("auc"))


# ---------------------------------------------------------------------------
# likelihood-ratio G-test cells (round 6)
# ---------------------------------------------------------------------------

_GTEST_ORACLE = """
WITH cells AS (
  SELECT event_type, CAST(user_id % 3 AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS obs
  FROM events GROUP BY event_type, CAST(user_id % 3 AS BIGINT)
), m AS (
  SELECT event_type, bucket, obs,
         CAST(SUM(obs) OVER (PARTITION BY event_type) AS BIGINT) AS row_n,
         CAST(SUM(obs) OVER (PARTITION BY bucket) AS BIGINT) AS col_n,
         CAST(SUM(obs) OVER () AS BIGINT) AS n
  FROM cells
)
SELECT event_type, bucket, obs,
       2.0 * CAST(obs AS DOUBLE)
         * ln(CAST(obs AS DOUBLE)
              / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
                 / CAST(n AS DOUBLE))) AS g_contrib
FROM m
"""


@register("stat_g_test_cells", oracle=_GTEST_ORACLE)
def stat_g_test_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Likelihood-ratio G-test contributions over the same
    event_type x user-bucket contingency table as the chi-square pair:
    2*O*ln(O/E) per cell -- the test that stays calibrated where
    Pearson's quadratic approximation strains (small expected counts,
    big tables), and what G-test-based feature selection actually
    computes. Per-cell, never cross-summed (the chi-square house rule);
    counts and marginals exact; ln is the one transcendental in an
    otherwise identical tree.

    Scale shape: one combinable groupBy to 15 cells; windows over
    them."""
    ev = load_table(spark, "events", sf_dir)
    cells = (ev.groupBy("event_type",
                        F.pmod(F.col("user_id"), F.lit(3)).cast("bigint")
                        .alias("bucket"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("obs")))
    row_n = F.sum("obs").over(Window.partitionBy("event_type")) \
        .cast("bigint")
    col_n = F.sum("obs").over(Window.partitionBy("bucket")).cast("bigint")
    n = F.sum("obs").over(Window.partitionBy()).cast("bigint")
    m = cells.select("event_type", "bucket", "obs",
                     row_n.alias("row_n"), col_n.alias("col_n"),
                     n.alias("n"))
    exp = (F.col("row_n").cast("double") * F.col("col_n").cast("double")
           / F.col("n").cast("double"))
    return m.select(
        "event_type", "bucket", "obs",
        (F.lit(2.0) * F.col("obs").cast("double")
         * F.log(F.col("obs").cast("double") / exp)).alias("g_contrib"))


# ---------------------------------------------------------------------------
# paired sign test (round 6)
# ---------------------------------------------------------------------------

_SIGN_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY event_type, date_trunc('hour', ts)
), paired AS (
  SELECT a.cents AS x, b.cents AS y
  FROM hourly a JOIN hourly b
    ON a.hr = b.hr AND a.event_type = 'click'
   AND b.event_type = 'purchase'
), s AS (
  SELECT
    CAST(COUNT(*) FILTER (WHERE x > y) AS BIGINT) AS n_plus,
    CAST(COUNT(*) FILTER (WHERE x < y) AS BIGINT) AS n_minus,
    CAST(COUNT(*) FILTER (WHERE x = y) AS BIGINT) AS n_ties
  FROM paired
)
SELECT n_plus, n_minus, n_ties,
       (CAST(n_plus AS DOUBLE)
        - CAST(n_plus + n_minus AS DOUBLE) / 2.0)
       / sqrt(CAST(n_plus + n_minus AS DOUBLE) / 4.0) AS z_stat
FROM s
"""


@register("stat_sign_test_paired", oracle=_SIGN_ORACLE)
def stat_sign_test_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired SIGN test on the hour-matched click/purchase series: does
    one side exceed the other more often than a coin flip? -- the
    PAIRED branch of the test family (Welch/Mann-Whitney compare
    independent samples; pairing on the hour removes the shared
    time-of-day effect entirely), assuming nothing but exchangeability
    of signs. Ties drop (the standard treatment); the normal
    approximation z assembles from three exact integer counts.

    Scale shape: calendar-bounded hourly pre-agg, hour-keyed self-join,
    one three-count fold."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents")))
    x = (hourly.where(F.col("event_type") == "click")
         .select("hr", F.col("cents").alias("x")))
    y = (hourly.where(F.col("event_type") == "purchase")
         .select(F.col("hr").alias("hry"), F.col("cents").alias("y")))
    paired = x.join(y, F.col("hr") == F.col("hry"))
    s = paired.agg(
        F.count(F.when(F.col("x") > F.col("y"), 1)).cast("bigint")
        .alias("n_plus"),
        F.count(F.when(F.col("x") < F.col("y"), 1)).cast("bigint")
        .alias("n_minus"),
        F.count(F.when(F.col("x") == F.col("y"), 1)).cast("bigint")
        .alias("n_ties"))
    nd = (F.col("n_plus") + F.col("n_minus")).cast("double")
    return s.select(
        "n_plus", "n_minus", "n_ties",
        ((F.col("n_plus").cast("double") - nd / F.lit(2.0))
         / F.sqrt(nd / F.lit(4.0))).alias("z_stat"))


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank test (round 6)
# ---------------------------------------------------------------------------

_WSR_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY event_type, date_trunc('hour', ts)
), d AS (
  SELECT a.cents - b.cents AS diff
  FROM hourly a JOIN hourly b
    ON a.hr = b.hr AND a.event_type = 'click'
   AND b.event_type = 'purchase'
  WHERE a.cents <> b.cents
), r AS (
  SELECT diff,
         CAST(2 * rank() OVER (ORDER BY abs(diff))
              + COUNT(*) OVER (PARTITION BY abs(diff)) - 1 AS BIGINT)
           AS r2
  FROM d
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN diff > 0 THEN r2 ELSE 0 END) AS BIGINT)
           AS w_plus_x2
  FROM r
), tie AS (
  -- tie correction sum(t^3 - t) over groups of equal |d| (r6 ADVICE):
  -- exact BIGINT fold, consistent with the tie-corrected MWU/KW siblings
  SELECT CAST(COALESCE(SUM(t * t * t - t), 0) AS BIGINT) AS tie_cube
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM d GROUP BY abs(diff))
)
SELECT n, w_plus_x2,
       (CAST(w_plus_x2 AS DOUBLE) / 2.0
        - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)
       / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
              * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
              - CAST(tie_cube AS DOUBLE) / 48.0) AS z_stat
FROM s CROSS JOIN tie
"""


@register("stat_wilcoxon_signed_rank", oracle=_WSR_ORACLE)
def stat_wilcoxon_signed_rank(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Wilcoxon SIGNED-RANK test on the hour-paired differences: the
    sign test weighted by magnitude rank -- more power when larger
    gaps lean one way, still no normality assumption; the standard
    middle ground between the sign test (signs only) and the paired t
    (full magnitudes). Zero differences drop; |d| ranks ride the
    doubled-average-rank trick (2W+ stays an exact BIGINT under ties);
    the normal z uses mean n(n+1)/4 and the TIE-CORRECTED variance
    n(n+1)(2n+1)/24 - sum(t^3-t)/48 (r6 ADVICE fix -- consistent with
    the tie-corrected stat_mann_whitney_u / stat_kruskal_wallis
    siblings) in an identical tree.

    Scale shape: calendar-bounded pairs; one rank window over the
    ~700-row paired series; one two-sum fold."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents")))
    x = (hourly.where(F.col("event_type") == "click")
         .select("hr", F.col("cents").alias("x")))
    y = (hourly.where(F.col("event_type") == "purchase")
         .select(F.col("hr").alias("hry"), F.col("cents").alias("y")))
    d = (x.join(y, F.col("hr") == F.col("hry"))
         .where(F.col("x") != F.col("y"))
         .select((F.col("x") - F.col("y")).alias("diff"))
         .localCheckpoint(eager=False))  # rank + tie folds share it
    r2 = (F.lit(2) * F.rank().over(Window.orderBy(F.abs("diff")))
          + F.count(F.lit(1)).over(Window.partitionBy(F.abs("diff")))
          - 1).cast("bigint")
    r = d.select("diff", r2.alias("r2"))
    s = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("diff") > 0, F.col("r2")).otherwise(F.lit(0)))
        .cast("bigint").alias("w_plus_x2"))
    tie = (d.groupBy(F.abs("diff").alias("ad"))
           .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
           .agg(F.coalesce(F.sum(F.col("t") * F.col("t") * F.col("t")
                                 - F.col("t")), F.lit(0))
                .cast("bigint").alias("tie_cube")))
    s = s.crossJoin(F.broadcast(tie))
    nd = F.col("n").cast("double")
    mean_w = nd * (nd + F.lit(1.0)) / F.lit(4.0)
    # tie-corrected variance (r6 ADVICE): subtract sum(t^3 - t)/48,
    # matching the tie-corrected Mann-Whitney / Kruskal-Wallis siblings
    var_w = (nd * (nd + F.lit(1.0)) * (F.lit(2.0) * nd + F.lit(1.0))
             / F.lit(24.0)
             - F.col("tie_cube").cast("double") / F.lit(48.0))
    return s.select(
        "n", "w_plus_x2",
        ((F.col("w_plus_x2").cast("double") / F.lit(2.0) - mean_w)
         / F.sqrt(var_w)).alias("z_stat"))


# ---------------------------------------------------------------------------
# Friedman test across event types, hours as blocks (round 6)
# ---------------------------------------------------------------------------

_FRIEDMAN_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hr, event_type,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY date_trunc('hour', ts), event_type
), complete_blocks AS (
  SELECT hr FROM hourly GROUP BY hr HAVING COUNT(*) = 5
), ranked AS (
  SELECT h.hr, h.event_type,
         CAST(2 * rank() OVER (PARTITION BY h.hr ORDER BY h.cents)
              + COUNT(*) OVER (PARTITION BY h.hr, h.cents) - 1
              AS BIGINT) AS r2
  FROM hourly h JOIN complete_blocks b ON h.hr = b.hr
), sums AS (
  SELECT event_type, CAST(SUM(r2) AS BIGINT) AS rs2,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ranked GROUP BY event_type
), fold AS (
  SELECT MAX(n) AS n, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(rs2 * rs2) AS BIGINT) AS sum_rs2_sq
  FROM sums
)
SELECT n AS n_blocks, k AS n_treatments,
       -- doubled ranks: R_j = rs2/2, so sum R_j^2 = sum_rs2_sq/4
       12.0 / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
               * (CAST(k AS DOUBLE) + 1.0))
         * (CAST(sum_rs2_sq AS DOUBLE) / 4.0)
         - 3.0 * CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)
         AS friedman_chi2
FROM fold
"""


@register("stat_friedman_test", oracle=_FRIEDMAN_ORACLE)
def stat_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test: do the five event types differ, ranking WITHIN
    each hour block? -- the k-related-samples generalization of the
    paired tests (each hour is a block, so time-of-day effects cancel
    by construction; ANOVA's parametric assumptions never enter). Only
    COMPLETE blocks (all 5 types present) rank; within-block ranks ride
    the doubled-average-rank trick so every sum is BIGINT; the
    statistic 12/(nk(k+1))*sum R_j^2 - 3n(k+1) assembles through an
    identical tree (doubled-rank sums divide by 4 exactly once).

    Scale shape: calendar-bounded blocks; rank windows partition BY
    BLOCK (5 rows each, perfectly parallel); two combinable folds."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy(F.date_trunc("hour", "ts").alias("hr"),
                         "event_type")
              .agg(F.sum(cents).cast("bigint").alias("cents")))
    complete = (hourly.groupBy("hr")
                .agg(F.count(F.lit(1)).alias("kcnt"))
                .where(F.col("kcnt") == 5).select("hr"))
    h = hourly.join(complete, "hr")
    r2 = (F.lit(2) * F.rank().over(Window.partitionBy("hr")
                                   .orderBy("cents"))
          + F.count(F.lit(1)).over(Window.partitionBy("hr", "cents"))
          - 1).cast("bigint")
    ranked = h.select("event_type", r2.alias("r2"))
    sums = ranked.groupBy("event_type").agg(
        F.sum("r2").cast("bigint").alias("rs2"),
        F.count(F.lit(1)).cast("bigint").alias("n"))
    fold = sums.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("rs2") * F.col("rs2")).cast("bigint")
        .alias("sum_rs2_sq"))
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    return fold.select(
        F.col("n").alias("n_blocks"), F.col("k").alias("n_treatments"),
        (F.lit(12.0) / (nd * kd * (kd + F.lit(1.0)))
         * (F.col("sum_rs2_sq").cast("double") / F.lit(4.0))
         - F.lit(3.0) * nd * (kd + F.lit(1.0))).alias("friedman_chi2"))


# ---------------------------------------------------------------------------
# Kruskal-Wallis H across all five event types (round 6)
# ---------------------------------------------------------------------------

_KW_ORACLE = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events
), dom AS (
  SELECT xc, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM c GROUP BY xc, event_type
), vals AS (
  SELECT xc, CAST(SUM(c) AS BIGINT) AS t FROM dom GROUP BY xc
), r AS (
  SELECT xc, t,
         CAST(2 * (SUM(t) OVER (ORDER BY xc ROWS UNBOUNDED PRECEDING)
                   - t) + t + 1 AS BIGINT) AS r2
  FROM vals
), grp AS (
  SELECT d.event_type,
         CAST(SUM(d.c) AS BIGINT) AS n_j,
         CAST(SUM(d.c * r.r2) AS BIGINT) AS rs2_j
  FROM dom d JOIN r ON d.xc = r.xc
  GROUP BY d.event_type
), ties AS (
  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tt FROM vals
), fold AS (
  SELECT CAST(SUM(n_j) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k,
         -- sum R_j^2/n_j with doubled ranks: (rs2_j/2)^2/n_j, summed in
         -- FIXED event_type order (the ANOVA rule)
         list_sum(list(CAST(rs2_j AS DOUBLE) * CAST(rs2_j AS DOUBLE)
                       / (4.0 * CAST(n_j AS DOUBLE))
                       ORDER BY event_type)) AS srsq
  FROM grp
)
SELECT f.n, f.k,
       round((12.0 / (CAST(f.n AS DOUBLE) * (CAST(f.n AS DOUBLE) + 1.0))
              * f.srsq - 3.0 * (CAST(f.n AS DOUBLE) + 1.0))
             / (1.0 - CAST(ties.tt AS DOUBLE)
                      / (CAST(f.n AS DOUBLE) * CAST(f.n AS DOUBLE)
                         * CAST(f.n AS DOUBLE) - CAST(f.n AS DOUBLE))),
             6) AS kruskal_h
FROM fold f CROSS JOIN ties
"""


@register("stat_kruskal_wallis", oracle=_KW_ORACLE)
def stat_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across all five event types -- the
    nonparametric one-way ANOVA (stat_mann_whitney_u's k-sample
    generalization, stat_anova_oneway_f without the normality
    assumption), tie-corrected. Fully DOMAIN-COLLAPSED: pooled ranks,
    per-group rank sums (sum over values of c_jv * r2_v) and the tie
    term all derive from per-(value, type) counts, so nothing row-sized
    survives the first exchange; the one cross-group float sum
    (sum R_j^2/n_j, doubled ranks dividing by 4 exactly once) folds in
    FIXED type order and H rounds 6 dp (the fold + tie division).

    Scale shape: one combinable (value, type) groupBy; one domain-sized
    cumulative window; two tiny folds."""
    ev = load_table(spark, "events", sf_dir)
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    dom = (ev.select("event_type", xc.alias("xc"))
           .groupBy("xc", "event_type")
           .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    vals = dom.groupBy("xc").agg(F.sum("c").cast("bigint").alias("t"))
    wcum = (Window.orderBy("xc")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    r = vals.select(
        "xc", "t",
        (F.lit(2) * (F.sum("t").over(wcum) - F.col("t"))
         + F.col("t") + 1).cast("bigint").alias("r2"))
    grp = (dom.join(r.select("xc", "r2"), "xc")
           .groupBy("event_type")
           .agg(F.sum("c").cast("bigint").alias("n_j"),
                F.sum(F.col("c") * F.col("r2")).cast("bigint")
                .alias("rs2_j")))
    ties = vals.agg(F.sum(F.col("t") * F.col("t") * F.col("t")
                          - F.col("t")).cast("bigint").alias("tt"))
    term = (F.col("rs2_j").cast("double") * F.col("rs2_j").cast("double")
            / (F.lit(4.0) * F.col("n_j").cast("double")))
    fold = grp.agg(
        F.sum("n_j").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("event_type"),
                                                 term.alias("v")))),
            F.lit(0.0), lambda acc, x: acc + x["v"]).alias("srsq"))
    nd = F.col("n").cast("double")
    h_raw = (F.lit(12.0) / (nd * (nd + F.lit(1.0))) * F.col("srsq")
             - F.lit(3.0) * (nd + F.lit(1.0)))
    corr = (F.lit(1.0) - F.col("tt").cast("double")
            / (nd * nd * nd - nd))
    return (fold.crossJoin(F.broadcast(ties))
            .select("n", "k",
                    F.round(h_raw / corr, 6).alias("kruskal_h")))


# ---------------------------------------------------------------------------
# Mood's median test cells (round 6)
# ---------------------------------------------------------------------------

_MOOD_ORACLE = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events
), dom AS (
  SELECT xc, CAST(COUNT(*) AS BIGINT) AS t FROM c GROUP BY xc
), med AS (
  -- grand DISCRETE median off the value domain (the brown_forsythe
  -- collapse): smallest value whose running count reaches ceil(n/2)
  SELECT MIN(xc) AS gmed FROM (
    SELECT xc,
           SUM(t) OVER (ORDER BY xc ROWS UNBOUNDED PRECEDING) AS cum,
           SUM(t) OVER () AS n
    FROM dom) WHERE cum >= (n + 1) // 2
), cells AS (
  SELECT c.event_type, c.xc > med.gmed AS above,
         CAST(COUNT(*) AS BIGINT) AS obs
  FROM c CROSS JOIN med GROUP BY c.event_type, c.xc > med.gmed
), m AS (
  SELECT event_type, above, obs,
         CAST(SUM(obs) OVER (PARTITION BY event_type) AS BIGINT) AS row_n,
         CAST(SUM(obs) OVER (PARTITION BY above) AS BIGINT) AS col_n,
         CAST(SUM(obs) OVER () AS BIGINT) AS n
  FROM cells
)
SELECT event_type, above, obs,
       (CAST(obs AS DOUBLE)
        - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
          / CAST(n AS DOUBLE))
       * (CAST(obs AS DOUBLE)
          - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
            / CAST(n AS DOUBLE))
       / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
          / CAST(n AS DOUBLE)) AS chi2_contrib
FROM m
"""


@register("stat_mood_median_test", oracle=_MOOD_ORACLE)
def stat_mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test: per-type counts above vs at-or-below the
    GRAND discrete median, with per-cell chi-square contributions --
    the bluntest of the k-sample location tests (only the side of the
    median matters), and therefore the most outlier-proof: the
    robustness extreme of the ladder that runs ANOVA -> Kruskal-Wallis
    -> this. The grand median comes off the value DOMAIN (the
    brown_forsythe collapse); cells and marginals are exact integers;
    contributions stay per-cell (the chi-square house rule).

    Scale shape: one domain fold + domain-sized median window; one
    10-cell groupBy with a broadcast 1-row median."""
    ev = load_table(spark, "events", sf_dir)
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    c = ev.select("event_type", xc.alias("xc"))
    dom = c.groupBy("xc").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    wcum = (Window.orderBy("xc")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wall = Window.partitionBy()
    med = (dom.select("xc",
                      F.sum("t").over(wcum).alias("cum"),
                      F.sum("t").over(wall).alias("n"))
           .where(F.col("cum") >= F.floor((F.col("n") + 1) / 2))
           .agg(F.min("xc").alias("gmed")))
    cells = (c.crossJoin(F.broadcast(med))
             .groupBy("event_type", (F.col("xc") > F.col("gmed"))
                      .alias("above"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("obs")))
    row_n = F.sum("obs").over(Window.partitionBy("event_type")) \
        .cast("bigint")
    col_n = F.sum("obs").over(Window.partitionBy("above")).cast("bigint")
    n = F.sum("obs").over(wall).cast("bigint")
    m = cells.select("event_type", "above", "obs",
                     row_n.alias("row_n"), col_n.alias("col_n"),
                     n.alias("n"))
    exp = (F.col("row_n").cast("double") * F.col("col_n").cast("double")
           / F.col("n").cast("double"))
    return m.select(
        "event_type", "above", "obs",
        ((F.col("obs").cast("double") - exp)
         * (F.col("obs").cast("double") - exp) / exp)
        .alias("chi2_contrib"))


# ---------------------------------------------------------------------------
# Fisher-z confidence interval for the hourly correlation (round 6)
# ---------------------------------------------------------------------------

_FISHER_Z_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY event_type, date_trunc('hour', ts)
), paired AS (
  SELECT a.cents AS x, b.cents AS y
  FROM hourly a JOIN hourly b
    ON a.hr = b.hr AND a.event_type = 'click'
   AND b.event_type = 'purchase'
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM paired
), r AS (
  SELECT n,
         (CAST(CAST(sxy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
          - (CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(CAST(sy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)))
         / sqrt((CAST(CAST(sxx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                    / CAST(n AS DOUBLE))
                   * (CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                      / CAST(n AS DOUBLE)))
                * (CAST(CAST(syy AS VARCHAR) AS DOUBLE)
                   / CAST(n AS DOUBLE)
                   - (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
                      / CAST(n AS DOUBLE))
                     * (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
                        / CAST(n AS DOUBLE)))) AS r
  FROM s
), z AS (
  SELECT n, r,
         0.5 * ln((1.0 + r) / (1.0 - r)) AS zr,
         {_Z_ALPHA_2} / sqrt(CAST(n AS DOUBLE) - 3.0) AS half
  FROM r
)
SELECT n AS n_hours, round(r, 6) AS pearson_r,
       round((exp(2.0 * (zr - half)) - 1.0)
             / (exp(2.0 * (zr - half)) + 1.0), 6) AS ci_lo,
       round((exp(2.0 * (zr + half)) - 1.0)
             / (exp(2.0 * (zr + half)) + 1.0), 6) AS ci_hi
FROM z
"""


@register("stat_fisher_z_corr_ci", oracle=_FISHER_Z_ORACLE)
def stat_fisher_z_corr_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher-z 95% confidence interval for the hourly click/purchase
    Pearson correlation: z = atanh(r) is approximately normal with
    SE = 1/sqrt(n-3), so the CI transforms back through tanh -- the
    INTERVAL the point correlation (ts_rolling_corr, stat_spearman_rho)
    never carries, and the difference between 'r = 0.3' and 'r = 0.3
    +/- 0.4'. Moments ride HUGEINT/decimal(38,0) with the VARCHAR
    correct-rounding hop (the ACF discipline); ln/exp are the
    transcendentals, so r and both bounds round 6 dp; the z quantile is
    the frozen literal.

    Scale shape: calendar-bounded pairs; one combinable five-sum
    fold."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents")))
    x = (hourly.where(F.col("event_type") == "click")
         .select("hr", F.col("cents").alias("x")))
    y = (hourly.where(F.col("event_type") == "purchase")
         .select(F.col("hr").alias("hry"), F.col("cents").alias("y")))
    paired = x.join(y, F.col("hr") == F.col("hry"))
    d38 = "decimal(38,0)"
    s = paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"))

    def hop(col):
        return F.col(col).cast("string").cast("double")

    nd = F.col("n").cast("double")
    ax, ay = hop("sx") / nd, hop("sy") / nd
    axy, axx, ayy = hop("sxy") / nd, hop("sxx") / nd, hop("syy") / nd
    r = (axy - ax * ay) / F.sqrt((axx - ax * ax) * (ayy - ay * ay))
    zr = F.lit(0.5) * F.log((F.lit(1.0) + r) / (F.lit(1.0) - r))
    half = F.lit(_Z_ALPHA_2) / F.sqrt(nd - F.lit(3.0))

    def back(l):
        return ((F.exp(F.lit(2.0) * l) - 1.0)
                / (F.exp(F.lit(2.0) * l) + 1.0))

    return s.select(
        F.col("n").alias("n_hours"),
        F.round(r, 6).alias("pearson_r"),
        F.round(back(zr - half), 6).alias("ci_lo"),
        F.round(back(zr + half), 6).alias("ci_hi"))
