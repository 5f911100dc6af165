"""Round-7 seventh-to-twelfth rings (SURVEY.md §2.19): trend/diagnostic
statistics, changepoint/unit-root detection, MCC/cost operating points,
cross-field/schema/volume data-quality audits, Hurst R/S, seeded
harmonic closeness, synchronous label propagation, chrF, hapax profiles,
Pythagorean means, commit-log checkpointing, Granger causality, local
bridges, path entropy, Welch ANOVA, Cronbach's alpha, cross-language
leakage, turning points, and Fellegi–Sunter linkage scoring.

Families the first (seventh) ring completes:

- Classical stats: Cochran–Armitage trend (ordered-dose proportions, the
  missing leg between the 2×2 z-test and the k-group chi-square),
  Bartlett's variance-homogeneity test (the parametric sibling of
  stat_brown_forsythe), Durbin–Watson serial-correlation diagnostic on
  the hourly OLS residuals (the regression-health check
  stat_ols_two_feature never reports).
- Time series: single-changepoint detection by |CUSUM| argmax in EXACT
  cross-multiplied integers (the localization step after ts_cusum_drift
  says "something moved").
- ML evaluation: Matthews-correlation / Youden-J / balanced-accuracy
  operating points over the same nine-threshold sweep spine as
  ml_confusion_threshold_sweep — the imbalance-robust scores the
  precision/recall table leaves out.
- Data quality: cross-field consistency audit (ship-before-order,
  range rules) — the BETWEEN-COLUMNS leg the DQ family (PK uniqueness,
  referential integrity, freshness) did not yet cover.

House disciplines: exact BIGINT/decimal(38,0) folds everywhere; doubles
only in final expression trees spelled identically in the DuckDB oracle;
ln/sqrt outputs quantized 6 dp after ORDER-FIXED ≤5-term folds (the
stat_anova_oneway_f rule); windows only over calendar-bounded or
value-bounded DOMAINS, never over the raw corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lambdatotheslaughter_spark.determinism import (broadcast_if_bounded,
                                                    estimate_rows)
from lambdatotheslaughter_spark.operators.graph import apply_wedge_degree_cap
from lambdatotheslaughter_spark.registry import register
from lambdatotheslaughter_spark.tables import load_table

# ---------------------------------------------------------------------------
# Cochran–Armitage trend test
# ---------------------------------------------------------------------------

_CA_TREND_ORACLE = """
WITH c AS (
  SELECT CAST(floor(hour(ts) / 6.0) AS BIGINT) AS dose,
         event_type = 'purchase' AS pos
  FROM events WHERE event_type IN ('click', 'purchase')
), g AS (
  SELECT dose, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS r
  FROM c GROUP BY dose
), s AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(r) AS BIGINT) AS rt,
         CAST(SUM(dose * n) AS BIGINT) AS sn,
         CAST(SUM(dose * r) AS BIGINT) AS sr,
         CAST(SUM(dose * dose * n) AS BIGINT) AS sn2
  FROM g
)
SELECT nt AS n_total, rt AS n_success,
       round(CAST(sr AS DOUBLE)
             - (CAST(rt AS DOUBLE) / CAST(nt AS DOUBLE))
               * CAST(sn AS DOUBLE), 6) AS t_stat,
       round((CAST(sr AS DOUBLE)
              - (CAST(rt AS DOUBLE) / CAST(nt AS DOUBLE))
                * CAST(sn AS DOUBLE))
             / sqrt((CAST(rt AS DOUBLE) / CAST(nt AS DOUBLE))
                    * (1.0 - CAST(rt AS DOUBLE) / CAST(nt AS DOUBLE))
                    * (CAST(sn2 AS DOUBLE)
                       - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)
                         / CAST(nt AS DOUBLE))), 6) AS z_trend
FROM s
"""


@register("stat_cochran_armitage_trend", oracle=_CA_TREND_ORACLE)
def stat_cochran_armitage_trend(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Cochran–Armitage test for TREND in proportions across ordered
    groups: is the purchase rate monotonically drifting across the four
    six-hour day blocks (dose scores 0–3)? The missing rung between
    stat_two_proportion_z (two groups) and stat_chi_square_independence
    (unordered k groups): the trend test spends its single degree of
    freedom on the ORDERING, so it sees monotone effects the omnibus
    chi-square dilutes. T = Σsᵢrᵢ − p̄·Σsᵢnᵢ,
    Var = p̄(1−p̄)(Σsᵢ²nᵢ − (Σsᵢnᵢ)²/N), z = T/√Var — every input an
    exact BIGINT fold, the z a single double tree spelled identically in
    the oracle.

    Scale shape: one map-side dose projection, one combinable 4-group
    fold, one 4→1-row sum — no shuffle wider than 4 rows after the
    first fold."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    c = ev.select(
        F.floor(F.hour("ts") / 6.0).cast("bigint").alias("dose"),
        (F.col("event_type") == "purchase").alias("pos"))
    g = (c.groupBy("dose")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
              F.count(F.when(F.col("pos"), 1)).cast("bigint").alias("r")))
    s = g.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("r").cast("bigint").alias("rt"),
        F.sum(F.col("dose") * F.col("n")).cast("bigint").alias("sn"),
        F.sum(F.col("dose") * F.col("r")).cast("bigint").alias("sr"),
        F.sum(F.col("dose") * F.col("dose") * F.col("n"))
        .cast("bigint").alias("sn2"))
    pbar = F.col("rt").cast("double") / F.col("nt").cast("double")
    t_stat = F.col("sr").cast("double") - pbar * F.col("sn").cast("double")
    var = (pbar * (F.lit(1.0) - pbar)
           * (F.col("sn2").cast("double")
              - F.col("sn").cast("double") * F.col("sn").cast("double")
                / F.col("nt").cast("double")))
    return s.select(
        F.col("nt").alias("n_total"),
        F.col("rt").alias("n_success"),
        F.round(t_stat, 6).alias("t_stat"),
        F.round(t_stat / F.sqrt(var), 6).alias("z_trend"))


# ---------------------------------------------------------------------------
# Bartlett's test for homogeneity of variances
# ---------------------------------------------------------------------------

_BARTLETT_ORACLE = """
WITH c AS (
  SELECT event_type AS grp,
         CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events
), g AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xc) AS DECIMAL(38,0)) AS s1,
         CAST(SUM(CAST(xc AS DECIMAL(38,0)) * xc) AS DECIMAL(38,0)) AS s2
  FROM c GROUP BY grp
), v AS (
  SELECT grp, n,
         (CAST(s2 AS DOUBLE)
          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
         / CAST(n - 1 AS DOUBLE) AS var_i
  FROM g
), terms AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST(round((CAST(n - 1 AS DOUBLE)) * var_i
                             * 1000000.0, 0) AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS ssq,
         CAST(SUM(CAST(round((CAST(n - 1 AS DOUBLE)) * ln(var_i)
                             * 1000000.0, 0) AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS snl,
         CAST(SUM(CAST(round(1000000000000.0 / CAST(n - 1 AS DOUBLE), 0)
                       AS BIGINT)) AS BIGINT) AS sinv
  FROM v
)
SELECT k, nt AS n_total,
       round(CAST(ssq AS DOUBLE) / 1000000.0 / CAST(nt - k AS DOUBLE), 6)
         AS pooled_var,
       round(1.0 + (CAST(sinv AS DOUBLE) / 1000000000000.0
                    - 1.0 / CAST(nt - k AS DOUBLE))
                   / (3.0 * CAST(k - 1 AS DOUBLE)), 6) AS correction_c,
       round((CAST(nt - k AS DOUBLE)
              * ln(CAST(ssq AS DOUBLE) / 1000000.0 / CAST(nt - k AS DOUBLE))
              - CAST(snl AS DOUBLE) / 1000000.0)
             / (1.0 + (CAST(sinv AS DOUBLE) / 1000000000000.0
                       - 1.0 / CAST(nt - k AS DOUBLE))
                      / (3.0 * CAST(k - 1 AS DOUBLE))), 6)
         AS bartlett_chi2
FROM terms
"""


@register("stat_bartlett_test", oracle=_BARTLETT_ORACLE)
def stat_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test of variance homogeneity across the five event
    types — the PARAMETRIC sibling of stat_brown_forsythe (more powerful
    under normality, famously fragile without it; reading both is the
    textbook practice). χ² = [(N−k)·ln(Sp²) − Σ(nᵢ−1)ln(Sᵢ²)]/C with the
    Bartlett small-sample correction C. Per-group variances come off
    exact decimal(38,0) moment folds; the (nᵢ−1)·Sᵢ², (nᵢ−1)·ln(Sᵢ²)
    and 1/(nᵢ−1) cross-group sums are each quantized to fixed-point
    integers per group BEFORE summing (k=5 terms), so every fold is
    associative and partition-order-free.

    Scale shape: one combinable 5-group moment fold, one 5→1-row
    integer fold; the corpus is read once."""
    ev = load_table(spark, "events", sf_dir)
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    g = (ev.select(F.col("event_type").alias("grp"), xc.alias("xc"))
         .groupBy("grp")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
              F.sum("xc").cast("decimal(38,0)").alias("s1"),
              F.sum(F.col("xc").cast("decimal(38,0)") * F.col("xc"))
              .cast("decimal(38,0)").alias("s2")))
    var_i = ((F.col("s2").cast("double")
              - F.col("s1").cast("double") * F.col("s1").cast("double")
                / F.col("n").cast("double"))
             / (F.col("n") - 1).cast("double"))
    v = g.select("grp", "n", var_i.alias("var_i"))
    terms = v.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.round((F.col("n") - 1).cast("double") * F.col("var_i")
                      * 1000000.0, 0).cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("ssq"),
        F.sum(F.round((F.col("n") - 1).cast("double") * F.log("var_i")
                      * 1000000.0, 0).cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("snl"),
        F.sum(F.round(F.lit(1000000000000.0)
                      / (F.col("n") - 1).cast("double"), 0).cast("bigint"))
        .cast("bigint").alias("sinv"))
    nmk = (F.col("nt") - F.col("k")).cast("double")
    pooled = F.col("ssq").cast("double") / 1000000.0 / nmk
    corr = (F.lit(1.0)
            + (F.col("sinv").cast("double") / 1000000000000.0
               - F.lit(1.0) / nmk)
              / (3.0 * (F.col("k") - 1).cast("double")))
    chi2 = (nmk * F.log(pooled)
            - F.col("snl").cast("double") / 1000000.0) / corr
    return terms.select(
        "k", F.col("nt").alias("n_total"),
        F.round(pooled, 6).alias("pooled_var"),
        F.round(corr, 6).alias("correction_c"),
        F.round(chi2, 6).alias("bartlett_chi2"))


# ---------------------------------------------------------------------------
# Durbin–Watson serial-correlation diagnostic
# ---------------------------------------------------------------------------

_DW_ORACLE = """
WITH h AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) AS eh,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
), x AS (
  SELECT eh - (SELECT MIN(eh) FROM h) AS x, y FROM h
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM x
), co AS (
  SELECT n,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
         CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
         - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
           * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS a
  FROM s
), e AS (
  SELECT x.x,
         CAST(round((CAST(y AS DOUBLE) - co.a - co.b * CAST(x.x AS DOUBLE))
                    * 1000000.0, 0) AS BIGINT) AS eq
  FROM x CROSS JOIN co
), d AS (
  SELECT eq, eq - lag(eq) OVER (ORDER BY x) AS de FROM e
)
SELECT (SELECT n FROM co) AS n_hours,
       (SELECT round(b, 6) FROM co) AS slope,
       (SELECT round(a, 6) FROM co) AS intercept,
       round(CAST(SUM(CAST(de AS DECIMAL(38,0)) * de) AS DOUBLE)
             / CAST(SUM(CAST(eq AS DECIMAL(38,0)) * eq) AS DOUBLE), 6)
         AS dw_stat
FROM d
"""


@register("stat_durbin_watson", oracle=_DW_ORACLE)
def stat_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson serial-correlation diagnostic on the residuals of
    the hourly-purchase-cents-vs-time OLS — the regression-health check
    the OLS family (stat_ols_two_feature, ts_trend_slope) never
    reports: DW ≈ 2 means independent residuals, → 0 positive
    autocorrelation (the usual time-series failure), → 4 negative.
    DW = Σ(eₜ−eₜ₋₁)²/Σeₜ². Slope/intercept come off exact BIGINT sums;
    each residual is ONE identical double tree quantized to 1e-6-unit
    integers, so both quadratic sums are exact decimal(38,0) folds and
    the statistic is partition-order-free.

    Scale shape: calendar-bounded hourly fold (≤8,784 rows/year
    regardless of corpus size); broadcast 1-row coefficients; one lag
    window over the bounded DOMAIN; one integer fold to a single row."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type") == "purchase"))
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    h = (ev.select(
            (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600)
            .cast("bigint").alias("eh"),
            cents.alias("c"))
         .groupBy("eh")
         .agg(F.sum("c").cast("bigint").alias("y")))
    mn = h.agg(F.min("eh").alias("m"))
    x = (h.crossJoin(F.broadcast(mn))
         .select((F.col("eh") - F.col("m")).alias("x"), "y"))
    s = x.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
              F.sum("x").cast("bigint").alias("sx"),
              F.sum("y").cast("bigint").alias("sy"),
              F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
              F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"))
    nd = F.col("n").cast("double")
    b = ((nd * F.col("sxy").cast("double")
          - F.col("sx").cast("double") * F.col("sy").cast("double"))
         / (nd * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")))
    a = F.col("sy").cast("double") / nd - b * F.col("sx").cast("double") / nd
    co = s.select("n", b.alias("b"), a.alias("a"))
    e = (x.crossJoin(F.broadcast(co))
         .select("x", "n", "a", "b",
                 F.round((F.col("y").cast("double") - F.col("a")
                          - F.col("b") * F.col("x").cast("double"))
                         * 1000000.0, 0).cast("bigint").alias("eq")))
    w = Window.orderBy("x")
    d = e.select("n", "a", "b", "eq",
                 (F.col("eq") - F.lag("eq").over(w)).alias("de"))
    return (d.groupBy("n", "a", "b")
            .agg(F.sum(F.col("de").cast("decimal(38,0)") * F.col("de"))
                 .alias("num"),
                 F.sum(F.col("eq").cast("decimal(38,0)") * F.col("eq"))
                 .alias("den"))
            .select(F.col("n").alias("n_hours"),
                    F.round(F.col("b"), 6).alias("slope"),
                    F.round(F.col("a"), 6).alias("intercept"),
                    F.round(F.col("num").cast("double")
                            / F.col("den").cast("double"), 6)
                    .alias("dw_stat")))


# ---------------------------------------------------------------------------
# single-changepoint localization by |CUSUM| argmax
# ---------------------------------------------------------------------------

_CUSUM_ARGMAX_ORACLE = """
WITH d AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
), t AS (
  SELECT day, y,
         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t_idx,
         CAST(SUM(y) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cy
  FROM d
), g AS (
  SELECT t.*, (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n,
         (SELECT CAST(SUM(y) AS BIGINT) FROM d) AS sy
  FROM t
), s AS (
  SELECT day, t_idx, n,
         abs(n * cy - t_idx * sy) AS cusum_abs,
         CAST(cy AS DOUBLE) / CAST(t_idx AS DOUBLE) / 100.0 AS mb,
         CASE WHEN t_idx = n THEN NULL
              ELSE CAST(sy - cy AS DOUBLE)
                   / CAST(n - t_idx AS DOUBLE) / 100.0 END AS ma
  FROM g
)
SELECT day AS change_day, t_idx, n AS n_days, cusum_abs,
       round(mb, 6) AS mean_before, round(ma, 6) AS mean_after
FROM s
ORDER BY cusum_abs DESC, day
LIMIT 1
"""


@register("ts_changepoint_cusum_argmax", oracle=_CUSUM_ARGMAX_ORACLE)
def ts_changepoint_cusum_argmax(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Single-changepoint LOCALIZATION on daily purchase revenue: the
    day t maximizing |CUSUM_t| (binary-segmentation's first split) —
    the where-did-it-move answer after ts_cusum_drift's something-moved
    alarm. The statistic is kept in EXACT cross-multiplied integers:
    |n·Σ_{≤t}y − t·Σy| (BIGINT; ≤ 366·corpus-cents, overflow-safe),
    so the argmax is bit-deterministic with the earliest-day
    tie-break, and the before/after means are single double trees.

    Scale shape: calendar-bounded daily fold (≤366 rows/year at ANY
    corpus size); one cumulative window over the bounded domain; a
    broadcast 1-row total; argmax fuses to TakeOrderedAndProject."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type") == "purchase"))
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    d = (ev.select(F.date_trunc("day", F.col("ts")).alias("day"),
                   cents.alias("c"))
         .groupBy("day")
         .agg(F.sum("c").cast("bigint").alias("y")))
    w = (Window.orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    t = d.select("day", "y",
                 F.row_number().over(Window.orderBy("day"))
                 .cast("bigint").alias("t_idx"),
                 F.sum("y").over(w).cast("bigint").alias("cy"))
    tot = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("y").cast("bigint").alias("sy"))
    g = t.crossJoin(F.broadcast(tot))
    mb = F.col("cy").cast("double") / F.col("t_idx").cast("double") / 100.0
    ma = F.when(F.col("t_idx") == F.col("n"), F.lit(None).cast("double")) \
          .otherwise((F.col("sy") - F.col("cy")).cast("double")
                     / (F.col("n") - F.col("t_idx")).cast("double") / 100.0)
    s = g.select(
        F.col("day").alias("change_day"), "t_idx",
        F.col("n").alias("n_days"),
        F.abs(F.col("n") * F.col("cy") - F.col("t_idx") * F.col("sy"))
        .alias("cusum_abs"),
        F.round(mb, 6).alias("mean_before"),
        F.round(ma, 6).alias("mean_after"))
    return s.orderBy(F.col("cusum_abs").desc(), "change_day").limit(1)


# ---------------------------------------------------------------------------
# MCC / Youden-J / balanced-accuracy threshold sweep
# ---------------------------------------------------------------------------

_MCC_SWEEP_ORACLE = """
WITH c AS (
  SELECT event_type = 'purchase' AS pos,
         CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events WHERE event_type IN ('click', 'purchase')
), thr AS (
  SELECT CAST(r * 5000 AS BIGINT) AS thr FROM range(1, 10) AS t(r)
), cells AS (
  SELECT thr,
         CAST(COUNT(*) FILTER (WHERE pos AND xc >= thr) AS BIGINT) AS tp,
         CAST(COUNT(*) FILTER (WHERE NOT pos AND xc >= thr) AS BIGINT) AS fp,
         CAST(COUNT(*) FILTER (WHERE NOT pos AND xc < thr) AS BIGINT) AS tn,
         CAST(COUNT(*) FILTER (WHERE pos AND xc < thr) AS BIGINT) AS fn
  FROM c CROSS JOIN thr GROUP BY thr
)
SELECT thr, tp, fp, tn, fn,
       CASE WHEN (tp+fp) = 0 OR (tp+fn) = 0 OR (tn+fp) = 0 OR (tn+fn) = 0
            THEN 0.0
            ELSE round((CAST(CAST(tp AS DECIMAL(38,0)) * tn
                             - CAST(fp AS DECIMAL(38,0)) * fn AS DOUBLE))
                       / (sqrt(CAST(tp+fp AS DOUBLE))
                          * sqrt(CAST(tp+fn AS DOUBLE))
                          * sqrt(CAST(tn+fp AS DOUBLE))
                          * sqrt(CAST(tn+fn AS DOUBLE))), 6) END AS mcc,
       round(CAST(tp AS DOUBLE) / CAST(tp+fn AS DOUBLE)
             + CAST(tn AS DOUBLE) / CAST(tn+fp AS DOUBLE) - 1.0, 6)
         AS youden_j,
       round((CAST(tp AS DOUBLE) / CAST(tp+fn AS DOUBLE)
              + CAST(tn AS DOUBLE) / CAST(tn+fp AS DOUBLE)) / 2.0, 6)
         AS balanced_acc
FROM cells
ORDER BY thr
"""


@register("ml_mcc_threshold_sweep", oracle=_MCC_SWEEP_ORACLE)
def ml_mcc_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation, Youden's J and balanced accuracy swept over
    the same nine decision thresholds as ml_confusion_threshold_sweep —
    the IMBALANCE-ROBUST operating-point scores that table leaves out
    (precision/recall/F1 all ignore the true-negative cell; MCC is the
    one single-number score using all four). Counts are exact integers
    from ONE conditional fold; the MCC numerator is a decimal(38,0)
    product difference (tp·tn can exceed int64 at corpus scale), the
    denominator a product of four single sqrts so nothing overflows
    double range; 0-margin guards are the same CASE in both engines.

    Scale shape: map-side ×9 broadcast-spine fan-out folding to 9 rows
    in ONE combinable groupBy — one corpus pass for the whole sweep."""
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
    tp, fp, tn, fn = (F.col(x) for x in ("tp", "fp", "tn", "fn"))
    zero = ((tp + fp == 0) | (tp + fn == 0) | (tn + fp == 0)
            | (tn + fn == 0))
    mcc = F.when(zero, F.lit(0.0)).otherwise(
        F.round((tp.cast("decimal(38,0)") * tn
                 - fp.cast("decimal(38,0)") * fn).cast("double")
                / (F.sqrt((tp + fp).cast("double"))
                   * F.sqrt((tp + fn).cast("double"))
                   * F.sqrt((tn + fp).cast("double"))
                   * F.sqrt((tn + fn).cast("double"))), 6))
    sens = tp.cast("double") / (tp + fn).cast("double")
    spec = tn.cast("double") / (tn + fp).cast("double")
    return (cells.select(
        "thr", "tp", "fp", "tn", "fn",
        mcc.alias("mcc"),
        F.round(sens + spec - 1.0, 6).alias("youden_j"),
        F.round((sens + spec) / 2.0, 6).alias("balanced_acc"))
        .orderBy("thr"))


# ---------------------------------------------------------------------------
# cross-field consistency audit
# ---------------------------------------------------------------------------

_XFIELD_ORACLE = """
WITH r1 AS (
  SELECT 'lineitem_ship_before_order' AS rule,
         CAST(COUNT(*) AS BIGINT) AS n_checked,
         CAST(COUNT(*) FILTER (WHERE l.l_shipdate < o.o_orderdate)
              AS BIGINT) AS n_violations
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), r2 AS (
  SELECT 'lineitem_discount_gt_8pct' AS rule,
         CAST(COUNT(*) AS BIGINT) AS n_checked,
         CAST(COUNT(*) FILTER (WHERE CAST(round(l_discount * 100, 0)
                                          AS BIGINT) > 8)
              AS BIGINT) AS n_violations
  FROM lineitem
), r3 AS (
  SELECT 'lineitem_nonpositive_quantity' AS rule,
         CAST(COUNT(*) AS BIGINT) AS n_checked,
         CAST(COUNT(*) FILTER (WHERE l_quantity <= 0) AS BIGINT)
           AS n_violations
  FROM lineitem
), r4 AS (
  SELECT 'events_nonpositive_value' AS rule,
         CAST(COUNT(*) AS BIGINT) AS n_checked,
         CAST(COUNT(*) FILTER (WHERE value <= 0) AS BIGINT) AS n_violations
  FROM events
), r5 AS (
  SELECT 'orders_totalprice_nonpositive' AS rule,
         CAST(COUNT(*) AS BIGINT) AS n_checked,
         CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
           AS n_violations
  FROM orders
), u AS (
  SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
  UNION ALL SELECT * FROM r4 UNION ALL SELECT * FROM r5
)
SELECT rule, n_checked, n_violations,
       round(CAST(n_violations AS DOUBLE) / CAST(n_checked AS DOUBLE), 6)
         AS violation_rate
FROM u ORDER BY rule
"""


@register("dq_cross_field_consistency", oracle=_XFIELD_ORACLE)
def dq_cross_field_consistency(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Cross-field consistency audit — the BETWEEN-COLUMNS leg the DQ
    family (PK uniqueness, referential integrity, freshness lag) did
    not cover: five business rules spanning within-row range checks and
    one cross-TABLE ordering rule (ship date must not precede its
    order's date — genuinely violated in this dataset, so the detector
    demonstrably fires), each reported as checked/violations/rate.
    All counts are exact conditional folds.

    Scale shape: each rule is one combinable conditional fold over its
    table (three table scans total — lineitem rules share one pass);
    the cross-table rule is a fact-to-fact equi-join on the join key
    both sides are naturally clustered by; the report is a 5-row
    union."""
    li = load_table(spark, "lineitem", sf_dir)
    od = load_table(spark, "orders", sf_dir)
    ev = load_table(spark, "events", sf_dir)

    j = li.select("l_orderkey", "l_shipdate").join(
        od.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == od["o_orderkey"])
    r1 = j.agg(
        F.lit("lineitem_ship_before_order").alias("rule"),
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        F.count(F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1))
        .cast("bigint").alias("n_violations"))
    li_fold = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.when(F.round(F.col("l_discount") * 100, 0)
                       .cast("bigint") > 8, 1)).cast("bigint").alias("v2"),
        F.count(F.when(F.col("l_quantity") <= 0, 1))
        .cast("bigint").alias("v3"))
    r2 = li_fold.select(F.lit("lineitem_discount_gt_8pct").alias("rule"),
                        F.col("n").alias("n_checked"),
                        F.col("v2").alias("n_violations"))
    r3 = li_fold.select(
        F.lit("lineitem_nonpositive_quantity").alias("rule"),
        F.col("n").alias("n_checked"), F.col("v3").alias("n_violations"))
    r4 = ev.agg(
        F.lit("events_nonpositive_value").alias("rule"),
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        F.count(F.when(F.col("value") <= 0, 1)).cast("bigint")
        .alias("n_violations"))
    r5 = od.agg(
        F.lit("orders_totalprice_nonpositive").alias("rule"),
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).cast("bigint")
        .alias("n_violations"))
    u = r1.unionAll(r2).unionAll(r3).unionAll(r4).unionAll(r5)
    return (u.select("rule", "n_checked", "n_violations",
                     F.round(F.col("n_violations").cast("double")
                             / F.col("n_checked").cast("double"), 6)
                     .alias("violation_rate"))
            .orderBy("rule"))


# ---------------------------------------------------------------------------
# inter-purchase time quantiles
# ---------------------------------------------------------------------------

_INTERPURCHASE_ORACLE = """
WITH p AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events WHERE event_type = 'purchase'
), g AS (
  SELECT CAST(datediff('day', date_trunc('day', prev),
                       date_trunc('day', ts)) AS BIGINT) AS gap
  FROM p WHERE prev IS NOT NULL
), dom AS (
  SELECT gap, CAST(COUNT(*) AS BIGINT) AS c FROM g GROUP BY gap
), cum AS (
  SELECT gap, c,
         CAST(SUM(c) OVER (ORDER BY gap ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cc,
         (SELECT CAST(SUM(c) AS BIGINT) FROM dom) AS n,
         (SELECT CAST(SUM(gap * c) AS BIGINT) FROM dom) AS sg
  FROM dom
)
SELECT MAX(n) AS n_gaps,
       CAST(MIN(gap) FILTER (WHERE cc >= (1 * n + 3) // 4) AS BIGINT)
         AS p25_days,
       CAST(MIN(gap) FILTER (WHERE cc >= (1 * n + 1) // 2) AS BIGINT)
         AS p50_days,
       CAST(MIN(gap) FILTER (WHERE cc >= (3 * n + 3) // 4) AS BIGINT)
         AS p75_days,
       CAST(MIN(gap) FILTER (WHERE cc >= (9 * n + 9) // 10) AS BIGINT)
         AS p90_days,
       round(CAST(MAX(sg) AS DOUBLE) / CAST(MAX(n) AS DOUBLE), 6)
         AS mean_days
FROM cum
"""


@register("seq_interpurchase_quantiles", oracle=_INTERPURCHASE_ORACLE)
def seq_interpurchase_quantiles(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Distribution of the time BETWEEN a user's consecutive purchases
    (whole calendar days): exact discrete p25/p50/p75/p90 and the mean —
    the repeat-purchase-cadence distribution behind seq_reorder_cadence's
    per-entity view, and the number a retention model calibrates
    against. Gaps are exact integer day differences off a user-ordered
    lag; the percentiles are rank-picks over the BOUNDED gap DOMAIN
    (0…365 distinct values at any corpus size), so no global row
    ranking ever happens: cumulate domain counts, pick the first value
    whose cumulative count reaches ceil(p·n) by pure integer
    arithmetic (the agg_percentile_disc_exact ceil identity).

    Scale shape: one user-partitioned lag window (key-parallel), one
    combinable domain collapse, one cumulative window over the ≤366-row
    domain, one conditional-MIN fold to a single row."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type") == "purchase"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select("user_id", "ts", F.lag("ts").over(w).alias("prev"))
    g = (p.where(F.col("prev").isNotNull())
         .select(F.datediff(F.date_trunc("day", F.col("ts")),
                            F.date_trunc("day", F.col("prev")))
                 .cast("bigint").alias("gap")))
    dom = g.groupBy("gap").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = dom.agg(F.sum("c").cast("bigint").alias("n"),
                  F.sum(F.col("gap") * F.col("c")).cast("bigint")
                  .alias("sg"))
    wd = (Window.orderBy("gap")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (dom.select("gap", "c",
                      F.sum("c").over(wd).cast("bigint").alias("cc"))
           .crossJoin(F.broadcast(tot)))

    def pick(num: int, den: int, name: str):
        thresh = F.expr(f"({num} * n + {num}) div {den}")
        return (F.min(F.when(F.col("cc") >= thresh, F.col("gap")))
                .cast("bigint").alias(name))

    return cum.agg(
        F.max("n").alias("n_gaps"),
        pick(1, 4, "p25_days"), pick(1, 2, "p50_days"),
        pick(3, 4, "p75_days"), pick(9, 10, "p90_days"),
        F.round(F.max("sg").cast("double") / F.max("n").cast("double"), 6)
        .alias("mean_days"))


# ---------------------------------------------------------------------------
# Hurst exponent by rescaled-range (R/S) analysis
# ---------------------------------------------------------------------------

# frozen centered ln(w) regressors for the 3-point log-log fit:
# cx_i = ln(w_i) - mean(ln(w)), sxx = sum(cx_i^2). H = sum(cx_i * y_i)/sxx
# with y_i = ln(RS_mean(w_i)) -- the transcendental regressors are
# literals, so the fit is a fixed 3-term tree in both engines.
_HURST_CX30 = -0.693147180559945
_HURST_CX60 = 0.0
_HURST_CX120 = 0.6931471805599454
_HURST_SXX = 0.9609060278364026

_HURST_ORACLE = f"""
WITH d AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
), t AS (
  SELECT y, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t_idx,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n
  FROM d
), sizes AS (
  SELECT CAST(unnest([30, 60, 120]) AS BIGINT) AS w
), blk AS (
  SELECT w, (t_idx - 1) // w AS block, (t_idx - 1) % w AS pos, y, n
  FROM t CROSS JOIN sizes
  WHERE t_idx <= (n // w) * w
), cum AS (
  SELECT w, block, pos, y,
         CAST(SUM(y) OVER (PARTITION BY w, block ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cy,
         CAST(SUM(y) OVER (PARTITION BY w, block) AS BIGINT) AS s1,
         CAST(SUM(CAST(y AS DECIMAL(38,0)) * y)
              OVER (PARTITION BY w, block) AS DECIMAL(38,0)) AS s2
  FROM blk
), dev AS (
  SELECT w, block, s1, s2,
         w * cy - (pos + 1) * s1 AS dv
  FROM cum
), per_block AS (
  SELECT w, block,
         CAST(round((CAST(MAX(dv) - MIN(dv) AS DOUBLE)
                     / (CAST(MAX(w) AS DOUBLE)
                        * sqrt((CAST(MAX(s2) AS DOUBLE)
                                - CAST(MAX(s1) AS DOUBLE)
                                  * CAST(MAX(s1) AS DOUBLE)
                                  / CAST(MAX(w) AS DOUBLE))
                               / CAST(MAX(w) AS DOUBLE))))
                    * 1000000.0, 0) AS BIGINT) AS rs_q
  FROM dev GROUP BY w, block
), per_w AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         round(CAST(SUM(rs_q) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 6) AS rs_mean
  FROM per_block GROUP BY w
)
SELECT (SELECT MAX(n) FROM t) AS n_days,
       MAX(CASE WHEN w = 30 THEN rs_mean END) AS rs_w30,
       MAX(CASE WHEN w = 60 THEN rs_mean END) AS rs_w60,
       MAX(CASE WHEN w = 120 THEN rs_mean END) AS rs_w120,
       round(({_HURST_CX30!r} * ln(MAX(CASE WHEN w = 30 THEN rs_mean END))
              + {_HURST_CX60!r} * ln(MAX(CASE WHEN w = 60 THEN rs_mean END))
              + {_HURST_CX120!r}
                * ln(MAX(CASE WHEN w = 120 THEN rs_mean END)))
             / {_HURST_SXX!r}, 6) AS hurst_exponent
FROM per_w
"""


@register("ts_hurst_rs", oracle=_HURST_ORACLE)
def ts_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of daily purchase revenue by classical rescaled-
    range (R/S) analysis at block sizes 30/60/120 days: H ≈ 0.5 means a
    memoryless walk, H > 0.5 long-range persistence (trends compound),
    H < 0.5 mean reversion — the long-memory diagnostic next to the
    short-lag views (ts_acf_multi_lag, ts_burstiness_fano). Per block,
    the cumulative deviation is kept in EXACT cross-multiplied integers
    (w·Σ_{{≤t}}y − t·Σy, BIGINT), so range R comes off an integer
    max−min; each block's R/S is one identical double tree quantized to
    1e-6 integers, the per-size mean an associative integer fold; the
    log-log slope uses FROZEN centered-ln(w) regressors, making the fit
    a fixed 3-term expression.

    Scale shape: calendar-bounded daily fold (≤366 rows at ANY corpus
    size); the ×3 size fan-out, block windows, and folds all run on the
    bounded domain — corpus cost is the one daily collapse."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type") == "purchase"))
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    d = (ev.select(F.date_trunc("day", F.col("ts")).alias("day"),
                   cents.alias("c"))
         .groupBy("day")
         .agg(F.sum("c").cast("bigint").alias("y"))
         # r11: the ≤366-row daily fold feeds both the n1 scalar and the
         # indexed series — pin it so the events scan runs once per query
         .localCheckpoint(eager=False))
    n1 = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    t = (d.select("y", F.row_number().over(Window.orderBy("day"))
                  .cast("bigint").alias("t_idx"))
         .crossJoin(F.broadcast(n1)))
    sizes = spark.createDataFrame([(30,), (60,), (120,)], "w bigint")
    blk = (t.crossJoin(F.broadcast(sizes))
           .where(F.col("t_idx")
                  <= (F.col("n") / F.col("w")).cast("bigint") * F.col("w"))
           .select("w",
                   ((F.col("t_idx") - 1) / F.col("w")).cast("bigint")
                   .alias("block"),
                   ((F.col("t_idx") - 1) % F.col("w")).alias("pos"),
                   "y", "n"))
    wo = (Window.partitionBy("w", "block").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wb = Window.partitionBy("w", "block")
    cum = blk.select(
        "w", "block", "pos", "y",
        F.sum("y").over(wo).cast("bigint").alias("cy"),
        F.sum("y").over(wb).cast("bigint").alias("s1"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).over(wb)
        .cast("decimal(38,0)").alias("s2"))
    dev = cum.select(
        "w", "block", "s1", "s2",
        (F.col("w") * F.col("cy") - (F.col("pos") + 1) * F.col("s1"))
        .alias("dv"))
    wd = F.col("wm").cast("double")
    per_block = (dev.groupBy("w", "block")
                 .agg(F.max("dv").alias("mx"), F.min("dv").alias("mn"),
                      F.max("s1").alias("s1m"), F.max("s2").alias("s2m"),
                      F.max("w").alias("wm"))
                 .select("w",
                         F.round(((F.col("mx") - F.col("mn")).cast("double")
                                  / (wd * F.sqrt(
                                      (F.col("s2m").cast("double")
                                       - F.col("s1m").cast("double")
                                         * F.col("s1m").cast("double") / wd)
                                      / wd))) * 1000000.0, 0)
                         .cast("bigint").alias("rs_q")))
    per_w = (per_block.groupBy("w")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
                  F.round(F.sum("rs_q").cast("double")
                          / F.count(F.lit(1)).cast("double")
                          / 1000000.0, 6).alias("rs_mean")))

    def at(w: int):
        return F.max(F.when(F.col("w") == w, F.col("rs_mean")))

    hurst = ((F.lit(_HURST_CX30) * F.log(at(30))
              + F.lit(_HURST_CX60) * F.log(at(60))
              + F.lit(_HURST_CX120) * F.log(at(120))) / F.lit(_HURST_SXX))
    return (per_w.crossJoin(F.broadcast(n1))
            .agg(F.max("n").alias("n_days"),
                 at(30).alias("rs_w30"), at(60).alias("rs_w60"),
                 at(120).alias("rs_w120"),
                 F.round(hurst, 6).alias("hurst_exponent")))


# ---------------------------------------------------------------------------
# synchronous min-label propagation (community detection)
# ---------------------------------------------------------------------------

_LABELPROP_ORACLE = """
WITH raw AS (
  SELECT l_partkey AS src,
         lead(l_partkey) OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_partkey,
                                        l_suppkey) AS dst
  FROM lineitem
), e0 AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM raw WHERE dst IS NOT NULL AND src <> dst
), edges AS (
  SELECT a AS v, b AS u FROM e0 UNION ALL SELECT b, a FROM e0
), l0 AS (
  SELECT DISTINCT v, v AS l FROM edges
), l1 AS (
  SELECT l0.v, least(l0.l, MIN(n.l)) AS l
  FROM l0 JOIN edges ON edges.v = l0.v
          JOIN l0 AS n ON n.v = edges.u
  GROUP BY l0.v, l0.l
), l2 AS (
  SELECT l1.v, least(l1.l, MIN(n.l)) AS l
  FROM l1 JOIN edges ON edges.v = l1.v
          JOIN l1 AS n ON n.v = edges.u
  GROUP BY l1.v, l1.l
), l3 AS (
  SELECT l2.v, least(l2.l, MIN(n.l)) AS l
  FROM l2 JOIN edges ON edges.v = l2.v
          JOIN l2 AS n ON n.v = edges.u
  GROUP BY l2.v, l2.l
)
SELECT CAST(l AS BIGINT) AS community,
       CAST(COUNT(*) AS BIGINT) AS n_members
FROM l3 GROUP BY l HAVING COUNT(*) >= 2
ORDER BY n_members DESC, community
LIMIT 50
"""


@register("graph_label_propagation_sync", oracle=_LABELPROP_ORACLE)
def graph_label_propagation_sync(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Community detection by SYNCHRONOUS min-label propagation over
    the co-purchase graph, exactly three rounds: every vertex starts
    labeled with its own id and repeatedly takes the minimum of its
    label and its neighbors' ROUND-k labels — the deterministic variant
    of label propagation (classic LPA's random tie-breaks make it
    unreproducible; min-label is the same fixed-point family as
    graph_connected_components but BOUNDED at depth 3, so it reports
    communities-within-radius-3 rather than full components). Top-50
    communities by size with the earliest-label tie-break.

    Scale shape: self-loops appended to the symmetrized edge list turn
    the recurrence l_{k+1}(v) = min(l_k(v), min_{u∈N(v)} l_k(u)) into a
    PLAIN min fold over N(v) ∪ {v} — one edge⋈labels equi-join + one
    combinable min fold per round, with no second labels re-join (the
    r8 form re-joined labels every round: 3 extra shuffles). Round 1
    needs no join at all (l_0(u) = u, so l_1 = min fold of the edge
    list directly); rounds 2-3 broadcast the V-row label map so the
    checkpointed E-row edge list never reshuffles (hash-partitioned
    labels at a V that outgrows broadcast — the fold stays O(E))."""
    li = load_table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey")
    raw = (li.select(F.col("l_partkey").alias("src"),
                     F.lead("l_partkey").over(w).alias("dst"))
           .where(F.col("dst").isNotNull()
                  & (F.col("src") != F.col("dst"))))
    e0 = (raw.select(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
          .distinct())
    # r11: pin the deduped edge set BEFORE the self-loop union — the
    # edges checkpoint's own materialization job contained the e0
    # subtree twice (sym + the self-loop distinct), so the lineitem
    # window pass and the dedup shuffle ran 2x per query
    e0 = e0.localCheckpoint(eager=False)
    sym = (e0.select(F.col("a").alias("v"), F.col("b").alias("u"))
           .unionAll(e0.select(F.col("b").alias("v"),
                               F.col("a").alias("u"))))
    edges = (sym.unionAll(sym.select("v").distinct()
                          .select("v", F.col("v").alias("u")))
             .localCheckpoint(eager=False))  # three rounds share it
    labels = edges.groupBy("v").agg(F.min("u").alias("l"))
    for _ in range(2):
        # O(V) label vector: size-gated hint (a bare F.broadcast()
        # hard-fails past 8 GiB / 512M rows instead of degrading)
        labels = (edges.join(broadcast_if_bounded(
                      labels.select(F.col("v").alias("u"),
                                    F.col("l").alias("nl")), sf_dir), "u")
                  .groupBy("v").agg(F.min("nl").alias("l")))
    return (labels.groupBy("l")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
            .where(F.col("n_members") >= 2)
            .select(F.col("l").cast("bigint").alias("community"),
                    "n_members")
            .orderBy(F.col("n_members").desc(), "community")
            .limit(50))


# ---------------------------------------------------------------------------
# chrF generation-eval score (character n-gram F-beta)
# ---------------------------------------------------------------------------

# pred span = tokens[1..12], gold span = tokens[6..19] (1-indexed) -- the
# llm_eval_bleu_corpus convention, re-joined to STRINGS so the grams are
# CHARACTER n-grams (n = 1..3, uniform weights, beta = 2: recall-weighted,
# the chrF paper's default).
_CHRF_PRED_LEN = 12
_CHRF_GOLD_LEN = 14

_CHRF_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         array_to_string(l[1:{_CHRF_PRED_LEN}], ' ') AS ps,
         array_to_string(l[6:{5 + _CHRF_GOLD_LEN}], ' ') AS gs
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
  WHERE len(l) >= 20
), ns AS (
  SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS ng
), pg AS (
  SELECT doc_id, ng, g, CAST(COUNT(*) AS BIGINT) AS pc
  FROM (
    SELECT b.doc_id, ns.ng,
           unnest(list_transform(range(1, len(b.ps) - CAST(ns.ng AS INTEGER) + 2),
                                 i -> substr(b.ps, i, CAST(ns.ng AS INTEGER)))) AS g
    FROM base b CROSS JOIN ns
  ) GROUP BY doc_id, ng, g
), gg AS (
  SELECT doc_id, ng, g, CAST(COUNT(*) AS BIGINT) AS gc
  FROM (
    SELECT b.doc_id, ns.ng,
           unnest(list_transform(range(1, len(b.gs) - CAST(ns.ng AS INTEGER) + 2),
                                 i -> substr(b.gs, i, CAST(ns.ng AS INTEGER)))) AS g
    FROM base b CROSS JOIN ns
  ) GROUP BY doc_id, ng, g
), ov AS (
  SELECT pg.doc_id, pg.ng,
         CAST(SUM(least(pg.pc, gg.gc)) AS BIGINT) AS o
  FROM pg JOIN gg ON pg.doc_id = gg.doc_id AND pg.ng = gg.ng
                  AND pg.g = gg.g
  GROUP BY pg.doc_id, pg.ng
), per_n AS (
  SELECT base.doc_id, ns.ng,
         COALESCE(ov.o, 0) AS o,
         len(base.ps) - ns.ng + 1 AS tp,
         len(base.gs) - ns.ng + 1 AS tg
  FROM base CROSS JOIN ns
  LEFT JOIN ov ON ov.doc_id = base.doc_id AND ov.ng = ns.ng
), pr AS (
  SELECT doc_id,
         (MAX(CASE WHEN ng = 1 THEN CAST(o AS DOUBLE) / tp END)
          + MAX(CASE WHEN ng = 2 THEN CAST(o AS DOUBLE) / tp END)
          + MAX(CASE WHEN ng = 3 THEN CAST(o AS DOUBLE) / tp END)) / 3.0
           AS p,
         (MAX(CASE WHEN ng = 1 THEN CAST(o AS DOUBLE) / tg END)
          + MAX(CASE WHEN ng = 2 THEN CAST(o AS DOUBLE) / tg END)
          + MAX(CASE WHEN ng = 3 THEN CAST(o AS DOUBLE) / tg END)) / 3.0
           AS r
  FROM per_n GROUP BY doc_id
)
SELECT doc_id, round(p, 6) AS chr_p, round(r, 6) AS chr_r,
       CASE WHEN 4.0 * p + r = 0.0 THEN 0.0
            ELSE round(5.0 * p * r / (4.0 * p + r), 6) END AS chrf2
FROM pr
"""


@register("llm_eval_chrf", oracle=_CHRF_ORACLE)
def llm_eval_chrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chrF2 generation-eval score per document: CHARACTER-n-gram
    (n = 1..3) clipped precision/recall between the deterministic
    pred/gold spans, folded to the recall-weighted F-beta (β = 2) —
    the tokenization-free metric beside word-gram BLEU/ROUGE (chrF
    sees morphology BLEU misses: 'run' vs 'running' share 3 of 4
    character grams but zero word grams). Clipped overlaps are exact
    integer min-folds per (doc, n, gram); per-n totals are CLOSED FORM
    (len − n + 1, no second gram pass); the 3-term precision/recall
    means are fixed-order trees.

    Scale shape: per-side bounded gram streams (spans are fixed 12/14
    tokens, so ≤ ~100 chars/doc/n) generated by posexplode over a
    POSITION sequence (codegen-friendly; the higher-order
    transform-of-substrings form is interpreted per element and
    measured 2× slower) feeding ONE combinable (doc, n, gram) count
    shuffle with a side flag; the clipped overlap is
    least(pred_count, gold_count) INSIDE that aggregate, so there is
    no gram-keyed join at all, and one-sided grams (pc=0 or gc=0 —
    the large majority) are dropped before the doc-grain fold (every
    doc structurally survives: both spans are space-joined overlapping
    token windows, so ' ' is always a shared 1-gram). Per-n totals are
    closed form (len − n + 1) carried through as grouping constants.
    The r8 two-explode + gram-join form (4 shuffles) measured 3.35 s
    at sf0.1; this 2-shuffle form ~2.2 s."""
    d = load_table(spark, "documents", sf_dir)
    base = (d.select("doc_id", F.split("text", " ").alias("l"))
            .where(F.size("l") >= 20)
            .select("doc_id",
                    F.array_join(F.slice("l", 1, _CHRF_PRED_LEN), " ")
                    .alias("ps"),
                    F.array_join(F.slice("l", 6, _CHRF_GOLD_LEN), " ")
                    .alias("gs"))
            .localCheckpoint(eager=False))  # both side streams share it
    ns = spark.createDataFrame([(1,), (2,), (3,)], "ng bigint")

    def side(src: str, sd: int) -> DataFrame:
        s = F.col(src)
        return (base.crossJoin(F.broadcast(ns))
                .select("doc_id",
                        F.length("ps").alias("lp"),
                        F.length("gs").alias("lg"),
                        "ng", F.col(src).alias("t"),
                        F.posexplode(F.sequence(
                            F.lit(1), F.length(s) - F.col("ng") + 1))
                        .alias("_", "i"),
                        F.lit(sd).alias("side"))
                .select("doc_id", "lp", "lg", "ng",
                        F.expr("substr(t, i, ng)").alias("g"), "side"))

    counts = (side("ps", 0).unionAll(side("gs", 1))
              .groupBy("doc_id", "lp", "lg", "ng", "g")
              .agg(F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
                   .cast("bigint").alias("pc"),
                   F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
                   .cast("bigint").alias("gc"))
              .where((F.col("pc") > 0) & (F.col("gc") > 0)))

    def o(n: int):
        return F.coalesce(
            F.sum(F.when(F.col("ng") == n, F.least("pc", "gc"))),
            F.lit(0)).cast("bigint")

    per_doc = (counts.groupBy("doc_id", "lp", "lg")
               .agg(o(1).alias("o1"), o(2).alias("o2"), o(3).alias("o3")))

    def ratio(on: str, ln: str, n: int):
        return F.col(on).cast("double") / (F.col(ln) - n + 1)

    pr = per_doc.select(
        "doc_id",
        (((ratio("o1", "lp", 1) + ratio("o2", "lp", 2))
          + ratio("o3", "lp", 3)) / 3.0).alias("p"),
        (((ratio("o1", "lg", 1) + ratio("o2", "lg", 2))
          + ratio("o3", "lg", 3)) / 3.0).alias("r"))
    chrf = (F.when(4.0 * F.col("p") + F.col("r") == 0.0, F.lit(0.0))
            .otherwise(F.round(5.0 * F.col("p") * F.col("r")
                               / (4.0 * F.col("p") + F.col("r")), 6)))
    return pr.select("doc_id", F.round("p", 6).alias("chr_p"),
                     F.round("r", 6).alias("chr_r"),
                     chrf.alias("chrf2"))


# ---------------------------------------------------------------------------
# commit-log checkpointing (O(1) metadata reads under long histories)
# ---------------------------------------------------------------------------

_TXLOG_CKPT_ORACLE = """
SELECT 'checkpoint' AS read_path, CAST(3 AS BIGINT) AS snapshot_version,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM orders
UNION ALL
SELECT 'replay', CAST(3 AS BIGINT),
       CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT)
FROM orders
"""


def txlog_write_checkpoint(root: str, version: int) -> None:
    """Materialize the live-file set at `version` into
    `_txlog_ckpt/{version:05d}.json` — the Delta checkpoint-parquet
    idea: later readers replay only commits AFTER the checkpoint.
    Kept in a sibling directory so the plain commit log (and its
    version-slot race) is untouched."""
    import json as _json
    import os as _os

    from lambdatotheslaughter_spark.operators.round7 import (
        txlog_snapshot_files)

    live = [_os.path.relpath(p, root)
            for p in txlog_snapshot_files(root, version)]
    ckpt = _os.path.join(root, "_txlog_ckpt")
    _os.makedirs(ckpt, exist_ok=True)
    tmp = _os.path.join(ckpt, f".tmp-{version:05d}")
    with open(tmp, "w") as fh:
        _json.dump({"version": version, "live": sorted(live)}, fh)
    _os.replace(tmp, _os.path.join(ckpt, f"{version:05d}.json"))


def txlog_snapshot_files_ckpt(root: str, version: int) -> list[str]:
    """Snapshot via the LATEST checkpoint ≤ `version`, replaying only
    the commit tail after it — O(tail) metadata reads instead of
    O(history)."""
    import json as _json
    import os as _os

    ckpt_dir = _os.path.join(root, "_txlog_ckpt")
    base_v, live = -1, set()
    if _os.path.isdir(ckpt_dir):
        versions = [int(f.split(".")[0]) for f in _os.listdir(ckpt_dir)
                    if f.endswith(".json") and not f.startswith(".")]
        usable = [v for v in versions if v <= version]
        if usable:
            base_v = max(usable)
            doc = _json.load(open(_os.path.join(ckpt_dir,
                                                f"{base_v:05d}.json")))
            live = set(doc["live"])
    log = _os.path.join(root, "_txlog")
    for v in sorted(int(f.split(".")[0]) for f in _os.listdir(log)
                    if f.endswith(".json")):
        if v <= base_v or v > version:
            continue
        doc = _json.load(open(_os.path.join(log, f"{v:05d}.json")))
        for act in doc["actions"]:
            if act["op"] == "add":
                live.add(act["path"])
            elif act["op"] == "remove":
                live.discard(act["path"])
    return [_os.path.join(root, p) for p in sorted(live)]


def _txlog_ckpt_fixture(spark: SparkSession, sf_dir: str) -> str:
    from lambdatotheslaughter_spark.operators.round7 import txlog_commit
    from lambdatotheslaughter_spark.operators.scans import _cached_dataset

    def build(tmp: str) -> None:
        import os as _os
        o = load_table(spark, "orders", sf_dir)
        for mod in (0, 1, 2):
            (o.where(F.pmod("o_orderkey", F.lit(3)) == mod)
             .write.mode("overwrite")
             .parquet(_os.path.join(tmp, f"batch{mod}")))
        assert txlog_commit(tmp, [{"op": "add", "path": "batch0"}]) == 0
        assert txlog_commit(tmp, [{"op": "add", "path": "batch1"}]) == 1
        assert txlog_commit(tmp, [{"op": "remove", "path": "batch0"},
                                  {"op": "add", "path": "batch2"}]) == 2
        txlog_write_checkpoint(tmp, 2)
        # the post-checkpoint tail the checkpoint reader must still see
        assert txlog_commit(tmp, [{"op": "add", "path": "batch0"}]) == 3

    return _cached_dataset("txlog_ckpt_orders", sf_dir, "orders", build)


@register("scan_txlog_checkpoint", oracle=_TXLOG_CKPT_ORACLE)
def scan_txlog_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-log CHECKPOINTING — the piece that makes
    scan_txlog_snapshot's format viable under long histories: a
    checkpoint file materializes the live-file set at version V, so a
    reader replays only the commit tail AFTER V (Delta's
    checkpoint-parquet idea; without it, every read is O(all commits) —
    at one commit per minute that is half a million JSON files after a
    year). The fixture commits v0–v2, checkpoints at 2, then commits
    v3 (re-adding the file v2 removed); the query reads snapshot v3
    through BOTH paths — checkpoint + tail, and full replay — and the
    oracle pins both to the exact full-table contents, so
    checkpoint-path equivalence IS the verified property.

    Scale shape: checkpoints are driver-side metadata (bytes scale
    with live-file count, never data size); data files are never
    rewritten; the snapshot still plans `spark.read.parquet(*files)`
    so pushdown/pruning work unchanged."""
    from lambdatotheslaughter_spark.operators.round7 import (
        txlog_snapshot_files)

    root = _txlog_ckpt_fixture(spark, sf_dir)
    schema = load_table(spark, "orders", sf_dir).schema

    def snap(path_name: str, files: list[str]) -> DataFrame:
        return (spark.read.schema(schema).parquet(*files)
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                     F.sum("o_orderkey").cast("bigint").alias("key_sum"))
                .select(F.lit(path_name).alias("read_path"),
                        F.lit(3).cast("bigint").alias("snapshot_version"),
                        "n_rows", "key_sum"))

    via_ckpt = txlog_snapshot_files_ckpt(root, 3)
    via_replay = txlog_snapshot_files(root, 3)
    return (snap("checkpoint", via_ckpt)
            .unionByName(snap("replay", via_replay)))


# ===========================================================================
# round-7 eighth ring
# ===========================================================================

# ---------------------------------------------------------------------------
# Breusch-Pagan heteroskedasticity test (Koenker LM form)
# ---------------------------------------------------------------------------

# chi-square(1) upper 5% point, frozen (the one transcendental threshold)
_BP_CHI2_95 = 3.841458820694124

_BP_ORACLE = f"""
WITH h AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) AS eh,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
), x AS (
  SELECT eh - (SELECT MIN(eh) FROM h) AS x, y FROM h
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM x
), co AS (
  SELECT n, sx, sxx,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
         CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
         - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
           * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS a
  FROM s
), e AS (
  SELECT x.x,
         CAST(round(CAST(y AS DOUBLE) - co.a - co.b * CAST(x.x AS DOUBLE),
                    0) AS BIGINT) AS ec
  FROM x CROSS JOIN co
), sig AS (
  SELECT sqrt(CAST(SUM(CAST(ec AS DECIMAL(38,0)) * ec) AS DOUBLE)
              / CAST((SELECT n FROM co) - 2 AS DOUBLE)) AS sd
  FROM e
), u AS (
  SELECT e.x,
         CAST(round((CAST(e.ec AS DOUBLE) / sig.sd)
                    * (CAST(e.ec AS DOUBLE) / sig.sd) * 1000000.0, 0)
              AS BIGINT) AS uq
  FROM e CROSS JOIN sig
), aux AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(uq) AS BIGINT) AS su,
         CAST(SUM(x * uq) AS BIGINT) AS sxu,
         CAST(SUM(CAST(uq AS DECIMAL(38,0)) * uq) AS DECIMAL(38,0)) AS suu
  FROM u
)
SELECT n AS n_hours,
       round((CAST(n AS DOUBLE) * CAST(sxu AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(sxu AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
                   - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))), 6)
         AS r2_aux,
       round(CAST(n AS DOUBLE)
             * (CAST(n AS DOUBLE) * CAST(sxu AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(sxu AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
                   - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))), 6)
         AS bp_lm,
       CAST(n AS DOUBLE)
       * (CAST(n AS DOUBLE) * CAST(sxu AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE))
       * (CAST(n AS DOUBLE) * CAST(sxu AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE))
       / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * (CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
             - CAST(su AS DOUBLE) * CAST(su AS DOUBLE)))
       > {_BP_CHI2_95!r} AS heteroskedastic
FROM aux
"""


@register("stat_breusch_pagan", oracle=_BP_ORACLE)
def stat_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch–Pagan heteroskedasticity test (Koenker's LM = n·R² form)
    on the hourly-purchase-cents OLS: does residual VARIANCE drift with
    time — the other regression-health check beside stat_durbin_watson's
    serial correlation (heteroskedastic residuals invalidate the OLS
    standard errors every downstream CI uses). Residuals are quantized
    to whole cents; the auxiliary regressand is the STANDARDIZED squared
    residual (e/σ̂)² quantized 1e-6 — R² is invariant to that scaling,
    and it BOUNDS the integer fold at any corpus scale (z² ≤ ~10², so
    Σu and Σu² stay in BIGINT range at 100 TB where raw e² sums would
    overflow even decimal(38)). Decision vs the FROZEN χ²₁ 5%% point.

    Scale shape: calendar-bounded hourly fold; two broadcast 1-row
    passes (coefficients, then σ̂); every fold an exact integer sum over
    the bounded domain."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type") == "purchase"))
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    h = (ev.select(
            (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600)
            .cast("bigint").alias("eh"),
            cents.alias("c"))
         .groupBy("eh")
         .agg(F.sum("c").cast("bigint").alias("y")))
    mn = h.agg(F.min("eh").alias("m"))
    x = (h.crossJoin(F.broadcast(mn))
         .select((F.col("eh") - F.col("m")).alias("x"), "y"))
    s = x.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
              F.sum("x").cast("bigint").alias("sx"),
              F.sum("y").cast("bigint").alias("sy"),
              F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
              F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"))
    nd = F.col("n").cast("double")
    b = ((nd * F.col("sxy").cast("double")
          - F.col("sx").cast("double") * F.col("sy").cast("double"))
         / (nd * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")))
    a = F.col("sy").cast("double") / nd - b * F.col("sx").cast("double") / nd
    co = s.select("n", b.alias("b"), a.alias("a"))
    e = (x.crossJoin(F.broadcast(co))
         .select("x", "n",
                 F.round(F.col("y").cast("double") - F.col("a")
                         - F.col("b") * F.col("x").cast("double"), 0)
                 .cast("bigint").alias("ec")))
    sig = e.agg(F.sqrt(F.sum(F.col("ec").cast("decimal(38,0)")
                             * F.col("ec")).cast("double")
                       / (F.max("n") - 2).cast("double")).alias("sd"))
    z = F.col("ec").cast("double") / F.col("sd")
    u = (e.crossJoin(F.broadcast(sig))
         .select("x", F.round(z * z * 1000000.0, 0).cast("bigint")
                 .alias("uq")))
    aux = u.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("x").cast("bigint").alias("sx"),
                F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
                F.sum("uq").cast("bigint").alias("su"),
                F.sum(F.col("x") * F.col("uq")).cast("bigint").alias("sxu"),
                F.sum(F.col("uq").cast("decimal(38,0)") * F.col("uq"))
                .cast("decimal(38,0)").alias("suu"))
    nd2 = F.col("n").cast("double")
    num = (nd2 * F.col("sxu").cast("double")
           - F.col("sx").cast("double") * F.col("su").cast("double"))
    r2 = (num * num
          / ((nd2 * F.col("sxx").cast("double")
              - F.col("sx").cast("double") * F.col("sx").cast("double"))
             * (nd2 * F.col("suu").cast("double")
                - F.col("su").cast("double") * F.col("su").cast("double"))))
    return aux.select(
        F.col("n").alias("n_hours"),
        F.round(r2, 6).alias("r2_aux"),
        F.round(nd2 * r2, 6).alias("bp_lm"),
        (nd2 * r2 > F.lit(_BP_CHI2_95)).alias("heteroskedastic"))


# ---------------------------------------------------------------------------
# Dickey-Fuller unit-root test (constant, no trend; asymptotic 5%)
# ---------------------------------------------------------------------------

# asymptotic 5% critical value of the constant-only DF tau distribution
_DF_TAU_95 = -2.86

_DF_ORACLE = f"""
WITH d AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
), p AS (
  SELECT y - lag(y) OVER (ORDER BY day) AS dy,
         lag(y) OVER (ORDER BY day) AS x
  FROM d
), q AS (
  SELECT dy, x FROM p WHERE x IS NOT NULL
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sdy,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * dy) AS DECIMAL(38,0)) AS sxdy
  FROM q
), co AS (
  SELECT n, sx, sxx,
         (CAST(n AS DOUBLE) * CAST(sxdy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sdy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS g,
         CAST(sdy AS DOUBLE) / CAST(n AS DOUBLE)
         - ((CAST(n AS DOUBLE) * CAST(sxdy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sdy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
           * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS al
  FROM s
), r AS (
  SELECT co.n, co.sx, co.sxx, co.g,
         CAST(SUM(CAST(CAST(round(CAST(q.dy AS DOUBLE) - co.al
                                  - co.g * CAST(q.x AS DOUBLE), 0)
                            AS BIGINT) AS DECIMAL(38,0))
                  * CAST(round(CAST(q.dy AS DOUBLE) - co.al
                               - co.g * CAST(q.x AS DOUBLE), 0)
                         AS BIGINT)) AS DECIMAL(38,0)) AS sse
  FROM q CROSS JOIN co
  GROUP BY co.n, co.sx, co.sxx, co.g
)
SELECT n AS n_obs, round(g, 6) AS gamma,
       round(g / sqrt((CAST(sse AS DOUBLE) / CAST(n - 2 AS DOUBLE))
                      * CAST(n AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))), 6)
         AS df_tstat,
       g / sqrt((CAST(sse AS DOUBLE) / CAST(n - 2 AS DOUBLE))
                * CAST(n AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
       < {_DF_TAU_95!r} AS reject_unit_root
FROM r
"""


@register("ts_dickey_fuller_unit_root", oracle=_DF_ORACLE)
def ts_dickey_fuller_unit_root(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Dickey–Fuller unit-root test (constant, no trend) on daily
    purchase revenue: regress Δyₜ on yₜ₋₁ and read γ̂'s t-ratio against
    the FROZEN asymptotic 5%% τ point (−2.86; τ is NOT Student-t, which
    is why the threshold must be a DF-table literal) — the
    is-this-series-mean-reverting gate run before trusting any
    trend/forecast op's extrapolation (a unit root means shocks are
    permanent). All regression inputs are exact BIGINT/decimal(38,0)
    sums over the calendar-bounded daily domain; residuals quantize to
    whole cents so SSE is an exact integer fold.

    Scale shape: ≤366-row daily fold, one lag window on the bounded
    domain, one broadcast coefficient row, one residual fold."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type") == "purchase"))
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    d = (ev.select(F.date_trunc("day", F.col("ts")).alias("day"),
                   cents.alias("c"))
         .groupBy("day")
         .agg(F.sum("c").cast("bigint").alias("y")))
    w = Window.orderBy("day")
    q = (d.select((F.col("y") - F.lag("y").over(w)).alias("dy"),
                  F.lag("y").over(w).alias("x"))
         .where(F.col("x").isNotNull()))
    s = q.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
              F.sum("x").cast("bigint").alias("sx"),
              F.sum("dy").cast("bigint").alias("sdy"),
              F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
              .cast("decimal(38,0)").alias("sxx"),
              F.sum(F.col("x").cast("decimal(38,0)") * F.col("dy"))
              .cast("decimal(38,0)").alias("sxdy"))
    nd = F.col("n").cast("double")
    g = ((nd * F.col("sxdy").cast("double")
          - F.col("sx").cast("double") * F.col("sdy").cast("double"))
         / (nd * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")))
    al = (F.col("sdy").cast("double") / nd
          - g * F.col("sx").cast("double") / nd)
    co = s.select("n", "sx", "sxx", g.alias("g"), al.alias("al"))
    ehat = F.round(F.col("dy").cast("double") - F.col("al")
                   - F.col("g") * F.col("x").cast("double"), 0) \
        .cast("bigint")
    r = (q.crossJoin(F.broadcast(co))
         .groupBy("n", "sx", "sxx", "g")
         .agg(F.sum(ehat.cast("decimal(38,0)") * ehat)
              .cast("decimal(38,0)").alias("sse")))
    nd2 = F.col("n").cast("double")
    se = F.sqrt((F.col("sse").cast("double")
                 / (F.col("n") - 2).cast("double")) * nd2
                / (nd2 * F.col("sxx").cast("double")
                   - F.col("sx").cast("double")
                     * F.col("sx").cast("double")))
    t = F.col("g") / se
    return r.select(F.col("n").alias("n_obs"),
                    F.round(F.col("g"), 6).alias("gamma"),
                    F.round(t, 6).alias("df_tstat"),
                    (t < F.lit(_DF_TAU_95)).alias("reject_unit_root"))


# ---------------------------------------------------------------------------
# 3-hop harmonic closeness centrality
# ---------------------------------------------------------------------------

# seed-pivot contract: exact 3-hop closeness for the 32 vertices with
# the smallest deterministic md5 keys (the HyperBall-era answer to "you
# cannot enumerate all-pairs distances on a dense graph").
# Execution is multi-source BFS over seed BITMASKS (the MS-BFS idea:
# Then et al., VLDB 2014): every vertex carries one 64-bit word whose
# bit i means "seed i reaches me within d hops", and a level is ONE
# O(E) edge⋈mask join + a combinable bit_or fold — the per-level cost
# has NO seeds multiplier (the r8 frontier-join form was
# O(seeds · ball · degree): 4.8 s at sf0.1 and the reason VERDICT r8
# flagged this key; the bitmask form re-measured 1.3 s).
_CLOSENESS_SEEDS = 32
_CLOSENESS_SEED_SALT = "lts-r7-closeness"
# estimated lineitem rows above which the edge build dedups before the
# three BFS level joins (r10 probe: the undeduped checkpoint OOMs at
# ~100× fact volume; below the gate the dedup shuffle costs more than
# the ~1.3× duplicates it removes). Module-level so the branch-parity
# test can pin both paths to identical values.
_CLOSENESS_DEDUP_MIN_ROWS = 5_000_000

_CLOSENESS_ORACLE = f"""
WITH raw AS (
  SELECT l_partkey AS src,
         lead(l_partkey) OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_partkey,
                                        l_suppkey) AS dst
  FROM lineitem
), e0 AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM raw WHERE dst IS NOT NULL AND src <> dst
), p1 AS (
  SELECT a AS v, b AS u FROM e0 UNION SELECT b, a FROM e0
), seeds AS (
  SELECT v AS s FROM (SELECT DISTINCT v FROM p1)
  ORDER BY CAST(concat('0x', substring(md5(CAST(v AS VARCHAR)
                                           || ':{_CLOSENESS_SEED_SALT}'),
                                       1, 15)) AS BIGINT), v
  LIMIT {_CLOSENESS_SEEDS}
), d1 AS (
  SELECT seeds.s, p1.u FROM seeds JOIN p1 ON p1.v = seeds.s
), d2 AS (
  SELECT DISTINCT d1.s, p1.u FROM d1 JOIN p1 ON p1.v = d1.u
  WHERE p1.u <> d1.s
  EXCEPT SELECT s, u FROM d1
), d3 AS (
  SELECT DISTINCT d2.s, p1.u FROM d2 JOIN p1 ON p1.v = d2.u
  WHERE p1.u <> d2.s
  EXCEPT (SELECT s, u FROM d1 UNION SELECT s, u FROM d2)
), c AS (
  SELECT s,
         CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN d = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
  FROM (
    SELECT s, 1 AS d FROM d1 UNION ALL
    SELECT s, 2 FROM d2 UNION ALL
    SELECT s, 3 FROM d3
  ) GROUP BY s
)
SELECT CAST(s AS BIGINT) AS partkey, n1, n2, n3,
       round(CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) / 2.0
             + CAST(n3 AS DOUBLE) / 3.0, 6) AS harmonic_3
FROM c
ORDER BY harmonic_3 DESC, partkey
"""


@register("graph_closeness_harmonic_3hop", oracle=_CLOSENESS_ORACLE)
def graph_closeness_harmonic_3hop(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Harmonic closeness centrality truncated at radius 3, computed
    EXACTLY for a deterministic 32-vertex seed pivot set:
    Σ_{u≠s, d(s,u)≤3} 1/d = n₁ + n₂/2 + n₃/3 per seed — the
    who-is-CLOSE-to-everything measure beside the walk-counting family
    (Katz counts paths, closeness counts DISTANCES; the harmonic form
    drops unreachable pairs instead of zeroing out). Seed-pivoting is
    the load-bearing scale decision: the co-purchase graph is DENSE
    (the 3-hop ball covers most of V, so all-vertex shells are O(V²)
    pairs — measured 4M pairs with a 110M-row join intermediate at
    sf0.01, the thing that OOMs a 1 GB driver), while seeded frontier
    expansion is O(seeds · ball) with exact-distance shells via
    set-difference (dist-2 = 2-step minus dist-1; dist-3 = 3-step
    minus closer). Seeds are the 32 smallest deterministic md5 keys —
    the fixed-size pivot-sampling contract production closeness
    (HyperBall-style) uses on billion-edge graphs.

    Scale shape (MS-BFS bitmasks): every vertex carries ONE bigint
    whose bit i = "seed i reaches me within d hops"; a level is one
    O(E) edge⋈mask equi-join + a combinable bit_or fold to V rows —
    no seeds multiplier anywhere (the frontier-join form this replaced
    was O(seeds · ball · degree) and 3.7× slower at sf0.1). Shell
    counts fall out of mask set-difference (r_d & ~r_{d-1}) folded
    over a bounded 32-position posexplode."""
    li = load_table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey")
    raw = (li.select(F.col("l_partkey").alias("src"),
                     F.lead("l_partkey").over(w).alias("dst"))
           .where(F.col("dst").isNotNull()
                  & (F.col("src") != F.col("dst"))))
    # the mask fold is bit_or-IDEMPOTENT: duplicate edges contribute the
    # same bits, so the edge-dedup DISTINCT the oracle needs for its
    # set-difference shells is semantically a no-op here. Whether it is
    # WORTH running is a volume question, so it is estimate-gated
    # (round 10): at bench scale the duplicate factor is ~1.3× and the
    # dedup shuffle costs more than the duplicates it removes (value
    # parity re-verified at sf0.01/sf0.1 both ways); at high fact
    # volume the duplicate factor compounds (the 100×-copy probe OOMed
    # the undeduped checkpoint at ~180M duplicate rows) and one dedup
    # shuffle amortizes across all three level joins — the 100 TB path.
    adj = raw.select(F.col("src").alias("v"), F.col("dst").alias("u"))
    if estimate_rows(sf_dir, "lineitem") > _CLOSENESS_DEDUP_MIN_ROWS:
        adj = adj.select(F.least("v", "u").alias("v"),
                         F.greatest("v", "u").alias("u")).distinct()
    p1 = (adj.union(adj.select(F.col("u").alias("v"),
                               F.col("v").alias("u")))
          .localCheckpoint(eager=False))  # all three levels reuse it
    key = F.conv(F.substring(
        F.md5(F.concat(F.col("v").cast("string"),
                       F.lit(f":{_CLOSENESS_SEED_SALT}"))), 1, 15), 16, 10) \
        .cast("bigint")
    seeds = (p1.select("v").distinct()
             .orderBy(key, "v").limit(_CLOSENESS_SEEDS)
             .select(F.col("v").alias("s")))
    # bit index per seed: the post-limit frame is <= 32 rows, so the
    # unpartitioned row_number window is a single tiny partition. The
    # checkpoint matters: sbits is consumed TWICE (r0 and the final
    # label join) and its lineage runs through the seed sort over all
    # of V — uncheckpointed, the second consumer re-ran that sort
    # (round 10: one of the two constants behind the r9 bar miss).
    sw = Window.orderBy(
        F.conv(F.substring(
            F.md5(F.concat(F.col("s").cast("string"),
                           F.lit(f":{_CLOSENESS_SEED_SALT}"))), 1, 15),
            16, 10).cast("bigint"), "s")
    sbits = seeds.select(
        "s", (F.row_number().over(sw) - 1).alias("i")) \
        .localCheckpoint(eager=False)
    r0 = sbits.select(
        F.col("s").alias("v"),
        # SQL form: F.shiftleft's python signature wants a literal count
        F.expr("shiftleft(CAST(1 AS BIGINT), i)").alias("m"))

    def widen(r: DataFrame) -> DataFrame:
        """ball_{d+1} masks = ball_d OR (bit_or of neighbors' ball_d):
        one edge-keyed equi-join + one combinable bit_or fold. The mask
        table is V rows of (bigint, bigint) — broadcast it so the E-row
        edge list never shuffles and the bit_or partial-aggregates
        map-side (the checkpointed mask RDD has no Catalyst stats, so
        without the hint this planned as 3 sort-merge joins re-sorting
        all E rows per level). The hint is SIZE-GATED
        (broadcast_if_bounded, r10): a bare F.broadcast() hard-fails
        past 8 GiB / 512M rows instead of degrading, so the
        hash-join-at-scale path only exists because the gate lifts
        the hint past the V bound — the per-level cost stays O(E)
        either way."""
        contrib = (p1.join(broadcast_if_bounded(
                       r.select(F.col("v").alias("u"), "m"), sf_dir), "u")
                   .select("v", "m"))
        return (contrib.unionAll(r)
                .groupBy("v")
                .agg(F.bit_or("m").alias("m")))

    r1 = widen(r0).localCheckpoint(eager=False)   # reused: widen + fold
    r2 = widen(r1).localCheckpoint(eager=False)
    r3 = widen(r2)

    # masks only GROW (widen ORs the prior level in), so the exact shell
    # sizes are first differences of ball sizes: n_d = |ball_d| −
    # |ball_{d-1}|, with |ball_0| = 1 (the seed itself) — no per-vertex
    # level reconstruction join needed. All three level counts fold in
    # ONE bounded 32-position explode + one combinable shuffle.
    balls = (r1.select(F.lit(1).alias("lv"), "m")
             .unionAll(r2.select(F.lit(2).alias("lv"), "m"))
             .unionAll(r3.select(F.lit(3).alias("lv"), "m"))
             .select("lv",
                     F.explode(F.sequence(
                         F.lit(0), F.lit(_CLOSENESS_SEEDS - 1))).alias("i"),
                     F.expr("shiftright(m, i) & CAST(1 AS BIGINT)")
                     .alias("b")))
    c = (balls.groupBy("i")
         .agg(F.sum(F.when(F.col("lv") == 1, F.col("b")))
              .cast("bigint").alias("c1"),
              F.sum(F.when(F.col("lv") == 2, F.col("b")))
              .cast("bigint").alias("c2"),
              F.sum(F.when(F.col("lv") == 3, F.col("b")))
              .cast("bigint").alias("c3"))
         .join(F.broadcast(sbits), "i")
         .select(F.col("s"),
                 (F.col("c1") - 1).cast("bigint").alias("n1"),
                 (F.col("c2") - F.col("c1")).cast("bigint").alias("n2"),
                 (F.col("c3") - F.col("c2")).cast("bigint").alias("n3")))
    harm = (F.col("n1").cast("double") + F.col("n2").cast("double") / 2.0
            + F.col("n3").cast("double") / 3.0)
    return (c.select(F.col("s").cast("bigint").alias("partkey"),
                     "n1", "n2", "n3",
                     F.round(harm, 6).alias("harmonic_3"))
            .orderBy(F.col("harmonic_3").desc(), "partkey"))


# ---------------------------------------------------------------------------
# hapax-legomena / type-token profile per source
# ---------------------------------------------------------------------------

_HAPAX_ORACLE = """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
), tg AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax,
       round(CAST(COUNT(*) FILTER (WHERE c = 1) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_ratio,
       round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
         AS type_token_ratio
FROM tg GROUP BY source ORDER BY source
"""


@register("llm_hapax_ratio_per_source", oracle=_HAPAX_ORACLE)
def llm_hapax_ratio_per_source(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Hapax-legomena share and type/token ratio per source feed — the
    lexical-freshness profile between llm_zipf_fit (the law) and
    llm_vocab_growth_heaps (the curve): a source whose hapax share
    collapses is recycling text (bot/boilerplate feeds score low, fresh
    human text keeps ~40–60%% singletons), making this a per-SOURCE
    crawl-quality gate. Counts are exact: one (source, token) fold,
    then one per-source fold over the type table.

    Scale shape: one token-grain combinable groupBy (the vocabulary
    table), one source-grain fold — the corpus is scanned once; no
    windows, no joins."""
    d = load_table(spark, "documents", sf_dir)
    tg = (d.select("source", F.explode(F.split("text", " ")).alias("tok"))
          .groupBy("source", "tok")
          .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    return (tg.groupBy("source")
            .agg(F.sum("c").cast("bigint").alias("n_tokens"),
                 F.count(F.lit(1)).cast("bigint").alias("n_types"),
                 F.count(F.when(F.col("c") == 1, 1)).cast("bigint")
                 .alias("n_hapax"))
            .select("source", "n_tokens", "n_types", "n_hapax",
                    F.round(F.col("n_hapax").cast("double")
                            / F.col("n_types").cast("double"), 6)
                    .alias("hapax_ratio"),
                    F.round(F.col("n_types").cast("double")
                            / F.col("n_tokens").cast("double"), 6)
                    .alias("type_token_ratio"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# geometric / harmonic means via domain collapse
# ---------------------------------------------------------------------------

_GEO_HARM_ORACLE = """
WITH dom AS (
  SELECT event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS xc,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE CAST(round(value * 100, 0) AS BIGINT) > 0
  GROUP BY event_type, CAST(round(value * 100, 0) AS BIGINT)
), s AS (
  SELECT event_type,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(xc * c) AS BIGINT) AS sx,
         CAST(SUM(c * CAST(round(ln(CAST(xc AS DOUBLE)) * 1000000.0, 0)
                           AS BIGINT)) AS BIGINT) AS slnq,
         CAST(SUM(c * CAST(round(1000000000000.0 / CAST(xc AS DOUBLE), 0)
                           AS BIGINT)) AS BIGINT) AS sinvq
  FROM dom GROUP BY event_type
)
SELECT event_type, n,
       round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6)
         AS arith_mean_cents,
       round(exp(CAST(slnq AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0), 6)
         AS geo_mean_cents,
       round(CAST(n AS DOUBLE) * 1000000000000.0 / CAST(sinvq AS DOUBLE), 6)
         AS harm_mean_cents
FROM s ORDER BY event_type
"""


@register("agg_geometric_harmonic_mean", oracle=_GEO_HARM_ORACLE)
def agg_geometric_harmonic_mean(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The full Pythagorean-means panel per event type (harmonic ≤
    geometric ≤ arithmetic): geometric mean = exp(Σln x / n), harmonic
    = n/Σ(1/x) — the right locations for RATE- and RATIO-shaped data
    the plain mean overstates. Both transcendental folds collapse to
    the bounded CENTS DOMAIN first (one ln / one reciprocal per
    DISTINCT value, quantized to fixed-point integers, then weighted
    by exact counts), so the corpus-side fold is a plain BIGINT sum —
    no float-order hazard and only ~49k ln calls at ANY corpus size.
    Both means are defined only on the POSITIVE support, so zero-cent
    events (ln 0 = −∞, 1/0 undefined; sf0.1 carries six of them) are
    excluded from the panel in both engines — n counts priced events.

    Scale shape: one combinable (type, value) domain collapse, one
    5-group fold; corpus scanned once."""
    ev = load_table(spark, "events", sf_dir)
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    dom = (ev.select("event_type", xc.alias("xc"))
           .where(F.col("xc") > 0)
           .groupBy("event_type", "xc")
           .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    lnq = F.round(F.log(F.col("xc").cast("double")) * 1000000.0, 0) \
        .cast("bigint")
    invq = F.round(F.lit(1000000000000.0) / F.col("xc").cast("double"), 0) \
        .cast("bigint")
    s = (dom.groupBy("event_type")
         .agg(F.sum("c").cast("bigint").alias("n"),
              F.sum(F.col("xc") * F.col("c")).cast("bigint").alias("sx"),
              F.sum(F.col("c") * lnq).cast("bigint").alias("slnq"),
              F.sum(F.col("c") * invq).cast("bigint").alias("sinvq")))
    nd = F.col("n").cast("double")
    return (s.select(
        "event_type", "n",
        F.round(F.col("sx").cast("double") / nd, 6)
        .alias("arith_mean_cents"),
        F.round(F.exp(F.col("slnq").cast("double") / nd / 1000000.0), 6)
        .alias("geo_mean_cents"),
        F.round(nd * 1000000000000.0 / F.col("sinvq").cast("double"), 6)
        .alias("harm_mean_cents"))
        .orderBy("event_type"))


# ---------------------------------------------------------------------------
# schema drift audit (actual parquet schema vs frozen expected spec)
# ---------------------------------------------------------------------------

# frozen expected contract for the events feed: session_id is
# deliberately expected-but-absent and value is expected decimal(10,2)
# but lands as double, so both failure classes demonstrably fire;
# props is deliberately NOT in the spec, so the extra-column class
# fires too.
_EXPECTED_EVENTS_SPEC = (
    ("event_id", "bigint"),
    ("ts", "timestamp_ntz"),  # parquet isAdjustedToUTC=false => NTZ
    ("user_id", "bigint"),
    ("event_type", "string"),
    ("value", "decimal(10,2)"),
    ("session_id", "string"),
)

_SCHEMA_DRIFT_ORACLE = """
SELECT * FROM (VALUES
  ('event_id',   'bigint',        'bigint',    'ok'),
  ('event_type', 'string',        'string',    'ok'),
  ('props',      NULL,            'string',    'extra'),
  ('session_id', 'string',        NULL,        'missing'),
  ('ts',         'timestamp_ntz', 'timestamp_ntz', 'ok'),
  ('user_id',    'bigint',        'bigint',    'ok'),
  ('value',      'decimal(10,2)', 'double',    'type_mismatch')
) AS t(column_name, expected_type, actual_type, status)
ORDER BY column_name
"""


@register("dq_schema_drift_report", oracle=_SCHEMA_DRIFT_ORACLE)
def dq_schema_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift audit of the events feed against a FROZEN expected
    contract: per column, ok / type_mismatch / missing / extra — the
    catch-it-before-the-job-fails gate an ingestion pipeline runs when
    an upstream producer redeploys (the top real-world cause of silent
    batch corruption; dq_expectations_report audits VALUES, this audits
    the SHAPE). The actual schema is read from the parquet footer
    (self-describing, NOT the engine's explicit load schema — drift
    detection must see what the producer wrote); the spec deliberately
    disagrees in all three failure classes so each detector
    demonstrably fires.

    Scale shape: pure metadata — one parquet-footer read on the
    driver, zero data rows scanned; the report is ≤|columns| rows."""
    import os

    actual = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")).schema
    act = {f.name: f.dataType.simpleString() for f in actual.fields}
    exp = dict(_EXPECTED_EVENTS_SPEC)
    rows = []
    for col in sorted(set(act) | set(exp)):
        e, a = exp.get(col), act.get(col)
        status = ("missing" if a is None else
                  "extra" if e is None else
                  "ok" if e == a else "type_mismatch")
        rows.append((col, e, a, status))
    return spark.createDataFrame(
        rows, "column_name string, expected_type string, "
              "actual_type string, status string").orderBy("column_name")


# ===========================================================================
# round-7 ninth ring
# ===========================================================================

# ---------------------------------------------------------------------------
# Granger causality (lag-1) between click and purchase revenue
# ---------------------------------------------------------------------------

# asymptotic F(1, inf) = chi-square(1) upper 5% point, frozen
_GRANGER_F_95 = 3.841458820694124

_GRANGER_ORACLE = f"""
WITH d AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS p,
         CAST(SUM(CASE WHEN event_type = 'click'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS c
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
), l AS (
  SELECT p AS y,
         lag(p) OVER (ORDER BY day) AS x1,
         lag(c) OVER (ORDER BY day) AS x2
  FROM d
), q AS (
  SELECT y, x1, x2 FROM l WHERE x1 IS NOT NULL
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
         CAST(SUM(CAST(x1 AS DECIMAL(38,0)) * x1) AS DECIMAL(38,0)) AS s11,
         CAST(SUM(CAST(x2 AS DECIMAL(38,0)) * x2) AS DECIMAL(38,0)) AS s22,
         CAST(SUM(CAST(x1 AS DECIMAL(38,0)) * x2) AS DECIMAL(38,0)) AS s12,
         CAST(SUM(CAST(x1 AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS s1y,
         CAST(SUM(CAST(x2 AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS s2y
  FROM q
), m AS (
  -- centered normal equations, every input exact; doubles only here
  SELECT n, sy, s1, s2,
         CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS a11,
         CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
           - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS a22,
         CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
           - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS a12,
         CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE)
           - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS b1,
         CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE)
           - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS b2
  FROM s
), co AS (
  SELECT n, sy, s1, s2, a11, b1,
         (b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12) AS bu1,
         (a11 * b2 - a12 * b1) / (a11 * a22 - a12 * a12) AS bu2,
         b1 / a11 AS br1
  FROM m
), fit AS (
  SELECT co.n, co.bu1, co.bu2, co.br1,
         (CAST(co.sy AS DOUBLE) - co.bu1 * CAST(co.s1 AS DOUBLE)
          - co.bu2 * CAST(co.s2 AS DOUBLE)) / CAST(co.n AS DOUBLE) AS au,
         (CAST(co.sy AS DOUBLE) - co.br1 * CAST(co.s1 AS DOUBLE))
           / CAST(co.n AS DOUBLE) AS ar
  FROM co
), r AS (
  SELECT fit.n, fit.bu1, fit.bu2,
         CAST(SUM(CAST(CAST(round(CAST(q.y AS DOUBLE) - fit.au
                                  - fit.bu1 * CAST(q.x1 AS DOUBLE)
                                  - fit.bu2 * CAST(q.x2 AS DOUBLE), 0)
                            AS BIGINT) AS DECIMAL(38,0))
                  * CAST(round(CAST(q.y AS DOUBLE) - fit.au
                               - fit.bu1 * CAST(q.x1 AS DOUBLE)
                               - fit.bu2 * CAST(q.x2 AS DOUBLE), 0)
                         AS BIGINT)) AS DECIMAL(38,0)) AS sse_u,
         CAST(SUM(CAST(CAST(round(CAST(q.y AS DOUBLE) - fit.ar
                                  - fit.br1 * CAST(q.x1 AS DOUBLE), 0)
                            AS BIGINT) AS DECIMAL(38,0))
                  * CAST(round(CAST(q.y AS DOUBLE) - fit.ar
                               - fit.br1 * CAST(q.x1 AS DOUBLE), 0)
                         AS BIGINT)) AS DECIMAL(38,0)) AS sse_r
  FROM q CROSS JOIN fit
  GROUP BY fit.n, fit.bu1, fit.bu2
)
SELECT n AS n_obs,
       round(bu1, 6) AS own_lag_coef,
       round(bu2, 6) AS click_lag_coef,
       round((CAST(sse_r AS DOUBLE) - CAST(sse_u AS DOUBLE))
             / (CAST(sse_u AS DOUBLE) / CAST(n - 3 AS DOUBLE)), 6)
         AS f_stat,
       (CAST(sse_r AS DOUBLE) - CAST(sse_u AS DOUBLE))
         / (CAST(sse_u AS DOUBLE) / CAST(n - 3 AS DOUBLE))
         > {_GRANGER_F_95!r} AS clicks_granger_cause_purchases
FROM r
"""


@register("ts_granger_lag1", oracle=_GRANGER_ORACLE)
def ts_granger_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger causality: do yesterday's CLICK cents help predict
    today's PURCHASE cents beyond purchases' own lag? F-test of the
    restricted (own-lag-only) vs unrestricted (+ click lag) regression
    — the predictive-precedence readout behind ts_xcorr_lead_lag's
    descriptive correlations. The 2-regressor OLS is solved in CLOSED
    FORM from centered normal equations whose inputs are all exact
    BIGINT/decimal(38,0) sums over the calendar-bounded daily domain;
    both models' residuals quantize to whole cents so the two SSEs are
    exact integer folds; the F decision uses the frozen asymptotic
    F(1,∞)=χ²₁ 5%% point (documented large-n choice).

    Scale shape: one daily two-series fold (≤366 rows at any corpus
    size), one lag window on the bounded domain, one broadcast
    coefficient row, one residual fold."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    d = (ev.select(F.date_trunc("day", F.col("ts")).alias("day"),
                   F.when(F.col("event_type") == "purchase", cents)
                   .otherwise(F.lit(0)).alias("pc"),
                   F.when(F.col("event_type") == "click", cents)
                   .otherwise(F.lit(0)).alias("cc"))
         .groupBy("day")
         .agg(F.sum("pc").cast("bigint").alias("p"),
              F.sum("cc").cast("bigint").alias("c")))
    w = Window.orderBy("day")
    q = (d.select(F.col("p").alias("y"),
                  F.lag("p").over(w).alias("x1"),
                  F.lag("c").over(w).alias("x2"))
         .where(F.col("x1").isNotNull()))
    dec = lambda col: F.col(col).cast("decimal(38,0)")
    s = q.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
              F.sum("y").cast("bigint").alias("sy"),
              F.sum("x1").cast("bigint").alias("s1"),
              F.sum("x2").cast("bigint").alias("s2"),
              F.sum(dec("x1") * F.col("x1")).cast("decimal(38,0)")
              .alias("s11"),
              F.sum(dec("x2") * F.col("x2")).cast("decimal(38,0)")
              .alias("s22"),
              F.sum(dec("x1") * F.col("x2")).cast("decimal(38,0)")
              .alias("s12"),
              F.sum(dec("x1") * F.col("y")).cast("decimal(38,0)")
              .alias("s1y"),
              F.sum(dec("x2") * F.col("y")).cast("decimal(38,0)")
              .alias("s2y"))
    nd = F.col("n").cast("double")
    dbl = lambda col: F.col(col).cast("double")
    a11 = nd * dbl("s11") - dbl("s1") * dbl("s1")
    a22 = nd * dbl("s22") - dbl("s2") * dbl("s2")
    a12 = nd * dbl("s12") - dbl("s1") * dbl("s2")
    b1 = nd * dbl("s1y") - dbl("s1") * dbl("sy")
    b2 = nd * dbl("s2y") - dbl("s2") * dbl("sy")
    det = a11 * a22 - a12 * a12
    bu1 = (b1 * a22 - b2 * a12) / det
    bu2 = (a11 * b2 - a12 * b1) / det
    br1 = b1 / a11
    au = (dbl("sy") - bu1 * dbl("s1") - bu2 * dbl("s2")) / nd
    ar = (dbl("sy") - br1 * dbl("s1")) / nd
    co = s.select("n", bu1.alias("bu1"), bu2.alias("bu2"),
                  br1.alias("br1"), au.alias("au"), ar.alias("ar"))
    eu = F.round(F.col("y").cast("double") - F.col("au")
                 - F.col("bu1") * F.col("x1").cast("double")
                 - F.col("bu2") * F.col("x2").cast("double"), 0) \
        .cast("bigint")
    er = F.round(F.col("y").cast("double") - F.col("ar")
                 - F.col("br1") * F.col("x1").cast("double"), 0) \
        .cast("bigint")
    r = (q.crossJoin(F.broadcast(co))
         .groupBy("n", "bu1", "bu2")
         .agg(F.sum(eu.cast("decimal(38,0)") * eu)
              .cast("decimal(38,0)").alias("sse_u"),
              F.sum(er.cast("decimal(38,0)") * er)
              .cast("decimal(38,0)").alias("sse_r")))
    f = ((F.col("sse_r").cast("double") - F.col("sse_u").cast("double"))
         / (F.col("sse_u").cast("double")
            / (F.col("n") - 3).cast("double")))
    return r.select(
        F.col("n").alias("n_obs"),
        F.round(F.col("bu1"), 6).alias("own_lag_coef"),
        F.round(F.col("bu2"), 6).alias("click_lag_coef"),
        F.round(f, 6).alias("f_stat"),
        (f > F.lit(_GRANGER_F_95)).alias("clicks_granger_cause_purchases"))


# ---------------------------------------------------------------------------
# cost-sensitive operating point over the threshold sweep
# ---------------------------------------------------------------------------

# frozen unit costs in cents: a false positive wastes a 100-cent
# incentive, a missed purchase forgoes 400 cents of margin
_COST_FP = 100
_COST_FN = 400

_COST_CURVE_ORACLE = f"""
WITH c AS (
  SELECT event_type = 'purchase' AS pos,
         CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events WHERE event_type IN ('click', 'purchase')
), thr AS (
  SELECT CAST(r * 5000 AS BIGINT) AS thr FROM range(1, 10) AS t(r)
), cells AS (
  SELECT thr,
         CAST(COUNT(*) FILTER (WHERE NOT pos AND xc >= thr) AS BIGINT)
           AS fp,
         CAST(COUNT(*) FILTER (WHERE pos AND xc < thr) AS BIGINT) AS fn
  FROM c CROSS JOIN thr GROUP BY thr
), costed AS (
  SELECT thr, fp, fn,
         {_COST_FP} * fp + {_COST_FN} * fn AS expected_cost_cents
  FROM cells
)
SELECT thr, fp, fn, expected_cost_cents,
       expected_cost_cents = (SELECT MIN(expected_cost_cents) FROM costed)
         AS is_min_cost
FROM costed ORDER BY thr
"""


@register("ml_cost_curve_threshold", oracle=_COST_CURVE_ORACLE)
def ml_cost_curve_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-sensitive operating point: expected misclassification cost
    100·FP + 400·FN cents (frozen asymmetric cost matrix) at each of
    the nine sweep thresholds, with the cost-minimizing row flagged — the
    business-decision layer above ml_optimal_f1_threshold (F1 weighs
    the two error types equally; deployments almost never do, and the
    frozen asymmetric cost matrix is exactly how that enters). Every
    quantity is an exact integer: counts from one conditional fold,
    costs pure integer arithmetic, argmin by integer comparison
    against a broadcast 1-row minimum.

    Scale shape: the ×9 sweep is one broadcast-spine conditional fold
    (one corpus pass); the min is a 9-row fold broadcast back."""
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
             .agg(F.count(F.when(~F.col("pos") & pred, 1)).cast("bigint")
                  .alias("fp"),
                  F.count(F.when(F.col("pos") & ~pred, 1)).cast("bigint")
                  .alias("fn")))
    costed = cells.select(
        "thr", "fp", "fn",
        (F.lit(_COST_FP) * F.col("fp") + F.lit(_COST_FN) * F.col("fn"))
        .alias("expected_cost_cents"))
    mn = costed.agg(F.min("expected_cost_cents").alias("mc"))
    return (costed.crossJoin(F.broadcast(mn))
            .select("thr", "fp", "fn", "expected_cost_cents",
                    (F.col("expected_cost_cents") == F.col("mc"))
                    .alias("is_min_cost"))
            .orderBy("thr"))


# ---------------------------------------------------------------------------
# daily volume anomaly monitor (trailing-median robust flag)
# ---------------------------------------------------------------------------

_VOLUME_ANOMALY_ORACLE = """
WITH d AS (
  SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), t AS (
  SELECT day, cnt,
         median(cnt) OVER (ORDER BY day
                           ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
           AS trail_med,
         CAST(COUNT(*) OVER (ORDER BY day
                             ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
              AS BIGINT) AS n_trail
  FROM d
)
SELECT day, cnt, round(trail_med, 6) AS trail_median,
       2.0 * abs(CAST(cnt AS DOUBLE) - trail_med) > trail_med AS is_anomaly
FROM t WHERE n_trail = 7 ORDER BY day
"""


@register("dq_volume_anomaly_daily", oracle=_VOLUME_ANOMALY_ORACLE)
def dq_volume_anomaly_daily(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Daily ingest-volume anomaly monitor: each day's event count vs
    the TRAILING 7-day median (excluding today — yesterday's outage
    must not defend today's), flagged when the deviation exceeds half
    the median — the robust feed-is-broken alarm next to
    dq_freshness_lag's feed-is-stale one (medians shrug off the single
    spike that would poison a trailing MEAN). Counts are exact; the
    7-element frame median is exact in double (odd frame picks the
    middle integer, the warm-up's even frames interpolate two integers
    identically in both engines); the flag is the same
    cross-multiplied comparison in both.

    Scale shape: calendar-bounded daily fold (≤366 rows at any corpus
    size); one sliding frame over the bounded domain; warm-up days
    (fewer than 7 trailing observations) are excluded — the monitor
    only speaks once it has a full baseline week."""
    ev = load_table(spark, "events", sf_dir)
    d = (ev.select(F.date_trunc("day", F.col("ts")).alias("day"))
         .groupBy("day")
         .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))
    wf = Window.orderBy("day").rowsBetween(-7, -1)
    t = d.select(
        "day", "cnt",
        F.expr("percentile(cnt, 0.5)").over(wf).alias("trail_med"),
        F.count(F.lit(1)).over(wf).cast("bigint").alias("n_trail"))
    flag = (2.0 * F.abs(F.col("cnt").cast("double") - F.col("trail_med"))
            > F.col("trail_med"))
    return (t.where(F.col("n_trail") == 7)
            .select("day", "cnt",
                    F.round("trail_med", 6).alias("trail_median"),
                    flag.alias("is_anomaly"))
            .orderBy("day"))


# ===========================================================================
# round-7 tenth ring
# ===========================================================================

# ---------------------------------------------------------------------------
# local bridges (Granovetter weak ties)
# ---------------------------------------------------------------------------

_LOCAL_BRIDGES_ORACLE = """
WITH raw AS (
  SELECT l_partkey AS src,
         lead(l_partkey) OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_partkey,
                                        l_suppkey) AS dst
  FROM lineitem
), e0 AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM raw WHERE dst IS NOT NULL AND src <> dst
), adj AS (
  SELECT a AS v, b AS u FROM e0 UNION ALL SELECT b, a FROM e0
), common AS (
  SELECT e0.a, e0.b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM e0
  JOIN adj x ON x.v = e0.a
  JOIN adj y ON y.v = e0.b AND y.u = x.u
  GROUP BY e0.a, e0.b
), flagged AS (
  SELECT e0.a, e0.b,
         COALESCE(common.n_common, 0) = 0 AS is_local_bridge
  FROM e0 LEFT JOIN common ON common.a = e0.a AND common.b = e0.b
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(COUNT(*) FILTER (WHERE is_local_bridge) AS BIGINT)
         AS n_local_bridges,
       round(CAST(COUNT(*) FILTER (WHERE is_local_bridge) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS bridge_share
FROM flagged
"""


@register("graph_local_bridges", oracle=_LOCAL_BRIDGES_ORACLE)
def graph_local_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local bridges in the co-purchase graph: edges whose endpoints
    share NO common neighbor (span > 2) — Granovetter's weak ties, the
    edges whose removal actually lengthens paths, and the structural
    opposite of what graph_triangle_count / clustering_coefficient
    measure (an edge in any triangle can never be a local bridge).
    Common-neighbor counts come from the same wedge join the triangle
    family uses; edges missing from the wedge output have zero common
    neighbors via the LEFT join + COALESCE.

    Scale shape: one wedge equi-join pair (the O(Σdeg²) triangle-count
    budget — the known cost of any common-neighbor statistic, bounded
    by degree-capping at extreme scale) + one combinable edge-grain
    fold to a single summary row."""
    li = load_table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey")
    raw = (li.select(F.col("l_partkey").alias("src"),
                     F.lead("l_partkey").over(w).alias("dst"))
           .where(F.col("dst").isNotNull()
                  & (F.col("src") != F.col("dst"))))
    e0 = (raw.select(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
          .distinct()
          .localCheckpoint(eager=False))  # edge set feeds both sides
    e0 = apply_wedge_degree_cap(e0)  # opt-in hub cut (exact by default)
    # r11 optimization: an edge has a common neighbor iff it lies in a
    # triangle, so the UNORIENTED Σdeg² wedge join this key used to run
    # (edge ⋈ adj ⋈ adj — a ~20M-row intermediate at sf0.1, the family's
    # biggest) is replaced with graph_triangle_count's degree-ordered
    # oriented wedge probe (Θ(E^1.5) wedge volume). Each closing wedge
    # credits its three edges; edges never credited are the local
    # bridges — flagged by ONE anti-join instead of a 20M-row groupBy.
    # Same two degree-cap value gates; output values are identical (the
    # per-edge n_common count was only ever compared against 0).
    deg = (e0.select(F.col("a").alias("v")).unionAll(e0.select("b"))
           .groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
           .localCheckpoint(eager=False))
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("d_a"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("d_b"))
    oriented = (e0.join(F.broadcast(da), "a").join(F.broadcast(db), "b")
                .select(F.when((F.col("d_a") < F.col("d_b"))
                               | ((F.col("d_a") == F.col("d_b"))
                                  & (F.col("a") < F.col("b"))),
                               F.struct(F.col("a").alias("u"),
                                        F.col("b").alias("w")))
                        .otherwise(F.struct(F.col("b").alias("u"),
                                            F.col("a").alias("w")))
                        .alias("e"))
                .select("e.u", "e.w")
                .localCheckpoint(eager=False))  # wedge build + probe share it
    e1 = oriented.select(F.col("u").alias("pivot"), F.col("w").alias("x"))
    e2 = oriented.select(F.col("u").alias("pivot"), F.col("w").alias("y"))
    wedges = e1.join(e2, "pivot").where(F.col("x") < F.col("y"))
    probe = oriented.select(F.least("u", "w").alias("x"),
                            F.greatest("u", "w").alias("y"))
    if estimate_rows(sf_dir, "lineitem") <= 10_000_000:
        probe = F.broadcast(probe)
    tri = wedges.join(probe, ["x", "y"])
    credit = (tri.select(F.explode(F.array(
        F.struct(F.least("pivot", "x").alias("a"),
                 F.greatest("pivot", "x").alias("b")),
        F.struct(F.least("pivot", "y").alias("a"),
                 F.greatest("pivot", "y").alias("b")),
        F.struct(F.col("x").alias("a"), F.col("y").alias("b"))))
        .alias("e")).select("e.a", "e.b"))
    bridges = (e0.join(credit, ["a", "b"], "left_anti")
               .agg(F.count(F.lit(1)).cast("bigint")
                    .alias("n_local_bridges")))
    n_edges = e0.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    # try_divide: an empty (e.g. degree-capped or empty-shard) edge set
    # must report NULL share, not raise ANSI DIVIDE_BY_ZERO on 0/0
    return (n_edges.crossJoin(bridges)
            .select("n_edges", "n_local_bridges",
                    F.round(F.try_divide(
                        F.col("n_local_bridges").cast("double"),
                        F.col("n_edges").cast("double")), 6)
                    .alias("bridge_share")))


# ---------------------------------------------------------------------------
# per-user path-entropy histogram
# ---------------------------------------------------------------------------

_PATH_ENTROPY_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
), pairs AS (
  SELECT user_id, event_type || '>' || nxt AS pair
  FROM seq WHERE nxt IS NOT NULL
), pc AS (
  SELECT user_id, pair, CAST(COUNT(*) AS BIGINT) AS c
  FROM pairs GROUP BY user_id, pair
), per_user AS (
  -- H = ln(n) - (1/n) * sum c*ln(c); each c*ln(c) term quantized 1e-6
  SELECT user_id,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000.0, 0)
                           AS BIGINT)) AS BIGINT) AS slc
  FROM pc GROUP BY user_id
), h AS (
  SELECT user_id, n,
         ln(CAST(n AS DOUBLE))
           - CAST(slc AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 AS ent
  FROM per_user WHERE n >= 5
)
SELECT CAST(floor(ent / 0.25) AS BIGINT) AS entropy_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       round(MIN(ent), 6) AS min_entropy,
       round(MAX(ent), 6) AS max_entropy
FROM h GROUP BY CAST(floor(ent / 0.25) AS BIGINT)
ORDER BY entropy_bucket
"""


@register("seq_user_path_entropy", oracle=_PATH_ENTROPY_ORACLE)
def seq_user_path_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of per-user PATH ENTROPY: the Shannon entropy of each
    user's event-type transition distribution (≥5 transitions), bucketed
    at 0.25 nats — the behavioral-diversity readout behind
    seq_markov_transitions' corpus-level chain: bots and single-habit
    users pool near zero, exploratory users near ln(25). Uses the
    plug-in identity H = ln n − (Σ c·ln c)/n so the per-user fold needs
    ONE quantized transcendental per (user, pair) row (exact BIGINT
    sums; ln n enters once per user in the final tree), and the bucket
    is an integer floor.

    Scale shape: one user-partitioned lead window (key-parallel), one
    (user, pair) fold, one user fold, one ≤14-bucket histogram fold —
    no global windows anywhere."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "event_type",
                    F.lead("event_type").over(w).alias("nxt"))
    pairs = (seq.where(F.col("nxt").isNotNull())
             .select("user_id",
                     F.concat("event_type", F.lit(">"), "nxt")
                     .alias("pair")))
    pc = (pairs.groupBy("user_id", "pair")
          .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    lnq = F.round(F.log(F.col("c").cast("double")) * 1000000.0, 0) \
        .cast("bigint")
    per_user = (pc.groupBy("user_id")
                .agg(F.sum("c").cast("bigint").alias("n"),
                     F.sum(F.col("c") * lnq).cast("bigint").alias("slc")))
    ent = (F.log(F.col("n").cast("double"))
           - F.col("slc").cast("double") / F.col("n").cast("double")
             / 1000000.0)
    h = per_user.where(F.col("n") >= 5).select(ent.alias("ent"))
    return (h.groupBy(F.floor(F.col("ent") / 0.25).cast("bigint")
                      .alias("entropy_bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"),
                 F.round(F.min("ent"), 6).alias("min_entropy"),
                 F.round(F.max("ent"), 6).alias("max_entropy"))
            .orderBy("entropy_bucket"))


# ===========================================================================
# round-7 eleventh ring
# ===========================================================================

# ---------------------------------------------------------------------------
# Welch's heteroskedastic one-way ANOVA
# ---------------------------------------------------------------------------

_WELCH_ANOVA_ORACLE = """
WITH c AS (
  SELECT event_type AS t, CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events
), per AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xc) AS BIGINT) AS s1,
         CAST(SUM(CAST(xc AS DECIMAL(38,0)) * xc) AS DECIMAL(38,0)) AS s2
  FROM c GROUP BY t
), g AS (
  SELECT t, n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         CAST(n AS DOUBLE)
           / ((CAST(s2 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) AS w
  FROM per
), f1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         list_sum(list(w ORDER BY t)) AS bigw,
         list_sum(list(w * mu ORDER BY t)) AS swmu
  FROM g
), f2 AS (
  SELECT f1.k, f1.bigw,
         list_sum(list(g.w * (g.mu - f1.swmu / f1.bigw)
                           * (g.mu - f1.swmu / f1.bigw) ORDER BY g.t))
           AS a_term,
         list_sum(list((1.0 - g.w / f1.bigw) * (1.0 - g.w / f1.bigw)
                       / CAST(g.n - 1 AS DOUBLE) ORDER BY g.t)) AS b_term
  FROM g CROSS JOIN f1 GROUP BY f1.k, f1.bigw
)
SELECT k AS n_groups,
       round(a_term / (CAST(k AS DOUBLE) - 1.0)
             / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0)
                      / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
                      * b_term), 6) AS welch_f,
       round((CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
             / (3.0 * b_term), 6) AS df2_welch
FROM f2
"""


@register("stat_welch_anova", oracle=_WELCH_ANOVA_ORACLE)
def stat_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroskedastic one-way ANOVA across the five event
    types — what stat_anova_oneway_f should become once
    stat_bartlett_test says the variances are UNEQUAL (classic ANOVA's
    pooled variance is exactly the assumption Welch drops, weighting
    each group by nᵢ/sᵢ²). Per-group moments are exact
    BIGINT/decimal(38,0); the three cross-group float reductions
    (ΣW, Σw·x̄ and then the A/B terms that depend on them) run as
    FIXED-ORDER 5-term list folds in both engines (the
    stat_anova_oneway_f rule), so no float sum depends on
    partitioning; df₂ = (k²−1)/(3B) is the Welch–Satterthwaite
    denominator d.f.

    Scale shape: one combinable 5-group moment fold; both ordered
    folds run over 5 rows — data-size-free after the first fold."""
    ev = load_table(spark, "events", sf_dir)
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    per = (ev.select(F.col("event_type").alias("t"), xc.alias("xc"))
           .groupBy("t")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("xc").cast("bigint").alias("s1"),
                F.sum(F.col("xc").cast("decimal(38,0)") * F.col("xc"))
                .cast("decimal(38,0)").alias("s2")))
    mu = F.col("s1").cast("double") / F.col("n").cast("double")
    w = (F.col("n").cast("double")
         / ((F.col("s2").cast("double")
             - F.col("s1").cast("double") * F.col("s1").cast("double")
               / F.col("n").cast("double"))
            / (F.col("n") - 1).cast("double")))
    g = per.select("t", "n", mu.alias("mu"), w.alias("w"))

    def ofold(expr, name):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("t"),
                                                 expr.alias("x")))),
            F.lit(0.0), lambda acc, s: acc + s["x"]).alias(name)

    f1 = g.agg(F.count(F.lit(1)).cast("bigint").alias("k"),
               ofold(F.col("w"), "bigw"),
               ofold(F.col("w") * F.col("mu"), "swmu"))
    j = g.crossJoin(F.broadcast(f1))
    mw = F.col("swmu") / F.col("bigw")
    f2 = (j.groupBy("k", "bigw")
          .agg(ofold(F.col("w") * (F.col("mu") - mw)
                     * (F.col("mu") - mw), "a_term"),
               ofold((F.lit(1.0) - F.col("w") / F.col("bigw"))
                     * (F.lit(1.0) - F.col("w") / F.col("bigw"))
                     / (F.col("n") - 1).cast("double"), "b_term")))
    kd = F.col("k").cast("double")
    welch_f = (F.col("a_term") / (kd - 1.0)
               / (F.lit(1.0) + 2.0 * (kd - 2.0) / (kd * kd - 1.0)
                  * F.col("b_term")))
    return f2.select(
        F.col("k").alias("n_groups"),
        F.round(welch_f, 6).alias("welch_f"),
        F.round((kd * kd - 1.0) / (3.0 * F.col("b_term")), 6)
        .alias("df2_welch"))


# ---------------------------------------------------------------------------
# Cronbach's alpha (internal consistency of the five hourly streams)
# ---------------------------------------------------------------------------

_CRONBACH_ORACLE = """
WITH hours AS (
  SELECT DISTINCT date_trunc('hour', ts) AS h FROM events
), types AS (
  SELECT DISTINCT event_type AS t FROM events
), obs AS (
  SELECT date_trunc('hour', ts) AS h, event_type AS t,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT hours.h, types.t, COALESCE(obs.x, 0) AS x
  FROM hours CROSS JOIN types
  LEFT JOIN obs ON obs.h = hours.h AND obs.t = types.t
), item AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS s2
  FROM grid GROUP BY t
), iv AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(MAX(n) AS BIGINT) AS n_obs,
         list_sum(list((CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                          / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)
                       ORDER BY t)) AS sum_item_var
  FROM item
), rowsum AS (
  SELECT h, CAST(SUM(x) AS BIGINT) AS r FROM grid GROUP BY h
), tv AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(r) AS BIGINT) AS s1,
         CAST(SUM(CAST(r AS DECIMAL(38,0)) * r) AS DECIMAL(38,0)) AS s2
  FROM rowsum
)
SELECT iv.k AS k_items, iv.n_obs,
       round(iv.sum_item_var / 10000.0, 6) AS sum_item_var_d2,
       round((CAST(tv.s2 AS DOUBLE)
              - CAST(tv.s1 AS DOUBLE) * CAST(tv.s1 AS DOUBLE)
                / CAST(tv.n AS DOUBLE)) / CAST(tv.n - 1 AS DOUBLE)
             / 10000.0, 6) AS total_var_d2,
       round(CAST(iv.k AS DOUBLE) / (CAST(iv.k AS DOUBLE) - 1.0)
             * (1.0 - iv.sum_item_var
                      / ((CAST(tv.s2 AS DOUBLE)
                          - CAST(tv.s1 AS DOUBLE) * CAST(tv.s1 AS DOUBLE)
                            / CAST(tv.n AS DOUBLE))
                         / CAST(tv.n - 1 AS DOUBLE))), 6)
         AS cronbach_alpha
FROM iv CROSS JOIN tv
"""


@register("stat_cronbach_alpha", oracle=_CRONBACH_ORACLE)
def stat_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha over the five hourly revenue streams treated as
    scale items (observations = hours, items = event types):
    α = k/(k−1)·(1 − Σvarᵢ/var_total) — the do-these-series-move-
    together internal-consistency coefficient psychometrics
    standardized, and in a metrics platform the one-number check that a
    composite 'engagement' index isn't averaging five unrelated
    signals. The hour×type grid is DENSIFIED (missing cells are true
    zeros — both engines build the same cross join), every variance
    comes off exact integer/decimal moments, and the one cross-item
    float sum is the fixed-order 5-term list fold.

    Scale shape: one (hour, type) fold (calendar-bounded output), one
    ≤8784×5 grid, two moment folds — data-size-free after the first
    fold."""
    ev = load_table(spark, "events", sf_dir)
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    obs = (ev.select(F.date_trunc("hour", F.col("ts")).alias("h"),
                     F.col("event_type").alias("t"), xc.alias("c"))
           .groupBy("h", "t")
           .agg(F.sum("c").cast("bigint").alias("x")))
    hours = obs.select("h").distinct()
    types = obs.select("t").distinct()
    grid = (hours.crossJoin(F.broadcast(types))
            .join(obs, ["h", "t"], "left")
            .select("h", "t", F.coalesce("x", F.lit(0)).alias("x"))
            .localCheckpoint(eager=False))  # item + rowsum folds share it
    item = (grid.groupBy("t")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.sum("x").cast("bigint").alias("s1"),
                 F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
                 .cast("decimal(38,0)").alias("s2")))
    var_i = ((F.col("s2").cast("double")
              - F.col("s1").cast("double") * F.col("s1").cast("double")
                / F.col("n").cast("double"))
             / (F.col("n") - 1).cast("double"))
    iv = item.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.max("n").cast("bigint").alias("n_obs"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("t"),
                                                 var_i.alias("v")))),
            F.lit(0.0), lambda acc, s: acc + s["v"]).alias("sum_item_var"))
    rowsum = (grid.groupBy("h")
              .agg(F.sum("x").cast("bigint").alias("r")))
    tv = rowsum.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").cast("bigint").alias("s1"),
        F.sum(F.col("r").cast("decimal(38,0)") * F.col("r"))
        .cast("decimal(38,0)").alias("s2"))
    var_t = ((F.col("s2").cast("double")
              - F.col("s1").cast("double") * F.col("s1").cast("double")
                / F.col("n").cast("double"))
             / (F.col("n") - 1).cast("double"))
    kd = F.col("k").cast("double")
    return (iv.crossJoin(F.broadcast(tv))
            .select(F.col("k").alias("k_items"), "n_obs",
                    F.round(F.col("sum_item_var") / 10000.0, 6)
                    .alias("sum_item_var_d2"),
                    F.round(var_t / 10000.0, 6).alias("total_var_d2"),
                    F.round(kd / (kd - 1.0)
                            * (F.lit(1.0)
                               - F.col("sum_item_var") / var_t), 6)
                    .alias("cronbach_alpha")))


# ---------------------------------------------------------------------------
# cross-language shingle leakage
# ---------------------------------------------------------------------------

_XLANG_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents
), sh AS (
  SELECT DISTINCT doc_id, lang, g
  FROM (
    SELECT doc_id, lang,
           unnest(list_transform(range(1, len(l) - 1),
                                 i -> l[i] || ' ' || l[i + 1] || ' '
                                      || l[i + 2])) AS g
    FROM toks
  )
), agg AS (
  SELECT g, CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM sh GROUP BY g
)
SELECT g AS shingle, n_langs, n_docs
FROM agg WHERE n_langs >= 2
ORDER BY n_langs DESC, n_docs DESC, shingle
LIMIT 10
"""


@register("llm_cross_lang_leakage", oracle=_XLANG_ORACLE)
def llm_cross_lang_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language shingle leakage: 3-token shingles that appear in
    documents of TWO OR MORE languages, top-10 by language spread then
    document reach — the multilingual-corpus contamination check
    llm_contamination_ngram (train-vs-eval) doesn't cover: shared
    boilerplate, code fragments and copy-paste spans that survive
    language routing and make per-language dedup under-count. Exact
    distinct counts per shingle; deterministic (n_langs, n_docs,
    shingle) order.

    Scale shape (r9 rewrite): the per-doc DISTINCT happens MAP-SIDE
    (array_distinct on the shingle array before the explode — a doc's
    repeats never reach a shuffle), so (doc, lang, g) rows are unique by
    construction and the old corpus-wide distinct shuffle disappears;
    the two count-distincts collapse to a two-level exact aggregate
    (docs-per-(g, lang) with map-side combine, then langs = count and
    docs = sum per g — a doc has exactly one lang, so the partition is
    exact). One combinable shuffle + one tiny one instead of
    distinct + Expand double-distinct (4.5 s → ~2 s at sf0.1); top-10
    fuses to TakeOrderedAndProject."""
    d = load_table(spark, "documents", sf_dir)
    # materialize the token array ONCE per row first: referencing the
    # split(...) EXPRESSION inside the transform lambda re-splits the
    # whole text per gram position (O(tokens²) per doc — this exact
    # re-evaluation was the key's original 4.5 s at sf0.1)
    toks = d.select("doc_id", "lang", F.split("text", " ").alias("l"))
    l = F.col("l")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(l) - 2),
        lambda i: F.concat_ws(" ", F.element_at(l, i),
                              F.element_at(l, i + 1),
                              F.element_at(l, i + 2)))
    sh = toks.select("doc_id", "lang",
                     F.explode(F.array_distinct(grams)).alias("g"))
    lvl1 = (sh.groupBy("g", "lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("nd")))
    agg = (lvl1.groupBy("g")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_langs"),
                F.sum("nd").cast("bigint").alias("n_docs")))
    return (agg.where(F.col("n_langs") >= 2)
            .select(F.col("g").alias("shingle"), "n_langs", "n_docs")
            .orderBy(F.col("n_langs").desc(), F.col("n_docs").desc(),
                     "shingle")
            .limit(10))


# ---------------------------------------------------------------------------
# turning-point test of randomness
# ---------------------------------------------------------------------------

_TURNING_ORACLE = """
WITH d AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
), t AS (
  SELECT y,
         lag(y) OVER (ORDER BY day) AS p,
         lead(y) OVER (ORDER BY day) AS nx
  FROM d
), s AS (
  SELECT CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE (p < y AND y > nx)
                                  OR (p > y AND y < nx)) AS BIGINT) AS tp
  FROM t WHERE p IS NOT NULL AND nx IS NOT NULL
)
SELECT n AS n_days, tp AS n_turning_points,
       round(2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0, 6) AS expected_tp,
       round((CAST(tp AS DOUBLE)
              - 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0)
             / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0), 6)
         AS z_stat
FROM s
"""


@register("ts_turning_points_test", oracle=_TURNING_ORACLE)
def ts_turning_points_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point test of randomness on daily purchase revenue: count
    strict local peaks and troughs, compare to the i.i.d. expectation
    2(n−2)/3 with variance (16n−29)/90 — the oscillation-grain
    randomness check beside stat_runs_test_wald_wolfowitz's
    above/below-median runs (turning points see short-period
    oscillation; runs see level persistence). The count is an exact
    integer off one lag/lead window over the calendar-bounded domain;
    the z is a single identical tree.

    Scale shape: ≤366-row daily fold; one bounded-domain window; one
    two-count fold to a single row."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type") == "purchase"))
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    d = (ev.select(F.date_trunc("day", F.col("ts")).alias("day"),
                   cents.alias("c"))
         .groupBy("day")
         .agg(F.sum("c").cast("bigint").alias("y")))
    w = Window.orderBy("day")
    t = d.select("y", F.lag("y").over(w).alias("p"),
                 F.lead("y").over(w).alias("nx"))
    nrow = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    turn = ((F.col("p") < F.col("y")) & (F.col("y") > F.col("nx"))) | \
           ((F.col("p") > F.col("y")) & (F.col("y") < F.col("nx")))
    s = (t.where(F.col("p").isNotNull() & F.col("nx").isNotNull())
         .agg(F.count(F.when(turn, 1)).cast("bigint").alias("tp"))
         .crossJoin(F.broadcast(nrow)))
    nd = F.col("n").cast("double")
    exp_tp = 2.0 * (nd - 2.0) / 3.0
    return s.select(
        F.col("n").alias("n_days"),
        F.col("tp").alias("n_turning_points"),
        F.round(exp_tp, 6).alias("expected_tp"),
        F.round((F.col("tp").cast("double") - exp_tp)
                / F.sqrt((16.0 * nd - 29.0) / 90.0), 6).alias("z_stat"))


# ---------------------------------------------------------------------------
# Fellegi-Sunter record-linkage scoring
# ---------------------------------------------------------------------------

# frozen agreement/disagreement log-odds weights (the m/u ratios a real
# linkage fits by EM; frozen literals keep both engines bit-identical)
_FS_W = {
    "nation": (2.2, -0.8),
    "region": (1.1, -0.5),
    "balance": (1.9, -0.7),
}
_FS_MATCH = 4.0
_FS_POSSIBLE = 0.5
_FS_BAND = 100  # candidate blocking: |Δ acctbal| ≤ 1 dollar buckets

_FS_ORACLE = f"""
WITH k AS (
  SELECT c_custkey, c_mktsegment, c_nationkey,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer
), nr AS (
  SELECT n_nationkey, n_regionkey FROM nation
), a AS (
  SELECT k.c_custkey AS ak, k.c_mktsegment, k.c_nationkey AS an,
         nr.n_regionkey AS ar, k.cents AS ac,
         k.cents // {_FS_BAND} AS bucket
  FROM k JOIN nr ON nr.n_nationkey = k.c_nationkey
), b AS (
  SELECT a.ak AS bk, a.c_mktsegment, a.an AS bn, a.ar AS br,
         a.ac AS bc, a.bucket + off.o AS bucket
  FROM a CROSS JOIN (SELECT unnest([-1, 0, 1]) AS o) AS off
), pairs AS (
  SELECT DISTINCT a.c_mktsegment, a.ak, b.bk,
         a.an = b.bn AS nation_agree,
         a.ar = b.br AS region_agree,
         abs(a.ac - b.bc) <= {_FS_BAND} AS balance_agree
  FROM a JOIN b ON a.c_mktsegment = b.c_mktsegment
                AND a.bucket = b.bucket AND a.ak < b.bk
), scored AS (
  SELECT nation_agree, region_agree, balance_agree,
         (CASE WHEN nation_agree THEN {_FS_W['nation'][0]!r}
               ELSE {_FS_W['nation'][1]!r} END
          + CASE WHEN region_agree THEN {_FS_W['region'][0]!r}
                 ELSE {_FS_W['region'][1]!r} END
          + CASE WHEN balance_agree THEN {_FS_W['balance'][0]!r}
                 ELSE {_FS_W['balance'][1]!r} END) AS fs_score
  FROM pairs
)
SELECT nation_agree, region_agree, balance_agree,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       round(fs_score, 6) AS fs_score,
       CASE WHEN fs_score >= {_FS_MATCH!r} THEN 'match'
            WHEN fs_score >= {_FS_POSSIBLE!r} THEN 'possible'
            ELSE 'non_match' END AS decision
FROM scored
GROUP BY nation_agree, region_agree, balance_agree, fs_score
ORDER BY fs_score DESC, nation_agree, region_agree, balance_agree
"""


@register("er_fellegi_sunter_scores", oracle=_FS_ORACLE)
def er_fellegi_sunter_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter record-linkage scoring over banded candidate
    pairs: each within-segment balance-banded pair gets an agreement
    vector (same nation, same region via the nation→region dim, balance
    within a dollar) and the classic sum of FROZEN log-odds weights,
    then the three-way match / possible / non-match decision — the
    SCORING layer the er_ family's blocking ops
    (er_sorted_neighborhood_pairs, er_blocking_quality_report) feed in
    a real linkage stack. The output is the agreement-PATTERN table
    (≤6 rows: nation⊂region makes two patterns impossible), so every
    count is exact and every score a fixed sum of literals.

    Scale shape: candidates from the banded equi self-join
    (density-bounded per bucket, the join_interval_binned discipline —
    never the quadratic pair space); the region decoration is a
    broadcast dim join; the pattern fold is combinable."""
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("nk"), F.col("n_regionkey").alias("rk"))
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    k = (c.select("c_custkey", "c_mktsegment",
                  F.col("c_nationkey").alias("nat"), cents.alias("cents"))
         .join(F.broadcast(n), F.col("nat") == F.col("nk"))
         .select("c_custkey", "c_mktsegment", "nat",
                 F.col("rk").alias("reg"), "cents"))
    a = k.select("c_mktsegment", F.col("c_custkey").alias("ak"),
                 F.col("nat").alias("an"), F.col("reg").alias("ar"),
                 F.col("cents").alias("ac"),
                 F.floor(F.col("cents") / _FS_BAND).alias("bucket"))
    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    b = (k.select("c_mktsegment", F.col("c_custkey").alias("bk"),
                  F.col("nat").alias("bn"), F.col("reg").alias("br"),
                  F.col("cents").alias("bc"),
                  F.floor(F.col("cents") / _FS_BAND).alias("bb"))
         .select("*", off.alias("o"))
         .select("c_mktsegment", "bk", "bn", "br", "bc",
                 (F.col("bb") + F.col("o")).alias("bucket")))
    pairs = (a.join(b, ["c_mktsegment", "bucket"])
             .where(F.col("ak") < F.col("bk"))
             .select("ak", "bk",
                     (F.col("an") == F.col("bn")).alias("nation_agree"),
                     (F.col("ar") == F.col("br")).alias("region_agree"),
                     (F.abs(F.col("ac") - F.col("bc")) <= _FS_BAND)
                     .alias("balance_agree"))
             .distinct())
    score = (
        F.when(F.col("nation_agree"), F.lit(_FS_W["nation"][0]))
        .otherwise(F.lit(_FS_W["nation"][1]))
        + F.when(F.col("region_agree"), F.lit(_FS_W["region"][0]))
        .otherwise(F.lit(_FS_W["region"][1]))
        + F.when(F.col("balance_agree"), F.lit(_FS_W["balance"][0]))
        .otherwise(F.lit(_FS_W["balance"][1])))
    scored = pairs.select("nation_agree", "region_agree", "balance_agree",
                          score.alias("fs_score"))
    decision = (F.when(F.col("fs_score") >= _FS_MATCH, "match")
                .when(F.col("fs_score") >= _FS_POSSIBLE, "possible")
                .otherwise("non_match"))
    return (scored.groupBy("nation_agree", "region_agree",
                           "balance_agree", "fs_score")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
            .select("nation_agree", "region_agree", "balance_agree",
                    "n_pairs", F.round("fs_score", 6).alias("fs_score"),
                    decision.alias("decision"))
            .orderBy(F.col("fs_score").desc(), "nation_agree",
                     "region_agree", "balance_agree"))


# ===========================================================================
# round-7 thirteenth ring
# ===========================================================================

# ---------------------------------------------------------------------------
# greenlist watermark detection (is this text LLM-generated?)
# ---------------------------------------------------------------------------

# gamma = 1/4 of (prev, cur) bigram hashes land in the greenlist
_WM_GAMMA_DEN = 4
_WM_MIN_T = 20
_WM_SALT = "lts-r7-greenlist"

_WATERMARK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, g.tok, g.pos
  FROM documents,
       LATERAL (SELECT unnest(string_split(text, ' ')) AS tok,
                       generate_subscripts(string_split(text, ' '), 1)
                         AS pos) AS g
), tr AS (
  SELECT doc_id, tok AS cur,
         lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM toks
), flags AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(prev || '|' || cur
                                          || ':{_WM_SALT}'), 1, 8))
              AS BIGINT) % {_WM_GAMMA_DEN} = 0 AS green
  FROM tr WHERE prev IS NOT NULL
), per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS t,
         CAST(COUNT(*) FILTER (WHERE green) AS BIGINT) AS g
  FROM flags GROUP BY doc_id
)
SELECT doc_id, t AS n_transitions, g AS n_green,
       round((CAST(g AS DOUBLE) - 0.25 * CAST(t AS DOUBLE))
             / sqrt(CAST(t AS DOUBLE) * 0.25 * 0.75), 6) AS z_score
FROM per_doc WHERE t >= {_WM_MIN_T}
ORDER BY z_score DESC, doc_id
LIMIT 20
"""


@register("llm_watermark_greenlist_detect", oracle=_WATERMARK_ORACLE)
def llm_watermark_greenlist_detect(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Greenlist watermark detection (the Kirchenbauer-style test a
    pretraining pipeline runs to keep WATERMARKED MODEL OUTPUT out of
    the next training corpus): each bigram hashes into a γ=1/4
    greenlist; a document written by a watermarking sampler
    over-selects green continuations, so its green share z-scores far
    above the (g − γT)/√(Tγ(1−γ)) null. Membership is a deterministic
    md5 bit test — both engines flag the identical bigrams — counts are
    exact, and the top-20 suspect ranking is a total order.

    Scale shape: map-side token explode + one per-doc lag window
    (doc-partitioned, key-parallel), one doc fold; top-20 fuses to
    TakeOrderedAndProject."""
    d = load_table(spark, "documents", sf_dir)
    toks = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    tr = (toks.select("doc_id", F.col("tok").alias("cur"),
                      F.lag("tok").over(w).alias("prev"))
          .where(F.col("prev").isNotNull()))
    green = (F.conv(F.substring(
        F.md5(F.concat(F.col("prev"), F.lit("|"), F.col("cur"),
                       F.lit(f":{_WM_SALT}"))), 1, 8), 16, 10)
        .cast("bigint") % _WM_GAMMA_DEN == 0)
    per_doc = (tr.select("doc_id", green.alias("green"))
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).cast("bigint").alias("t"),
                    F.count(F.when(F.col("green"), 1)).cast("bigint")
                    .alias("g")))
    td = F.col("t").cast("double")
    z = (F.col("g").cast("double") - 0.25 * td) / F.sqrt(td * 0.25 * 0.75)
    return (per_doc.where(F.col("t") >= _WM_MIN_T)
            .select("doc_id", F.col("t").alias("n_transitions"),
                    F.col("g").alias("n_green"),
                    F.round(z, 6).alias("z_score"))
            .orderBy(F.col("z_score").desc(), "doc_id")
            .limit(20))


# ---------------------------------------------------------------------------
# next-event prediction evaluation (Markov argmax accuracy)
# ---------------------------------------------------------------------------

_NEXT_EVENT_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type AS cur,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
), tr AS (
  SELECT prev, cur FROM seq WHERE prev IS NOT NULL
), matrix AS (
  SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS c
  FROM tr GROUP BY prev, cur
), pred AS (
  SELECT prev, min(cur) AS predicted_next
  FROM matrix m
  WHERE c = (SELECT MAX(c) FROM matrix x WHERE x.prev = m.prev)
  GROUP BY prev
), scored AS (
  SELECT tr.prev, CAST(COUNT(*) AS BIGINT) AS n_transitions,
         CAST(COUNT(*) FILTER (WHERE tr.cur = pred.predicted_next)
              AS BIGINT) AS n_correct
  FROM tr JOIN pred ON pred.prev = tr.prev
  GROUP BY tr.prev
)
SELECT scored.prev AS prev_type, pred.predicted_next,
       scored.n_transitions, scored.n_correct,
       round(CAST(scored.n_correct AS DOUBLE)
             / CAST(scored.n_transitions AS DOUBLE), 6) AS accuracy
FROM scored JOIN pred ON pred.prev = scored.prev
ORDER BY prev_type
"""


@register("seq_next_event_prediction_eval", oracle=_NEXT_EVENT_ORACLE)
def seq_next_event_prediction_eval(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Backtest of the Markov next-event baseline: predict each user's
    next event type as the ARGMAX of the global transition matrix
    (lexicographic tie-break) and score per-antecedent accuracy — the
    eval seq_markov_transitions never runs on itself, and the floor any
    fancier sequence model must beat before it ships. Transition
    counts are exact; the argmax is a max-count join with a
    deterministic tie-break; accuracy is one division.

    Scale shape: one user-partitioned lag window (key-parallel), one
    ≤25-row matrix fold, a broadcast argmax join back onto the
    transition stream, one 5-row fold."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (ev.select(F.col("event_type").alias("cur"),
                    F.lag("event_type").over(w).alias("prev"))
          .where(F.col("prev").isNotNull())
          .localCheckpoint(eager=False))  # matrix + scoring share it
    matrix = (tr.groupBy("prev", "cur")
              .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    mx = matrix.groupBy("prev").agg(F.max("c").alias("mc"))
    pred = (matrix.join(mx, "prev")
            .where(F.col("c") == F.col("mc"))
            .groupBy("prev")
            .agg(F.min("cur").alias("predicted_next")))
    scored = (tr.join(F.broadcast(pred), "prev")
              .groupBy("prev", "predicted_next")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
                   F.count(F.when(F.col("cur") == F.col("predicted_next"),
                                  1)).cast("bigint").alias("n_correct")))
    return (scored.select(
        F.col("prev").alias("prev_type"), "predicted_next",
        "n_transitions", "n_correct",
        F.round(F.col("n_correct").cast("double")
                / F.col("n_transitions").cast("double"), 6)
        .alias("accuracy"))
        .orderBy("prev_type"))


# ---------------------------------------------------------------------------
# equi-depth histogram (the ANALYZE-statistics shape)
# ---------------------------------------------------------------------------

_EQUI_DEPTH_ORACLE = """
WITH dom AS (
  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
), cum AS (
  SELECT v, c,
         CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cc,
         (SELECT CAST(SUM(c) AS BIGINT) FROM dom) AS n
  FROM dom
), buckets AS (
  SELECT b.b,
         CAST(MIN(cum.v) FILTER (
              WHERE cum.cc >= (b.b * cum.n + 9) // 10) AS BIGINT)
           AS upper_cents,
         CAST(MIN(cum.cc) FILTER (
              WHERE cum.cc >= (b.b * cum.n + 9) // 10) AS BIGINT)
           AS cum_rows
  FROM cum CROSS JOIN (SELECT CAST(unnest(range(1, 11)) AS BIGINT) AS b)
                      AS b
  GROUP BY b.b
)
SELECT b AS bucket, upper_cents, cum_rows,
       cum_rows - COALESCE(lag(cum_rows) OVER (ORDER BY b), 0)
         AS bucket_rows
FROM buckets ORDER BY bucket
"""


@register("agg_histogram_equi_depth", oracle=_EQUI_DEPTH_ORACLE)
def agg_histogram_equi_depth(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) 10-bucket histogram of order totals —
    the statistic ANALYZE builds for selectivity estimation (equi-WIDTH
    histograms, agg_hist_fixed_buckets, lie under skew; equi-depth
    puts the resolution where the data is). Boundaries are ACTUAL data
    values picked by the exact integer ceil-rank identity over the
    bounded cents DOMAIN (the agg_percentile_disc_exact discipline at
    ×10), so there is no interpolation and no global row ranking;
    per-bucket row counts difference the cumulative picks.

    Scale shape: one combinable domain collapse, one cumulative window
    over the bounded domain, a ×10 broadcast-spine conditional-MIN
    fold, one 10-row lag."""
    o = load_table(spark, "orders", sf_dir)
    v = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    dom = (o.select(v.alias("v"))
           .groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    wd = (Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = dom.agg(F.sum("c").cast("bigint").alias("n"))
    cum = (dom.select("v", F.sum("c").over(wd).cast("bigint").alias("cc"))
           .crossJoin(F.broadcast(tot)))
    spine = spark.range(1, 11).select(F.col("id").alias("b"))
    thresh = F.expr("(b * n + 9) div 10")
    buckets = (cum.crossJoin(F.broadcast(spine))
               .groupBy("b")
               .agg(F.min(F.when(F.col("cc") >= thresh, F.col("v")))
                    .cast("bigint").alias("upper_cents"),
                    F.min(F.when(F.col("cc") >= thresh, F.col("cc")))
                    .cast("bigint").alias("cum_rows")))
    wl = Window.orderBy("b")
    return (buckets.select(
        F.col("b").alias("bucket"), "upper_cents", "cum_rows",
        (F.col("cum_rows")
         - F.coalesce(F.lag("cum_rows").over(wl), F.lit(0)))
        .alias("bucket_rows"))
        .orderBy("bucket"))


# ===========================================================================
# round-7 fourteenth ring
# ===========================================================================

# ---------------------------------------------------------------------------
# budgeted top-quality corpus selection
# ---------------------------------------------------------------------------

# select the highest-quality documents until 30% of corpus tokens are used
_BUDGET_NUM, _BUDGET_DEN = 3, 10

_BUDGET_SELECT_ORACLE = f"""
WITH q AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         (1000000 * CAST(len(list_distinct(string_split(text, ' ')))
                         AS BIGINT))
           // CAST(len(string_split(text, ' ')) AS BIGINT) AS qual
  FROM documents
), tot AS (
  SELECT CAST(SUM(n_tok) AS BIGINT) AS total_tok,
         CAST(COUNT(*) AS BIGINT) AS total_docs
  FROM q
), ranked AS (
  SELECT doc_id, n_tok, qual,
         CAST(SUM(n_tok) OVER (ORDER BY qual DESC, doc_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_tok
  FROM q
), sel AS (
  SELECT ranked.*, tot.total_tok, tot.total_docs
  FROM ranked CROSS JOIN tot
  WHERE cum_tok <= ({_BUDGET_NUM} * tot.total_tok) // {_BUDGET_DEN}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_selected,
       CAST(MAX(cum_tok) AS BIGINT) AS tokens_selected,
       CAST(MAX(({_BUDGET_NUM} * total_tok) // {_BUDGET_DEN}) AS BIGINT)
         AS budget_tokens,
       round(CAST(MIN(qual) AS DOUBLE) / 1000000.0, 6)
         AS min_quality_selected,
       round(CAST(COUNT(*) AS DOUBLE) / CAST(MAX(total_docs) AS DOUBLE), 6)
         AS doc_share
FROM sel
"""


@register("llm_select_top_quality_budget", oracle=_BUDGET_SELECT_ORACLE)
def llm_select_top_quality_budget(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Budgeted corpus selection: rank every document by an exact
    integer quality key (distinct-token ratio in 1e-6 units — the
    repetition-penalizing core of the quality stack) and keep the best
    until 30% of corpus TOKENS are spent — the greedy
    quality-under-budget step of data mixing (the knapsack a curation
    pipeline actually runs per source before llm_mix_epoch_upsample
    blends them). The global order + running token total come from
    bucketed.py's TWO-PASS bucketed rank (no single-partition window);
    the budget cut and all counts are exact integers.

    Scale shape: map-side quality keys; one bucketed-order pass
    (broadcast range stats + bucket-parallel windows + ≤256-row offset
    join); a broadcast 1-row budget; one fold to a single row."""
    from lambdatotheslaughter_spark.bucketed import bucketed_order

    d = load_table(spark, "documents", sf_dir)
    toks = F.split("text", " ")
    q = d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tok"),
        F.expr("(1000000 * CAST(size(array_distinct(split(text, ' ')))"
               " AS BIGINT)) div CAST(size(split(text, ' ')) AS BIGINT)")
        .alias("qual"))
    tot = q.agg(F.sum("n_tok").cast("bigint").alias("total_tok"),
                F.count(F.lit(1)).cast("bigint").alias("total_docs"))
    ranked = bucketed_order(q, "qual", tiebreaks=("doc_id",),
                            descending=True,
                            cumsum={"cum_tok": "n_tok"})
    sel = (ranked.crossJoin(F.broadcast(tot))
           .where(F.col("cum_tok")
                  <= F.expr(f"({_BUDGET_NUM} * total_tok) "
                            f"div {_BUDGET_DEN}")))
    return sel.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_selected"),
        F.max("cum_tok").cast("bigint").alias("tokens_selected"),
        F.max(F.expr(f"({_BUDGET_NUM} * total_tok) div {_BUDGET_DEN}"))
        .cast("bigint").alias("budget_tokens"),
        F.round(F.min("qual").cast("double") / 1000000.0, 6)
        .alias("min_quality_selected"),
        F.round(F.count(F.lit(1)).cast("double")
                / F.max("total_docs").cast("double"), 6)
        .alias("doc_share"))


# ---------------------------------------------------------------------------
# average-neighbor-degree curve k_nn(k)
# ---------------------------------------------------------------------------

_KNN_DEGREE_ORACLE = """
WITH raw AS (
  SELECT l_partkey AS src,
         lead(l_partkey) OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_partkey,
                                        l_suppkey) AS dst
  FROM lineitem
), e0 AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM raw WHERE dst IS NOT NULL AND src <> dst
), adj AS (
  SELECT a AS v, b AS u FROM e0 UNION ALL SELECT b, a FROM e0
), deg AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS k FROM adj GROUP BY v
), snd AS (
  SELECT adj.v, CAST(SUM(du.k) AS BIGINT) AS sum_nbr_deg
  FROM adj JOIN deg du ON du.v = adj.u
  GROUP BY adj.v
)
SELECT deg.k AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_vertices,
       round(CAST(SUM(snd.sum_nbr_deg) AS DOUBLE)
             / (CAST(deg.k AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)), 6)
         AS avg_neighbor_degree
FROM deg JOIN snd ON snd.v = deg.v
GROUP BY deg.k ORDER BY degree
"""


@register("graph_avg_neighbor_degree", oracle=_KNN_DEGREE_ORACLE)
def graph_avg_neighbor_degree(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Average-neighbor-degree curve k_nn(k) over the co-purchase
    graph: for each degree class, the mean degree of its vertices'
    neighbors — the DETAIL VIEW behind graph_assortativity_degree's
    single coefficient (a falling curve = hubs attach to leaves, the
    disassortative signature; rising = rich-club mixing, read beside
    graph_rich_club_coefficient). Per-vertex neighbor-degree sums are
    exact integer folds off one degree-decorated edge join; the
    per-class mean is one division of exact sums.

    Scale shape: one degree fold, one edge⋈degree equi-join + vertex
    fold (the SpMV shape), one ≤max-degree-row class fold."""
    li = load_table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey")
    raw = (li.select(F.col("l_partkey").alias("src"),
                     F.lead("l_partkey").over(w).alias("dst"))
           .where(F.col("dst").isNotNull()
                  & (F.col("src") != F.col("dst"))))
    e0 = (raw.select(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
          .distinct())
    adj = (e0.select(F.col("a").alias("v"), F.col("b").alias("u"))
           .unionAll(e0.select(F.col("b").alias("v"),
                               F.col("a").alias("u")))
           .localCheckpoint(eager=False))  # degree + SpMV share it
    # r11: the O(V) degree table feeds two subtrees (the SpMV join's
    # u-side and the final per-vertex join) — pin it so the 2E-row
    # degree shuffle runs once per query. Kept after the r12
    # driver-protocol A/B (VERDICT r11 #2, OPTIMIZATION_r12.md): the
    # checkpointed form read at-or-under the uncheckpointed one in
    # every quiet interleaved pair at both 32 and 8 cores.
    deg = (adj.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("k"))
           .localCheckpoint(eager=False))
    snd = (adj.join(deg.select(F.col("v").alias("u"),
                               F.col("k").alias("ku")), "u")
           .groupBy("v")
           .agg(F.sum("ku").cast("bigint").alias("sum_nbr_deg")))
    joined = deg.join(snd, "v")
    return (joined.groupBy("k")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_vertices"),
                 F.sum("sum_nbr_deg").cast("bigint").alias("s"))
            .select(F.col("k").alias("degree"), "n_vertices",
                    F.round(F.col("s").cast("double")
                            / (F.col("k").cast("double")
                               * F.col("n_vertices").cast("double")), 6)
                    .alias("avg_neighbor_degree"))
            .orderBy("degree"))


# ===========================================================================
# round-7 fifteenth ring
# ===========================================================================

# ---------------------------------------------------------------------------
# fixed-effect meta-analysis pooling (inverse-variance)
# ---------------------------------------------------------------------------

_META_Z95 = 1.959963984540054  # frozen two-sided 95% normal quantile

_META_ORACLE = f"""
WITH c AS (
  -- DuckDB dayofweek is 0-based Sunday, Spark is 1-based: +1 aligns
  SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
         event_type = 'click' AS is1,
         CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events WHERE event_type IN ('click', 'purchase')
), per AS (
  SELECT dow,
    CAST(COUNT(*) FILTER (WHERE is1) AS BIGINT) AS n1,
    CAST(SUM(xc) FILTER (WHERE is1) AS BIGINT) AS s1,
    CAST(SUM(CAST(xc AS DECIMAL(38,0)) * xc) FILTER (WHERE is1)
         AS DECIMAL(38,0)) AS ss1,
    CAST(COUNT(*) FILTER (WHERE NOT is1) AS BIGINT) AS n2,
    CAST(SUM(xc) FILTER (WHERE NOT is1) AS BIGINT) AS s2,
    CAST(SUM(CAST(xc AS DECIMAL(38,0)) * xc) FILTER (WHERE NOT is1)
         AS DECIMAL(38,0)) AS ss2
  FROM c GROUP BY dow
), study AS (
  SELECT dow,
         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
           - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS theta,
         ((CAST(ss1 AS DOUBLE)
           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
          / CAST(n1 - 1 AS DOUBLE)) / CAST(n1 AS DOUBLE)
         + ((CAST(ss2 AS DOUBLE)
             - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
               / CAST(n2 AS DOUBLE))
            / CAST(n2 - 1 AS DOUBLE)) / CAST(n2 AS DOUBLE) AS v
  FROM per
), f1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         list_sum(list(1.0 / v ORDER BY dow)) AS sw,
         list_sum(list(theta / v ORDER BY dow)) AS swt
  FROM study
), f2 AS (
  SELECT f1.k, f1.sw, f1.swt,
         list_sum(list((study.theta - f1.swt / f1.sw)
                       * (study.theta - f1.swt / f1.sw) / study.v
                       ORDER BY study.dow)) AS q
  FROM study CROSS JOIN f1 GROUP BY f1.k, f1.sw, f1.swt
)
SELECT k AS k_studies,
       round(swt / sw / 100.0, 6) AS pooled_diff_dollars,
       round((swt / sw - {_META_Z95!r} * sqrt(1.0 / sw)) / 100.0, 6)
         AS ci_lo_dollars,
       round((swt / sw + {_META_Z95!r} * sqrt(1.0 / sw)) / 100.0, 6)
         AS ci_hi_dollars,
       round(q, 6) AS q_heterogeneity,
       round(CASE WHEN q > CAST(k - 1 AS DOUBLE)
                  THEN (q - CAST(k - 1 AS DOUBLE)) / q ELSE 0.0 END, 6)
         AS i_squared
FROM f2
"""


@register("stat_meta_fixed_effect_pool", oracle=_META_ORACLE)
def stat_meta_fixed_effect_pool(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Fixed-effect (inverse-variance) meta-analysis of the
    click-vs-purchase mean gap across seven day-of-week strata treated
    as independent studies: pooled estimate θ̂ = Σwθ/Σw with w = 1/v,
    its 95%% CI (frozen normal quantile), Cochran's heterogeneity Q
    and I² = (Q−(k−1))/Q — the does-the-effect-replicate-across-strata
    machinery every experimentation platform needs once a metric is
    read by segment (and the formal version of eyeballing seven
    per-dow Welch tests). Per-stratum moments are exact
    BIGINT/decimal(38,0); the cross-stratum float reductions are
    FIXED-ORDER 7-term list folds (the stat_welch_anova rule), two
    passes because Q needs θ̂.

    Scale shape: one combinable 7-group six-sum fold; both ordered
    folds run over 7 rows — data-size-free after the first fold."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    is1 = F.col("event_type") == "click"
    per = (ev.select(F.dayofweek("ts").cast("bigint").alias("dow"),
                     is1.alias("is1"), xc.alias("xc"))
           .groupBy("dow")
           .agg(F.count(F.when(F.col("is1"), 1)).cast("bigint").alias("n1"),
                F.sum(F.when(F.col("is1"), F.col("xc"))).cast("bigint")
                .alias("s1"),
                F.sum(F.when(F.col("is1"),
                             F.col("xc").cast("decimal(38,0)")
                             * F.col("xc"))).cast("decimal(38,0)")
                .alias("ss1"),
                F.count(F.when(~F.col("is1"), 1)).cast("bigint")
                .alias("n2"),
                F.sum(F.when(~F.col("is1"), F.col("xc"))).cast("bigint")
                .alias("s2"),
                F.sum(F.when(~F.col("is1"),
                             F.col("xc").cast("decimal(38,0)")
                             * F.col("xc"))).cast("decimal(38,0)")
                .alias("ss2")))
    m1 = F.col("s1").cast("double") / F.col("n1").cast("double")
    m2 = F.col("s2").cast("double") / F.col("n2").cast("double")
    v1 = ((F.col("ss1").cast("double")
           - F.col("s1").cast("double") * F.col("s1").cast("double")
             / F.col("n1").cast("double"))
          / (F.col("n1") - 1).cast("double")) / F.col("n1").cast("double")
    v2 = ((F.col("ss2").cast("double")
           - F.col("s2").cast("double") * F.col("s2").cast("double")
             / F.col("n2").cast("double"))
          / (F.col("n2") - 1).cast("double")) / F.col("n2").cast("double")
    study = per.select("dow", (m1 - m2).alias("theta"),
                       (v1 + v2).alias("v"))

    def ofold(expr, name):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("dow"),
                                                 expr.alias("x")))),
            F.lit(0.0), lambda acc, s: acc + s["x"]).alias(name)

    f1 = study.agg(F.count(F.lit(1)).cast("bigint").alias("k"),
                   ofold(F.lit(1.0) / F.col("v"), "sw"),
                   ofold(F.col("theta") / F.col("v"), "swt"))
    pooled = F.col("swt") / F.col("sw")
    f2 = (study.crossJoin(F.broadcast(f1))
          .groupBy("k", "sw", "swt")
          .agg(ofold((F.col("theta") - pooled) * (F.col("theta") - pooled)
                     / F.col("v"), "q")))
    kd = (F.col("k") - 1).cast("double")
    se = F.sqrt(F.lit(1.0) / F.col("sw"))
    return f2.select(
        F.col("k").alias("k_studies"),
        F.round(pooled / 100.0, 6).alias("pooled_diff_dollars"),
        F.round((pooled - F.lit(_META_Z95) * se) / 100.0, 6)
        .alias("ci_lo_dollars"),
        F.round((pooled + F.lit(_META_Z95) * se) / 100.0, 6)
        .alias("ci_hi_dollars"),
        F.round(F.col("q"), 6).alias("q_heterogeneity"),
        F.round(F.when(F.col("q") > kd,
                       (F.col("q") - kd) / F.col("q"))
                .otherwise(F.lit(0.0)), 6).alias("i_squared"))


# ===========================================================================
# round-7 sixteenth ring
# ===========================================================================

# ---------------------------------------------------------------------------
# NDCG@10 retrieval evaluation
# ---------------------------------------------------------------------------

_NDCG_NQ = 50
_NDCG_K = 10
# frozen fixed-point discounts: G[r] = round(1e12 / log2(1+r)), r = 1..10,
# and P[m] = prefix sums (the ideal DCG for m relevant docs) — integers,
# so per-query DCG/IDCG are EXACT integer sums until one final division.
_NDCG_G = (1000000000000, 630929753571, 500000000000, 430676558073,
           386852807235, 356207187108, 333333333333, 315464876786,
           301029995664, 289064826318)
_NDCG_P = (1000000000000, 1630929753571, 2130929753571, 2561606311644,
           2948459118879, 3304666305987, 3637999639320, 3953464516106,
           4254494511770, 4543559338088)


def _ndcg_gain_case(col: str) -> str:
    branches = " ".join(f"WHEN {col} = {r + 1} THEN {g}"
                        for r, g in enumerate(_NDCG_G))
    return f"CASE {branches} ELSE 0 END"


def _ndcg_ideal_case(col: str) -> str:
    branches = " ".join(f"WHEN {col} = {m + 1} THEN {p}"
                        for m, p in enumerate(_NDCG_P[:-1]))
    return f"CASE {branches} ELSE {_NDCG_P[-1]} END"


def _ndcg_oracle() -> str:
    from lambdatotheslaughter_spark.operators.llm import _cos_sql_d
    cos = _cos_sql_d("q.embedding", "p.embedding", 64)
    return f"""
WITH pairs AS (
  SELECT q.vec_id AS qid, q.label AS ql, p.label AS pl, p.vec_id AS pid,
         {cos} AS c
  FROM embeddings q JOIN embeddings p ON q.vec_id <> p.vec_id
  WHERE q.vec_id < {_NDCG_NQ}
), ranked AS (
  SELECT qid, ql, pl,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(c, 12) DESC, pid) AS rk
  FROM pairs
), per_q AS (
  SELECT qid,
         CAST(SUM(CASE WHEN pl = ql AND rk <= {_NDCG_K}
                       THEN {_ndcg_gain_case("rk")} ELSE 0 END)
              AS BIGINT) AS dcg_fp,
         CAST(LEAST(CAST(COUNT(*) FILTER (WHERE pl = ql) AS BIGINT),
                    {_NDCG_K}) AS BIGINT) AS m
  FROM ranked GROUP BY qid
)
SELECT qid AS vec_id, dcg_fp, m AS n_relevant_capped,
       CAST({_ndcg_ideal_case("m")} AS BIGINT) AS idcg_fp,
       round(CAST(dcg_fp AS DOUBLE)
             / CAST({_ndcg_ideal_case("m")} AS DOUBLE), 6) AS ndcg_at_10
FROM per_q
"""


@register("llm_eval_ndcg_at10", oracle=_ndcg_oracle())
def llm_eval_ndcg_at10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 over the labeled embeddings — the graded-position
    retrieval score beside llm_eval_retrieval_mrr's first-hit view
    (MRR only sees the first relevant; NDCG credits EVERY relevant in
    the top-10 with a log-position discount, which is why leaderboards
    report both). The discounts 1/log₂(1+r) and their prefix sums
    (the ideal DCG) are FROZEN 1e-12 fixed-point integer literals, so
    per-query DCG and IDCG are exact integer sums and the only float
    is the final division — the llm_eval_retrieval_mrr lcm trick
    generalized to graded discounts.

    Scale shape (round-8 rewrite — the per-pair HOF fold measured
    2.2 s at sf0.1 over the 50×20k pair space): the bounded query
    block ships ONCE as a broadcast numpy matrix and the pool streams
    through a mapInPandas GEMM emitting only batch-local top-10 per
    query (the llm_hard_negative_mining recipe; a correct cut because
    the (cosine_12dp desc, pid) order is total), so the merge window
    ranks 10·n_batches candidates per query, never the corpus. Both
    engines rank on the 12-dp-ROUNDED cosine (the shared GEMM-noise
    discipline the kNN tile kernel pins); the pool-wide relevant
    count m comes from one tiny label-count aggregate joined back —
    IDCG needs no ranking at all."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, "embeddings", sf_dir)
    qp = (e.where(F.col("vec_id") < _NDCG_NQ)
          .select("vec_id", "label", "embedding")
          .toPandas())  # bounded query block (≤ _NDCG_NQ rows)
    if qp.empty:  # empty shard: no queries, no ranking
        return spark.createDataFrame(
            [], ("vec_id bigint, dcg_fp bigint, n_relevant_capped bigint, "
                 "idcg_fp bigint, ndcg_at_10 double"))
    q_ids = qp["vec_id"].to_numpy("int64")
    q_labels = qp["label"].to_numpy("int64")
    qm = np.vstack(qp["embedding"].to_numpy()).astype("float64")
    qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
    bc = spark.sparkContext.broadcast((q_ids, q_labels, qm))
    k = _NDCG_K

    def run(batches):
        b_qids, b_qlabels, b_qm = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf["vec_id"].to_numpy("int64")
            c_labels = pdf["label"].to_numpy("int64")
            cm = np.vstack(pdf["embedding"].to_numpy()).astype("float64")
            cm /= np.maximum(np.linalg.norm(cm, axis=1, keepdims=True),
                             1e-30)
            sims = np.round(b_qm @ cm.T, 12)
            notself = b_qids[:, None] != c_ids[None, :]
            sm = np.where(notself, sims, -np.inf)
            n_c = sm.shape[1]
            if n_c > k:
                kth = np.partition(sm, n_c - k, axis=1)[:, n_c - k]
                mask = (sm >= kth[:, None]) & notself
            else:
                mask = notself
            qi, ci = np.nonzero(mask)
            if not len(qi):
                continue
            vals = sims[qi, ci]
            qa, cb = b_qids[qi], c_ids[ci]
            order = np.lexsort((cb, -vals, qa))
            qa, cb, vals = qa[order], cb[order], vals[order]
            rel = (b_qlabels[qi[order]] == c_labels[ci[order]])
            starts = np.r_[0, np.flatnonzero(qa[1:] != qa[:-1]) + 1]
            rank = np.arange(len(qa)) - np.repeat(starts, np.diff(
                np.r_[starts, len(qa)]))
            keep = rank < k
            yield pd.DataFrame({
                "qid": qa[keep], "pid": cb[keep], "c_r": vals[keep],
                "rel": rel[keep].astype("int32")})

    cand = (e.select("vec_id", "label", "embedding")
            .mapInPandas(run, "qid bigint, pid bigint, c_r double, rel int"))
    wq = Window.partitionBy("qid").orderBy(F.col("c_r").desc(), "pid")
    top = (cand.withColumn("rk", F.row_number().over(wq))
           .where(F.col("rk") <= _NDCG_K))
    gain = F.expr(_ndcg_gain_case("rk"))
    dcg = (top.groupBy("qid")
           .agg(F.sum(F.when(F.col("rel") == 1, gain).otherwise(F.lit(0)))
                .cast("bigint").alias("dcg_fp")))
    cnt = e.groupBy(F.col("label").alias("pl")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_label"))
    mq = (e.where(F.col("vec_id") < _NDCG_NQ)
          .select(F.col("vec_id").alias("qid2"), F.col("label").alias("ql"))
          .join(F.broadcast(cnt), F.col("ql") == F.col("pl"))
          .select("qid2",
                  F.least(F.col("n_label") - 1,
                          F.lit(_NDCG_K).cast("bigint")).alias("m")))
    per_q = (dcg.join(mq, dcg.qid == mq.qid2)
             .select("qid", "dcg_fp", "m"))
    idcg = F.expr(_ndcg_ideal_case("m"))
    return per_q.select(
        F.col("qid").alias("vec_id"), "dcg_fp",
        F.col("m").alias("n_relevant_capped"),
        idcg.cast("bigint").alias("idcg_fp"),
        F.round(F.col("dcg_fp").cast("double") / idcg.cast("double"), 6)
        .alias("ndcg_at_10"))


# ---------------------------------------------------------------------------
# cardinality drift report
# ---------------------------------------------------------------------------

_CARD_DRIFT_ORACLE = """
WITH span AS (
  SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid FROM events
), halves AS (
  SELECT epoch_us(ts) < span.mid AS h1,
         user_id, event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events CROSS JOIN span
), u AS (
  SELECT 'user_id' AS column_name,
         CAST(COUNT(DISTINCT user_id) FILTER (WHERE h1) AS BIGINT) AS d1,
         CAST(COUNT(DISTINCT user_id) FILTER (WHERE NOT h1) AS BIGINT)
           AS d2
  FROM halves
  UNION ALL
  SELECT 'event_type',
         CAST(COUNT(DISTINCT event_type) FILTER (WHERE h1) AS BIGINT),
         CAST(COUNT(DISTINCT event_type) FILTER (WHERE NOT h1) AS BIGINT)
  FROM halves
  UNION ALL
  SELECT 'value_cents',
         CAST(COUNT(DISTINCT cents) FILTER (WHERE h1) AS BIGINT),
         CAST(COUNT(DISTINCT cents) FILTER (WHERE NOT h1) AS BIGINT)
  FROM halves
)
SELECT column_name, d1 AS n_distinct_h1, d2 AS n_distinct_h2,
       round(CAST(d2 AS DOUBLE) / CAST(d1 AS DOUBLE), 6) AS drift_ratio
FROM u ORDER BY column_name
"""


@register("dq_cardinality_drift_report", oracle=_CARD_DRIFT_ORACLE)
def dq_cardinality_drift_report(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Cardinality-drift audit: distinct-value counts per column in the
    first vs second half of the time span (midpoint in exact
    epoch-microsecond integers) and their ratio — the
    dimension-explosion detector (a new client version spraying UUIDs
    into a previously low-cardinality column is the classic silent
    schema-abuse incident; PSI sees distribution shape, THIS sees the
    key space itself). All counts exact; the half split is one
    broadcast 1-row min/max.

    Scale shape (VERDICT r7 wrong #3 rewrite): exactly TWO scans of
    the fact table — one cheap partial-agg min/max for the broadcast
    span row, then ALL six conditional count-distincts in a single
    agg over one scan (Spark's multi-distinct Expand), unpivoted with
    stack() to the 3-row report. The previous shape unioned three
    separate aggregates and rescanned events ~6×."""
    ev = load_table(spark, "events", sf_dir)
    span = ev.agg(
        ((F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / 2)
        .cast("bigint").alias("mid"))
    halves = (ev.crossJoin(F.broadcast(span))
              .select((F.unix_micros("ts") < F.col("mid")).alias("h1"),
                      "user_id", "event_type",
                      F.round(F.col("value") * 100, 0).cast("bigint")
                      .alias("cents")))

    def pair(col: str, tag: str) -> list:
        return [F.countDistinct(F.when(F.col("h1"), F.col(col)))
                .cast("bigint").alias(f"{tag}1"),
                F.countDistinct(F.when(~F.col("h1"), F.col(col)))
                .cast("bigint").alias(f"{tag}2")]

    wide = halves.agg(*(pair("user_id", "u") + pair("event_type", "e")
                        + pair("cents", "c")))
    u = wide.selectExpr(
        "stack(3, 'user_id', u1, u2, 'event_type', e1, e2, "
        "'value_cents', c1, c2) AS (column_name, d1, d2)")
    return (u.select("column_name",
                     F.col("d1").alias("n_distinct_h1"),
                     F.col("d2").alias("n_distinct_h2"),
                     F.round(F.col("d2").cast("double")
                             / F.col("d1").cast("double"), 6)
                     .alias("drift_ratio"))
            .orderBy("column_name"))


# ---------------------------------------------------------------------------
# process capability indices (Cp / Cpk)
# ---------------------------------------------------------------------------

_CAP_LSL = 500     # spec limits in cents, frozen
_CAP_USL = 30000

_CAPABILITY_ORACLE = f"""
WITH c AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events WHERE event_type = 'purchase'
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xc) AS BIGINT) AS s1,
         CAST(SUM(CAST(xc AS DECIMAL(38,0)) * xc) AS DECIMAL(38,0)) AS s2,
         CAST(COUNT(*) FILTER (WHERE xc < {_CAP_LSL}
                                  OR xc > {_CAP_USL}) AS BIGINT)
           AS n_out
  FROM c
)
SELECT n, n_out,
       round(CAST(n_out AS DOUBLE) / CAST(n AS DOUBLE), 6)
         AS out_of_spec_share,
       round(({_CAP_USL} - {_CAP_LSL})
             / (6.0 * sqrt((CAST(s2 AS DOUBLE)
                            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                              / CAST(n AS DOUBLE))
                           / CAST(n - 1 AS DOUBLE))), 6) AS cp,
       round(LEAST({_CAP_USL} - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE),
                   CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) - {_CAP_LSL})
             / (3.0 * sqrt((CAST(s2 AS DOUBLE)
                            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                              / CAST(n AS DOUBLE))
                           / CAST(n - 1 AS DOUBLE))), 6) AS cpk
FROM s
"""


@register("stat_capability_indices", oracle=_CAPABILITY_ORACLE)
def stat_capability_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process capability Cp/Cpk of purchase values against frozen spec
    limits (5–300 dollars): Cp = spec width / 6σ (what the process
    COULD hold if centered), Cpk = nearest-limit margin / 3σ (what it
    ACTUALLY holds) — the SPC capability pair beside the control-chart
    family (ts_cusum_drift, ts_bollinger_bands watch stability over
    time; capability scores the distribution against the tolerance).
    Moments and the out-of-spec count are exact folds; each index is
    one identical double tree.

    Scale shape: ONE combinable four-sum fold to a single row."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type") == "purchase"))
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    s = ev.select(xc.alias("xc")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xc").cast("bigint").alias("s1"),
        F.sum(F.col("xc").cast("decimal(38,0)") * F.col("xc"))
        .cast("decimal(38,0)").alias("s2"),
        F.count(F.when((F.col("xc") < _CAP_LSL)
                       | (F.col("xc") > _CAP_USL), 1)).cast("bigint")
        .alias("n_out"))
    nd = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / nd
    sd = F.sqrt((F.col("s2").cast("double")
                 - F.col("s1").cast("double") * F.col("s1").cast("double")
                   / nd) / (F.col("n") - 1).cast("double"))
    return s.select(
        "n", "n_out",
        F.round(F.col("n_out").cast("double") / nd, 6)
        .alias("out_of_spec_share"),
        F.round(F.lit(float(_CAP_USL - _CAP_LSL)) / (6.0 * sd), 6)
        .alias("cp"),
        F.round(F.least(F.lit(float(_CAP_USL)) - mu,
                        mu - F.lit(float(_CAP_LSL))) / (3.0 * sd), 6)
        .alias("cpk"))
