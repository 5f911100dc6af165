"""Round-7 additions (SURVEY.md §2.18): the evaluation-and-audit ring.

Families this ring completes, picked by the round-6 verdict's usage
ordering (stats/ML-eval first, then sequence/survival, data-quality
audits, LLM eval/sampling, one graph centrality, one SQL surface key):

- ML evaluation: exact PR-AUC (the imbalanced-data companion to
  ml_roc_auc_exact), a 10-bin calibration/reliability table.
- Classical stats: Jarque–Bera normality, McNemar's paired test,
  Hodges–Lehmann shift, Cliff's delta, Dunn's post-hoc with BH step-up.
- Time series: phase-collapsed DFT energy (which period carries the
  signal), Kaplan–Meier survival of view→purchase conversion.
- Data quality: referential-integrity orphan audit, freshness lag.
- LLM data pipeline: corpus BLEU-2, exact-integer weighted priority
  sampling, arena-style pairwise win-rate matrix.
- Graph: fixed-depth Katz centrality by three unrolled SpMV passes.
- SQL surface: GROUP BY / ORDER BY ordinals.

House disciplines throughout: exact integer cents / BIGINT / decimal(38)
folds; doubles only in final expression trees spelled identically in the
DuckDB oracle; transcendentals either frozen as literals (normal-quantile
thresholds, cos/sin phase tables, the BLEU brevity penalty) or rounded
6 dp after an ORDER-FIXED fold (the stat_anova_oneway_f rule); global
orders via bucketed.py's two-pass bucketed rank, never a single-partition
window over an unbounded input.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lambdatotheslaughter_spark.determinism import broadcast_if_bounded
from lambdatotheslaughter_spark.bucketed import bucketed_order
from lambdatotheslaughter_spark.registry import register
from lambdatotheslaughter_spark.tables import load_table

# ---------------------------------------------------------------------------
# exact PR-AUC (step interpolation)
# ---------------------------------------------------------------------------

# fixed-point quantum for cross-threshold term sums: each per-threshold
# term is computed through an IDENTICAL double tree in both engines (so
# the doubles are bit-equal), then quantized to an integer in 1e-12 units
# — integer addition is associative, so the cross-threshold sum is
# partition-order-free in Spark AND engine-portable (the
# llm_embedding_pq_quantize fixed-point-error-sum discipline applied to a
# value-exact oracle).
_PR_Q = 1_000_000_000_000

_PR_AUC_ORACLE = f"""
WITH c AS (
  SELECT event_type = 'purchase' AS pos,
         CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events WHERE event_type IN ('click', 'purchase')
), dom AS (
  SELECT xc, CAST(COUNT(*) AS BIGINT) AS t,
         CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS p
  FROM c GROUP BY xc
), cum AS (
  SELECT xc, t, p,
         CAST(SUM(t) OVER w AS BIGINT) AS cum_t,
         CAST(SUM(p) OVER w AS BIGINT) AS cum_p
  FROM dom
  WINDOW w AS (ORDER BY xc DESC ROWS UNBOUNDED PRECEDING)
), tot AS (
  SELECT CAST(SUM(p) AS BIGINT) AS np,
         CAST(SUM(t - p) AS BIGINT) AS nn,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM dom
), terms AS (
  SELECT CAST(round((CAST(p AS DOUBLE) / CAST(tot.np AS DOUBLE))
                    * (CAST(cum_p AS DOUBLE) / CAST(cum_t AS DOUBLE))
                    * {_PR_Q}, 0) AS BIGINT) AS q
  FROM cum CROSS JOIN tot
)
SELECT tot.np AS n_pos, tot.nn AS n_neg, tot.k AS n_thresholds,
       CAST(tot.np AS DOUBLE) / CAST(tot.np + tot.nn AS DOUBLE)
         AS baseline_precision,
       CAST(CAST(SUM(terms.q) AS BIGINT) AS DOUBLE) / {_PR_Q}.0 AS pr_auc
FROM terms CROSS JOIN tot
GROUP BY tot.np, tot.nn, tot.k
"""


@register("ml_pr_auc_exact", oracle=_PR_AUC_ORACLE)
def ml_pr_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT area under the precision–recall curve (step interpolation,
    the average-precision identity AP = Σ ΔR_i · P_i) for the
    value-predicts-purchase ranking — the imbalanced-data companion to
    ml_roc_auc_exact: ROC-AUC stays optimistic when positives are rare,
    PR-AUC reads against the baseline_precision floor. The corpus
    collapses to per-score-value counts; each threshold's term
    (Δrecall · precision) is one identical double tree quantized to
    1e-12 units, so the cross-threshold fold is an associative BIGINT
    sum — no float-order hazard at any partitioning.

    Scale shape: one combinable domain collapse (score values, bounded
    cents domain); one cumulative window over the DOMAIN (bounded by
    construction, the ml_roc_auc_exact precedent); a broadcast
    one-row total; one integer fold to a single row."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    dom = (ev.select((F.col("event_type") == "purchase").alias("pos"),
                     xc.alias("xc"))
           .groupBy("xc")
           .agg(F.count(F.lit(1)).cast("bigint").alias("t"),
                F.count(F.when(F.col("pos"), 1)).cast("bigint").alias("p")))
    wd = (Window.orderBy(F.col("xc").desc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = dom.select(
        "t", "p",
        F.sum("t").over(wd).cast("bigint").alias("cum_t"),
        F.sum("p").over(wd).cast("bigint").alias("cum_p"))
    tot = dom.agg(F.sum("p").cast("bigint").alias("np"),
                  F.sum(F.col("t") - F.col("p")).cast("bigint").alias("nn"),
                  F.count(F.lit(1)).cast("bigint").alias("k"))
    term = ((F.col("p").cast("double") / F.col("np").cast("double"))
            * (F.col("cum_p").cast("double") / F.col("cum_t").cast("double")))
    q = F.round(term * F.lit(_PR_Q), 0).cast("bigint")
    return (cum.crossJoin(F.broadcast(tot))
            .select("np", "nn", "k", q.alias("q"))
            .groupBy("np", "nn", "k")
            .agg(F.sum("q").cast("bigint").alias("qs"))
            .select(F.col("np").alias("n_pos"), F.col("nn").alias("n_neg"),
                    F.col("k").alias("n_thresholds"),
                    (F.col("np").cast("double")
                     / (F.col("np") + F.col("nn")).cast("double"))
                    .alias("baseline_precision"),
                    (F.col("qs").cast("double") / F.lit(float(_PR_Q)))
                    .alias("pr_auc")))


# ---------------------------------------------------------------------------
# calibration / reliability table
# ---------------------------------------------------------------------------

_CAL_BINS = 10

_CAL_ORACLE = f"""
WITH c AS (
  SELECT event_type = 'purchase' AS pos,
         CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events WHERE event_type IN ('click', 'purchase')
), mx AS (
  SELECT CAST(MAX(xc) AS BIGINT) AS m FROM c
), binned AS (
  SELECT LEAST({_CAL_BINS - 1}, (xc * {_CAL_BINS}) // (m + 1)) AS bin,
         xc, pos, m
  FROM c CROSS JOIN mx
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS n_pos,
       CAST(CAST(SUM(xc) AS BIGINT) AS DOUBLE)
         / (CAST(COUNT(*) AS DOUBLE) * CAST(MAX(m) AS DOUBLE))
         AS mean_pred,
       CAST(COUNT(*) FILTER (WHERE pos) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS obs_rate,
       CAST(CAST(SUM(xc) AS BIGINT) AS DOUBLE)
         / (CAST(COUNT(*) AS DOUBLE) * CAST(MAX(m) AS DOUBLE))
         - CAST(COUNT(*) FILTER (WHERE pos) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS calibration_gap
FROM binned GROUP BY bin
"""


@register("ml_calibration_reliability", oracle=_CAL_ORACLE)
def ml_calibration_reliability(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Reliability (calibration) table for the value-as-score ranking:
    ten fixed-width score bins, each reporting mean normalized score
    vs observed positive rate and their gap — the table behind every
    calibration curve, and what ml_brier_score_rank summarizes into one
    number. Bin edges are integer-exact ((xc·10) div (max+1), broadcast
    max), counts exact, three divisions per bin row.

    Scale shape: one broadcast 1-row max; one combinable 10-group
    fold — the whole query is two map-side passes and a 10-row
    result."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    c = ev.select((F.col("event_type") == "purchase").alias("pos"),
                  xc.alias("xc"))
    mx = c.agg(F.max("xc").cast("bigint").alias("m"))
    binned = (c.crossJoin(F.broadcast(mx))
              .select(F.least(F.lit(_CAL_BINS - 1),
                              F.floor(F.col("xc") * _CAL_BINS
                                      / (F.col("m") + 1)))
                      .cast("bigint").alias("bin"), "xc", "pos", "m"))
    mean_pred = (F.sum("xc").cast("bigint").cast("double")
                 / (F.count(F.lit(1)).cast("double")
                    * F.max("m").cast("double")))
    obs = (F.count(F.when(F.col("pos"), 1)).cast("double")
           / F.count(F.lit(1)).cast("double"))
    return (binned.groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.count(F.when(F.col("pos"), 1)).cast("bigint")
                 .alias("n_pos"),
                 mean_pred.alias("mean_pred"),
                 obs.alias("obs_rate"),
                 (mean_pred - obs).alias("calibration_gap")))


# ---------------------------------------------------------------------------
# Jarque–Bera normality test
# ---------------------------------------------------------------------------

_JB_ORACLE = """
WITH c AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS x
  FROM events WHERE event_type = 'purchase'
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS s1,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2,
         CAST(SUM(CAST(x AS HUGEINT) * x * x) AS HUGEINT) AS s3,
         CAST(SUM(CAST(x AS HUGEINT) * x * x * x) AS HUGEINT) AS s4
  FROM c
), m AS (
  SELECT n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
         CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
         CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
  FROM s
), cm AS (
  SELECT n, mu,
         r2 - mu * mu AS m2,
         r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
         r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
            - 3.0 * mu * mu * mu * mu AS m4
  FROM m
)
SELECT n,
       m3 / (m2 * sqrt(m2)) AS skewness,
       m4 / (m2 * m2) - 3.0 AS excess_kurtosis,
       CAST(n AS DOUBLE) / 6.0
         * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
            + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0) / 4.0)
         AS jarque_bera
FROM cm
"""


@register("stat_jarque_bera", oracle=_JB_ORACLE)
def stat_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality test on purchase cents — the one-number
    is-it-Gaussian gate (JB = n/6·(S² + K²/4)) that should be read
    before any of the z-based tests in this family trusts its normal
    approximation. All four raw power sums are EXACT decimal(38,0)
    integers (x⁴ passes int64, the HUGEINT moment discipline); central
    moments and JB assemble through one identical double tree; the only
    root is sqrt (correctly rounded in both engines), so the result is
    bit-exact with NO tolerance and no rounding.

    Scale shape: ONE combinable four-sum fold over the scan to a single
    row — the same shape as stat_ols_two_feature's normal equations."""
    ev = load_table(spark, "events", sf_dir) \
        .where(F.col("event_type") == "purchase")
    x = F.round(F.col("value") * 100, 0).cast("bigint")
    xd = x.cast("decimal(38,0)")
    s = ev.select(x.alias("x"), xd.alias("xd")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xd").alias("s1"),
        F.sum(F.col("xd") * F.col("x")).alias("s2"),
        F.sum(F.col("xd") * F.col("x") * F.col("x")).alias("s3"),
        F.sum(F.col("xd") * F.col("x") * F.col("x") * F.col("x"))
        .alias("s4"))
    nd = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / nd
    r2 = F.col("s2").cast("double") / nd
    r3 = F.col("s3").cast("double") / nd
    r4 = F.col("s4").cast("double") / nd
    m2 = r2 - mu * mu
    m3 = r3 - F.lit(3.0) * mu * r2 + F.lit(2.0) * mu * mu * mu
    m4 = (r4 - F.lit(4.0) * mu * r3 + F.lit(6.0) * mu * mu * r2
          - F.lit(3.0) * mu * mu * mu * mu)
    skew = m3 / (m2 * F.sqrt(m2))
    kurt = m4 / (m2 * m2) - F.lit(3.0)
    return s.select(
        "n", skew.alias("skewness"), kurt.alias("excess_kurtosis"),
        (nd / F.lit(6.0) * (skew * skew + kurt * kurt / F.lit(4.0)))
        .alias("jarque_bera"))


# ---------------------------------------------------------------------------
# McNemar's paired test
# ---------------------------------------------------------------------------

_MCNEMAR_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY event_type, date_trunc('hour', ts)
), paired AS (
  SELECT x.hr, x.cents AS hc, y.cents AS pc
  FROM (SELECT hr, cents FROM hourly WHERE event_type = 'click') x
  JOIN (SELECT hr, cents FROM hourly WHERE event_type = 'purchase') y
    ON x.hr = y.hr
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(hc) AS BIGINT) AS sc,
         CAST(SUM(pc) AS BIGINT) AS sp
  FROM paired
), flags AS (
  -- integer-safe above-own-mean flags: cents * k > series total
  SELECT (hc * k > sc) AS fa, (pc * k > sp) AS fb
  FROM paired CROSS JOIN tot
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(COUNT(*) FILTER (WHERE fa AND fb) AS BIGINT) AS n_both_hi,
       CAST(COUNT(*) FILTER (WHERE fa AND NOT fb) AS BIGINT) AS b,
       CAST(COUNT(*) FILTER (WHERE NOT fa AND fb) AS BIGINT) AS c,
       (CAST(COUNT(*) FILTER (WHERE fa AND NOT fb) AS DOUBLE)
        - CAST(COUNT(*) FILTER (WHERE NOT fa AND fb) AS DOUBLE))
       * (CAST(COUNT(*) FILTER (WHERE fa AND NOT fb) AS DOUBLE)
          - CAST(COUNT(*) FILTER (WHERE NOT fa AND fb) AS DOUBLE))
       / (CAST(COUNT(*) FILTER (WHERE fa AND NOT fb) AS DOUBLE)
          + CAST(COUNT(*) FILTER (WHERE NOT fa AND fb) AS DOUBLE))
         AS mcnemar_chi2
FROM flags
"""


@register("stat_mcnemar_paired", oracle=_MCNEMAR_ORACLE)
def stat_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on hour-paired binary outcomes: is an hour being
    above-average for CLICK revenue associated with the SAME hour being
    above-average for PURCHASE revenue? Only the discordant cells (b =
    click-hi/purchase-lo, c = the reverse) carry information —
    χ² = (b−c)²/(b+c), the CLASSICAL uncorrected form (documented; the
    continuity-corrected variant subtracts 1 from |b−c|). The
    above-own-mean flags are INTEGER-safe cross-multiplications
    (cents·k > Σcents — no float mean anywhere), the agg_pareto_cutoff
    trick applied to a test statistic.

    Scale shape: calendar-bounded hourly fold; one broadcast 1-row
    total; one combinable four-count fold to a single row."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents")))
    x = (hourly.where(F.col("event_type") == "click")
         .select("hr", F.col("cents").alias("hc")))
    y = (hourly.where(F.col("event_type") == "purchase")
         .select(F.col("hr").alias("hry"), F.col("cents").alias("pc")))
    paired = x.join(y, F.col("hr") == F.col("hry")).select("hr", "hc", "pc")
    tot = paired.agg(F.count(F.lit(1)).cast("bigint").alias("k"),
                     F.sum("hc").cast("bigint").alias("sc"),
                     F.sum("pc").cast("bigint").alias("sp"))
    flags = (paired.crossJoin(F.broadcast(tot))
             .select((F.col("hc") * F.col("k") > F.col("sc")).alias("fa"),
                     (F.col("pc") * F.col("k") > F.col("sp")).alias("fb")))
    b = F.count(F.when(F.col("fa") & ~F.col("fb"), 1)).cast("double")
    c = F.count(F.when(~F.col("fa") & F.col("fb"), 1)).cast("double")
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.count(F.when(F.col("fa") & F.col("fb"), 1)).cast("bigint")
        .alias("n_both_hi"),
        F.count(F.when(F.col("fa") & ~F.col("fb"), 1)).cast("bigint")
        .alias("b"),
        F.count(F.when(~F.col("fa") & F.col("fb"), 1)).cast("bigint")
        .alias("c"),
        ((b - c) * (b - c) / (b + c)).alias("mcnemar_chi2"))


# ---------------------------------------------------------------------------
# Hodges–Lehmann location shift
# ---------------------------------------------------------------------------

_HL_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY event_type, date_trunc('hour', ts)
), d AS (
  SELECT x.hr, x.cents - y.cents AS diff
  FROM (SELECT hr, cents FROM hourly WHERE event_type = 'click') x
  JOIN (SELECT hr, cents FROM hourly WHERE event_type = 'purchase') y
    ON x.hr = y.hr
), walsh AS (
  -- all pairs i <= j, keeping the SUM (2x the Walsh average) integer
  SELECT a.hr AS ha, b.hr AS hb, a.diff + b.diff AS w
  FROM d a JOIN d b ON a.hr <= b.hr
), ranked AS (
  SELECT w, row_number() OVER (ORDER BY w, ha, hb) AS rk,
         COUNT(*) OVER () AS m
  FROM walsh
)
SELECT CAST(MAX(m) AS BIGINT) AS n_walsh_pairs,
       -- median of w/2: average the two middle doubled values, /4
       (CAST(MIN(CASE WHEN rk = (m + 1) // 2 THEN w END) AS DOUBLE)
        + CAST(MIN(CASE WHEN rk = (m + 2) // 2 THEN w END) AS DOUBLE))
       / 4.0 AS hl_shift_cents
FROM ranked
"""


@register("stat_hodges_lehmann_shift", oracle=_HL_ORACLE)
def stat_hodges_lehmann_shift(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Hodges–Lehmann estimator of the paired click−purchase hourly
    shift: the MEDIAN of all Walsh averages (dᵢ+dⱼ)/2 over pairs
    i ≤ j — the location estimate that goes with the Wilcoxon
    signed-rank test (stat_wilcoxon_signed_rank says WHETHER the shift
    is real; this says HOW BIG, robustly). Walsh SUMS stay integer
    (halving deferred to the final expression); the median is a
    rank-pick, averaging the two middle values for even counts.

    Scale shape: the O(k²) Walsh expansion is calendar-bounded (the
    Theil–Sen discipline, ~250k pairs on ~700 hours); the global
    median rank is the two-pass bucketed rank (bucketed.py — no
    single-partition window over the pair table)."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents")))
    x = (hourly.where(F.col("event_type") == "click")
         .select("hr", F.col("cents").alias("hc")))
    y = (hourly.where(F.col("event_type") == "purchase")
         .select(F.col("hr").alias("hry"), F.col("cents").alias("pc")))
    d = (x.join(y, F.col("hr") == F.col("hry"))
         .select("hr", (F.col("hc") - F.col("pc")).alias("diff"))
         .localCheckpoint(eager=False))  # both pair sides share it
    a, b = d.alias("a"), d.alias("b")
    walsh = (a.join(b, F.col("a.hr") <= F.col("b.hr"))
             .select(F.col("a.hr").alias("ha"), F.col("b.hr").alias("hb"),
                     (F.col("a.diff") + F.col("b.diff")).alias("w")))
    tot = walsh.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    ranked = (bucketed_order(walsh, "w", ["ha", "hb"], rank_col="rk")
              .crossJoin(F.broadcast(tot)))
    lo = F.floor((F.col("m") + 1) / 2)
    hi = F.floor((F.col("m") + 2) / 2)
    return ranked.agg(
        F.max("m").cast("bigint").alias("n_walsh_pairs"),
        ((F.min(F.when(F.col("rk") == lo, F.col("w"))).cast("double")
          + F.min(F.when(F.col("rk") == hi, F.col("w"))).cast("double"))
         / F.lit(4.0)).alias("hl_shift_cents"))


# ---------------------------------------------------------------------------
# Cliff's delta (ordinal effect size)
# ---------------------------------------------------------------------------

_CLIFFS_ORACLE = """
WITH c AS (
  SELECT event_type = 'click' AS is_x,
         CAST(round(value * 100, 0) AS BIGINT) AS v
  FROM events WHERE event_type IN ('click', 'purchase')
), dom AS (
  SELECT v,
         CAST(COUNT(*) FILTER (WHERE is_x) AS BIGINT) AS cx,
         CAST(COUNT(*) FILTER (WHERE NOT is_x) AS BIGINT) AS cy
  FROM c GROUP BY v
), cum AS (
  SELECT v, cx, cy,
         CAST(COALESCE(SUM(cy) OVER (ORDER BY v
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING), 0)
              AS BIGINT) AS y_below,
         CAST(SUM(cy) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS y_le
  FROM dom
), s AS (
  SELECT
    CAST(SUM(cx) AS BIGINT) AS nx,
    CAST(SUM(cy) AS BIGINT) AS ny,
    CAST(SUM(CAST(cx AS HUGEINT) * y_below) AS HUGEINT) AS n_gt,
    CAST(SUM(CAST(cx AS HUGEINT)
             * ((SELECT SUM(cy) FROM dom) - y_le)) AS HUGEINT) AS n_lt
  FROM cum
)
SELECT nx AS n_click, ny AS n_purchase,
       CAST(n_gt AS BIGINT) AS n_greater, CAST(n_lt AS BIGINT) AS n_less,
       (CAST(n_gt AS DOUBLE) - CAST(n_lt AS DOUBLE))
         / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)) AS cliffs_delta
FROM s
"""


@register("stat_cliffs_delta", oracle=_CLIFFS_ORACLE)
def stat_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta between click and purchase values — the ordinal
    effect size that accompanies stat_mann_whitney_u exactly as
    stat_cohens_d accompanies the t-test: δ = (#(x>y) − #(x<y))/(n·m),
    reading dominance direction free of any distribution assumption.
    Pure domain collapse: per-value side counts, strictly-below /
    less-or-equal cumulative counts over the value DOMAIN, and the pair
    counts assemble as exact integer products (decimal(38,0) — n·m
    passes int64 at fleet scale) with ONE final division.

    Scale shape: one combinable domain collapse (bounded cents domain);
    one cumulative window over the domain (bounded by construction);
    one integer fold to a single row."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    v = F.round(F.col("value") * 100, 0).cast("bigint")
    dom = (ev.select((F.col("event_type") == "click").alias("is_x"),
                     v.alias("v"))
           .groupBy("v")
           .agg(F.count(F.when(F.col("is_x"), 1)).cast("bigint")
                .alias("cx"),
                F.count(F.when(~F.col("is_x"), 1)).cast("bigint")
                .alias("cy")))
    wb = (Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1))
    wle = (Window.orderBy("v")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot_y = dom.agg(F.sum("cy").cast("bigint").alias("ny_all"))
    cum = (dom.select(
        "cx", "cy",
        F.coalesce(F.sum("cy").over(wb), F.lit(0)).cast("bigint")
        .alias("y_below"),
        F.sum("cy").over(wle).cast("bigint").alias("y_le"))
        .crossJoin(F.broadcast(tot_y)))
    s = cum.agg(
        F.sum("cx").cast("bigint").alias("nx"),
        F.sum("cy").cast("bigint").alias("ny"),
        F.sum(F.col("cx").cast("decimal(38,0)") * F.col("y_below"))
        .alias("n_gt"),
        F.sum(F.col("cx").cast("decimal(38,0)")
              * (F.col("ny_all") - F.col("y_le"))).alias("n_lt"))
    return s.select(
        F.col("nx").alias("n_click"), F.col("ny").alias("n_purchase"),
        F.col("n_gt").cast("bigint").alias("n_greater"),
        F.col("n_lt").cast("bigint").alias("n_less"),
        ((F.col("n_gt").cast("double") - F.col("n_lt").cast("double"))
         / (F.col("nx").cast("double") * F.col("ny").cast("double")))
        .alias("cliffs_delta"))


# ---------------------------------------------------------------------------
# Dunn's post-hoc pairwise test with Benjamini–Hochberg step-up
# ---------------------------------------------------------------------------

# Frozen two-sided normal quantiles for the BH step-up at alpha = 0.05
# over m = 10 pairs: thresholds z_k = Phi^-1(1 - 0.05*k/10/2) for
# k = 1..10, computed once (statistics.NormalDist().inv_cdf) and pasted —
# the transcendental-constants-as-literals discipline. BH rejects the
# top-k |z| ranks where rank k's |z| still clears z_k (step-up from the
# largest k).
_DUNN_Z = (2.807033768, 2.575829304, 2.432379059, 2.326347874,
           2.241402728, 2.170090378, 2.108358399, 2.053748911,
           2.004654462, 1.959963985)


def _dunn_thresh_sql(rank: str) -> str:
    branches = " ".join(f"WHEN {rank} = {k} THEN {z}"
                        for k, z in enumerate(_DUNN_Z, 1))
    return f"CASE {branches} END"


_DUNN_ORACLE = f"""
WITH c AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS v
  FROM events
), dom AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM c GROUP BY v
), cum AS (
  SELECT v, t,
         CAST(COALESCE(SUM(t) OVER (ORDER BY v
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING), 0)
              AS BIGINT) AS below
  FROM dom
), tv AS (
  SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS tv
  FROM c GROUP BY event_type, v
), per_type AS (
  -- doubled average rank of value v is 2*below + t + 1 (exact integer)
  SELECT tv.event_type,
         CAST(SUM(tv.tv) AS BIGINT) AS n_i,
         CAST(SUM(CAST(tv.tv AS HUGEINT) * (2 * cum.below + cum.t + 1))
              AS HUGEINT) AS sr2
  FROM tv JOIN cum ON tv.v = cum.v
  GROUP BY tv.event_type
), g AS (
  SELECT CAST(SUM(n_i) AS BIGINT) AS nn,
         CAST((SELECT SUM(CAST(t AS HUGEINT) * t * t - t) FROM dom)
              AS HUGEINT) AS tie3
  FROM per_type
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.n_i AS n_a, b.n_i AS n_b,
         (CAST(a.sr2 AS DOUBLE) / (2.0 * CAST(a.n_i AS DOUBLE))
          - CAST(b.sr2 AS DOUBLE) / (2.0 * CAST(b.n_i AS DOUBLE)))
         / sqrt((CAST(g.nn AS DOUBLE) * (CAST(g.nn AS DOUBLE) + 1.0) / 12.0
                 - CAST(g.tie3 AS DOUBLE)
                   / (12.0 * (CAST(g.nn AS DOUBLE) - 1.0)))
                * (1.0 / CAST(a.n_i AS DOUBLE)
                   + 1.0 / CAST(b.n_i AS DOUBLE))) AS z
  FROM per_type a JOIN per_type b ON a.event_type < b.event_type
  CROSS JOIN g
), ranked AS (
  SELECT type_a, type_b, n_a, n_b, z,
         CAST(row_number() OVER (ORDER BY abs(z) DESC, type_a, type_b)
              AS BIGINT) AS abs_rank
  FROM pairs
), kstar AS (
  SELECT MAX(CASE WHEN abs(z) >= {_dunn_thresh_sql("abs_rank")}
                  THEN abs_rank END) AS k
  FROM ranked
)
SELECT type_a, type_b, n_a, n_b, z AS z_stat, abs_rank,
       COALESCE(abs_rank <= kstar.k, false) AS reject_bh
FROM ranked CROSS JOIN kstar
"""


@register("stat_dunn_posthoc_bh", oracle=_DUNN_ORACLE)
def stat_dunn_posthoc_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc test: WHICH event-type pairs differ, after
    stat_kruskal_wallis says SOME do — pairwise z on shared
    Kruskal–Wallis mean ranks with the tie-corrected variance, and a
    Benjamini–Hochberg step-up over the 10 pairs so the multiple-
    comparison control is part of the operator, not an exercise for the
    reader. p-value ordering is |z| ordering (monotone), so BH runs on
    frozen normal-quantile thresholds per rank (z_k literals, the
    Poisson-CDF-thresholds discipline) — no CDF at query time.

    Scale shape: one domain collapse + one (type, value) collapse; the
    cumulative window runs over the value DOMAIN (bounded); pairwise
    z and the BH pass live on 5-type/10-pair tables."""
    ev = load_table(spark, "events", sf_dir)
    v = F.round(F.col("value") * 100, 0).cast("bigint")
    c = ev.select("event_type", v.alias("v"))
    dom = c.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = dom.select(
        "v", "t",
        F.coalesce(F.sum("t").over(wb), F.lit(0)).cast("bigint")
        .alias("below"))
    tv = (c.groupBy("event_type", "v")
          .agg(F.count(F.lit(1)).cast("bigint").alias("tv")))
    per_type = (tv.join(cum, "v")
                .groupBy("event_type")
                .agg(F.sum("tv").cast("bigint").alias("n_i"),
                     F.sum(F.col("tv").cast("decimal(38,0)")
                           * (2 * F.col("below") + F.col("t") + 1))
                     .alias("sr2")))
    tie3 = dom.agg(
        F.sum(F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
              - F.col("t")).alias("tie3"))
    g = (per_type.agg(F.sum("n_i").cast("bigint").alias("nn"))
         .crossJoin(F.broadcast(tie3)))
    a, b = per_type.alias("a"), per_type.alias("b")
    nnd = F.col("nn").cast("double")
    var = (nnd * (nnd + F.lit(1.0)) / F.lit(12.0)
           - F.col("tie3").cast("double")
           / (F.lit(12.0) * (nnd - F.lit(1.0))))
    mean_a = (F.col("a.sr2").cast("double")
              / (F.lit(2.0) * F.col("a.n_i").cast("double")))
    mean_b = (F.col("b.sr2").cast("double")
              / (F.lit(2.0) * F.col("b.n_i").cast("double")))
    z = ((mean_a - mean_b)
         / F.sqrt(var * (F.lit(1.0) / F.col("a.n_i").cast("double")
                         + F.lit(1.0) / F.col("b.n_i").cast("double"))))
    pairs = (a.join(b, F.col("a.event_type") < F.col("b.event_type"))
             .crossJoin(F.broadcast(g))
             .select(F.col("a.event_type").alias("type_a"),
                     F.col("b.event_type").alias("type_b"),
                     F.col("a.n_i").alias("n_a"),
                     F.col("b.n_i").alias("n_b"),
                     z.alias("z")))
    wr = Window.orderBy(F.abs("z").desc(), "type_a", "type_b")
    ranked = pairs.select("*", F.row_number().over(wr).cast("bigint")
                          .alias("abs_rank"))
    thr = F.element_at(F.array(*[F.lit(x) for x in _DUNN_Z]),
                       F.col("abs_rank").cast("int"))
    kstar = ranked.agg(F.max(F.when(F.abs("z") >= thr,
                                    F.col("abs_rank"))).alias("k"))
    return (ranked.crossJoin(F.broadcast(kstar))
            .select("type_a", "type_b", "n_a", "n_b",
                    F.col("z").alias("z_stat"), "abs_rank",
                    F.coalesce(F.col("abs_rank") <= F.col("k"),
                               F.lit(False)).alias("reject_bh")))


# ---------------------------------------------------------------------------
# phase-collapsed DFT energy (which period carries the signal)
# ---------------------------------------------------------------------------

_DFT_PERIODS = (24, 12, 168)

# cos/sin phase tables as FROZEN literals (Python libm values pasted into
# BOTH engines): cos(2*pi*k/p), sin(2*pi*k/p) for each period p and phase
# k — the only transcendentals in the operator, shared bit-for-bit.
_DFT_PHASES: tuple[tuple[int, int, float, float], ...] = tuple(
    (p, k, math.cos(2.0 * math.pi * k / p), math.sin(2.0 * math.pi * k / p))
    for p in _DFT_PERIODS for k in range(p))


def _dft_phase_values_sql() -> str:
    return ",\n    ".join(
        f"({p}, {k}, {c!r}, {s!r})" for p, k, c, s in _DFT_PHASES)


_DFT_ORACLE = f"""
WITH hourly AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hh,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY event_type, epoch_us(ts) // 3600000000
), ph(p, k, c, s) AS (
  VALUES {_dft_phase_values_sql()}
), phased AS (
  -- phase collapse: exact BIGINT cents per (type, period, phase)
  SELECT h.event_type, ph.p, ph.k, ph.c, ph.s,
         CAST(SUM(h.cents) AS BIGINT) AS amp
  FROM hourly h JOIN ph ON (h.hh % ph.p) = ph.k
  GROUP BY h.event_type, ph.p, ph.k, ph.c, ph.s
), folded AS (
  -- per-phase terms quantized to 1e-6 units: cos_k * amp is ONE double
  -- product of bit-identical inputs, its rounding is identical in both
  -- engines, and the cross-phase sum is then an associative BIGINT fold
  SELECT event_type, p,
         CAST(COUNT(*) AS BIGINT) AS n_phases,
         CAST(SUM(CAST(round(c * CAST(amp AS DOUBLE) * 1000000, 0)
                       AS BIGINT)) AS BIGINT) AS aq,
         CAST(SUM(CAST(round(s * CAST(amp AS DOUBLE) * 1000000, 0)
                       AS BIGINT)) AS BIGINT) AS bq
  FROM phased GROUP BY event_type, p
)
SELECT event_type, CAST(p AS BIGINT) AS period_hours, n_phases,
       (CAST(aq AS DOUBLE) / 1000000.0) * (CAST(aq AS DOUBLE) / 1000000.0)
         + (CAST(bq AS DOUBLE) / 1000000.0)
           * (CAST(bq AS DOUBLE) / 1000000.0) AS dft_energy
FROM folded
"""


@register("ts_spectral_dft_energy", oracle=_DFT_ORACLE)
def ts_spectral_dft_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-frequency DFT energy of the hourly revenue series at the
    daily / half-daily / weekly periods — WHICH period carries the
    cycle, the frequency-domain readout next to ts_acf_multi_lag's
    time-domain one (and ts_haar_energy_levels' scale decomposition).
    The key identity makes it portable AND scalable: grouping hours by
    phase first turns Σₜ xₜ·cos(2πt/p) into Σₖ cos_k · (Σ_{{t≡k}} xₜ) —
    the inner sums are EXACT BIGINT cents (combinable), the cos_k/sin_k
    are frozen literals shared by both engines, and each phase term
    cos_k·S_k quantizes to an integer in 1e-6 units (one double product
    of bit-identical inputs, identically rounded) so the ≤168-term
    outer fold is an ASSOCIATIVE BIGINT sum — order-free in Spark and
    engine-portable, no 6 dp tolerance needed (a plain float fold
    diverges in absolute terms at energy ~1e14, measured during
    development — the fixed-point term sum is the correct discipline,
    not rounding).

    Scale shape: one combinable (type, period, phase) fold — the corpus
    collapses to ≤ 5·(24+12+168) rows before any float appears; a
    100 TB series costs exactly one extra map-side pass."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy(
        "event_type",
        F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                / F.lit(3600000000)).cast("bigint").alias("hh"))
        .agg(F.sum(cents).cast("bigint").alias("cents")))
    ph = spark.createDataFrame(
        list(_DFT_PHASES), "p int, k int, c double, s double")
    phased = (hourly.join(F.broadcast(ph),
                          F.pmod(F.col("hh"), F.col("p")) == F.col("k"))
              .groupBy("event_type", "p", "k", "c", "s")
              .agg(F.sum("cents").cast("bigint").alias("amp")))
    qa = F.round(F.col("c") * F.col("amp").cast("double") * 1000000,
                 0).cast("bigint")
    qb = F.round(F.col("s") * F.col("amp").cast("double") * 1000000,
                 0).cast("bigint")
    folded = (phased.groupBy("event_type", "p")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_phases"),
                   F.sum(qa).cast("bigint").alias("aq"),
                   F.sum(qb).cast("bigint").alias("bq")))
    ad = F.col("aq").cast("double") / F.lit(1000000.0)
    bd = F.col("bq").cast("double") / F.lit(1000000.0)
    return folded.select(
        "event_type", F.col("p").cast("bigint").alias("period_hours"),
        "n_phases", (ad * ad + bd * bd).alias("dft_energy"))


# ---------------------------------------------------------------------------
# Kaplan–Meier survival of view -> purchase conversion
# ---------------------------------------------------------------------------

_KM_ORACLE = """
WITH horizon AS (
  SELECT CAST(MAX(ts) AS DATE) AS end_day FROM events
), per_user AS (
  SELECT user_id,
         CAST(MIN(ts) AS DATE) AS t0,
         CAST(MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS DATE)
           AS tp
  FROM events GROUP BY user_id
), obs AS (
  SELECT user_id,
         CASE WHEN tp IS NOT NULL AND tp >= t0
              THEN datediff('day', t0, tp)
              ELSE datediff('day', t0, (SELECT end_day FROM horizon))
         END AS tt,
         (tp IS NOT NULL AND tp >= t0) AS ev
  FROM per_user
), days AS (
  SELECT CAST(tt AS BIGINT) AS tt,
         CAST(COUNT(*) FILTER (WHERE ev) AS BIGINT) AS d,
         CAST(COUNT(*) FILTER (WHERE NOT ev) AS BIGINT) AS c
  FROM obs GROUP BY tt
), tot AS (
  SELECT CAST(SUM(d + c) AS BIGINT) AS n FROM days
), risk AS (
  SELECT tt, d, c,
         tot.n - CAST(COALESCE(SUM(d + c) OVER (ORDER BY tt
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS BIGINT)
           AS n_at_risk
  FROM days CROSS JOIN tot
), km AS (
  SELECT tt, d, c, n_at_risk,
         -- d = n_at_risk means survival hits exactly 0: the frozen
         -- -1e9 sentinel underflows exp() to 0.0 in both engines
         SUM(CASE WHEN d >= n_at_risk THEN -1000000000.0
                  WHEN d > 0
                  THEN ln(1.0 - CAST(d AS DOUBLE)
                                / CAST(n_at_risk AS DOUBLE))
                  ELSE 0.0 END)
           OVER (ORDER BY tt ROWS UNBOUNDED PRECEDING) AS lsum
  FROM risk
)
SELECT tt AS day, n_at_risk, d AS n_events, c AS n_censored,
       round(exp(lsum), 6) AS km_survival
FROM km WHERE d > 0
"""


@register("seq_survival_km", oracle=_KM_ORACLE)
def seq_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-first-purchase (days
    from a user's first event; users who never purchase are censored at
    the observation horizon) — THE time-to-event estimator behind
    conversion-lag and churn dashboards, with the risk set handled
    correctly where a naive conversion-rate-by-day silently drops
    censored users. Counts collapse to per-day (events, censored);
    n_at_risk is total minus the exclusive prefix; S(t) = Π(1 − dⱼ/nⱼ)
    via exp of the running ln sum — the window order is deterministic,
    both engines fold the same doubles in the same sequence, and the
    one transcendental chain rounds 6 dp at the end.

    Scale shape: one combinable user-grain fold, one per-day collapse
    (calendar-bounded domain), windows over that bounded domain; the
    horizon broadcasts as one row."""
    ev = load_table(spark, "events", sf_dir)
    horizon = ev.agg(F.max(F.col("ts").cast("date")).alias("end_day"))
    per_user = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase",
                     F.col("ts").cast("date"))).alias("tp"))
    is_ev = F.col("tp").isNotNull() & (F.col("tp") >= F.col("t0"))
    obs = (per_user.crossJoin(F.broadcast(horizon))
           .select(F.when(is_ev, F.datediff("tp", "t0"))
                   .otherwise(F.datediff("end_day", "t0"))
                   .cast("bigint").alias("tt"),
                   is_ev.alias("ev")))
    days = obs.groupBy("tt").agg(
        F.count(F.when(F.col("ev"), 1)).cast("bigint").alias("d"),
        F.count(F.when(~F.col("ev"), 1)).cast("bigint").alias("c"))
    tot = days.agg(F.sum(F.col("d") + F.col("c")).cast("bigint")
                   .alias("n"))
    wb = Window.orderBy("tt").rowsBetween(Window.unboundedPreceding, -1)
    wc = Window.orderBy("tt").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    risk = (days.crossJoin(F.broadcast(tot))
            .select("tt", "d", "c",
                    (F.col("n")
                     - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wb),
                                  F.lit(0)).cast("bigint"))
                    .alias("n_at_risk")))
    lterm = (F.when(F.col("d") >= F.col("n_at_risk"),
                    F.lit(-1000000000.0))
             .when(F.col("d") > 0,
                   F.log(F.lit(1.0) - F.col("d").cast("double")
                         / F.col("n_at_risk").cast("double")))
             .otherwise(F.lit(0.0)))
    km = risk.select("tt", "d", "c", "n_at_risk",
                     F.sum(lterm).over(wc).alias("lsum"))
    return (km.where(F.col("d") > 0)
            .select(F.col("tt").alias("day"), "n_at_risk",
                    F.col("d").alias("n_events"),
                    F.col("c").alias("n_censored"),
                    F.round(F.exp("lsum"), 6).alias("km_survival")))


# ---------------------------------------------------------------------------
# referential-integrity audit
# ---------------------------------------------------------------------------

_RI_ORACLE = """
WITH checks AS (
  SELECT 'orders.o_custkey->customer' AS relationship,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_child,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey)) AS n_orphan
  UNION ALL
  SELECT 'lineitem.l_orderkey->orders',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'lineitem.l_partkey->part',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM part p
                            WHERE p.p_partkey = l.l_partkey))
  UNION ALL
  SELECT 'events.user_id->customer (expected broken)',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM events),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM events e
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = e.user_id))
)
SELECT relationship, n_child, n_orphan,
       CAST(n_orphan AS DOUBLE) / CAST(n_child AS DOUBLE) AS orphan_rate
FROM checks
"""


@register("dq_referential_integrity", oracle=_RI_ORACLE)
def dq_referential_integrity(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for four foreign-key
    relationships in one report — the first data-quality check a
    warehouse runs after every load, sitting beside
    dq_expectations_report's column-level rules. Three clean FKs
    (orders→customer, lineitem→orders, lineitem→part) plus one
    DELIBERATELY broken pairing (events.user_id against customer keys —
    distinct id spaces) so the audit demonstrably reports non-zero
    orphans, not just vacuous greens.

    Scale shape: each check is one LEFT ANTI join with the dimension
    side broadcast (fact never shuffles); the report is a 4-row
    union."""
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    part = load_table(spark, "part", sf_dir).select("p_partkey")
    ev = load_table(spark, "events", sf_dir)

    def check(name, child, key, dim, dim_key):
        n = child.agg(F.count(F.lit(1)).cast("bigint").alias("n_child"))
        orphans = (child.join(F.broadcast(dim),
                              F.col(key) == F.col(dim_key), "left_anti")
                   .agg(F.count(F.lit(1)).cast("bigint")
                        .alias("n_orphan")))
        return (n.crossJoin(orphans)
                .select(F.lit(name).alias("relationship"), "n_child",
                        "n_orphan",
                        (F.col("n_orphan").cast("double")
                         / F.col("n_child").cast("double"))
                        .alias("orphan_rate")))

    return (check("orders.o_custkey->customer", o, "o_custkey",
                  cust, "c_custkey")
            .unionByName(check("lineitem.l_orderkey->orders",
                               li, "l_orderkey",
                               o.select("o_orderkey"), "o_orderkey"))
            .unionByName(check("lineitem.l_partkey->part",
                               li, "l_partkey", part, "p_partkey"))
            .unionByName(check("events.user_id->customer (expected broken)",
                               ev, "user_id", cust, "c_custkey")))


# ---------------------------------------------------------------------------
# freshness / staleness lag
# ---------------------------------------------------------------------------

_FRESH_ORACLE = """
WITH g AS (
  SELECT CAST(epoch_us(MAX(ts)) AS BIGINT) AS gmax FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS latest_ts,
       CAST((MAX(g.gmax) - CAST(epoch_us(MAX(ts)) AS BIGINT)) // 1000000
            AS BIGINT) AS lag_seconds,
       CAST(COUNT(*) FILTER (WHERE CAST(epoch_us(ts) AS BIGINT)
                                   > g.gmax - 86400000000) AS BIGINT)
         AS n_last_24h
FROM events CROSS JOIN g
GROUP BY event_type
"""


@register("dq_freshness_lag", oracle=_FRESH_ORACLE)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source freshness audit: each event type's latest timestamp,
    its staleness lag behind the globally freshest source (exact
    integer seconds off epoch-microseconds), and its last-24h row count
    — the is-the-feed-alive panel every ingestion dashboard leads with,
    beside dq_expectations_report. The timestamp projects through
    strftime (portable projection); everything else is exact integer
    arithmetic.

    Scale shape: one broadcast 1-row global max; one combinable
    per-type fold (max, count, windowed count) — two map-side passes to
    a 5-row report."""
    ev = load_table(spark, "events", sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp")).cast("bigint")
    g = ev.agg(F.max(us).alias("gmax"))
    return (ev.crossJoin(F.broadcast(g))
            .select("event_type", "ts", us.alias("us"), "gmax")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                 F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss")
                 .alias("latest_ts"),
                 F.floor((F.max("gmax") - F.max("us")) / 1000000)
                 .cast("bigint").alias("lag_seconds"),
                 F.count(F.when(F.col("us")
                                > F.col("gmax") - 86400000000, 1))
                 .cast("bigint").alias("n_last_24h")))


# ---------------------------------------------------------------------------
# corpus BLEU-2 (clipped n-gram precision, frozen brevity penalty)
# ---------------------------------------------------------------------------

# pred span = tokens[1..12] (12 tokens), gold span = tokens[6..19]
# (14 tokens): the deterministic pred/gold convention of llm_eval_rouge2,
# with UNEQUAL lengths so the brevity penalty is non-trivial.
# BP = exp(1 - 14/12) is a FROZEN literal (the one transcendental);
# BLEU-2 = BP * sqrt(p1 * p2) — sqrt is correctly rounded in both
# engines, so the result is bit-exact with no tolerance.
_BLEU_BP = 0.8464817248906141
_BLEU_PRED_LEN = 12
_BLEU_GOLD_LEN = 14

_BLEU_ORACLE = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
  WHERE len(string_split(text, ' ')) >= 20
), p1g AS (
  SELECT doc_id, unnest(l[1:{_BLEU_PRED_LEN}]) AS g FROM base
), g1g AS (
  SELECT doc_id, unnest(l[6:{5 + _BLEU_GOLD_LEN}]) AS g FROM base
), p2g AS (
  SELECT doc_id, unnest(list_transform(range(1, {_BLEU_PRED_LEN}),
                                       i -> l[i] || ' ' || l[i + 1])) AS g
  FROM base
), g2g AS (
  SELECT doc_id, unnest(list_transform(range(6, {5 + _BLEU_GOLD_LEN}),
                                       i -> l[i] || ' ' || l[i + 1])) AS g
  FROM base
), ov1 AS (
  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
         CAST(SUM(LEAST(COALESCE(a.c, 0), COALESCE(b.c, 0))) AS BIGINT)
           AS o1
  FROM (SELECT doc_id, g, COUNT(*) AS c FROM p1g GROUP BY doc_id, g) a
  FULL OUTER JOIN
       (SELECT doc_id, g, COUNT(*) AS c FROM g1g GROUP BY doc_id, g) b
    ON a.doc_id = b.doc_id AND a.g = b.g
  GROUP BY COALESCE(a.doc_id, b.doc_id)
), ov2 AS (
  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
         CAST(SUM(LEAST(COALESCE(a.c, 0), COALESCE(b.c, 0))) AS BIGINT)
           AS o2
  FROM (SELECT doc_id, g, COUNT(*) AS c FROM p2g GROUP BY doc_id, g) a
  FULL OUTER JOIN
       (SELECT doc_id, g, COUNT(*) AS c FROM g2g GROUP BY doc_id, g) b
    ON a.doc_id = b.doc_id AND a.g = b.g
  GROUP BY COALESCE(a.doc_id, b.doc_id)
)
SELECT ov1.doc_id, ov1.o1 AS n_overlap1, ov2.o2 AS n_overlap2,
       CASE WHEN ov1.o1 = 0 OR ov2.o2 = 0 THEN 0.0
            ELSE {_BLEU_BP!r}
                 * sqrt((CAST(ov1.o1 AS DOUBLE) / {_BLEU_PRED_LEN}.0)
                        * (CAST(ov2.o2 AS DOUBLE)
                           / {_BLEU_PRED_LEN - 1}.0)) END AS bleu2
FROM ov1 JOIN ov2 ON ov1.doc_id = ov2.doc_id
"""


@register("llm_eval_bleu_corpus", oracle=_BLEU_ORACLE)
def llm_eval_bleu_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BLEU-2 between the deterministic pred/gold spans
    (the llm_eval_rouge2 convention, but with a 14-token gold so the
    brevity penalty is real): clipped unigram and bigram precisions,
    geometric mean via sqrt (no exp/ln chain for 2 orders), brevity
    penalty frozen as a literal since the span lengths are fixed — the
    generation-eval classic next to ROUGE's recall orientation, fully
    value-exact with zero rounding.

    Scale shape: per-document gram explodes (bounded 12/14 grams/doc),
    two gram-keyed clipped-overlap folds, one doc-keyed join — every
    stage combinable/key-parallel, nothing global."""
    d = load_table(spark, "documents", sf_dir)
    toks = F.split(F.col("text"), " ")
    base = (d.where(F.size(toks) >= 20)
            .select("doc_id", toks.alias("l"))
            .localCheckpoint(eager=False))  # four gram branches share it

    def grams(df, start, length, n):
        if n == 1:
            col = F.explode(F.slice("l", start, length))
        else:
            col = F.explode(F.transform(
                F.sequence(F.lit(start), F.lit(start + length - 2)),
                lambda i: F.concat_ws(" ", F.element_at("l", i),
                                      F.element_at("l", i + 1))))
        return (df.select("doc_id", col.alias("g"))
                .groupBy("doc_id", "g")
                .agg(F.count(F.lit(1)).alias("c")))

    def clipped(pred, gold, out):
        a, b = pred.alias("a"), gold.alias("b")
        j = a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                   & (F.col("a.g") == F.col("b.g")), "full")
        return (j.groupBy(F.coalesce(F.col("a.doc_id"), F.col("b.doc_id"))
                          .alias("doc_id"))
                .agg(F.sum(F.least(F.coalesce(F.col("a.c"), F.lit(0)),
                                   F.coalesce(F.col("b.c"), F.lit(0))))
                     .cast("bigint").alias(out)))

    ov1 = clipped(grams(base, 1, _BLEU_PRED_LEN, 1),
                  grams(base, 6, _BLEU_GOLD_LEN, 1), "o1")
    ov2 = clipped(grams(base, 1, _BLEU_PRED_LEN, 2),
                  grams(base, 6, _BLEU_GOLD_LEN, 2), "o2")
    p1 = F.col("o1").cast("double") / F.lit(float(_BLEU_PRED_LEN))
    p2 = F.col("o2").cast("double") / F.lit(float(_BLEU_PRED_LEN - 1))
    bleu = (F.when((F.col("o1") == 0) | (F.col("o2") == 0), F.lit(0.0))
            .otherwise(F.lit(_BLEU_BP) * F.sqrt(p1 * p2)))
    return (ov1.join(ov2, "doc_id")
            .select("doc_id", F.col("o1").alias("n_overlap1"),
                    F.col("o2").alias("n_overlap2"),
                    bleu.alias("bleu2")))


# ---------------------------------------------------------------------------
# exact-integer weighted priority sampling (A-ES / Duffield shape)
# ---------------------------------------------------------------------------

_ARES_K = 200
_ARES_SEED = "lts-r7-priority"

_ARES_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         -- 60-bit uniform from md5; +1 keeps it strictly positive
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)
                                         || ':{_ARES_SEED}'), 1, 15))
              AS BIGINT) + 1 AS u
  FROM documents WHERE n_chars >= 1
)
SELECT doc_id, weight, CAST(u // weight AS BIGINT) AS priority_key
FROM keyed
ORDER BY priority_key, doc_id
LIMIT {_ARES_K}
"""


@register("llm_sample_ares_topk", oracle=_ARES_ORACLE)
def llm_sample_ares_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted priority sampling WITHOUT replacement (the
    Duffield/Lund/Thorup priority-sample, the exact-arithmetic cousin
    of A-ES reservoir sampling): every document draws a deterministic
    md5 uniform u, its priority is u div weight (longer docs get
    smaller keys, hence higher pick probability), and the sample is
    the global k smallest keys. The division stays INTEGER — no
    u^(1/w) float in sight — so selection is bit-deterministic and
    engine-portable while preserving the estimator's
    weight-proportional inclusion behavior (documented truncation of
    the real-valued key; both engines truncate identically).

    Scale shape: map-side key computation; the global k-smallest is a
    sort-limit that fuses to TakeOrderedAndProject (per-partition
    heaps + a k-row merge — the same shape at any corpus size),
    pinned in test_plans.py."""
    d = load_table(spark, "documents", sf_dir).where(F.col("n_chars") >= 1)
    u = (F.conv(F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"),
                       F.lit(f":{_ARES_SEED}"))), 1, 15), 16, 10)
        .cast("bigint") + 1)
    keyed = d.select("doc_id",
                     F.col("n_chars").cast("bigint").alias("weight"),
                     u.alias("u"))
    # u is a 60-bit integer: a double-typed divide would round above
    # 2^53, so the quotient uses SQL's INTEGER div (exact at any width)
    key = F.expr("u div weight").cast("bigint")
    return (keyed.select("doc_id", "weight", key.alias("priority_key"))
            .orderBy("priority_key", "doc_id")
            .limit(_ARES_K))


# ---------------------------------------------------------------------------
# arena-style pairwise win-rate matrix
# ---------------------------------------------------------------------------

_ARENA_SEED = "lts-r7-arena"

_ARENA_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, n_chars,
         CASE WHEN CAST(SUBSTR(source, 4) AS INTEGER) < 4 THEN 'large'
              WHEN CAST(SUBSTR(source, 4) AS INTEGER) < 10 THEN 'medium'
              ELSE 'small' END AS model,
         md5(CAST(doc_id AS VARCHAR) || ':{_ARENA_SEED}') AS skey
  FROM documents
), ranked AS (
  SELECT doc_id, n_chars, model,
         row_number() OVER (ORDER BY skey, doc_id) AS rn
  FROM docs
), battles AS (
  -- deterministic pairing: md5-shuffled rank 2r-1 vs 2r
  SELECT a.model AS ma, b.model AS mb,
         a.n_chars AS ca, b.n_chars AS cb,
         a.doc_id AS da, b.doc_id AS db
  FROM ranked a JOIN ranked b ON b.rn = a.rn + 1 AND a.rn % 2 = 1
), scored AS (
  SELECT LEAST(ma, mb) AS model_a, GREATEST(ma, mb) AS model_b,
         -- winner: longer doc, doc_id tiebreak (documented stand-in
         -- for a reward-model score)
         CASE WHEN (ca > cb) OR (ca = cb AND da < db)
              THEN ma ELSE mb END AS winner
  FROM battles WHERE ma <> mb
)
SELECT model_a, model_b,
       CAST(COUNT(*) AS BIGINT) AS n_battles,
       CAST(COUNT(*) FILTER (WHERE winner = model_a) AS BIGINT)
         AS wins_a,
       CAST(COUNT(*) FILTER (WHERE winner = model_a) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS winrate_a
FROM scored GROUP BY model_a, model_b
"""


@register("llm_eval_pairwise_winrate", oracle=_ARENA_ORACLE)
def llm_eval_pairwise_winrate(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Arena-style pairwise win-rate matrix: documents battle in
    deterministic md5-shuffled pairs (rank 2r−1 vs 2r of the shuffled
    order), each labeled with its source tier as the 'model', and the
    longer document wins (the documented stand-in for a reward-model
    judgment) — the Chatbot-Arena-shaped aggregation every eval
    leaderboard runs, reduced to exact counts and one division per
    model pair. Cross-tier battles only; pairs normalize to
    (min, max) model order so the matrix has one row per unordered
    pair.

    Scale shape: the shuffle rank is the two-pass bucketed rank over
    the md5 key (bucketed.py — no single-partition window at corpus
    scale); pairing is a rank-successor self-join on the rank key; the
    rollup is a ≤3-row fold."""
    d = load_table(spark, "documents", sf_dir)
    src_num = F.expr("substring(source, 4)").cast("int")
    model = (F.when(src_num < 4, F.lit("large"))
             .when(src_num < 10, F.lit("medium"))
             .otherwise(F.lit("small")))
    docs = d.select("doc_id", "n_chars", model.alias("model"),
                    F.md5(F.concat(F.col("doc_id").cast("string"),
                                   F.lit(f":{_ARENA_SEED}")))
                    .alias("skey"))
    # md5 keys are unique with overwhelming probability; doc_id breaks
    # the measure-zero remainder. Rank via a 2-hex-prefix bucket window
    # (the llm_shuffle_deterministic recipe — skey prefix IS monotone in
    # the skey order, no numeric-domain assumption needed).
    keyed = docs.withColumn("b", F.substring("skey", 1, 2))
    cnt = keyed.groupBy("b").agg(F.count(F.lit(1)).alias("cb"))
    off = (cnt.alias("x")
           .join(F.broadcast(cnt.alias("y")),
                 F.col("y.b") < F.col("x.b"), "left")
           .groupBy(F.col("x.b").alias("b"))
           .agg(F.coalesce(F.sum("y.cb"), F.lit(0)).alias("off")))
    wrn = Window.partitionBy("b").orderBy("skey", "doc_id")
    ranked = (keyed.join(F.broadcast(off), "b")
              .select("doc_id", "n_chars", "model",
                      (F.col("off") + F.row_number().over(wrn))
                      .cast("bigint").alias("rn")))
    a, b = ranked.alias("a"), ranked.alias("b")
    battles = (a.join(b, (F.col("b.rn") == F.col("a.rn") + 1)
                      & (F.col("a.rn") % 2 == 1))
               .where(F.col("a.model") != F.col("b.model"))
               .select(F.col("a.model").alias("ma"),
                       F.col("b.model").alias("mb"),
                       F.col("a.n_chars").alias("ca"),
                       F.col("b.n_chars").alias("cb"),
                       F.col("a.doc_id").alias("da"),
                       F.col("b.doc_id").alias("db")))
    winner = (F.when((F.col("ca") > F.col("cb"))
                     | ((F.col("ca") == F.col("cb"))
                        & (F.col("da") < F.col("db"))),
                     F.col("ma")).otherwise(F.col("mb")))
    scored = battles.select(
        F.least("ma", "mb").alias("model_a"),
        F.greatest("ma", "mb").alias("model_b"),
        winner.alias("winner"))
    return (scored.groupBy("model_a", "model_b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_battles"),
                 F.count(F.when(F.col("winner") == F.col("model_a"), 1))
                 .cast("bigint").alias("wins_a"),
                 (F.count(F.when(F.col("winner") == F.col("model_a"), 1))
                  .cast("double") / F.count(F.lit(1)).cast("double"))
                 .alias("winrate_a")))


# ---------------------------------------------------------------------------
# fixed-depth Katz centrality (three unrolled SpMV passes)
# ---------------------------------------------------------------------------

_KATZ_B1 = 0.005
_KATZ_B2 = 0.000025
_KATZ_B3 = 1.25e-07
_KATZ_TOPK = 100

_KATZ_ORACLE = f"""
WITH pairs AS (
  SELECT l_orderkey, l_partkey,
         lead(l_partkey) OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_partkey,
                                        l_suppkey) AS nxt
  FROM lineitem
), e0 AS (
  SELECT LEAST(l_partkey, nxt) AS a, GREATEST(l_partkey, nxt) AS b,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM pairs WHERE nxt IS NOT NULL AND l_partkey <> nxt
  GROUP BY LEAST(l_partkey, nxt), GREATEST(l_partkey, nxt)
), edges AS (
  SELECT a AS v, b AS u, w FROM e0
  UNION ALL SELECT b, a, w FROM e0
), p1 AS (
  SELECT v, CAST(SUM(w) AS BIGINT) AS s FROM edges GROUP BY v
), p2 AS (
  SELECT e.v, CAST(SUM(CAST(e.w AS HUGEINT) * p1.s) AS HUGEINT) AS s
  FROM edges e JOIN p1 ON e.u = p1.v GROUP BY e.v
), p3 AS (
  SELECT e.v, CAST(SUM(CAST(e.w AS HUGEINT) * p2.s) AS HUGEINT) AS s
  FROM edges e JOIN p2 ON e.u = p2.v GROUP BY e.v
)
SELECT p1.v AS partkey,
       p1.s AS walks_1, CAST(p2.s AS BIGINT) AS walks_2,
       CAST(p3.s AS BIGINT) AS walks_3,
       CAST(p1.s AS DOUBLE) * {_KATZ_B1!r}
         + CAST(p2.s AS DOUBLE) * {_KATZ_B2!r}
         + CAST(p3.s AS DOUBLE) * {_KATZ_B3!r} AS katz
FROM p1 JOIN p2 ON p1.v = p2.v JOIN p3 ON p1.v = p3.v
ORDER BY katz DESC, partkey
LIMIT {_KATZ_TOPK}
"""


@register("graph_katz_centrality_fixed", oracle=_KATZ_ORACLE)
def graph_katz_centrality_fixed(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Katz centrality truncated at depth 3 over the co-purchase graph:
    katz(v) = β·walks₁ + β²·walks₂ + β³·walks₃, the
    influence-with-decay measure between degree centrality (depth 1,
    graph_degree_histogram's grain) and the fixed-point PageRank/HITS
    iterations already in the family — truncation makes it CLOSED-FORM:
    three sparse matrix-vector products, each one equi-join + combinable
    groupBy, walk counts exact integers (decimal(38,0) past depth 1),
    β powers frozen literals, top-100 by the identical double
    polynomial.

    Scale shape: per-level SpMV = edge⋈vector equi-join + sum fold
    (key-parallel, the graph_pagerank_fixed shape, but exactly 3
    levels); the final top-k fuses to TakeOrderedAndProject."""
    li = load_table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey")
    raw = (li.select(F.col("l_partkey").alias("src"),
                     F.lead("l_partkey").over(w).alias("dst"))
           .where(F.col("dst").isNotNull()
                  & (F.col("src") != F.col("dst"))))
    e0 = (raw.select(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
          .groupBy("a", "b")
          .agg(F.count(F.lit(1)).cast("bigint").alias("w")))
    edges = (e0.select(F.col("a").alias("v"), F.col("b").alias("u"), "w")
             .unionAll(e0.select(F.col("b").alias("v"),
                                 F.col("a").alias("u"), "w"))
             .localCheckpoint(eager=False))  # three SpMV levels share it
    # r11: checkpoint the O(V) walk vectors — p1 feeds p2's broadcast
    # AND the final three-way join (p2 likewise), so uncheckpointed the
    # edge-scan groupBys re-ran once per consumer
    p1 = (edges.groupBy("v").agg(F.sum("w").cast("bigint").alias("s1"))
          .localCheckpoint(eager=False))
    # broadcast the O(V) walk vectors so the checkpointed edge list
    # never reshuffles per level (r9: stats-less checkpoints planned
    # sort-merge joins without the hint). Size-gated via
    # broadcast_if_bounded (r10): an explicit hint hard-fails past
    # 8 GiB / 512M rows instead of degrading, so the hash-join
    # fallback only exists if the hint is lifted at scale
    p2 = (edges.join(broadcast_if_bounded(
              p1.select(F.col("v").alias("u"), "s1"), sf_dir), "u")
          .groupBy("v")
          .agg(F.sum(F.col("w").cast("decimal(38,0)") * F.col("s1"))
               .alias("s2"))
          .localCheckpoint(eager=False))
    p3 = (edges.join(broadcast_if_bounded(
              p2.select(F.col("v").alias("u"), "s2"), sf_dir), "u")
          .groupBy("v")
          .agg(F.sum(F.col("w").cast("decimal(38,0)") * F.col("s2"))
               .alias("s3")))
    katz = (F.col("s1").cast("double") * F.lit(_KATZ_B1)
            + F.col("s2").cast("double") * F.lit(_KATZ_B2)
            + F.col("s3").cast("double") * F.lit(_KATZ_B3))
    return (p1.join(p2, "v").join(p3, "v")
            .select(F.col("v").alias("partkey"),
                    F.col("s1").alias("walks_1"),
                    F.col("s2").cast("bigint").alias("walks_2"),
                    F.col("s3").cast("bigint").alias("walks_3"),
                    katz.alias("katz"))
            .orderBy(F.col("katz").desc(), "partkey")
            .limit(_KATZ_TOPK))


# ---------------------------------------------------------------------------
# GROUP BY / ORDER BY ordinals (SQL surface)
# ---------------------------------------------------------------------------

_ORDINAL_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS qty_cents
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("sql_group_by_ordinal", oracle=_ORDINAL_ORACLE)
def sql_group_by_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY 1, 2 / ORDER BY ordinals — the positional-reference SQL
    surface (spark.sql.groupByOrdinal / orderByOrdinal, both default
    true) every hand-written analyst query leans on; the oracle runs
    the IDENTICAL text on DuckDB so the ordinal RESOLUTION — not a
    hand-expanded rewrite — is what parity verifies (the
    sql_group_by_all precedent).

    Scale shape: resolved entirely in the analyzer; the physical plan
    is the plain 6-group partial+final hash aggregate."""
    load_table(spark, "lineitem", sf_dir) \
        .createOrReplaceTempView("lts_li_ord_v")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS qty_cents
        FROM lts_li_ord_v
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY 1, 2
        ORDER BY 1, 2
    """)


# ===========================================================================
# round-7 second ring
# ===========================================================================

# ---------------------------------------------------------------------------
# transactional commit-log table (Delta/Iceberg log layer, stripped to core)
# ---------------------------------------------------------------------------

_TXLOG_ORACLE = """
SELECT CAST(0 AS BIGINT) AS snapshot_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM orders WHERE o_orderkey % 3 = 0
UNION ALL
SELECT 1, CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT)
FROM orders WHERE o_orderkey % 3 IN (0, 1)
UNION ALL
SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT)
FROM orders WHERE o_orderkey % 3 IN (1, 2)
"""


def txlog_commit(root: str, actions: list[dict]) -> int:
    """Optimistic-concurrency commit: serialize `actions` to a temp file,
    then atomically rename it to the NEXT version slot; on collision
    (another writer won that version) re-read the log head and retry —
    the Delta-protocol core. Returns the committed version."""
    import json as _json
    import os as _os
    import uuid as _uuid

    log = _os.path.join(root, "_txlog")
    _os.makedirs(log, exist_ok=True)
    while True:
        versions = [int(f.split(".")[0]) for f in _os.listdir(log)
                    if f.endswith(".json")]
        nxt = (max(versions) + 1) if versions else 0
        tmp = _os.path.join(log, f".tmp-{_uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as fh:
            _json.dump({"version": nxt, "actions": actions}, fh)
        final = _os.path.join(log, f"{nxt:05d}.json")
        try:
            _os.link(tmp, final)          # atomic create-if-absent
            _os.unlink(tmp)
            return nxt
        except FileExistsError:
            _os.unlink(tmp)               # lost the race: retry at nxt+1


def txlog_snapshot_files(root: str, version: int) -> list[str]:
    """Replay add/remove actions through `version` (inclusive)."""
    import json as _json
    import os as _os

    log = _os.path.join(root, "_txlog")
    live: set[str] = set()
    for v in sorted(int(f.split(".")[0]) for f in _os.listdir(log)
                    if f.endswith(".json")):
        if v > version:
            break
        for act in _json.load(open(_os.path.join(log, f"{v:05d}.json")))["actions"]:
            if act["op"] == "add":
                live.add(act["path"])
            elif act["op"] == "remove":
                live.discard(act["path"])
    return [_os.path.join(root, p) for p in sorted(live)]


def _txlog_fixture(spark: SparkSession, sf_dir: str) -> str:
    from lambdatotheslaughter_spark.operators.scans import _cached_dataset

    def build(tmp: str) -> None:
        import os as _os
        o = load_table(spark, "orders", sf_dir)
        for i, mod in enumerate((0, 1, 2)):
            (o.where(F.pmod("o_orderkey", F.lit(3)) == mod)
             .write.mode("overwrite")
             .parquet(_os.path.join(tmp, f"batch{mod}")))
        # v0: add batch0; v1: add batch1; v2: remove batch0, add batch2
        assert txlog_commit(tmp, [{"op": "add", "path": "batch0"}]) == 0
        assert txlog_commit(tmp, [{"op": "add", "path": "batch1"}]) == 1
        assert txlog_commit(tmp, [{"op": "remove", "path": "batch0"},
                                  {"op": "add", "path": "batch2"}]) == 2

    return _cached_dataset("txlog_orders", sf_dir, "orders", build)


@register("scan_txlog_snapshot", oracle=_TXLOG_ORACLE)
def scan_txlog_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional commit-log table format, stripped to the Delta/
    Iceberg core the manifest op (scan_time_travel_manifest) deliberately
    left out: an ordered JSON ACTION log (add-file / remove-file) under
    `_txlog/`, snapshots defined by REPLAYING the log (so REMOVE gives
    compaction/DELETE semantics without touching data files), and
    optimistic concurrency via atomic create-if-absent on the next
    version slot — `txlog_commit` retries on collision exactly like the
    Delta protocol (raced in tests/test_round7.py with concurrent
    committers; every version lands exactly once). Three snapshots read
    back through the log: v0 = batch0, v1 = batch0+batch1,
    v2 = (batch0 removed) batch1+batch2 — time travel AND logical delete
    in one value-exact report.

    Scale shape: the log is driver-side metadata (bytes scale with
    commit count, never data size); snapshot reads plan
    `spark.read.parquet(*files)` so pushdown/pruning/statistics work
    unchanged; commits never rewrite data files."""
    root = _txlog_fixture(spark, sf_dir)
    schema = load_table(spark, "orders", sf_dir).schema

    def snap(v: int) -> DataFrame:
        return (spark.read.schema(schema)
                .parquet(*txlog_snapshot_files(root, v))
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                     F.sum("o_orderkey").cast("bigint").alias("key_sum"))
                .select(F.lit(v).cast("bigint").alias("snapshot_id"),
                        "n_rows", "key_sum"))

    return snap(0).unionByName(snap(1)).unionByName(snap(2))


# ---------------------------------------------------------------------------
# tool-call parsing audit (structured-output surface)
# ---------------------------------------------------------------------------

_TOOLS = ("search", "calc", "lookup")

_TOOLCALL_ORACLE = """
WITH synth AS (
  SELECT doc_id,
         CASE
           WHEN doc_id % 7 = 0 THEN
             '<tool>{"name": "' ||
             ['search', 'calc', 'lookup'][CAST(doc_id % 3 AS INTEGER) + 1]
             || '", "k": ' || CAST(doc_id % 5 AS VARCHAR) || '}</tool>'
           WHEN doc_id % 7 = 1 THEN
             '<tool>{"name": "search", "k": </tool>'
           ELSE ''
         END AS call_str
  FROM documents
), calls AS (
  SELECT doc_id, regexp_extract(call_str, '<tool>(.*)</tool>', 1) AS payload
  FROM synth WHERE call_str <> ''
)
SELECT doc_id,
       json_valid(payload) AS parsed_ok,
       CASE WHEN json_valid(payload)
            THEN json_extract_string(payload, '$.name') END AS tool_name,
       CASE WHEN json_valid(payload)
            THEN CAST(json_extract(payload, '$.k') AS BIGINT) END AS k_arg
FROM calls
"""


@register("llm_tool_call_parse", oracle=_TOOLCALL_ORACLE)
def llm_tool_call_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured tool-call extraction audit — the agent-era parsing
    step: pull the <tool>…</tool> payload out of model output
    (synthesized deterministically: every 7th doc carries a well-formed
    call, every 7th+1 a TRUNCATED one), parse it as JSON with
    null-on-malformed semantics, and report parse success, tool name and
    integer argument per call. Spark's from_json and DuckDB's
    json_valid/json_extract agree exactly on both the well-formed and
    the malformed rows — the audit a tool-use pipeline runs before
    trusting execution.

    Scale shape: pure map-side regexp + JSON parse (whole-stage
    codegen'd JsonToStructs; no UDF); output is call-grain."""
    d = load_table(spark, "documents", sf_dir)
    tool = F.element_at(F.array(*[F.lit(t) for t in _TOOLS]),
                        (F.pmod("doc_id", F.lit(3)) + 1).cast("int"))
    good = F.concat(F.lit('<tool>{"name": "'), tool, F.lit('", "k": '),
                    F.pmod("doc_id", F.lit(5)).cast("string"),
                    F.lit('}</tool>'))
    bad = F.lit('<tool>{"name": "search", "k": </tool>')
    call_str = (F.when(F.pmod("doc_id", F.lit(7)) == 0, good)
                .when(F.pmod("doc_id", F.lit(7)) == 1, bad)
                .otherwise(F.lit("")))
    calls = (d.select("doc_id", call_str.alias("call_str"))
             .where(F.col("call_str") != "")
             .select("doc_id",
                     F.regexp_extract("call_str", "<tool>(.*)</tool>", 1)
                     .alias("payload")))
    parsed = calls.select(
        "doc_id",
        F.from_json("payload", "name string, k bigint").alias("j"))
    return parsed.select(
        "doc_id",
        F.col("j.name").isNotNull().alias("parsed_ok"),
        F.col("j.name").alias("tool_name"),
        F.col("j.k").alias("k_arg"))


# ---------------------------------------------------------------------------
# vocabulary growth (Heaps-law) curve
# ---------------------------------------------------------------------------

_HEAPS_SLICES = 10

_HEAPS_ORACLE = f"""
WITH mx AS (
  SELECT CAST(MAX(doc_id) AS BIGINT) AS m FROM documents
), toks AS (
  SELECT LEAST({_HEAPS_SLICES - 1},
               (d.doc_id * {_HEAPS_SLICES}) // (mx.m + 1)) AS slice,
         unnest(string_split(d.text, ' ')) AS tok
  FROM documents d CROSS JOIN mx
), per_slice AS (
  SELECT slice, CAST(COUNT(*) AS BIGINT) AS n_tok FROM toks GROUP BY slice
), first_seen AS (
  SELECT tok, CAST(MIN(slice) AS BIGINT) AS s0 FROM toks GROUP BY tok
), vocab_new AS (
  SELECT s0 AS slice, CAST(COUNT(*) AS BIGINT) AS n_new
  FROM first_seen GROUP BY s0
), curve AS (
  SELECT p.slice,
         CAST(SUM(p.n_tok) OVER w AS BIGINT) AS cum_tokens,
         CAST(SUM(COALESCE(v.n_new, 0)) OVER w AS BIGINT) AS cum_vocab
  FROM per_slice p LEFT JOIN vocab_new v ON p.slice = v.slice
  WINDOW w AS (ORDER BY p.slice ROWS UNBOUNDED PRECEDING)
), fit AS (
  -- + 0.0 normalizes IEEE -0.0 (a saturated curve's slope is ±1e-17
  -- noise whose SIGN is engine-dependent; the magnitude rounds away)
  SELECT round(regr_slope(ln(CAST(cum_vocab AS DOUBLE)),
                          ln(CAST(cum_tokens AS DOUBLE))), 6) + 0.0 AS beta
  FROM curve
)
SELECT CAST(curve.slice AS BIGINT) AS slice, cum_tokens, cum_vocab,
       fit.beta AS heaps_beta
FROM curve CROSS JOIN fit
"""


@register("llm_vocab_growth_heaps", oracle=_HEAPS_ORACLE)
def llm_vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps-law) curve: cumulative distinct tokens
    vs cumulative token volume across ten corpus prefixes, plus the
    fitted log-log slope β (V ≈ k·Nᵝ) — the does-more-data-still-add-
    content readout a training-data budget reads before the next crawl
    (β near 1 = fresh content, β near 0 = saturation). The curve needs
    NO per-prefix distinct passes: each token folds to its FIRST slice
    (one groupBy), new-vocab counts cumulate over the 10-slice spine,
    and the β fit is regr_slope over 10 log points, rounded 6 dp.

    Scale shape: one token-grain fold (combinable min), one 10-row
    spine; the corpus is scanned exactly once."""
    d = load_table(spark, "documents", sf_dir)
    mx = d.agg(F.max("doc_id").cast("bigint").alias("m"))
    sl = F.least(F.lit(_HEAPS_SLICES - 1),
                 F.floor(F.col("doc_id") * _HEAPS_SLICES
                         / (F.col("m") + 1))).cast("bigint")
    toks = (d.crossJoin(F.broadcast(mx))
            .select(sl.alias("slice"),
                    F.explode(F.split("text", " ")).alias("tok"))
            .localCheckpoint(eager=False))  # volume + first-seen share it
    per_slice = toks.groupBy("slice").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tok"))
    vocab_new = (toks.groupBy("tok")
                 .agg(F.min("slice").cast("bigint").alias("s0"))
                 .groupBy(F.col("s0").alias("slice"))
                 .agg(F.count(F.lit(1)).cast("bigint").alias("n_new")))
    wc = Window.orderBy("slice").rowsBetween(Window.unboundedPreceding,
                                             Window.currentRow)
    curve = (per_slice.join(vocab_new, "slice", "left")
             .select("slice",
                     F.sum("n_tok").over(wc).cast("bigint")
                     .alias("cum_tokens"),
                     F.sum(F.coalesce("n_new", F.lit(0))).over(wc)
                     .cast("bigint").alias("cum_vocab")))
    # + 0.0 normalizes IEEE -0.0 (saturated curve => ±1e-17 slope noise
    # whose sign is engine-dependent; magnitude rounds away)
    fit = curve.agg((F.round(
        F.regr_slope(F.log(F.col("cum_vocab").cast("double")),
                     F.log(F.col("cum_tokens").cast("double"))), 6) + 0.0)
        .alias("beta"))
    return (curve.crossJoin(F.broadcast(fit))
            .select("slice", "cum_tokens", "cum_vocab",
                    F.col("beta").alias("heaps_beta")))


# ---------------------------------------------------------------------------
# MASE forecast evaluation (seasonal-naive baseline)
# ---------------------------------------------------------------------------

_MASE_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hh,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY event_type, epoch_us(ts) // 3600000000
), lagged AS (
  SELECT event_type, hh, cents,
         lag(cents, 24) OVER w AS seasonal_naive,
         lag(cents, 1) OVER w AS naive1
  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hh)
), s AS (
  SELECT event_type,
         CAST(COUNT(CASE WHEN seasonal_naive IS NOT NULL
                          AND naive1 IS NOT NULL THEN 1 END) AS BIGINT)
           AS n_eval,
         CAST(SUM(CASE WHEN seasonal_naive IS NOT NULL
                        AND naive1 IS NOT NULL
                       THEN abs(cents - seasonal_naive) END) AS BIGINT)
           AS sae_seasonal,
         CAST(SUM(CASE WHEN seasonal_naive IS NOT NULL
                        AND naive1 IS NOT NULL
                       THEN abs(cents - naive1) END) AS BIGINT)
           AS sae_naive1
  FROM lagged GROUP BY event_type
)
SELECT event_type, n_eval,
       CAST(sae_seasonal AS DOUBLE) / CAST(n_eval AS DOUBLE)
         AS mae_seasonal_cents,
       CAST(sae_seasonal AS DOUBLE) / CAST(sae_naive1 AS DOUBLE) AS mase
FROM s
"""


@register("ts_mase_eval", oracle=_MASE_ORACLE)
def ts_mase_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE (mean absolute SCALED error) of the lag-24 seasonal-naive
    forecast against the lag-1 naive baseline, per event type — the
    scale-free forecast score that completes ts_forecast_eval_wape
    (percent scale) and ts_pinball_loss_eval (quantile loss): MASE < 1
    means the seasonal forecast beats naive persistence, comparable
    ACROSS series of different magnitudes. Both error sums are exact
    BIGINT cents over the SAME evaluable rows (both lags present); one
    division each for MAE and MASE.

    Scale shape: calendar-bounded hourly fold; two lags off ONE
    type-partitioned window pass; one combinable three-sum fold."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy(
        "event_type",
        F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                / F.lit(3600000000)).cast("bigint").alias("hh"))
        .agg(F.sum(cents).cast("bigint").alias("cents")))
    w = Window.partitionBy("event_type").orderBy("hh")
    lagged = hourly.select(
        "event_type", "cents",
        F.lag("cents", 24).over(w).alias("sn"),
        F.lag("cents", 1).over(w).alias("n1"))
    ok = F.col("sn").isNotNull() & F.col("n1").isNotNull()
    s = lagged.groupBy("event_type").agg(
        F.count(F.when(ok, 1)).cast("bigint").alias("n_eval"),
        F.sum(F.when(ok, F.abs(F.col("cents") - F.col("sn"))))
        .cast("bigint").alias("sae_seasonal"),
        F.sum(F.when(ok, F.abs(F.col("cents") - F.col("n1"))))
        .cast("bigint").alias("sae_naive1"))
    return s.select(
        "event_type", "n_eval",
        (F.col("sae_seasonal").cast("double")
         / F.col("n_eval").cast("double")).alias("mae_seasonal_cents"),
        (F.col("sae_seasonal").cast("double")
         / F.col("sae_naive1").cast("double")).alias("mase"))


# ---------------------------------------------------------------------------
# Cochran's Q (k related binary samples)
# ---------------------------------------------------------------------------

_COCHRAN_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), tm AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k_t,
         CAST(SUM(cents) AS BIGINT) AS s_t
  FROM hourly GROUP BY event_type
), complete_blocks AS (
  SELECT hr FROM hourly GROUP BY hr HAVING COUNT(*) = 5
), flags AS (
  -- integer-safe above-own-mean flag (the McNemar convention)
  SELECT h.hr, h.event_type,
         CASE WHEN h.cents * tm.k_t > tm.s_t THEN 1 ELSE 0 END AS x
  FROM hourly h
  JOIN complete_blocks b ON h.hr = b.hr
  JOIN tm ON h.event_type = tm.event_type
), cols AS (
  SELECT event_type, CAST(SUM(x) AS BIGINT) AS c_j FROM flags
  GROUP BY event_type
), rows_ AS (
  SELECT hr, CAST(SUM(x) AS BIGINT) AS r_i FROM flags GROUP BY hr
), s AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cols) AS k,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM rows_) AS n_blocks,
         (SELECT CAST(SUM(c_j) AS BIGINT) FROM cols) AS n,
         (SELECT CAST(SUM(c_j * c_j) AS BIGINT) FROM cols) AS sum_c2,
         (SELECT CAST(SUM(r_i * r_i) AS BIGINT) FROM rows_) AS sum_r2
)
SELECT n_blocks, k, n AS n_successes,
       -- Q = (k-1) * (k*sum C_j^2 - N^2) / (k*N - sum R_i^2): every
       -- term exact BIGINT, ONE final division
       (CAST(k AS DOUBLE) - 1.0)
         * (CAST(k * sum_c2 AS DOUBLE) - CAST(n * n AS DOUBLE))
         / (CAST(k * n AS DOUBLE) - CAST(sum_r2 AS DOUBLE)) AS cochran_q
FROM s
"""


@register("stat_cochran_q", oracle=_COCHRAN_ORACLE)
def stat_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q across the five event types on hour blocks: do the
    types differ in their above-own-mean RATE when each hour is its own
    block? — the k-treatment generalization of stat_mcnemar_paired
    exactly as stat_friedman_test generalizes the paired rank tests,
    closing the related-samples ladder (sign → Wilcoxon → Friedman for
    magnitudes; McNemar → Cochran Q for binaries). Flags are the same
    integer-safe cents·k > Σ comparisons; complete blocks only; Q
    assembles from four exact integer sums with ONE division.

    Scale shape: calendar-bounded hourly fold; flags map-side against a
    broadcast 5-row moment dim; column/row folds over the bounded block
    grid."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.sum(cents).cast("bigint").alias("cents"))
              .localCheckpoint(eager=False))  # moments + blocks share it
    tm = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_t"),
        F.sum("cents").cast("bigint").alias("s_t"))
    complete = (hourly.groupBy("hr")
                .agg(F.count(F.lit(1)).alias("nb"))
                .where(F.col("nb") == 5).select("hr"))
    flags = (hourly.join(complete, "hr")
             .join(F.broadcast(tm), "event_type")
             .select("hr", "event_type",
                     F.when(F.col("cents") * F.col("k_t") > F.col("s_t"),
                            F.lit(1)).otherwise(F.lit(0)).alias("x")))
    cols = flags.groupBy("event_type").agg(
        F.sum("x").cast("bigint").alias("c_j"))
    rows_ = flags.groupBy("hr").agg(
        F.sum("x").cast("bigint").alias("r_i"))
    cstats = cols.agg(F.count(F.lit(1)).cast("bigint").alias("k"),
                      F.sum("c_j").cast("bigint").alias("n"),
                      F.sum(F.col("c_j") * F.col("c_j")).cast("bigint")
                      .alias("sum_c2"))
    rstats = rows_.agg(F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
                       F.sum(F.col("r_i") * F.col("r_i")).cast("bigint")
                       .alias("sum_r2"))
    s = cstats.crossJoin(F.broadcast(rstats))
    kd = F.col("k").cast("double")
    q = ((kd - F.lit(1.0))
         * ((F.col("k") * F.col("sum_c2")).cast("double")
            - (F.col("n") * F.col("n")).cast("double"))
         / ((F.col("k") * F.col("n")).cast("double")
            - F.col("sum_r2").cast("double")))
    return s.select("n_blocks", "k",
                    F.col("n").alias("n_successes"),
                    q.alias("cochran_q"))


# ---------------------------------------------------------------------------
# DeLong confidence interval for the exact ROC-AUC
# ---------------------------------------------------------------------------

_DELONG_Z = 1.959963985

_DELONG_ORACLE = f"""
WITH c AS (
  SELECT event_type = 'purchase' AS pos,
         CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events WHERE event_type IN ('click', 'purchase')
), dom AS (
  SELECT xc, CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS p,
         CAST(COUNT(*) FILTER (WHERE NOT pos) AS BIGINT) AS q
  FROM c GROUP BY xc
), cum AS (
  SELECT xc, p, q,
         CAST(COALESCE(SUM(q) OVER wb, 0) AS BIGINT) AS q_below,
         CAST(COALESCE(SUM(p) OVER wb, 0) AS BIGINT) AS p_below
  FROM dom
  WINDOW wb AS (ORDER BY xc ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING)
), tot AS (
  SELECT CAST(SUM(p) AS BIGINT) AS np, CAST(SUM(q) AS BIGINT) AS nq
  FROM dom
), s AS (
  -- doubled placement values stay integer: for a positive at value v,
  -- 2*placement*nq = 2*q_below + q (ties count half); for a negative,
  -- 2*placement'*np = 2*(np - p_below - p) + p
  SELECT
    CAST(SUM(CAST(p AS HUGEINT) * (2 * q_below + q)) AS HUGEINT) AS sp1,
    CAST(SUM(CAST(p AS HUGEINT) * (2 * q_below + q)
             * (2 * q_below + q)) AS HUGEINT) AS sp2,
    CAST(SUM(CAST(q AS HUGEINT)
             * (2 * (tot.np - p_below - p) + p)) AS HUGEINT) AS sq1,
    CAST(SUM(CAST(q AS HUGEINT)
             * (2 * (tot.np - p_below - p) + p)
             * (2 * (tot.np - p_below - p) + p)) AS HUGEINT) AS sq2
  FROM cum CROSS JOIN tot
), a AS (
  SELECT tot.np, tot.nq,
         CAST(s.sp1 AS DOUBLE)
           / (2.0 * CAST(tot.np AS DOUBLE) * CAST(tot.nq AS DOUBLE))
           AS auc,
         -- S10 = (E[m^2] - E[m]^2) * np/(np-1) with m = doubled
         -- placement / (2 nq); spelled once per component
         (CAST(s.sp2 AS DOUBLE) / CAST(tot.np AS DOUBLE)
          - (CAST(s.sp1 AS DOUBLE) / CAST(tot.np AS DOUBLE))
            * (CAST(s.sp1 AS DOUBLE) / CAST(tot.np AS DOUBLE)))
         / (4.0 * CAST(tot.nq AS DOUBLE) * CAST(tot.nq AS DOUBLE))
         * (CAST(tot.np AS DOUBLE) / (CAST(tot.np AS DOUBLE) - 1.0))
           AS s10,
         (CAST(s.sq2 AS DOUBLE) / CAST(tot.nq AS DOUBLE)
          - (CAST(s.sq1 AS DOUBLE) / CAST(tot.nq AS DOUBLE))
            * (CAST(s.sq1 AS DOUBLE) / CAST(tot.nq AS DOUBLE)))
         / (4.0 * CAST(tot.np AS DOUBLE) * CAST(tot.np AS DOUBLE))
         * (CAST(tot.nq AS DOUBLE) / (CAST(tot.nq AS DOUBLE) - 1.0))
           AS s01
  FROM s CROSS JOIN tot
)
SELECT np AS n_pos, nq AS n_neg, auc,
       sqrt(s10 / CAST(np AS DOUBLE) + s01 / CAST(nq AS DOUBLE)) AS se,
       auc - {_DELONG_Z} * sqrt(s10 / CAST(np AS DOUBLE)
                                + s01 / CAST(nq AS DOUBLE)) AS ci_lo,
       auc + {_DELONG_Z} * sqrt(s10 / CAST(np AS DOUBLE)
                                + s01 / CAST(nq AS DOUBLE)) AS ci_hi
FROM a
"""


@register("ml_roc_auc_delong_ci", oracle=_DELONG_ORACLE)
def ml_roc_auc_delong_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLong 95% confidence interval for the exact ROC-AUC — the
    interval ml_roc_auc_exact's point estimate never carries (the
    stat_fisher_z_corr_ci move applied to AUC): variance from the
    placement-value components S10 (over positives) and S01 (over
    negatives), var = S10/n₊ + S01/n₋, frozen normal quantile. DOUBLED
    placement values (2·q_below + q, ties half) keep every first and
    second moment an exact wide integer off the domain collapse; the
    only roots are sqrt.

    Scale shape: one combinable domain collapse; one cumulative window
    over the bounded value DOMAIN; one four-sum wide-integer fold to a
    single row — identical shape to ml_roc_auc_exact plus two moments."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    dom = (ev.select((F.col("event_type") == "purchase").alias("pos"),
                     xc.alias("xc"))
           .groupBy("xc")
           .agg(F.count(F.when(F.col("pos"), 1)).cast("bigint").alias("p"),
                F.count(F.when(~F.col("pos"), 1)).cast("bigint")
                .alias("q")))
    wb = Window.orderBy("xc").rowsBetween(Window.unboundedPreceding, -1)
    cum = dom.select(
        "p", "q",
        F.coalesce(F.sum("q").over(wb), F.lit(0)).cast("bigint")
        .alias("q_below"),
        F.coalesce(F.sum("p").over(wb), F.lit(0)).cast("bigint")
        .alias("p_below"))
    tot = dom.agg(F.sum("p").cast("bigint").alias("np"),
                  F.sum("q").cast("bigint").alias("nq"))
    dd = "decimal(38,0)"
    mpos = (2 * F.col("q_below") + F.col("q"))
    mneg = (2 * (F.col("np") - F.col("p_below") - F.col("p")) + F.col("p"))
    s = (cum.crossJoin(F.broadcast(tot))
         .agg(F.sum(F.col("p").cast(dd) * mpos).alias("sp1"),
              F.sum(F.col("p").cast(dd) * mpos * mpos).alias("sp2"),
              F.sum(F.col("q").cast(dd) * mneg).alias("sq1"),
              F.sum(F.col("q").cast(dd) * mneg * mneg).alias("sq2"))
         .crossJoin(F.broadcast(tot)))
    npd = F.col("np").cast("double")
    nqd = F.col("nq").cast("double")
    auc = F.col("sp1").cast("double") / (F.lit(2.0) * npd * nqd)
    s10 = ((F.col("sp2").cast("double") / npd
            - (F.col("sp1").cast("double") / npd)
            * (F.col("sp1").cast("double") / npd))
           / (F.lit(4.0) * nqd * nqd) * (npd / (npd - F.lit(1.0))))
    s01 = ((F.col("sq2").cast("double") / nqd
            - (F.col("sq1").cast("double") / nqd)
            * (F.col("sq1").cast("double") / nqd))
           / (F.lit(4.0) * npd * npd) * (nqd / (nqd - F.lit(1.0))))
    se = F.sqrt(s10 / npd + s01 / nqd)
    return s.select(F.col("np").alias("n_pos"), F.col("nq").alias("n_neg"),
                    auc.alias("auc"), se.alias("se"),
                    (auc - F.lit(_DELONG_Z) * se).alias("ci_lo"),
                    (auc + F.lit(_DELONG_Z) * se).alias("ci_hi"))


# ---------------------------------------------------------------------------
# primary-key uniqueness audit
# ---------------------------------------------------------------------------

_PK_ORACLE = """
SELECT 'orders.o_orderkey' AS pk,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_dup_rows
FROM orders
UNION ALL
SELECT 'customer.c_custkey', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT c_custkey) AS BIGINT),
       CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
FROM customer
UNION ALL
SELECT 'events.event_id', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT event_id) AS BIGINT),
       CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
FROM events
UNION ALL
SELECT 'lineitem.(l_orderkey,l_linenumber)', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT l_orderkey * 100 + l_linenumber) AS BIGINT),
       CAST(COUNT(*) - COUNT(DISTINCT l_orderkey * 100 + l_linenumber)
            AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'documents.doc_id', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT doc_id) AS BIGINT),
       CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT)
FROM documents
"""


@register("dq_pk_uniqueness", oracle=_PK_ORACLE)
def dq_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across five tables in one report —
    the third leg of the round-7 DQ set (referential integrity =
    cross-table, freshness = temporal, this = key-grain): row count,
    distinct key count and duplicate-row count per declared key,
    including one COMPOSITE key (lineitem's order+line, packed into one
    integer since line numbers are < 100 — the packing documented where
    it happens). Exact counts; no divisions.

    Scale shape: five combinable count-distinct folds (partial
    aggregation map-side; the composite packs before hashing); a 5-row
    union."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    ev = load_table(spark, "events", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    d = load_table(spark, "documents", sf_dir)

    def audit(name, df, key):
        return df.agg(
            F.lit(name).alias("pk"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct(key).cast("bigint").alias("n_distinct"),
            (F.count(F.lit(1)) - F.countDistinct(key)).cast("bigint")
            .alias("n_dup_rows")).select(
                "pk", "n_rows", "n_distinct", "n_dup_rows")

    comp = F.col("l_orderkey") * 100 + F.col("l_linenumber")
    return (audit("orders.o_orderkey", o, F.col("o_orderkey"))
            .unionByName(audit("customer.c_custkey", c,
                               F.col("c_custkey")))
            .unionByName(audit("events.event_id", ev, F.col("event_id")))
            .unionByName(audit("lineitem.(l_orderkey,l_linenumber)",
                               li, comp))
            .unionByName(audit("documents.doc_id", d, F.col("doc_id"))))


# ---------------------------------------------------------------------------
# trimmed + winsorized mean (robust location)
# ---------------------------------------------------------------------------

_TRIM_PCT = 10  # percent trimmed/winsorized from EACH tail

_TRIM_ORACLE = f"""
WITH c AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS x
  FROM events WHERE event_type = 'purchase'
), dom AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS t FROM c GROUP BY x
), cum AS (
  SELECT x, t,
         CAST(COALESCE(SUM(t) OVER (ORDER BY x
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING), 0)
              AS BIGINT) AS below,
         CAST(SUM(t) OVER () AS BIGINT) AS n,
         CAST(SUM(x * t) OVER () AS BIGINT) AS total
  FROM dom
), k AS (
  SELECT *, (n * {_TRIM_PCT}) // 100 AS kk FROM cum
), pieces AS (
  -- per value: how many of its copies fall in the bottom-k / top-k
  -- tails (partial-group overlap handled by exact integer clamps)
  SELECT n, kk, total, x,
         GREATEST(0, LEAST(t, kk - below)) AS in_lo,
         GREATEST(0, LEAST(t, (below + t) - (n - kk))) AS in_hi,
         -- boundary values: the value at rank kk+1 / rank n-kk
         CASE WHEN below < kk + 1 AND kk + 1 <= below + t THEN x END
           AS lo_bound,
         CASE WHEN below < n - kk AND n - kk <= below + t THEN x END
           AS hi_bound
  FROM k
), s AS (
  SELECT MAX(n) AS n, MAX(kk) AS kk, MAX(total) AS total,
         CAST(SUM(in_lo * x) AS BIGINT) AS lo_sum,
         CAST(SUM(in_hi * x) AS BIGINT) AS hi_sum,
         CAST(MIN(lo_bound) AS BIGINT) AS p_lo,
         CAST(MIN(hi_bound) AS BIGINT) AS p_hi
  FROM pieces
)
SELECT n, kk AS k_trimmed_each_tail,
       CAST(total - lo_sum - hi_sum AS DOUBLE)
         / CAST(n - 2 * kk AS DOUBLE) AS trimmed_mean_cents,
       CAST(total - lo_sum - hi_sum + kk * p_lo + kk * p_hi AS DOUBLE)
         / CAST(n AS DOUBLE) AS winsorized_mean_cents
FROM s
"""


@register("agg_trimmed_winsorized_mean", oracle=_TRIM_ORACLE)
def agg_trimmed_winsorized_mean(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """10% trimmed and winsorized means of purchase cents — the robust
    location pair between the mean (agg_stats) and the median
    (agg_percentile_disc_exact): trimming DROPS each tail's k values,
    winsorizing CLAMPS them to the cut boundaries. Fully
    domain-collapsed: per-value counts, exact integer clamps for
    partial-group tail overlap (a value straddling the k-th rank
    contributes exactly k−below copies), boundary values by rank pick —
    every sum BIGINT, two final divisions.

    Scale shape: one combinable domain collapse; one cumulative window
    over the bounded value DOMAIN; one fold to a single row."""
    ev = load_table(spark, "events", sf_dir) \
        .where(F.col("event_type") == "purchase")
    x = F.round(F.col("value") * 100, 0).cast("bigint")
    dom = ev.select(x.alias("x")).groupBy("x").agg(
        F.count(F.lit(1)).cast("bigint").alias("t"))
    wb = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    tot = dom.agg(F.sum("t").cast("bigint").alias("n"),
                  F.sum(F.col("x") * F.col("t")).cast("bigint")
                  .alias("total"))
    cum = (dom.select(
        "x", "t",
        F.coalesce(F.sum("t").over(wb), F.lit(0)).cast("bigint")
        .alias("below"))
        .crossJoin(F.broadcast(tot)))
    kk = F.floor(F.col("n") * _TRIM_PCT / 100).cast("bigint")
    in_lo = F.greatest(F.lit(0), F.least(F.col("t"), kk - F.col("below")))
    in_hi = F.greatest(F.lit(0), F.least(
        F.col("t"), (F.col("below") + F.col("t")) - (F.col("n") - kk)))
    lo_bound = F.when((F.col("below") < kk + 1)
                      & (kk + 1 <= F.col("below") + F.col("t")),
                      F.col("x"))
    hi_bound = F.when((F.col("below") < F.col("n") - kk)
                      & (F.col("n") - kk <= F.col("below") + F.col("t")),
                      F.col("x"))
    s = cum.agg(F.max("n").alias("n"), F.max(kk).alias("kk"),
                F.max("total").alias("total"),
                F.sum(in_lo * F.col("x")).cast("bigint").alias("lo_sum"),
                F.sum(in_hi * F.col("x")).cast("bigint").alias("hi_sum"),
                F.min(lo_bound).cast("bigint").alias("p_lo"),
                F.min(hi_bound).cast("bigint").alias("p_hi"))
    return s.select(
        "n", F.col("kk").alias("k_trimmed_each_tail"),
        ((F.col("total") - F.col("lo_sum") - F.col("hi_sum"))
         .cast("double")
         / (F.col("n") - 2 * F.col("kk")).cast("double"))
        .alias("trimmed_mean_cents"),
        ((F.col("total") - F.col("lo_sum") - F.col("hi_sum")
          + F.col("kk") * F.col("p_lo") + F.col("kk") * F.col("p_hi"))
         .cast("double") / F.col("n").cast("double"))
        .alias("winsorized_mean_cents"))


# ===========================================================================
# round-7 third ring
# ===========================================================================

# ---------------------------------------------------------------------------
# market-basket association rules (support / confidence / lift)
# ---------------------------------------------------------------------------

_MB_MIN_PAIR = 2

_BASKET_ORACLE = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n_b AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nb FROM baskets
), item AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_i
  FROM baskets GROUP BY l_partkey
), pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_MB_MIN_PAIR}
)
SELECT p.pa AS part_a, p.pb AS part_b, p.n_pair,
       ia.n_i AS n_a, ib.n_i AS n_b,
       CAST(p.n_pair AS DOUBLE) / CAST(n_b.nb AS DOUBLE) AS support,
       CAST(p.n_pair AS DOUBLE) / CAST(ia.n_i AS DOUBLE)
         AS confidence_a_to_b,
       CAST(p.n_pair AS DOUBLE) * CAST(n_b.nb AS DOUBLE)
         / (CAST(ia.n_i AS DOUBLE) * CAST(ib.n_i AS DOUBLE)) AS lift
FROM pairs p
JOIN item ia ON p.pa = ia.l_partkey
JOIN item ib ON p.pb = ib.l_partkey
CROSS JOIN n_b
"""


@register("seq_market_basket_rules", oracle=_BASKET_ORACLE)
def seq_market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: pair support,
    confidence(A→B) and lift for every co-purchased part pair seen at
    least twice — the Apriori level-2 output that drives
    also-bought recommendations and store layout, and the PROBABILISTIC
    completion of graph_bipartite_copurchase's raw projection (lift > 1
    is the signal; raw co-counts just find popular items). Counts exact,
    three divisions per rule.

    Scale shape: the pair expansion is basket-keyed (bounded by basket
    size, ≤21 pairs per 7-line order — the copurchase discipline); item
    and basket totals are combinable folds; the rule join decorates
    pair rows with two broadcast-scale item dims."""
    li = load_table(spark, "lineitem", sf_dir)
    baskets = (li.select("l_orderkey", "l_partkey").distinct()
               .localCheckpoint(eager=False))  # pairs + items share it
    nb = baskets.agg(F.countDistinct("l_orderkey").cast("bigint")
                     .alias("nb"))
    item = baskets.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.l_partkey") < F.col("b.l_partkey")))
             .groupBy(F.col("a.l_partkey").alias("pa"),
                      F.col("b.l_partkey").alias("pb"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
             .where(F.col("n_pair") >= _MB_MIN_PAIR))
    ia = item.select(F.col("l_partkey").alias("pa"),
                     F.col("n_i").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("pb"),
                     F.col("n_i").alias("n_b"))
    return (pairs.join(ia, "pa").join(ib, "pb")
            .crossJoin(F.broadcast(nb))
            .select(F.col("pa").alias("part_a"),
                    F.col("pb").alias("part_b"), "n_pair", "n_a", "n_b",
                    (F.col("n_pair").cast("double")
                     / F.col("nb").cast("double")).alias("support"),
                    (F.col("n_pair").cast("double")
                     / F.col("n_a").cast("double"))
                    .alias("confidence_a_to_b"),
                    (F.col("n_pair").cast("double")
                     * F.col("nb").cast("double")
                     / (F.col("n_a").cast("double")
                        * F.col("n_b").cast("double"))).alias("lift")))


# ---------------------------------------------------------------------------
# UMass topic coherence over per-language top terms
# ---------------------------------------------------------------------------

_UMASS_TOPK = 5

_UMASS_ORACLE = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS tok
  FROM documents
), df AS (
  SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS d
  FROM dt GROUP BY tok
), top_terms AS (
  SELECT lang, tok, d, rk FROM (
    SELECT l.lang, l.tok, f.d,
           row_number() OVER (PARTITION BY l.lang
                              ORDER BY l.ld DESC, l.tok) AS rk
    FROM (SELECT lang, tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS ld
          FROM dt GROUP BY lang, tok) l
    JOIN df f ON l.tok = f.tok
  ) WHERE rk <= {_UMASS_TOPK}
), co AS (
  SELECT a.lang, a.rk AS ri, b.rk AS rj, a.tok AS wi, b.tok AS wj, b.d AS dj,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM
            (SELECT doc_id FROM dt x WHERE x.tok = a.tok
             INTERSECT
             SELECT doc_id FROM dt y WHERE y.tok = b.tok) t) AS dij
  FROM top_terms a JOIN top_terms b
    ON a.lang = b.lang AND a.rk < b.rk
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       round(list_sum(list(ln((CAST(dij AS DOUBLE) + 1.0)
                              / CAST(dj AS DOUBLE))
                           ORDER BY ri, rj)), 6) AS umass_coherence
FROM co GROUP BY lang
"""


@register("llm_topic_coherence_umass", oracle=_UMASS_ORACLE)
def llm_topic_coherence_umass(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """UMass topic coherence for each language's top-5 document-
    frequency terms — the do-these-terms-actually-co-occur score that
    separates a real topic from a frequency artifact (the standard
    evaluation next to llm_cluster_topic_terms' c-TF-IDF labels):
    C = Σ_{{i<j}} ln((D(wᵢ,wⱼ)+1)/D(wⱼ)) over the rank-ordered pairs.
    Doc frequencies and co-frequencies are exact counts; the ≤10-term
    fold per language runs in FIXED pair order (the ANOVA rule) and
    rounds 6 dp after the one ln chain.

    Scale shape: one (doc, token) distinct fold; top terms per language
    are a partitioned window over language-bounded term lists;
    co-occurrence joins the ≤25-row term-pair spine against the
    doc-token table (broadcast spine, corpus-side combinable count)."""
    d = load_table(spark, "documents", sf_dir)
    dt = (d.select("doc_id", "lang",
                   F.explode(F.split("text", " ")).alias("tok"))
          .distinct()
          .localCheckpoint(eager=False))  # df, lang-df and co share it
    df = dt.groupBy("tok").agg(
        F.countDistinct("doc_id").cast("bigint").alias("d"))
    ld = dt.groupBy("lang", "tok").agg(
        F.countDistinct("doc_id").cast("bigint").alias("ld"))
    wl = Window.partitionBy("lang").orderBy(F.col("ld").desc(), "tok")
    top = (ld.join(df, "tok")
           .select("lang", "tok", "d",
                   F.row_number().over(wl).alias("rk"))
           .where(F.col("rk") <= _UMASS_TOPK))
    a = top.select("lang", F.col("rk").alias("ri"),
                   F.col("tok").alias("wi"))
    b = top.select(F.col("lang").alias("lb"), F.col("rk").alias("rj"),
                   F.col("tok").alias("wj"), F.col("d").alias("dj"))
    spine = a.join(b, (F.col("lang") == F.col("lb"))
                   & (F.col("ri") < F.col("rj"))).drop("lb")
    # co-document counts: join the pair spine to the doc-token table on
    # BOTH terms (two corpus-side semi-shaped joins, spine broadcast)
    d1 = dt.select(F.col("doc_id").alias("da"), F.col("tok").alias("wi"))
    d2 = dt.select(F.col("doc_id").alias("db"), F.col("tok").alias("wj2"))
    co = (spine.join(d1, "wi")
          .join(d2, (F.col("wj") == F.col("wj2"))
                & (F.col("da") == F.col("db")))
          .groupBy("lang", "ri", "rj", "wj", "dj")
          .agg(F.count(F.lit(1)).cast("bigint").alias("dij")))
    term = F.log((F.col("dij").cast("double") + F.lit(1.0))
                 / F.col("dj").cast("double"))
    return (co.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                 F.round(F.aggregate(
                     F.array_sort(F.collect_list(F.struct(
                         F.col("ri"), F.col("rj"), term.alias("v")))),
                     F.lit(0.0), lambda acc, x: acc + x["v"]), 6)
                 .alias("umass_coherence")))


# ---------------------------------------------------------------------------
# self-BLEU corpus diversity audit
# ---------------------------------------------------------------------------

_SBLEU_N = 40
_SBLEU_Q = 1_000_000_000

_SELF_BLEU_ORACLE = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
  WHERE doc_id < {_SBLEU_N} AND len(string_split(text, ' ')) >= 20
), p1 AS (
  SELECT doc_id, g, COUNT(*) AS c FROM (
    SELECT doc_id, unnest(l[1:{_BLEU_PRED_LEN}]) AS g FROM base)
  GROUP BY doc_id, g
), p2 AS (
  SELECT doc_id, g, COUNT(*) AS c FROM (
    SELECT doc_id, unnest(list_transform(range(1, {_BLEU_PRED_LEN}),
                                         i -> l[i] || ' ' || l[i + 1])) AS g
    FROM base) GROUP BY doc_id, g
), g1 AS (
  SELECT doc_id, g, COUNT(*) AS c FROM (
    SELECT doc_id, unnest(l[6:{5 + _BLEU_GOLD_LEN}]) AS g FROM base)
  GROUP BY doc_id, g
), g2 AS (
  SELECT doc_id, g, COUNT(*) AS c FROM (
    SELECT doc_id, unnest(list_transform(range(6, {5 + _BLEU_GOLD_LEN}),
                                         i -> l[i] || ' ' || l[i + 1])) AS g
    FROM base) GROUP BY doc_id, g
), ov1 AS (
  SELECT p.doc_id AS a, r.doc_id AS b,
         CAST(SUM(LEAST(p.c, r.c)) AS BIGINT) AS o1
  FROM p1 p JOIN g1 r ON p.g = r.g AND p.doc_id <> r.doc_id
  GROUP BY p.doc_id, r.doc_id
), ov2 AS (
  SELECT p.doc_id AS a, r.doc_id AS b,
         CAST(SUM(LEAST(p.c, r.c)) AS BIGINT) AS o2
  FROM p2 p JOIN g2 r ON p.g = r.g AND p.doc_id <> r.doc_id
  GROUP BY p.doc_id, r.doc_id
), pair_bleu AS (
  SELECT ov1.a,
         CAST(round({_BLEU_BP!r}
              * sqrt((CAST(ov1.o1 AS DOUBLE) / {_BLEU_PRED_LEN}.0)
                     * (CAST(COALESCE(ov2.o2, 0) AS DOUBLE)
                        / {_BLEU_PRED_LEN - 1}.0)) * {_SBLEU_Q}, 0)
              AS BIGINT) AS q
  FROM ov1 LEFT JOIN ov2 ON ov1.a = ov2.a AND ov1.b = ov2.b
), nref AS (
  SELECT CAST(COUNT(*) AS BIGINT) - 1 AS m FROM base
)
SELECT a AS doc_id, MAX(nref.m) AS n_refs,
       CAST(CAST(SUM(q) AS BIGINT) AS DOUBLE)
         / ({_SBLEU_Q}.0 * CAST(MAX(nref.m) AS DOUBLE)) AS mean_self_bleu
FROM pair_bleu CROSS JOIN nref
GROUP BY a
"""


@register("llm_self_bleu_diversity", oracle=_SELF_BLEU_ORACLE)
def llm_self_bleu_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-BLEU diversity audit on a bounded doc_id < 40 slice: each
    document's BLEU-2 against every OTHER document as reference,
    averaged — the standard homogeneity alarm for generated corpora
    (high self-BLEU = mode collapse; the diversity counterpart of the
    dedup family's near-duplicate rate). Pairs with zero unigram
    overlap contribute 0 by omission (the LEFT-join/COALESCE spelling is
    identical in both engines); each pair's BLEU quantizes to 1e-9
    units so the per-document mean over 39 references is an associative
    integer fold (the DFT discipline).

    Scale shape: the audit slice is FIXED (40 docs → 1,560 pairs) no
    matter the corpus; gram tables are per-doc bounded; overlap joins
    are gram-keyed."""
    d = load_table(spark, "documents", sf_dir)
    toks = F.split(F.col("text"), " ")
    base = (d.where((F.col("doc_id") < _SBLEU_N) & (F.size(toks) >= 20))
            .select("doc_id", toks.alias("l"))
            .localCheckpoint(eager=False))

    def grams(start, length, n, side):
        if n == 1:
            col = F.explode(F.slice("l", start, length))
        else:
            col = F.explode(F.transform(
                F.sequence(F.lit(start), F.lit(start + length - 2)),
                lambda i: F.concat_ws(" ", F.element_at("l", i),
                                      F.element_at("l", i + 1))))
        return (base.select(F.col("doc_id").alias(side), col.alias("g"))
                .groupBy(side, "g").agg(F.count(F.lit(1)).alias("c")))

    def overlap(pred, ref, out):
        p, r = pred.alias("p"), ref.alias("r")
        return (p.join(r, (F.col("p.g") == F.col("r.g"))
                       & (F.col("p.a") != F.col("r.b")))
                .groupBy("p.a", "r.b")
                .agg(F.sum(F.least(F.col("p.c"), F.col("r.c")))
                     .cast("bigint").alias(out)))

    ov1 = overlap(grams(1, _BLEU_PRED_LEN, 1, "a"),
                  grams(6, _BLEU_GOLD_LEN, 1, "b"), "o1")
    ov2 = overlap(grams(1, _BLEU_PRED_LEN, 2, "a"),
                  grams(6, _BLEU_GOLD_LEN, 2, "b"), "o2")
    p1 = F.col("o1").cast("double") / F.lit(float(_BLEU_PRED_LEN))
    p2 = (F.coalesce(F.col("o2"), F.lit(0)).cast("double")
          / F.lit(float(_BLEU_PRED_LEN - 1)))
    q = F.round(F.lit(_BLEU_BP) * F.sqrt(p1 * p2) * F.lit(_SBLEU_Q), 0) \
        .cast("bigint")
    nref = base.agg((F.count(F.lit(1)) - 1).cast("bigint").alias("m"))
    pair = (ov1.join(ov2, ["a", "b"], "left")
            .select("a", q.alias("q")))
    return (pair.crossJoin(F.broadcast(nref))
            .groupBy(F.col("a").alias("doc_id"))
            .agg(F.max("m").alias("n_refs"),
                 (F.sum("q").cast("bigint").cast("double")
                  / (F.lit(float(_SBLEU_Q)) * F.max("m").cast("double")))
                 .alias("mean_self_bleu")))


# ---------------------------------------------------------------------------
# KS uniformity audit of the house md5 sampler
# ---------------------------------------------------------------------------

# asymptotic two-sided Kolmogorov critical value at alpha = 0.05
_KS_CRIT_05 = 1.358102
_KS_SCALE = 1 << 60  # md5 15-hex-digit keys are uniform on [0, 2^60)


_KS_MD5_ORACLE = f"""
WITH keyed AS (
  SELECT event_id,
         CAST(concat('0x', substring(md5(CAST(event_id AS VARCHAR)
                                         || ':ks-audit'), 1, 15))
              AS BIGINT) AS u
  FROM events
), ranked AS (
  SELECT u, CAST(row_number() OVER (ORDER BY u, event_id) AS BIGINT) AS i,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM keyed
), gaps AS (
  -- both one-sided gaps, kept as EXACT integer numerators over the
  -- common denominator n * 2^60 (HUGEINT: i * 2^60 passes int64)
  SELECT n,
         GREATEST(CAST(i AS HUGEINT) * {_KS_SCALE}
                    - CAST(u AS HUGEINT) * n,
                  CAST(u AS HUGEINT) * n
                    - (CAST(i AS HUGEINT) - 1) * {_KS_SCALE}) AS num
  FROM ranked
)
SELECT MAX(n) AS n,
       CAST(MAX(num) AS DOUBLE)
         / (CAST(MAX(n) AS DOUBLE) * {_KS_SCALE}.0) AS d_stat,
       sqrt(CAST(MAX(n) AS DOUBLE)) * CAST(MAX(num) AS DOUBLE)
         / (CAST(MAX(n) AS DOUBLE) * {_KS_SCALE}.0) AS sqrt_n_d,
       sqrt(CAST(MAX(n) AS DOUBLE)) * CAST(MAX(num) AS DOUBLE)
         / (CAST(MAX(n) AS DOUBLE) * {_KS_SCALE}.0) >= {_KS_CRIT_05}
         AS reject_uniform_5pct
FROM gaps
"""


@register("stat_ks_uniform_md5_audit", oracle=_KS_MD5_ORACLE)
def stat_ks_uniform_md5_audit(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov uniformity audit of the house md5 randomness
    itself: the 60-bit keys every deterministic sampler / bootstrap /
    permutation op draws from, tested against U(0, 2⁶⁰) — the engine
    auditing its own randomness supply (a biased key stream would
    silently corrupt every seeded operator upstream). Both one-sided
    ECDF gaps stay EXACT integer numerators over the common n·2⁶⁰
    denominator (decimal(38,0) cross-multiplication — no float ECDF
    anywhere); D converts to double once; √n·D compares against the
    frozen asymptotic 5% critical value.

    Scale shape: the global rank over the key stream is the two-pass
    bucketed rank (bucketed.py — no single-partition window over the
    event table); one wide-integer max fold to a single row."""
    ev = load_table(spark, "events", sf_dir)
    u = F.conv(F.substring(
        F.md5(F.concat(F.col("event_id").cast("string"),
                       F.lit(":ks-audit"))), 1, 15), 16, 10).cast("bigint")
    keyed = ev.select("event_id", u.alias("u"))
    tot = keyed.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked = (bucketed_order(keyed, "u", ["event_id"], rank_col="i")
              .crossJoin(F.broadcast(tot)))
    dd = "decimal(38,0)"
    num = F.greatest(
        F.col("i").cast(dd) * _KS_SCALE - F.col("u").cast(dd) * F.col("n"),
        F.col("u").cast(dd) * F.col("n")
        - (F.col("i").cast(dd) - 1) * _KS_SCALE)
    g = ranked.agg(F.max("n").alias("n"), F.max(num).alias("num"))
    d_stat = (F.col("num").cast("double")
              / (F.col("n").cast("double") * F.lit(float(_KS_SCALE))))
    snd = F.sqrt(F.col("n").cast("double")) * d_stat
    return g.select("n", d_stat.alias("d_stat"), snd.alias("sqrt_n_d"),
                    (snd >= F.lit(_KS_CRIT_05))
                    .alias("reject_uniform_5pct"))


# ---------------------------------------------------------------------------
# Poisson dispersion (variance-to-mean) test on hourly arrival counts
# ---------------------------------------------------------------------------

_DISPERSION_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM hourly GROUP BY event_type
)
SELECT event_type, n AS n_hours,
       CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_count,
       -- sample variance via the exact-sum identity, one tree
       (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                             / CAST(n AS DOUBLE))
         / (CAST(n AS DOUBLE) - 1.0)
         / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS dispersion_index,
       (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                             / CAST(n AS DOUBLE))
         / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS chi2_stat
FROM s
"""


@register("stat_poisson_dispersion", oracle=_DISPERSION_ORACLE)
def stat_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson dispersion test on hourly arrival counts per event type:
    the variance-to-mean index and its χ² form (n−1)·s²/x̄ — IS traffic
    Poisson, or bursty? The formal companion to ts_burstiness_fano
    (same index, different grain), and the gate before any
    Poisson-assuming capacity model. Counts and both power sums are
    exact integers; the index assembles in one identical tree with two
    divisions.

    Scale shape: calendar-bounded hourly count fold; one combinable
    three-sum fold per type."""
    ev = load_table(spark, "events", sf_dir)
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    s = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"))
    nd = F.col("n").cast("double")
    s1d = F.col("s1").cast("double")
    ss = F.col("s2").cast("double") - s1d * s1d / nd
    mean = s1d / nd
    return s.select("event_type", F.col("n").alias("n_hours"),
                    mean.alias("mean_count"),
                    (ss / (nd - F.lit(1.0)) / mean)
                    .alias("dispersion_index"),
                    (ss / mean).alias("chi2_stat"))


# ---------------------------------------------------------------------------
# orders <-> lineitem reconciliation audit
# ---------------------------------------------------------------------------

_RECON_ORACLE = """
WITH li AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
              AS BIGINT) AS li_cents
  FROM lineitem GROUP BY l_orderkey
), j AS (
  SELECT CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS o_cents,
         li.li_cents
  FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
), classed AS (
  -- integer-safe relative-gap buckets: |o - l| vs 1% / 10% of o
  SELECT CASE
           WHEN li_cents IS NULL THEN 'no_lineitems'
           WHEN o_cents = li_cents THEN 'exact'
           WHEN abs(o_cents - li_cents) * 100 <= o_cents THEN 'within_1pct'
           WHEN abs(o_cents - li_cents) * 10 <= o_cents THEN 'within_10pct'
           ELSE 'beyond_10pct'
         END AS bucket,
         o_cents, li_cents
  FROM j
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_cents) AS BIGINT) AS order_cents,
       CAST(SUM(COALESCE(li_cents, 0)) AS BIGINT) AS lineitem_cents
FROM classed GROUP BY bucket
"""


@register("dq_reconciliation_orders_lineitem", oracle=_RECON_ORACLE)
def dq_reconciliation_orders_lineitem(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Header-to-detail reconciliation: every order's stated total
    against the sum of its line extended prices, bucketed by
    INTEGER-safe relative gap (exact / ≤1% / ≤10% / beyond /
    no-lineitems) — the classic warehouse fact-to-fact consistency
    audit (TPC-H totals legitimately differ from Σ extendedprice by
    discount/tax, so the report shows a real distribution, not vacuous
    greens — the dq_referential_integrity design rule). Gap edges are
    cross-multiplications (|Δ|·100 ≤ total), never float ratios.

    Scale shape: one order-keyed lineitem fold, one same-key LEFT join
    (both sides hash l_orderkey — one exchange each), a ≤5-row
    rollup."""
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    lic = li.groupBy("l_orderkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
        .cast("bigint").alias("li_cents"))
    oc = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    j = (o.select(F.col("o_orderkey"), oc.alias("o_cents"))
         .join(lic, F.col("o_orderkey") == F.col("l_orderkey"), "left"))
    gap = F.abs(F.col("o_cents") - F.col("li_cents"))
    bucket = (F.when(F.col("li_cents").isNull(), "no_lineitems")
              .when(F.col("o_cents") == F.col("li_cents"), "exact")
              .when(gap * 100 <= F.col("o_cents"), "within_1pct")
              .when(gap * 10 <= F.col("o_cents"), "within_10pct")
              .otherwise("beyond_10pct"))
    return (j.select(bucket.alias("bucket"), "o_cents", "li_cents")
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                 F.sum("o_cents").cast("bigint").alias("order_cents"),
                 F.sum(F.coalesce("li_cents", F.lit(0))).cast("bigint")
                 .alias("lineitem_cents")))


# ---------------------------------------------------------------------------
# NATURAL JOIN / JOIN USING surface
# ---------------------------------------------------------------------------

_NATURAL_ORACLE = """
WITH o AS (
  SELECT o_custkey AS custkey, o_orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
), c AS (
  SELECT c_custkey AS custkey, c_mktsegment FROM customer
), nat AS (
  SELECT 'natural' AS variant, c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM o NATURAL JOIN c GROUP BY c_mktsegment
), usg AS (
  SELECT 'using' AS variant, c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM o JOIN c USING (custkey) GROUP BY c_mktsegment
)
SELECT * FROM nat UNION ALL SELECT * FROM usg
"""


@register("sql_natural_using_join", oracle=_NATURAL_ORACLE)
def sql_natural_using_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATURAL JOIN and JOIN USING — the two implicit-key join spellings
    (common-column inference vs named shared column), run side by side
    over the same aliased views and REQUIRED to agree; the oracle runs
    the IDENTICAL text on DuckDB so the key-inference semantics — one
    output column per shared name, no duplicate key columns — are what
    parity verifies (the sql_group_by_ordinal precedent).

    Scale shape: both variants resolve to the same hash equi-join plan;
    the sugar is analyzer-only."""
    load_table(spark, "orders", sf_dir) \
        .createOrReplaceTempView("lts_nat_o_v")
    load_table(spark, "customer", sf_dir) \
        .createOrReplaceTempView("lts_nat_c_v")
    return spark.sql("""
        WITH o AS (
          SELECT o_custkey AS custkey, o_orderkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          FROM lts_nat_o_v
        ), c AS (
          SELECT c_custkey AS custkey, c_mktsegment FROM lts_nat_c_v
        ), nat AS (
          SELECT 'natural' AS variant, c_mktsegment,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 CAST(SUM(cents) AS BIGINT) AS cents
          FROM o NATURAL JOIN c GROUP BY c_mktsegment
        ), usg AS (
          SELECT 'using' AS variant, c_mktsegment,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 CAST(SUM(cents) AS BIGINT) AS cents
          FROM o JOIN c USING (custkey) GROUP BY c_mktsegment
        )
        SELECT * FROM nat UNION ALL SELECT * FROM usg
    """)


# ---------------------------------------------------------------------------
# builtin median / exact interpolation surface
# ---------------------------------------------------------------------------

_MEDIAN_ORACLE = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       median(CAST(round(value * 100, 0) AS BIGINT)) AS median_cents
FROM events GROUP BY event_type
"""


@register("agg_median_builtin", oracle=_MEDIAN_ORACLE)
def agg_median_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The builtin median() aggregate (Spark 3.4+) on integer cents per
    event type — the one-call surface next to the family's explicit
    rank-pick medians (agg_percentile_disc_exact picks discretely;
    this one INTERPOLATES the even-count midpoint, and both engines
    interpolate identically on integer inputs: the .5 midpoint of two
    int64 cents is exact in double).

    Scale shape: Spark plans median as a single-pass typed aggregate
    (no global sort); the fold is per-type parallel."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    return (ev.select("event_type", cents.alias("c"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.median("c").alias("median_cents")))


# ---------------------------------------------------------------------------
# Bollinger bands on the daily revenue series
# ---------------------------------------------------------------------------

_BOLL_W = 7

_BOLL_ORACLE = f"""
WITH daily AS (
  SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d')
), rolled AS (
  SELECT event_type, day, cents,
         CAST(SUM(cents) OVER w AS BIGINT) AS s1,
         CAST(SUM(cents * cents) OVER w AS BIGINT) AS s2,
         CAST(COUNT(*) OVER w AS BIGINT) AS m
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {_BOLL_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, cents, m AS window_days,
       CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE) AS band_mid,
       CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE)
         + 2.0 * sqrt(CAST(s2 AS DOUBLE) / CAST(m AS DOUBLE)
                      - (CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
                        * (CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE)))
         AS band_hi,
       CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE)
         - 2.0 * sqrt(CAST(s2 AS DOUBLE) / CAST(m AS DOUBLE)
                      - (CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
                        * (CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE)))
         AS band_lo,
       CAST(cents AS DOUBLE)
         > CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE)
           + 2.0 * sqrt(CAST(s2 AS DOUBLE) / CAST(m AS DOUBLE)
                        - (CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
                          * (CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE)))
         AS breakout_hi
FROM rolled WHERE m = {_BOLL_W}
"""


@register("ts_bollinger_bands", oracle=_BOLL_ORACLE)
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (7-day rolling mean ± 2 population σ) on the
    daily revenue series per event type, with the high-side breakout
    flag — the mean-reversion envelope next to ts_anomaly_zscore's
    global-σ flags (a rolling band adapts to regime shifts; a global
    band doesn't). Both rolling power sums are exact BIGINT cents off
    ONE window pass; mid/hi/lo assemble in an identical tree (sqrt
    only); partial leading windows are excluded so every band is a
    full-width estimate.

    Scale shape: calendar-bounded daily fold; one type-partitioned
    ROWS-frame window pass serves count and both sums."""
    ev = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    daily = (ev.groupBy("event_type",
                        F.date_format("ts", "yyyy-MM-dd").alias("day"))
             .agg(F.sum(cents).cast("bigint").alias("cents")))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(-(_BOLL_W - 1), Window.currentRow))
    rolled = daily.select(
        "event_type", "day", "cents",
        F.sum("cents").over(w).cast("bigint").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).over(w).cast("bigint")
        .alias("s2"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("m"))
    md = F.col("m").cast("double")
    mid = F.col("s1").cast("double") / md
    sd = F.sqrt(F.col("s2").cast("double") / md - mid * mid)
    hi = mid + F.lit(2.0) * sd
    lo = mid - F.lit(2.0) * sd
    return (rolled.where(F.col("m") == _BOLL_W)
            .select("event_type", "day", "cents",
                    F.col("m").alias("window_days"),
                    mid.alias("band_mid"), hi.alias("band_hi"),
                    lo.alias("band_lo"),
                    (F.col("cents").cast("double") > hi)
                    .alias("breakout_hi")))


# ===========================================================================
# round-7 fourth ring
# ===========================================================================

# ---------------------------------------------------------------------------
# TOST equivalence test (two one-sided tests)
# ---------------------------------------------------------------------------

_TOST_MARGIN = 500       # cents: the practical-equivalence margin
_TOST_Z05 = 1.644853627  # one-sided 5% normal quantile, frozen

_TOST_ORACLE = f"""
WITH c AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS x
  FROM events WHERE event_type IN ('click', 'purchase')
), s AS (
  SELECT
    CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n1,
    CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n2,
    CAST(SUM(x) FILTER (WHERE event_type = 'click') AS BIGINT) AS s1,
    CAST(SUM(x) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS s2,
    CAST(SUM(CAST(x AS HUGEINT) * x)
         FILTER (WHERE event_type = 'click') AS HUGEINT) AS q1,
    CAST(SUM(CAST(x AS HUGEINT) * x)
         FILTER (WHERE event_type = 'purchase') AS HUGEINT) AS q2
  FROM c
), m AS (
  SELECT n1, n2,
         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
           - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS d,
         sqrt((CAST(q1 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / CAST(n1 AS DOUBLE))
              / (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE)
              + (CAST(q2 AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                   / CAST(n2 AS DOUBLE))
                / (CAST(n2 AS DOUBLE) - 1.0) / CAST(n2 AS DOUBLE)) AS se
  FROM s
)
SELECT n1 AS n_click, n2 AS n_purchase, d AS mean_diff_cents, se,
       (d + {_TOST_MARGIN}.0) / se AS t_lower,
       (d - {_TOST_MARGIN}.0) / se AS t_upper,
       ((d + {_TOST_MARGIN}.0) / se >= {_TOST_Z05}
        AND (d - {_TOST_MARGIN}.0) / se <= -{_TOST_Z05})
         AS equivalent_within_margin
FROM m
"""


@register("stat_tost_equivalence", oracle=_TOST_ORACLE)
def stat_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test (two one-sided tests) on the click vs
    purchase mean cents with a ±500-cent practical margin — the inverse
    question every "no significant difference" misreads: can we
    POSITIVELY claim the means are within the margin?
    (stat_welch_ttest asks 'different?'; this asks 'same enough?' —
    both belong in an A/B platform). Welch standard error off exact
    integer moments; both one-sided z statistics against the frozen
    one-sided 5% quantile; equivalence = both reject.

    Scale shape: ONE combinable six-sum fold over the scan to a single
    row (the Welch shape)."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    x = F.round(F.col("value") * 100, 0).cast("bigint")
    is1 = F.col("event_type") == "click"
    c = ev.select(is1.alias("is1"), x.alias("x"),
                  x.cast("decimal(38,0)").alias("xd"))
    s = c.agg(
        F.count(F.when(F.col("is1"), 1)).cast("bigint").alias("n1"),
        F.count(F.when(~F.col("is1"), 1)).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("is1"), F.col("x"))).cast("bigint").alias("s1"),
        F.sum(F.when(~F.col("is1"), F.col("x"))).cast("bigint")
        .alias("s2"),
        F.sum(F.when(F.col("is1"), F.col("xd") * F.col("x"))).alias("q1"),
        F.sum(F.when(~F.col("is1"), F.col("xd") * F.col("x")))
        .alias("q2"))
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    d = (F.col("s1").cast("double") / n1d
         - F.col("s2").cast("double") / n2d)
    v1 = ((F.col("q1").cast("double")
           - F.col("s1").cast("double") * F.col("s1").cast("double") / n1d)
          / (n1d - F.lit(1.0)) / n1d)
    v2 = ((F.col("q2").cast("double")
           - F.col("s2").cast("double") * F.col("s2").cast("double") / n2d)
          / (n2d - F.lit(1.0)) / n2d)
    se = F.sqrt(v1 + v2)
    tl = (d + F.lit(float(_TOST_MARGIN))) / se
    tu = (d - F.lit(float(_TOST_MARGIN))) / se
    return s.select(
        F.col("n1").alias("n_click"), F.col("n2").alias("n_purchase"),
        d.alias("mean_diff_cents"), se.alias("se"),
        tl.alias("t_lower"), tu.alias("t_upper"),
        ((tl >= F.lit(_TOST_Z05)) & (tu <= F.lit(-_TOST_Z05)))
        .alias("equivalent_within_margin"))


# ---------------------------------------------------------------------------
# SPRT sequential conversion test, daily grain
# ---------------------------------------------------------------------------

# H0: conversion = 0.18, H1: 0.22; alpha = beta = 0.05. All four
# transcendentals frozen (log-likelihood ratios per success/failure and
# the two Wald boundaries ±ln((1-beta)/alpha) = ±ln 19).
_SPRT_LR1 = 0.20067069546215124     # ln(0.22/0.18)
_SPRT_LR0 = -0.050010420574661305   # ln(0.78/0.82)
_SPRT_A = 2.9444389791664403        # accept H1 boundary
_SPRT_B = -2.9444389791664403       # accept H0 boundary

_SPRT_ORACLE = f"""
WITH daily AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
           AS k
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY strftime(CAST(ts AS DATE), '%Y-%m-%d')
), llr AS (
  SELECT day, n, k,
         CAST(k AS DOUBLE) * {_SPRT_LR1!r}
           + CAST(n - k AS DOUBLE) * {_SPRT_LR0!r} AS llr_day
  FROM daily
), cum AS (
  SELECT day, n, k, llr_day,
         SUM(llr_day) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
           AS cum_llr
  FROM llr
)
SELECT day, n, k, cum_llr,
       CASE WHEN cum_llr >= {_SPRT_A!r} THEN 'accept_h1'
            WHEN cum_llr <= {_SPRT_B!r} THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM cum
"""


@register("stat_sprt_daily", oracle=_SPRT_ORACLE)
def stat_sprt_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's SPRT on the daily conversion rate (purchase share of
    click+purchase), H0 p=0.18 vs H1 p=0.22 at α=β=0.05 — the
    SEQUENTIAL test that lets an experiment stop the day the evidence
    crosses a Wald boundary instead of waiting out a fixed horizon (the
    streaming-native member of the testing family; stream_drift_
    bucket_counts is its state shape). All four transcendentals are
    FROZEN literals; daily LLR increments are integer-count ×
    frozen-literal products; the cumulative sum runs over the ordered
    calendar (deterministic sequential fold in both engines).

    Scale shape: one combinable daily two-count fold; the cumulative
    window runs over the calendar-bounded day series."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    daily = (ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                  F.count(F.when(F.col("event_type") == "purchase", 1))
                  .cast("bigint").alias("k")))
    llr = (F.col("k").cast("double") * F.lit(_SPRT_LR1)
           + (F.col("n") - F.col("k")).cast("double") * F.lit(_SPRT_LR0))
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow)
    cum = daily.select("day", "n", "k", llr.alias("llr_day")) \
        .select("day", "n", "k",
                F.sum("llr_day").over(wc).alias("cum_llr"))
    decision = (F.when(F.col("cum_llr") >= F.lit(_SPRT_A), "accept_h1")
                .when(F.col("cum_llr") <= F.lit(_SPRT_B), "accept_h0")
                .otherwise("continue"))
    return cum.select("day", "n", "k", "cum_llr",
                      decision.alias("decision"))


# ---------------------------------------------------------------------------
# optimal-F1 threshold pick
# ---------------------------------------------------------------------------

_F1_ORACLE = """
WITH c AS (
  SELECT event_type = 'purchase' AS pos,
         CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events WHERE event_type IN ('click', 'purchase')
), dom AS (
  SELECT xc, CAST(COUNT(*) AS BIGINT) AS t,
         CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS p
  FROM c GROUP BY xc
), cum AS (
  SELECT xc,
         CAST(SUM(t) OVER w AS BIGINT) AS cum_t,
         CAST(SUM(p) OVER w AS BIGINT) AS cum_p,
         CAST(SUM(p) OVER () AS BIGINT) AS np
  FROM dom WINDOW w AS (ORDER BY xc DESC ROWS UNBOUNDED PRECEDING)
), scored AS (
  SELECT xc AS threshold_cents,
         cum_p AS tp, cum_t - cum_p AS fp, np - cum_p AS fn,
         2.0 * CAST(cum_p AS DOUBLE)
           / (2.0 * CAST(cum_p AS DOUBLE)
              + CAST(cum_t - cum_p AS DOUBLE)
              + CAST(np - cum_p AS DOUBLE)) AS f1
  FROM cum
)
SELECT threshold_cents, tp, fp, fn,
       CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision_at,
       CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall_at,
       f1
FROM scored
ORDER BY f1 DESC, threshold_cents DESC
LIMIT 1
"""


@register("ml_optimal_f1_threshold", oracle=_F1_ORACLE)
def ml_optimal_f1_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The F1-optimal decision threshold for the value-predicts-purchase
    score — the operating point ml_confusion_threshold_sweep's ×9 grid
    brackets and ml_lift_gains_table's deciles smooth over, picked
    EXACTLY over every distinct score value: per-threshold TP/FP/FN off
    the domain cumulative counts, F1 through an identical double tree,
    argmax by (f1, threshold) via a sort-limit that fuses to
    TakeOrdered. Ties (identical doubles in both engines) break to the
    HIGHER threshold — the conservative operating point.

    Scale shape: one combinable domain collapse; one cumulative window
    over the bounded DOMAIN; a 1-row TakeOrdered head."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    dom = (ev.select((F.col("event_type") == "purchase").alias("pos"),
                     xc.alias("xc"))
           .groupBy("xc")
           .agg(F.count(F.lit(1)).cast("bigint").alias("t"),
                F.count(F.when(F.col("pos"), 1)).cast("bigint")
                .alias("p")))
    wd = (Window.orderBy(F.col("xc").desc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    np_ = dom.agg(F.sum("p").cast("bigint").alias("np"))
    cum = (dom.select(
        "xc",
        F.sum("t").over(wd).cast("bigint").alias("cum_t"),
        F.sum("p").over(wd).cast("bigint").alias("cum_p"))
        .crossJoin(F.broadcast(np_)))
    tp = F.col("cum_p")
    fp = F.col("cum_t") - F.col("cum_p")
    fn = F.col("np") - F.col("cum_p")
    f1 = (F.lit(2.0) * tp.cast("double")
          / (F.lit(2.0) * tp.cast("double") + fp.cast("double")
             + fn.cast("double")))
    return (cum.select(F.col("xc").alias("threshold_cents"),
                       tp.alias("tp"), fp.alias("fp"), fn.alias("fn"),
                       (tp.cast("double") / (tp + fp).cast("double"))
                       .alias("precision_at"),
                       (tp.cast("double") / (tp + fn).cast("double"))
                       .alias("recall_at"),
                       f1.alias("f1"))
            .orderBy(F.col("f1").desc(),
                     F.col("threshold_cents").desc())
            .limit(1))


# ---------------------------------------------------------------------------
# expected calibration error (ECE)
# ---------------------------------------------------------------------------

_ECE_ORACLE = f"""
WITH c AS (
  SELECT event_type = 'purchase' AS pos,
         CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events WHERE event_type IN ('click', 'purchase')
), mx AS (
  SELECT CAST(MAX(xc) AS BIGINT) AS m FROM c
), binned AS (
  SELECT LEAST({_CAL_BINS - 1}, (xc * {_CAL_BINS}) // (m + 1)) AS bin,
         xc, pos, m
  FROM c CROSS JOIN mx
), bins AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb,
         CAST(SUM(xc) AS BIGINT) AS sx,
         CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS npos,
         CAST(MAX(m) AS BIGINT) AS m
  FROM binned GROUP BY bin
), tot AS (
  SELECT CAST(SUM(nb) AS BIGINT) AS n FROM bins
)
SELECT tot.n, CAST(COUNT(*) AS BIGINT) AS n_bins,
       round(list_sum(list(
         (CAST(nb AS DOUBLE) / CAST(tot.n AS DOUBLE))
         * abs(CAST(sx AS DOUBLE)
                 / (CAST(nb AS DOUBLE) * CAST(m AS DOUBLE))
               - CAST(npos AS DOUBLE) / CAST(nb AS DOUBLE))
         ORDER BY bin)), 6) AS ece
FROM bins CROSS JOIN tot GROUP BY tot.n
"""


@register("llm_eval_ece", oracle=_ECE_ORACLE)
def llm_eval_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error — ml_calibration_reliability's table
    collapsed to the one number model cards report: the bin-weighted
    mean |predicted − observed| gap over the same ten fixed-width bins.
    The ≤10-term cross-bin fold runs in FIXED bin order (the ANOVA
    rule) and rounds 6 dp; every input to each term is an exact
    integer ratio.

    Scale shape: identical to the reliability table (broadcast max +
    one 10-group combinable fold) plus a 10-row ordered fold."""
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin("click", "purchase")))
    xc = F.round(F.col("value") * 100, 0).cast("bigint")
    c = ev.select((F.col("event_type") == "purchase").alias("pos"),
                  xc.alias("xc"))
    mx = c.agg(F.max("xc").cast("bigint").alias("m"))
    binned = (c.crossJoin(F.broadcast(mx))
              .select(F.least(F.lit(_CAL_BINS - 1),
                              F.floor(F.col("xc") * _CAL_BINS
                                      / (F.col("m") + 1)))
                      .cast("bigint").alias("bin"), "xc", "pos", "m"))
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum("xc").cast("bigint").alias("sx"),
        F.count(F.when(F.col("pos"), 1)).cast("bigint").alias("npos"),
        F.max("m").cast("bigint").alias("m"))
    tot = bins.agg(F.sum("nb").cast("bigint").alias("n"))
    term = ((F.col("nb").cast("double") / F.col("n").cast("double"))
            * F.abs(F.col("sx").cast("double")
                    / (F.col("nb").cast("double")
                       * F.col("m").cast("double"))
                    - F.col("npos").cast("double")
                    / F.col("nb").cast("double")))
    return (bins.crossJoin(F.broadcast(tot))
            .groupBy("n")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_bins"),
                 F.round(F.aggregate(
                     F.array_sort(F.collect_list(F.struct(
                         F.col("bin"), term.alias("v")))),
                     F.lit(0.0), lambda acc, x: acc + x["v"]), 6)
                 .alias("ece")))


# ---------------------------------------------------------------------------
# whitespace / casefold canonical dedup
# ---------------------------------------------------------------------------

_WS_ORACLE = """
WITH mutated AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  -- deterministic near-copies: every 11th doc re-ingested uppercased
  -- with doubled spaces (the crawl-recrawl artifact)
  SELECT doc_id + 1000000, upper(replace(text, ' ', '  '))
  FROM documents WHERE doc_id % 11 = 0
), canon AS (
  SELECT doc_id,
         md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS fp
  FROM mutated
), grp AS (
  SELECT fp, CAST(MIN(doc_id) AS BIGINT) AS keeper,
         CAST(COUNT(*) AS BIGINT) AS n_members
  FROM canon GROUP BY fp
)
SELECT c.doc_id, g.keeper AS keeper_id, g.n_members,
       c.doc_id <> g.keeper AS is_dup
FROM canon c JOIN grp g ON c.fp = g.fp
WHERE g.n_members > 1
"""


@register("llm_dedup_whitespace_casefold", oracle=_WS_ORACLE)
def llm_dedup_whitespace_casefold(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Canonical-form dedup for the cheapest near-duplicate class a
    crawler produces: case and whitespace variants of the same bytes
    (a re-crawl through a different renderer). The canonicalizer is
    lower + collapse-runs-of-spaces + trim → md5 fingerprint; keep-first
    survivorship; deterministic mutated copies (every 11th doc
    uppercased with doubled spaces) prove the canonicalization actually
    fires. Sits BETWEEN llm_dedup_exact (byte-exact) and the MinHash
    family (semantic) in the dedup ladder — at crawl scale this single
    map-side normalize removes a large share of dups before any
    banding cost.

    Scale shape: pure map-side canonicalization + one fingerprint-keyed
    fold + one same-key decoration join — the llm_dedup_exact shape
    with a normalizer in front."""
    d = load_table(spark, "documents", sf_dir)
    mutated = d.select("doc_id", "text").unionAll(
        d.where(F.pmod("doc_id", F.lit(11)) == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"),
                F.upper(F.regexp_replace("text", " ", "  "))
                .alias("text")))
    canon = mutated.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.regexp_replace("text", " +", " "))))
        .alias("fp"))
    grp = canon.groupBy("fp").agg(
        F.min("doc_id").cast("bigint").alias("keeper"),
        F.count(F.lit(1)).cast("bigint").alias("n_members"))
    return (canon.join(grp, "fp")
            .where(F.col("n_members") > 1)
            .select("doc_id", F.col("keeper").alias("keeper_id"),
                    "n_members",
                    (F.col("doc_id") != F.col("keeper")).alias("is_dup")))


# ---------------------------------------------------------------------------
# rich-club coefficient
# ---------------------------------------------------------------------------

_RICH_KS = (2, 4, 8)

_RICH_ORACLE = f"""
WITH pairs AS (
  SELECT l_orderkey, l_partkey,
         lead(l_partkey) OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_partkey,
                                        l_suppkey) AS nxt
  FROM lineitem
), e0 AS (
  SELECT DISTINCT LEAST(l_partkey, nxt) AS a, GREATEST(l_partkey, nxt) AS b
  FROM pairs WHERE nxt IS NOT NULL AND l_partkey <> nxt
), deg AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0) GROUP BY v
), ks AS (
  SELECT unnest([{", ".join(str(k) for k in _RICH_KS)}]) AS k
)
SELECT CAST(ks.k AS BIGINT) AS k,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM deg WHERE d > ks.k) AS n_k,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e0
        JOIN deg da ON e0.a = da.v JOIN deg db ON e0.b = db.v
        WHERE da.d > ks.k AND db.d > ks.k) AS e_k,
       2.0 * (SELECT CAST(COUNT(*) AS DOUBLE) FROM e0
              JOIN deg da ON e0.a = da.v JOIN deg db ON e0.b = db.v
              WHERE da.d > ks.k AND db.d > ks.k)
         / ((SELECT CAST(COUNT(*) AS DOUBLE) FROM deg WHERE d > ks.k)
            * ((SELECT CAST(COUNT(*) AS DOUBLE) FROM deg WHERE d > ks.k)
               - 1.0)) AS rich_club_phi
FROM ks
"""


@register("graph_rich_club_coefficient", oracle=_RICH_ORACLE)
def graph_rich_club_coefficient(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) of the co-purchase graph at k ∈
    {{2,4,8}}: among nodes with degree > k, the realized share of
    possible edges — do the hubs preferentially trade with EACH OTHER
    (φ rising with k), the structural question degree histograms and
    assortativity only gesture at. Edge and degree folds are exact; per
    k the subgraph edge count is two degree-decoration joins; one
    division per row.

    Scale shape: one distinct-edge fold + one degree fold; per-k work
    is edge⋈degree equi-joins (key-parallel) against a 3-row broadcast
    k-spine; output is 3 rows."""
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
          .localCheckpoint(eager=False))  # degree + per-k joins share it
    deg = (e0.select(F.col("a").alias("v"))
           .unionAll(e0.select(F.col("b").alias("v")))
           .groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("d")))
    ks = spark.createDataFrame([(k,) for k in _RICH_KS], "k int")
    nk = (deg.crossJoin(F.broadcast(ks))
          .where(F.col("d") > F.col("k"))
          .groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("n_k")))
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    ek = (e0.join(da, "a").join(db, "b")
          .crossJoin(F.broadcast(ks))
          .where((F.col("da") > F.col("k")) & (F.col("db") > F.col("k")))
          .groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("e_k")))
    return (nk.join(ek, "k", "left")
            .select(F.col("k").cast("bigint").alias("k"), "n_k",
                    F.coalesce("e_k", F.lit(0)).cast("bigint").alias("e_k"),
                    (F.lit(2.0) * F.coalesce("e_k", F.lit(0)).cast("double")
                     / (F.col("n_k").cast("double")
                        * (F.col("n_k").cast("double") - F.lit(1.0))))
                    .alias("rich_club_phi")))


# ---------------------------------------------------------------------------
# weighted priority sampling, k PER GROUP
# ---------------------------------------------------------------------------

_ARES_GRP_K = 20

_ARES_GRP_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)
                                         || ':{_ARES_SEED}'), 1, 15))
              AS BIGINT) + 1 AS u
  FROM documents WHERE n_chars >= 1
), ranked AS (
  SELECT doc_id, lang, weight,
         CAST(u // weight AS BIGINT) AS priority_key,
         row_number() OVER (PARTITION BY lang
                            ORDER BY u // weight, doc_id) AS rk
  FROM keyed
)
SELECT doc_id, lang, weight, priority_key,
       CAST(rk AS BIGINT) AS sample_rank
FROM ranked WHERE rk <= {_ARES_GRP_K}
"""


@register("llm_sample_ares_per_group", oracle=_ARES_GRP_ORACLE)
def llm_sample_ares_per_group(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Weighted priority sampling, k=20 PER LANGUAGE — the stratified
    form of llm_sample_ares_topk (same exact-integer u div weight keys,
    same seed), which is how a mixture-controlled corpus actually
    samples: every stratum keeps its own weighted without-replacement
    winners instead of letting one dominant language absorb the global
    budget. The per-group k-smallest is a language-partitioned window
    (Spark plans it as WindowGroupLimit: per-partition heaps, the
    filter pushed into the shuffle).

    Scale shape: map-side integer keys; one language-partitioned
    rank-limit window (key-parallel, never single-partition);
    output is k×languages rows."""
    d = load_table(spark, "documents", sf_dir).where(F.col("n_chars") >= 1)
    u = (F.conv(F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"),
                       F.lit(f":{_ARES_SEED}"))), 1, 15), 16, 10)
        .cast("bigint") + 1)
    keyed = d.select("doc_id", "lang",
                     F.col("n_chars").cast("bigint").alias("weight"),
                     u.alias("u"))
    key = F.expr("u div weight").cast("bigint")
    w = Window.partitionBy("lang").orderBy(key, "doc_id")
    return (keyed.select("doc_id", "lang", "weight",
                         key.alias("priority_key"),
                         F.row_number().over(w).cast("bigint")
                         .alias("sample_rank"))
            .where(F.col("sample_rank") <= _ARES_GRP_K))


# ---------------------------------------------------------------------------
# daily conversion hazard rate (KM companion)
# ---------------------------------------------------------------------------

_HAZ_W = 7

_HAZARD_ORACLE = f"""
WITH horizon AS (
  SELECT CAST(MAX(ts) AS DATE) AS end_day FROM events
), per_user AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS t0,
         CAST(MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS DATE)
           AS tp
  FROM events GROUP BY user_id
), obs AS (
  SELECT CASE WHEN tp IS NOT NULL AND tp >= t0
              THEN datediff('day', t0, tp)
              ELSE datediff('day', t0, (SELECT end_day FROM horizon))
         END AS tt,
         (tp IS NOT NULL AND tp >= t0) AS ev
  FROM per_user
), days AS (
  SELECT CAST(tt AS BIGINT) AS tt,
         CAST(COUNT(*) FILTER (WHERE ev) AS BIGINT) AS d,
         CAST(COUNT(*) FILTER (WHERE NOT ev) AS BIGINT) AS c
  FROM obs GROUP BY tt
), tot AS (
  SELECT CAST(SUM(d + c) AS BIGINT) AS n FROM days
), risk AS (
  SELECT tt, d, c,
         tot.n - CAST(COALESCE(SUM(d + c) OVER (ORDER BY tt
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS BIGINT)
           AS n_at_risk
  FROM days CROSS JOIN tot
)
SELECT tt AS day, n_at_risk, d AS n_events,
       CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE) AS hazard,
       -- 7-day centered smoothed hazard: EXACT integer window sums
       CAST(SUM(d) OVER ws AS DOUBLE)
         / CAST(SUM(n_at_risk) OVER ws AS DOUBLE) AS hazard_smoothed
FROM risk
WINDOW ws AS (ORDER BY tt ROWS BETWEEN {_HAZ_W // 2} PRECEDING
                                   AND {_HAZ_W // 2} FOLLOWING)
"""


@register("seq_hazard_rate_daily", oracle=_HAZARD_ORACLE)
def seq_hazard_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The discrete hazard rate h(t) = d_t / n_at_risk(t) for
    time-to-first-purchase, raw and 7-day-window smoothed (aggregated
    events over aggregated risk sets — the actuarial smoothing that
    stays a ratio of EXACT integer sums, not an average of ratios) —
    WHEN users convert, where seq_survival_km reports how many remain;
    the pair is how conversion-lag dashboards are actually read.
    Same risk-set construction as the KM op, shared convention.

    Scale shape: user-grain fold; calendar-bounded day domain; two
    windows over that bounded domain."""
    ev = load_table(spark, "events", sf_dir)
    horizon = ev.agg(F.max(F.col("ts").cast("date")).alias("end_day"))
    per_user = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase",
                     F.col("ts").cast("date"))).alias("tp"))
    is_ev = F.col("tp").isNotNull() & (F.col("tp") >= F.col("t0"))
    obs = (per_user.crossJoin(F.broadcast(horizon))
           .select(F.when(is_ev, F.datediff("tp", "t0"))
                   .otherwise(F.datediff("end_day", "t0"))
                   .cast("bigint").alias("tt"),
                   is_ev.alias("ev")))
    days = obs.groupBy("tt").agg(
        F.count(F.when(F.col("ev"), 1)).cast("bigint").alias("d"),
        F.count(F.when(~F.col("ev"), 1)).cast("bigint").alias("c"))
    tot = days.agg(F.sum(F.col("d") + F.col("c")).cast("bigint")
                   .alias("n"))
    wb = Window.orderBy("tt").rowsBetween(Window.unboundedPreceding, -1)
    risk = (days.crossJoin(F.broadcast(tot))
            .select("tt", "d",
                    (F.col("n")
                     - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wb),
                                  F.lit(0)).cast("bigint"))
                    .alias("n_at_risk")))
    ws = Window.orderBy("tt").rowsBetween(-(_HAZ_W // 2), _HAZ_W // 2)
    return risk.select(
        F.col("tt").alias("day"), "n_at_risk",
        F.col("d").alias("n_events"),
        (F.col("d").cast("double") / F.col("n_at_risk").cast("double"))
        .alias("hazard"),
        (F.sum("d").over(ws).cast("double")
         / F.sum("n_at_risk").over(ws).cast("double"))
        .alias("hazard_smoothed"))


# ---------------------------------------------------------------------------
# mixture-vs-target KL report
# ---------------------------------------------------------------------------

# frozen TARGET token mixture over source tiers (the training-recipe
# number a data team commits to before the run)
_MIX_TARGET = (("large", 0.5), ("medium", 0.3), ("small", 0.2))

_MIX_KL_ORACLE = f"""
WITH toks AS (
  SELECT CASE WHEN CAST(SUBSTR(source, 4) AS INTEGER) < 4 THEN 'large'
              WHEN CAST(SUBSTR(source, 4) AS INTEGER) < 10 THEN 'medium'
              ELSE 'small' END AS tier,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), actual AS (
  SELECT tier, CAST(SUM(n_tok) AS BIGINT) AS tok FROM toks GROUP BY tier
), tgt(tier, target_share) AS (
  VALUES {", ".join(f"('{t}', {w!r})" for t, w in _MIX_TARGET)}
), tot AS (
  SELECT CAST(SUM(tok) AS BIGINT) AS n FROM actual
), rows_ AS (
  SELECT a.tier, a.tok,
         CAST(a.tok AS DOUBLE) / CAST(tot.n AS DOUBLE) AS actual_share,
         tgt.target_share,
         CAST(a.tok AS DOUBLE) / CAST(tot.n AS DOUBLE)
           * ln((CAST(a.tok AS DOUBLE) / CAST(tot.n AS DOUBLE))
                / tgt.target_share) AS kl_term
  FROM actual a JOIN tgt ON a.tier = tgt.tier CROSS JOIN tot
), kl AS (
  SELECT round(list_sum(list(kl_term ORDER BY tier)), 6) AS kl
  FROM rows_
)
SELECT rows_.tier, rows_.tok AS n_tokens, rows_.actual_share,
       rows_.target_share, rows_.actual_share - rows_.target_share
         AS share_gap,
       kl.kl AS mixture_kl
FROM rows_ CROSS JOIN kl
"""


@register("llm_mixture_kl_report", oracle=_MIX_KL_ORACLE)
def llm_mixture_kl_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mixture drift report: the corpus's ACTUAL token share per
    source tier against the FROZEN target recipe (50/30/20), per-tier
    gaps plus the one-number KL(actual ‖ target) — the dashboard a
    mixture-controlled training run watches between crawls
    (llm_domain_mix counts documents; training budgets are TOKENS).
    Shares are exact integer ratios; the 3-term KL folds in fixed tier
    order and rounds 6 dp after the one ln chain.

    Scale shape: one combinable map-side token fold to 3 tiers;
    everything after runs on 3 rows."""
    d = load_table(spark, "documents", sf_dir)
    src_num = F.expr("substring(source, 4)").cast("int")
    tier = (F.when(src_num < 4, F.lit("large"))
            .when(src_num < 10, F.lit("medium"))
            .otherwise(F.lit("small")))
    actual = (d.select(tier.alias("tier"),
                       F.size(F.split("text", " ")).cast("bigint")
                       .alias("n_tok"))
              .groupBy("tier")
              .agg(F.sum("n_tok").cast("bigint").alias("tok")))
    tgt = spark.createDataFrame(list(_MIX_TARGET),
                                "tier string, target_share double")
    tot = actual.agg(F.sum("tok").cast("bigint").alias("n"))
    share = F.col("tok").cast("double") / F.col("n").cast("double")
    rows_ = (actual.join(F.broadcast(tgt), "tier")
             .crossJoin(F.broadcast(tot))
             .select("tier", "tok", share.alias("actual_share"),
                     "target_share",
                     (share * F.log(share / F.col("target_share")))
                     .alias("kl_term")))
    kl = rows_.agg(F.round(F.aggregate(
        F.array_sort(F.collect_list(F.struct(
            F.col("tier"), F.col("kl_term").alias("v")))),
        F.lit(0.0), lambda acc, x: acc + x["v"]), 6).alias("kl"))
    return (rows_.crossJoin(F.broadcast(kl))
            .select("tier", F.col("tok").alias("n_tokens"),
                    "actual_share", "target_share",
                    (F.col("actual_share") - F.col("target_share"))
                    .alias("share_gap"),
                    F.col("kl").alias("mixture_kl")))


# ---------------------------------------------------------------------------
# template-prefix duplicate detector
# ---------------------------------------------------------------------------

_PREFIX_TOKS = 4

_TEMPLATE_ORACLE = f"""
WITH seeded AS (
  -- deterministic template planting (every 9th doc gets one of three
  -- canned 4-token openers -- the curation_v2 injection discipline):
  -- the detector must demonstrably FIRE, not report vacuous zeros
  SELECT doc_id, lang,
         CASE WHEN doc_id % 9 = 0 THEN
           ['dear valued customer regarding',
            'click here to claim',
            'limited time offer for'][CAST((doc_id // 9) % 3 AS INTEGER) + 1]
           || ' ' || text
         ELSE text END AS text
  FROM documents
), pre AS (
  SELECT doc_id, lang,
         md5(array_to_string(string_split(text, ' ')[1:{_PREFIX_TOKS}],
                             ' ')) AS pfx
  FROM seeded WHERE len(string_split(text, ' ')) >= {_PREFIX_TOKS}
), grp AS (
  SELECT pfx, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(MIN(doc_id) AS BIGINT) AS exemplar
  FROM pre GROUP BY pfx
)
SELECT pfx AS prefix_md5, n_docs, n_langs, exemplar
FROM grp WHERE n_docs >= 5
"""


@register("llm_dedup_template_prefix", oracle=_TEMPLATE_ORACLE)
def llm_dedup_template_prefix(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Template-prefix detector: documents sharing their first four
    tokens, grouped by prefix fingerprint and reported where ≥5 docs
    share it — the same-boilerplate-different-fill pattern (form
    letters, scraped templates, SEO spam) that whole-document and
    paragraph dedup both miss because the FILL differs; the cross-lang
    count flags machine-templated multilingual spam. Keep decisions
    stay with the survivorship op — this is the detector feeding it.

    Deterministic template planting (every 9th doc gets one of three
    canned openers, the curation_v2 injection discipline) guarantees
    the detector demonstrably fires at every scale factor instead of
    reporting vacuous zeros.

    Scale shape: map-side prefix fingerprint + one combinable fold —
    the llm_dedup_exact shape on a 4-token key."""
    d = load_table(spark, "documents", sf_dir)
    openers = ["dear valued customer regarding",
               "click here to claim",
               "limited time offer for"]
    # doc_id % 9 == 0 forces doc_id % 3 == 0, so variety keys on the
    # QUOTIENT: (doc_id div 9) % 3 rotates through all three openers
    opener = F.element_at(F.array(*[F.lit(o) for o in openers]),
                          (F.pmod(F.floor(F.col("doc_id") / 9), F.lit(3))
                           + 1).cast("int"))
    text = (F.when(F.pmod("doc_id", F.lit(9)) == 0,
                   F.concat_ws(" ", opener, F.col("text")))
            .otherwise(F.col("text")))
    seeded = d.select("doc_id", "lang", text.alias("text"))
    toks = F.split(F.col("text"), " ")
    pre = (seeded.where(F.size(toks) >= _PREFIX_TOKS)
           .select("doc_id", "lang",
                   F.md5(F.concat_ws(" ",
                                     F.slice(toks, 1, _PREFIX_TOKS)))
                   .alias("pfx")))
    return (pre.groupBy("pfx")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.countDistinct("lang").cast("bigint").alias("n_langs"),
                 F.min("doc_id").cast("bigint").alias("exemplar"))
            .where(F.col("n_docs") >= 5)
            .select(F.col("pfx").alias("prefix_md5"), "n_docs",
                    "n_langs", "exemplar"))


# ---------------------------------------------------------------------------
# distinct-n generation-diversity metrics
# ---------------------------------------------------------------------------

_DISTINCT_N_ORACLE = """
WITH toks AS (
  SELECT CASE WHEN CAST(SUBSTR(source, 4) AS INTEGER) < 4 THEN 'large'
              WHEN CAST(SUBSTR(source, 4) AS INTEGER) < 10 THEN 'medium'
              ELSE 'small' END AS tier,
         string_split(text, ' ') AS l
  FROM documents
), uni AS (
  SELECT tier, unnest(l) AS g FROM toks
), bi AS (
  SELECT tier, unnest(list_transform(range(1, len(l)),
                                     i -> l[i] || ' ' || l[i + 1])) AS g
  FROM toks WHERE len(l) >= 2
), s1 AS (
  SELECT tier, CAST(COUNT(*) AS BIGINT) AS n1,
         CAST(COUNT(DISTINCT g) AS BIGINT) AS d1
  FROM uni GROUP BY tier
), s2 AS (
  SELECT tier, CAST(COUNT(*) AS BIGINT) AS n2,
         CAST(COUNT(DISTINCT g) AS BIGINT) AS d2
  FROM bi GROUP BY tier
)
SELECT s1.tier, s1.n1 AS n_unigrams, s1.d1 AS distinct_unigrams,
       s2.n2 AS n_bigrams, s2.d2 AS distinct_bigrams,
       CAST(s1.d1 AS DOUBLE) / CAST(s1.n1 AS DOUBLE) AS distinct_1,
       CAST(s2.d2 AS DOUBLE) / CAST(s2.n2 AS DOUBLE) AS distinct_2
FROM s1 JOIN s2 ON s1.tier = s2.tier
"""


@register("llm_eval_distinct_n", oracle=_DISTINCT_N_ORACLE)
def llm_eval_distinct_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-1 / distinct-2 diversity per source tier: unique
    n-grams over total n-grams — the standard lexical-diversity score
    for generated text (low distinct-2 = repetitive generations), the
    corpus-level companion to llm_self_bleu_diversity's pairwise view
    and llm_repetition_score's per-document one. Exact counts, one
    division per metric.

    Scale shape: two gram-grain combinable count-distinct folds per
    tier; a 3-row join."""
    d = load_table(spark, "documents", sf_dir)
    src_num = F.expr("substring(source, 4)").cast("int")
    tier = (F.when(src_num < 4, F.lit("large"))
            .when(src_num < 10, F.lit("medium"))
            .otherwise(F.lit("small")))
    toks = F.split(F.col("text"), " ")
    base = d.select(tier.alias("tier"), toks.alias("l")) \
        .localCheckpoint(eager=False)  # both gram grains share it
    uni = base.select("tier", F.explode("l").alias("g"))
    bi = (base.where(F.size("l") >= 2)
          .select("tier", F.explode(F.transform(
              F.sequence(F.lit(1), F.size("l") - 1),
              lambda i: F.concat_ws(" ", F.element_at("l", i),
                                    F.element_at("l", i + 1))))
              .alias("g")))
    s1 = uni.groupBy("tier").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1"),
        F.countDistinct("g").cast("bigint").alias("d1"))
    s2 = bi.groupBy("tier").agg(
        F.count(F.lit(1)).cast("bigint").alias("n2"),
        F.countDistinct("g").cast("bigint").alias("d2"))
    return (s1.join(s2, "tier")
            .select("tier", F.col("n1").alias("n_unigrams"),
                    F.col("d1").alias("distinct_unigrams"),
                    F.col("n2").alias("n_bigrams"),
                    F.col("d2").alias("distinct_bigrams"),
                    (F.col("d1").cast("double") / F.col("n1").cast("double"))
                    .alias("distinct_1"),
                    (F.col("d2").cast("double") / F.col("n2").cast("double"))
                    .alias("distinct_2")))
