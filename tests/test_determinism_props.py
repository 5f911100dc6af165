"""Property-based checks (hypothesis) for the determinism helpers — the
foundation every oracled float aggregate stands on: csum/dsum must equal the
EXACT decimal sum regardless of row order or partitioning."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from lambdatotheslaughter_spark.determinism import DEC, csum, dsum

# 2-decimal "money" doubles in the testdata's magnitude range
money = st.integers(min_value=-10_000_000, max_value=10_000_000) \
    .map(lambda c: c / 100.0)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(money, min_size=1, max_size=300),
       n_parts=st.integers(min_value=1, max_value=13))
def test_csum_equals_exact_decimal_sum(spark, vals, n_parts):
    exact = float(sum(Decimal(str(v)) for v in vals))
    df = spark.createDataFrame([(v,) for v in vals], "x double") \
        .repartition(n_parts)
    got = df.agg(csum("x").alias("s")).collect()[0]["s"]
    assert got == exact, (got, exact)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(money, min_size=1, max_size=300),
       n_parts=st.integers(min_value=1, max_value=13))
def test_dsum_equals_exact_decimal_sum(spark, vals, n_parts):
    exact = float(sum(Decimal(str(v)) for v in vals))
    df = spark.createDataFrame([(v,) for v in vals], "x double") \
        .repartition(n_parts)
    got = df.agg(dsum("x").alias("s")).collect()[0]["s"]
    assert got == exact, (got, exact)


def test_dsum_cast_matches_duckdb_semantics(spark, duck):
    """The DECIMAL(38,6) cast of an arbitrary double must agree between
    engines on awkward values (many decimals, negatives, tiny magnitudes)."""
    vals = [1.005, -2.675, 0.1234565, 123456.789012349, -0.0000005, 3.141592653589793]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    s = [r["c"] for r in sdf.select(F.col("x").cast(DEC).cast("double").alias("c")).collect()]
    d = [r[0] for r in duck.execute(
        "SELECT CAST(CAST(x AS DECIMAL(38,6)) AS DOUBLE) FROM (SELECT unnest(?) AS x)",
        [vals]).fetchall()]
    assert s == d, (s, d)


def test_csum_family_semantics_vs_plain_double_sums(spark):
    """Symmetric oracles can't catch a scale-factor bug present on BOTH
    sides (it happened: /1e6 instead of /1e4 hash-matched fine). Guard the
    SEMANTICS: the exact int-cents aggregates must agree with naive double
    sums to float tolerance."""
    from lambdatotheslaughter_spark.determinism import (
        cavg, charge_csum, csum, disc_price_csum)
    from lambdatotheslaughter_spark.tables import load_table

    li = load_table(spark, "lineitem", "/root/testdata/sf0.001")
    got = li.agg(
        csum("l_extendedprice").alias("s_price"),
        disc_price_csum("l_extendedprice", "l_discount").alias("s_disc"),
        charge_csum("l_extendedprice", "l_discount", "l_tax").alias("s_charge"),
        cavg("l_quantity").alias("a_qty"),
    ).collect()[0]
    ref = li.agg(
        F.sum("l_extendedprice").alias("s_price"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("s_disc"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
              * (1 + F.col("l_tax"))).alias("s_charge"),
        F.avg("l_quantity").alias("a_qty"),
    ).collect()[0]
    for k in ("s_price", "s_disc", "s_charge", "a_qty"):
        assert abs(got[k] - ref[k]) <= 1e-6 * abs(ref[k]), (k, got[k], ref[k])
