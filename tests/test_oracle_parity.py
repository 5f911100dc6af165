"""THE correctness gate replica: every registered query with an oracle is
run on Spark and on DuckDB at sf0.01 and compared exactly, mirroring the
driver's CORRECTNESS check. Rows-only queries are checked for rows >= 0 and
a stable schema across two runs (determinism smoke).
"""

from __future__ import annotations

import pytest

from lambdatotheslaughter_spark import registry
from tests.conftest import SF_DIR, assert_parity, canonical_rows

ALL = sorted(registry.all_queries())
WITH_ORACLE = sorted(registry.all_oracles())
ROWS_ONLY = sorted(set(ALL) - set(WITH_ORACLE))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    reg = registry.get(name)
    df = reg.fn(spark, SF_DIR)
    assert_parity(df, duck, reg.oracle, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_deterministic(spark, name):
    reg = registry.get(name)
    a = reg.fn(spark, SF_DIR).toPandas()
    b = reg.fn(spark, SF_DIR).toPandas()
    assert canonical_rows(a) == canonical_rows(b), f"{name}: nondeterministic"
    assert len(a) >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema is not None
