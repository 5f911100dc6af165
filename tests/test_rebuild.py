"""Batch-view rebuild (lambda entry 3): views land in the catalog and match
a fresh computation."""

from __future__ import annotations

from lambdatotheslaughter_spark import registry
from lambdatotheslaughter_spark.plans.rebuild import rebuild_views
from tests.conftest import SMOKE_SF_DIR, canonical_rows


def test_rebuild_views_roundtrip(spark):
    timings = rebuild_views(spark, SMOKE_SF_DIR,
                            views=("agg_pricing_summary", "llm_text_stats"))
    assert set(timings) == {"agg_pricing_summary", "llm_text_stats"}
    for name in timings:
        stored = spark.table(f"lts_view_{name}").toPandas()
        fresh = registry.get(name).fn(spark, SMOKE_SF_DIR).toPandas()
        assert canonical_rows(stored) == canonical_rows(fresh), name
