"""Cross-dialect guarantee for the text primitives beyond the fixed corpus:
on randomized texts, the Spark shingle/tokenize expressions and their DuckDB
SQL twins must emit identical sets — these primitives underpin minhash,
ngram-jaccard, fingerprints, and the end-to-end pipeline."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from lambdatotheslaughter_spark.functions.text import (
    SHINGLE2_SQL, SHINGLE3_SQL, shingles2, shingles3, tokens)


def _random_texts(n=60, seed=7):
    rng = random.Random(seed)
    vocab = ["key", "agg", "row", "scan", "slow", "fast", "table", "x", "yz",
             "alpha", "beta", "gamma", "delta", "join", "sort"]
    out = []
    for i in range(n):
        length = rng.randint(3, 40)  # >= 3 tokens so both shingle sizes exist
        out.append((i, " ".join(rng.choice(vocab) for _ in range(length))))
    return out


def test_shingles_match_duckdb_on_random_texts(spark, duck):
    rows = _random_texts()
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        sdf.select("doc_id", tokens().alias("toks"), "text")
        .select("doc_id",
                F.array_join(F.array_sort(shingles3("toks")), "|").alias("s3"),
                F.array_join(F.array_sort(shingles2("toks")), "|").alias("s2"))
        .toPandas().set_index("doc_id").sort_index()
    )
    duck.execute("CREATE OR REPLACE TABLE rnd_texts(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO rnd_texts VALUES (?, ?)", rows)
    want = duck.execute(f"""
        SELECT doc_id,
               array_to_string(list_sort({SHINGLE3_SQL}), '|') AS s3,
               array_to_string(list_sort({SHINGLE2_SQL}), '|') AS s2
        FROM rnd_texts ORDER BY doc_id
    """).df().set_index("doc_id").sort_index()
    assert (got["s3"] == want["s3"]).all(), "3-gram shingles diverge"
    assert (got["s2"] == want["s2"]).all(), "2-gram shingles diverge"


def test_span_corruption_roundtrips_to_original(spark):
    """Denoising-objective invariant: substituting each sentinel <x_k>
    in `corrupted` with span k recovered from `target` must reconstruct
    the original document exactly — masking loses nothing."""
    import re as _re

    from lambdatotheslaughter_spark import registry
    from tests.conftest import SF_DIR

    out = registry.get("llm_span_corruption").fn(spark, SF_DIR) \
        .orderBy("doc_id").limit(80).toPandas()
    docs = {r.doc_id: r.text
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .orderBy("doc_id").limit(80).collect()}
    assert len(out) == 80
    n_masked_total = 0
    for row in out.itertuples(index=False):
        spans = {}
        if row.target:
            parts = _re.split(r"<x_(\d+)> ", row.target)
            # split yields ['', k0, span0, k1, span1, ...]
            for k, s in zip(parts[1::2], parts[2::2]):
                spans[int(k)] = s.rstrip()
        assert len(spans) == row.n_masked
        n_masked_total += row.n_masked
        rebuilt = _re.sub(r"<x_(\d+)>",
                          lambda m: spans[int(m.group(1))], row.corrupted)
        assert rebuilt == docs[row.doc_id], row.doc_id
    assert n_masked_total > 0, "seeded mask never fired in 80 docs"


def test_business_days_matches_python_reference(spark):
    """Closed-form weekday arithmetic vs a day-by-day datetime loop."""
    import datetime as _dt

    from lambdatotheslaughter_spark import registry
    from tests.conftest import SF_DIR

    out = registry.get("date_business_days").fn(spark, SF_DIR) \
        .orderBy("o_orderkey").limit(300).toPandas()
    for row in out.itertuples(index=False):
        d0 = _dt.date.fromisoformat(row.start_day)
        d1 = _dt.date.fromisoformat(row.due_day)
        want = sum(1 for i in range((d1 - d0).days + 1)
                   if (d0 + _dt.timedelta(days=i)).weekday() < 5)
        assert row.biz_days == want, (row.o_orderkey, row.biz_days, want)
