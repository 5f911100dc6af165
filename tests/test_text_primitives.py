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
