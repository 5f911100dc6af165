"""Quality gates for the approximate similarity operators: the rows-only
checks prove determinism; these prove the approximations are actually close
to the exact baselines (recall), mirroring how the reference genre validates
ANN/LSH operators (SURVEY §5)."""

from __future__ import annotations

from lambdatotheslaughter_spark import registry
from tests.conftest import SF_DIR


def _pairs(df, cols=("a_id", "b_id")):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_lsh_approx_recall(spark, duck):
    """LSH candidate pairs must recover >= 80% of the true close pairs."""
    approx = _pairs(registry.get("llm_sim_lsh_approx").fn(spark, SF_DIR))
    exact = {
        (a, b) for a, b in duck.execute("""
            SELECT a.vec_id, b.vec_id
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_distance(a.embedding, b.embedding) < 1.2
        """).fetchall()
    }
    assert exact, "exact close-pair set unexpectedly empty — threshold too tight"
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.2f} < 0.8 ({len(approx)} approx / {len(exact)} exact)"


def test_ivf_ann_recall(spark, duck):
    """IVF top-3 (single-probe) must agree with brute-force top-3 for a
    reasonable share of query vectors. Single-probe IVF on unclustered
    random data has limited recall by nature — the gate is a floor, and the
    measured value is printed for the bench record."""
    ivf = registry.get("llm_sim_ann_ivf").fn(spark, SF_DIR)
    ivf_pairs = _pairs(ivf)
    exact = duck.execute("""
        SELECT a_id, b_id FROM (
          SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                 ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                    ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                                             b.vec_id) AS rn
          FROM embeddings a, embeddings b
          WHERE a.vec_id <> b.vec_id
        ) WHERE rn <= 3
    """).fetchall()
    exact_pairs = set(exact)
    recall = len(ivf_pairs & exact_pairs) / len(exact_pairs)
    print(f"IVF recall@3 = {recall:.3f}")
    assert recall >= 0.2, f"IVF recall@3 {recall:.2f} below floor"


def test_minhash_recall_is_exact(spark, duck):
    """The LSH-banded minhash pipeline must recover the full exact pair set
    at tau=0.5 (its oracle asserts equality; this asserts the count is the
    planted 25 so a silently-empty result can never pass)."""
    res = registry.get("llm_dedup_fuzzy_minhash").fn(spark, SF_DIR).collect()
    assert len(res) == 25, f"expected the 25 planted near-dup pairs, got {len(res)}"
