"""Hyperplane-LSH semantic dedup (queries/dedup.py) — both routes.

The operator's contract is pair-set parity with the exact cosine
threshold join on EITHER path:

- gapless corpora (the fixtures: pair-cosine q99 ≈ 0.29 vs τ = 0.35)
  must route to the exact blocked GEMM — banding cannot separate
  τ-pairs from the bulk there at any parameter setting;
- gapped corpora (planted near-dups, τ = 0.8 over a ~0.29 bulk) must
  take the LSH band join, keep full recall, AND prune: the candidate
  stage is only worth shipping if it is measurably sub-quadratic.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from zvdb_spark.queries.dedup import (
    COSINE_TAU,
    LSH_GAP_MARGIN,
    _embedding_lsh_candidates,
    _embedding_lsh_pairs,
    _pair_cosine_q99,
    q_dedup_embedding,
    q_dedup_embedding_lsh,
)


def _pairs_set(pdf, a="id_a", b="id_b"):
    return {(int(r[0]), int(r[1])) for r in pdf[[a, b]].itertuples(index=False)}


def test_routed_parity_on_fixture(spark, sf_dir):
    """Fixture corpora are gapless: the declared query must fall back
    to the exact path and match q_dedup_embedding pair-for-pair
    (values included — same GEMM, same rounding)."""
    lsh = q_dedup_embedding_lsh(spark, sf_dir).toPandas()
    exact = q_dedup_embedding(spark, sf_dir).toPandas()
    assert _pairs_set(lsh) == _pairs_set(exact)
    lj = lsh.sort_values(["id_a", "id_b"], ignore_index=True)
    ej = exact.sort_values(["id_a", "id_b"], ignore_index=True)
    assert np.allclose(lj["cosine"], ej["cosine"], atol=1e-9)


@pytest.fixture(scope="module")
def planted(spark):
    """1800 background Gaussians + 100 planted near-dup pairs
    (cosine ≥ 0.95): the regime hyperplane LSH is designed for."""
    rng = np.random.default_rng(11)
    bg = rng.standard_normal((1800, 64))
    base = rng.standard_normal((100, 64))
    dup = base + 0.25 * rng.standard_normal((100, 64))
    mat = np.vstack([bg, base, dup])
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, emb array<double>",
    ).localCheckpoint(eager=True)
    return mat, df


def test_lsh_path_full_parity_on_planted(spark, planted):
    """On a gapped corpus the LSH path must return EXACTLY the pairs
    the quadratic exact join returns at τ = 0.8 (recall 1.0 — the
    planted pairs sit far above the per-band collision threshold)."""
    mat, df = planted
    tau = 0.8
    q99 = _pair_cosine_q99(df, len(mat))
    assert tau >= q99 + LSH_GAP_MARGIN  # this corpus takes the LSH path
    got = _embedding_lsh_pairs(df, mat.shape[1], tau).toPandas()
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cm = mn @ mn.T
    iu = np.triu_indices(len(mat), 1)
    want = {
        (int(a), int(b))
        for a, b in zip(iu[0][cm[iu] >= tau], iu[1][cm[iu] >= tau])
    }
    assert want, "planted corpus must contain pairs above tau"
    assert _pairs_set(got, "ia", "ib") == want


def test_lsh_candidates_are_subquadratic(spark, planted):
    """The candidate stage must PRUNE on a gapped corpus — that is the
    whole point of banding. ≥ 5x fewer candidate pairs than the
    quadratic all-pairs count (measured ~28x on this corpus; the
    bound is loose so the pin survives plane-set tweaks)."""
    mat, df = planted
    n = len(mat)
    n_cand = _embedding_lsh_candidates(df, mat.shape[1]).count()
    assert n_cand * 5 <= n * (n - 1) // 2, n_cand


def test_fixture_routes_to_exact(spark, sf_dir):
    """The routing probe itself: fixture q99 must sit ABOVE
    τ - margin, i.e. the declared query's fallback branch is the one
    that runs there (if the fixture ever gains a real near-dup gap,
    this pin flags the route flip loudly)."""
    from zvdb_spark.functions.vector import as_double_array
    from zvdb_spark.sources.tables import load, table_row_count

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("emb")
    )
    q99 = _pair_cosine_q99(e, table_row_count(sf_dir, "embeddings"))
    assert COSINE_TAU < q99 + LSH_GAP_MARGIN
