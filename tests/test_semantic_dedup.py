"""Correctness gate for q_dedup_semantic (SemDeDup-style kept-set
dedup) — past-cap rows-only, and k-means is not SQL-expressible, so
the gate is a full-pipeline independent numpy recompute (the
tests/test_pq.py pattern) plus the semantic invariants the greedy
contract promises."""

from __future__ import annotations

import numpy as np
import pandas as pd

from zvdb_spark.operators.kmeans import kmeans_fit
from zvdb_spark.queries.dedup import (
    SEM_CELLS,
    SEM_ITERS,
    SEM_TAU,
    q_dedup_semantic,
)
from zvdb_spark.sources.tables import load


def _numpy_pipeline(spark, sf_dir):
    """Independent recompute: centroids via the (pytest-pinned,
    deterministic) operator, then assignment + greedy entirely in
    numpy."""
    from zvdb_spark.functions.vector import as_double_array

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("emb")
    )
    rows = sorted(e.collect(), key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    x = np.stack([np.asarray(r.emb, dtype=np.float64) for r in rows])
    cents = kmeans_fit(e, k=SEM_CELLS, n_iter=SEM_ITERS)
    d = (
        (x * x).sum(axis=1)[:, None]
        + (cents * cents).sum(axis=1)[None, :]
        - 2.0 * (x @ cents.T)
    )
    cell = np.argmin(d, axis=1)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    out = {}
    for c in np.unique(cell):
        idx = np.where(cell == c)[0]  # ids already ascending
        kept_rows: list[int] = []
        dropped = []
        for i in idx:
            if kept_rows:
                sims = xn[kept_rows] @ xn[i]
                j = int(np.argmax(sims))
                if sims[j] >= SEM_TAU:
                    dropped.append(float(sims[j]))
                    continue
            kept_rows.append(i)
        out[int(c)] = dict(
            n_vecs=len(idx),
            n_kept=len(kept_rows),
            n_dropped=len(idx) - len(kept_rows),
            kept_id_sum=int(ids[kept_rows].sum()),
            max_drop_cos=round(max(dropped), 4) if dropped else None,
        )
    return out


def test_semantic_matches_numpy_recompute(spark, sf_dir):
    got = q_dedup_semantic(spark, sf_dir).toPandas()
    want = _numpy_pipeline(spark, sf_dir)
    assert sorted(got.cell_id) == sorted(want)
    for _, g in got.iterrows():
        w = want[int(g.cell_id)]
        for k in ("n_vecs", "n_kept", "n_dropped", "kept_id_sum"):
            assert int(g[k]) == w[k], (int(g.cell_id), k)
        if w["max_drop_cos"] is None:
            assert pd.isna(g.max_drop_cos)
        else:
            assert abs(float(g.max_drop_cos) - w["max_drop_cos"]) <= 1e-9


def test_semantic_drops_something_but_not_everything(spark, sf_dir):
    """τ sits above the corpus's pair-cosine bulk, so the kept set
    must be a strict, non-trivial subset whenever planted near-dups
    land in one cell — and the totals must reconcile."""
    from zvdb_spark.sources.tables import table_row_count

    pdf = q_dedup_semantic(spark, sf_dir).toPandas()
    assert int(pdf.n_vecs.sum()) == table_row_count(sf_dir, "embeddings")
    assert (pdf.n_kept + pdf.n_dropped == pdf.n_vecs).all()
    assert int(pdf.n_dropped.sum()) > 0
    assert int(pdf.n_dropped.sum()) < int(pdf.n_vecs.sum())


def test_semantic_no_kept_pair_clears_tau_within_cell(spark, sf_dir):
    """The greedy invariant, checked against raw vectors: within any
    cell, no two KEPT vectors are τ-near — i.e. the kept set is a
    maximal independent set under the greedy order."""
    from zvdb_spark.functions.vector import as_double_array
    from zvdb_spark.operators.kmeans import assign_cells

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("emb")
    )
    cents = kmeans_fit(e, k=SEM_CELLS, n_iter=SEM_ITERS)
    rows = assign_cells(e, cents).collect()
    got = q_dedup_semantic(spark, sf_dir).toPandas()
    kept_sum = {int(r.cell_id): int(r.kept_id_sum) for _, r in got.iterrows()}
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r.cell_id, []).append(r)
    for c, rs in by_cell.items():
        rs.sort(key=lambda r: r.vec_id)
        x = np.stack([np.asarray(r.emb, dtype=np.float64) for r in rs])
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        kept_rows: list[int] = []
        for i in range(len(rs)):
            if kept_rows and (x[kept_rows] @ x[i]).max() >= SEM_TAU:
                continue
            kept_rows.append(i)
        sims = x[kept_rows] @ x[kept_rows].T
        np.fill_diagonal(sims, 0.0)
        assert (sims < SEM_TAU).all(), c
        assert sum(rs[i].vec_id for i in kept_rows) == kept_sum[c]


def test_fit_save_load_refit_determinism(spark, sf_dir, tmp_path):
    """The r9→r10 contract: the DECLARED query now routes through
    fit → save_centroids → load_centroids, so (a) the round-trip is
    bitwise lossless, (b) the kept set computed from loaded centroids
    is identical to the kept set from the in-memory fit, and (c) two
    full declared-query runs (each doing its own fit-save-load) agree
    — the fit is seeded and the tail is pinned to the on-disk
    float64 matrix."""
    from zvdb_spark.functions.vector import as_double_array
    from zvdb_spark.operators.kmeans import load_centroids, save_centroids
    from zvdb_spark.queries.dedup import semantic_dedup_with_centroids

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("emb")
    )
    fitted = kmeans_fit(e, k=SEM_CELLS, n_iter=SEM_ITERS)
    save_centroids(fitted, str(tmp_path / "cents"))
    loaded = load_centroids(str(tmp_path / "cents"))
    assert loaded.dtype == np.float64
    assert np.array_equal(loaded, fitted)  # bitwise round-trip

    a = (
        semantic_dedup_with_centroids(spark, sf_dir, fitted)
        .toPandas()
        .sort_values("cell_id", ignore_index=True)
    )
    b = (
        semantic_dedup_with_centroids(spark, sf_dir, loaded)
        .toPandas()
        .sort_values("cell_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b)

    # the declared query end-to-end, twice: same artifact
    r1 = q_dedup_semantic(spark, sf_dir).toPandas().sort_values(
        "cell_id", ignore_index=True
    )
    r2 = q_dedup_semantic(spark, sf_dir).toPandas().sort_values(
        "cell_id", ignore_index=True
    )
    pd.testing.assert_frame_equal(r1, r2)


def test_declared_query_scratch_conf_is_honored_and_cleaned(
    spark, sf_dir, tmp_path
):
    """Pointing zvdb.export.scratch at a fresh dir: the query must
    create its centroid scratch there and remove it afterwards (the
    q_export_shards contract, export.py:263)."""
    import os

    scratch = tmp_path / "scratch"
    scratch.mkdir()
    spark.conf.set("zvdb.export.scratch", str(scratch))
    try:
        q_dedup_semantic(spark, sf_dir).toPandas()
    finally:
        spark.conf.unset("zvdb.export.scratch")
    assert os.listdir(scratch) == []  # created inside, cleaned up
