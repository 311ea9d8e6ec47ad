"""BM25 + hybrid RRF retrieval (queries/retrieval.py) — past-cap
rows-only queries, so this suite IS their correctness gate: DuckDB
parity, an independent Python BM25 recompute, the shuffle-free plan
shape, and the rank-fusion arithmetic."""

from __future__ import annotations

import math

from tests.oracle_utils import assert_matches_oracle
from zvdb_spark.queries.retrieval import (
    BM25_B,
    BM25_K1,
    BM25_ORACLE,
    BM25_TERMS,
    BM25_TOPK,
    RRF_K,
    RRF_ORACLE,
    q_hybrid_rrf,
    q_text_bm25,
)
from zvdb_spark.sources.tables import load


def test_bm25_matches_oracle(spark, sf_dir):
    assert_matches_oracle(q_text_bm25(spark, sf_dir), BM25_ORACLE, sf_dir)


def test_bm25_python_recompute(spark, sf_dir):
    """Full independent recompute: tokenize in Python, score every
    document, take the same top-15 — no Spark, no DuckDB."""
    rows = load(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    toks = {r.doc_id: r.text.split(" ") for r in rows}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {
        t: sum(1 for tk in toks.values() if t in tk) for t in BM25_TERMS
    }
    scored = []
    for d, tk in toks.items():
        s, hit = 0.0, 0
        for t in BM25_TERMS:
            tf = tk.count(t)
            if tf == 0:
                continue
            hit += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += (
                idf
                * tf
                * (BM25_K1 + 1.0)
                / (tf + BM25_K1 * (1 - BM25_B + BM25_B * len(tk) / avgdl))
            )
        if hit:
            scored.append((round(s, 4), d, hit))
    scored.sort(key=lambda r: (-r[0], r[1]))
    want = [(d, s, h) for s, d, h in scored[:BM25_TOPK]]
    got = [
        (r.doc_id, r.bm25, r.n_hit)
        for r in q_text_bm25(spark, sf_dir).collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    assert all(abs(g[1] - w[1]) < 1e-6 for g, w in zip(got, want))
    assert [g[2] for g in got] == [w[2] for w in want]


def test_bm25_plan_is_shuffle_free_take_ordered(spark, sf_dir):
    """The scale claim itself: tf via array HOFs inside the scan (no
    explode), scoring a map pass, top-k as TakeOrderedAndProject —
    the scored frame's plan carries NO hash-partitioning exchange."""
    from zvdb_spark.plans import plan_audit

    a = plan_audit(q_text_bm25(spark, sf_dir))
    assert a["has_take_ordered"], a["plan"][:1500]
    assert "hashpartitioning" not in a["plan"], a["plan"][:1500]
    assert "Generate" not in a["plan"], a["plan"][:1500]  # no explode


def test_rrf_matches_oracle(spark, sf_dir):
    assert_matches_oracle(q_hybrid_rrf(spark, sf_dir), RRF_ORACLE, sf_dir)


def test_rrf_arithmetic_and_missing_modality(spark, sf_dir):
    """Every returned fusion score recomputes from its own rank
    columns (rank 0 = absent from that modality's top-R, contributing
    exactly 0), and at least one returned item is single-modality —
    the full-outer-join semantics RRF needs."""
    rows = q_hybrid_rrf(spark, sf_dir).collect()
    assert rows
    single = 0
    for r in rows:
        want = 0.0
        if r.r_text:
            want += 1.0 / (RRF_K + r.r_text)
        if r.r_vec:
            want += 1.0 / (RRF_K + r.r_vec)
        assert abs(r.rrf - round(want, 6)) < 1e-9, r
        if (r.r_text == 0) != (r.r_vec == 0):
            single += 1
    assert single > 0
    scores = [r.rrf for r in rows]
    assert scores == sorted(scores, reverse=True)


# --------------------- round 11: batched retrieval


def test_bm25_batch_matches_oracle(spark, sf_dir):
    from zvdb_spark.queries.retrieval import (
        BM25_BATCH_ORACLE,
        q_text_bm25_batch,
    )

    assert_matches_oracle(
        q_text_bm25_batch(spark, sf_dir), BM25_BATCH_ORACLE, sf_dir
    )


def test_rrf_batch_matches_oracle(spark, sf_dir):
    from zvdb_spark.queries.retrieval import (
        RRF_BATCH_ORACLE,
        q_hybrid_rrf_batch,
    )

    assert_matches_oracle(
        q_hybrid_rrf_batch(spark, sf_dir), RRF_BATCH_ORACLE, sf_dir
    )


def test_batch_windows_are_partitioned_by_query(spark, sf_dir):
    """The r10 verdict's ask: no rank window in the batched paths is
    global — every windowspecdefinition carries the query_id
    partition key, so the plan is Q parallel per-query heaps, never
    one single-task window."""
    import re

    from zvdb_spark.queries.retrieval import (
        q_hybrid_rrf_batch,
        q_text_bm25_batch,
    )

    for fn in (q_text_bm25_batch, q_hybrid_rrf_batch):
        plan = fn(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        assert specs, f"{fn.__name__}: no window found in plan"
        for spec in specs:
            assert "query_id" in spec, (
                f"{fn.__name__} has an unpartitioned rank window: "
                f"windowspecdefinition({spec})"
            )


def test_bm25_batch_explode_is_filtered_before_shuffle(spark, sf_dir):
    """Scale shape: the corpus explode is semi-joined against the
    broadcast query-term set (BroadcastHashJoin), so the tf shuffle
    carries only query-matching tokens — the corpus x avg_len blow-up
    never crosses the wire."""
    from zvdb_spark.queries.retrieval import q_text_bm25_batch

    plan = (
        q_text_bm25_batch(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_bm25_batch_matches_single_query_scores(spark, sf_dir):
    """Cross-path agreement: a batch query whose terms equal the
    fixed BM25_TERMS reproduces q_text_bm25's per-doc scores (the HOF
    formulation and the pair formulation are the same math)."""
    from pyspark.sql import functions as F

    from zvdb_spark.queries.retrieval import (
        BM25_TOPK,
        bm25_batch,
        bm25_scores,
    )

    docs = load(spark, sf_dir, "documents")
    q = docs.sparkSession.createDataFrame(
        [(99, " ".join(BM25_TERMS))], "query_id int, qtext string"
    )
    got = {
        r.doc_id: r.bm25
        for r in bm25_batch(docs, q, top_k=BM25_TOPK).collect()
    }
    want = {r.doc_id: r.bm25 for r in bm25_scores(docs).collect()}
    assert got == want
