"""DuckDB parity + semantic invariants for the curation pack
(queries/curation.py) — past-cap rows-only queries, so this suite IS
their correctness gate (same row-count + schema + value comparison
the driver runs, via tests/oracle_utils)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tests.oracle_utils import assert_matches_oracle, duckdb_con
from zvdb_spark.queries.curation import (
    DUP_BIGRAM_PM,
    MAX_TOK,
    MIN_TOK,
    MIX_TARGETS_PM,
    MIXTURE_ORACLE,
    PAT_EMAIL,
    PAT_IP,
    PAT_PHONE,
    PII_ORACLE,
    QUALITY_ORACLE,
    RATE_M,
    TOP_TOK_PM,
    q_domain_mixture,
    q_pii_redact,
    LM_ORACLE,
    NOVELTY_PM,
    q_lm_filter,
    q_quality_signals,
)


# --- quality signals ---


def test_quality_matches_oracle(spark, sf_dir):
    assert_matches_oracle(q_quality_signals(spark, sf_dir), QUALITY_ORACLE, sf_dir)


def test_quality_gate_cuts_and_keeps(spark, sf_dir):
    """The gate must actually split the corpus at these thresholds —
    a gate that keeps (or cuts) everything proves nothing."""
    pdf = q_quality_signals(spark, sf_dir).toPandas()
    assert (pdf.n_kept <= pdf.n_docs).all()
    assert int(pdf.n_kept.sum()) > 0
    assert int(pdf.n_kept.sum()) < int(pdf.n_docs.sum())
    assert ((0 <= pdf.dup_tok_frac) & (pdf.dup_tok_frac <= 1)).all()
    assert ((0 <= pdf.top_tok_frac) & (pdf.top_tok_frac <= 1)).all()
    assert ((0 <= pdf.dup_bigram_frac) & (pdf.dup_bigram_frac <= 1)).all()


def test_quality_verdict_matches_per_doc_recompute(spark, sf_dir):
    """Recompute one language's verdicts per-doc in Python from the
    raw text (independent of both engines' HOFs) and compare the
    kept-id checksum."""
    from zvdb_spark.sources.tables import load

    rows = (
        load(spark, sf_dir, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id", "text")
        .collect()
    )
    assert rows
    kept_sum = n_kept = 0
    for r in rows:
        toks = r.text.split(" ")
        n = len(toks)
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        nd2 = len(set(bigrams))
        top_n = max(toks.count(t) for t in set(toks))
        keep = (
            MIN_TOK <= n <= MAX_TOK
            and top_n * 1000 <= TOP_TOK_PM * n
            and (n - 1 - nd2) * 1000 <= DUP_BIGRAM_PM * (n - 1)
        )
        if keep:
            n_kept += 1
            kept_sum += r.doc_id
    got = (
        q_quality_signals(spark, sf_dir)
        .filter(F.col("lang") == "en")
        .collect()[0]
    )
    assert got.n_kept == n_kept
    assert got.kept_id_sum == kept_sum


def test_quality_plan_has_no_join_or_explode(spark, sf_dir):
    """The per-doc stats pass must stay shuffle-free: the max-run HOF
    replaces explode -> groupBy -> join-back, so the executed plan has
    exactly one aggregation pair (the per-lang rollup) and no join."""
    plan = (
        q_quality_signals(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan  # no explode
    n_shuffles = plan.count("Exchange")
    assert n_shuffles <= 2, f"expected only the lang rollup:\n{plan}"


# --- PII redaction ---


def test_pii_matches_oracle(spark, sf_dir):
    assert_matches_oracle(q_pii_redact(spark, sf_dir), PII_ORACLE, sf_dir)


def test_pii_counts_and_zero_residual(spark, sf_dir):
    pdf = q_pii_redact(spark, sf_dir).toPandas()
    # every doc got exactly one synthetic email; phones/ips per the
    # deterministic doc_id % 3 / % 5 salts
    assert int(pdf.emails.sum()) == int(pdf.n_docs.sum())
    assert 0 < int(pdf.phones.sum()) < int(pdf.n_docs.sum())
    assert 0 < int(pdf.ips.sum()) < int(pdf.n_docs.sum())
    assert int(pdf.residual_pii.sum()) == 0


def test_pii_patterns_match_python_re(spark, sf_dir):
    """The Java-regex and RE2 subset used must also agree with
    Python's re on a sample doc — guards against an escaping slip in
    the shared pattern literals."""
    s = "x user12@mail5.com 555-0042 10.0.33.232 y"
    assert re.findall(PAT_EMAIL, s) == ["user12@mail5.com"]
    assert re.findall(PAT_PHONE, s) == ["555-0042"]
    assert re.findall(PAT_IP, s) == ["10.0.33.232"]
    clean = re.sub(PAT_EMAIL, "<EMAIL>", s)
    clean = re.sub(PAT_PHONE, "<PHONE>", clean)
    clean = re.sub(PAT_IP, "<IP>", clean)
    assert clean == "x <EMAIL> <PHONE> <IP> y"


# --- domain mixture ---


def test_mixture_matches_oracle(spark, sf_dir):
    assert_matches_oracle(q_domain_mixture(spark, sf_dir), MIXTURE_ORACLE, sf_dir)


def test_mixture_semantics(spark, sf_dir):
    """Thresholds are feasible (0 < thr <= M), every domain appears,
    the kept counts respect the per-domain totals, and ranking by
    expected kept volume reproduces the target-mixture ranking. (That
    t_cap really is the min over domains is pinned exactly by
    test_mixture_rates_derived_from_binding_domain below.)"""
    pdf = q_domain_mixture(spark, sf_dir).toPandas()
    assert set(pdf.domain) == set(MIX_TARGETS_PM)
    assert (pdf.thr <= RATE_M).all()
    assert (pdf.thr > 0).all()
    assert (pdf.n_kept <= pdf.n_total).all()
    # expected kept per domain is thr*n_total/M ~= t_pm*t_cap/1000, so
    # ranking domains by thr*n_total must reproduce the target-mixture
    # ranking — the sampled mixture has the declared SHAPE
    pdf["expect"] = pdf.thr * pdf.n_total
    by_expect = pdf.sort_values("expect").domain.tolist()
    by_target = sorted(MIX_TARGETS_PM, key=MIX_TARGETS_PM.get)
    assert by_expect == by_target


def test_mixture_rates_derived_from_binding_domain(spark, sf_dir):
    """Recompute t_cap and thresholds in Python from DuckDB counts and
    compare with the query's thr column (integer math, exact)."""
    con = duckdb_con(sf_dir)
    try:
        counts = dict(
            con.execute(
                "SELECT CASE (substr(source,4)::INT % 4) "
                "WHEN 0 THEN 'web' WHEN 1 THEN 'books' "
                "WHEN 2 THEN 'code' WHEN 3 THEN 'reference' END, count(*) "
                "FROM documents GROUP BY 1"
            ).fetchall()
        )
    finally:
        con.close()
    t_cap = min(
        counts[d] * 1000 // pm for d, pm in MIX_TARGETS_PM.items()
    )
    want = {
        d: (pm * t_cap * RATE_M) // (1000 * counts[d])
        for d, pm in MIX_TARGETS_PM.items()
    }
    got = {
        r.domain: r.thr for r in q_domain_mixture(spark, sf_dir).collect()
    }
    assert got == want


# --- time-series gap-fill (queries/windows.py) ---


def test_gapfill_matches_oracle(spark, sf_dir):
    from zvdb_spark.queries.windows import GAPFILL_ORACLE, q_events_gapfill

    assert_matches_oracle(q_events_gapfill(spark, sf_dir), GAPFILL_ORACLE, sf_dir)


def test_gapfill_carries_values_across_gaps(spark, sf_dir):
    """The spine is dense (active + gaps == hours), gaps exist at this
    granularity, and ffill_total exceeds observed_total wherever a gap
    follows a positive observation — the carried value is real, not a
    re-aggregation of observed rows."""
    from zvdb_spark.queries.windows import q_events_gapfill

    pdf = q_events_gapfill(spark, sf_dir).toPandas()
    assert (pdf.n_hours == pdf.n_active + pdf.n_gaps).all()
    assert int(pdf.n_gaps.sum()) > 0
    assert (pdf.ffill_total >= pdf.observed_total - 1e-9).all()
    assert float(pdf.ffill_total.sum()) > float(pdf.observed_total.sum())


def test_gapfill_spine_matches_span(spark, sf_dir):
    """Each user's hour count equals their active span in hours + 1,
    independently recomputed from the raw events table."""
    from zvdb_spark.queries.windows import q_events_gapfill
    from zvdb_spark.sources.tables import load

    spans = {
        r.user_id: r.span
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (
                (
                    F.unix_timestamp(F.date_trunc("hour", F.max("ts")))
                    - F.unix_timestamp(F.date_trunc("hour", F.min("ts")))
                )
                / 3600
                + 1
            ).cast("long").alias("span")
        )
        .collect()
    }
    got = {r.user_id: r.n_hours for r in q_events_gapfill(spark, sf_dir).collect()}
    assert got == spans


# --- ordered funnel (queries/aggregates.py) ---


def test_funnel_matches_oracle(spark, sf_dir):
    from zvdb_spark.queries.aggregates import FUNNEL_ORACLE, q_events_funnel

    assert_matches_oracle(q_events_funnel(spark, sf_dir), FUNNEL_ORACLE, sf_dir)


def test_funnel_is_monotone_and_nonempty(spark, sf_dir):
    from zvdb_spark.queries.aggregates import q_events_funnel

    r = q_events_funnel(spark, sf_dir).collect()[0]
    assert r.n_users >= r.n_viewed >= r.n_clicked >= r.n_converted
    assert r.n_viewed > 0
    assert (r.convert_us_sum > 0) == (r.n_converted > 0)


def test_funnel_matches_python_recompute(spark, sf_dir):
    """Replay the state machine in plain Python over the raw events
    (independent of both engines' formulations)."""
    from collections import defaultdict

    from zvdb_spark.queries.aggregates import FUNNEL_STAGES, q_events_funnel
    from zvdb_spark.sources.tables import load

    rows = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(*FUNNEL_STAGES))
        .select("user_id", "ts", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, r.event_type))
    n_viewed = n_clicked = n_converted = 0
    convert_us = 0
    for seq in by_user.values():
        t1 = t2 = t3 = None
        for ts, et in sorted(seq):
            if t1 is None and et == "view":
                t1 = ts
            elif t2 is None and t1 is not None and et == "click" and ts > t1:
                t2 = ts
            elif t3 is None and t2 is not None and et == "purchase" and ts > t2:
                t3 = ts
        n_viewed += t1 is not None
        n_clicked += t2 is not None
        n_converted += t3 is not None
        if t3 is not None:
            convert_us += int((t3 - t1).total_seconds() * 1_000_000)
    got = q_events_funnel(spark, sf_dir).collect()[0]
    assert got.n_users == len(by_user)
    assert (got.n_viewed, got.n_clicked, got.n_converted) == (
        n_viewed, n_clicked, n_converted,
    )
    assert got.convert_us_sum == convert_us


# --- statistical-LM novelty filter ---


def test_lm_filter_matches_oracle(spark, sf_dir):
    assert_matches_oracle(q_lm_filter(spark, sf_dir), LM_ORACLE, sf_dir)


def test_lm_filter_cuts_and_keeps(spark, sf_dir):
    pdf = q_lm_filter(spark, sf_dir).toPandas()
    assert (pdf.n_kept <= pdf.n_docs).all()
    assert int(pdf.n_kept.sum()) > 0
    assert int(pdf.n_kept.sum()) < int(pdf.n_docs.sum())
    assert (pdf.tri_novel <= pdf.tri_total).all()
    assert ((0 <= pdf.novelty_pm) & (pdf.novelty_pm <= 1000)).all()


def test_lm_filter_matches_python_recompute(spark, sf_dir):
    """Recompute the whole contract in plain Python from the raw text
    (independent of both engines' window/HOF machinery)."""
    from collections import Counter, defaultdict

    from zvdb_spark.sources.tables import load

    rows = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .collect()
    )
    corpus: Counter = Counter()
    per_doc: dict[int, list[str]] = {}
    lang_of: dict[int, str] = {}
    for r in rows:
        toks = r.text.split(" ")
        tris = [
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ]
        per_doc[r.doc_id] = tris
        lang_of[r.doc_id] = r.lang
        corpus.update(tris)
    want = defaultdict(lambda: dict(n_docs=0, n_kept=0, kept_id_sum=0))
    for did, tris in per_doc.items():
        if not tris:
            continue
        novel = sum(1 for t in tris if corpus[t] == 1)
        w = want[lang_of[did]]
        w["n_docs"] += 1
        if novel * 1000 <= NOVELTY_PM * len(tris):
            w["n_kept"] += 1
            w["kept_id_sum"] += did
    got = q_lm_filter(spark, sf_dir).toPandas()
    assert len(got) == len(want)
    for _, g in got.iterrows():
        w = want[g.lang]
        assert int(g.n_docs) == w["n_docs"], g.lang
        assert int(g.n_kept) == w["n_kept"], g.lang
        assert int(g.kept_id_sum) == w["kept_id_sum"], g.lang
