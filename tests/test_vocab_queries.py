"""DuckDB parity + semantic invariants for the tokenizer-prep pack
(queries/vocab.py) — past-cap rows-only queries, so this suite IS
their correctness gate (same row-count + schema + value comparison
the driver runs, via tests/oracle_utils)."""

from __future__ import annotations

from collections import Counter, defaultdict

from tests.oracle_utils import assert_matches_oracle, portable_h as _h
from zvdb_spark.queries.vocab import (
    SPAN_K,
    SPANS_ORACLE,
    TOP_V,
    VOCAB_ORACLE,
    q_dedup_spans,
    q_vocab_topk,
)
from zvdb_spark.sources.tables import load


# --- span dedup ---


def test_spans_matches_oracle(spark, sf_dir):
    assert_matches_oracle(q_dedup_spans(spark, sf_dir), SPANS_ORACLE, sf_dir)


def test_spans_cut_is_real_and_partial(spark, sf_dir):
    """The corpus plants near-duplicate documents, so the cut must be
    non-empty — and it must not consume the corpus either."""
    pdf = q_dedup_spans(spark, sf_dir).toPandas()
    assert int(pdf.spans_cut.sum()) > 0
    assert int(pdf.spans_cut.sum()) < int(pdf.spans_total.sum())
    assert (pdf.docs_touched <= pdf.n_docs).all()
    assert (pdf.docs_emptied <= pdf.docs_touched).all()


def test_spans_matches_python_recompute(spark, sf_dir):
    """Recompute the whole contract in plain Python from the raw text
    (independent of both engines): chunking, cross-doc span verdicts,
    reassembly, checksums."""
    rows = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .collect()
    )
    span_docs: dict[str, set[int]] = defaultdict(set)
    chunks: dict[int, list[str]] = {}
    lang_of: dict[int, str] = {}
    for r in rows:
        toks = r.text.split(" ")
        spans = [
            " ".join(toks[i : i + SPAN_K])
            for i in range(0, len(toks), SPAN_K)
        ]
        chunks[r.doc_id] = spans
        lang_of[r.doc_id] = r.lang
        for s in spans:
            span_docs[s].add(r.doc_id)
    want: dict[str, dict[str, int]] = defaultdict(
        lambda: dict(
            n_docs=0, spans_total=0, spans_cut=0, docs_touched=0,
            docs_emptied=0, cut_id_sum=0, clean_checksum=0,
        )
    )
    for did, spans in chunks.items():
        kept = [s for s in spans if len(span_docs[s]) == 1]
        cut = len(spans) - len(kept)
        w = want[lang_of[did]]
        w["n_docs"] += 1
        w["spans_total"] += len(spans)
        w["spans_cut"] += cut
        if cut:
            w["docs_touched"] += 1
            w["cut_id_sum"] += did
        if cut == len(spans):
            w["docs_emptied"] += 1
        w["clean_checksum"] += _h(" ".join(kept))
    got = q_dedup_spans(spark, sf_dir).toPandas()
    assert len(got) == len(want)
    for _, g in got.iterrows():
        w = want[g.lang]
        for k in (
            "n_docs", "spans_total", "spans_cut", "docs_touched",
            "docs_emptied", "cut_id_sum",
        ):
            assert int(g[k]) == w[k], (g.lang, k)
        assert int(g.clean_checksum) == w["clean_checksum"], g.lang


def test_spans_cut_set_insensitive_to_partitioning(spark, sf_dir):
    """The cross-doc verdict must not depend on the scan's partition
    layout (a hash-shuffle invariant, not a coincidence of layout)."""
    import zvdb_spark.queries.vocab as vocab

    base = q_dedup_spans(spark, sf_dir).toPandas().sort_values("lang")
    docs = load(spark, sf_dir, "documents").repartition(13, "lang")
    orig = vocab.load  # q_dedup_spans resolves load via its module

    def patched(s, d, name):
        return docs if name == "documents" else orig(s, d, name)

    vocab.load = patched
    try:
        re = q_dedup_spans(spark, sf_dir).toPandas().sort_values("lang")
    finally:
        vocab.load = orig
    assert list(base.clean_checksum) == list(re.clean_checksum)
    assert list(base.spans_cut) == list(re.spans_cut)


# --- vocabulary top-k ---


def test_vocab_matches_oracle(spark, sf_dir):
    assert_matches_oracle(q_vocab_topk(spark, sf_dir), VOCAB_ORACLE, sf_dir)


def test_vocab_matches_python_recompute(spark, sf_dir):
    rows = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    cf: Counter = Counter()
    df: Counter = Counter()
    for r in rows:
        toks = r.text.split(" ")
        cf.update(toks)
        df.update(set(toks))
    total = sum(cf.values())
    order = sorted(cf, key=lambda t: (-cf[t], t))[:TOP_V]
    got = q_vocab_topk(spark, sf_dir).toPandas().sort_values("rank")
    assert list(got.term) == order
    cum = 0
    for i, t in enumerate(order):
        g = got.iloc[i]
        cum += cf[t]
        assert int(g.cf) == cf[t]
        assert int(g.df) == df[t]
        assert int(g["rank"]) == i + 1
        assert int(g.coverage_pm) == cum * 1000 // total


def test_vocab_coverage_monotone_and_bounded(spark, sf_dir):
    pdf = q_vocab_topk(spark, sf_dir).toPandas().sort_values("rank")
    assert len(pdf) == TOP_V
    assert pdf.coverage_pm.is_monotonic_increasing
    assert int(pdf.coverage_pm.iloc[-1]) <= 1000
    assert (pdf.cf.values[:-1] >= pdf.cf.values[1:]).all()


# --- overlapping-stride span dedup ---


def test_spans_stride_matches_oracle(spark, sf_dir):
    from zvdb_spark.queries.vocab import (
        q_dedup_spans_stride,
        spans_stride_oracle,
    )

    assert_matches_oracle(
        q_dedup_spans_stride(spark, sf_dir), spans_stride_oracle(), sf_dir
    )


def _offset_dup_dir(spark, tmp_path):
    """Two docs sharing a 16-token passage at a 4-token offset delta
    (passage starts at position 1 in doc 0, position 5 in doc 1) —
    stride-4 windows align inside the passage in both docs, stride-8
    (aligned chunking) windows never do. Filler tokens are unique per
    doc so only the passage can collide."""
    passage = [f"p{i}" for i in range(16)]
    d0 = " ".join(passage + [f"a{i}" for i in range(8)])
    d1 = " ".join([f"b{i}" for i in range(4)] + passage + ["b4", "b5"])
    docs = [
        (0, d0, "en", "fix", len(d0)),
        (1, d1, "en", "fix", len(d1)),
    ]
    df = spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "offdup")
    df.write.mode("overwrite").parquet(out + "/documents.parquet")
    return out


def test_stride4_catches_offset_dup_that_stride8_misses(spark, tmp_path):
    from zvdb_spark.queries.vocab import span_dedup_stride

    d = _offset_dup_dir(spark, tmp_path)
    caught = span_dedup_stride(spark, d, k=8, s=4).collect()[0]
    missed = span_dedup_stride(spark, d, k=8, s=8).collect()[0]
    assert caught["toks_cut"] > 0 and caught["docs_touched"] == 2
    assert missed["toks_cut"] == 0 and missed["docs_touched"] == 0
    # stride 4 flags every window fully inside the passage in both
    # docs (doc0 starts {1,5,9}, doc1 starts {5,9,13} — each matches
    # a window of the other doc's passage); their union covers the
    # 16 passage tokens per doc -> 32 tokens cut corpus-wide
    assert caught["toks_cut"] == 32


def test_stride_parity_on_offset_fixture(spark, tmp_path):
    """DuckDB twin agrees at a non-default (k, s) on the adversarial
    fixture too."""
    from zvdb_spark.queries.vocab import span_dedup_stride, spans_stride_oracle

    d = _offset_dup_dir(spark, tmp_path)
    assert_matches_oracle(
        span_dedup_stride(spark, d, k=8, s=2), spans_stride_oracle(8, 2), d
    )


def test_stride_rejects_bad_params(spark, sf_dir):
    import pytest

    from zvdb_spark.queries.vocab import span_dedup_stride

    with pytest.raises(ValueError):
        span_dedup_stride(spark, sf_dir, k=8, s=0)
    with pytest.raises(ValueError):
        span_dedup_stride(spark, sf_dir, k=8, s=9)


def test_stride_spans_plan_shape(spark, sf_dir):
    """Stride dedup keeps the window-over-span-hash spine: the dup
    verdict shuffles ONCE on the span hash (never a join back on it),
    and the whole query stays within a handful of exchanges (3 at
    this scale; AQE may broadcast the flagged-start join's small side
    or leave it key-partitioned — both acceptable, a crossJoin or a
    hash-side join-back is not)."""
    from zvdb_spark.plans.audit import plan_audit
    from zvdb_spark.queries.vocab import span_dedup_stride

    a = plan_audit(span_dedup_stride(spark, sf_dir))
    assert "hashpartitioning(span_h" in a["plan"], a["plan"][:2000]
    assert a["n_exchanges"] <= 5, a["plan"][:2000]
    assert "CartesianProduct" not in a["plan"]


def test_spans_s1_matches_oracle(spark, sf_dir):
    from zvdb_spark.queries.vocab import (
        SPAN_K,
        q_dedup_spans_s1,
        spans_stride_oracle,
    )

    assert_matches_oracle(
        q_dedup_spans_s1(spark, sf_dir),
        spans_stride_oracle(SPAN_K, 1),
        sf_dir,
    )


def test_stride1_catches_odd_offset_dup_that_stride4_misses(
    spark, tmp_path
):
    """A passage duplicated at offset delta 1 (not a multiple of 4):
    stride-4 windows never align across the two docs, stride-1 is
    any-offset and must cut it — the r9 verdict's residual escape
    class for the s=K/2 default."""
    from zvdb_spark.queries.vocab import span_dedup_stride

    passage = [f"p{i}" for i in range(16)]
    d0 = " ".join(passage + [f"a{i}" for i in range(8)])
    d1 = " ".join(["b0"] + passage + [f"c{i}" for i in range(7)])
    docs = [
        (0, d0, "en", "fix", len(d0)),
        (1, d1, "en", "fix", len(d1)),
    ]
    df = spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "odd1")
    df.write.mode("overwrite").parquet(d + "/documents.parquet")

    caught = span_dedup_stride(spark, d, k=8, s=1).collect()[0]
    missed = span_dedup_stride(spark, d, k=8, s=4).collect()[0]
    assert caught["toks_cut"] > 0 and caught["docs_touched"] == 2
    assert missed["toks_cut"] == 0 and missed["docs_touched"] == 0
    # s=1 flags every full window inside the passage in both docs;
    # their union is exactly the 16 passage tokens per doc
    assert caught["toks_cut"] == 32
