"""Hot-bucket-bounded band self-join (operators/banding.py).

The contract under test: at ANY (cap, n_salts) setting the emitted
candidate pair set is bit-identical to the naive clique self-join —
including the adversarial one-template-x-N corpus whose single band
bucket would otherwise make one reducer quadratic."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

import zvdb_spark.queries.dedup as dedup
from zvdb_spark.operators.banding import bounded_band_pairs


def _naive_pairs(rows):
    """Pure-Python oracle: all (ia < ib) pairs sharing a band key."""
    buckets: dict[tuple, list] = {}
    for rid, *key in rows:
        buckets.setdefault(tuple(key), []).append(rid)
    out = set()
    for ids in buckets.values():
        for a, b in itertools.combinations(sorted(ids), 2):
            out.add((a, b))
    return out


def _run(spark, rows, cap, n_salts, keys=("band_idx", "key")):
    df = spark.createDataFrame(rows, ["rid", *keys])
    got = bounded_band_pairs(
        df, "rid", list(keys), cap=cap, n_salts=n_salts
    ).collect()
    return {(r["ia"], r["ib"]) for r in got}


def test_one_template_times_n_adversarial(spark):
    # One boilerplate bucket holding every row: the raw join's
    # nightmare case. cap=20 << N=150 forces the salted path.
    n = 150
    rows = [(i, 0, 7) for i in range(n)]
    got = _run(spark, rows, cap=20, n_salts=4)
    assert got == _naive_pairs(rows)
    assert len(got) == n * (n - 1) // 2


def test_mixed_small_and_hot_buckets(spark):
    # Hot bucket (60 rows) + several organic buckets + rows that are
    # members of BOTH (multi-band membership), so small- and big-path
    # pairs overlap and the final distinct matters.
    rows = [(i, 0, 1) for i in range(60)]
    rows += [(i, 1, 2) for i in (3, 5, 9)]
    rows += [(100 + i, 1, 3) for i in range(4)]
    rows += [(3, 2, 4), (5, 2, 4)]  # pair (3,5) also via hot bucket 0
    got = _run(spark, rows, cap=10, n_salts=3)
    assert got == _naive_pairs(rows)


def test_salted_path_matches_uncapped(spark):
    # Deterministic pseudo-random memberships; every bucket forced
    # through the salted path (cap=1) must equal the pure raw join
    # (cap large enough to never salt).
    rows = [
        (i, (i * 7) % 3, (i * i) % 5) for i in range(80)
    ]
    capped = _run(spark, rows, cap=1, n_salts=5)
    uncapped = _run(spark, rows, cap=10_000, n_salts=5)
    assert capped == uncapped == _naive_pairs(rows)


def test_n_salts_one_degenerates_to_clique(spark):
    rows = [(i, 0, 0) for i in range(25)]
    got = _run(spark, rows, cap=5, n_salts=1)
    assert got == _naive_pairs(rows)


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, 0)], ["rid", "key"])
    with pytest.raises(ValueError):
        bounded_band_pairs(df, "rid", ["key"], cap=0)
    with pytest.raises(ValueError):
        bounded_band_pairs(df, "rid", ["key"], n_salts=0)


def _template_docs_dir(spark, tmp_path, n=120):
    """A one-template-x-N documents fixture: every doc is the same
    boilerplate with a tiny unique suffix — near-dup cluster that the
    exact pass can NOT remove, landing all N in one minhash bucket."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (i, f"{base} variant {i % 2}", "en", "template", len(base) + 10)
        for i in range(n)
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "advdir")
    df.write.mode("overwrite").parquet(out + "/documents.parquet")
    return out


def test_minhash_query_capped_equals_uncapped(spark, tmp_path, monkeypatch):
    """End-to-end q_dedup_minhash on the adversarial corpus: pair set
    with the cap forcing the salted path == pair set with the cap
    effectively off."""
    d = _template_docs_dir(spark, tmp_path)

    def pairs():
        rows = dedup.q_dedup_minhash(spark, d).collect()
        return {(r["id_a"], r["id_b"], r["jaccard"]) for r in rows}

    monkeypatch.setattr(dedup, "BAND_BUCKET_CAP", 10)
    capped = pairs()
    monkeypatch.setattr(dedup, "BAND_BUCKET_CAP", 10_000_000)
    uncapped = pairs()
    assert capped == uncapped
    assert len(capped) > 0  # non-vacuous: the template cluster collides


def test_big_path_splits_hot_bucket_into_balanced_blocks(spark):
    """The POINT of the triangle salting: one hot bucket's pair
    emission is split across S(S+1)/2 independent join keys (salt
    blocks), each carrying a bounded share — so no single reducer
    owns the clique. Recomputed from the same salt formula the
    operator uses (xxhash64 % S), every block must be populated and
    no block may dominate."""
    from pyspark.sql import functions as F

    n, s = 600, 4
    rows = [(i, 0, 0) for i in range(n)]
    df = spark.createDataFrame(rows, ["rid", "band_idx", "key"])
    pairs = bounded_band_pairs(
        df, "rid", ["band_idx", "key"], cap=50, n_salts=s
    )
    salted = pairs.select(
        F.pmod(F.xxhash64("ia"), F.lit(s)).alias("sa"),
        F.pmod(F.xxhash64("ib"), F.lit(s)).alias("sb"),
    ).select(
        F.least("sa", "sb").alias("p"), F.greatest("sa", "sb").alias("q")
    )
    counts = {(r.p, r.q): r["count"] for r in salted.groupBy("p", "q").count().collect()}
    assert len(counts) == s * (s + 1) // 2  # every block populated
    total = sum(counts.values())
    assert total == n * (n - 1) // 2
    # (p, p) blocks hold ~half the pairs of a (p, q) block; bound the
    # spread loosely — the claim is "no reducer owns the clique"
    assert max(counts.values()) < 0.25 * total


def test_hot_bucket_at_scale_completes_with_exact_count(spark):
    """Order-of-magnitude smoke: a 3,000-row single bucket (4.5M
    candidate pairs) through the salted path produces EXACTLY the
    clique count — counted distributed, never collected."""
    n = 3000
    df = spark.range(n).selectExpr("id AS rid", "0 AS band_idx", "0 AS key")
    got = bounded_band_pairs(
        df, "rid", ["band_idx", "key"], cap=1000, n_salts=8
    ).count()
    assert got == n * (n - 1) // 2


def test_empty_band_table_yields_empty_pairs(spark):
    # The r10 short-circuit asks the census for max(_bkt_n), which is
    # NULL on an empty frame — must take the unskewed path and return
    # zero pairs, not throw.
    df = spark.createDataFrame([], "rid long, band_idx int, key int")
    got = bounded_band_pairs(df, "rid", ["band_idx", "key"])
    assert got.count() == 0


def test_property_random_tables_match_oracle_at_any_cap(spark):
    # Property sweep across the cap boundary the r10 short-circuit
    # introduced: seeded pseudo-random band tables with bucket sizes
    # straddling cap (under, exactly-at, and over), every (cap,
    # n_salts) must emit exactly the pure-Python oracle's pair set.
    # Deterministic seeds, not hypothesis: each example is a Spark
    # round-trip (~1 s), so the value is the boundary grid, not
    # shrinking.
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        n = rng.randint(20, 60)
        rows = [
            (i, rng.randint(0, 1), rng.randint(0, 4)) for i in range(n)
        ]
        sizes = sorted(
            len(list(g))
            for _, g in itertools.groupby(
                sorted(r[1:] for r in rows)
            )
        )
        # caps chosen off the actual bucket-size distribution so the
        # grid provably covers: all-small (max), the exact boundary
        # (== max bucket triggers NO salting), and all/some-big (1)
        for cap in (1, sizes[-1], 10_000):
            for n_salts in (1, 3):
                got = _run(spark, rows, cap=cap, n_salts=n_salts)
                assert got == _naive_pairs(rows), (seed, cap, n_salts)
