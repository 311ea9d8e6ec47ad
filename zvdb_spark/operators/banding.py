"""Hot-bucket-bounded LSH band self-join.

Every banded-LSH dedup pipeline (minhash, simhash, hyperplane
embedding LSH) ends in the same step: self-join the (id, band_key)
table on the band key and emit co-bucketed id pairs. The raw
formulation puts an entire (band, key) bucket on ONE reducer and emits
B^2 candidates from it — fine for organic buckets, quadratic-on-one-task
for the adversarial case a web corpus always contains (a boilerplate
template shared by millions of pages survives the exact-dup pass
because each instance differs by a few tokens, yet lands every
instance in the same LSH bucket).

``bounded_band_pairs`` keeps the raw join for buckets at or under
``cap`` rows and routes oversized buckets through a TRIANGLE-SALTED
self-join: rows get a deterministic salt s in [0, n_salts); the
bucket's pair clique is covered by the n_salts*(n_salts+1)/2 unordered
salt blocks (p, q), p <= q — a row with salt s enters block (s, q) on
the left for every q >= s and block (p, s) on the right for every
p <= s, so each unordered row pair {x, y} meets in exactly the block
(min(sx, sy), max(sx, sy)). The block id joins as part of the key,
so one hot bucket's quadratic work spreads over ~n_salts^2/2 reducers
each doing (B/n_salts)^2 — the emitted candidate SET is bit-identical
to the raw clique (pinned by tests/test_banding.py against the
uncapped join and a pure-Python oracle).

The bucket census is one aggregated groupBy over the band table
(map-side partial aggregation: the shuffle carries ~one row per
distinct bucket, nothing materialized to disk). When the census
finds no bucket over cap — the common organic corpus — the operator
short-circuits to the plain self-join with zero salted machinery;
the census premium on that path is measured in bench.py
(`lsh_census.census_overhead_pct`). Only the skewed path
materializes anything: the counts-tagged band table, checkpointed
once because it feeds four join branches. The straggler the census
insures against costs hours at 100 TB.

Reference parity note: the reference engine (src/hnsw.zig:88-104)
bounds its own candidate sets by construction (top-M neighbor prune);
this is the analogous bound for the dedup family the reference lacks.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Above this many rows in one (band, key) bucket the raw self-join's
# single-reducer cost (cap^2 pair emissions) starts to dominate a
# stage; 10k^2 = 100M candidate rows from one task is the ceiling we
# accept before spreading. Tests monkeypatch the per-call `cap`.
DEFAULT_BUCKET_CAP = 10_000
DEFAULT_N_SALTS = 8


def bounded_band_pairs(
    bands: DataFrame,
    id_col: str,
    key_cols: Sequence[str],
    cap: int = DEFAULT_BUCKET_CAP,
    n_salts: int = DEFAULT_N_SALTS,
) -> DataFrame:
    """Distinct candidate pairs (ia < ib) of ids sharing at least one
    band key, with oversized buckets triangle-salted.

    ``bands``: one row per (id, band key) membership; ``key_cols``
    identify the bucket (e.g. ["band_idx", "key"]). Returns columns
    (ia, ib) with ia < ib, distinct across all buckets — the exact
    pair set of the naive self-join at any cap/n_salts setting.
    """
    if cap < 1 or n_salts < 1:
        raise ValueError("cap and n_salts must be >= 1")
    keys = list(key_cols)
    # The census is an AGGREGATED (keys, n) frame, not a window over
    # the band table (r9 shape): groupBy gets map-side partial
    # aggregation, so its shuffle carries ~one row per DISTINCT
    # bucket instead of every band tuple. This reconciles with
    # vocab.py:span_dedup_stride's refusal to materialize its
    # tokenized corpus: same rule both places — checkpoint iff
    # bytes-materialized < bytes-reshuffled by the branches it
    # feeds. Here counts feeds at most two single reads (max, then
    # the skewed join-back), so it is never checkpointed; the
    # four-branch frame that IS worth materializing is `sized` below.
    counts = bands.groupBy(*keys).agg(F.count(F.lit(1)).alias("_bkt_n"))

    def _raw_pairs(src: DataFrame) -> DataFrame:
        a = src.select(F.col(id_col).alias("ia"), *keys)
        b = src.select(F.col(id_col).alias("ib"), *keys)
        return (
            a.join(b, keys)
            .filter(F.col("ia") < F.col("ib"))
            .select("ia", "ib")
        )

    # Unskewed short-circuit (the common organic case): when no
    # bucket exceeds cap the salted branches are provably empty, so
    # the raw self-join on the ORIGINAL band table is the whole
    # answer — no join-back, no per-row count column, no union. The
    # census then costs one partial-agg shuffle plus a tiny max();
    # bench.py `lsh_census` publishes that premium
    # (census_overhead_pct vs the uncensused naive join). Output is
    # bit-identical on both paths (pinned by tests/test_banding.py).
    # The census is never checkpointed: the hot path reads it once
    # (the max below) and the skewed path reads it once more through
    # the sized join — whose RESULT is the frame that feeds four
    # branches and gets checkpointed. Materializing counts itself
    # would be executor-disk overhead on every organic call.
    max_bkt = counts.agg(F.max("_bkt_n")).head()[0]
    if max_bkt is None or max_bkt <= cap:
        return _raw_pairs(bands).distinct()

    # Skewed path: join the counts back to tag every band row with
    # its bucket size, and checkpoint THAT frame because it feeds
    # FOUR join branches (small a/b, big a/b) — materializing once
    # beats re-running the join-back shuffle per branch (the r9
    # window-census version measured 7 exchanges -> 5 from the same
    # discipline). This frame is rows x n_bands of fixed-width ints
    # (~40 B/row; ~0.6 TB spread across a cluster at 1B docs x 16
    # bands) and only exists when a hot bucket actually fired.
    sized = bands.join(counts, keys).localCheckpoint(eager=True)

    small = sized.filter(F.col("_bkt_n") <= cap)
    pairs_small = _raw_pairs(small)

    big = sized.filter(F.col("_bkt_n") > cap).withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)).cast("int"),
    )
    # Left role: row with salt s covers blocks (s, q), q in [s, S).
    big_a = big.select(
        F.col(id_col).alias("ia"),
        *keys,
        F.col("_salt").alias("_p"),
        F.explode(
            F.sequence(F.col("_salt"), F.lit(n_salts - 1))
        ).alias("_q"),
    )
    # Right role: row with salt s covers blocks (p, s), p in [0, s].
    big_b = big.select(
        F.col(id_col).alias("ib"),
        *keys,
        F.explode(F.sequence(F.lit(0), F.col("_salt"))).alias("_p"),
        F.col("_salt").alias("_q"),
    )
    # In block (p, p) both rows of a pair appear on both sides, so the
    # pair arrives twice in both orders; in block (p, q), p < q, the
    # pair arrives exactly once but the lower-salt row may hold the
    # LARGER id — canonicalize with least/greatest instead of ia < ib,
    # dedup via the final distinct.
    pairs_big = (
        big_a.join(big_b, keys + ["_p", "_q"])
        .filter(F.col("ia") != F.col("ib"))
        .select(
            F.least("ia", "ib").alias("ia"),
            F.greatest("ia", "ib").alias("ib"),
        )
    )
    return pairs_small.unionAll(pairs_big).distinct()
