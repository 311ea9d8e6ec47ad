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

The bucket census is one window count over the band table (linear,
same shuffle key as the join itself); at 100 TB the band table is
rows x n_bands tuples of a few ints — the census costs one extra
linear pass, the straggler it removes costs hours.

Reference parity note: the reference engine (src/hnsw.zig:88-104)
bounds its own candidate sets by construction (top-M neighbor prune);
this is the analogous bound for the dedup family the reference lacks.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
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
    w = Window.partitionBy(*keys)
    # the censused band table feeds FOUR join branches (small a/b,
    # big a/b); checkpointing it materializes the window census ONCE
    # instead of re-running its shuffle per branch (measured: 7
    # exchanges -> 5, one census instead of four). Size is the band
    # table itself — id + keys + count, the same magnitude the LSH
    # callers already checkpoint upstream.
    sized = bands.withColumn(
        "_bkt_n", F.count(F.lit(1)).over(w)
    ).localCheckpoint(eager=True)

    small = sized.filter(F.col("_bkt_n") <= cap)
    a = small.select(F.col(id_col).alias("ia"), *keys)
    b = small.select(F.col(id_col).alias("ib"), *keys)
    pairs_small = (
        a.join(b, keys)
        .filter(F.col("ia") < F.col("ib"))
        .select("ia", "ib")
    )

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
