"""Z-order (Morton) multi-column layout: partition pruning for
range queries over MORE THAN ONE column.

A parquet layout partitioned by one column prunes range queries on
that column only; a 100 TB events table queried by (user range x
time range) scans every time partition for the user filter or vice
versa. The standard fix (Delta Lake's OPTIMIZE ZORDER, Hudi's
space-filling curves — public technique, Morton 1966) is to
interleave the bits of the filter columns into one scalar and
partition by ITS prefix: each partition then covers a small
axis-aligned box in (user, time) space, so a 2-D range query
touches only the boxes its query box intersects — pruning in BOTH
dimensions from ONE layout.

Implementation stance (all hot-path work JVM-side):

- **scale**: each column is affinely mapped to [0, 2^bits) from its
  exact corpus min/max (one agg). Affine, not quantile: the map is
  a pure Column expression (codegen), deterministic, and decodable
  driver-side without storing boundary arrays. The cost is that a
  heavily SKEWED column yields unbalanced buckets — documented
  trade; the skew remedy at 100 TB is the same as everywhere else
  in this repo (salt the bucket suffix), and the layout stays
  correct regardless because pruning is always followed by the
  exact residual predicate.
- **interleave**: a chain of shiftleft/and/or Column ops (2 x bits
  terms) — whole-stage-codegen arithmetic, no UDF, no shuffle
  beyond the partitioned write's own.
- **prune**: bucket b is the top ``prefix_bits`` of z, and a Morton
  prefix decodes to an axis-aligned box in scaled space (top bits
  of the interleave are the interleave of top bits per dim). The
  reader enumerates the n_buckets boxes DRIVER-SIDE (n_buckets
  integers — metadata scale, like the segment manifests), keeps
  those intersecting the scaled query box, and scans with
  ``zbucket IN (...)`` — a PartitionFilter — plus the exact
  original-column predicate as the residual.

Correctness is pruning-independent: the residual predicate is the
declared filter verbatim, so a bucket miscount could only ever
*under-prune* (read more files), never change the answer — and the
never-OVER-prunes direction is what tests/test_zorder.py pins
(box-decode soundness: every row of every kept bucket's file really
lies in the decoded box).
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_zorder_manifest.json"
_FORMAT = 1


def _scaled(col: str, lo: float, hi: float, bits: int) -> Column:
    """Affine map of ``col`` to an integer in [0, 2^bits): exact
    min -> 0, exact max -> 2^bits - 1, constant columns -> 0."""
    top = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (
        (F.col(col).cast("double") - F.lit(float(lo)))
        * F.lit(top / (hi - lo))
    )
    return F.least(
        F.greatest(F.floor(scaled).cast("long"), F.lit(0)),
        F.lit(top),
    )


def zvalue(scaled_cols: list[Column], bits: int) -> Column:
    """Morton-interleave ``scaled_cols`` (each already in
    [0, 2^bits)) into one bigint: bit i of column d lands at
    position i * n_dims + d. Pure arithmetic Column chain."""
    n = len(scaled_cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, c in enumerate(scaled_cols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + d))
    return z


def _decode_prefix(
    bucket: int, prefix_bits: int, n_dims: int, bits: int
) -> list[tuple[int, int]]:
    """The axis-aligned scaled-space box a z-prefix covers.

    The top ``prefix_bits`` of a 2x-interleaved z are the interleave
    of the top bits of each dim, so bucket b fixes the top
    ``hi_d`` bits of dim d (hi_d = how many of b's bits belong to d)
    and leaves the rest free: box = [fixed<<free, (fixed+1)<<free - 1]."""
    out = []
    total = n_dims * bits
    for d in range(n_dims):
        fixed = 0
        n_fixed = 0
        # walk b's bits from the top of z downward
        for j in range(prefix_bits):
            pos = total - 1 - j  # absolute bit position in z
            if pos % n_dims == d:
                fixed = (fixed << 1) | ((bucket >> (prefix_bits - 1 - j)) & 1)
                n_fixed += 1
        free = bits - n_fixed
        out.append((fixed << free, ((fixed + 1) << free) - 1))
    return out


def write_zorder_layout(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_buckets: int = 64,
    bits: int = 16,
) -> dict:
    """Write ``df`` partitioned by the top log2(n_buckets) bits of
    the Morton interleave of ``cols``. One agg for the exact per-col
    min/max (the scale anchors — persisted in a manifest so readers
    decode with the writer's map), then ONE hash shuffle on zbucket
    feeding the partitioned write — no other data movement. Returns
    the manifest."""
    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two: {n_buckets}")
    prefix_bits = int(math.log2(n_buckets))
    if prefix_bits > len(cols) * bits:
        raise ValueError("n_buckets exceeds the z-value's bit budget")
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
    ).head()
    ranges = {c: (stats[f"lo_{c}"], stats[f"hi_{c}"]) for c in cols}
    z = zvalue(
        [_scaled(c, *ranges[c], bits) for c in cols], bits
    )
    zb = F.shiftright(z, len(cols) * bits - prefix_bits)
    # ONE hash shuffle on zbucket before the partitioned write: each
    # bucket's rows land in exactly one task, so each directory holds
    # one file — without it every input task writes a file into every
    # bucket it touches (tasks x buckets small files, and file-level
    # pruning degenerates to task layout)
    (
        df.withColumn("zbucket", zb)
        .repartition(n_buckets, "zbucket")
        .write.mode("overwrite")
        .partitionBy("zbucket")
        .parquet(path)
    )
    manifest = {
        "format": _FORMAT,
        "cols": list(cols),
        "bits": bits,
        "n_buckets": n_buckets,
        "ranges": {c: [ranges[c][0], ranges[c][1]] for c in cols},
    }
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, _MANIFEST))
    return manifest


def _scale_point(v: float, lo: float, hi: float, bits: int) -> int:
    top = (1 << bits) - 1
    if hi <= lo:
        return 0
    return min(max(int((v - lo) * (top / (hi - lo))), 0), top)


def zorder_buckets_for_box(
    manifest: dict, box: dict[str, tuple[float, float]]
) -> list[int]:
    """Driver-side prune: the buckets whose decoded scaled-space box
    intersects the query box. O(n_buckets x n_dims) integer work on
    metadata — never touches data. Dims absent from ``box`` are
    unconstrained."""
    cols = manifest["cols"]
    bits = manifest["bits"]
    n_buckets = manifest["n_buckets"]
    prefix_bits = int(math.log2(n_buckets))
    want = []
    for c in cols:
        if c in box:
            lo, hi = manifest["ranges"][c]
            want.append(
                (
                    _scale_point(box[c][0], lo, hi, bits),
                    _scale_point(box[c][1], lo, hi, bits),
                )
            )
        else:
            want.append((0, (1 << bits) - 1))
    keep = []
    for b in range(n_buckets):
        cell = _decode_prefix(b, prefix_bits, len(cols), bits)
        if all(
            cell[d][0] <= want[d][1] and want[d][0] <= cell[d][1]
            for d in range(len(cols))
        ):
            keep.append(b)
    return keep


def read_zorder_range(
    spark: SparkSession,
    path: str,
    box: dict[str, tuple[float, float]],
) -> DataFrame:
    """Range query over the layout: ``zbucket IN (pruned set)`` —
    carried by the planner as a PartitionFilter, so non-intersecting
    directories are never listed or read — plus the exact residual
    predicate on the original columns (inclusive bounds), so the
    answer never depends on the pruning arithmetic."""
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("format") != _FORMAT:
        raise ValueError(
            f"zorder manifest at {path} has format "
            f"{manifest.get('format')!r}; this build reads {_FORMAT}"
        )
    buckets = zorder_buckets_for_box(manifest, box)
    df = spark.read.parquet(path).filter(F.col("zbucket").isin(buckets))
    for c, (lo, hi) in box.items():
        df = df.filter(F.col(c).between(F.lit(lo), F.lit(hi)))
    return df.drop("zbucket")
