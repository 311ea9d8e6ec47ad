"""Z-order layout (operators/zorder.py) invariants: box-decode
soundness (every row of a bucket's files lies inside the bucket's
decoded box — the direction that makes pruning safe), measured 2-D
file pruning vs both a full scan and a 1-D layout on the same query,
exact answer parity with a plain filter and with the DuckDB twin of
the declared query, and the manifest/validation guards."""

from __future__ import annotations

import json
import math
import os

import pytest
from pyspark.sql import functions as F

from zvdb_spark.operators.zorder import (
    _decode_prefix,
    _scale_point,
    read_zorder_range,
    write_zorder_layout,
    zorder_buckets_for_box,
)
from zvdb_spark.queries.export import ZORDER_BOX, ZORDER_ORACLE
from zvdb_spark.sources.tables import load

COLS = ["user_id", "value"]
N_BUCKETS = 64


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type"
    )


@pytest.fixture(scope="module")
def layout(spark, events, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zorder") / "events_z")
    manifest = write_zorder_layout(
        events, path, cols=COLS, n_buckets=N_BUCKETS
    )
    return path, manifest


def _files_read(df):
    return set(
        r[0]
        for r in df.select(F.input_file_name()).distinct().collect()
    )


def _scanned_files(spark, path, box):
    """Files the pruned scan OPENS: bucket filter only, no residual —
    post-residual input_file_name would count only files containing
    matching rows and under-report what was read."""
    with open(os.path.join(path, "_zorder_manifest.json")) as f:
        manifest = json.load(f)
    kept = zorder_buckets_for_box(manifest, box)
    return _files_read(
        spark.read.parquet(path).filter(F.col("zbucket").isin(kept))
    )


def test_manifest_roundtrip(layout):
    path, manifest = layout
    with open(os.path.join(path, "_zorder_manifest.json")) as f:
        on_disk = json.load(f)
    assert on_disk == manifest
    assert on_disk["cols"] == COLS and on_disk["n_buckets"] == N_BUCKETS


def test_box_decode_soundness(spark, layout):
    """Every row REALLY lies inside its bucket's decoded box: scale
    each row's columns with the manifest anchors and assert they sit
    within the [lo, hi] the prefix decode claims for that bucket.
    This is the direction pruning depends on — a row outside its
    decoded box could be wrongly pruned."""
    path, manifest = layout
    bits = manifest["bits"]
    prefix_bits = int(math.log2(manifest["n_buckets"]))
    rows = spark.read.parquet(path).select("zbucket", *COLS).collect()
    assert rows
    seen_buckets = set()
    for r in rows:
        b = int(r.zbucket)
        seen_buckets.add(b)
        cell = _decode_prefix(b, prefix_bits, len(COLS), bits)
        for d, c in enumerate(COLS):
            lo, hi = manifest["ranges"][c]
            s = _scale_point(float(r[c]), lo, hi, bits)
            assert cell[d][0] <= s <= cell[d][1], (b, c, s, cell[d])
    assert len(seen_buckets) > 1  # the interleave actually spread rows


def test_range_query_parity_and_pruning(spark, events, layout):
    """The 2-D range query returns exactly the plain-filter answer
    while reading a strict subset of the layout's files."""
    path, manifest = layout
    got = read_zorder_range(spark, path, ZORDER_BOX)
    want = events.filter(
        F.col("user_id").between(*ZORDER_BOX["user_id"])
        & F.col("value").between(*ZORDER_BOX["value"])
    )
    g = sorted(tuple(r) for r in got.select(*want.columns).collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w and len(g) > 0
    all_files = _files_read(spark.read.parquet(path))
    hit_files = _scanned_files(spark, path, ZORDER_BOX)
    assert hit_files < all_files, (len(hit_files), len(all_files))
    # the pre-write zbucket shuffle holds: one file per bucket dir
    assert len(all_files) <= N_BUCKETS
    # and the driver-side prune actually cut buckets, not just files
    kept = zorder_buckets_for_box(manifest, ZORDER_BOX)
    assert 0 < len(kept) < N_BUCKETS


def test_beats_one_d_layout_on_two_d_query(spark, tmp_path):
    """Against a 1-D layout (same bucket count, first column only)
    the z-order layout reads FEWER files for a box selective on BOTH
    dims — the claim the layout exists for. The corpus makes both
    dims genuinely selective (uniform 0..999, box = 10% per dim):
    z-ordering SPLITS the bucket bit budget across dims (3+3 bits
    here vs the 1-D layout's 6), so it wins exactly when the
    product of selectivities beats the resolution it gave up — the
    same trade the module docstring declares. (On the sf0.001 events
    fixture the declared box covers 53% of the 15-user domain and
    the 1-D layout wins — which is correct behavior, not a bug.)"""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    pdf = pd.DataFrame(
        {
            "a": rng.integers(0, 1000, 10_000),
            "b": rng.integers(0, 1000, 10_000),  # independent of a
            "x": list(range(10_000)),
        }
    )
    df = spark.createDataFrame(pdf, schema="a long, b long, x long")
    zpath = str(tmp_path / "two_d")
    opath = str(tmp_path / "one_d")
    write_zorder_layout(df, zpath, cols=["a", "b"], n_buckets=N_BUCKETS)
    write_zorder_layout(df, opath, cols=["a"], n_buckets=N_BUCKETS)
    box = {"a": (100, 199), "b": (100, 199)}
    z_files = _scanned_files(spark, zpath, box)
    o_files = _scanned_files(spark, opath, box)
    assert len(z_files) < len(o_files), (len(z_files), len(o_files))
    # both layouts still answer identically
    a = sorted(
        r.x for r in read_zorder_range(spark, zpath, box).collect()
    )
    b = sorted(
        r.x for r in read_zorder_range(spark, opath, box).collect()
    )
    assert a == b and len(a) > 0


def test_unconstrained_dim_and_constant_col(spark, tmp_path):
    """A dim absent from the box is unconstrained (full range kept);
    a constant column scales to 0 everywhere and stays correct."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"a": list(range(100)), "c": [7] * 100, "x": list(range(100))}
    )
    df = spark.createDataFrame(pdf, schema="a long, c long, x long")
    path = str(tmp_path / "const_z")
    write_zorder_layout(df, path, cols=["a", "c"], n_buckets=16)
    got = read_zorder_range(spark, path, {"a": (10, 19)})
    assert sorted(r.x for r in got.collect()) == list(range(10, 20))
    # constraining the constant col to its value keeps everything...
    got2 = read_zorder_range(spark, path, {"a": (10, 19), "c": (7, 7)})
    assert sorted(r.x for r in got2.collect()) == list(range(10, 20))
    # ...and a disjoint box on it is empty
    got3 = read_zorder_range(spark, path, {"c": (8, 9)})
    assert got3.count() == 0


def test_validation_guards(spark, events, tmp_path, layout):
    path, _ = layout
    with pytest.raises(ValueError, match="power of two"):
        write_zorder_layout(
            events, str(tmp_path / "bad"), cols=COLS, n_buckets=48
        )
    with pytest.raises(ValueError, match="bit budget"):
        write_zorder_layout(
            events, str(tmp_path / "bad2"), cols=["user_id"],
            n_buckets=4, bits=1,
        )
    # format-version guard on read
    mpath = os.path.join(path, "_zorder_manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    try:
        m2 = dict(m, format=99)
        with open(mpath, "w") as f:
            json.dump(m2, f)
        with pytest.raises(ValueError, match="format"):
            read_zorder_range(spark, path, ZORDER_BOX)
    finally:
        with open(mpath, "w") as f:
            json.dump(m, f)


def test_declared_query_duckdb_parity(spark, sf_dir):
    """q_layout_zorder vs the DuckDB twin on the same parquet —
    rows, values, and ordering."""
    import duckdb

    from zvdb_spark.queries.export import q_layout_zorder

    got = [tuple(r) for r in q_layout_zorder(spark, sf_dir).collect()]
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = [tuple(r) for r in con.sql(ZORDER_ORACLE).fetchall()]
    assert len(got) == len(want) and len(got) > 0
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1] and g[2] == w[2]
        assert abs(g[3] - w[3]) < 1e-6
