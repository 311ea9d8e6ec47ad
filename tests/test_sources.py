"""Loader schema-drift guard.

Round 2 regressed 9/50 driver queries because the events fixture moved
from nanos-as-long to TIMESTAMP(MICROS) and the loader assumed the old
encoding. These tests pin the contract: ``load`` normalizes every
table to the dtypes in ``EXPECTED_SCHEMAS`` and diagnoses drift with a
named error, whatever the fixture stores.
"""

from __future__ import annotations

import datetime

import pytest

from zvdb_spark.sources.tables import EXPECTED_SCHEMAS, TABLES, load


def test_all_tables_load_with_expected_dtypes(spark, sf_dir):
    for name in TABLES:
        df = load(spark, sf_dir, name)
        actual = dict(df.dtypes)
        for col, ok in EXPECTED_SCHEMAS[name].items():
            assert col in actual, f"{name}.{col} missing"
            assert actual[col] in ok, (
                f"{name}.{col}: got {actual[col]}, expected one of {ok}"
            )


def test_events_ts_is_timestamp_in_plausible_range(spark, sf_dir):
    """The round-2 silent failure mode: ts decoded with the wrong epoch
    unit lands everything in January 1970. Pin a plausible range."""
    ev = load(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    row = ev.selectExpr("min(ts) AS lo", "max(ts) AS hi").first()
    assert row.lo is not None
    assert row.lo.year >= 2000, f"events.ts decoded wrong: min={row.lo}"
    assert row.hi.year <= 2100, f"events.ts decoded wrong: max={row.hi}"
    assert isinstance(row.lo, datetime.datetime)


def test_unknown_table_raises(spark, sf_dir):
    with pytest.raises(KeyError):
        load(spark, sf_dir, "nope")


def test_table_row_count_single_file_and_directory(sf_dir, tmp_path):
    """Footer-only row counts must survive the fixture becoming a
    directory-partitioned dataset (what spark.read.parquet — and
    therefore load() — already accepts silently)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from zvdb_spark.sources.tables import table_row_count

    single = table_row_count(sf_dir, "events")
    assert single > 0
    # synthesize a directory-shaped 'events' fixture from two slices
    d = tmp_path / "events.parquet"
    d.mkdir()
    t = pq.read_table(f"{sf_dir}/events.parquet")
    half = len(t) // 2
    pq.write_table(t.slice(0, half), d / "part-0.parquet")
    pq.write_table(t.slice(half), d / "part-1.parquet")
    assert table_row_count(str(tmp_path), "events") == single


def test_csv_roundtrip_distinguishes_null_from_empty(spark, tmp_path):
    """q_source_formats' CSV leg writes nullValue='\\N' +
    emptyValue='\"\"' and reads back with the null marker only: NULL
    and '' must survive DISTINGUISHABLY (default CSV options collapse
    both to null on read, which would break cross-format checksum
    parity the moment a fixture carries an empty string)."""
    df = spark.createDataFrame(
        [(1, "x"), (2, ""), (3, None)], "id int, s string"
    )
    p = str(tmp_path / "csv")
    df.write.mode("overwrite").option("header", "true").option(
        "nullValue", "\\N"
    ).option("emptyValue", '""').csv(p)
    back = (
        spark.read.schema(df.schema)
        .option("header", "true")
        .option("nullValue", "\\N")
        .csv(p)
    )
    assert sorted(
        [(r.id, r.s) for r in back.collect()]
    ) == [(1, "x"), (2, ""), (3, None)]
