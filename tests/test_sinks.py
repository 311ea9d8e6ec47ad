from __future__ import annotations

import tempfile

from zvdb_spark.queries.registry import all_queries
from zvdb_spark.sources.sinks import read_result, write_result


def test_parquet_roundtrip(spark, sf_dir):
    df = all_queries()["q_topk_sort"].fn(spark, sf_dir)
    with tempfile.TemporaryDirectory() as tmp:
        write_result(df, f"{tmp}/out", n_files=1)
        back = read_result(spark, f"{tmp}/out")
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_csv_json_roundtrip_rowcount(spark, sf_dir):
    df = all_queries()["q_agg_groupby"].fn(spark, sf_dir)
    n = df.count()
    with tempfile.TemporaryDirectory() as tmp:
        write_result(df, f"{tmp}/c", fmt="csv", n_files=1)
        write_result(df, f"{tmp}/j", fmt="json", n_files=1)
        assert spark.read.format("csv").load(f"{tmp}/c").count() == n
        assert read_result(spark, f"{tmp}/j", fmt="json").count() == n


def test_partitioned_write_prunes(spark, sf_dir):
    df = all_queries()["q_agg_groupby"].fn(spark, sf_dir)
    with tempfile.TemporaryDirectory() as tmp:
        write_result(df, f"{tmp}/p", partition_by=["l_returnflag"])
        back = read_result(spark, f"{tmp}/p")
        one = back.filter(back.l_returnflag == "A")
        # partition pruning: the filter must become a PartitionFilter
        # on the scan (directory-level pruning, no data files read
        # from other partitions)
        from zvdb_spark.plans import explain_str

        plan = explain_str(one, "formatted")
        import re

        m = re.search(r"PartitionFilters: (\[[^\]]*\])", plan)
        assert m and "l_returnflag" in m.group(1), plan[:2000]
