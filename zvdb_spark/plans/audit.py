"""Physical-plan audit helpers.

The reference has no optimizer to inspect; here the optimizer IS the
engine's performance story, so the plan is a first-class artifact.
These helpers extract the facts that matter at 100 TB from
``explain("formatted")`` output: did filters reach the parquet scan,
did the dimension join broadcast, how many shuffles, how wide are the
whole-stage-codegen spans.

Used by tests/test_plan_quality.py to regression-pin plan shapes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def plan_audit(df: DataFrame) -> dict:
    """Summarize scale-relevant plan facts."""
    plan = explain_str(df, "formatted")
    simple = explain_str(df, "simple")
    return {
        "n_exchanges": len(re.findall(r"\bExchange\b", simple)),
        "n_broadcast_joins": len(re.findall(r"BroadcastHashJoin", simple)),
        "n_sortmerge_joins": len(re.findall(r"SortMergeJoin", simple)),
        "n_codegen_spans": len(re.findall(r"\*\(\d+\)", simple)),
        "has_pushed_filters": bool(
            re.search(r"PushedFilters: \[[^\]]+\]", plan)
        ),
        "pushed_filters": re.findall(r"PushedFilters: (\[[^\]]*\])", plan),
        "read_schemas": re.findall(r"ReadSchema: ([^\n]+)", plan),
        "has_take_ordered": "TakeOrderedAndProject" in simple,
        "plan": plan,
    }
