"""Mechanized bench-claim discipline (scripts/claims.py): README /
SCALING performance ranges are DERIVED from recorded bench windows,
never hand-maintained — three consecutive rounds a hand-edited range
went stale (r7 lossless, r9 cap64, r10 graph), so this suite makes
drift a test failure."""

from __future__ import annotations

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _claims():
    spec = importlib.util.spec_from_file_location(
        "claims", os.path.join(ROOT, "scripts", "claims.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_no_marker_is_stale():
    """Every <!--claim:KEY:FMT--> marker in README/SCALING/CLAIMS.md
    matches the value recomputed from the recorded windows (committed
    history + live bench_out.json). A refreshed bench sample that
    moves a range fails here until `scripts/claims.py fix` reruns."""
    assert _claims().check() == 0


def test_every_mechanized_range_spans_its_windows():
    """The computed range actually spans every recorded window — the
    r10 failure mode (a published tail outside the quoted range) is
    impossible by construction, asserted anyway."""
    c = _claims()
    r = c.ranges()
    for row in c.all_windows():
        for k, v in row["values"].items():
            assert r[k]["min"] <= v <= r[k]["max"], (k, row["source"])


def test_prose_files_carry_markers_for_volatile_claims():
    """The claim keys that went stale historically are quoted through
    markers somewhere in the prose (removing the marker would
    silently re-manualize the number)."""
    text = ""
    for p in ("README.md", "SCALING.md"):
        with open(os.path.join(ROOT, p)) as f:
            text += f.read()
    for key in (
        "graph_1m_qps_ratio_vs_exact",
        "ivfpq_1m_cap64_qps_ratio_vs_exact",
        "ivfpq_1m_lossless_qps_ratio_vs_exact",
        "census_overhead_pct",
        "persisted_vs_memory_ratio",
        "salted_over_plain",
    ):
        assert f"<!--claim:{key}:" in text, key


def test_history_records_the_lost_to_exact_window():
    """The README's 'cap64 has both beaten and LOST to exact' hedge
    stays provable: a sub-1.0 cap64 window is on record."""
    c = _claims()
    vals = [
        row["values"].get("ivfpq_1m_cap64_qps_ratio_vs_exact")
        for row in c.load_history()
    ]
    vals = [v for v in vals if v is not None]
    assert min(vals) < 1.0 < max(vals)
