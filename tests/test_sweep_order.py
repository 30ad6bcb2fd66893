"""Driver-sweep rotation policy (__spark_entry__._driver_sweep_order).

The driver oracles a PREFIX of queries() each round, so ordering IS the
evidence policy: never-driver-verified queries must come first, then
ascending by the round of their most recent green CORRECTNESS row.
Within a tier: VERDICT-named priority queries, then measured-cheapest
first (committed sweep-ledger times — maximizes rows under a time-capped
sweep), then registration order.  These tests pin that contract without
Spark (pure dict/JSON logic).
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def entry():
    spec = importlib.util.spec_from_file_location(
        "entry_under_test", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _green_by_round(entry):
    import glob
    import re

    last = {}
    for path in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        for name, row in json.load(open(path)).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
                and row.get("err") in (None, "")
            ):
                last[name] = max(last.get(name, -1), rnd)
    return last


def test_registry_is_complete_and_unique(entry):
    q = entry.queries()
    assert len(q) >= 179  # never shrink the registered surface
    o = entry.oracle_sql()
    missing = [n for n in q if n not in o]
    assert missing == [], f"queries without a DuckDB oracle: {missing}"


def test_never_verified_sort_first(entry):
    names = list(entry.queries())
    last = _green_by_round(entry)
    tiers = [last.get(n, -1) for n in names]
    # tiers must be non-decreasing: never-verified (-1) first, then by
    # most-recent green round ascending
    assert tiers == sorted(tiers), (
        "sweep order violates rotation policy: a driver-verified query "
        "precedes a never-verified one"
    )


def test_order_is_deterministic_and_memoized(entry):
    a = list(entry.queries())
    b = list(entry.queries())
    assert a == b
    # memo primed by the calls above
    assert entry._LAST_GREEN_ROUND is not None


def test_cheap_first_within_tier(entry):
    """Inside each rotation tier, non-priority queries sort by measured
    sweep time ascending (registration order breaks exact-time ties)."""
    names = list(entry.queries())
    last = _green_by_round(entry)
    times = entry._sweep_times()
    assert len(times) >= 170  # ledger parsed
    prev = None
    for n in names:
        key = (
            last.get(n, -1),
            0 if n in entry._SWEEP_PRIORITY else 1,
            times.get(n, 1.0),
        )
        if prev is not None:
            assert key >= prev, f"sweep order not cheap-first at {n}"
        prev = key


def test_priority_block_leads_never_green_tier(entry):
    """Never-driver-verified VERDICT-named queries come before every other
    never-verified query, regardless of cost (pq_topk is ~13s but named)."""
    names = list(entry.queries())
    last = _green_by_round(entry)
    never = [n for n in names if last.get(n, -1) == -1]
    prio = [n for n in never if n in entry._SWEEP_PRIORITY]
    if prio:  # artifacts may eventually verify them all
        cutoff = max(never.index(n) for n in prio)
        assert all(n in entry._SWEEP_PRIORITY for n in never[: cutoff + 1])


def test_sweep_order_handles_malformed_artifacts(entry, tmp_path, monkeypatch):
    # a fresh module instance (separate memo) pointed at a dir with one
    # valid and one malformed artifact: malformed is skipped, not fatal
    spec = importlib.util.spec_from_file_location(
        "entry_malformed", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    good = {
        "b": {"rows_match": True, "schema_match": True, "hash_match": True,
              "err": None},
        "c": {"rows_match": True, "schema_match": False, "hash_match": False,
              "err": None},
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(good))
    (tmp_path / "CORRECTNESS_r02.json").write_text("{not json")
    monkeypatch.setattr(
        mod.os.path, "dirname", lambda p: str(tmp_path), raising=True
    )
    mod._LAST_GREEN_ROUND = None
    out = list(mod._driver_sweep_order({"a": 1, "b": 2, "c": 3}))
    # b is green in r01 -> rotates to the back; a and c (never fully
    # verified) keep literal order up front
    assert out == ["a", "c", "b"]


def test_memo_invalidates_when_new_artifact_lands(tmp_path, monkeypatch):
    """ADVICE r4: a driver that writes a new CORRECTNESS artifact and calls
    queries() again in the SAME process must see a fresh sweep order — the
    memo is keyed on the artifact (path, mtime, size) fingerprint."""
    spec = importlib.util.spec_from_file_location(
        "entry_memo_fresh", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(
        mod.os.path, "dirname", lambda p: str(tmp_path), raising=True
    )
    reg = {"a": 1, "b": 2}
    assert list(mod._driver_sweep_order(reg)) == ["a", "b"]
    # a new artifact greens 'a' -> it must rotate behind 'b' immediately
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"a": {"rows_match": True, "schema_match": True,
                          "hash_match": True, "err": None}})
    )
    assert list(mod._driver_sweep_order(reg)) == ["b", "a"]
