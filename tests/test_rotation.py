"""The registry self-rotation contract (__spark_entry__.queries):
red-first, never-sampled second, green last; LATEST round's verdict
wins per key; round files ordered NUMERICALLY (r100 after r99)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
RED = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
ERR = {"rows_match": False, "schema_match": False, "hash_match": False,
       "err": "boom"}


def test_rotation_groups_red_fresh_green():
    base = ["a", "b", "c", "d", "e"]
    rounds = [{"a": GREEN, "b": RED, "d": ERR}]
    # b and d red-first (stable), c/e never sampled, a green last
    assert entrymod._rotation_order(base, rounds) == ["b", "d", "c", "e", "a"]


def test_rotation_latest_round_wins():
    base = ["a", "b"]
    rounds = [{"a": RED, "b": GREEN}, {"a": GREEN, "b": RED}]
    assert entrymod._rotation_order(base, rounds) == ["b", "a"]


def test_rotation_no_records_is_identity():
    base = ["x", "y", "z"]
    assert entrymod._rotation_order(base, []) == base


def test_round_files_sorted_numerically(tmp_path):
    """r9 must be read BEFORE r10/r100 so the later verdict wins —
    plain lexicographic sort breaks at the 2->3 digit boundary."""
    for rnd, verdict in ((9, RED), (10, GREEN), (100, GREEN)):
        with open(tmp_path / f"CORRECTNESS_r{rnd:02d}.json", "w") as fh:
            json.dump({"q": verdict}, fh)
    records = entrymod._load_round_records(str(tmp_path))
    assert [r["q"]["hash_match"] for r in records] == [False, True, True]
    # end-to-end: the r100 green must clear the r9 red
    assert entrymod._rotation_order(["q", "p"], records) == ["p", "q"]


def test_load_round_records_skips_malformed(tmp_path):
    with open(tmp_path / "CORRECTNESS_r01.json", "w") as fh:
        fh.write("{not json")
    with open(tmp_path / "CORRECTNESS_r02.json", "w") as fh:
        json.dump({"q": GREEN}, fh)
    records = entrymod._load_round_records(str(tmp_path))
    assert len(records) == 1 and records[0]["q"] == GREEN


def test_live_registry_rotation_is_pure_reorder():
    from gnip_trend_detection_spark import queries as q

    rotated = entrymod.queries()
    assert set(rotated) == set(q.ALL)
    assert all(rotated[k] is q.ALL[k] for k in rotated)
