"""SOAK.json persistence: the parity soak's committed, machine-readable
artifact (VERDICT r4 #2).  ``merge_batch`` is pure — these tests pin the
cumulative-totals semantics; ``persist_batch`` round-trips through a file.

The soak itself (tools/parity_soak.py) is a multi-minute harness, not a CI
test; here we only import its artifact functions (safe: the module forces
CPU at import, same as conftest already did).
"""

import json

from tools.parity_soak import merge_batch, persist_batch


def _batch(seed_start, n, counts, diverging=()):
    return {"rev": "abc1234", "utc": "2026-08-20T00:00:00Z",
            "mode": "base", "f64": False,
            "seed_start": seed_start, "n": n, "duration_s": 1.0,
            "counts": counts, "diverging": list(diverging)}


def test_merge_into_empty():
    data = merge_batch({}, _batch(1000, 50, {}))
    assert len(data["batches"]) == 1
    assert data["totals"] == {"seeds_run": 50,
                              "diverging_by_class": {},
                              "unexplained": 0}


def test_merge_accumulates_classes_across_batches():
    d = merge_batch({}, _batch(2000, 60, {"bx-knife-edge": 3,
                                          "f32-gate-boundary": 7}))
    d = merge_batch(d, _batch(3000, 40, {"bx-knife-edge": 1, "real": 2}))
    assert d["totals"]["seeds_run"] == 100
    assert d["totals"]["diverging_by_class"] == {
        "bx-knife-edge": 4, "f32-gate-boundary": 7, "real": 2}
    assert d["totals"]["unexplained"] == 2
    assert [b["seed_start"] for b in d["batches"]] == [2000, 3000]


def test_merge_does_not_mutate_input():
    base = merge_batch({}, _batch(0, 10, {}))
    snapshot = json.dumps(base, sort_keys=True)
    merge_batch(base, _batch(10, 10, {"real": 1}))
    assert json.dumps(base, sort_keys=True) == snapshot


def test_persist_round_trip(tmp_path):
    path = str(tmp_path / "SOAK.json")
    persist_batch(_batch(1000, 5, {"bx-knife-edge": 1}, diverging=[
        {"seed": 1003, "class": "bx-knife-edge",
         "f64_matches_oracle": None, "errors": ["segment count 2 vs 1"]},
    ]), path)
    data = persist_batch(_batch(2000, 5, {}), path)
    on_disk = json.load(open(path))
    assert on_disk == data
    assert on_disk["totals"]["seeds_run"] == 10
    assert on_disk["batches"][0]["diverging"][0]["seed"] == 1003


def test_persist_recovers_from_corrupt_file(tmp_path):
    path = str(tmp_path / "SOAK.json")
    with open(path, "w") as f:
        f.write("{not json")
    data = persist_batch(_batch(0, 3, {}), path)
    assert data["totals"]["seeds_run"] == 3
