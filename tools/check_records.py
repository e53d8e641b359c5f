"""Round-close record consistency gate (round-9 verdict task #7).

Round 9 shipped two stale evidence files: a 162-query
CORRECTNESS_FULL_SF01.json (5 queries short of the contract) and a
BENCH_MEDIAN.json carrying the retired standalone calibration ref
(1.373 vs the pinned 0.9301 → its value_calibrated over-corrected by
~45%).  Both were regeneration-discipline slips, not code bugs — so
the discipline is now structural: this check FAILS the round close
whenever a committed record disagrees with the live contract or the
live calibration pin.

Checks (full mode):
* CORRECTNESS_FULL.json        — n_ok == every queries() entry, 0 bad,
                                 0 timeouts, 0 exclusions
* CORRECTNESS_FULL_SF01.json   — same, at sf0.1
* heaps decade records         — n_ok >= the recorded high-water mark
                                 (a decade record can only grow; the
                                 round-9 SF01 staleness class applies
                                 to them too), 0 bad, 0 timeouts,
                                 exclusions limited to the pinned
                                 allow-list, calibration stamped
* BENCH_MEDIAN.json            — n_queries == len(queries()) and
                                 calibration_ref_s == bench.py's pin
* BENCH_DETAIL.json            — n_queries == len(queries())

Coverage counts use ``ok`` (verified-green queries), NOT
``len(results)`` — a record where queries timed out or were excluded
must not pass the coverage gate on raw result-row count (round-10
ADVICE #1).

Usage: python tools/check_records.py [--fast]
``--fast`` checks only CORRECTNESS_FULL.json (matches
close_round.sh --fast, which regenerates only that record).
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Decade-record coverage floor: verified-green (ok) query counts may
#: only grow round over round.  Raise a pin when a sweep extends a
#: record; a shrink (stale record committed from an older tree, or a
#: query silently dropped from a sweep) fails the close.
HEAPS_HIGH_WATER = {
    "CORRECTNESS_FULL_TESTDATA_HEAPS1.json": 167,
    # 43 -> 56 (round 12): the restructured-operator set re-verified /
    # newly certified at the 100x decade (OPTIMIZATION_r12.md)
    "CORRECTNESS_FULL_TESTDATA_HEAPS2.json": 56,
}
#: Exclusions a decade record may carry (each documented in the scale
#: audit with its reason).  Anything else fails the close.
HEAPS_ALLOWED_EXCLUDED = {
    "CORRECTNESS_FULL_TESTDATA_HEAPS2.json": {"knn_join"},
}


def fail(msg: str) -> None:
    raise SystemExit(f"check_records: FAIL — {msg}")


def _load(path: str) -> dict:
    name = os.path.basename(path)
    if not os.path.exists(path):
        fail(f"{name} missing")
    with open(path) as fh:
        return json.load(fh)


def _common_gates(name: str, rec: dict) -> None:
    if rec.get("bad"):
        fail(f"{name} has failures: {sorted(rec['bad'])}")
    if rec.get("timeouts"):
        fail(f"{name} has timeouts (unverified queries): {rec['timeouts']}")
    if "drift_factor" not in rec.get("calibration", {}):
        fail(f"{name} lacks a calibration stamp (probe not recorded)")


def check_correctness(path: str, n_contract: int) -> None:
    name = os.path.basename(path)
    rec = _load(path)
    n_ok = rec.get("ok", 0)
    if n_ok != n_contract:
        fail(f"{name} has {n_ok} verified-ok queries, contract has"
             f" {n_contract}")
    if rec.get("excluded"):
        fail(f"{name} excludes {rec['excluded']} — full records may not"
             f" exclude")
    _common_gates(name, rec)


def check_heaps(path: str) -> int:
    name = os.path.basename(path)
    rec = _load(path)
    n_ok = rec.get("ok", 0)
    floor = HEAPS_HIGH_WATER[name]
    if n_ok < floor:
        fail(f"{name} has {n_ok} verified-ok queries, below its"
             f" high-water mark {floor} (stale or shrunken record)")
    extra = set(rec.get("excluded", [])) - HEAPS_ALLOWED_EXCLUDED.get(
        name, set()
    )
    if extra:
        fail(f"{name} carries unapproved exclusions: {sorted(extra)}")
    _common_gates(name, rec)
    return n_ok


def main() -> None:
    fast = "--fast" in sys.argv[1:]

    import __spark_entry__ as contract

    n_contract = len(contract.queries())

    check_correctness(os.path.join(REPO, "CORRECTNESS_FULL.json"), n_contract)
    if fast:
        print(f"check_records: OK (fast; contract={n_contract})")
        return
    check_correctness(
        os.path.join(REPO, "CORRECTNESS_FULL_SF01.json"), n_contract
    )
    heaps_ok = {
        name: check_heaps(os.path.join(REPO, name))
        for name in sorted(HEAPS_HIGH_WATER)
    }

    import bench

    for name in ("BENCH_MEDIAN.json", "BENCH_DETAIL.json"):
        path = os.path.join(REPO, name)
        if not os.path.exists(path):
            fail(f"{name} missing")
        with open(path) as fh:
            rec = json.load(fh)
        if rec.get("n_queries") != n_contract:
            fail(
                f"{name} n_queries={rec.get('n_queries')},"
                f" contract has {n_contract}"
            )
        ref = rec.get("calibration_ref_s")
        if ref is not None and ref != bench.CALIBRATION_REF_S:
            fail(
                f"{name} calibration_ref_s={ref},"
                f" bench.py pins {bench.CALIBRATION_REF_S}"
            )
    heaps_s = ", ".join(f"{k.split('_')[-1].split('.')[0]}={v}"
                        for k, v in heaps_ok.items())
    print(f"check_records: OK (contract={n_contract}; heaps {heaps_s})")


if __name__ == "__main__":
    main()
