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
* CORRECTNESS_FULL.json        — covers every queries() entry, 0 bad
* CORRECTNESS_FULL_SF01.json   — same, at sf0.1
* BENCH_MEDIAN.json            — n_queries == len(queries()) and
                                 calibration_ref_s == bench.py's pin
* BENCH_DETAIL.json            — n_queries == len(queries())

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


def fail(msg: str) -> None:
    raise SystemExit(f"check_records: FAIL — {msg}")


def check_correctness(path: str, n_contract: int) -> None:
    name = os.path.basename(path)
    if not os.path.exists(path):
        fail(f"{name} missing")
    with open(path) as fh:
        rec = json.load(fh)
    n = len(rec.get("results", {}))
    if n != n_contract:
        fail(f"{name} covers {n} queries, contract has {n_contract}")
    if rec.get("bad"):
        fail(f"{name} has failures: {sorted(rec['bad'])}")
    if "drift_factor" not in rec.get("calibration", {}):
        fail(f"{name} lacks a calibration stamp (probe not recorded)")


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
    print(f"check_records: OK (contract={n_contract})")


if __name__ == "__main__":
    main()
