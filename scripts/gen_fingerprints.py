#!/usr/bin/env python
"""Bless the current (algo-version, implementation source, oracle,
helper-closure) fingerprints into QUERY_FINGERPRINTS.json — auditable.

Run this ONLY after the local verify pass (scripts/driver_sim.py) is
green for every query you touched: __spark_entry__._green_names trusts
a historical hash-green CORRECTNESS row only while the query's current
fingerprint equals the blessed one, so blessing unverified edits would
let them coast on stale greens (the q17 round-4 lesson), and NOT
re-blessing after a verified edit just costs one redundant re-check.

Flags (the round-7 verdict's auditability fixes):

--hold N1,N2   Behavior-changed names to EXCLUDE from the blessing:
               their previously-blessed digest is preserved verbatim
               (or stays absent), so they remain invalidated and flow
               through the driver's unchecked tier to re-earn a green
               under the new code.  This is the front-door path for
               shipping a behavior change — the bless must never
               precede the green.
--allow-coast  Waive the coasting guard for the REMAINING changed
               names.  Legitimate only for fingerprint-ALGORITHM
               changes (every digest moves but no query behavior
               did); requires --reason and is written to the log.
--reason TEXT  Free-text audit note, required whenever any blessed
               digest changes.

Every blessing that changes at least one digest appends one JSON line
to PROGRESS.jsonl: {"event": "fingerprint_bless", "algo_version",
"changed", "held", "allow_coast", "reason"} — so an auditor can
mechanically distinguish algorithm re-blessings from behavior ones and
see exactly which names were held for driver re-earn.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def compute_blessing(old, current, held, last_green, recheck_first):
    """Pure blessing arithmetic (unit-tested in test_driver_order.py):
    -> (out_digests, changed, removed, would_coast).

    * held names keep their previously-blessed digest verbatim (or
      stay absent) so they remain fingerprint-invalidated and re-earn
      a driver row under the new code;
    * would_coast = names whose blessed digest would move while they
      hold a hash-green driver row and are not queued for a forced
      recheck — blessing those lets old rows vouch for new code (the
      q17 round-4 lesson), so the caller must refuse without an
      explicit, logged --allow-coast."""
    out = dict(current)
    for name in held:
        if name in old:
            out[name] = old[name]
        else:
            out.pop(name, None)
    changed = sorted(n for n in out if old.get(n) != out[n])
    removed = sorted(n for n in old if n not in out)
    would_coast = sorted(
        n for n in changed if n in last_green and n not in recheck_first
    )
    return out, changed, removed, would_coast


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--hold",
        default="",
        help="comma-separated names kept UNblessed (old digest "
        "preserved) so they re-earn a driver row",
    )
    ap.add_argument("--allow-coast", action="store_true")
    ap.add_argument("--reason", default="")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from nemscraper_spark.queries import REGISTRY

    held = [n for n in args.hold.split(",") if n]
    unknown = sorted(set(held) - set(REGISTRY))
    if unknown:
        raise SystemExit(f"--hold names not in REGISTRY: {', '.join(unknown)}")

    old = entry._blessed_fingerprints()
    current = {name: entry._fingerprint(name) for name in REGISTRY}
    new, changed, removed, would_coast = compute_blessing(
        old,
        current,
        held,
        entry._last_green_round(),
        entry._RECHECK_FIRST,
    )
    if would_coast and not args.allow_coast:
        print(
            "REFUSING to bless: these edited queries hold hash-green "
            "rows but are not in _RECHECK_FIRST — they would coast on "
            "stale greens:\n  " + ", ".join(would_coast) + "\n"
            "Either --hold them (they re-earn a driver row under the "
            "new code — the behavior-change path), add them to "
            "__spark_entry__._RECHECK_FIRST after local verification, "
            "or re-run with --allow-coast --reason '...' (algorithm "
            "re-blessings only)."
        )
        raise SystemExit(1)
    if (changed or removed) and not args.reason:
        raise SystemExit(
            "REFUSING to bless: digests changed but no --reason given "
            "(the blessing log in PROGRESS.jsonl requires one)."
        )

    out = Path(_REPO) / "QUERY_FINGERPRINTS.json"
    out.write_text(json.dumps(new, indent=0, sort_keys=True) + "\n")
    print(f"blessed {len(new)} fingerprints -> {out}")
    if held:
        print(f"held unblessed ({len(held)}): {', '.join(held)}")
    if changed:
        print(f"changed/new ({len(changed)}): {', '.join(changed)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    if changed or removed:
        record = {
            "ts": time.time(),
            "event": "fingerprint_bless",
            "algo_version": entry._FP_ALGO_VERSION,
            "changed": changed,
            "removed": removed,
            "held": sorted(held),
            "allow_coast": bool(args.allow_coast),
            "reason": args.reason,
        }
        with open(Path(_REPO) / "PROGRESS.jsonl", "a") as fh:
            fh.write(json.dumps(record) + "\n")
        print("blessing logged to PROGRESS.jsonl")


if __name__ == "__main__":
    main()
