#!/usr/bin/env python
"""Bless the current (implementation source, oracle) fingerprints into
QUERY_FINGERPRINTS.json.

Run this ONLY after the local verify pass (scripts/driver_sim.py) is
green for every query you touched: __spark_entry__._green_names trusts
a historical hash-green CORRECTNESS row only while the query's current
fingerprint equals the blessed one, so blessing unverified edits would
let them coast on stale greens (the q17 round-4 lesson), and NOT
re-blessing after a verified edit just costs one redundant re-check.

Prints the names whose fingerprint changed since the last blessing.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    import __spark_entry__ as entry
    from nemscraper_spark.queries import REGISTRY

    old = entry._blessed_fingerprints()
    new = {name: entry._fingerprint(name) for name in REGISTRY}
    changed = sorted(
        n for n in new if old.get(n) != new[n]
    )
    removed = sorted(n for n in old if n not in new)

    # COASTING GUARD: blessing a changed fingerprint for a name that
    # holds a hash-green driver row makes _green_names() trust the OLD
    # row for NEW code (the q17 round-4 lesson).  Such names must be
    # pushed through _RECHECK_FIRST so they re-earn a driver row — if
    # they aren't, refuse unless --allow-coast is passed explicitly.
    last_green = entry._last_green_round()
    would_coast = sorted(
        n
        for n in changed
        if n in last_green and n not in entry._RECHECK_FIRST
    )
    if would_coast and "--allow-coast" not in sys.argv:
        print(
            "REFUSING to bless: these edited queries hold hash-green "
            "rows but are not in _RECHECK_FIRST — they would coast on "
            "stale greens:\n  " + ", ".join(would_coast) + "\n"
            "Add them to __spark_entry__._RECHECK_FIRST (after local "
            "verification) or re-run with --allow-coast."
        )
        raise SystemExit(1)

    out = Path(_REPO) / "QUERY_FINGERPRINTS.json"
    out.write_text(json.dumps(new, indent=0, sort_keys=True) + "\n")
    print(f"blessed {len(new)} fingerprints -> {out}")
    if changed:
        print(f"changed/new ({len(changed)}): {', '.join(changed)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")


if __name__ == "__main__":
    main()
