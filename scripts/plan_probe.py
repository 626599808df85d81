#!/usr/bin/env python
"""Per-query plan + timing probe for the optimization rounds.

For each named query: write plans/<tag>/<name>_<suffix>.txt with the
.explain("formatted") output, and (unless --no-time) time the noop-sink
write N times in THIS session, printing each sample.  Used to isolate a
query from the bench suite (guide §1.4: noop sink; §1.5: job labels).

    python scripts/plan_probe.py --tag r11 --suffix before q1 q2 ...
    python scripts/plan_probe.py --tag r11 --suffix before --top 30
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="r11")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--no-time", action="store_true")
    ap.add_argument(
        "--top",
        type=int,
        default=0,
        help="add the N slowest queries from bench_full.json",
    )
    args = ap.parse_args()

    from nemscraper_spark.queries import REGISTRY
    from nemscraper_spark.session import get_spark

    names = list(args.names)
    if args.top:
        full = json.loads((_REPO / "bench_full.json").read_text())
        ranked = sorted(full["queries"].items(), key=lambda kv: -kv[1])
        for n, _ in ranked[: args.top]:
            if n not in names:
                names.append(n)

    out_dir = _REPO / "plans" / args.tag
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="plan_probe")
    sc = spark.sparkContext
    results: dict[str, list[float]] = {}
    for name in names:
        spec = REGISTRY[name]
        sc.setJobDescription(f"probe:{name}")
        try:
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf)
            build_s = time.perf_counter() - t0
            plan = df._sc_jdf_explain if False else None
            # formatted explain via the internal API (no stdout capture)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            (out_dir / f"{name}_{args.suffix}.txt").write_text(plan)
            samples = []
            if not args.no_time:
                for _ in range(args.repeats):
                    t0 = time.perf_counter()
                    df = spec.fn(spark, args.sf)
                    df.write.format("noop").mode("overwrite").save()
                    samples.append(round(time.perf_counter() - t0, 3))
            results[name] = samples
            print(
                f"{name}: build={build_s:.2f}s samples={samples}",
                flush=True,
            )
        except Exception as exc:  # keep probing the rest
            print(f"{name}: ERROR {exc}", flush=True)
        finally:
            sc.setJobDescription(None)
    (out_dir / f"probe_{args.suffix}.json").write_text(
        json.dumps(results, indent=1)
    )


if __name__ == "__main__":
    main()
