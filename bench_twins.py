#!/usr/bin/env python
"""Skew-twin overhead bench: every registry builder that supports
``skew_robust`` is timed default vs twin at the same SF — the price
sheet for the bounded-partition insurance (crossover behavior under
actual hot keys is bench_skew.py's job; this records the uniform-data
premium per operator so regressions in either plan are decidable).

Prints one JSON line:
  {"metric": "twin_overhead", "sf": 0.1,
   "queries": {name: {"default_s": s, "robust_s": s, "premium": r}}}
"""

from __future__ import annotations

import inspect
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from msstreamingstack_spark.queries import REGISTRY  # noqa: E402
from msstreamingstack_spark.session import get_spark  # noqa: E402

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    repeat = int(os.environ.get("BENCH_REPEAT", "3"))
    spark = get_spark(app_name="msstreamingstack-twins")
    spark.sparkContext.setLogLevel("ERROR")

    twins = {
        name: spec.builder
        for name, spec in REGISTRY.items()
        if "skew_robust" in inspect.signature(spec.builder).parameters
    }
    # operator-level twins not registered as separate queries ride the
    # same harness through their registry hosts; exact_dedup and
    # bigram_lm_scores are reached via dedup_exact / quality_bigram_lm
    # only by flag, so measure them directly
    from msstreamingstack_spark.operators.dedup import exact_dedup
    from msstreamingstack_spark.queries_extensions import bigram_lm_scores
    from msstreamingstack_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    twins["_op_exact_dedup"] = lambda s, d, skew_robust=False: exact_dedup(
        docs, skew_robust=skew_robust
    )
    twins["_op_bigram_lm"] = lambda s, d, skew_robust=False: bigram_lm_scores(
        docs, skew_robust=skew_robust
    )

    # warm
    next(iter(twins.values()))(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def timed(fn, robust: bool) -> float:
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            fn(spark, sf_dir, skew_robust=robust).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return round(best, 3)

    out = {}
    for name, fn in sorted(twins.items()):
        d = timed(fn, False)
        r = timed(fn, True)
        out[name] = {
            "default_s": d,
            "robust_s": r,
            "premium": round(r / d, 2) if d else None,
        }
        print(f"# {name}: default {d}s robust {r}s", file=sys.stderr)

    m = re.search(r"sf([0-9.]+)", sf_dir)
    print(
        json.dumps(
            {
                "metric": "twin_overhead",
                "sf": float(m.group(1)) if m else -1.0,
                "queries": out,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
