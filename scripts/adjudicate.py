"""Solo adjudication of flagged bench queries: measure the named queries
best-of-3 against BENCH_FLOOR.json with the sentinel tenancy anchor from
bench.py, print one line per query with raw and tenancy-normalized ratios.

Run ALONE (shared host). Usage:
    python scripts/adjudicate.py ext_embedding_neardup ext_ann_ivf_topk ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    targets = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not targets:
        raise SystemExit("usage: adjudicate.py <query> [<query> ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import SENTINEL_QUERIES, median_ratio
    from dbt_meshify_spark.queries import QUERIES
    from dbt_meshify_spark.session import get_spark

    with open(os.path.join(_REPO, "BENCH_FLOOR.json")) as fh:
        floors = json.load(fh)["queries"]

    spark = get_spark(app_name="dbt-meshify-spark-adjudicate")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    # warm codegen + Arrow pool (bench.py discipline)
    run("q01_projection_cast")

    sent_times = {n: run(n) for n in SENTINEL_QUERIES}
    # median_ratio returns None when <5 sentinels have usable floors (e.g.
    # a regenerated floor table) — fall back to an unanchored 1.0 like
    # bench.compute_inflation does
    tenancy = median_ratio(sent_times, floors, SENTINEL_QUERIES) or 1.0
    print(f"sentinel tenancy: {tenancy:.3f}", flush=True)

    for name in targets:
        best = min(run(name) for _ in range(3))
        floor = floors.get(name)
        if not floor:
            print(f"{name}: best {best:.2f}s (no floor)", flush=True)
            continue
        raw = best / floor
        norm = raw / max(tenancy, 1.0)
        print(
            f"{name}: best-of-3 {best:.2f}s floor {floor:.2f}s "
            f"raw {raw:.2f}x normalized {norm:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
