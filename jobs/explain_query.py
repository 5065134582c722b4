"""CLI: run a registry query and print Ray Data's per-stage statistics.

    python jobs/explain_query.py --query dedup_minhash \
        --sf-dir /root/testdata/sf0.01

Prints the result's row count and `Dataset.stats()` — per-operator wall
time, block counts and memory — the first thing to read when a pipeline
is slower than it should be (is one stage serializing? did fusion break?
is the shuffle dominated by tiny blocks?).  Driver-side (pandas) results
have no distributed plan; the CLI says so instead of faking one.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--query", required=True)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--num-cpus", type=int, default=8)
    args = p.parse_args()

    import ray

    owned = not ray.is_initialized()
    if owned:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        from wavelet_decomposition_ray.pipelines.data_queries import (
            DATA_QUERIES,
        )
        from wavelet_decomposition_ray.pipelines.queries import CORE_QUERIES

        registry = {**CORE_QUERIES, **DATA_QUERIES}
        if args.query not in registry:
            sys.exit(f"unknown query {args.query!r}; see QUERIES.md")
        t0 = time.perf_counter()
        res = registry[args.query][0](args.sf_dir)
        if hasattr(res, "stats"):
            mat = res.materialize()
            wall = time.perf_counter() - t0
            print(f"rows: {mat.count()}   wall: {wall:.2f}s")
            print(mat.stats())
        else:
            wall = time.perf_counter() - t0
            print(f"rows: {len(res)}   wall: {wall:.2f}s")
            print("(driver-side result — the distributed stages already "
                  "ran inside the query; no Dataset plan to show)")
    finally:
        if owned:
            ray.shutdown()


if __name__ == "__main__":
    main()
