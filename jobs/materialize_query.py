"""CLI: materialize any registry query to disk, idempotently.

    python jobs/materialize_query.py --query vocab_top20 \
        --sf-dir /root/testdata/sf0.01 --out /tmp/views/vocab_top20

Reruns skip instantly when the target's _SUCCESS exists (the nightly
materialized-view loop); --format picks parquet (default), jsonl or csv.
Owns its Ray session (guarded — the driver contract forbids library-level
ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--query", required=True)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", required=True)
    p.add_argument("--format", default="parquet",
                   choices=("parquet", "jsonl", "csv"))
    p.add_argument("--num-cpus", type=int, default=8)
    args = p.parse_args()

    import ray

    owned = not ray.is_initialized()
    if owned:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)
    try:
        from wavelet_decomposition_ray.pipelines.materialize import (
            materialize_query,
        )

        meta = materialize_query(args.query, args.sf_dir, args.out,
                                 fmt=args.format)
        print(json.dumps(meta))
    finally:
        if owned:
            ray.shutdown()


if __name__ == "__main__":
    main()
