"""Flagship rollup + retention job driver.

Usable directly or via ray job submit (SURVEY.md §7.1.8):

    python jobs/run_rollup.py --input /tmp/graft_synth/sf0.1/sequences \
        --out /tmp/rollup_out --bank haar --tiers 10 --buckets 16
    ray job submit --working-dir . -- python jobs/run_rollup.py ...

Owns its Ray session (guarded init — the driver-contract modules never init
Ray themselves). Resumable: re-running with the same --out skips completed
buckets (byte-identical output, see state/manifest.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="sequences parquet dir/file")
    p.add_argument("--out", required=True, help="output root (manifest + data)")
    p.add_argument("--bank", default="haar", choices=["haar", "db4"])
    p.add_argument("--tiers", type=int, default=10)
    p.add_argument("--buckets", type=int, default=16,
                   help="hash partitions of doc_id (resume granularity); "
                   "size to ~nodes x cores at cluster scale")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--refresh", action="store_true",
                   help="continuous-aggregate refresh: fingerprint each "
                   "bucket's doc set and re-run only buckets whose input "
                   "changed since the last run (appends/removals)")
    p.add_argument("--no-verify", action="store_true",
                   help="skip the per-row round-trip invariant stage")
    p.add_argument("--staging-dir", default=None,
                   help="shared scratch root for staged encode slices "
                   "(default <out>/staging; must be reachable by every "
                   "node — see the run_rollup_job docstring)")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from wavelet_decomposition_ray.pipelines import rollup_pipeline as rp

    summary = rp.run_rollup_job(
        args.input,
        args.out,
        bank=args.bank,
        n_tiers=args.tiers,
        n_buckets=args.buckets,
        resume=not args.no_resume,
        refresh=args.refresh,
        verify=not args.no_verify,
        batch_size=args.batch_size,
        staging_dir=args.staging_dir,
    )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
