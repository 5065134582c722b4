"""Benchmark harness: runs the headline rollup+retention pipeline over the
synthesized sequences table for $GRAFT_SF_DIR (default /root/testdata/sf0.1)
and prints ONE JSON line.

    python bench.py              # headline at RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling    # same job at 8 and 32 CPUs in fresh
                                 # processes -> scaling efficiency (the
                                 # sandbox proxy for N vs 4N nodes)

Owns its Ray session (the driver contract forbids ray.init only inside
__ray_entry__ / library code).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def _headline(sf_dir: str, ncpus: int) -> dict:
    import ray

    from wavelet_decomposition_ray import synth
    from wavelet_decomposition_ray.pipelines import rollup_pipeline as rp

    seq = synth.ensure_sequences(sf_dir)

    ray.init(
        address="local",
        num_cpus=ncpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import pyarrow.dataset as pads

    n_tokens = 0
    n_rows = 0
    for frag in pads.dataset(seq).get_fragments():
        # untimed metadata pass doubles as page-cache warmup
        n_rows += frag.count_rows()
    import pyarrow.compute as pc

    tbl = pads.dataset(seq).to_table(columns=["n_tok"])
    n_tokens = int(pc.sum(tbl["n_tok"]).as_py())

    out = f"/tmp/graft_bench/cpus{ncpus}"
    shutil.rmtree(out, ignore_errors=True)

    t0 = time.perf_counter()
    summary = rp.run_rollup_job(
        seq,
        out,
        bank="haar",
        n_tiers=10,
        n_buckets=64,
        resume=False,
        verify=True,
        batch_size=256,
        encoder_concurrency=(1, ncpus),
    )
    t_job = time.perf_counter() - t0

    # read path: scan the retention store and decode every block
    from wavelet_decomposition_ray.stages.encode import decode_blocks_batch
    import ray.data as rd

    t1 = time.perf_counter()
    decoded = rd.read_parquet(os.path.join(out, "data")).map_batches(
        decode_blocks_batch, batch_format="pyarrow", batch_size=512
    )
    n_dec = decoded.count()
    t_decode = time.perf_counter() - t1

    ray.shutdown()

    return {
        "metric": "rollup_retention_job_seconds",
        "value": round(t_job, 3),
        "unit": "sec",
        "queries": {
            "rollup_job": round(t_job, 3),
            "decode_scan": round(t_decode, 3),
        },
        "sf": float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", "") or 0.1),
        "num_cpus": ncpus,
        "n_rows": n_rows,
        "n_tokens": n_tokens,
        "n_windows": summary["n_windows"],
        "bytes_encoded": summary["bytes_encoded"],
        "decoded_rows": n_dec,
        "rolled_points_per_s": round(summary["n_windows"] / t_job, 1),
        "tokens_per_s": round(n_tokens / t_job, 1),
    }


def _run_fresh(ncpus: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpus))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        lo, hi = 8, 32
        r_lo = _run_fresh(lo)
        r_hi = _run_fresh(hi)
        eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
        print(
            json.dumps(
                {
                    "metric": "scaling_efficiency_8_to_32",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    "sec_8": r_lo["value"],
                    "sec_32": r_hi["value"],
                    "points_per_s_8": r_lo["rolled_points_per_s"],
                    "points_per_s_32": r_hi["rolled_points_per_s"],
                    "tokens_per_s_8": r_lo["tokens_per_s"],
                    "tokens_per_s_32": r_hi["tokens_per_s"],
                    "sf": r_hi["sf"],
                }
            )
        )
        return
    ncpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    print(json.dumps(_headline(sf_dir, ncpus)))


if __name__ == "__main__":
    main()
