"""Flagship pipeline: the end-to-end rollup + downsample + retention job.

Ray-Data dataflow (SURVEY.md §4.3; every stage annotated with its reference
analog):

    read_parquet(doc_id, tokens, n_tok, source)          [S1]
     -> map_batches(add_bucket + resume filter)          [S3/S4 cache skip]
     -> map_batches(gapfill)            stateless        [M1-M3]
     -> map_batches(DwtTransform)       stateless        [T1-T6 + invariant]
     -> map_batches(TierRollup)         stateless        [A2 ladder, agg tree]
     -> map_batches(GorillaEncoder)     ACTOR POOL       [ST1]
     -> groupby(bucket).map_groups(PartitionWriter)      SHUFFLE + [S5/S6]
         -> manifest + per-(source,tier) partials -> driver final fold [A1/A2]

Consecutive map_batches are fused by the streaming executor, so the heavy
columns (tokens, coeffs) never cross the object store between them; the one
genuine all-to-all exchange is the hash-partition groupby on ``bucket``,
which doubles as the resume/checkpoint granularity. At cluster scale the
same code runs with ``n_buckets`` sized to ~(nodes x cores); locally the
default 32 keeps partitions around a few MB at bench scale.

No ``ray.init`` here — the caller owns the session (driver contract).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa

import ray.data

from ..stages.gapfill import gapfill_batch
from ..stages.dwt import DwtTransform
from ..stages.rollup import TierRollup, source_partials_batch
from ..stages.encode import GorillaEncoder, RollupEncode
from ..state import manifest as mf

SEQ_COLUMNS = ["doc_id", "tokens", "n_tok", "source"]


def sequences_dataset(path: str, columns=None) -> "ray.data.Dataset":
    """Prune at the read: only the engine's four columns leave storage."""
    return ray.data.read_parquet(path, columns=columns or SEQ_COLUMNS)


def rollup_dataset(
    ds: "ray.data.Dataset",
    bank: str = "haar",
    n_tiers: int = 10,
    verify: bool = True,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """sequences -> per-(doc, tier) rollup list rows (not yet encoded).

    ``batch_size`` is rows per batch; with heavy-tailed ``n_tok`` keep it
    modest so a batch (rows x tokens x 8B x a few intermediates) stays well
    inside a worker heap — byte-budget thinking per SURVEY.md §4.2.1.
    """
    ds = ds.map_batches(gapfill_batch, batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(
        DwtTransform(bank, verify=verify, keep_tokens=True),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    if verify:
        ds = ds.map_batches(_check_invariant, batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(
        _drop_cols(["coeffs", "rt_ok", "rt_max_err", "n_filled", "n_tok"]),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return ds.map_batches(TierRollup(n_tiers), batch_format="pyarrow", batch_size=batch_size)


def _check_invariant(batch: pa.Table) -> pa.Table:
    """Fail fast when the decompose->reconstruct token-equality invariant
    breaks (BASELINE.json): this is a correctness gate, not a metric."""
    ok = batch["rt_ok"].to_numpy(zero_copy_only=False)
    if not ok.all():
        bad = batch["doc_id"].take(pa.array(np.nonzero(~ok)[0])).to_pylist()
        raise AssertionError(f"round-trip invariant violated for docs {bad[:5]}")
    return batch


def _drop_cols(names):
    def drop(batch: pa.Table) -> pa.Table:
        return batch.drop_columns([n for n in names if n in batch.column_names])

    return drop


def source_tier_aggregate(rollup_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-(source, tier) global stats via partial+final: batch-local
    combiners (one row per key per batch) then the small groupby shuffle —
    the reference's stack+calc_epn path (SURVEY.md §2.5 A1/A2)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    partials = rollup_ds.map_batches(source_partials_batch, batch_format="pyarrow")
    return partials.groupby(["source", "tier"]).aggregate(
        Min("pmin", alias_name="min_val"),
        Max("pmax", alias_name="max_val"),
        Sum("psum", alias_name="total_sum"),
        Sum("pcount", alias_name="n_points"),
        Sum("pwindows", alias_name="n_windows"),
    )


def run_rollup_job(
    input_path: str,
    out_dir: str,
    bank: str = "haar",
    n_tiers: int = 10,
    n_buckets: int = 32,
    resume: bool = True,
    verify: bool = True,
    batch_size: int = 256,
    encoder_concurrency=(1, 8),
    fault_flag: str | None = None,
    refresh: bool = False,
) -> dict:
    """Run the full job; resumable from per-bucket checkpoints.

    ``refresh=True`` turns resume into a continuous-aggregate refresh: a
    cheap doc_id-only pre-pass fingerprints each bucket's doc set and any
    completed bucket whose input changed (appended/removed docs) is
    invalidated and re-run; unchanged buckets are still skipped.  The
    refreshed store is byte-identical to a from-scratch build on the new
    input (per-bucket determinism).

    Returns a summary dict (also written to ``out_dir/metrics.json``) with
    throughput, per-stage stats and the driver-side final per-(source, tier)
    aggregates path.
    """
    t0 = time.perf_counter()
    n_refreshed = 0
    if resume and refresh:
        # runs on the DEFAULT shuffle config (tiny doc_id-only exchange),
        # before the hash-shuffle overrides below
        stale = mf.stale_buckets(input_path, out_dir, n_buckets)
        if stale:
            mf.invalidate_buckets(out_dir, stale)
        n_refreshed = len(stale)
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    # the bucket exchange is a pure hash partition — the hash shuffle is
    # several times faster than the default sort-based shuffle for it and
    # is also the strategy that scales to multi-node all-to-all; cap its
    # aggregator actor pool to a fraction of the CPUs so it cannot starve
    # the map/encode stages (resource deadlock at small CPU counts)
    import ray as _ray

    ctx = DataContext.get_current()
    # save/restore: DataContext is process-global; leaking these settings
    # into other pipelines' groupbys can starve THEIR shuffles
    saved = (
        ctx.shuffle_strategy,
        ctx.max_hash_shuffle_aggregators,
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override,
    )
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ncpu = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    ctx.max_hash_shuffle_aggregators = max(2, ncpu // 4)
    # aggregator actors reserve num_partitions x per-partition CPUs; cap the
    # pool at ~25% of the cluster so the map/encode stages keep the rest
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = min(
        0.0625, 0.25 * ncpu / max(n_buckets, 1)
    )
    try:
        return _run_rollup_job_inner(
            input_path, out_dir, bank, n_tiers, n_buckets, resume, verify,
            batch_size, encoder_concurrency, t0, fault_flag, n_refreshed,
        )
    finally:
        (
            ctx.shuffle_strategy,
            ctx.max_hash_shuffle_aggregators,
            ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override,
        ) = saved


def _run_rollup_job_inner(
    input_path, out_dir, bank, n_tiers, n_buckets, resume, verify,
    batch_size, encoder_concurrency, t0, fault_flag=None, n_refreshed=0,
):
    done = mf.completed_buckets(out_dir) if resume else frozenset()
    if len(done) >= n_buckets:
        # nothing pending: an empty dataset cannot flow through the shuffle,
        # and there is no work anyway
        manifest_rows = mf.read_manifest(out_dir)
        return {
            "elapsed_s": round(time.perf_counter() - t0, 3),
            "buckets_written": 0,
            "buckets_skipped": len(done),
            "buckets_refreshed": n_refreshed,
            "n_windows": int(sum(r["n_windows"] for r in manifest_rows)),
            "bytes_encoded": int(sum(r["bytes_encoded"] for r in manifest_rows)),
            "rolled_points_per_s": 0.0,
            "bank": bank,
            "n_tiers": n_tiers,
            "n_buckets": n_buckets,
        }

    ds = sequences_dataset(input_path)
    # same batch_size as the heavy stages: when the executor fuses the map
    # chain, the FIRST stage's batching decides task granularity — a large
    # value here would collapse the whole fused chain to a handful of tasks
    ds = ds.map_batches(
        mf.make_add_bucket(n_buckets, done), batch_format="pyarrow",
        batch_size=batch_size,
    )
    ds = ds.map_batches(gapfill_batch, batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(
        DwtTransform(bank, verify=verify, keep_tokens=True),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    if verify:
        ds = ds.map_batches(_check_invariant, batch_format="pyarrow",
                            batch_size=batch_size)
    ds = ds.map_batches(
        _drop_cols(["coeffs", "rt_ok", "rt_max_err", "n_filled", "n_tok"]),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    # rollup + encode fused in one actor-pool stage: the tier stat streams go
    # straight from reduceat arrays into the codec without ever being
    # materialized as Arrow list columns (RollupEncode docstring)
    ds = ds.map_batches(
        RollupEncode,
        fn_constructor_kwargs={"n_tiers": n_tiers, "fault_flag": fault_flag},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=encoder_concurrency,
        num_cpus=1,
        # NB: deliberately NO max_restarts / max_task_retries here — Ray Data
        # replaces dead pool actors and re-runs their in-flight bundles on
        # its own (pytest kills an encoder mid-job and output stays
        # byte-identical), while marking the actor restartable at the Ray
        # core level disables actor-task submission pipelining and costs
        # ~60-70% wall time (interleaved A/B at 16 cpus, sf0.4: 11.4-15.2 s
        # plain vs 19.3-21.1 s with max_restarts=-1).
    )
    partials_ds = ds.groupby("bucket", num_partitions=n_buckets).map_groups(
        mf.PartitionWriter(out_dir), batch_format="pyarrow"
    )
    partials = partials_ds.to_pandas()  # tiny: buckets x sources x tiers
    stats = partials_ds.stats()

    # a hash bucket that owns no doc_ids produces no group: record it as an
    # explicitly-empty partition so resume knows the run covered it
    mf.mark_empty_buckets(out_dir, n_buckets)

    elapsed = time.perf_counter() - t0
    manifest_rows = mf.read_manifest(out_dir)
    n_windows = int(sum(r["n_windows"] for r in manifest_rows))
    bytes_encoded = int(sum(r["bytes_encoded"] for r in manifest_rows))
    # throughput from work actually done THIS run: resumed runs exclude
    # windows of buckets that were skipped via the manifest
    n_windows_run = int(
        sum(r["n_windows"] for r in manifest_rows if int(r["bucket"]) not in done)
    )

    # finalize the per-(source, tier) sink from the PERSISTED partials of
    # ALL buckets — the in-memory `partials` frame only covers buckets
    # re-run this time, so using it alone would drop previously-completed
    # buckets' contributions after a resume
    all_partials = mf.read_all_partials(out_dir)
    if all_partials is None:
        all_partials = partials
    if len(all_partials):
        final = (
            all_partials.groupby(["source", "tier"], as_index=False)
            .agg(n_docs=("n_docs", "sum"), n_windows=("n_windows", "sum"),
                 nbytes=("nbytes", "sum"))
            .sort_values(["source", "tier"])
        )
        import pyarrow.parquet as pq

        tmp = os.path.join(out_dir, ".source_stats.parquet.tmp")
        pq.write_table(pa.Table.from_pandas(final, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(out_dir, "source_stats.parquet"))

    summary = {
        "elapsed_s": round(elapsed, 3),
        "buckets_written": len(manifest_rows) - len(done),
        "buckets_skipped": len(done),
        "buckets_refreshed": n_refreshed,
        "n_windows": n_windows,
        "n_windows_this_run": n_windows_run,
        "bytes_encoded": bytes_encoded,
        "rolled_points_per_s": round(n_windows_run / elapsed, 1) if elapsed > 0 else 0.0,
        "bank": bank,
        "n_tiers": n_tiers,
        "n_buckets": n_buckets,
    }
    from ..state.metrics import parse_dataset_stats, write_lineage

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "metrics.json"), "w") as fh:
        json.dump(
            {
                "summary": summary,
                "per_stage": parse_dataset_stats(stats),
                "ray_data_stats": stats,
            },
            fh,
            indent=1,
        )
    write_lineage(out_dir, input_path,
                  {"bank": bank, "n_tiers": n_tiers, "n_buckets": n_buckets,
                   "batch_size": batch_size, "verify": verify})
    return summary
