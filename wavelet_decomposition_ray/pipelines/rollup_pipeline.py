"""Flagship pipeline: the end-to-end rollup + downsample + retention job.

Ray-Data dataflow (SURVEY.md §4.3; every stage annotated with its reference
analog):

    read_parquet(doc_id, tokens, n_tok, source)          [S1]
     -> map_batches(add_bucket + resume filter)          [S3/S4 cache skip]
     -> map_batches(gapfill)            stateless        [M1-M3]
     -> map_batches(DwtTransform)       stateless        [T1-T6 + invariant]
     -> map_batches(rollup_encode)      stateless tasks  [A2 + ST1], writes
          per-bucket staged IPC slices in-task, emits metadata rows only
     -> groupby(bucket).map_groups(BucketFinalize)       tiny metadata
          exchange -> merge slices, sort, atomic file + manifest [S5/S6]
         -> per-(source,tier) partials -> driver final fold [A1/A2]

Consecutive map_batches are fused by the streaming executor, so the heavy
columns (tokens, coeffs) never cross the object store between them — and
neither does the encoded store: each task writes its own rows as staged
per-bucket Arrow IPC slices (the no-shuffle layout of
``write_parquet(partition_cols=...)``), so the only all-to-all is the
O(tasks x buckets) metadata exchange forming each bucket's commit barrier,
which doubles as the resume/checkpoint granularity. At cluster scale the
same code runs with ``n_buckets`` sized to ~(nodes x cores); locally the
default 16 keeps finalize parallelism ~ CPUs and partitions ~10 MB at
bench scale.

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


_ENCODER_CACHE: dict = {}


def _make_rollup_encode_fn(n_tiers, fault_flag, stage_dir):
    """Stateless-task wrapper around :class:`RollupEncode`: one encoder
    instance cached per (config, worker process), so tasks run on Ray's
    warm reusable workers instead of a cold-booted actor pool."""

    def rollup_encode_batch(batch):
        key = (n_tiers, fault_flag, stage_dir)
        enc = _ENCODER_CACHE.get(key)
        if enc is None:
            enc = RollupEncode(
                n_tiers=n_tiers, fault_flag=fault_flag, stage_dir=stage_dir
            )
            _ENCODER_CACHE[key] = enc
        return enc(batch)

    return rollup_encode_batch


def run_rollup_job(
    input_path: str,
    out_dir: str,
    bank: str = "haar",
    n_tiers: int = 10,
    n_buckets: int = 16,
    resume: bool = True,
    verify: bool = True,
    batch_size: int | None = None,  # None -> adaptive from input row count
    encoder_concurrency=None,  # None -> (2, min(24, ncpu - 2)) at run time
    fault_flag: str | None = None,
    refresh: bool = False,
    input_format: str = "parquet",
    staging_dir: str | None = None,
) -> dict:
    """Run the full job; resumable from per-bucket checkpoints.

    **Staging placement contract (multi-node):** encode tasks write
    per-bucket Arrow IPC slices under the staging directory and the
    finalize stage (scheduled on ANY node) reads them back, so staging
    must live on storage reachable by every node — a shared filesystem or
    object store, exactly like ``out_dir`` itself. The default,
    ``<out_dir>/staging``, inherits ``out_dir``'s reachability and is
    therefore always safe; pass ``staging_dir`` (or set the
    ``WDR_STAGING_DIR`` env var) to point staging at faster shared scratch
    (e.g. a burst buffer) when the durable store sits on slow storage.
    Staging is cleared at job start and end — nothing durable lives there.

    ``input_format`` selects the ingest reader (``parquet`` | ``jsonl`` |
    ``csv`` — see :mod:`..sources.ingest`); every format normalizes to the
    canonical sequences schema before the first transform, so the store
    bytes are identical whichever format carried the input.  The refresh
    fingerprint pre-pass reads parquet footers and is parquet-only.

    ``refresh=True`` turns resume into a continuous-aggregate refresh: a
    cheap doc_id-only pre-pass fingerprints each bucket's doc set and any
    completed bucket whose input changed (appended/removed docs) is
    invalidated and re-run; unchanged buckets are still skipped.  The
    refreshed store is byte-identical to a from-scratch build on the new
    input (per-bucket determinism).

    ``n_buckets`` sizing (measured 2026-08-17/18, 32 cpus): the default 16
    is right up to ~25k rows / 26M tokens (sf0.1: 16 -> 2.98 s beats
    64 -> 3.5 s, per-slice overhead dominates); past ~8x the bench corpus
    the finalize stage's bucket-capped parallelism becomes THE bottleneck
    — at 200k rows / 216M windows, 16 buckets = 44.9 s, 32 = 19.3 s,
    64 = **15.0 s (3.0x)**; at 800k rows / 0.86B windows, 16 = 291.6 s,
    64 = 169.6 s, 128 = **73.6 s (4.0x, 11.7M pts/s — the same per-point
    rate as the sf0.1 headline, i.e. sized buckets keep the engine
    compute-bound at 33x the bench input)**.  Rule of thumb: grow
    n_buckets with data toward ~max(2 x cluster CPUs, windows / 7M) so
    finalize fills every core and each bucket stays a few M windows, and
    keep it FIXED for the life of a store —
    resume and the refresh fingerprints key on the bucket layout, so an
    adaptive default would silently invalidate incremental refresh (that
    is why this knob is explicit, not derived).  To re-bucket a finished
    store, use ``state.compact.compact_store`` (byte-identical rewrite).

    Returns a summary dict (also written to ``out_dir/metrics.json``) with
    throughput, per-stage stats and the driver-side final per-(source, tier)
    aggregates path.
    """
    t0 = time.perf_counter()
    n_refreshed = 0
    if refresh and input_format != "parquet":
        raise ValueError(
            "refresh=True needs the parquet fingerprint pre-pass; "
            f"got input_format={input_format!r}"
        )
    if resume and refresh:
        stale = mf.stale_buckets(input_path, out_dir, n_buckets)
        if stale:
            mf.invalidate_buckets(out_dir, stale)
        n_refreshed = len(stale)
    # NB: no DataContext shuffle overrides anymore.  The job's only groupby
    # now exchanges one tiny (bucket, stage_file) metadata row per staged
    # slice — the encoded store itself never crosses the object store (the
    # round-2 hash-shuffle tuning existed to move ~150 MB/sf0.1 of blobs;
    # the staged-write path removed that exchange entirely).
    return _run_rollup_job_inner(
        input_path, out_dir, bank, n_tiers, n_buckets, resume, verify,
        batch_size, encoder_concurrency, t0, fault_flag, n_refreshed,
        input_format, staging_dir,
    )


def _run_rollup_job_inner(
    input_path, out_dir, bank, n_tiers, n_buckets, resume, verify,
    batch_size, encoder_concurrency, t0, fault_flag=None, n_refreshed=0,
    input_format="parquet", staging_dir=None,
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

    if batch_size is None:
        if input_format == "parquet":
            # adaptive task granularity: ~4 fused-chain tasks per CPU
            # (enough waves to balance stragglers) but never tiny batches
            # (per-task + per-staged-slice fixed costs dominate below ~256
            # rows) nor huge ones (load imbalance). Row count comes from
            # parquet FOOTERS only.
            import pyarrow.dataset as pads
            import ray as _ray

            n_in = pads.dataset(input_path).count_rows()
            ncpu = (
                int(_ray.cluster_resources().get("CPU", 8))
                if _ray.is_initialized()
                else 8
            )
            batch_size = int(min(1024, max(256, n_in // (4 * ncpu))))
        else:
            # line formats have no footer row count; a mid-band fixed size
            batch_size = 512

    if input_format == "parquet":
        ds = sequences_dataset(input_path)
    else:
        from ..sources.ingest import read_sequences

        ds = read_sequences(input_path, input_format)
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
    # rollup + encode + staged write fused into the task chain: the tier
    # stat streams go straight from reduceat arrays into the codec, and each
    # task writes its own rows as per-bucket Arrow IPC slices under
    # out_dir/staging — the encoded bytes NEVER enter the object store.
    # Only (bucket, stage_file) metadata rows flow into the groupby, so the
    # former ~storage-sized all-to-all is now an O(tasks x buckets) commit
    # barrier (BucketFinalize docstring).
    # staging placement: arg > WDR_STAGING_DIR env > <out_dir>/staging —
    # see the run_rollup_job docstring for the multi-node reachability
    # contract (staged slices must be readable by the finalize stage).
    # A custom location is treated as a ROOT shared by many jobs: each
    # store stages under a subdir keyed on its out_dir, so concurrent jobs
    # pointing at the same scratch root never clear each other's slices.
    custom_root = staging_dir or os.environ.get("WDR_STAGING_DIR")
    if custom_root:
        import hashlib as _hashlib

        key = _hashlib.md5(os.path.abspath(out_dir).encode()).hexdigest()[:12]
        stage_dir = os.path.join(custom_root, f"staging-{key}")
    else:
        stage_dir = os.path.join(out_dir, "staging")
    # stale slices from a crashed run are orphans: the retrying run re-stages
    # everything it needs (content-hash names make rewrites idempotent), so
    # clear staging up front rather than trusting leftovers
    import shutil as _shutil

    _shutil.rmtree(stage_dir, ignore_errors=True)
    # STATELESS task stage, not an actor pool: RollupEncode holds no real
    # per-process state (no model/index — just counters), so a pool buys
    # nothing and costs plenty: pool actors are FRESH processes booted per
    # execution (cold imports, seconds), a fixed pool reserves CPUs that
    # starve the read/finalize stages, and an autoscaling pool ramps too
    # slowly to fill a short job (measured 3.8 effective CPUs of 14 at 16
    # cpus, sf0.4).  A per-worker-process instance cache keeps whatever the
    # encoder wants warm; tasks schedule elastically on every CPU.  Worker
    # death mid-task is retried by Ray core exactly as for pool actors
    # (the fault-injection pytest covers it, byte-identical output).
    # ``encoder_concurrency`` (when given) caps concurrent encode tasks —
    # pool semantics kept for tests/CLI; None = let the scheduler pack.
    ds = ds.map_batches(
        _make_rollup_encode_fn(n_tiers, fault_flag, stage_dir),
        batch_format="pyarrow",
        batch_size=batch_size,
        **(
            {"concurrency": encoder_concurrency[1]
             if isinstance(encoder_concurrency, tuple)
             else encoder_concurrency}
            if encoder_concurrency is not None
            else {}
        ),
    )
    partials_ds = ds.groupby("bucket", num_partitions=n_buckets).map_groups(
        mf.BucketFinalize(out_dir, stage_dir), batch_format="pyarrow"
    )
    partials = partials_ds.to_pandas()  # tiny: buckets x sources x tiers
    stats = partials_ds.stats()
    _shutil.rmtree(stage_dir, ignore_errors=True)

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
