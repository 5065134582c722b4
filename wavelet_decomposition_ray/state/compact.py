"""Store compaction: rewrite a many-bucket store into fewer, larger
partitions — the small-files problem every long-lived partitioned store
accretes (a 256-node job writes nodes x cores buckets; a year of
incremental refreshes fragments them further).

Compaction never decodes: the encoded rows regroup by the SAME
deterministic doc_id hash into the new bucket count and each new bucket
flows through :func:`manifest.write_bucket_table` — the single writer
every path shares — so the compacted store is BYTE-IDENTICAL to what a
from-scratch build at the new ``n_buckets`` would produce (the pytest
pins this), and fsck, resume, refresh and tier-pushdown reads all work
unchanged on the result.

Resumable like the build: completed destination buckets are skipped via
the manifest, so a killed compaction continues where it stopped.
"""

from __future__ import annotations

import os

from . import manifest as mf


def compact_store(src_dir: str, dst_dir: str, n_buckets: int) -> dict:
    """Rewrite ``src_dir``'s store into ``dst_dir`` with ``n_buckets``
    partitions.  Ray must be initialised by the caller."""
    import ray.data

    src_data = os.path.join(src_dir, "data")
    if not os.path.isdir(src_data):
        raise FileNotFoundError(f"no store data dir at {src_data}")
    if os.path.abspath(src_dir) == os.path.abspath(dst_dir):
        raise ValueError("compact in place is not supported; "
                         "write to a new directory and swap")
    os.makedirs(dst_dir, exist_ok=True)
    done = mf.completed_buckets(dst_dir)

    ds = ray.data.read_parquet(src_data).map_batches(
        mf.make_add_bucket(n_buckets, skip_buckets=done),
        batch_format="pyarrow",
    )

    if len(done) == n_buckets:
        return {"buckets_written": 0, "buckets_skipped": len(done)}

    def finalize(group):
        return mf.write_bucket_table(dst_dir, group)

    partials = ds.groupby("bucket").map_groups(
        finalize, batch_format="pyarrow"
    )
    n_written = len(
        set(partials.select_columns(["bucket"]).to_pandas()["bucket"])
    )
    return {"buckets_written": n_written, "buckets_skipped": len(done)}
