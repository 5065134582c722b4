"""Per-partition checkpoint manifest: deterministic bucket ids, atomic
partition writes, lineage + metrics rows, skip-completed resume.

Reference analog: the skip-if-exists ``.npz`` matrix cache and translation
pickle (``/root/reference/wavelet_decomposition.py:30-35``,
``calc_translations.py:136-144``) — an idempotent per-partition artifact
keyed by name (SURVEY.md §2.1 S3/S4, §4.2.4). Here: output partitions are
hash buckets of ``doc_id``; a completed bucket is recorded by an atomic
manifest JSON; resume anti-joins pending buckets against the manifest and
re-runs only the missing ones, producing byte-identical files (determinism
is guaranteed by sorting each bucket by (doc_id, tier) before writing and by
the codec being a pure per-row function).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def bucket_of_ids(doc_ids, n_buckets: int) -> np.ndarray:
    """Deterministic hash bucket per doc_id (crc32 — stable across runs,
    processes and nodes, unlike Python's salted hash())."""
    return np.array(
        [zlib.crc32(s.encode()) % n_buckets for s in doc_ids], dtype=np.int32
    )


def make_add_bucket(n_buckets: int, skip_buckets: frozenset[int] = frozenset()):
    """Batch fn: add the bucket column; drop rows of completed buckets.
    ``skip_buckets`` is captured by closure — it is a tiny set, shipped once
    per task, the broadcast-small-side pattern."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_of_ids(batch["doc_id"].to_pylist(), n_buckets)
        batch = batch.append_column("bucket", pa.array(b, type=pa.int32()))
        if skip_buckets:
            keep = np.array([x not in skip_buckets for x in b])
            batch = batch.filter(pa.array(keep))
        return batch

    return add_bucket


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def completed_buckets(out_dir: str) -> frozenset[int]:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return frozenset()
    done = set()
    for f in os.listdir(mdir):
        if f.startswith("bucket-") and f.endswith(".json"):
            try:
                with open(os.path.join(mdir, f)) as fh:
                    row = json.load(fh)
                if row.get("file") is None or os.path.isfile(
                    os.path.join(out_dir, row["file"])
                ):
                    done.add(int(row["bucket"]))
            except (ValueError, KeyError, OSError):
                continue
    return frozenset(done)


def mark_empty_buckets(out_dir: str, n_buckets: int) -> None:
    """After a successful run, record buckets that own no rows (no group
    ever reached the writer) as explicitly-empty partitions, so resume
    treats them as covered rather than forever-pending."""
    have = set()
    mdir = manifest_dir(out_dir)
    if os.path.isdir(mdir):
        for f in os.listdir(mdir):
            if f.startswith("bucket-") and f.endswith(".json"):
                try:
                    have.add(int(f[len("bucket-") : -len(".json")]))
                except ValueError:
                    continue
    os.makedirs(mdir, exist_ok=True)
    for b in range(n_buckets):
        if b in have:
            continue
        row = {"bucket": b, "file": None, "n_rows": 0, "n_docs": 0,
               "doc_xor": 0, "n_windows": 0, "bytes_encoded": 0,
               "checksum": None, "elapsed_s": 0.0}
        tmp = os.path.join(mdir, f".bucket-{b:05d}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(row, fh, sort_keys=True)
        os.replace(tmp, os.path.join(mdir, f"bucket-{b:05d}.json"))


def read_all_partials(out_dir: str):
    """Concatenate every bucket's persisted per-(source, tier) partials
    (written atomically by :class:`PartitionWriter`) into one pandas frame —
    the input of the finalize fold. Covers buckets completed by PREVIOUS
    runs, which a resumed run never re-executes. Returns None when NO
    partials exist (legacy store or empty run — callers fall back to
    this-run partials only).

    Raises when partials exist but some non-empty manifest bucket has no
    partials file (a legacy store mixed with new buckets): folding the
    partial set would silently omit the legacy buckets from
    source_stats.parquet (ADVICE r2)."""
    import pandas as pd

    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return None
    have = set()
    frames = []
    for f in sorted(os.listdir(mdir)):
        if f.startswith("partials-") and f.endswith(".parquet"):
            have.add(int(f[len("partials-") : -len(".parquet")]))
            frames.append(pq.read_table(os.path.join(mdir, f)).to_pandas())
    if not frames:
        return None
    need = {
        int(row["bucket"]) for row in read_manifest(out_dir)
        if row.get("file") is not None
    }
    missing = sorted(need - have)
    if missing:
        raise RuntimeError(
            f"store at {out_dir} has manifest buckets {missing} without "
            "partials files (written by a pre-partials version): "
            "source_stats would silently omit them — delete the store's "
            "source_stats/manifest and re-run, or rebuild the store"
        )
    return pd.concat(frames, ignore_index=True)


def input_bucket_summary(input_path: str, n_buckets: int):
    """Distributed pre-pass over ONLY the ``doc_id`` column: per-bucket doc
    count + order-independent XOR fingerprint of stable 64-bit doc-id
    hashes.  Each batch emits at most ``n_buckets`` partial rows, so the
    exchange carries O(batches x buckets) tiny rows — never the corpus.
    Returns a pandas frame (bucket, n_docs, doc_xor), one row per occupied
    bucket."""
    import ray.data

    from ..functions.dedup import _stable_u64

    ds = ray.data.read_parquet(input_path, columns=["doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        if not ids:
            return pa.table(
                {"bucket": pa.array([], type=pa.int32()),
                 "pcnt": pa.array([], type=pa.int64()),
                 "pxor": pa.array([], type=pa.int64())}
            )
        b = bucket_of_ids(ids, n_buckets)
        h = np.array([_stable_u64(s) for s in ids], dtype=np.uint64).view(
            np.int64
        )
        order = np.argsort(b, kind="stable")
        bs, hs = b[order], h[order]
        ub, start = np.unique(bs, return_index=True)
        ends = np.append(start[1:], len(bs))
        return pa.table(
            {
                "bucket": pa.array(ub, type=pa.int32()),
                "pcnt": pa.array((ends - start).astype(np.int64)),
                "pxor": pa.array(np.bitwise_xor.reduceat(hs, start)),
            }
        )

    def fold(df):
        import pandas as pd

        return pd.DataFrame(
            {
                "bucket": [int(df["bucket"].iloc[0])],
                "n_docs": [int(df["pcnt"].sum())],
                "doc_xor": [int(np.bitwise_xor.reduce(df["pxor"].to_numpy()))],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )


def stale_buckets(input_path: str, out_dir: str, n_buckets: int) -> frozenset[int]:
    """Completed buckets whose recorded doc-set fingerprint no longer
    matches the current input — docs were appended to or removed from them
    since the bucket was written (in-place token edits under an UNCHANGED
    doc_id are outside this contract: the store is an append/remove ingest
    sink keyed by doc_id).  Manifest rows written before fingerprints
    existed count as stale (safe: they just re-run)."""
    rows = {int(r["bucket"]): r for r in read_manifest(out_dir)}
    if not rows:
        return frozenset()
    summary = input_bucket_summary(input_path, n_buckets)
    cur = {
        int(b): (int(c), int(x))
        for b, c, x in zip(summary["bucket"], summary["n_docs"],
                           summary["doc_xor"])
    }
    stale = set()
    for b, r in rows.items():
        want = cur.get(b, (0, 0))
        have = (
            (int(r["n_docs"]), int(r["doc_xor"])) if "doc_xor" in r else None
        )
        if have != want:
            stale.add(b)
    return frozenset(stale)


def invalidate_buckets(out_dir: str, buckets) -> None:
    """Make stale buckets pending again.  The manifest row is removed FIRST
    (from that instant the bucket is pending and any crash leaves it
    pending), then the partials file, then the data file — refresh is
    crash-safe at every step."""
    mdir = manifest_dir(out_dir)
    for b in sorted(buckets):
        mpath = os.path.join(mdir, f"bucket-{b:05d}.json")
        rel = None
        if os.path.isfile(mpath):
            try:
                with open(mpath) as fh:
                    rel = json.load(fh).get("file")
            except (ValueError, OSError):
                rel = None
            os.remove(mpath)
        ppath = os.path.join(mdir, f"partials-{b:05d}.parquet")
        if os.path.isfile(ppath):
            os.remove(ppath)
        if rel:
            dpath = os.path.join(out_dir, rel)
            if os.path.isfile(dpath):
                os.remove(dpath)


def read_manifest(out_dir: str) -> list[dict]:
    mdir = manifest_dir(out_dir)
    rows = []
    if os.path.isdir(mdir):
        for f in sorted(os.listdir(mdir)):
            if f.startswith("bucket-") and f.endswith(".json"):
                with open(os.path.join(mdir, f)) as fh:
                    rows.append(json.load(fh))
    return rows


class PartitionWriter:
    """``groupby("bucket").map_groups`` callable: write one bucket's encoded
    rollup rows atomically, record lineage + metrics, return the manifest row
    plus per-(source, tier) partial aggregates (the combiner half — the
    driver's final fold over these tiny rows replaces a second shuffle).

    This is the DATA-SHUFFLE writer shape (every encoded byte crosses the
    object store to reach its bucket's writer).  The flagship job now uses
    :class:`BucketFinalize` over task-staged files instead — same final
    bytes, no data all-to-all — but this class remains the simple one-hop
    writer for ad-hoc pipelines."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.__name__ = "PartitionWriter"  # map_groups wants a named callable

    def __call__(self, group: pa.Table) -> pa.Table:
        return write_bucket_table(self.out_dir, group)


def write_bucket_table(out_dir: str, group: pa.Table) -> pa.Table:
    """Write ONE bucket's full rollup table as its final atomic partition
    file + manifest row + persisted partials.  Deterministic: the bucket is
    globally sorted (tier, doc_id) before writing, so the output bytes do
    not depend on how the rows arrived (shuffle order or staged-file
    layout) — resume and refresh rewrites stay byte-identical."""
    t0 = time.perf_counter()
    bucket = int(group["bucket"][0].as_py())
    # tier-FIRST sort: clusters each retention tier into contiguous
    # parquet row groups, so tier-scoped reads (the store's dominant
    # query shape — coarse tiers for long ranges) prune at the row-group
    # level via predicate pushdown instead of decoding every row. Still
    # fully deterministic (resume rewrites stay byte-identical).
    group = group.sort_by([("tier", "ascending"), ("doc_id", "ascending")])
    group = group.drop_columns(["bucket"])
    rel = f"data/bucket={bucket:05d}.parquet"
    path = os.path.join(out_dir, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(group, tmp, row_group_size=4096)
    os.replace(tmp, path)
    with open(path, "rb") as fh:
        checksum = hashlib.md5(fh.read()).hexdigest()

    # per-(source, tier) partials for the driver-side final aggregate
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "source": group["source"].to_pandas(),
            "tier": group["tier"].to_pandas(),
            "n_windows": group["n_windows"].to_pandas().astype("int64"),
            "nbytes": group["nbytes"].to_pandas(),
        }
    )
    partials = pdf.groupby(["source", "tier"], as_index=False).agg(
        n_docs=("n_windows", "size"),
        n_windows=("n_windows", "sum"),
        nbytes=("nbytes", "sum"),
    )
    partials.insert(0, "bucket", bucket)

    # persist this bucket's partials next to its manifest row so a
    # RESUMED run can fold the per-(source,tier) sink across ALL buckets,
    # not just the re-run ones (skipped buckets otherwise silently drop
    # out of source_stats.parquet)
    mdir = manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    ptmp = os.path.join(mdir, f".partials-{bucket:05d}.parquet.tmp")
    pq.write_table(pa.Table.from_pandas(partials, preserve_index=False), ptmp)
    os.replace(ptmp, os.path.join(mdir, f"partials-{bucket:05d}.parquet"))

    # order-independent input fingerprint of this bucket's doc set:
    # (count, XOR of stable 64-bit doc-id hashes) — refresh compares it
    # against the same summary recomputed from the CURRENT input to
    # detect appended/removed docs in already-completed buckets
    from ..functions.dedup import _stable_u64

    ids = pa.compute.unique(group["doc_id"]).to_pylist()
    hx = np.array([_stable_u64(s) for s in ids], dtype=np.uint64).view(
        np.int64
    )
    row = {
        "bucket": bucket,
        "file": rel,
        "n_rows": group.num_rows,
        "n_docs": len(ids),
        "doc_xor": int(np.bitwise_xor.reduce(hx)) if len(hx) else 0,
        "n_windows": int(pdf["n_windows"].sum()),
        "bytes_encoded": int(pdf["nbytes"].sum()),
        "checksum": checksum,
        "elapsed_s": round(time.perf_counter() - t0, 4),
    }
    mtmp = os.path.join(mdir, f".bucket-{bucket:05d}.json.tmp")
    with open(mtmp, "w") as fh:
        json.dump(row, fh, sort_keys=True)
    os.replace(mtmp, os.path.join(mdir, f"bucket-{bucket:05d}.json"))
    return pa.Table.from_pandas(partials, preserve_index=False)


class BucketFinalize:
    """``groupby("bucket").map_groups`` callable over STAGED-FILE METADATA
    rows (bucket, stage_file): the commit barrier of the shuffle-free write
    path.

    The encode tasks already wrote every bucket's rows as per-(task, bucket)
    Arrow IPC slices under ``staging/`` (see ``RollupEncode(stage_dir=...)``)
    — the only thing that crosses the cluster here is one tiny metadata row
    per staged file, so the groupby exchange is O(tasks x buckets) rows of
    a few bytes instead of the full encoded store.  Each finalize task
    reads its bucket's staged slices, globally sorts, and writes the exact
    same final partition file the data-shuffle writer would (byte-identical
    — :func:`write_bucket_table` sorts before writing), then deletes the
    slices.

    Retry-safe: staged file names are content hashes of the slice's doc
    ids, so a re-executed encode task overwrites its own files instead of
    duplicating rows; duplicate metadata rows dedupe on the file name here.
    At 100-TB scale the staged-file count is tasks x occupied buckets —
    size ``batch_size`` up and ``n_buckets`` to O(nodes) so slices stay
    megabytes, and staging lives on the job's shared store (here: the
    store's own output directory)."""

    def __init__(self, out_dir: str, stage_dir: str):
        self.out_dir = out_dir
        self.stage_dir = stage_dir
        self.__name__ = "BucketFinalize"

    def __call__(self, meta: pa.Table) -> pa.Table:
        files = sorted(set(meta["stage_file"].to_pylist()))
        tables = []
        for rel in files:
            with pa.OSFile(os.path.join(self.stage_dir, rel), "rb") as fh:
                tables.append(pa.ipc.open_file(fh).read_all())
        group = pa.concat_tables(tables)
        partials = write_bucket_table(self.out_dir, group)
        for rel in files:
            try:
                os.remove(os.path.join(self.stage_dir, rel))
            except OSError:
                pass
        return partials
