"""Store fsck: verify a finished retention store against its manifest.

Reference analog: the reference trusts its ``.npz`` caches blindly; a
production store needs the opposite — an audit that proves the bytes on
disk still are the bytes the manifest committed, and that they decode to
the row/window/doc counts the writer recorded.

Checks per manifest bucket (each bucket = one Ray task, so memory stays
bucket-bounded and the audit scales with the cluster exactly like the
write path):

* file exists and its md5 equals the manifest ``checksum`` (bit-rot,
  truncation, manual tampering);
* the parquet row count equals ``n_rows``;
* the Gorilla/DoD blobs DECODE, and the decoded window count equals
  ``n_windows`` (writer-bug canary — checksum intact but semantics wrong);
* the doc-set fingerprint (``n_docs``, xor of stable 64-bit doc-id
  hashes) matches — the same fingerprint the incremental refresh uses;
* the bucket's ``partials-*.parquet`` sidecar exists (resume integrity).

Returns a summary dict; ``ok`` is True only when every check passes.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import manifest as mf


def _check_bucket(out_dir: str, row: dict) -> list[str]:
    from ..functions.dedup import _stable_u64
    from ..stages.encode import decode_blocks_batch

    b = row["bucket"]
    errs: list[str] = []
    if row.get("file") is None:  # recorded-empty bucket
        return errs
    path = os.path.join(out_dir, row["file"])
    if not os.path.isfile(path):
        return [f"bucket {b}: file missing: {row['file']}"]
    with open(path, "rb") as fh:
        digest = hashlib.md5(fh.read()).hexdigest()
    if digest != row["checksum"]:
        return [f"bucket {b}: checksum mismatch ({digest} != "
                f"{row['checksum']})"]
    t = pq.read_table(path)
    if t.num_rows != row["n_rows"]:
        errs.append(
            f"bucket {b}: n_rows {t.num_rows} != manifest {row['n_rows']}"
        )
    try:
        dec = decode_blocks_batch(t)
        nw = int(pa.compute.sum(dec["n_windows"]).as_py() or 0)
        if nw != row["n_windows"]:
            errs.append(
                f"bucket {b}: decoded n_windows {nw} != manifest "
                f"{row['n_windows']}"
            )
    except Exception as e:
        errs.append(f"bucket {b}: decode failed: {e}")
    ids = pa.compute.unique(t["doc_id"]).to_pylist()
    hx = np.array([_stable_u64(s) for s in ids], dtype=np.uint64).view(
        np.int64
    )
    xor = int(np.bitwise_xor.reduce(hx)) if len(hx) else 0
    if len(ids) != row["n_docs"] or xor != row["doc_xor"]:
        errs.append(f"bucket {b}: doc-set fingerprint mismatch")
    pfile = os.path.join(mf.manifest_dir(out_dir),
                         f"partials-{b:05d}.parquet")
    if row["n_rows"] and not os.path.isfile(pfile):
        errs.append(f"bucket {b}: partials sidecar missing")
    return errs


def validate_store(out_dir: str, distributed: bool = True) -> dict:
    """Audit ``out_dir`` against its manifest.  ``distributed=True`` runs
    one Ray task per bucket (the scale path); False audits inline (handy
    in tests and for tiny stores)."""
    rows = mf.read_manifest(out_dir)
    if not rows:
        return {"ok": False, "buckets": 0,
                "errors": ["no manifest rows found"]}
    if distributed:
        import ray

        @ray.remote
        def _task(row):
            return _check_bucket(out_dir, row)

        errs = [e for part in ray.get([_task.remote(r) for r in rows])
                for e in part]
    else:
        errs = [e for r in rows for e in _check_bucket(out_dir, r)]
    return {
        "ok": not errs,
        "buckets": len(rows),
        "files": sum(1 for r in rows if r.get("file")),
        "errors": errs,
    }
