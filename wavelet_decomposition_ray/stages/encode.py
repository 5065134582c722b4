"""Gorilla/delta-of-delta encoder stage — the engine's stateful actor-pool
stage (SURVEY.md §2.4 ST1; north_star storage layer; Gorilla paper VLDB'15).

Used as a callable CLASS with ``map_batches(GorillaEncoder, concurrency=N,
batch_size=B)``: per-actor setup (buffers, counters) happens once in
``__init__``; ``__call__`` encodes every (doc, tier) rollup row of a batch.
Each encoded blob is a pure function of its own row — no cross-partition
carry-over — so partition rewrites are byte-identical on resume
(SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.listops import list_to_numpy
from .. import oracle as oc


class GorillaEncoder:
    """Actor-pool encoder: rollup list rows -> framed compressed blobs.

    State held per actor: throughput counters (points/bytes encoded) that are
    attached to every output batch as lineage columns, and nothing else —
    encoding must stay a pure per-row function (resume invariant).
    """

    def __init__(self):
        self.points_encoded = 0
        self.bytes_out = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        mins, off = list_to_numpy(batch["mins"])
        maxs, _ = list_to_numpy(batch["maxs"])
        sums, _ = list_to_numpy(batch["sums"])
        counts, _ = list_to_numpy(batch["counts"])
        n = len(off) - 1
        blobs = []
        enc = oc.encode_rollup_block
        for r in range(n):
            sl = slice(off[r], off[r + 1])
            blobs.append(
                enc(
                    {
                        "wmin": mins[sl],
                        "wmax": maxs[sl],
                        "wsum": sums[sl],
                        "wcount": counts[sl],
                    }
                )
            )
        nbytes = np.array([len(b) for b in blobs], dtype=np.int64)
        n_win = np.diff(off)
        self.points_encoded += int(n_win.sum())
        self.bytes_out += int(nbytes.sum())
        bits_per_point = np.where(n_win > 0, nbytes * 8.0 / np.maximum(n_win, 1), 0.0)
        cols = {
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "tier": batch["tier"],
            "n_windows": batch["n_windows"],
            "blob": pa.array(blobs, type=pa.binary()),
            "nbytes": pa.array(nbytes),
            "bits_per_point": pa.array(bits_per_point, type=pa.float64()),
        }
        if "bucket" in batch.column_names:
            cols["bucket"] = batch["bucket"]
        return pa.table(cols)


def decode_blocks_batch(batch: pa.Table) -> pa.Table:
    """Inverse stage: encoded blobs -> rollup list rows (the read path of
    the retention store). Round-trip with GorillaEncoder is the codec
    identity invariant (FIXTURES.md invariant 4)."""
    blobs = batch["blob"].to_pylist()
    dec = [oc.decode_rollup_block(b) for b in blobs]
    off = np.zeros(len(dec) + 1, dtype=np.int64)
    np.cumsum([len(d["wmin"]) for d in dec], out=off[1:])
    from ..functions.listops import numpy_to_list

    def cat(key, dtype):
        return (
            np.concatenate([d[key] for d in dec]).astype(dtype)
            if dec
            else np.zeros(0, dtype)
        )

    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "tier": batch["tier"],
            "n_windows": batch["n_windows"],
            "mins": numpy_to_list(cat("wmin", np.int64), off, pa.int64()),
            "maxs": numpy_to_list(cat("wmax", np.int64), off, pa.int64()),
            "sums": numpy_to_list(cat("wsum", np.int64), off, pa.int64()),
            "counts": numpy_to_list(cat("wcount", np.int32), off, pa.int32()),
        }
    )
