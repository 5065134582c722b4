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
from .. import native


def _gather_np(src, src_off, lens, dst, dst_off):
    """Numpy fallback for native.gather(): variable-length segmented copy."""
    nz = lens > 0
    if not nz.any():
        return
    l = lens[nz]
    pos = np.arange(int(l.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(l) - l, l
    )
    dst[np.repeat(dst_off[nz], l) + pos] = src[np.repeat(src_off[nz], l) + pos]


def _frame_blob_column(n_win, w_arr, last_arr, streams):
    """Assemble the framed rollup blobs of a whole batch as ONE Arrow binary
    array — headers scatter as a (n, 28)-byte matrix, the three encoded stat
    streams splice in via a segmented gather (native memcpy loop, numpy
    fallback).  ``streams`` is three ``(buf, starts, lens)`` triples from
    :func:`oracle.dod_encode_blocks_raw`; byte-identical to the per-row
    ``oracle.encode_rollup_block`` framing.  Returns (binary array, nbytes).
    """
    n = len(n_win)
    l0, l1, l2 = (s[2] for s in streams)
    nbytes = 28 + l0 + l1 + l2
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nbytes, out=off[1:])
    total = int(off[-1])
    assert total < 2**31, "blob batch exceeds 2 GiB; lower batch_size"
    out = np.empty(total, dtype=np.uint8)
    hdr = np.empty((n, 28), dtype=np.uint8)
    hdr[:, :4] = np.frombuffer(oc._MAGIC, dtype=np.uint8)
    u = np.column_stack([n_win, w_arr, last_arr, l0, l1, l2]).astype("<u4")
    hdr[:, 4:] = u.view(np.uint8)
    out[off[:-1, None] + np.arange(28)] = hdr
    dst = off[:-1] + 28
    g = native.gather()
    for buf, starts, lens in streams:
        starts = np.ascontiguousarray(starts)
        lens = np.ascontiguousarray(lens)
        if g is not None:
            g(buf.ctypes.data, starts.ctypes.data, lens.ctypes.data,
              out.ctypes.data, np.ascontiguousarray(dst).ctypes.data, n)
        else:
            _gather_np(buf, starts, lens, out, dst)
        dst = dst + lens
    off32 = off.astype(np.int32)
    arr = pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(off32), pa.py_buffer(out)]
    )
    return arr, nbytes


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
        # vectorized across the whole batch: one raw codec call per stat
        # stream, then one framed-blob assembly (identical bytes to per-row
        # oracle.encode_rollup_block)
        streams = [
            oc.dod_encode_blocks_raw(
                np.ascontiguousarray(s.astype(np.int64)), off
            )
            for s in (mins, maxs, sums)
        ]
        n_win = np.diff(off)
        w_arr = counts[off[:-1]]
        last_arr = counts[off[1:] - 1]
        blob_arr, nbytes = _frame_blob_column(n_win, w_arr, last_arr, streams)
        self.points_encoded += int(n_win.sum())
        self.bytes_out += int(nbytes.sum())
        bits_per_point = np.where(n_win > 0, nbytes * 8.0 / np.maximum(n_win, 1), 0.0)
        cols = {
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "tier": batch["tier"],
            "n_windows": batch["n_windows"],
            "blob": blob_arr,
            "nbytes": pa.array(nbytes),
            "bits_per_point": pa.array(bits_per_point, type=pa.float64()),
        }
        if "bucket" in batch.column_names:
            cols["bucket"] = batch["bucket"]
        return pa.table(cols)


class RollupEncode:
    """Fused rollup + encode actor stage for the flagship job.

    Computes the continuous-aggregate tier tree (same reduceat machinery as
    ``TierRollup``) and feeds each tier's stat streams STRAIGHT into the
    vectorized codec — the intermediate Arrow list columns that
    TierRollup|GorillaEncoder would build and re-parse are never
    materialized, which removes ~a third of the hot path's allocations.
    Output rows and blob bytes are identical to TierRollup -> GorillaEncoder.
    """

    def __init__(self, n_tiers: int = 10, fault_flag: str | None = None,
                 stage_dir: str | None = None):
        self.n_tiers = n_tiers
        self.points_encoded = 0
        self.bytes_out = 0
        # test hook: path of a flag file; the FIRST actor task to claim it
        # kills its own worker process mid-stage (simulated node loss).
        # Inert in production (None). The retry pytest proves the job
        # completes with byte-identical output anyway.
        self.fault_flag = fault_flag
        # shuffle-free write path: when set, each task writes its own rows
        # as per-bucket Arrow IPC slices under stage_dir and emits only
        # (bucket, stage_file) metadata rows — the encoded bytes never
        # enter the object store; BucketFinalize commits each bucket.
        self.stage_dir = stage_dir

    def _stage_batch(self, full: pa.Table) -> pa.Table:
        """Write this batch's rows as per-bucket staged IPC slices; return
        one metadata row per slice.  File names are content hashes of the
        slice's doc ids, so a retried task overwrites its own slices
        idempotently instead of duplicating rows."""
        import hashlib
        import os
        import uuid

        b = full["bucket"].to_numpy(zero_copy_only=False)
        out_b: list[int] = []
        out_f: list[str] = []
        for k in np.unique(b):
            sub = full.filter(pa.array(b == k))
            sig = hashlib.md5()
            for s in sub.column("doc_id").to_pylist():
                sig.update(str(s).encode())
                sig.update(b";")
            rel_dir = f"bucket={int(k):05d}"
            d = os.path.join(self.stage_dir, rel_dir)
            os.makedirs(d, exist_ok=True)
            name = f"part-{sig.hexdigest()[:20]}.arrow"
            tmp = os.path.join(d, f".{name}.{uuid.uuid4().hex[:8]}.tmp")
            with pa.OSFile(tmp, "wb") as fh, pa.ipc.new_file(
                fh, sub.schema
            ) as w:
                w.write_table(sub)
            os.replace(tmp, os.path.join(d, name))
            out_b.append(int(k))
            out_f.append(f"{rel_dir}/{name}")
        return pa.table(
            {
                "bucket": pa.array(out_b, type=pa.int32()),
                "stage_file": pa.array(out_f, type=pa.string()),
            }
        )

    def _maybe_inject_fault(self):
        import os

        if not self.fault_flag:
            return
        try:
            # atomic claim: exactly one actor dies even with a pool racing
            os.replace(self.fault_flag, self.fault_flag + ".claimed")
        except OSError:
            return
        os._exit(1)  # hard kill — an exception would be a user error, not
        #              an actor death, and would fail the job instead

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.listops import tumble_starts

        self._maybe_inject_fault()

        values, offsets = list_to_numpy(batch["tokens"])
        v64 = values.astype(np.int64)
        n_rows = len(offsets) - 1

        # build every tier's stat streams first (aggregate-tree folds), then
        # encode ALL tiers of each stat in ONE codec call — the vectorized
        # encoder amortizes much better over (rows x tiers) blocks at once
        starts, off, counts = tumble_starts(offsets, 2)
        tier_vals = {
            "wmin": np.minimum.reduceat(v64, starts),
            "wmax": np.maximum.reduceat(v64, starts),
            "wsum": np.add.reduceat(v64, starts),
            "wcount": counts,
        }
        tier_off = off
        per_tier = []
        for t in range(1, self.n_tiers + 1):
            if t > 1:
                s2, off2, _ = tumble_starts(tier_off, 2)
                tier_vals = {
                    "wmin": np.minimum.reduceat(tier_vals["wmin"], s2),
                    "wmax": np.maximum.reduceat(tier_vals["wmax"], s2),
                    "wsum": np.add.reduceat(tier_vals["wsum"], s2),
                    "wcount": np.add.reduceat(tier_vals["wcount"], s2),
                }
                tier_off = off2
            per_tier.append((tier_vals, tier_off))

        def concat_offsets():
            parts = [np.diff(toff) for _, toff in per_tier]
            lens = np.concatenate(parts)
            out = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(lens, out=out[1:])
            return out

        all_off = concat_offsets()
        streams = {}
        for k in ("wmin", "wmax", "wsum"):
            flat = np.concatenate([tv[k] for tv, _ in per_tier])
            streams[k] = oc.dod_encode_blocks_raw(flat, all_off)

        pieces = []
        base = 0
        for t, (tv, toff) in enumerate(per_tier, start=1):
            n_win = np.diff(toff)
            cnts = tv["wcount"]
            w_arr = cnts[toff[:-1]]
            last_arr = cnts[toff[1:] - 1]
            tier_streams = [
                (buf, starts[base : base + n_rows], lens[base : base + n_rows])
                for buf, starts, lens in (
                    streams["wmin"], streams["wmax"], streams["wsum"]
                )
            ]
            base += n_rows
            blob_arr, nbytes = _frame_blob_column(
                n_win, w_arr, last_arr, tier_streams
            )
            cols = {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "tier": pa.array(np.full(n_rows, t, dtype=np.int8)),
                "n_windows": pa.array(n_win.astype(np.int32)),
                "blob": blob_arr,
                "nbytes": pa.array(nbytes),
                "bits_per_point": pa.array(
                    nbytes * 8.0 / np.maximum(n_win, 1), type=pa.float64()
                ),
            }
            if "bucket" in batch.column_names:
                cols["bucket"] = batch["bucket"]
            pieces.append(pa.table(cols))
            self.points_encoded += int(n_win.sum())
            self.bytes_out += int(nbytes.sum())
        full = pa.concat_tables(pieces)
        if self.stage_dir is not None and "bucket" in full.column_names:
            return self._stage_batch(full)
        return full


def decode_blocks_batch(batch: pa.Table) -> pa.Table:
    """Inverse stage: encoded blobs -> rollup list rows (the read path of
    the retention store). Round-trip with GorillaEncoder is the codec
    identity invariant (FIXTURES.md invariant 4)."""
    dec = oc.decode_rollup_blocks_arrow(batch["blob"])  # all 3N streams, no
    # per-blob Python objects (vectorized framing + native stream decode)
    off = dec["offsets"]
    from ..functions.listops import numpy_to_list

    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "tier": batch["tier"],
            "n_windows": batch["n_windows"],
            "mins": numpy_to_list(dec["wmin"], off, pa.int64()),
            "maxs": numpy_to_list(dec["wmax"], off, pa.int64()),
            "sums": numpy_to_list(dec["wsum"], off, pa.int64()),
            "counts": numpy_to_list(dec["wcount"], off, pa.int32()),
        }
    )
