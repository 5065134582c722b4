"""Gap-fill / normalize ingest stage (stateless ``map_batches`` over Arrow).

Reference analog: the ingest chain of ``/root/reference/import_excel.py:39-52``
(truncate -> normalize -> interpolate). Here: linear interpolation of gap
sentinels (-1) inside ``tokens``; the resample and normalize variants are
exposed as separate batch fns for the query API.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.listops import list_to_numpy, numpy_to_list
from .. import oracle as oc


def gapfill_batch(batch: pa.Table) -> pa.Table:
    """Replace gap sentinels by linear interpolation; pure pass-through for
    gap-free rows (the common case — detected vectorized, no per-row work)."""
    values, offsets = list_to_numpy(batch["tokens"])
    lens = np.diff(offsets)
    if len(lens) == 0:
        return batch
    # vectorized gap detection: per-row min over the flat buffer
    starts = offsets[:-1]
    row_min = np.minimum.reduceat(values, starts)
    bad_rows = np.nonzero(row_min == oc.GAP_SENTINEL)[0]
    n_filled = np.zeros(len(lens), dtype=np.int32)
    if len(bad_rows) == 0:
        return batch.append_column("n_filled", pa.array(n_filled, type=pa.int32()))
    out = values.copy()
    for r in bad_rows:
        seg = values[offsets[r] : offsets[r + 1]]
        n_filled[r] = int((seg == oc.GAP_SENTINEL).sum())
        out[offsets[r] : offsets[r + 1]] = oc.gapfill_interp(seg)
    tokens = numpy_to_list(out, offsets, pa.int32())
    cols = {name: batch[name] for name in batch.column_names}
    cols["tokens"] = tokens
    cols["n_filled"] = pa.array(n_filled, type=pa.int32())
    return pa.table(cols)


def make_resample_batch(new_len: int):
    """Batch fn: resample every row to ``new_len`` points (the reference's
    48->64/day regrid, import_excel.py:48-52), vectorized per length-group."""

    def resample_batch(batch: pa.Table) -> pa.Table:
        values, offsets = list_to_numpy(batch["tokens"])
        lens = np.diff(offsets)
        n = len(lens)
        out = np.empty((n, new_len), dtype=np.float64)
        new_grid = np.arange(1, new_len + 1) / new_len
        for L in np.unique(lens):
            rows = np.nonzero(lens == L)[0]
            x = np.empty((len(rows), L))
            for j, r in enumerate(rows):
                x[j] = values[offsets[r] : offsets[r] + L]
            if L == 1:
                out[rows] = x[:, 0:1]
                continue
            old = np.arange(1, L + 1) / L
            # vectorized np.interp across the group via index arithmetic
            idx = np.searchsorted(old, new_grid, side="left")
            idx = np.clip(idx, 1, L - 1)
            x0, x1 = old[idx - 1], old[idx]
            frac = (new_grid - x0) / (x1 - x0)
            interp = x[:, idx - 1] * (1 - frac) + x[:, idx] * frac
            interp[:, new_grid <= old[0]] = x[:, 0:1]
            out[rows] = interp
        flat = out.ravel()
        off = np.arange(n + 1, dtype=np.int64) * new_len
        cols = {
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "resampled": numpy_to_list(flat, off, pa.float64()),
        }
        return pa.table(cols)

    return resample_batch


def normalize_batch(batch: pa.Table) -> pa.Table:
    """Per-row unit-mean normalization (import_excel.py:43) -> float64 list."""
    values, offsets = list_to_numpy(batch["tokens"])
    starts = offsets[:-1]
    lens = np.diff(offsets)
    sums = np.add.reduceat(values.astype(np.float64), starts)
    means = sums / lens
    means[means == 0] = 1.0
    scaled = values.astype(np.float64) / np.repeat(means, lens)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "normalized": numpy_to_list(scaled, offsets, pa.float64()),
            "row_mean": pa.array(sums / lens, type=pa.float64()),
        }
    )
