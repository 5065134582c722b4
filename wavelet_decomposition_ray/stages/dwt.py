"""Mallat-pyramid DWT stage: stateless ``map_batches`` over zero-copy Arrow.

Replaces the reference's damped-LSQR solve against a 23360x23423 wavelet
dictionary (``/root/reference/wavelet_decomposition.py:195-199``) with the
O(n) orthonormal filter-bank cascade (SURVEY.md §2.3 T1-T6). Rows are padded
to the next power of two, grouped by padded length inside each batch, and
transformed as 2-D arrays — no per-row Python in the hot loop beyond a
memcpy scatter.

The optional fused round-trip verify runs the synthesis cascade on the fresh
coefficients and emits the per-row invariant columns (``rt_ok``,
``rt_max_err``) mandated by BASELINE.json — decompose -> reconstruct ->
rint -> int32 must equal the input tokens exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.listops import list_to_numpy, next_pow2_arr, numpy_to_list
from .. import oracle as oc


def _pad_grouped(values: np.ndarray, offsets: np.ndarray, padded: np.ndarray):
    """Group batch rows by padded (pow2) length.

    Yields (row_indices, X) where X is the (len(rows), P) float64 matrix of
    zero-padded rows.
    """
    lens = np.diff(offsets)
    for p in np.unique(padded):
        rows = np.nonzero(padded == p)[0]
        x = np.zeros((len(rows), p), dtype=np.float64)
        for j, r in enumerate(rows):
            n = lens[r]
            x[j, :n] = values[offsets[r] : offsets[r] + n]
        yield rows, x


class DwtTransform:
    """Callable batch transform: tokens -> serialized pyramid coefficients.

    Output adds ``coeffs: list<float64>`` (levels finest-first, reversed
    within level — the oracle serialization) and, when ``verify`` is on, the
    round-trip invariant columns. Used as a plain function for stateless
    tasks; it holds only immutable config so tasks and actors both work.
    """

    def __init__(self, bank: str = "haar", verify: bool = True,
                 keep_tokens: bool = True):
        oc.filter_pair(bank)  # validate config up front (SURVEY.md §2.8)
        self.bank = bank
        self.verify = verify
        self.keep_tokens = keep_tokens

    def __call__(self, batch: pa.Table) -> pa.Table:
        values, offsets = list_to_numpy(batch["tokens"])
        lens = np.diff(offsets)
        n_rows = len(lens)
        padded = next_pow2_arr(lens)
        out_offsets = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(padded, out=out_offsets[1:])
        coeffs_flat = np.empty(out_offsets[-1], dtype=np.float64)
        rt_ok = np.ones(n_rows, dtype=bool)
        rt_err = np.zeros(n_rows, dtype=np.float64)

        for rows, x in _pad_grouped(values, offsets, padded):
            levels = oc.dwt_pyramid(x, self.bank)
            # serialize: finest-first, reversed within level (oracle conv.)
            ser = np.concatenate([lvl[:, ::-1] for lvl in levels], axis=1)
            p = x.shape[1]
            for j, r in enumerate(rows):
                coeffs_flat[out_offsets[r] : out_offsets[r] + p] = ser[j]
            if self.verify:
                rec = oc.idwt_pyramid(levels, self.bank)
                err = np.abs(rec - x)
                rt_err[rows] = err.max(axis=1) if p else 0.0
                ok = (np.rint(rec) == x).all(axis=1)
                rt_ok[rows] = ok

        cols = {}
        for name in batch.column_names:
            if name == "tokens" and not self.keep_tokens:
                continue
            cols[name] = batch[name]
        cols["coeffs"] = numpy_to_list(coeffs_flat, out_offsets, pa.float64())
        if self.verify:
            cols["rt_ok"] = pa.array(rt_ok)
            cols["rt_max_err"] = pa.array(rt_err, type=pa.float64())
        return pa.table(cols)


class InverseDwt:
    """Batch transform: serialized coefficients -> reconstructed tokens.

    ``keep_levels``/``keep_offset`` give the band-pass query path — the
    reference's ``reconstruct(reconstructed_time_scales, add_offset)``
    (wavelet_decomposition.py:385-434, scale masking at :405-416).
    ``None`` keeps every level (full reconstruction).
    """

    def __init__(self, bank: str = "haar", keep_levels=None, keep_offset: bool = True):
        oc.filter_pair(bank)
        self.bank = bank
        self.keep_levels = None if keep_levels is None else set(int(k) for k in keep_levels)
        self.keep_offset = keep_offset

    def __call__(self, batch: pa.Table) -> pa.Table:
        values, offsets = list_to_numpy(batch["coeffs"])
        n_tok = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offsets)  # padded pow2 lengths
        n_rows = len(lens)
        out_off = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(n_tok, out=out_off[1:])
        out_flat = np.empty(out_off[-1], dtype=np.float64)

        for p in np.unique(lens):
            rows = np.nonzero(lens == p)[0]
            flat = np.empty((len(rows), p), dtype=np.float64)
            for j, r in enumerate(rows):
                flat[j] = values[offsets[r] : offsets[r] + p]
            # deserialize: finest-first reversed-within-level -> level arrays
            lvl_lens = oc.level_lengths(int(p))
            levels = []
            pos = 0
            for ln in lvl_lens:
                levels.append(flat[:, pos : pos + ln][:, ::-1])
                pos += ln
            if self.keep_levels is not None:
                n_detail = len(levels) - 1
                for i in range(n_detail):
                    if i not in self.keep_levels:
                        levels[i] = np.zeros_like(levels[i])
                if not self.keep_offset:
                    levels[-1] = np.zeros_like(levels[-1])
            rec = oc.idwt_pyramid(levels, self.bank)
            for j, r in enumerate(rows):
                out_flat[out_off[r] : out_off[r + 1]] = rec[j, : n_tok[r]]

        cols = {"doc_id": batch["doc_id"]}
        if "source" in batch.column_names:
            cols["source"] = batch["source"]
        if "tokens" in batch.column_names:
            # pass-through for downstream identity checks (band-pass oracle)
            cols["tokens"] = batch["tokens"]
        cols["reconstructed"] = numpy_to_list(out_flat, out_off, pa.float64())
        return pa.table(cols)


def roundtrip_verify_batch(batch: pa.Table, bank: str = "haar") -> pa.Table:
    """Standalone verify stage (SURVEY.md §4.3 stage 3) for tables that
    carry both ``tokens`` and ``coeffs``: recompute the inverse and compare."""
    tok_vals, tok_off = list_to_numpy(batch["tokens"])
    rec_tbl = InverseDwt(bank)(batch)
    rec_vals, rec_off = list_to_numpy(rec_tbl["reconstructed"])
    n_rows = len(tok_off) - 1
    eq = (np.rint(rec_vals) == tok_vals).astype(np.int8)
    diff = np.abs(rec_vals - tok_vals)
    starts = tok_off[:-1]
    ok = np.minimum.reduceat(eq, starts).astype(bool)
    err = np.maximum.reduceat(diff, starts)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "rt_ok": pa.array(ok),
            "rt_max_err": pa.array(err, type=pa.float64()),
        }
    )
