"""Tier rollup stage: tumbling min/max/sum/count at every retention tier,
computed as a continuous-aggregate tree (tier t+1 folded from tier t) in a
single stateless ``map_batches`` pass — the Ray analog of the reference's
per-scale statistics ladder (``/root/reference/calc_EPN.py:3-43``; tutorial
cell 6 time_scales), per SURVEY.md §4.3.

Output layout: one row per (doc, tier) with the four stat streams as list
columns — the shape the Gorilla/DoD encoder stage consumes, and the shape
that explodes cheaply to the long (window_idx) format for SQL-checked
queries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.listops import list_to_numpy, numpy_to_list, tumble_starts

STAT_NAMES = ("wmin", "wmax", "wsum", "wcount")


def _tier_from(vals: dict[str, np.ndarray], offsets: np.ndarray, w: int):
    """One fold step: tumble each stat stream at width w (2 for tree folds)."""
    starts, new_off, _ = tumble_starts(offsets, w)
    return (
        {
            "wmin": np.minimum.reduceat(vals["wmin"], starts),
            "wmax": np.maximum.reduceat(vals["wmax"], starts),
            "wsum": np.add.reduceat(vals["wsum"], starts),
            "wcount": np.add.reduceat(vals["wcount"], starts),
        },
        new_off,
    )


class TierRollup:
    """Batch fn: sequences -> per-(doc, tier) rollup rows, all tiers.

    Tier t has window width 2**t; tier 1 reduces the raw tokens, every
    further tier folds the previous one (exact for dyadic tumbling windows —
    FIXTURES.md invariant 3), so total work is O(n_tokens), not
    O(n_tokens * n_tiers).
    """

    def __init__(self, n_tiers: int = 10):
        assert 1 <= n_tiers <= 30
        self.n_tiers = n_tiers

    def __call__(self, batch: pa.Table) -> pa.Table:
        values, offsets = list_to_numpy(batch["tokens"])
        v64 = values.astype(np.int64)
        n_rows = len(offsets) - 1

        # tier 1 directly from raw tokens
        starts, off, counts = tumble_starts(offsets, 2)
        tier_vals = {
            "wmin": np.minimum.reduceat(v64, starts),
            "wmax": np.maximum.reduceat(v64, starts),
            "wsum": np.add.reduceat(v64, starts),
            "wcount": counts,
        }
        tier_off = off

        doc = batch["doc_id"]
        src = batch["source"]
        passthrough = {
            n: batch[n] for n in ("bucket",) if n in batch.column_names
        }
        pieces = []
        for t in range(1, self.n_tiers + 1):
            if t > 1:
                tier_vals, tier_off = _tier_from(tier_vals, tier_off, 2)
            n_win = np.diff(tier_off)
            pieces.append(
                pa.table(
                    {
                        "doc_id": doc,
                        "source": src,
                        **passthrough,
                        "tier": pa.array(np.full(n_rows, t, dtype=np.int8)),
                        "n_windows": pa.array(n_win.astype(np.int32)),
                        "mins": numpy_to_list(tier_vals["wmin"], tier_off, pa.int64()),
                        "maxs": numpy_to_list(tier_vals["wmax"], tier_off, pa.int64()),
                        "sums": numpy_to_list(tier_vals["wsum"], tier_off, pa.int64()),
                        "counts": numpy_to_list(
                            tier_vals["wcount"].astype(np.int32), tier_off, pa.int32()
                        ),
                    }
                )
            )
        return pa.concat_tables(pieces)


def explode_rollup_batch(batch: pa.Table) -> pa.Table:
    """Per-(doc, tier) list rows -> long format (one row per window):
    (doc_id, source, tier, window_idx, wmin, wmax, wsum, wcount).
    The SQL-oracle-friendly view of the rollup store."""
    mins, off = list_to_numpy(batch["mins"])
    maxs, _ = list_to_numpy(batch["maxs"])
    sums, _ = list_to_numpy(batch["sums"])
    counts, _ = list_to_numpy(batch["counts"])
    n_win = np.diff(off)
    row_of = np.repeat(np.arange(len(n_win)), n_win)
    widx = np.arange(off[-1], dtype=np.int64) - np.repeat(off[:-1], n_win)
    return pa.table(
        {
            "doc_id": batch["doc_id"].take(pa.array(row_of)),
            "source": batch["source"].take(pa.array(row_of)),
            "tier": batch["tier"].take(pa.array(row_of)),
            "window_idx": pa.array(widx),
            "wmin": pa.array(mins, type=pa.int64()),
            "wmax": pa.array(maxs, type=pa.int64()),
            "wsum": pa.array(sums, type=pa.int64()),
            "wcount": pa.array(counts.astype(np.int32), type=pa.int32()),
        }
    )


def source_partials_batch(batch: pa.Table) -> pa.Table:
    """Partial per-(source, tier) aggregates within one rollup batch —
    the combiner half of the partial+final pattern (SURVEY.md §4.2.2) that
    keeps the groupby shuffle small: one row per (source, tier) per batch.

    Emits partial_* columns that the final ``groupby(["source","tier"])``
    re-aggregates with the matching built-in AggregateFn.
    """
    import pandas as pd

    mins, off = list_to_numpy(batch["mins"])
    maxs, _ = list_to_numpy(batch["maxs"])
    sums, _ = list_to_numpy(batch["sums"])
    counts, _ = list_to_numpy(batch["counts"])
    n_win = np.diff(off)
    key = pd.DataFrame(
        {
            "source": batch["source"].to_pandas(),
            "tier": batch["tier"].to_pandas(),
        }
    )
    # per-row reductions first (vectorized), then a tiny within-batch groupby
    row_min = np.minimum.reduceat(mins, off[:-1])
    row_max = np.maximum.reduceat(maxs, off[:-1])
    row_sum = np.add.reduceat(sums, off[:-1])
    row_cnt = np.add.reduceat(counts.astype(np.int64), off[:-1])
    key["pmin"] = row_min
    key["pmax"] = row_max
    key["psum"] = row_sum
    key["pcount"] = row_cnt
    key["pwindows"] = n_win.astype(np.int64)
    g = key.groupby(["source", "tier"], as_index=False).agg(
        pmin=("pmin", "min"),
        pmax=("pmax", "max"),
        psum=("psum", "sum"),
        pcount=("pcount", "sum"),
        pwindows=("pwindows", "sum"),
    )
    return pa.Table.from_pandas(g, preserve_index=False)
