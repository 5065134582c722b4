"""Multi-format ingest of the canonical sequences table
``(doc_id:string, tokens:list<int32>, n_tok:int32, source:string)``.

The reference ingests spreadsheets (``/root/reference/import_excel.py``);
the Ray-native analogs are columnar / line-delimited distributed formats.
Every reader returns a Dataset with the IDENTICAL canonical schema, so the
whole downstream pipeline (rollup, DWT, store) is format-agnostic — a
pytest runs the flagship job from each format and pins byte-identical
store output.

- Parquet is the primary format (schema round-trips exactly).
- JSONL keeps ``tokens`` as a native JSON array; numbers arrive as int64
  and are cast back to the canonical int32.
- CSV cannot hold lists, so ``tokens`` travels as a space-joined string
  and is re-split on read with a VECTORIZED pandas split + flat cast (one
  explode per batch — no per-row Python parsing).

All readers stream: normalization is ``map_batches`` over whatever block
layout the source reader produced; nothing is materialized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

CANON_FIELDS = (
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
)


def _canonize(t: pa.Table) -> pa.Table:
    """Cast a (doc_id, tokens, n_tok, source) table to the canonical
    column order and types (JSON readers widen ints to int64)."""
    cols = []
    for name, typ in CANON_FIELDS:
        col = t[name]
        if col.type != typ:
            col = col.cast(typ)
        cols.append(col)
    return pa.table(dict(zip([n for n, _ in CANON_FIELDS], cols)))


def read_sequences_parquet(path: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        path, columns=[n for n, _ in CANON_FIELDS]
    )


def read_sequences_jsonl(path: str) -> "ray.data.Dataset":
    """JSON-lines ingest: one object per row, ``tokens`` a JSON array."""
    return ray.data.read_json(path).map_batches(
        _canonize, batch_format="pyarrow"
    )


def _parse_csv_tokens(t: pa.Table) -> pa.Table:
    """Vectorized 'sp-joined string' -> list<int32>: ONE pandas split per
    batch, flat int cast, offsets from per-row counts — no Python loop."""
    import pandas as pd

    s = t["tokens"].to_pandas().astype(str)
    words = s.str.split()
    lens = words.str.len().fillna(0).astype(np.int64).to_numpy()
    # explode -> one C-level numeric parse over the flat word column
    # (empty token lists explode to a single NaN row each — dropped)
    flat = (
        pd.to_numeric(words.explode(ignore_index=True), errors="coerce")
        .dropna()
        .to_numpy()
        .astype(np.int32)
    )
    assert len(flat) == int(lens.sum()), "CSV tokens column parse mismatch"
    offsets = np.zeros(len(lens) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))
    out = pa.table(
        {
            "doc_id": t["doc_id"].cast(pa.string()),
            "tokens": tokens,
            "n_tok": t["n_tok"].cast(pa.int32()),
            "source": t["source"].cast(pa.string()),
        }
    )
    return out


def read_sequences_csv(path: str) -> "ray.data.Dataset":
    return ray.data.read_csv(path).map_batches(
        _parse_csv_tokens, batch_format="pyarrow"
    )


READERS = {
    "parquet": read_sequences_parquet,
    "jsonl": read_sequences_jsonl,
    "csv": read_sequences_csv,
}


def read_sequences(path: str, fmt: str = "parquet") -> "ray.data.Dataset":
    try:
        return READERS[fmt](path)
    except KeyError:
        raise ValueError(f"unknown sequences format {fmt!r}; "
                         f"one of {sorted(READERS)}") from None


def export_sequences(parquet_path: str, out_path: str, fmt: str) -> None:
    """Test helper: rewrite a (small) parquet sequences table as JSONL or
    CSV with the documented encodings. Driver-side by design — only tests
    use it, to build fixture inputs for the non-parquet readers."""
    import pyarrow.dataset as pads

    t = pads.dataset(parquet_path).to_table()
    import json
    import os

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    if fmt == "jsonl":
        with open(out_path, "w") as fh:
            for row in t.to_pylist():
                fh.write(json.dumps(row) + "\n")
    elif fmt == "csv":
        import csv

        with open(out_path, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["doc_id", "tokens", "n_tok", "source"])
            for row in t.to_pylist():
                w.writerow(
                    [row["doc_id"], " ".join(map(str, row["tokens"])),
                     row["n_tok"], row["source"]]
                )
    else:
        raise ValueError(fmt)
