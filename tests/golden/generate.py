"""Regenerate the committed golden fixtures (FIXTURES.md F3) from the
single-process NumPy oracle over the smoke-tier synth table. Deterministic:
running this script always reproduces the same bytes.

    PYTHONPATH=. python tests/golden/generate.py
"""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from wavelet_decomposition_ray import oracle as oc, synth  # noqa: E402
from wavelet_decomposition_ray.functions.listops import list_to_numpy, numpy_to_list  # noqa: E402

GOLDEN_DIR = os.path.dirname(os.path.abspath(__file__))
TIERS = (1, 4, 8)


def main():
    tab = synth.generate_table(synth.n_rows_for("sf0.001"))
    vals, off = list_to_numpy(tab["tokens"])
    doc_ids = tab["doc_id"].to_pylist()
    sources = tab["source"].to_pylist()

    # per-(doc, level) serialized coefficients, both banks
    for bank in oc.BANKS:
        rows_doc, rows_level, flat_parts, lens = [], [], [], []
        for i, d in enumerate(doc_ids):
            toks = vals[off[i] : off[i + 1]]
            flat = oc.dwt_flat(toks, bank)
            pos = 0
            for lvl, ln in enumerate(oc.level_lengths(len(flat))):
                rows_doc.append(d)
                rows_level.append(lvl)
                flat_parts.append(flat[pos : pos + ln])
                lens.append(ln)
                pos += ln
        values_col = np.concatenate(flat_parts)
        offsets = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        t = pa.table(
            {
                "doc_id": pa.array(rows_doc, type=pa.string()),
                "level": pa.array(np.array(rows_level, dtype=np.int8)),
                "values": numpy_to_list(values_col, offsets, pa.float64()),
            }
        )
        pq.write_table(t, os.path.join(GOLDEN_DIR, f"coeffs_{bank}.parquet"))

    # long-format rollups at a tier subset + encoded blobs for every tier
    long_rows = {k: [] for k in ("doc_id", "source", "tier", "window_idx",
                                 "wmin", "wmax", "wsum", "wcount")}
    enc_rows = {k: [] for k in ("doc_id", "tier", "blob")}
    for i, d in enumerate(doc_ids):
        toks = vals[off[i] : off[i + 1]]
        tree = oc.rollup_tree(toks, 10)
        for t_ in range(1, 11):
            tier = tree[t_]
            enc_rows["doc_id"].append(d)
            enc_rows["tier"].append(t_)
            enc_rows["blob"].append(oc.encode_rollup_block(tier))
            if t_ in TIERS:
                n = len(tier["wmin"])
                long_rows["doc_id"].extend([d] * n)
                long_rows["source"].extend([sources[i]] * n)
                long_rows["tier"].extend([t_] * n)
                long_rows["window_idx"].extend(range(n))
                long_rows["wmin"].extend(tier["wmin"].tolist())
                long_rows["wmax"].extend(tier["wmax"].tolist())
                long_rows["wsum"].extend(tier["wsum"].tolist())
                long_rows["wcount"].extend(tier["wcount"].tolist())
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(long_rows["doc_id"], type=pa.string()),
                "source": pa.array(long_rows["source"], type=pa.string()),
                "tier": pa.array(np.array(long_rows["tier"], dtype=np.int8)),
                "window_idx": pa.array(np.array(long_rows["window_idx"], dtype=np.int64)),
                "wmin": pa.array(np.array(long_rows["wmin"], dtype=np.int64)),
                "wmax": pa.array(np.array(long_rows["wmax"], dtype=np.int64)),
                "wsum": pa.array(np.array(long_rows["wsum"], dtype=np.int64)),
                "wcount": pa.array(np.array(long_rows["wcount"], dtype=np.int32)),
            }
        ),
        os.path.join(GOLDEN_DIR, "rollups.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(enc_rows["doc_id"], type=pa.string()),
                "tier": pa.array(np.array(enc_rows["tier"], dtype=np.int8)),
                "blob": pa.array(enc_rows["blob"], type=pa.binary()),
            }
        ),
        os.path.join(GOLDEN_DIR, "encoded.parquet"),
    )
    print("golden fixtures written to", GOLDEN_DIR)


if __name__ == "__main__":
    main()
