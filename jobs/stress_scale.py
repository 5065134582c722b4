"""Scale-stress for the two fallback paths the small gate never exercises
(VERDICT r3 #7): the DISTRIBUTED connected-components (pair list past
MAX_DRIVER_PAIRS, so the driver union-find guard actually trips) and
SimHash near-dup at its occupancy cap (a template-spam bucket bigger than
the cap must drop loudly while normal dup mass is still found).

Prints one JSON line; results are recorded in BASELINE.md.

Run: python jobs/stress_scale.py  (owns its Ray session)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def cc_stress() -> dict:
    """6.0M edges (50k template-spam cliques of 16) through
    propagate_min_labels — past the 5M driver guard for real. Every
    clique's label must be its min id."""
    from wavelet_decomposition_ray.functions import components as cc

    import ray.data

    k, n_comp = 16, 50_000
    base = np.arange(n_comp, dtype=np.int64) * 1000
    i, j = np.triu_indices(k, 1)
    a = (base[:, None] + i[None, :]).ravel()
    b = (base[:, None] + j[None, :]).ravel()
    assert len(a) > cc.MAX_DRIVER_PAIRS, "stress must exceed the guard"
    pairs = ray.data.from_arrow(
        pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b)})
    ).repartition(64)

    t0 = time.perf_counter()
    lab = cc.propagate_min_labels(pairs)
    df = lab.to_pandas()
    wall = time.perf_counter() - t0

    assert len(df) == n_comp * k, len(df)
    node = df["node"].to_numpy()
    want = (node // 1000) * 1000
    assert (df["label"].to_numpy() == want).all(), "wrong component labels"
    return {"edges": int(len(a)), "nodes": int(n_comp * k),
            "wall_s": round(wall, 1)}


N_DOCS = 1_000_000
N_HOT, N_TMPL, N_COPY = 10_000, 100, 50


def _build_corpus(tmp: str) -> None:
    """1M-doc template-spam corpus: one 10k-copy viral template, 100 x 50
    normal duplicate clusters, word-diverse tail."""
    n, n_hot, n_tmpl, n_copy = N_DOCS, N_HOT, N_TMPL, N_COPY
    texts = np.empty(n, dtype=object)
    texts[:n_hot] = "viral template body shared by far too many documents"
    for t in range(n_tmpl):
        s = f"normal template {t} with stable words forming one cluster"
        texts[n_hot + t * n_copy : n_hot + (t + 1) * n_copy] = s
    tail = n_hot + n_tmpl * n_copy
    ids = np.arange(n, dtype=np.int64)
    # the tail must be word-DIVERSE (every word unique to its doc): docs
    # that merely permute a shared vocabulary land near each other in
    # simhash space, band buckets blow past the cap corpus-wide, and the
    # candidate set explodes to billions of non-dup pairs — the first cut
    # of this stress did exactly that
    texts[tail:] = [
        f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g u{i}h"
        for i in range(tail, n)
    ]
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids), "text": pa.array(texts),
                  "n_chars": pa.array(n_chars)}),
        os.path.join(tmp, "documents.parquet"),
    )


def simhash_stress(tmp: str) -> dict:
    """1M docs with (a) one 10k-copy template whose band buckets exceed the
    occupancy cap (must drop, loudly, without collapsing the run) and
    (b) 100 templates x 50 copies of normal duplicate mass (must all be
    found: identical texts => hamming 0)."""
    from wavelet_decomposition_ray.pipelines import data_queries as dq

    n, n_hot, n_tmpl, n_copy = N_DOCS, N_HOT, N_TMPL, N_COPY
    _build_corpus(tmp)

    t0 = time.perf_counter()
    pairs = dq.q_simhash_pairs(tmp).to_pandas()
    wall = time.perf_counter() - t0

    # normal templates: every within-template pair found at hamming 0
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    want_per_tmpl = n_copy * (n_copy - 1) // 2
    n_found_tmpl = 0
    for t in range(n_tmpl):
        lo = n_hot + t * n_copy
        members = range(lo, lo + n_copy)
        n_found_tmpl += sum(
            1 for x in members for y in members
            if x < y and (x, y) in found
        )
    recall = n_found_tmpl / (n_tmpl * want_per_tmpl)
    # hot template: its buckets exceed the cap in every band, so its pairs
    # are (loudly) dropped — none of the 10k-clique should appear
    hot_pairs = int(((pairs["doc_a"] < n_hot) & (pairs["doc_b"] < n_hot)).sum())
    assert recall == 1.0, f"template recall {recall}"
    assert hot_pairs == 0, f"{hot_pairs} hot-bucket pairs leaked past the cap"
    return {"docs": n, "pairs": int(len(pairs)),
            "template_recall": recall, "hot_pairs_dropped": True,
            "wall_s": round(wall, 1)}


def corpus_clean_stress(tmp: str) -> dict:
    """corpus_clean on the same 1M-doc corpus: one streaming pass with the
    dropped-duplicate broadcast (10k+5k planted duplicate surplus) and the
    length-histogram md5 prune — the round-4 scale path end to end."""
    from wavelet_decomposition_ray.pipelines import data_queries as dq

    # timed section = the pipeline exactly as a user runs it (the dedup
    # extraction happens INSIDE q_corpus_clean — timing a standalone
    # _dropped_dup_ids too would double-count that pass)
    t0 = time.perf_counter()
    n_rows = dq.q_corpus_clean(tmp).count()
    wall = time.perf_counter() - t0
    # untimed exactness check of the dedup side: duplicate surplus =
    # 10k hot copies - 1 survivor + 100 x (50 - 1) normals
    dropped = dq._dropped_dup_ids(tmp)
    assert len(dropped) == (N_HOT - 1) + N_TMPL * (N_COPY - 1), len(dropped)
    # survivors: 985,101 post-dedup, then ~5% holdout + ~1/97 decontam
    # side + quality/contamination predicates -> a tight band, so a
    # filter regression that drops or keeps 10k+ extra docs fails here
    assert 900_000 < n_rows < 940_000, n_rows
    return {"docs": N_DOCS, "dropped_dups": int(len(dropped)),
            "clean_rows": int(n_rows), "wall_s": round(wall, 1)}


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    out = {}
    only = os.environ.get("STRESS_ONLY", "")
    assert only in ("", "simhash", "clean", "cc"), (
        f"STRESS_ONLY={only!r}: valid values are simhash|clean|cc (or "
        "unset for all) — refusing to silently run nothing"
    )
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        if only in ("", "simhash"):
            out["simhash_1m_docs"] = simhash_stress(tmp)
        if only in ("", "clean"):
            if only == "clean":  # corpus not built by the simhash leg
                _build_corpus(tmp)
            out["corpus_clean_1m_docs"] = corpus_clean_stress(tmp)
    if only in ("", "cc"):
        out["cc_6m_edges"] = cc_stress()
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
