"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in the library) initializes or shuts down Ray.

``entry()`` runs the flagship rollup pipeline on sf0.001.  ``queries()``
exposes every implemented operator/pipeline from SURVEY.md §2 (plus the
training-data-pipeline operators) as callables over an ``sf_dir``;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each SQL-expressible
one.  Core-engine queries run over the deterministic synthesized sequences
table (the BASELINE.json input_hint shape); the SQL side reads the identical
parquet bytes via read_parquet.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: sequences -> gap-fill ->
    DWT round-trip verify -> tier rollups -> per-(source, tier) aggregates.
    Returns the (small) aggregate Dataset."""
    from wavelet_decomposition_ray import synth
    from wavelet_decomposition_ray.pipelines import rollup_pipeline as rp

    seq = synth.ensure_sequences("/root/testdata/sf0.001")
    rolled = rp.rollup_dataset(rp.sequences_dataset(seq), bank="haar",
                               n_tiers=10, verify=True, batch_size=128)
    return rp.source_tier_aggregate(rolled)


# The external gate checks the FIRST 50 registry entries: lead with a
# representative mix of both families (core engine + data pipeline) so the
# driver re-verifies dedup/ANN/text/join queries every round instead of only
# the core block (VERDICT r3 #1).  Everything else follows in definition
# order; _PRIORITY names missing from the registry fail the registry pytest.
_PRIORITY = [
    # core §2 pins
    "rollup_t1", "rollup_t3", "rollup_t6", "source_stats", "store_stats",
    "store_tier3", "haar_l1", "roundtrip_haar", "roundtrip_db4",
    "aggtree_ok", "codec_ok", "epn_quantiles", "epn_full", "epn_full_sine",
    "parseval_ok", "resample64", "bandpass_coarse", "scale_energy",
    "fft_magnitude", "dwt_haar", "dwt_db4", "gorilla_blocks", "normalize",
    "cross_source_diff", "topk_tokens", "source_stats_salted",
    "source_stats_subset", "source_stats_t15",
    # late core additions + the join family (unchecked by the r3 driver)
    "store_refresh", "m4_downsample", "lttb_downsample", "corpus_pack512",
    "top_orders_q3", "profit_by_nation_year", "order_priority_skewjoin",
    "orders_no_lineitem", "revenue_by_region",
    # data-pipeline family (unchecked by the r3 driver)
    "dedup_exact", "dedup_exact_keep", "dedup_minhash", "dedup_simhash",
    "dedup_keep", "ann_ivf", "ann_lsh", "knn_cosine", "lang_id",
    "token_count_bpe", "fingerprint_rolling", "corpus_clean", "decontam",
]


def _registry() -> dict[str, tuple]:
    from wavelet_decomposition_ray.pipelines.data_queries import DATA_QUERIES
    from wavelet_decomposition_ray.pipelines.queries import CORE_QUERIES

    merged = dict(CORE_QUERIES)
    merged.update(DATA_QUERIES)
    ordered = {name: merged[name] for name in _PRIORITY}
    ordered.update(merged)
    return ordered


def queries() -> dict[str, Callable[[str], Any]]:
    from wavelet_decomposition_ray import synth

    # materialize the synth inputs the oracle SQL reads (idempotent,
    # deterministic, byte-stable)
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        synth.ensure_sequences(sf)
    return {name: fn for name, (fn, _) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _registry().items() if sql is not None}
