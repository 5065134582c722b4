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


def _registry() -> dict[str, tuple]:
    from wavelet_decomposition_ray.pipelines.data_queries import DATA_QUERIES
    from wavelet_decomposition_ray.pipelines.queries import CORE_QUERIES

    merged = dict(CORE_QUERIES)
    merged.update(DATA_QUERIES)
    return merged


def queries() -> dict[str, Callable[[str], Any]]:
    from wavelet_decomposition_ray import synth

    # materialize the synth inputs the oracle SQL reads (idempotent,
    # deterministic, byte-stable)
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        synth.ensure_sequences(sf)
    return {name: fn for name, (fn, _) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _registry().items() if sql is not None}
