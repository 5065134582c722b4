"""Ray-Data-native time-series rollup / downsample / retention engine.

Public surface:

- :mod:`wavelet_decomposition_ray.oracle` — single-process NumPy semantics
  (DWT, rollups, codecs); no Ray dependency.
- :mod:`wavelet_decomposition_ray.synth` — deterministic sequences-table
  generator (the BASELINE.json input_hint shape).
- :mod:`wavelet_decomposition_ray.stages` — map_batches transforms.
- :mod:`wavelet_decomposition_ray.pipelines.rollup_pipeline` — the flagship
  resumable job (`run_rollup_job`).
- :mod:`wavelet_decomposition_ray.pipelines.queries` /
  :mod:`~.pipelines.data_queries` — the operator registry exposed through
  ``__ray_entry__``.

Never calls ``ray.init``; the caller owns the session.
"""

from . import oracle, synth  # noqa: F401
