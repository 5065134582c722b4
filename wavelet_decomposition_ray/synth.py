"""Deterministic synthesizer for the mandated input table
``(doc_id:string, tokens:list<int32>, n_tok:int32, source:string)``
(BASELINE.json input_hint; FIXTURES.md F1/F2).

Content is electricity-load-style, mirroring the reference's signals
(``/root/reference/import_excel.py:13-57``): base level + daily sinusoid
(period 64 samples = the reference's ndpd=64, tutorial cell 9) + weekly
square-wave modulation (period 448 = 7*64) + seeded integer noise, quantized
to non-negative int32 < 2**20. Lengths mix dyadic and non-dyadic values plus
a heavy tail (FIXTURES.md F1) to exercise padding and straggler handling.
``source`` is Zipf-skewed over 8 sources to exercise salted/skew-aware
aggregation. Everything is a pure function of (seed, n_rows) — no wall-clock,
no external data.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
DAY = 64          # samples per "day" (reference ndpd=64, tutorial cell 9)
WEEK = 7 * DAY    # 448
MAX_TOKEN = (1 << 20) - 1

# length -> probability (FIXTURES.md F1 mixture: dyadic + non-dyadic + tail)
LENGTHS = np.array([256, 360, 1000, 1024, 4096, 17520, 65536])
LENGTH_P = np.array([0.30, 0.20, 0.20, 0.20, 0.095, 0.004, 0.001])

SOURCES = [f"src-{i}" for i in range(8)]
SOURCE_P = np.array([0.40, 0.20, 0.12, 0.08, 0.06, 0.05, 0.05, 0.04])

ROWS_BY_SF = {"sf0.001": 200, "sf0.01": 2000, "sf0.1": 24000}

SYNTH_ROOT = "/tmp/graft_synth"


def n_rows_for(sf_name: str) -> int:
    if sf_name in ROWS_BY_SF:
        return ROWS_BY_SF[sf_name]
    try:
        sf = float(sf_name.replace("sf", ""))
    except ValueError:
        sf = 0.001
    return max(200, int(200_000 * sf))


def _probe_rows() -> list[tuple[str, np.ndarray, str]]:
    """Closed-form probe rows (FIXTURES.md F2), carried over from the
    reference's own informal checks (tutorial cells 13-15; SURVEY.md §5.1)."""
    L = 1024
    k = 128
    square = np.concatenate(
        [np.full(k, 2), np.zeros(k), np.ones(L - 2 * k)]
    ).astype(np.int32)  # the tutorial's hand-built test signal, scaled down
    t = np.arange(L)
    sine = np.rint(1000 + 500 * np.sin(2 * np.pi * t / L)).astype(np.int32)
    impulse = np.zeros(256, dtype=np.int32)
    impulse[37] = 1000
    return [
        ("probe-const", np.full(512, 7, dtype=np.int32), "probe"),
        ("probe-square", square, "probe"),
        ("probe-haar8", np.arange(1, 9, dtype=np.int32), "probe"),
        ("probe-sine", sine, "probe"),
        ("probe-impulse", impulse, "probe"),
    ]


def generate_table(n_rows: int, seed: int = SEED) -> pa.Table:
    """Build the sequences table deterministically. Row i has
    doc_id = f"doc-{i:08d}"; the 5 probe rows are appended at the end."""
    rng = np.random.default_rng([seed, n_rows])
    lens = rng.choice(LENGTHS, size=n_rows, p=LENGTH_P).astype(np.int64)
    src_idx = rng.choice(len(SOURCES), size=n_rows, p=SOURCE_P)
    base = rng.uniform(500, 5000, size=n_rows)
    amp_day = rng.uniform(50, 2000, size=n_rows)
    amp_week = rng.uniform(10, 500, size=n_rows)
    phase = rng.uniform(0, 2 * np.pi, size=n_rows)
    noise_sigma = rng.uniform(1, 50, size=n_rows)
    # per-row noise seeds so generation order inside length-groups is irrelevant
    noise_seed = rng.integers(0, 2**31, size=n_rows)

    flat_parts: dict[int, np.ndarray] = {}
    for L in np.unique(lens):
        rows = np.nonzero(lens == L)[0]
        t = np.arange(L)
        day_wave = np.sin(2 * np.pi * (t % DAY) / DAY)
        week_wave = np.sign(np.sin(2 * np.pi * t / WEEK))
        vals = (
            base[rows, None]
            + amp_day[rows, None] * np.sin(2 * np.pi * (t[None, :] % DAY) / DAY + phase[rows, None])
            + amp_week[rows, None] * week_wave[None, :]
        )
        del day_wave
        for j, r in enumerate(rows):
            nr = np.random.default_rng(noise_seed[r])
            vals[j] += nr.normal(0, noise_sigma[r], size=L)
        toks = np.clip(np.rint(vals), 0, MAX_TOKEN).astype(np.int32)
        for j, r in enumerate(rows):
            flat_parts[r] = toks[j]

    doc_ids = [f"doc-{i:08d}" for i in range(n_rows)]
    sources = [SOURCES[i] for i in src_idx]
    token_arrays = [flat_parts[i] for i in range(n_rows)]
    for pid, ptoks, psrc in _probe_rows():
        doc_ids.append(pid)
        sources.append(psrc)
        token_arrays.append(ptoks)

    n_tok = np.array([len(a) for a in token_arrays], dtype=np.int32)
    offsets = np.zeros(len(token_arrays) + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    flat = np.concatenate(token_arrays) if token_arrays else np.zeros(0, np.int32)
    assert offsets[-1] < 2**31, "single-table synth exceeds int32 list offsets"
    tokens_col = pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32)), pa.array(flat, type=pa.int32())
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "tokens": tokens_col,
            "n_tok": pa.array(n_tok, type=pa.int32()),
            "source": pa.array(sources, type=pa.string()),
        }
    )


def sequences_dir(sf_name: str, root: str = SYNTH_ROOT) -> str:
    return os.path.join(root, sf_name, "sequences")


def _sf_name(sf_dir: str) -> str:
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    return sf_name if sf_name.startswith("sf") else "sf0.001"


def benchmark_path(sf_name: str, root: str = SYNTH_ROOT) -> str:
    return os.path.join(root, sf_name, "benchmark.parquet")


def ensure_benchmark(sf_dir: str, mod: int = 97, root: str = SYNTH_ROOT) -> str:
    """Idempotently materialize the SEPARATE benchmark (eval-suite) table
    the real-world decontamination shape reads (VERDICT r4 #5): columns
    ``(bench_id:int64, text:string)``. Derived deterministically from the
    driver's ``documents.parquet`` at ``sf_dir`` — the rows with
    ``doc_id % mod == 0`` — so benchmark grams genuinely collide with the
    corpus; the point of the table is that a decontam query can read its
    side from this eval-suite-sized input instead of re-scanning the whole
    corpus to carve the same rows out."""
    out = benchmark_path(_sf_name(sf_dir), root)
    if os.path.isfile(out):
        return out
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = docs["doc_id"].to_numpy()
    bench = docs.filter(pa.array(ids % mod == 0)).rename_columns(
        ["bench_id", "text"]
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = f"{out}.tmp-{os.getpid()}"
    pq.write_table(bench, tmp)
    os.replace(tmp, out)  # atomic; racing writers produce identical bytes
    return out


def ensure_sequences(sf_dir: str, root: str = SYNTH_ROOT, shard_rows: int = 2000) -> str:
    """Idempotently materialize the synth table for a testdata dir (e.g.
    ``/root/testdata/sf0.1`` -> ``/tmp/graft_synth/sf0.1/sequences/``) as a
    directory of parquet shards. Deterministic: same bytes every run
    (atomic tmp-dir rename; re-runs are no-ops)."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    if not sf_name.startswith("sf"):
        sf_name = "sf0.001"
    out = sequences_dir(sf_name, root)
    if os.path.isdir(out) and os.listdir(out):
        return out
    table = generate_table(n_rows_for(sf_name))
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    n = table.num_rows
    shard = 0
    for lo in range(0, n, shard_rows):
        part = table.slice(lo, min(shard_rows, n - lo))
        pq.write_table(part, os.path.join(tmp, f"part-{shard:05d}.parquet"),
                       row_group_size=500)
        shard += 1
    try:
        os.rename(tmp, out)
    except OSError:
        # lost a race with a concurrent writer; theirs is byte-identical
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    return out
