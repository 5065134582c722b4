"""Incremental refresh (continuous-aggregate) semantics of the retention
store: appended/removed docs invalidate ONLY the buckets they hash into, the
refreshed store is byte-identical to a from-scratch build on the new input,
and an unchanged input refreshes nothing."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from wavelet_decomposition_ray import synth
from wavelet_decomposition_ray.functions.dedup import _stable_u64
from wavelet_decomposition_ray.pipelines import rollup_pipeline as rp
from wavelet_decomposition_ray.state import manifest as mf

SF = "/root/testdata/sf0.001"
NB = 16


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("refresh"))
    seq = synth.ensure_sequences(SF)
    tbl = pads.dataset(seq).to_table()
    ids = tbl["doc_id"].to_pylist()
    appended = sorted(i for i in ids if _stable_u64(f"t:{i}") % 20 == 0)
    assert appended and len(appended) < len(ids) // 4
    keep = pa.array([i not in set(appended) for i in ids], type=pa.bool_())
    sub = os.path.join(base, "subset")
    os.makedirs(sub)
    pq.write_table(tbl.filter(keep), os.path.join(sub, "part-0.parquet"))
    full = os.path.join(base, "full")
    os.makedirs(full)
    pq.write_table(tbl, os.path.join(full, "part-0.parquet"))
    return base, sub, full, appended


def _run(inp, out, **kw):
    return rp.run_rollup_job(
        inp, out, bank="haar", n_tiers=6, n_buckets=NB, verify=False,
        batch_size=128, encoder_concurrency=(1, 2), **kw
    )


def _checksums(out):
    return {r["bucket"]: r["checksum"] for r in mf.read_manifest(out)}


def _stats(out):
    return (
        pq.read_table(os.path.join(out, "source_stats.parquet"))
        .to_pandas()
        .sort_values(["source", "tier"])
        .reset_index(drop=True)
    )


def test_refresh_append_rewrites_only_stale_buckets(corpus):
    base, sub, full, appended = corpus
    incr = os.path.join(base, "incr")
    scratch = os.path.join(base, "scratch")
    _run(sub, incr)
    expected_stale = set(mf.bucket_of_ids(appended, NB).tolist())
    assert 0 < len(expected_stale) < NB  # some buckets must stay untouched

    r = _run(full, incr, refresh=True)
    assert r["buckets_refreshed"] == len(expected_stale)
    assert r["buckets_written"] == len(expected_stale)

    _run(full, scratch)
    assert _checksums(incr) == _checksums(scratch)
    pd.testing.assert_frame_equal(_stats(incr), _stats(scratch))


def test_refresh_noop_on_unchanged_input(corpus):
    base, _, full, _ = corpus
    incr = os.path.join(base, "incr")  # refreshed to `full` by the test above
    r = _run(full, incr, refresh=True)
    assert r["buckets_refreshed"] == 0
    assert r["buckets_written"] == 0


def test_refresh_handles_removals(corpus):
    base, sub, full, appended = corpus
    store = os.path.join(base, "shrink")
    _run(full, store)
    expected_stale = set(mf.bucket_of_ids(appended, NB).tolist())

    r = _run(sub, store, refresh=True)
    assert r["buckets_refreshed"] == len(expected_stale)

    scratch_sub = os.path.join(base, "scratch_sub")
    _run(sub, scratch_sub)
    assert _checksums(store) == _checksums(scratch_sub)
    pd.testing.assert_frame_equal(_stats(store), _stats(scratch_sub))


def test_legacy_manifest_rows_count_as_stale(corpus):
    base, sub, _, _ = corpus
    store = os.path.join(base, "legacy")
    _run(sub, store)
    # strip the fingerprint from one bucket's manifest row (pre-fingerprint
    # store): refresh must treat it as stale and rewrite it
    import json

    mdir = mf.manifest_dir(store)
    target = sorted(
        f for f in os.listdir(mdir)
        if f.startswith("bucket-") and f.endswith(".json")
    )[0]
    path = os.path.join(mdir, target)
    row = json.load(open(path))
    row.pop("doc_xor")
    with open(path, "w") as fh:
        json.dump(row, fh, sort_keys=True)

    before = _checksums(store)
    r = _run(sub, store, refresh=True)
    assert r["buckets_refreshed"] == 1
    assert _checksums(store) == before  # deterministic rewrite


def test_validate_store_detects_corruption(ray_session, tmp_path):
    """The store fsck passes on a fresh store, then catches every
    corruption class: flipped bytes (checksum), a deleted partials
    sidecar, and a missing data file."""
    import json
    import os
    import shutil

    from wavelet_decomposition_ray.pipelines import rollup_pipeline as rp
    from wavelet_decomposition_ray.state import manifest as mf
    from wavelet_decomposition_ray.state.validate import validate_store
    from wavelet_decomposition_ray import synth

    seq = synth.ensure_sequences("/root/testdata/sf0.001")
    out = str(tmp_path / "store")
    rp.run_rollup_job(seq, out, bank="haar", n_tiers=6, n_buckets=4,
                      batch_size=64, verify=False)

    ok = validate_store(out)
    assert ok["ok"], ok["errors"]
    assert ok["buckets"] == 4

    rows = [r for r in mf.read_manifest(out) if r.get("file")]
    victim = os.path.join(out, rows[0]["file"])

    # 1) bit-rot: flip one byte mid-file
    orig = open(victim, "rb").read()
    bad = bytearray(orig)
    bad[len(bad) // 2] ^= 0xFF
    open(victim, "wb").write(bytes(bad))
    res = validate_store(out, distributed=False)
    assert not res["ok"] and any("checksum" in e for e in res["errors"])
    open(victim, "wb").write(orig)

    # 2) missing partials sidecar
    pfile = os.path.join(mf.manifest_dir(out),
                         f"partials-{rows[0]['bucket']:05d}.parquet")
    moved = pfile + ".bak"
    shutil.move(pfile, moved)
    res = validate_store(out, distributed=False)
    assert not res["ok"] and any("partials" in e for e in res["errors"])
    shutil.move(moved, pfile)

    # 3) missing data file
    shutil.move(victim, victim + ".bak")
    res = validate_store(out, distributed=False)
    assert not res["ok"] and any("missing" in e for e in res["errors"])
    shutil.move(victim + ".bak", victim)

    assert validate_store(out, distributed=False)["ok"]


def test_read_store_api(ray_session, tmp_path):
    """sources.store.read_store: decoded rows equal the hand-rolled
    read+decode, tier/source predicates prune correctly, decode=False
    returns raw encoded rows."""
    from wavelet_decomposition_ray import synth
    from wavelet_decomposition_ray.pipelines import rollup_pipeline as rp
    from wavelet_decomposition_ray.sources.store import read_store

    seq = synth.ensure_sequences("/root/testdata/sf0.001")
    out = str(tmp_path / "store")
    rp.run_rollup_job(seq, out, bank="haar", n_tiers=6, n_buckets=4,
                      batch_size=64, verify=False)

    full = read_store(out).to_pandas()
    assert set(full["tier"].unique()) == set(range(1, 7))
    assert {"mins", "maxs", "sums", "counts"} <= set(full.columns)

    t3 = read_store(out, tiers=[3]).to_pandas()
    assert (t3["tier"] == 3).all()
    assert len(t3) == (full["tier"] == 3).sum()

    src = sorted(full["source"].unique())[0]
    sub = read_store(out, tiers=[2, 3], sources=[src]).to_pandas()
    assert set(sub["tier"].unique()) <= {2, 3}
    assert (sub["source"] == src).all()

    raw = read_store(out, decode=False).to_pandas()
    assert "blob" in raw.columns and len(raw) == len(full)


def test_compact_store_byte_identical_to_fresh_build(ray_session, tmp_path):
    """Compacting a 16-bucket store to 4 buckets must produce byte-for-
    byte the files a from-scratch 4-bucket build writes, pass fsck, and
    answer source_stats identically; a rerun skips everything."""
    import hashlib
    import os

    from wavelet_decomposition_ray import synth
    from wavelet_decomposition_ray.pipelines import rollup_pipeline as rp
    from wavelet_decomposition_ray.state.compact import compact_store
    from wavelet_decomposition_ray.state.validate import validate_store

    seq = synth.ensure_sequences("/root/testdata/sf0.001")
    many = str(tmp_path / "many")
    rp.run_rollup_job(seq, many, bank="haar", n_tiers=6, n_buckets=16,
                      batch_size=64, verify=False)
    fresh = str(tmp_path / "fresh4")
    rp.run_rollup_job(seq, fresh, bank="haar", n_tiers=6, n_buckets=4,
                      batch_size=64, verify=False)

    dst = str(tmp_path / "compacted")
    s1 = compact_store(many, dst, n_buckets=4)
    assert s1["buckets_written"] == 4

    def hashes(root):
        out = {}
        d = os.path.join(root, "data")
        for f in sorted(os.listdir(d)):
            with open(os.path.join(d, f), "rb") as fh:
                out[f] = hashlib.md5(fh.read()).hexdigest()
        return out

    assert hashes(dst) == hashes(fresh)
    assert validate_store(dst, distributed=False)["ok"]

    s2 = compact_store(many, dst, n_buckets=4)
    assert s2 == {"buckets_written": 0, "buckets_skipped": 4}


def test_compact_store_marks_empty_buckets_and_writes_source_stats(
    ray_session, tmp_path
):
    """ADVICE r3: compaction into a bucket count where some destination
    buckets own no doc_ids must (a) mark those buckets explicitly empty so
    the manifest matches a from-scratch build and resume short-circuits,
    (b) fold the partials into source_stats.parquet, and (c) a rerun over
    the complete store must skip cleanly (no empty-dataset shuffle crash)."""
    import os

    import pandas as pd

    from wavelet_decomposition_ray import synth
    from wavelet_decomposition_ray.pipelines import rollup_pipeline as rp
    from wavelet_decomposition_ray.state import manifest as mf
    from wavelet_decomposition_ray.state.compact import compact_store

    seq = synth.ensure_sequences("/root/testdata/sf0.001")
    src = str(tmp_path / "src")
    rp.run_rollup_job(seq, src, bank="haar", n_tiers=4, n_buckets=4,
                      batch_size=64, verify=False)

    # 64 destination buckets over a tiny corpus -> some buckets are empty
    dst = str(tmp_path / "wide")
    compact_store(src, dst, n_buckets=64)
    assert mf.completed_buckets(dst) == frozenset(range(64))

    fresh = str(tmp_path / "fresh64")
    rp.run_rollup_job(seq, fresh, bank="haar", n_tiers=4, n_buckets=64,
                      batch_size=64, verify=False)
    a = pd.read_parquet(os.path.join(dst, "source_stats.parquet"))
    b = pd.read_parquet(os.path.join(fresh, "source_stats.parquet"))
    pd.testing.assert_frame_equal(a, b)

    # rerun over the complete store: pure skip, and source_stats survives
    s = compact_store(src, dst, n_buckets=64)
    assert s["buckets_written"] == 0 and s["buckets_skipped"] == 64
    assert os.path.isfile(os.path.join(dst, "source_stats.parquet"))
