"""Engine stage batch-fns vs the NumPy oracle, on real synth batches.
These run on plain pyarrow Tables — no Ray session needed (the fns are what
``map_batches`` executes verbatim)."""

import numpy as np
import pyarrow as pa
import pytest

from wavelet_decomposition_ray import oracle as oc, synth
from wavelet_decomposition_ray.functions.listops import (
    list_to_numpy,
    next_pow2_arr,
    numpy_to_list,
    tumble_starts,
)
from wavelet_decomposition_ray.stages.dwt import DwtTransform, InverseDwt, roundtrip_verify_batch
from wavelet_decomposition_ray.stages.gapfill import gapfill_batch, make_resample_batch, normalize_batch
from wavelet_decomposition_ray.stages.rollup import TierRollup, explode_rollup_batch
from wavelet_decomposition_ray.stages.encode import GorillaEncoder, decode_blocks_batch


@pytest.fixture(scope="module")
def batch():
    return synth.generate_table(120)


def _tokens(batch, i):
    vals, off = list_to_numpy(batch["tokens"])
    return vals[off[i] : off[i + 1]]


def test_listops_roundtrip(batch):
    vals, off = list_to_numpy(batch["tokens"])
    assert off[0] == 0 and off[-1] == len(vals)
    rebuilt = numpy_to_list(vals, off, pa.int32())
    assert rebuilt.equals(batch["tokens"].combine_chunks())
    # sliced column still normalizes correctly
    sl = batch.slice(10, 20)["tokens"]
    v2, o2 = list_to_numpy(sl)
    assert o2[0] == 0 and o2[-1] == len(v2)
    np.testing.assert_array_equal(v2[: o2[1]], _tokens(batch, 10))


def test_next_pow2_arr():
    lens = np.array([1, 2, 3, 255, 256, 257, 1024, 65536, 65537])
    want = np.array([oc.next_pow2(int(x)) for x in lens])
    np.testing.assert_array_equal(next_pow2_arr(lens), want)


def test_tumble_starts_matches_per_row():
    off = np.array([0, 5, 6, 70])
    vals = np.arange(70)
    starts, new_off, counts = tumble_starts(off, 8)
    assert new_off.tolist() == [0, 1, 2, 10]
    s = np.add.reduceat(vals, starts)
    for r in range(3):
        row = vals[off[r] : off[r + 1]]
        want = oc.rollup_tier(row, 8)
        np.testing.assert_array_equal(s[new_off[r] : new_off[r + 1]], want["wsum"])
        np.testing.assert_array_equal(counts[new_off[r] : new_off[r + 1]], want["wcount"])


@pytest.mark.parametrize("bank", oc.BANKS)
def test_dwt_stage_matches_oracle(batch, bank):
    out = DwtTransform(bank)(batch)
    cvals, coff = list_to_numpy(out["coeffs"])
    rt_ok = out["rt_ok"].to_numpy(zero_copy_only=False)
    assert rt_ok.all(), "round-trip invariant failed in stage"
    assert out["rt_max_err"].to_numpy(zero_copy_only=False).max() < 0.5
    for i in range(0, batch.num_rows, 17):
        toks = _tokens(batch, i)
        want = oc.dwt_flat(toks, bank)
        got = cvals[coff[i] : coff[i + 1]]
        np.testing.assert_allclose(got, want, atol=1e-9, err_msg=f"row {i}")


@pytest.mark.parametrize("bank", oc.BANKS)
def test_inverse_dwt_stage(batch, bank):
    fwd = DwtTransform(bank)(batch)
    rec = InverseDwt(bank)(fwd)
    rvals, roff = list_to_numpy(rec["reconstructed"])
    tvals, toff = list_to_numpy(batch["tokens"])
    np.testing.assert_array_equal(np.rint(rvals).astype(np.int32), tvals)
    np.testing.assert_array_equal(np.diff(roff), np.diff(toff))


def test_bandpass_stage_matches_oracle(batch):
    fwd = DwtTransform("haar")(batch)
    bp = InverseDwt("haar", keep_levels=[0, 1], keep_offset=True)(fwd)
    rvals, roff = list_to_numpy(bp["reconstructed"])
    for i in (0, 7, 42):
        toks = _tokens(batch, i)
        flat = oc.dwt_flat(toks, "haar")
        want = oc.bandpass_reconstruct(flat, len(toks), [0, 1], "haar", keep_offset=True)
        np.testing.assert_allclose(rvals[roff[i] : roff[i + 1]], want, atol=1e-9)


def test_roundtrip_verify_stage(batch):
    fwd = DwtTransform("db4", verify=False)(batch)
    out = roundtrip_verify_batch(fwd, "db4")
    assert out["rt_ok"].to_numpy(zero_copy_only=False).all()


def test_rollup_stage_matches_oracle(batch):
    out = TierRollup(10)(batch)
    assert out.num_rows == batch.num_rows * 10
    mins, moff = list_to_numpy(out["mins"])
    sums, _ = list_to_numpy(out["sums"])
    counts, _ = list_to_numpy(out["counts"])
    tiers = out["tier"].to_numpy(zero_copy_only=False)
    docs = out["doc_id"].to_pylist()
    id_to_row = {d: i for i, d in enumerate(batch["doc_id"].to_pylist())}
    for j in range(0, out.num_rows, 37):
        toks = _tokens(batch, id_to_row[docs[j]])
        want = oc.rollup_tier(toks, 1 << int(tiers[j]))
        np.testing.assert_array_equal(mins[moff[j] : moff[j + 1]], want["wmin"])
        np.testing.assert_array_equal(sums[moff[j] : moff[j + 1]], want["wsum"])
        np.testing.assert_array_equal(counts[moff[j] : moff[j + 1]], want["wcount"])


def test_explode_rollup(batch):
    out = TierRollup(3)(batch)
    long = explode_rollup_batch(out)
    n_win = out["n_windows"].to_numpy(zero_copy_only=False)
    assert long.num_rows == int(n_win.sum())
    # spot-check row 0 tier 1 window 0
    toks = _tokens(batch, 0)
    first = long.slice(0, 1).to_pydict()
    assert first["wmin"][0] == int(min(toks[:2]))
    assert first["window_idx"][0] == 0


def test_encoder_roundtrip(batch):
    rolled = TierRollup(5)(batch)
    enc = GorillaEncoder()(rolled)
    assert enc["nbytes"].to_numpy(zero_copy_only=False).sum() > 0
    dec = decode_blocks_batch(enc)
    for col in ("mins", "maxs", "sums", "counts"):
        a, ao = list_to_numpy(rolled[col])
        b, bo = list_to_numpy(dec[col])
        np.testing.assert_array_equal(a, b, err_msg=col)
        np.testing.assert_array_equal(ao, bo)
    # deterministic encoding (resume invariant)
    enc2 = GorillaEncoder()(rolled)
    assert enc["blob"].to_pylist() == enc2["blob"].to_pylist()


def test_gapfill_stage():
    toks = pa.array([[10, -1, 30], [1, 2, 3]], type=pa.list_(pa.int32()))
    t = pa.table({"doc_id": ["a", "b"], "tokens": toks, "source": ["s", "s"]})
    out = gapfill_batch(t)
    got = out["tokens"].to_pylist()
    assert got[0] == [10, 20, 30] and got[1] == [1, 2, 3]
    assert out["n_filled"].to_pylist() == [1, 0]


def test_gapfill_passthrough_gap_free(batch):
    out = gapfill_batch(batch)
    assert out["tokens"].combine_chunks().equals(batch["tokens"].combine_chunks())


def test_resample_stage_matches_oracle(batch):
    out = make_resample_batch(64)(batch)
    rvals, roff = list_to_numpy(out["resampled"])
    assert (np.diff(roff) == 64).all()
    for i in (0, 11, 63):
        toks = _tokens(batch, i)
        want = oc.resample_linear(toks, 64)
        np.testing.assert_allclose(rvals[roff[i] : roff[i + 1]], want, atol=1e-9)


def test_normalize_stage_matches_oracle(batch):
    out = normalize_batch(batch)
    nvals, noff = list_to_numpy(out["normalized"])
    for i in (0, 5):
        toks = _tokens(batch, i)
        want = oc.normalize_mean(toks)
        np.testing.assert_allclose(nvals[noff[i] : noff[i + 1]], want)
