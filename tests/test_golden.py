"""Golden-fixture regression (FIXTURES.md F3): the ENGINE's stage outputs
must match the committed oracle-generated parquet exactly — a drift guard
independent of the oracle code itself."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from wavelet_decomposition_ray import synth
from wavelet_decomposition_ray.functions.listops import list_to_numpy
from wavelet_decomposition_ray.stages.dwt import DwtTransform
from wavelet_decomposition_ray.stages.encode import RollupEncode
from wavelet_decomposition_ray.stages.rollup import TierRollup, explode_rollup_batch

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture(scope="module")
def tab():
    return synth.generate_table(synth.n_rows_for("sf0.001"))


@pytest.mark.parametrize("bank", ["haar", "db4"])
def test_engine_coeffs_match_golden(tab, bank):
    golden = pq.read_table(os.path.join(GOLDEN, f"coeffs_{bank}.parquet"))
    gvals, goff = list_to_numpy(golden["values"])
    out = DwtTransform(bank, verify=False)(tab)
    cvals, coff = list_to_numpy(out["coeffs"])
    # golden is per-(doc, level); engine is flat per doc in level order, so
    # the concatenation per doc must match exactly
    gdocs = golden["doc_id"].to_pylist()
    pos_by_doc = {}
    cursor = {}
    for j, d in enumerate(gdocs):
        seg = gvals[goff[j] : goff[j + 1]]
        pos_by_doc.setdefault(d, []).append(seg)
    for i, d in enumerate(tab["doc_id"].to_pylist()):
        want = np.concatenate(pos_by_doc[d])
        got = cvals[coff[i] : coff[i + 1]]
        np.testing.assert_array_equal(got, want, err_msg=f"{d} {bank}")


def test_engine_rollups_match_golden(tab):
    golden = pq.read_table(os.path.join(GOLDEN, "rollups.parquet")).to_pandas()
    out = explode_rollup_batch(TierRollup(8)(tab)).to_pandas()
    out = out[out.tier.isin([1, 4, 8])]
    key = ["doc_id", "tier", "window_idx"]
    got = out.sort_values(key).reset_index(drop=True)
    want = golden.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want)
    for c in ("wmin", "wmax", "wsum", "wcount"):
        np.testing.assert_array_equal(
            got[c].to_numpy().astype(np.int64), want[c].to_numpy().astype(np.int64),
            err_msg=c,
        )


def test_engine_blobs_match_golden(tab):
    golden = pq.read_table(os.path.join(GOLDEN, "encoded.parquet"))
    gmap = {
        (d, t): b
        for d, t, b in zip(golden["doc_id"].to_pylist(), golden["tier"].to_pylist(),
                           golden["blob"].to_pylist())
    }
    out = RollupEncode(10)(tab)
    for d, t, b in zip(out["doc_id"].to_pylist(), out["tier"].to_pylist(),
                       out["blob"].to_pylist()):
        assert gmap[(d, t)] == b, (d, t)
