"""Oracle rollups: brute-force equivalence, aggregate-tree consistency,
EPN order statistics, gap-fill and resample (FIXTURES.md invariants 2-3)."""

import numpy as np
import pytest

from wavelet_decomposition_ray import oracle as oc


def brute_rollup(t, w):
    out = {"wmin": [], "wmax": [], "wsum": [], "wcount": []}
    for i in range(0, len(t), w):
        chunk = t[i : i + w].astype(np.int64)
        out["wmin"].append(chunk.min())
        out["wmax"].append(chunk.max())
        out["wsum"].append(chunk.sum())
        out["wcount"].append(len(chunk))
    return {k: np.array(v) for k, v in out.items()}


@pytest.mark.parametrize("n", [1, 2, 7, 64, 1000, 1025])
@pytest.mark.parametrize("w", [2, 4, 8, 64, 1024])
def test_rollup_vs_brute(n, w):
    rng = np.random.default_rng(n * w)
    t = rng.integers(0, 1 << 20, size=n).astype(np.int32)
    got = oc.rollup_tier(t, w)
    want = brute_rollup(t, w)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


@pytest.mark.parametrize("n", [1, 5, 64, 360, 1000, 4096, 17521])
def test_aggregate_tree_equals_direct(n):
    rng = np.random.default_rng(n)
    t = rng.integers(0, 1 << 20, size=n).astype(np.int32)
    direct = oc.rollup_all_tiers(t, n_tiers=10)
    tree = oc.rollup_tree(t, n_tiers=10)
    for tier in range(1, 11):
        for k in ("wmin", "wmax", "wsum", "wcount"):
            np.testing.assert_array_equal(tree[tier][k], direct[tier][k],
                                          err_msg=f"tier {tier} {k}")


def test_rollup_sums_int64_no_overflow():
    t = np.full(1 << 12, (1 << 20) - 1, dtype=np.int32)
    r = oc.rollup_tier(t, 1 << 12)
    assert r["wsum"][0] == (1 << 12) * ((1 << 20) - 1)


def test_epn_order_stat_rule():
    # ceil(s*n/100)-1 on the ascending sort (calc_EPN.py:23-24,32-33)
    v = np.arange(1, 11, dtype=float)  # n=10
    assert oc.epn_order_stat(v, 100.0) == 10.0
    assert oc.epn_order_stat(v, 95.0) == 10.0   # ceil(9.5)-1 = 9
    assert oc.epn_order_stat(v, 90.0) == 9.0    # ceil(9)-1 = 8
    assert oc.epn_order_stat(v, 1.0) == 1.0


def test_epn_stats_shapes():
    rng = np.random.default_rng(0)
    s = oc.epn_stats(rng.normal(size=1000), satisfactions=(80, 95, 99, 100))
    for key in ("pmax", "emax", "n", "uf", "serv"):
        assert len(s[key]) == 4
    assert s["pmax"][0] <= s["pmax"][3]  # monotone in satisfaction


def test_gapfill_interp():
    t = np.array([10, -1, -1, 40, -1, 60], dtype=np.int32)
    got = oc.gapfill_interp(t)
    np.testing.assert_array_equal(got, [10, 20, 30, 40, 50, 60])
    # edge gaps extend nearest valid
    t2 = np.array([-1, 5, -1], dtype=np.int32)
    np.testing.assert_array_equal(oc.gapfill_interp(t2), [5, 5, 5])
    # no gaps: identity
    t3 = np.array([1, 2, 3], dtype=np.int32)
    np.testing.assert_array_equal(oc.gapfill_interp(t3), t3)


def test_resample_linear_matches_reference_grid():
    # constant stays constant; linear ramp stays linear under the
    # (i+1)/len grid convention of import_excel.py:48-52
    c = oc.resample_linear(np.full(48, 5.0), 64)
    np.testing.assert_allclose(c, 5.0)
    r = oc.resample_linear(np.arange(48, dtype=float), 64)
    assert r[0] >= 0 and np.isclose(r[-1], 47.0)
    assert np.all(np.diff(r) >= -1e-12)


def test_normalize_mean():
    t = np.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(oc.normalize_mean(t).mean(), 1.0)


def test_reference_15_tier_ladder_lengths():
    """Reference parity: the paper's 15-scale pyramid over a 11680-point
    year (wavelet_decomposition.py:260-292) — window counts per tier must
    be ceil(11680 / 2^t) for t = 1..15 (golden sequence from SURVEY §1.1)."""
    toks = np.arange(11680, dtype=np.int64) % 97
    want = [5840, 2920, 1460, 730, 365, 183, 92, 46, 23, 12, 6, 3, 2, 1, 1]
    assert want == [int(np.ceil(11680 / 2**t)) for t in range(1, 16)]
    for t, w in zip(range(1, 16), want):
        r = oc.rollup_tier(toks, 1 << t)
        assert len(r["wmin"]) == w, f"tier {t}"
    # engine stage agrees: TierRollup(15) emits the same ladder
    import pyarrow as pa

    from wavelet_decomposition_ray.functions.listops import numpy_to_list
    from wavelet_decomposition_ray.stages.rollup import TierRollup

    off = np.array([0, len(toks)], dtype=np.int64)
    batch = pa.table(
        {
            "doc_id": pa.array(["d0"]),
            "source": pa.array(["s0"]),
            "tokens": numpy_to_list(toks.astype(np.int32), off, pa.int32()),
        }
    )
    out = TierRollup(15)(batch)
    got = {
        int(t): int(n)
        for t, n in zip(out["tier"].to_pylist(), out["n_windows"].to_pylist())
    }
    assert got == {t: w for t, w in zip(range(1, 16), want)}
