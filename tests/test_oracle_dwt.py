"""Oracle DWT: hand-computed micro-cases, orthonormality, perfect
reconstruction, serialization convention, band-pass masking (SURVEY.md §5.2)."""

import numpy as np
import pytest

from wavelet_decomposition_ray import oracle as oc


def test_filter_banks_orthonormal():
    for bank in oc.BANKS:
        lo, hi = oc.filter_pair(bank)
        k = len(lo)
        assert np.isclose(lo @ lo, 1.0)
        assert np.isclose(hi @ hi, 1.0)
        # QMF conditions: autocorrelation zero at even nonzero lags,
        # cross-correlation zero at every even lag
        for lag in range(2, k, 2):
            assert abs(np.dot(lo[:-lag], lo[lag:])) < 1e-12
            assert abs(np.dot(hi[:-lag], hi[lag:])) < 1e-12
        for lag in range(0, k, 2):
            a = np.dot(lo[: k - lag], hi[lag:]) if lag else np.dot(lo, hi)
            assert abs(a) < 1e-12


def test_haar8_hand_computed():
    # textbook 3-level orthonormal Haar pyramid of [1..8]
    x = np.arange(1, 9, dtype=float)
    levels = oc.dwt_pyramid(x[None, :], "haar")
    s2 = np.sqrt(2.0)
    np.testing.assert_allclose(levels[0][0], [-1 / s2] * 4)          # D1
    np.testing.assert_allclose(levels[1][0], [-2.0, -2.0])           # D2
    np.testing.assert_allclose(levels[2][0], [-8.0 / s2])            # D3
    np.testing.assert_allclose(levels[3][0], [36.0 / s2 / 2])        # A3 = sum/sqrt(8)
    # energy preservation (orthonormal transform)
    flat = np.concatenate([l[0] for l in levels])
    assert np.isclose(flat @ flat, x @ x)


def test_const_row_all_details_zero():
    x = np.full((1, 512), 7.0)
    for bank in oc.BANKS:
        levels = oc.dwt_pyramid(x, bank)
        for d in levels[:-1]:
            np.testing.assert_allclose(d, 0.0, atol=1e-9)
        assert np.isclose(levels[-1][0, 0], 7.0 * np.sqrt(512))


@pytest.mark.parametrize("bank", oc.BANKS)
@pytest.mark.parametrize("n", [1, 2, 4, 8, 64, 256, 1024])
def test_perfect_reconstruction_dyadic(bank, n):
    rng = np.random.default_rng(7 + n)
    x = rng.integers(0, 1 << 20, size=(5, n)).astype(float)
    rec = oc.idwt_pyramid(oc.dwt_pyramid(x, bank), bank)
    np.testing.assert_allclose(rec, x, atol=1e-6 * max(1, n))
    # float error bound so silent drift is caught (SURVEY.md §7.3)
    assert np.max(np.abs(rec - x)) < 0.5


@pytest.mark.parametrize("bank", oc.BANKS)
@pytest.mark.parametrize("n", [1, 3, 5, 360, 1000, 1025, 17520])
def test_roundtrip_tokens_nondyadic(bank, n):
    rng = np.random.default_rng(n)
    toks = rng.integers(0, 1 << 20, size=n).astype(np.int32)
    assert np.array_equal(oc.roundtrip_tokens(toks, bank), toks)


def test_serialization_convention():
    # finest-first, reversed within level (wavelet_decomposition.py:290)
    x = np.arange(1, 9, dtype=float)
    levels = oc.dwt_pyramid(x[None, :], "haar")
    flat = oc.serialize_pyramid([l[0] for l in levels])
    assert len(flat) == 8
    np.testing.assert_allclose(flat[:4], levels[0][0][::-1])
    np.testing.assert_allclose(flat[4:6], levels[1][0][::-1])
    back = oc.deserialize_pyramid(flat)
    for a, b in zip(back, levels):
        np.testing.assert_allclose(a, b[0])
    assert oc.level_lengths(8) == [4, 2, 1, 1]


def test_dwt_flat_pads_nondyadic():
    toks = np.arange(5, dtype=np.int32)
    flat = oc.dwt_flat(toks, "haar")
    assert len(flat) == 8
    rec = oc.idwt_flat(flat, 5, "haar")
    np.testing.assert_allclose(rec, toks, atol=1e-9)


def test_bandpass_reconstruct_partition():
    # summing the reconstructions from each level alone + offset == full signal
    # (the reference's preplotprocessing decomposition, wavelet_decomposition.py:325-358)
    rng = np.random.default_rng(3)
    toks = rng.integers(0, 1000, size=64).astype(np.int32)
    flat = oc.dwt_flat(toks, "haar")
    n_levels = len(oc.level_lengths(64)) - 1
    total = oc.bandpass_reconstruct(flat, 64, [], "haar", keep_offset=True)
    for lvl in range(n_levels):
        total = total + oc.bandpass_reconstruct(flat, 64, [lvl], "haar")
    np.testing.assert_allclose(total, toks, atol=1e-8)


def test_impulse_locality_haar():
    # an impulse excites exactly one coefficient per Haar level
    x = np.zeros((1, 64))
    x[0, 37] = 1000.0
    for d in oc.dwt_pyramid(x, "haar")[:-1]:
        assert np.count_nonzero(np.abs(d[0]) > 1e-9) == 1
