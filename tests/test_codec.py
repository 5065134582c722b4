"""Gorilla XOR + delta-of-delta codec: round-trip identity on adversarial
and random streams; block framing determinism (FIXTURES.md invariant 4)."""

import numpy as np
import pytest

from wavelet_decomposition_ray import oracle as oc


@pytest.mark.parametrize(
    "vals",
    [
        [],
        [0.0],
        [1.5, 1.5, 1.5],
        [0.0, -0.0, 1e300, -1e300, 5e-324, np.pi],
        [float(x) for x in range(100)],
    ],
)
def test_gorilla_roundtrip_cases(vals):
    v = np.array(vals, dtype=np.float64)
    enc = oc.gorilla_encode(v)
    dec = oc.gorilla_decode(enc, len(v))
    np.testing.assert_array_equal(dec.view(np.uint64), v.view(np.uint64))


def test_gorilla_roundtrip_random():
    rng = np.random.default_rng(11)
    for n in (1, 2, 17, 1000):
        v = rng.normal(scale=1e6, size=n)
        v[rng.random(n) < 0.3] = v[0]  # repeats exercise the '0' branch
        dec = oc.gorilla_decode(oc.gorilla_encode(v), n)
        np.testing.assert_array_equal(dec, v)


def test_gorilla_compresses_smooth_series():
    t = np.arange(4096)
    v = np.float64(100.0) + 0 * t  # constant
    enc = oc.gorilla_encode(v)
    assert len(enc) * 8 / len(v) < 2.0  # ~1 bit/point on constants


@pytest.mark.parametrize(
    "vals",
    [
        [],
        [0],
        [5, 5, 5, 5],
        [0, 1, 3, 6, 10],
        [2**62, -(2**62), 0, 1],
        [-(2**63), 2**63 - 1],
    ],
)
def test_dod_roundtrip_cases(vals):
    v = np.array(vals, dtype=np.int64)
    dec = oc.dod_decode(oc.dod_encode(v), len(v))
    np.testing.assert_array_equal(dec, v)


def test_dod_roundtrip_random():
    rng = np.random.default_rng(13)
    for n in (1, 2, 100, 5000):
        v = np.cumsum(rng.integers(-1000, 1000, size=n)).astype(np.int64)
        dec = oc.dod_decode(oc.dod_encode(v), n)
        np.testing.assert_array_equal(dec, v)


def test_dod_compresses_regular_series():
    v = np.arange(0, 10_000, 8, dtype=np.int64)  # constant delta -> dod=0
    enc = oc.dod_encode(v)
    assert len(enc) * 8 / len(v) < 1.2


def test_rollup_block_roundtrip_and_determinism():
    rng = np.random.default_rng(5)
    t = rng.integers(0, 1 << 20, size=1000).astype(np.int32)
    tier = oc.rollup_tier(t, 8)
    blob1 = oc.encode_rollup_block(tier)
    blob2 = oc.encode_rollup_block(tier)
    assert blob1 == blob2  # pure function of input (resume invariant)
    back = oc.decode_rollup_block(blob1)
    for k in tier:
        np.testing.assert_array_equal(back[k], tier[k], err_msg=k)
    # actually compresses vs raw 8-byte-per-value encoding
    raw = 4 * 8 * len(tier["wmin"])
    assert len(blob1) < raw
