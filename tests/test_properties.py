"""Property-based tests (FIXTURES.md invariants 1/3/4): round-trip token
equality for arbitrary lengths/values, aggregate-tree consistency, codec
identity — hypothesis-generated inputs rather than fixed seeds."""

import numpy as np
from hypothesis import given, settings, strategies as st

from wavelet_decomposition_ray import oracle as oc

tokens_st = st.lists(st.integers(0, (1 << 20) - 1), min_size=1, max_size=400)
int64_st = st.lists(
    st.integers(-(1 << 63), (1 << 63) - 1), min_size=0, max_size=200
)


@settings(max_examples=60, deadline=None)
@given(tokens_st)
def test_roundtrip_property(toks):
    t = np.array(toks, dtype=np.int32)
    for bank in oc.BANKS:
        assert np.array_equal(oc.roundtrip_tokens(t, bank), t)


@settings(max_examples=60, deadline=None)
@given(tokens_st)
def test_aggregate_tree_property(toks):
    t = np.array(toks, dtype=np.int32)
    direct = oc.rollup_all_tiers(t, 6)
    tree = oc.rollup_tree(t, 6)
    for tier in direct:
        for k in direct[tier]:
            np.testing.assert_array_equal(tree[tier][k], direct[tier][k])


@settings(max_examples=80, deadline=None)
@given(int64_st)
def test_dod_codec_property(vals):
    v = np.array(vals, dtype=np.int64)
    assert np.array_equal(oc.dod_decode(oc.dod_encode(v), len(v)), v)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64),
                min_size=0, max_size=120))
def test_gorilla_codec_property(vals):
    v = np.array(vals, dtype=np.float64)
    dec = oc.gorilla_decode(oc.gorilla_encode(v), len(v))
    np.testing.assert_array_equal(dec.view(np.uint64), v.view(np.uint64))


@settings(max_examples=40, deadline=None)
@given(tokens_st)
def test_rollup_block_codec_property(toks):
    t = np.array(toks, dtype=np.int32)
    tier = oc.rollup_tier(t, 4)
    back = oc.decode_rollup_block(oc.encode_rollup_block(tier))
    for k in tier:
        np.testing.assert_array_equal(back[k], tier[k])
