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


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(-(1 << 63), (1 << 63) - 1), min_size=1,
                 max_size=120),
        min_size=1,
        max_size=24,
    ),
    st.integers(1, 64),
)
def test_dod_wavefront_streams_property(blocks, min_lanes):
    """Multi-stream wavefront decode == per-stream scalar decode for any
    stream mix and any lane threshold (forces both the vector path and the
    scalar-tail continuation)."""
    streams = [oc.dod_encode(np.array(b, dtype=np.int64)) for b in blocks]
    counts = np.array([len(b) for b in blocks], dtype=np.int64)
    off = np.concatenate([[0], np.cumsum(counts)])
    out = np.empty(off[-1], dtype=np.int64)
    oc.dod_decode_streams(streams, counts, out, off[:-1], min_lanes=min_lanes)
    for s, b in enumerate(blocks):
        np.testing.assert_array_equal(out[off[s] : off[s + 1]],
                                      np.array(b, dtype=np.int64))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(-(1 << 63), (1 << 63) - 1), min_size=1,
                 max_size=80),
        min_size=1,
        max_size=12,
    )
)
def test_dod_encode_blocks_matches_scalar_property(blocks):
    """The vectorized merged-code block encoder is byte-identical to the
    scalar reference for every block."""
    flat = np.concatenate([np.array(b, dtype=np.int64) for b in blocks])
    off = np.concatenate(
        [[0], np.cumsum([len(b) for b in blocks])]
    ).astype(np.int64)
    enc = oc.dod_encode_blocks(flat, off)
    for j, b in enumerate(blocks):
        assert enc[j] == oc.dod_encode_py(np.array(b, dtype=np.int64)), j
