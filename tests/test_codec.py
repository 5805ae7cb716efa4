"""Varbyte/delta codec round-trips (SURVEY.md 4.2 item 2) + property tests."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from apt_search_engine_spark.indexing import codec


def test_empty():
    assert codec.varbyte_encode(np.array([], dtype=np.int64)) == b""
    assert codec.varbyte_decode(b"").size == 0


def test_known_boundaries():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**21 - 1, 2**21,
                     2**28, 2**35, 2**42, 2**49, 2**56, 2**62], dtype=np.uint64)
    got = codec.varbyte_decode(codec.varbyte_encode(vals))
    assert got.tolist() == vals.astype(np.int64).tolist()


def test_single_byte_values_pack_to_one_byte():
    enc = codec.varbyte_encode(np.arange(128))
    assert len(enc) == 128


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert codec.varbyte_decode(codec.varbyte_encode(arr)).tolist() == vals


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200))
def test_docid_roundtrip(vals):
    s = np.array(sorted(vals), dtype=np.int64)
    assert codec.decode_doc_ids(codec.encode_doc_ids(s)).tolist() == s.tolist()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=100000), min_size=1, max_size=30).map(sorted),
        max_size=20,
    )
)
def test_positions_roundtrip(lists):
    enc = codec.encode_positions(lists)
    dec = codec.decode_positions(enc, len(lists))
    assert [d.tolist() for d in dec] == lists


def test_tf_roundtrip():
    tfs = np.array([0.5, 1 / 3, 0.123456789, 1e-12])
    assert codec.decode_tfs(codec.encode_tfs(tfs)).tolist() == tfs.tolist()


def test_compression_wins_on_dense_postings():
    # dense ascending doc ids -> deltas of 1 -> 1 byte each vs 8 raw
    ids = np.arange(10_000, dtype=np.int64) * 3
    enc = codec.encode_doc_ids(ids)
    assert len(enc) < 10_000 * 2


def test_decode_doc_ids_many_matches_single():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from apt_search_engine_spark.indexing import codec

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(
            st.lists(st.integers(0, 2**40), min_size=0, max_size=20),
            min_size=0,
            max_size=12,
        )
    )
    def check(lists):
        blobs = [
            codec.varbyte_encode(
                codec.delta_encode(np.sort(np.array(v, dtype=np.int64)))
            )
            for v in lists
        ]
        got = codec.decode_doc_ids_many(blobs)
        want = [codec.decode_doc_ids(b) for b in blobs]
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g.tolist() == w.tolist()

    check()


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**40), max_size=6),
        max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_split_varbyte_stream_roundtrip_with_empty_items(items):
    """Cut offsets must reproduce each item's encoding — including items
    of ZERO values anywhere (a leading run of zeros used to wrap cum-1
    to -1 and cut at the buffer end)."""
    encs = [codec.varbyte_encode(np.asarray(v, np.uint64)) for v in items]
    region = b"".join(bytes(e) for e in encs)
    counts = np.array([len(v) for v in items], np.int64)
    offs = codec.split_varbyte_stream(region, counts)
    assert offs[0] == 0 and offs[-1] == len(region)
    assert (np.diff(offs) >= 0).all()
    buf = np.frombuffer(region, np.uint8)
    for i, e in enumerate(encs):
        got = buf[offs[i]:offs[i + 1]].tobytes()
        assert got == bytes(e), (i, counts.tolist())
