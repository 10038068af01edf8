import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from quicker_spark.functions.codec import (
    decode_posting_ids,
    delta_decode,
    delta_encode,
    encode_posting_ids,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


def test_varbyte_known_values():
    # 0..127 -> 1 byte, 128 -> 2 bytes
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varbyte_encode(np.array([1], dtype=np.uint64)) == b"\x01"
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varbyte_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


def test_varbyte_roundtrip_mixed():
    vals = np.array([0, 1, 127, 128, 255, 16384, 2**32, 2**63, 2**64 - 1],
                    dtype=np.uint64)
    out = varbyte_decode(varbyte_encode(vals))
    np.testing.assert_array_equal(out, vals)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    np.testing.assert_array_equal(varbyte_decode(varbyte_encode(arr)), arr)


@settings(max_examples=200, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=400))
def test_posting_ids_roundtrip_property(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    np.testing.assert_array_equal(decode_posting_ids(encode_posting_ids(arr)), arr)


def test_delta_roundtrip():
    arr = np.array([3, 3, 7, 100, 100, 10**12], dtype=np.uint64)
    np.testing.assert_array_equal(delta_decode(delta_encode(arr)), arr)


def test_compression_beats_raw_for_dense_runs():
    ids = np.arange(0, 100_000, 3, dtype=np.uint64)
    enc = encode_posting_ids(ids)
    assert len(enc) < ids.size * 2  # gaps of 3 -> 1 byte each
