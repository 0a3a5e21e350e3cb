import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bitfunnel_ray.functions.varint import decode, encode


def test_empty():
    assert encode(np.empty(0, np.uint64)).size == 0
    assert decode(np.empty(0, np.uint8)).size == 0


def test_known_values():
    vals = np.array([0, 1, 127, 128, 300, 2**14 - 1, 2**14, 2**63, 2**64 - 1], dtype=np.uint64)
    buf = encode(vals)
    out = decode(buf, count=len(vals))
    assert out.tolist() == vals.tolist()
    # single-byte values
    assert encode(np.array([5], np.uint64)).tolist() == [5]
    assert encode(np.array([127], np.uint64)).tolist() == [127]
    assert encode(np.array([128], np.uint64)).tolist() == [0x80, 0x01]


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_roundtrip(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert decode(encode(vals)).tolist() == vals.tolist() or len(xs) == 0
