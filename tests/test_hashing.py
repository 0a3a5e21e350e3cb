"""Hash parity tests.

Golden murmur values computed independently from the public MurmurHash64A
algorithm (Appleby, public domain) — the same algorithm, seed and combine
rule the reference uses (src/Index/src/Term.cpp:335-344, Term.cpp:39-44).
"""

import numpy as np

from bitfunnel_ray.functions.hashing import (
    combine_ngram,
    hash_terms,
    knuth_hash32,
    murmur64a,
    ngram_hash,
    rotl1,
)


def _ref_murmur64a(data: bytes, seed: int) -> int:
    # independent straight-line reimplementation for cross-checking
    m = 0xC6A4A7935BD1E995
    mask = (1 << 64) - 1
    h = (seed ^ ((len(data) * m) & mask)) & mask
    i = 0
    while i + 8 <= len(data):
        k = int.from_bytes(data[i : i + 8], "little")
        k = (k * m) & mask
        k ^= k >> 47
        k = (k * m) & mask
        h = ((h ^ k) * m) & mask
        i += 8
    tail = data[i:]
    if tail:
        h ^= int.from_bytes(tail, "little")
        h = (h * m) & mask
    h ^= h >> 47
    h = (h * m) & mask
    h ^= h >> 47
    return h


def test_murmur_matches_reference_algorithm():
    for s in [b"", b"a", b"abcdefg", b"abcdefgh", b"abcdefghi", b"the quick brown fox", "héllo".encode()]:
        assert murmur64a(s) == _ref_murmur64a(s, 123456789), s
        assert murmur64a(s, 1) == _ref_murmur64a(s, 1), s


def test_murmur_deterministic_and_str_bytes_equal():
    assert murmur64a("cat") == murmur64a(b"cat")
    assert murmur64a("cat") != murmur64a("dog")


def test_hash_terms_vector_matches_scalar():
    terms = np.array(["a", "bb", "a", "ccc", "bb"], dtype=object)
    out = hash_terms(terms)
    assert out.dtype == np.uint64
    assert out[0] == out[2] == murmur64a("a")
    assert out[1] == out[4] == murmur64a("bb")
    assert out[3] == murmur64a("ccc")


def test_rotl_and_combine():
    x = np.array([1 << 63, 1, 0], dtype=np.uint64)
    r = rotl1(x)
    assert r.tolist() == [1, 2, 0]
    left = np.array([murmur64a("a")], dtype=np.uint64)
    right = np.array([murmur64a("b")], dtype=np.uint64)
    c = combine_ngram(left, right)
    # matches the scalar phrase-hash path (Term::AddTerm order)
    assert int(c[0]) == ngram_hash([murmur64a("a"), murmur64a("b")])
    # non-commutative
    assert int(c[0]) != int(combine_ngram(right, left)[0])


def test_knuth_hash32_is_sql_expressible():
    ks = np.array([0, 1, 2, 12345], dtype=np.uint64)
    out = knuth_hash32(ks)
    for k, v in zip(ks.tolist(), out.tolist()):
        assert v == (k * 2654435761) % (1 << 32)
