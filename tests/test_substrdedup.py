"""Exact substring dedup (ops/substrdedup.py) vs a brute-force oracle."""

import random

import pyarrow as pa
import pytest

import ray.data as rd

from bitfunnel_ray.ops.substrdedup import dedup_substrings


def brute(docs, k):
    wins = {}
    for did, text in docs:
        toks = text.split()
        for s in range(len(toks) - k + 1):
            wins.setdefault(tuple(toks[s : s + k]), []).append((did, s))
    rem = {}
    for occ in wins.values():
        occ.sort()
        for did, s in occ[1:]:
            rem.setdefault(did, []).append(s)
    out = {}
    for did, text in docs:
        toks = text.split()
        cov = [False] * len(toks)
        for s in rem.get(did, []):
            for j in range(s, s + k):
                cov[j] = True
        out[did] = " ".join(t for t, c in zip(toks, cov) if not c)
    return out


@pytest.mark.parametrize("k", [3, 5, 10])
def test_random_corpus_matches_brute_force(ray_session, k):
    rng = random.Random(3)
    docs = []
    for i in range(60):
        docs.append((i, " ".join(rng.choice("abcdef") for _ in range(rng.randint(0, 30)))))
    span = "x y z w v u t s r q".split()
    for i in (5, 17, 42):  # plant one long shared span (first copy must survive)
        t = docs[i][1].split()
        t[2:2] = span
        docs[i] = (i, " ".join(t))
    want = brute(docs, k)
    ds = rd.from_arrow(
        pa.table({"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]})
    )
    got = {r["doc_id"]: r["text"] for r in dedup_substrings(ds, k).to_pandas().to_dict("records")}
    assert got == want


def test_keep_first_and_threshold(ray_session):
    span10 = " ".join(f"w{i}" for i in range(10))
    docs = [
        (0, f"a b {span10} c d"),
        (1, f"e f {span10} g h"),  # all 10 tokens of the copy stripped
        (2, "p q r s t u v"),      # 7 distinct tokens, untouched
        (3, ""),                    # empty doc round-trips
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]})
    )
    got = {r["doc_id"]: r["text"] for r in dedup_substrings(ds, 5).to_pandas().to_dict("records")}
    assert got[0] == docs[0][1]        # first occurrence survives intact
    assert got[1] == "e f g h"         # duplicated run >= k fully stripped
    assert got[2] == docs[2][1]
    assert got[3] == ""
    # runs shorter than k are never touched
    short = [(0, "x y z a b"), (1, "x y z c d")]
    ds2 = rd.from_arrow(
        pa.table({"doc_id": [d for d, _ in short], "text": [t for _, t in short]})
    )
    got2 = {r["doc_id"]: r["text"] for r in dedup_substrings(ds2, 4).to_pandas().to_dict("records")}
    assert got2 == dict(short)


def test_k_validation(ray_session):
    ds = rd.from_arrow(pa.table({"doc_id": [0], "text": ["a"]}))
    with pytest.raises(ValueError):
        dedup_substrings(ds, 1)


def test_null_and_whitespace_rows(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": ["a b c d e a b c d e", None, "   "],
            }
        )
    )
    got = {r["doc_id"]: r["text"] for r in dedup_substrings(ds, 5).to_pandas().to_dict("records")}
    assert got[0] == "a b c d e"  # self-repeat stripped, first copy kept
    assert got[1] == "" and got[2] == ""
