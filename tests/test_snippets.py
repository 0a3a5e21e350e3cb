"""Snippet generation (ops/snippets.py) vs a per-doc brute-force oracle.

The registry entry ``snippets`` is oracle-checked bit-exactly against
DuckDB by tests/test_driver_contract.py; here hypothesis drives random
corpora through a tiny reference implementation of the same contract.
"""

import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from bitfunnel_ray.ops.snippets import best_snippets

TERMS = ["q1", "q2"]


def _brute(texts, terms, window):
    out = {}
    for doc_id, text in enumerate(texts):
        toks = text.split()
        L = len(toks)
        if L == 0:
            continue
        best = None
        for s in range(1, max(1, L - window + 1) + 1):
            win = toks[s - 1 : min(s - 1 + window, L)]
            hits = sum(1 for t in terms if t in win)
            key = (-hits, s)
            if best is None or key < best[0]:
                best = (key, s, hits, " ".join(win))
        if best and best[2] >= 1:
            out[doc_id] = (best[1], best[2], best[3])
    return out


_tok = st.sampled_from(["q1", "q2", "x", "y", "z"])
_doc = st.lists(_tok, min_size=0, max_size=14).map(" ".join)


@given(st.lists(_doc, min_size=1, max_size=8), st.integers(1, 6))
@settings(max_examples=30, deadline=None)
def test_snippets_match_brute_force(texts, window):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    got = {
        int(r["doc_id"]): (int(r["start"]), int(r["n_hits"]), r["snippet"])
        for r in best_snippets(ds, TERMS, window=window).to_pandas().to_dict("records")
    }
    assert got == _brute(texts, TERMS, window)


def test_snippets_empty_and_no_hit():
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["", "x y z"], pa.string()),
            }
        )
    )
    assert best_snippets(ds, TERMS, window=4).count() == 0
