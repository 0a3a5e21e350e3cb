"""Boilerplate shingle detection + strip (ops/boilerplate.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from bitfunnel_ray.ops.boilerplate import boilerplate_shingles, strip_boilerplate


def _corpus():
    return pa.table(
        {
            "doc_id": pa.array(range(8), pa.int64()),
            "source": pa.array(["a"] * 4 + ["b"] * 4),
            "text": pa.array(
                [
                    "visit a home page now alpha beta gamma",
                    "visit a home page now delta epsilon",
                    "visit a home page now zeta",
                    "eta theta iota kappa",
                    "cookie banner accept all foo",
                    "cookie banner accept all bar baz",
                    "unique text entirely here words",
                    "cookie banner accept all qux",
                ]
            ),
        }
    )


def test_detects_planted_templates(ray_session):
    ds = rd.from_arrow(_corpus()).repartition(3)
    bp = boilerplate_shingles(ds, k=4, min_frac=0.6, min_docs=2)
    got = {(r["source"], r["shingle"]): (r["n_docs"], r["frac"]) for r in bp.to_pylist()}
    assert got == {
        ("a", "visit a home page"): (3, 0.75),
        ("a", "a home page now"): (3, 0.75),
        ("b", "cookie banner accept all"): (3, 0.75),
    }


def test_strip_unions_overlapping_spans(ray_session):
    ds = rd.from_arrow(_corpus()).repartition(2)
    bp = boilerplate_shingles(ds, k=4, min_frac=0.6, min_docs=2)
    out = {r["doc_id"]: r["text"] for r in strip_boilerplate(ds, bp, k=4).take_all()}
    # overlapping template shingles union their spans: all 5 tokens go
    assert out[0] == "alpha beta gamma"
    assert out[2] == "zeta"
    # non-template docs untouched
    assert out[3] == "eta theta iota kappa"
    assert out[6] == "unique text entirely here words"
    # source-b template only stripped from source-b docs
    assert out[4] == "foo" and out[7] == "qux"


def test_strip_is_source_scoped(ray_session):
    """A shingle that is boilerplate for source a must NOT be stripped
    from a source-b document containing the same tokens."""
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "source": pa.array(["a", "a", "b"]),
            "text": pa.array(
                [
                    "one two three four tail1",
                    "one two three four tail2",
                    "one two three four tail3",
                ]
            ),
        }
    )
    ds = rd.from_arrow(t)
    bp = boilerplate_shingles(ds, k=4, min_frac=0.9, min_docs=2)
    assert {(r["source"], r["shingle"]) for r in bp.to_pylist()} == {
        ("a", "one two three four")
    }
    out = {r["doc_id"]: r["text"] for r in strip_boilerplate(ds, bp, k=4).take_all()}
    assert out[0] == "tail1" and out[1] == "tail2"
    assert out[2] == "one two three four tail3"


def test_empty_and_short_docs(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "source": pa.array(["a", "a", "a"]),
            "text": pa.array(["", "ab cd", None]),
        }
    )
    bp = boilerplate_shingles(rd.from_arrow(t), k=4, min_frac=0.5)
    assert len(bp) == 0
    out = strip_boilerplate(rd.from_arrow(t), bp, k=4).take_all()
    assert sorted(r["text"] for r in out) == ["", "", "ab cd"]


def test_strip_idempotent(ray_session):
    ds = rd.from_arrow(_corpus())
    bp = boilerplate_shingles(ds, k=4, min_frac=0.6, min_docs=2)
    once = strip_boilerplate(ds, bp, k=4)
    once_t = pa.Table.from_pylist(sorted(once.take_all(), key=lambda r: r["doc_id"]))
    twice = strip_boilerplate(rd.from_arrow(once_t), bp, k=4)
    twice_t = pa.Table.from_pylist(sorted(twice.take_all(), key=lambda r: r["doc_id"]))
    assert once_t["text"].to_pylist() == twice_t["text"].to_pylist()
