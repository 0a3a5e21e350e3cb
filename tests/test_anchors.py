"""Anchor-text pipeline (bitfunnel_ray/ops/anchors.py): extraction edge
cases, layout-independent deterministic aggregation, and the corpus
left-outer join's empty-anchor fill."""

import pyarrow as pa
import ray.data as rd

from bitfunnel_ray.ops.anchors import (
    aggregate_anchor_text,
    anchor_corpus,
    extract_anchors,
)


def test_extract_anchors_edge_cases(ray_session):
    html = pa.array(
        [
            b'<a href="http://a/1">first</a> mid <a href="http://a/2">second one</a>',
            b"no links",
            None,
            b'broken href="unterminated',
            # malformed tag: no > before the next < — href kept, anchor ''
            b'<a href="http://b/1" <span>x</span>',
            # anchor runs to end of string (no closing <)
            b'<a href="http://c/1">tail anchor',
            b'empty anchor <a href="http://d/1"></a>',
        ],
        pa.binary(),
    )
    t = pa.table(
        {"doc_id": pa.array(list(range(1, 8)), pa.int64()), "html": html}
    )
    out = extract_anchors(rd.from_arrow(t)).to_pandas()
    got = list(zip(out["doc_id"], out["href"], out["anchor"]))
    assert got == [
        (1, "http://a/1", "first"),
        (1, "http://a/2", "second one"),
        (5, "http://b/1", ""),
        (6, "http://c/1", "tail anchor"),
        (7, "http://d/1", ""),
    ]


def test_aggregate_anchor_text_layout_independent(ray_session):
    # anchors arrive in scrambled order across odd block layouts; the
    # aggregate must be identical: lexicographic, multiplicity kept
    rows = [
        (10, "zeta"),
        (11, "solo"),
        (10, "alpha"),
        (10, "alpha"),
        (10, "mid one"),
    ]
    want = {10: "alpha alpha mid one zeta", 11: "solo"}
    for n_blocks in (1, 3, 5):
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "anchor": pa.array([r[1] for r in rows]),
                }
            )
        ).repartition(num_blocks=n_blocks)
        out = aggregate_anchor_text(ds).to_pandas()
        assert dict(zip(out["doc_id"], out["anchor_text"])) == want


def test_anchor_corpus_fills_unlinked_docs(ray_session):
    corpus = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.uint64()),  # lifted-schema dtype
                "text": ["a", "b", "c"],
            }
        )
    )
    anchors = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([1], pa.int64()), "anchor_text": ["hello world"]}
        )
    )
    out = (
        anchor_corpus(corpus, anchors, num_partitions=2)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["anchor_text"].tolist() == ["", "hello world", ""]
    assert out["text"].tolist() == ["a", "b", "c"]
