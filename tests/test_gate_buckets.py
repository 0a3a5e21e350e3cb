"""Gopher quality gate (ops/gate.py) + CCNet perplexity buckets (ops/lm.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from bitfunnel_ray.ops.gate import R_BIGRAM, R_DUP, R_LONG, R_SHORT, R_TOP, apply_gate, gopher_gate


def test_gate_reasons_bitmask(ray_session):
    docs = [
        (0, " ".join(f"w{i}" for i in range(30))),        # clean
        (1, "a b"),                                        # short
        (2, " ".join(f"w{i}" for i in range(200))),        # long
        (3, " ".join(["x"] * 30)),                         # dup + top + bigram
        (4, " ".join(f"w{i % 15}" for i in range(30))),    # dup only
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]})
    )
    g = gopher_gate(
        ds, min_tokens=10, max_tokens=100, max_dup_frac=0.3,
        max_top_token_frac=0.5, max_top_bigram_frac=0.5,
    ).to_pandas().set_index("doc_id").sort_index()
    assert bool(g.loc[0, "keep"]) and g.loc[0, "reasons"] == 0
    # a 2-token doc is short AND its single bigram is 100% of bigrams
    assert g.loc[1, "reasons"] == R_SHORT | R_BIGRAM
    assert g.loc[2, "reasons"] == R_LONG
    assert g.loc[3, "reasons"] & (R_DUP | R_TOP | R_BIGRAM) == (R_DUP | R_TOP | R_BIGRAM)
    assert g.loc[4, "reasons"] == R_DUP and not g.loc[4, "keep"]

    gate_ds = gopher_gate(
        ds, min_tokens=10, max_tokens=100, max_dup_frac=0.3,
        max_top_token_frac=0.5, max_top_bigram_frac=0.5,
    )
    kept = apply_gate(ds, gate_ds).to_pandas()
    assert sorted(kept["doc_id"]) == [0]


def test_ppl_buckets_exact_terciles(ray_session):
    from bitfunnel_ray.ops import lm

    from bitfunnel_ray.sources.corpus import corpus_from_documents

    corpus = corpus_from_documents("/root/testdata/sf0.001")
    model = lm.train_bigram_lm(corpus)
    t = lm.perplexity_buckets(corpus, model, group_col="lang", n_buckets=3).to_pandas()
    assert len(t) == 500 and set(t["bucket"]) <= {0, 1, 2}
    # per language: bucket sizes within 1 of n/3, and bucket 0 holds the
    # HIGHEST scores (head = most language-like)
    for lang, sub in t.groupby("lang"):
        counts = sub["bucket"].value_counts()
        n = len(sub)
        for b in (0, 1, 2):
            assert abs(counts.get(b, 0) - n / 3) <= 2, (lang, counts)
        assert sub[sub.bucket == 0]["avg_logprob"].min() >= sub[sub.bucket == 2]["avg_logprob"].max()
    # ungrouped path
    t2 = lm.perplexity_buckets(corpus, model, n_buckets=4).to_pandas()
    assert set(t2["bucket"]) == {0, 1, 2, 3}
