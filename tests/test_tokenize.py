import numpy as np
import pyarrow as pa

from bitfunnel_ray.functions.hashing import murmur64a, ngram_hash
from bitfunnel_ray.stages.tokenize import flat_tokens, tokenize_batch


def test_flat_tokens_handles_whitespace_nulls():
    flat, doc_of, doclen = flat_tokens(pa.array(["a b  c", "", None, "  x "]))
    assert flat.to_pylist() == ["a", "b", "c", "x"]
    assert doc_of.tolist() == [0, 0, 0, 3]
    assert doclen.tolist() == [3, 0, 0, 1]


def test_unigram_postings_dedup_and_tf():
    r = tokenize_batch(pa.array(["cat dog cat cat", "dog"]), max_gram=1, emit_text=True)
    # postings unique per (doc, term); tf kept
    got = {(int(row), t): int(tf) for row, t, tf in zip(r.row, r.term, r.tf)}
    assert got == {(0, "cat"): 3, (0, "dog"): 1, (1, "dog"): 1}
    assert r.doclen.tolist() == [4, 1]
    assert r.n_postings.tolist() == [2, 1]
    # hashes match scalar murmur
    for row, t, h in zip(r.row, r.term, r.term_hash):
        assert int(h) == murmur64a(t)


def test_ngram_window_semantics():
    # doc "a b c" with max_gram=3: terms a,b,c,"a b","b c","a b c"
    r = tokenize_batch(pa.array(["a b c"]), max_gram=3, emit_text=True)
    terms = set(r.term.tolist())
    assert terms == {"a", "b", "c", "a b", "b c", "a b c"}
    by_text = {t: int(h) for t, h in zip(r.term, r.term_hash)}
    ha, hb, hc = murmur64a("a"), murmur64a("b"), murmur64a("c")
    assert by_text["a b"] == ngram_hash([ha, hb])
    assert by_text["a b c"] == ngram_hash([ha, hb, hc])
    # n-grams never cross document boundaries
    r2 = tokenize_batch(pa.array(["a b", "c d"]), max_gram=2, emit_text=True)
    assert "b c" not in set(r2.term.tolist())
    # gram sizes recorded
    gs = {t: int(g) for t, g in zip(r.term, r.gram_size)}
    assert gs["a b c"] == 3 and gs["a"] == 1


def test_ngram_tf_counts_repeats():
    r = tokenize_batch(pa.array(["x y x y x"]), max_gram=2, emit_text=True)
    got = {t: int(tf) for t, tf in zip(r.term, r.tf)}
    assert got == {"x": 3, "y": 2, "x y": 2, "y x": 2}
