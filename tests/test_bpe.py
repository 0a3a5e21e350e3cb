"""Distributed BPE trainer vs a from-scratch naive reference (full
pair recount every iteration, pure dicts) — merges must match
bit-exactly, and the actor-pool apply must match naive encode."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from bitfunnel_ray.ops.bpe import (
    END_OF_WORD,
    _apply_merge,
    bpe_token_counts,
    bpe_train,
    encode_word,
    merges_table,
    train_bpe_from_corpus,
    word_counts,
)

TEXTS = [
    "the lower the newer the lowest",
    "lower newer wider the the the",
    "low new wide lowest newest widest",
    "the low lower lowest",
    "",
    "   ",
    "new new new newer",
]


def _corpus():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                "text": pa.array(TEXTS, pa.string()),
            }
        )
    )


# --- naive reference (Sennrich pseudocode, recount-from-scratch) ----------


def naive_word_counts(texts):
    wc = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def naive_train(wc, n_merges, min_freq=2):
    words = {w: [END_OF_WORD] + list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for w, syms in words.items():
            f = wc[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_freq:
            break
        merges.append(best)
        words = {w: _apply_merge(s, *best) for w, s in words.items()}
    return merges


def naive_encode(word, merges):
    syms = [END_OF_WORD] + list(word)
    for a, b in merges:  # training order == rank order
        syms = _apply_merge(syms, a, b)
    return syms


def test_word_counts_matches_naive(ray_session):
    got = {
        r["word"]: r["count"]
        for r in word_counts(_corpus()).take_all()
    }
    assert got == naive_word_counts(TEXTS)


def test_merges_match_naive_reference(ray_session):
    wc = naive_word_counts(TEXTS)
    want = naive_train(wc, 50, min_freq=2)
    got = train_bpe_from_corpus(_corpus(), n_merges=50, min_freq=2)
    assert got == want
    assert len(got) > 5  # the loop actually ran
    t = merges_table(got)
    assert t.column_names == ["rank", "left", "right"]
    assert t["rank"].to_pylist() == list(range(len(got)))


def test_encode_equals_training_segmentation(ray_session):
    """Rank-ordered encode == in-order merge replay (naive) == the final
    training segmentation, for every training word."""
    wc = naive_word_counts(TEXTS)
    merges = bpe_train(pa.table(
        {"word": pa.array(sorted(wc)), "count": pa.array([wc[w] for w in sorted(wc)], pa.int64())}
    ), n_merges=50, min_freq=2)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in wc:
        assert encode_word(w, ranks) == naive_encode(w, merges), w
    # OOV word still segments (into pieces, never drops chars)
    seg = encode_word("unseenword", ranks)
    assert "".join(seg).replace(END_OF_WORD, "") == "unseenword"


def test_token_counts_distributed(ray_session):
    merges = train_bpe_from_corpus(_corpus(), n_merges=30, min_freq=2)
    out = bpe_token_counts(_corpus(), merges, concurrency=2, batch_size=3)
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"]) for r in out.take_all()}
    for i, txt in enumerate(TEXTS):
        want_words = len(txt.split())
        want_sub = sum(len(naive_encode(w, merges)) for w in txt.split())
        assert got[i] == (want_words, want_sub), (i, txt)


def test_overlap_semantics():
    # 'aaa' counts (a,a) twice but merges left-to-right to ('aa','a')
    assert _apply_merge(list("aaa"), "a", "a") == ["aa", "a"]
    assert _apply_merge(list("aaaa"), "a", "a") == ["aa", "aa"]


def test_min_freq_stops():
    wc = pa.table({"word": pa.array(["ab"]), "count": pa.array([1], pa.int64())})
    assert bpe_train(wc, 10, min_freq=2) == []
    assert bpe_train(wc, 10, min_freq=1) != []
