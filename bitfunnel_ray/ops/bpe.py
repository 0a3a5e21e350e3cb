"""Distributed BPE tokenizer training + application (Sennrich, Haddow &
Birch 2016, ACL — "Neural Machine Translation of Rare Words with Subword
Units"; apply loop per GPT-2's rank-ordered encoder).

The 100 TB shape: training a BPE tokenizer never iterates the corpus —
ONE distributed pass reduces the text to a word-frequency table
(vocabulary-sized; HuggingFace tokenizers and SentencePiece train from
exactly this table), the merge loop then runs over that small table on
the driver (the documented smallness assumption: unique words, not
corpus bytes — a 100 TB web corpus has ~10^8 unique words ≈ a few GB,
and the loop is inherently sequential so no engine distributes it), and
application is an actor-pool ``map_batches`` where each actor holds the
merge-rank dict once (``__init__``) plus a word→length cache, and each
batch encodes only its UNIQUE vocabulary (dictionary-encode, encode the
dictionary, scatter by index — the LangId trick).

Determinism contract (what the pytest naive-reference oracle checks
bit-exactly): pair selection is max count, ties broken by pair
lexicographic ascending; merges apply left-to-right within a word
(so ``aaa`` + merge ``(a,a)`` → ``aa a``); training stops early when
the best pair's count drops below ``min_freq``.  Training segmentation
== encode segmentation because both run the same ``_apply_merge``.

No reference-parity citation: BitFunnel has no subword tokenizer; this
is one of the pretraining-pipeline operators the engine adds on top.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from bitfunnel_ray.stages.tokenize import flat_tokens

END_OF_WORD = "▁"  # sentencepiece-style word-boundary marker


# --------------------------------------------------------------------------
# stage 1: corpus -> word-frequency table (the one distributed pass)
# --------------------------------------------------------------------------


def _wc_block(t: pa.Table) -> pa.Table:
    """Per-block partial word counts: dictionary-encode the flat token
    stream, bincount the indices — no python loop over tokens."""
    flat, _, _ = flat_tokens(t["text"])
    if len(flat) == 0:
        return pa.table(
            {"word": pa.array([], pa.string()), "count": pa.array([], pa.int64())}
        )
    d = pc.dictionary_encode(flat)
    counts = np.bincount(d.indices.to_numpy(), minlength=len(d.dictionary))
    return pa.table(
        {"word": d.dictionary, "count": pa.array(counts.astype(np.int64))}
    )


def word_counts(corpus: "ray.data.Dataset") -> "ray.data.Dataset":
    """Dataset(doc_id, text) → Dataset(word, count).  Map-side partials
    (one row per unique word per block) then ONE hash exchange over the
    vocabulary — corpus text never shuffles."""
    from ray.data.aggregate import Sum

    partials = corpus.map_batches(_wc_block, batch_format="pyarrow")
    return partials.groupby("word").aggregate(Sum("count", alias_name="count"))


# --------------------------------------------------------------------------
# stage 2: merge training over the word-count table (driver, vocab-sized)
# --------------------------------------------------------------------------


def _apply_merge(symbols: list, a: str, b: str) -> list:
    """Merge every left-to-right occurrence of adjacent (a, b) in one
    word's symbol list.  Shared by train and encode — the consistency
    guarantee."""
    out = []
    i, n = 0, len(symbols)
    ab = a + b
    while i < n:
        if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _pairs_of(symbols: list) -> dict:
    """Adjacent-pair occurrence counts within one word (overlaps counted
    per occurrence position, e.g. ``aaa`` → {(a,a): 2})."""
    out: dict = {}
    for i in range(len(symbols) - 1):
        p = (symbols[i], symbols[i + 1])
        out[p] = out.get(p, 0) + 1
    return out


def bpe_train(
    wc: "ray.data.Dataset | pa.Table",
    n_merges: int = 1000,
    min_freq: int = 2,
) -> list:
    """Word-count table → ordered merge list ``[(left, right), ...]``.

    Sennrich's algorithm with incremental pair-count maintenance: a
    pair→containing-words index means each merge touches only the words
    holding that pair (subtract their old pair counts, re-add after the
    merge) — the standard trainer cost profile, O(touched words) per
    merge rather than O(vocab).

    Words enter as character sequences with a leading END_OF_WORD marker
    (sentencepiece convention — the marker fuses into word-initial
    subwords, so segmentations never straddle word boundaries).
    """
    if isinstance(wc, ray.data.Dataset):
        # vocabulary-sized by construction (see module doc) — the one
        # deliberate driver materialization in this module
        parts = list(wc.iter_batches(batch_format="pyarrow", batch_size=None))
        wc = (
            pa.concat_tables(parts)
            if parts
            else pa.table(
                {"word": pa.array([], pa.string()), "count": pa.array([], pa.int64())}
            )
        )
    words_txt = wc["word"].to_pylist()
    freqs = wc["count"].to_numpy(zero_copy_only=False).astype(np.int64)
    # deterministic processing order regardless of shuffle layout
    order = sorted(range(len(words_txt)), key=lambda i: words_txt[i])
    words = [[END_OF_WORD] + list(words_txt[i]) for i in order]
    freqs = freqs[order]

    pair_counts: dict = {}
    pair_words: dict = {}  # pair -> set of word indices containing it
    for wi, syms in enumerate(words):
        f = int(freqs[wi])
        for p, k in _pairs_of(syms).items():
            pair_counts[p] = pair_counts.get(p, 0) + k * f
            pair_words.setdefault(p, set()).add(wi)

    merges: list = []
    for _ in range(int(n_merges)):
        if not pair_counts:
            break
        # max count, tie → lexicographically smallest pair (deterministic)
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_freq:
            break
        merges.append(best)
        a, b = best
        touched = sorted(pair_words.get(best, ()))
        for wi in touched:
            syms = words[wi]
            f = int(freqs[wi])
            for p, k in _pairs_of(syms).items():
                c = pair_counts[p] - k * f
                if c:
                    pair_counts[p] = c
                else:
                    del pair_counts[p]
                ws = pair_words[p]
                ws.discard(wi)
                if not ws:
                    del pair_words[p]
            syms = _apply_merge(syms, a, b)
            words[wi] = syms
            for p, k in _pairs_of(syms).items():
                pair_counts[p] = pair_counts.get(p, 0) + k * f
                pair_words.setdefault(p, set()).add(wi)
    return merges


def train_bpe_from_corpus(
    corpus: "ray.data.Dataset", n_merges: int = 1000, min_freq: int = 2
) -> list:
    """corpus → merges, end to end (distributed count + driver train)."""
    return bpe_train(word_counts(corpus), n_merges=n_merges, min_freq=min_freq)


# --------------------------------------------------------------------------
# stage 3: application (actor pool, per-actor rank dict + encode cache)
# --------------------------------------------------------------------------


def encode_word(word: str, ranks: dict) -> list:
    """GPT-2-style encode: repeatedly merge the LOWEST-rank adjacent pair
    (all left-to-right occurrences at once) until none applies.  Yields
    exactly the training segmentation for training-corpus words."""
    syms = [END_OF_WORD] + list(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = _apply_merge(syms, *best_pair)
    return syms


class _BPEApply:
    """Actor-pool stage: ranks built once per actor; each batch encodes
    only its unique vocabulary (dictionary-encode → encode dictionary →
    scatter lengths by index), with a cross-batch word→length cache."""

    def __init__(self, merges_ref):
        merges = ray.get(merges_ref) if isinstance(merges_ref, ray.ObjectRef) else merges_ref
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.cache: dict = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        flat, doc_of, _ = flat_tokens(t["text"])
        n_sub = np.zeros(n, np.int64)
        n_words = np.bincount(doc_of, minlength=n).astype(np.int64) if len(flat) else np.zeros(n, np.int64)
        if len(flat):
            d = pc.dictionary_encode(flat)
            vocab = d.dictionary.to_pylist()
            lens = np.empty(len(vocab), np.int64)
            cache, ranks = self.cache, self.ranks
            for vi, w in enumerate(vocab):
                L = cache.get(w)
                if L is None:
                    L = len(encode_word(w, ranks))
                    if len(cache) < 1_000_000:
                        cache[w] = L
                lens[vi] = L
            per_tok = lens[d.indices.to_numpy()]
            n_sub = np.bincount(doc_of, weights=per_tok, minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(n_words),
                "n_bpe_tokens": pa.array(n_sub),
            }
        )


def bpe_token_counts(
    corpus: "ray.data.Dataset",
    merges: list,
    concurrency: int = 4,
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """Dataset(doc_id, text) → Dataset(doc_id, n_words, n_bpe_tokens)
    under the trained merges.  Merges ship once via ``ray.put``; each
    actor builds its rank dict in ``__init__``."""
    ref = ray.put(list(map(tuple, merges)))
    # autoscaling (1, N) pool, NOT a fixed-size one: a fixed pool of N
    # actors on an N-cpu cluster reserves every CPU slot and starves the
    # upstream read tasks — the streaming executor then waits forever
    # (observed as a suite hang at num_cpus=4 with concurrency=4)
    return corpus.map_batches(
        _BPEApply,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        batch_size=batch_size,
    )


def merges_table(merges: list) -> pa.Table:
    """Merge list → (rank, left, right) table for export / inspection."""
    return pa.table(
        {
            "rank": pa.array(np.arange(len(merges), dtype=np.int64)),
            "left": pa.array([a for a, _ in merges], pa.string()),
            "right": pa.array([b for _, b in merges], pa.string()),
        }
    )
