"""Topic / domain assignment and vocabulary coverage — the two mixture
knobs of a pretraining-data pipeline.

``assign_topics``
    Keyword-dictionary classification (the standard first-pass domain
    bucketer for mixture weights — cheap, auditable, deterministic):
    each category is a keyword set; a document's score per category is
    its count of keyword TOKENS (every occurrence counts); it is
    assigned the argmax category (ties → category name asc), or
    ``other`` when no keyword hits.  Map-only: the category map is tiny
    and captured in the task closure; the per-batch kernel
    dictionary-encodes the batch vocabulary once and looks up ONLY the
    unique vocab against the keyword sets (same trick as LangId).

``vocab_coverage``
    Tokenizer-vocabulary coverage: given a vocabulary (e.g. the
    training tokenizer's word list, broadcast once via ``ray.put``),
    per-document in-vocab token fraction and OOV count.  The
    vocabulary array is shared read-only by every actor; lookups are
    one ``np.isin`` over the batch's UNIQUE vocab, scattered back by
    dictionary index.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from bitfunnel_ray.stages.tokenize import flat_tokens


def assign_topics(corpus, categories: dict[str, tuple[str, ...]]):
    """Dataset(doc_id, text) → Dataset(doc_id, topic, hits).  See module
    doc; ``other`` with hits=0 when no category matches."""
    names = sorted(categories)
    kw_sets = [frozenset(categories[n]) for n in names]

    def kernel(t: pa.Table) -> pa.Table:
        n = len(t)
        flat, doc_of, _ = flat_tokens(t["text"])
        scores = np.zeros((n, len(names)), np.int64)
        if len(flat):
            d = pc.dictionary_encode(flat)
            idx = d.indices.to_numpy()
            vocab = d.dictionary.to_pylist()
            # membership per unique vocab entry, scattered by index
            for ci, kws in enumerate(kw_sets):
                member = np.fromiter((v in kws for v in vocab), bool, len(vocab))
                hit = member[idx]
                if hit.any():
                    np.add.at(scores[:, ci], doc_of[hit], 1)
        best = np.argmax(scores, axis=1)  # first max = name-asc tie-break
        hits = scores[np.arange(n), best]
        topic = np.where(hits > 0, np.asarray(names, object)[best], "other")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "topic": pa.array(topic.tolist(), pa.string()),
                "hits": pa.array(hits, pa.int64()),
            }
        )

    return corpus.select_columns(["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow"
    )


def vocab_coverage(corpus, vocab_ref):
    """Dataset(doc_id, text) × broadcast vocabulary → Dataset(doc_id,
    n_tokens, n_oov, coverage).  ``vocab_ref`` is a ``ray.put`` of a
    numpy object array (or the array itself); coverage of an empty doc
    is defined as 1.0 (nothing is out of vocabulary)."""

    def kernel(t: pa.Table) -> pa.Table:
        vocab = vocab_ref if isinstance(vocab_ref, np.ndarray) else ray.get(vocab_ref)
        n = len(t)
        flat, doc_of, doclen = flat_tokens(t["text"])
        oov = np.zeros(n, np.int64)
        if len(flat):
            d = pc.dictionary_encode(flat)
            idx = d.indices.to_numpy()
            uniq = np.asarray(d.dictionary.to_pylist(), dtype=object)
            in_vocab = np.isin(uniq, vocab)
            miss = ~in_vocab[idx]
            np.add.at(oov, doc_of[miss], 1)
        cov = np.where(doclen > 0, 1.0 - oov / np.maximum(doclen, 1), 1.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(doclen, pa.int64()),
                "n_oov": pa.array(oov, pa.int64()),
                "coverage": pa.array(np.round(cov, 6), pa.float64()),
            }
        )

    return corpus.select_columns(["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow"
    )
