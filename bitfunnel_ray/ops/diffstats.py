"""Corpus delta + distribution drift — the recurring-crawl operators.

A production web pipeline re-crawls continuously; before re-indexing it
wants (a) the DELTA — which documents appeared, vanished, or changed —
and (b) DRIFT — how the term distribution moved, to catch scraper
breakage or topic shift before the index is rebuilt.

``corpus_diff``: full outer join by doc key, status per row
(added/removed/changed), comparing a cheap per-row fingerprint (here the
raw text; swap in ``textstats.fingerprint`` for long docs).  One hash
exchange on the id; fixed-width rows only.

``drift_terms``: per-corpus term distributions → per-term drift
contribution p·ln(p/q) (the KL summand, smoothed) — emitted PER TERM and
top-k'd rather than summed, so every float is a single fixed-recipe
expression (order-independent, oracle-hashable) and the output is the
actionable artifact anyway: WHICH terms drifted, not one opaque number.
Both distributions come from the same map-side-combine df machinery;
the join of the two small aggregated tables happens per hash-partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def corpus_diff(
    old: "ray.data.Dataset", new: "ray.data.Dataset", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """(doc_id, status) for every differing doc: 'added' (only in new),
    'removed' (only in old), 'changed' (both, text differs)."""
    from bitfunnel_ray.build.builder import tune_hash_shuffle

    def tag(which: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    id_col: t[id_col].cast(pa.int64()),
                    "side": pa.array([which] * len(t), pa.string()),
                    "text": t["text"],
                }
            )

        return f

    both = old.select_columns([id_col, "text"]).map_batches(
        tag("old"), batch_format="pyarrow"
    ).union(
        new.select_columns([id_col, "text"]).map_batches(
            tag("new"), batch_format="pyarrow"
        )
    )
    n_blocks = tune_hash_shuffle(both.context)

    def diff_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {id_col: pa.array([], pa.int64()), "status": pa.array([], pa.string())}
        )
        if len(t) == 0:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False)
        is_new = pc.equal(t["side"], "new").to_numpy(zero_copy_only=False)
        order = np.lexsort((is_new, ids))
        ids_s, new_s = ids[order], is_new[order]
        txt = t["text"].take(pa.array(order))
        starts = np.flatnonzero(np.diff(ids_s, prepend=ids_s[0] - 1))
        counts = np.diff(np.append(starts, len(ids_s)))
        out_ids, out_status = [], []
        one = starts[counts == 1]
        if len(one):
            out_ids.append(ids_s[one])
            out_status.append(
                np.where(new_s[one], "added", "removed").astype(object)
            )
        two = starts[counts == 2]
        if len(two):
            # sorted (old, new) within each id: compare texts vectorized
            a = txt.take(pa.array(two))
            b = txt.take(pa.array(two + 1))
            ne = pc.not_equal(a, b).to_numpy(zero_copy_only=False)
            ch = two[ne]
            if len(ch):
                out_ids.append(ids_s[ch])
                out_status.append(np.full(len(ch), "changed", dtype=object))
        if not out_ids:
            return empty
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_ids), pa.int64()),
                "status": pa.array(
                    np.concatenate(out_status).tolist(), pa.string()
                ),
            }
        )

    return both.repartition(num_blocks=n_blocks, keys=[id_col]).map_batches(
        diff_block, batch_format="pyarrow", batch_size=None
    )


def drift_terms(
    corpus_p: "ray.data.Dataset",
    corpus_q: "ray.data.Dataset",
    k: int = 50,
) -> pa.Table:
    """Top-k terms by KL-summand drift contribution
    ``round(p * ln(p/q), 9)`` where p, q are add-one-smoothed unigram
    frequencies of the two corpora (shared vocabulary = union).  Exact
    int counts aggregate distributively; each output float is one fixed
    expression of two exact ints — bit-stable for the oracle hash."""
    from bitfunnel_ray.build.stats import document_frequency_table
    from bitfunnel_ray.config import EngineConfig

    cfg = EngineConfig(max_gram=1)

    def counts(ds):
        t = (
            document_frequency_table(ds, cfg)
            .select_columns(["term", "cf"])
            .to_pandas()
        )
        return dict(zip(t["term"], t["cf"].astype("int64")))

    # the aggregated vocab tables are Zipf-small relative to the corpus
    # (50k terms for 40M tokens at bench scale) — driver-side join of two
    # SMALL aggregates, the same shape as the df head broadcast
    cp, cq = counts(corpus_p), counts(corpus_q)
    vocab = sorted(set(cp) | set(cq))
    np_tot = sum(cp.values()) + len(vocab)
    nq_tot = sum(cq.values()) + len(vocab)
    terms, contribs = [], []
    for term in vocab:
        p = (cp.get(term, 0) + 1) / np_tot
        q = (cq.get(term, 0) + 1) / nq_tot
        contribs.append(round(p * np.log(p / q), 9))
        terms.append(term)
    order = sorted(
        range(len(terms)), key=lambda i: (-abs(contribs[i]), terms[i])
    )[:k]
    return pa.table(
        {
            "term": pa.array([terms[i] for i in order], pa.string()),
            "drift": pa.array([contribs[i] for i in order], pa.float64()),
        }
    )
