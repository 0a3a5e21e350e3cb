"""Search-result snippet generation — the presentation stage that follows
matching/ranking: a token window around the first query-term occurrence in
each top-k document.

Reference analog: none in-tree (BitFunnel returns matching doc ids only;
snippets are the serving-side step every search front end bolts on).

Scale shape: results are top-k (small by construction), so this is a
map-only corpus scan — each batch filters itself down with a vectorized
``np.isin`` against the k sorted doc_ids and extracts text windows only
for the ≤ k surviving rows; the rank/score join happens on the driver
over k rows.  No shuffle; the corpus text column never leaves its batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def result_snippets(
    corpus: "ray.data.Dataset",
    results: pa.Table,
    terms,
    *,
    before: int = 5,
    after: int = 9,
) -> pa.Table:
    """For each result row (rank, doc_id, score): a snippet of the tokens
    ``[first - before, first + after]`` (clipped to the doc edges) around
    the FIRST occurrence of any query term in the doc's text.  Returns
    (rank, doc_id, score, snippet) sorted by rank; a result doc containing
    no query term (impossible under AND semantics) would be dropped."""
    ids = np.sort(results["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))
    term_set = frozenset(terms)
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "snippet": pa.array([], pa.string())}
    )

    def batch(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.isin(d, ids)
        if not m.any():
            return empty
        sub = t.filter(pa.array(m))
        # ≤ k rows reach the window loop per batch — python is fine here
        out_ids, out_snips = _window_snippets(
            sub["doc_id"].to_pylist(), sub["text"].to_pylist(), term_set, before, after
        )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "snippet": pa.array(out_snips, pa.string()),
            }
        )

    snip_ds = corpus.select_columns(["doc_id", "text"]).map_batches(
        batch, batch_format="pyarrow"
    )
    tables = [x for x in ray.get(snip_ds.to_arrow_refs()) if len(x)]
    snips = pa.concat_tables(tables) if tables else empty
    snips = snips.set_column(
        0, "doc_id", snips["doc_id"].cast(results.schema.field("doc_id").type)
    )
    joined = results.join(snips, keys="doc_id", join_type="inner")
    return joined.sort_by("rank").select(["rank", "doc_id", "score", "snippet"])


def _window_snippets(ids, texts, term_set, before: int, after: int):
    out_ids, out_snips = [], []
    for doc_id, text in zip(ids, texts):
        toks = (text or "").split()
        first = next((i for i, w in enumerate(toks) if w in term_set), None)
        if first is None:
            continue
        lo = max(0, first - before)
        out_ids.append(int(doc_id))
        out_snips.append(" ".join(toks[lo : first + after + 1]))
    return out_ids, out_snips


def result_snippets_stored(
    engine,
    results: pa.Table,
    terms,
    *,
    before: int = 5,
    after: int = 9,
) -> pa.Table:
    """``result_snippets`` served from the docstore instead of a corpus
    scan: fetch the k result docs' stored text (row-group-pruned point
    lookups, build/docstore.py) and window them driver-side — the
    per-query serving path, no Dataset launch, no corpus read.  Same
    output contract as the scan variant (equality pytest)."""
    stored = engine.fetch(results["doc_id"].to_pylist(), fields=["text"])
    out_ids, out_snips = _window_snippets(
        stored["doc_id"].to_pylist(),
        stored["text"].to_pylist(),
        frozenset(terms),
        before,
        after,
    )
    snips = pa.table(
        {
            # match the results table's id type (engines emit uint64)
            "doc_id": pa.array(out_ids, pa.int64()).cast(
                results.schema.field("doc_id").type
            ),
            "snippet": pa.array(out_snips, pa.string()),
        }
    )
    joined = results.join(snips, keys="doc_id", join_type="inner")
    return joined.sort_by("rank").select(["rank", "doc_id", "score", "snippet"])
