"""Pairwise term co-occurrence — the Correlate analog (reference:
src/Index/src/Correlate.cpp, REPL ``correlate`` command,
tools/BitFunnel/src/CorrelateCommand.cpp: pairwise AND of term rows to
measure shared-row interference).

For an exact index "row correlation" becomes document co-occurrence:
for a fixed term list T, count docs containing each (a, b) pair.
Map-side: one bitmask per doc (|T| ≤ 64), pair counts per batch;
reduce: tiny Sum aggregate.  The shuffle carries |T|² partial counts per
batch, never documents.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from bitfunnel_ray.stages.tokenize import flat_tokens


class PairCounts:
    def __init__(self, terms: list[str]):
        if len(terms) > 64:
            raise ValueError("at most 64 terms")
        self.terms = list(terms)

    def __call__(self, t: pa.Table) -> pa.Table:
        flat, doc_of, doclen = flat_tokens(t["text"])
        n = len(t)
        toks = flat.to_numpy(zero_copy_only=False)
        masks = np.zeros(n, dtype=np.uint64)
        for i, term in enumerate(self.terms):
            hit = np.bincount(
                doc_of, weights=(toks == term).astype(np.float64), minlength=n
            )
            masks |= (hit > 0).astype(np.uint64) << np.uint64(i)
        ta, tb, cnt = [], [], []
        for i in range(len(self.terms)):
            bi = (masks >> np.uint64(i)) & np.uint64(1)
            for j in range(i + 1, len(self.terms)):
                bj = (masks >> np.uint64(j)) & np.uint64(1)
                ta.append(self.terms[i])
                tb.append(self.terms[j])
                cnt.append(int(np.sum(bi & bj)))
        return pa.table(
            {
                "term_a": pa.array(ta, pa.string()),
                "term_b": pa.array(tb, pa.string()),
                "n_docs_part": pa.array(cnt, pa.int64()),
            }
        )


def term_cooccurrence(
    corpus: "ray.data.Dataset", terms: list[str]
) -> "ray.data.Dataset":
    """(term_a, term_b, n_docs) for every unordered pair of ``terms``."""
    partial = corpus.select_columns(["text"]).map_batches(
        PairCounts(terms), batch_format="pyarrow", batch_size=None
    )
    return partial.groupby(["term_a", "term_b"]).aggregate(
        Sum("n_docs_part", alias_name="n_docs")
    )
