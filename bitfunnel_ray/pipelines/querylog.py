"""Query-log generation — the QueryGenerator/QueryLogBuilder analog
(reference: tools/BitFunnel/src/QueryGenerator.cpp:34-93 draws uniform
indices into the frequency-sorted document-frequency table;
QueryLogBuilderTool.cpp drives it).

Deterministic: seeded ``numpy`` Generator, fixed shape mix per
FIXTURES.md §2 (40% 1-term, 30% 2-term AND, 10% OR, 10% NOT, 10%
phrase).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def generate_query_log(
    terms_by_df: list[str], n_queries: int, seed: int = 43
) -> pa.Table:
    """terms_by_df: term strings sorted by decreasing df (the DocFreqTable
    ordering the reference requires, DocumentFrequencyTable.cpp:110-115)."""
    rng = np.random.default_rng(seed)
    nt = len(terms_by_df)
    if nt == 0:
        raise ValueError("empty dictionary")

    def draw() -> str:
        # uniform draw scaled into the frequency-sorted table — head terms
        # are drawn as often as tail terms, like the reference's method
        return terms_by_df[int(rng.integers(0, nt))]

    out = []
    for qid in range(n_queries):
        r = rng.random()
        if r < 0.40:
            q = draw()
        elif r < 0.70:
            q = f"{draw()} {draw()}"
        elif r < 0.80:
            q = f"{draw()} | {draw()}"
        elif r < 0.90:
            q = f"{draw()} -{draw()}"
        else:
            q = f'"{draw()} {draw()}"'
        out.append(q)
    return pa.table(
        {
            "query_id": pa.array(np.arange(n_queries, dtype=np.uint32)),
            "query": pa.array(out, pa.string()),
        }
    )
