"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in bitfunnel_ray) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on sf0.001: build a full index segment (tokenize →
    bucketed shuffle → varint posting lists), then serve a mixed query set
    through the BM25 engine; returns the top-k result table."""
    import pyarrow as pa

    from bitfunnel_ray.pipelines.driver_queries import get_engine

    eng = get_engine("/root/testdata/sf0.001")
    out = []
    for qid, q in enumerate(
        ["spark join", "merge | window", '"batch batch"', "table -join", "(spark | vector) batch"]
    ):
        t = eng.search(q, k=10)
        out.append(
            t.append_column("query_id", pa.array([qid] * len(t), pa.int64()))
        )
    return pa.concat_tables(out)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 (and
    the training-data ops); see bitfunnel_ray/pipelines/driver_queries.py."""
    from bitfunnel_ray.pipelines.driver_queries import REGISTRY

    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; rows-only
    operators (LSH/sketch/model-stub) are deliberately omitted."""
    from bitfunnel_ray.pipelines.driver_queries import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
