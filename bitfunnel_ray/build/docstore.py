"""Stored fields (the Elasticsearch ``_source`` / Lucene stored-field
analog): a per-segment ``docstore/`` parquet sidecar written during the
build's single corpus pass, served by doc-id with row-group pruning.

Why a sidecar and not the corpus: serving must render results (snippets,
cached pages) without re-reading the 100 TB input — the docstore is the
index's own copy of exactly the fields the operator chose to store
(``EngineConfig.store_fields``), laid out for point lookups:

- each build batch writes one part, SORTED by doc_id, so parquet
  row-group statistics give tight [min, max] doc-id ranges;
- ``DocStore.fetch`` reads row-group METADATA once (a few KB per part),
  then touches only the row groups whose range intersects the requested
  ids — a k-doc fetch reads O(k) row groups, never the corpus;
- parts are named by the batch's first doc_id (the build's retry-
  exactly-once contract, build/builder.py).

Reference analog: the DocTable's variable-size blobs
(src/Index/src/DocTableDescriptor.h:53-58 — per-document payload slots
sized by IDocumentDataSchema); the reference keeps them in slice memory,
here they are immutable parquet with the same lifecycle as the segment.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class DocStore:
    """Point-lookup reader over one or more segments' ``docstore/``
    sidecars.  Builds a (file, row_group) → [min, max] doc-id interval
    index from parquet footers at construction (metadata-only reads);
    ``rowgroups_read`` counts data row groups actually decoded — the
    pruning contract a test can assert."""

    def __init__(self, seg_dirs):
        from bitfunnel_ray.build.segment import resolve_segment_dirs

        self.entries: list[tuple[str, int, int, int]] = []  # path, rg, lo, hi
        self.fields: list[str] | None = None
        self.schema: "pa.Schema | None" = None  # true arrow types (typed empties)
        for d in resolve_segment_dirs(seg_dirs):
            store = os.path.join(d, "docstore")
            if not os.path.isdir(store):
                raise FileNotFoundError(
                    f"segment {d} has no docstore/ — build with "
                    "EngineConfig(store_fields=...) to enable stored fields"
                )
            for p in sorted(glob.glob(os.path.join(store, "*.parquet"))):
                meta = pq.read_metadata(p)
                schema_fields = [n for n in meta.schema.names if n != "doc_id"]
                if self.fields is None:
                    self.fields = schema_fields
                    self.schema = pq.read_schema(p)
                col = meta.schema.names.index("doc_id")
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(col).statistics
                    self.entries.append((p, rg, int(st.min), int(st.max)))
        self.rowgroups_read = 0

    def fetch(self, doc_ids, fields: "list[str] | None" = None) -> pa.Table:
        """Stored rows for ``doc_ids`` → (doc_id, *fields); missing ids
        are simply absent from the result (callers needing all-present
        compare row counts).  Output is sorted by doc_id."""
        want = np.unique(np.asarray(doc_ids, dtype=np.int64))
        cols = ["doc_id"] + list(fields if fields is not None else self.fields)
        tables = []
        for p, rg, lo, hi in self.entries:
            # interval test against the SORTED requested ids
            i = np.searchsorted(want, lo)
            if i >= len(want) or want[i] > hi:
                continue
            t = pq.ParquetFile(p).read_row_group(rg, columns=cols)
            self.rowgroups_read += 1
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            hit = np.isin(ids, want)
            if hit.any():
                tables.append(t.filter(pa.array(hit)))
        if not tables:
            if self.schema is not None:  # the parts' REAL column types
                return pa.schema([self.schema.field(c) for c in cols]).empty_table()
            return pa.schema([("doc_id", pa.int64())]).empty_table()
        out = pa.concat_tables(tables)
        return out.sort_by("doc_id")
