"""Reference chunk-file format: reader and writer adapters.

The reference ingests NUL-delimited "chunk" files (grammar from
/root/reference/src/Chunks/src/ChunkReader.cpp:42-100):

    file   := doc* NUL
    doc    := docid_hex16 NUL stream* NUL
    stream := streamid_hex2 NUL (term NUL)* NUL

(16 hex digits of DocId, 2 hex digits of StreamId —
ChunkReader.cpp:38-39; terms are pre-tokenized NUL-terminated UTF-8,
ChunkReader.cpp:103-115.)  These adapters let a reference user carry
their existing chunk corpora straight into the Ray pipeline and export
back out:

- ``corpus_from_chunks``: ``read_binary_files`` (one task per chunk
  file — the same unit of parallelism the reference's chunk manifest
  uses) → parse → canonical corpus schema.  Stream 0 becomes ``text``;
  any other stream s becomes column ``stream_{s:02x}`` (the Sonnets
  corpus keeps titles in stream 02, src/Data/src/Sonnets.cpp:31-40),
  ready to index via ``EngineConfig.streams``.
- ``write_chunks``: the inverse — one chunk file per block, bytes built
  with a single join per doc.

Parsing is a per-file state machine over ``buf.split(b"\\0")`` — an
I/O-format adapter runs once per file read, parallel across files; the
hot path (tokenize/build) never sees it.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data


def parse_chunk_buffer(data: bytes) -> list[tuple[int, dict[int, list[str]]]]:
    """→ [(doc_id, {stream_id: [terms...]})] per document."""
    if not data:
        return []
    if not data.endswith(b"\0"):
        raise ValueError("chunk file must end with NUL")
    fields = data.split(b"\0")
    # data ends with NUL -> last split element is the empty tail
    if fields[-1] != b"":
        raise ValueError("malformed chunk tail")
    fields = fields[:-1]
    docs: list[tuple[int, dict[int, list[str]]]] = []
    i = 0
    n = len(fields)
    while i < n:
        f = fields[i]
        if f == b"":  # the file-terminating NUL
            i += 1
            if i != n:
                raise ValueError("data after file terminator")
            break
        if len(f) != 16:
            raise ValueError(f"bad doc id field {f!r}")
        doc_id = int(f, 16)
        i += 1
        streams: dict[int, list[str]] = {}
        while i < n and fields[i] != b"":
            sid_f = fields[i]
            if len(sid_f) != 2:
                raise ValueError(f"bad stream id field {sid_f!r}")
            sid = int(sid_f, 16)
            i += 1
            terms: list[str] = []
            while i < n and fields[i] != b"":
                terms.append(fields[i].decode("utf-8"))
                i += 1
            if i >= n:
                raise ValueError("unterminated stream")
            i += 1  # stream-terminating NUL
            streams[sid] = terms
        if i >= n:
            raise ValueError("unterminated document")
        i += 1  # document-terminating NUL
        docs.append((doc_id, streams))
    return docs


def _docs_to_batch(
    docs: list[tuple[int, dict[int, list[str]]]], stream_ids: tuple[int, ...]
) -> pa.Table:
    from bitfunnel_ray.sources.corpus import _lift_documents_batch

    ids = pa.array([d for d, _ in docs], pa.int64())
    cols: dict[str, pa.Array] = {"doc_id": ids}
    cols["text"] = pa.array([" ".join(s.get(0, [])) for _, s in docs], pa.string())
    lifted = _lift_documents_batch(pa.table({"doc_id": ids, "text": cols["text"]}))
    for sid in stream_ids:
        if sid == 0:
            continue
        lifted = lifted.append_column(
            f"stream_{sid:02x}",
            pa.array([" ".join(s.get(sid, [])) for _, s in docs], pa.string()),
        )
    return lifted


def corpus_from_chunks(
    paths: str | list[str], extra_streams: tuple[int, ...] = ()
) -> "ray.data.Dataset":
    """Read chunk files into the canonical corpus schema (stream 0 →
    ``text``; each id in ``extra_streams`` → ``stream_{id:02x}``)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def batch(t: pa.Table) -> pa.Table:
        docs: list[tuple[int, dict[int, list[str]]]] = []
        for buf in t["bytes"].to_pylist():
            docs.extend(parse_chunk_buffer(buf))
        return _docs_to_batch(docs, (0, *extra_streams))

    return ds.map_batches(batch, batch_format="pyarrow")


def chunk_bytes(
    doc_ids: np.ndarray, stream_cols: dict[int, list[str]]
) -> bytes:
    """Serialize one block of documents to chunk-file bytes.  Streams
    with empty text for a doc are omitted (the reference writes only
    present streams)."""
    out = bytearray()
    texts = {sid: col for sid, col in stream_cols.items()}
    for row, did in enumerate(doc_ids.tolist()):
        out += f"{did:016x}".encode()
        out += b"\0"
        for sid in sorted(texts):
            txt = texts[sid][row]
            if not txt:
                continue
            out += f"{sid:02x}".encode()
            out += b"\0"
            for term in txt.split():
                out += term.encode("utf-8")
                out += b"\0"
            out += b"\0"
        out += b"\0"
    out += b"\0"
    return bytes(out)


def write_chunks(
    ds: "ray.data.Dataset",
    out_dir: str,
    streams: tuple[tuple[str, int], ...] = (("text", 0),),
) -> int:
    """Write the dataset as chunk files (one per block; atomic rename so
    a rerun never exposes partial files).  Returns the file count."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pa.table({"path": pa.array([], pa.string()), "n_docs": pa.array([], pa.int64())})
        cols = {
            sid: [x if x is not None else "" for x in t[col].to_pylist()]
            for col, sid in streams
        }
        payload = chunk_bytes(ids, cols)
        name = f"chunk-{ids.min():016x}-{ids.max():016x}-{len(ids)}.chunk"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {"path": pa.array([name]), "n_docs": pa.array([len(ids)], pa.int64())}
        )

    out = ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)
    return out.count()  # one manifest row per written file (driver-small)
