"""WARC source/sink adapter (ISO 28500 / WARC 1.0 — the Common Crawl
interchange format) for the pages schema ``(url, warc_ts, html)``.

The reference ingests only its own NUL-delimited chunk files
(src/Chunks/src/ChunkReader.cpp:42-100 — see sources/chunks.py for that
adapter); web corpora, however, arrive as WARC.  This module reads
``resource``/``response`` records into the canonical pages Dataset and
writes pages back out as ``resource`` records, so the web-index pipeline
(pipelines/webindex.py) can start from the format a crawler actually
produces.

Shape: one Ray task per WARC file in both directions (files are the
natural parallel unit — Common Crawl ships ~1 GB segments); record
framing is Content-Length driven (never a regex over payload bytes), so
binary HTML with embedded CRLFs round-trips byte-identically.  Output
file names derive from the block's first/last url hash — a Ray task
retry overwrites its own file instead of duplicating records (same
contract as the build's spill shards, build/builder.py).

Gzip: ``.warc.gz`` files are read transparently (stdlib gzip handles the
member-per-record framing Common Crawl uses as well as whole-file
streams); ``write_warc(compress=True)`` writes one gzip stream per file.
"""

from __future__ import annotations

import gzip
import os

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"
_EPOCH = np.datetime64("1970-01-01T00:00:00", "s")


def _format_warc_date(ts_s: int) -> str:
    """Seconds since epoch → WARC-Date (ISO 8601, second precision)."""
    return (
        str(np.datetime64(int(ts_s), "s").astype("datetime64[s]")) + "Z"
    )


def _parse_warc_date(s: str) -> int:
    return int((np.datetime64(s.rstrip("Z"), "s") - _EPOCH).astype(np.int64))


def warc_record_bytes(url: str, ts_s: int, payload: bytes) -> bytes:
    """One ``resource`` record.  The record id is derived from the url
    hash (deterministic — a rewritten file is byte-identical, so retries
    and resumes are idempotent at the byte level)."""
    from bitfunnel_ray.functions.hashing import murmur64a

    if any(c in url for c in ("\r", "\n", "\x00")):
        raise ValueError(f"url contains WARC framing bytes: {url!r}")
    rid = f"<urn:bfr:{murmur64a(url) & 0xFFFFFFFFFFFFFFFF:016x}>"
    head = (
        b"WARC/1.0\r\n"
        + b"WARC-Type: resource\r\n"
        + b"WARC-Record-ID: " + rid.encode() + _CRLF
        + b"WARC-Date: " + _format_warc_date(ts_s).encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
        + b"Content-Type: text/html\r\n"
        + b"Content-Length: " + str(len(payload)).encode() + _CRLF
        + _CRLF
    )
    return head + payload + _CRLF + _CRLF


def parse_warc_buffer(data: bytes) -> list[tuple[str, int, bytes]]:
    """Parse one WARC file's bytes → [(url, ts_s, payload)].

    Framing is header-driven: read header lines to the blank line, take
    exactly Content-Length payload bytes, skip the two record-separator
    CRLFs.  Records without a WARC-Target-URI (``warcinfo``, request
    records) are skipped; ``response`` records carrying an HTTP envelope
    keep their full block as the payload (callers that need the entity
    body strip HTTP headers downstream — extraction treats leading
    headers as boilerplate anyway)."""
    out: list[tuple[str, int, bytes]] = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate extra separator CRLFs between records
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        end_head = data.find(_CRLF + _CRLF, pos)
        if end_head < 0:
            raise ValueError(f"unterminated WARC header block at byte {pos}")
        header = data[pos:end_head].decode("utf-8", errors="replace")
        lines = header.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line at byte {pos}: {lines[0]!r}")
        fields: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            # ASCII-only strip: str.strip() also eats unicode whitespace
            # (U+0085, U+00A0, ...), corrupting URIs that carry them
            fields[k.strip(" \t").lower()] = v.strip(" \t")
        length = int(fields["content-length"])
        body_start = end_head + 4
        payload = data[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError(
                f"truncated record at byte {pos}: want {length} payload bytes"
            )
        pos = body_start + length
        url = fields.get("warc-target-uri")
        if url is not None and fields.get("warc-type") in ("resource", "response"):
            ts = _parse_warc_date(fields.get("warc-date", "1970-01-01T00:00:00Z"))
            out.append((url, ts, payload))
    return out


def _read_file_bytes(path: str) -> bytes:
    if path.endswith(".gz"):
        with gzip.open(path, "rb") as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


def find_warc_files(dir_or_paths) -> "list[str]":
    """Resolve a directory (globbing *.warc / *.warc.gz) or an explicit
    path list to WARC file paths — raising on an empty directory instead
    of letting a directory path crash inside a remote read task."""
    import glob as _glob

    if isinstance(dir_or_paths, (list, tuple)):
        return sorted(str(p) for p in dir_or_paths)
    d = str(dir_or_paths)
    if os.path.isfile(d):
        return [d]
    paths = sorted(
        _glob.glob(os.path.join(d, "*.warc")) + _glob.glob(os.path.join(d, "*.warc.gz"))
    )
    if not paths:
        raise FileNotFoundError(f"no *.warc / *.warc.gz files under {d}")
    return paths


def pages_from_warc(paths: str | list[str]) -> "ray.data.Dataset":
    """Read WARC files into the pages schema
    ``(url string, warc_ts_s int64, html binary)`` — one task per file."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]

    def load(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list[int] = []
        payloads: list[bytes] = []
        for p in t["item"].to_pylist():
            for url, ts, payload in parse_warc_buffer(_read_file_bytes(p)):
                urls.append(url)
                tss.append(ts)
                payloads.append(payload)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts_s": pa.array(tss, pa.int64()),
                "html": pa.array(payloads, pa.binary()),
            }
        )

    # one row per path → one read task per file
    return rd.from_items(sorted(paths)).repartition(len(paths)).map_batches(
        load, batch_format="pyarrow", batch_size=None
    )


def assign_doc_ids(pages: "ray.data.Dataset", url_col: str = "url") -> "ray.data.Dataset":
    """Give WARC pages the canonical corpus schema: ``doc_id`` derived
    from the url hash (murmur64a masked to 63 bits so the id stays
    positive through int64 columns), plus a ``warc_ts`` timestamp column
    for the doc-values fast field.  Hash-derived ids are STABLE across
    re-crawls — the same url maps to the same doc_id in every import, so
    corpus_diff/drift comparisons work without an id-mapping join.
    Collisions are ~n²/2^64 (union of 10^11 urls: ~5e-4 expected) and
    surface loudly downstream as duplicate-doc-id manifest errors."""

    def add_ids(t: pa.Table) -> pa.Table:
        from bitfunnel_ray.functions.hashing import hash_terms

        urls = np.asarray(t[url_col].to_pylist(), dtype=object)
        ids = (hash_terms(urls) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        cols = {"doc_id": pa.array(ids, pa.int64())}
        for c in t.column_names:
            cols[c] = t[c]
        if "warc_ts_s" in t.column_names:
            cols["warc_ts"] = t["warc_ts_s"].cast(pa.timestamp("s"))
        return pa.table(cols)

    return pages.map_batches(add_ids, batch_format="pyarrow")


def write_warc(
    ds: "ray.data.Dataset",
    out_dir: str,
    *,
    url_col: str = "url",
    ts_col: str = "warc_ts_s",
    html_col: str = "html",
    compress: bool = False,
) -> int:
    """Write pages as WARC files (one per block, atomic rename,
    deterministic names).  Returns the file count."""
    from bitfunnel_ray.functions.hashing import murmur64a

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"path": pa.array([], pa.string()), "n_docs": pa.array([], pa.int64())}
            )
        urls = t[url_col].to_pylist()
        tss = t[ts_col].to_numpy(zero_copy_only=False).astype(np.int64).tolist()
        payloads = t[html_col].to_pylist()
        buf = bytearray()
        for url, ts, payload in zip(urls, tss, payloads):
            if payload is None:
                payload = b""
            elif isinstance(payload, str):
                payload = payload.encode("utf-8")
            buf += warc_record_bytes(url, ts, payload)
        tag = (
            f"{murmur64a(urls[0]) & 0xFFFFFFFFFFFFFFFF:016x}-"
            f"{murmur64a(urls[-1]) & 0xFFFFFFFFFFFFFFFF:016x}-{len(urls)}"
        )
        name = f"warc-{tag}{ext}"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        data = gzip.compress(bytes(buf), mtime=0) if compress else bytes(buf)
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {"path": pa.array([name]), "n_docs": pa.array([len(urls)], pa.int64())}
        )

    out = ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)
    return out.count()
