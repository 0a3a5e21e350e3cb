"""Corpus sources.

The engine's canonical input is a Parquet table of Common-Crawl-style web
pages with columns ``(url:string, warc_ts:timestamp[us], html:binary,
text:string, lang:string)`` (BASELINE.json ``input_hint``).  This module
provides:

- ``corpus_from_documents``: a deterministic adapter that lifts the
  driver-provided ``documents`` test table (doc_id, text, lang, source,
  n_chars) into exactly that shape, so every pipeline runs over the
  canonical schema while staying DuckDB-oracle-checkable;
- deterministic synthetic corpora mirroring the reference's test corpora:
  the PrimeFactors mock (closed-form ground truth,
  reference: src/Mocks/src/PrimeFactorsDocument.cpp:48-120) and a
  Zipf web-text corpus for df-distribution realism (FIXTURES.md §1a/§1b).

All generation is seed-free arithmetic or seeded-hash based — no RNG state
in the data path (SURVEY.md §7.5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

CORPUS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("doc_id", pa.uint64()),  # carried external key (reference DocId)
    ]
)

_EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us")


def _lift_documents_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id,text,lang,...) → corpus(url,warc_ts,html,text,lang,doc_id).

    Deterministic per row: url embeds the doc_id, warc_ts = 2024-01-01 +
    doc_id seconds, html wraps the text.  ``text`` passes through unchanged
    — this is the byte-identical-per-url invariant column.
    """
    doc_id = batch["doc_id"].to_numpy().astype(np.int64)
    text = pc.fill_null(batch["text"], "")
    url = pa.array([f"https://example.org/doc/{i:08d}" for i in doc_id.tolist()])
    ts = pa.array(_EPOCH_2024 + doc_id * np.timedelta64(1_000_000, "us"), type=pa.timestamp("us"))
    html = pc.binary_join_element_wise(
        pa.array([b"<html><body>"] * len(batch), type=pa.binary()),
        text.cast(pa.binary()),
        pa.array([b"</body></html>"] * len(batch), type=pa.binary()),
        b"",
    )
    lang = pc.fill_null(batch["lang"], "und") if "lang" in batch.column_names else pa.array(["und"] * len(batch))
    return pa.table(
        {
            "url": url,
            "warc_ts": ts,
            "html": html,
            "text": text,
            "lang": lang,
            "doc_id": pa.array(doc_id.astype(np.uint64), type=pa.uint64()),
        }
    )


def corpus_from_documents(sf_dir: str) -> "ray.data.Dataset":
    """Read ``{sf_dir}/documents.parquet`` and lift it to the canonical
    corpus schema (streaming; no materialization)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    out = ds.map_batches(_lift_documents_batch, batch_format="pyarrow")
    # input_files() doesn't survive transforms; carry the lineage forward
    # for the build manifest (builder checks this attribute first)
    out._bfr_input_files = ds.input_files()
    return out


def corpus_from_jsonl(path: str) -> "ray.data.Dataset":
    """Read newline-delimited JSON documents (fields ``doc_id``, ``text``,
    optional ``lang``) and lift to the canonical corpus schema.  Uses Ray
    Data's native JSON reader, so the read streams and parallelizes by
    file/block exactly like parquet — the adapter only normalizes the
    schema (missing ``lang`` → "und").  Reference analog: the chunk
    ingest formats (ChunkReader) — here any JSONL dump is a corpus."""
    ds = ray.data.read_json(path)

    def norm(t: pa.Table) -> pa.Table:
        lang = (
            t["lang"]
            if "lang" in t.schema.names
            else pa.array(["und"] * len(t), pa.string())
        )
        return _lift_documents_batch(
            pa.table(
                {
                    "doc_id": t["doc_id"].cast(pa.int64()),
                    "text": t["text"].cast(pa.string()),
                    "lang": lang,
                }
            )
        )

    out = ds.map_batches(norm, batch_format="pyarrow")
    out._bfr_input_files = ds.input_files()
    return out


def corpus_from_csv(path: str) -> "ray.data.Dataset":
    """Read CSV documents (columns ``doc_id``, ``text``, optional
    ``lang``) and lift to the canonical corpus schema; same contract as
    ``corpus_from_jsonl``."""
    ds = ray.data.read_csv(path)

    def norm(t: pa.Table) -> pa.Table:
        lang = (
            t["lang"]
            if "lang" in t.schema.names
            else pa.array(["und"] * len(t), pa.string())
        )
        return _lift_documents_batch(
            pa.table(
                {
                    "doc_id": t["doc_id"].cast(pa.int64()),
                    "text": t["text"].cast(pa.string()),
                    "lang": lang,
                }
            )
        )

    out = ds.map_batches(norm, batch_format="pyarrow")
    out._bfr_input_files = ds.input_files()
    return out


# --- deterministic synthetic corpora (FIXTURES.md §1) --------------------


def prime_factors_text(i: int) -> str:
    """Space-joined decimal prime factors of i with multiplicity (doc 100 →
    "2 2 5 5"); doc 0 → "0", doc 1 → "1" so no document is empty.
    Mirrors the reference's PrimeFactors mock corpus semantics
    (PrimeFactorsDocument.cpp:48-120): conjunctive ground truth is
    divisibility."""
    if i < 2:
        return str(i)
    parts = []
    n, p = i, 2
    while p * p <= n:
        while n % p == 0:
            parts.append(str(p))
            n //= p
        p += 1
    if n > 1:
        parts.append(str(n))
    return " ".join(parts)


def make_prime_factors_corpus(n_docs: int) -> pa.Table:
    ids = np.arange(n_docs, dtype=np.int64)
    texts = [prime_factors_text(int(i)) for i in ids]
    return _lift_documents_batch(
        pa.table(
            {
                "doc_id": pa.array(ids),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * n_docs),
            }
        )
    )


def _zipf_texts(doc_ids: np.ndarray, vocab_size: int, s: float) -> list[str]:
    """Deterministic Zipf(s) word soup: token t of doc d is
    vocab[rank] where rank is driven by a seeded-hash counter (no RNG
    state; identical regardless of partitioning).  Doc length ~ LogNormal
    via an inverse-CDF on a per-doc hash."""
    # per-doc uniform in [0,1) from a Knuth-style hash
    K = np.uint64(0x9E3779B97F4A7C15)
    u_doc = ((doc_ids.astype(np.uint64) * K) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    # LogNormal(mu=5.6 - shifted smaller for tests, sigma=0.7) inverse via erfinv approx:
    # use numpy's special-free approximation: ndtri not available → use
    # simple transform of two hashed uniforms (Box-Muller with fixed phase).
    u2 = (((doc_ids.astype(np.uint64) + np.uint64(1)) * K) >> np.uint64(11)).astype(
        np.float64
    ) / float(1 << 53)
    z = np.sqrt(-2.0 * np.log(np.clip(u_doc, 1e-12, 1.0))) * np.cos(2 * np.pi * u2)
    lens = np.clip(np.exp(4.0 + 0.7 * z), 8, 1024).astype(np.int64)
    # Zipf rank per token position: rank = floor(C * (u^(-1/(s-1)) - 1)) style
    # inverse; use the standard u→rank transform rank = floor(u^(-1/(s-1)))
    # bounded-Zipf inverse CDF for pmf ∝ r^-s on [1, N]:
    # r = (1 - u * (1 - N^(1-s)))^(1/(1-s))   (continuous approximation)
    one_m_s = 1.0 - s
    tail = 1.0 - float(vocab_size) ** one_m_s
    # fully vectorized: flat token ranks for ALL docs, then one arrow
    # take + list-join (no per-doc python)
    n = len(doc_ids)
    starts = np.concatenate([[0], np.cumsum(lens[:-1])]).astype(np.int64) if n else np.zeros(0, np.int64)
    total = int(lens.sum())
    doc_rep = np.repeat(doc_ids.astype(np.uint64), lens)
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    hv = ((doc_rep * np.uint64(2654435761) + pos.astype(np.uint64)) * K) >> np.uint64(11)
    u = np.clip(hv.astype(np.float64) / float(1 << 53), 1e-9, 1.0 - 1e-12)
    r = (1.0 - u * tail) ** (1.0 / one_m_s)
    ranks = (np.clip(r.astype(np.int64), 1, vocab_size) - 1).astype(np.int32)
    import pyarrow as _pa
    import pyarrow.compute as _pc

    vocab_arr = _pa.array(_vocab_strings(vocab_size).tolist(), _pa.string())
    flat = _pc.take(vocab_arr, _pa.array(ranks))
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    lists = _pa.ListArray.from_arrays(_pa.array(offsets, _pa.int32()), flat)
    return _pc.binary_join(lists, " ").to_pylist()


_VOCAB_CACHE: dict[int, np.ndarray] = {}


def _vocab_strings(vocab_size: int) -> np.ndarray:
    v = _VOCAB_CACHE.get(vocab_size)
    if v is None:
        v = np.array([f"t{r:06d}" for r in range(vocab_size)], dtype=object)
        _VOCAB_CACHE[vocab_size] = v
    return v


def make_zipf_corpus(
    n_docs: int, vocab_size: int = 50_000, s: float = 1.07, id_offset: int = 0
) -> pa.Table:
    ids = np.arange(id_offset, id_offset + n_docs, dtype=np.int64)
    texts = _zipf_texts(ids, vocab_size, s)
    # plant the exact phrase "alpha beta gamma" in every 97th doc (FIXTURES §1b)
    texts = [
        (t + " alpha beta gamma") if (i % 97 == 0) else t
        for i, t in zip(ids.tolist(), texts)
    ]
    lang = ["de" if (int(i) % 50 == 0) else "en" for i in ids]
    return _lift_documents_batch(
        pa.table({"doc_id": pa.array(ids), "text": pa.array(texts), "lang": pa.array(lang)})
    )


def write_synth_corpus(path: str, n_docs: int, kind: str = "zipf", rows_per_file: int = 4096) -> str:
    """Write a deterministic synthetic corpus as a directory of parquet
    files (generated in parallel via ray.data.range → map_batches so large
    bench corpora don't bottleneck on the driver)."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy().astype(np.int64)
        if kind == "primes":
            tbl = pa.table(
                {
                    "doc_id": pa.array(ids),
                    "text": pa.array([prime_factors_text(int(i)) for i in ids]),
                    "lang": pa.array(["en"] * len(ids)),
                }
            )
            return _lift_documents_batch(tbl)
        texts = _zipf_texts(ids, 50_000, 1.07)
        texts = [
            (t + " alpha beta gamma") if (int(i) % 97 == 0) else t
            for i, t in zip(ids.tolist(), texts)
        ]
        lang = ["de" if (int(i) % 50 == 0) else "en" for i in ids]
        return _lift_documents_batch(
            pa.table({"doc_id": pa.array(ids), "text": pa.array(texts), "lang": pa.array(lang)})
        )

    (
        rd.range(n_docs)
        .map_batches(gen, batch_format="pyarrow", batch_size=8192)
        .write_parquet(path, min_rows_per_file=rows_per_file)
    )
    return path
