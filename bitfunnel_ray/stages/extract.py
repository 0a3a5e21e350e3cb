"""HTML → text extraction over the corpus's ``html:binary`` column.

The canonical corpus schema (BASELINE input hint; sources/corpus.py)
carries both the raw page (``html``) and the reference-extracted
``text``; the per-row invariant the engine must hold is byte-identical
extracted text per url.  This stage is the extractor: a fully
vectorized, dependency-free tag stripper (pyarrow.compute RE2 kernels —
no per-row python, no external HTML lib in this container), honest
about its limits: attribute values containing a literal ``>`` inside
quotes truncate that tag early (the classic regex-vs-HTML caveat), and
only the five XML entities + ``&nbsp;``/``&#39;`` are decoded.  For
production-grade parsing swap ``extract_text_batch`` for a real parser
inside the same ``map_batches`` stage — the pipeline shape (streaming,
zero-copy Arrow in/out) does not change.

Reference analog: the BitFunnel corpus tooling ingests PRE-extracted
chunk text (``src/Chunks/src/ChunkReader.cpp`` — the reference never
parses HTML itself); this stage is the upstream step a web-scale user
runs to produce those chunks from WARC-style pages.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# strip <script>/<style> with their CONTENT, then comments, then tags.
# RE2: (?is) = case-insensitive + dot-matches-newline; non-greedy bodies;
# no backreferences in RE2, so script and style are separate patterns.
_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"(?s)<[^>]*>"
# decode order matters: &amp; must be LAST so "&amp;lt;" → "&lt;" not "<"
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def extract_text_batch(
    html: "pa.ChunkedArray | pa.Array",
    *,
    decode_entities: bool = True,
    normalize_ws: bool = False,
) -> "pa.ChunkedArray | pa.Array":
    """binary html column → extracted text column (vectorized).

    ``normalize_ws=False`` (default) preserves the source's whitespace
    exactly — required for the byte-identical invariant against
    reference-extracted text; ``True`` collapses runs to single spaces
    and trims (the form a tokenizer-bound pipeline usually wants) and
    treats every stripped tag as a token separator, so ``x</p><p>y``
    yields ``x y`` rather than fusing into ``xy``."""
    gap = " " if normalize_ws else ""
    s = pc.cast(pc.fill_null(html, b""), pa.string())
    s = pc.replace_substring_regex(s, _SCRIPT_RE, gap)
    s = pc.replace_substring_regex(s, _STYLE_RE, gap)
    s = pc.replace_substring_regex(s, _COMMENT_RE, gap)
    s = pc.replace_substring_regex(s, _TAG_RE, gap)
    if decode_entities:
        for ent, ch in _ENTITIES:
            s = pc.replace_substring(s, ent, ch)
    if normalize_ws:
        s = pc.utf8_trim_whitespace(pc.replace_substring_regex(s, r"\s+", " "))
    return s


def extract_text(
    corpus: "ray.data.Dataset",
    *,
    html_col: str = "html",
    out_col: str = "text",
    decode_entities: bool = True,
    normalize_ws: bool = False,
) -> "ray.data.Dataset":
    """Map-only streaming stage: add/replace ``out_col`` with text
    extracted from ``html_col``.  Zero exchanges; scales with input."""

    def f(t: pa.Table) -> pa.Table:
        txt = extract_text_batch(
            t[html_col],
            decode_entities=decode_entities,
            normalize_ws=normalize_ws,
        )
        if out_col in t.column_names:
            t = t.set_column(t.column_names.index(out_col), out_col, txt)
        else:
            t = t.append_column(out_col, txt)
        return t

    return corpus.map_batches(f, batch_format="pyarrow")
