"""HTML → text extraction (stages/extract.py): unit kernels + the
byte-identical-per-url invariant over the canonical corpus."""

import pyarrow as pa
import pyarrow.compute as pc

from bitfunnel_ray.stages.extract import extract_text, extract_text_batch


def _one(html: bytes, **kw) -> str:
    arr = pa.array([html], pa.binary())
    return extract_text_batch(arr, **kw).to_pylist()[0]


def test_tags_stripped():
    assert _one(b"<html><body>hello world</body></html>") == "hello world"
    assert _one(b"<p class='x'>a</p><div>b</div>") == "ab"


def test_script_and_style_content_removed():
    h = b"<head><style>p{color:red}</style><script>var x=1;</script></head>body text"
    assert _one(h) == "body text"
    # case-insensitive, attributes, multiline bodies
    h = b"<SCRIPT type='text/javascript'>\nif (a<b) { go(); }\n</SCRIPT>keep"
    assert _one(h) == "keep"


def test_comments_removed():
    assert _one(b"a<!-- hidden <b>bold</b> -->z") == "az"


def test_entities_decoded():
    assert _one(b"a &lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39; b") == "a <tag> & \"q\" 's' b"
    # &amp; decoded LAST: double-escaped stays single-escaped
    assert _one(b"&amp;lt;") == "&lt;"
    assert _one(b"x &amp; y", decode_entities=False) == "x &amp; y"


def test_whitespace_modes():
    h = b"<p>a</p>\n\n  <p>b   c</p>"
    assert _one(h) == "a\n\n  b   c"          # default: bytes preserved
    assert _one(h, normalize_ws=True) == "a b c"


def test_null_and_empty_html():
    arr = pa.array([None, b""], pa.binary())
    assert extract_text_batch(arr).to_pylist() == ["", ""]


def test_corpus_roundtrip_byte_identical(ray_session):
    """The north-rule invariant: extraction over the canonical corpus's
    html column reproduces the reference text column byte-for-byte."""
    from bitfunnel_ray.sources.corpus import corpus_from_documents

    corpus = corpus_from_documents("/root/testdata/sf0.001")
    out = extract_text(corpus, out_col="extracted")
    t = out.select_columns(["text", "extracted"]).to_pandas()
    assert len(t) == 500
    assert (t["text"].fillna("") == t["extracted"]).all()
