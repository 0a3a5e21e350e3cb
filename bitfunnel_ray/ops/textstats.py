"""Text analysis stages for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

These have no reference analog (BitFunnel ingests pre-tokenized text);
they are the corpus-hygiene operators a 100 TB web-text pipeline needs
before indexing.  All are stateless vectorized ``map_batches`` stages
over the canonical corpus schema.  Deterministic by construction — fixed
constants, no RNG.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from bitfunnel_ray.stages.tokenize import flat_tokens

# fixed stopword list shared with oracle SQL (values present in the
# synthetic vocab so ratios are exercised)
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def token_count_batch(t: pa.Table) -> pa.Table:
    _, _, doclen = flat_tokens(t["text"])
    return pa.table({"doc_id": t["doc_id"], "n_tokens": pa.array(doclen, pa.int64())})


def token_count(corpus: "ray.data.Dataset") -> "ray.data.Dataset":
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        token_count_batch, batch_format="pyarrow"
    )


def quality_score_batch(t: pa.Table) -> pa.Table:
    """Length / uniqueness / stopword-ratio quality features + a single
    deterministic quality score in [0,1]."""
    flat, doc_of, doclen = flat_tokens(t["text"])
    n = len(t)
    tok_np = flat.to_numpy(zero_copy_only=False)
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.float64)
    sum_len = np.bincount(doc_of, weights=tok_len, minlength=n)
    is_stop = np.isin(tok_np, np.asarray(STOPWORDS, dtype=object))
    n_stop = np.bincount(doc_of, weights=is_stop.astype(np.float64), minlength=n)
    # unique tokens per doc
    if len(tok_np):
        order = np.lexsort((tok_np, doc_of))
        d_s, t_s = doc_of[order], tok_np[order]
        newrun = np.empty(len(order), bool)
        newrun[0] = True
        newrun[1:] = (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])
        n_unique = np.bincount(d_s[np.flatnonzero(newrun)], minlength=n)
    else:
        n_unique = np.zeros(n, dtype=np.int64)
    dl = doclen.astype(np.float64)
    safe = np.maximum(dl, 1.0)
    avg_token_len = sum_len / safe
    stopword_ratio = n_stop / safe
    uniq_ratio = n_unique / safe
    # deterministic composite: favors mid-length docs with diverse tokens
    quality = (
        np.clip(dl / 64.0, 0.0, 1.0) * 0.4
        + np.clip(uniq_ratio, 0.0, 1.0) * 0.4
        + np.clip(1.0 - stopword_ratio, 0.0, 1.0) * 0.2
    )
    quality[doclen == 0] = 0.0
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(doclen, pa.int64()),
            "n_unique": pa.array(n_unique.astype(np.int64)),
            "avg_token_len": pa.array(avg_token_len),
            "stopword_ratio": pa.array(stopword_ratio),
            "quality": pa.array(quality),
        }
    )


def quality_score(corpus: "ray.data.Dataset") -> "ray.data.Dataset":
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        quality_score_batch, batch_format="pyarrow"
    )


# --- language ID (n-gram/marker heuristic; actor stage so profiles are
# built once per actor) ---------------------------------------------------

_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to in is was for on that it with as at by this be are "
        "from or an have not but had his they you which one were her she".split()
    ),
    "de": frozenset(
        "der die das und ist von zu mit den nicht auf ein eine im dem des "
        "sich als auch es an werden aus er hat dass sie nach wird bei um".split()
    ),
    "es": frozenset(
        "el la de que y los en un una es por con para las del se su al lo "
        "como más pero sus le ya o este sí porque esta entre cuando".split()
    ),
    "fr": frozenset(
        "le la les de et des en un une est que pour dans ce il qui ne sur "
        "se pas plus par je avec tout faire son mais comme ou si leur".split()
    ),
    "it": frozenset(
        "il di che e la un a per in una sono mi si lo ma ha le con non "
        "come io questo qui hai del più al sei ci nel".split()
    ),
    "pt": frozenset(
        "o de a e que do da em um para com não uma os no se na por mais "
        "as dos como mas ao ele das à seu sua ou quando muito".split()
    ),
    "nl": frozenset(
        "de het een en van ik te dat die in je niet zijn is was op aan "
        "met als voor had er maar om hem dan zou of wat mijn".split()
    ),
}

# UTF-8 lead-byte script classes (vectorized over raw bytes — no per-char
# python): a dominant non-latin script decides the language directly.
# Thresholds are on the LEAD-byte fraction of all bytes: a pure 2-byte
# script tops out at 1/2 lead bytes, a pure 3-byte script at 1/3, so the
# "dominant" bar sits at roughly half the ceiling.
_SCRIPTS = (
    # (lang, lead lo, lead hi, dominance threshold)
    ("ru", 0xD0, 0xD1, 0.25),  # Cyrillic U+0400-04FF (2-byte)
    ("ar", 0xD8, 0xDB, 0.25),  # Arabic U+0600-06FF (2-byte)
    ("zh", 0xE4, 0xE9, 0.15),  # CJK Unified U+4E00-9FFF (3-byte)
    ("ko", 0xEA, 0xED, 0.15),  # Hangul syllables U+AC00-D7AF (3-byte)
)
_KANA_LEAD = 0xE3  # U+3000-3FFF incl. hiragana/katakana (3-byte) → ja


class LangId:
    """Deterministic two-stage language classifier: (1) vectorized UTF-8
    script detection over raw bytes — a document dominated by Cyrillic /
    Arabic / CJK / Hangul / kana bytes is classified by script (kana
    presence upgrades CJK to ja); (2) otherwise a stopword vote over seven
    Latin-script languages (dictionary-encoded batch → unique-vocab
    lookup).  No external models (none exist in this container); both
    stages are closed-form and reproducible."""

    def __init__(self, profiles: dict[str, frozenset[str]] | None = None):
        self.profiles = profiles or _PROFILES
        self.langs = sorted(self.profiles)
        self.vocab: dict[str, int] = {}
        for li, lang in enumerate(self.langs):
            for w in self.profiles[lang]:
                self.vocab.setdefault(w, 0)
                self.vocab[w] |= 1 << li

    def _script_votes(self, t: pa.Table, n: int):
        """Per-doc byte counts for each script class (+ kana)."""
        import pyarrow.compute as pc

        bin_col = pc.cast(pc.fill_null(t["text"], ""), pa.large_binary())
        arr = bin_col.combine_chunks() if isinstance(bin_col, pa.ChunkedArray) else bin_col
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=n + 1)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]]
        offs = offs - offs[0]
        bounds = offs[:-1]
        counts = {}
        for lang, lo, hi, _thr in _SCRIPTS:
            ind = ((data >= lo) & (data <= hi)).astype(np.int64)
            cs = np.concatenate([[0], np.cumsum(ind)])
            counts[lang] = cs[offs[1:]] - cs[bounds]
        ind = (data == _KANA_LEAD).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(ind)])
        counts["_kana"] = cs[offs[1:]] - cs[bounds]
        total = np.maximum(offs[1:] - bounds, 1)
        return counts, total

    def __call__(self, t: pa.Table) -> pa.Table:
        flat, doc_of, doclen = flat_tokens(t["text"])
        n = len(t)
        scores = np.zeros((n, len(self.langs)), dtype=np.float64)
        if len(flat):
            # dictionary-encode the batch once: vocab lookup runs over the
            # UNIQUE tokens only, then a gather maps back to token positions
            da = flat.dictionary_encode()
            uniq_masks = np.array(
                [self.vocab.get(w, 0) for w in da.dictionary.to_pylist()], dtype=np.int64
            )
            masks = uniq_masks[da.indices.to_numpy(zero_copy_only=False)]
        else:
            masks = np.empty(0, dtype=np.int64)
        for li in range(len(self.langs)):
            hit = (masks >> li) & 1
            scores[:, li] = np.bincount(doc_of, weights=hit.astype(np.float64), minlength=n)
        best = np.argmax(scores, axis=1)
        conf = scores[np.arange(n), best] / np.maximum(doclen, 1)
        # real prose carries a 30-70% stopword share; below 15% the vote is
        # noise (pseudo-words hitting one-letter markers) → undetermined
        pred = np.where(conf >= 0.15, np.asarray(self.langs, object)[best], "und")
        # script stage overrides the stopword vote where a non-latin
        # script dominates the document's bytes
        sc, total = self._script_votes(t, n)
        kana_frac = sc["_kana"] / total
        for lang, _lo, _hi, thr in _SCRIPTS:
            frac = sc[lang] / total
            if lang == "zh":
                # CJK text with meaningful kana share is Japanese (kanji +
                # kana mix); the combined lead fraction crosses the bar
                both = frac + kana_frac
                ja = (both > thr) & (kana_frac > 0.05)
                pred[ja] = "ja"
                conf[ja] = both[ja]
                m = (frac > thr) & ~ja
            else:
                m = frac > thr
            pred[m] = lang
            conf[m] = frac[m]
        kana_only = kana_frac > 0.15  # kana-dominant (little kanji) → ja
        pred[kana_only] = "ja"
        conf[kana_only] = np.maximum(conf[kana_only], kana_frac[kana_only])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang_pred": pa.array(pred.tolist(), pa.string()),
                "lang_conf": pa.array(conf),
            }
        )


def lang_id(corpus: "ray.data.Dataset", concurrency: int | None = None) -> "ray.data.Dataset":
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=concurrency or 2
    )


# --- document fingerprint (rolling hash over tokens) ---------------------

_FP_BASE = np.uint64(1099511628211)


def fingerprint_batch(t: pa.Table) -> pa.Table:
    """Order-sensitive 64-bit rolling fingerprint of the token stream
    (content-defined identity: same token sequence ⇒ same fingerprint)."""
    from bitfunnel_ray.stages.tokenize import hash_token_array

    flat, doc_of, doclen = flat_tokens(t["text"])
    n = len(t)
    h = hash_token_array(flat)
    fp = np.zeros(n, dtype=np.uint64)
    if len(h):
        # segmented polynomial hash: fp = Σ h_i * BASE^(pos_in_doc) — computed
        # by per-doc cumulative powers (vectorized via segmented cumsum trick)
        pos = np.arange(len(h), dtype=np.int64)
        starts = np.flatnonzero(np.diff(doc_of, prepend=-1))
        pos = pos - np.repeat(pos[starts], np.diff(np.append(starts, len(h))))
        # BASE^k mod 2^64 lookup table (one cumprod), then gather by position
        maxp = int(pos.max()) if len(pos) else 0
        pows = np.full(maxp + 1, _FP_BASE, dtype=np.uint64)
        pows[0] = np.uint64(1)
        pows = np.multiply.accumulate(pows, dtype=np.uint64)
        contrib = h * pows[pos]
        np.add.at(fp, doc_of, contrib)
    return pa.table({"doc_id": t["doc_id"], "fingerprint": pa.array(fp, pa.uint64())})


def fingerprint(corpus: "ray.data.Dataset") -> "ray.data.Dataset":
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow"
    )


# --- BPE-ish token counting ------------------------------------------------

# GPT-2-style pre-tokenizer split, restricted to RE2 syntax (no lookahead —
# both pyarrow.compute and DuckDB run RE2, so op and oracle count the same
# matches): contraction suffixes, space-prefixed letter runs, digit runs,
# punctuation runs, residual whitespace.
BPE_SPLIT_RX = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def regex_token_count_batch(t: pa.Table) -> pa.Table:
    """Whitespace token count + BPE-ish pre-tokenizer match count — the
    estimate a training-budget plan needs (LLM tokenizers emit ~1 token
    per regex match before merges, so this upper-bounds the BPE count)."""
    txt = pc.fill_null(t["text"], "")
    _, _, doclen = flat_tokens(t["text"])
    n_bpe = pc.count_substring_regex(txt, BPE_SPLIT_RX)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(doclen, pa.int64()),
            "n_bpe_tokens": n_bpe.cast(pa.int64()),
        }
    )


def regex_token_count(corpus: "ray.data.Dataset") -> "ray.data.Dataset":
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        regex_token_count_batch, batch_format="pyarrow"
    )


# --- head-coverage quality score (CCNet-style LM-proxy) ------------------


def _head_coverage_batch(t: pa.Table, *, head_ref) -> pa.Table:
    """Per-doc fraction of tokens that belong to the high-df vocabulary
    head.  Real prose is dominated by common words; gibberish / boilerplate
    / wrong-tokenization docs score low.  The CCNet pipeline uses a KenLM
    perplexity here (no models in this container); head coverage is the
    closed-form, oracle-checkable proxy built from the corpus's own df
    table.

    The head set (df ≥ threshold) is Zipf-small — broadcast once via
    ``ray.put``, plasma-local zero-copy ``ray.get`` per batch (repo
    broadcast convention, ops/ann.py).  If a caller sets the threshold so
    low the head stops being small, the join-based fallback is: hash-
    exchange (token, doc_id) rows by term against the dict table instead
    of broadcasting (same shape as the build shuffle)."""
    import ray as _ray

    head = np.asarray(_ray.get(head_ref), dtype=object)
    flat, doc_of, doclen = flat_tokens(t["text"])
    n = len(t)
    n_common = np.zeros(n, dtype=np.int64)
    if len(flat):
        da = flat.dictionary_encode()
        uniq = np.asarray(da.dictionary.to_pylist(), dtype=object)
        hit = np.isin(uniq, head)[da.indices.to_numpy(zero_copy_only=False)]
        n_common = np.bincount(
            doc_of, weights=hit.astype(np.float64), minlength=n
        ).astype(np.int64)
    frac = n_common.astype(np.float64) / np.maximum(doclen.astype(np.float64), 1.0)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(doclen, pa.int64()),
            "n_common": pa.array(n_common, pa.int64()),
            "common_frac": pa.array(frac),
        }
    )


def head_coverage(corpus: "ray.data.Dataset", min_df: int) -> "ray.data.Dataset":
    """→ (doc_id, n_tokens, n_common, common_frac) against the corpus's
    own df-≥-min_df vocabulary head."""
    import ray as _ray
    from functools import partial as _bind

    from bitfunnel_ray.build.stats import document_frequency_table
    from bitfunnel_ray.config import EngineConfig

    dft = document_frequency_table(corpus, EngineConfig(max_gram=1))
    head = [
        r["term"]
        for r in dft.filter(expr=f"df >= {int(min_df)}").select_columns(["term"]).take_all()
    ]
    head_ref = _ray.put(sorted(head))
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        _bind(_head_coverage_batch, head_ref=head_ref), batch_format="pyarrow"
    )


# --- repetition / boilerplate stats (Gopher-style quality rules) ---------


def repetition_stats_batch(t: pa.Table) -> pa.Table:
    """Per-document repetition fractions (the public Gopher-rule family,
    Rae et al. 2021 §A1.1): duplicate-token fraction, most-frequent-token
    fraction, most-frequent-bigram fraction.  Web-text pipelines drop
    documents above thresholds on these before training.

    Fully vectorized: one dictionary-encode of the batch's tokens, then
    run-length counting over a (doc, token[, token2]) lexsort — no per-row
    python.  All fractions are single IEEE divisions of exact int64 counts
    so the DuckDB oracle is bit-identical.
    """
    flat, doc_of, doclen = flat_tokens(t["text"])
    n = len(t)
    n_unique = np.zeros(n, dtype=np.int64)
    max_tf = np.zeros(n, dtype=np.int64)
    max_bf = np.zeros(n, dtype=np.int64)
    if len(flat):
        da = flat.dictionary_encode()
        ids = da.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # unigram runs: sort by (doc, token id), count run lengths
        order = np.lexsort((ids, doc_of))
        d_s, i_s = doc_of[order], ids[order]
        starts = np.flatnonzero(
            np.concatenate([[True], (d_s[1:] != d_s[:-1]) | (i_s[1:] != i_s[:-1])])
        )
        runlen = np.diff(np.append(starts, len(order)))
        run_doc = d_s[starts]
        n_unique = np.bincount(run_doc, minlength=n).astype(np.int64)
        np.maximum.at(max_tf, run_doc, runlen)
        # bigram runs: adjacent same-doc pairs, sort by (doc, id_l, id_r)
        pair = np.flatnonzero(doc_of[1:] == doc_of[:-1])
        if len(pair):
            dl, il, ir = doc_of[pair], ids[pair], ids[pair + 1]
            order = np.lexsort((ir, il, dl))
            d_s, l_s, r_s = dl[order], il[order], ir[order]
            starts = np.flatnonzero(
                np.concatenate(
                    [
                        [True],
                        (d_s[1:] != d_s[:-1])
                        | (l_s[1:] != l_s[:-1])
                        | (r_s[1:] != r_s[:-1]),
                    ]
                )
            )
            runlen = np.diff(np.append(starts, len(order)))
            np.maximum.at(max_bf, d_s[starts], runlen)
    nt = doclen.astype(np.float64)
    safe = np.maximum(nt, 1.0)
    dup = np.where(doclen > 0, 1.0 - n_unique.astype(np.float64) / safe, 0.0)
    top = np.where(doclen > 0, max_tf.astype(np.float64) / safe, 0.0)
    nb = np.maximum(nt - 1.0, 1.0)
    topb = np.where(doclen > 1, max_bf.astype(np.float64) / nb, 0.0)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(doclen, pa.int64()),
            "dup_token_frac": pa.array(dup),
            "top_token_frac": pa.array(top),
            "top_bigram_frac": pa.array(topb),
        }
    )


def repetition_stats(corpus: "ray.data.Dataset") -> "ray.data.Dataset":
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        repetition_stats_batch, batch_format="pyarrow"
    )


def normalize_text_batch(t: pa.Table) -> pa.Table:
    """Lowercase, collapse every non-alphanumeric run to one space, trim.
    Pure Arrow kernels (utf8_lower + RE2 replace) — the same RE2 regex
    engine DuckDB uses, so the SQL oracle is byte-identical."""
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(
            pc.utf8_lower(pc.fill_null(t["text"], "")), r"[^a-z0-9]+", " "
        )
    )
    return pa.table({"doc_id": t["doc_id"], "norm_text": norm})


def normalize_text(corpus: "ray.data.Dataset") -> "ray.data.Dataset":
    """Canonical text normalization (map-only, zero-copy Arrow in/out) —
    the cleanup pass that precedes tokenization/dedup in a web pipeline."""
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        normalize_text_batch, batch_format="pyarrow"
    )


def lang_id_sql() -> str:
    """Generated DuckDB oracle for the STOPWORD-VOTE stage of ``LangId``,
    built from the same ``_PROFILES`` the operator uses (single source of
    truth, like ``redact.redact_sql``).  Valid for ASCII corpora (the
    driver fixture is pure ASCII, so the UTF-8 script stage provably
    never fires there; non-ASCII script routing is pytest-covered with
    planted Cyrillic/CJK/kana docs).  Tie-break mirrors np.argmax
    first-max over the alphabetically sorted language list, and the
    confidence is the same single IEEE division."""
    langs = sorted(_PROFILES)
    cols = ", ".join(
        "len(list_filter(l, x -> x IN ({}))) AS c_{}".format(
            ",".join(f"'{w}'" for w in sorted(_PROFILES[lang])), lang
        )
        for lang in langs
    )
    m = "greatest(" + ",".join(f"c_{l}" for l in langs) + ")"
    case = "CASE " + " ".join(f"WHEN c_{l} = m THEN '{l}'" for l in langs) + " END"
    return f"""
WITH toks AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
c AS (SELECT doc_id, len(l) AS ndl, {cols} FROM toks),
s AS (SELECT doc_id, {m} AS m,
      CAST({m} AS DOUBLE)/CAST(greatest(ndl,1) AS DOUBLE) AS lang_conf,
      {", ".join("c_" + l for l in langs)} FROM c)
SELECT doc_id,
  CASE WHEN lang_conf >= 0.15 THEN {case} ELSE 'und' END AS lang_pred,
  lang_conf
FROM s
"""
