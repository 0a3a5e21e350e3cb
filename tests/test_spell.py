"""SymSpell spelling correction (ops/spell.py).

The registry entry ``spell_correct`` is oracle-checked bit-exactly by
tests/test_driver_contract.py; here we pin the primitives: the DP edit
distance against DuckDB's `levenshtein()` (hypothesis), the deletion-
variant completeness guarantee, and tie-break order.
"""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from bitfunnel_ray.build.stats import document_frequency_table
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.ops import spell

_words = st.text(alphabet="abcdez", min_size=0, max_size=8)


@given(_words, _words)
@settings(max_examples=200, deadline=None)
def test_levenshtein_matches_duckdb(a, b):
    got = spell.levenshtein(a, b)
    want = duckdb.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
    assert got == want


@given(_words.filter(lambda w: len(w) >= 1), st.integers(1, 2))
@settings(max_examples=100, deadline=None)
def test_deletion_variants_complete(w, d):
    # every string within levenshtein distance d of w shares a deletion
    # variant with w — spot-check against all single-op neighbors of w
    vs_w = spell.deletion_variants(w, d)
    neighbors = set()
    for i in range(len(w) + 1):
        for c in "abz":
            neighbors.add(w[:i] + c + w[i:])  # insertion
    for i in range(len(w)):
        neighbors.add(w[:i] + w[i + 1 :])  # deletion
        for c in "abz":
            neighbors.add(w[:i] + c + w[i + 1 :])  # substitution
    for x in neighbors:
        assert spell.levenshtein(w, x) <= d or True  # sanity only
        assert vs_w & spell.deletion_variants(x, d), (w, x)


def _vocab_ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "term": pa.array([r[0] for r in rows], pa.string()),
                "df": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )


def test_correct_terms_tiebreak_and_omission():
    vocab = _vocab_ds([("table", 10), ("cable", 20), ("fable", 20), ("join", 5)])
    idx = spell.spelling_index(vocab, max_dist=2)
    out = spell.correct_terms(idx, ["tabel", "joiin", "qqqqqq"], max_dist=2).to_pandas()
    got = dict(zip(out["query"], zip(out["suggestion"], out["dist"], out["df"])))
    # 'tabel': table/cable/fable all dist 2 from 'tabel'? table is dist 2
    # (transposition = 2 unit ops); cable dist 3; fable dist 3 -> table
    assert got["tabel"] == ("table", 2, 10)
    assert got["joiin"] == ("join", 1, 5)
    assert "qqqqqq" not in got  # nothing within distance 2 -> omitted


def test_exact_term_is_distance_zero(sf_tiny):
    from bitfunnel_ray.sources.corpus import corpus_from_documents

    vocab = document_frequency_table(
        corpus_from_documents(sf_tiny), EngineConfig(max_gram=1)
    ).select_columns(["term", "df"])
    idx = spell.spelling_index(vocab, max_dist=1)
    out = spell.correct_terms(idx, ["join"], max_dist=1).to_pandas()
    assert out["suggestion"].tolist() == ["join"]
    assert out["dist"].tolist() == [0]
