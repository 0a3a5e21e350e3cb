"""Round-5 dedup rework invariants: the fused spilled-shingle pipeline and
the bloom-gated candidate semi-join must be BIT-IDENTICAL to the unfused /
driver-gather paths they replaced (VERDICT r4 next-round tasks #2/#3)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from bitfunnel_ray.ops import dedup


def _corpus(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else list(ids)
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )


def _mk_texts(n=60, seed=7):
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        toks = [f"w{rng.integers(0, 400)}" for _ in range(30)]
        texts.append(" ".join(toks))
    # planted near-dups: copies with one token changed
    for i in range(0, n, 10):
        texts.append(texts[i].replace("w", "w", 1) + " tail")
    return texts


def test_bands_from_shingles_bit_identical(ray_session):
    """LSH band rows computed from the shingle64 spill must equal the
    from-text MinhashBands rows exactly (same keys, same docs) — this is
    what makes the fused pipeline's candidate set provably unchanged."""
    texts = _mk_texts() + ["", "short", "a b"]  # empty + <k-token docs too
    c = _corpus(texts)
    from_text = (
        c.map_batches(dedup.MinhashBands(3, 16), batch_format="pyarrow")
        .to_pandas()
        .sort_values(["band_id", "band_key", "doc_id"])
        .reset_index(drop=True)
    )
    sh64 = dedup.shingle64_rows(c, 3)
    from_spill = (
        sh64.map_batches(dedup.BandsFromShingles(16), batch_format="pyarrow")
        .to_pandas()
        .sort_values(["band_id", "band_key", "doc_id"])
        .reset_index(drop=True)
    )
    assert from_text.equals(from_spill)


def test_fused_pipeline_matches_unfused_stages(ray_session):
    """minhash_dedup_pairs (fused spill + bloom verify) returns exactly
    the pairs of the explicit unfused composition candidates→verify."""
    c = _corpus(_mk_texts())
    fused = dedup.minhash_dedup_pairs_table(c, k=3, bands=16, threshold=0.5)
    cands = dedup.minhash_candidates(c, k=3, bands=16)
    unfused = (
        dedup.jaccard_verify(c, cands, k=3, threshold=0.5)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    f = fused.to_pandas()
    assert f[["doc_a", "doc_b"]].values.tolist() == unfused[["doc_a", "doc_b"]].values.tolist()
    assert np.array_equal(f["jaccard"].to_numpy(), unfused["jaccard"].to_numpy())
    assert len(f) > 0  # planted dups must actually surface


def test_fused_prefilter_keeps_pairs(ray_session):
    """The spill-side signature prefilter path produces the same verified
    pairs as the no-prefilter path at a generous margin."""
    c = _corpus(_mk_texts())
    base = dedup.minhash_dedup_pairs_table(c, k=3, bands=16, threshold=0.5)
    pre = dedup.minhash_dedup_pairs_table(
        c, k=3, bands=16, threshold=0.5, prefilter_margin=0.5
    )
    assert base.to_pandas().values.tolist() == pre.to_pandas().values.tolist()


def test_candidate_bloom_no_false_negatives(ray_session):
    """Every true candidate id passes the bloom gate (no false
    negatives), including with sequential test-corpus ids."""
    import ray as _ray

    pairs = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([1, 5, 900000], pa.int64()),
                "doc_b": pa.array([2, 7, 900001], pa.int64()),
            }
        )
    )
    ref = dedup._candidate_bloom_ref(pairs.materialize())
    b = _ray.get(ref)
    ids = np.array([1, 2, 5, 7, 900000, 900001], np.int64)
    assert b.contains_many(ids).all()


def test_candidate_bloom_empty_pairs(ray_session):
    empty = ray.data.from_arrow(
        pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    )
    assert dedup._candidate_bloom_ref(empty.materialize()) is None
    c = _corpus(["a b c d e"])
    out = dedup.jaccard_verify(c, empty, k=3, threshold=0.5).to_pandas()
    assert len(out) == 0


def test_ngram_jaccard_dataset_and_table_agree(ray_session):
    """The Dataset-returning ngram_jaccard_pairs and its _table twin hold
    the same rows (the twin adds only the deterministic sort)."""
    texts = _mk_texts(20)
    c = _corpus(texts)
    ds = (
        dedup.ngram_jaccard_pairs(c, k=3, threshold=0.3, max_df=1024)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    tb = dedup.ngram_jaccard_pairs_table(c, k=3, threshold=0.3, max_df=1024).to_pandas()
    assert ds.values.tolist() == tb.values.tolist()
    assert len(tb) > 0
