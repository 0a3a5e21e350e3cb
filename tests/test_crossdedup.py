"""Cross-corpus (incremental) dedup — drop new docs duplicating the kept
corpus: planted exact/near dups removed, distinct docs survive, and the
MinHash scale path agrees with the exact n-gram path."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from bitfunnel_ray.ops.dedup import (
    minhash_cross_candidates,
    minhash_cross_dedup,
    ngram_jaccard_pairs_table,
)


def _mk(ids, texts):
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )


@pytest.fixture(scope="module")
def planted(ray_session):
    base = [" ".join(f"t{i}_{j}" for j in range(25)) for i in range(12)]
    ref = _mk(range(12), base)
    newtexts = [" ".join(f"n{i}_{j}" for j in range(25)) for i in range(12)]
    newtexts[0] = base[0]                       # exact cross dup
    toks = base[1].split(); toks[5] = "zz"      # near cross dup (1 token)
    newtexts[1] = " ".join(toks)
    newtexts[2] = newtexts[3]                   # new-new exact dup: NOT cross, must survive
    new = _mk(range(100, 112), newtexts)
    return new, ref


def test_cross_dedup_drops_only_cross_dups(planted):
    new, ref = planted
    out = minhash_cross_dedup(new, ref, k=3, bands=32, threshold=0.5).to_pandas()
    got = sorted(out["doc_id"].tolist())
    # 100 (exact) and 101 (near) dropped; the new-new dup pair 102/103
    # both survive — cross dedup never touches within-corpus dups
    assert got == [i for i in range(100, 112) if i not in (100, 101)]


def test_cross_candidates_are_cross_only(planted):
    new, ref = planted
    c = minhash_cross_candidates(new, ref, k=3, bands=32).to_pandas()
    assert (c["doc_a"] >= 100).all()  # doc_a is always the new side
    assert (c["doc_b"] < 100).all()
    assert {tuple(r) for r in c[["doc_a", "doc_b"]].values.tolist()} >= {(100, 0), (101, 1)}


def test_minhash_path_matches_exact_path(planted):
    """With enough bands the LSH path's drop set equals the exact n-gram
    path's cross drops on the planted corpus."""
    new, ref = planted
    got = set(
        minhash_cross_dedup(new, ref, k=3, bands=32, threshold=0.5)
        .to_pandas()["doc_id"]
    )
    union = new.union(ref)
    pairs = ngram_jaccard_pairs_table(union, k=3, threshold=0.5, max_df=1024)
    a, b = pairs["doc_a"].to_numpy(), pairs["doc_b"].to_numpy()
    cross = (a >= 100) != (b >= 100)
    drop = {int(x) if x >= 100 else int(y) for x, y in zip(a[cross], b[cross])}
    # exact-text cross dup may not share an LSH band... it is caught by
    # the content-hash stage instead; fold it in
    drop.add(100)
    want = {i for i in range(100, 112)} - drop
    assert got == want


def test_no_dups_is_identity(ray_session):
    new = _mk(range(100, 105), [" ".join(f"a{i}_{j}" for j in range(20)) for i in range(5)])
    ref = _mk(range(5), [" ".join(f"b{i}_{j}" for j in range(20)) for i in range(5)])
    out = minhash_cross_dedup(new, ref, k=3, bands=16, threshold=0.5).to_pandas()
    assert sorted(out["doc_id"].tolist()) == list(range(100, 105))


def test_cli_cross_dedup(planted, tmp_path):
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    new, ref = planted
    new_p, ref_p = str(tmp_path / "new.parquet"), str(tmp_path / "ref.parquet")
    pq.write_table(pa.concat_tables([b for b in new.iter_batches(batch_format="pyarrow")]), new_p)
    pq.write_table(pa.concat_tables([b for b in ref.iter_batches(batch_format="pyarrow")]), ref_p)
    out = str(tmp_path / "kept")
    r = subprocess.run(
        [sys.executable, "-m", "bitfunnel_ray.cli", "cross-dedup", new_p, ref_p, out,
         "--shingle", "3", "--bands", "32", "--threshold", "0.5"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-500:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res == {"docs_in": 12, "kept": 10, "dropped": 2}


def test_pretrain_with_ref_corpus(planted, tmp_path):
    """pretrain_pipeline(ref_corpus=...) drops cross dups after cleaning
    and reports the stage."""
    from bitfunnel_ray.pipelines.pretrain import pretrain_pipeline
    from bitfunnel_ray.sources.corpus import _lift_documents_batch

    new, ref = planted
    new_t = pa.concat_tables([b for b in new.iter_batches(batch_format="pyarrow")])
    lifted = rd.from_arrow(
        _lift_documents_batch(new_t.append_column("lang", pa.array(["en"] * len(new_t))))
    )
    rep = pretrain_pipeline(
        lifted,
        str(tmp_path / "out"),
        min_tokens=5,
        minhash_k=3,
        minhash_bands=32,
        jaccard_threshold=0.5,
        ref_corpus=ref,
    )
    assert rep["after_cross_dedup"] == rep["after_clean"] - 2  # 100 + 101
