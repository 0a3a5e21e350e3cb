"""Seeded shuffled-shard output (ops/shuffleout.py): deterministic
content, complete partition of the input, resumable writes."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from bitfunnel_ray.ops.shuffleout import shuffle_keys, shuffle_order, write_shuffled_shards

SF = "/root/testdata/sf0.001"


def _read_all(out):
    return {
        f: pq.read_table(os.path.join(out, f))
        for f in sorted(os.listdir(out))
        if f.endswith(".parquet")
    }


def test_write_is_deterministic_and_complete(tmp_path, ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ra = write_shuffled_shards(docs, a, seed=7, num_shards=4)
    rb = write_shuffled_shards(docs, b, seed=7, num_shards=4)
    assert ra["rows"] == rb["rows"] == 500 and ra["skipped"] == 0
    ta, tb = _read_all(a), _read_all(b)
    assert list(ta) == list(tb) and len(ta) == 4
    for f in ta:
        assert ta[f].equals(tb[f]), f  # byte-level determinism
    # complete partition: union of shards == input ids, no dups
    all_ids = np.concatenate([t["doc_id"].to_numpy() for t in ta.values()])
    assert np.array_equal(np.sort(all_ids), np.arange(500))
    # within-shard order is ascending shuffle key
    for f, t in ta.items():
        k = shuffle_keys(t["doc_id"].to_numpy(), 7)
        assert (np.diff(k.astype(np.uint64)) > 0).all() or len(k) < 2, f


def test_different_seed_different_order(tmp_path, ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_shuffled_shards(docs, a, seed=1, num_shards=2)
    write_shuffled_shards(docs, b, seed=2, num_shards=2)
    ta, tb = _read_all(a), _read_all(b)
    assert any(
        not ta[f].equals(tb[f]) for f in ta
    )  # a different seed permutes differently


def test_resume_fills_only_missing_shards(tmp_path, ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    out = str(tmp_path / "out")
    write_shuffled_shards(docs, out, seed=7, num_shards=4)
    victim = os.path.join(out, "shard-00002.parquet")
    want = pq.read_table(victim)
    os.remove(victim)
    # poison the survivors: if the rerun rewrote them, mtimes would change
    before = {
        f: os.path.getmtime(os.path.join(out, f))
        for f in os.listdir(out)
        if f.endswith(".parquet")
    }
    r = write_shuffled_shards(docs, out, seed=7, num_shards=4)
    assert r["skipped"] == 3
    assert pq.read_table(victim).equals(want)  # refilled identically
    for f, mt in before.items():
        assert os.path.getmtime(os.path.join(out, f)) == mt, f


def test_order_matches_writer(ray_session, tmp_path):
    """shuffle_order (the oracle-checkable form) describes exactly what
    write_shuffled_shards lays down."""
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    out = str(tmp_path / "out")
    write_shuffled_shards(docs, out, seed=42, num_shards=4)
    order = shuffle_order(docs, seed=42, num_shards=4).to_pandas()
    for s, g in order.groupby("shard"):
        t = pq.read_table(os.path.join(out, f"shard-{int(s):05d}.parquet"))
        g = g.sort_values("pos")
        assert t["doc_id"].to_pylist() == g["doc_id"].tolist(), s


def test_pretrain_shuffled_output(tmp_path, ray_session):
    """pretrain_pipeline(shuffle_seed=...) writes each split as seeded
    shuffled shards; the union equals the cleaned corpus and every shard
    is internally key-ordered."""
    import pyarrow as pa

    from bitfunnel_ray.pipelines.pretrain import pretrain_pipeline
    from bitfunnel_ray.sources.corpus import _lift_documents_batch

    texts = [" ".join(f"w{i}{j}" for j in range(30)) for i in range(40)]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
        }
    )
    corpus = rd.from_arrow(_lift_documents_batch(t))
    out = str(tmp_path / "clean")
    rep = pretrain_pipeline(
        corpus, out, min_tokens=5, shuffle_seed=13, shuffle_shards=3
    )
    assert rep["written"] == rep["after_near_dedup"] == 40
    ids = []
    for split in ("train", "val", "test"):
        d = os.path.join(out, f"split={split}")
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            tt = pq.read_table(os.path.join(d, f))
            k = shuffle_keys(tt["doc_id"].to_numpy(), 13)
            assert (np.diff(k.astype(np.uint64)) > 0).all() or len(k) < 2
            ids.extend(tt["doc_id"].to_pylist())
    assert sorted(ids) == list(range(40))


def test_cli_shuffle_out(tmp_path, ray_session):
    import json
    import subprocess
    import sys

    out = str(tmp_path / "shards")
    r = subprocess.run(
        [sys.executable, "-m", "bitfunnel_ray.cli", "shuffle-out",
         f"{SF}/documents.parquet", out, "--seed", "5", "--shards", "4"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-500:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res == {"shards": 4, "rows": 500, "skipped": 0}
    assert len([f for f in os.listdir(out) if f.endswith(".parquet")]) == 4


def test_rerun_with_different_config_rejected(tmp_path, ray_session):
    """A rerun into an existing output dir with a different seed or shard
    count must fail loudly — a silent skip would keep stale shards while
    reporting current-run counts."""
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    out = str(tmp_path / "out")
    write_shuffled_shards(docs, out, seed=1, num_shards=4)
    with pytest.raises(ValueError, match="seed"):
        write_shuffled_shards(docs, out, seed=2, num_shards=4)
    with pytest.raises(ValueError, match="num_shards"):
        write_shuffled_shards(docs, out, seed=1, num_shards=8)


def test_rerun_with_changed_input_rejected(tmp_path, ray_session):
    """Same config but a changed input corpus: the per-shard row-count
    check refuses to silently keep the stale shard."""
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    out = str(tmp_path / "out")
    write_shuffled_shards(docs, out, seed=1, num_shards=2)
    import pyarrow as pa

    half = rd.from_arrow(pa.table({"doc_id": pa.array(range(100), pa.int64())}))
    with pytest.raises(Exception, match="row count|input changed"):
        write_shuffled_shards(half, out, seed=1, num_shards=2)
