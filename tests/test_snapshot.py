"""Index snapshot/restore (build/snapshot.py): digest-verified copy,
incremental re-snapshot, corruption detection, restored-index parity."""

import json
import os

import pytest

from bitfunnel_ray.build.builder import build_index
from bitfunnel_ray.build.snapshot import restore_index, snapshot_index, verify_snapshot
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.query.engine import SearchEngine
from bitfunnel_ray.sources.corpus import corpus_from_documents

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("snap") / "seg")
    build_index(corpus_from_documents(SF), out, EngineConfig(max_gram=2, num_buckets=4))
    return out


def test_snapshot_restore_parity(built, tmp_path):
    snap = str(tmp_path / "repo")
    res = snapshot_index(built, snap)
    assert res["segments"] == 1 and res["files"] > 4 and res["bytes"] > 0
    assert len(verify_snapshot(snap)) == 0

    # incremental: a second snapshot of the same index copies nothing new
    # (manifest rewrites, repository files are digest-skipped)
    mtimes = {
        p: os.path.getmtime(os.path.join(r, p2))
        for r, _d, fs in os.walk(snap)
        for p2 in fs
        for p in [os.path.join(r, p2)]
        if not p2.endswith(".json")
    }
    snapshot_index(built, snap)
    for p, m in mtimes.items():
        assert os.path.getmtime(p) == m, f"{p} was rewritten"

    dest = str(tmp_path / "restored")
    dirs = restore_index(snap, dest)
    assert os.path.exists(os.path.join(dest, "_RESTORED"))
    a = SearchEngine(built, load_urls=False)
    b = SearchEngine(dirs, load_urls=False)
    for q in ("spark join", "merge | window", "table -join", '"batch batch"'):
        ra, rb = a.search(q, k=10), b.search(q, k=10)
        assert ra["doc_id"].to_pylist() == rb["doc_id"].to_pylist(), q
        assert ra["score"].to_pylist() == rb["score"].to_pylist(), q


def test_corruption_detected_and_restore_refuses(built, tmp_path):
    snap = str(tmp_path / "repo")
    snapshot_index(built, snap)
    with open(os.path.join(snap, "snapshot.json")) as f:
        manifest = json.load(f)
    victim = next(
        r for r in manifest["files"] if r["file"].startswith("dict-")
    )
    p = os.path.join(snap, victim["segment"], victim["file"])
    with open(p, "r+b") as f:
        f.seek(10)
        f.write(b"\xde\xad")
    bad = verify_snapshot(snap)
    assert len(bad) == 1 and bad["reason"][0].as_py() == "digest-mismatch"
    with pytest.raises(IOError, match="verification"):
        restore_index(snap, str(tmp_path / "restored"))
    # a missing file is reported too
    os.unlink(p)
    assert verify_snapshot(snap)["reason"][0].as_py() == "missing"


def test_snapshot_gc_removes_unreferenced_segments(built, tmp_path):
    """After the live segment set changes, gc drops repo segments the
    current manifest no longer references — and never a live one."""
    import shutil

    from bitfunnel_ray.build.snapshot import gc_snapshot

    snap = str(tmp_path / "repo")
    snapshot_index(built, snap)
    # simulate an old snapshot's leftover segment dir
    stale = os.path.join(snap, "seg-old-999-deadbeef")
    shutil.copytree(
        os.path.join(snap, json.load(open(os.path.join(snap, "snapshot.json")))["segments"][0]),
        stale,
    )
    res = gc_snapshot(snap)
    assert res["removed_segments"] == 1 and res["freed_bytes"] > 0
    assert not os.path.exists(stale)
    # live segments intact: verify + restore still work
    assert len(verify_snapshot(snap)) == 0
    dirs = restore_index(snap, str(tmp_path / "rest"))
    assert SearchEngine(dirs, load_urls=False).n_docs == 500


def test_resnapshot_detects_in_place_rebuild(built, tmp_path):
    """A segment file rebuilt in place with the SAME byte size but
    different content must be re-copied on the next snapshot: the
    incremental skip keys on (size, source mtime), not size alone."""
    snap = str(tmp_path / "repo")
    snapshot_index(built, snap)
    # simulate an in-place rebuild: same size, different bytes, new mtime
    victim = None
    for root, _, files in os.walk(built):
        for f in files:
            if f.endswith(".parquet"):
                victim = os.path.join(root, f)
                break
        if victim:
            break
    orig = open(victim, "rb").read()
    try:
        mutated = bytes([orig[0] ^ 0xFF]) + orig[1:]
        with open(victim, "wb") as fh:
            fh.write(mutated)
        res = snapshot_index(built, snap)
        assert res["segments"] == 1
        assert len(verify_snapshot(snap)) == 0  # repo matches its manifest
        # the repo copy carries the NEW bytes, not the stale ones
        man = json.load(open(os.path.join(snap, "snapshot.json")))
        rel = os.path.relpath(victim, built)
        row = next(r for r in man["files"] if r["file"] == rel)
        import hashlib

        assert row["sha256"] == hashlib.sha256(mutated).hexdigest()
    finally:
        with open(victim, "wb") as fh:
            fh.write(orig)
