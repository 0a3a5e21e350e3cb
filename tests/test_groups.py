"""Ingest-group lifecycle (bitfunnel_ray/build/groups.py — the
IIngestor.h:158-176 OpenGroup/CloseGroup/ExpireGroup analog the
reference declares but never implemented): a group is the docs
ingested while it was open; expiry must make the index serve exactly
what a fresh build WITHOUT those docs serves (bit-identical search
results), and the lifecycle contract (no reopen, no ingest without an
open group, no expiring the open group) must fail loudly."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from bitfunnel_ray.build import groups as grp
from bitfunnel_ray.build.builder import build_index
from bitfunnel_ray.build.segment import resolve_segment_dirs
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.query.engine import SearchEngine
from bitfunnel_ray.sources.corpus import _lift_documents_batch, corpus_from_documents

SF = "/root/testdata/sf0.001"
CFG = EngineConfig(max_gram=2, num_buckets=4)
QUERIES = ["table join", "merge | window", "table -join", '"batch batch"', "-table"]


@pytest.fixture(scope="module")
def grouped_root(tmp_path_factory, ray_session):
    base = tmp_path_factory.mktemp("groups")
    root = str(base / "root")
    docs = pq.read_table(f"{SF}/documents.parquet")
    grp.open_group(root, "day1")
    grp.ingest(root, rd.from_arrow(_lift_documents_batch(docs.slice(0, 250))), CFG)
    grp.close_group(root)
    grp.open_group(root, "day2")
    grp.ingest(root, rd.from_arrow(_lift_documents_batch(docs.slice(250))), CFG)
    grp.close_group(root)
    # oracles: fresh builds over the union and over day2 alone
    full = str(base / "full")
    build_index(corpus_from_documents(SF), full, CFG)
    half2 = str(base / "half2")
    build_index(rd.from_arrow(_lift_documents_batch(docs.slice(250))), half2, CFG)
    return root, full, half2


def _same_results(dirs_a, dirs_b):
    a = SearchEngine(dirs_a, load_urls=False)
    b = SearchEngine(dirs_b, load_urls=False)
    for q in QUERIES:
        ra, rb = a.search(q, k=10).to_pandas(), b.search(q, k=10).to_pandas()
        assert ra["doc_id"].tolist() == rb["doc_id"].tolist(), q
        assert np.allclose(ra["score"], rb["score"]), q


def test_groups_serve_union(grouped_root):
    root, full, _ = grouped_root
    # the root itself is a locator: resolve_segment_dirs reads groups.json
    segs = resolve_segment_dirs(root)
    assert len(segs) == 2
    _same_results(root, full)


def test_status(grouped_root):
    root, *_ = grouped_root
    st = grp.status(root)
    assert st["open"] is None
    assert st["groups"]["day1"] == {"state": "closed", "n_segments": 1, "n_docs": 250}
    assert st["groups"]["day2"]["n_docs"] == 250


def test_lifecycle_contract(grouped_root, tmp_path):
    root, *_ = grouped_root
    with pytest.raises(ValueError, match="reopened"):
        grp.open_group(root, "day1")  # closed groups cannot be reopened
    fresh = str(tmp_path / "fresh")
    with pytest.raises(RuntimeError, match="no open group"):
        grp.ingest(fresh, None, CFG)
    with pytest.raises(KeyError):
        grp.expire_group(root, "nope")
    grp.open_group(fresh, "g")
    with pytest.raises(ValueError, match="open"):
        grp.expire_group(fresh, "g")  # must close before expiring
    # opening a second group auto-closes the first (IIngestor.h:166-168)
    grp.open_group(fresh, "h")
    st = grp.status(fresh)
    assert st["groups"]["g"]["state"] == "closed" and st["open"] == "h"


def test_expire_equals_build_without(grouped_root):
    """Expiring day1 must serve bit-identically to a fresh build that
    never saw day1's documents — and actually remove the data."""
    root, _, half2 = grouped_root
    doomed = resolve_segment_dirs(root)
    n = grp.expire_group(root, "day1")
    assert n == 1
    segs = resolve_segment_dirs(root)
    assert len(segs) == 1
    gone = [d for d in doomed if d not in segs]
    assert gone and not os.path.exists(gone[0])  # data deleted, not hidden
    _same_results(root, half2)
