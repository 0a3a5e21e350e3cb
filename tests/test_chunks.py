"""Chunk-file format adapter: grammar fidelity + round-trip tests
(format per /root/reference/src/Chunks/src/ChunkReader.cpp:42-100)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from bitfunnel_ray.sources.chunks import (
    chunk_bytes,
    corpus_from_chunks,
    parse_chunk_buffer,
    write_chunks,
)


def test_parse_hand_built_buffer():
    # one doc, body stream with two terms + title stream, then one
    # empty-stream doc — built by hand from the grammar
    buf = (
        b"00000000000000ff\x00"        # doc 255
        b"00\x00one\x00two\x00\x00"    # stream 0: one two
        b"02\x00t\x00\x00"             # stream 2: t
        b"\x00"                        # end doc
        b"0000000000000100\x00"        # doc 256
        b"\x00"                        # end doc (no streams)
        b"\x00"                        # end file
    )
    docs = parse_chunk_buffer(buf)
    assert docs == [(255, {0: ["one", "two"], 2: ["t"]}), (256, {})]


def test_parse_rejects_malformed():
    with pytest.raises(ValueError):
        parse_chunk_buffer(b"0f\x00\x00")  # short doc id
    with pytest.raises(ValueError):
        parse_chunk_buffer(b"00000000000000ff\x00" b"00\x00one")  # no terminator


def test_chunk_bytes_parse_inverse():
    ids = np.array([1, 2, 3], dtype=np.int64)
    cols = {0: ["a b", "", "c"], 2: ["T", "U", ""]}
    docs = parse_chunk_buffer(chunk_bytes(ids, cols))
    assert docs == [
        (1, {0: ["a", "b"], 2: ["T"]}),
        (2, {2: ["U"]}),  # empty body stream omitted
        (3, {0: ["c"]}),
    ]


def test_roundtrip_through_files(tmp_path):
    texts = ["alpha beta", "", "gamma", "x " * 50]
    src = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
                "text": pa.array([t.strip() for t in texts]),
            }
        )
    )
    n_files = write_chunks(src, str(tmp_path))
    assert n_files >= 1
    import glob

    back = corpus_from_chunks(sorted(glob.glob(str(tmp_path / "*.chunk"))))
    df = back.select_columns(["doc_id", "text"]).to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    got = dict(zip(df.doc_id, df.text))
    assert got == {10: "alpha beta", 11: "", 12: "gamma", 13: ("x " * 50).strip()}


def test_roundtrip_multi_stream(tmp_path):
    src = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["body one", "body two"]),
                "title": pa.array(["Title A", ""]),
            }
        )
    )
    write_chunks(src, str(tmp_path), streams=(("text", 0), ("title", 2)))
    import glob

    back = corpus_from_chunks(
        sorted(glob.glob(str(tmp_path / "*.chunk"))), extra_streams=(2,)
    )
    df = back.select_columns(["doc_id", "text", "stream_02"]).to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    rows = {r.doc_id: (r.text, r.stream_02) for r in df.itertuples()}
    assert rows == {1: ("body one", "Title A"), 2: ("body two", "")}


def test_cli_chunks_roundtrip(tmp_path):
    import json
    import subprocess
    import sys

    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root", "RAY_GRAFT_CPUS": "4"}
    chunk_dir = str(tmp_path / "chunks")
    pq_dir = str(tmp_path / "pq")
    r = subprocess.run(
        [sys.executable, "-m", "bitfunnel_ray.cli", "chunks-export",
         "/root/testdata/sf0.001", chunk_dir],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["files"] >= 1
    r2 = subprocess.run(
        [sys.executable, "-m", "bitfunnel_ray.cli", "chunks-import", chunk_dir, pq_dir],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    import duckdb

    n, = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{pq_dir}/*.parquet') a "
        f"JOIN read_parquet('/root/testdata/sf0.001/documents.parquet') b "
        f"ON a.doc_id = b.doc_id AND a.text = b.text"
    ).fetchone()
    assert n == 500
