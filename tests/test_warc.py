"""WARC adapter (sources/warc.py): record framing, gzip, dataset round trip."""

import glob
import gzip
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data as rd

from bitfunnel_ray.sources.warc import (
    pages_from_warc,
    parse_warc_buffer,
    warc_record_bytes,
    write_warc,
)


def test_record_roundtrip_binary_payload():
    # payload containing the record separator bytes must not confuse the
    # framing (Content-Length driven, never a scan for CRLFCRLF)
    payload = b"<html>\r\n\r\nWARC/1.0\r\nbinary \x00\xff body</html>"
    rec = warc_record_bytes("https://example.org/a", 1700000007, payload)
    out = parse_warc_buffer(rec)
    assert out == [("https://example.org/a", 1700000007, payload)]
    # two records back to back
    rec2 = warc_record_bytes("https://example.org/b", 0, b"")
    assert [u for u, _, _ in parse_warc_buffer(rec + rec2)] == [
        "https://example.org/a",
        "https://example.org/b",
    ]


def test_warcinfo_and_request_records_skipped():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: application/warc-fields\r\n"
        b"Content-Length: 10\r\n\r\nrobots: ok\r\n\r\n"
    )
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://example.org/a\r\n"
        b"WARC-Date: 2023-11-14T22:13:27Z\r\nContent-Length: 3\r\n\r\nGET\r\n\r\n"
    )
    resp = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://example.org/a\r\n"
        b"WARC-Date: 2023-11-14T22:13:27Z\r\nContent-Length: 4\r\n\r\nBODY\r\n\r\n"
    )
    out = parse_warc_buffer(info + req + resp)
    assert out == [("https://example.org/a", 1700000007, b"BODY")]


def test_truncated_record_raises():
    rec = warc_record_bytes("https://example.org/a", 0, b"0123456789")
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_buffer(rec[:-6])  # cut into the payload


@pytest.mark.parametrize("compress", [False, True])
def test_dataset_roundtrip(tmp_path, ray_session, compress):
    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])

    def make_pages(t: pa.Table) -> pa.Table:
        ids = [f"{int(v)}" for v in t["doc_id"].to_pylist()]
        return pa.table(
            {
                "url": pa.array([f"https://example.org/p/{i}" for i in ids]),
                "warc_ts_s": pc.add(t["doc_id"].cast(pa.int64()), 1700000000),
                "html": pc.binary_join_element_wise(
                    "<html>", pc.cast(t["text"], pa.string()), "</html>", ""
                ).cast(pa.binary()),
            }
        )

    pages = docs.map_batches(make_pages, batch_format="pyarrow")
    out = str(tmp_path / ("gz" if compress else "plain"))
    n_files = write_warc(pages, out, compress=compress)
    paths = sorted(glob.glob(os.path.join(out, "*.warc*")))
    assert len(paths) == n_files and n_files >= 1
    back = pages_from_warc(paths).to_pandas().sort_values("url").reset_index(drop=True)
    want = pages.to_pandas().sort_values("url").reset_index(drop=True)
    assert back.equals(want[back.columns])
    if compress:
        # really gzip on disk
        with open(paths[0], "rb") as f:
            assert f.read(2) == b"\x1f\x8b"
        # and stdlib-member framing reads fine even when concatenated
        with open(paths[0], "rb") as f:
            raw = gzip.decompress(f.read())
        assert raw.startswith(b"WARC/1.0\r\n")


def test_assign_doc_ids_stable_and_positive(ray_session):
    from bitfunnel_ray.sources.warc import assign_doc_ids

    pages = rd.from_items(
        [{"url": f"https://x.org/{i}", "warc_ts_s": 1700000000 + i,
          "html": b"<html>x</html>"} for i in range(50)]
    )
    a = assign_doc_ids(pages).to_pandas().sort_values("url").reset_index(drop=True)
    b = assign_doc_ids(pages).to_pandas().sort_values("url").reset_index(drop=True)
    assert (a["doc_id"] == b["doc_id"]).all()          # stable across imports
    assert (a["doc_id"] >= 0).all()                     # 63-bit mask
    assert a["doc_id"].nunique() == len(a)              # no collisions here
    assert str(a["warc_ts"].dtype).startswith("datetime64")


def test_warc_property_roundtrip():
    """Property: any (url, ts, payload) sequence round-trips through the
    record writer/parser byte-identically — payloads may contain CRLFs,
    NULs, header-lookalike bytes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bitfunnel_ray.sources.warc import parse_warc_buffer, warc_record_bytes

    rec = st.tuples(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=1000),
            min_size=1,
            max_size=40,
        ).map(lambda s: "https://x.org/" + s),
        st.integers(min_value=0, max_value=2**33),
        st.binary(max_size=300),
    )

    @given(st.lists(rec, max_size=8))
    @settings(max_examples=60, deadline=None)
    def check(records):
        buf = b"".join(warc_record_bytes(u, ts, p) for u, ts, p in records)
        assert parse_warc_buffer(buf) == records

    check()
