"""WARC source/sink tests: pure parser round-trips, gzip member
layout, distributed scan + sink, HTTP envelope stripping, quarantine."""

import gzip
import io

import pytest

from moz_datapipeline_spark.sources.warc import (
    WarcFormatError,
    build_warc_record,
    http_response_body,
    iter_warc_records,
    read_warc,
    write_warc,
)


def _records(blob: bytes, **kw):
    return list(iter_warc_records(io.BytesIO(blob), **kw))


def test_build_parse_roundtrip_pure():
    rec = build_warc_record(
        "resource",
        b"hello warc",
        target_uri="urn:doc:1",
        content_type="text/plain",
    )
    ((headers, payload),) = _records(rec)
    assert headers["__version__"] == "WARC/1.1"
    assert headers["WARC-Type"] == "resource"
    assert headers["WARC-Target-URI"] == "urn:doc:1"
    assert int(headers["Content-Length"]) == 10
    assert payload == b"hello warc"
    # content-addressed id: same inputs → same bytes (determinism)
    assert rec == build_warc_record(
        "resource", b"hello warc", target_uri="urn:doc:1",
        content_type="text/plain",
    )


def test_parse_multiple_records_with_padding():
    blob = (
        build_warc_record("resource", b"a", target_uri="u:1")
        + b"\r\n"  # extra inter-record padding is legal
        + build_warc_record("metadata", b"bb", target_uri="u:2")
    )
    recs = _records(blob)
    assert [h["WARC-Type"] for h, _ in recs] == ["resource", "metadata"]
    assert [p for _, p in recs] == [b"a", b"bb"]


def test_payload_containing_blank_lines_and_warc_magic():
    # Content-Length framing must protect byte payloads that LOOK like
    # record boundaries
    evil = b"x\r\n\r\nWARC/1.1\r\nWARC-Type: fake\r\n\r\nyy"
    ((_, payload),) = _records(
        build_warc_record("resource", evil, target_uri="u")
    )
    assert payload == evil


def test_obs_fold_header_continuation():
    rec = build_warc_record("resource", b"z", target_uri="u")
    folded = rec.replace(
        b"WARC-Target-URI: u", b"WARC-Target-URI: u\r\n  folded-tail"
    )
    ((headers, _),) = _records(folded)
    assert headers["WARC-Target-URI"] == "u folded-tail"


def test_truncated_payload_strict_raises_nonstrict_quarantines():
    rec = build_warc_record("resource", b"0123456789", target_uri="u")
    truncated = rec[:-8]  # cut into the payload
    with pytest.raises(WarcFormatError, match="truncated"):
        _records(truncated)
    recs = _records(truncated, strict=False)
    assert recs[-1][0]["WARC-Type"] == "__corrupt__"


def test_garbage_prefix_strict_raises_nonstrict_quarantines():
    blob = b"not a warc file at all\r\n"
    with pytest.raises(WarcFormatError, match="version line"):
        _records(blob)
    ((headers, payload),) = _records(blob, strict=False)
    assert headers["WARC-Type"] == "__corrupt__"
    assert payload.startswith(b"not a warc")


def test_http_response_body():
    body = b"<html>hi</html>"
    env = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Length: 15\r\n\r\n" + body
    )
    assert http_response_body(env) == body
    # bare payloads pass through
    assert http_response_body(body) == body


def test_read_warc_distributed_plain_and_gzip(spark, tmp_path):
    recs = [
        build_warc_record(
            "resource", f"doc {i}".encode(), target_uri=f"u:{i}"
        )
        for i in range(5)
    ]
    plain = tmp_path / "a.warc"
    plain.write_bytes(b"".join(recs[:2]))
    # CommonCrawl layout: one gzip member per record, concatenated
    gz = tmp_path / "b.warc.gz"
    gz.write_bytes(b"".join(gzip.compress(r) for r in recs[2:]))

    df = read_warc(spark, str(tmp_path / "*.warc*"))
    rows = {r.target_uri: r for r in df.collect()}
    assert set(rows) == {f"u:{i}" for i in range(5)}
    assert bytes(rows["u:3"].payload) == b"doc 3"
    assert rows["u:0"].content_length == 5
    # per-file task parallelism: one input partition per file
    assert df.rdd.getNumPartitions() >= 2


def test_read_warc_type_filter_and_http_strip(spark, tmp_path):
    body = b"the actual text"
    response = build_warc_record(
        "response",
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + body,
        target_uri="u:r",
        content_type="application/http; msgtype=response",
    )
    request = build_warc_record(
        "request", b"GET / HTTP/1.1\r\n\r\n", target_uri="u:r"
    )
    f = tmp_path / "c.warc"
    f.write_bytes(response + request)

    got = read_warc(
        spark, str(f), record_types=("response",), strip_http=True
    ).collect()
    assert len(got) == 1
    assert bytes(got[0].payload) == body
    assert got[0].content_length == len(body)


def test_write_warc_read_warc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"urn:doc:{i}", f"text {i}") for i in range(20)],
        "uri string, payload string",
    ).repartition(3)
    out_dir = str(tmp_path / "sink")
    manifest = write_warc(
        df, out_dir, http_envelope=True, compress=True
    ).collect()
    assert sum(m.n_records for m in manifest) == 20
    assert all(m.path.endswith(".warc.gz") for m in manifest)

    back = read_warc(
        spark,
        out_dir + "/*.warc.gz",
        record_types=("response",),
        strip_http=True,
    )
    texts = {
        r.target_uri: bytes(r.payload).decode() for r in back.collect()
    }
    assert texts == {f"urn:doc:{i}": f"text {i}" for i in range(20)}


def test_gzip_member_geometry_and_random_access(spark, tmp_path):
    import gzip as _gz

    from moz_datapipeline_spark.sources.warc import (
        cdx_index,
        fetch_warc_record,
        iter_gzip_members,
    )

    recs = [
        build_warc_record(
            "resource", f"payload {i}".encode() * (i + 1),
            target_uri=f"u:{i}",
        )
        for i in range(7)
    ]
    f = tmp_path / "seg.warc.gz"
    f.write_bytes(b"".join(_gz.compress(r) for r in recs))

    # member geometry: spans tile the file exactly, inflate to records
    with open(f, "rb") as fh:
        members = list(iter_gzip_members(fh))
    assert len(members) == 7
    assert members[0][0] == 0
    for (o1, l1, _), (o2, _, _) in zip(members, members[1:]):
        assert o1 + l1 == o2
    assert members[-1][0] + members[-1][1] == f.stat().st_size
    assert members[3][2] == recs[3]

    # distributed index + seek-read round trip
    idx = {r.target_uri: r for r in cdx_index(spark, str(f)).collect()}
    assert set(idx) == {f"u:{i}" for i in range(7)}
    h, payload = fetch_warc_record(
        str(f), idx["u:5"].offset, idx["u:5"].length
    )
    assert h["WARC-Target-URI"] == "u:5"
    assert payload == b"payload 5" * 6

    # a mid-file span holding two members is rejected loudly
    import pytest

    two = idx["u:0"].length + idx["u:1"].length
    with pytest.raises(WarcFormatError, match="2 records"):
        fetch_warc_record(str(f), 0, two)


def test_cdx_index_rejects_plain_warc(spark, tmp_path):
    import pytest

    from moz_datapipeline_spark.sources.warc import cdx_index

    f = tmp_path / "plain.warc"
    f.write_bytes(build_warc_record("resource", b"x", target_uri="u"))
    with pytest.raises(ValueError, match="per-record-gzip"):
        cdx_index(spark, str(f))


def test_truncated_gzip_member_raises(tmp_path):
    import gzip as _gz

    import pytest

    from moz_datapipeline_spark.sources.warc import iter_gzip_members

    blob = _gz.compress(build_warc_record("resource", b"x" * 5000,
                                          target_uri="u"))
    f = tmp_path / "trunc.warc.gz"
    f.write_bytes(blob[:-20])
    with open(f, "rb") as fh:
        with pytest.raises(WarcFormatError, match="truncated gzip"):
            list(iter_gzip_members(fh))
