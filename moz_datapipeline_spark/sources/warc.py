"""WARC (Web ARChive, ISO 28500) source + sink for crawl-scale corpus
ingestion.

A real LLM training pipeline starts from raw crawl archives
(CommonCrawl ships ~1 GB ``.warc.gz`` segment files, one gzip member
per record), not from parquet.  This module gives the engine a native,
dependency-free WARC path:

- :func:`iter_warc_records` — pure streaming parser (one record in
  memory at a time) for WARC/1.0 and WARC/1.1, plain or gzip;
- :func:`read_warc` — distributed scan: the driver only LISTS files,
  each executor task stream-parses its own files via ``mapInPandas``
  (same unsplittable-per-file shape as the OSM XML and shapefile
  readers in ``sources/readers.py`` — crawl corpora ship as many
  moderate files, so file count is the parallelism);
- :func:`write_warc` — distributed sink: one ``.warc[.gz]`` file per
  partition, deterministic bytes (content-addressed record ids, fixed
  date), per-record gzip members exactly like CommonCrawl so the
  output is range-seekable by offset;
- :func:`http_response_body` — split the HTTP envelope off a
  ``response`` record's payload (the crawl stores raw HTTP exchanges;
  training wants the body).

Reference parity: extension operator (the reference ingests shapefiles
and OSM XML, not web archives); the WARC format itself is the public
ISO 28500 / IIPC spec.  Scale posture: no driver-side record handling
anywhere — the driver touches only file paths; per-record memory is
O(one payload); a 100 TB crawl at ~1 GB/file is ~100k tasks, which is
exactly how Spark wants it.
"""

from __future__ import annotations

import glob as _glob
import gzip
import hashlib
import io
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "WarcFormatError",
    "iter_warc_records",
    "build_warc_record",
    "http_response_body",
    "read_warc",
    "write_warc",
    "WARC_SCHEMA",
]

_CRLF = b"\r\n"

# Fixed timestamp for deterministic output (writers may override).
_DEFAULT_DATE = "2026-01-01T00:00:00Z"


class WarcFormatError(ValueError):
    """Raised on malformed WARC input when ``strict=True``."""


def iter_warc_records(
    stream, strict: bool = True
) -> Iterator[tuple[dict, bytes]]:
    """Stream (headers, payload) pairs off a binary file-like object.

    ``headers`` maps the raw WARC header names (``WARC-Type``,
    ``WARC-Target-URI``, ``Content-Length``, ...) plus ``__version__``.
    Memory is O(one record): header lines are read one at a time and
    the payload is read exactly once at its declared Content-Length.

    ``strict=False`` stops at the first malformed record instead of
    raising, yielding a terminal ``__corrupt__`` marker record whose
    payload holds the first bytes of the unparseable tail — the
    quarantine row pattern of ``read_json_quarantine``.
    """
    while True:
        line = stream.readline()
        if not line:
            return
        if line in (b"\r\n", b"\n"):
            continue  # inter-record padding
        if not line.startswith(b"WARC/"):
            if strict:
                raise WarcFormatError(
                    f"expected WARC version line, got {line[:40]!r}"
                )
            yield (
                {"__version__": "", "WARC-Type": "__corrupt__"},
                line[:200],
            )
            return
        headers: dict[str, str] = {
            "__version__": line.strip().decode("ascii", "replace")
        }
        last_key = None
        while True:
            h = stream.readline()
            if h in (b"\r\n", b"\n"):
                break
            if not h:
                if strict:
                    raise WarcFormatError("EOF inside record header")
                yield (
                    {"__version__": "", "WARC-Type": "__corrupt__"},
                    b"EOF inside record header",
                )
                return
            text = h.decode("utf-8", "replace").rstrip("\r\n")
            if text[:1] in (" ", "\t") and last_key:
                # obs-fold continuation line
                headers[last_key] += " " + text.strip()
                continue
            key, sep, value = text.partition(":")
            if not sep:
                if strict:
                    raise WarcFormatError(f"malformed header line {text!r}")
                yield (
                    {"__version__": "", "WARC-Type": "__corrupt__"},
                    h[:200],
                )
                return
            last_key = key.strip()
            headers[last_key] = value.strip()
        try:
            length = int(headers.get("Content-Length", "0"))
        except ValueError as exc:
            if strict:
                raise WarcFormatError(
                    f"bad Content-Length {headers.get('Content-Length')!r}"
                ) from exc
            yield ({"__version__": "", "WARC-Type": "__corrupt__"}, b"")
            return
        payload = stream.read(length)
        if len(payload) < length:
            if strict:
                raise WarcFormatError(
                    f"truncated payload: wanted {length}, got {len(payload)}"
                )
            yield (
                {"__version__": "", "WARC-Type": "__corrupt__"},
                payload[:200],
            )
            return
        yield headers, payload


def build_warc_record(
    record_type: str,
    payload: bytes,
    target_uri: str | None = None,
    content_type: str = "application/octet-stream",
    date: str = _DEFAULT_DATE,
    record_id: str | None = None,
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """Serialize one WARC/1.1 record.  Deterministic by construction:
    the record id is content-addressed (md5 of type+uri+payload) unless
    given, and the date defaults to a fixed constant — same inputs give
    byte-identical archives on any cluster, which is what makes the
    sink testable and retry-safe (a re-run task overwrites its file
    with identical bytes)."""
    if record_id is None:
        digest = hashlib.md5(
            record_type.encode()
            + b"\x00"
            + (target_uri or "").encode()
            + b"\x00"
            + payload
        ).hexdigest()
        record_id = f"<urn:md5:{digest}>"
    lines = [
        b"WARC/1.1",
        b"WARC-Type: " + record_type.encode(),
        b"WARC-Record-ID: " + record_id.encode(),
        b"WARC-Date: " + date.encode(),
    ]
    if target_uri is not None:
        lines.append(b"WARC-Target-URI: " + target_uri.encode())
    for k, v in (extra_headers or {}).items():
        lines.append(k.encode() + b": " + v.encode())
    lines.append(b"Content-Type: " + content_type.encode())
    lines.append(b"Content-Length: " + str(len(payload)).encode())
    return (
        _CRLF.join(lines) + _CRLF + _CRLF + payload + _CRLF + _CRLF
    )


def http_response_body(payload: bytes) -> bytes:
    """Strip the HTTP envelope from a ``response`` record payload
    (status line + headers up to the first blank line).  Payloads with
    no HTTP envelope pass through unchanged — ``resource`` records
    store the bare content already."""
    if not payload.startswith(b"HTTP/"):
        return payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        sep = payload.find(b"\n\n")
        return payload[sep + 2 :] if sep >= 0 else payload
    return payload[sep + 4 :]


WARC_SCHEMA = (
    "path string, record_id string, record_type string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length long, payload binary"
)


def _open_warc(path: str):
    if path.endswith(".gz"):
        # Python's gzip reader iterates concatenated members
        # transparently — exactly the per-record-member layout
        # CommonCrawl writes.
        return gzip.open(path, "rb")
    return open(path, "rb")


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: Iterable[str] | None = None,
    strip_http: bool = False,
    strict: bool = True,
) -> DataFrame:
    """Distributed WARC scan → one row per record.

    ``path`` may be a glob; each file is one task (unsplittable
    format — gzip members don't expose safe split points without an
    index).  ``record_types`` filters executor-side BEFORE payload
    rows are materialized into Arrow batches, so a
    ``record_types=("response",)`` scan of a crawl never ships the
    request/metadata records anywhere.  ``strip_http=True`` applies
    :func:`http_response_body` to ``response`` records in the same
    pass — no second stage over the payload bytes.
    """
    files = (
        sorted(_glob.glob(path))
        if any(c in path for c in "*?[")
        else [path]
    )
    if not files:
        raise FileNotFoundError(f"no WARC files match {path}")
    wanted = set(record_types) if record_types is not None else None
    paths = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(len(files))

    def kernel(batches):
        for pdf in batches:
            for p in pdf["path"]:
                rows = []
                with _open_warc(p) as fh:
                    for headers, payload in iter_warc_records(
                        fh, strict=strict
                    ):
                        rtype = headers.get("WARC-Type", "")
                        if wanted is not None and rtype not in wanted:
                            continue
                        if strip_http and rtype == "response":
                            payload = http_response_body(payload)
                        rows.append(
                            {
                                "path": p,
                                "record_id": headers.get(
                                    "WARC-Record-ID", ""
                                ),
                                "record_type": rtype,
                                "target_uri": headers.get(
                                    "WARC-Target-URI"
                                ),
                                "warc_date": headers.get("WARC-Date"),
                                "content_type": headers.get(
                                    "Content-Type"
                                ),
                                "content_length": len(payload),
                                "payload": payload,
                            }
                        )
                        # Arrow-batch every ~64 records so a million-
                        # record segment never accumulates in memory
                        if len(rows) >= 64:
                            yield pd.DataFrame(rows)
                            rows = []
                if rows:
                    yield pd.DataFrame(rows)

    return paths.mapInPandas(kernel, schema=WARC_SCHEMA)


def write_warc(
    df: DataFrame,
    out_dir: str,
    uri_col: str = "uri",
    payload_col: str = "payload",
    record_type: str = "resource",
    content_type: str = "text/plain",
    compress: bool = True,
    compresslevel: int = 6,
    http_envelope: bool = False,
) -> DataFrame:
    """Distributed WARC sink: each partition writes ONE
    ``part-<pid>.warc[.gz]`` file under ``out_dir`` and the returned
    (lazy) DataFrame carries ``(path, n_records)`` — the caller's
    action triggers the write, Spark-sink style.

    Bytes are deterministic (content-addressed ids, fixed date) and the
    filename is the partition id, so a retried task overwrites its own
    file with identical content — idempotent under speculation.  With
    ``compress=True`` every record is its own gzip member
    (CommonCrawl's layout: readers can seek to an offset and inflate
    one record).  ``http_envelope=True`` wraps payloads in a minimal
    ``HTTP/1.1 200 OK`` response and writes ``response`` records —
    the shape :func:`read_warc` ``strip_http`` undoes.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    def kernel(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        n = 0
        tmp = path + ".inprogress"
        with open(tmp, "wb") as fh:
            for pdf in batches:
                for uri, payload in zip(pdf[uri_col], pdf[payload_col]):
                    body = (
                        payload
                        if isinstance(payload, (bytes, bytearray))
                        else str(payload).encode("utf-8")
                    )
                    if http_envelope:
                        body = (
                            b"HTTP/1.1 200 OK\r\nContent-Type: "
                            + content_type.encode()
                            + b"\r\nContent-Length: "
                            + str(len(body)).encode()
                            + b"\r\n\r\n"
                            + body
                        )
                    rec = build_warc_record(
                        "response" if http_envelope else record_type,
                        body,
                        target_uri=str(uri),
                        content_type=(
                            "application/http; msgtype=response"
                            if http_envelope
                            else content_type
                        ),
                    )
                    fh.write(
                        gzip.compress(rec, compresslevel)
                        if compress
                        else rec
                    )
                    n += 1
        os.replace(tmp, path)  # atomic publish, idempotent on retry
        yield pd.DataFrame([{"path": path, "n_records": n}])

    return df.select(uri_col, payload_col).mapInPandas(
        kernel, schema="path string, n_records long"
    )


def iter_gzip_members(fh, chunk_size: int = 1 << 20):
    """Stream (offset, length, inflated_bytes) per gzip member of a
    multi-member file — the byte geometry a CDX index records.  Chunked
    zlib so memory stays O(one member + one chunk) regardless of file
    size; member boundaries come from ``decompressobj.unused_data``
    (the suffix of the fed input that belongs to the NEXT member)."""
    import zlib

    offset = 0
    buf = b""
    eof = False
    while True:
        if not buf:
            if eof:
                return
            nxt = fh.read(chunk_size)
            if not nxt:
                return
            buf = nxt
        d = zlib.decompressobj(wbits=31)
        member_start = offset
        out = bytearray()
        while True:
            out += d.decompress(buf)
            if d.eof:
                rem = d.unused_data
                offset += len(buf) - len(rem)
                buf = rem
                yield member_start, offset - member_start, bytes(out)
                break
            offset += len(buf)
            buf = fh.read(chunk_size)
            if not buf:
                eof = True
                raise WarcFormatError(
                    f"truncated gzip member at offset {member_start}"
                )


CDX_SCHEMA = (
    "target_uri string, path string, offset long, length long, "
    "record_type string, record_id string"
)


def cdx_index(spark: SparkSession, path: str) -> DataFrame:
    """CDX-style lookup index over per-record-gzip WARC archives: one
    row per record with its exact (path, offset, length) byte span —
    the CommonCrawl access pattern, where consumers range-read one
    member instead of scanning the segment.  Distributed per file like
    :func:`read_warc`; requires the per-record-member ``.warc.gz``
    layout (``write_warc(compress=True)`` or CommonCrawl itself —
    a plain ``.warc`` has no member geometry to index)."""
    files = (
        sorted(_glob.glob(path))
        if any(c in path for c in "*?[")
        else [path]
    )
    if not files:
        raise FileNotFoundError(f"no WARC files match {path}")
    bad = [f for f in files if not f.endswith(".gz")]
    if bad:
        raise ValueError(
            f"cdx_index needs per-record-gzip .warc.gz files, got {bad[:3]}"
        )
    paths = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(len(files))

    def kernel(batches):
        for pdf in batches:
            for p in pdf["path"]:
                rows = []
                with open(p, "rb") as fh:
                    for off, ln, blob in iter_gzip_members(fh):
                        recs = list(
                            iter_warc_records(io.BytesIO(blob))
                        )
                        for headers, _ in recs:
                            rows.append(
                                {
                                    "target_uri": headers.get(
                                        "WARC-Target-URI"
                                    ),
                                    "path": p,
                                    "offset": off,
                                    "length": ln,
                                    "record_type": headers.get(
                                        "WARC-Type", ""
                                    ),
                                    "record_id": headers.get(
                                        "WARC-Record-ID", ""
                                    ),
                                }
                            )
                        if len(rows) >= 256:
                            yield pd.DataFrame(rows)
                            rows = []
                if rows:
                    yield pd.DataFrame(rows)

    return paths.mapInPandas(kernel, schema=CDX_SCHEMA)


def fetch_warc_record(
    path: str, offset: int, length: int
) -> tuple[dict, bytes]:
    """Random-access read of ONE record by its CDX byte span: seek,
    read ``length`` bytes, inflate the member, parse.  This is the
    serving-side half of :func:`cdx_index` — O(record), never
    O(file)."""
    with open(path, "rb") as fh:
        fh.seek(offset)
        blob = fh.read(length)
    recs = list(iter_warc_records(io.BytesIO(gzip.decompress(blob))))
    if len(recs) != 1:
        raise WarcFormatError(
            f"byte span [{offset}, {offset + length}) holds "
            f"{len(recs)} records, expected 1"
        )
    return recs[0]
