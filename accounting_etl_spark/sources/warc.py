"""WARC (ISO 28500) web-archive source + sink — stdlib only.

The reference engine's bulk-document source is mailbox attachments
(reference ``src/accounting_etl/email_fetch.py:1``); the equivalent
first stage of a large-scale training-data pipeline is web-archive
WARC files (the CommonCrawl layout: one ``.warc.gz`` per input split,
gzip *member per record* so readers can split/seek without a central
index).  This module implements that layout with nothing beyond
``gzip``/``zlib``:

- :func:`warc_record_bytes` / :func:`write_warc` — build spec-shaped
  ``WARC/1.0`` records (``response`` records wrap a real HTTP/1.1
  message) and write them as concatenated gzip members.
- :func:`iter_warc_records` — streaming parser: one gzip member at a
  time, one record in memory at a time; malformed records are skipped
  (counted), never fatal — mirrors the graceful-skip contract of
  ``sources/pdf_codec.py``.
- :func:`read_warc` — the distributed read: ``binaryFile`` scan (one
  WARC file = one task, the CommonCrawl unit of work) feeding an
  Arrow-batched ``mapInPandas`` parse.  The ``record_types`` filter is
  applied inside the generator, before row materialization, so
  request/metadata records in a crawl never reach Spark rows.
- :func:`write_warc_files` — the distributed write: one ``.warc.gz``
  per input partition via ``mapInPandas``, returning a manifest
  DataFrame (file, n_records, n_bytes).

100 TB posture: no driver-side record handling anywhere — the driver
only ever sees file manifests.  Peak executor memory is one record
(CommonCrawl caps records at ~1 GiB; the gzip-member loop never
concatenates the whole file's decompressed bytes).
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterable, Iterator, Optional

_CRLF = b"\r\n"
_MAGIC = b"WARC/"


# ---------------------------------------------------------------- write


def warc_record_bytes(
    *,
    record_id: str,
    warc_type: str = "response",
    target_uri: Optional[str] = None,
    date: str = "2026-01-01T00:00:00Z",
    payload: bytes = b"",
    http_status: Optional[int] = 200,
    http_content_type: Optional[str] = "text/html; charset=utf-8",
    extra_headers: Optional[dict[str, str]] = None,
) -> bytes:
    """One spec-shaped WARC/1.0 record.

    ``response`` records wrap ``payload`` in an HTTP/1.1 response
    (status line + Content-Type + Content-Length), matching what a
    crawler archives; other types carry ``payload`` verbatim.
    """
    if warc_type == "response" and http_status is not None:
        http = (
            f"HTTP/1.1 {http_status} OK\r\n"
            f"Content-Type: {http_content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("ascii") + payload
        block = http
        content_type = "application/http; msgtype=response"
    elif warc_type == "conversion":
        # WET layout: extracted text as a plain-text conversion record
        block = payload
        content_type = "text/plain"
    else:
        block = payload
        content_type = "application/octet-stream"
    head = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode("ascii"),
        b"WARC-Record-ID: <urn:uuid:" + record_id.encode("ascii") + b">",
        b"WARC-Date: " + date.encode("ascii"),
        b"Content-Type: " + content_type.encode("ascii"),
        b"Content-Length: " + str(len(block)).encode("ascii"),
    ]
    if target_uri is not None:
        head.insert(3, b"WARC-Target-URI: " + target_uri.encode("ascii"))
    for k, v in (extra_headers or {}).items():
        head.append(f"{k}: {v}".encode("ascii"))
    return _CRLF.join(head) + _CRLF * 2 + block + _CRLF * 2


def write_warc(path: str, records: Iterable[bytes], compress: bool = True) -> int:
    """Write records to ``path``; gzip = one member per record (the
    CommonCrawl convention — members are independently seekable).
    Returns bytes written."""
    n = 0
    with open(path, "wb") as f:
        for rec in records:
            out = gzip.compress(rec, compresslevel=6) if compress else rec
            f.write(out)
            n += len(out)
    return n


# ----------------------------------------------------------------- read


def _iter_members(blob: bytes) -> Iterator[bytes]:
    """Decompress concatenated gzip members one at a time (constant
    memory per member); plain blobs yield once."""
    if blob[:2] != b"\x1f\x8b":
        yield blob
        return
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(blob[pos:])
        except zlib.error:
            return  # trailing garbage: graceful stop
        yield chunk + d.flush()
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def _parse_headers(block: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in block.split(b"\n"):
        line = line.rstrip(b"\r")
        if b":" in line:
            k, v = line.split(b":", 1)
            out[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
    return out


def _find_blank_line(blob: bytes, start: int = 0) -> tuple[int, int]:
    """(position, separator length) of the EARLIEST header-block
    terminator — CRLFCRLF or bare LFLF, whichever comes first. Taking
    the first CRLFCRLF unconditionally mis-splits LF-terminated
    headers whose *payload* contains CRLFCRLF (e.g. an archived HTTP
    message inside an LF-style WARC record)."""
    p1 = blob.find(b"\r\n\r\n", start)
    p2 = blob.find(b"\n\n", start)
    if p1 < 0 and p2 < 0:
        return -1, 0
    if p2 < 0 or (0 <= p1 < p2):
        return p1, 4
    return p2, 2


def _split_http(payload: bytes) -> tuple[Optional[int], Optional[str], bytes]:
    """Split an archived HTTP/1.1 message into (status, content-type,
    body). Non-HTTP payloads come back (None, None, payload)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    sep, sep_len = _find_blank_line(payload)
    if sep < 0:
        return None, None, payload
    body_at = sep + sep_len
    head = payload[:sep]
    first, _, rest = head.partition(b"\n")
    try:
        status: Optional[int] = int(first.split()[1])
    except (IndexError, ValueError):
        status = None
    hdrs = _parse_headers(rest)
    return status, hdrs.get("content-type"), payload[body_at:]


def iter_warc_records(
    blob: bytes, record_types: Optional[tuple[str, ...]] = None
) -> Iterator[dict]:
    """Yield parsed records from one WARC file's bytes.

    Each dict: ``record_id, warc_type, target_uri, warc_date,
    http_status, content_type, payload, n_record_bytes``.  Records
    with a bad version line or unparseable Content-Length are skipped
    (graceful-skip, like the PDF extractor on unsupported constructs);
    a member may contain several records (non-CC writers do this), so
    parsing continues within the member after each record.
    """
    for member in _iter_members(blob):
        pos = 0
        while True:
            start = member.find(_MAGIC, pos)
            if start < 0:
                break
            hdr_end, sep_len = _find_blank_line(member, start)
            if hdr_end < 0:
                break
            headers = _parse_headers(member[start:hdr_end])
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                pos = hdr_end + sep_len  # malformed: skip this header
                continue
            body_at = hdr_end + sep_len
            payload = member[body_at : body_at + length]
            pos = body_at + length
            wtype = headers.get("warc-type", "")
            if record_types is not None and wtype not in record_types:
                continue
            status, ctype, body = _split_http(payload)
            if ctype is None:  # non-HTTP block: WARC-level content type
                ctype = headers.get("content-type")
            yield {
                "record_id": headers.get("warc-record-id", ""),
                "warc_type": wtype,
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date", ""),
                "http_status": status,
                "content_type": ctype,
                "payload": body,
                "n_record_bytes": (pos - start),
            }


_READ_SCHEMA = (
    "src_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, http_status int, "
    "content_type string, payload binary, n_record_bytes bigint"
)


def read_warc(spark, paths: str, record_types: tuple[str, ...] = ("response",)):
    """Distributed WARC scan: ``binaryFile`` (one archive file per
    task — the CommonCrawl work unit) → Arrow-batched parse.  Only
    ``record_types`` records materialize as rows; the filter runs
    inside the record generator (predicate applied pre-row, the WARC
    analog of parquet row-group skipping)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(paths)

    def parse(batches):
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                for r in iter_warc_records(bytes(blob), record_types):
                    rows.append(
                        (
                            path,
                            r["record_id"],
                            r["warc_type"],
                            r["target_uri"],
                            r["warc_date"],
                            r["http_status"],
                            r["content_type"],
                            r["payload"],
                            r["n_record_bytes"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "src_file",
                    "record_id",
                    "warc_type",
                    "target_uri",
                    "warc_date",
                    "http_status",
                    "content_type",
                    "payload",
                    "n_record_bytes",
                ],
            )

    return files.select("path", "content").mapInPandas(parse, _READ_SCHEMA)


def write_warc_files(
    df,
    out_dir: str,
    *,
    uri_col: str = "url",
    html_col: str = "html",
    id_col: str = "doc_id",
    compress: bool = True,
):
    """Distributed WARC sink: each input partition writes ONE
    ``part-<pid>.warc.gz`` under ``out_dir`` (shared filesystem on a
    cluster) and emits a manifest row — the driver never sees record
    bytes.  Record ids derive from ``id_col`` so output is
    deterministic under any partitioning."""
    import os

    import pandas as pd
    from pyspark import TaskContext

    os.makedirs(out_dir, exist_ok=True)

    def dump(batches):
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        n_rec = 0
        n_bytes = 0
        with open(path, "wb") as f:
            for pdf in batches:
                for did, uri, html in zip(
                    pdf[id_col], pdf[uri_col], pdf[html_col]
                ):
                    rec = warc_record_bytes(
                        record_id=f"doc-{did}",
                        target_uri=str(uri),
                        payload=str(html).encode("utf-8"),
                    )
                    out = (
                        gzip.compress(rec, compresslevel=1)
                        if compress
                        else rec
                    )
                    f.write(out)
                    n_rec += 1
                    n_bytes += len(out)
        if n_rec == 0:
            os.remove(path)
            yield pd.DataFrame(
                columns=["file", "n_records", "n_bytes"]
            ).astype({"n_records": "int64", "n_bytes": "int64"})
        else:
            yield pd.DataFrame(
                [(path, n_rec, n_bytes)],
                columns=["file", "n_records", "n_bytes"],
            )

    return df.select(id_col, uri_col, html_col).mapInPandas(
        dump, "file string, n_records bigint, n_bytes bigint"
    )


def write_wet_files(
    df,
    out_dir: str,
    *,
    uri_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    compress: bool = True,
):
    """WET sibling of :func:`write_warc_files`: extracted plain text
    as ``conversion`` records (the CommonCrawl WET layout), one
    ``part-<pid>.warc.wet.gz`` per partition, manifest rows out.
    Read back with ``read_warc(..., record_types=('conversion',))``."""
    import os

    import pandas as pd
    from pyspark import TaskContext

    os.makedirs(out_dir, exist_ok=True)

    def dump(batches):
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.wet.gz")
        n_rec = 0
        n_bytes = 0
        with open(path, "wb") as f:
            for pdf in batches:
                for did, uri, text in zip(
                    pdf[id_col], pdf[uri_col], pdf[text_col]
                ):
                    rec = warc_record_bytes(
                        record_id=f"conv-{did}",
                        warc_type="conversion",
                        target_uri=str(uri),
                        payload=str(text).encode("utf-8"),
                    )
                    out = (
                        gzip.compress(rec, compresslevel=1)
                        if compress
                        else rec
                    )
                    f.write(out)
                    n_rec += 1
                    n_bytes += len(out)
        if n_rec == 0:
            os.remove(path)
            yield pd.DataFrame(
                columns=["file", "n_records", "n_bytes"]
            ).astype({"n_records": "int64", "n_bytes": "int64"})
        else:
            yield pd.DataFrame(
                [(path, n_rec, n_bytes)],
                columns=["file", "n_records", "n_bytes"],
            )

    return df.select(id_col, uri_col, text_col).mapInPandas(
        dump, "file string, n_records bigint, n_bytes bigint"
    )
