"""Minimal WARC (ISO 28500) ingestion — the format Common Crawl
actually ships. A from-scratch record splitter: each record is a
``WARC/1.0`` header block, ``\\r\\n\\r\\n``, then exactly
``Content-Length`` payload bytes, then ``\\r\\n\\r\\n``. Only
``WARC-Type: response`` records become rows; others (warcinfo,
request, metadata) are skipped, malformed trailing bytes raise.

Parsing is record-granular Python by nature (WARC is a sequential
length-prefixed container — the unit of parallelism is the FILE, and
Common Crawl ships ~1 GB segment files by the thousand, so
``read_binary_files -> flat_map(parse)`` saturates a cluster without
any intra-file vectorization). Payload decode to text stays Arrow.

The reference (doppel) walks a filesystem; this is the corpus-shaped
equivalent source for the north rule's Common-Crawl page table
(url, warc_ts, html/text).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pyarrow as pa

_SEP = b"\r\n\r\n"


def build_warc_record(
    url: str, ts_iso: str, payload: bytes, warc_type: str = "response"
) -> bytes:
    """One spec-shaped record (the synth/test twin of the parser)."""
    head = "\r\n".join(
        [
            "WARC/1.0",
            f"WARC-Type: {warc_type}",
            f"WARC-Target-URI: {url}",
            f"WARC-Date: {ts_iso}",
            f"Content-Length: {len(payload)}",
        ]
    ).encode()
    return head + _SEP + payload + _SEP


def parse_warc(buf: bytes) -> list[dict]:
    """buffer -> [{url, warc_ts (us epoch datetime), payload}] of the
    response records, in file order. Raises ValueError on a malformed
    header block or truncated payload (a corrupt segment should fail
    the task — Ray retries it — rather than silently drop pages)."""
    out: list[dict] = []
    pos = 0
    n = len(buf)
    while pos < n:
        if buf[pos:pos + 8] != b"WARC/1.0":
            raise ValueError(f"bad record magic at offset {pos}")
        hdr_end = buf.find(_SEP, pos)
        if hdr_end < 0:
            raise ValueError(f"unterminated header at offset {pos}")
        headers: dict[str, str] = {}
        for line in buf[pos:hdr_end].decode().split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"missing/bad Content-Length at offset {pos}")
        body_start = hdr_end + len(_SEP)
        body_end = body_start + clen
        if buf[body_end:body_end + len(_SEP)] != _SEP:
            raise ValueError(f"truncated record at offset {pos}")
        if headers.get("warc-type") == "response":
            ts = headers.get("warc-date", "")
            dt = datetime.strptime(ts, "%Y-%m-%dT%H:%M:%SZ").replace(
                tzinfo=timezone.utc
            )
            out.append(
                {
                    "url": headers.get("warc-target-uri", ""),
                    "warc_ts": dt.replace(tzinfo=None),
                    "payload": buf[body_start:body_end],
                }
            )
        pos = body_end + len(_SEP)
    return out


def build_http_response(
    status: int, content_type: str, body: bytes, reason: str = "OK"
) -> bytes:
    """Spec-shaped HTTP/1.1 response bytes (the WARC response payload
    Common Crawl actually stores — test/synth twin of the parser)."""
    head = "\r\n".join(
        [
            f"HTTP/1.1 {status} {reason}",
            f"Content-Type: {content_type}",
            f"Content-Length: {len(body)}",
        ]
    ).encode()
    return head + _SEP + body


def parse_http_response(payload: bytes) -> dict:
    """HTTP response bytes -> {status, content_type, body}. A payload
    with no HTTP status line (raw resource records) comes back with
    status 0, empty content_type, body = whole payload — degrade, don't
    drop: the bytes are still the document."""
    if not payload.startswith(b"HTTP/"):
        return {"status": 0, "content_type": "", "body": payload}
    hdr_end = payload.find(_SEP)
    if hdr_end < 0:
        return {"status": 0, "content_type": "", "body": payload}
    lines = payload[:hdr_end].decode(errors="replace").split("\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return {"status": 0, "content_type": "", "body": payload}
    ctype = ""
    for line in lines[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip().split(";")[0].strip().lower()
    return {
        "status": status,
        "content_type": ctype,
        "body": payload[hdr_end + len(_SEP):],
    }


def decode_http(ds, *, payload_col: str = "payload"):
    """Dataset(… payload …) -> adds status/content_type/body columns by
    parsing each WARC payload as an HTTP response (record-granular by
    nature, same argument as parse_warc)."""

    def fn(batch: pa.Table) -> pa.Table:
        parsed = [
            parse_http_response(b.as_py()) for b in batch[payload_col]
        ]
        cols = {n: batch[n] for n in batch.column_names}
        cols["status"] = pa.array(
            [p["status"] for p in parsed], type=pa.int64()
        )
        cols["content_type"] = pa.array(
            [p["content_type"] for p in parsed], type=pa.string()
        )
        cols["body"] = pa.array(
            [p["body"] for p in parsed], type=pa.large_binary()
        )
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def records_table(bufs: list[bytes]) -> pa.Table:
    """Parse a list of WARC buffers to one Arrow table (the flat_map
    body — kept separate so tests hit it without Ray)."""
    rows = [r for b in bufs for r in parse_warc(b)]
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], type=pa.string()),
            "warc_ts": pa.array(
                [r["warc_ts"] for r in rows], type=pa.timestamp("us")
            ),
            "payload": pa.array(
                [r["payload"] for r in rows], type=pa.large_binary()
            ),
        }
    )


def read_warc(paths: list[str] | str):
    """WARC segment files -> Dataset(url, warc_ts, payload). One task
    per file (the Common-Crawl parallelism unit)."""
    import ray.data

    ds = ray.data.read_binary_files(paths)

    def fn(batch: pa.Table) -> pa.Table:
        return records_table(
            [b.as_py() for b in batch["bytes"]]
        )

    return ds.map_batches(fn, batch_format="pyarrow")
