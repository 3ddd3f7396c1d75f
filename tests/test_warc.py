"""WARC source (sources/warc.py): build/parse roundtrip, record-type
filtering, malformed-input failures, Dataset read path."""

from datetime import datetime

import pytest

from doppel_ray.sources import warc


def _rec(url="https://a.example/1", ts="2026-01-02T03:04:05Z",
         payload=b"hello", warc_type="response"):
    return warc.build_warc_record(url, ts, payload, warc_type=warc_type)


class TestParse:
    def test_roundtrip(self):
        buf = _rec() + _rec(url="https://b.example/2", payload=b"")
        rows = warc.parse_warc(buf)
        assert [r["url"] for r in rows] == [
            "https://a.example/1", "https://b.example/2",
        ]
        assert rows[0]["payload"] == b"hello"
        assert rows[1]["payload"] == b""
        assert rows[0]["warc_ts"] == datetime(2026, 1, 2, 3, 4, 5)

    def test_non_response_records_skipped(self):
        buf = (
            _rec(warc_type="warcinfo", payload=b"segment meta")
            + _rec(payload=b"x")
            + _rec(warc_type="request", payload=b"GET /")
        )
        rows = warc.parse_warc(buf)
        assert len(rows) == 1 and rows[0]["payload"] == b"x"

    def test_payload_may_contain_separator(self):
        body = b"a\r\n\r\nb\r\n\r\n"
        rows = warc.parse_warc(_rec(payload=body))
        assert rows[0]["payload"] == body

    def test_truncated_raises(self):
        buf = _rec()[:-2]
        with pytest.raises(ValueError, match="truncated"):
            warc.parse_warc(buf)

    def test_bad_magic_raises(self):
        with pytest.raises(ValueError, match="magic"):
            warc.parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")

    def test_missing_length_raises(self):
        buf = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nxx\r\n\r\n"
        with pytest.raises(ValueError, match="Content-Length"):
            warc.parse_warc(buf)


class TestReadWarc:
    def test_read_files(self, ray_session, tmp_path):
        for i in range(3):
            buf = b"".join(
                _rec(url=f"https://h{i}.example/p/{j}", payload=b"x" * j)
                for j in range(4)
            )
            (tmp_path / f"seg{i}.warc").write_bytes(buf)
        ds = warc.read_warc(str(tmp_path))
        rows = ds.take_all()
        assert len(rows) == 12
        assert {len(r["payload"]) for r in rows} == {0, 1, 2, 3}
        assert all(r["url"].startswith("https://h") for r in rows)


class TestHttp:
    def test_roundtrip(self):
        http = warc.build_http_response(200, "text/html", b"<p>x</p>")
        p = warc.parse_http_response(http)
        assert p["status"] == 200
        assert p["content_type"] == "text/html"
        assert p["body"] == b"<p>x</p>"

    def test_charset_param_stripped(self):
        http = warc.build_http_response(
            200, "text/html; charset=UTF-8", b"x"
        )
        assert warc.parse_http_response(http)["content_type"] == "text/html"

    def test_non_http_payload_degrades(self):
        p = warc.parse_http_response(b"raw resource bytes")
        assert p["status"] == 0 and p["body"] == b"raw resource bytes"

    def test_body_may_contain_separator(self):
        body = b"a\r\n\r\nb"
        http = warc.build_http_response(200, "text/plain", body)
        assert warc.parse_http_response(http)["body"] == body

    def test_decode_http_dataset(self, ray_session):
        import pyarrow as pa
        import ray

        payloads = [
            warc.build_http_response(404, "text/html", b"gone"),
            b"not http",
        ]
        ds = ray.data.from_arrow(
            pa.table({"payload": pa.array(payloads, type=pa.large_binary())})
        )
        rows = sorted(
            warc.decode_http(ds).take_all(), key=lambda r: r["status"]
        )
        assert rows[0]["status"] == 0 and rows[0]["body"] == b"not http"
        assert rows[1]["status"] == 404 and rows[1]["body"] == b"gone"
