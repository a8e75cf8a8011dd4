"""WARC connector: fixture round-trip through the full extraction job."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from resume_parser_service_spark.kernels.pdf_gen import make_pdf
from resume_parser_service_spark.pipeline.run import run_extraction_job
from resume_parser_service_spark.pipeline.writer import SnapshotTable
from resume_parser_service_spark.sources.warc import (make_warc, parse_warc,
                                                      read_warc)

_TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def _records():
    return [
        {"url": "https://a.example/doc1", "warc_ts": _TS,
         "payload": make_pdf(["Doc one text\nsecond line"])},
        {"url": "https://a.example/doc2", "warc_ts": _TS,
         "payload": b"<html><body><nav><a href='/x'>x</a></nav>"
                    b"<article><p>plain web page body content here"
                    b"</p></article></body></html>"},
        {"url": "https://a.example/doc3", "warc_ts": _TS,
         "payload": b"\x89PNG\r\n\x1a\n not text"},
    ]


def test_parse_warc_roundtrip():
    raw = make_warc(_records())
    recs = parse_warc(raw)
    assert [r["url"] for r in recs] == [r["url"] for r in _records()]
    assert recs[0]["payload"][:4] == b"%PDF"
    assert recs[0]["warc_ts"].year == 2024


def test_parse_warc_gzip():
    raw = make_warc(_records(), compress=True)
    assert len(parse_warc(raw)) == 3


def test_parse_warc_transport_encodings():
    """Chunked framing and gzip content-coding are undone — crawl WARCs
    store raw HTTP wire bytes (RFC 9112 §7.1 / RFC 9110 §8.4)."""
    import gzip as _gz

    html = b"<html><body><p>wire-encoded page body content</p></body></html>"
    gz_payload = _gz.compress(html)
    chunked = (b"7\r\n<html><\r\n" +
               (b"%x\r\n" % (len(html) - 7)) + html[7:] + b"\r\n" +
               b"0\r\n\r\n")

    def resp(extra_hdr: bytes, body: bytes) -> bytes:
        http = (b"HTTP/1.1 200 OK\r\n" + extra_hdr +
                b"\r\nContent-Length: %d\r\n\r\n" % len(body)) + body
        return (b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                b"WARC-Target-URI: https://b.example/enc\r\n"
                b"WARC-Date: 2024-03-01T12:00:00Z\r\n"
                b"Content-Type: application/http; msgtype=response\r\n"
                b"Content-Length: %d\r\n\r\n" % len(http)) + http + b"\r\n\r\n"

    recs = parse_warc(resp(b"Content-Encoding: gzip", gz_payload))
    assert recs[0]["payload"] == html
    recs = parse_warc(resp(b"Transfer-Encoding: chunked", chunked))
    assert recs[0]["payload"] == html


def test_warc_to_extraction_job(spark, tmp_path):
    warc_dir = tmp_path / "warcs"
    warc_dir.mkdir()
    (warc_dir / "crawl-00000.warc").write_bytes(make_warc(_records()))
    (warc_dir / "crawl-00001.warc.gz").write_bytes(
        make_warc([{"url": "https://b.example/doc4", "warc_ts": _TS,
                    "payload": make_pdf(["Doc four"])}], compress=True))

    pages = read_warc(spark, str(warc_dir))
    assert pages.count() == 4

    stats = run_extraction_job(spark, pages, str(tmp_path / "out"))
    # 3 extractable docs; the PNG payload is rejected pre-kernel
    assert stats["extracted"] == 3
    assert stats["rejected"] == 1
    ext = SnapshotTable(str(tmp_path / "out/resumes_extracted")).read(spark)
    got = {r["url"]: r["text"] for r in ext.collect()}
    assert got["https://a.example/doc1"] == "Doc one text\nsecond line"
    assert got["https://a.example/doc2"] == "plain web page body content here"
    assert got["https://b.example/doc4"] == "Doc four"
    # the PNG payload is typed invalid -> audited, not extracted
    audit = SnapshotTable(str(tmp_path / "out/extraction_audit")).read(spark)
    bad = audit.filter(F.col("url") == "https://a.example/doc3").collect()
    assert bad[0]["error_class"] == "InvalidFileTypeError"


def test_parse_warc_garbage_fails_soft():
    """Arbitrary bytes (including truncated/corrupt gzip and bogus
    Content-Length) must return a list, never hang or raise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=80, deadline=None)
    @given(data=st.binary(max_size=500))
    def check(data):
        for payload in (data, b"WARC/1.0\r\n" + data,
                        b"\x1f\x8b" + data):
            assert isinstance(parse_warc(payload), list)

    check()


def test_wet_roundtrip_and_response_isolation(spark, tmp_path):
    """WET conversion records round-trip through read_wet; response
    records in the same container are ignored (and vice versa for
    read_warc); gzip framing transparent."""
    import datetime as dt
    import os

    from resume_parser_service_spark.sources.warc import (make_warc,
                                                          make_wet,
                                                          parse_warc)
    from resume_parser_service_spark.sources.warc import read_wet

    ts = dt.datetime(2024, 5, 1, 12, 0, 0)
    recs = [{"url": f"https://wet.example/doc/{i}", "warc_ts": ts,
             "text": f"extracted text body {i} with unicode café"}
            for i in range(5)]
    wet_dir = str(tmp_path / "wet")
    os.makedirs(wet_dir)
    with open(os.path.join(wet_dir, "part-0.wet.gz"), "wb") as fh:
        fh.write(make_wet(recs, compress=True))
    with open(os.path.join(wet_dir, "part-1.wet"), "wb") as fh:
        fh.write(make_wet(recs[:2]))

    df = read_wet(spark, wet_dir)
    rows = {(r.url, r.text) for r in df.collect()}
    assert len(rows) == 5  # part-1 urls overlap part-0's first two
    assert ("https://wet.example/doc/3",
            "extracted text body 3 with unicode café") in rows
    assert df.schema.simpleString() == \
        "struct<url:string,warc_ts:timestamp,text:string,lang:string>"

    # response records are invisible to the conversion parse and
    # conversion records invisible to the response parse
    mixed = make_warc([{"url": "https://resp.example/x", "warc_ts": ts,
                        "payload": b"<html><body>hi</body></html>"}]) + \
        make_wet(recs[:1])
    conv = parse_warc(mixed, record_types=(b"conversion",))
    resp = parse_warc(mixed)
    assert [r["url"] for r in conv] == ["https://wet.example/doc/0"]
    assert [r["url"] for r in resp] == ["https://resp.example/x"]
