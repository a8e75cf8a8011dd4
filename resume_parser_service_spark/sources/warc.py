"""WARC source connector: Common-Crawl container files -> pages rows.

Reads WARC/1.0-1.1 files (ISO 28500) with ``spark.read.format
("binaryFile")`` and parses response records into the canonical
``pages`` schema (url, warc_ts, html, text=null, lang=null) inside
``mapInPandas`` — one Arrow batch per file group, no per-row Python at
the JVM boundary. gzip members (the .warc.gz framing Common Crawl
ships) are handled transparently.

Writer ``make_warc`` builds deterministic test fixtures; there is no
external data in this sandbox.
"""

from __future__ import annotations

import gzip
import io
import re
import zlib
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_warc", "read_wet", "parse_warc", "make_warc",
           "make_wet"]

_HDR_RE = re.compile(rb"^([A-Za-z0-9\-]+):[ \t]*(.*?)\r?$")


def _parse_headers(block: bytes) -> dict[bytes, bytes]:
    out: dict[bytes, bytes] = {}
    for line in block.split(b"\n"):
        m = _HDR_RE.match(line)
        if m:
            out[m.group(1).lower()] = m.group(2)
    return out


def parse_warc(data: bytes,
               record_types: tuple = (b"response",)) -> list[dict]:
    """Parse WARC bytes into record dicts (url, warc_ts, payload).
    Tolerates gzip (multi-member) framing. ``record_types`` selects
    which WARC record types to keep: ``response`` records carry raw
    HTTP wire bytes (stripped + de-transport-coded below); WET files'
    ``conversion`` records carry already-extracted plain text, kept
    verbatim."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
        except (OSError, EOFError, zlib.error):
            return []  # corrupt/truncated container: no records, no crash
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # find record start
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[start:hdr_end])
        try:
            length = int(headers.get(b"content-length", b"0"))
        except ValueError:
            length = 0
        body = data[hdr_end + 4:hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        rec_type = headers.get(b"warc-type")
        if rec_type not in record_types:
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts_raw = headers.get(b"warc-date", b"").decode("ascii", "replace")
        try:
            ts = datetime.strptime(ts_raw, "%Y-%m-%dT%H:%M:%SZ") \
                .replace(tzinfo=timezone.utc)
        except ValueError:
            ts = datetime(1970, 1, 1, tzinfo=timezone.utc)
        # body of a response record is an HTTP response: strip the HTTP
        # header block and undo transport encodings (RFC 9112 chunked
        # framing, gzip content coding) — crawl WARCs store the raw
        # wire bytes. Conversion (WET) records are the payload itself.
        http_end = body.find(b"\r\n\r\n") if rec_type == b"response" else -1
        if http_end >= 0:
            http_hdrs = _parse_headers(body[:http_end])
            payload = body[http_end + 4:]
            if b"chunked" in http_hdrs.get(b"transfer-encoding", b"").lower():
                payload = _dechunk(payload)
            if b"gzip" in http_hdrs.get(b"content-encoding", b"").lower():
                try:
                    payload = gzip.GzipFile(
                        fileobj=io.BytesIO(payload)).read()
                except (OSError, EOFError, zlib.error):
                    pass  # keep raw bytes; validation downstream rejects
        else:
            payload = body
        records.append({"url": url, "warc_ts": ts, "payload": payload})
    return records


def _dechunk(data: bytes) -> bytes:
    """Undo HTTP/1.1 chunked transfer framing (RFC 9112 §7.1)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        eol = data.find(b"\r\n", pos)
        if eol < 0:
            break
        size_tok = data[pos:eol].split(b";")[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            break
        if size == 0:
            break
        out += data[eol + 2:eol + 2 + size]
        pos = eol + 2 + size + 2  # skip chunk payload + trailing CRLF
    return bytes(out)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Load WARC files under ``path`` as a pages DataFrame
    (text/lang null — they are extraction outputs, not inputs)."""
    import pandas as pd

    files = spark.read.format("binaryFile") \
        .option("pathGlobFilter", "*.warc*").load(path) \
        .select("path", "content")

    def explode_records(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in parse_warc(bytes(content)):
                    rows.append({"url": rec["url"], "warc_ts": rec["warc_ts"],
                                 "html": rec["payload"], "text": None,
                                 "lang": None})
            out = pd.DataFrame(rows,
                               columns=["url", "warc_ts", "html", "text",
                                        "lang"])
            if len(out):
                out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True) \
                    .dt.tz_localize(None)
            yield out

    from ..schema import PAGES_SCHEMA
    return files.mapInPandas(explode_records, schema=PAGES_SCHEMA)


def make_warc(records: list[dict], compress: bool = False) -> bytes:
    """Deterministic WARC writer for fixtures: each record needs
    url (str), warc_ts (datetime), payload (bytes)."""
    out = bytearray()
    for i, rec in enumerate(records):
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream"
                b"\r\nContent-Length: %d\r\n\r\n" % len(rec["payload"])) + \
            rec["payload"]
        hdr = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               b"WARC-Record-ID: <urn:uuid:%08d>\r\n" % i +
               b"WARC-Target-URI: " + rec["url"].encode() + b"\r\n" +
               b"WARC-Date: " +
               rec["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ").encode() +
               b"\r\n"
               b"Content-Type: application/http; msgtype=response\r\n"
               b"Content-Length: %d\r\n\r\n" % len(http))
        out += hdr + http + b"\r\n\r\n"
    data = bytes(out)
    return gzip.compress(data, 9) if compress else data


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Load WET files (Common Crawl's pre-extracted plain-text sibling
    of WARC: ``conversion`` records, text/plain payloads) as a
    documents-style frame (url, warc_ts, text, lang=null).

    WET rows skip the extraction kernel entirely — they feed the
    analysis/dedup/quality operators directly, which is how most
    text-pipeline runs over Common Crawl actually start. Same
    binaryFile + mapInPandas shape as ``read_warc``: one Arrow batch
    per file group, corrupt containers fail soft to zero records."""
    import pandas as pd

    files = spark.read.format("binaryFile") \
        .option("pathGlobFilter", "*.wet*").load(path) \
        .select("path", "content")

    def explode_records(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in parse_warc(bytes(content),
                                      record_types=(b"conversion",)):
                    rows.append({
                        "url": rec["url"], "warc_ts": rec["warc_ts"],
                        "text": rec["payload"].decode("utf-8", "replace"),
                        "lang": None})
            out = pd.DataFrame(rows,
                               columns=["url", "warc_ts", "text", "lang"])
            if len(out):
                out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True) \
                    .dt.tz_localize(None)
            yield out

    return files.mapInPandas(
        explode_records,
        schema="url string, warc_ts timestamp, text string, lang string")


def make_wet(records: list[dict], compress: bool = False) -> bytes:
    """Deterministic WET writer for fixtures: each record needs
    url (str), warc_ts (datetime), text (str)."""
    out = bytearray()
    for i, rec in enumerate(records):
        payload = rec["text"].encode("utf-8")
        hdr = (b"WARC/1.0\r\n"
               b"WARC-Type: conversion\r\n"
               b"WARC-Record-ID: <urn:uuid:wet-%08d>\r\n" % i +
               b"WARC-Target-URI: " + rec["url"].encode() + b"\r\n" +
               b"WARC-Date: " +
               rec["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ").encode() +
               b"\r\n"
               b"Content-Type: text/plain\r\n"
               b"Content-Length: %d\r\n\r\n" % len(payload))
        out += hdr + payload + b"\r\n\r\n"
    data = bytes(out)
    return gzip.compress(data, 9) if compress else data
