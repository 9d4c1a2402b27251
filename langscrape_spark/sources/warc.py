"""WARC ingestion: Common-Crawl archive files → the pages table.

The engine's whole pipeline runs over an Iceberg-style pages table
``(url, warc_ts, html, text, lang)``; real deployments fill that table
from Common Crawl's WARC archives. The reference has no archive
ingestion at all (it fetches each URL live through a browser,
``langscrape/nodes/web_driver.py``); this module is the batch
replacement: WARC (ISO 28500) response records → one pages row per
captured URL, fully distributed, no external parser libraries (the
container has no ``warcio`` — framing is ~60 lines of stdlib).

Scale shape — the standard Common-Crawl processing model:

- **One WARC file = one task.** WARC is not block-splittable (records
  are length-framed, and CC ships per-record gzip members), so the
  scan uses the ``binaryFile`` source: each ~1 GB warc(.gz) becomes
  one input partition. 100 TB of CC is ~10⁵ files → ~10⁵ well-sized
  map tasks across 1000 executors, no shuffle at all; parallelism
  comes from file count, exactly how cc-pyspark/Sparkler process CC.
- **Length-framed parsing, never delimiter splitting.** Payloads
  routinely CONTAIN ``WARC/1.0`` (pages about WARC, embedded archives)
  — splitting on the magic would tear records. The parser walks
  ``Content-Length`` like the spec requires.
- **One Arrow crossing per file.** ``parse_warc`` is a single
  ``mapInPandas`` pass that emits framing fields, the raw ``body``
  bytes, AND the charset-decoded ``body_text`` — so the pages
  projection (:func:`warc_pages`) is pure JVM column work and never
  re-touches bytes (Spark's builtin ``decode`` supports only a fixed
  charset set and throws on malformed input under ANSI mode; Python's
  errors='replace' decode is the safe path and rides the pass we
  already pay for).

Record framing (ISO 28500 §4): ``WARC/1.0\\r\\n``, header lines
(``Name: value``, case-insensitive names), blank line, exactly
``Content-Length`` payload octets, then ``\\r\\n\\r\\n`` before the next
record. ``response`` records carry an HTTP response as payload (status
line, headers, blank line, body); the pages projection keeps the HTTP
status + Content-Type and decodes the body with the header charset.
"""

from __future__ import annotations

import codecs
import gzip
import re
from typing import Iterator, List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

WARC_RECORD_DDL = (
    "src string, record_idx int, warc_type string, target_uri string, "
    "warc_date string, record_id string, content_length bigint, "
    "http_status int, http_content_type string, body binary, "
    "body_text string"
)

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"
_CHARSET_RE = re.compile(r"charset=\"?([A-Za-z0-9_\-]+)", re.I)


def _parse_headers(block: bytes) -> dict:
    """Header block (no trailing blank line) → {lower-name: value}.
    Folded continuation lines (obs-fold, leading SP/HT) append to the
    previous value; malformed lines are skipped, never thrown on —
    one dirty record among millions must not kill the file's task."""
    headers: dict = {}
    last: Optional[str] = None
    for raw in block.split(_CRLF):
        if not raw:
            continue
        if raw[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + raw.strip().decode("latin-1")
            continue
        name, sep, value = raw.partition(b":")
        if not sep:
            last = None
            continue
        last = name.strip().decode("latin-1").lower()
        headers[last] = value.strip().decode("latin-1")
    return headers


def _iter_warc_records(data: bytes) -> Iterator[Tuple[int, dict, bytes]]:
    """Yield ``(record_idx, warc_headers, payload)`` walking
    Content-Length framing. Tolerates: leading garbage before the
    first magic, a missing/invalid Content-Length (falls back to
    scanning for the next ``\\r\\n\\r\\nWARC/`` boundary — payload may
    be clipped, but the file keeps parsing), and a truncated final
    record (clipped payload)."""
    pos = 0
    idx = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(_HDR_END, start)
        if hdr_end < 0:
            return
        block = data[start:hdr_end]
        first_crlf = block.find(_CRLF)
        headers = _parse_headers(block[first_crlf + 2 :]) if first_crlf >= 0 else {}
        body_start = hdr_end + len(_HDR_END)
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            clen = -1
        if clen >= 0:
            body = data[body_start : body_start + clen]
            pos = body_start + clen
        else:
            nxt = data.find(_HDR_END + b"WARC/", body_start)
            body = data[body_start:] if nxt < 0 else data[body_start:nxt]
            pos = n if nxt < 0 else nxt + len(_HDR_END)
        yield idx, headers, body
        idx += 1


def _split_http(payload: bytes) -> Tuple[Optional[int], dict, bytes]:
    """HTTP response payload → (status, headers, body). A payload that
    is not an HTTP message (e.g. a ``warcinfo``/``resource`` record)
    comes back as (None, {}, payload) so callers keep the raw bytes."""
    if not payload.startswith(b"HTTP/"):
        return None, {}, payload
    split = payload.find(_HDR_END)
    if split < 0:
        head, body = payload, b""
    else:
        head, body = payload[:split], payload[split + len(_HDR_END) :]
    first, _, rest = head.partition(_CRLF)
    parts = first.split(None, 2)
    try:
        status: Optional[int] = int(parts[1])
    except (IndexError, ValueError):
        status = None
    return status, _parse_headers(rest), body


def _decode_body(body: bytes, content_type: Optional[str]) -> str:
    """Bytes → text via the Content-Type charset, utf-8 fallback,
    always errors='replace' (a dirty capture must yield a row, not an
    exception). Unknown charset labels fall back to utf-8."""
    enc = "utf-8"
    if content_type:
        m = _CHARSET_RE.search(content_type)
        if m:
            cand = m.group(1)
            try:
                codecs.lookup(cand)
                enc = cand
            except LookupError:
                pass
    return body.decode(enc, errors="replace")


def _maybe_gunzip(path: str, data: bytes) -> bytes:
    """A CC ``.warc.gz`` is a stream of per-record gzip members;
    :func:`gzip.decompress` inflates all concatenated members.
    Magic-sniffed so mislabeled files still parse; undecodable data
    passes through (the record walker then finds nothing — a zero-row
    file, not a dead task)."""
    if data[:2] == b"\x1f\x8b":
        try:
            return gzip.decompress(data)
        except (OSError, EOFError):
            return data
    return data


def parse_warc(
    df: DataFrame, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """(path, content:binary) — e.g. a ``binaryFile`` scan — → one row
    per WARC record (:data:`WARC_RECORD_DDL`). One Arrow pass per
    file; no shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "src", "record_idx", "warc_type", "target_uri", "warc_date",
            "record_id", "content_length", "http_status",
            "http_content_type", "body", "body_text",
        ]
        for pdf in batches:
            rows: List[tuple] = []
            for src, content in zip(pdf[path_col], pdf[content_col]):
                data = _maybe_gunzip(src, bytes(content or b""))
                for idx, headers, payload in _iter_warc_records(data):
                    status, http_headers, body = _split_http(payload)
                    ctype = http_headers.get("content-type")
                    out_body = body if status is not None else payload
                    rows.append(
                        (
                            src,
                            idx,
                            headers.get("warc-type"),
                            headers.get("warc-target-uri"),
                            headers.get("warc-date"),
                            headers.get("warc-record-id"),
                            len(payload),
                            status,
                            ctype,
                            out_body,
                            _decode_body(out_body, ctype),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(path_col, content_col).mapInPandas(
        gen, schema=WARC_RECORD_DDL
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan: ``binaryFile`` source (one file = one
    partition = one parse task) → records."""
    files = spark.read.format("binaryFile").load(path)
    return parse_warc(files.select("path", "content"))


def warc_pages(records: DataFrame) -> DataFrame:
    """WARC records → the engine's pages-table shape ``(url, warc_ts,
    html, text, lang)`` plus provenance ``(http_status, mime, src,
    record_idx)``. Keeps only ``response`` records that carry a target
    URI, a 2xx status, and an HTML-ish Content-Type; ``html`` is the
    charset-decoded body; ``text``/``lang`` start NULL — the
    extraction plan fills them downstream. Pure JVM column work (the
    single UDF crossing already happened in :func:`parse_warc`);
    ``try_to_timestamp`` because one malformed WARC-Date must not kill
    the load under ANSI mode."""
    mime = F.lower(
        F.trim(F.split(F.coalesce(F.col("http_content_type"), F.lit("")), ";")[0])
    )
    return (
        records.where(
            (F.col("warc_type") == "response")
            & F.col("target_uri").isNotNull()
            & F.col("http_status").between(200, 299)
        )
        .withColumn("mime", mime)
        .where(F.col("mime").isin("text/html", "application/xhtml+xml"))
        .select(
            F.col("target_uri").alias("url"),
            F.try_to_timestamp(F.col("warc_date")).alias("warc_ts"),
            F.col("body_text").alias("html"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
            "http_status",
            "mime",
            "src",
            "record_idx",
        )
    )


# ---------------------------------------------------------------------------
# Deterministic WARC synthesis (tests / oracles — no external data)
# ---------------------------------------------------------------------------


def build_warc_bytes(records: List[dict]) -> bytes:
    """Spec-shaped WARC/1.0 bytes from record dicts (keys: ``type``,
    ``uri``, ``date``, ``rid``, and either ``payload`` bytes or the
    HTTP triple ``status``/``ctype``/``body``). Used by tests and the
    q49 oracle generator — deterministic, no wall clock."""
    out = bytearray()
    for r in records:
        if "payload" in r:
            payload = r["payload"]
        else:
            body = r["body"]
            payload = (
                b"HTTP/1.1 %d OK\r\nContent-Type: %s\r\n"
                b"Content-Length: %d\r\n\r\n%s"
                % (r["status"], r["ctype"].encode(), len(body), body)
            )
        hdrs = [b"WARC/1.0", b"WARC-Type: " + r["type"].encode()]
        if r.get("uri"):
            hdrs.append(b"WARC-Target-URI: " + r["uri"].encode())
        if r.get("date"):
            hdrs.append(b"WARC-Date: " + r["date"].encode())
        if r.get("rid"):
            hdrs.append(b"WARC-Record-ID: " + r["rid"].encode())
        hdrs.append(b"Content-Length: %d" % len(payload))
        out += _CRLF.join(hdrs) + _HDR_END + payload + _HDR_END
    return bytes(out)


# ---------------------------------------------------------------------------
# WET-style conversion output (the write side of the archive story)
# ---------------------------------------------------------------------------


def wet_record(
    url: Column, text: Column, date: Column = None
) -> Column:
    """One WARC/1.0 ``conversion`` record (WET) as a STRING column —
    pure JVM concat, no UDF. ``Content-Length`` is the UTF-8 octet
    length of the payload (``octet_length``), which is what the
    length-framed reader walks; the record id is a deterministic
    md5-derived urn so re-runs emit byte-identical archives. The
    trailing ``\\r\\n\\r\\n`` separator is NOT included — the writer
    supplies it as the sink's ``lineSep`` so framing stays exact."""
    payload = F.coalesce(text, F.lit(""))
    d = date if date is not None else F.lit(None).cast("string")
    # NULL-proof every concat input: F.concat propagates NULL, and a
    # NULL record string would make the text sink silently drop the
    # row (an archive that loses pages without an error). NULL urls
    # become an empty URI header — visible junk beats silent loss;
    # callers should filter them upstream.
    u = F.coalesce(url, F.lit(""))
    d = F.coalesce(d, F.lit("2026-01-01T00:00:00Z"))
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        u,
        F.lit("\r\nWARC-Date: "),
        d,
        # id hashes url AND date so two captures of the same url get
        # distinct ids (ISO 28500 wants record ids globally unique)
        F.lit("\r\nWARC-Record-ID: <urn:md5:"),
        F.md5(F.concat(u, F.lit("|"), d)),
        F.lit(">\r\nContent-Type: text/plain\r\nContent-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit("\r\n\r\n"),
        payload,
    )


def write_wet(
    pages: DataFrame,
    path: str,
    url_col: str = "url",
    text_col: str = "text",
    date_col: str = None,
    compress: bool = False,
) -> None:
    """Write pages as WET (WARC conversion) archive part-files.

    One output file per partition — the same file-per-task model the
    reader exploits (each part is independently parseable, so 10⁵
    parts re-read as 10⁵ parallel tasks with no shuffle in either
    direction). Uses the text sink with ``lineSep='\\r\\n\\r\\n'`` so
    every record, including the last, is terminated exactly per the
    ISO 28500 framing the reader walks; payloads may legally contain
    ``WARC/1.0`` or blank lines — the reader is length-framed, so the
    roundtrip is exact (pinned by ``test_warc.py``). ``compress=True``
    writes ``.gz`` parts (whole-file gzip, which ``read_warc``'s
    ``_maybe_gunzip`` already handles)."""
    rec = wet_record(
        F.col(url_col),
        F.col(text_col),
        F.col(date_col) if date_col else None,
    )
    writer = pages.select(rec.alias("value")).write.option(
        "lineSep", "\r\n\r\n"
    )
    if compress:
        writer = writer.option("compression", "gzip")
    writer.mode("overwrite").text(path)
