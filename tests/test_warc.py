"""WARC ingestion: ISO 28500 framing, HTTP payload split, charset
decode, gzip members, dirty-input tolerance, and the pages-table
projection (`sources/warc.py`)."""

import gzip

from pyspark.sql import functions as F

from langscrape_spark.sources.warc import (
    build_warc_bytes,
    parse_warc,
    read_warc,
    warc_pages,
)

_RECORDS = [
    {"type": "warcinfo", "payload": b"software: synthetic\r\n"},
    {
        "type": "request",
        "uri": "https://a.example/x",
        "payload": b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n",
    },
    {
        "type": "response",
        "uri": "https://a.example/x",
        "date": "2026-01-02T03:04:05Z",
        "rid": "<urn:uuid:1>",
        "status": 200,
        "ctype": "text/html; charset=utf-8",
        # framing trap: the BODY contains the record magic — a
        # delimiter-splitting parser would tear the archive here
        "body": b"<html><p>all about WARC/1.0\r\n\r\nWARC/1.0 files</p></html>",
    },
    {
        "type": "response",
        "uri": "https://a.example/latin",
        "date": "2026-01-02T03:04:06Z",
        "status": 200,
        "ctype": "text/html; charset=ISO-8859-1",
        "body": b"<html>caf\xe9</html>",  # é in latin-1
    },
    {
        "type": "response",
        "uri": "https://a.example/gone",
        "date": "2026-01-02T03:04:07Z",
        "status": 404,
        "ctype": "text/html",
        "body": b"<html>gone</html>",
    },
    {
        "type": "response",
        "uri": "https://a.example/data.json",
        "date": "2026-01-02T03:04:08Z",
        "status": 200,
        "ctype": "application/json",
        "body": b'{"not": "html"}',
    },
]


def _df(spark, data: bytes, path="mem://f.warc"):
    return spark.createDataFrame([(path, data)], "path string, content binary")


def test_framing_and_http_split(spark):
    rows = {
        r["record_idx"]: r
        for r in parse_warc(_df(spark, build_warc_bytes(_RECORDS))).collect()
    }
    assert len(rows) == 6
    assert rows[0]["warc_type"] == "warcinfo" and rows[0]["http_status"] is None
    assert rows[1]["warc_type"] == "request"
    r2 = rows[2]
    assert r2["target_uri"] == "https://a.example/x"
    assert r2["http_status"] == 200
    assert r2["http_content_type"] == "text/html; charset=utf-8"
    # the WARC/1.0 inside the body did not tear framing
    assert bytes(r2["body"]) == _RECORDS[2]["body"]
    assert "WARC/1.0 files" in r2["body_text"]
    # charset honored: latin-1 é decodes to the right codepoint
    assert rows[3]["body_text"] == "<html>café</html>"
    assert rows[4]["http_status"] == 404
    assert rows[5]["http_content_type"] == "application/json"


def test_pages_projection_shape_and_filters(spark):
    pages = warc_pages(parse_warc(_df(spark, build_warc_bytes(_RECORDS))))
    got = pages.collect()
    # only the two 2xx text/html responses survive
    assert sorted(r["url"] for r in got) == [
        "https://a.example/latin",
        "https://a.example/x",
    ]
    assert [f.name for f in pages.schema.fields[:5]] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    by_url = {r["url"]: r for r in got}
    assert by_url["https://a.example/x"]["warc_ts"] is not None
    assert by_url["https://a.example/latin"]["html"] == "<html>café</html>"
    assert by_url["https://a.example/x"]["text"] is None


def test_gzip_members_and_file_scan(spark, tmp_path):
    """Common-Crawl layout: one gzip member per record, concatenated;
    read back through the real binaryFile scan."""
    data = b"".join(
        gzip.compress(build_warc_bytes([r])) for r in _RECORDS
    )
    p = tmp_path / "crawl.warc.gz"
    p.write_bytes(data)
    recs = read_warc(spark, str(tmp_path / "*.warc.gz"))
    assert recs.count() == 6
    assert warc_pages(recs).count() == 2


def test_dirty_inputs_never_throw(spark):
    ok = build_warc_bytes([_RECORDS[2]])
    cases = [
        b"",                                  # empty file
        b"leading garbage\r\n" + ok,          # junk before first magic
        ok[:-30],                             # truncated final record
        b"\x1f\x8b broken gzip header",       # undecodable gzip
        # missing Content-Length: boundary-scan fallback still finds
        # the next record
        b"WARC/1.0\r\nWARC-Type: metadata\r\n\r\nfree payload\r\n\r\n" + ok,
    ]
    for i, data in enumerate(cases):
        rows = parse_warc(_df(spark, data, path=f"mem://c{i}")).collect()
        if i == 0:
            assert rows == []
        if i in (1, 4):
            # the well-formed response record is recovered
            assert any(r["http_status"] == 200 for r in rows), i
    # obs-fold continuation header + case-insensitive names
    folded = (
        b"WARC/1.0\r\nwarc-type: response\r\n"
        b"WARC-Target-URI: https://f.example/\r\n\tcontinued\r\n"
        b"Content-Length: 0\r\n\r\n\r\n\r\n"
    )
    r = parse_warc(_df(spark, folded)).collect()[0]
    assert r["target_uri"] == "https://f.example/ continued"


# ---------------------------------------------------------------------------
# CDX index ingestion (sources/cdx.py)
# ---------------------------------------------------------------------------

_CDX_LINES = [
    'org,example)/x 20260102030405 {"url": "https://example.org/x", '
    '"mime": "text/html", "status": "200", "digest": "AAA", '
    '"length": "100", "offset": "0", "filename": "w1.warc.gz"}',
    'org,example)/y 20260102030406 {"url": "https://example.org/y", '
    '"mime": "text/html", "status": "200", "digest": "BBB", '
    '"length": "50", "offset": "300", "filename": "w1.warc.gz"}',
    # second record earlier in the file: fetch_plan must offset-sort
    'org,example)/z 20260102030407 {"url": "https://example.org/z", '
    '"mime": "application/pdf", "status": "200", "digest": "CCC", '
    '"length": "70", "offset": "120", "filename": "w1.warc.gz"}',
    'com,other)/ 20260102030408 {"url": "https://other.com/", '
    '"mime": "text/html", "status": "404", "digest": "DDD", '
    '"length": "10", "offset": "0", "filename": "w2.warc.gz"}',
    "short line",                       # too few fields → dropped
    "a b {broken json",                 # invalid JSON → dropped
    'x)/q notatimestamp {"url": "https://q.example/", "mime": "m", '
    '"status": "x", "length": "y", "offset": "5", '
    '"filename": "w3.warc.gz"}',        # ts/status/length null out
]


def test_parse_cdx_types_and_tolerance(spark):
    from langscrape_spark.sources.cdx import parse_cdx

    df = spark.createDataFrame([(l,) for l in _CDX_LINES], "value string")
    got = {r["url"]: r for r in parse_cdx(df).collect()}
    assert len(got) == 5  # two malformed lines dropped
    x = got["https://example.org/x"]
    assert (x["surt"], x["status"], x["length"], x["offset"]) == (
        "org,example)/x", 200, 100, 0,
    )
    assert x["ts"] is not None and x["ts"].year == 2026
    q = got["https://q.example/"]
    assert q["ts"] is None and q["status"] is None and q["length"] is None
    assert q["offset"] == 5


def test_fetch_plan_groups_and_sorts(spark):
    from langscrape_spark.sources.cdx import fetch_plan, parse_cdx

    df = spark.createDataFrame([(l,) for l in _CDX_LINES], "value string")
    captures = parse_cdx(df).where(F.col("status") == 200)
    plan = {r["filename"]: r for r in fetch_plan(captures).collect()}
    w1 = plan["w1.warc.gz"]
    assert w1["n_records"] == 3 and w1["total_bytes"] == 220
    assert [(r["offset"], r["length"]) for r in w1["ranges"]] == [
        (0, 100), (120, 70), (300, 50),
    ]
    assert "w2.warc.gz" not in plan  # 404 filtered upstream


def test_wet_roundtrip_exact(spark, tmp_path):
    from langscrape_spark.sources.warc import read_warc, write_wet

    rows = [
        ("https://a.example/1", "plain text body"),
        # framing traps: payload contains the magic, blank lines, and
        # a fake Content-Length header — the length-framed reader must
        # not tear on any of them
        ("https://a.example/2",
         "WARC/1.0\r\nContent-Length: 9999\r\n\r\nnot a record"),
        # multibyte: Content-Length must be octets, not chars
        ("https://a.example/3", "café 中文 text"),
        ("https://a.example/4", ""),  # empty payload
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    out = str(tmp_path / "wet")
    write_wet(pages.repartition(2), out)
    back = read_warc(spark, out + "/part-*")
    got = {r["target_uri"]: r for r in back.collect()}
    assert len(got) == 4
    for url, text in rows:
        r = got[url]
        assert r["warc_type"] == "conversion"
        assert r["body_text"] == text, url
        assert r["content_length"] == len(text.encode("utf-8"))
        assert r["http_status"] is None  # no HTTP envelope in WET


def test_wet_gzip_parts_roundtrip(spark, tmp_path):
    from langscrape_spark.sources.warc import read_warc, write_wet

    pages = spark.createDataFrame(
        [(f"https://g.example/{i}", f"doc {i}") for i in range(20)],
        "url string, text string",
    )
    out = str(tmp_path / "wetgz")
    write_wet(pages.repartition(3), out, compress=True)
    back = read_warc(spark, out + "/part-*")
    assert back.count() == 20
    assert {r["body_text"] for r in back.collect()} == {
        f"doc {i}" for i in range(20)
    }


def test_wet_deterministic_bytes(spark, tmp_path):
    import glob

    from langscrape_spark.sources.warc import write_wet

    pages = spark.createDataFrame(
        [("https://d.example/x", "stable")], "url string, text string"
    )
    outs = []
    for name in ("w1", "w2"):
        p = str(tmp_path / name)
        write_wet(pages.coalesce(1), p)
        (f,) = glob.glob(p + "/part-*")
        outs.append(open(f, "rb").read())
    assert outs[0] == outs[1]
    assert outs[0].endswith(b"\r\n\r\n")  # last record properly terminated


def test_wet_null_url_date_never_drop_rows(spark, tmp_path):
    from langscrape_spark.sources.warc import read_warc, write_wet

    pages = spark.createDataFrame(
        [("https://n.example/1", "ok", "2026-02-02T00:00:00Z"),
         (None, "null url body", "2026-02-02T00:00:00Z"),
         ("https://n.example/3", "null date body", None)],
        "url string, text string, fetch_ts string",
    )
    out = str(tmp_path / "wetnull")
    write_wet(pages.coalesce(1), out, date_col="fetch_ts")
    back = read_warc(spark, out + "/part-*").collect()
    assert len(back) == 3  # nothing silently dropped
    bodies = {r["body_text"] for r in back}
    assert bodies == {"ok", "null url body", "null date body"}
    # same url at two dates -> distinct record ids
    two = spark.createDataFrame(
        [("https://n.example/x", "v1", "2026-01-01T00:00:00Z"),
         ("https://n.example/x", "v2", "2026-01-02T00:00:00Z")],
        "url string, text string, fetch_ts string",
    )
    out2 = str(tmp_path / "wetdup")
    write_wet(two.coalesce(1), out2, date_col="fetch_ts")
    ids = [r["record_id"] for r in read_warc(spark, out2 + "/part-*").collect()]
    assert len(set(ids)) == 2
