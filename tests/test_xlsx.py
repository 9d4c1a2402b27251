"""Stdlib .xlsx seed reader (sources/xlsx.py) — closes the last
SURVEY §2.1 partial: the reference seeds its crawl from an Excel
url/ID sheet (reference scripts/run.py:53-55)."""

import zipfile

import pytest

from pyspark.sql import functions as F

_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_RELDOC = (
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
)
_RELPKG = "http://schemas.openxmlformats.org/package/2006/relationships"


def _col_letter(idx):
    s = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        s = chr(ord("A") + rem) + s
    return s


def _write_xlsx(path, sheets, shared_header=True):
    """Minimal SpreadsheetML writer for tests: ``sheets`` is
    {name: rows}; str cells go through sharedStrings (like real
    writers), ints/floats inline as <v>, None cells are OMITTED
    (sparse refs — the reader must pad)."""
    strings = []
    sindex = {}

    def sref(s):
        if s not in sindex:
            sindex[s] = len(strings)
            strings.append(s)
        return sindex[s]

    sheet_xmls = []
    for rows in sheets.values():
        body = []
        for rn, row in enumerate(rows, start=1):
            cells = []
            for ci, v in enumerate(row):
                if v is None:
                    continue
                ref = f"{_col_letter(ci)}{rn}"
                if isinstance(v, str):
                    cells.append(
                        f'<c r="{ref}" t="s"><v>{sref(v)}</v></c>'
                    )
                else:
                    cells.append(f'<c r="{ref}"><v>{v}</v></c>')
            body.append(f'<row r="{rn}">{"".join(cells)}</row>')
        sheet_xmls.append(
            f'<worksheet xmlns="{_MAIN}"><sheetData>'
            + "".join(body)
            + "</sheetData></worksheet>"
        )

    names = list(sheets)
    wb = (
        f'<workbook xmlns="{_MAIN}" xmlns:r="{_RELDOC}"><sheets>'
        + "".join(
            f'<sheet name="{n}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        + "</sheets></workbook>"
    )
    rels = (
        f'<Relationships xmlns="{_RELPKG}">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="{_RELDOC}/worksheet"'
            f' Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    # rich-text run coverage: the LAST shared string entry is written
    # as two <r> runs when it contains '|' (reader must concat runs)
    sst_items = []
    for s in strings:
        if "|" in s:
            runs = "".join(f"<r><t>{p}</t></r>" for p in s.split("|"))
            sst_items.append(f"<si>{runs}</si>")
        else:
            sst_items.append(f"<si><t>{s}</t></si>")
    sst = f'<sst xmlns="{_MAIN}">' + "".join(sst_items) + "</sst>"

    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        for i, x in enumerate(sheet_xmls):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", x)


def test_read_xlsx_types_sparse_and_richtext(spark, tmp_path):
    from langscrape_spark.sources.xlsx import read_xlsx

    p = str(tmp_path / "seeds.xlsx")
    _write_xlsx(
        p,
        {
            "Sheet1": [
                ["url", "ID", "note"],
                ["https://a.example/x", 1, "plain"],
                ["https://b.example/y", 2.0, None],  # sparse row
                ["https://c.example/z", 3, "rich|text"],  # 2 <t> runs
            ]
        },
    )
    out = read_xlsx(spark, p).orderBy("ID").collect()
    assert [r.url for r in out] == [
        "https://a.example/x",
        "https://b.example/y",
        "https://c.example/z",
    ]
    assert [r.ID for r in out] == ["1", "2.0", "3"]
    assert [r.note for r in out] == ["plain", None, "richtext"]


def test_read_xlsx_sheet_selection_and_missing(spark, tmp_path):
    from langscrape_spark.sources.xlsx import read_xlsx

    p = str(tmp_path / "multi.xlsx")
    _write_xlsx(
        p,
        {
            "First": [["a"], ["1"]],
            "Second": [["b"], ["2"]],
        },
    )
    assert read_xlsx(spark, p).columns == ["a"]
    out = read_xlsx(spark, p, sheet="Second").collect()
    assert out[0].b == "2"
    with pytest.raises(Exception, match="not found"):
        read_xlsx(spark, p, sheet="Nope").collect()


def test_read_xlsx_explicit_columns_skips_driver_read(spark, tmp_path):
    from langscrape_spark.sources.xlsx import read_xlsx

    p = str(tmp_path / "cols.xlsx")
    _write_xlsx(p, {"S": [["url", "ID"], ["https://x.example/", 9]]})
    out = read_xlsx(spark, p, columns=["u", "i"]).collect()
    assert len(out) == 1 and out[0].u == "https://x.example/"


def test_read_xlsx_headerless_duplicate_and_digit_headers(spark, tmp_path):
    from langscrape_spark.sources.xlsx import read_xlsx

    # headerless: every row is data (header=False requires columns)
    p = str(tmp_path / "nohead.xlsx")
    _write_xlsx(p, {"S": [["https://a.example/", 1], ["https://b.example/", 2]]})
    out = read_xlsx(spark, p, columns=["url", "id"], header=False).collect()
    assert sorted(r.url for r in out) == [
        "https://a.example/", "https://b.example/",
    ]
    with pytest.raises(ValueError, match="header=False"):
        read_xlsx(spark, p, header=False)

    # duplicate + digit-leading + blank headers sanitize/uniquify
    p2 = str(tmp_path / "dups.xlsx")
    _write_xlsx(
        p2,
        {"S": [["url", "url", "2024 rev", ""], ["a", "b", "c", "d"]]},
    )
    df = read_xlsx(spark, p2)
    assert df.columns == ["url", "url_2", "_2024_rev", "_c3"]
    r = df.collect()[0]
    assert (r.url, r.url_2, r["_2024_rev"], r["_c3"]) == ("a", "b", "c", "d")


def test_shared_string_phonetic_runs_excluded(spark, tmp_path):
    """<rPh> phonetic hints (Japanese Excel) must not leak into cell
    values — only <t> and rich-run <r><t> text counts."""
    import zipfile as _zf

    from langscrape_spark.sources.xlsx import parse_xlsx_bytes

    p = str(tmp_path / "ph.xlsx")
    _write_xlsx(p, {"S": [["v"], ["placeholder"]]})
    # rewrite sharedStrings with a phonetic run
    with _zf.ZipFile(p) as z:
        members = {n: z.read(n) for n in z.namelist()}
    members["xl/sharedStrings.xml"] = (
        f'<sst xmlns="{_MAIN}"><si><t>v</t></si>'
        f'<si><t>東京</t><rPh sb="0" eb="2">'
        f"<t>トウキョウ</t></rPh></si></sst>"
    ).encode()
    with _zf.ZipFile(p, "w") as z:
        for n, b in members.items():
            z.writestr(n, b)
    rows = parse_xlsx_bytes(open(p, "rb").read())
    assert rows[1] == ["東京"]  # no phonetic leak


def test_inline_string_phonetic_runs_excluded(spark, tmp_path):
    """CT_Rst allows the same rich/phonetic structure in <is> as in
    <si>: an inlineStr cell with an <rPh> run must not leak the
    phonetic text either (same contract as the shared-string table)."""
    import zipfile as _zf

    from langscrape_spark.sources.xlsx import parse_xlsx_bytes

    p = str(tmp_path / "inline_ph.xlsx")
    _write_xlsx(p, {"S": [["v"], ["placeholder"]]})
    with _zf.ZipFile(p) as z:
        members = {n: z.read(n) for n in z.namelist()}
    members["xl/worksheets/sheet1.xml"] = (
        f'<worksheet xmlns="{_MAIN}"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>東</t>'
        '<r><t>京</t></r><rPh sb="0" eb="2"><t>トウキョウ</t></rPh>'
        "</is></c></row>"
        "</sheetData></worksheet>"
    ).encode()
    with _zf.ZipFile(p, "w") as z:
        for n, b in members.items():
            z.writestr(n, b)
    rows = parse_xlsx_bytes(open(p, "rb").read())
    assert rows[0] == ["東京"]  # direct <t> + run <r><t>, no rPh leak


def test_absolute_relationship_target(spark, tmp_path):
    """OPC allows absolute part names ('/xl/worksheets/sheet1.xml') in
    relationship targets; the reader must normalize them instead of
    building a malformed 'xl//xl/...' member path."""
    import zipfile as _zf

    from langscrape_spark.sources.xlsx import parse_xlsx_bytes

    p = str(tmp_path / "abs.xlsx")
    _write_xlsx(p, {"S": [["url"], ["https://a.example/"]]})
    with _zf.ZipFile(p) as z:
        members = {n: z.read(n) for n in z.namelist()}
    members["xl/_rels/workbook.xml.rels"] = (
        f'<Relationships xmlns="{_RELPKG}">'
        f'<Relationship Id="rId1" Type="{_RELDOC}/worksheet"'
        ' Target="/xl/worksheets/sheet1.xml"/>'
        "</Relationships>"
    ).encode()
    with _zf.ZipFile(p, "w") as z:
        for n, b in members.items():
            z.writestr(n, b)
    rows = parse_xlsx_bytes(open(p, "rb").read())
    assert rows[1] == ["https://a.example/"]


def test_absolute_target_outside_xl_is_not_rebased(spark, tmp_path):
    """An absolute OPC target is the zip member path verbatim (minus
    the leading '/') — a part stored at the package root
    ('/worksheets/sheet1.xml') must NOT be rebased under 'xl/'."""
    import zipfile as _zf

    from langscrape_spark.sources.xlsx import parse_xlsx_bytes

    p = str(tmp_path / "rootpart.xlsx")
    _write_xlsx(p, {"S": [["url"], ["https://a.example/"]]})
    with _zf.ZipFile(p) as z:
        members = {n: z.read(n) for n in z.namelist()}
    members["worksheets/sheet1.xml"] = members.pop(
        "xl/worksheets/sheet1.xml"
    )
    members["xl/_rels/workbook.xml.rels"] = (
        f'<Relationships xmlns="{_RELPKG}">'
        f'<Relationship Id="rId1" Type="{_RELDOC}/worksheet"'
        ' Target="/worksheets/sheet1.xml"/>'
        "</Relationships>"
    ).encode()
    with _zf.ZipFile(p, "w") as z:
        for n, b in members.items():
            z.writestr(n, b)
    rows = parse_xlsx_bytes(open(p, "rb").read())
    assert rows[1] == ["https://a.example/"]


def test_header_uniquifier_probes_past_literal_collisions(spark, tmp_path):
    """['url', 'url_2', 'url']: the minted name for the duplicate
    'url' must probe PAST the literal 'url_2' header instead of
    colliding with it and erroring on a readable workbook."""
    from langscrape_spark.sources.xlsx import read_xlsx

    p = str(tmp_path / "probe.xlsx")
    _write_xlsx(p, {"S": [["url", "url_2", "url"], ["a", "b", "c"]]})
    df = read_xlsx(spark, p)
    assert df.columns == ["url", "url_2", "url_3"]
    r = df.collect()[0]
    assert (r.url, r.url_2, r.url_3) == ("a", "b", "c")


def test_seeds_from_xlsx_projection(spark, tmp_path):
    from langscrape_spark.sources.xlsx import seeds_from_xlsx

    p = str(tmp_path / "seeds.xlsx")
    _write_xlsx(
        p,
        {
            "S": [
                ["url", "ID"],
                ["https://a.example/1", 1],
                ["https://b.example/2", "2.0"],  # writer-dependent form
                [None, 3],  # blank trailing row -> dropped
            ]
        },
    )
    rows = seeds_from_xlsx(spark, p).orderBy("id").collect()
    assert [(r.url, r.id) for r in rows] == [
        ("https://a.example/1", 1),
        ("https://b.example/2", 2),
    ]


def test_crawl_seeded_from_xlsx_matches_synth_seeds(spark, tmp_path):
    """End-to-end: a crawl seeded from an .xlsx workbook produces the
    SAME schedule as the identical seed list fed as a plain DataFrame
    — the workbook is a source, never a semantic."""
    from langscrape_spark import synth
    from langscrape_spark.scheduler.frontier import CrawlConfig, run_crawl
    from langscrape_spark.sources.catalog import Catalog
    from langscrape_spark.sources.xlsx import seeds_from_xlsx

    n_pages = 120
    pages = synth.build_pages_df(spark, n_pages, partitions=4).cache()
    pages.count()
    robots = synth.robots_df(spark)
    host_rank = synth.host_rank_df(spark)
    plain_seeds = synth.seeds_df(spark, n_pages, n_seeds=6)

    p = str(tmp_path / "crawl_seeds.xlsx")
    rows = [["url", "ID"]] + [
        [r.url, i] for i, r in enumerate(plain_seeds.collect())
    ]
    _write_xlsx(p, {"seeds": rows})
    # the frontier's seed contract is (url, depth); a seed workbook
    # has no depth notion — seeds start at 0 like the reference's list
    xlsx_seeds = seeds_from_xlsx(spark, p).select(
        "url", F.lit(0).alias("depth")
    )

    def schedule(seeds, sub):
        cat = Catalog(spark, str(tmp_path / sub))
        cfg = CrawlConfig(batch_size=30, max_rounds=4, seen_partitions=4)
        st = run_crawl(spark, pages, seeds, robots, host_rank, cat, cfg)
        return sorted(
            (r.round, r.seq, r.url) for r in st.schedule.collect()
        )

    a = schedule(plain_seeds, "cat_plain")
    b = schedule(xlsx_seeds, "cat_xlsx")
    assert a == b and len(a) > 0
