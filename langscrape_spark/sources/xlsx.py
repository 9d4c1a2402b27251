"""Excel (.xlsx) seed-list reader — stdlib only, Spark-distributed.

The reference seeds its crawl from an Excel sheet with ``url``/``ID``
columns (``/root/reference/scripts/run.py:53-55``,
``pd.read_excel(...).url.tolist()``). This sandbox has no openpyxl,
but .xlsx is just a ZIP of SpreadsheetML XML — ``xl/workbook.xml``
(sheet list), ``xl/sharedStrings.xml`` (string table),
``xl/worksheets/sheetN.xml`` (rows) — all parseable with ``zipfile``
+ ``xml.etree``. Files are read through Spark's ``binaryFile`` source
and parsed per-file inside one Arrow-batched ``mapInPandas`` pass, so
a directory of seed workbooks scans in parallel and the parse runs
where the bytes are.

Scope (documented subset, like ``html/minify.py``): cell value TYPES
are returned as the raw stored strings (shared/inline/formula-cached
strings resolved; numbers as their serialized ``<v>`` text; dates are
Excel serial numbers — seed lists carry urls and ids, not dates), and
only the first sheet is read unless ``sheet`` names another. That is
exactly what the reference consumes; a full openpyxl replacement is
out of scope.

Schema inference collects ONE file's header row to the driver (seed
workbooks are KB-sized; the collect is bounded by ``maxBytes``). At
scale, or for headerless sheets, pass ``columns`` explicitly and no
driver read happens.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["parse_xlsx_bytes", "read_xlsx", "seeds_from_xlsx"]

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)
_PKG_REL_NS = (
    "{http://schemas.openxmlformats.org/package/2006/relationships}"
)


def _cell_col_index(ref: str) -> int:
    """``'BC23'`` → 0-based column 54. Sum of base-26 letter digits."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return n - 1


def _shared_strings(zf: zipfile.ZipFile) -> list:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ElementTree.fromstring(data)
    out = []
    for si in root:
        # plain <si><t>…</t></si> or rich-text runs <si><r><t>…</t></r>…
        # — but NOT <rPh> phonetic-run hints (Japanese Excel stores
        # kanji cells as <t>東京</t><rPh><t>トウキョウ</t></rPh>;
        # a blanket .iter('t') would corrupt the value to
        # '東京トウキョウ'; openpyxl excludes rPh for the same reason)
        parts = [t.text or "" for t in si.findall(f"{_NS}t")]
        parts += [
            t.text or ""
            for r in si.findall(f"{_NS}r")
            for t in r.findall(f"{_NS}t")
        ]
        out.append("".join(parts))
    return out


def _sheet_path(zf: zipfile.ZipFile, sheet: str | None) -> str:
    """Resolve the worksheet part path via workbook.xml + its rels —
    sheet order in the workbook, not zip member order (writers are
    free to number sheetN.xml arbitrarily)."""
    wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    rels = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    targets = {
        r.get("Id"): r.get("Target")
        for r in rels.iter(f"{_PKG_REL_NS}Relationship")
    }
    chosen = None
    for s in wb.iter(f"{_NS}sheet"):
        if sheet is None or s.get("name") == sheet:
            chosen = s
            break
    if chosen is None:
        names = [s.get("name") for s in wb.iter(f"{_NS}sheet")]
        raise ValueError(f"sheet {sheet!r} not found; workbook has {names}")
    target = targets[chosen.get(_REL_NS)]
    if target.startswith("/"):
        # OPC absolute part name ('/xl/worksheets/sheet1.xml', or even
        # '/worksheets/sheet1.xml' at the package root): the path IS
        # the zip member, never resolved against the xl/ rels base
        return target[1:]
    return target if target.startswith("xl/") else f"xl/{target}"


def parse_xlsx_bytes(
    data: bytes, sheet: str | None = None
) -> list[list[str | None]]:
    """All rows of one worksheet as lists of cell strings (None for
    missing cells), ragged by design — header alignment happens in
    :func:`read_xlsx`. Pure function of the bytes; runs on executors."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    strings = _shared_strings(zf)
    root = ElementTree.fromstring(zf.read(_sheet_path(zf, sheet)))
    rows: list[list[str | None]] = []
    for row in root.iter(f"{_NS}row"):
        cells: list[str | None] = []
        for c in row.iter(f"{_NS}c"):
            ref = c.get("r") or ""
            idx = _cell_col_index(ref) if ref else len(cells)
            ctype = c.get("t", "n")
            value: str | None = None
            if ctype == "inlineStr":
                is_el = c.find(f"{_NS}is")
                if is_el is not None:
                    # CT_Rst allows the same rich-text/phonetic shape
                    # as <si>: direct <t> + run <r><t> only, never a
                    # blanket descendant scan that would leak <rPh>
                    # phonetic-run text into the value
                    parts = [
                        t.text or "" for t in is_el.findall(f"{_NS}t")
                    ]
                    parts += [
                        t.text or ""
                        for r in is_el.findall(f"{_NS}r")
                        for t in r.findall(f"{_NS}t")
                    ]
                    value = "".join(parts)
            else:
                v = c.find(f"{_NS}v")
                if v is not None and v.text is not None:
                    value = (
                        strings[int(v.text)] if ctype == "s" else v.text
                    )
            while len(cells) <= idx:
                cells.append(None)
            cells[idx] = value
        rows.append(cells)
    return rows


def read_xlsx(
    spark: SparkSession,
    path: str,
    sheet: str | None = None,
    columns: list[str] | None = None,
    header: bool = True,
    max_bytes: int = 64 << 20,
) -> DataFrame:
    """Read .xlsx file(s) at ``path`` (glob ok) into a DataFrame of
    STRING columns. With ``columns=None`` the first file's header row
    names the columns (one bounded driver read — size-gated BEFORE the
    blob leaves the executors); pass ``columns`` to skip the driver
    read. ``header`` says whether files carry a header row to skip —
    it stays True with explicit ``columns`` (renaming a headered
    sheet); pass ``header=False`` for genuinely headerless sheets
    (requires explicit ``columns``). Header names are sanitized to
    identifiers, uniquified (``url``, ``url_2``), blanks become
    ``_cN``. Files larger than ``max_bytes`` are rejected (a seed
    workbook is KB-sized; a multi-GB "xlsx" is a mistake, not a seed
    list)."""
    import pandas as pd

    if columns is None and not header:
        raise ValueError("header=False requires explicit columns")
    bins = spark.read.format("binaryFile").load(path)
    if columns is None:
        # size gate runs on file METADATA before any blob is collected
        meta = bins.select("length").limit(1).collect()
        if not meta:
            raise ValueError(f"no files at {path!r}")
        if meta[0][0] > max_bytes:
            raise ValueError(
                f"first file exceeds max_bytes={max_bytes}; pass"
                " explicit columns or raise the limit"
            )
        first = bins.select("content").limit(1).collect()
        head_rows = parse_xlsx_bytes(bytes(first[0][0]), sheet)
        if not head_rows:
            raise ValueError(f"empty worksheet in first file at {path!r}")
        raw = [
            (
                re.sub(r"[^0-9A-Za-z_]", "_", h)
                if h not in (None, "")
                else f"_c{i}"
            )
            for i, h in enumerate(head_rows[0])
        ]
        columns, taken = [], set()
        for c in raw:
            if c[0].isdigit():
                c = f"_{c}"
            # probe until free (pandas-style): a minted 'url_2' must
            # not collide with a literal 'url_2' header elsewhere
            name, k = c, 1
            while name in taken:
                k += 1
                name = f"{c}_{k}"
            taken.add(name)
            columns.append(name)
    cols = list(columns)
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate column names: {cols}")
    skip_header = header
    schema = ", ".join(f"{c} string" for c in cols)
    n = len(cols)

    def parse(batches):
        for pdf in batches:
            out = {c: [] for c in cols}
            for blob in pdf["content"]:
                if len(blob) > max_bytes:
                    raise ValueError(
                        f"xlsx file exceeds max_bytes={max_bytes}"
                    )
                rows = parse_xlsx_bytes(bytes(blob), sheet)
                for r in rows[1:] if skip_header else rows:
                    padded = (list(r) + [None] * n)[:n]
                    for c, v in zip(cols, padded):
                        out[c].append(v)
            yield pd.DataFrame(out, dtype=object)

    return bins.select("content").mapInPandas(parse, schema)


def seeds_from_xlsx(
    spark: SparkSession, path: str, sheet: str | None = None
) -> DataFrame:
    """The reference's seed projection: ``(url, ID)`` from the seed
    workbook (run.py reads ``df.url`` / ``df.ID``), as
    ``(url string, id long)`` ready for the frontier's seed
    normalization. Rows with a NULL url are dropped (blank trailing
    spreadsheet rows)."""
    df = read_xlsx(spark, path, sheet)
    lower = {c.lower(): c for c in df.columns}
    for need in ("url", "id"):
        if need not in lower:
            raise ValueError(
                f"seed workbook needs url/ID columns, has {df.columns}"
            )
    return df.select(
        F.col(lower["url"]).alias("url"),
        # Excel stores integers as '7' or '7.0' depending on the
        # writer — accept both
        F.col(lower["id"]).cast("double").cast("long").alias("id"),
    ).where(F.col("url").isNotNull())
