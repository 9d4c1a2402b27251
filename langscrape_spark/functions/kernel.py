"""Arrow-vectorized pandas UDFs wrapping the pure-Python HTML kernel.

This is the engine's entire Python-side surface (SURVEY.md §2.12): all
UDFs are **map-only** — every shuffle (joins, windows, repartitions)
stays in the JVM. No row-at-a-time ``udf()`` anywhere (north-rule
input hint: "no per-row Python" at the Spark API level — the batch
functions below receive whole Arrow batches as pandas Series).

The XPath field-map is tiny (a handful of fields); it is serialized
into the UDF closure, which Spark ships once per executor — the
moral equivalent of a broadcast for kilobyte-sized plans.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from ..html.clean import clean_html_for_extraction
from ..html.extract import extract_by_xpath_map
from ..html.links import extract_links, normalize_url, url_host
from ..html.textify import html_to_text, pdf_text_normalizer

__all__ = [
    "clean_html_udf",
    "extract_links_udf",
    "html_to_text_udf",
    "make_extract_fields_udf",
    "pdf_text_udf",
    "normalize_url_udf",
    "url_host_udf",
]


def _to_str(value: Any) -> str:
    """Decode the ``html`` binary column; crawl data is utf-8-with-junk,
    so errors are replaced, never raised (a poison row must not kill an
    Arrow batch)."""
    if value is None:
        return ""
    if isinstance(value, (bytes, bytearray)):
        return bytes(value).decode("utf-8", errors="replace")
    return str(value)


@pandas_udf(StringType())
def clean_html_udf(html: pd.Series) -> pd.Series:
    """``clean_html_for_extraction3`` semantics per row
    (reference langscrape/html/utils.py:91-103)."""
    return html.map(lambda v: clean_html_for_extraction(_to_str(v)))


@pandas_udf(StringType())
def html_to_text_udf(html: pd.Series) -> pd.Series:
    """Derives the ``text`` column from ``html``
    (reference feilian/text_tools.py:6-48 composition)."""
    return html.map(lambda v: html_to_text(_to_str(v)))


def make_clean_extract_udf(field_map: Dict[str, Dict[str, Any]]):
    """Fused kernel: ``html:binary -> struct<cleaned:string,
    extracted:map<string,array<string>>>`` in ONE Arrow crossing.

    Semantically identical to ``clean_html_udf`` followed by
    ``make_extract_fields_udf`` (the extractor still operates on the
    *cleaned string*, reference langscrape/html/xpath_extractor.py:57),
    but halves the JVM↔Python serialization: with two chained UDFs the
    raw html crosses to Python, the cleaned html crosses back to the
    JVM only to immediately cross into Python again. At 32 cores that
    JVM-side Arrow traffic competes with the Python workers for the
    same cores and caps scaling."""
    frozen = {k: dict(v) for k, v in field_map.items()}
    out_type = StructType(
        [
            StructField("cleaned", StringType()),
            StructField(
                "extracted", MapType(StringType(), ArrayType(StringType()))
            ),
        ]
    )

    @pandas_udf(out_type)
    def clean_extract_udf(html: pd.Series) -> pd.DataFrame:
        cleaned = html.map(lambda v: clean_html_for_extraction(_to_str(v)))
        extracted = cleaned.map(lambda v: extract_by_xpath_map(v, frozen))
        return pd.DataFrame({"cleaned": cleaned, "extracted": extracted})

    return clean_extract_udf


def make_extract_fields_udf(field_map: Dict[str, Dict[str, Any]]):
    """Returns a pandas UDF ``cleaned:string -> map<string,array<string>>``
    with ``field_map`` captured in the closure (shipped once per
    executor). Sentinel contract per reference
    langscrape/html/xpath_extractor.py:47-87."""
    # Freeze to plain dicts so the closure pickles small and stable.
    frozen = {k: dict(v) for k, v in field_map.items()}

    @pandas_udf(MapType(StringType(), ArrayType(StringType())))
    def extract_fields_udf(cleaned: pd.Series) -> pd.Series:
        return cleaned.map(lambda v: extract_by_xpath_map(_to_str(v), frozen))

    return extract_fields_udf


@pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """Out-link harvest for frontier expansion (SURVEY.md §2.12)."""
    return pd.Series(
        [
            extract_links(_to_str(h), u if isinstance(u, str) else "")
            for h, u in zip(html, base_url)
        ]
    )


@pandas_udf(StringType())
def pdf_text_udf(body: pd.Series) -> pd.Series:
    """PDF → text route (reference langscrape/pdf/pdf_utils.py:22-34).

    pymupdf is not available in this environment; the *plumbing*
    (binary column in → normalized text out, ``when(endswith(url,
    '.pdf'))`` routing) is real, the decode step is a deterministic
    fallback: latin-1-decode printable bytes then apply the reference's
    ``text_normalizer``. Swap ``_decode`` for pymupdf in production."""

    def _decode(v: Any) -> str:
        if v is None:
            return ""
        raw = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
        try:  # pragma: no cover - exercised only where pymupdf exists
            import pymupdf  # type: ignore

            doc = pymupdf.open(stream=raw, filetype="pdf")
            text = " ".join(page.get_text() for page in doc)
        except Exception:
            text = raw.decode("latin-1", errors="replace")
            text = "".join(c for c in text if c.isprintable() or c.isspace())
        return pdf_text_normalizer(text)

    return body.map(_decode)


@pandas_udf(StringType())
def normalize_url_udf(url: pd.Series) -> pd.Series:
    """Canonical URL for seen-set identity (html/links.py)."""
    return url.map(lambda u: normalize_url(u) if isinstance(u, str) else None)


@pandas_udf(StringType())
def url_host_udf(url: pd.Series) -> pd.Series:
    return url.map(lambda u: url_host(u) if isinstance(u, str) else None)


def is_pdf_col(url_col):
    """``_is_pdf`` (reference langscrape/nodes/url_handler.py:25-26) as
    a JVM-side expression — no Python needed."""
    return F.endswith(F.lower(url_col), F.lit(".pdf"))


def valid_url_col(url_col):
    """``validate_url`` (reference langscrape/nodes/url_handler.py:19-23)
    as a JVM-side predicate: scheme and netloc must both parse.
    ``try_parse_url``, never ``parse_url``: under ANSI mode (Spark 4
    default) the latter *throws* on exactly the malformed urls this
    predicate exists to flag."""
    return (
        F.try_parse_url(url_col, F.lit("HOST")).isNotNull()
        & url_col.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    )
