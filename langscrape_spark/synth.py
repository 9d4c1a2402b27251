"""Deterministic synthetic Common-Crawl-style corpus generator.

Produces the engine's input tables (FIXTURES.md §1-5) with no external
data and no RNG state — every artifact is a pure function of
``(page_id, n_pages, seed)``, so any row can be regenerated anywhere
(driver, executor, test process) and compare byte-identical. That is
what lets the bench generate 100k+ pages *distributed* via
``mapInPandas`` instead of on the driver: at 10^10-URL scale a
driver-side generator is a non-starter.

Corpus properties (FIXTURES.md §1):
- skewed host distribution: host 0 receives ~30% of pages (exercises
  politeness salting);
- in-HTML link graph (hrefs) for frontier expansion, deterministic
  per page, mixing same-host and cross-host edges;
- junk the cleaner must remove: script/style/nav ads, comments,
  ``javascript:`` hrefs, empty divs, ``display:none`` blocks;
- HTML entities from the ``normalize_text`` table and (for some pages)
  control characters;
- a ``text`` column derived by this engine's own ``html_to_text`` —
  the byte-identity target for ``html_to_text_udf``.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone
from typing import Dict, Iterator, List

import pandas as pd

from .html.textify import html_to_text

N_HOSTS = 20
HOT_HOST_SHARE = 10  # ids with id % 32 < 10 → host 0 (~31%)
_BASE_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)

_AUTHORS = ["Jane Doe", "John Smith", "Ada Lovelace", "Alan Turing", "Grace Hopper"]
_SECTIONS = ["news", "tech", "sport", "culture", "science"]
_LANGS = ["en", "he", "fr", "de"]
_WORDS = (
    "the quick brown fox jumps over a lazy dog while seventeen crawlers "
    "politely fetch pages from distant hosts under robots rules"
).split()


def _h(page_id: int, salt: str) -> int:
    """Stable 64-bit hash — deterministic across processes (unlike
    Python's salted ``hash``)."""
    d = hashlib.blake2b(f"{salt}:{page_id}".encode(), digest_size=8).digest()
    return int.from_bytes(d, "big")


def host_of(page_id: int) -> str:
    if page_id % 32 < HOT_HOST_SHARE:
        idx = 0
    else:
        idx = 1 + _h(page_id, "host") % (N_HOSTS - 1)
    return f"www.site{idx}.example"


def url_of(page_id: int) -> str:
    section = _SECTIONS[_h(page_id, "sec") % len(_SECTIONS)]
    return f"https://{host_of(page_id)}/{section}/article-{page_id:08d}.html"


def out_link_ids(page_id: int, n_pages: int, fanout: int = 8) -> List[int]:
    """Deterministic link graph: mixes near (same-host-ish) and far
    (cross-host) edges; no self-links."""
    ids = []
    for k in range(fanout):
        tgt = (_h(page_id, f"link{k}") + page_id * 31 + k * 7) % n_pages
        if tgt != page_id and tgt not in ids:
            ids.append(tgt)
    return ids


def _sentence(page_id: int, j: int, n: int = 12) -> str:
    base = _h(page_id, f"s{j}")
    return " ".join(_WORDS[(base + i * 13) % len(_WORDS)] for i in range(n)).capitalize() + "."


def page_html(page_id: int, n_pages: int) -> str:
    author = _AUTHORS[_h(page_id, "auth") % len(_AUTHORS)]
    date = (_BASE_TS + timedelta(days=_h(page_id, "day") % 365)).strftime("%Y-%m-%d")
    title = f"Article {page_id:08d}: {_sentence(page_id, 0, 5)[:-1]}"
    paras = "".join(
        f"<p>{_sentence(page_id, j + 1, 18)}</p>" for j in range(3 + page_id % 4)
    )
    links = "".join(
        f'<a href="{url_of(t)}">related {t:08d}</a> '
        for t in out_link_ids(page_id, n_pages)
    )
    entity_bits = "Fish &amp; Chips &ndash; caf&eacute; &frac12; price" if page_id % 3 == 0 else "plain"
    ctrl = "\x0b" if page_id % 17 == 0 else ""
    hidden = '<div style="display:none">tracking pixel text</div>' if page_id % 5 == 0 else ""
    repeated = "".join(
        f'<div class="promo-item"><span>promo {k}</span></div>' for k in range(3)
    )
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title>"
        '<meta charset="utf-8"/><script>var t=window.track&&track();</script>'
        "<style>.x{color:#000}</style></head><body>"
        '<nav id="topnav"><a href="javascript:void(0)">home</a>'
        '<a href="/subscribe">subscribe</a></nav>'
        "<!-- rendered by synthgen -->"
        f'<div class="article" id="main">'
        f'<h1 class="headline">{title}</h1>'
        f'<span class="author">{author}</span>'
        f'<time datetime="{date}">{date}</time>'
        f'<div class="body">{paras}</div>'
        f"<p>{entity_bits}{ctrl}</p>"
        f'<div class="related">{links}</div>'
        "</div>"
        f"{hidden}{repeated}"
        '<div class="empty"><span>  </span></div>'
        f'<footer><a href="https://{host_of(page_id)}/about">about</a></footer>'
        "</body></html>"
    )


FIELD_MAP: Dict[str, Dict[str, str]] = {
    # Mirrors the reference's configured fields
    # (/root/reference/config/default_config.yaml:23-31) with concrete
    # xpaths over the *cleaned* HTML (datetime attr is stripped by the
    # cleaner's attr whitelist, so the text of <time> is the target).
    "title": {"strategy": "xpath_extractor", "xpath": "//h1[@class='headline']"},
    "author": {"strategy": "xpath_extractor", "xpath": "//span[@class='author']"},
    "datetime": {"strategy": "xpath_extractor", "xpath": "//time"},
    "article_body": {"strategy": "xpath_extractor", "xpath": "//div[@class='body']/p"},
}


def page_record(page_id: int, n_pages: int) -> Dict:
    html = page_html(page_id, n_pages)
    return {
        "url": url_of(page_id),
        "warc_ts": _BASE_TS + timedelta(seconds=int(_h(page_id, "ts") % 86400) + page_id),
        "html": html.encode("utf-8"),
        "text": html_to_text(html),
        "lang": _LANGS[_h(page_id, "lang") % len(_LANGS)],
    }


def pages_pdf(page_ids: List[int], n_pages: int) -> pd.DataFrame:
    return pd.DataFrame([page_record(i, n_pages) for i in page_ids])


# --------------------------------------------------------------------------
# Spark-side distributed generation
# --------------------------------------------------------------------------

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def build_pages_df(spark, n_pages: int, partitions: int = 32):
    """Distributed corpus: ``spark.range`` → ``mapInPandas``. Each
    partition generates its own rows from pure functions — zero driver
    memory, arbitrarily scalable."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pages_pdf(pdf["id"].tolist(), n_pages)

    return (
        spark.range(0, n_pages, 1, partitions)
        .mapInPandas(gen, schema=PAGES_DDL)
    )


def seeds_df(spark, n_pages: int, n_seeds: int = 20, partitions: int = 8):
    """Seed frontier (FIXTURES.md §2): evenly spaced page urls plus a
    couple of invalid / pdf URLs to exercise validate/route paths.

    Generated distributed (``spark.range`` → ``mapInPandas``) like the
    pages table: a driver-side ``createDataFrame`` of pickled rows
    fans out into one tiny python-RDD task per core, whose fixed
    serialization cost *grows* with core count — measurable even at
    16k seeds, fatal at a 10^10-url production seed list."""
    stride = max(1, n_pages // n_seeds)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            rows = [(url_of(i * stride), f"seed-{i}", 0) for i in ids]
            if 0 in ids:  # the invalid/pdf probes ride with partition 0
                rows.append(("not a url", "seed-bad", 0))
                rows.append(("ftp://site.example/x", "seed-ftp", 0))
                rows.append((f"https://{host_of(0)}/docs/report.pdf", "seed-pdf", 0))
            yield pd.DataFrame(rows, columns=["url", "id", "depth"])

    num_parts = max(1, min(partitions, n_seeds // 64))
    return (
        spark.range(0, n_seeds, 1, num_parts)
        .mapInPandas(gen, schema="url string, id string, depth int")
    )


def robots_df(spark):
    """Per-host politeness rules (FIXTURES.md §4). site19 is fully
    disallowed; the hot host gets a tight crawl budget."""
    rows = []
    for idx in range(N_HOSTS):
        host = f"www.site{idx}.example"
        rows.append(
            (
                host,
                ["/private/", "/admin/"],
                2.0 if idx == 0 else 0.5,
                idx != 19,
            )
        )
    return spark.createDataFrame(
        rows,
        "host string, disallow_prefixes array<string>, crawl_delay double, allowed boolean",
    )


def host_rank_df(spark):
    rows = [(f"www.site{idx}.example", round(1.0 - idx * 0.04, 4)) for idx in range(N_HOSTS)]
    return spark.createDataFrame(rows, "host string, rank double")
