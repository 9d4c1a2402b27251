from .catalog import Catalog
from .robots import robots_table
from .warc import parse_warc, read_warc, warc_pages
from .sitemap import (
    expand_sitemap_index,
    parse_sitemaps,
    revisit_schedule,
    sitemap_seeds,
)
from .swde import (
    swde_eval_table,
    swde_ground_truth,
    swde_pages,
    truth_values_long,
)

__all__ = [
    "Catalog",
    "expand_sitemap_index",
    "parse_sitemaps",
    "parse_warc",
    "read_warc",
    "revisit_schedule",
    "robots_table",
    "sitemap_seeds",
    "warc_pages",
    "swde_eval_table",
    "swde_ground_truth",
    "swde_pages",
    "truth_values_long",
]
