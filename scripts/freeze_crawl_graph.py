#!/usr/bin/env python3
"""Freeze the synthetic crawl GRAPH (not the crawl result) that backs
the q210 crawl+dedup integration oracle.

q210 composes the two independently-proven machines end-to-end: a
run_crawl() to frontier exhaustion, each round's fetched batch flowing
through minhash_ingest_round.  Its oracle must derive the expected
answer WITHOUT either machine: a recursive-CTE BFS closure over the
raw link graph (who links to whom, which hosts robots allow) followed
by the q10-proven full-corpus MinHash derivation over the closure's
texts.  DuckDB cannot parse HTML and the synth generator is
blake2b-seeded (not reproducible in SQL), so this script freezes the
generator's INPUT-side facts — page id, url, host, rendered text, and
out-link targets — straight from ``langscrape_spark.synth``.  Nothing
from the scheduler or dedup operators touches this file: the oracle's
reachability and pair derivations stay independent of the code under
test.

Re-run after any intentional synth-generator change:
    python scripts/freeze_crawl_graph.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)

# Must match q210_crawl_dedup's corpus size (the graph is a function
# of n_pages: link targets are taken mod n_pages).
N_PAGES = 512


def main() -> None:
    import pandas as pd

    from langscrape_spark import synth

    rows = []
    for i in range(N_PAGES):
        rec = synth.page_record(i, N_PAGES)
        rows.append(
            {
                "page_id": i,
                "url": rec["url"],
                "host": synth.host_of(i),
                "text": rec["text"],
                "out_ids": synth.out_link_ids(i, N_PAGES),
            }
        )
    pdf = pd.DataFrame(rows)
    os.makedirs(FIXDIR, exist_ok=True)
    out = os.path.join(FIXDIR, "q210_crawl_graph.parquet")
    pdf.to_parquet(out, index=False)
    print(f"wrote {out}: {len(pdf)} pages")


if __name__ == "__main__":
    main()
