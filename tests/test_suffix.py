"""Suffix-array prefix doubling vs a literal Python suffix sort.

The operator never materializes the corpus string nor compares a
string; these tests pin it against the definition — sorted suffixes
of the exact same md5-ordered, chr(1)-terminated corpus — plus the
edge cases (empty/NULL docs, single doc, repeated-gram attribution).
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from langscrape_spark.operators.suffix import (
    repeated_grams,
    suffix_array,
)

MAXC = 40

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs, THE QUICK!"),
    (2, ""),
    (3, "aaa aaa aaa bbb"),
    (4, None),
    (5, "the quick brown fox strikes again and again and again"),
    (6, "zz9 09 numbers 123 and the quick brown fox"),
]


def _norm(t):
    if t is None:
        return ""
    return re.sub(r"[^a-z0-9 ]", "", t.lower())[:MAXC]


def _corpus(rows):
    """(corpus string, {gpos: (doc_id, pos_in_doc)}) in md5 layout
    order — the exact layout corpus_positions computes."""
    key = lambda i: hashlib.md5(f"s:{i}".encode()).hexdigest()
    ordered = sorted(rows, key=lambda r: key(r[0]))
    corpus, pos_doc = "", {}
    for i, t in ordered:
        s = _norm(t)
        start = len(corpus)
        for p in range(len(s) + 1):
            pos_doc[start + p + 1] = (i, p + 1)
        corpus += s + "\x01"
    return corpus, pos_doc


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_suffix_array_matches_literal_sort(docs_df):
    corpus, pos_doc = _corpus(DOCS)
    n = len(corpus)
    sa = sorted(range(1, n + 1), key=lambda i: corpus[i - 1:])
    rank_of = {gpos: r + 1 for r, gpos in enumerate(sa)}
    out = suffix_array(docs_df, max_chars=MAXC).collect()
    assert len(out) == n
    for row in out:
        assert rank_of[row.gpos] == row.sa_rank
        assert pos_doc[row.gpos] == (row.doc_id, row.pos_in_doc)


def test_suffix_array_single_and_empty(spark):
    one = spark.createDataFrame([(7, "abab")], "doc_id long, text string")
    got = {
        r.gpos: r.sa_rank for r in suffix_array(one, max_chars=8).collect()
    }
    # corpus = "abab\x01": suffixes sorted: 5:"\x01", 3:"ab\x01",
    # 1:"abab\x01", 4:"b\x01", 2:"bab\x01"
    assert got == {5: 1, 3: 2, 1: 3, 4: 4, 2: 5}
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert suffix_array(empty).count() == 0


def test_repeated_grams_match_literal_grouping(docs_df):
    corpus, pos_doc = _corpus(DOCS)
    G = 8
    groups = defaultdict(list)
    for gpos, (doc, p) in pos_doc.items():
        # eligibility: gram fully inside the document
        doc_len = max(
            q for g2, (d2, q) in pos_doc.items() if d2 == doc
        ) - 1
        if p + G - 1 <= doc_len:
            groups[corpus[gpos - 1 : gpos - 1 + G]].append((gpos, doc))
    expect = sorted(
        (min(g for g, _ in v), len(v), len({d for _, d in v}))
        for v in groups.values()
        if len(v) >= 2
    )
    got = sorted(
        (r.min_gpos, r.n_occ, r.n_docs)
        for r in repeated_grams(docs_df, gram_chars=G, max_chars=MAXC).collect()
    )
    assert expect == got
    assert got, "fixture must actually contain repeated grams"


def test_repeated_grams_rejects_non_power_of_two(docs_df):
    with pytest.raises(ValueError):
        repeated_grams(docs_df, gram_chars=12)
