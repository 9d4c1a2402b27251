"""Distributed BPE (byte-pair-encoding) merge training — the
tokenizer-induction stage of a training-data pipeline (Sennrich et
al. 2016). Learns the top-``n_merges`` merge rules from corpus word
frequencies.

Why this shape scales: classic BPE trains on the WORD-FREQUENCY
table, not the raw corpus — so the corpus is touched exactly once
(one explode+groupBy to count words) and every merge round runs over
the bounded vocabulary frame (distinct words; corpus-sublinear, ~10⁷
rows even at 100 TB of webtext). Per round:

* pair counts — one array-local ``zip_with`` pairing (no window, no
  per-word shuffle) weighted by word count, then one equi-key groupBy;
  integer sums, so results are exact and engine-portable;
* the argmax pair — ``orderBy(count desc, left, right).limit(1)``
  (a ``TakeOrderedAndProject``) collected as ONE row to the driver —
  the only driver traffic is ``n_merges`` scalar rows;
* merge application — an array-local string fold (see below), again
  no shuffle.

The vocabulary frame is ``localCheckpoint``-ed every round: it is
small, and truncating lineage keeps round ``r``'s plan from nesting
``r`` copies of the fold expression (the same move the pointer-doubling
redirect resolver makes).

The merge-application fold: BPE's left-to-right greedy merge of the
pair ``(a, b)`` is a fold over the symbol list whose accumulator is
the U+001F-joined output symbols — when the accumulator's LAST symbol
is exactly ``a`` and the next input symbol is ``b``, appending ``b``
directly (no separator) IS the merge; otherwise append with a
separator. The string accumulator matters because DuckDB's
``list_reduce`` requires the accumulator to have the element type —
so the SAME fold runs verbatim in the DuckDB oracle, which unrolls
``n_merges`` rounds as chained CTEs and value-checks every rule.
Run-parity is handled by construction: after a merge the last symbol
becomes ``a||b``, which no longer equals ``a``, so ``a a a`` merges
to ``[aa, a]`` — the textbook left-to-right behaviour. Words
containing U+001F are dropped up front (both engines), since the
separator must never occur inside a symbol.

Ties on the argmax pair break by (left asc, right asc) — fully
deterministic, and the integer pair counts make cross-engine rank
flips impossible.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame, functions as F

SEP = "\x1f"


def _char_symbols(word):
    """Initial symbolization: one symbol per character (mirrors the
    oracle's substr enumeration — engine-portable, unlike split(''))."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substr(word, i, F.lit(1)),
    )


def _apply_merge(syms, left: str, right: str):
    """Left-to-right greedy merge of (left, right) over a symbol
    array, as the string fold described in the module docstring.
    Single-symbol words return unchanged (fold over an empty tail)."""
    init = F.element_at(syms, 1)
    tail = F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0)))
    folded = F.aggregate(
        tail,
        init,
        lambda acc, x: F.when(
            ((acc == F.lit(left))
             | acc.endswith(F.lit(SEP + left)))
            & (x == F.lit(right)),
            F.concat(acc, x),
        ).otherwise(F.concat(acc, F.lit(SEP), x)),
    )
    return F.split(folded, SEP)


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The single corpus pass: whitespace-token counts of the
    lowercased text. Words containing the fold separator are dropped
    (see module docstring)."""
    from .text import words_col

    return (
        docs.select(F.explode(words_col(F.col(text_col))).alias("w"))
        .where(~F.col("w").contains(SEP))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _train_loop(
    docs: DataFrame, text_col: str, n_merges: int
) -> Tuple[List[Tuple[int, str, str, int]], DataFrame]:
    """Shared training loop: returns the learned rules and the
    vocabulary frame ``(w, cnt, g)`` with ALL ``n_merges`` applied."""
    vocab = word_counts(docs, text_col).select(
        "w", "cnt", _char_symbols(F.col("w")).alias("g")
    ).localCheckpoint(eager=False)

    rules: List[Tuple[int, str, str, int]] = []
    for idx in range(1, n_merges + 1):
        pairs = (
            vocab.select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("g"), 1,
                                F.greatest(F.size("g") - 1, F.lit(0))),
                        F.slice(F.col("g"), 2,
                                F.greatest(F.size("g") - 1, F.lit(0))),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("c"))
        )
        best = pairs.orderBy(F.desc("c"), "a", "b").limit(1).collect()
        if not best:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        rules.append((idx, a, b, c))
        vocab = vocab.select(
            "w", "cnt", _apply_merge(F.col("g"), a, b).alias("g")
        ).localCheckpoint(eager=False)
    return rules, vocab


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules; returns one row per rule:
    ``(merge_idx, lhs, rhs, merged, pair_count)`` in training
    order. Stops early if the vocabulary runs out of adjacent pairs
    (every word fully merged) — the contract corpus never does.
    """
    spark = docs.sparkSession
    rules, _ = _train_loop(docs, text_col, n_merges)
    return spark.createDataFrame(
        [(i, a, b, a + b, c) for (i, a, b, c) in rules],
        "merge_idx long, lhs string, rhs string, "
        "merged string, pair_count long",
    )


def bpe_encode_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 8,
) -> DataFrame:
    """Train ``n_merges`` merges, then tokenize every document with
    them and report per-doc ``(n_words, n_chars, n_syms,
    compression)`` where ``compression = n_chars / n_syms`` — the
    tokenizer-fertility readout that tells you whether a merge budget
    is worth its vocab slots.

    The encode path is the SCALABLE one: documents are never
    re-segmented token by token. The trainer already holds the
    segmentation of every distinct word (the vocabulary frame after
    the final merge), so encoding is explode(words) → equi-join on
    the word → per-doc sum of symbol counts. The vocab side stays a
    shuffle join (webtext vocabularies don't broadcast at 100 TB);
    words containing the fold separator are excluded on BOTH sides,
    mirroring training. Docs with no tokens drop out (inner join
    after explode), exactly as in the oracle."""
    _, vocab = _train_loop(docs, text_col, n_merges)
    from .text import words_col

    toks = docs.select(
        F.col(id_col), F.explode(words_col(F.col(text_col))).alias("w")
    ).where(~F.col("w").contains(SEP))
    return (
        toks.join(vocab.select("w", F.size("g").alias("_ns")), "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).alias("n_chars"),
            F.sum("_ns").alias("n_syms"),
        )
        .select(
            id_col,
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("n_syms").cast("long").alias("n_syms"),
            F.round(F.col("n_chars") / F.col("n_syms"), 6).alias(
                "compression"
            ),
        )
    )


def _rounds_cte(source_sql: str, n_merges: int,
                with_final_vocab: bool) -> List[str]:
    """The shared unrolled-CTE prefix: ``n_merges`` rounds of pair
    counts, deterministic argmax, and the string-fold merge applied
    via ``list_reduce`` — the verbatim DuckDB twin of
    :func:`_apply_merge`."""
    parts = [
        f"WITH wc AS ({source_sql}),",
        "vocab0 AS (SELECT w, cnt,"
        " list_transform(range(1, length(w) + 1),"
        " i -> substr(w, CAST(i AS INT), 1)) AS g FROM wc)",
    ]
    for r in range(1, n_merges + 1):
        parts.append(
            f", pairs{r} AS (SELECT g[CAST(j AS INT)] AS a,"
            f" g[CAST(j + 1 AS INT)] AS b, sum(cnt) AS c"
            f" FROM vocab{r - 1}, UNNEST(range(1, len(g))) AS t(j)"
            f" GROUP BY 1, 2)"
        )
        parts.append(
            f", best{r} AS (SELECT a, b, c FROM pairs{r}"
            f" ORDER BY c DESC, a, b LIMIT 1)"
        )
        if r < n_merges or with_final_vocab:
            parts.append(
                f", vocab{r} AS (SELECT w, cnt, string_split("
                f"list_reduce(g, (acc, x) -> CASE WHEN"
                f" (acc = b.a OR ends_with(acc, chr(31) || b.a))"
                f" AND x = b.b THEN acc || x"
                f" ELSE acc || chr(31) || x END), chr(31)) AS g"
                f" FROM vocab{r - 1} CROSS JOIN best{r} b)"
            )
    return parts


def bpe_oracle_sql(
    source_sql: str,
    n_merges: int = 8,
) -> str:
    """Build the DuckDB oracle for :func:`bpe_train`.
    ``source_sql`` must select columns ``(w, cnt)``. Lives here (not
    in ``__spark_entry__``) so the fold expression and its Spark twin
    stay side-by-side."""
    parts = _rounds_cte(source_sql, n_merges, with_final_vocab=False)
    selects = [
        f"SELECT CAST({r} AS BIGINT) AS merge_idx, a AS lhs, b AS rhs,"
        f" a || b AS merged, CAST(c AS BIGINT) AS pair_count"
        f" FROM best{r}"
        for r in range(1, n_merges + 1)
    ]
    parts.append(" " + " UNION ALL ".join(selects) + " ORDER BY merge_idx")
    return "\n".join(parts)


def bpe_encode_oracle_sql(
    source_sql: str,
    tok_sql: str,
    n_merges: int = 8,
) -> str:
    """DuckDB oracle for :func:`bpe_encode_stats`: the same unrolled
    training rounds INCLUDING the final vocabulary, then the
    token→vocab equi-join and per-doc fertility aggregate.
    ``tok_sql`` must select ``(doc_id, w)`` token occurrences
    (duplicates kept, separator-words excluded)."""
    parts = _rounds_cte(source_sql, n_merges, with_final_vocab=True)
    parts.append(f", tok AS ({tok_sql})")
    parts.append(
        f" SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,"
        f" CAST(sum(length(t.w)) AS BIGINT) AS n_chars,"
        f" CAST(sum(len(v.g)) AS BIGINT) AS n_syms,"
        f" round(sum(length(t.w)) / sum(len(v.g)), 6) AS compression"
        f" FROM tok t JOIN vocab{n_merges} v ON t.w = v.w"
        f" GROUP BY t.doc_id ORDER BY t.doc_id"
    )
    return "\n".join(parts)


def bpe_fertility_by_lang(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 8,
) -> DataFrame:
    """Tokenizer fertility audit BY LANGUAGE — the multilingual-corpus
    health check: a tokenizer trained on a skewed mixture over-segments
    the minority languages, and fertility (BPE symbols per word) is
    the number that shows it before a training run wastes sequence
    budget. Same segmented-vocab equi-join as
    :func:`bpe_encode_stats` (documents never re-folded), rolled up
    per ``lang_col`` instead of per doc.

    Output: ``(lang, n_docs, n_words, n_chars, n_syms, fertility,
    compression)`` — fertility = syms/word, compression = chars/sym.
    """
    _, vocab = _train_loop(docs, text_col, n_merges)
    from .text import words_col

    toks = docs.select(
        F.col(id_col),
        F.col(lang_col).alias("lang"),
        F.explode(words_col(F.col(text_col))).alias("w"),
    ).where(~F.col("w").contains(SEP))
    return (
        toks.join(vocab.select("w", F.size("g").alias("_ns")), "w")
        .groupBy("lang")
        .agg(
            F.countDistinct(id_col).cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
            F.sum("_ns").cast("long").alias("n_syms"),
            F.round(F.sum("_ns") / F.count(F.lit(1)), 6).alias(
                "fertility"
            ),
            F.round(F.sum(F.length("w")) / F.sum("_ns"), 6).alias(
                "compression"
            ),
        )
    )


def bpe_fertility_oracle_sql(
    source_sql: str,
    tok_sql: str,
    n_merges: int = 8,
) -> str:
    """DuckDB oracle for :func:`bpe_fertility_by_lang`. ``tok_sql``
    must select ``(doc_id, lang, w)`` token occurrences (duplicates
    kept, separator-words excluded)."""
    parts = _rounds_cte(source_sql, n_merges, with_final_vocab=True)
    parts.append(f", tok AS ({tok_sql})")
    parts.append(
        f" SELECT t.lang,"
        f" CAST(count(DISTINCT t.doc_id) AS BIGINT) AS n_docs,"
        f" CAST(count(*) AS BIGINT) AS n_words,"
        f" CAST(sum(length(t.w)) AS BIGINT) AS n_chars,"
        f" CAST(sum(len(v.g)) AS BIGINT) AS n_syms,"
        f" round(sum(len(v.g)) / count(*), 6) AS fertility,"
        f" round(sum(length(t.w)) / sum(len(v.g)), 6) AS compression"
        f" FROM tok t JOIN vocab{n_merges} v ON t.w = v.w"
        f" GROUP BY t.lang ORDER BY t.lang"
    )
    return "\n".join(parts)
