"""Text-analysis operators over a document/page corpus — all pure
JVM column expressions (whole-stage codegen; no Python in the hot
path). These extend the reference's per-record text handling
(SURVEY.md §2.10) with the corpus-scale operators a training-data
pipeline needs: language-ID, quality scoring, token counting, document
fingerprinting.

Determinism note: everything is md5/regexp/arithmetic on columns, so
results are identical across engines — each operator has a DuckDB
oracle in ``__spark_entry__.py``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

# Per-language stopword lists (public common words; Latin-script
# languages). Heuristic n-gram/stopword language ID per SURVEY's
# text-analysis mandate. Scores are exact-token hits on the
# lowercased whitespace tokens.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "fr": ["le", "la", "les", "de", "des", "et", "en", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "es": ["el", "los", "las", "una", "por", "con", "para", "como", "pero", "más"],
    "pt": ["não", "uma", "para", "com", "por", "mais", "como", "dos", "das", "ele"],
    "it": ["il", "di", "che", "per", "con", "non", "del", "della", "gli", "sono"],
    "nl": ["het", "een", "van", "dat", "niet", "aan", "voor", "met", "zijn", "ook"],
}

# Script-based languages: stopword tokens don't transfer across
# scripts, so the score is the count of characters in the script's
# (BMP-only) unicode range — portable between Java regex and RE2, and
# char counts compare sanely against token-hit counts in the argmax
# (a doc must contain MORE script chars than it has Latin stopword
# hits to win). Kanji-only Japanese text scores as zh (kanji live in
# the CJK block); kana pushes it to ja — a documented heuristic limit.
CHAR_CLASSES = {
    "ru": "Ѐ-ӿ",  # Cyrillic
    "ar": "؀-ۿ",  # Arabic
    "zh": "一-鿿",  # CJK unified ideographs
    "ja": "぀-ヿ",  # Hiragana + Katakana
}

# BPE-ish word/number/punct tokenizer (simple enough to behave the same
# under Java regex and RE2-style engines).
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words_col(text: Column) -> Column:
    """Whitespace tokens, empty-safe (split('') yields [''] — filter)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def token_count(text: Column) -> Column:
    """Regex token count (BPE-ish surrogate)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0)))


def lang_scores(text: Column) -> dict:
    w = words_col(text)
    scores = {
        lang: F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in sw])))
        for lang, sw in STOPWORDS.items()
    }
    for lang, rng in CHAR_CLASSES.items():
        scores[lang] = F.length(F.regexp_replace(text, f"[^{rng}]", ""))
    return scores


def lang_id(text: Column) -> Column:
    """argmax of stopword hits; ties broken by language code ascending;
    no hits at all → 'und' (undetermined)."""
    scores = lang_scores(text)
    pairs = [
        F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
        for lang in sorted(scores)
    ]
    # array_max on struct compares score first, then lang — we want ties
    # to pick the *smallest* lang code, so compare (score, reversed lang)
    # is overkill: instead sort desc by score then asc by lang manually.
    best = F.aggregate(
        F.array(*pairs),
        F.struct(F.lit(-1).alias("score"), F.lit("und").alias("lang")),
        lambda acc, x: F.when(x["score"] > acc["score"], x).otherwise(acc),
    )
    return F.when(best["score"] <= 0, F.lit("und")).otherwise(best["lang"])


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality metrics per document: length, whitespace-token count,
    alpha/punct/upper ratios, stopword ratio, mean word length — the
    standard webtext quality filters."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_ws_tokens = F.size(words_col(t))
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?\"'()\[\]-]", ""))
    n_upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    en_hits = F.size(
        F.array_intersect(
            words_col(t), F.array(*[F.lit(s) for s in STOPWORDS["en"]])
        )
    )
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_tokens", n_ws_tokens)
        .withColumn(
            "alpha_ratio",
            F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "upper_ratio",
            F.when(n_chars > 0, n_upper / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_hits", en_hits.cast("int")
        )
        .withColumn(
            "mean_word_len",
            F.when(n_ws_tokens > 0, n_alpha / n_ws_tokens).otherwise(F.lit(0.0)),
        )
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (the rolling-hash analogue that stays engine-portable)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def ngram_list(text: Column, k: int) -> Column:
    """Positional (NON-distinct, in-order) word k-grams — unlike
    ``dedup.shingles`` these keep duplicates, because repetition
    counting is the whole point."""
    tokens = words_col(text)
    n = F.size(tokens)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", table A1): per document,
    the fraction of 2-grams occupied by the single most frequent
    2-gram and the fraction of 3-grams that occur more than once.
    Token-count fractions rather than the paper's character fractions
    (equivalent signal; engine-portable arithmetic), thresholds kept
    at the paper's 0.20 / 0.18.

    Scale shape: explode → two hash aggregations, both keyed on
    (doc, gram) then doc — map-side partial aggregation absorbs
    within-partition repeats, and a boilerplate gram shared by every
    document is NOT a hot key because doc_id is in the grouping key.
    No windows, no self-joins, no UDFs.
    """
    two = (
        df.select(F.col(id_col), F.explode(ngram_list(F.col(text_col), 2)).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.max("c").alias("top2_cnt"),
            F.sum("c").alias("total2"),
        )
    )
    three = (
        df.select(F.col(id_col), F.explode(ngram_list(F.col(text_col), 3)).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias(
                "dup3_cnt"
            ),
            F.sum("c").alias("total3"),
        )
    )
    # Left joins from the corpus: documents too short for any 2-gram
    # (or 3-gram) keep a row with zero fractions, like Gopher's
    # "filter does not fire" semantics.
    return (
        df.select(id_col)
        .join(two, id_col, "left")
        .join(three, id_col, "left")
        .select(
            id_col,
            F.round(
                F.coalesce(
                    F.try_divide(F.col("top2_cnt"), F.col("total2")), F.lit(0.0)
                ),
                6,
            ).alias("top2gram_frac"),
            F.round(
                F.coalesce(
                    F.try_divide(F.col("dup3_cnt"), F.col("total3")), F.lit(0.0)
                ),
                6,
            ).alias("dup3gram_frac"),
        )
        .withColumn(
            "repetition_flagged",
            (F.col("top2gram_frac") > 0.20) | (F.col("dup3gram_frac") > 0.18),
        )
    )


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 10,
) -> DataFrame:
    """C4-style repeated-span removal (Raffel et al. 2020 §2.2 dedupe
    "three-sentence spans"; spans here are non-overlapping ``span``-token
    chunks since the synthetic corpora carry no sentence boundaries):
    every occurrence of a chunk that appears anywhere else in the
    corpus is removed EXCEPT the globally first one (minimum
    ``(doc_id, chunk_idx)``), and documents are re-assembled from their
    surviving chunks in order. Output: ``(id, text_dedup, n_removed)``
    — one row per input document (fully-boilerplate docs come back
    with empty text, not dropped, so downstream length filters make
    the keep/drop call).

    Scale shape: one explode → ``groupBy(chunk_hash).min(pos_key)``
    (map-side partial agg; a boilerplate chunk shared by 10^8 docs is
    ONE group, not a hot window partition) → one equi-join back on the
    hash (the hot key matches a single winner row — no blowup) → one
    ``groupBy(doc)`` re-assembly. No windows, no self-joins, no UDFs;
    everything is md5/array built-ins, reproducible in ANSI SQL
    (oracle q40).

    The winner per chunk hash is ``min(struct(id, idx))`` — struct
    ordering is lexicographic, so this works for ANY orderable id type
    (string url ids included), with no packing-range limit."""
    toks = words_col(F.col(text_col))
    n_chunks = F.ceil(F.size(toks) / F.lit(span)).cast("int")
    # sequence(0, -1) counts DOWN in Spark — empty docs must yield an
    # empty chunk array explicitly (posexplode then emits no rows)
    chunk_arr = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * span + 1, span)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    chunks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(chunk_arr).alias("idx", "chunk"),
    )
    hashed = chunks.select(
        "id",
        "idx",
        "chunk",
        F.md5("chunk").alias("h"),
    )
    winners = hashed.groupBy("h").agg(
        F.min(F.struct("id", "idx")).alias("w")
    )
    kept = hashed.join(winners, "h").where(
        (F.col("id") == F.col("w.id")) & (F.col("idx") == F.col("w.idx"))
    )
    rebuilt = kept.groupBy("id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "chunk"))),
                lambda s: s["chunk"],
            ),
        ).alias("text_dedup"),
        F.count("*").alias("kept_n"),
    )
    totals = hashed.groupBy("id").agg(F.count("*").alias("total_n"))
    return (
        df.select(F.col(id_col).alias("id"))
        .join(rebuilt, "id", "left")
        .join(totals, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
            (
                F.coalesce("total_n", F.lit(0)) - F.coalesce("kept_n", F.lit(0))
            ).cast("long").alias("n_removed"),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing — regex redaction, dialect-portable patterns
# ---------------------------------------------------------------------------

# Patterns kept to the RE2 ∩ java.util.regex common subset (char
# classes, non-capturing groups, \b, bounded repeats — no lookaround,
# no backreferences) so the Spark operator and the ANSI/DuckDB oracle
# (q42) execute the SAME pattern text.
PII_PATTERNS = {
    # replacement order matters: emails first (an IPv4-shaped host part
    # must redact as part of the email, not leave `<EMAIL>` + bare IP)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
}


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails / IPv4s / US-style phone numbers to typed
    placeholders (``<EMAIL>``/``<IP>``/``<PHONE>``) and count each —
    the standard pre-training scrub pass. Counts are taken on the text
    state each pattern actually sees (post-prior-replacements), so
    counts always equal placeholders inserted.

    Pure per-row ``regexp_replace``/``regexp_count`` projections —
    whole-stage codegen, no Python, no shuffle, trivially linear at any
    corpus size."""
    t = F.col(text_col)
    after_email = F.regexp_replace(t, PII_PATTERNS["email"], "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_PATTERNS["ipv4"], "<IP>")
    after_phone = F.regexp_replace(after_ip, PII_PATTERNS["phone"], "<PHONE>")
    return df.select(
        F.col(id_col),
        after_phone.alias("text_clean"),
        F.regexp_count(t, F.lit(PII_PATTERNS["email"]))
        .cast("long")
        .alias("n_emails"),
        F.regexp_count(after_email, F.lit(PII_PATTERNS["ipv4"]))
        .cast("long")
        .alias("n_ips"),
        F.regexp_count(after_ip, F.lit(PII_PATTERNS["phone"]))
        .cast("long")
        .alias("n_phones"),
    )


# ---------------------------------------------------------------------------
# Gopher quality gates (Rae et al. 2021, Table A1)
# ---------------------------------------------------------------------------


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """The Gopher rule set as one projection: per-document word count,
    mean word length, symbol-to-word ratio (``#`` and ellipses),
    bullet-start / ellipsis-end line fractions, fraction of words with
    an alphabetic character, and English-stopword hits — plus the
    published pass/fail gates and their conjunction ``passes_gopher``.
    Complements :func:`repetition_stats` (the repetition half of the
    Gopher filters, oracle q38).

    All whole-stage-codegen column expressions (split/filter/aggregate
    HOFs + regexp counts): no UDFs, no shuffle, linear at any scale.
    Ratios are NULL-safe for empty documents (0-word docs fail the
    word-count gate, ratios default 0)."""
    t = F.col(text_col)
    words = words_col(t)
    n_words = F.size(words).cast("long")
    total_word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = F.when(
        n_words > 0, total_word_chars.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    frac_alpha_words = F.when(
        n_words > 0, n_alpha_words.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    n_symbols = (
        F.regexp_count(t, F.lit("#")) + F.regexp_count(t, F.lit(r"\.\.\.|…"))
    )
    symbol_ratio = F.when(
        n_words > 0, n_symbols.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    lines = F.filter(
        F.split(t, "\n"),
        lambda l: F.regexp_replace(l, r"^\s+|\s+$", "") != "",
    )
    n_lines = F.size(lines)
    trimmed = F.transform(lines, lambda l: F.regexp_replace(l, r"^\s+|\s+$", ""))
    n_bullet = F.size(
        F.filter(trimmed, lambda l: l.rlike(r"^[-*•‣▪]"))
    )
    n_ellipsis = F.size(F.filter(trimmed, lambda l: l.rlike(r"(\.\.\.|…)$")))
    frac_bullet = F.when(
        n_lines > 0, n_bullet.cast("double") / n_lines
    ).otherwise(F.lit(0.0))
    frac_ellipsis = F.when(
        n_lines > 0, n_ellipsis.cast("double") / n_lines
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(words, F.array(*[F.lit(s) for s in STOPWORDS["en"]]))
    )
    passes = (
        n_words.between(min_words, max_words)
        & mean_word_len.between(3.0, 10.0)
        & (symbol_ratio < 0.1)
        & (frac_bullet < 0.9)
        & (frac_ellipsis < 0.3)
        & (frac_alpha_words >= 0.8)
        & (stop_hits >= 2)
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        n_words.alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(frac_alpha_words, 6).alias("frac_alpha_words"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(frac_bullet, 6).alias("frac_bullet"),
        F.round(frac_ellipsis, 6).alias("frac_ellipsis"),
        stop_hits.cast("long").alias("stopword_hits"),
        passes.alias("passes_gopher"),
    )


# ---------------------------------------------------------------------------
# extract_json_block — the reference's dirty-JSON fallback chain
# ---------------------------------------------------------------------------

# Reference langscrape/nodes/data_collator.py:10-43. Four stages in
# strict order, each tried only if the previous one fails to parse:
#   1. fenced ```json ... ``` block (case-insensitive, non-greedy);
#   2. bare object: FIRST '{' to LAST '}' (greedy, the reference's
#      r"\{[\s\S]*\}");
#   3. the whole (stripped) text;
#   4. the empty object '{}'.


def extract_json_block_col(text: Column) -> Column:
    """The selected JSON text under the reference's fallback order —
    a string column ('{}' when nothing parses), ready for
    ``from_json``/``get_json_object``.

    Implemented as an Arrow-vectorized pandas UDF rather than a
    ``try_parse_json`` expression chain because parse-*strictness* is
    the contract: Spark's lenient variant parser accepts trailing
    garbage ('{"a":1} and {"b":2}' parses as {"a":1}) where the
    reference's ``json.loads`` — and the DuckDB ``json_valid`` oracle —
    reject it, which flips stage-2 vs stage-4 outcomes. Python
    ``re``/``json`` here reproduce the reference decision-for-decision.

    Divergence note: the reference returns the *parsed* Python value
    (any JSON type); a Spark column must pick one type, so this returns
    the winning candidate's raw text — ``json.loads``-equivalent for
    every downstream consumer."""
    import json
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    fenced_re = re.compile(r"```json\s*(.*?)```", re.DOTALL | re.IGNORECASE)
    bare_re = re.compile(r"\{[\s\S]*\}")

    def pick(t) -> str:
        if not t or not isinstance(t, str):
            return "{}"
        t = t.strip()
        m = fenced_re.search(t)
        if m:
            cand = m.group(1).strip()
            try:
                json.loads(cand)
                return cand
            except json.JSONDecodeError:
                pass
        m = bare_re.search(t)
        if m:
            cand = m.group(0).strip()
            try:
                json.loads(cand)
                return cand
            except json.JSONDecodeError:
                pass
        try:
            json.loads(t)
            return t
        except json.JSONDecodeError:
            return "{}"

    def _chain(s):
        return pd.Series([pick(v) for v in s])

    return pandas_udf(_chain, StringType())(text)


def extract_json_block_parsed(text: Column, schema: str) -> Column:
    """Convenience: run the fallback chain, then ``from_json`` into a
    typed struct/map (NULL fields where keys are absent)."""
    return F.from_json(extract_json_block_col(text), schema)


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (Wenzek et al. 2019, "CCNet:
# Extracting High Quality Monolingual Datasets from Web Crawl Data").
# CCNet scores each document with a language-model perplexity and
# splits the corpus into head/middle/tail quality buckets at the
# per-language perplexity terciles. The public pipeline uses a
# KenLM 5-gram model; here the LM is a corpus-trained add-alpha
# unigram model so the whole path stays deterministic, engine-portable
# (DuckDB-oracled), and dependency-free — the scoring/bucketing
# plumbing is identical for any token->logp table you broadcast in.
#
# Scale shape (100 TB): the LM build is one explode + equi-key count
# agg (map-side combined, shuffle is distinct-types-sized, not
# corpus-sized) + a TakeOrderedAndProject top-V (partial top-V per
# partition — never a single-partition window). Scoring broadcasts
# the vocab-bounded LM (V rows, MBs) so the corpus-side join is
# map-side; the per-doc groupBy shuffles ~1 row per doc per partition
# after partial aggregation because a doc's exploded tokens stay in
# the partition that exploded them. Bucketing broadcasts 2 cutoffs
# per language.


def unigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    alpha: float = 0.5,
):
    """Train an add-alpha unigram LM on the corpus.

    Returns ``(lm, oov_logp)``: ``lm`` is a ``(token, logp)``
    DataFrame over the top-``vocab_size`` tokens (count desc, token
    asc — deterministic at the boundary), ``oov_logp`` the log-prob
    every out-of-vocabulary token scores.

    ``p(t) = (c_t + alpha) / (total + alpha * (V + 1))`` with
    ``total`` = ALL token occurrences (in- and out-of-vocab) and
    ``V`` = min(vocab_size, distinct types); OOV gets ``c_t = 0``.
    Mass does not sum to exactly 1 when tokens fall outside the vocab
    — irrelevant for ranking/bucketing, stated for honesty.

    The type-count frame is persisted only while this function runs
    (totals action + top-V selection), then unpersisted — no pinned
    state outlives the call. The top-V rows (bounded by
    ``vocab_size``, the whole point of a vocab cap) are collected and
    re-seeded as a small DataFrame; ``logp`` is still computed by
    Spark's ``log`` so engine float parity is unchanged.
    """
    import math

    toks = docs.select(F.explode(words_col(F.col(text_col))).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c")).persist()
    try:
        row = counts.agg(
            F.sum("c").alias("total"), F.count(F.lit(1)).alias("n_types")
        ).collect()[0]
        top = (
            counts.orderBy(F.desc("c"), F.asc("token"))
            .limit(vocab_size)
            .collect()
        )
    finally:
        counts.unpersist()
    total = int(row["total"] or 0)
    v = min(vocab_size, int(row["n_types"]))
    denom = float(total) + alpha * (v + 1)
    lm_counts = docs.sparkSession.createDataFrame(
        [(r["token"], int(r["c"])) for r in top], "token string, c long"
    )
    lm = lm_counts.select(
        "token",
        F.log((F.col("c") + F.lit(alpha)) / F.lit(denom)).alias("logp"),
    )
    return lm, math.log(alpha / denom)


def perplexity_score(
    docs: DataFrame,
    lm: DataFrame,
    oov_logp: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document unigram perplexity ``exp(-mean ln p(token))``.

    Broadcast-joins the vocab-bounded LM against the exploded corpus
    (map-side; no corpus shuffle) and reduces per doc. Docs with zero
    tokens keep NULL ``n_tokens``/``ppl`` (CCNet drops them; callers
    choose). Natural-log perplexity — monotone in any base, and the
    bucketing below is rank-based so the base never matters.
    """
    toks = docs.select(
        F.col(id_col), F.explode(words_col(F.col(text_col))).alias("token")
    )
    per_doc = (
        toks.join(F.broadcast(lm), "token", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(F.coalesce(F.col("logp"), F.lit(oov_logp))).alias("avg_logp"),
        )
        .select(id_col, "n_tokens", F.exp(-F.col("avg_logp")).alias("ppl"))
    )
    return docs.join(per_doc, id_col, "left")


def ppl_buckets(
    scored: DataFrame,
    group_cols=("lang",),
    ppl_col: str = "ppl",
    mode: str = "approx",
) -> DataFrame:
    """CCNet head/middle/tail buckets at per-group perplexity terciles.

    ``mode='exact'`` uses SQL ``percentile`` (matches DuckDB
    ``quantile_cont`` — same linear interpolation; q06 proved the
    parity) — one reduce per group holding that group's values, fine
    for cutoff computation at test scale. ``mode='approx'`` uses
    ``percentile_approx`` (mergeable sketch, the 100 TB path — cutoff
    placement shifts within sketch error but the bucket SEMANTICS are
    unchanged). Cutoffs are computed on ``round(ppl, 6)`` and compared
    against the same rounding so engine float noise below 1e-6 cannot
    flip a boundary row. NULL ppl keeps a NULL bucket.
    """
    if mode not in ("exact", "approx"):
        raise ValueError(f"mode must be 'exact' or 'approx', got {mode!r}")
    groups = list(group_cols)
    ppl_r = F.round(F.col(ppl_col), 6)
    fn = "percentile" if mode == "exact" else "percentile_approx"
    cuts = (
        scored.where(F.col(ppl_col).isNotNull())
        .select(*groups, ppl_r.alias("_ppl_r"))
        .groupBy(*groups)
        .agg(
            F.expr(f"{fn}(_ppl_r, cast(1 as double)/3)").alias("_c1"),
            F.expr(f"{fn}(_ppl_r, cast(2 as double)/3)").alias("_c2"),
        )
    )
    return (
        scored.join(F.broadcast(cuts), groups, "left")
        .withColumn(
            "ppl_bucket",
            F.when(F.col(ppl_col).isNull(), F.lit(None).cast("string"))
            .when(ppl_r <= F.col("_c1"), F.lit("head"))
            .when(ppl_r <= F.col("_c2"), F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .drop("_c1", "_c2")
    )


def _vocab_mapped(docs, text_col, id_col, vocab_size, return_vocab=False):
    """Shared vocab-closure stage of the bigram LMs: top-``vocab_size``
    tokens by (count desc, token asc), everything else mapped to
    ``<unk>`` via ONE broadcast LEFT join over a single corpus
    explode (a semi+anti pair would re-explode the corpus twice).
    Returns ``(m, v, total)``: the mapped ``(id, pos, w)`` frame, the
    effective vocab size, and the corpus token count."""
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col),
        F.posexplode(words_col(F.col(text_col))).alias("pos", "tok"),
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).persist()
    try:
        row = counts.agg(
            F.sum("c").alias("total"), F.count(F.lit(1)).alias("n_types")
        ).collect()[0]
        top = (
            counts.orderBy(F.desc("c"), F.asc("tok"))
            .limit(vocab_size)
            .collect()
        )
    finally:
        counts.unpersist()
    total = int(row["total"] or 0)
    v = min(vocab_size, int(row["n_types"]))
    vocab = spark.createDataFrame(
        [(r["tok"],) for r in top], "tok string"
    )
    vmark = vocab.withColumn("_v", F.lit(True))
    m = toks.join(F.broadcast(vmark), "tok", "left").select(
        id_col,
        "pos",
        F.when(F.col("_v").isNotNull(), F.col("tok"))
        .otherwise(F.lit("<unk>"))
        .alias("w"),
    )
    if return_vocab:
        return m, v, total, vmark
    return m, v, total


def bigram_ppl(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 50_000,
    alpha: float = 0.5,
    lam: float = 0.7,
) -> DataFrame:
    """Interpolated bigram-LM perplexity — the step from
    :func:`unigram_lm` toward CCNet's KenLM n-gram scoring, still
    deterministic and engine-portable.

    Model: tokens outside the top-``vocab_size`` unigram vocabulary
    map to ``<unk>`` (so the event space is closed, V+1 symbols);
    ``p_uni(w) = (c_w + a) / (total + a(V+1))`` over mapped tokens;
    ``p_bi(w2|w1) = (c_w1w2 + a) / (ctx_w1 + a(V+1))`` where ``ctx_w1``
    counts bigram occurrences starting with w1; the first token of a
    document scores ``p_uni``, every later token scores
    ``lam * p_bi + (1-lam) * p_uni``; ``ppl = exp(-mean ln p)``.

    Scale shape: one explode with position; vocabulary mapping is a
    broadcast left join (V rows); the bigram pairing is a lag window
    partitioned BY DOCUMENT (every doc is its own group — fully
    parallel, no global window); bigram/context counts are equi-key
    hash aggs; the score join on (w1, w2) is an equi-key shuffle
    against the bigram table — the LM table at corpus scale is itself
    big, so it is NOT broadcast (the unigram table is). Per-doc reduce
    shuffles ~1 row/doc/partition after partial aggregation.
    """
    m, v, total = _vocab_mapped(docs, text_col, id_col, vocab_size)
    denom_u = float(total) + alpha * (v + 1)

    # unigram probs over MAPPED tokens (<unk> mass aggregated)
    uni = m.groupBy("w").agg(F.count(F.lit(1)).alias("cu")).select(
        "w",
        ((F.col("cu") + F.lit(alpha)) / F.lit(denom_u)).alias("p_uni"),
    )

    wdoc = Window.partitionBy(id_col).orderBy("pos")
    pairs = m.withColumn("w1", F.lag("w").over(wdoc))
    big = pairs.where(F.col("w1").isNotNull()).groupBy("w1", "w").agg(
        F.count(F.lit(1)).alias("cb")
    )
    ctx = big.groupBy("w1").agg(F.sum("cb").alias("cctx"))

    scored = (
        pairs.join(F.broadcast(uni), "w")
        .join(big, ["w1", "w"], "left")
        .join(ctx, "w1", "left")
        .withColumn(
            "p_bi",
            (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(alpha))
            / (F.coalesce(F.col("cctx"), F.lit(0)) + F.lit(alpha * (v + 1))),
        )
        .withColumn(
            "logp",
            F.when(F.col("w1").isNull(), F.log(F.col("p_uni"))).otherwise(
                F.log(
                    F.lit(lam) * F.col("p_bi")
                    + F.lit(1.0 - lam) * F.col("p_uni")
                )
            ),
        )
    )
    return (
        docs.select(id_col)
        .join(
            scored.groupBy(id_col).agg(
                F.count(F.lit(1)).alias("n_terms"),
                F.exp(-F.avg("logp")).alias("ppl"),
            ),
            id_col,
            "left",
        )
    )


def kneser_ney_ppl(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 50_000,
    discount: float = 0.75,
    cont_alpha: float = 0.5,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram perplexity (Kneser & Ney 1995;
    Chen & Goodman 1999) — the smoothing KenLM defaults to, one step
    past :func:`bigram_ppl`'s plain interpolation: instead of raw
    unigram frequency, the backoff distribution is the CONTINUATION
    probability (in how many distinct contexts does this word appear),
    which stops high-frequency-but-context-locked tokens ("francisco")
    from stealing backoff mass.

    Model (same ``<unk>`` vocab closure as :func:`bigram_ppl`):

    * ``p_cont(w) = (N1+(·w) + a) / (N_bigram_types + a(V+1))`` —
      add-``a`` smoothed so doc-initial-only words never hit ln(0);
    * ``λ(w1) = D · N1+(w1·) / c(w1·)``;
    * ``p_kn(w|w1) = max(c(w1,w) − D, 0)/c(w1·) + λ(w1)·p_cont(w)``;
    * first token scores ``p_cont``; ``ppl = exp(−mean ln p)``.

    ``D = 0.75`` is exact in binary (3/4), so the discount introduces
    no cross-engine float drift; all counts are integers.

    Scale shape mirrors :func:`bigram_ppl`: lag window partitioned BY
    DOCUMENT, equi-key hash aggs for bigram/context/continuation
    counts, ``p_cont`` rides a broadcast (≤ V+1 rows), the score join
    on (w1, w) stays a shuffle join against the corpus-scale bigram
    table, and the 1-row type total joins as a broadcast crossJoin —
    nothing corpus-sized touches the driver.
    """
    m, v, _ = _vocab_mapped(docs, text_col, id_col, vocab_size)
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    pairs = m.withColumn("w1", F.lag("w").over(wdoc))
    big = pairs.where(F.col("w1").isNotNull()).groupBy("w1", "w").agg(
        F.count(F.lit(1)).alias("cb")
    )
    ctx = big.groupBy("w1").agg(
        F.sum("cb").alias("cctx"), F.count(F.lit(1)).alias("n1p_fw")
    )
    bw = big.groupBy("w").agg(F.count(F.lit(1)).alias("n1p_bw"))
    types = big.agg(F.count(F.lit(1)).alias("n_types"))
    # one left join covers both cases: words never seen as a bigram
    # CONTINUATION (doc-initial-only) coalesce to the smoothed zero —
    # the same shape as the oracle's pcont CTE
    p_cont = (
        m.select("w").distinct()
        .join(bw, "w", "left")
        .join(F.broadcast(types))
        .select(
            "w",
            (
                (F.coalesce(F.col("n1p_bw"), F.lit(0)) + F.lit(cont_alpha))
                / (F.col("n_types") + F.lit(cont_alpha) * (v + 1))
            ).alias("p_cont"),
        )
    )
    scored = (
        pairs.join(F.broadcast(p_cont), "w")
        .join(big, ["w1", "w"], "left")
        .join(ctx, "w1", "left")
        .withColumn(
            "p_kn",
            F.greatest(
                F.coalesce(F.col("cb"), F.lit(0)) - F.lit(discount),
                F.lit(0.0),
            )
            / F.col("cctx")
            + (F.lit(discount) * F.col("n1p_fw") / F.col("cctx"))
            * F.col("p_cont"),
        )
        .withColumn(
            "logp",
            F.when(
                F.col("w1").isNull(), F.log(F.col("p_cont"))
            ).otherwise(F.log(F.col("p_kn"))),
        )
    )
    return docs.select(id_col).join(
        scored.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.exp(-F.avg("logp")).alias("ppl"),
        ),
        id_col,
        "left",
    )


# ---------------------------------------------------------------------------
# document chunking — max-token segments with overlap
# ---------------------------------------------------------------------------

def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split every document into ``max_tokens``-token segments where
    consecutive segments share ``overlap`` tokens — the standard
    embedding / pretraining preparation for long documents (a 10^6
    -token page cannot ride a fixed context window whole). Every token
    is covered; the last chunk may be shorter; empty docs emit no
    chunks (the output is a CHUNK table keyed ``(id, chunk_idx)``, not
    a doc table).

    Output: ``(id_col, chunk_idx, n_tokens, chunk_text)``.

    Scale shape: one in-row ``transform`` + ``posexplode`` — no
    shuffle, no UDFs; output bytes ≈ corpus x max_tokens/stride (the
    overlap duplication factor — callers pick ``overlap`` knowing the
    write amplification). A 10^6-token document fans out in its own
    map task; no key ever concentrates."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    stride = max_tokens - overlap
    toks = words_col(F.col(text_col))
    n = F.size(toks)
    n_chunks = (
        F.when(n <= 0, F.lit(0))
        .when(n <= max_tokens, F.lit(1))
        .otherwise(
            F.floor((n - max_tokens + stride - 1) / F.lit(stride)).cast("int")
            + F.lit(1)
        )
    )
    chunk_arr = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                F.concat_ws(
                    " ", F.slice(toks, i * stride + 1, max_tokens)
                ).alias("chunk_text"),
                F.least(F.lit(max_tokens), n - i * stride)
                .cast("long")
                .alias("n_tokens"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<chunk_text:string,n_tokens:long>>")
    )
    return df.select(
        F.col(id_col), F.posexplode(chunk_arr).alias("chunk_idx", "c")
    ).select(
        id_col,
        "chunk_idx",
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# mojibake repair — UTF-8-read-as-Latin-1 artifacts (ftfy-style subset)
# ---------------------------------------------------------------------------

# Ordered literal replacements (NOT regexes — applied with plain
# replace() so the same table drives both engines verbatim). The
# 3-char punctuation artifacts go first; the 2-char accented-letter
# pairs never overlap them. Single source of truth: the q66 oracle
# generates its replace chain from this table.
MOJIBAKE_MAP: list[tuple[str, str]] = [
    ("â€™", "’"),  # â€™ -> ’
    ("â€œ", "“"),  # â€œ -> “
    ("â€“", "–"),  # â€“ -> –
    ("â€”", "—"),  # â€” -> —
    ("â€¦", "…"),  # â€¦ -> …
    ("Ã©", "é"),  # Ã© -> é
    ("Ã¨", "è"),  # Ã¨ -> è
    ("Ã¤", "ä"),  # Ã¤ -> ä
    ("Ã¶", "ö"),  # Ã¶ -> ö
    ("Ã¼", "ü"),  # Ã¼ -> ü
    ("Ã±", "ñ"),  # Ã± -> ñ
    ("Ã§", "ç"),  # Ã§ -> ç
    ("Ã¯", "ï"),  # Ã¯ -> ï
    ("Â ", " "),  # Â + nbsp -> space
]


def fix_mojibake(text: Column) -> Column:
    """Repair the common UTF-8-decoded-as-Latin-1 artifacts (the
    high-frequency subset of what ftfy fixes in web crawls). Pure
    literal ``replace`` chain — whole-stage codegen, no regex engine
    differences to reconcile."""
    out = text
    for bad, good in MOJIBAKE_MAP:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def mojibake_count(text: Column) -> Column:
    """Number of mojibake artifact occurrences, counted on the text
    state each replacement actually sees (same convention as
    :func:`pii_scrub`): occurrences of pattern i are counted after
    patterns 0..i-1 were applied, so the total equals the number of
    replacements :func:`fix_mojibake` performs."""
    total = F.lit(0).cast("long")
    cur = text
    for bad, good in MOJIBAKE_MAP:
        hits = (
            (F.length(cur) - F.length(F.replace(cur, F.lit(bad), F.lit(""))))
            / F.lit(len(bad))
        ).cast("long")
        total = total + hits
        cur = F.replace(cur, F.lit(bad), F.lit(good))
    return total


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_cols=("lang",),
    k: float = 3.0,
    mode: str = "exact",
) -> DataFrame:
    """Per-group robust outlier flag via median/MAD (the
    length-distribution gate curation pipelines run per language —
    mean/stddev break on the heavy-tailed doc-length distributions web
    corpora actually have; median ± k·MAD does not).

    Appends ``med``, ``mad`` (median absolute deviation) and
    ``is_outlier = |x - med| > k * MAD`` per ``group_cols``.
    ``mode='exact'`` uses SQL ``percentile`` (DuckDB ``quantile_cont``
    parity); ``'approx'`` the mergeable-sketch path for 100 TB.
    Degenerate groups (MAD = 0, over half the group at the median)
    flag nothing — a spread of zero makes every deviation infinite
    sigmas and the gate meaningless; NULL values keep NULL flags.

    Scale shape: two groups-sized percentile reduces (the second over
    ``|x - med|`` after a broadcast join of the first — MAD is not
    algebraic, the second pass is irreducible), both broadcast back;
    no corpus-sized shuffle.
    """
    if mode not in ("exact", "approx"):
        raise ValueError(f"mode must be 'exact' or 'approx', got {mode!r}")
    fn = "percentile" if mode == "exact" else "percentile_approx"
    groups = list(group_cols)
    x = F.col(value_col).cast("double")
    base = df.where(x.isNotNull())
    med = (
        base.select(*groups, x.alias("_x"))
        .groupBy(*groups)
        .agg(F.expr(f"{fn}(_x, cast(0.5 as double))").alias("med"))
    )
    mad = (
        base.join(F.broadcast(med), groups)
        .select(*groups, F.abs(x - F.col("med")).alias("_d"))
        .groupBy(*groups)
        .agg(F.expr(f"{fn}(_d, cast(0.5 as double))").alias("mad"))
    )
    stats = med.join(mad, groups)
    return df.join(F.broadcast(stats), groups, "left").withColumn(
        "is_outlier",
        F.when(x.isNull(), F.lit(None).cast("boolean")).otherwise(
            (F.col("mad") > 0) & (F.abs(x - F.col("med")) > F.lit(k) * F.col("mad"))
        ),
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual
    information — the phrase-mining pass (Mikolov et al. 2013 §4 uses
    exactly this to decide which word pairs become single tokens)
    that tokenizer construction and boilerplate analysis both want
    from a webtext corpus.

    ``PMI(x,y) = ln( (c_xy / N_pairs) / ((c_x / N_tok) * (c_y /
    N_tok)) )`` over lowercased whitespace tokens; pairs under
    ``min_count`` are dropped first (PMI is noise at tiny counts — a
    singleton pair of two singleton words scores huge), then the
    top-``top_k`` cut orders by UNrounded PMI desc with (w1, w2) as
    the deterministic tie-break; the reported pmi is round-6.

    Scale shape: the pairing is ARRAY-local (slice + zip_with on the
    token array — no window, no per-doc shuffle, unlike the lag
    window :func:`bigram_ppl` needs for its positional semantics);
    then two equi-key hash aggs (bigram counts, unigram counts), two
    equi-key joins of the bigram table against the vocab-sized
    unigram table (NOT broadcast — webtext vocabularies are
    heavy-tailed and large; AQE may still convert), one 1-row totals
    broadcast, and a ``TakeOrderedAndProject`` top-k. Nothing keeps
    per-doc state.
    """
    toks = words_col(F.col(text_col))
    pairs = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    base = docs.select(F.col(id_col), toks.alias("_toks"), pairs.alias("_pairs"))
    uni = (
        base.select(F.explode("_toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        base.select(F.explode("_pairs").alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= min_count)
    )
    totals = base.select(
        F.sum(F.size("_toks")).alias("n_tok"),
        F.sum(F.size("_pairs")).alias("n_pairs"),
    )
    scored = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y")), "w2")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "pmi",
            F.log(
                (F.col("c_xy") / F.col("n_pairs"))
                / ((F.col("c_x") / F.col("n_tok")) * (F.col("c_y") / F.col("n_tok")))
            ),
        )
    )
    return (
        scored.orderBy(F.desc("pmi"), "w1", "w2")
        .limit(top_k)
        .select("w1", "w2", "c_xy", "c_x", "c_y", F.round("pmi", 6).alias("pmi"))
    )


def zipf_stats(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """Vocabulary frequency profile for tokenizer/vocab design: the
    ``top_k`` most frequent tokens with rank, count, cumulative count
    and cumulative share of all corpus tokens, plus corpus-level
    constants (vocabulary size, hapax-legomena count, total tokens)
    duplicated per row so one table answers "how big a vocab covers
    X% of the corpus".

    Scale shape: ONE explode+groupBy shuffle builds the term-count
    frame; its Exchange is shared by both consumers (the top-k sort
    and the vocab-level aggregate) via ReuseExchange. The global rank
    is a ``TakeOrderedAndProject`` — the corpus-sized vocabulary is
    NEVER sorted through one partition; only the bounded top-k rows
    see a window (for the running coverage sum), and the corpus
    constants arrive as a 1-row broadcast crossJoin, never a collect.
    Ordering is deterministic: count desc, token asc.
    """
    tf = (
        docs.select(F.explode(words_col(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    consts = tf.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias("hapax_count"),
        F.sum("cnt").alias("total_tokens"),
    )
    top = tf.orderBy(F.desc("cnt"), "w").limit(top_k)
    w_rank = Window.orderBy(F.desc("cnt"), "w")
    return (
        top.withColumn("rank", F.row_number().over(w_rank))
        .withColumn(
            "cum_count",
            F.sum("cnt").over(
                w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .crossJoin(F.broadcast(consts))
        .select(
            F.col("rank").cast("long").alias("rank"),
            F.col("w").alias("token"),
            F.col("cnt").cast("long").alias("cnt"),
            F.col("cum_count").cast("long").alias("cum_count"),
            F.round(F.col("cum_count") / F.col("total_tokens"), 6).alias(
                "cum_share"
            ),
            F.col("vocab_size").cast("long").alias("vocab_size"),
            F.col("hapax_count").cast("long").alias("hapax_count"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("rank")
    )


def tfidf_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k tf-idf keywords per document (document tagging / topic
    surrogate): ``score = tf * (ln((N+1)/(df+1)) + 1)`` with the
    smoothed idf, cut per document by the UNROUNDED score (rounding
    happens only in the output so ulp noise cannot flip the cut),
    ties broken by token asc.

    Scale shape: ONE corpus explode — tf is the (doc, token) groupBy,
    and df comes from an in-flight ``count().over(partitionBy(w))``
    window on the same frame after one explicit exchange on the token
    (a separate df aggregate re-derived the whole explode, because
    column pruning makes the two subtrees non-identical and defeats
    ReuseExchange — verified on the executed plan); N rides in as a
    1-row broadcast crossJoin so the doc count never hits the driver;
    the per-doc top-k is a ``row_number`` window partitioned by doc —
    parallel by construction, no global sort.
    """
    toks = docs.select(
        F.col(id_col), F.explode(words_col(F.col(text_col))).alias("w")
    )
    tf = toks.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w_tok = Window.partitionBy("w")
    scored = (
        tf.repartition("w")
        .withColumn("df", F.count("*").over(w_tok))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "_score",
            F.col("tf")
            * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
        )
    )
    w_doc = Window.partitionBy(id_col).orderBy(F.desc("_score"), "w")
    return (
        scored.withColumn("rn", F.row_number().over(w_doc))
        .where(F.col("rn") <= k)
        .select(
            id_col,
            F.col("rn").cast("long").alias("rn"),
            F.col("w").alias("token"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round("_score", 6).alias("score"),
        )
        .orderBy(id_col, "rn")
    )


def entropy_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    low_entropy_bits: float = 2.5,
) -> DataFrame:
    """Per-document Shannon-entropy quality profile: token entropy,
    character entropy and type-token ratio — the standard cheap
    screens for degenerate machine text (keyword stuffing, repeated
    boilerplate, base64 blobs) that length/stopword gates miss.

    Entropy is reported in BITS (log2 — the convention of the quality
    literature and of ``low_entropy_bits``) via the shuffle-friendly
    identity ``H = log2(n) − (Σ c·log2 c)/n`` so each explode needs
    only ONE (doc, symbol) count aggregation followed by a per-doc
    sum — both get Spark's map-side partial aggregation, so at 100 TB
    the shuffled rows are per-doc *distinct* symbols, not corpus
    tokens. Char entropy strips whitespace first (layout is not
    content). ``is_low_entropy`` compares the ROUNDED token entropy
    so the gate is reproducible cross-engine.
    """

    def _sym_entropy(sym_df: DataFrame, out: str) -> DataFrame:
        counts = sym_df.groupBy(id_col, "s").agg(
            F.count(F.lit(1)).alias("c")
        )
        return counts.groupBy(id_col).agg(
            F.round(
                F.log2(F.sum("c").cast("double"))
                - F.sum(F.col("c") * F.log2(F.col("c").cast("double")))
                / F.sum("c"),
                6,
            ).alias(out),
            F.sum("c").cast("long").alias(f"_n_{out}"),
            F.count(F.lit(1)).cast("long").alias(f"_types_{out}"),
        )

    toks = docs.select(
        F.col(id_col),
        F.explode(words_col(F.col(text_col))).alias("s"),
    )
    chars = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(
                    F.regexp_replace(F.lower(F.col(text_col)), r"\s+", ""),
                    "",
                ),
                lambda ch: ch != "",
            )
        ).alias("s"),
    )
    tok_h = _sym_entropy(toks, "token_entropy")
    chr_h = _sym_entropy(chars, "char_entropy")
    return (
        docs.select(id_col)
        .join(tok_h, id_col, "left")
        .join(chr_h, id_col, "left")
        .select(
            id_col,
            F.col("_n_token_entropy").alias("n_tokens"),
            F.col("_types_token_entropy").alias("n_types"),
            F.round(
                F.col("_types_token_entropy")
                / F.col("_n_token_entropy").cast("double"),
                6,
            ).alias("ttr"),
            "token_entropy",
            "char_entropy",
            (F.col("token_entropy") < low_entropy_bits)
            .cast("int")
            .alias("is_low_entropy"),
        )
        .orderBy(id_col)
    )


def cdc_chunks(
    docs: DataFrame,
    window: int = 4,
    avg_chunk: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking at the token level (the FastCDC /
    Rabin idea): a chunk boundary falls AFTER any position whose
    last-``window``-token hash is 0 mod ``avg_chunk``, so chunk
    edges are decided by local CONTENT, not offsets - prepending a
    sentence to a document shifts every fixed-stride chunk
    (q65's ``chunk_documents``) but leaves every CDC chunk after the
    first boundary byte-identical, which is what makes chunk-hash
    dedup survive edits.

    Scale shape: one posexplode; the rolling window is a per-doc
    ``collect_list`` over a ``window``-row frame (bounded by the
    constant ``window``, never a neighborhood); boundary to chunk ids
    is an exclusive running sum; the rollup is one (doc, chunk)
    groupBy. Hash = md5-lower64 masked to 63 bits, modulo a
    power-of-two (signed pmod == unsigned - the engine-parity trick
    every sketch here uses).

    Returns ``(doc_id, chunk_idx, n_tokens, start_pos, chunk_hash)``.
    """
    from ..operators.dedup import _md5_lower64

    toks = docs.select(
        F.col(id_col),
        F.posexplode(words_col(F.col(text_col))).alias("pos", "w"),
    )
    w_roll = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(window - 1), 0)
    )
    rolled = toks.withColumn(
        # space separator: no-separator concat collides ["ab","c"] with
        # ["a","bc"] — same rule as dedup.shingles()
        "_win", F.concat_ws(" ", F.collect_list("w").over(w_roll))
    ).withColumn(
        "_boundary",
        F.when(
            (F.col("pos") >= window - 1)
            & (
                F.pmod(
                    _md5_lower64(F.col("_win")).bitwiseAND(
                        F.lit((1 << 63) - 1)
                    ),
                    F.lit(avg_chunk),
                )
                == 0
            ),
            1,
        ).otherwise(0),
    )
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = rolled.withColumn(
        "chunk_idx",
        F.coalesce(F.sum("_boundary").over(w_prev), F.lit(0)),
    )
    return (
        chunked.groupBy(id_col, "chunk_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.min("pos").cast("long").alias("start_pos"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "w"))
                        ),
                        lambda s: s["w"],
                    ),
                )
            ).alias("chunk_hash"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            "n_tokens",
            "start_pos",
            "chunk_hash",
        )
    )


# ---------------------------------------------------------------------------
# readability (Flesch / Flesch-Kincaid)
# ---------------------------------------------------------------------------

def readability_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade per document — the
    classic quality-curation signal complementing the Gopher/C4 gates
    (very low ease correlates with boilerplate/legalese, absurdly
    high with word salad). Syllables are the standard vowel-group
    heuristic (runs of [aeiouy] in the lowercased word, min 1 per
    word); sentences are terminator runs [.!?]+ (min 1 so the ratio
    is total). Everything is JVM-side regex + integer sums in ONE
    pass — no shuffle, no UDF; ratios are exact-integer divisions
    rounded at the edge.

    Returns ``(id, n_words, n_sentences, n_syllables, flesch,
    fk_grade)`` for documents with at least one word.
    """
    words = words_col(F.col(text_col))
    syl = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(
            F.lit(1),
            F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))),
        ),
    )
    sents = F.greatest(
        F.lit(1),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit("[.!?]+"), F.lit(0))
        ),
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        syl.alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    wps = F.col("n_words") / F.col("n_sentences")
    spw = F.col("n_syllables") / F.col("n_words")
    return base.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6
        ).alias("flesch"),
        F.round(
            F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6
        ).alias("fk_grade"),
    )


def chao1_richness(
    df: DataFrame,
    item_col: str,
    group_cols=("source",),
) -> DataFrame:
    """How many distinct items exist that the crawl has NOT seen yet —
    the species-richness twin of the capture-recapture POPULATION
    estimate (q140), asked of vocabularies, URL templates, hosts:
    Chao1 (1984) lower-bounds total richness from the rare tail, and
    Good-Turing coverage says what fraction of the next sample will be
    already-seen.

    From per-item occurrence counts: V = distinct items, N1 = seen
    exactly once, N2 = exactly twice, N = total occurrences. Then
    ``chao1 = V + N1(N1−1)/(2(N2+1))`` (bias-corrected — finite even
    with no doubletons) and ``coverage = 1 − N1/N``; both are ONE
    division of exact integers (round-6), so the hash compare has no
    float boundary. Integer range: N1² < 2^63 holds to ~3·10⁹
    singletons per group — decimal-cast beyond.

    Scale shape: one (group, item) count agg (map-side combinable),
    one group rollup — counts-of-counts never materialize a
    vocabulary-sized driver structure.

    Output: ``(*group_cols, v, n1, n2, n, chao1, coverage)``; empty
    groups cannot occur (no rows), zero-N impossible for a present
    group.
    """
    g = list(group_cols)
    occ = (
        df.where(F.col(item_col).isNotNull())
        .groupBy(*g, F.col(item_col).alias("_it"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = occ.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum((F.col("c") == 1).cast("int")).cast("long").alias("n1"),
        F.sum((F.col("c") == 2).cast("int")).cast("long").alias("n2"),
        F.sum("c").cast("long").alias("n"),
    )
    chao1 = (
        F.col("v").cast("double")
        + (F.col("n1") * (F.col("n1") - 1)).cast("double")
        / (2 * (F.col("n2") + 1)).cast("double")
    )
    coverage = F.lit(1.0) - F.try_divide(
        F.col("n1").cast("double"), F.col("n").cast("double")
    )
    return agg.select(
        *g,
        "v",
        "n1",
        "n2",
        "n",
        F.round(chao1, 6).alias("chao1"),
        F.round(coverage, 6).alias("coverage"),
    )


def vocab_growth(
    docs: DataFrame,
    checkpoints,
    text_col: str = "text",
    order_col: str = "doc_id",
) -> DataFrame:
    """Vocabulary-growth (Heaps) curve: distinct tokens seen after the
    first c docs of crawl order, at each checkpoint c — the
    diminishing-returns curve (with q141's Chao1 asymptote) that says
    when more of the same crawl stops buying new vocabulary.

    Deliberately NO global window: "crawl order" is the caller's
    integer ``order_col`` (a crawl sequence number, a round id — the
    thing that already exists), so first-occurrence is a plain
    ``min(order)`` per distinct token and each checkpoint is a
    conditional sum — ONE vocab-sized agg + ONE docs-sized agg with
    |checkpoints| conditional columns, unpivoted. All counts exact
    integers; ttr (type-token ratio) is the only division.

    Output: one row per checkpoint ``(checkpoint, n_docs, n_tokens,
    vocab, ttr)`` — docs/tokens/vocab over ``order <= c``; ttr NULL
    at an empty checkpoint.
    """
    cps = sorted(int(c) for c in checkpoints)
    toks = docs.select(
        F.col(order_col).alias("o"),
        F.explode(F.array_distinct(words_col(F.col(text_col)))).alias(
            "w"
        ),
    )
    first = toks.groupBy("w").agg(F.min("o").alias("fo"))
    v = first.agg(
        *[
            F.sum((F.col("fo") <= c).cast("int"))
            .cast("long")
            .alias(f"v{i}")
            for i, c in enumerate(cps)
        ]
    )
    d = docs.select(
        F.col(order_col).alias("o"),
        F.size(words_col(F.col(text_col))).cast("long").alias("nt"),
    ).agg(
        *[
            F.sum((F.col("o") <= c).cast("int"))
            .cast("long")
            .alias(f"d{i}")
            for i, c in enumerate(cps)
        ],
        *[
            F.sum(
                F.when(F.col("o") <= c, F.col("nt")).otherwise(0)
            )
            .cast("long")
            .alias(f"t{i}")
            for i, c in enumerate(cps)
        ],
    )
    joined = v.crossJoin(d)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).cast("long").alias("checkpoint"),
                F.col(f"d{i}").alias("n_docs"),
                F.col(f"t{i}").alias("n_tokens"),
                F.col(f"v{i}").alias("vocab"),
            )
            for i, c in enumerate(cps)
        ]
    )
    out = joined.select(F.explode(rows).alias("r")).select("r.*")
    return out.withColumn(
        "ttr",
        F.round(
            F.try_divide(
                F.col("vocab").cast("double"),
                F.col("n_tokens").cast("double"),
            ),
            6,
        ),
    )


def hill_alpha(
    df: DataFrame,
    value_col: str,
    xmin: int,
    group_cols=("source",),
) -> DataFrame:
    """Hill (1975) tail-exponent estimator — the maximum-likelihood α
    of the power-law tail ``P(X ≥ x) ∝ x^(1−α)`` above ``xmin``: the
    number behind every "the web is scale-free" claim, pointed at
    degree / doc-length / template-count distributions. α near 2 is a
    heavy tail (infinite variance: expect monster hosts — salt,
    guard, cap); α above 3 behaves.

    ``α = 1 + k / Σ ln(xᵢ/xmin)`` over the k tail values. A float sum
    over millions of tail rows is ORDER-dependent, so each log term
    quantizes to integer micro-units first (``floor(x·10⁶ + 0.5)``,
    the HyperANF/int8 portable rounding) — the sum is then an exact
    integer and α is one division, identical in both engines.
    Tails need ``x ≥ xmin ≥ 1``; groups with an empty tail or a
    zero log-sum (every tail value == xmin) report NULL via
    try_divide.

    Output: ``(*group_cols, k, log_sum_micro, alpha)``.
    """
    g = list(group_cols)
    x = F.col(value_col).cast("double")
    tail = df.where(F.col(value_col).isNotNull() & (x >= float(xmin)))
    micro = F.floor(
        F.log(x / F.lit(float(xmin))) * F.lit(1e6) + F.lit(0.5)
    ).cast("long")
    agg = tail.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(micro).cast("long").alias("log_sum_micro"),
    )
    return agg.select(
        *g,
        "k",
        "log_sum_micro",
        F.round(
            F.lit(1.0)
            + F.try_divide(
                (F.col("k") * F.lit(1_000_000)).cast("double"),
                F.col("log_sum_micro").cast("double"),
            ),
            6,
        ).alias("alpha"),
    )


def first_fail_index(gate_cols: Sequence[Column], n: int | None = None) -> Column:
    """0-based index of the FIRST gate a row fails (NULL gate value
    counts as fail, conservatively); rows passing every gate get
    ``len(gate_cols)``. Shared core of the two funnel reports
    (``filter_funnel`` here, ``filters.curation_funnel``) so the
    first-failure attribution semantics cannot drift between them."""
    ng = len(gate_cols) if n is None else n
    branches = [
        F.when(~F.coalesce(g.cast("boolean"), F.lit(False)), F.lit(i))
        for i, g in enumerate(gate_cols)
    ]
    return F.coalesce(*branches, F.lit(ng))


def filter_funnel(
    df: DataFrame,
    gates: Sequence[tuple],
) -> DataFrame:
    """Gate-cascade attrition audit — the curation-ops report behind
    every published filtering pipeline (C4 §2.2, Gopher Table A1,
    FineWeb §3): documents pass an ORDERED list of quality gates, and
    what ops needs is not just the survivor set but WHERE the corpus
    went: how many documents reach each stage, how many the stage
    removes (first-failure attribution — the funnel), how many fail it
    at all (marginal rate, order-independent), and how many fail ONLY
    it (unique attribution — gates whose unique-fail count is ~0 are
    redundant and can be dropped from the cascade).

    ``gates`` is an ordered sequence of ``(name, Column)`` with
    boolean gate expressions over ``df``'s columns (NULL counts as
    fail). Returns one row per gate::

        (stage, gate, n_reached, n_failed_here, n_fail_marginal,
         n_unique_fail)

    where ``n_reached`` is the count surviving gates ``< stage`` and
    ``n_failed_here`` the first-failure count, so the survivor corpus
    is ``n_reached - n_failed_here`` of the LAST row.

    Shape at 100 TB: one projection computes every gate bool plus the
    first-failure index, then ONE global aggregate (4 x n_gates sum
    expressions) reduces with map-side partials to a single row — no
    shuffle wider than the partial-agg row, no per-gate passes over
    the corpus; the per-stage reshape explodes that one row into
    ``n_gates`` rows driver-side-free. Adding a gate costs four sum
    expressions, not a scan.
    """
    names = [str(n) for n, _ in gates]
    ng = len(names)
    if ng == 0:
        raise ValueError("filter_funnel needs at least one gate")
    gcols = [
        F.coalesce(c.cast("boolean"), F.lit(False)).alias(f"_g{i}")
        for i, (_, c) in enumerate(gates)
    ]
    flags = df.select(*gcols)
    # Per-row fail count makes the unique-fail predicate linear in
    # gates: unique_i = (fails gate i) AND (total fails == 1), instead
    # of conjoining the other ng-1 gate columns per gate (O(ng^2)
    # expression nodes for long cascades).
    nf = sum(
        (F.when(F.col(f"_g{i}"), 0).otherwise(1) for i in range(ng)),
        F.lit(0),
    )
    flags = flags.withColumn(
        "_ff", first_fail_index([F.col(f"_g{i}") for i in range(ng)])
    ).withColumn("_nf", nf)

    def _cnt(cond):
        return F.coalesce(
            F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)
        ).cast("long")

    aggs = []
    for i in range(ng):
        aggs += [
            _cnt(F.col("_ff") >= i).alias(f"_r{i}"),
            _cnt(F.col("_ff") == i).alias(f"_f{i}"),
            _cnt(~F.col(f"_g{i}")).alias(f"_m{i}"),
            _cnt(~F.col(f"_g{i}") & (F.col("_nf") == 1)).alias(f"_u{i}"),
        ]
    row = flags.agg(*aggs)
    stages = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage"),
                F.lit(names[i]).alias("gate"),
                F.col(f"_r{i}").alias("n_reached"),
                F.col(f"_f{i}").alias("n_failed_here"),
                F.col(f"_m{i}").alias("n_fail_marginal"),
                F.col(f"_u{i}").alias("n_unique_fail"),
            )
            for i in range(ng)
        ]
    )
    return row.select(F.explode(stages).alias("s")).select("s.*")


def rake_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: "Optional[Sequence[str]]" = None,
    k: int = 5,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    Extraction from Individual Documents") — the third member of the
    keyword family here (TF-IDF = corpus-statistical, TextRank =
    graph-random-walk, RAKE = phrase-degree): candidate phrases are
    maximal stopword/punctuation-free token runs; each content word
    scores ``degree/freq`` (degree = Σ length of phrases containing
    it, freq = occurrences) and a phrase scores the sum of its words'
    scores. Degree/freq rewards words that co-occur inside longer
    multi-word phrases — headline terminology — without any corpus
    pass, which is why RAKE is the per-document keyword stage in
    pipelines that cannot afford a global vocabulary.

    Exactness: word scores are integer micro-units
    ``(degree·10^6) DIV freq`` before the phrase sum, so the ranking
    is bit-reproducible cross-engine (no float accumulation).
    Duplicate phrase instances in a doc collapse to one candidate
    (their scores are identical by construction — stats are
    doc-level). Top-``k`` per doc by (score desc, phrase asc).

    Scale shape: one posexplode, one per-doc running-sum window
    (gaps-and-islands phrase ids — per-doc partitions, bounded by doc
    length like every text window here), two doc-keyed hash aggs and
    one doc-keyed join; the phrase-text collect is bounded by a
    single stopword-free run, never the document. Top-k plans as
    WindowGroupLimit.

    Returns ``(id, phrase, n_words, score_micro, rank)``.
    """
    sw = list(stopwords) if stopwords is not None else list(STOPWORDS["en"])
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda w: w != "",
            )
        ).alias("pos", "word"),
    )
    swarr = F.array(*[F.lit(s) for s in sw])
    flagged = toks.withColumn(
        "stop", F.array_contains(swarr, F.col("word")).cast("int")
    )
    wp = Window.partitionBy("id").orderBy("pos")
    ph = flagged.withColumn("phrase_id", F.sum("stop").over(wp)).where(
        F.col("stop") == 0
    )
    plen = ph.groupBy("id", "phrase_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"],
            ),
            " ",
        ).alias("phrase"),
    )
    pw = ph.select("id", "phrase_id", "word")
    wstats = (
        pw.join(plen.select("id", "phrase_id", "n_words"),
                ["id", "phrase_id"])
        .groupBy("id", "word")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("n_words").alias("degree"),
        )
        .withColumn(
            "wsm",
            F.expr("(degree * CAST(1000000 AS BIGINT)) DIV freq"),
        )
    )
    inst = (
        pw.join(wstats.select("id", "word", "wsm"), ["id", "word"])
        .groupBy("id", "phrase_id")
        .agg(F.sum("wsm").alias("score_micro"))
        .join(plen, ["id", "phrase_id"])
    )
    cand = inst.groupBy("id", "phrase").agg(
        F.max("n_words").alias("n_words"),
        F.max("score_micro").alias("score_micro"),
    )
    wr = Window.partitionBy("id").orderBy(
        F.col("score_micro").desc(), F.col("phrase").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            "phrase",
            "n_words",
            "score_micro",
            "rank",
        )
    )


def min_k_prob(
    train: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 24,
    alpha: float = 0.5,
    lam: float = 0.75,
    k_pct: int = 20,
) -> DataFrame:
    """Min-K% Prob membership-inference audit (Shi et al., ICLR 2024
    "Detecting Pretraining Data from Large Language Models"): score a
    probe document by the MEAN of its k% lowest token log-probs under
    a reference LM trained on the corpus — members' most-surprising
    tokens are systematically less surprising than non-members', so
    a high min-k mean flags likely training-set membership (the
    leakage/memorization audit run before releasing eval numbers).

    The reference model is the q62 interpolated add-alpha bigram LM
    (same vocab closure, same first-token-unigram rule) trained on
    ``train``; probes score against it with the identical logp
    expression, then each probe keeps its ``ceil(k_pct·n/100)``
    lowest logps (rank ordered by (logp, pos) — the pos tie-break
    makes the cut deterministic across engines) and averages them.

    Scale shape: LM counts are equi-key hash aggs over the train
    explode; probe scoring is a broadcast-vocab map + equi-key joins
    against the bigram table; the bottom-k cut is a window
    partitioned BY PROBE DOC (bounded frames, fully parallel).

    Output: ``(id_col, n_tokens, k_used, mink_logp_mean round-6)``
    per probe doc with >=1 token.
    """
    # LM training is SHARED with bigram_ppl via _vocab_mapped (the
    # vocab marker comes back so probes map through the SAME closure)
    # — no duplicated counts/top-V/mapping logic to drift.
    tm, v, total, vmark = _vocab_mapped(
        train, text_col, id_col, vocab_size, return_vocab=True
    )
    denom_u = float(total) + alpha * (v + 1)
    a_v = alpha * (v + 1)
    uni = tm.groupBy("w").agg(
        ((F.count(F.lit(1)) + F.lit(alpha)) / F.lit(denom_u)).alias(
            "p_uni"
        )
    )
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    tpairs = tm.withColumn("w1", F.lag("w").over(wdoc))
    big = (
        tpairs.where(F.col("w1").isNotNull())
        .groupBy("w1", "w")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    ctx = big.groupBy("w1").agg(F.sum("cb").alias("cctx"))

    pm = probes.select(
        F.col(id_col), F.posexplode(words_col(F.col(text_col))).alias(
            "pos", "tok"
        )
    ).join(F.broadcast(vmark), "tok", "left").select(
        id_col,
        "pos",
        F.when(F.col("_v").isNotNull(), F.col("tok"))
        .otherwise(F.lit("<unk>"))
        .alias("w"),
    )
    ppairs = pm.withColumn("w1", F.lag("w").over(wdoc))
    p_bi = (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(alpha)) / (
        F.coalesce(F.col("cctx"), F.lit(0)) + F.lit(a_v)
    )
    # LEFT join + smoothed fallback: when the TRAIN corpus has fewer
    # types than vocab_size, nothing maps to <unk> during training and
    # uni has no <unk> row — but probe-only tokens still map there,
    # and dropping them (an inner join did, pre-review) would exclude
    # exactly the most-surprising tokens a Min-K% audit scores. Their
    # closed-space probability is the pure-smoothing mass alpha/denom.
    p_uni_eff = F.coalesce(F.col("p_uni"), F.lit(alpha / denom_u))
    scored = (
        ppairs.join(F.broadcast(uni), "w", "left")
        .join(big, ["w1", "w"], "left")
        .join(ctx, "w1", "left")
        .select(
            id_col,
            "pos",
            F.when(F.col("w1").isNull(), F.log(p_uni_eff))
            .otherwise(
                F.log(F.lit(lam) * p_bi + F.lit(1 - lam) * p_uni_eff)
            )
            .alias("logp"),
        )
    )
    wrank = Window.partitionBy(id_col).orderBy("logp", "pos")
    stats = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    ranked = scored.withColumn("_rn", F.row_number().over(wrank)).join(
        stats, id_col
    )
    kept = ranked.where(
        F.col("_rn")
        <= F.floor((F.lit(k_pct) * F.col("n_tokens") + 99) / 100)
    )
    return kept.groupBy(id_col, "n_tokens").agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.round(F.avg("logp"), 6).alias("mink_logp_mean"),
    ).select(id_col, "n_tokens", "k_used", "mink_logp_mean")
