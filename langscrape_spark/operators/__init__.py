from .ann import cosine_sim, cosine_topk, lsh_topk
from .dedup import (
    exact_dedup,
    hamming64,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    shingles,
    simhash64,
    simhash_near_dups,
)
from .evalops import best_per_group, f1_by_group, scheme_report
from .ranking import (
    binned_avg,
    percentile_describe,
    stratified_sample,
    top_k_per_group,
)
from .text import (
    STOPWORDS,
    fingerprint,
    lang_id,
    quality_columns,
    token_count,
    words_col,
)

__all__ = [
    "STOPWORDS",
    "best_per_group",
    "binned_avg",
    "cosine_sim",
    "cosine_topk",
    "exact_dedup",
    "f1_by_group",
    "fingerprint",
    "hamming64",
    "lang_id",
    "lsh_topk",
    "minhash_lsh_pairs",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "percentile_describe",
    "quality_columns",
    "scheme_report",
    "shingles",
    "simhash64",
    "simhash_near_dups",
    "stratified_sample",
    "token_count",
    "top_k_per_group",
    "words_col",
]
