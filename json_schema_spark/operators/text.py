"""Text-analysis operators: language-ID, quality scoring, token
counting, document fingerprinting — all pure Column expressions
(whole-stage codegen; zero Python on executors).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from .dedup import normalize_text

__all__ = ["token_count", "bpe_ish_token_count", "quality_features",
           "quality_score", "lang_id", "fingerprint", "STOPWORDS"]

# small per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "por", "que", "una", "con"],
    "zh": ["的", "是", "不", "了", "在", "有", "我", "他", "这", "中"],
}

_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def token_count(col) -> F.Column:
    """Whitespace token count."""
    t = normalize_text(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, " ")))


def bpe_ish_token_count(col) -> F.Column:
    """BPE-ish proxy: alpha runs + digit runs + individual punctuation,
    each alpha run charged ceil(len/4) subword units (the common ~4
    chars/token heuristic) — a deterministic, JVM-side token estimate."""
    toks = F.regexp_extract_all(col, F.lit(_TOKEN_RE), 0)
    return F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc
        + F.when(t.rlike("^[A-Za-z]+$"), F.ceil(F.length(t) / 4.0).cast("int"))
        .otherwise(F.lit(1)),
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: length, tokens, mean word length,
    punctuation/digit/stopword ratios, uppercase ratio."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = token_count(t)
    en_sw = STOPWORDS["en"]
    words = F.split(normalize_text(t), " ")
    sw_hits = F.size(F.filter(words, lambda w: w.isin(en_sw)))
    punct = F.length(F.regexp_replace(t, r"[^\p{Punct}]", ""))
    digits = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    safe = lambda num: F.when(n_chars > 0, num / n_chars).otherwise(F.lit(0.0))
    return df.withColumns(
        {
            "n_chars": n_chars,
            "n_tokens": toks,
            "mean_word_len": F.when(toks > 0, n_chars / toks).otherwise(F.lit(0.0)),
            "punct_ratio": safe(punct),
            "digit_ratio": safe(digits),
            "upper_ratio": safe(upper),
            "stopword_ratio": F.when(toks > 0, sw_hits / toks).otherwise(F.lit(0.0)),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic [0,1] quality score: length sweet spot, sane word
    length, low punctuation/digit noise, some stopwords (prose-ness)."""
    feat = quality_features(df, text_col)
    len_score = F.least(F.col("n_chars") / 200.0, F.lit(1.0)) * F.when(
        F.col("n_chars") > 20000, F.lit(0.5)
    ).otherwise(F.lit(1.0))
    word_score = F.when((F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 12),
                        F.lit(1.0)).otherwise(F.lit(0.4))
    noise_score = F.greatest(
        F.lit(0.0), F.lit(1.0) - 2.0 * F.col("punct_ratio") - F.col("digit_ratio")
    )
    prose_score = F.least(F.lit(1.0), F.lit(0.3) + 2.0 * F.col("stopword_ratio"))
    return feat.withColumn(
        "quality_score",
        F.round((len_score * 0.3 + word_score * 0.2 + noise_score * 0.3 + prose_score * 0.2), 6),
    )


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-profile language ID: score = per-language stopword hit
    rate over tokens (CJK languages scored by character hits); argmax
    via a sorted struct array — all JVM-side."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    n = F.greatest(F.size(words), F.lit(1))
    scores = []
    for lang, sws in STOPWORDS.items():
        if lang == "zh":
            hits = reduce(
                lambda a, b: a + b,
                [F.when(F.col(text_col).contains(ch), 1).otherwise(0) for ch in sws],
            )
            score = hits.cast("double") / 3.0
        else:
            score = F.size(F.filter(words, lambda w: w.isin(sws))).cast("double") / n
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.sort_array(F.array(*scores), asc=False)[0]
    return df.withColumn(
        out_col, F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("unknown"))
    ).withColumn(f"{out_col}_score", F.round(best["score"], 6))


def fingerprint(df: DataFrame, text_col: str = "text", shingle_n: int = 8) -> DataFrame:
    """Two fingerprints per document:

    * ``fp_sha256`` — exact content identity on normalized text;
    * ``fp_rolling64`` — order-insensitive XOR of rolling-window
      (char n-gram) xxhash64 values: robust to local edits/reordering,
      cheap to compare at scale."""
    norm = normalize_text(F.col(text_col))
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (shingle_n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.xxhash64(F.substring(norm, i, shingle_n)))
    rolling = F.aggregate(grams, F.lit(0).cast("long"), lambda acc, h: acc.bitwiseXOR(h))
    return df.withColumn("fp_sha256", F.sha2(norm, 256)).withColumn("fp_rolling64", rolling)
