"""Text-analysis Column kernels for training-data pipelines.

All JVM-side Column expressions (no Python in the hot path): token
counting, quality scoring, language-id heuristic, and a deterministic
document fingerprint.  Each has a SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def token_count(text: Column) -> Column:
    """Whitespace token count (single-space separated corpora)."""
    return F.when(F.length(text) == 0, F.lit(0)).otherwise(
        F.size(F.split(text, " "))
    ).cast("long")


def stopword_count(text: Column) -> Column:
    toks = F.split(text, " ")
    return F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("long")


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric or space."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9 ]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        F.length(stripped).cast("double") / F.length(text).cast("double")
    )


def quality_score(text: Column) -> Column:
    """Toy quality heuristic: mean word length x (1 - stopword share),
    bounded — enough structure to exercise the plan, SQL-expressible."""
    toks = token_count(text)
    stops = stopword_count(text)
    mean_word = F.when(toks == 0, F.lit(0.0)).otherwise(
        F.length(text).cast("double") / toks.cast("double")
    )
    stop_share = F.when(toks == 0, F.lit(0.0)).otherwise(
        stops.cast("double") / toks.cast("double")
    )
    return mean_word * (F.lit(1.0) - stop_share)


# tiny per-language function-word profiles for the n-gram/stopword
# language-ID heuristic (real pipelines would plug fastText/CLD3 here;
# the heuristic keeps the plan JVM-side and SQL-twinnable)
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "des", "est"],
}


def _in_words(words):
    # arity-1 closure — a default-arg lambda would be bound as the
    # (element, index) two-arg form and receive the array index
    def pred(t):
        return t.isin(words)

    return pred


def lang_scores(text: Column) -> dict[str, Column]:
    toks = F.split(F.lower(text), " ")
    return {
        lang: F.size(F.filter(toks, _in_words(words)))
        for lang, words in LANG_PROFILES.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax language over stopword-profile scores; 'und'
    (undetermined) when no profile scores > 0.  Deterministic
    tie-break: profile order en > es > de > fr (strict > comparison)."""
    scores = lang_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores.items():
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def fingerprint(text: Column) -> Column:
    """Deterministic 128-bit document fingerprint (md5 of normalized
    text) — exact-dedup key; identical function exists in DuckDB."""
    return F.md5(F.lower(F.trim(text)))


# GPT-2-style pre-tokenizer approximation: letter runs, digit runs,
# punctuation runs, optionally space-prefixed — the standard BPE
# pre-split shape as one regexp (kept RE2-safe: no backrefs or
# lookaround, so Spark's Java regex and DuckDB's RE2 agree).
BPE_TOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+|[^A-Za-z0-9 ]+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: number of pre-tokenizer matches — the
    cheap JVM-side proxy for 'how many tokens will the tokenizer
    emit' over a trillion-doc corpus."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE)).cast("long")


# cyclic-base polynomial fingerprint: h = Σ ascii(c_i)·31^(i mod 8).
# Rabin-Karp-style rolling hash with a period-8 base so every product
# stays exact in int64 in BOTH engines (255·31^7·|text| < 2^63) —
# no mod-mul needed, cross-engine bit-exact.
ROLL_POWERS = [31 ** k for k in range(8)]


def rolling_fingerprint(text: Column) -> Column:
    # sequence(1, 0) in Spark is DESCENDING [1, 0] (implicit step -1),
    # so an empty string would feed i=0 into element_at and raise
    # ELEMENT_AT_BY_INDEX_ZERO — guard to 0, matching the SQL twin.
    powers = F.array(*[F.lit(p).cast("long") for p in ROLL_POWERS])
    fold = F.aggregate(
        F.sequence(F.lit(1), F.length(text)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.ascii(text.substr(i, F.lit(1))).cast("long")
        * F.element_at(powers, (i - 1) % 8 + 1),
    )
    return F.when(F.length(text) > 0, fold).otherwise(F.lit(0).cast("long"))


# ---------------------------------------------------------------------------
# SQL twins
# ---------------------------------------------------------------------------

def token_count_sql(text: str) -> str:
    return (
        f"(case when length({text}) = 0 then 0 "
        f"else cast(len(string_split({text}, ' ')) as bigint) end)"
    )


def stopword_count_sql(text: str) -> str:
    quoted = ", ".join(f"'{w}'" for w in STOPWORDS)
    return (
        f"cast(len(list_filter(string_split({text}, ' '), "
        f"t -> t in ({quoted}))) as bigint)"
    )


def punct_ratio_sql(text: str) -> str:
    return (
        f"(case when length({text}) = 0 then 0.0 "
        f"else cast(length(regexp_replace({text}, '[A-Za-z0-9 ]', '', 'g')) as double) "
        f"/ length({text}) end)"
    )


def quality_score_sql(text: str) -> str:
    toks = token_count_sql(text)
    stops = stopword_count_sql(text)
    return (
        f"((case when {toks} = 0 then 0.0 else cast(length({text}) as double) / {toks} end) "
        f"* (1.0 - (case when {toks} = 0 then 0.0 else cast({stops} as double) / {toks} end)))"
    )


def fingerprint_sql(text: str) -> str:
    return f"md5(lower(trim({text})))"


def bpe_token_count_sql(text: str) -> str:
    return (
        f"cast(len(regexp_extract_all({text}, "
        f"' ?[A-Za-z]+| ?[0-9]+|[^A-Za-z0-9 ]+')) as bigint)"
    )


def rolling_fingerprint_sql(text: str) -> str:
    powers = "[" + ", ".join(str(p) for p in ROLL_POWERS) + "]"
    return (
        f"coalesce(cast(list_sum(list_transform(range(1, length({text}) + 1), "
        f"i -> cast(ascii(substring({text}, i, 1)) as bigint) "
        f"* ({powers}[((i - 1) % 8) + 1]))) as bigint), 0)"
    )


def lang_id_sql(text: str) -> str:
    """Same argmax with the same strict-> tie-break, as nested CASE."""
    def score(words):
        quoted = ", ".join(f"'{w}'" for w in words)
        return (
            f"len(list_filter(string_split(lower({text}), ' '), "
            f"t -> t in ({quoted})))"
        )

    expr_lang = "'und'"
    expr_score = "0"
    for lang, words in LANG_PROFILES.items():
        s = score(words)
        expr_lang = f"(case when {s} > ({expr_score}) then '{lang}' else {expr_lang} end)"
        expr_score = f"(case when {s} > ({expr_score}) then {s} else {expr_score} end)"
    return expr_lang


def repetition_ratio(text: Column, n: int = 3) -> Column:
    """Repeated word-n-gram fraction (round 5) — the Gopher-style
    repetition quality signal: 1 - distinct/total n-grams, 0 for
    texts too short to form more than one n-gram.  Pure Column (the
    n-gram builder is shared with the dedup operators)."""
    from ..operators.dedup import word_ngrams

    words = F.split(text, r"\s+")
    total = F.greatest(F.size(words) - (n - 1), F.lit(1)).cast("double")
    distinct = F.size(word_ngrams(text, n)).cast("double")
    return F.lit(1.0) - distinct / total


def repetition_ratio_sql(text: str, n: int = 3) -> str:
    """DuckDB twin of repetition_ratio: same split, same n-gram join,
    same greatest/1 floor (fragment shared in spirit with the
    ngram_jaccard_pairs oracle)."""
    w = f"string_split_regex({text}, '\\s+')"
    total = f"greatest(len({w}) - {n - 1}, 1)"
    grams = (
        f"list_distinct(list_transform(range(1, greatest(len({w})-{n - 1},1)+1), "
        f"i -> array_to_string(list_slice({w}, i, i+{n - 1}), ' ')))"
    )
    return f"(1.0 - cast(len({grams}) as double) / {total})"


# ---------------------------------------------------------------------------
# PII detection / redaction (round 5 — the scrubbing stage of a
# training-data curation pipeline; reference scope: none, additive)
# ---------------------------------------------------------------------------

#: Patterns kept inside the Java-regex ∩ RE2 common subset (character
#: classes, bounded quantifiers, grouping — no lookaround, no
#: backrefs, no word boundaries) so Spark and DuckDB match
#: identically.  Used via F.lit on the Spark side (no SQL string
#: escaping) and f-string interpolation into DuckDB SQL (regular
#: DuckDB strings do no backslash processing).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}"
PII_IPV4_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"

#: Redaction applies in this fixed order on both engines.
PII_RULES = [
    (PII_EMAIL_RE, "<EMAIL>"),
    (PII_PHONE_RE, "<PHONE>"),
    (PII_IPV4_RE, "<IP>"),
]


def pii_inject_sql(doc_id: str, text: str) -> str:
    """Deterministic PII synthesis (the documents corpus is word-salad
    with no natural PII): appends an email / E.164-ish phone / IPv4,
    keyed on doc_id residues, as ONE SQL text valid verbatim in BOTH
    engines (concat/lpad/%/floor only — the synth_media strategy:
    construction is shared, DETECTION is the thing independently
    verified)."""
    return (
        f"concat({text},"
        f" CASE WHEN {doc_id} % 5 = 0 THEN concat(' reach me at user',"
        f" cast({doc_id} as varchar(24)), '@mail-example.org') ELSE '' END,"
        f" CASE WHEN {doc_id} % 7 = 0 THEN concat(' call +1-415-',"
        f" lpad(cast({doc_id} % 1000 as varchar(8)), 3, '0'), '-',"
        f" lpad(cast({doc_id} % 10000 as varchar(8)), 4, '0')) ELSE '' END,"
        f" CASE WHEN {doc_id} % 11 = 0 THEN concat(' host 10.',"
        f" cast({doc_id} % 256 as varchar(8)), '.',"
        f" cast(cast(floor({doc_id} / 256.0) as bigint) % 256 as varchar(8)), '.',"
        f" cast({doc_id} % 250 + 1 as varchar(8))) ELSE '' END)"
    )


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-row PII hit counts (JVM regexp_count, no Python)."""
    return {
        "n_emails": F.regexp_count(text, F.lit(PII_EMAIL_RE)),
        "n_phones": F.regexp_count(text, F.lit(PII_PHONE_RE)),
        "n_ips": F.regexp_count(text, F.lit(PII_IPV4_RE)),
    }


def pii_redact(text: Column) -> Column:
    """Redacted text: the PII_RULES replacements in order (Spark's
    regexp_replace is replace-all)."""
    out = text
    for pat, tok in PII_RULES:
        out = F.regexp_replace(out, pat, tok)
    return out


def pii_counts_sql(text: str) -> dict[str, str]:
    """DuckDB twins of pii_counts (RE2 via regexp_extract_all)."""
    return {
        "n_emails": f"len(regexp_extract_all({text}, '{PII_EMAIL_RE}'))",
        "n_phones": f"len(regexp_extract_all({text}, '{PII_PHONE_RE}'))",
        "n_ips": f"len(regexp_extract_all({text}, '{PII_IPV4_RE}'))",
    }


def pii_redact_sql(text: str) -> str:
    """DuckDB twin of pii_redact ('g' = replace-all, same rule order)."""
    out = text
    for pat, tok in PII_RULES:
        out = f"regexp_replace({out}, '{pat}', '{tok}', 'g')"
    return out
