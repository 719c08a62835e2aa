"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

Every function here has two mechanically-equivalent emitters: a Spark
``Column`` (JVM-side, whole-stage codegen — no UDFs) and an ANSI-SQL string
for the DuckDB oracle. Keeping the twins in one module is what makes the
driver's value-hash correctness gate meaningful: both engines evaluate the
*same* expression tree.

Design rules for oracle safety:
- integer-scaled scores (× 10000) instead of float ratios — no float-hash
  flakiness between engines;
- ASCII-only regex character classes (identical semantics in Java regex and
  RE2);
- token-filter counting (split on whitespace, strip punctuation, compare)
  rather than substring matching — no overlapping-match ambiguity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "token_count_sql",
    "quality_score_cols",
    "quality_score_sql",
    "lang_id",
    "lang_id_sql",
    "fingerprint_norm",
    "fingerprint_norm_sql",
    "token_count_bpe",
    "token_count_bpe_sql",
    "winnow_fingerprints",
    "winnow_fingerprints_sql",
    "pii_redact",
    "pii_redact_sql",
    "pii_counts",
    "pii_counts_sql",
    "canonicalize_url",
    "canonicalize_url_sql",
]

_PUNCT_CLASS = "[.,;:!?\"()]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "une"],
    "es": ["el", "los", "las", "por", "con"],
}


# ------------------------------------------------------------- token count
def token_count(text: Column) -> Column:
    """Whitespace tokenization; empty/blank text counts 0 tokens."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def token_count_sql(text: str) -> str:
    return (
        f"CASE WHEN length(trim({text})) = 0 THEN 0 "
        f"ELSE len(regexp_split_to_array(trim({text}), '\\s+')) END"
    )


# ------------------------------------------------------------ quality score
def quality_score_cols(text: Column) -> dict[str, Column]:
    """Integer-scaled quality signals: chars, tokens, punctuation density,
    mean token length, English stopword density (all per-10k or x100)."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    punct = n_chars - F.length(F.regexp_replace(text, _PUNCT_CLASS, ""))
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    stop_list = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stops = F.size(
        F.filter(
            toks,
            lambda t: F.array_contains(stop_list, F.regexp_replace(t, _PUNCT_CLASS, "")),
        )
    )
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "punct_per_10k": F.round(punct * 10000 / F.greatest(n_chars, F.lit(1))).cast("long"),
        "mean_token_len_x100": F.round(
            (F.length(F.regexp_replace(text, r"\s+", "")) * 100) / safe_tokens
        ).cast("long"),
        "stopword_per_10k": F.round(stops * 10000 / safe_tokens).cast("long"),
    }


def quality_score_sql(text: str) -> dict[str, str]:
    n_tokens = token_count_sql(text)
    toks = f"regexp_split_to_array(trim(lower({text})), '\\s+')"
    stop_list = "['" + "','".join(STOPWORDS["en"]) + "']"
    stops = (
        f"len(list_filter({toks}, t -> list_contains({stop_list}, "
        f"regexp_replace(t, '{_PUNCT_CLASS}', '', 'g'))))"
    )
    return {
        "n_chars": f"CAST(length({text}) AS BIGINT)",
        "n_tokens": f"CAST({n_tokens} AS BIGINT)",
        "punct_per_10k": (
            f"CAST(round((length({text}) - length(regexp_replace({text}, "
            f"'{_PUNCT_CLASS}', '', 'g'))) * 10000.0 / greatest(length({text}), 1)) AS BIGINT)"
        ),
        "mean_token_len_x100": (
            f"CAST(round(length(regexp_replace({text}, '\\s+', '', 'g')) * 100.0 "
            f"/ greatest({n_tokens}, 1)) AS BIGINT)"
        ),
        "stopword_per_10k": (
            f"CAST(round({stops} * 10000.0 / greatest({n_tokens}, 1)) AS BIGINT)"
        ),
    }


# ------------------------------------------------------------------ lang id
def _stop_count(toks: Column, words: list[str]) -> Column:
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(
        F.filter(
            toks,
            lambda t: F.array_contains(wl, F.regexp_replace(t, _PUNCT_CLASS, "")),
        )
    )


def lang_id(text: Column) -> Column:
    """n-gram/stopword language guess. CJK characters short-circuit to 'zh';
    otherwise the language whose stopword set matches most tokens wins
    (priority en > de > fr > es on ties); no match → 'und'."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    counts = {lang: _stop_count(toks, ws) for lang, ws in STOPWORDS.items()}
    has_cjk = F.length(F.regexp_replace(text, "[^一-鿿]", "")) > 0
    c_en, c_de, c_fr, c_es = (counts[l] for l in ("en", "de", "fr", "es"))
    return (
        F.when(has_cjk, F.lit("zh"))
        .when((c_en > 0) & (c_en >= F.greatest(c_de, c_fr, c_es)), F.lit("en"))
        .when((c_de > 0) & (c_de >= F.greatest(c_fr, c_es)), F.lit("de"))
        .when((c_fr > 0) & (c_fr >= c_es), F.lit("fr"))
        .when(c_es > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )


def lang_id_sql(text: str) -> str:
    toks = f"regexp_split_to_array(trim(lower({text})), '\\s+')"

    def cnt(words: list[str]) -> str:
        wl = "['" + "','".join(words) + "']"
        return (
            f"len(list_filter({toks}, t -> list_contains({wl}, "
            f"regexp_replace(t, '{_PUNCT_CLASS}', '', 'g'))))"
        )

    c_en, c_de, c_fr, c_es = (cnt(STOPWORDS[l]) for l in ("en", "de", "fr", "es"))
    has_cjk = f"length(regexp_replace({text}, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) > 0"
    return (
        f"CASE WHEN {has_cjk} THEN 'zh' "
        f"WHEN {c_en} > 0 AND {c_en} >= greatest({c_de}, {c_fr}, {c_es}) THEN 'en' "
        f"WHEN {c_de} > 0 AND {c_de} >= greatest({c_fr}, {c_es}) THEN 'de' "
        f"WHEN {c_fr} > 0 AND {c_fr} >= {c_es} THEN 'fr' "
        f"WHEN {c_es} > 0 THEN 'es' ELSE 'und' END"
    )


# -------------------------------------------------------------- fingerprint
def fingerprint_norm(text: Column) -> Column:
    """Normalized-content fingerprint: lowercase, collapse whitespace, md5.
    Catches trivially-reformatted duplicates that exact-hash dedup misses."""
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.md5(F.encode(norm, "UTF-8"))


def fingerprint_norm_sql(text: str) -> str:
    return f"md5(regexp_replace(trim(lower({text})), '\\s+', ' ', 'g'))"


# --------------------------------------------- BPE-ish subword token count
# A GPT-style pre-tokenizer approximation: letter runs, digit runs, and
# non-alnum punctuation runs each become one token. ASCII classes only so
# Java regex (Spark) and RE2 (DuckDB) agree exactly.
_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_count_bpe(text: Column) -> Column:
    """Subword-ish token count via the BPE pre-tokenizer regex — the
    LLM-pipeline complement of whitespace ``token_count`` (a length budget
    in "model tokens" rather than words)."""
    return F.size(F.regexp_extract_all(text, F.lit(_BPE_PATTERN), F.lit(0))).cast("long")


def token_count_bpe_sql(text: str) -> str:
    return f"CAST(len(regexp_extract_all({text}, '{_BPE_PATTERN}')) AS BIGINT)"


# -------------------------------------------- winnowing (rolling) fingerprints
def winnow_fingerprints(
    text: Column, k: int = 5, window: int = 4
) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash
    every ORDERED k-gram, slide a ``window`` over the hash sequence, keep
    each window's minimum — the classic rolling-hash selection guaranteeing
    any shared run of ≥ k+window-1 tokens yields a shared fingerprint.

    The "hash" is the md5 hex string and the minimum is lexicographic:
    string order is engine-identical, so the DuckDB twin hash-matches
    exactly (a numeric xxhash would diverge — DuckDB lacks it). Returns the
    sorted distinct fingerprint array (empty for docs shorter than
    k+window-1 tokens). All JVM-side: the token array is bound as a lambda
    variable (see shingle_tokens' O(n²) caution)."""

    def make(toks: Column) -> Column:
        n = F.size(toks)
        grams = F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.md5(F.encode(F.array_join(F.slice(toks, i + 1, k), " "), "UTF-8")),
        )
        mins = F.transform(
            F.sequence(F.lit(1), n - k + 2 - window),
            lambda i: F.array_min(F.slice(grams, i, window)),
        )
        return F.when(n >= k + window - 1, F.array_sort(F.array_distinct(mins))).otherwise(
            F.array().cast("array<string>")
        )

    bound = F.transform(F.array(F.split(F.trim(F.lower(text)), r"\s+")), make)
    return F.element_at(bound, 1)


def winnow_fingerprints_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> str:
    """DuckDB twin of ``winnow_fingerprints`` exploded to (id, fingerprint)
    rows: ordered k-gram md5s, windowed min via a frame, distinct."""
    gram = " || ' ' || ".join(f"ws[i+{j}]" for j in range(k))
    return f"""
WITH toks AS (
  SELECT {id_col}, regexp_split_to_array(trim(lower({text_col})), '\\s+') AS ws
  FROM {table}
),
grams AS (
  SELECT {id_col}, i, md5({gram}) AS h, len(ws) - {k} + 1 AS n_grams
  FROM toks, UNNEST(range(1, len(ws) - {k} + 2)) AS t(i)
  WHERE len(ws) >= {k}
),
mins AS (
  SELECT {id_col}, i,
         min(h) OVER (PARTITION BY {id_col} ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS fp,
         n_grams
  FROM grams
)
SELECT DISTINCT {id_col}, fp AS fingerprint
FROM mins WHERE i <= n_grams - {window} + 1
"""


# ------------------------------------------------------------ PII scrubbing
# Alternation-free, ASCII-only patterns so Java regex (Spark, backtracking
# leftmost-first) and RE2 (DuckDB, leftmost-longest) match identically:
# greedy character-class quantifiers with no ambiguous alternatives.
# `[.]` instead of `\.` keeps the string literal identical in both emitters.
PII_URL_RE = "https?://[^ ]+"
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PII_NUMBER_RE = "[0-9]{7,}"

# Replacement order matters: URLs first (they may embed digit runs), then
# emails, then long digit runs. The placeholders contain none of '@',
# 'http', or 7+ digits, so later passes never re-match earlier rewrites.
_PII_PASSES = [
    (PII_URL_RE, "<URL>"),
    (PII_EMAIL_RE, "<EMAIL>"),
    (PII_NUMBER_RE, "<NUMBER>"),
]


def pii_redact(text: Column) -> Column:
    """Replace URLs, emails, and long digit runs (phone/account-ish) with
    typed placeholders. Pure codegen'd ``regexp_replace`` chain — no UDF,
    no shuffle; at 100 TB this is a map-only projection."""
    out = text
    for pat, tag in _PII_PASSES:
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_redact_sql(text: str) -> str:
    """DuckDB twin of :func:`pii_redact` (``'g'`` flag: DuckDB replaces
    only the first match by default, Spark replaces all)."""
    out = text
    for pat, tag in _PII_PASSES:
        out = f"regexp_replace({out}, '{pat}', '{tag}', 'g')"
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per category on the ORIGINAL text (audit metric —
    how much PII a source emits, independent of the rewrite)."""
    return {
        "n_urls": F.regexp_count(text, F.lit(PII_URL_RE)),
        "n_emails": F.regexp_count(text, F.lit(PII_EMAIL_RE)),
        "n_numbers": F.regexp_count(text, F.lit(PII_NUMBER_RE)),
    }


def pii_counts_sql(text: str) -> dict[str, str]:
    return {
        "n_urls": f"len(regexp_extract_all({text}, '{PII_URL_RE}'))",
        "n_emails": f"len(regexp_extract_all({text}, '{PII_EMAIL_RE}'))",
        "n_numbers": f"len(regexp_extract_all({text}, '{PII_NUMBER_RE}'))",
    }


# ------------------------------------------------------- URL canonicalization
# Web-crawl pipelines dedup by URL before they dedup by content; the same
# page arrives as http://WWW.Site.com/a/?utm_source=feed and
# https://site.com/a. Canonical form here: lowercased scheme+host, www. and
# default-port (:80/:443) stripped, fragment dropped, trailing path slashes
# dropped, tracking params (utm_*, fbclid, gclid, ref) removed, surviving
# query params sorted. Path case is PRESERVED (case-significant on most
# servers). All character-class regexes — identical in Java regex and RE2.
_URL_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_URL_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_URL_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# Anchored to the pre-fragment region: a '?' that first appears inside the
# fragment ('http://h/p#a?b') is part of the fragment and must be dropped
# with it, not resurrected as a query string.
_URL_QUERY_RE = "^[^#?]*[?]([^#]*)"
_URL_TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=", "ref=")


def canonicalize_url(url: Column) -> Column:
    """Canonical URL as a pure codegen expression chain (regexp_extract +
    array HOFs, no UDF) — a map-only projection at any scale. Rows that do
    not parse as ``scheme://host...`` canonicalize to the empty string, so
    callers can filter or quarantine them."""
    scheme = F.lower(F.regexp_extract(url, _URL_SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(url, _URL_HOST_RE, 1))
    host = F.regexp_replace(host, "^www[.]", "")
    host = F.regexp_replace(host, ":80$", "")
    host = F.regexp_replace(host, ":443$", "")
    path = F.regexp_extract(url, _URL_PATH_RE, 1)
    path = F.regexp_replace(path, "/+$", "")
    query = F.regexp_extract(url, _URL_QUERY_RE, 1)

    def keep(p: Column) -> Column:
        cond = p != ""
        for pre in _URL_TRACKING_PREFIXES:
            cond = cond & ~p.startswith(pre)
        return cond

    qcanon = F.array_join(F.array_sort(F.filter(F.split(query, "&"), keep)), "&")
    return F.when(scheme == "", F.lit("")).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(qcanon == "", F.lit("")).otherwise(F.concat(F.lit("?"), qcanon)),
        )
    )


def canonicalize_url_sql(url: str) -> str:
    """DuckDB twin of :func:`canonicalize_url` (RE2 regexes, list HOFs)."""
    scheme = f"lower(regexp_extract({url}, '{_URL_SCHEME_RE}', 1))"
    host = f"lower(regexp_extract({url}, '{_URL_HOST_RE}', 1))"
    host = f"regexp_replace({host}, '^www[.]', '')"
    host = f"regexp_replace({host}, ':80$', '')"
    host = f"regexp_replace({host}, ':443$', '')"
    path = f"regexp_replace(regexp_extract({url}, '{_URL_PATH_RE}', 1), '/+$', '')"
    query = f"regexp_extract({url}, '{_URL_QUERY_RE}', 1)"
    keep = " AND ".join(
        ["x <> ''"] + [f"NOT starts_with(x, '{p}')" for p in _URL_TRACKING_PREFIXES]
    )
    # coalesce: DuckDB's array_to_string([]) is NULL where Spark's
    # array_join([]) is '' — normalize to the Spark semantics
    qcanon = (
        f"coalesce(array_to_string(list_sort(list_filter(str_split({query}, '&'), "
        f"x -> {keep})), '&'), '')"
    )
    return (
        f"CASE WHEN {scheme} = '' THEN '' ELSE "
        f"{scheme} || '://' || {host} || {path} || "
        f"(CASE WHEN {qcanon} = '' THEN '' ELSE '?' || {qcanon} END) END"
    )
