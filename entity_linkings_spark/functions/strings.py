"""String normalization & tokenization — the reference's scalar surface
(SURVEY.md section 2.7) as Catalyst expressions.

Reference provenance (all paths under /root/reference/entity_linkings/):
  * norm_despace — lowercase + space-strip prior key
    (candidate_retriever/prior/indexer.py:26, :115)
  * norm_alnum   — punctuation-stripped prior key, regex ``[\\W]+``
    (candidate_retriever/prior/indexer.py:19, :44, :117)
  * norm_title   — ``' ' -> '_'`` wiki-title normalization
    (data_utils/entity_dictionary.py:78-84; appendix/data_convert/utils.py:27)
  * tokenize     — word tokenizer regex ``(?u)\\b[\\w#]+\\b``
    (candidate_retriever/bm25/indexer.py:44-48)
  * mention_substring — ``text[start:end]`` projection
    (candidate_retriever/bm25/bm25.py:53; pipeline.py:29-36)

Every expression here has an exact DuckDB twin (same regex dialect subset, same
semantics) so the driver's oracle verifies them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = r"[\w#]+"  # applied to lowercased text; \b anchors are implicit


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def norm_exact(col: Column | str) -> Column:
    """Tier-0 key: trimmed lowercase."""
    return F.lower(F.trim(_c(col)))


def norm_despace(col: Column | str) -> Column:
    """Tier-1 key: lowercase with all whitespace removed (reference 'simpler')."""
    return F.regexp_replace(F.lower(_c(col)), r"\s+", "")


def norm_alnum(col: Column | str) -> Column:
    """Tier-2 key: lowercase with every non-word run removed (reference
    'most simple', regex ``[\\W]+`` -> '')."""
    return F.regexp_replace(F.lower(_c(col)), r"[\W]+", "")


def norm_title(col: Column | str) -> Column:
    """Wiki-title form: spaces to underscores (case preserved, as in the
    reference's title index)."""
    return F.translate(_c(col), " ", "_")


def tokenize(col: Column | str) -> Column:
    """Lowercased word tokens (array<string>), the blocking-token source.

    ``regexp_extract_all(lower(text), '[\\w#]+')`` matches the reference's
    BM25 tokenizer on ASCII text and is identical in DuckDB.
    """
    return F.regexp_extract_all(F.lower(_c(col)), F.lit(TOKEN_PATTERN), 0)


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Character n-gram shingles (array<string>, overlapping, order kept).

    Built with sequence+transform so it stays a Catalyst expression; strings
    shorter than n yield a single shingle = the whole string, so short
    mentions still participate in MinHash instead of vanishing.
    """
    c = _c(col)
    return F.when(F.length(c) <= n, F.array(c)).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(c) - F.lit(n - 1)),
            lambda i: c.substr(i, F.lit(n)),
        )
    )


def mention_substring(text: Column | str, start: Column | str, end: Column | str) -> Column:
    """``text[start:end]`` with 0-based ``start``, exclusive ``end`` (the
    reference's Python slice semantics) on Spark's 1-based substr."""
    t, s, e = _c(text), _c(start), _c(end)
    return t.substr(s + F.lit(1), e - s)


# (pattern, placeholder) pairs applied IN ORDER — order matters (an email
# contains digit runs; redacting emails first keeps the placeholders clean).
# Patterns deliberately avoid alternation and lookaround so Java regex
# (Spark, leftmost-first backtracking) and RE2 (DuckDB, leftmost-longest)
# match identically; both support \b (ASCII) and non-capturing groups.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{13,19}\b", "<CARD>"),
    (r"\+?\d[\d() -]{7,}\d", "<PHONE>"),
]


def redact_pii(col: Column | str) -> Column:
    """Training-data hygiene: replace email / IPv4 / card-length digit runs /
    phone-like sequences with typed placeholders — a pure Catalyst
    regexp_replace chain (no UDF; the patterns are dialect-portable so the
    DuckDB oracle applies the literal same chain)."""
    c = _c(col)
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def canonicalize_url(col: Column | str) -> Column:
    """URL canonicalization for pretrain-corpus dedup: two fetches of the
    same page must collapse to ONE key however they were linked. Drops the
    fragment, the http/https scheme, and a leading www.; lowercases the
    HOST only (paths/queries are case-significant); strips tracking
    parameters (utm_*, fbclid, gclid, ref) and any query/slash debris they
    leave behind. Pure Catalyst regexp chain, dialect-portable — the
    DuckDB oracle applies the literal same patterns (with the 'g' flag
    where Spark's replace-all is DuckDB's replace-first).

    Deliberately NOT full RFC 3986 normalization (percent-encoding
    equivalence, default ports, path dot-segments): those need a real URL
    parser; this is the deterministic 99%-case key a dedup stage wants."""
    u = _c(col)
    u = F.regexp_replace(u, r"#.*$", "")                  # fragment
    # scheme + leading www., as ONE repeated alternation: stacked junk
    # prefixes ('www.www.x', 'http://http://x') strip in a single pass, so
    # the whole chain is IDEMPOTENT — canon(canon(u)) == canon(u), the
    # property a dedup KEY must have (property-tested)
    u = F.regexp_replace(u, r"^(?:[Hh][Tt][Tt][Pp][Ss]?://|[Ww][Ww][Ww]\.)+", "")
    host = F.lower(F.regexp_extract(u, r"^([^/?]*)", 1))
    u = F.concat(host, u.substr(F.length(host) + 1, F.length(u)))
    # tracking params: anchored to the preceding separator so 'href=' /
    # 'pref=' / 'foo_utm_source=' never match (an unanchored pattern
    # collapsed distinct ?href=... URLs to one key — silent doc loss); the
    # trailing '&' is NOT consumed so back-to-back tracking params each
    # match in the same left-to-right scan, separator debris cleaned after
    u = F.regexp_replace(u, r"([?&])(?:utm_[a-z]+|fbclid|gclid|ref)=[^&#]*", "$1")
    u = F.regexp_replace(u, r"&&+", "&")                  # 'a=1&&b=2' -> '&'
    u = F.regexp_replace(u, r"\?&", "?")                  # '?&x' -> '?x'
    u = F.regexp_replace(u, r"[?&]+$", "")                # dangling '?'/'&'
    return F.regexp_replace(u, r"/+$", "")                # trailing slash


def url_host(col: Column | str) -> Column:
    """The lowercased host of a URL, sharing canonicalize_url's EXACT
    repeated scheme/www alternation (VERDICT r6 #4: a single-pass scheme
    strip here turned a stacked-junk 'http://http://x.com' into host
    'http:' while the canonical key said 'x.com' — two functions claiming
    one semantics must share the prefix regex). Stripping www. keys
    'www.x.com' and 'x.com' together — what blocklists and per-domain
    quotas want (suffix rules reach the www host via host_suffixes
    regardless), and what makes the invariant a dedup/quota key needs
    hold: url_host(canonicalize_url(u)) == url_host(u), property-tested
    in tests/test_properties.py."""
    u = _c(col)
    u = F.regexp_replace(u, r"^(?:[Hh][Tt][Tt][Pp][Ss]?://|[Ww][Ww][Ww]\.)+", "")
    # '#' in the host class: url_host runs on RAW urls (no prior fragment
    # strip like canonicalize_url's), so 'x.com#sec' must not leak the
    # fragment into the host
    return F.lower(F.regexp_extract(u, r"^([^/?#]*)", 1))


def host_suffixes(col: Column | str) -> Column:
    """Every label suffix of a dotted host: 'a.b.example.com' ->
    ['a.b.example.com', 'b.example.com', 'example.com', 'com'] — the
    expansion that turns blocklist SUFFIX matching into a plain equi-join
    (explode + join on the suffix) instead of a non-equi LIKE join, which
    Spark could only execute as a nested-loop. Fan-out is bounded by the
    host's label count (~4-6), never by data volume."""
    h = _c(col)
    parts = F.split(h, r"\.")
    return F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, i, F.size(parts)), "."),
    )
