"""URL handling for web-corpus curation: component extraction, domain
rollup keys, and tracking-parameter canonicalization.

Spark ships ``parse_url`` (Hive-compatible), but these helpers are
implemented as plain regexps on purpose: the exact same patterns run in
DuckDB (RE2) for the oracle gate, and regexps keep the whole expression
inside whole-stage codegen — URL normalization is a map pass over every
crawled page at 100 TB, so it must stay JVM-side and narrow (no UDFs, no
shuffle). Patterns deliberately use no lookaround (Java ∩ RE2 subset).

Canonicalization (strip_tracking_params + lowercase host) is the
standard pre-dedup step for web corpora: the same page reached via
campaign links would otherwise survive URL-exact dedup.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_host(url: Column | str) -> Column:
    """Hostname, lowercased. Accepts any-scheme case ('HTTP://…' is
    legal per RFC 3986) and scheme-relative '//host/…' forms — a crawl
    corpus carries both, and returning '' would lump every such URL
    into one empty-host bucket in per-site caps and crawl stats."""
    return F.lower(
        F.regexp_extract(
            _c(url), r"^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//([^/?#]+)", 1
        )
    )


def url_path(url: Column | str) -> Column:
    """Path component ('' when absent)."""
    return F.regexp_extract(
        _c(url), r"^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//[^/?#]+([^?#]*)", 1
    )


def url_param(url: Column | str, name: str) -> Column:
    """Value of one query parameter ('' when absent). ``name`` is a
    literal identifier, not a pattern."""
    return F.regexp_extract(_c(url), r"[?&]" + name + r"=([^&#]*)", 1)


def registered_domain(url: Column | str) -> Column:
    """Last two host labels — the domain-level rollup key for crawl
    stats and per-site caps (a public-suffix list refines multi-label
    TLDs; two labels is the standard cheap approximation)."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def strip_tracking_params(url: Column | str) -> Column:
    """Remove utm_*/ref query parameters, preserving the rest of the
    query string and fragment-free tail. Two-pass regexp, both passes
    ANCHORED on a '?'/'&' separator — an unanchored 'ref=' would match
    MID-param ('?href=x&…' → corrupted to '?hx&…'): (1) fold a RUN of
    tracked params each followed by another param, keeping the leading
    separator, (2) drop a trailing tracked param with its separator."""
    c = _c(url)
    step1 = F.regexp_replace(
        c, r"([?&])(?:(?:utm_[a-z]+|ref)=[^&#]*&)+", r"$1"
    )
    return F.regexp_replace(step1, r"[?&](utm_[a-z]+|ref)=[^&#]*", "")


def canonical_url(url: Column | str) -> Column:
    """Tracking-stripped URL with lowercased scheme+host (path and query
    case preserved — they are case-significant)."""
    stripped = strip_tracking_params(url)
    head = F.lower(
        F.regexp_extract(
            stripped, r"^((?:[A-Za-z][A-Za-z0-9+.-]*:)?//[^/?#]+)", 1
        )
    )
    tail = F.regexp_replace(
        stripped, r"^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//[^/?#]+", ""
    )
    return F.concat(head, tail)
