"""URL canonicalization — the crawl-curation step that collapses
tracking-parameter / fragment / case / www / trailing-slash variants of the
same resource before URL-level dedup (every web corpus pipeline runs this
ahead of refetch scheduling and exact text dedup).

No reference analogue (the reference has no URL notion); engine-paired SQL
builders in the repo's standard style so the driver's DuckDB oracle
hash-checks the operator end-to-end.

Portability (CLAUDE.md regex rules): no lookarounds, no backreferences
(http/https www-stripping handled as two plain alternatives), special chars
via character classes ([.], [?]); DuckDB regexp_replace needs the explicit
'g' flag where Spark replaces globally by default.
"""

from __future__ import annotations

_TRACKING = "(utm_[a-z]+|fbclid|gclid|ref)"


def canonical_url_sql(url: str, engine: str) -> str:
    """Canonical form of ``url`` (an SQL string expression), identical in
    both engines: lowercase -> strip #fragment -> strip tracking params
    (mid-query then query-final) -> drop empty '?' -> drop path slash
    before '?' -> strip default :80 port -> strip www. -> strip one
    trailing slash."""
    g = ", 'g'" if engine == "duck" else ""
    e = f"lower({url})"
    e = f"regexp_replace({e}, '#.*$', ''{g})"
    e = f"regexp_replace({e}, '{_TRACKING}=[^&]*&', ''{g})"
    e = f"regexp_replace({e}, '[?&]{_TRACKING}=[^&]*$', ''{g})"
    e = f"regexp_replace({e}, '[?]$', ''{g})"
    e = f"regexp_replace({e}, '/[?]', '?'{g})"
    # plain substring replace: also hits a literal ':80/' inside a path
    # segment — accepted (rare, and a canonicalizer may normalize it);
    # a backref-free authority-only variant would need scheme-specific
    # alternation for no practical gain
    e = f"replace({e}, ':80/', '/')"
    e = (f"regexp_replace({e}, '^http://www[.]', 'http://'{g})")
    e = (f"regexp_replace({e}, '^https://www[.]', 'https://'{g})")
    e = f"regexp_replace({e}, '/$', ''{g})"
    return e


def derived_url_sql(engine: str, id_col: str = "doc_id") -> str:
    """Deterministic synthetic URL per doc id (documents.parquet has no url
    column — the url_quality convention) with case / www / trailing-slash /
    tracking-param / fragment variants engineered in, so canonicalization
    visibly collapses distinct raw URLs into shared canonical groups."""
    if engine == "spark":
        def s(x: str) -> str:
            return f"cast({x} as string)"
    else:
        def s(x: str) -> str:
            return f"({x})::varchar"
    # host/path moduli (7, 3) are coprime to every variant modulus
    # (2, 4, 5), so each canonical group really mixes scheme / www /
    # slash / tracking / fragment variants of the same resource
    return (
        "concat("
        f"case when {id_col} % 2 = 0 then 'HTTP://' else 'http://' end, "
        f"case when {id_col} % 5 = 0 then 'www.' else '' end, "
        f"'host', {s(f'{id_col} % 7')}, '.example', "
        f"'/p/', {s(f'{id_col} % 3')}, "
        f"case when {id_col} % 2 = 0 then '/' else '' end, "
        f"case when {id_col} % 4 = 0 then '?utm_source=feed' "
        f"     when {id_col} % 4 = 1 then "
        f"concat('?utm_campaign=a&id=', {s(f'{id_col} % 3')}) "
        f"     when {id_col} % 4 = 2 then concat('?id=', {s(f'{id_col} % 3')}) "
        f"     else '' end, "
        f"case when {id_col} % 5 = 0 then '#section' else '' end)"
    )
