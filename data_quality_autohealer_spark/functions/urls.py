"""URL canonicalization — the crawl-curation step that collapses
tracking-parameter / fragment / case / www / trailing-slash variants of the
same resource before URL-level dedup (every web corpus pipeline runs this
ahead of refetch scheduling and exact text dedup).

No reference analogue (the reference has no URL notion); engine-paired SQL
builders in the repo's standard style so the driver's DuckDB oracle
hash-checks the operator end-to-end.

Tracking parameters are removed STRUCTURALLY — split the query string on
'&', drop params whose NAME matches the tracking list (anchored, so
``href=`` or ``xutm_source=`` are never touched), rejoin — rather than by
substring regex surgery, which corrupts look-alike param names and fails
to converge on adjacent tracking params. The default ':80' port strip
applies to http URLs only (80 is not the https default) and covers both
``:80/path`` and a bare ``:80`` authority.

Portability (CLAUDE.md regex rules): no lookarounds; no backreferences in
PATTERNS (http/https www-stripping handled as two plain alternatives) —
the authority-anchored port strip is the one place REPLACEMENT group refs
are used, emitted per engine ($1 Spark, \\1 DuckDB) since the builder
knows which dialect it is generating; special chars via character classes
([.], [?]); DuckDB regexp_replace needs the explicit 'g' flag where Spark
replaces globally by default.

The returned expression references staged sub-expressions textually more
than once (case branches); for a 10^12-row hot path, stage the
intermediate columns per the CLAUDE.md multi-reference convention — for
the oracle-checked projection this inline form is fine.
"""

from __future__ import annotations

_TRACKING = "(utm_[a-z]+|fbclid|gclid|ref)"


def canonical_url_sql(url: str, engine: str) -> str:
    """Canonical form of ``url`` (an SQL string expression), identical in
    both engines: lowercase -> strip #fragment -> structurally drop
    tracking params (name-anchored) -> drop path slash before a surviving
    '?' / drop an empty '?' -> strip default :80 port (http only) ->
    strip www. -> strip one trailing slash."""
    g = ", 'g'" if engine == "duck" else ""
    e = f"lower({url})"
    e = f"regexp_replace({e}, '#.*$', ''{g})"
    base = f"regexp_replace({e}, '[?].*$', ''{g})"
    if engine == "spark":
        query = f"regexp_extract({e}, '[?](.*)$', 1)"
        params = (f"filter(split({query}, '&'), "
                  f"p -> p != '' and not regexp_like(p, '^{_TRACKING}='))")
        kept = f"array_join({params}, '&')"
    else:
        query = f"coalesce(regexp_extract({e}, '[?](.*)$', 1), '')"
        params = (f"list_filter(string_split({query}, '&'), "
                  f"p -> p <> '' and not regexp_matches(p, '^{_TRACKING}='))")
        # array_to_string of an empty list is NULL in DuckDB (the
        # list_aggregate gotcha) — coalesce so the no-query branch fires
        kept = f"coalesce(array_to_string({params}, '&'), '')"
    e = (f"case when {kept} = '' then {base} "
         f"else concat(regexp_replace({base}, '/$', ''{g}), '?', {kept}) "
         f"end")
    # :80 is the default for http ONLY; an https://...:80 is a genuinely
    # non-default port and must stay distinct. Anchored to the AUTHORITY
    # (advice-r04): a plain substring replace of ':80/' also rewrote path
    # segments like /a:80/b and query values, wrongly merging distinct
    # URLs. The one sanctioned backref exception: group refs differ per
    # engine ($1 Spark, \1 DuckDB) but the builder knows the engine; the
    # '^http://' anchor makes the http-only case-when redundant.
    r1, r2 = ("$1", "$1$2") if engine == "spark" else (r"\1", r"\1\2")
    e = f"regexp_replace({e}, '^(http://[^/?]*):80([/?])', '{r2}'{g})"
    e = f"regexp_replace({e}, '^(http://[^/?]*):80$', '{r1}'{g})"
    e = f"regexp_replace({e}, '^http://www[.]', 'http://'{g})"
    e = f"regexp_replace({e}, '^https://www[.]', 'https://'{g})"
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


def host_sql(url: str, engine: str) -> str:
    """Authority host of ``url``, lowercased: the chars after ``scheme://``
    up to the first ``/ ? # :`` (port and userinfo-free synth URLs). '' for
    non-URL strings in both engines."""
    e = f"regexp_extract(lower({url}), '^[a-z][a-z0-9+.-]*://([^/?#:]*)', 1)"
    return f"coalesce({e}, '')"


def registered_domain_sql(host: str, engine: str) -> str:
    """Last two dot-labels of ``host`` — the registered domain under
    single-label public suffixes (.com/.org/.example). A real public-suffix
    list (co.uk etc.) is a data file this sandbox does not ship; the
    two-label rule is the deterministic stand-in and the join key contract
    is unchanged when one is swapped in. ``host`` should be a staged
    column: the split is referenced three times (CLAUDE.md
    multi-reference convention)."""
    if engine == "spark":
        parts = f"split({host}, '[.]')"
        return (f"case when size({parts}) <= 2 then {host} "
                f"else concat(element_at({parts}, -2), '.', "
                f"element_at({parts}, -1)) end")
    parts = f"string_split({host}, '.')"
    return (f"case when len({parts}) <= 2 then {host} "
            f"else {parts}[-2] || '.' || {parts}[-1] end")
