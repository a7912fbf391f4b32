"""URL canonicalization (X5 extension, round 14) — the crawl-pipeline
primitive in front of URL-level dedup: the same page arrives under many
surface forms (scheme/host case, default ports, ``www.``, tracking
params, param order, trailing slash, fragments), and a corpus that
dedups on the RAW url keeps them all.

The rule set is closed-form so an independent oracle can recompute it:

  1. scheme and host lowercase; a leading ``www.`` strips;
  2. the port drops when it is the scheme's default (``:80`` http,
     ``:443`` https) and is kept otherwise;
  3. the path keeps its case (paths are case-sensitive per RFC 3986),
     loses trailing slashes (except the bare root ``/``), and an empty
     path becomes ``/``;
  4. query params split on ``&``: empties and TRACKING params drop
     (``utm_*`` and the click-id set below), the survivors sort
     byte-wise and re-join — param order never distinguishes pages;
  5. the fragment always drops (client-side only).

Entirely JVM-side Spark expressions — ``parse_url`` + array functions,
no UDF anywhere, so canonicalizing 100 TB of urls is a codegen'd scan.
The split array feeds the higher-order filter as its INPUT (evaluated
once per row); nothing data-dependent sits inside the lambda itself
(HOF lambdas are interpreted and re-evaluate inline expressions per
element — see functions/text.py's notes).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: tracking/click-id query parameters that never distinguish pages:
#: the utm_* campaign family plus the common platform click ids.
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid)(=.*)?$"


#: multi-label public suffixes (PSL-lite): the common two-label suffixes
#: under which the registered domain is THREE labels. A closed-form,
#: documented subset of the Public Suffix List — swap in the full PSL as
#: a broadcast lookup when exactness beyond these ccTLD families matters;
#: the rule's shape (suffix match -> label count) is unchanged.
TWO_LABEL_SUFFIXES = frozenset(
    {
        "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
        "com.au", "net.au", "org.au", "edu.au", "gov.au",
        "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
        "com.br", "net.br", "org.br", "gov.br",
        "co.in", "net.in", "org.in", "gen.in", "firm.in",
        "com.cn", "net.cn", "org.cn", "gov.cn",
        "co.nz", "net.nz", "org.nz",
        "co.za", "org.za", "net.za",
        "com.mx", "org.mx", "net.mx",
        "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
        "co.kr", "or.kr", "co.th", "co.id", "com.my",
    }
)


def registered_domain(url_col: str | Column, out_col: str = "domain") -> Column:
    """Column expression: the REGISTERED domain of a url — the unit
    domain-level curation groups and blocks on (``a.b.news.co.uk`` and
    ``news.co.uk`` are the same publisher; ``news.co.uk`` and
    ``other.co.uk`` are not).

    Rule (closed-form so the oracle can recompute it): lowercase host;
    if the last TWO labels form a known multi-label public suffix
    (:data:`TWO_LABEL_SUFFIXES`) and a third label exists, the
    registered domain is the last THREE labels, else the last TWO; a
    single-label host (``localhost``) is itself. Malformed urls (no
    parseable host) yield NULL. Entirely JVM-side — try_parse_url +
    split/slice/array_join, codegen'd, no UDF."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return registered_domain_of_host(
        F.try_parse_url(c, F.lit("HOST")), out_col=out_col
    )


def registered_domain_of_host(host_col: str | Column, out_col: str = "domain") -> Column:
    """:func:`registered_domain` for a column that is already a HOST
    string (no scheme/path) — the normalization every host-keyed corpus
    (robots.txt fetch keys, blocklists, server logs) must share with the
    url side before joining, or mixed-case / full-host keys silently
    match nothing. Same closed-form rule: lowercase, PSL-lite label
    collapse; NULL/empty hosts yield NULL."""
    c = F.col(host_col) if isinstance(host_col, str) else host_col
    host = F.lower(c)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    dom = (
        F.when(
            (n >= 3) & last2.isin(*sorted(TWO_LABEL_SUFFIXES)),
            F.array_join(F.slice(labels, -3, 3), "."),
        )
        .when(n >= 2, last2)
        .otherwise(host)
    )
    return F.when(host.isNotNull() & (host != ""), dom).alias(out_col)


def canonicalize_url(url_col: str | Column, out_col: str = "canon_url") -> Column:
    """Column expression: the canonical form of ``url_col`` under the
    module's rule set. Malformed urls (no parseable host) yield NULL —
    callers decide whether to quarantine or pass them through
    (``try_parse_url`` — Spark 4's ``parse_url`` THROWS on invalid urls
    and would kill the scan on one bad row)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    scheme = F.lower(F.coalesce(F.try_parse_url(c, F.lit("PROTOCOL")), F.lit("http")))
    raw_host = F.try_parse_url(c, F.lit("HOST"))
    host = F.regexp_replace(F.lower(raw_host), r"^www\.", "")
    auth = F.coalesce(F.try_parse_url(c, F.lit("AUTHORITY")), F.lit(""))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    port_part = F.when(
        (port != "") & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    raw_path = F.coalesce(F.try_parse_url(c, F.lit("PATH")), F.lit(""))
    trimmed = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)
    params = F.split(F.coalesce(F.try_parse_url(c, F.lit("QUERY")), F.lit("")), "&")
    kept = F.array_sort(
        F.filter(
            params,
            lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qstr = F.array_join(kept, "&")
    query_part = F.when(
        qstr != "", F.concat(F.lit("?"), qstr)
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), host, port_part, path, query_part)
    return F.when(raw_host.isNotNull() & (raw_host != ""), canon).alias(out_col)
