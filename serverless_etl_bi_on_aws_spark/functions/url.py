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
