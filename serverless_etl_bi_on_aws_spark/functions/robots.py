"""robots.txt parsing + corpus-side allow/deny filtering.

A crawl-derived corpus is expected to HONOR exclusion rules — both at
crawl time and retroactively (a takedown-adjacent obligation: when a
site's robots.txt says go away, curated copies get dropped on the next
refresh). This module implements the RFC 9309 core:

* group selection: the ``User-agent`` group matching the caller's agent
  token (case-insensitive exact token), falling back to the ``*`` group;
  consecutive agent lines share one group;
* rule matching: ``Allow``/``Disallow`` by PATH PREFIX; the
  longest-matching rule wins, an Allow beats a Disallow of equal length,
  an empty Disallow allows everything, no matching rule allows.

Deliberate subset, stated plainly: ``*`` wildcards and ``$`` anchors
inside rule paths are NOT interpreted. The fallback is conservative PER
DIRECTION — deny no less than RFC 9309 would: a wildcard-bearing
``Disallow`` is kept as the literal prefix up to the first ``*``
(matches a superset of the wildcard rule, so it can only deny MORE),
while a wildcard-bearing ``Allow`` is DROPPED entirely (truncating an
Allow would widen permissions: ``Disallow: /a`` + ``Allow: /a*x``
truncated to ``/a`` ties the Disallow at equal length and Allow wins —
allowing the whole ``/a`` subtree the RFC denies). The rule set stays
closed-form so the q105 oracle can recompute decisions from planted
arithmetic.

Domain scope, stated plainly: rule domains and document urls are both
collapsed to the lowercase REGISTERED domain
(functions/url.registered_domain_of_host — the same closed-form PSL-lite
rule the url side uses), so a robots corpus keyed by the natural fetch
key (mixed-case or full host, e.g. ``WWW.Example.com``) still matches
its documents; a per-host scope would silently drop every rule — the
unsafe direction for an exclusion-honoring filter.

Scale shape: parsing is a map-only Arrow stage over the (tiny, one row
per domain) robots corpus; the decision join broadcasts the exploded
rule table against the document corpus, and the longest-match reduction
is one groupBy on the doc key — the corpus itself never shuffles for
the broadcast probe.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from serverless_etl_bi_on_aws_spark.functions.url import registered_domain

_RULE = StructType(
    [StructField("allow", BooleanType()), StructField("prefix", StringType())]
)


def parse_robots(text: str, agent: str = "*") -> list[tuple[bool, str]]:
    """Pure-Python core: the (allow, prefix) rules applying to ``agent``
    from one robots.txt body. Tolerant: unknown directives and malformed
    lines are skipped; a specific-agent group REPLACES the ``*`` group
    (RFC 9309: the most specific group applies alone)."""
    groups: dict[str, list[tuple[bool, str]]] = {}
    current: list[str] = []
    last_was_agent = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not last_was_agent:
                current = []
            tok = val.lower()
            groups.setdefault(tok, [])
            current.append(tok)
            last_was_agent = True
            continue
        last_was_agent = False
        if key in ("allow", "disallow") and current:
            if val == "" and key == "disallow":
                continue  # empty Disallow: allows all (no rule)
            if "*" in val and key == "allow":
                continue  # truncating an Allow WIDENS it — drop (module docstring)
            prefix = val.split("*", 1)[0]  # Disallow-only conservative cut
            for tok in current:
                groups[tok].append((key == "allow", prefix))
    a = agent.lower()
    if a in groups:
        return groups[a]
    return groups.get("*", [])


def robots_rules(
    robots: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Exploded rule table ``(domain, allow, prefix)`` from a one-row-
    per-domain robots corpus. Domains whose file yields NO rules for the
    agent produce no rows (absence == allow). The domain key is
    NORMALIZED to the lowercase registered domain — the exact rule
    :func:`robots_filter` applies to the document urls — so a corpus
    keyed by the natural robots.txt fetch host (``WWW.Example.com``)
    still matches; unnormalized it would match nothing and every page
    would read as allowed. Map-only Arrow parse."""
    from serverless_etl_bi_on_aws_spark.functions.url import (
        registered_domain_of_host,
    )

    @F.pandas_udf(ArrayType(_RULE))
    def _parse(s: pd.Series) -> pd.Series:
        return pd.Series([parse_robots(t, agent) for t in s])

    return (
        robots.select(
            registered_domain_of_host(domain_col, out_col="domain"),
            F.explode(_parse(F.col(text_col))).alias("r"),
        )
        .select("domain", F.col("r.allow").alias("allow"), F.col("r.prefix").alias("prefix"))
    )


def robots_filter(
    docs: DataFrame,
    url_col: str,
    rules: DataFrame,
    id_col: str = "doc_id",
    keep: str = "allowed",
) -> DataFrame:
    """Rows of ``docs`` whose url the rule table permits (``keep=
    'allowed'``) or forbids (``keep='denied'`` — the retroactive-removal
    work list). Decision per RFC 9309: among the doc's domain rules whose
    prefix matches the url path, the longest wins, Allow beats Disallow
    at equal length; no rules or no match means allowed. Malformed urls
    (no host) are DENIED — an unattributable page cannot be cleared.

    Plan: domain + path are codegen'd expressions; the rule table
    broadcasts; the longest-match reduction groups on the doc id — the
    only exchange is proportional to rule MATCHES, not the corpus."""
    if keep not in ("allowed", "denied"):
        raise ValueError(f"keep must be 'allowed' or 'denied', got {keep!r}")
    path_raw = F.try_parse_url(F.col(url_col), F.lit("PATH"))
    slim = docs.select(
        F.col(id_col).alias("__id"),
        registered_domain(url_col, out_col="__dom"),
        F.when(F.coalesce(path_raw, F.lit("")) == "", F.lit("/"))
        .otherwise(path_raw)
        .alias("__path"),
    )
    r = rules.select(
        F.col("domain").alias("__dom"),
        F.col("allow").alias("__allow"),
        F.col("prefix").alias("__prefix"),
    )
    decision = (
        slim.join(F.broadcast(r), "__dom", "left")
        # non-matching rules contribute NULL (ignored by max) instead of
        # being filtered — a doc must never lose ALL its rows, or a
        # rules-but-no-match domain would vanish from the decision frame
        .select(
            "__id",
            "__dom",
            F.when(
                F.col("__prefix").isNotNull()
                & F.col("__path").startswith(F.col("__prefix")),
                F.struct(
                    F.length("__prefix").alias("l"),
                    F.col("__allow").cast("int").alias("a"),
                ),
            ).alias("__m"),
        )
        .groupBy("__id")
        .agg(F.first("__dom").alias("__dom"), F.max("__m").alias("__best"))
        .select(
            "__id",
            (
                F.col("__dom").isNotNull()
                & (F.col("__best").isNull() | (F.col("__best.a") == 1))
            ).alias("__allowed"),
        )
    )
    want = decision.filter(
        F.col("__allowed") if keep == "allowed" else ~F.col("__allowed")
    ).select("__id")
    return docs.join(
        want, docs[id_col] == F.col("__id"), "left_semi"
    )
