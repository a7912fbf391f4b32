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

Domain scope, stated plainly (r16, exact-host-first): robots.txt is per
ORIGIN under RFC 9309, so a document whose exact lowercased host carries
robots rows is judged by those rows ALONE — merging www/blog/apex rule
sets would let a longer Allow fetched from one host clear a page its own
host's robots.txt forbids. A document whose host has no robots row falls
back to the registered domain's merged rules
(functions/url.registered_domain_of_host — the same closed-form PSL-lite
rule the url side uses), so an apex- or mixed-case-keyed corpus
(``WWW.Example.com``) still covers its subdomain documents rather than
silently allowing everything.

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
    """Exploded rule table ``(host, domain, allow, prefix)`` from a
    one-row-per-host robots corpus. ``host`` is the corpus key
    lowercased — robots.txt is PER ORIGIN under RFC 9309, so the exact
    fetch host is the scope :func:`robots_filter` matches first;
    ``domain`` is its registered domain (functions/url.registered_
    domain_of_host — the same closed-form PSL-lite rule the url side
    uses), the conservative fallback scope for documents whose own host
    carries no robots row. Every corpus host additionally emits one
    SENTINEL row (``allow``/``prefix`` NULL) so its PRESENCE survives
    even when the agent's group yields no rules — a host whose
    robots.txt is empty for this agent allows everything and must NOT
    inherit a sibling host's rules through the domain fallback.
    Map-only Arrow parse."""
    from serverless_etl_bi_on_aws_spark.functions.url import (
        registered_domain_of_host,
    )

    @F.pandas_udf(ArrayType(_RULE))
    def _parse(s: pd.Series) -> pd.Series:
        return pd.Series([parse_robots(t, agent) for t in s])

    sentinel = F.array(
        F.struct(
            F.lit(None).cast("boolean").alias("allow"),
            F.lit(None).cast("string").alias("prefix"),
        )
    )
    return (
        robots.select(
            F.lower(F.col(domain_col)).alias("host"),
            registered_domain_of_host(domain_col, out_col="domain"),
            F.explode(F.concat(_parse(F.col(text_col)), sentinel)).alias("r"),
        )
        .select(
            "host",
            "domain",
            F.col("r.allow").alias("allow"),
            F.col("r.prefix").alias("prefix"),
        )
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
    work list). Decision per RFC 9309, scoped per ORIGIN: a document
    whose exact (lowercased) host carries robots rows is judged by
    THOSE rows alone — www, blog, and apex robots.txt are distinct
    origins, and merging them would let a longer Allow fetched from one
    host clear a page its own host's robots.txt forbids. Only a
    document whose host has NO robots row of its own falls back to the
    registered domain's merged rules (the conservative
    scope-collapsing default for apex-keyed corpora). Within the
    applicable rule set: the longest matching prefix wins, Allow beats
    Disallow at equal length; no rules or no match means allowed.
    Malformed urls (no host) are DENIED — an unattributable page cannot
    be cleared.

    Plan: host/domain/path are codegen'd expressions; the rule table
    broadcasts ONCE on the registered domain (both tiers resolve inside
    the same per-doc aggregate, no second join); the longest-match
    reduction groups on the doc id — the only exchange is proportional
    to rule matches, not the corpus."""
    if keep not in ("allowed", "denied"):
        raise ValueError(f"keep must be 'allowed' or 'denied', got {keep!r}")
    path_raw = F.try_parse_url(F.col(url_col), F.lit("PATH"))
    slim = docs.select(
        F.col(id_col).alias("__id"),
        F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST"))).alias("__host"),
        registered_domain(url_col, out_col="__dom"),
        F.when(F.coalesce(path_raw, F.lit("")) == "", F.lit("/"))
        .otherwise(path_raw)
        .alias("__path"),
    )
    r = rules.select(
        F.col("host").alias("__rhost"),
        F.col("domain").alias("__dom"),
        F.col("allow").alias("__allow"),
        F.col("prefix").alias("__prefix"),
    )
    exact = F.col("__rhost") == F.col("__host")
    match = F.col("__prefix").isNotNull() & F.col("__path").startswith(
        F.col("__prefix")
    )
    m = F.struct(
        F.length("__prefix").alias("l"), F.col("__allow").cast("int").alias("a")
    )
    decision = (
        slim.join(F.broadcast(r), "__dom", "left")
        # non-matching rules contribute NULL (ignored by max) instead of
        # being filtered — a doc must never lose ALL its rows, or a
        # rules-but-no-match domain would vanish from the decision frame
        .select(
            "__id",
            "__dom",
            # presence counts the sentinel too: a host whose robots.txt
            # yields no rules for the agent still pins the exact tier
            F.when(exact, F.lit(1)).alias("__he"),
            F.when(exact & match, m).alias("__me"),
            F.when(match, m).alias("__mf"),
        )
        .groupBy("__id")
        .agg(
            F.first("__dom").alias("__dom"),
            F.max("__he").alias("__has_exact"),
            F.max("__me").alias("__best_exact"),
            F.max("__mf").alias("__best_fb"),
        )
        .select(
            "__id",
            F.when(
                F.col("__has_exact") == 1, F.col("__best_exact")
            ).otherwise(F.col("__best_fb")).alias("__best"),
            "__dom",
        )
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
