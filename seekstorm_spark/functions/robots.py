"""robots.txt crawl filtering (RFC 9309).

A Common-Crawl-style acquisition pipeline filters fetched pages
against each host's robots rules before anything downstream sees
them. This module implements the published Robots Exclusion Protocol
(RFC 9309) matching semantics:

* group selection by ``User-agent`` — longest case-insensitive
  product-token match, ``*`` as fallback; consecutive user-agent
  lines share one group;
* ``Allow`` / ``Disallow`` path rules with ``*`` (any sequence) and
  ``$`` (end anchor) wildcards;
* rule precedence: the LONGEST (most-octets) matching pattern wins;
  on a tie, ``Allow`` wins; no matching rule ⇒ allowed;
* an empty ``Disallow:`` value matches nothing (allows everything).

Spark surface: robots documents live in a small per-host table (one
row per host — crawls carry ~1 robots.txt per domain, millions of
hosts vs billions of pages), broadcast-joined onto the pages and
evaluated in an Arrow-batched UDF with the parsed rule list cached
per robots text. Shuffle-free on the page side.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

# ---------------------------------------------------------------------------
# parsing


_UA_TOKEN_RE = re.compile(r"[a-z0-9_-]+")


def _ua_token(value: str) -> str:
    """Leading product token of a ``User-agent`` line value
    (RFC 9309 §2.2.1 ignores trailing version/comment text, e.g.
    ``googlebot/2.1`` → ``googlebot``)."""
    m = _UA_TOKEN_RE.match(value)
    return m.group(0) if m else ""


def _ua_matches(token: str, agent_l: str) -> bool:
    """Case-insensitive match of a group's product token against the
    crawler's user-agent string, anchored at a product-token BOUNDARY
    (start of string or after a non-token char) — a raw substring
    test would let ``oo`` match ``foobot`` mid-token."""
    start = 0
    while True:
        i = agent_l.find(token, start)
        if i < 0:
            return False
        if i == 0 or not _UA_TOKEN_RE.match(agent_l[i - 1]):
            return True
        start = i + 1


def parse_robots(
    text: str | None, agent: str = "*"
) -> tuple[tuple[str, bool], ...]:
    """Rules governing ``agent``: a tuple of ``(path_pattern, allow)``.
    Group selection per RFC 9309 §2.2.1: the longest case-insensitive
    product-token match for ``agent`` wins, else the ``*`` groups,
    else no rules (everything allowed). Rules are MERGED across ALL
    groups that match at the winning specificity (robots.txt files
    with repeated ``User-agent: *`` sections are common in the wild
    and the RFC combines them)."""
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_rules = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_rules = False
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_rules = True
            if val:  # empty Disallow/Allow matches nothing
                cur_rules.append((val, key == "allow"))
            elif not cur_agents:
                continue
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))

    a = (agent or "*").lower()
    best_len = -1
    for agents, _rules in groups:
        for g in agents:
            if g == "*":
                continue
            tok = _ua_token(g)
            if tok and _ua_matches(tok, a) and len(tok) > best_len:
                best_len = len(tok)
    merged: list[tuple[str, bool]] = []
    if best_len >= 0:
        for agents, rules in groups:
            if any(
                g != "*"
                and len(_ua_token(g)) == best_len
                and _ua_matches(_ua_token(g), a)
                for g in agents
            ):
                merged.extend(rules)
    else:
        for agents, rules in groups:
            if "*" in agents:
                merged.extend(rules)
    return tuple(merged)


def _pattern_regex(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(part) for part in body.split("*"))
    return re.compile("^" + rx + ("$" if anchored else ""))


@lru_cache(maxsize=4096)
def _compiled(pattern: str) -> re.Pattern:
    return _pattern_regex(pattern)


def robots_allowed(
    path: str, rules: tuple[tuple[str, bool], ...]
) -> bool:
    """RFC 9309 §2.2.2 precedence: among matching rules the longest
    pattern wins; ties go to Allow; no match ⇒ allowed."""
    best_len = -1
    best_allow = True
    for pattern, allow in rules:
        if _compiled(pattern).match(path):
            n = len(pattern)
            if n > best_len or (n == best_len and allow and not best_allow):
                best_len, best_allow = n, allow
    return best_allow


_PATH_RE = re.compile(r"^[a-z][a-z0-9+.-]*://[^/?#]*", re.I)


def url_path(url: str) -> str:
    """Path + query of ``url`` (the robots match target); '/' when
    empty."""
    rest = _PATH_RE.sub("", (url or "").strip())
    rest = rest.split("#", 1)[0]
    return rest if rest.startswith("/") else "/" + rest


# ---------------------------------------------------------------------------
# Spark surface

_RULES_CACHE: dict[tuple[str, str], tuple] = {}


def _rules_for(text: str, agent: str) -> tuple:
    key = (text, agent)
    rules = _RULES_CACHE.get(key)
    if rules is None:
        if len(_RULES_CACHE) > 8192:
            _RULES_CACHE.clear()
        rules = parse_robots(text, agent)
        _RULES_CACHE[key] = rules
    return rules


def robots_allowed_udf(agent: str = "*"):
    """(url, robots_txt) → allowed — Arrow-batched; the parsed rule
    list is cached per distinct robots text (one per host)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BooleanType())
    def _allowed(urls: pd.Series, robots: pd.Series) -> pd.Series:
        out = []
        for url, txt in zip(urls, robots):
            if txt is None:
                out.append(True)  # no robots.txt fetched ⇒ allowed
            else:
                out.append(
                    robots_allowed(url_path(url), _rules_for(txt, agent))
                )
        return pd.Series(out, dtype=bool)

    return _allowed


def filter_by_robots(
    pages: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    robots_col: str = "robots_txt",
    agent: str = "*",
    keep_flag: bool = False,
) -> DataFrame:
    """Filter crawled pages against per-host robots rules: broadcast
    the (host, robots_txt) table onto the pages (page side stays
    shuffle-free), evaluate RFC 9309 matching in one Arrow-batched
    pass. Pages of hosts with no robots row are allowed.
    ``keep_flag=True`` returns every page with an ``allowed`` column
    instead of filtering."""
    joined = pages.join(
        F.broadcast(robots.select(host_col, robots_col)),
        on=host_col,
        how="left",
    )
    flagged = joined.withColumn(
        "allowed",
        robots_allowed_udf(agent)(F.col(url_col), F.col(robots_col)),
    ).drop(robots_col)
    if keep_flag:
        return flagged
    return flagged.filter(F.col("allowed")).drop("allowed")
