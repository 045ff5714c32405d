"""robots.txt (Robots Exclusion Protocol) parsing + the derived per-host
robots corpus — the crawl-politeness filter every web-scale ingest runs
before fetching/keeping pages (r5, web-curation family).

Semantics implemented (the de-facto REP as specified in RFC 9309):

- groups of ``User-agent:`` lines followed by ``Allow:`` / ``Disallow:``
  rules; the group whose agent token best matches the crawler is selected
  (exact product-token match wins over ``*``; no match → everything
  allowed);
- within the selected group, the LONGEST matching path prefix decides, an
  ``Allow`` winning ties (so ``Allow: /seite/22`` overrides
  ``Disallow: /seite/2`` for ``/seite/22x``);
- an empty ``Disallow:`` value allows everything; comments (``#``) and
  unknown directives (``Crawl-delay`` etc.) are ignored.

Worldgen derivation (deterministic per site id, so the DuckDB oracle can
replay the ruleset as a CASE over the site id while the ENGINE goes
through the real text parser): sites ``s % 11 == 0`` disallow everything;
``== 3`` disallow the ``/seite/1`` prefix; ``== 7`` disallow everything
for agent ``otherbot`` but allow our agent via a ``*`` group; ``== 9``
disallow ``/seite/2`` but allow back the longer ``/seite/22`` prefix;
``== 5`` carry only a ``Crawl-delay`` (no path rules); all other sites
have no robots.txt at all.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

AGENT = "graftbot"
N_SITES = 997  # worldgen's site-id modulus (h(17, pg) % 997)


def robots_text_for_site(s: int) -> str | None:
    """The deterministic robots.txt text of site ``s`` (None = no file)."""
    m = s % 11
    if m == 0:
        return "# closed site\nUser-agent: *\nDisallow: /\n"
    if m == 3:
        return "User-agent: *\nDisallow: /seite/1\nCrawl-delay: 2\n"
    if m == 5:
        return "User-agent: *\nCrawl-delay: 5\n"
    if m == 7:
        return ("User-agent: otherbot\nDisallow: /\n\n"
                f"User-agent: *\nAllow: /\n")
    if m == 9:
        return "User-agent: *\nDisallow: /seite/2\nAllow: /seite/22\n"
    return None


def ensure_robots_parquet(world_dir: str) -> str:
    """Write (cached) ``derived/robots.parquet`` — (site, robots_txt) for
    every site that serves one."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(world_dir, "derived", "robots.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    sites, texts = [], []
    for s in range(N_SITES):
        t = robots_text_for_site(s)
        if t is not None:
            sites.append(s)
            texts.append(t)
    tmp = out + ".tmp"
    pq.write_table(pa.table({"site": pa.array(sites, pa.int64()),
                             "robots_txt": pa.array(texts, pa.string())}), tmp)
    os.replace(tmp, out)
    return out


def parse_robots(text: str, agent: str = AGENT) -> list[tuple[str, bool]]:
    """Parse robots.txt text → the selected group's [(path_prefix, allow)]
    rules for ``agent`` (longest-prefix match applies at query time).
    Returns [] when no group applies (everything allowed)."""
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_rules:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules, in_rules = [], [], False
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_rules = True
            if val == "" and key == "disallow":
                continue  # empty Disallow allows everything
            cur_rules.append((val, key == "allow"))
        # other directives (crawl-delay, sitemap, ...) ignored
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    agent_l = agent.lower()
    exact = [r for agents, r in groups if any(a == agent_l for a in agents)]
    if exact:
        return exact[0]
    star = [r for agents, r in groups if "*" in agents]
    return star[0] if star else []


def is_allowed(rules: list[tuple[str, bool]], path: str) -> bool:
    """RFC 9309 longest-match evaluation; Allow wins length ties."""
    best_len, best_allow = -1, True
    for prefix, allow in rules:
        if path.startswith(prefix):
            ln = len(prefix)
            if ln > best_len or (ln == best_len and allow and not best_allow):
                best_len, best_allow = ln, allow
    return best_allow


def allowed_mask(urls: pd.Series, site_rules: dict[int, list[tuple[str, bool]]]
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized-ish verdicts for a url batch: canonicalize host (lower,
    strip www.), pull the site id and path, evaluate the site's rules.
    Returns (site ids int64, allowed bool)."""
    low = urls.str.lower()
    site = low.str.extract(r"beispiel-([0-9]{3})\.de", expand=False).astype(np.int64)
    path = low.str.replace(r"^https?://[^/]*", "", regex=True).str.replace(
        r"\?.*$", "", regex=True)
    allowed = np.ones(len(urls), dtype=bool)
    for s, grp in pd.RangeIndex(len(urls)).to_series().groupby(site.to_numpy()):
        rules = site_rules.get(int(s))
        if not rules:
            continue
        idx = grp.to_numpy()
        allowed[idx] = [is_allowed(rules, p) for p in path.iloc[idx]]
    return site.to_numpy(np.int64), allowed
