"""robots.txt REP parser (r5): group selection, longest-prefix match,
Allow tie-break — the web_robots_filter engine side."""

from housenumbercore_ray.sources.robots import is_allowed, parse_robots


def test_group_selection_exact_beats_star():
    text = ("User-agent: graftbot\nDisallow: /private\n\n"
            "User-agent: *\nDisallow: /\n")
    rules = parse_robots(text, agent="graftbot")
    assert is_allowed(rules, "/public/x")
    assert not is_allowed(rules, "/private/x")


def test_group_selection_falls_back_to_star():
    text = "User-agent: otherbot\nDisallow: /\n\nUser-agent: *\nAllow: /\n"
    rules = parse_robots(text, agent="graftbot")
    assert is_allowed(rules, "/anything")


def test_no_matching_group_allows_everything():
    text = "User-agent: otherbot\nDisallow: /\n"
    assert parse_robots(text, agent="graftbot") == []
    assert is_allowed([], "/x")


def test_longest_match_allow_override():
    rules = parse_robots("User-agent: *\nDisallow: /seite/2\nAllow: /seite/22\n")
    assert not is_allowed(rules, "/seite/2")
    assert not is_allowed(rules, "/seite/21")
    assert is_allowed(rules, "/seite/22")
    assert is_allowed(rules, "/seite/224")
    assert is_allowed(rules, "/other")


def test_allow_wins_length_ties():
    rules = [("/a", False), ("/a", True)]
    assert is_allowed(rules, "/a/x")


def test_empty_disallow_and_comments_ignored():
    text = ("# politeness file\nUser-agent: *\n"
            "Disallow:\nCrawl-delay: 5\nSitemap: https://x/s.xml\n")
    rules = parse_robots(text)
    assert rules == []
    assert is_allowed(rules, "/any")


def test_multiple_agent_lines_share_group():
    text = "User-agent: a\nUser-agent: graftbot\nDisallow: /x\n"
    rules = parse_robots(text, agent="graftbot")
    assert not is_allowed(rules, "/xyz")
    assert is_allowed(rules, "/y")


def test_case_insensitive_directives_and_agent():
    text = "USER-AGENT: GraftBot\nDISALLOW: /q\n"
    rules = parse_robots(text, agent="graftbot")
    assert not is_allowed(rules, "/q/1")


def test_frontier_schedule_waves(ray_session):
    """Wave assignment: ≤ per_wave pages per (host, wave); waves dense from
    0; disallowed pages absent; frontier order is page-id order."""
    from housenumbercore_ray.pipelines.corpus import (
        web_frontier_schedule,
        web_robots_filter,
    )
    from housenumbercore_ray.sources.worldgen import ensure_world_scale

    wd = ensure_world_scale("sf0.001")
    sched = web_frontier_schedule(wd).to_pandas()
    verdicts = web_robots_filter(wd).to_pandas()
    assert len(sched) == int(verdicts["allowed"].sum())
    per = sched.groupby(["site", "wave"]).size()
    assert (per <= 8).all()
    for site, g in sched.groupby("site"):
        waves = sorted(g["wave"].unique())
        assert waves == list(range(len(waves)))
        full = g["wave"].value_counts()
        # every wave except the last is full
        assert (full[full.index != max(waves)] == 8).all()
