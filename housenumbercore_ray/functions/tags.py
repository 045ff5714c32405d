"""OSM tag utilities: hstore text codec (M10) and tag-priority selection (M11).

  - :func:`parse_hstore` / :func:`format_hstore` — the ``"k"=>"v", …`` text
    form (reference parser: de/zalando/typemapper/postgres/HStore.java:24-371;
    formatter: HousenumberList.storeToDB:404-413). Only needed at the edges —
    inside the engine tags are Arrow ``map<string,string>`` columns.
  - :func:`select_tag_priority` — pick the single most informative tag per
    address object (Workcache_Entry.set_osm_tag:387-450):
    entrance=yes|main|home → 1; building=entrance → 1;
    building=yes|office|apartments → 2; other building=* → 9; amenity=* → 20;
    anything else → 99 (no tag selected). Lower number wins; on ties the
    FIRST tag in iteration order wins (strict ``<`` comparison in the
    reference). The reference iterates a Java HashMap (order undefined); we
    iterate the tag map in its stored order, which is deterministic for Arrow
    map columns.
"""

from __future__ import annotations

START_PRIO = 99
UNSET_PRIO = 9999

__all__ = ["parse_hstore", "format_hstore", "select_tag_priority", "tag_prio"]


def tag_prio(key: str, value: str) -> int:
    if key == "amenity":
        return 20
    if key == "building":
        if value == "entrance":
            return 1
        if value in ("yes", "office", "apartments"):
            return 2
        return 9
    if key == "entrance" and value in ("yes", "main", "home"):
        return 1
    return START_PRIO


def select_tag_priority(tags) -> tuple[str, int]:
    """→ (selected ``"k"=>"v"`` string or "", priority). ``tags`` is an
    ordered iterable of (key, value) pairs or a dict."""
    items = tags.items() if hasattr(tags, "items") else tags
    best_prio = START_PRIO
    selected = ""
    for k, v in items:
        p = tag_prio(k, v)
        if p < best_prio:
            best_prio = p
            selected = f'"{k}"=>"{v}"'
    return selected, best_prio


def parse_hstore(text: str) -> dict[str, str]:
    """Minimal hstore text parser: ``"k"=>"v", "k2"=>"v2"`` with ``\\"`` and
    ``\\\\`` escapes and NULL values (dropped)."""
    out: dict[str, str] = {}
    i, n = 0, len(text)

    def read_quoted(i: int) -> tuple[str, int]:
        assert text[i] == '"'
        i += 1
        buf = []
        while i < n:
            ch = text[i]
            if ch == "\\" and i + 1 < n:
                buf.append(text[i + 1])
                i += 2
                continue
            if ch == '"':
                return "".join(buf), i + 1
            buf.append(ch)
            i += 1
        raise ValueError("unterminated quoted string in hstore text")

    while i < n:
        while i < n and text[i] in " ,\t\n":
            i += 1
        if i >= n:
            break
        key, i = read_quoted(i)
        while i < n and text[i] in " \t":
            i += 1
        if text[i:i + 2] != "=>":
            raise ValueError(f"expected => at position {i}")
        i += 2
        while i < n and text[i] in " \t":
            i += 1
        if text[i:i + 4].upper() == "NULL":
            i += 4
            continue
        val, i = read_quoted(i)
        out[key] = val
    return out


def format_hstore(tags) -> str:
    items = tags.items() if hasattr(tags, "items") else tags

    def q(s: str) -> str:
        return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'

    return ", ".join(f"{q(k)}=>{q(v)}" for k, v in items)
