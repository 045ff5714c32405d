"""Street-name normalization — reference semantics (SURVEY.md M5-M8).

  - :func:`normalize_street_name` — country hook: RO strips a leading
    "Strada " (OSMStreet.normalizeName,
    /root/reference/src/de/regioosm/housenumbercore/util/OSMStreet.java:121-130);
    default identity.
  - :func:`street_upper_lower` — per-word Title-casing via the regex
    ``([A-ZÄÉÈÖÜĂÂÎŞŢ])([A-ZÄÉÈÖÜßĂÂÎŞŢ]*)`` with per-country force-lower /
    force-upper word lists (CsvReader.StreetToUpperLower,
    CsvReader.java:157-189; IT lists at :387-404: al, alla, alle, da, de,
    dei, del, dell, della, delle, destro, di, in, sinistro; upper: II).
  - :func:`apply_regex_corrections` — ordered regex→replacement maps per
    country (import_stadtstrassenGENERICGml.java:931-960; PL and IT maps
    reproduced below).
  - :func:`german_collation_fold` — correctorder() sort fold
    (scripts/dbinstallation/dbfunctions.sql:14-22): lower-case then
    ß→ss, ä→ae, ö→oe, ü→ue, â→a.
"""

from __future__ import annotations

import re

__all__ = [
    "normalize_street_name",
    "street_upper_lower",
    "apply_regex_corrections",
    "german_collation_fold",
    "match_key",
    "COUNTRY_CASE_LISTS",
    "COUNTRY_CORRECTIONS",
]

_WORD_RE = re.compile("([A-ZÄÉÈÖÜĂÂÎŞŢ])([A-ZÄÉÈÖÜßĂÂÎŞŢ]*)")

# CsvReader.java:387-404 (activated for countrycode IT)
COUNTRY_CASE_LISTS: dict[str, tuple[frozenset, frozenset]] = {
    "IT": (
        frozenset({"al", "alla", "alle", "da", "de", "dei", "del", "dell",
                   "della", "delle", "destro", "di", "in", "sinistro"}),
        frozenset({"II"}),
    ),
}

# import_stadtstrassenGENERICGml.java:931-960; insertion order preserved.
COUNTRY_CORRECTIONS: dict[str, list[tuple[str, str]]] = {
    "PL": [
        (r"^Al\. ", "Aleja "), (r"^dr ", "Doktora "), (r"^Gen\. ", "Generała "),
        (r"^gen\. ", "Generała "), (r"^ks\. ", "Księdza "), (r"^Ks\. ", "Księdza "),
        (r"^Os\. ", "Osiedle "), (r"^Pl\. ", "Plac "), (r"^płk\. ", "Pułkownika "),
        (r"^Ulica ", ""),
    ],
    "IT": [
        (r"Str\.", "Straße "), (r"str\.$", "straße"), (r" Str$", " Straße"),
        (r"\-Str$", "-Straße"), (r"^St\.", "St. "), (r"^St\. +", "St. "),
        (r"^St\. -", "St.-"), (r"Strasse", "Straße"), (r"strasse", "straße"),
        (r"Grosser ", "Großer "), (r"Grosse ", "Große "), (r"^Frak\. ", "Fraktion "),
        (r"^Frakt\.", "Fraktion "), (r"^Fraktion +", "Fraktion "),
        (r"Handwerkerstr\.N", "Handwerkerstraße N"), (r"Handwerkerstr\.S", "Handwerkerstraße S"),
    ],
}

_COMPILED_CORRECTIONS = {
    cc: [(re.compile(p), r) for p, r in rules] for cc, rules in COUNTRY_CORRECTIONS.items()
}


def normalize_street_name(name: str, countrycode: str = "") -> str:
    """M5 country hook (OSMStreet.java:121-130)."""
    if countrycode == "RO" and name.startswith("Strada "):
        return name[len("Strada "):]
    return name


def street_upper_lower(street: str, countrycode: str = "") -> str:
    """M6: per-word Title-case with country force lists (CsvReader.java:157-189)."""
    lowerlist, upperlist = COUNTRY_CASE_LISTS.get(countrycode, (frozenset(), frozenset()))

    def repl(m: re.Match) -> str:
        word = m.group(1) + m.group(2)
        if word.lower() in lowerlist:
            return word.lower()
        if word.upper() in upperlist:
            return word.upper()
        return m.group(1) + m.group(2).lower()

    return _WORD_RE.sub(repl, street)


def apply_regex_corrections(street: str, countrycode: str = "") -> str:
    """M7: ordered regex corrections (import_stadtstrassenGENERICGml.java:931-960).

    Each rule applied once via re.sub (first rule wins precedence by order,
    later rules still apply to the running result, matching the reference's
    sequential map application)."""
    for pat, rep in _COMPILED_CORRECTIONS.get(countrycode, ()):
        street = pat.sub(rep, street)
    return street


_FOLD_TABLE = str.maketrans({"ß": "ss", "ä": "ae", "ö": "oe", "ü": "ue", "â": "a"})


def german_collation_fold(text: str) -> str:
    """M8: correctorder() (dbfunctions.sql:14-22) — lower() first, then the
    replacements (the SQL applies them to the lower-cased string; the extra
    Ä/Ö/Ü branches in the SQL are no-ops after lower())."""
    return text.lower().translate(_FOLD_TABLE)


def match_key(name: str, countrycode: str = "") -> str:
    """The engine's street join key: country normalization + collation fold.

    This is the Ray-side analog of the reference's street dictionary id
    (strasse table, dbstructure.sql:103-110) — the normalized NAME is the key,
    no global mutable id dictionary (SURVEY.md §1.1)."""
    return german_collation_fold(normalize_street_name(name, countrycode)).strip()
