"""Kölner Phonetik (Postel 1969) — the German phonetic key.

The reference engine matches street names by exact normalized equality
(reference src/de/regioosm/housenumbercore/util/Street.java normalization
chain); the phonetic key is the standard German-language extension for
matching misspelled official names ("Maier Weg" vs "Meyer Weg") without
an edit-distance pass. Published algorithm (de.wikipedia Kölner Phonetik;
Postel, "Die Kölner Phonetik", IBM-Nachrichten 19, 1969).

Contract (mirrored digit-for-digit by the SQL oracle replay):
  1. lowercase; ä→a, ö→o, ü→u, ß→s; drop every char outside a-z;
  2. per-char code with one-char context (prev, next) per the Postel
     table (H silent; C/D/T/P/X context rules);
  3. collapse adjacent equal digits over the concatenated code string
     (multi-char code '48' participates char-wise, as in the reference
     implementations);
  4. drop every '0' except at position 1.
Empty/garbage input → empty key.
"""

from __future__ import annotations

import numpy as np

_VOWELS = set("aeijouy")
_UMLAUT = str.maketrans({"ä": "a", "ö": "o", "ü": "u", "ß": "s"})


def _clean(name: str) -> str:
    s = name.lower().translate(_UMLAUT)
    return "".join(c for c in s if "a" <= c <= "z")


_CSZ = set("csz")
_C_INITIAL4 = set("ahkloqrux")
_C_INNER4 = set("ahkoqux")
_CKQ = set("ckq")
_SZ = set("sz")


def _char_code(cur: str, prev: str, nxt: str, first: bool) -> str:
    # prev/nxt may be "" at the word edges: set membership (NOT `in str`,
    # where "" matches everything) keeps the edge cases honest
    if cur in _VOWELS:
        return "0"
    if cur == "h":
        return ""
    if cur == "b":
        return "1"
    if cur == "p":
        return "3" if nxt == "h" else "1"
    if cur in ("d", "t"):
        return "8" if nxt in _CSZ else "2"
    if cur in ("f", "v", "w"):
        return "3"
    if cur in ("g", "k", "q"):
        return "4"
    if cur == "c":
        if first:
            return "4" if nxt in _C_INITIAL4 else "8"
        if prev in _SZ:
            return "8"
        return "4" if nxt in _C_INNER4 else "8"
    if cur == "x":
        return "8" if prev in _CKQ else "48"
    if cur == "l":
        return "5"
    if cur in ("m", "n"):
        return "6"
    if cur == "r":
        return "7"
    if cur in ("s", "z"):
        return "8"
    return ""  # unreachable after _clean


def koelner_phonetik(name: str) -> str:
    s = _clean(name)
    raw = "".join(
        _char_code(c, s[i - 1] if i else "", s[i + 1] if i + 1 < len(s) else "",
                   i == 0)
        for i, c in enumerate(s)
    )
    out: list[str] = []
    for c in raw:
        if not out or out[-1] != c:
            out.append(c)
    collapsed = "".join(out)
    if not collapsed:
        return ""
    return collapsed[0] + collapsed[1:].replace("0", "")


def phonetik_array(names) -> np.ndarray:
    """Vectorized-enough encode: the per-name Python loop is the contract —
    callers apply it to DISTINCT names (vocabulary-bounded after a
    groupby), never to raw per-row street columns."""
    return np.array([koelner_phonetik(str(n)) for n in names], dtype=object)
