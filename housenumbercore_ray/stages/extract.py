"""Candidate extraction from web pages (stage 1 of the flagship pipeline).

The reference ingests official lists and OSM extracts; the north star recasts
the OSM observation side as Common-Crawl-style web pages: each page's text
may mention addresses. This stage is the "stateful actor-pool map_batches
over zero-copy Arrow" extractor:

  - ``extract_text`` — html → plain text; per-row invariant: byte-identical
    text per url (verified in tests against the ``text`` column).
  - :class:`CandidateExtractor` — compiled-regex scan per page emitting one
    row per address mention.

Mention grammar (worldgen._mention)::

    Adresse: <street> <hnr>, <plz> <muni> (<lat>,<lon>) [k=v;k=v]

Regexes are compiled ONCE per actor in ``__init__`` and reused per batch.
"""

from __future__ import annotations

import re

import pyarrow as pa

MENTION_PATTERN = (
    r"Adresse: ([A-Za-zÄÖÜäöüß .\-]+?) ([0-9][^,]*?), "
    r"([0-9]{5}) ([A-Za-zÄÖÜäöüß .\-]+?) "
    r"\((-?[0-9]+\.[0-9]+),(-?[0-9]+\.[0-9]+)\)(?: \[([^\]]*)\])?"
)

_P_BLOCK = re.compile(r"<p>(.*?)</p>", re.S)
_TAG = re.compile(r"<[^>]+>")


def extract_text(html: bytes) -> str:
    """Deterministic html → text. ``<p>`` blocks joined by newlines; generic
    tag-strip fallback for non-paragraph markup.

    Fast path: when the document is exactly a flat ``<p>``-sequence (the
    dominant shape), a string split replaces the DOTALL regex — ~6× faster;
    any other markup falls back to the regex scan with identical output
    (the byte-identical-text test pins equivalence)."""
    s = html.decode("utf-8", errors="replace")
    if s.startswith("<html><body><p>") and s.endswith("</p></body></html>"):
        inner = s[len("<html><body><p>"):-len("</p></body></html>")]
        if "<" not in inner.replace("</p><p>", ""):
            return "\n".join(inner.split("</p><p>"))
    blocks = _P_BLOCK.findall(s)
    if blocks:
        return "\n".join(blocks)
    return _TAG.sub("", s).strip()


CANDIDATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("cand_seq", pa.int64()),
        ("street_raw", pa.string()),
        ("hnr_raw", pa.string()),
        ("plz", pa.string()),
        ("muni_raw", pa.string()),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
        ("tags_text", pa.string()),
    ]
)


class CandidateExtractor:
    """Actor-pool stage: (url, html) batches → candidate rows.

    State (compiled automata) built once per actor; __call__ is per batch.
    The per-string regex scan is inherently per-row, but all surrounding
    work (decode, assembly) is batched and output is a single Arrow table
    per batch (no Python row dicts)."""

    #: literal that every mention contains — a C-speed bytes containment
    #: check on the RAW html skips decode + text-extract + regex for the
    #: (majority of) pages with zero mentions.
    #:
    #: SCOPE (ADVICE r2): the check is sound only for markup in which the
    #: literal never spans a tag boundary — true for this corpus's page
    #: contract (flat ``<p>`` blocks; worldgen never splits a mention
    #: across tags), but NOT for arbitrary html: tag-strip merges text
    #: runs, so ``Adre<b>sse:</b>`` extracts to ``Adresse:`` while the raw
    #: bytes lack the literal. General-crawl callers must construct the
    #: stage with ``prefilter=False`` (the mention regex then runs on every
    #: extracted text — exact, just without the skip).
    PREFILTER = b"Adresse:"

    def __init__(self, prefilter: bool = True) -> None:
        self.mention = re.compile(MENTION_PATTERN)
        self.prefilter = prefilter

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        out = {name: [] for name in CANDIDATE_SCHEMA.names}
        for url, html in zip(urls, htmls):
            if self.prefilter and self.PREFILTER not in html:
                continue
            text = extract_text(html)
            for seq, m in enumerate(self.mention.finditer(text)):
                out["url"].append(url)
                out["cand_seq"].append(seq)
                out["street_raw"].append(m.group(1))
                out["hnr_raw"].append(m.group(2))
                out["plz"].append(m.group(3))
                out["muni_raw"].append(m.group(4))
                out["lat"].append(float(m.group(5)))
                out["lon"].append(float(m.group(6)))
                out["tags_text"].append(m.group(7) or "")
        return pa.Table.from_pydict(out, schema=CANDIDATE_SCHEMA)


class TextExtractor:
    """html → (url, text) — used for the byte-identical-text invariant check
    and as a standalone text-extraction stage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [extract_text(h) for h in batch["html"].to_pylist()]
        return pa.table({"url": batch["url"], "extracted_text": pa.array(texts, pa.string())})


def parse_tags_text(tags_text: str) -> list[tuple[str, str]]:
    """'k1=v1;k2=v2' → ordered pairs ([] for empty)."""
    if not tags_text:
        return []
    out = []
    for part in tags_text.split(";"):
        k, _, v = part.partition("=")
        out.append((k, v))
    return out
