"""WARC/1.0 writer (r5): record round trip, length arithmetic, shard
offsets — the web_warc_export engine side."""

import numpy as np
import pandas as pd
import pytest

from housenumbercore_ray.sources.warc import build_record, parse_record, warc_date


def test_record_round_trip():
    payload = b"<html>\x00\xff binary ok</html>"
    rec = build_record("https://x.de/seite/7", pd.Timestamp("2024-03-01 12:34:56"), payload)
    fields, got = parse_record(rec)
    assert got == payload
    assert fields["WARC-Type"] == "response"
    assert fields["WARC-Target-URI"] == "https://x.de/seite/7"
    assert fields["WARC-Date"] == "2024-03-01T12:34:56Z"
    assert int(fields["Content-Length"]) == len(payload)


def test_warc_date_fixed_width():
    assert len(warc_date(pd.Timestamp("2024-01-05 00:00:00"))) == 20


def test_parse_rejects_bad_version_and_trailer():
    with pytest.raises(ValueError):
        parse_record(b"WARC/0.9\r\n\r\n\r\n\r\n")
    rec = build_record("u", pd.Timestamp("2024-01-01"), b"abc")
    with pytest.raises(ValueError):
        parse_record(rec[:-1])  # truncated trailer


def test_export_offsets_contiguous(ray_session):
    """Within each shard, offsets in page-id order are the exact cumulative
    record lengths — a shard file written in that order is gapless."""
    from housenumbercore_ray.pipelines.corpus import web_warc_export
    from housenumbercore_ray.sources.worldgen import ensure_world_scale

    wd = ensure_world_scale("sf0.001")
    m = web_warc_export(wd).to_pandas()
    assert m["url"].is_unique and len(m) > 0
    m["page_id"] = m["url"].str.extract(r"/seite/([0-9]+)", expand=False).astype(np.int64)
    for shard, g in m.groupby("shard"):
        g = g.sort_values("page_id")
        want = np.concatenate([[0], np.cumsum(g["record_length"].to_numpy())[:-1]])
        assert (g["offset"].to_numpy() == want).all()
    # record length really is header + payload + trailer of the built bytes
    row = m.iloc[0]
    assert row.record_length > row.content_length + 100 - 20  # header present


def test_warc_import_round_trip(ray_session):
    """write shards → read+parse → exactly the original pages (urls unique,
    digests equal, malformed data raises)."""
    import hashlib

    import pyarrow.dataset as pads

    from housenumbercore_ray.pipelines.corpus import web_warc_import
    from housenumbercore_ray.sources.warc import iter_records
    from housenumbercore_ray.sources.worldgen import ensure_world_scale

    wd = ensure_world_scale("sf0.001")
    got = web_warc_import(wd).to_pandas().sort_values("url").reset_index(drop=True)
    pages = pads.dataset(f"{wd}/pages").to_table(columns=["url", "html"]).to_pandas()
    pages = pages.sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == pages["url"].tolist()
    want_digest = [hashlib.md5(bytes(h)).hexdigest() for h in pages["html"]]
    assert got["block_digest"].tolist() == want_digest
    with pytest.raises(ValueError):
        list(iter_records(b"WARC/1.0\r\nContent-Length: 3\r\n\r\nabcXXXX"))


def test_cdx_surt_transform(ray_session):
    """SURT: host lowercased, dot-reversed with commas, ')' + path, query
    stripped — spot-checked on the messy url variants worldgen plants."""
    from housenumbercore_ray.pipelines.corpus import web_cdx_index
    from housenumbercore_ray.sources.worldgen import ensure_world_scale

    wd = ensure_world_scale("sf0.001")
    cdx = web_cdx_index(wd).to_pandas()
    assert cdx["surt"].str.match(r"^de,beispiel-[0-9]{3}(,www)?\)/seite/[0-9]+$").all()
    up = cdx[cdx["url"].str.startswith("HTTPS://")]
    if len(up):
        assert up["surt"].str.startswith("de,beispiel-").all()
    q = cdx[cdx["url"].str.contains("utm_source", regex=False)]
    if len(q):
        assert not q["surt"].str.contains("utm").any()
