"""WARC/1.0 record writer — the crawl-interchange sink (r5, K-family).

Common-Crawl-style corpora ship as WARC files; an engine claiming the
web-text brief needs to WRITE them back (resharding, filtered re-exports).
This module builds ISO-28500-shaped response records:

    WARC/1.0\\r\\n
    WARC-Type: response\\r\\n
    WARC-Target-URI: <url>\\r\\n
    WARC-Date: <ts as YYYY-MM-DDTHH:MM:SSZ>\\r\\n
    Content-Length: <n>\\r\\n
    \\r\\n
    <payload bytes>\\r\\n\\r\\n

(The minimal header set; real exports add WARC-Record-ID etc. — lengths
would simply grow, the arithmetic the oracle checks is the same.) The
``web_warc_export`` pipeline emits per-record metadata (content length,
full record length, md5 block digest, byte offset within its shard) —
every number recomputed by the DuckDB oracle from the page table with
pure string/length arithmetic, so the writer's actual byte layout is
independently pinned."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def warc_date(ts) -> str:
    """UTC ``YYYY-MM-DDTHH:MM:SSZ`` (fixed 20 chars) of a timestamp."""
    return pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")


def build_record(url: str, ts, payload: bytes) -> bytes:
    header = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {warc_date(ts)}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode()
    return header + payload + b"\r\n\r\n"


def record_meta(batch: pd.DataFrame) -> pd.DataFrame:
    """(url, warc_ts, html) batch → per-record metadata, REAL bytes built
    and measured (no arithmetic shortcuts on the engine side — that's the
    oracle's job)."""
    out = {"url": [], "content_length": [], "record_length": [], "block_digest": []}
    for r in batch.itertuples():
        payload = r.html if isinstance(r.html, bytes) else bytes(r.html)
        rec = build_record(r.url, r.warc_ts, payload)
        out["url"].append(r.url)
        out["content_length"].append(len(payload))
        out["record_length"].append(len(rec))
        out["block_digest"].append(hashlib.md5(payload).hexdigest())
    return pd.DataFrame({
        "url": pd.Series(out["url"], dtype=object),
        "content_length": pd.Series(out["content_length"], dtype=np.int64),
        "record_length": pd.Series(out["record_length"], dtype=np.int64),
        "block_digest": pd.Series(out["block_digest"], dtype=object),
    })


def parse_record(data: bytes) -> tuple[dict, bytes]:
    """Inverse of :func:`build_record` (used by tests): header dict +
    payload; validates version line and trailing CRLFCRLF."""
    head, _, rest = data.partition(b"\r\n\r\n")
    lines = head.decode().split("\r\n")
    if lines[0] != "WARC/1.0":
        raise ValueError("not a WARC/1.0 record")
    fields = dict(ln.split(": ", 1) for ln in lines[1:])
    n = int(fields["Content-Length"])
    payload, tail = rest[:n], rest[n:]
    if tail != b"\r\n\r\n":
        raise ValueError("bad record trailer")
    return fields, payload


def ensure_warc_shards(world_dir: str, n_shards: int = 16) -> str:
    """Write (cached) ``derived/warc/shard-NN.warc`` — the world's pages
    re-exported as real WARC shard files in the web_warc_export manifest
    order (shard = page_id % n_shards, page-id order within the shard)."""
    import os

    import pyarrow.dataset as pads

    out = os.path.join(world_dir, "derived", "warc")
    marker = os.path.join(out, ".done")
    if os.path.exists(marker):
        return out
    tmp = out + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    tbl = pads.dataset(os.path.join(world_dir, "pages")).to_table(
        columns=["url", "warc_ts", "html"]).to_pandas()
    tbl["page_id"] = tbl["url"].str.extract(r"/seite/([0-9]+)", expand=False).astype("int64")
    tbl["shard"] = tbl["page_id"] % n_shards
    for shard, g in tbl.groupby("shard"):
        g = g.sort_values("page_id")
        with open(os.path.join(tmp, f"shard-{int(shard):02d}.warc"), "wb") as fh:
            for r in g.itertuples():
                fh.write(build_record(r.url, r.warc_ts, bytes(r.html)))
    with open(os.path.join(tmp, ".done"), "w") as fh:
        fh.write("v1")
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    return out


def iter_records(data: bytes):
    """Split a WARC shard's bytes into records by walking Content-Length —
    the real reader loop (no regex, no guessing): yields (fields, payload)
    until the buffer is exhausted; raises on any malformed record."""
    pos = 0
    while pos < len(data):
        head_end = data.index(b"\r\n\r\n", pos)
        head = data[pos:head_end]
        lines = head.decode().split("\r\n")
        if lines[0] != "WARC/1.0":
            raise ValueError(f"bad record at offset {pos}")
        fields = dict(ln.split(": ", 1) for ln in lines[1:])
        n = int(fields["Content-Length"])
        body = head_end + 4
        payload = data[body:body + n]
        if data[body + n:body + n + 4] != b"\r\n\r\n":
            raise ValueError(f"bad trailer at offset {pos}")
        yield fields, payload
        pos = body + n + 4
