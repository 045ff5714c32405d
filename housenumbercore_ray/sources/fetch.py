"""Acquisition fetch stage — the S5/S6 shape (HTTP list download, Overpass
street fetch) as a pluggable, testable Ray stage.

The sandbox has no network, so the *transport* is injected; what this module
models is the reference's acquisition DISCIPLINE
(``MunicipalityJobs.java:385-633``, ``imports/HousenumberListDownload.java:38-301``):

  - templated Overpass QL per municipality: ``area(3600000000 + -1 *
    adminPolygonOsmId)``, ways with ``highway`` + ``name``, ``out meta``
    (MunicipalityJobs.java:404-411), with the reference's URL-encoding
    quirks ``%28``→``(``, ``%29``→``)``, ``+``→``%20`` (:418-421);
  - bounded retries: ``MAXOVERPASSTRIES = 3`` *additional* tries after the
    first attempt; past that the fetch gives up and reports failure rather
    than raising (:390, 470-477, 525-531);
  - linear backoff: before retry *n* (1-based), sleep ``2 * n`` seconds
    (:436-441);
  - ``Accept-Encoding: gzip, compress`` request header; the body is
    gunzipped when the response carries ``Content-Encoding: gzip``
    (:449, 568-573);
  - content validation: the first 100 chars of an Overpass payload must
    contain the XML declaration or the payload is discarded (:580-586);
  - raw-response persistence: every accepted payload is saved under
    ``raw_dir`` before parsing — the reference writes
    ``overpassdownload/<utc-ts>.osm`` "just for checking or for history"
    (:588-608).  We strengthen that into a *resume* contract: files are
    keyed by a stable request hash instead of the wall clock, and a
    request whose raw file already exists is served from disk without
    touching the transport (the reference re-downloads on restart; at
    10^4 municipality jobs the skip is what makes a crashed acquisition
    run restartable);
  - ``osm_base`` freshness timestamp extracted from the response header
    region before the first ``<node`` (:613-633).

Ray integration: :class:`FetchStage` is a callable class for
``ds.map_batches(FetchStage, fn_constructor_kwargs=..., concurrency=N,
batch_size=B)`` over a table of request rows ``(request_id, url)``.  The
transport is passed as a zero-argument FACTORY so each actor builds its
(possibly unpicklable) client once in ``__init__`` — never per batch.  Only
:class:`MockTransport` ships in this sandbox; a real deployment plugs an
urllib/requests-backed transport honouring the same ``get()`` contract.
Fetch concurrency against a shared upstream (Overpass enforces per-IP
slots) is capped by the actor-pool ``concurrency`` argument, not inside
this class.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import re
import time
import urllib.parse

import pyarrow as pa

# MunicipalityJobs.java:390
MAX_TRIES = 3
# MunicipalityJobs.java:449
USER_AGENT = "housenumbercore-ray acquisition client"

_OSM_BASE_RE = re.compile(r'osm_base="([^"]+)"')
_XML_DECL = '<?xml version="1.0" encoding="UTF-8"?>'


class TransportError(Exception):
    """A transport-level failure (connect refused, timeout, bad status).

    Maps the reference's ``ConnectException`` / ``IOException`` arms
    (MunicipalityJobs.java:478-560) — any of these consume one try.
    """


class Response:
    """Minimal transport response: status, header map, raw body bytes."""

    __slots__ = ("status", "headers", "body")

    def __init__(self, status: int, headers: dict | None, body: bytes):
        self.status = status
        self.headers = {str(k).lower(): v for k, v in (headers or {}).items()}
        self.body = body


class MockTransport:
    """Scripted transport for tests and offline runs.

    ``script`` maps url → list of outcomes consumed in order; each outcome
    is either ``("ok", body_bytes, headers_dict)`` or ``("err", message)``.
    The last outcome repeats once the list is exhausted.  Data-only.

    To ship a scripted factory into Ray actors use
    ``functools.partial(MockTransport, script)`` — the class resolves by
    importable reference and the script dict pickles by value.  A def or
    lambda from a driver-only module (e.g. a test file) is serialized BY
    REFERENCE to that module, which workers cannot import — the actor
    constructor then fails on deserialization and the pool restarts
    forever (a silent hang, not an error).
    """

    def __init__(self, script: dict[str, list[tuple]]):
        self.script = {u: list(v) for u, v in script.items()}
        self.calls: list[str] = []

    def get(self, url: str, headers: dict) -> Response:
        self.calls.append(url)
        outcomes = self.script.get(url)
        if not outcomes:
            raise TransportError(f"no scripted response for {url}")
        outcome = outcomes.pop(0) if len(outcomes) > 1 else outcomes[0]
        if outcome[0] == "err":
            raise TransportError(outcome[1])
        _, body, hdrs = outcome
        return Response(200, hdrs, body)


def build_overpass_query(admin_polygon_osm_id: int) -> str:
    """The street-fetch QL template, MunicipalityJobs.java:404-411.

    The reference stores relation polygon ids negated, hence the
    ``+ -1 *`` producing ``3600000000 + |relation id|`` (the Overpass
    area-id convention for relations).
    """
    area_id = 3600000000 + -1 * admin_polygon_osm_id
    return (
        "[timeout:3600][maxsize:1073741824]\n"
        "[out:xml];\n"
        f"area({area_id})->.boundaryarea;\n"
        "(\n"
        'way(area.boundaryarea)["highway"]["name"];>;\n'
        ");\n"
        "out meta;"
    )


def build_overpass_url(base_url: str, query: str) -> str:
    """URL-encode the QL with the reference's quirks
    (MunicipalityJobs.java:417-422): keep parens literal, space as %20."""
    enc = urllib.parse.quote_plus(query)
    enc = enc.replace("%28", "(").replace("%29", ")").replace("+", "%20")
    return f"{base_url}interpreter?data={enc}"


def extract_osm_base(body: str) -> str | None:
    """osm_base freshness timestamp from the header region before the first
    ``<node`` (MunicipalityJobs.java:613-633); None when absent."""
    head_end = body.find("<node")
    header = body[:head_end] if head_end != -1 else body[:4096]
    m = _OSM_BASE_RE.search(header)
    return m.group(1) if m else None


def _raw_name(request_id: str, url: str) -> str:
    key = hashlib.sha1(f"{request_id}\x00{url}".encode()).hexdigest()[:20]
    return f"{key}.osm"


FETCH_SCHEMA = pa.schema([
    ("request_id", pa.string()),
    ("url", pa.string()),
    ("ok", pa.bool_()),
    ("from_cache", pa.bool_()),
    ("tries", pa.int32()),
    ("body", pa.binary()),
    ("osm_base", pa.string()),
    ("raw_path", pa.string()),
    ("error", pa.string()),
])


class FetchStage:
    """Actor-pool fetch stage: request rows in, payload rows out.

    Parameters
    ----------
    transport_factory:
        Zero-arg callable building the transport client; invoked once per
        actor in ``__init__`` (stateful-stage rule), never per batch.
    max_tries:
        Additional tries after the first attempt (reference: 3).
    sleep:
        Injected for tests; production default is ``time.sleep``.  Before
        retry *n* it is called with ``backoff * n`` (linear, reference
        MunicipalityJobs.java:436-441).
    raw_dir:
        When set, accepted payloads persist here keyed by request hash and
        an existing file short-circuits the transport (resume contract).
    validate_xml:
        Overpass mode — require the XML declaration in the first 100 chars
        (:580-586).  Turn off for CSV/ZIP list downloads
        (HousenumberListDownload.java fetches arbitrary content).
    """

    def __init__(
        self,
        transport_factory,
        *,
        max_tries: int = MAX_TRIES,
        backoff: float = 2.0,
        sleep=time.sleep,
        raw_dir: str | None = None,
        validate_xml: bool = True,
        user_agent: str = USER_AGENT,
    ):
        self.transport = transport_factory()
        self.max_tries = max_tries
        self.backoff = backoff
        self.sleep = sleep
        self.raw_dir = raw_dir
        self.validate_xml = validate_xml
        self.headers = {
            "User-Agent": user_agent,
            "Accept-Encoding": "gzip, compress",  # MunicipalityJobs.java:450
        }
        if raw_dir:
            os.makedirs(raw_dir, exist_ok=True)

    # -- single request ----------------------------------------------------
    def fetch_one(self, request_id: str, url: str) -> dict:
        raw_path = os.path.join(self.raw_dir, _raw_name(request_id, url)) if self.raw_dir else None

        if raw_path and os.path.exists(raw_path):
            with open(raw_path, "rb") as f:
                body = f.read()
            return self._row(request_id, url, ok=True, from_cache=True, tries=0,
                             body=body, raw_path=raw_path)

        failed = 0
        while True:
            if failed > 0:
                # linear backoff before EVERY retry (MunicipalityJobs.java:436-441)
                self.sleep(self.backoff * failed)
            try:
                resp = self.transport.get(url, dict(self.headers))
                break
            except TransportError as exc:
                failed += 1
                if failed > self.max_tries:
                    return self._row(request_id, url, ok=False, tries=failed,
                                     error=f"gave up after {failed} failed requests: {exc}")

        body = resp.body
        if resp.headers.get("content-encoding") == "gzip":
            body = gzip.decompress(body)

        if self.validate_xml:
            head = body[:100].decode("utf-8", errors="replace")
            if _XML_DECL not in head:
                # MunicipalityJobs.java:580-586 — non-XML payload is discarded
                return self._row(request_id, url, ok=False, tries=failed + 1,
                                 error="payload does not start with xml header line")

        osm_base = extract_osm_base(body[:8192].decode("utf-8", errors="replace")) if self.validate_xml else None

        if raw_path:
            tmp = raw_path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(body)
            os.replace(tmp, raw_path)  # atomic: resume never sees a torn file

        return self._row(request_id, url, ok=True, tries=failed + 1, body=body,
                         osm_base=osm_base, raw_path=raw_path)

    @staticmethod
    def _row(request_id, url, *, ok, tries, body=None, from_cache=False,
             osm_base=None, raw_path=None, error=None) -> dict:
        return {
            "request_id": request_id, "url": url, "ok": ok,
            "from_cache": from_cache, "tries": tries, "body": body,
            "osm_base": osm_base, "raw_path": raw_path, "error": error,
        }

    # -- Ray map_batches entry --------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("request_id").to_pylist()
        urls = batch.column("url").to_pylist()
        rows = [self.fetch_one(i, u) for i, u in zip(ids, urls)]
        return pa.Table.from_pylist(rows, schema=FETCH_SCHEMA)
