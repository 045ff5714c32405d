"""Property-based tests (hypothesis) for the pure kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from housenumbercore_ray.functions.housenumber import (
    expand_range,
    housenumber_normalized,
    housenumber_sortable,
    split_and_expand,
)
from housenumbercore_ray.functions.street import german_collation_fold
from housenumbercore_ray.geo.cells import latlng_to_cell
from housenumbercore_ray.geo.merge import merge_segments
from housenumbercore_ray.geo.pip import points_in_polygon
from housenumbercore_ray.geo.proj import utm_to_wgs84, wgs84_to_utm
from housenumbercore_ray.geo.wkb import polygon_wkb


class TestHousenumberProperties:
    @given(st.integers(1, 9999), st.integers(1, 9999))
    def test_sortable_preserves_numeric_order(self, a, b):
        sa, sb = housenumber_sortable(str(a)), housenumber_sortable(str(b))
        assert (sa < sb) == (str(a).zfill(4) < str(b).zfill(4))
        if a < b and len(str(a)) <= 4 and len(str(b)) <= 4:
            assert sa < sb

    @given(st.integers(0, 500), st.integers(0, 500))
    def test_expand_range_step2_and_bounds(self, a, b):
        out = expand_range(f"{a}-{b}")
        if b > a:
            vals = [int(v) for v in out]
            assert vals[0] == a and all(y - x == 2 for x, y in zip(vals, vals[1:]))
            assert vals[-1] <= b and (vals[-1] + 2) > b
        else:
            assert out == []

    @given(st.text(alphabet="0123456789abcdXYZ /-;,", max_size=20))
    def test_expand_never_crashes_and_no_dashes_survive(self, s):
        for v in split_and_expand(s):
            assert "-" not in v  # every surviving value is dash-free or came from no-dash part
            # (values from non-dash parts keep their text verbatim)

    @given(st.text(max_size=30), st.booleans())
    def test_normalized_is_sortable_modulo_case(self, s, exact):
        n = housenumber_normalized(s, exact)
        srt = housenumber_sortable(s)
        assert n == (srt if exact else srt.lower())

    @given(st.text(max_size=30))
    def test_fold_idempotent(self, s):
        f = german_collation_fold(s)
        assert german_collation_fold(f) == f


class TestGeoProperties:
    @given(st.floats(-179.9, 179.9), st.floats(-89.9, 89.9))
    def test_cell_contains_its_point(self, lon, lat):
        from housenumbercore_ray.geo.cells import cell_bounds

        c = int(latlng_to_cell([lat], [lon])[0])
        lo, la, hi, ha = cell_bounds(c)
        # float round-trip noise at exact cell edges is ~1e-14
        assert lo - 1e-9 <= lon < hi + 1e-9
        assert la - 1e-9 <= lat < ha + 1e-9

    @given(st.floats(0.01, 10), st.floats(0.01, 10),
           st.floats(-10, 10), st.floats(-10, 10))
    @settings(max_examples=50)
    def test_rect_pip_matches_bbox(self, w, h, x0, y0):
        wkb = polygon_wkb([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)])
        rng = np.random.default_rng(0)
        lon = rng.uniform(x0 - 1, x0 + w + 1, 50)
        lat = rng.uniform(y0 - 1, y0 + h + 1, 50)
        got = points_in_polygon(lon, lat, wkb)
        want = (lon >= x0) & (lon <= x0 + w) & (lat >= y0) & (lat <= y0 + h)
        assert (got == want).all()

    @given(st.floats(6.1, 11.9), st.floats(47.1, 54.9))
    @settings(max_examples=100)
    def test_utm_roundtrip(self, lon, lat):
        e, n = wgs84_to_utm([lon], [lat])
        lon2, lat2 = utm_to_wgs84(e, n)
        assert abs(lon2[0] - lon) < 1e-6
        assert abs(lat2[0] - lat) < 1e-6

    @given(st.integers(1, 12))
    def test_merge_chain_always_single_line(self, n):
        segs = [[(i, 0.0), (i + 1, 0.0)] for i in range(n)]
        m = merge_segments(segs)
        assert len(m) == 1
        assert len(m[0]) == n + 1
        # total length preserved
        assert abs((m[0][-1][0] - m[0][0][0]) - n) < 1e-9


class TestCurationKernelProperties:
    @given(st.lists(st.from_regex(
        r"https?://[a-z]{1,8}(\.[a-z]{1,6}){1,2}(/[a-z0-9]{0,6}){0,3}/?"
        r"(\?([a-z_]{1,8}=[a-z0-9]{0,4}&){0,3}[a-z_]{1,8}=[a-z0-9]{0,4})?",
        fullmatch=True), min_size=1, max_size=8))
    @settings(max_examples=60, deadline=None)
    def test_canonical_url_idempotent(self, urls):
        import pandas as pd

        from housenumbercore_ray.pipelines.corpus import canonical_url_kernel

        once = canonical_url_kernel(pd.DataFrame({"url": urls}))
        twice = canonical_url_kernel(
            pd.DataFrame({"url": once["canonical_url"].tolist()}))
        assert (twice["canonical_url"] == once["canonical_url"]).all()
        assert (twice["changed"] == 0).all()
        # canonical form never keeps tracking params or www.
        assert not once["canonical_url"].str.contains("utm_").any()
        assert not once["canonical_url"].str.contains("://www\\.").any()

    @given(st.lists(st.text(alphabet="ab \n.", max_size=60), min_size=1, max_size=6))
    @settings(max_examples=60, deadline=None)
    def test_repetition_fraction_bounds(self, texts):
        import pandas as pd

        from housenumbercore_ray.pipelines.corpus import repetition_kernel

        out = repetition_kernel(pd.DataFrame({
            "url": [f"u/{i}" for i in range(len(texts))], "text": texts}))
        assert out["dup_line_frac"].between(0, 1).all()
        assert out["dup_line_char_frac"].between(0, 1).all()
        assert (out["top_2gram_frac"] >= 0).all()  # overlap can exceed 1 by contract
        assert (out["n_lines"] >= 1).all()

    @given(st.lists(st.integers(0, 1000), min_size=1, max_size=50),
           st.integers(1, 64))
    @settings(max_examples=60, deadline=None)
    def test_pack_sequences_invariants(self, doc_ids, capacity):
        """Greedy packing never overfills a sequence and never starts a new
        one it didn't have to (replayed on the pure scan)."""
        import numpy as np

        toks = [min(d % (capacity + 3), capacity) for d in doc_ids]
        s = fill = 0
        seqs, offs = [], []
        for t in toks:
            if fill + t > capacity:
                s += 1
                fill = 0
            seqs.append(s)
            offs.append(fill)
            fill += t
        offs = np.array(offs); toks = np.array(toks); seqs = np.array(seqs)
        assert ((offs + toks) <= capacity).all()
        # a new sequence only starts when the doc would not have fit
        starts = np.flatnonzero(np.diff(seqs) > 0) + 1
        assert all(offs[i] == 0 and
                   (offs[i - 1] + toks[i - 1] + toks[i]) > capacity
                   for i in starts)

    @given(st.text(alphabet="abc@. 0123456789+-/", max_size=80))
    @settings(max_examples=80, deadline=None)
    def test_pii_redaction_is_complete(self, text):
        """After redaction, no pattern matches the redacted text."""
        import re

        import pandas as pd

        from housenumbercore_ray.pipelines.corpus import (
            PII_EMAIL_RE,
            pii_redact_kernel,
        )

        out = pii_redact_kernel(pd.DataFrame({"url": ["u"], "text": [text]}))
        # emails are redacted first, so re-running the email pattern on a
        # fully-redacted text of the same input must find nothing new
        red = pii_redact_kernel(pd.DataFrame({"url": ["u"], "text": [text]}))
        assert out["redacted_md5"].iloc[0] == red["redacted_md5"].iloc[0]  # deterministic
        assert int(out["n_emails"].iloc[0]) == len(re.findall(PII_EMAIL_RE, text))


class TestRound3LateOps:
    """Invariants for the funnel / gaps / mixture operators (engine-side,
    sf0.001 — small enough to run in the shared Ray session)."""

    def test_funnel_stage_consistency(self, ray_session):
        import pandas as pd

        from housenumbercore_ray.pipelines.relational import events_funnel

        df = events_funnel("/root/testdata/sf0.001").to_pandas()
        stage = df["stage"].to_numpy()
        for i, col in enumerate(["ts_view", "ts_click", "ts_purchase"]):
            present = df[col].notna().to_numpy()
            assert (present == (stage > i)).all(), col
        full = df[df["stage"] == 3]
        assert (full["ts_view"] <= full["ts_click"]).all()
        assert (full["ts_click"] <= full["ts_purchase"]).all()

    def test_order_gaps_nonnegative_and_first_is_minus_one(self, ray_session):
        from housenumbercore_ray.pipelines.relational import order_gaps

        df = order_gaps("/root/testdata/sf0.001").to_pandas()
        firsts = df["prev_orderdate"].isna()
        assert (df.loc[firsts, "gap_days"] == -1).all()
        assert (df.loc[~firsts, "gap_days"] >= 0).all()
        # exactly one first order per customer
        assert firsts.sum() == df["o_custkey"].nunique()

    def test_mix_weights_form_a_distribution(self, ray_session):
        from housenumbercore_ray.pipelines.corpus import mix_weights

        df = mix_weights("/root/testdata/sf0.001").to_pandas()
        assert abs(df["token_share"].sum() - 1.0) < 1e-4
        # share × weight = 1/n_sources for every source with tokens
        nz = df[df["n_tokens"] > 0]
        per = nz["token_share"] * nz["mix_weight"]
        assert ((per - 1.0 / len(df)).abs() < 1e-4).all()

    def test_sample_weighted_keeps_all_longest_docs(self, ray_session):
        import pyarrow.parquet as pq

        from housenumbercore_ray.pipelines.corpus import sample_weighted

        kept = sample_weighted("/root/testdata/sf0.001").to_pandas()
        t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["doc_id", "n_chars"]).to_pandas()
        mx = t["n_chars"].max()
        longest = set(t.loc[t["n_chars"] == mx, "doc_id"])
        assert longest <= set(kept["doc_id"])  # threshold = ppm_scale ⇒ always kept
        # acceptance rate tracks mean weight within a loose band
        expect = (t["n_chars"] / mx).mean()
        rate = len(kept) / len(t)
        assert abs(rate - expect) < 0.15

    def test_pca_power_is_a_unit_direction_of_high_variance(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        from housenumbercore_ray.pipelines.corpus import pca_power

        df = pca_power("/root/testdata/sf0.001").to_pandas().sort_values("component")
        v = df["loading"].to_numpy(np.float64)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-4     # unit vector (mod round-6)
        assert v[0] >= 0                               # sign convention
        t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                          columns=["embedding"])
        X = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        c = X - X.mean(axis=0)
        proj_var = float(((c @ v) ** 2).mean())
        eig = float(df["eigval"].iloc[0])
        assert abs(proj_var - eig) < 1e-3              # Rayleigh estimate consistent
        # beats every coordinate axis (true for any dominant direction)
        axis_var = (c ** 2).mean(axis=0).max()
        assert proj_var >= axis_var * 0.99

    def test_bbox_pairs_match_brute_force(self, ray_session):
        """The PBSM grid + reference-point dedup must reproduce the exact
        brute-force bbox-intersection pair set (each pair exactly once)."""
        import numpy as np
        import pyarrow.parquet as pq

        from housenumbercore_ray.geo.wkb import wkb_bbox
        from housenumbercore_ray.pipelines.geometry import muni_bbox_pairs
        from housenumbercore_ray.sources.worldgen import ensure_world

        wd = ensure_world("/root/testdata/sf0.001")
        got = muni_bbox_pairs(wd).to_pandas()
        pairs = list(zip(got["area_id_a"], got["area_id_b"]))
        assert len(pairs) == len(set(pairs))         # reference-point rule: no dupes

        t = pq.read_table(f"{wd}/boundaries.parquet",
                          columns=["area_id", "polygon_wkb"]).to_pandas()
        boxes = {int(r.area_id): wkb_bbox(bytes(r.polygon_wkb))
                 for r in t.itertuples()}
        ids = sorted(boxes)
        brute = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
                 if boxes[a][0] <= boxes[b][2] and boxes[b][0] <= boxes[a][2]
                 and boxes[a][1] <= boxes[b][3] and boxes[b][1] <= boxes[a][3]}
        assert set(pairs) == brute


class TestSupercoverProperties:
    @given(st.lists(st.tuples(
        st.floats(0.5, 99.5, allow_nan=False, width=32),
        st.floats(0.5, 99.5, allow_nan=False, width=32),
        st.floats(0.5, 99.5, allow_nan=False, width=32),
        st.floats(0.5, 99.5, allow_nan=False, width=32),
    ), min_size=1, max_size=8))
    @settings(max_examples=60, deadline=None)
    def test_complete_bounded_connected(self, segs):
        """Supercover invariants on random segments: (a) COMPLETE — every
        densely-sampled point of the segment lies in an emitted cell;
        (b) BOUNDED — per segment at most |Δix|+|Δiy|+1 cells (the exact
        supercover count when no lattice point is crossed); (c) CONNECTED
        — the cells form a 4-connected path."""
        from housenumbercore_ray.pipelines.tiles import supercover_cells

        ax = np.array([s[0] for s in segs], dtype=np.float64)
        ay = np.array([s[1] for s in segs], dtype=np.float64)
        bx = np.array([s[2] for s in segs], dtype=np.float64)
        by = np.array([s[3] for s in segs], dtype=np.float64)
        segi, ix, iy = supercover_cells(ax, ay, bx, by)
        for i in range(len(segs)):
            cells = set(zip(ix[segi == i].tolist(), iy[segi == i].tolist()))
            # (a) completeness by dense sampling
            t = np.linspace(0.0, 1.0, 257)
            sx = ax[i] + t * (bx[i] - ax[i])
            sy = ay[i] + t * (by[i] - ay[i])
            hit = set(zip(np.floor(sx).astype(int).tolist(),
                          np.floor(sy).astype(int).tolist()))
            assert hit <= cells
            # (b) count bound
            dx = abs(int(np.floor(bx[i])) - int(np.floor(ax[i])))
            dy = abs(int(np.floor(by[i])) - int(np.floor(ay[i])))
            assert len(cells) <= dx + dy + 1
            # (c) 4-connectivity
            if len(cells) > 1:
                for c in cells:
                    assert any(abs(c[0] - d[0]) + abs(c[1] - d[1]) == 1
                               for d in cells if d != c)


class TestContainmentProperties:
    WORDS = st.lists(st.sampled_from([f"w{i}" for i in range(30)]),
                     min_size=0, max_size=40)

    @given(WORDS, WORDS)
    def test_containment_dominates_jaccard(self, wa, wb):
        from housenumbercore_ray.stages.dedup import ngram_containment, ngram_jaccard

        a, b = " ".join(wa), " ".join(wb)
        c, j = ngram_containment(a, b), ngram_jaccard(a, b)
        assert 0.0 <= j <= c <= 1.0

    @given(WORDS, st.data())
    def test_contiguous_excerpt_has_containment_one(self, wa, data):
        from housenumbercore_ray.stages.dedup import ngram_containment

        if len(wa) < 3:
            return
        lo = data.draw(st.integers(0, len(wa) - 3))
        hi = data.draw(st.integers(lo + 3, len(wa)))
        a = " ".join(wa)
        excerpt = " ".join(wa[lo:hi])
        # every 3-shingle of a contiguous word-substring is a 3-shingle of
        # the full text, so the excerpt side's set is a subset
        assert ngram_containment(a, excerpt) == 1.0

    @given(WORDS, WORDS)
    def test_symmetric(self, wa, wb):
        from housenumbercore_ray.stages.dedup import ngram_containment

        a, b = " ".join(wa), " ".join(wb)
        assert ngram_containment(a, b) == ngram_containment(b, a)


class TestMediaCodecProperties:
    """r5 pure-numpy codecs: decode is the exact inverse of encode for
    ARBITRARY dims/content, not just the worldgen fixtures."""

    @given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
    @settings(max_examples=40, deadline=None)
    def test_bmp_round_trip(self, w, h, seed):
        from housenumbercore_ray.stages.multimodal import decode_bmp, encode_bmp

        pix = np.random.RandomState(seed % 2**31).randint(
            0, 256, (h, w, 3)).astype(np.uint8)
        got, gw, gh, ch = decode_bmp(encode_bmp(pix))
        assert (gw, gh, ch) == (w, h, 3) and (got == pix).all()

    @given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
    @settings(max_examples=40, deadline=None)
    def test_ppm_round_trip(self, w, h, seed):
        from housenumbercore_ray.stages.multimodal import decode_ppm, encode_ppm

        pix = np.random.RandomState(seed % 2**31).randint(
            0, 256, (h, w, 3)).astype(np.uint8)
        got, gw, gh, ch = decode_ppm(encode_ppm(pix))
        assert (gw, gh, ch) == (w, h, 3) and (got == pix).all()

    @given(st.integers(1, 2), st.sampled_from([8000, 16000, 22050, 44100]),
           st.integers(1, 500), st.integers(0, 2**32 - 1))
    @settings(max_examples=40, deadline=None)
    def test_wav_round_trip(self, ch, rate, n, seed):
        from housenumbercore_ray.stages.multimodal import encode_wav, parse_wav

        s = np.random.RandomState(seed % 2**31).randint(
            -32768, 32768, (n, ch)).astype(np.int16)
        data = encode_wav(s, rate)
        c, r, bits, nn, off = parse_wav(data)
        assert (c, r, bits, nn) == (ch, rate, 16, n)
        got = np.frombuffer(data, dtype="<i2", count=nn * c, offset=off).reshape(nn, c)
        assert (got == s).all()

    @given(st.integers(1, 60), st.integers(1, 60), st.integers(1, 64))
    @settings(max_examples=40, deadline=None)
    def test_resize_dims_invariants(self, w, h, target):
        from housenumbercore_ray.stages.multimodal import resize_image

        pix = np.zeros((h, w, 3), dtype=np.uint8)
        r = resize_image(pix, target)
        dh, dw = r.shape[:2]
        assert max(dw, dh) == target or (dw == dh == target)
        assert dw >= 1 and dh >= 1
        # aspect monotonicity: long side maps to target
        if w >= h:
            assert dw == target and dh == max(1, (h * target) // w)
        else:
            assert dh == target and dw == max(1, (w * target) // h)


class TestWarcProperties:
    @given(st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=8),
           st.integers(0, 2**31 - 1))
    @settings(max_examples=50, deadline=None)
    def test_concatenated_records_round_trip(self, payloads, seed):
        """iter_records recovers every payload exactly — including payloads
        that CONTAIN '\\r\\n\\r\\n' or 'WARC/1.0' (the reader walks
        Content-Length, never scans payload bytes)."""
        import pandas as pd

        from housenumbercore_ray.sources.warc import build_record, iter_records

        # plant adversarial content in one payload
        payloads = list(payloads)
        payloads[seed % len(payloads)] += b"\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n"
        ts = pd.Timestamp("2024-06-01 10:00:00")
        blob = b"".join(
            build_record(f"https://x.de/seite/{i}", ts, p)
            for i, p in enumerate(payloads))
        got = list(iter_records(blob))
        assert len(got) == len(payloads)
        for i, (fields, payload) in enumerate(got):
            assert fields["WARC-Target-URI"] == f"https://x.de/seite/{i}"
            assert payload == payloads[i]
