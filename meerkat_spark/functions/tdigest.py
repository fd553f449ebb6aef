"""Mergeable t-digest quantile sketch (SURVEY.md §2.2.2 T2 — the
reference's reusable percentile sketch, re-expressed Spark-side).

Algorithm: the merging t-digest (Dunning & Ertl, "Computing Extremely
Accurate Quantiles Using t-Digests") with the k1 scale function
k(q) = (δ/2π)·asin(2q−1): centroid sizes shrink toward the tails, so
extreme quantiles stay accurate while the sketch stays O(δ) in size.

Scale shape (the part Spark built-ins don't give you — a digest you can
STORE and re-merge later, unlike percentile_approx which is query-time
only):
  1. map-side combine: mapInPandas folds each Arrow batch into one
     digest per key — shuffle volume is #partitions × #keys × O(δ),
     independent of row count;
  2. reduce: groupBy(key).applyInPandas concatenates centroid sets and
     re-compresses — the t-digest merge is exactly its build, so stored
     digests from different days/tables merge the same way.

Digest wire format: struct<means array<double>, weights array<double>>
— plain Spark types, storable in parquet next to the data.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIGEST_SCHEMA = "means array<double>, weights array<double>"


# ---------------------------------------------------------------- kernel
def _k(q: float, compression: float) -> float:
    return compression / (2.0 * math.pi) * math.asin(2.0 * min(1.0, max(0.0, q)) - 1.0)


def _k_inv(k: float, compression: float) -> float:
    return (math.sin(k * 2.0 * math.pi / compression) + 1.0) / 2.0


def compress(
    means: np.ndarray, weights: np.ndarray, compression: float = 100.0
) -> tuple[np.ndarray, np.ndarray]:
    """Merge (means, weights) centroid multiset into ≤ O(compression)
    centroids obeying the k1 size bound. Building and merging are the
    same operation on concatenated centroid sets."""
    if len(means) == 0:
        return np.array([]), np.array([])
    order = np.argsort(means, kind="mergesort")
    means, weights = means[order].astype(float), weights[order].astype(float)
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    q0 = 0.0
    q_limit = _k_inv(_k(q0, compression) + 1.0, compression)
    cur_m, cur_w = float(means[0]), float(weights[0])
    for m, w in zip(means[1:], weights[1:]):
        q = q0 + (cur_w + w) / total
        if q <= q_limit:
            cur_m += (m - cur_m) * w / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            q0 += cur_w / total
            q_limit = _k_inv(_k(q0, compression) + 1.0, compression)
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Estimate the q-quantile from a digest (linear interpolation
    between centroid midpoints; exact at the min/max centroids)."""
    n = len(means)
    if n == 0:
        return float("nan")
    if n == 1:
        return float(means[0])
    total = float(weights.sum())
    target = q * total
    # cumulative weight at each centroid's midpoint
    cum = np.cumsum(weights) - weights / 2.0
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, target)) - 1
    frac = (target - cum[i]) / (cum[i + 1] - cum[i])
    return float(means[i] + frac * (means[i + 1] - means[i]))


# ---------------------------------------------------------------- spark
def tdigest_sketch(
    df: DataFrame,
    value_col: str,
    by: list[str],
    compression: float = 100.0,
) -> DataFrame:
    """(by…, digest) — one mergeable t-digest per key group."""
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*by).schema.fields
    )
    partial_schema = f"{key_fields}, means array<double>, weights array<double>"

    def partial(batches):
        # one digest per key per Arrow batch stream (map-side combine)
        acc: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}
        for pdf in batches:
            for key, grp in pdf.groupby(by, dropna=False, sort=False):
                k = key if isinstance(key, tuple) else (key,)
                v = grp[value_col].dropna().to_numpy(dtype=float)
                if not len(v):
                    continue
                m, w = acc.get(k, (np.array([]), np.array([])))
                m2, w2 = compress(
                    np.concatenate([m, v]),
                    np.concatenate([w, np.ones(len(v))]),
                    compression,
                )
                acc[k] = (m2, w2)
        rows = {c: [] for c in by} | {"means": [], "weights": []}
        for k, (m, w) in acc.items():
            for c, kv in zip(by, k):
                rows[c].append(kv)
            rows["means"].append(m.tolist())
            rows["weights"].append(w.tolist())
        # object dtype throughout: an EMPTY partition otherwise yields
        # float64-default empty columns, which Arrow cannot convert to
        # array<double>/string ("NumPyConverter doesn't implement
        # list<double>") — an empty input must produce an empty digest
        # table, not a crash (the streaming keeper folds empty
        # micro-batches)
        yield pd.DataFrame(
            {c: pd.Series(v, dtype="object") for c, v in rows.items()}
        )

    def merge(pdf):
        m = np.concatenate([np.asarray(x, dtype=float) for x in pdf["means"]])
        w = np.concatenate([np.asarray(x, dtype=float) for x in pdf["weights"]])
        mm, mw = compress(m, w, compression)
        out = {c: [pdf[c].iloc[0]] for c in by}
        out["digest"] = [{"means": mm.tolist(), "weights": mw.tolist()}]
        return pd.DataFrame(out)

    out_schema = f"{key_fields}, digest struct<{DIGEST_SCHEMA}>"
    partials = df.select(*by, value_col).mapInPandas(partial, partial_schema)
    return partials.groupBy(*by).applyInPandas(merge, out_schema)


def merge_digest_tables(
    df: DataFrame, by: list[str], compression: float = 100.0
) -> DataFrame:
    """Merge a (by…, digest) table with REPEATED keys (per-day stores,
    per-epoch folds) into one digest per key — merge is the build on
    concatenated centroid sets, so bounds survive any split. One keyed
    shuffle over digest-sized rows; used by the streaming percentile
    keeper (streaming/ingest.tdigest_step)."""
    if not by:
        raise ValueError("merge_digest_tables needs at least one key column")
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*by).schema.fields
    )

    def merge(pdf):
        ms: list[float] = []
        ws: list[float] = []
        for d in pdf["digest"]:
            if d is None:
                continue
            ms.extend(d["means"])
            ws.extend(d["weights"])
        mm, mw = compress(
            np.asarray(ms, dtype=float), np.asarray(ws, dtype=float),
            compression,
        )
        out = {c: [pdf[c].iloc[0]] for c in by}
        out["digest"] = [{"means": mm.tolist(), "weights": mw.tolist()}]
        return pd.DataFrame(out)

    out_schema = f"{key_fields}, digest struct<{DIGEST_SCHEMA}>"
    return df.groupBy(*by).applyInPandas(merge, out_schema)


def digest_percentiles(df: DataFrame, qs: list[float], digest_col: str = "digest") -> DataFrame:
    """Extend a digest table with one `p<q>` column per requested
    quantile (Arrow-batched extraction, no shuffle)."""

    # struct args arrive as a pandas DataFrame (one column per field)
    @F.pandas_udf("array<double>")
    def extract(dig: pd.DataFrame) -> pd.Series:
        out = []
        for m_list, w_list in zip(dig["means"], dig["weights"]):
            m = np.asarray(m_list, dtype=float)
            w = np.asarray(w_list, dtype=float)
            out.append([quantile(m, w, q) for q in qs])
        return pd.Series(out)

    tmp = df.withColumn("__qs", extract(F.col(digest_col)))
    for i, q in enumerate(qs):
        name = f"p{str(q).replace('0.', '')}"
        tmp = tmp.withColumn(name, F.col("__qs")[i])
    return tmp.drop("__qs")


def rank(means: np.ndarray, weights: np.ndarray, x: float) -> float:
    """Estimated CDF at x (fraction of mass <= x) — the inverse of
    `quantile`: linear interpolation between centroid-midpoint
    cumulative weights, 0/1 beyond the extreme centroids."""
    n = len(means)
    if n == 0:
        return float("nan")
    if n == 1:
        return 0.0 if x < means[0] else 1.0
    total = float(weights.sum())
    cum = np.cumsum(weights) - weights / 2.0
    if x <= means[0]:
        return 0.0
    if x >= means[-1]:
        return 1.0
    i = int(np.searchsorted(means, x)) - 1
    span = means[i + 1] - means[i]
    frac = (x - means[i]) / span if span > 0 else 0.0
    return float((cum[i] + frac * (cum[i + 1] - cum[i])) / total)


def digest_percentrank(
    df: DataFrame, value, digest_col: str = "digest", out_col: str = "percentrank"
) -> DataFrame:
    """Kusto percentrank_tdigest: extend a digest table with the
    estimated percent rank (0-100) of `value` within each digest —
    Arrow-batched, no shuffle. `value` may be a literal or a column
    name (rank of that row's value in that row's digest)."""

    @F.pandas_udf("double")
    def extract(dig: pd.DataFrame, xs: pd.Series) -> pd.Series:
        out = []
        for (m_list, w_list), x in zip(
            zip(dig["means"], dig["weights"]), xs
        ):
            if x is None:
                out.append(None)
                continue
            m = np.asarray(m_list, dtype=float)
            w = np.asarray(w_list, dtype=float)
            out.append(round(100.0 * rank(m, w, float(x)), 6))
        return pd.Series(out, dtype="float64")

    xcol = F.col(value) if isinstance(value, str) else F.lit(value).cast("double")
    return df.withColumn(out_col, extract(F.col(digest_col), xcol))


# ---------------------------------------------------- KQL expression forms
def _digest_json(m: np.ndarray, w: np.ndarray) -> str:
    import json

    return json.dumps(
        {"means": [float(x) for x in m], "weights": [float(x) for x in w]},
        separators=(",", ":"),
    )


def tdigest_agg(x, compression: float = 100.0):
    """KQL `tdigest(x)` inside summarize — returns the digest as a
    dynamic (JSON {means, weights}), storable and re-mergeable with
    merge_tdigest / readable with percentile_tdigest. Expression form
    collects the group's values then compresses row-locally (same
    per-group memory caveat as exact percentile — the mapInPandas
    operator `tdigest_sketch` is the bulk path with map-side combine)."""

    def kern(arrs):
        out = []
        for arr in arrs:
            v = np.asarray(
                [x for x in (arr if arr is not None else []) if x is not None],
                dtype=float,
            )
            if not len(v):
                out.append(None)
                continue
            m, w = compress(v, np.ones(len(v)), compression)
            out.append(_digest_json(m, w))
        return pd.Series(out)

    kern.__annotations__ = {"arrs": pd.Series, "return": pd.Series}
    c = x if hasattr(x, "cast") else F.col(x)
    return F.pandas_udf("string")(kern)(F.collect_list(c.cast("double")))


def merge_tdigest_agg(d, compression: float = 100.0):
    """KQL `merge_tdigest(d)` — merge stored digests (merge IS the
    build on concatenated centroid sets)."""
    import json

    def kern(arrs):
        out = []
        for arr in arrs:
            ms, ws = [], []
            for dj in arr if arr is not None else []:
                if dj is None:
                    continue
                parsed = json.loads(dj)
                ms.extend(parsed["means"])
                ws.extend(parsed["weights"])
            if not ms:
                out.append(None)
                continue
            m, w = compress(
                np.asarray(ms, dtype=float),
                np.asarray(ws, dtype=float),
                compression,
            )
            out.append(_digest_json(m, w))
        return pd.Series(out)

    kern.__annotations__ = {"arrs": pd.Series, "return": pd.Series}
    c = d if hasattr(d, "cast") else F.col(d)
    return F.pandas_udf("string")(kern)(F.collect_list(c))


def percentile_tdigest_col(d, p: float):
    """KQL `percentile_tdigest(digest, p)` — read a quantile out of a
    stored digest (row-local Arrow kernel; p on Kusto's 0-100 scale)."""
    import json

    q = float(p) / 100.0

    def kern(vals):
        out = []
        for dj in vals:
            if dj is None:
                out.append(None)
                continue
            parsed = json.loads(dj)
            out.append(
                quantile(
                    np.asarray(parsed["means"], dtype=float),
                    np.asarray(parsed["weights"], dtype=float),
                    q,
                )
            )
        return pd.Series(out, dtype="float64")

    kern.__annotations__ = {"vals": pd.Series, "return": pd.Series}
    c = d if hasattr(d, "cast") else F.col(d)
    return F.pandas_udf("double")(kern)(c)


def percentrank_tdigest_col(d, x):
    """KQL `percentrank_tdigest(digest, value)` — estimated percent
    rank (0-100) of value within a stored JSON digest (row-local
    Arrow kernel; the interpolated-CDF `rank` above)."""
    import json

    def kern(vals, xs):
        out = []
        for dj, xv in zip(vals, xs):
            if dj is None or xv is None:
                out.append(None)
                continue
            parsed = json.loads(dj)
            out.append(
                100.0
                * rank(
                    np.asarray(parsed["means"], dtype=float),
                    np.asarray(parsed["weights"], dtype=float),
                    float(xv),
                )
            )
        return pd.Series(out, dtype="float64")

    kern.__annotations__ = {
        "vals": pd.Series, "xs": pd.Series, "return": pd.Series
    }
    c = d if hasattr(d, "cast") else F.col(d)
    xc = x if hasattr(x, "cast") else F.lit(x)
    return F.pandas_udf("double")(kern)(c, xc.cast("double"))


def rank_tdigest_col(d, x):
    """KQL `rank_tdigest(digest, value)` — approximate absolute rank
    (1-based position) of value: round(CDF(value) * total weight),
    clamped to [1, n] once the value is within the digest's range."""
    import json

    def kern(vals, xs):
        out = []
        for dj, xv in zip(vals, xs):
            if dj is None or xv is None:
                out.append(None)
                continue
            parsed = json.loads(dj)
            w = np.asarray(parsed["weights"], dtype=float)
            cdf = rank(
                np.asarray(parsed["means"], dtype=float), w, float(xv)
            )
            total = float(w.sum())
            out.append(
                float(min(max(round(cdf * total), 1 if cdf > 0 else 0), total))
            )
        return pd.Series(out, dtype="float64")

    kern.__annotations__ = {
        "vals": pd.Series, "xs": pd.Series, "return": pd.Series
    }
    c = d if hasattr(d, "cast") else F.col(d)
    xc = x if hasattr(x, "cast") else F.lit(x)
    return F.pandas_udf("double")(kern)(c, xc.cast("double")).cast("long")
