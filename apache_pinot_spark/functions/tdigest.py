"""TDigest BYTES interop (A7, SURVEY §2.3; configuration-reference/schema.md:48).

Pinot stores percentile state in BYTES metric columns as a serialized
t-digest (``PERCENTILETDIGEST``); the canonical on-the-wire layout is the
tdunning/t-digest ``MergingDigest`` VERBOSE encoding, which is what
Pinot's object serde writes and reads. A migrating user brings parquet
segments whose BYTES column holds those blobs; this module lets them be
merged and queried without the JVM library:

* ``serialize`` / ``deserialize`` — the MergingDigest VERBOSE layout
  (all fields big-endian, Java ``ByteBuffer`` default order)::

      int32   encoding code (1 = VERBOSE)
      float64 min
      float64 max
      float64 compression
      int32   n (centroid count)
      float64 weight[0..n)    (block of all weights)
      float64 mean[0..n)      (block of all means)

  ``deserialize`` rejects the SMALL encoding (code 2, float32-delta
  packed) with an explicit error rather than guessing — re-serialize
  with ``asBytes`` (verbose) on the producing side. Cross-verification
  against the Java library needs a JVM artifact not present in this
  container; the layout above is the published format and is covered by
  a byte-level golden test (tests/test_tdigest.py).

* ``TDigest`` — a deterministic merging t-digest (t-digest paper,
  Dunning & Ertl: "Computing extremely accurate quantiles using
  t-digests") with the k1 (arcsine) scale function. Build sorts values
  and greedily merges weight-1 centroids under the k1 size limit; merge
  concatenates centroid lists, sorts by mean, and re-merges — both pure
  numpy, deterministic for a given multiset of inputs.

Scale shape (100 TB): ``tdigest_sketch`` builds per-group digests in two
phases — an Arrow ``mapInPandas`` pass producing one partial digest per
(partition, group), then a groupBy + ``applyInPandas`` merge over those
constant-size partials. Raw rows are reduced map-side; only ~centroid
arrays (≤ ~2·compression × 16 bytes) shuffle per group per partition,
the same partial/final contract as Spark's own sketch aggregates.
Querying a BYTES digest column (``tdigest_percentile_agg_udf``) is a
registered pandas grouped-agg UDF: constant state per group, usable in
SQL with or without GROUP BY.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint inference resolves 'pd.Series'

VERBOSE_ENCODING = 1
SMALL_ENCODING = 2
DEFAULT_COMPRESSION = 100.0


class TDigest:
    """Immutable-ish merging t-digest: sorted centroid arrays + bounds."""

    __slots__ = ("mean", "weight", "min", "max", "compression")

    def __init__(
        self,
        mean: np.ndarray,
        weight: np.ndarray,
        vmin: float,
        vmax: float,
        compression: float = DEFAULT_COMPRESSION,
    ):
        self.mean = np.asarray(mean, dtype=np.float64)
        self.weight = np.asarray(weight, dtype=np.float64)
        self.min = float(vmin)
        self.max = float(vmax)
        self.compression = float(compression)

    # -- construction ------------------------------------------------------
    @classmethod
    def empty(cls, compression: float = DEFAULT_COMPRESSION) -> "TDigest":
        return cls(
            np.empty(0), np.empty(0), float("inf"), float("-inf"), compression
        )

    @classmethod
    def from_values(
        cls,
        values: Iterable[float],
        compression: float = DEFAULT_COMPRESSION,
    ) -> "TDigest":
        v = np.asarray(list(values) if not isinstance(values, np.ndarray) else values,
                       dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return cls.empty(compression)
        v = np.sort(v)
        mean, weight = _merge_centroids(v, np.ones_like(v), compression)
        return cls(mean, weight, float(v[0]), float(v[-1]), compression)

    @classmethod
    def merge_all(
        cls,
        digests: Sequence["TDigest"],
        compression: float | None = None,
    ) -> "TDigest":
        digests = [d for d in digests if d.weight.size > 0]
        if compression is None:
            compression = digests[0].compression if digests else DEFAULT_COMPRESSION
        if not digests:
            return cls.empty(compression)
        mean = np.concatenate([d.mean for d in digests])
        weight = np.concatenate([d.weight for d in digests])
        order = np.argsort(mean, kind="stable")
        mean, weight = _merge_centroids(mean[order], weight[order], compression)
        return cls(
            mean,
            weight,
            min(d.min for d in digests),
            max(d.max for d in digests),
            compression,
        )

    # -- properties --------------------------------------------------------
    @property
    def total_weight(self) -> float:
        return float(self.weight.sum())

    def quantile(self, q: float) -> float:
        """Value at quantile ``q`` in [0, 1]: centroids centered at their
        cumulative-weight midpoints, linear interpolation between
        neighbors, min/max anchoring the extremes (the standard
        MergingDigest estimator shape)."""
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile must be in [0, 1], got {q}")
        n = self.mean.size
        if n == 0:
            raise ValueError("empty t-digest")
        if n == 1:
            return float(self.mean[0])
        total = self.weight.sum()
        index = q * total
        # centroid "centers" in cumulative-weight space
        cum = np.cumsum(self.weight)
        centers = cum - self.weight / 2.0
        if index <= centers[0]:
            # interpolate min -> first centroid center
            if centers[0] <= 0:
                return float(self.mean[0])
            t = index / centers[0]
            return self.min + t * (float(self.mean[0]) - self.min)
        if index >= centers[-1]:
            tail = total - centers[-1]
            if tail <= 0:
                return float(self.mean[-1])
            t = (index - centers[-1]) / tail
            return float(self.mean[-1]) + t * (self.max - float(self.mean[-1]))
        i = int(np.searchsorted(centers, index, side="right")) - 1
        span = centers[i + 1] - centers[i]
        t = (index - centers[i]) / span if span > 0 else 0.0
        return float(self.mean[i] + t * (self.mean[i + 1] - self.mean[i]))

    def cdf(self, x: float) -> float:
        """Empirical CDF estimate at ``x`` (rank space) — the inverse of
        quantile(), used by tests to express the t-digest accuracy
        guarantee as rank error."""
        n = self.mean.size
        if n == 0:
            raise ValueError("empty t-digest")
        total = self.weight.sum()
        if x < self.min:
            return 0.0
        if x >= self.max:
            return 1.0
        if n == 1:
            return 0.5
        cum = np.cumsum(self.weight)
        centers = cum - self.weight / 2.0
        if x < self.mean[0]:
            span = float(self.mean[0]) - self.min
            t = (x - self.min) / span if span > 0 else 1.0
            return float(t * centers[0] / total)
        if x >= self.mean[-1]:
            span = self.max - float(self.mean[-1])
            t = (x - float(self.mean[-1])) / span if span > 0 else 0.0
            return float((centers[-1] + t * (total - centers[-1])) / total)
        i = int(np.searchsorted(self.mean, x, side="right")) - 1
        span = float(self.mean[i + 1] - self.mean[i])
        t = (x - float(self.mean[i])) / span if span > 0 else 0.0
        return float((centers[i] + t * (centers[i + 1] - centers[i])) / total)


def _k1(q: np.ndarray | float, compression: float) -> np.ndarray | float:
    """k1 (arcsine) scale function: k(q) = (δ / 2π) · asin(2q − 1)."""
    return compression / (2.0 * np.pi) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)


def _k1_inv(k: float, compression: float) -> float:
    """Inverse of _k1: q(k) = (sin(2πk / δ) + 1) / 2."""
    return float((np.sin(2.0 * np.pi * k / compression) + 1.0) / 2.0)


def _merge_centroids(
    mean: np.ndarray, weight: np.ndarray, compression: float
) -> tuple[np.ndarray, np.ndarray]:
    """One greedy merge pass over mean-sorted centroids under the k1 size
    limit (the MergingDigest compress step). Deterministic: input order
    fully determines output."""
    total = float(weight.sum())
    out_mean: list[float] = []
    out_weight: list[float] = []
    cur_m = float(mean[0])
    cur_w = float(weight[0])
    w_emitted = 0.0  # weight already emitted (closed centroids)
    q_limit = _k1_inv(float(_k1(0.0, compression)) + 1.0, compression)
    limit = total * q_limit
    for i in range(1, mean.size):
        w_i = float(weight[i])
        if w_emitted + cur_w + w_i <= limit or cur_w == 0.0:
            # weighted-mean fold keeps the centroid mean exact
            cur_m += (float(mean[i]) - cur_m) * w_i / (cur_w + w_i)
            cur_w += w_i
        else:
            out_mean.append(cur_m)
            out_weight.append(cur_w)
            w_emitted += cur_w
            q_limit = _k1_inv(
                float(_k1(w_emitted / total, compression)) + 1.0, compression
            )
            limit = total * q_limit
            cur_m = float(mean[i])
            cur_w = w_i
    out_mean.append(cur_m)
    out_weight.append(cur_w)
    return np.asarray(out_mean), np.asarray(out_weight)


# -- wire format -----------------------------------------------------------
def serialize(d: TDigest) -> bytes:
    """MergingDigest VERBOSE bytes (big-endian; layout in module doc)."""
    n = d.mean.size
    head = struct.pack(">iddd i".replace(" ", ""), VERBOSE_ENCODING,
                       d.min, d.max, d.compression, n)
    body = struct.pack(f">{n}d", *d.weight.tolist()) + struct.pack(
        f">{n}d", *d.mean.tolist()
    )
    return head + body


def deserialize(blob: bytes) -> TDigest:
    """Parse a VERBOSE t-digest blob; reject SMALL explicitly.

    Both tdunning digest classes share encoding code 1 but lay the
    centroid block out differently, and the class is implicit on the
    wire — Java deserializes with the class it expects. The declared
    centroid count makes the layouts length-distinguishable, so both are
    accepted:

      MergingDigest: 32 + 16n bytes — float64 weight[n], float64 mean[n]
      AVLTreeDigest: 32 + 12n bytes — float64 mean[n],  int32  count[n]

    (n = 0 is identical in both and trivially empty.)"""
    if len(blob) < 4:
        raise ValueError("t-digest blob too short for encoding header")
    (encoding,) = struct.unpack_from(">i", blob, 0)
    if encoding == SMALL_ENCODING:
        raise ValueError(
            "t-digest SMALL encoding (code 2) not supported: re-serialize "
            "with asBytes() (VERBOSE) on the producing side"
        )
    if encoding != VERBOSE_ENCODING:
        raise ValueError(f"unknown t-digest encoding code {encoding}")
    vmin, vmax, compression, n = struct.unpack_from(">dddi", blob, 4)
    if len(blob) >= 32 + 16 * n:  # MergingDigest layout (the Pinot default)
        weight = np.asarray(struct.unpack_from(f">{n}d", blob, 32))
        mean = np.asarray(struct.unpack_from(f">{n}d", blob, 32 + 8 * n))
    elif len(blob) >= 32 + 12 * n:  # AVLTreeDigest layout
        mean = np.asarray(struct.unpack_from(f">{n}d", blob, 32))
        weight = np.asarray(
            struct.unpack_from(f">{n}i", blob, 32 + 8 * n), dtype=np.float64
        )
    else:
        raise ValueError(
            f"t-digest blob truncated: {n} centroids need "
            f"{32 + 12 * n} (AVL) or {32 + 16 * n} (Merging) bytes, got {len(blob)}"
        )
    return TDigest(mean, weight, vmin, vmax, compression)


def merge_blobs(blobs: Iterable[bytes]) -> TDigest:
    """Deserialize + merge a collection of t-digest BYTES values (NULLs
    skipped), e.g. one per Pinot segment."""
    return TDigest.merge_all([deserialize(b) for b in blobs if b is not None])


# -- Spark integration -----------------------------------------------------
def tdigest_sketch(df, keys: list[str], value_col: str,
                   compression: float = DEFAULT_COMPRESSION,
                   out_col: str = "tdigest"):
    """Per-group t-digest BYTES column, built map-side-first.

    Phase 1 (``mapInPandas``): each Arrow batch groups locally and emits
    one partial digest per (group, batch) — the map-side combine. Phase 2
    (groupBy + ``applyInPandas``): merge the constant-size partials per
    group. Only digests shuffle, never raw rows.
    """
    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(
        [df.schema[k] for k in keys] + [StructField(out_col, BinaryType())]
    )

    def partials(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for kv, grp in pdf.groupby(keys, dropna=False, sort=False):
                if not isinstance(kv, tuple):
                    kv = (kv,)
                d = TDigest.from_values(
                    grp[value_col].to_numpy(dtype=np.float64, na_value=np.nan),
                    compression,
                )
                rows.append((*kv, serialize(d)))
            yield pd.DataFrame(rows, columns=[*keys, out_col])

    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        merged = serialize(merge_blobs(pdf[out_col]))
        head = pdf.iloc[[0]][keys].copy()
        head[out_col] = [merged]
        return head

    return (
        df.select(*keys, value_col)
        .mapInPandas(partials, schema)
        .groupBy(*keys)
        .applyInPandas(merge, schema)
    )


UDF_NAME = "pinot_tdigest_pct"
RAW_UDF_NAME = "pinot_tdigest_raw"
BUILD_RAW_UDF_NAME = "pinot_tdigest_build"


def register_tdigest_udfs(spark) -> None:
    """Register the grouped-agg pandas UDF ``pinot_tdigest_pct(blob, q)``
    (q in 0–100, Pinot's PERCENTILETDIGEST convention): merges the
    group's serialized digests, returns the quantile estimate. Idempotent
    per session."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pinot_tdigest_pct(blobs: pd.Series, q: pd.Series) -> float:
        d = merge_blobs(blobs.dropna())
        if d.weight.size == 0:
            return float("nan")
        return d.quantile(float(q.iloc[0]) / 100.0)

    @pandas_udf("binary")
    def pinot_tdigest_raw(blobs: pd.Series) -> bytes:
        # RAW form over a BYTES digest column: the MERGED serialized
        # digest (clients post-aggregate across queries)
        return serialize(merge_blobs(blobs.dropna()))

    @pandas_udf("binary")
    def pinot_tdigest_build(values: pd.Series) -> bytes:
        # RAW form over a raw numeric column: build-and-serialize
        import numpy as _np

        return serialize(
            TDigest.from_values(values.dropna().to_numpy(dtype=_np.float64))
        )

    spark.udf.register(UDF_NAME, pinot_tdigest_pct)
    spark.udf.register(RAW_UDF_NAME, pinot_tdigest_raw)
    spark.udf.register(BUILD_RAW_UDF_NAME, pinot_tdigest_build)
