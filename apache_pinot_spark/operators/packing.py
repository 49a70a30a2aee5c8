"""Sequence packing — assigning whole documents to fixed-token-budget
training rows ("packs"), the step between chunking/curation and writing
pretraining shards. Packing whole short documents together (instead of
padding each to the context length) is the standard public technique
for keeping per-batch token utilization high.

Scale shape (100 TB posture): packing is a GREEDY, ORDER-DEPENDENT
decision, so it cannot be a pure declarative plan — but it does NOT
need global state either. The public practice is per-partition packing:
with millions of documents per partition the fill loss vs a global
optimum is negligible, and no cross-partition coordination is needed.
So: ONE hash repartition on the document key (the only shuffle),
a within-partition sort (count desc, key — first-fit-decreasing order,
deterministic on any cluster), then one Arrow ``mapInPandas`` pass that
streams the partition through a bounded open-bin first-fit. State is
O(open_bins) per task regardless of partition size; documents larger
than the budget get their own pack and an ``oversize`` flag (splitting
is the caller's decision — compose with chunk_documents upstream).

Determinism: partition = hash(key), scan order = (count desc, key), so
the same corpus and parameters reproduce the same pack assignment on
any cluster size with the same ``partitions`` value. Pack ids embed the
partition id, so they are globally unique without coordination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assign_packs(
    df: DataFrame,
    count_col: str,
    max_units: int,
    key_col: str = "doc_id",
    partitions: int | None = None,
    open_bins: int = 64,
) -> DataFrame:
    """Assign every row to a pack of at most ``max_units`` total
    ``count_col`` units (tokens, usually). Adds three columns:

      pack_id     — globally unique string "<partition>-<bin>"
      pack_offset — the row's first unit offset within its pack
      oversize    — count > max_units: the row got its OWN pack and
                    exceeds the budget by itself (caller decides:
                    truncate, or chunk_documents first)

    First-fit over a bounded list of ``open_bins`` open packs in
    first-fit-decreasing order (rows sorted by count desc within the
    partition); when the list is full the fullest open pack closes.
    NULL counts pack as 0 units; negative counts raise.
    """
    if max_units < 1:
        raise ValueError(f"max_units must be >= 1, got {max_units}")
    if open_bins < 1:
        raise ValueError(f"open_bins must be >= 1, got {open_bins}")
    n_parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    base = (
        df.repartition(n_parts, F.col(key_col))
        .sortWithinPartitions(F.col(count_col).desc_nulls_last(), F.col(key_col))
        .withColumn("__pid", F.spark_partition_id())
    )
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("pack_id", T.StringType()),
            T.StructField("pack_offset", T.LongType()),
            T.StructField("oversize", T.BooleanType()),
        ]
    )
    in_cols = [f.name for f in df.schema.fields]
    cap = int(max_units)
    max_open = int(open_bins)
    ccol = count_col

    def pack(iterator):
        # self-contained closure (worker-safe from any cwd)
        import pandas as _pd

        bins: list[list[int]] = []  # [remaining, bin_idx]
        next_idx = 0
        for pdf in iterator:
            pack_ids: list[str] = []
            offsets: list[int] = []
            oversized: list[bool] = []
            pid_series = pdf["__pid"]
            counts = pdf[ccol]
            for i in range(len(pdf)):
                raw = counts.iloc[i]
                cnt = 0 if _pd.isna(raw) else int(raw)
                if cnt < 0:
                    raise ValueError(
                        f"assign_packs: negative {ccol} value {cnt}"
                    )
                pid = int(pid_series.iloc[i])
                if cnt > cap:
                    # own pack, flagged; never enters the open list
                    pack_ids.append(f"{pid}-{next_idx}")
                    offsets.append(0)
                    oversized.append(True)
                    next_idx += 1
                    continue
                placed = False
                for b in bins:
                    if b[0] >= cnt:
                        pack_ids.append(f"{pid}-{b[1]}")
                        offsets.append(cap - b[0])
                        oversized.append(False)
                        b[0] -= cnt
                        placed = True
                        break
                if not placed:
                    pack_ids.append(f"{pid}-{next_idx}")
                    offsets.append(0)
                    oversized.append(False)
                    bins.append([cap - cnt, next_idx])
                    next_idx += 1
                    if len(bins) > max_open:
                        # close the fullest pack (smallest remaining —
                        # least likely to accept a future row)
                        bins.remove(min(bins, key=lambda b: (b[0], b[1])))
            out = pdf[in_cols].copy()
            out["pack_id"] = pack_ids
            out["pack_offset"] = _pd.array(offsets, dtype="int64")
            out["oversize"] = oversized
            yield out

    return base.mapInPandas(pack, out_schema)


def packing_summary(
    packed: DataFrame, count_col: str, max_units: int
) -> DataFrame:
    """Single-row fill report over an ``assign_packs`` result:
    (n_packs, n_docs, total_units, mean_fill_frac, min_fill_frac,
    oversize_packs). Two linear aggregates — per-pack totals reduce
    map-side, the final reduce sees one row per pack."""
    per_pack = packed.groupBy("pack_id").agg(
        F.sum(F.coalesce(F.col(count_col), F.lit(0))).alias("__fill"),
        F.count("*").alias("__docs"),
        F.max(F.col("oversize").cast("int")).alias("__over"),
    )
    return per_pack.agg(
        F.count("*").alias("n_packs"),
        F.sum("__docs").alias("n_docs"),
        F.sum("__fill").alias("total_units"),
        F.avg(
            F.when(F.col("__over") == 0, F.col("__fill") / F.lit(max_units))
        ).alias("mean_fill_frac"),
        F.min(
            F.when(F.col("__over") == 0, F.col("__fill") / F.lit(max_units))
        ).alias("min_fill_frac"),
        F.sum("__over").alias("oversize_packs"),
    )
