"""Complex-type (array / map / struct) ingestion handling.

Reference: `basics/import-data/complex-type-array-map-handling.md` exists
as a TITLE-ONLY stub, so the semantics here follow Apache Pinot's public
complexTypeConfig behavior: nested records flatten into dotted top-level
columns (delimiter '.'), declared `unnestFields` (arrays of records)
explode into one row per element, arrays of primitives stay multi-valued
columns, and maps flatten their (sampled) keys into dotted columns.

Spark-first: flattening is a pure projection (narrow map, codegen'd);
unnesting is `explode` (narrow — no shuffle); map-key discovery samples
distinct keys once at ingest (an aggregate, not per-row Python). Apply
before `PinotSchema.apply_types` so the flattened names line up with the
declared schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _flatten_once(df: DataFrame, delimiter: str) -> tuple[DataFrame, bool]:
    cols = []
    changed = False
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType):
            changed = True
            for sub in f.dataType.fields:
                cols.append(
                    F.col(f"`{f.name}`.`{sub.name}`").alias(
                        f"{f.name}{delimiter}{sub.name}"
                    )
                )
        else:
            cols.append(F.col(f"`{f.name}`"))
    return (df.select(*cols), changed)


def flatten_structs(df: DataFrame, delimiter: str = ".") -> DataFrame:
    """Recursively lift struct fields to dotted top-level columns
    (`a.b.c`), Pinot's default complex-type flattening."""
    changed = True
    while changed:
        df, changed = _flatten_once(df, delimiter)
    return df


def unnest_arrays(
    df: DataFrame, unnest_fields: list[str], delimiter: str = "."
) -> DataFrame:
    """Explode each declared array-of-record field into one row per
    element (Pinot `unnestFields`), then flatten the element struct into
    dotted columns. Fields are unnested in order; empty/NULL arrays keep
    the row with NULL element columns (explode_outer — a dropped row
    would silently lose the record's other columns)."""
    for field in unnest_fields:
        if field not in df.columns:
            raise KeyError(f"unnest field {field!r} is not a column")
        dt = df.schema[field].dataType
        if not isinstance(dt, T.ArrayType):
            raise TypeError(f"unnest field {field!r} is not an array column")
        others = [c for c in df.columns if c != field]
        df = df.select(*others, F.explode_outer(F.col(f"`{field}`")).alias(field))
        if isinstance(dt.elementType, T.StructType):
            df = flatten_structs(df, delimiter)
    return df


def flatten_maps(
    df: DataFrame,
    map_columns: list[str] | None = None,
    delimiter: str = ".",
    sample_rows: int = 10_000,
) -> DataFrame:
    """Flatten map columns into one dotted column per key. The key set is
    discovered ONCE from a sample (distinct exploded keys — an aggregate,
    mirroring how Pinot's JSON/complex ingestion fixes the flattened
    schema at segment build time), never per-row."""
    targets = map_columns or [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.MapType)
    ]
    for col in targets:
        keys = sorted(
            r[0]
            for r in df.select(F.explode(F.map_keys(F.col(f"`{col}`"))).alias("k"))
            .distinct()
            .limit(sample_rows)
            .collect()
        )
        for k in keys:
            df = df.withColumn(f"{col}{delimiter}{k}", F.col(f"`{col}`").getItem(k))
        df = df.drop(col)
    return df


def complex_type_transform(
    df: DataFrame,
    unnest_fields: list[str] | None = None,
    delimiter: str = ".",
    flatten_map_columns: list[str] | None = None,
) -> DataFrame:
    """The full Pinot complexTypeConfig pipeline: unnest declared array
    fields, flatten structs, flatten maps. Arrays of primitives pass
    through untouched (they are Pinot MV columns)."""
    out = unnest_arrays(df, unnest_fields or [], delimiter)
    out = flatten_structs(out, delimiter)
    if flatten_map_columns is not None:
        out = flatten_maps(out, flatten_map_columns, delimiter)
    else:
        out = flatten_maps(out, None, delimiter)
    return out
