"""Pinot schema compiler — schema JSON → Spark StructType + sentinel map +
datetime normalization specs.

Reference: configuration-reference/schema.md. The three field roles
(dimensionFieldSpec / metricFieldSpec / dateTimeFieldSpec, lines 5-13)
drive type mapping and default-null ("sentinel") values:

  * Dimensions (schema.md:29-38): INT→Integer.MIN_VALUE,
    LONG→Long.MIN_VALUE, FLOAT/DOUBLE→negative infinity, BOOLEAN→false,
    TIMESTAMP→epoch 0, STRING→"null", BYTES→empty.
  * Metrics (schema.md:53-60): zeros / empty bytes.
  * DateTime (schema.md:69-72): dimension defaults; format
    `timeSize:timeUnit:timeFormat` with EPOCH or SIMPLE_DATE_FORMAT;
    granularity `size:unit`; main time column range 1971..2071 UTC.
  * Multi-valued columns (schema.md:25): `singleValueField: false` →
    ArrayType, list semantics (order preserved, duplicates allowed),
    default null = single-element array of the sentinel.

Pinot "doesn't support storing null column values natively"
(schema.md:24) — so `apply_sentinels` replaces NULLs at ingest, making
aggregates and predicates see sentinels exactly as Pinot would.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

INT_MIN = -(2**31)
LONG_MIN = -(2**63)

_SPARK_TYPES: dict[str, T.DataType] = {
    "INT": T.IntegerType(),
    "LONG": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "BOOLEAN": T.BooleanType(),
    "TIMESTAMP": T.TimestampType(),
    "STRING": T.StringType(),
    "BYTES": T.BinaryType(),
    "JSON": T.StringType(),  # JSON columns are stored as strings (json-index.md:7)
    "BIG_DECIMAL": T.DecimalType(38, 18),
}

# Internal default null values (sentinels). schema.md:29-38 and :53-60.
_DIM_SENTINELS: dict[str, object] = {
    "INT": INT_MIN,
    "LONG": LONG_MIN,
    "FLOAT": float("-inf"),
    "DOUBLE": float("-inf"),
    "BOOLEAN": False,
    "TIMESTAMP": 0,  # epoch 0 = 1970-01-01 00:00:00 UTC
    "STRING": "null",
    "BYTES": b"",
    "JSON": "null",
}
_METRIC_SENTINELS: dict[str, object] = {
    "INT": 0,
    "LONG": 0,
    "FLOAT": 0.0,
    "DOUBLE": 0.0,
    "BIG_DECIMAL": 0.0,
    "BYTES": b"",
}


@dataclass
class DateTimeFormat:
    """Parsed `timeSize:timeUnit:timeFormat[:pattern]` (schema.md:69-70)."""

    size: int
    unit: str  # MILLISECONDS | SECONDS | MINUTES | HOURS | DAYS
    fmt: str  # EPOCH | SIMPLE_DATE_FORMAT | TIMESTAMP
    pattern: str | None = None

    _UNIT_MILLIS = {
        "MILLISECONDS": 1,
        "SECONDS": 1000,
        "MINUTES": 60_000,
        "HOURS": 3_600_000,
        "DAYS": 86_400_000,
    }

    @classmethod
    def parse(cls, s: str) -> "DateTimeFormat":
        parts = s.split(":", 3)
        if len(parts) < 3:
            raise ValueError(f"bad datetime format {s!r}")
        size, unit, fmt = int(parts[0]), parts[1].upper(), parts[2].upper()
        pattern = parts[3] if len(parts) > 3 else None
        if fmt == "SIMPLE_DATE_FORMAT" and not pattern:
            raise ValueError(f"SIMPLE_DATE_FORMAT needs a pattern: {s!r}")
        return cls(size, unit, fmt, pattern)

    def to_timestamp(self, col: Column) -> Column:
        """Normalize the raw column to a Spark TimestampType."""
        if self.fmt == "SIMPLE_DATE_FORMAT":
            return F.to_timestamp(col.cast("string"), self.pattern)
        # EPOCH in units of `size * unit`
        millis = col.cast("long") * F.lit(self.size * self._UNIT_MILLIS[self.unit])
        return F.timestamp_millis(millis)

    def epoch_millis(self, col: Column) -> Column:
        return F.unix_millis(self.to_timestamp(col))

    @property
    def unit_millis(self) -> int:
        return self.size * self._UNIT_MILLIS[self.unit]

    def value_from_epoch_millis(self, ms: int) -> Column:
        """The column value (in this declared format) representing epoch
        ``ms`` — the inverse of to_timestamp, used for the primary time
        column's segment-creation-time sentinel fallback (schema.md:72)."""
        if self.fmt == "SIMPLE_DATE_FORMAT":
            return F.date_format(F.timestamp_millis(F.lit(ms)), self.pattern)
        return F.lit(ms // self.unit_millis)


@dataclass
class Granularity:
    """`size:unit` bucketing declaration (schema.md:71)."""

    size: int
    unit: str

    @classmethod
    def parse(cls, s: str) -> "Granularity":
        size, unit = s.split(":", 1)
        return cls(int(size), unit.upper())

    @property
    def millis(self) -> int:
        return self.size * DateTimeFormat._UNIT_MILLIS[self.unit]

    def bucket(self, ts: Column) -> Column:
        """Floor a TimestampType column to the granularity bucket."""
        ms = F.unix_millis(ts)
        return F.timestamp_millis((ms - (ms % F.lit(self.millis))).cast("long"))


@dataclass
class FieldSpec:
    name: str
    data_type: str  # Pinot type name, upper
    role: str  # 'dimension' | 'metric' | 'datetime'
    single_value: bool = True
    default_null_value: object | None = None  # user override
    max_length: int | None = None
    format: DateTimeFormat | None = None
    granularity: Granularity | None = None
    # virtualColumnProvider (configuration-reference/schema.md:81): the
    # column is COMPUTED at ingest, not read from the source. Pinot takes
    # a Java class name; this engine takes a Spark SQL expression over the
    # other source columns (documented divergence — declarative, codegen'd,
    # and portable instead of a JVM plugin).
    virtual_column_provider: str | None = None

    @property
    def spark_type(self) -> T.DataType:
        base = _SPARK_TYPES[self.data_type]
        return base if self.single_value else T.ArrayType(base)

    @property
    def sentinel(self) -> object:
        if self.default_null_value is not None:
            return self.default_null_value
        table = _METRIC_SENTINELS if self.role == "metric" else _DIM_SENTINELS
        return table[self.data_type]


@dataclass
class PinotSchema:
    """Compiled schema doc (schema.md:5-13)."""

    schema_name: str
    fields: list[FieldSpec] = field(default_factory=list)
    primary_time_column: str | None = None

    @classmethod
    def from_json(cls, doc: str | dict) -> "PinotSchema":
        d = json.loads(doc) if isinstance(doc, str) else doc
        fields: list[FieldSpec] = []
        for spec in d.get("dimensionFieldSpecs", []):
            fields.append(
                FieldSpec(
                    name=spec["name"],
                    data_type=spec["dataType"].upper(),
                    role="dimension",
                    single_value=spec.get("singleValueField", True),
                    default_null_value=spec.get("defaultNullValue"),
                    max_length=spec.get("maxLength"),
                    virtual_column_provider=spec.get("virtualColumnProvider"),
                )
            )
        for spec in d.get("metricFieldSpecs", []):
            fields.append(
                FieldSpec(
                    name=spec["name"],
                    data_type=spec["dataType"].upper(),
                    role="metric",
                    default_null_value=spec.get("defaultNullValue"),
                )
            )
        for spec in d.get("dateTimeFieldSpecs", []):
            dt = spec["dataType"].upper()
            fields.append(
                FieldSpec(
                    name=spec["name"],
                    data_type=dt,
                    role="datetime",
                    default_null_value=spec.get("defaultNullValue"),
                    # TIMESTAMP dataType ignores format (JDBC literal form,
                    # schema.md:69)
                    format=None
                    if dt == "TIMESTAMP"
                    else DateTimeFormat.parse(spec["format"]),
                    granularity=Granularity.parse(spec["granularity"])
                    if spec.get("granularity")
                    else None,
                )
            )
        return cls(
            schema_name=d.get("schemaName", "unnamed"),
            fields=fields,
            primary_time_column=d.get("primaryTimeColumn")
            or (
                d.get("dateTimeFieldSpecs", [{}])[0].get("name")
                if d.get("dateTimeFieldSpecs")
                else None
            ),
        )

    @property
    def struct_type(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f.name, f.spark_type, True) for f in self.fields]
        )

    def field(self, name: str) -> FieldSpec:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)

    # -- ingest passes ------------------------------------------------------

    def apply_types(self, df: DataFrame) -> DataFrame:
        """Cast source columns to the declared types (schema is explicit,
        never inferred — schema.md:5-13). Missing columns materialize as
        NULL and then pick up sentinels. Virtual columns
        (virtualColumnProvider, schema.md:81) are computed from the SOURCE
        row via their provider expression — a narrow map, codegen'd with
        the rest of the projection."""
        cols = []
        for f in self.fields:
            if f.virtual_column_provider is not None:
                c = F.expr(f.virtual_column_provider).cast(f.spark_type)
            elif f.name in df.columns:
                c = F.col(f.name).cast(f.spark_type)
            else:
                c = F.lit(None).cast(f.spark_type)
            if f.max_length is not None and f.data_type == "STRING" and f.single_value:
                c = F.substring(c, 1, f.max_length)
            cols.append(c.alias(f.name))
        return df.select(*cols)

    def _time_sentinel_in_range(self, f: FieldSpec) -> bool:
        """Is the declared/default null value of a datetime field inside
        the 1971-2071 UTC validity window (schema.md:72)?"""
        try:
            if f.data_type == "TIMESTAMP":
                ms = int(f.sentinel)
            elif f.format is not None and f.format.fmt == "EPOCH":
                ms = int(f.sentinel) * f.format.unit_millis
            else:
                return False  # SDF string sentinels are not valid times
        except (TypeError, ValueError):
            return False
        return 31_536_000_000 <= ms < 3_187_296_000_000

    def apply_sentinels(self, df: DataFrame, ingest_time_ms: int | None = None) -> DataFrame:
        """Replace NULLs with Pinot sentinels (schema.md:24-60). MV columns
        default to a single-element array of the sentinel (schema.md:25).

        PRIMARY time column rule (schema.md:72): its value must land in
        1971-2071 UTC for segment management; when the (default) null
        value is outside that window, SEGMENT CREATION TIME is used
        instead — pass ``ingest_time_ms`` to pin it (tests/replays),
        else the current wall clock applies."""
        import time as _time

        out = df
        for f in self.fields:
            if f.name not in out.columns:
                continue
            if (
                f.role == "datetime"
                and f.name == self.primary_time_column
                and not self._time_sentinel_in_range(f)
            ):
                ms = ingest_time_ms if ingest_time_ms is not None else int(_time.time() * 1000)
                if f.data_type == "TIMESTAMP":
                    sent = F.timestamp_millis(F.lit(ms))
                else:
                    sent = f.format.value_from_epoch_millis(ms).cast(
                        _SPARK_TYPES[f.data_type]
                    )
            elif f.role == "datetime" and f.data_type == "TIMESTAMP":
                sent = F.timestamp_millis(F.lit(int(f.sentinel)))
            elif f.data_type == "TIMESTAMP":
                sent = F.lit(f.sentinel).cast(_SPARK_TYPES[f.data_type])
            else:
                sent = F.lit(f.sentinel).cast(_SPARK_TYPES[f.data_type])
            if not f.single_value:
                sent = F.array(sent)
                out = out.withColumn(
                    f.name,
                    F.when(
                        F.col(f.name).isNull() | (F.size(f.name) == 0), sent
                    ).otherwise(F.col(f.name)),
                )
            else:
                out = out.withColumn(f.name, F.coalesce(F.col(f.name), sent))
        return out

    def normalized_time(self, df: DataFrame, column: str | None = None) -> Column:
        """Canonical TimestampType for a datetime column, honoring its
        declared format (F5 machinery, schema.md:70)."""
        name = column or self.primary_time_column
        if name is None:
            raise ValueError("schema has no datetime column")
        f = self.field(name)
        if f.data_type == "TIMESTAMP" or f.format is None:
            return F.col(name).cast("timestamp")
        return f.format.to_timestamp(F.col(name))
