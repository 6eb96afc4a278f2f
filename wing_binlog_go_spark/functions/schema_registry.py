"""Per-table schema registry: MySQL column metadata → Spark types, typed
views over the generic envelope, and alter-driven refresh.

Reference parity:

- The canal layer lazily fetches `SHOW FULL COLUMNS` per table and caches
  a schema.Table {name, ordered columns, PK ordinals}
  (vendor/.../schema/schema.go:34-58,206-269, cache
  vendor/.../canal/canal.go:283-353). Here that cache is a driver-side
  registry keyed by db.table; entries come from the same metadata shape
  (testable with fixture dicts, JDBC `information_schema` in production).
- Raw-type classification (schema.go:64-116) and value decode
  (src/library/binlog/util.go:61-146, row_event.go:365-509) map onto
  Spark types per SURVEY §1.3; enum/set label lists are parsed from the
  raw type string exactly like schema.go:74-79 does.
- DDL invalidation (vendor/.../canal/sync.go:17-20,146-151): `alter`
  envelopes bump the table's registry version; the reference's known
  mis-decode window (readme.md:54) is narrowed by versioning entries
  instead of clearing them.

The typed view turns ``event.data: map<string,string>`` into real
columns — the engine's equivalent of the reference consumers' manual
JSON parsing, but declarative, so Catalyst prunes untouched columns.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wing_binlog_go_spark.functions.envelope import (
    decode_date,
    decode_enum,
    decode_set,
    decode_year,
    widen_unsigned,
)

_LABELS_RE = re.compile(r"'((?:[^']|'')*)'")


def _parse_labels(raw: str) -> list[str]:
    """enum('a','b') / set('x','y') → labels (schema.go:74-79)."""
    return [m.replace("''", "'") for m in _LABELS_RE.findall(raw)]


@dataclass
class ColumnSpec:
    name: str
    raw_type: str  # the MySQL `Type` string from SHOW FULL COLUMNS
    is_pk: bool = False


@dataclass
class TableSpec:
    database: str
    table: str
    columns: list[ColumnSpec]
    version: int = 0

    @property
    def full_name(self) -> str:
        return f"{self.database}.{self.table}"

    @property
    def pk_columns(self) -> list[str]:
        return [c.name for c in self.columns if c.is_pk]


def decode_column(value: Column, raw_type: str) -> Column:
    """One envelope map value (string) → typed column per SURVEY §1.3.

    Mirrors the classification in schema.go:64-116 + the post-decode in
    util.go:61-146; decimals stay exact (improvement over the
    reference's float64 default, row_event.go:403-406).
    """
    t = raw_type.strip().lower()
    unsigned = "unsigned" in t
    # first word before any '(': MySQL 8.0.19+ drops integer display
    # widths, so the type arrives as "bigint unsigned" — without the
    # split()[0] that whole string would match no branch and silently
    # fall through to string (no unsigned widening, wrong type)
    base = t.split("(")[0].split()[0]

    if base == "tinyint":
        return widen_unsigned(value.cast("int"), 8) if unsigned else value.cast("int")
    if base == "smallint":
        return widen_unsigned(value.cast("int"), 16) if unsigned else value.cast("int")
    if base == "mediumint":
        return widen_unsigned(value.cast("int"), 24) if unsigned else value.cast("int")
    if base in ("int", "integer"):
        return widen_unsigned(value.cast("long"), 32) if unsigned else value.cast("int")
    if base == "bigint":
        return widen_unsigned(value.cast("long"), 64) if unsigned else value.cast("long")
    if base == "float":
        return value.cast("float")
    if base in ("double", "real"):
        return value.cast("double")
    if base in ("decimal", "numeric"):
        # scale is optional in MySQL (decimal(20) ⇒ scale 0): a regex
        # demanding both args would silently shrink decimal(20) to the
        # (10,0) default and NULL-overflow every value over 10 digits
        m = re.match(r"(?:decimal|numeric)\((\d+)(?:,\s*(\d+))?\)", t)
        p = int(m.group(1)) if m else 10
        s = int(m.group(2)) if m and m.group(2) is not None else 0
        return value.cast(f"decimal({p},{s})")
    if base == "bit":
        return value.cast("long")
    if base == "year":
        return decode_year(value.cast("int"))
    if base == "date":
        return decode_date(value)
    if base in ("datetime", "timestamp"):
        return value.cast("timestamp")
    if base == "time":
        return value.cast("string")  # MySQL TIME can exceed 24h; keep string
    if base == "enum":
        # labels come from the ORIGINAL string: classification may
        # lowercase, values must not ("enum('Active',...)" decodes to
        # 'Active', exactly as MySQL returns it)
        return decode_enum(value.cast("int"), _parse_labels(raw_type))
    if base == "set":
        return decode_set(value.cast("long"), _parse_labels(raw_type))
    if base in ("binary", "varbinary", "blob", "tinyblob", "mediumblob",
                "longblob", "geometry"):
        return value.cast("binary")
    if base == "json":
        return value.cast("string")  # JSON text; query via get_json_object
    # char/varchar/text/tinytext/... and anything unknown: string
    return value.cast("string")


class SchemaRegistry:
    """db.table → TableSpec, with alter-driven version bumps (O8)."""

    def __init__(self) -> None:
        self._tables: dict[str, TableSpec] = {}

    def register(self, spec: TableSpec) -> None:
        self._tables[spec.full_name] = spec

    def get(self, full_name: str) -> TableSpec | None:
        return self._tables.get(full_name)

    def apply_ddl(self, full_name: str, new_columns: list[ColumnSpec]) -> None:
        """alter seen in the stream → replace columns, bump version
        (sync.go:146-151 clears the cache; we version instead)."""
        old = self._tables.get(full_name)
        version = (old.version + 1) if old else 0
        db, table = full_name.split(".", 1)
        self._tables[full_name] = TableSpec(db, table, new_columns, version)

    def refresh_from_alter_events(
        self, envelopes: DataFrame, metadata_fetch
    ) -> None:
        """Quiesce point per micro-batch: for every table with an alter
        envelope, re-fetch metadata (JDBC in production; a callable here)."""
        alters = (
            envelopes.filter(F.col("event_type") == "alter")
            .select("full_table")
            .distinct()
            .collect()
        )
        for row in alters:
            self.apply_ddl(row.full_table, metadata_fetch(row.full_table))

    def typed_view(self, envelopes: DataFrame, full_name: str) -> DataFrame:
        """Envelope stream filtered to one table, event.data map decoded
        into typed columns (insert/delete images; update new image)."""
        spec = self._tables[full_name]
        img = F.when(
            F.col("event_type") == "update", F.col("event.new_data")
        ).otherwise(F.col("event.data"))
        cols = [
            decode_column(F.element_at(img, c.name), c.raw_type).alias(c.name)
            for c in spec.columns
        ]
        # exclude alter envelopes: they carry no row image and would
        # surface as phantom all-NULL rows
        return (
            envelopes.filter(F.col("full_table") == full_name)
            .filter(F.col("event_type").isin("insert", "update", "delete"))
            .select("event_type", "event_index", *cols)
        )
