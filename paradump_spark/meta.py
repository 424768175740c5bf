"""Table metadata model — the Spark restatement of the reference's
``MetadataTable`` / ``columnInfo`` (src/paradump/paradump.go:695-754).

The reference carries every value as a string plus render-flags; here the
schema is a real ``StructType`` and the flags become derived properties.
Error-bit semantics mirror src/paradump/paradump.go:1385-1409:
1 = no PK, 2 = no usable fallback index, 4 = unsupported storage,
8 = not a base table, 16 = does not exist.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# Reference kind sets (src/paradump/paradump.go:809-813).
CHAR_KINDS = {"char", "longtext", "mediumtext", "text", "tinytext", "varchar", "enum"}
BINARY_KINDS = {"varbinary", "binary", "tinyblob", "blob", "mediumblob", "longblob", "bit"}
TEMPORAL_KINDS = {"date", "datetime", "time", "timestamp"}
FLOAT_KINDS = {"float", "double"}

ERR_NO_PK = 1
ERR_NO_FALLBACK_INDEX = 2
ERR_BAD_ENGINE = 4
ERR_NOT_BASE_TABLE = 8
ERR_MISSING = 16


@dataclass
class ColumnMeta:
    """Per-column metadata (ref columnInfo, src/paradump/paradump.go:695-707)."""

    name: str
    sql_type: str  # lowercased DATA_TYPE, e.g. "varchar", "bigint"
    spark_type: T.DataType
    nullable: bool = True
    dt_prec: int = 0  # fractional-second digits (ref dtPrec)
    nu_prec: int = 0  # numeric precision (ref nuPrec)
    enum_values: tuple[str, ...] = ()  # enum labels, index order = compare order

    @property
    def is_kind_char(self) -> bool:
        return self.sql_type in CHAR_KINDS

    @property
    def is_kind_binary(self) -> bool:
        return self.sql_type in BINARY_KINDS

    @property
    def is_kind_float(self) -> bool:
        return self.sql_type in FLOAT_KINDS

    @property
    def is_kind_date(self) -> bool:
        return self.sql_type in TEMPORAL_KINDS

    @property
    def must_be_quoted(self) -> bool:
        # ref: char ∪ binary ∪ temporal (src/paradump/paradump.go:811)
        return self.is_kind_char or self.is_kind_binary or self.is_kind_date

    @property
    def have_fract(self) -> bool:
        return self.is_kind_date and self.dt_prec > 0


@dataclass
class TableMeta:
    """Per-table metadata (ref MetadataTable, src/paradump/paradump.go:721-754)."""

    db_name: str
    tb_name: str
    columns: list[ColumnMeta]
    primary_key: list[str] = field(default_factory=list)
    fake_primary_key: bool = False  # promoted index, admits duplicates (ref :1200-1228)
    size_bytes: int = 0
    est_rows: int = 0
    storage_engine: str = ""
    has_triggers: bool = False
    is_empty: bool = False
    dst_db_name: str = ""
    on_error: int = 0

    @property
    def full_name(self) -> str:
        return f"{self.db_name}.{self.tb_name}"

    @property
    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]

    @property
    def payload_columns(self) -> list[str]:
        """Non-PK columns — the 'did the row change' compare set of the diff."""
        pk = set(self.primary_key)
        return [c.name for c in self.columns if c.name not in pk]

    def column(self, name: str) -> ColumnMeta:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)

    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, c.spark_type, c.nullable) for c in self.columns]
        )

    def check_usable(self, guess_primary_key: bool = False) -> int:
        """Recompute the error bits the reference gates execution on."""
        err = self.on_error
        if not self.primary_key:
            err |= ERR_NO_PK
            if guess_primary_key:
                err |= ERR_NO_FALLBACK_INDEX
        return err


# MySQL DATA_TYPE -> Spark type (SURVEY §1.4). ``unsigned`` handled by caller
# bumping to the next width (unsigned bigint -> DecimalType(20, 0)).
_MYSQL_TO_SPARK: dict[str, T.DataType] = {
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "mediumint": T.IntegerType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "char": T.StringType(),
    "varchar": T.StringType(),
    "tinytext": T.StringType(),
    "text": T.StringType(),
    "mediumtext": T.StringType(),
    "longtext": T.StringType(),
    "enum": T.StringType(),
    "binary": T.BinaryType(),
    "varbinary": T.BinaryType(),
    "tinyblob": T.BinaryType(),
    "blob": T.BinaryType(),
    "mediumblob": T.BinaryType(),
    "longblob": T.BinaryType(),
    "bit": T.BinaryType(),
    "date": T.DateType(),
    "datetime": T.TimestampNTZType(),
    "timestamp": T.TimestampType(),
    "time": T.StringType(),  # Spark has no TIME type; keep the string form
    "json": T.StringType(),
}


def mysql_type_to_spark(
    data_type: str, unsigned: bool = False, precision: int = 10, scale: int = 0
) -> T.DataType:
    """Map a MySQL DATA_TYPE to a Spark type (SURVEY §1.4 table).

    Unsigned integer kinds are widened one step; unsigned bigint becomes
    DecimalType(20,0) — the classic JDBC overflow trap.
    """
    dt = data_type.lower()
    if dt == "decimal":
        return T.DecimalType(precision, scale)
    if unsigned:
        widened: dict[str, T.DataType] = {
            "tinyint": T.ShortType(),
            "smallint": T.IntegerType(),
            "mediumint": T.IntegerType(),
            "int": T.LongType(),
            "bigint": T.DecimalType(20, 0),
        }
        if dt in widened:
            return widened[dt]
    if dt in _MYSQL_TO_SPARK:
        return _MYSQL_TO_SPARK[dt]
    raise ValueError(f"unsupported MySQL type: {data_type}")


def meta_from_dataframe(db_name: str, tb_name: str, schema: T.StructType,
                        primary_key: list[str] | None = None,
                        size_bytes: int = 0, est_rows: int = 0) -> TableMeta:
    """Build a TableMeta from a Spark schema (lake tables / testdata)."""
    rev = {
        T.ByteType(): "tinyint", T.ShortType(): "smallint",
        T.IntegerType(): "int", T.LongType(): "bigint",
        T.FloatType(): "float", T.DoubleType(): "double",
        T.StringType(): "varchar", T.BinaryType(): "blob",
        T.DateType(): "date", T.TimestampType(): "timestamp",
        T.TimestampNTZType(): "datetime", T.BooleanType(): "tinyint",
    }
    cols = [
        ColumnMeta(
            name=f.name,
            sql_type=rev.get(f.dataType, f.dataType.simpleString()),
            spark_type=f.dataType,
            nullable=f.nullable,
        )
        for f in schema.fields
    ]
    return TableMeta(
        db_name=db_name, tb_name=tb_name, columns=cols,
        primary_key=primary_key or [], size_bytes=size_bytes, est_rows=est_rows,
        storage_engine="parquet",
    )
