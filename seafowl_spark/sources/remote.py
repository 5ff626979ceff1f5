"""Remote tables (query federation): ``CREATE EXTERNAL TABLE ... STORED AS
TABLE OPTIONS ('name' '<table>') LOCATION '<dsn>'``.

Reference surface: datafusion_remote_tables/src/provider.rs:121-235 (the
RemoteTable scan renders ``SELECT <cols> FROM <t> WHERE <pushed> LIMIT n``
against the remote database), filter_pushdown.rs:13-110 (expression ->
remote-dialect SQL with per-backend operator support), factory.rs (dsn
dispatch); tested by tests/statements/query.rs:123-345.

Spark-first design — a PySpark **Python DataSource** (the Spark 4 API),
not a driver-side fetch:

* Catalyst offers top-level AND-conjunct predicates through
  ``DataSourceReader.pushFilters``; the shippable subset becomes a remote
  ``WHERE`` clause and the rest is returned for Spark to evaluate —
  exactly the reference's Exact/Unsupported split
  (provider.rs:supports_filters_pushdown). Note one divergence: the
  Python DS API never offers OR-trees for pushdown, so disjunctions stay
  Spark-side (the reference ships them); the conjunctive residue still
  prunes remote rows.
* Reads run on **executors**, one connection per input partition. With
  ``partition_column``/``num_partitions`` the remote table is range-split
  (JDBC-style; bounds introspected with a remote MIN/MAX when not given),
  so a large remote read parallelizes instead of bottlenecking one task.
* Rows stream back as **Arrow record batches** (never row-at-a-time
  pickling) in fetchmany-sized chunks, so executor memory stays bounded.

Backends: ``sqlite://<path>`` (stdlib sqlite3) is fully supported and
live-tested. ``postgresql://`` / ``mysql://`` ship complete dialects —
identifier quoting, literal rendering, LIKE escapes, information_schema
introspection SQL and type mapping (unit-tested without a server) — and
connect through psycopg2 / pymysql when installed; in this environment
those drivers are absent and connecting raises a clear error, mirroring
the reference's connector-x backend matrix
(datafusion_remote_tables/src/factory.rs).
"""

from __future__ import annotations

import datetime as _dt
import sqlite3
from typing import Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)
from pyspark.sql import types as T

FORMAT_NAME = "seafowl_remote"
_FETCH_ROWS = 10_000


class RemoteTableError(Exception):
    pass


# ---------------------------------------------------------------------- dsn

def parse_dsn(dsn: str) -> tuple[str, str]:
    """Split a connection string into (backend, path/netloc)."""
    for prefix, kind in (
        ("sqlite://", "sqlite"),
        ("postgresql://", "postgresql"),
        ("postgres://", "postgresql"),
        ("mysql://", "mysql"),
    ):
        if dsn.startswith(prefix):
            return kind, dsn[len(prefix):]
    # bare path == sqlite file (convenience)
    return "sqlite", dsn


def _connect(dsn: str):
    kind, path = parse_dsn(dsn)
    if kind == "sqlite":
        # URI mode, read-only: federated reads must not lock the source
        return sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    if kind == "postgresql":
        try:
            import psycopg2  # type: ignore[import-not-found]

            return psycopg2.connect(dsn)
        except ImportError:
            # r12: fall back to the bundled pure-Python wire client
            # (sources/pgclient.py) — trust/cleartext/md5/SCRAM-SHA-256
            # auth, simple query protocol; enough for read-only
            # federation and what makes the live-server tests runnable
            # in an environment with no PostgreSQL Python driver
            from urllib.parse import parse_qs, urlparse

            from .pgclient import PgClientError
            from .pgclient import connect as _pg_connect

            u = urlparse(dsn)
            # honor sslmode/sslrootcert from the DSN query string
            # (r13); other libpq params (connect_timeout,
            # application_name, ...) are not interpreted by the
            # fallback
            q = parse_qs(u.query) if u.query else {}
            sslmode = q.get("sslmode", ["prefer"])[0]
            sslrootcert = q.get("sslrootcert", [None])[0]
            try:
                return _pg_connect(
                    host=u.hostname or "localhost",
                    port=u.port or 5432,
                    user=u.username or "postgres",
                    dbname=(u.path or "/postgres").lstrip("/")
                    or "postgres",
                    password=u.password,
                    sslmode=sslmode,
                    sslrootcert=sslrootcert,
                )
            except (OSError, PgClientError) as exc:
                # r13 (advisor find): keep the error CONTRACT of the
                # psycopg2 path — callers match RemoteTableError, not
                # raw socket tracebacks — and say which client ran and
                # what it can't do (TLS without certificate
                # verification; libpq params other than sslmode are not
                # interpreted)
                raise RemoteTableError(
                    f"cannot connect to {u.hostname or 'localhost'}:"
                    f"{u.port or 5432} as {u.username or 'postgres'} "
                    f"via the bundled pure-Python pg client (psycopg2 "
                    f"is not installed; the fallback speaks trust/"
                    f"cleartext/md5/SCRAM-SHA-256 with sslmode="
                    f"disable/prefer/require/verify-ca/verify-full "
                    f"+ sslrootcert): {exc}"
                ) from exc
    if kind == "mysql":
        try:
            import pymysql  # type: ignore[import-not-found]
        except ImportError as exc:
            raise RemoteTableError(
                "remote backend 'mysql' needs the pymysql client driver, "
                "which is not installed in this environment"
            ) from exc
        from urllib.parse import urlparse

        u = urlparse(dsn.replace("mysql://", "http://", 1))
        return pymysql.connect(
            host=u.hostname or "localhost",
            port=u.port or 3306,
            user=u.username or "",
            password=u.password or "",
            database=u.path.lstrip("/"),
        )
    raise RemoteTableError(f"unsupported remote backend {kind!r}")


# ------------------------------------------------------------------- schema

# sqlite declared-type -> Spark type (affinity rules, same buckets the
# reference gets from connector-x's sqlite Arrow mapping)
def _sqlite_decl_to_spark(decl: str) -> T.DataType:
    d = (decl or "").upper()
    if "INT" in d:
        return T.LongType()
    if any(k in d for k in ("CHAR", "CLOB", "TEXT", "JSON", "VARCHAR")):
        return T.StringType()
    if "BLOB" in d or d == "":
        return T.BinaryType()
    if any(k in d for k in ("REAL", "FLOA", "DOUB")):
        return T.DoubleType()
    if "BOOL" in d:
        return T.BooleanType()
    if "DATE" in d and "TIME" not in d:
        return T.DateType()
    if any(k in d for k in ("TIMESTAMP", "DATETIME", "TIME")):
        return T.TimestampNTZType()
    if any(k in d for k in ("NUMERIC", "DECIMAL")):
        return T.DoubleType()
    return T.StringType()


def introspect_schema(dsn: str, table: str) -> T.StructType:
    """Remote schema introspection (reference: introspected case of
    query.rs:123-140 via connector-x). sqlite's PRAGMA returns
    (cid, name, type, ...); the information_schema query the pg/mysql
    dialects render returns (name, type) directly."""
    dialect = dialect_for(dsn)
    con = _connect(dsn)
    try:
        cols = _execute(con, dialect.introspection_sql(table)).fetchall()
    finally:
        con.close()
    if not cols:
        raise RemoteTableError(f"remote table {table!r} does not exist or has no columns")
    pairs = [(c[1], c[2]) for c in cols] if dialect.name == "sqlite" else [(c[0], c[1]) for c in cols]
    return T.StructType(
        [T.StructField(name, dialect.type_to_spark(decl), True) for name, decl in pairs]
    )


def _execute(con, sql: str):
    """Driver-API bridge: sqlite3 executes on the connection; DB-API 2.0
    drivers (psycopg2, pymysql) need an explicit cursor."""
    if hasattr(con, "execute"):
        return con.execute(sql)
    cur = con.cursor()
    cur.execute(sql)
    return cur


# ----------------------------------------------------------------- dialects

class Dialect:
    """Per-backend SQL rendering (reference filter_pushdown.rs keeps one
    visitor per backend for the same reason: quoting, literal syntax and
    LIKE escaping differ)."""

    name = "sqlite"

    def quote(self, ident: str) -> str:
        return '"' + ident.replace('"', '""') + '"'

    def bool_lit(self, v: bool) -> str:
        return "1" if v else "0"

    def bytes_lit(self, v: bytes) -> str:
        return "X'" + v.hex() + "'"

    def lit(self, v: Any) -> str | None:
        """Python literal -> remote SQL literal (reference
        filter_pushdown.rs scalar_value_to_sql)."""
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return self.bool_lit(v)
        if isinstance(v, (int, float)):
            return repr(v)
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, bytes):
            return self.bytes_lit(v)
        if isinstance(v, _dt.datetime):
            return "'" + v.strftime("%Y-%m-%d %H:%M:%S.%f") + "'"
        if isinstance(v, _dt.date):
            return "'" + v.isoformat() + "'"
        return None

    def like_escape(self, s: str) -> str:
        return (
            s.replace("\\", "\\\\")
            .replace("%", "\\%")
            .replace("_", "\\_")
            .replace("'", "''")
        )

    def introspection_sql(self, table: str) -> str:
        return f"PRAGMA table_info({self.quote(table)})"

    def type_to_spark(self, decl: str) -> T.DataType:
        return _sqlite_decl_to_spark(decl)


class PostgresDialect(Dialect):
    name = "postgresql"

    def bool_lit(self, v: bool) -> str:
        return "TRUE" if v else "FALSE"

    def bytes_lit(self, v: bytes) -> str:
        return "'\\x" + v.hex() + "'::bytea"

    def introspection_sql(self, table: str) -> str:
        t = table.replace("'", "''")
        return (
            "SELECT column_name, data_type FROM information_schema.columns "
            f"WHERE table_name = '{t}' ORDER BY ordinal_position"
        )

    def type_to_spark(self, decl: str) -> T.DataType:
        return _pg_type_to_spark(decl)


class MySQLDialect(Dialect):
    name = "mysql"

    def quote(self, ident: str) -> str:
        return "`" + ident.replace("`", "``") + "`"

    def introspection_sql(self, table: str) -> str:
        t = table.replace("'", "''")
        return (
            "SELECT column_name, data_type FROM information_schema.columns "
            f"WHERE table_name = '{t}' AND table_schema = DATABASE() "
            "ORDER BY ordinal_position"
        )

    def type_to_spark(self, decl: str) -> T.DataType:
        return _mysql_type_to_spark(decl)


_DIALECTS = {
    "sqlite": Dialect(),
    "postgresql": PostgresDialect(),
    "mysql": MySQLDialect(),
}


def dialect_for(dsn: str) -> Dialect:
    return _DIALECTS[parse_dsn(dsn)[0]]


# reference type matrices: connector-x arrow mappings the reference relies
# on for PG/MySQL (datafusion_remote_tables/src/provider.rs schema path)
def _pg_type_to_spark(decl: str) -> T.DataType:
    d = (decl or "").lower()
    if d in ("smallint", "int2"):
        return T.ShortType()
    if d in ("integer", "int", "int4", "serial"):
        return T.IntegerType()
    if d in ("bigint", "int8", "bigserial"):
        return T.LongType()
    if d in ("real", "float4"):
        return T.FloatType()
    if d in ("double precision", "float8"):
        return T.DoubleType()
    if d.startswith("numeric") or d.startswith("decimal"):
        return T.DecimalType(38, 18)
    if d == "boolean":
        return T.BooleanType()
    if d == "date":
        return T.DateType()
    if d in ("timestamp with time zone", "timestamptz"):
        return T.TimestampType()
    if d.startswith("timestamp"):
        return T.TimestampNTZType()
    if d == "bytea":
        return T.BinaryType()
    return T.StringType()


def _mysql_type_to_spark(decl: str) -> T.DataType:
    d = (decl or "").lower()
    if d == "tinyint":
        return T.ByteType()
    if d == "smallint":
        return T.ShortType()
    if d in ("int", "integer", "mediumint"):
        return T.IntegerType()
    if d == "bigint":
        return T.LongType()
    if d == "float":
        return T.FloatType()
    if d in ("double", "real"):
        return T.DoubleType()
    if d in ("decimal", "numeric"):
        return T.DecimalType(38, 18)
    if d in ("bool", "boolean"):
        return T.BooleanType()
    if d == "date":
        return T.DateType()
    if d in ("datetime", "timestamp"):
        return T.TimestampNTZType()
    if d in ("blob", "tinyblob", "mediumblob", "longblob", "binary", "varbinary"):
        return T.BinaryType()
    return T.StringType()


# ------------------------------------------------------------ sql rendering

_SQLITE = _DIALECTS["sqlite"]


def _quote(ident: str) -> str:
    return _SQLITE.quote(ident)


def _lit(v: Any) -> str | None:
    return _SQLITE.lit(v)


def _like_escape(s: str) -> str:
    return _SQLITE.like_escape(s)


def filter_to_sql(f: Filter, dialect: Dialect = _SQLITE) -> str | None:
    """One pushed conjunct -> remote SQL, or None if not shippable
    (reference FilterPushdownVisitor, filter_pushdown.rs:13-110)."""
    _lit = dialect.lit
    _like_escape = dialect.like_escape
    if isinstance(f, Not):
        inner = filter_to_sql(f.child, dialect)
        return None if inner is None else f"(NOT {inner})"
    col = dialect.quote(f.attribute[-1]) if getattr(f, "attribute", None) else None
    if isinstance(f, EqualTo):
        lit = _lit(f.value)
        return None if lit is None else f"({col} = {lit})"
    if isinstance(f, EqualNullSafe):
        lit = _lit(f.value)
        return None if lit is None else f"({col} IS {lit})"
    if isinstance(f, GreaterThan):
        lit = _lit(f.value)
        return None if lit is None else f"({col} > {lit})"
    if isinstance(f, GreaterThanOrEqual):
        lit = _lit(f.value)
        return None if lit is None else f"({col} >= {lit})"
    if isinstance(f, LessThan):
        lit = _lit(f.value)
        return None if lit is None else f"({col} < {lit})"
    if isinstance(f, LessThanOrEqual):
        lit = _lit(f.value)
        return None if lit is None else f"({col} <= {lit})"
    if isinstance(f, In):
        lits = [_lit(v) for v in f.value]
        if any(x is None for x in lits) or not lits:
            return None
        return f"({col} IN ({', '.join(lits)}))"
    if isinstance(f, IsNull):
        return f"({col} IS NULL)"
    if isinstance(f, IsNotNull):
        return f"({col} IS NOT NULL)"
    if isinstance(f, StringStartsWith):
        return f"({col} LIKE '{_like_escape(f.value)}%' ESCAPE '\\')"
    if isinstance(f, StringEndsWith):
        return f"({col} LIKE '%{_like_escape(f.value)}' ESCAPE '\\')"
    if isinstance(f, StringContains):
        return f"({col} LIKE '%{_like_escape(f.value)}%' ESCAPE '\\')"
    return None


def build_remote_sql(
    schema: T.StructType,
    table: str,
    where: list[str],
    partition_clause: str | None = None,
    dialect: Dialect = _SQLITE,
    limit: int | None = None,
) -> str:
    """The exact query string shipped to the remote database
    (reference provider.rs:170-177 builds the same shape, LIMIT included).

    With range partitions, LIMIT bounds each partition's fetch (an
    over-fetch cap, n rows per partition worst case); the engine keeps its
    own LIMIT on top, so results stay exact."""
    cols = ", ".join(dialect.quote(f.name) for f in schema.fields)
    clauses = list(where)
    if partition_clause:
        clauses.append(partition_clause)
    sql = f"SELECT {cols} FROM {dialect.quote(table)}"
    if clauses:
        sql += " WHERE " + " AND ".join(clauses)
    if limit is not None:
        sql += f" LIMIT {int(limit)}"
    return sql


# ---------------------------------------------------------------- conversion

def _cell(v: Any, dt: T.DataType) -> Any:
    """Coerce one sqlite cell to the Spark/Arrow field type (sqlite stores
    dates/timestamps as text; declared-schema casts mirror the reference's
    ProjectionExec cast layer, provider.rs:195-221)."""
    if v is None:
        return None
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return int(v)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return float(v)
    if isinstance(dt, T.BooleanType):
        return bool(v)
    if isinstance(dt, T.StringType):
        return v if isinstance(v, str) else str(v)
    if isinstance(dt, T.BinaryType):
        return bytes(v) if not isinstance(v, bytes) else v
    if isinstance(dt, T.DateType):
        if isinstance(v, str):
            return _dt.date.fromisoformat(v[:10])
        return v
    if isinstance(dt, (T.TimestampNTZType, T.TimestampType)):
        if isinstance(v, str):
            return _dt.datetime.fromisoformat(v)
        if isinstance(v, (int, float)):
            return _dt.datetime.utcfromtimestamp(v)
        return v
    if isinstance(dt, T.DecimalType):
        from decimal import Decimal

        return Decimal(str(v))
    return v


# ------------------------------------------------------------------- reader

class _RangePartition(InputPartition):
    def __init__(self, clause: str | None):
        self.clause = clause


class RemoteTableReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.dsn = options.get("dsn") or options.get("location")
        self.table = options.get("table") or options.get("name")
        if not self.dsn or not self.table:
            raise RemoteTableError(
                "remote table needs 'dsn'/'location' and 'table'/'name' options"
            )
        self.partition_column = options.get("partition_column")
        self.num_partitions = int(options.get("num_partitions", "1"))
        self.lower_bound = options.get("lower_bound")
        self.upper_bound = options.get("upper_bound")
        self.limit = int(options["limit"]) if options.get("limit") else None
        self.where: list[str] = []
        self.dialect = dialect_for(self.dsn)

    # -- pushdown (called at planning; state carries into partitions/read)

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:  # noqa: N802
        for f in filters:
            sql = filter_to_sql(f, self.dialect)
            if sql is None:
                yield f  # Spark evaluates it post-scan
            else:
                self.where.append(sql)

    # -- partition planning (driver side)

    def partitions(self) -> list[InputPartition]:
        if not self.partition_column or self.num_partitions <= 1:
            return [_RangePartition(None)]
        col = self.dialect.quote(self.partition_column)
        lo, hi = self.lower_bound, self.upper_bound
        if lo is None or hi is None:
            con = _connect(self.dsn)
            try:
                row = _execute(
                    con,
                    f"SELECT MIN({col}), MAX({col}) FROM {self.dialect.quote(self.table)}",
                ).fetchone()
            finally:
                con.close()
            if row is None or row[0] is None:
                return [_RangePartition(None)]
            lo = lo if lo is not None else row[0]
            hi = hi if hi is not None else row[1]
        lo, hi = int(lo), int(hi)
        n = min(self.num_partitions, max(1, hi - lo + 1))
        step = (hi - lo + 1 + n - 1) // n
        parts: list[InputPartition] = []
        for i in range(n):
            a, b = lo + i * step, lo + (i + 1) * step
            clause = f"({col} >= {a} AND {col} < {b})"
            if i == 0:
                clause = f"({clause[1:-1]} OR {col} IS NULL OR {col} < {a})"
            if i == n - 1:
                clause = f"({col} >= {a})"
                if n == 1:
                    clause = None
            parts.append(_RangePartition(clause))
        return parts

    # -- executor-side read

    def read(self, partition: _RangePartition):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.schema)
        sql = build_remote_sql(
            self.schema, self.table, self.where, partition.clause, self.dialect,
            limit=self.limit,
        )
        con = _connect(self.dsn)
        try:
            cur = _execute(con, sql)
            fields = self.schema.fields
            while True:
                rows = cur.fetchmany(_FETCH_ROWS)
                if not rows:
                    break
                cols = []
                for i, f in enumerate(fields):
                    cols.append(
                        pa.array(
                            [_cell(r[i], f.dataType) for r in rows],
                            type=arrow_schema.field(i).type,
                        )
                    )
                yield pa.RecordBatch.from_arrays(cols, schema=arrow_schema)
        finally:
            con.close()


class RemoteTableDataSource(DataSource):
    """spark.read.format("seafowl_remote").options(dsn=..., table=...)"""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> T.StructType:
        dsn = self.options.get("dsn") or self.options.get("location")
        table = self.options.get("table") or self.options.get("name")
        if not dsn or not table:
            raise RemoteTableError(
                "remote table needs 'dsn'/'location' and 'table'/'name' options"
            )
        return introspect_schema(dsn, table)

    def reader(self, schema: T.StructType) -> RemoteTableReader:
        return RemoteTableReader(schema, dict(self.options))


# ------------------------------------------------------------------ helpers

def register_remote_source(spark) -> None:
    """Idempotently register the data source on the session (and enable
    Python data source filter pushdown — off by default, runtime-settable)."""
    if getattr(spark, "_sfs_remote_registered", False):
        return
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(RemoteTableDataSource)
    spark._sfs_remote_registered = True


def read_remote_table(
    spark,
    dsn: str,
    table: str,
    schema: T.StructType | None = None,
    options: dict[str, str] | None = None,
):
    register_remote_source(spark)
    r = spark.read.format(FORMAT_NAME).option("dsn", dsn).option("table", table)
    for k, v in (options or {}).items():
        r = r.option(k, v)
    if schema is not None:
        r = r.schema(schema)
    return r.load()
