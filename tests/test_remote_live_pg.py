"""LIVE PostgreSQL federation + wire-protocol interop (r12).

Rounds 7-11 carried 'live Postgres federation' as environment-blocked:
no server, no Python driver. This environment now ships the PostgreSQL
15 server binaries (initdb/pg_ctl/postgres) and the real psql client —
and sources/pgclient.py (a minimal pure-Python v3 wire client) removes
the driver gap, so BOTH directions finally run against real software:

* OUTBOUND — CREATE EXTERNAL TABLE ... LOCATION 'postgresql://...'
  federates through the engine to a LIVE postgres 15, end to end
  through Spark's Python DataSource (schema introspection on the
  driver, the read loop on executors, filter pushdown rendered in the
  PG dialect). Reference parity: datafusion_remote_tables/src/
  provider.rs:121-171 (connector-x federation).
* INBOUND — the engine's OWN pg wire server (engine/pgwire.py) is
  driven by the REAL `psql` binary, not our hand-rolled test client.

The server runs as uid `nobody` (postgres refuses root) on a high
port with trust auth, data dir under pytest's tmp tree. Every test
skips cleanly when the binaries are absent or the server cannot start.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import time

import pytest

from pyspark.sql import functions as F

PG_PORT = 54331
INITDB = shutil.which("initdb") or "/usr/local/bin/initdb"
PG_CTL = shutil.which("pg_ctl") or "/usr/local/bin/pg_ctl"
PSQL = shutil.which("psql")
RUNUSER = shutil.which("runuser")

requires_pg = pytest.mark.skipif(
    not (os.path.exists(INITDB) and os.path.exists(PG_CTL) and RUNUSER),
    reason="PostgreSQL server binaries not available",
)


def _run(cmd: list[str], **kw) -> subprocess.CompletedProcess:
    return subprocess.run(
        cmd, capture_output=True, text=True, timeout=120, **kw
    )


@pytest.fixture(scope="module")
def live_pg():
    """initdb + start a real postgres 15 as `nobody`, trust auth, seeded
    with a typed table; yields the DSN; always stops the server.

    The data dir lives under a fresh world-traversable mkdtemp —
    pytest's tmp roots are 0700 under root and `nobody` (which postgres
    must run as; it refuses root) cannot reach them."""
    if not (os.path.exists(INITDB) and os.path.exists(PG_CTL) and RUNUSER):
        pytest.skip("PostgreSQL server binaries not available")
    import tempfile

    base_s = tempfile.mkdtemp(prefix="sfs_livepg_")
    os.chmod(base_s, 0o777)
    from pathlib import Path

    base = Path(base_s)
    data = str(base / "data")
    r = _run(
        [RUNUSER, "-u", "nobody", "--", INITDB, "-D", data, "-A", "trust",
         "-U", "pg", "--no-sync"],
    )
    if r.returncode != 0:
        pytest.skip(f"initdb failed: {r.stderr[-200:]}")
    r = _run(
        [RUNUSER, "-u", "nobody", "--", PG_CTL, "-D", data,
         "-l", str(base / "log"),
         "-o", f"-p {PG_PORT} -k {base} -c listen_addresses=127.0.0.1",
         "start"],
    )
    if r.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {r.stderr[-200:]}")
    dsn = f"postgresql://pg@127.0.0.1:{PG_PORT}/postgres"
    try:
        # seed through OUR wire client — double duty as a write-path
        # smoke of the simple-query protocol
        from seafowl_spark.sources.pgclient import connect

        deadline = time.time() + 30
        while True:
            try:
                con = connect(port=PG_PORT, user="pg", dbname="postgres")
                break
            except Exception:
                if time.time() > deadline:
                    raise
                time.sleep(0.3)
        cur = con.cursor()
        cur.execute(
            "CREATE TABLE items (id bigint, name text, price numeric(10,2),"
            " ok boolean, ts timestamp, d date, payload bytea,"
            " ratio double precision)"
        )
        cur.execute(
            "INSERT INTO items VALUES"
            " (1,'alpha',9.99,true,'2024-01-02 03:04:05','2024-01-02',"
            "'\\x0102',0.5),"
            " (2,'beta',1.50,false,'2024-02-03 04:05:06','2024-02-03',"
            "'\\xff',2.25),"
            " (3,'gamma',NULL,NULL,NULL,NULL,NULL,NULL),"
            " (4,'delta',0.01,true,'2024-03-04 05:06:07','2024-03-04',"
            "'\\x00',4.0)"
        )
        con.close()
        yield dsn
    finally:
        _run([RUNUSER, "-u", "nobody", "--", PG_CTL, "-D", data,
              "-m", "immediate", "stop"])
        shutil.rmtree(base_s, ignore_errors=True)


@requires_pg
class TestLiveFederation:
    def test_read_remote_table_types_and_nulls(self, spark, live_pg):
        import datetime as dt
        from decimal import Decimal

        from seafowl_spark.sources.remote import read_remote_table

        df = read_remote_table(spark, live_pg, "items")
        rows = {r["id"]: r for r in df.collect()}
        assert set(rows) == {1, 2, 3, 4}
        r1 = rows[1]
        assert r1["name"] == "alpha"
        assert r1["price"] == Decimal("9.99")
        assert r1["ok"] is True
        assert r1["ts"] == dt.datetime(2024, 1, 2, 3, 4, 5)
        assert r1["d"] == dt.date(2024, 1, 2)
        assert bytes(r1["payload"]) == b"\x01\x02"
        assert r1["ratio"] == 0.5
        r3 = rows[3]
        assert r3["price"] is None and r3["ts"] is None
        assert r3["payload"] is None and r3["ok"] is None

    def test_filter_pushdown_against_live_server(self, spark, live_pg):
        from seafowl_spark.sources.remote import read_remote_table

        df = read_remote_table(spark, live_pg, "items")
        out = (
            df.where((F.col("id") > 1) & (F.col("ok") == True))  # noqa: E712
            .select("id", "name")
            .collect()
        )
        assert [(r["id"], r["name"]) for r in out] == [(4, "delta")]

    def test_range_partitioned_live_read(self, spark, live_pg):
        from seafowl_spark.sources.remote import read_remote_table

        df = read_remote_table(
            spark, live_pg, "items",
            options={"partition_column": "id", "num_partitions": "2"},
        )
        assert df.rdd.getNumPartitions() == 2
        assert df.count() == 4

    def test_engine_external_table_end_to_end(self, ctx, live_pg):
        ctx.execute(
            "CREATE EXTERNAL TABLE pg_items STORED AS TABLE "
            f"OPTIONS ('name' 'items') LOCATION '{live_pg}'"
        )
        out = ctx.execute(
            "SELECT id, name FROM staging.pg_items "
            "WHERE id >= 2 AND id <= 3 ORDER BY id"
        )
        assert [(r["id"], r["name"]) for r in out.collect()] == [
            (2, "beta"), (3, "gamma"),
        ]

    def test_missing_table_clean_error(self, spark, live_pg):
        from seafowl_spark.sources.remote import (
            RemoteTableError,
            introspect_schema,
        )

        with pytest.raises(RemoteTableError, match="does not exist"):
            introspect_schema(live_pg, "nope_not_here")


@pytest.mark.skipif(PSQL is None, reason="psql client not available")
class TestRealPsqlAgainstOurServer:
    """The engine's pg wire server answered only our hand-rolled test
    client until now — the REAL psql binary is the interop proof the
    reference's frontend has (seafowl is routinely driven by psql)."""

    def _psql(self, port: int, sql: str) -> subprocess.CompletedProcess:
        return _run(
            [PSQL, "-h", "127.0.0.1", "-p", str(port), "-U", "any",
             "-d", "default", "-At", "-c", sql],
        )

    def test_psql_select_and_ddl(self, ctx):
        from seafowl_spark.engine.pgwire import PgWireServer

        srv = PgWireServer(ctx).start()
        try:
            r = self._psql(srv.port, "SELECT 1 + 1 AS two")
            assert r.returncode == 0, r.stderr
            assert r.stdout.strip() == "2"
            r = self._psql(
                srv.port, "CREATE TABLE psqlt (x INT, s STRING)"
            )
            assert r.returncode == 0, r.stderr
            r = self._psql(
                srv.port, "INSERT INTO psqlt VALUES (1,'a'), (2, NULL)"
            )
            assert r.returncode == 0, r.stderr
            r = self._psql(
                srv.port,
                "SELECT x, COALESCE(s, '<null>') AS s FROM psqlt ORDER BY x",
            )
            assert r.returncode == 0, r.stderr
            assert r.stdout.strip().splitlines() == ["1|a", "2|<null>"]
        finally:
            srv.stop()

    def test_psql_error_is_clean(self, ctx):
        from seafowl_spark.engine.pgwire import PgWireServer

        srv = PgWireServer(ctx).start()
        try:
            r = self._psql(srv.port, "SELECT * FROM no_such_table_xyz")
            assert r.returncode != 0
            assert "no_such_table_xyz" in (r.stderr + r.stdout)
        finally:
            srv.stop()
