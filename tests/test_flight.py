"""Arrow Flight frontend tests (reference tests/flight/): query roundtrip,
search-path scoping, inline metastore, CDC sync over do_put."""

import json

import pandas as pd
import pyarrow as pa
import pyarrow.flight as flight
import pytest

from seafowl_spark.engine.flight import start_flight_server
from tests.conftest import rows


@pytest.fixture()
def server(ctx):
    srv = start_flight_server(ctx)
    yield ctx, srv, flight.FlightClient(f"grpc://127.0.0.1:{srv.port}")
    srv.shutdown()


def run_query(client, command: dict) -> pa.Table:
    desc = flight.FlightDescriptor.for_command(json.dumps(command).encode())
    info = client.get_flight_info(desc)
    return client.do_get(info.endpoints[0].ticket).read_all()


class TestFlightQueries:
    def test_query_roundtrip(self, server):
        ctx, srv, client = server
        ctx.execute("CREATE TABLE f (x int, s text); INSERT INTO f VALUES (1, 'a'), (2, 'b')")
        t = run_query(client, {"query": "SELECT * FROM f ORDER BY x"})
        assert t.to_pydict() == {"x": [1, 2], "s": ["a", "b"]}

    def test_ticket_consumed_once(self, server):
        ctx, srv, client = server
        ctx.execute("CREATE TABLE g (x int); INSERT INTO g VALUES (1)")
        desc = flight.FlightDescriptor.for_command(
            json.dumps({"query": "SELECT * FROM g"}).encode()
        )
        info = client.get_flight_info(desc)
        client.do_get(info.endpoints[0].ticket).read_all()
        with pytest.raises(flight.FlightServerError):
            client.do_get(info.endpoints[0].ticket).read_all()

    def test_search_path(self, server):
        ctx, srv, client = server
        ctx.execute("CREATE SCHEMA alt")
        ctx.execute("CREATE TABLE alt.sp (x int); INSERT INTO alt.sp VALUES (7)")
        t = run_query(client, {"query": "SELECT * FROM sp", "search_path": "alt"})
        assert t.to_pydict() == {"x": [7]}

    def test_inline_metastore(self, server, tmp_path):
        """Stateless serving: client ships table name -> deltalite path."""
        ctx, srv, client = server
        ctx.execute("CREATE TABLE src (x int); INSERT INTO src VALUES (5), (6)")
        root = ctx.table_root(ctx.catalog.get_table("default", "public", "src"))
        t = run_query(
            client,
            {"query": "SELECT sum(x) AS s FROM shipped", "tables": {"shipped": root}},
        )
        assert t.to_pydict() == {"s": [11]}


class TestFlightSync:
    def test_do_put_then_flush(self, server):
        ctx, srv, client = server
        ctx.execute("CREATE TABLE ft (pk bigint, v text)")
        ctx.execute("INSERT INTO ft VALUES (1, 'one')")
        root = ctx.table_root(ctx.catalog.get_table("default", "public", "ft"))

        cmd = {
            "path": root,
            "origin": "test-origin",
            "sequence_number": 1,
            "descriptors": [
                {"name": "old_pk", "role": "old_pk", "target": "pk"},
                {"name": "new_pk", "role": "new_pk", "target": "pk"},
                {"name": "v", "role": "value", "target": "v"},
            ],
        }
        batch = pa.Table.from_pandas(
            pd.DataFrame({"old_pk": [1.0, None], "new_pk": [1.0, 2.0], "v": ["ONE", "two"]})
        )
        desc = flight.FlightDescriptor.for_command(json.dumps(cmd).encode())
        writer, _ = client.do_put(desc, batch.schema)
        writer.write_table(batch)
        writer.close()
        client.do_action(flight.Action("flush", b""))

        out = ctx.execute("SELECT pk, v FROM ft ORDER BY pk")
        assert rows(out) == [(1, "ONE"), (2, "two")]
