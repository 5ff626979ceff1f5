"""Run the full server: HTTP + Arrow Flight + PostgreSQL wire frontends on
one SeafowlContext/SparkSession (the reference's single-binary equivalent;
main.rs:169-237 starts the same three frontends).

Usage: python tools/serve.py [data_dir] [--http PORT] [--flight PORT] [--pg PORT]
"""

from __future__ import annotations

import argparse
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir", nargs="?", default=os.path.expanduser("~/.seafowl_spark"))
    ap.add_argument("--http", type=int, default=8080)
    ap.add_argument("--flight", type=int, default=47470)
    ap.add_argument("--pg", type=int, default=6432)
    ap.add_argument(
        "--read-password",
        default=None,
        help="require this password for reads on every frontend (default: open)",
    )
    ap.add_argument(
        "--write-password",
        default=None,
        help="require this password for writes on every frontend (default: open)",
    )
    ap.add_argument(
        "--enable-python-udfs",
        action="store_true",
        help="allow CREATE FUNCTION ... language 'python' (runs arbitrary "
        "code in the server process; off by default on network frontends)",
    )
    args = ap.parse_args()

    from hashlib import sha256

    from seafowl_spark.engine.context import SeafowlContext
    from seafowl_spark.engine.flight import start_flight_server
    from seafowl_spark.engine.pgwire import PgWireServer
    from seafowl_spark.engine.server import AccessPolicy, SeafowlServer
    from seafowl_spark.session import build_session

    spark = build_session("seafowl_spark_server")
    spark.sparkContext.setLogLevel("WARN")
    ctx = SeafowlContext(spark, args.data_dir, allow_python_udfs=args.enable_python_udfs)

    def _pol(pw: str | None) -> str:
        return sha256(pw.encode()).hexdigest() if pw else "any"

    policy = AccessPolicy(read=_pol(args.read_password), write=_pol(args.write_password))
    http = SeafowlServer(ctx, port=args.http, policy=policy).start()
    fl = start_flight_server(ctx, port=args.flight, policy=policy)
    pg = PgWireServer(ctx, port=args.pg, policy=policy).start()
    print(
        f"seafowl_spark serving: http://127.0.0.1:{http.port}/q  "
        f"flight grpc://127.0.0.1:{fl.port}  pg 127.0.0.1:{pg.port}  "
        f"(data: {args.data_dir})"
    )
    signal.sigwait({signal.SIGINT, signal.SIGTERM})
    http.stop()
    pg.stop()
    fl.shutdown()


if __name__ == "__main__":
    main()
