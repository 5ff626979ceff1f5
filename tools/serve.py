"""Run the full server: HTTP + Arrow Flight + PostgreSQL wire frontends on
one SeafowlContext/SparkSession (the reference's single-binary equivalent;
main.rs:169-237 starts the same three frontends).

Usage: python tools/serve.py [data_dir] [--http PORT] [--flight PORT] [--pg PORT]
       python tools/serve.py -c seafowl.toml   (reference-compatible config)
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
    ap.add_argument(
        "-c", "--config",
        default=None,
        help="seafowl.toml-compatible config file (reference layout: "
        "[object_store]/[catalog]/[frontend.*]; enables only the frontends "
        "the file configures)",
    )
    args = ap.parse_args()

    from hashlib import sha256

    from seafowl_spark.engine.context import SeafowlContext
    from seafowl_spark.engine.flight import start_flight_server
    from seafowl_spark.engine.pgwire import PgWireServer
    from seafowl_spark.engine.server import AccessPolicy, SeafowlServer
    from seafowl_spark.session import build_session

    if args.config:
        from seafowl_spark.engine.config import load_config

        cfg = load_config(args.config)
        data_dir = cfg.data_dir
        catalog_path = None if cfg.catalog_dsn in (None, ":memory:") else cfg.catalog_dsn
        policy = AccessPolicy(read=cfg.read_access, write=cfg.write_access)
        if cfg.object_cache:
            from seafowl_spark.sources.external import configure_chunk_cache

            configure_chunk_cache(
                capacity=cfg.object_cache.get("capacity"),
                min_fetch_size=cfg.object_cache.get("min_fetch_size"),
                ttl=cfg.object_cache.get("ttl"),
            )
    else:
        cfg = None
        data_dir = args.data_dir
        catalog_path = None

        def _pol(pw: str | None) -> str:
            return sha256(pw.encode()).hexdigest() if pw else "any"

        policy = AccessPolicy(
            read=_pol(args.read_password), write=_pol(args.write_password)
        )

    spark = build_session("seafowl_spark_server")
    spark.sparkContext.setLogLevel("WARN")
    ctx = SeafowlContext(
        spark, data_dir, catalog_path=catalog_path,
        allow_python_udfs=args.enable_python_udfs,
    )

    http = fl = pg = None
    if cfg is None or cfg.http is not None:
        port = args.http if cfg is None else cfg.http.bind_port
        kw = {} if cfg is None else {
            "cache_control": cfg.cache_control,
            "upload_max_mb": cfg.upload_data_max_length_mb,
        }
        http = SeafowlServer(ctx, port=port, policy=policy, **kw).start()
    if cfg is None or cfg.flight is not None:
        port = args.flight if cfg is None else cfg.flight.bind_port
        fl = start_flight_server(ctx, port=port, policy=policy)
    if cfg is None or cfg.pg is not None:
        port = args.pg if cfg is None else cfg.pg.bind_port
        pg = PgWireServer(ctx, port=port, policy=policy).start()
    parts = [
        f"http://127.0.0.1:{http.port}/q" if http else None,
        f"flight grpc://127.0.0.1:{fl.port}" if fl else None,
        f"pg 127.0.0.1:{pg.port}" if pg else None,
    ]
    print(
        "seafowl_spark serving: "
        + "  ".join(p for p in parts if p)
        + f"  (data: {data_dir})"
    )
    signal.sigwait({signal.SIGINT, signal.SIGTERM})
    if http:
        http.stop()
    if pg:
        pg.stop()
    if fl:
        fl.shutdown()


if __name__ == "__main__":
    main()
