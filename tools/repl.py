"""Interactive SQL REPL (reference src/cli/: `\\d`, `\\d name`, `\\q`)
and one-off execution mode (reference `seafowl --one-off "<sql>"`,
tests/cli/one_off.rs: run ;-separated statements, print the last
statement's result as JSON lines, exit non-zero on error).

Usage: python tools/repl.py [data_dir]
       python tools/repl.py [data_dir] --one-off "<sql>"
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from seafowl_spark.engine.context import SeafowlContext
    from seafowl_spark.session import build_session

    args = sys.argv[1:]
    one_off = None
    if "--one-off" in args:
        i = args.index("--one-off")
        if i + 1 >= len(args):
            print("--one-off requires a SQL argument", file=sys.stderr)
            sys.exit(2)
        one_off = args[i + 1]
        args = args[:i] + args[i + 2 :]
    data_dir = args[0] if args else os.path.expanduser("~/.seafowl_spark")
    spark = build_session("seafowl_spark_repl")
    spark.sparkContext.setLogLevel("ERROR")
    ctx = SeafowlContext(spark, data_dir)

    if one_off is not None:
        from seafowl_spark.engine.server import _rows_to_jsonlines

        try:
            df = ctx.execute(one_off)
        except Exception as exc:  # noqa: BLE001
            print(f"error: {exc}", file=sys.stderr)
            sys.exit(1)
        if df is not None:
            sys.stdout.write(_rows_to_jsonlines(df).decode())
        sys.exit(0)

    print(f"seafowl_spark REPL — data at {data_dir}; \\d lists tables, \\q quits")

    buf: list[str] = []
    while True:
        try:
            line = input("... " if buf else "sql> ")
        except (EOFError, KeyboardInterrupt):
            print()
            break
        cmd = line.strip()
        if not buf and cmd in (r"\q", "exit", "quit"):
            break
        if not buf and cmd == r"\d":
            ctx.execute("SHOW TABLES").show(100, truncate=False)
            continue
        if not buf and cmd.startswith(r"\d "):
            ctx.execute(f"DESCRIBE {cmd[3:].strip()}").show(100, truncate=False)
            continue
        if not buf and cmd.startswith(r"\c "):
            # psql-style database switch
            try:
                ctx.set_database(cmd[3:].strip())
                print(f'connected to database "{ctx.database}"')
            except Exception as exc:  # noqa: BLE001
                print(f"error: {exc}")
            continue
        buf.append(line)
        if not cmd.endswith(";") and cmd != "":
            continue
        sql = "\n".join(buf).strip().rstrip(";")
        buf = []
        if not sql:
            continue
        try:
            df = ctx.execute(sql)
            if df is not None:
                df.show(100, truncate=False)
            else:
                print("ok")
        except Exception as exc:  # noqa: BLE001
            print(f"error: {exc}")


if __name__ == "__main__":
    main()
