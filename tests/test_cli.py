"""CLI one-off mode (reference tests/cli/one_off.rs: `seafowl --one-off
"<multi-statement sql>"` prints the last statement's result as JSON lines
and exits 0; errors exit non-zero)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(sql, data_dir):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "repl.py"), str(data_dir), "--one-off", sql],
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_one_off_ctas_then_select(tmp_path):
    r = _run(
        "CREATE TABLE one_off AS VALUES (1, 'one'), (2, 'two'); SELECT * FROM one_off",
        tmp_path / "d",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(x) for x in r.stdout.strip().splitlines()]
    assert sorted(lines, key=lambda o: o["col1"]) == [
        {"col1": 1, "col2": "one"},
        {"col1": 2, "col2": "two"},
    ]


def test_one_off_error_exits_nonzero(tmp_path):
    r = _run("SELECT * FROM does_not_exist", tmp_path / "d")
    assert r.returncode == 1
    assert "error:" in r.stderr


def test_repl_database_switch(tmp_path):
    """Interactive \\c switches the connection database (psql-style)."""
    script = (
        "CREATE DATABASE d2;\n"
        "\\c d2\n"
        "CREATE TABLE t2 (x int);\n"
        "INSERT INTO t2 VALUES (4);\n"
        "SELECT x AS result_x FROM t2;\n"
        "\\c nope\n"
        "\\q\n"
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "repl.py"), str(tmp_path / "d")],
        input=script,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'connected to database "d2"' in r.stdout
    assert "result_x" in r.stdout and "4" in r.stdout
    assert "error:" in r.stdout  # \c nope
