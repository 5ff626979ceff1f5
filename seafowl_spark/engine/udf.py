"""Persisted scalar UDFs (A9/A10; reference src/wasm_udf/*).

The reference accepts `CREATE FUNCTION f AS '<json>'` where the JSON carries
{entrypoint, language, input_types, return_type, data(base64 module),
volatility} and executes WASM per row (wasm.rs:557-627). Parity here:

* language "wasm" / "wasmMessagePack": executed through wasmtime-py INSIDE a
  vectorized loop — gated behind an import-try since wasmtime is not
  installed in this environment (clear error, spec still validates/persists).
* language "python" (our extension): `data` is base64 Python source defining
  a function named `entrypoint`; registered with `spark.udf.register`.

Functions persist in the metastore and re-register on every view reload,
matching the reference's reload_schema behavior (context/mod.rs:101-112).
"""

from __future__ import annotations

import base64

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .types import parse_sql_type

VALID_LANGUAGES = ("wasm", "wasmMessagePack", "python")
VALID_VOLATILITY = ("immutable", "stable", "volatile")


class UdfError(Exception):
    pass


def validate_spec(spec: dict) -> None:
    for key in ("entrypoint", "language", "input_types", "return_type", "data"):
        if key not in spec:
            raise UdfError(f"CREATE FUNCTION spec missing {key!r}")
    if spec["language"] not in VALID_LANGUAGES:
        raise UdfError(
            f"language {spec['language']!r} not supported (one of {VALID_LANGUAGES})"
        )
    if spec.get("volatility", "volatile") not in VALID_VOLATILITY:
        raise UdfError(f"bad volatility {spec['volatility']!r}")
    if spec["language"] == "wasm":
        # the legacy raw ABI is numeric-only (data_types.rs:11-29)
        from .wasm_abi import WasmAbiError, parse_raw_type

        try:
            parse_raw_type(spec["return_type"])
            for t in spec["input_types"]:
                parse_raw_type(t)
        except WasmAbiError as exc:
            raise UdfError(str(exc)) from exc
    elif spec["language"] == "wasmMessagePack":
        # the MessagePack ABI supports exactly the data_types.rs:43-63 table
        from .wasm_abi import WasmAbiError, parse_udf_type

        try:
            parse_udf_type(spec["return_type"])
            for t in spec["input_types"]:
                parse_udf_type(t)
        except WasmAbiError as exc:
            raise UdfError(str(exc)) from exc
    else:
        parse_sql_type(spec["return_type"])
        for t in spec["input_types"]:
            parse_sql_type(t)
    try:
        base64.b64decode(spec["data"])
    except Exception as exc:  # noqa: BLE001
        raise UdfError(f"data is not valid base64: {exc}") from exc


def _python_callable(spec: dict):
    src = base64.b64decode(spec["data"]).decode()
    ns: dict = {}
    exec(src, ns)  # noqa: S102 - reachable only when allow_python is opted in
    fn = ns.get(spec["entrypoint"])
    if fn is None:
        raise UdfError(f"entrypoint {spec['entrypoint']!r} not defined by function body")
    return fn


def _wasm_callable(spec: dict):
    """WASM execution, both ABIs (reference src/wasm_udf/wasm.rs):

    * ``wasmMessagePack`` — the reference's current ABI: per-row
      MessagePack array through the module's alloc/entrypoint/dealloc
      linear-memory protocol (wasm.rs:557-627);
    * legacy ``wasm`` — numeric-only exports called per row with plain
      i32/i64/f32/f64 params (wasm.rs:628-765).

    Bytecode runs through wasmtime when installed (the reference's
    engine), else the pure-Python interpreter (wasm_interp.py) — same
    protocol, verified against the reference's own fixture module."""
    from .wasm_abi import (
        InterpExecutor,
        RawInterpExecutor,
        RawWasmtimeExecutor,
        WasmAbiError,
        WasmtimeExecutor,
        make_raw_row_callable,
        make_row_callable,
    )

    module_bytes = base64.b64decode(spec["data"])
    raw = spec["language"] == "wasm"
    wasmtime_cls = RawWasmtimeExecutor if raw else WasmtimeExecutor
    interp_cls = RawInterpExecutor if raw else InterpExecutor
    factory = make_raw_row_callable if raw else make_row_callable
    try:
        try:
            executor = wasmtime_cls(module_bytes, spec["entrypoint"])
        except WasmAbiError:  # wasmtime not installed
            executor = interp_cls(module_bytes, spec["entrypoint"])
        return factory(executor, spec["input_types"], spec["return_type"])
    except WasmAbiError as exc:
        raise UdfError(str(exc)) from exc


# legacy wasm-native type names -> Spark result types (the reference maps
# them to arrow Int32/Int64/Float32/Float64 via sql_type_to_arrow_type)
_RAW_SPARK_TYPES = {
    "i32": T.IntegerType(),
    "i64": T.LongType(),
    "f32": T.FloatType(),
    "f64": T.DoubleType(),
}


def register_udf(
    spark: SparkSession, name: str, spec: dict, allow_python: bool = True
) -> None:
    rt = spec["return_type"].strip().lower()
    if spec["language"] == "wasm":
        from .wasm_abi import RAW_WASM_TYPES

        ret: T.DataType = _RAW_SPARK_TYPES[RAW_WASM_TYPES[rt]]
    else:
        ret = parse_sql_type(spec["return_type"])
    if spec["language"] == "python":
        if not allow_python:
            raise UdfError(
                "python UDFs are disabled on this server (unsandboxed exec); "
                "start with python UDFs explicitly enabled or use WASM"
            )
        fn = _python_callable(spec)
    else:
        fn = _wasm_callable(spec)
    # Mark nondeterminism BEFORE registration: calling asNondeterministic()
    # on the return of spark.udf.register is a no-op for the SQL-registered
    # function (the JVM UDF was already created deterministic) and Catalyst
    # would CSE/collapse 'volatile' calls.
    from pyspark.sql.functions import udf as _make_udf

    u = _make_udf(fn, ret)
    if spec.get("volatility") == "volatile":
        u = u.asNondeterministic()
    spark.udf.register(name, u)
