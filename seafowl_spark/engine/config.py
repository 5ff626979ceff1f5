"""seafowl.toml-compatible server configuration.

Parses the reference's TOML layout (src/config/schema.rs:43-360; default
template in build_default_config) and maps it onto this engine:

* ``[object_store]`` — ``local`` (data_dir) and ``memory`` map to the
  deltalite data directory; cloud stores (s3/gcs) are rejected with a
  clear error (no cloud SDKs in this build).
* ``[catalog]`` — ``sqlite`` with a ``dsn`` path (``:memory:`` included);
  ``postgres``/``clade`` catalogs are rejected (the clade-style inline
  metastore is available through the Flight frontend instead).
* ``[frontend.http]`` — bind host/port, ``read_access``/``write_access``
  (``"any"`` | ``"off"`` | sha256-hex of the password, exactly the
  reference's AccessSettings), ``cache_control``,
  ``upload_data_max_length``.
* ``[frontend.flight]`` / ``[frontend.postgres]`` — bind host/port.
* ``[misc.object_store_cache]`` — capacity / min_fetch_size / ttl for the
  chunked http read cache (sources/object_cache.py).

A frontend is enabled iff its section is present (same as the reference).
Unknown sections/keys raise ConfigError — the reference's serde
``deny_unknown_fields`` catches typos the same way; reference keys this
build deliberately ignores (``[runtime]``, ``misc.gc_interval``, ...) are
accepted and listed in ``IGNORED``.
"""

from __future__ import annotations

import os
import tempfile
import tomllib
from dataclasses import dataclass, field


class ConfigError(Exception):
    pass


@dataclass
class FrontendAddr:
    bind_host: str = "127.0.0.1"
    bind_port: int = 0


@dataclass
class ServerConfig:
    data_dir: str = ""
    catalog_dsn: str | None = None
    http: FrontendAddr | None = None
    flight: FrontendAddr | None = None
    pg: FrontendAddr | None = None
    read_access: str = "any"
    write_access: str = "off"  # reference HttpFrontend default
    cache_control: str = "max-age=43200, public"
    upload_data_max_length_mb: int = 256
    object_cache: dict = field(default_factory=dict)


# reference keys we accept but have no equivalent for (documented no-ops)
IGNORED = {
    ("runtime",),
    ("misc", "max_partition_size"),
    ("misc", "gc_interval"),
    ("misc", "ssl_cert_file"),
    ("misc", "metrics"),  # /metrics is always served on the HTTP frontend
    ("misc", "sync_conf"),
    ("catalog", "journal_mode"),
    ("catalog", "read_only"),
}


def _check_keys(section: str, given: dict, known: set[str]) -> None:
    unknown = [
        k for k in given
        if k not in known and (section, k) not in IGNORED and (k,) not in IGNORED
    ]
    if unknown:
        raise ConfigError(f"unknown key(s) in [{section}]: {', '.join(unknown)}")


def _addr(section: str, d: dict, default_port: int) -> FrontendAddr:
    _check_keys(
        section, d,
        {"bind_host", "bind_port", "read_access", "write_access",
         "cache_control", "upload_data_max_length"},
    )
    return FrontendAddr(
        bind_host=str(d.get("bind_host", "127.0.0.1")),
        bind_port=int(d.get("bind_port", default_port)),
    )


def load_config_str(text: str) -> ServerConfig:
    try:
        raw = tomllib.loads(text)
    except tomllib.TOMLDecodeError as e:
        raise ConfigError(f"invalid TOML: {e}") from None
    _check_keys("", raw, {"object_store", "catalog", "frontend", "misc", "runtime"})
    cfg = ServerConfig()

    store = raw.get("object_store")
    if store is not None:
        _check_keys("object_store", store, {"type", "data_dir"})
        kind = store.get("type", "local")
        if kind == "local":
            if "data_dir" not in store:
                raise ConfigError("[object_store] type local requires data_dir")
            cfg.data_dir = str(store["data_dir"])
        elif kind == "memory":
            cfg.data_dir = tempfile.mkdtemp(prefix="seafowl_spark_mem_")
        else:
            raise ConfigError(
                f"[object_store] type {kind!r} is not supported in this build "
                "(local and memory only — no cloud SDKs)"
            )

    cat = raw.get("catalog")
    if cat is not None:
        _check_keys("catalog", cat, {"type", "dsn"})
        kind = cat.get("type", "sqlite")
        if kind != "sqlite":
            raise ConfigError(
                f"[catalog] type {kind!r} is not supported in this build; use "
                "sqlite (the clade-style inline metastore is available over "
                "the Flight frontend)"
            )
        dsn = str(cat.get("dsn", ":memory:"))
        cfg.catalog_dsn = dsn

    fe = raw.get("frontend", {})
    _check_keys("frontend", fe, {"http", "flight", "postgres"})
    if "http" in fe:
        h = fe["http"]
        cfg.http = _addr("frontend.http", h, 8080)
        cfg.read_access = str(h.get("read_access", "any"))
        cfg.write_access = str(h.get("write_access", "off"))
        cfg.cache_control = str(h.get("cache_control", cfg.cache_control))
        cfg.upload_data_max_length_mb = int(
            h.get("upload_data_max_length", cfg.upload_data_max_length_mb)
        )
    if "flight" in fe:
        cfg.flight = _addr("frontend.flight", fe["flight"], 47470)
    if "postgres" in fe:
        cfg.pg = _addr("frontend.postgres", fe["postgres"], 6432)

    misc = raw.get("misc", {})
    _check_keys("misc", misc, {"object_store_cache"})
    oc = misc.get("object_store_cache")
    if oc is not None:
        _check_keys(
            "misc.object_store_cache", oc,
            {"capacity", "min_fetch_size", "ttl"},
        )
        cfg.object_cache = dict(oc)

    if not cfg.data_dir:
        cfg.data_dir = os.path.expanduser("~/.seafowl_spark")
    return cfg


def load_config(path: str) -> ServerConfig:
    with open(path) as f:
        return load_config_str(f.read())
