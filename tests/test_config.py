"""seafowl.toml config parity (reference src/config/schema.rs).

The first test parses the reference's own default-config template
(build_default_config, schema.rs:57-103) verbatim."""

import pytest

from seafowl_spark.engine.config import ConfigError, load_config, load_config_str

REFERENCE_DEFAULT = """\
# Default Seafowl config

# Store the data (Parquet files) on the local disk
[object_store]
type = "local"
data_dir = "seafowl-data"

# Store the catalog on the local disk
[catalog]
type = "sqlite"
dsn = "seafowl-data/seafowl.sqlite"

# Configure the HTTP frontend
[frontend.http]
bind_host = "127.0.0.1"
bind_port = 8080

# By default, make Seafowl readable by anyone...
read_access = "any"

# ...and not writeable.
# To enable writes store the password's SHA hash here.
write_access = "off"
"""


class TestConfig:
    def test_reference_default_template(self):
        cfg = load_config_str(REFERENCE_DEFAULT)
        assert cfg.data_dir == "seafowl-data"
        assert cfg.catalog_dsn == "seafowl-data/seafowl.sqlite"
        assert cfg.http is not None
        assert (cfg.http.bind_host, cfg.http.bind_port) == ("127.0.0.1", 8080)
        assert cfg.read_access == "any"
        assert cfg.write_access == "off"
        # only the http frontend is configured -> only it is enabled
        assert cfg.flight is None and cfg.pg is None

    def test_all_frontends_and_cache(self):
        cfg = load_config_str(
            """
[object_store]
type = "memory"

[frontend.http]
bind_port = 8888
write_access = "7d793037a0760186574b0282f2f435e7"
cache_control = "max-age=60, public"

[frontend.flight]
bind_port = 48000

[frontend.postgres]
bind_port = 7432

[misc.object_store_cache]
capacity = 1048576
min_fetch_size = 65536
ttl = 30
"""
        )
        assert cfg.http.bind_port == 8888
        assert cfg.write_access == "7d793037a0760186574b0282f2f435e7"
        assert cfg.cache_control == "max-age=60, public"
        assert cfg.flight.bind_port == 48000
        assert cfg.pg.bind_port == 7432
        assert cfg.object_cache == {
            "capacity": 1048576, "min_fetch_size": 65536, "ttl": 30,
        }
        assert cfg.data_dir  # memory store got a scratch dir

    def test_ignored_reference_keys_accepted(self):
        cfg = load_config_str(
            """
[catalog]
type = "sqlite"
dsn = ":memory:"
journal_mode = "wal"

[misc]
gc_interval = 60

[runtime]
worker_threads = 4
"""
        )
        assert cfg.catalog_dsn == ":memory:"

    def test_unknown_key_rejected(self):
        with pytest.raises(ConfigError, match="bind_prot"):
            load_config_str("[frontend.http]\nbind_prot = 8080\n")

    def test_cloud_store_rejected(self):
        with pytest.raises(ConfigError, match="not supported"):
            load_config_str('[object_store]\ntype = "s3"\n')

    def test_postgres_catalog_rejected(self):
        with pytest.raises(ConfigError, match="not supported"):
            load_config_str('[catalog]\ntype = "postgres"\ndsn = "pg://x"\n')

    def test_invalid_toml_rejected(self):
        with pytest.raises(ConfigError, match="invalid TOML"):
            load_config_str("[frontend.http\n")

    def test_load_from_file(self, tmp_path):
        p = tmp_path / "seafowl.toml"
        p.write_text(REFERENCE_DEFAULT)
        assert load_config(str(p)).http.bind_port == 8080
