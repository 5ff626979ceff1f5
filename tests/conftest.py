import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seafowl_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session("seafowl_spark_tests", shuffle_partitions=4, extra_conf={
        "spark.sql.files.openCostInBytes": "65536",
    })
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def ctx(spark, tmp_path):
    from seafowl_spark.engine.context import SeafowlContext

    return SeafowlContext(spark, str(tmp_path / "data"))


def rows(df):
    """Sorted list-of-tuples normalization for golden assertions
    (None-safe, type-ranked sort key so mixed/NULL columns compare)."""
    import datetime
    from decimal import Decimal

    def key_elem(v):
        if v is None:
            return (1, 0, "")
        if isinstance(v, bool):
            return (0, 1, str(v))
        if isinstance(v, (int, float, Decimal)):
            return (0, 0, float(v))
        if isinstance(v, (datetime.datetime, datetime.date)):
            return (0, 2, v.isoformat())
        return (0, 3, str(v))

    return sorted((tuple(r) for r in df.collect()), key=lambda t: tuple(key_elem(v) for v in t))
