import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from s2spark.session import get_spark
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("s2spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def duck():
    import duckdb
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con
