"""Measure operators: Hausdorff large-side kNN path."""

from s2spark import dataset
from s2spark.ops import measures
from tests.conftest import SF_DIR


def test_hausdorff_knn_equals_broadcast(spark):
    """The kNN-join inner min must produce the bit-identical
    Hausdorff value as the broadcast plan (k=1 minimum is the same
    double; min/max aggregation has no accumulation order)."""
    cu = dataset.geotagged_customers(spark, SF_DIR) \
        .select("c_custkey", "cell_id", "x", "y", "z")
    su = dataset.geotag(dataset.load(spark, SF_DIR, "supplier"),
                        "s_suppkey", "supplier") \
        .select("s_suppkey", "cell_id", "x", "y", "z")
    base = measures.hausdorff2(cu, su, "c_custkey").collect()[0][0]
    via_knn = measures.hausdorff2_knn(cu, su, "c_custkey",
                                      "s_suppkey").collect()[0][0]
    assert base == via_knn
