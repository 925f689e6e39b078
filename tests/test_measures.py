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


def test_hausdorff_size_dispatch(spark):
    """Above the threshold hausdorff2 switches to the kNN path (no
    cartesian/broadcast-nested-loop in the plan) and the value is
    bit-identical; below it the broadcast sweep remains."""
    cu = dataset.geotagged_customers(spark, SF_DIR) \
        .select("c_custkey", "cell_id", "x", "y", "z")
    su = dataset.geotag(dataset.load(spark, SF_DIR, "supplier"),
                        "s_suppkey", "supplier") \
        .select("s_suppkey", "cell_id", "x", "y", "z")
    small = measures.hausdorff2(cu, su, "c_custkey",
                                b_id="s_suppkey")
    big = measures.hausdorff2(cu, su, "c_custkey", b_id="s_suppkey",
                              brute_threshold=1)  # force kNN path
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert small.collect()[0][0] == big.collect()[0][0]
