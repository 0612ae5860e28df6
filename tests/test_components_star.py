"""The large-star/small-star components variant must agree exactly with
min-label propagation — same clusters, same representatives — and with a
hand-built graph whose structure is known.
"""

from pyspark.sql import functions as F

from gpe.dedup import q_dedup_components, q_dedup_components_star, star_components
from tests.conftest import SF_SMOKE


def test_star_equals_label_propagation(spark):
    a = q_dedup_components(spark, SF_SMOKE).orderBy("doc_id").collect()
    b = q_dedup_components_star(spark, SF_SMOKE).orderBy("doc_id").collect()
    assert a == b


def test_star_components_on_known_graph(spark):
    # components: {1,2,3,4} (path), {7,9} and singleton 5 is NOT emitted
    # (star_components only labels nodes that appear in edges)
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (9, 7)], "u long, v long"
    )
    got = {
        r["nid"]: r["comp"] for r in star_components(edges).collect()
    }
    assert got == {2: 1, 3: 1, 4: 1, 9: 7}


def test_star_components_deep_path(spark):
    # a 64-node path — diameter 63, well past label propagation's comfort
    # zone; star must converge in O(log^2 n) rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "u long, v long"
    )
    got = star_components(edges)
    assert got.filter(F.col("comp") != 0).count() == 0
    assert got.count() == 63  # every node except root 0
