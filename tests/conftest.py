"""Shared fixtures — the reference's shared-bases pattern
(tests/python/conftest.py:40-66): one SparkSession, one deterministic
social-graph fixture (FIXTURES.md §1 mini), reused by every suite.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from grafeo_spark.session import get_spark

    # AQE stays ON here, deliberately (r16 negative result): disabling it
    # for the test session made the pure-fixture relational suites ~34%
    # faster (165s -> 109s on tck5+queries) but REGRESSED the
    # gremlin/llm/algorithms files ~2x (569s vs ~250s for their fast
    # tests) - their union-heavy plans lean on AQE's runtime broadcast /
    # empty-relation propagation. Net suite-wide loss; do not re-try
    # without per-file evidence.
    s = get_spark("grafeo-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


# Deterministic mini social graph (seeded-fixture analogue, FIXTURES.md §1):
# a triangle (1,2,3), a chain 3->4->5->6, a spur 8->1, isolated 7.
PEOPLE = [
    (1, "Alice", 30, "NYC"),
    (2, "Bob", 40, "LA"),
    (3, "Carol", 35, "NYC"),
    (4, "Dave", 28, "Chicago"),
    (5, "Eve", 50, "LA"),
    (6, "Frank", 45, "NYC"),
    (7, "Grace", 22, "Phoenix"),
    (8, "Heidi", 33, "Houston"),
]
KNOWS = [
    (101, 1, 2, 2015),
    (102, 2, 3, 2016),
    (103, 1, 3, 2017),
    (104, 3, 4, 2018),
    (105, 4, 5, 2019),
    (106, 5, 6, 2020),
    (107, 8, 1, 2021),
]


@pytest.fixture(scope="session")
def social(spark):
    from grafeo_spark.graph import PropertyGraph

    nodes = spark.createDataFrame(PEOPLE, "id long, name string, age long, city string")
    edges = spark.createDataFrame(KNOWS, "id long, src long, dst long, since long")
    return PropertyGraph({"Person": nodes}, {"KNOWS": edges})


@pytest.fixture(scope="session")
def db(spark, social):
    from grafeo_spark.engine import GrafeoSpark

    return GrafeoSpark(spark, social)


def rows(df, *cols):
    """Collect to a sorted list of tuples for order-insensitive asserts."""
    if cols:
        df = df.select(*cols)
    return sorted(tuple(r) for r in df.collect())
