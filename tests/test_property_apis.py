"""Direct property / label / CRUD point-mutation API parity.

Mirrors the reference surface and its test semantics at
tests/python/lpg/gql/test_property_apis.py:52-209 (backed by
crates/grafeo-engine/src/database.rs:618-931): set/remove node and edge
properties, add/remove/get node labels, single create/delete, paginated
label retrieval and batched property lookup — including the silent
no-op and nonexistent-entity return-value contracts.
"""

from __future__ import annotations

import pytest


@pytest.fixture
def pdb(spark):
    """Fresh engine per test: alice, bob (Person), charlie
    (Person+Employee), one KNOWS edge — the reference's populated_db."""
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import PropertyGraph

    person = spark.createDataFrame(
        [(1, "Alice", 30), (2, "Bob", 25), (3, "Charlie", 35)],
        "id long, name string, age long",
    )
    employee = spark.createDataFrame([(3, "Charlie", 35)], "id long, name string, age long")
    knows = spark.createDataFrame([(901, 1, 2, 2020)], "id long, src long, dst long, since long")
    return GrafeoSpark(spark, PropertyGraph({"Person": person, "Employee": employee}, {"KNOWS": knows}))


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


# -- node properties ---------------------------------------------------


def test_set_new_property(pdb):
    pdb.set_node_property(1, "city", "NYC")
    r = _one(pdb.cypher("MATCH (n:Person) WHERE id(n) = 1 RETURN n.city AS c"))
    assert r.c == "NYC"


def test_overwrite_existing_property(pdb):
    pdb.set_node_property(1, "name", "Alicia")
    r = _one(pdb.cypher("MATCH (n:Person) WHERE id(n) = 1 RETURN n.name AS name"))
    assert r.name == "Alicia"


def test_overwrite_with_incompatible_type_retypes(pdb):
    """The reference store is schemaless per node — set_node_property with
    a string over a numeric property just works (database.rs:618-660). The
    typed column can't host both, so the whole column retypes through
    string; other rows keep their (stringified) values instead of raising
    (r10 advice: the when/otherwise coercion used to fail at runtime)."""
    pdb.set_node_property(1, "age", "thirty")
    got = {
        r.id: r.a
        for r in pdb.cypher("MATCH (n:Person) RETURN id(n) AS id, n.age AS a").collect()
    }
    assert got == {1: "thirty", 2: "25", 3: "35"}
    # numeric widening does NOT retype: long column accepts a double
    pdb.set_node_property(2, "since_score", 1)


def test_set_property_various_types(pdb):
    pdb.set_node_property(1, "active", True)
    pdb.set_node_property(1, "score", 3.14)
    pdb.set_node_property(1, "count", 42)
    pdb.set_node_property(1, "bio", "Hello world")
    node = pdb.get_node(1)
    assert node is not None
    assert node.active is True and abs(node.score - 3.14) < 1e-9
    assert node["count"] == 42 and node.bio == "Hello world"


def test_set_property_list_value(pdb):
    pdb.set_node_property(1, "tags", ["a", "b", "c"])
    assert list(pdb.get_node(1).tags) == ["a", "b", "c"]


def test_set_property_map_value(pdb):
    pdb.set_node_property(1, "meta", {"x": 1, "y": "two"})
    m = pdb.get_node(1).meta
    assert m.x == 1 and m.y == "two"


def test_set_property_multi_label_node_updates_all_frames(pdb):
    pdb.set_node_property(3, "dept", "Eng")
    assert pdb.get_node(3, "Person").dept == "Eng"
    assert pdb.get_node(3, "Employee").dept == "Eng"


def test_set_property_nonexistent_node_silent(pdb):
    pdb.set_node_property(999999, "key", "value")  # must not raise
    assert pdb.get_node(999999) is None


def test_remove_existing_property(pdb):
    assert pdb.remove_node_property(1, "age") is True
    r = _one(pdb.cypher("MATCH (n:Person) WHERE id(n) = 1 RETURN n.age AS a"))
    assert r.a is None


def test_remove_nonexistent_property(pdb):
    assert pdb.remove_node_property(1, "nonexistent") is False


def test_remove_property_nonexistent_node(pdb):
    assert pdb.remove_node_property(999999, "age") is False


# -- edge properties ---------------------------------------------------


def test_set_new_edge_property(pdb):
    pdb.set_edge_property(901, "weight", 0.75)
    assert abs(pdb.get_edge(901).weight - 0.75) < 1e-9


def test_overwrite_edge_property(pdb):
    pdb.set_edge_property(901, "since", 2021)
    assert pdb.get_edge(901).since == 2021


def test_set_edge_property_nonexistent_silent(pdb):
    pdb.set_edge_property(999999, "key", "value")  # must not raise


def test_remove_existing_edge_property(pdb):
    assert pdb.remove_edge_property(901, "since") is True
    assert pdb.get_edge(901).since is None


def test_remove_nonexistent_edge_property(pdb):
    assert pdb.remove_edge_property(901, "nonexistent") is False
    assert pdb.remove_edge_property(999999, "since") is False


# -- labels ------------------------------------------------------------


def test_add_label(pdb):
    assert pdb.add_node_label(1, "Manager") is True
    labels = pdb.get_node_labels(1)
    assert "Manager" in labels and "Person" in labels


def test_add_duplicate_label(pdb):
    assert pdb.add_node_label(1, "Person") is False


def test_add_label_nonexistent_node(pdb):
    assert pdb.add_node_label(999999, "Manager") is False


def test_added_label_visible_to_queries(pdb):
    pdb.add_node_label(2, "Manager")
    r = _one(pdb.cypher("MATCH (n:Manager) RETURN n.name AS name"))
    assert r.name == "Bob"


def test_remove_label(pdb):
    assert pdb.remove_node_label(3, "Employee") is True
    labels = pdb.get_node_labels(3)
    assert "Employee" not in labels and "Person" in labels


def test_remove_nonexistent_label(pdb):
    assert pdb.remove_node_label(1, "NonExistent") is False
    assert pdb.remove_node_label(1, "Employee") is False  # exists, not on alice


def test_get_labels(pdb):
    assert pdb.get_node_labels(3) == ["Employee", "Person"]


def test_get_labels_nonexistent_node(pdb):
    assert pdb.get_node_labels(999999) is None


# -- single create/delete ----------------------------------------------


def test_create_node_and_query(pdb):
    n = pdb.create_node(["Person"], {"name": "Dana", "age": 29})
    r = _one(pdb.cypher(f"MATCH (p:Person) WHERE id(p) = {n.id} RETURN p.name AS name"))
    assert r.name == "Dana"


def test_create_node_multi_label(pdb):
    n = pdb.create_node(["Person", "Employee"], {"name": "Erin"})
    assert pdb.get_node_labels(n.id) == ["Employee", "Person"]


def test_create_edge_and_lookup(pdb):
    e = pdb.create_edge(2, 3, "KNOWS", {"since": 2024})
    got = pdb.get_edge(e.id)
    assert got.src == 2 and got.dst == 3 and got.since == 2024


def test_delete_edge(pdb):
    assert pdb.delete_edge(901) is True
    assert pdb.get_edge(901) is None
    assert pdb.delete_edge(999999) is False


def test_delete_node_detaches(pdb):
    assert pdb.delete_node(2) is True
    assert pdb.get_node(2) is None
    assert pdb.get_edge(901) is None  # 1-KNOWS->2 detached
    assert pdb.delete_node(999999) is False


# -- batch reads -------------------------------------------------------


def test_get_nodes_by_label_pagination(pdb):
    assert len(pdb.get_nodes_by_label("Person")) == 3
    assert len(pdb.get_nodes_by_label("Person", limit=2)) == 2
    assert len(pdb.get_nodes_by_label("Person", offset=1)) == 2
    page = pdb.get_nodes_by_label("Person", limit=1, offset=1)
    assert len(page) == 1 and page[0].id == 2
    assert pdb.get_nodes_by_label("NonExistent") == []


# -- programmatic vector index + batch node creation ---------------------
# (reference surface: tests/python/lpg/gql/test_vectors.py:222-380)


def test_create_vector_index_and_routing(pdb):
    ids = pdb.batch_create_nodes("Doc", "embedding", [[1.0, 0.0], [0.0, 1.0], [0.7, 0.7]])
    assert len(ids) == 3 and len(set(ids)) == 3
    pdb.create_vector_index("Doc", "embedding")
    assert pdb.vector_index_for("Doc", "embedding") is not None
    got = pdb.vector_search("Doc", [1.0, 0.1], k=2).collect()
    assert got[0].id == ids[0]  # nearest by cosine


def test_create_vector_index_with_metric_and_dimensions(pdb):
    pdb.batch_create_nodes("Doc", "embedding", [[1.0, 0.0, 0.0]])
    pdb.create_vector_index("Doc", "embedding", metric="euclidean", dimensions=3)
    assert pdb.vector_index_for("Doc", "embedding").metric == "euclidean"


def test_create_vector_index_accepts_hnsw_tuning_params(pdb):
    pdb.batch_create_nodes("Doc", "embedding", [[1.0, 0.0]])
    pdb.create_vector_index("Doc", "embedding", m=16, ef_construction=200)


def test_create_vector_index_no_vectors_fails(pdb):
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="No vector properties"):
        pdb.create_vector_index("Person", "name")  # string column
    with _pytest.raises(RuntimeError, match="No vector properties"):
        pdb.create_vector_index("Ghost", "embedding")  # unknown label


def test_create_vector_index_dimension_mismatch_fails(pdb):
    import pytest as _pytest

    pdb.batch_create_nodes("Doc", "embedding", [[1.0, 0.0, 0.0]])
    with _pytest.raises(RuntimeError, match="dimension mismatch"):
        pdb.create_vector_index("Doc", "embedding", dimensions=5)


def test_create_vector_index_invalid_metric_fails(pdb):
    import pytest as _pytest

    pdb.batch_create_nodes("Doc", "embedding", [[1.0, 0.0]])
    with _pytest.raises(RuntimeError, match="Unknown distance metric"):
        pdb.create_vector_index("Doc", "embedding", metric="invalid")


def test_batch_create_nodes_retrievable(pdb):
    ids = pdb.batch_create_nodes("Vec", "data", [[1.0, 0.0], [0.0, 1.0]])
    assert [list(pdb.get_node(i).data) for i in ids] == [[1.0, 0.0], [0.0, 1.0]]
    assert pdb.batch_create_nodes("Vec", "data", []) == []


def test_get_property_batch(pdb):
    vals = pdb.get_property_batch([1, 2, 3], "name")
    assert set(vals) == {"Alice", "Bob", "Charlie"}
    assert pdb.get_property_batch([1, 2], "nonexistent") == [None, None]
    assert pdb.get_property_batch([], "name") == []
    assert pdb.get_property_batch([1, 999999], "name") == ["Alice", None]
