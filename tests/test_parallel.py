"""Parallel components: sharded embedding lookup, mesh helpers, prefetch,
graph store query builders."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_recommendation_tpu.data.graph_store import (
    bulk_import_command,
    decode_subgraph_rows,
    export_bulk_import_csvs,
    query_n_neighbors,
    query_node,
    split_relationship_filter,
)
from laplace_gnn_recommendation_tpu.data.prefetch import prefetch
from laplace_gnn_recommendation_tpu.ops.embedding import (
    shard_table,
    sharded_embedding_lookup,
)
from laplace_gnn_recommendation_tpu.parallel.mesh import build_mesh, round_up, shard_rows_pad


class TestShardedEmbedding:
    def test_matches_plain_gather(self, mesh8):
        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, 64, 33).astype(np.int32))
        sharded = shard_table(mesh8, table)
        got = sharded_embedding_lookup(mesh8, sharded, ids)
        np.testing.assert_allclose(np.asarray(got), np.asarray(table[ids]), rtol=1e-6)

    def test_gradient_flows_to_owning_shard(self, mesh8):
        table = jnp.ones((64, 8))
        ids = jnp.asarray([3, 50], dtype=jnp.int32)

        def loss(t):
            return jnp.sum(sharded_embedding_lookup(mesh8, t, ids) ** 2)

        g = np.asarray(jax.grad(loss)(shard_table(mesh8, table)))
        rows_touched = np.flatnonzero(np.abs(g).sum(axis=1))
        np.testing.assert_array_equal(rows_touched, [3, 50])

    def test_single_device_mesh(self):
        mesh = build_mesh(1, 1, devices=[jax.devices()[0]])
        table = jnp.arange(32.0).reshape(8, 4)
        ids = jnp.asarray([1, 7], dtype=jnp.int32)
        got = sharded_embedding_lookup(mesh, table, ids)
        np.testing.assert_allclose(np.asarray(got), np.asarray(table[ids]))


class TestMeshHelpers:
    def test_round_up(self):
        assert round_up(5, 4) == 8 and round_up(8, 4) == 8

    def test_shard_rows_pad(self, mesh8):
        assert shard_rows_pad(9, mesh8) % mesh8.shape["model"] == 0


class TestPrefetch:
    def test_order_preserved(self):
        assert list(prefetch(range(10), buffer_size=3)) == list(range(10))

    def test_exception_propagates(self):
        def gen():
            yield 1
            raise ValueError("boom")

        it = prefetch(gen())
        assert next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            next(it)


class TestGraphStore:
    def test_query_builders(self):
        assert query_node(5, "customer") == "MATCH(n:customer {_id:'5'}) RETURN n"
        assert split_relationship_filter("train") == "buys_TRAIN|has_color"
        assert (
            split_relationship_filter("test")
            == "buys_TRAIN|buys_VAL|buys_TEST|has_color"
        )
        q = query_n_neighbors(3, 2, "customer", "val", no_return=True)
        assert "apoc.path.subgraphAll" in q
        assert "buys_TRAIN|buys_VAL|has_color" in q
        assert "maxLevel: 2" in q

    def test_decode_subgraph_rows(self):
        rows = [
            ["customer", "buys_TRAIN", "article", "0", "4"],
            ["customer", "buys_VAL", "article", "1", "5"],
            ["article", "has_color", "colour_group_code", "4", "2"],
        ]
        out = decode_subgraph_rows(rows)
        from laplace_gnn_recommendation_tpu.types import EdgeType

        buys = out[EdgeType("customer", "buys", "article")]
        np.testing.assert_array_equal(buys, [[0, 1], [4, 5]])
        assert EdgeType("article", "has_color", "colour_group_code") in out

    def test_bulk_export(self, tmp_path):
        paths = export_bulk_import_csvs(
            str(tmp_path),
            customer_features=np.array([[1, 2], [3, 4]]),
            customer_feature_names=["age", "zip"],
            article_features=np.array([[7], [8], [9]]),
            article_feature_names=["year"],
            edge_user=np.array([0, 1, 1]),
            edge_item=np.array([0, 1, 2]),
            train_mask=np.array([True, False, False]),
            val_mask=np.array([False, True, False]),
            test_mask=np.array([False, False, True]),
        )
        assert len(paths) == 3
        tx = open(tmp_path / "transactions.csv").read().strip().split("\n")
        assert tx[0] == ":START_ID(customer),:END_ID(article),:TYPE"
        assert tx[1].endswith("buys_TRAIN")
        assert tx[2].endswith("buys_VAL")
        assert tx[3].endswith("buys_TEST")
        cust = open(tmp_path / "customers.csv").read().strip().split("\n")
        assert cust[0] == ":ID(customer),age,zip,:LABEL,_id"
        assert "neo4j-admin import" in bulk_import_command(str(tmp_path))


class TestDistributedInit:
    def test_noop_without_coordinator(self, monkeypatch):
        from laplace_gnn_recommendation_tpu.parallel.mesh import distributed_init

        for var in (
            "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
        ):
            monkeypatch.delenv(var, raising=False)
        assert distributed_init() is False

    def test_strict_raises_on_init_failure(self, monkeypatch):
        """A pod launch that cannot initialize must not silently fall back
        when strict=True (and must return False non-strict). The failing
        initialize is stubbed — a real bad coordinator can retry with long
        timeouts, which a unit test must not depend on."""
        import jax
        import pytest

        from laplace_gnn_recommendation_tpu.parallel.mesh import distributed_init

        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "203.0.113.1:1234")

        def boom(*a, **kw):
            raise RuntimeError("coordinator unreachable")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        with pytest.raises(RuntimeError):
            distributed_init(strict=True)
        assert distributed_init(strict=False) is False
