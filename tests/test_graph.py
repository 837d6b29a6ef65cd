"""Connected-components / dedup-cluster semantics."""

from __future__ import annotations

from big_data_flight_analytics_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def labels_of(df):
    return {r["id"]: r["cluster_id"] for r in df.collect()}


class TestConnectedComponents:
    def test_chain_propagates_beyond_one_hop(self, spark):
        # 1-2-3-4-5 chain: min label must travel 4 hops
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
        )
        assert labels_of(connected_components(edges)) == {
            1: 1, 2: 1, 3: 1, 4: 1, 5: 1
        }

    def test_two_components_and_isolated_vertex(self, spark):
        edges = spark.createDataFrame(
            [(10, 11), (20, 21), (21, 22)], "src long, dst long"
        )
        verts = spark.createDataFrame([(10,), (11,), (20,), (21,), (22,), (99,)], "id long")
        got = labels_of(connected_components(edges, vertices=verts))
        assert got == {10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 99: 99}

    def test_direction_is_ignored(self, spark):
        edges = spark.createDataFrame([(5, 1), (5, 3)], "src long, dst long")
        got = labels_of(connected_components(edges))
        assert got == {1: 1, 3: 1, 5: 1}


class TestDedupClusters:
    def test_canonical_flag(self, spark):
        pairs = spark.createDataFrame([(1, 7), (7, 9)], "doc_a long, doc_b long")
        docs = spark.createDataFrame([(1,), (7,), (9,), (4,)], "doc_id long")
        rows = {r["doc_id"]: r for r in dedup_clusters(pairs, docs).collect()}
        assert rows[1]["cluster_id"] == 1 and rows[1]["is_canonical"]
        assert rows[7]["cluster_id"] == 1 and not rows[7]["is_canonical"]
        assert rows[9]["cluster_id"] == 1 and not rows[9]["is_canonical"]
        assert rows[4]["cluster_id"] == 4 and rows[4]["is_canonical"]


class TestEdgeCases:
    def test_empty_edges_all_singletons(self, spark):
        edges = spark.createDataFrame([], "src long, dst long")
        verts = spark.createDataFrame([(1,), (2,)], "id long")
        assert labels_of(connected_components(edges, vertices=verts)) == {1: 1, 2: 2}

    def test_self_loop_harmless(self, spark):
        edges = spark.createDataFrame([(3, 3), (3, 5)], "src long, dst long")
        assert labels_of(connected_components(edges)) == {3: 3, 5: 3}


class TestCanonicalByScore:
    def _clusters(self, spark):
        from pyspark.sql import Row

        return spark.createDataFrame(
            [
                Row(doc_id=1, cluster_id=1, is_canonical=True),
                Row(doc_id=5, cluster_id=1, is_canonical=False),
                Row(doc_id=7, cluster_id=1, is_canonical=False),
                Row(doc_id=9, cluster_id=9, is_canonical=True),
            ]
        )

    def test_highest_score_wins(self, spark):
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.graph import (
            canonical_by_score,
        )

        scored = spark.createDataFrame(
            [
                Row(doc_id=1, n_tokens=10),
                Row(doc_id=5, n_tokens=50),
                Row(doc_id=7, n_tokens=20),
                Row(doc_id=9, n_tokens=5),
            ]
        )
        out = canonical_by_score(self._clusters(spark), scored, "n_tokens")
        got = {r["cluster_id"]: (r["kept_doc_id"], r["cluster_size"]) for r in out.collect()}
        # NOT min-id: doc 5 beats canonical doc 1 on length
        assert got == {1: (5, 3), 9: (9, 1)}

    def test_tie_breaks_on_min_id(self, spark):
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.graph import (
            canonical_by_score,
        )

        scored = spark.createDataFrame(
            [Row(doc_id=d, n_tokens=10) for d in (1, 5, 7, 9)]
        )
        out = canonical_by_score(self._clusters(spark), scored, "n_tokens")
        got = {r["cluster_id"]: r["kept_doc_id"] for r in out.collect()}
        assert got == {1: 1, 9: 9}


class TestPageRank:
    @staticmethod
    def _reference(edges, num_iter=10, damping=0.85):
        nodes = sorted({n for e in edges for n in e})
        n = len(nodes)
        out = {}
        for s, d in set(edges):
            out.setdefault(s, []).append(d)
        rank = {v: 1.0 / n for v in nodes}
        for _ in range(num_iter):
            dang = sum(r for v, r in rank.items() if v not in out)
            nxt = {v: 0.0 for v in nodes}
            for s, ds in out.items():
                c = rank[s] / len(ds)
                for d in ds:
                    nxt[d] += c
            rank = {
                v: (1 - damping) / n + damping * (nxt[v] + dang / n)
                for v in nodes
            }
        return rank

    def test_matches_reference_on_random_graph(self, spark):
        import random

        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.graph import pagerank

        rng = random.Random(99)
        edges = list(
            {
                (rng.randrange(30), rng.randrange(30))
                for _ in range(120)
            }
        )
        edges = [(s, d) for s, d in edges if s != d]
        df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
        got = {r["node"]: r["rank"] for r in pagerank(df, num_iter=10).collect()}
        want = self._reference(edges, num_iter=10)
        assert set(got) == set(want)
        for v in want:
            assert abs(got[v] - want[v]) < 1e-9
        assert abs(sum(got.values()) - 1.0) < 1e-9

    def test_dangling_mass_conserved(self, spark):
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.graph import pagerank

        # 1 -> 2, 2 has no out-edges (dangling)
        df = spark.createDataFrame([Row(src=1, dst=2)])
        got = {r["node"]: r["rank"] for r in pagerank(df, num_iter=20).collect()}
        assert abs(sum(got.values()) - 1.0) < 1e-12
        assert got[2] > got[1]  # sink accumulates

    def test_on_knn_graph_artifact(self, spark):
        """The intended composition: centrality over the v4 kNN graph
        (which vectors are hubs of their semantic neighborhood)."""
        from pyspark.sql import functions as F

        from big_data_flight_analytics_spark.operators.graph import pagerank
        from big_data_flight_analytics_spark.operators.similarity import (
            knn_graph,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        g = knn_graph(emb, k=3, target_bucket_size=64)
        ranks = pagerank(
            g.select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")),
            num_iter=5,
        )
        rows = ranks.collect()
        assert len(rows) > 10
        assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-9


class TestPageRankFixedPoint:
    """Exact int64 fixed-point PageRank (the g1 oracle-gated path)."""

    @staticmethod
    def _reference(edges, num_iter=5, num=17, den=20, scale=10**12):
        # mirrors operators.graph.pagerank_fixedpoint op-for-op in
        # plain python ints — exact, so the assertion is ==, not ~=
        nodes = sorted({n for e in edges for n in e})
        n = len(nodes)
        out = {}
        for s, d in set(edges):
            out.setdefault(s, set()).add(d)
        base = (den - num) * scale // (den * n)
        rank = {v: scale // n for v in nodes}
        for _ in range(num_iter):
            dang = sum(r for v, r in rank.items() if v not in out)
            nxt = {v: 0 for v in nodes}
            for s, ds in out.items():
                c = rank[s] // len(ds)
                for d in ds:
                    nxt[d] += c
            rank = {
                v: base + num * (nxt[v] + dang // n) // den for v in nodes
            }
        return rank

    def test_bit_exact_vs_reference(self, spark):
        import random

        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.graph import (
            pagerank_fixedpoint,
        )

        rng = random.Random(7)
        edges = [
            (s, d)
            for s, d in {
                (rng.randrange(40), rng.randrange(40)) for _ in range(160)
            }
            if s != d
        ]
        df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
        got = {
            r["node"]: r["rank_fp"]
            for r in pagerank_fixedpoint(df, num_iter=5).collect()
        }
        assert got == self._reference(edges, num_iter=5)

    def test_partition_count_invariance(self, spark):
        # associative integer sums: 1-partition and 13-partition runs
        # must agree to the bit (the property that earns the hash gate)
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.graph import (
            pagerank_fixedpoint,
        )

        import random

        rng = random.Random(11)
        rows = [
            Row(src=rng.randrange(25), dst=rng.randrange(25))
            for _ in range(100)
        ]
        a = {
            r["node"]: r["rank_fp"]
            for r in pagerank_fixedpoint(
                spark.createDataFrame(rows).repartition(1), num_iter=4
            ).collect()
        }
        b = {
            r["node"]: r["rank_fp"]
            for r in pagerank_fixedpoint(
                spark.createDataFrame(rows).repartition(13), num_iter=4
            ).collect()
        }
        assert a == b

    def test_tracks_float_pagerank(self, spark):
        # the fixed-point ranks are the float ranks to ~1e-9 relative
        # (floor loses <= 1 unit per op at scale 1e12)
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.graph import (
            pagerank,
            pagerank_fixedpoint,
        )

        edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]
        df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
        fl = {r["node"]: r["rank"] for r in pagerank(df, num_iter=5).collect()}
        fp = {
            r["node"]: r["rank_fp"] / 1e12
            for r in pagerank_fixedpoint(df, num_iter=5).collect()
        }
        assert set(fl) == set(fp)
        for v in fl:
            assert abs(fl[v] - fp[v]) < 1e-6

    def test_empty_graph(self, spark):
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.graph import (
            pagerank_fixedpoint,
        )

        df = spark.createDataFrame([Row(src=1, dst=2)]).filter("src > 99")
        assert pagerank_fixedpoint(df).collect() == []


class TestTriangleClustering:
    """triangle_clustering vs itertools brute force + invariances."""

    @staticmethod
    def _brute(edge_list):
        import itertools

        und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
        nodes = {n for e in und for n in e}
        tri = {n: 0 for n in nodes}
        for c in itertools.combinations(sorted(nodes), 3):
            if all(
                tuple(sorted(p)) in und
                for p in itertools.combinations(c, 2)
            ):
                for n in c:
                    tri[n] += 1
        deg = {n: sum(1 for e in und if n in e) for n in nodes}
        return sorted(
            (
                n,
                deg[n],
                tri[n],
                0.0 if deg[n] < 2 else 2 * tri[n] / (deg[n] * (deg[n] - 1)),
            )
            for n in nodes
        )

    def test_k4_pendant_and_parallel_edges(self, spark):
        from big_data_flight_analytics_spark.operators.graph import (
            triangle_clustering,
        )
        from pyspark.sql import Row

        # K4 plus a pendant, with reversed duplicates and a self-loop
        # that must all be ignored by symmetrize/distinct
        edges = [(a, b) for a in range(4) for b in range(4) if a != b]
        edges += [(4, 0), (0, 4), (2, 2)]
        df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
        got = sorted(tuple(r) for r in triangle_clustering(df).collect())
        assert got == self._brute(edges)
        # K4 members close 3 triangles each; the pendant closes none
        assert got[4] == (4, 1, 0, 0.0)

    def test_random_graph_matches_brute_force(self, spark):
        import random

        from big_data_flight_analytics_spark.operators.graph import (
            triangle_clustering,
        )
        from pyspark.sql import Row

        rng = random.Random(7)
        edges = list(
            {
                (rng.randrange(30), rng.randrange(30))
                for _ in range(150)
            }
        )
        df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
        got = sorted(tuple(r) for r in triangle_clustering(df).collect())
        assert got == self._brute(edges)
        assert any(r[2] > 0 for r in got)  # the graph really has triangles

    def test_partition_invariance(self, spark):
        import random

        from big_data_flight_analytics_spark.operators.graph import (
            triangle_clustering,
        )
        from pyspark.sql import Row

        rng = random.Random(13)
        edges = [
            Row(src=rng.randrange(40), dst=rng.randrange(40))
            for _ in range(200)
        ]
        df = spark.createDataFrame(edges)
        a = sorted(tuple(r) for r in triangle_clustering(df).collect())
        b = sorted(
            tuple(r)
            for r in triangle_clustering(df.repartition(13)).collect()
        )
        assert a == b

    def test_triangle_free_graph_all_zero(self, spark):
        from big_data_flight_analytics_spark.operators.graph import (
            triangle_clustering,
        )
        from pyspark.sql import Row

        # a path: 0-1-2-3 — wedges exist, no triangle closes
        df = spark.createDataFrame(
            [Row(src=i, dst=i + 1) for i in range(3)]
        )
        got = sorted(tuple(r) for r in triangle_clustering(df).collect())
        assert [r[2] for r in got] == [0, 0, 0, 0]
        assert [r[3] for r in got] == [0.0, 0.0, 0.0, 0.0]


class TestPageRankDefinitionalTruth:
    """The fixed-point reference above mirrors the implementation
    op-for-op, which (like the r12 perceptron bug) would also mirror a
    definitional mistake. This test derives truth from the TEXTBOOK
    definition instead: float power iteration with damping d=0.85,
    uniform teleport, dangling mass redistributed uniformly —
    independent of the engine's integer formulation. The fixed-point
    ranks (descaled) must approximate it to the floor-loss bound."""

    def test_fixedpoint_tracks_textbook_power_iteration(self, spark):
        import random

        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.graph import (
            pagerank_fixedpoint,
        )

        rng = random.Random(11)
        edges = [
            (s, d)
            for s, d in {
                (rng.randrange(30), rng.randrange(30)) for _ in range(120)
            }
            if s != d
        ]
        nodes = sorted({n for e in edges for n in e})
        n = len(nodes)
        out = {}
        for s, d in set(edges):
            out.setdefault(s, set()).add(d)
        d_f = 0.85
        rank = {v: 1.0 / n for v in nodes}
        for _ in range(8):
            dang = sum(r for v, r in rank.items() if v not in out)
            nxt = {v: 0.0 for v in nodes}
            for s, ds in out.items():
                for t in ds:
                    nxt[t] += rank[s] / len(ds)
            rank = {
                v: (1 - d_f) / n + d_f * (nxt[v] + dang / n) for v in nodes
            }
        scale = 10**12
        got = {
            r["node"]: r["rank_fp"] / scale
            for r in pagerank_fixedpoint(
                spark.createDataFrame(
                    [Row(src=s, dst=d) for s, d in edges]
                ),
                num_iter=8,
                scale=scale,
            ).collect()
        }
        assert set(got) == set(nodes)
        # every DIV floors away < 1 rank unit; 8 iterations over <= n
        # inbound sums keep the accumulated floor loss far under 1e-6
        # at scale 1e12 for a 30-node graph
        for v in nodes:
            assert abs(got[v] - rank[v]) < 1e-6, (v, got[v], rank[v])
        # and the induced ranking agrees (the property g1 consumes)
        assert sorted(nodes, key=lambda v: (-got[v], v)) == sorted(
            nodes, key=lambda v: (-rank[v], v)
        )
