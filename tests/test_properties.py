"""Property-based tests (hypothesis) — batch-evaluated: each property
generates a whole column of cases and runs ONE Spark job, so Spark
round-trip cost is paid once per property, not per example."""

from __future__ import annotations

import math
import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.functions.scalar import (
    haversine_km,
    hhmm_to_str,
    minmax_normalize_expr,
)
from big_data_flight_analytics_spark.operators.core import bucketize

_spark = None


def _get_spark():
    # reuse the session created by conftest's fixture chain
    from pyspark.sql import SparkSession

    return SparkSession.getActiveSession() or SparkSession.builder.master(
        "local[4]"
    ).getOrCreate()


class TestHaversineProperties:
    def test_symmetry_identity_bounds(self, spark):
        rng = random.Random(11)
        rows = [
            Row(lat1=rng.uniform(-90, 90), lon1=rng.uniform(-180, 180),
                lat2=rng.uniform(-90, 90), lon2=rng.uniform(-180, 180))
            for _ in range(300)
        ]
        df = spark.createDataFrame(rows)
        out = df.select(
            haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d_ab"),
            haversine_km(F.col("lat2"), F.col("lon2"), F.col("lat1"), F.col("lon1")).alias("d_ba"),
            haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat1"), F.col("lon1")).alias("d_self"),
        ).collect()
        half_circumference = math.pi * 6371.0
        for r in out:
            assert r["d_self"] == 0.0
            assert abs(r["d_ab"] - r["d_ba"]) < 1e-9  # symmetry
            assert 0.0 <= r["d_ab"] <= half_circumference + 1e-6  # bounded
            assert not math.isnan(r["d_ab"])  # clamp guard holds everywhere


class TestHHMMProperties:
    def test_roundtrip_all_valid_times(self, spark):
        # exhaustive, not sampled: all 1440 valid HHMM encodings
        rows = [Row(hhmm=h * 100 + m) for h in range(24) for m in range(60)]
        out = spark.createDataFrame(rows).select(
            "hhmm", hhmm_to_str(F.col("hhmm")).alias("s")
        ).collect()
        for r in out:
            hh, mm = r["s"].split(":")
            assert int(hh) * 100 + int(mm) == r["hhmm"]
            assert len(r["s"]) == 5


class TestMinMaxProperties:
    @settings(max_examples=20, deadline=None)
    @given(
        vals=st.lists(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            min_size=1, max_size=30,
        )
    )
    def test_output_in_unit_interval(self, vals):
        spark = _get_spark()
        mn, mx = min(vals), max(vals)
        df = spark.createDataFrame([Row(x=float(v)) for v in vals])
        out = df.select(
            minmax_normalize_expr(F.col("x"), F.lit(mn), F.lit(mx)).alias("s")
        ).collect()
        for r in out:
            # span guard keeps constant columns at 0; otherwise [0, 1]
            assert -1e-9 <= r["s"] <= 1.0 + 1e-9 or mx <= mn


class TestBucketizeProperties:
    def test_total_and_exclusive(self, spark):
        # every value lands in exactly one bucket; lower edge inclusive
        rng = random.Random(5)
        edges = [0.0, 100.0, 200.0, 500.0, float("inf")]
        labels = ["a", "b", "c", "d"]
        vals = [rng.uniform(0, 1000) for _ in range(500)] + [0.0, 100.0, 200.0, 500.0]
        df = spark.createDataFrame([Row(x=v) for v in vals])
        out = bucketize(df, "x", edges, labels, out="bk").collect()
        for r in out:
            assert r["bk"] is not None
            i = labels.index(r["bk"])
            assert r["x"] >= edges[i]
            if edges[i + 1] != float("inf"):
                assert r["x"] < edges[i + 1]


class TestAsofJoinProperties:
    def test_matches_bruteforce_on_random_data(self, spark):
        """Union-window as-of == per-row brute-force scan on random data."""
        from datetime import datetime, timedelta

        from big_data_flight_analytics_spark.operators.temporal import asof_join

        rng = random.Random(23)
        base = datetime(2024, 1, 1)
        left_rows = [
            (i, rng.randint(0, 5), base + timedelta(minutes=rng.randint(0, 500)))
            for i in range(120)
        ]
        right_rows = [
            (rng.randint(0, 5), base + timedelta(minutes=rng.randint(0, 500)),
             100 + j, float(j))
            for j in range(80)
        ]
        left = spark.createDataFrame(left_rows, "eid long, k long, t timestamp")
        right = spark.createDataFrame(
            right_rows, "k long, rt timestamp, rid long, v double"
        )
        got = {
            r["eid"]: (r["asof_rid"], r["asof_v"])
            for r in asof_join(
                left, right, on="k", left_time="t", right_time="rt",
                payload={"rid": "asof_rid", "v": "asof_v"}, right_tie="rid",
            ).collect()
        }
        # brute force: max (rt, rid) among right rows with same k, rt <= t
        for eid, k, t in left_rows:
            cands = [(rt, rid, v) for (rk, rt, rid, v) in right_rows
                     if rk == k and rt <= t]
            want = (None, None) if not cands else (
                max(cands)[1], max(cands)[2]
            )
            assert got[eid] == want, (eid, k, t)

    def test_sessionize_matches_bruteforce(self, spark):
        from datetime import datetime, timedelta

        from big_data_flight_analytics_spark.operators.temporal import sessionize

        rng = random.Random(31)
        base = datetime(2024, 1, 1)
        rows = [
            (rng.randint(0, 4), i, base + timedelta(seconds=rng.randint(0, 50000)))
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "user_id long, event_id long, t timestamp")
        got = {r["event_id"]: r["session_idx"]
               for r in sessionize(df, "user_id", "t", 1800, "event_id").collect()}
        by_user = {}
        for u, eid, t in rows:
            by_user.setdefault(u, []).append((t, eid))
        for u, evs in by_user.items():
            evs.sort()
            idx = 0
            prev = None
            for t, eid in evs:
                if prev is None or (t - prev).total_seconds() > 1800:
                    idx += 1
                prev = t
                assert got[eid] == idx, (u, eid)


class TestConnectedComponentsProperties:
    def test_matches_union_find_on_random_graphs(self, spark):
        """Random sparse graphs vs a pure-Python union-find reference.

        One Spark run over the union of several random graphs (vertex
        ids offset per graph so components never cross graphs) — the
        batch-evaluated pattern: many cases, one job."""
        from big_data_flight_analytics_spark.operators.graph import (
            connected_components,
        )

        rng = random.Random(23)
        edges, all_verts = [], []
        parent: dict[int, int] = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        for g in range(20):
            base = g * 1000
            n = rng.randint(2, 40)
            verts = [base + i for i in range(n)]
            all_verts.extend(verts)
            for v in verts:
                parent[v] = v
            # sparse: ~n/2 to ~1.5n edges, including chains long enough
            # to need multi-round propagation
            for _ in range(rng.randint(n // 2, n + n // 2)):
                a, b = rng.choice(verts), rng.choice(verts)
                edges.append(Row(src=a, dst=b))
                union(a, b)

        expected = {v: find(v) for v in all_verts}
        got = {
            r["id"]: r["cluster_id"]
            for r in connected_components(
                spark.createDataFrame(edges),
                vertices=spark.createDataFrame(
                    [Row(id=v) for v in all_verts]
                ),
            ).collect()
        }
        assert got == expected

    def test_long_chain_exceeding_max_iter_raises(self, spark):
        from big_data_flight_analytics_spark.operators.graph import (
            connected_components,
        )
        import pytest as _pytest

        chain = spark.createDataFrame(
            [Row(src=i, dst=i + 1) for i in range(12)]
        )
        with _pytest.raises(RuntimeError, match="did not converge"):
            connected_components(chain, max_iter=3)
        # allow_nonconverged downgrades to a warning and returns labels
        import warnings as _w

        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            out = connected_components(chain, max_iter=3, allow_nonconverged=True)
            assert out.count() == 13
        assert any("did not converge" in str(c.message) for c in caught)


class TestSessionizationDifferential:
    """The window-function sessionizer (operators/temporal.sessionize)
    and Spark's native session_window aggregate are independent
    implementations of the same gap rule (a delta of exactly the gap
    MERGES; see plans/analytic_queries s5 notes). On random event sets
    — including exact-boundary deltas — they must produce identical
    (n_sessions, per-session sizes, bounds) per key."""

    def test_random_events_agree(self, spark):
        from datetime import datetime, timedelta

        from big_data_flight_analytics_spark.operators.temporal import (
            session_stats,
        )

        rng = random.Random(23)
        gap_s = 600
        base = datetime(2024, 3, 1)
        rows = []
        eid = 0
        for user in range(30):
            t = base + timedelta(seconds=rng.randrange(0, 3600))
            for _ in range(rng.randrange(1, 40)):
                # deltas biased to straddle the boundary: often exactly
                # gap_s (merge), sometimes gap_s+1 (split), plus noise
                delta = rng.choice(
                    [0, 1, gap_s // 2, gap_s, gap_s, gap_s + 1,
                     rng.randrange(0, 3 * gap_s)]
                )
                t = t + timedelta(seconds=delta)
                rows.append(Row(user_id=user, event_id=eid, ts=t))
                eid += 1
        df = spark.createDataFrame(rows)

        via_window = {
            (r["user_id"], r["start_us"]): (r["n_events"], r["end_us"])
            for r in session_stats(
                df, "user_id", "ts", gap_seconds=gap_s, tie_col="event_id"
            ).collect()
        }
        native = {
            (r["user_id"], r["start_us"]): (r["n"], r["last_us"])
            for r in (
                df.groupBy(
                    "user_id",
                    F.session_window("ts", f"{gap_s} seconds").alias("w"),
                )
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.unix_micros(F.max("ts")).alias("last_us"),
                )
                .select(
                    "user_id",
                    F.unix_micros(F.col("w.start")).alias("start_us"),
                    "n",
                    "last_us",
                )
            ).collect()
        }
        assert via_window == native


class TestParagraphDedupProperties:
    """paragraph_dedup == a pure-Python first-occurrence simulation on
    random corpora with planted shared paragraphs. Batch-evaluated:
    one Spark job over many documents."""

    def test_matches_python_reference(self, spark):
        from big_data_flight_analytics_spark.operators.dedup import (
            paragraph_dedup,
        )

        rng = random.Random(47)
        pool = [f"para {i} " + " ".join(
            rng.choice(["aa", "bb", "cc", "dd"]) for _ in range(4)
        ) for i in range(60)]  # shared pool -> guaranteed cross-doc dups
        docs = {}
        for did in range(120):
            n = rng.randint(1, 6)
            docs[did] = [rng.choice(pool) for _ in range(n)]

        # python reference: first occurrence by (doc_id, position) wins
        seen: set[str] = set()
        expect: dict[int, tuple[str, int, int]] = {}
        for did in sorted(docs):
            kept = []
            for p in docs[did]:
                if p not in seen:
                    seen.add(p)
                    kept.append(p)
            if kept:
                expect[did] = ("\n\n".join(kept), len(docs[did]), len(kept))

        df = spark.createDataFrame(
            [Row(doc_id=d, text="\n\n".join(ps)) for d, ps in docs.items()]
        )
        got = {
            r["doc_id"]: (r["clean_text"], r["n_paras"], r["n_kept"])
            for r in paragraph_dedup(df).collect()
        }
        assert got == expect


class TestPiiScrubProperties:
    """After scrub_pii, NO text can still match any scrub pattern —
    the property real training-data hygiene relies on. Batch-evaluated:
    one job over many planted-PII strings and near-misses."""

    def test_no_pattern_survives_scrub(self, spark):
        from big_data_flight_analytics_spark.operators.text import (
            PII_DIGITS_RE,
            PII_EMAIL_RE,
            PII_URL_RE,
            scrub_pii,
        )

        rng = random.Random(41)
        words = ["alpha", "beta", "report", "data", "x1", "k9"]
        planted = []
        for i in range(200):
            bits = [rng.choice(words) for _ in range(rng.randint(1, 8))]
            kind = i % 5
            if kind == 0:
                bits.insert(1, f"user.{i}+tag@sub{i % 7}.example.co")
            elif kind == 1:
                bits.insert(0, rng.choice([
                    f"https://ex.com/p/{i}?a=b&c=d#frag",
                    f"http://h{i}.org", f"www.site{i}.net/x",
                ]))
            elif kind == 2:
                bits.append(rng.choice([
                    "415-555-0199", "(415) 555 0199", "4111 1111 1111 1111",
                    "123-45-6789", "12345678901",
                ]))
            elif kind == 3:  # all three at once, adjacent
                bits = [f"a@b.io www.c.de 987-654-3210"] + bits
            # kind == 4: clean text + near-misses that must NOT be
            # scrubbed. The digit pattern spans separators ("4111 1111
            # 1111 1111" is one run), so neighbors must be digit-free or
            # a vocab digit would legitimately extend the run.
            else:
                bits = [w for w in bits if not any(c.isdigit() for c in w)]
                bits.append(rng.choice(["1234", "a@b", "v1.2", "http//x"]))
            planted.append(Row(doc_id=i, text=" ".join(bits)))

        out = scrub_pii(spark.createDataFrame(planted)).select(
            "doc_id",
            "clean_text",
            F.regexp_count("clean_text", F.lit(PII_EMAIL_RE)).alias("e"),
            F.regexp_count("clean_text", F.lit(PII_URL_RE)).alias("u"),
            F.regexp_count("clean_text", F.lit(PII_DIGITS_RE)).alias("d"),
            "n_emails", "n_urls", "n_digit_runs",
        ).collect()
        for r in out:
            assert r["e"] == r["u"] == r["d"] == 0, r["clean_text"]
            kind = r["doc_id"] % 5
            if kind == 0:
                assert "<EMAIL>" in r["clean_text"] and r["n_emails"] >= 1
            elif kind == 1:
                assert "<URL>" in r["clean_text"] and r["n_urls"] >= 1
            elif kind == 2:
                assert "<NUM>" in r["clean_text"] and r["n_digit_runs"] >= 1
            elif kind == 3:
                for tok in ("<EMAIL>", "<URL>", "<NUM>"):
                    assert tok in r["clean_text"]
            else:  # near-misses untouched
                for tok in ("<EMAIL>", "<URL>", "<NUM>"):
                    assert tok not in r["clean_text"]


class TestWinnowingProperties:
    """The winnowing guarantee (Schleimer/Wilkerson/Aiken, SIGMOD 2003
    thm 1): two documents sharing a contiguous token run of length
    >= window + k - 1 share at least one fingerprint. Batch-evaluated:
    one Spark job over many planted-overlap pairs."""

    K, W = 3, 4

    def _fps(self, spark, docs):
        from big_data_flight_analytics_spark.operators.text import (
            winnow_fingerprints,
        )
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [Row(doc_id=i, text=" ".join(t)) for i, t in docs.items()]
        )
        rows = winnow_fingerprints(df, k=self.K, window=self.W).collect()
        out: dict[int, set] = {i: set() for i in docs}
        for r in rows:
            out[r.doc_id].add(r.fingerprint)
        return out

    def test_shared_run_shares_fingerprint(self, spark):
        rng = random.Random(5)
        vocab = [f"w{i}" for i in range(400)]
        guarantee = self.W + self.K - 1  # 6 tokens
        docs, expect_pairs = {}, []
        for case in range(40):
            run_len = rng.randint(guarantee, guarantee + 6)
            shared = [rng.choice(vocab) for _ in range(run_len)]
            a, b = 2 * case, 2 * case + 1
            docs[a] = (
                [rng.choice(vocab) for _ in range(rng.randint(0, 20))]
                + shared
                + [rng.choice(vocab) for _ in range(rng.randint(0, 20))]
            )
            docs[b] = (
                [rng.choice(vocab) for _ in range(rng.randint(0, 20))]
                + shared
                + [rng.choice(vocab) for _ in range(rng.randint(0, 20))]
            )
            expect_pairs.append((a, b))
        fps = self._fps(spark, docs)
        for a, b in expect_pairs:
            assert fps[a] & fps[b], (
                f"docs {a},{b} share a {len(docs[a])}/{len(docs[b])}-token "
                "run >= the guarantee length but no fingerprint"
            )

    def test_identical_docs_identical_fingerprints(self, spark):
        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(50)]
        base = [rng.choice(vocab) for _ in range(60)]
        fps = self._fps(spark, {0: base, 1: list(base)})
        assert fps[0] == fps[1] and fps[0]

    def test_density_bound(self, spark):
        """Fingerprints are window minima, so a doc can never emit more
        fingerprints than it has windows (m - w + 1 full windows)."""
        rng = random.Random(9)
        vocab = [f"w{i}" for i in range(300)]
        docs = {
            i: [rng.choice(vocab) for _ in range(rng.randint(3, 120))]
            for i in range(60)
        }
        fps = self._fps(spark, docs)
        for i, toks in docs.items():
            m = max(len(toks) - self.K + 1, 0)
            if m == 0:
                assert fps[i] == set()
            else:
                assert 1 <= len(fps[i]) <= max(m - self.W + 1, 1)


class TestChunkTokensProperties:
    """chunk_tokens == a pure-Python chunker over random whitespace-
    messy corpora, across a (chunk_size, overlap) grid including the
    degenerate cases (overlap 0, step 1, docs shorter than one chunk).
    Batch-evaluated: one Spark job per config."""

    @staticmethod
    def _reference(texts, chunk_size, overlap):
        step = chunk_size - overlap
        out = {}
        for doc_id, text in enumerate(texts):
            toks = text.split() if text and text.strip() else []
            # starts stop before len - overlap: no chunk may be a pure
            # suffix of its predecessor
            stop = max(len(toks) - overlap, 1) if toks else 0
            for idx, start in enumerate(range(0, stop, step)):
                piece = toks[start : start + chunk_size]
                out[(doc_id, idx)] = (" ".join(piece), len(piece))
        return out

    def test_matches_python_reference(self, spark):
        from big_data_flight_analytics_spark.operators.text import (
            chunk_tokens,
        )

        rng = random.Random(29)
        words = ["aa", "b", "ccc", "Dd", "EEE"]
        texts = []
        for _ in range(40):
            n = rng.randint(0, 30)
            sep = lambda: rng.choice([" ", "  ", "\t", " \t "])  # noqa: E731
            texts.append(sep().join(rng.choice(words) for _ in range(n)))
        texts += ["", "   ", "one"]
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )
        for chunk_size, overlap in [(2, 0), (2, 1), (5, 2), (7, 6), (64, 16)]:
            got = {
                (r["doc_id"], r["chunk_id"]): (
                    r["chunk_text"],
                    r["n_chunk_tokens"],
                )
                for r in chunk_tokens(
                    docs, chunk_size=chunk_size, overlap=overlap
                ).collect()
            }
            assert got == self._reference(texts, chunk_size, overlap), (
                chunk_size,
                overlap,
            )


class TestOrderedFunnelProperties:
    """ordered_funnel == a pure-Python earliest-completion simulation
    on random event streams. The window formulation (one Exchange for
    all steps) must be semantically identical to the sequential
    definition: t_k = min ts of step-k events strictly after t_{k-1}.
    Batch-evaluated: one Spark job per corpus."""

    @staticmethod
    def _reference(events, steps):
        # events: list of (user, type, ts)
        by_user: dict = {}
        for u, t, ts in events:
            by_user.setdefault(u, []).append((t, ts))
        counts = [0] * len(steps)
        for u, evs in by_user.items():
            prev = None
            for k, step in enumerate(steps):
                cand = [
                    ts
                    for t, ts in evs
                    if t == step and (prev is None or ts > prev)
                ]
                if not cand:
                    break
                prev = min(cand)
                counts[k] += 1
        return {s: c for s, c in zip(steps, counts)}

    def test_matches_python_reference(self, spark):
        from big_data_flight_analytics_spark.operators.behavior import (
            ordered_funnel,
        )

        rng = random.Random(61)
        types = ["a", "b", "c", "d"]
        events = []
        for i in range(800):
            events.append(
                (
                    f"u{rng.randrange(40)}",
                    rng.choice(types),
                    # coarse timestamps force plenty of exact ties,
                    # exercising the strict > boundary
                    1_700_000_000_000_000 + rng.randrange(50) * 1_000_000,
                )
            )
        df = spark.createDataFrame(
            [
                Row(
                    user_id=u,
                    event_type=t,
                    ts=__import__("datetime").datetime.utcfromtimestamp(
                        us / 1_000_000
                    ),
                )
                for u, t, us in events
            ]
        )
        for steps in [("a", "b"), ("a", "b", "c"), ("d", "a", "c", "b")]:
            got = {
                r["step"]: r["n_users"]
                for r in ordered_funnel(df, steps).collect()
            }
            want = self._reference(
                [
                    (u, t, us)
                    for u, t, us in events
                ],
                steps,
            )
            assert got == want, steps


class TestEventTransitionsProperties:
    def test_matches_python_reference(self, spark):
        from big_data_flight_analytics_spark.operators.behavior import (
            event_transitions,
        )

        rng = random.Random(17)
        rows = []
        for eid in range(600):
            rows.append(
                (
                    eid,
                    f"u{rng.randrange(25)}",
                    rng.choice(["x", "y", "z"]),
                    1_700_000_000_000_000 + rng.randrange(40) * 1_000_000,
                )
            )
        # python reference: sort per user by (ts, event_id)
        per_user: dict = {}
        for eid, u, t, us in rows:
            per_user.setdefault(u, []).append((us, eid, t))
        want: dict = {}
        for u, evs in per_user.items():
            evs.sort()
            for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
                want[(a, b)] = want.get((a, b), 0) + 1
        df = spark.createDataFrame(
            [
                Row(
                    event_id=eid,
                    user_id=u,
                    event_type=t,
                    ts=__import__("datetime").datetime.utcfromtimestamp(
                        us / 1_000_000
                    ),
                )
                for eid, u, t, us in rows
            ]
        )
        got = {
            (r["from_type"], r["to_type"]): r["n_transitions"]
            for r in event_transitions(df).collect()
        }
        assert got == want


class TestApplyChangesProperties:
    """CDC merge vs a direct python fold of the changeset."""

    def test_matches_python_reference_on_random_changesets(self, spark):
        from big_data_flight_analytics_spark.operators.scd import apply_changes

        rng = random.Random(23)
        base_rows = [Row(k=k, v=f"base{k}") for k in range(40)]
        changes = [
            Row(
                k=rng.randrange(60),  # keys beyond base -> inserts
                op=rng.choice(["I", "U", "D"]),
                v=f"c{i}",
                seq=i,
            )
            for i in range(300)
        ]
        got = {
            (r["k"], r["v"])
            for r in apply_changes(
                spark.createDataFrame(base_rows),
                spark.createDataFrame(changes),
                key="k",
                seq=["seq"],
                payload=["v"],
            ).collect()
        }
        # python reference: fold in seq order, last writer wins
        state = {r.k: r.v for r in base_rows}
        for c in sorted(changes, key=lambda c: c.seq):
            if c.op == "D":
                state.pop(c.k, None)
            else:
                state[c.k] = c.v
        assert got == set(state.items())


class TestRollingZscoreProperties:
    def test_matches_python_reference(self, spark):
        from big_data_flight_analytics_spark.operators.temporal import (
            rolling_zscore,
        )

        rng = random.Random(7)
        rows = [
            Row(k=i % 5, t=i, v=rng.randrange(0, 1000)) for i in range(400)
        ]
        out = rolling_zscore(
            spark.createDataFrame(rows), key="k", order=["t"],
            int_value_col="v", window=5, min_periods=3, dp=None,
        ).collect()
        got = {(r["k"], r["t"]): r["zscore"] for r in out}
        series: dict[int, list[tuple[int, int]]] = {}
        for r in sorted(rows, key=lambda r: (r.k, r.t)):
            series.setdefault(r.k, []).append((r.t, r.v))
        for k, pts in series.items():
            for i, (t, v) in enumerate(pts):
                trail = [x for _, x in pts[max(0, i - 5):i]]
                n = len(trail)
                if n < 3:
                    assert got[(k, t)] is None
                    continue
                s, ss = sum(trail), sum(x * x for x in trail)
                var_num = n * ss - s * s
                if var_num <= 0:
                    assert got[(k, t)] is None
                else:
                    want = (v * n - s) / math.sqrt(var_num)
                    assert got[(k, t)] == want  # bit-exact, same IEEE chain


class TestRepeatedSpansProperties:
    def test_matches_python_reference_on_random_corpus(self, spark):
        from big_data_flight_analytics_spark.operators.dedup import (
            repeated_spans,
        )

        rng = random.Random(41)
        vocab = [f"w{i}" for i in range(12)]  # small vocab -> collisions
        docs = [
            Row(
                doc_id=i,
                text=" ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))),
            )
            for i in range(40)
        ]
        n = 4
        got = {
            (r["doc_id"], r["span_start"], r["span_end_tok"], r["n_windows"])
            for r in repeated_spans(
                spark.createDataFrame(docs), n=n
            ).collect()
        }
        # python reference
        from collections import Counter

        grams: list[tuple[int, int, tuple]] = []
        counts: Counter = Counter()
        for d in docs:
            toks = d.text.lower().split()
            for p in range(len(toks) - n + 1):
                g = tuple(toks[p:p + n])
                grams.append((d.doc_id, p, g))
                counts[g] += 1
        marked: dict[int, list[int]] = {}
        for doc, p, g in grams:
            if counts[g] >= 2:
                marked.setdefault(doc, []).append(p)
        want = set()
        for doc, ps in marked.items():
            ps.sort()
            start = prev = ps[0]
            cnt = 1
            for p in ps[1:]:
                if p - prev > 1:
                    want.add((doc, start, prev + n - 1, cnt))
                    start, cnt = p, 0
                prev = p
                cnt += 1
            want.add((doc, start, prev + n - 1, cnt))
        assert got == want


class TestPageRankFixedPointProperties:
    """Invariants of the int64 fixed-point PageRank on random graphs."""

    def test_random_graphs_exact_and_bounded(self, spark):
        import random

        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.graph import (
            pagerank_fixedpoint,
        )

        scale = 10**12
        for seed in (3, 17, 202):
            rng = random.Random(seed)
            n_nodes = rng.randrange(5, 40)
            edges = [
                (s, d)
                for s, d in {
                    (rng.randrange(n_nodes), rng.randrange(n_nodes))
                    for _ in range(rng.randrange(10, 120))
                }
                if s != d
            ]
            if not edges:
                continue
            df = spark.createDataFrame(
                [Row(src=s, dst=d) for s, d in edges]
            )
            ranks = {
                r["node"]: r["rank_fp"]
                for r in pagerank_fixedpoint(df, num_iter=4).collect()
            }
            nodes = {v for e in edges for v in e}
            assert set(ranks) == nodes
            # every rank in (0, scale]; floors only LOSE mass, so the
            # total can never exceed one unit of rank
            assert all(0 < v <= scale for v in ranks.values())
            assert sum(ranks.values()) <= scale
            # mass loss from flooring is bounded: <= ~1 unit per node
            # per (contribution + dangling + damping) op per round
            assert sum(ranks.values()) >= scale - 4 * 4 * len(nodes)


class TestBatchedBpeProperties:
    def test_random_corpora_batched_table_is_valid(self, spark):
        import random

        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.bpe import (
            learn_bpe_merges,
            learn_bpe_merges_batched,
        )

        rng = random.Random(5)
        words = ["".join(rng.choice("abcd") for _ in range(rng.randrange(2, 6)))
                 for _ in range(30)]
        texts = [
            " ".join(rng.choice(words) for _ in range(rng.randrange(5, 15)))
            for _ in range(6)
        ]
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )
        classic = learn_bpe_merges(docs, 6, min_count=2)
        batched = learn_bpe_merges_batched(docs, 6, batch_k=3, min_count=2)
        # no duplicate rules, and the first rule (an uncontended argmax)
        # always agrees with classic
        assert len(batched) == len(set(batched))
        if classic and batched:
            assert batched[0] == classic[0]


class TestKAnonymityReport:
    """p3: per-QI-group k and l metrics."""

    def test_group_sizes_and_diversity(self, spark):
        from big_data_flight_analytics_spark.operators.quality import (
            k_anonymity_report,
        )

        rows = (
            [("us", "a", 1)] * 5          # k=5, l=1 -> meets_k only
            + [("us", "b", i) for i in range(3)]  # k=3, l=3 -> meets_l only
            + [("de", "a", 7)]            # k=1, l=1 -> neither
        )
        df = spark.createDataFrame(rows, "nat string, seg string, s long")
        got = {
            (r["nat"], r["seg"]): (
                r["group_n"], r["l_distinct"], r["meets_k"], r["meets_l"]
            )
            for r in k_anonymity_report(
                df, ["nat", "seg"], "s", k=5, l_div=3
            ).collect()
        }
        assert got[("us", "a")] == (5, 1, True, False)
        assert got[("us", "b")] == (3, 3, False, True)
        assert got[("de", "a")] == (1, 1, False, False)

    def test_null_quasi_identifiers_form_their_own_group(self, spark):
        from big_data_flight_analytics_spark.operators.quality import (
            k_anonymity_report,
        )

        df = spark.createDataFrame(
            [(None, "a", 1), (None, "a", 2), ("us", "a", 1)],
            "nat string, seg string, s long",
        )
        got = k_anonymity_report(df, ["nat", "seg"], "s", k=2).collect()
        by_nat = {r["nat"]: r["group_n"] for r in got}
        assert by_nat[None] == 2 and by_nat["us"] == 1

    def test_state_fold_equals_full_and_report_matches_direct(self, spark):
        from big_data_flight_analytics_spark.operators.quality import (
            k_anonymity_fold,
            k_anonymity_from_state,
            k_anonymity_report,
            k_anonymity_state,
        )

        rows = [
            ("us", "a", i % 4) for i in range(20)
        ] + [("de", "b", None), ("de", "b", 1)]
        df = spark.createDataFrame(rows, "nat string, seg string, s long")
        full_state = k_anonymity_state(df, ["nat", "seg"], "s")
        halves = [rows[0::2], rows[1::2]]
        folded = k_anonymity_fold(
            k_anonymity_state(
                spark.createDataFrame(halves[0], df.schema), ["nat", "seg"], "s"
            ),
            k_anonymity_state(
                spark.createDataFrame(halves[1], df.schema), ["nat", "seg"], "s"
            ),
            ["nat", "seg"],
            "s",
        )
        key = lambda d: {  # noqa: E731
            (r["nat"], r["seg"], r["s"]): r["cnt"] for r in d.collect()
        }
        assert key(folded) == key(full_state)
        # the derived report equals the direct one (NULL sensitive
        # counts toward group_n but not l_distinct, both paths)
        rep = lambda d: {  # noqa: E731
            (r["nat"], r["seg"]): (
                r["group_n"], r["l_distinct"], r["meets_k"], r["meets_l"]
            )
            for r in d.collect()
        }
        assert rep(
            k_anonymity_from_state(folded, ["nat", "seg"], "s", k=5, l_div=3)
        ) == rep(k_anonymity_report(df, ["nat", "seg"], "s", k=5, l_div=3))


def _py_kmv(values, k):
    """Pure-Python reference model of kmv_sketch (hashlib md5 == Spark
    md5, 60-bit prefix) — an oracle independent of both engines."""
    import hashlib

    hs = sorted(
        {
            int(hashlib.md5(str(int(v)).encode()).hexdigest()[:15], 16)
            for v in values
            if v is not None
        }
    )[:k]
    return {(i + 1, h) for i, h in enumerate(hs)}


class TestKMVModelProperties:
    @settings(max_examples=8, deadline=None)
    @given(
        vals=st.lists(
            st.integers(min_value=-10_000, max_value=10_000),
            min_size=0, max_size=120,
        ),
        k=st.sampled_from([1, 4, 16]),
    )
    def test_sketch_matches_pure_python_model(self, vals, k):
        from big_data_flight_analytics_spark.operators.sketches import (
            kmv_sketch,
        )

        spark = _get_spark()
        df = spark.createDataFrame(
            [(int(v),) for v in vals] or [(None,)], "v long"
        )
        got = {
            (r["rank"], r["h"]) for r in kmv_sketch(df, "v", k).collect()
        }
        assert got == _py_kmv(vals, k)

    @settings(max_examples=8, deadline=None)
    @given(
        vals=st.lists(
            st.integers(min_value=0, max_value=5_000),
            min_size=2, max_size=100,
        ),
        cut=st.integers(min_value=1, max_value=99),
        k=st.sampled_from([4, 16]),
    )
    def test_fold_of_any_cut_matches_model_of_union(self, vals, cut, k):
        from big_data_flight_analytics_spark.operators.sketches import (
            kmv_fold,
            kmv_sketch,
        )

        spark = _get_spark()
        cut = min(cut, len(vals) - 1)
        a, b = vals[:cut], vals[cut:]
        fa = kmv_sketch(
            spark.createDataFrame([(v,) for v in a], "v long"), "v", k
        )
        fb = kmv_sketch(
            spark.createDataFrame([(v,) for v in b], "v long"), "v", k
        )
        got = {(r["rank"], r["h"]) for r in kmv_fold(fa, fb, k).collect()}
        assert got == _py_kmv(vals, k)


class TestHistogramModelProperties:
    @settings(max_examples=8, deadline=None)
    @given(
        vals=st.lists(
            st.integers(min_value=-100_000, max_value=100_000),
            min_size=1, max_size=150,
        ),
        grain=st.sampled_from([1, 7, 100]),
    )
    def test_histogram_matches_floor_division_model(self, vals, grain):
        from big_data_flight_analytics_spark.operators.sketches import (
            fixed_grain_histogram,
        )

        spark = _get_spark()
        df = spark.createDataFrame([(int(v),) for v in vals], "v long")
        got = {
            r["bucket"]: r["cnt"]
            for r in fixed_grain_histogram(df, "v", grain).collect()
        }
        want = {}
        for v in vals:
            b = v // grain  # python floor division == FLOOR(v/grain)
            want[b] = want.get(b, 0) + 1
        assert got == want
