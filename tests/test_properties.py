"""Property-based checks (SURVEY §5 item 4): operator invariants under
randomized inputs, via hypothesis.

Each property runs few examples (Spark jobs are ~100 ms each) but every
example is adversarial: random key overlaps, duplicate timestamps,
empty sides. Deadlines are disabled — JVM warmup would trip them.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from formula1_dataengineering_spark.operators.asof import asof_join
from formula1_dataengineering_spark.operators.graph import connected_components
from formula1_dataengineering_spark.operators.grid import ordered_group_position
from formula1_dataengineering_spark.operators.interval import interval_join

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_keys = st.integers(min_value=0, max_value=3)
_times = st.integers(min_value=0, max_value=50)


@given(
    left=st.lists(st.tuples(_keys, _times), min_size=1, max_size=20),
    right=st.lists(st.tuples(_keys, _times, st.integers(0, 99)), max_size=20),
)
@_SETTINGS
def test_asof_backward_invariants(spark, left, right):
    """Left-join shape: |out| == |left|; match is the latest right
    time <= left time within the same key (or null)."""
    ldf = spark.createDataFrame(left, ["k", "t"]).withColumn(
        "lid", F.monotonically_increasing_id()
    )
    rdf = spark.createDataFrame(right, ["k", "t", "v"]) if right else (
        spark.createDataFrame([], "k int, t int, v int")
    )
    out = asof_join(ldf, rdf, on="t", by="k", direction="backward").collect()
    assert len(out) == len(left)
    by_key: dict[int, list[tuple[int, int]]] = {}
    for k, t, v in right:
        by_key.setdefault(k, []).append((t, v))
    for row in out:
        cands = [(t, v) for t, v in by_key.get(row["k"], []) if t <= row["t"]]
        if not cands:
            assert row["t_right"] is None
        else:
            best_t = max(t for t, _ in cands)
            assert row["t_right"] == best_t


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["A", "B", "C"]), st.integers(0, 9)),
        min_size=1,
        max_size=25,
    )
)
@_SETTINGS
def test_ordered_group_position_is_permutation(spark, rows):
    """Positions are exactly 1..n with groups stacked in order."""
    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)], ["g", "v", "id"]
    )
    out = ordered_group_position(
        df, "g", ["A", "B", "C"], [F.col("v").asc(), F.col("id").asc()],
        position_col="pos",
    ).collect()
    assert sorted(r["pos"] for r in out) == list(range(1, len(rows) + 1))
    # group blocks are contiguous and ordered A < B < C
    order = {g: i for i, g in enumerate("ABC")}
    by_pos = sorted(out, key=lambda r: r["pos"])
    assert [order[r["g"]] for r in by_pos] == sorted(order[r["g"]] for r in by_pos)


@given(
    points=st.lists(st.tuples(_keys, _times), max_size=20),
    spans=st.lists(st.tuples(_keys, _times, _times), max_size=10),
)
@_SETTINGS
def test_interval_join_membership(spark, points, spans):
    """Every emitted row satisfies the range predicate; inner-join
    output equals the brute-force pair filter."""
    p = spark.createDataFrame(points, ["k", "t"]) if points else (
        spark.createDataFrame([], "k int, t int")
    )
    s = (
        spark.createDataFrame(
            [(k, min(a, b), max(a, b)) for k, a, b in spans], ["k", "lo", "hi"]
        )
        if spans
        else spark.createDataFrame([], "k int, lo int, hi int")
    )
    got = sorted(
        (r["k"], r["t"], r["lo"], r["hi"])
        for r in interval_join(
            p, s, "t", "lo", "hi", on=["k"], how="inner"
        ).collect()
    )
    want = sorted(
        (k, t, lo, hi)
        for k, t in points
        for k2, lo, hi in ((k2, min(a, b), max(a, b)) for k2, a, b in spans)
        if k == k2 and lo <= t <= hi
    )
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=30
    )
)
@_SETTINGS
def test_connected_components_invariants(spark, edges):
    """component <= node (min-id labeling), edge endpoints agree, and
    labels match a reference union-find."""
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert all(c <= n for n, c in got.items())
    for a, b in edges:
        assert got[a] == got[b]
    # reference labeling
    nodes = {n for e in edges for n in e}
    comp = {n: n for n in nodes}
    for _ in nodes:
        for a, b in edges:
            m = min(comp[a], comp[b])
            comp[a] = comp[b] = m
        for n in comp:
            comp[n] = comp[comp[n]]
    assert got == comp


# ---------------------------------------------------------------------------
# Invariants for the classic-warehouse-shape queries (cheap, sf0.001) —
# these hold for ANY data, complementing the oracle's value-equality.
# ---------------------------------------------------------------------------

_SF = "/root/testdata/sf0.001"


def test_decile_spread_invariants(spark):
    from formula1_dataengineering_spark.plans import QUERIES
    from formula1_dataengineering_spark.sources.catalog import load

    rows = QUERIES["decile_value_spread"](spark, _SF).collect()
    assert all(1 <= r.decile <= 10 for r in rows)
    assert all(r.lo <= r.hi for r in rows)
    n_orders = load(spark, _SF, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders


def test_full_outer_covers_both_sides(spark):
    from formula1_dataengineering_spark.plans import QUERIES
    from formula1_dataengineering_spark.sources.catalog import load

    rows = QUERIES["nation_activity_full_outer"](spark, _SF).collect()
    got = {r.nationkey for r in rows}
    cust = {
        r.c_nationkey
        for r in load(spark, _SF, "customer")
        .where("c_mktsegment = 'MACHINERY'")
        .select("c_nationkey")
        .distinct()
        .collect()
    }
    sup = {
        r.s_nationkey
        for r in load(spark, _SF, "supplier")
        .where("s_acctbal > 5000")
        .select("s_nationkey")
        .distinct()
        .collect()
    }
    assert got == cust | sup
    # coalesced zeros exactly where one side is absent
    assert all((r.n_customers == 0) == (r.nationkey not in cust) for r in rows)
    assert all((r.n_suppliers == 0) == (r.nationkey not in sup) for r in rows)


def test_monthly_trend_first_month_has_null_delta(spark):
    from formula1_dataengineering_spark.plans import QUERIES

    rows = QUERIES["monthly_revenue_trend"](spark, _SF).collect()
    nulls = [r for r in rows if r.mom_delta is None]
    assert len(nulls) == 1
    assert nulls[0].month_us == min(r.month_us for r in rows)


def test_event_type_profile_internal_consistency(spark):
    from formula1_dataengineering_spark.plans import QUERIES

    for r in QUERIES["user_event_type_profile"](spark, _SF).collect():
        types = r.types_csv.split(",")
        assert len(types) == r.n_types
        assert types == sorted(types)
        assert r.n_events >= r.n_types


def test_hourly_moving_value_frame_bounds(spark):
    from formula1_dataengineering_spark.plans import QUERIES
    from formula1_dataengineering_spark.sources.catalog import load

    df = QUERIES["hourly_moving_value"](spark, _SF)
    rows = df.collect()
    assert all(r.hour_events >= 1 for r in rows)  # frame includes current row
    assert len(rows) == load(spark, _SF, "events").count()


def test_group_minhash_similarity_extremes(spark):
    """Identical groups estimate 1.0; disjoint-vocab groups share no
    component and are absent; a half-overlapping pair lands between."""
    from formula1_dataengineering_spark.operators.dedup import (
        group_minhash_similarity,
    )

    rows = []
    for i in range(30):
        rows.append((i, f"w{i} common{i % 10}", "a"))
        rows.append((100 + i, f"w{i} common{i % 10}", "b"))      # b == a
        rows.append((200 + i, f"z{i} zz{i % 7}", "c"))           # disjoint
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r.group_a, r.group_b): r
        for r in group_minhash_similarity(
            df, group_col="source", num_hashes=12, shingle_k=1
        ).collect()
    }
    assert out[("a", "b")].est_jaccard == 1.0
    assert ("a", "c") not in out and ("b", "c") not in out


@_SETTINGS
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=6),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_heavy_hitters_match_naive_counts(spark, docs):
    """Two-phase sharded top-k == naive pandas top-k (count desc, term
    asc) on every random corpus — the lossless-prune claim."""
    from collections import Counter

    from formula1_dataengineering_spark.functions.text import heavy_hitter_terms

    rows = [(i, src, " ".join(toks)) for i, (src, toks) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["source"], r["rk"]): (r["term"], r["term_count"])
        for r in heavy_hitter_terms(df, k=2).collect()
    }
    for src in {s for s, _ in docs}:
        c = Counter(t for s, toks in docs if s == src for t in toks)
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        for rk, (term, cnt) in enumerate(want, start=1):
            assert got[(src, rk)] == (term, cnt)


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=4),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_source_term_drift_is_bounded_and_zero_on_self(spark, rows):
    """TVD ∈ [0, 1] always; a single-source corpus has drift exactly 0
    (its distribution IS the corpus distribution)."""
    from formula1_dataengineering_spark.functions.text import source_term_drift

    df = spark.createDataFrame(
        [(i, s, " ".join(t)) for i, (s, t) in enumerate(rows)],
        "doc_id long, source string, text string",
    )
    out = source_term_drift(df).collect()
    for r in out:
        assert -1e-9 <= r["tvd"] <= 1 + 1e-9
    if len({s for s, _ in rows}) == 1:
        assert out[0]["tvd"] == 0.0


@_SETTINGS
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=40
    )
)
def test_kmv_exact_below_k(spark, ids):
    """With fewer than k distinct ids the KMV estimate IS the exact
    distinct count, for any multiset of ids."""
    from formula1_dataengineering_spark.operators.sampling import (
        kmv_sketch_profile,
    )

    df = spark.createDataFrame(
        [(i, "g", v, float(v)) for i, v in enumerate(ids)],
        "row_id long, g string, uid long, value double",
    )
    row = kmv_sketch_profile(
        df, "g", "value", id_col="uid", row_id_col="row_id", k=64
    ).collect()[0]
    assert row["kmv_distinct_ids"] == float(len(set(ids)))
    assert row["n_rows"] == len(ids)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), max_size=25
    ),
)
@_SETTINGS
def test_triangle_count_matches_bruteforce(spark, edges):
    """Degree-oriented enumeration == brute-force triple check on
    random multigraphs (self-loops, duplicates, both directions):
    same triangle SET, each emitted exactly once, in (deg,id)
    orientation order."""
    from itertools import combinations

    from formula1_dataengineering_spark.operators.graph import triangle_count

    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({n for e in und for n in e})
    want = {
        tuple(sorted(t))
        for t in combinations(nodes, 3)
        if {(t[0], t[1]), (t[0], t[2]), (t[1], t[2])} <= und
    }
    if not edges:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    got = [tuple(r) for r in triangle_count(df).collect()]
    assert {tuple(sorted(t)) for t in got} == want
    assert len(got) == len(want)  # exactly once each
    # orientation order: a precedes b precedes c under (deg, id)
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    for a, b, c in got:
        ka, kb, kc = (deg[a], a), (deg[b], b), (deg[c], c)
        assert ka < kb < kc


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab \t\n"), max_size=40
        ),
        min_size=1,
        max_size=8,
    ),
    size=st.integers(1, 5),
)
@_SETTINGS
def test_udtf_chunker_matches_python_reference(spark, texts, size):
    """Arrow UDTF chunker == pure-Python reference on random
    whitespace-heavy strings: same rows, same chunk numbering, full
    token coverage, no empty chunks."""
    from formula1_dataengineering_spark.operators.curation import (
        make_window_chunks_udtf,
    )

    spark.udtf.register("wc_prop", make_window_chunks_udtf())
    spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).createOrReplaceTempView("wc_prop_docs")
    got = sorted(
        tuple(r)
        for r in spark.sql(
            f"SELECT d.doc_id, c.chunk_no, c.start_token, c.chunk_text, "
            f"c.n_tokens FROM wc_prop_docs d, "
            f"LATERAL wc_prop(d.text, {size}) c"
        ).collect()
    )
    want = []
    for doc_id, t in enumerate(texts):
        toks = t.split()
        for i in range(0, len(toks), size):
            w = toks[i : i + size]
            want.append(
                (doc_id, i // size + 1, i, " ".join(w), len(w))
            )
    assert got == sorted(want)


@given(
    vecs=st.lists(
        st.tuples(
            st.integers(-3, 3), st.integers(-3, 3), st.integers(-3, 3)
        ),
        min_size=2,
        max_size=10,
        unique=True,
    ),
)
@_SETTINGS
def test_mutual_knn_matches_numpy_reference(spark, vecs):
    """Per-cell GEMM mutual-kNN == a numpy brute-force reference:
    same undirected edge set (reciprocal top-k under cos desc, id asc;
    zero vectors excluded)."""
    import numpy as np

    from formula1_dataengineering_spark.operators.similarity import (
        mutual_knn_edges,
    )

    k = 2
    rows = [
        (i, [float(x) for x in v], "c") for i, v in enumerate(vecs)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    got = sorted(tuple(r) for r in mutual_knn_edges(emb, k=k).collect())

    M = np.array([v for _, v in enumerate(vecs)], dtype=np.float64)
    n = len(vecs)
    norms = np.sqrt((M * M).sum(axis=1))
    topk = {}
    for i in range(n):
        cands = []
        for j in range(n):
            if j == i or norms[i] == 0 or norms[j] == 0:
                continue
            cos = float(M[i] @ M[j] / (norms[i] * norms[j]))
            # Rank on the OPERATOR'S contract key: the nearest-grid
            # (half-away) quantized cosine, ties by id asc — NOT the
            # raw float. Integer-lattice vectors reach the same
            # geometric cosine (e.g. 1/sqrt(2)) via different
            # arithmetic paths that differ in the last ulp; a raw
            # reference would tie-break on that noise, which is
            # exactly the divergence class qcos exists to kill
            # (hypothesis found such a lattice: three 1/sqrt(2) pairs
            # ulp-apart).
            scaled = cos * 1e12
            q = int(math.floor(abs(scaled) + 0.5)) * (
                1 if scaled >= 0 else -1
            )
            cands.append((-q, j))
        cands.sort()
        topk[i] = {j for _, j in cands[:k]}
    want = sorted(
        (i, j)
        for i in range(n)
        for j in topk.get(i, ())
        if i < j and i in topk.get(j, set())
    )
    assert got == want


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=0, max_size=15
        ),
        min_size=2,
        max_size=6,
    ),
    k=st.integers(2, 4),
    cap=st.one_of(st.none(), st.integers(1, 4)),
)
@_SETTINGS
def test_substring_family_matches_bruteforce(spark, docs, k, cap):
    """substring_match_pairs / substring_duplicate_coverage == pure-
    Python all-pairs references on random tiny-alphabet corpora (dense
    shared runs, repeated k-grams, df-cap both binding and not):
    identical pair sets, longest-run lengths, shared-gram counts, and
    per-doc interval-union coverage."""
    from collections import defaultdict

    from formula1_dataengineering_spark.operators.dedup import (
        substring_duplicate_coverage,
        substring_match_pairs,
    )

    toks = {i + 1: list(ts) for i, ts in enumerate(docs)}
    grams = {
        d: [(" ".join(ts[i : i + k]), i + 1) for i in range(len(ts) - k + 1)]
        for d, ts in toks.items()
        if len(ts) >= k
    }
    if cap is not None:
        dfc = defaultdict(set)
        for d, gs in grams.items():
            for g, _ in gs:
                dfc[g].add(d)
        hot = {g for g, s in dfc.items() if len(s) > cap}
        grams = {
            d: [(g, p) for g, p in gs if g not in hot]
            for d, gs in grams.items()
        }
    want_pairs: dict = {}
    starts = defaultdict(set)
    ids = sorted(grams)
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            matches = [
                (pa, pb)
                for g, pa in grams[da]
                for g2, pb in grams[db]
                if g == g2
            ]
            if not matches:
                continue
            diags = defaultdict(list)
            for pa, pb in matches:
                diags[pa - pb].append(pa)
                starts[da].add(pa)
                starts[db].add(pb)
            longest = 0
            for ps in diags.values():
                ps.sort()
                run = 1
                for x, y in zip(ps, ps[1:]):
                    run = run + 1 if y == x + 1 else 1
                    longest = max(longest, run)
                longest = max(longest, 1 if len(ps) else 0, run)
            want_pairs[(da, db)] = (longest + k - 1, len(matches))
    want_cov = {}
    for d, ps in starts.items():
        ps = sorted(ps)
        covered = 0
        first = last = ps[0]
        for p in ps[1:]:
            if p - last > k:
                covered += last - first + k
                first = p
            last = p
        covered += last - first + k
        want_cov[d] = covered

    rows = [(d, " ".join(ts)) for d, ts in toks.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_pairs = {
        (r["doc_a"], r["doc_b"]): (
            r["longest_match_tokens"],
            r["n_shared_kgrams"],
        )
        for r in substring_match_pairs(df, k=k, max_df=cap).collect()
    }
    assert got_pairs == want_pairs
    got_cov = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
        for r in substring_duplicate_coverage(df, k=k, max_df=cap).collect()
    }
    assert got_cov == {
        d: (len(toks[d]), c) for d, c in want_cov.items()
    }


@given(
    docs=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(["p", "q", "r", "s"]), min_size=3, max_size=8
            ),
            st.booleans(),
        ),
        min_size=2,
        max_size=8,
    ),
)
@_SETTINGS
def test_incremental_dedup_matches_set_reference(spark, docs):
    """The semi-join ladder of incremental_dedup_flags == plain set
    logic over the SAME signature/band frames: exact_dup iff the batch
    doc's text literally appears in the corpus, near_dup iff it shares
    any (band, key) bucket with a corpus doc. The reference reimplements
    only the LADDER (collect + set intersection) — the hash pipeline
    itself is oracle-verified elsewhere; this pins that the
    broadcast/semi-join plumbing loses or invents nothing, including
    duplicate-text batches and all-batch / all-corpus corners."""
    from formula1_dataengineering_spark.operators.dedup import (
        _band_rows,
        incremental_dedup_flags,
        minhash_signatures,
    )

    rows = [
        (i, " ".join(toks), bool(flag))
        for i, (toks, flag) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, flag boolean")
    got = {
        r["doc_id"]: (r["exact_dup"], r["near_dup"])
        for r in incremental_dedup_flags(df, F.col("flag")).collect()
    }

    batch = {i for i, (_, fl) in enumerate(docs) if fl}
    corpus_texts = {
        " ".join(toks) for i, (toks, fl) in enumerate(docs) if not fl
    }
    sig = minhash_signatures(df, num_hashes=12, shingle_k=3)
    bands = {}
    for r in _band_rows(sig, "doc_id", 12, 4).collect():
        bands.setdefault(r["doc_id"], set()).add((r["band"], r["key"]))
    want = {}
    for i, (toks, fl) in enumerate(docs):
        if not fl:
            continue
        near = any(
            bands.get(i, set()) & bands.get(j, set())
            for j in range(len(docs))
            if j not in batch
        )
        want[i] = (" ".join(toks) in corpus_texts, near)
    assert got == want
