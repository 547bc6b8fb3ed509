"""Cache-lifecycle contract (VERDICT r9 item 2): every operator that
caches an intermediate internally must leave ZERO cached relations
behind when its build+collect runs inside ``caching.cache_scope()``,
and unscoped sessions must be drainable with ``release_caches()``.
The assertion is against Spark's CacheManager itself, not bookkeeping.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_dataengineering_spark.caching import (
    cache_scope,
    managed_cache,
    release_caches,
)

TEXT = [
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
    "alpha bravo charlie delta echo foxtrot golf hotel india kilo",
    "lima mike november oscar papa quebec romeo sierra tango uniform",
    "lima mike november oscar papa quebec romeo sierra tango victor",
    "whiskey xray yankee zulu one two three four five six seven eight",
]


def _cache_empty(spark) -> bool:
    return bool(spark._jsparkSession.sharedState().cacheManager().isEmpty())


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXT)], "doc_id long, text string"
    )


def _vecs(spark):
    rows = [
        (i, [float((i * 7 + j * 3) % 5) - 2.0 for j in range(8)])
        for i in range(24)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _op_minhash(spark):
    from formula1_dataengineering_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    minhash_lsh_pairs(_docs(spark), num_hashes=8, bands=4).collect()


def _op_ngram_jaccard(spark):
    from formula1_dataengineering_spark.operators.dedup import (
        ngram_jaccard_lsh,
    )

    ngram_jaccard_lsh(_docs(spark), num_hashes=8, bands=4).collect()


def _op_semantic(spark):
    from formula1_dataengineering_spark.operators.dedup import (
        semantic_dedup_drops,
    )

    semantic_dedup_drops(_vecs(spark), k=3, iters=2).collect()


def _op_ppjoin(spark):
    from formula1_dataengineering_spark.operators.dedup import (
        ppjoin_exact_jaccard,
    )

    ppjoin_exact_jaccard(_docs(spark), threshold=0.5).collect()


def _op_substring_pairs(spark):
    from formula1_dataengineering_spark.operators.dedup import (
        substring_match_pairs,
    )

    substring_match_pairs(_docs(spark), k=4).collect()


def _op_substring_coverage(spark):
    from formula1_dataengineering_spark.operators.dedup import (
        substring_duplicate_coverage,
    )

    substring_duplicate_coverage(_docs(spark), k=4).collect()


def _op_incremental(spark):
    from formula1_dataengineering_spark.operators.dedup import (
        incremental_dedup_flags,
    )

    incremental_dedup_flags(
        _docs(spark), F.col("doc_id") % 2 == 0, num_hashes=8, bands=4
    ).collect()


def _op_triangles(spark):
    from formula1_dataengineering_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)], "u long, v long"
    )
    triangle_count(edges, "u", "v").collect()


def _op_pq(spark):
    from formula1_dataengineering_spark.operators.clustering import (
        pq_adc_topk,
    )

    pq_adc_topk(_vecs(spark), _vecs(spark).limit(2), m=2, k=2).collect()


def _op_bpe(spark):
    from formula1_dataengineering_spark.functions.text import (
        bpe_merge_symbol_stats,
    )

    bpe_merge_symbol_stats(_docs(spark), n_merges=2, top_k=5).collect()


def _op_connected_components(spark):
    from formula1_dataengineering_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (3, 4), (4, 5)], "a long, b long"
    )
    connected_components(edges, "a", "b").collect()


_OPS = {
    "minhash_lsh_pairs": _op_minhash,
    "ngram_jaccard_lsh": _op_ngram_jaccard,
    "semantic_dedup_drops": _op_semantic,
    "ppjoin_exact_jaccard": _op_ppjoin,
    "substring_match_pairs": _op_substring_pairs,
    "substring_duplicate_coverage": _op_substring_coverage,
    "incremental_dedup_flags": _op_incremental,
    "triangle_count": _op_triangles,
    "pq_adc_topk": _op_pq,
    "bpe_merge_symbol_stats": _op_bpe,
    "connected_components": _op_connected_components,
}


@pytest.mark.parametrize("name", sorted(_OPS))
def test_scope_releases_all_internal_caches(spark, name):
    """Running the operator through its PUBLIC API inside a
    cache_scope leaves the session's CacheManager empty afterwards."""
    spark.catalog.clearCache()
    release_caches()
    assert _cache_empty(spark)
    with cache_scope():
        _OPS[name](spark)
    assert _cache_empty(spark), f"{name} leaked cached relations"


def test_unscoped_run_drains_via_release_caches(spark):
    """Without a scope, internal caches land in the fallback registry;
    one release_caches(spark) call empties the CacheManager."""
    spark.catalog.clearCache()
    release_caches()
    _op_substring_pairs(spark)
    assert not _cache_empty(spark)  # the postings cache is live
    assert release_caches(spark) >= 1
    assert _cache_empty(spark)


def test_scope_releases_on_exception(spark):
    """A scope unwinding through an exception still unpersists
    everything registered inside it."""
    spark.catalog.clearCache()
    release_caches()
    with pytest.raises(RuntimeError):
        with cache_scope():
            managed_cache(_docs(spark)).collect()
            raise RuntimeError("boom")
    assert _cache_empty(spark)


def test_nested_scopes_are_lifo_and_independent(spark):
    """The inner scope releases only its own registrations; the outer
    scope owns the rest."""
    spark.catalog.clearCache()
    release_caches()
    with cache_scope():
        outer = managed_cache(_docs(spark))
        outer.collect()
        with cache_scope():
            managed_cache(_docs(spark).select("doc_id")).collect()
        # inner released, outer still cached
        assert not _cache_empty(spark)
    assert _cache_empty(spark)


def test_ppjoin_budget_abort_is_clean_even_unscoped(spark):
    """The candidate-budget abort path eagerly unpersists before
    raising; combined with release_caches the session ends clean."""
    from formula1_dataengineering_spark.operators.dedup import (
        ppjoin_exact_jaccard,
    )

    spark.catalog.clearCache()
    release_caches()
    with pytest.raises(ValueError):
        ppjoin_exact_jaccard(
            _docs(spark), threshold=0.5, candidate_budget=0
        ).collect()
    release_caches(spark)
    assert _cache_empty(spark)


def test_no_bare_cache_or_persist_in_package():
    """Source hygiene: every DataFrame cache in the package must go
    through managed_cache so it has an owner — a bare .cache()/
    .persist() call site is exactly the orphaned-relation bug class
    VERDICT r9 flagged. (caching.py itself holds the one real
    .cache() call; comments and docstrings are ignored.)"""
    import io
    import os
    import re
    import tokenize

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "formula1_dataengineering_spark",
    )
    offenders = []
    pat = re.compile(r"\.(cache|persist)\s*\(")
    for root, _, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            if fn == "caching.py":
                continue
            with open(path) as fh:
                src = fh.read()
            # strip comments/strings so documentation mentions don't trip
            code_parts = []
            for tok in tokenize.generate_tokens(io.StringIO(src).readline):
                if tok.type == tokenize.NAME or tok.type == tokenize.OP:
                    code_parts.append(tok.string)
                elif tok.type == tokenize.NEWLINE or tok.type == tokenize.NL:
                    code_parts.append("\n")
            code = "".join(code_parts)
            for i, line in enumerate(code.split("\n")):
                if pat.search(line):
                    offenders.append(f"{path}:{line.strip()[:60]}")
    assert not offenders, offenders


def test_session_scope_bypasses_active_scope(spark):
    """scope="session" registrations survive the enclosing scope's
    exit (the facade-memo lifetime, ADVICE r10) and drain only via
    release_caches."""
    spark.catalog.clearCache()
    release_caches()
    with cache_scope():
        pinned = managed_cache(_docs(spark), scope="session")
        pinned.collect()
    # Scope exited; the session-scoped frame must still be cached.
    lvl = pinned.storageLevel
    assert lvl.useMemory or lvl.useDisk
    assert release_caches(spark) >= 1
    assert _cache_empty(spark)


def test_facade_cache_survives_query_scope(spark, tmp_path):
    """The f1 facade's laps memo registers scope="session": a query-
    level cache_scope wrapping facade calls must not unpersist the
    handle the facade keeps serving (ADVICE r10), and release() is
    the owner-side cleanup."""
    import os

    from formula1_dataengineering_spark.f1.session_facade import F1Session

    base = str(tmp_path / "f1")
    os.makedirs(base)
    laps = spark.createDataFrame(
        [(1, 5, 2, "2024-01-01T00:00:00+00:00", 30.0, 31.0, 32.0, False)],
        "session_key int, driver_number int, lap_number int, "
        "date_start string, duration_sector_1 double, "
        "duration_sector_2 double, duration_sector_3 double, "
        "is_pit_out_lap boolean",
    )
    drivers = spark.createDataFrame(
        [(1, 5, "VER", "3671C6")],
        "session_key int, driver_number int, name_acronym string, "
        "team_colour string",
    )
    stints = spark.createDataFrame(
        [(1, 5, 1, 1, 10, "SOFT", 0)],
        "session_key int, driver_number int, stint_number int, "
        "lap_start int, lap_end int, compound string, "
        "tyre_age_at_start int",
    )
    sessions = spark.createDataFrame(
        [(1, "Race", "Spa", "Race")],
        "session_key int, session_type string, circuit_short_name string, "
        "session_name string",
    )
    tables = {
        "laps": laps,
        "drivers": drivers,
        "stints": stints,
        "sessions": sessions,
    }
    spark.catalog.clearCache()
    release_caches()
    sess = F1Session(spark, 1, tables)
    with cache_scope():
        handle = sess.laps()
        handle.collect()
    lvl = handle.storageLevel
    assert lvl.useMemory or lvl.useDisk  # scope exit did NOT degrade it
    sess.release()
    assert sess._laps_enriched is None
    release_caches(spark)
    assert _cache_empty(spark)


def test_fallback_registry_prunes_unpersisted_entries(spark):
    """Direct df.unpersist() by a caller must not leak a registry
    slot forever: once the bucket reaches its prune threshold, the
    next managed_cache registration drops dead entries and doubles
    the threshold (AMORTIZED — each liveness check is a py4j
    roundtrip under the global registry lock, so pruning on every
    registration would serialize concurrent driver threads on JVM
    latency; ADVICE r10 bounded growth + round-11 review)."""
    from formula1_dataengineering_spark import caching as C

    spark.catalog.clearCache()
    release_caches()
    old_min = C._PRUNE_MIN
    C._PRUNE_MIN = 2
    try:
        a = managed_cache(_docs(spark))
        a.collect()
        a.unpersist(blocking=True)  # owner released directly
        b = managed_cache(_docs(spark).select("doc_id"))
        b.collect()  # bucket now [dead a, b] — at the threshold
        c = managed_cache(_docs(spark).select("text"))
        c.collect()  # registration hits the threshold → prune runs
        key = C._session_key(b)
        with C._registry_lock:
            bucket = list(C._fallback.get(key, []))
            threshold = C._prune_at.get(key)
        # the dead `a` handle was pruned when `c` registered; the
        # live handles stay; the next prune point doubled away from
        # the live count
        assert all(f is not a for f in bucket)
        assert any(f is b for f in bucket)
        assert any(f is c for f in bucket)
        assert threshold == max(C._PRUNE_MIN, 2 * (len(bucket) - 1))
    finally:
        C._PRUNE_MIN = old_min
    release_caches(spark)
    assert _cache_empty(spark)
