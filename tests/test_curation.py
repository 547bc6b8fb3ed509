"""Invariant tests for the corpus-curation operators (the oracle
harness already hash-checks the gate queries; these pin the semantic
contracts on adversarial shapes the synthetic corpus doesn't hit)."""

from __future__ import annotations

from pyspark.sql import functions as F

from formula1_dataengineering_spark.operators.curation import (
    chunk_documents,
    contamination_overlap,
    pack_sequences,
    pack_sequences_global,
    quota_sample,
    scrub_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string, lang string")


def test_chunks_cover_every_token_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(150))
    out = chunk_documents(
        _docs(spark, [(1, text, "s", "en")]), chunk_size=64, stride=48
    ).orderBy("chunk_idx").collect()
    # stride starts 0/48/96; the 144 tail ([144,150)) is fully inside
    # the 96 chunk's coverage ([96,150)) and is suppressed as pure
    # duplicated text
    assert [r.start_token for r in out] == [0, 48, 96]
    assert [r.n_tokens for r in out] == [64, 64, 54]
    # full coverage: last chunk reaches the final token
    assert out[-1].start_token + out[-1].n_tokens == 150
    # consecutive chunks overlap by chunk_size - stride (except the tail)
    assert out[0].start_token + 64 - out[1].start_token == 16


def test_chunking_short_and_single_token_docs(spark):
    out = chunk_documents(
        _docs(spark, [(1, "only", "s", "en"), (2, "a b", "s", "en")]),
        chunk_size=4,
        stride=3,
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0].n_tokens == 1
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_tokens == 2


def test_packing_offsets_bounded_and_bins_monotone(spark):
    rows = [(i, " ".join(["t"] * (37 + 13 * (i % 7))), f"s{i % 3}", "en") for i in range(60)]
    # shard_width=5 forces the two-phase within-partition prefix path
    out = pack_sequences(_docs(spark, rows), budget=100, part_col="source", shard_width=5)
    pdf = out.orderBy("source", "doc_id").toPandas()
    assert (pdf["bin_offset"] < 100).all() and (pdf["bin_offset"] >= 0).all()
    for _, grp in pdf.groupby("source"):
        # bins increase monotonically in doc order and never skip by
        # more than the doc's own token span
        bins = grp["bin_id"].to_numpy()
        assert (bins[1:] >= bins[:-1]).all()
        # offset equals previous cumulative tokens mod budget
        cum = grp["n_tokens"].cumsum().shift(1).fillna(0).astype(int)
        assert (grp["bin_offset"].to_numpy() == (cum % 100).to_numpy()).all()
        assert (grp["bin_id"].to_numpy() == (cum // 100).to_numpy()).all()


def test_contamination_flags_exact_copy_and_clean_doc(spark):
    eval_text = " ".join(f"e{i}" for i in range(20))
    clean_text = " ".join(f"c{i}" for i in range(20))
    docs = _docs(
        spark,
        [
            (0, eval_text, "s", "en"),       # eval member (0 % 97 == 0)
            (1, eval_text, "s", "en"),       # verbatim copy → contaminated
            (2, clean_text, "s", "en"),      # disjoint vocab → clean
            (3, eval_text + " tail", "s", "en"),  # superset → contaminated
        ],
    )
    out = {
        r.doc_id: r
        for r in contamination_overlap(docs, F.col("doc_id") % 97 == 0, k=8).collect()
    }
    assert set(out) == {1, 2, 3}  # eval rows excluded from the output
    assert out[1].contaminated and out[1].n_shared_grams == 13  # 20-8+1
    assert not out[2].contaminated and out[2].n_shared_grams == 0
    assert out[3].contaminated


def test_quota_sample_deterministic_and_bounded(spark):
    rows = [(i, "x", "s", f"l{i % 4}") for i in range(100)]
    a = quota_sample(_docs(spark, rows), "lang", 5, "doc_id").collect()
    b = quota_sample(_docs(spark, rows), "lang", 5, "doc_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_lang = {}
    for r in a:
        per_lang.setdefault(r.lang, []).append(r.sample_rank)
    assert all(sorted(v) == list(range(1, 6)) for v in per_lang.values())


def test_scrub_stats_token_accounting(spark):
    docs = _docs(
        spark,
        [
            (1, "the quick fox and the dog", "s1", "en"),
            (2, "a a a", "s1", "en"),
            (3, "no stop words here", "s2", "en"),
        ],
    )
    out = {r.source: r for r in scrub_stats(docs, ["the", "a", "of", "and", "to"]).collect()}
    s1 = out["s1"]
    assert (s1.n_docs, s1.total_tokens, s1.kept_tokens, s1.removed_tokens) == (2, 9, 3, 6)
    assert s1.kept_chars == len("quickfoxdog")
    s2 = out["s2"]
    assert (s2.kept_tokens, s2.removed_tokens, s2.kept_chars) == (4, 0, len("nostopwordshere"))


def test_global_packing_matches_naive_global_window(spark):
    from pyspark.sql import Window

    rows = [(i, " ".join(["t"] * (29 + 17 * (i % 5))), f"s{i % 4}", "en") for i in range(80)]
    docs = _docs(spark, rows)
    # shard_width=7 forces many id-range shards per source, so the
    # cross-shard offset phase is genuinely exercised
    out = pack_sequences_global(
        docs, budget=100, part_col="source", shard_width=7
    ).toPandas()
    # Naive single-partition reference implementation.
    n = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = Window.orderBy("source", "doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = (
        n.withColumn("cum_prev", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            "doc_id",
            (F.col("cum_prev") / 100).cast("int").alias("bin_id"),
            (F.col("cum_prev") % 100).cast("int").alias("bin_offset"),
        )
        .toPandas()
    )
    merged = out.merge(naive, on="doc_id", suffixes=("", "_naive"))
    assert (merged["bin_id"] == merged["bin_id_naive"]).all()
    assert (merged["bin_offset"] == merged["bin_offset_naive"]).all()


def test_incremental_merge_collapses_batch_duplicates(spark):
    """Within-batch content duplicates collapse to the min doc_id, and
    batch content already in the base never re-enters (the catalog
    query pins the same semantics against its oracle; this pins them
    on an explicit fixture where the synthetic corpus may not)."""
    from formula1_dataengineering_spark.operators.dedup import portable_term_id

    docs = _docs(
        spark,
        [
            (1, "seen before", "s", "en"),     # base
            (2, "unique base", "s", "en"),     # base
            (0, "seen before", "s", "en"),     # batch: dup of base → drop
            (11, "brand new", "s", "en"),      # batch: novel → keep
            (22, "brand new", "s", "en"),      # batch: dup of 11 → drop
            (33, "also new", "s", "en"),       # batch: novel → keep
        ],
    )
    d = docs.select("doc_id", "source", portable_term_id(F.col("text")).alias("__h"))
    batch = d.where(F.col("doc_id") % 11 == 0)
    base = d.where(F.col("doc_id") % 11 != 0)
    canon = (
        batch.groupBy("__h")
        .agg(F.min_by(F.struct("doc_id", "source"), F.col("doc_id")).alias("__m"))
        .select(F.col("__m.doc_id").alias("doc_id"), "__h")
    )
    fresh = canon.join(base.select("__h").distinct(), "__h", "left_anti")
    kept = sorted(r.doc_id for r in fresh.collect())
    assert kept == [11, 33]


def test_pii_scrub_redacts_and_counts(spark):
    from formula1_dataengineering_spark.operators.curation import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail a.b-c%d@ex-ample.co.uk here"),
            (2, "ip 192.168.0.1 and 10.0.0.255 twice"),
            (3, "call +491711234567 now"),
            (4, "clean text only"),
            (5, None),
            (6, "x@y.io plus 1.2.3.4 plus +123456789"),
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert rows[1].text == "mail <EMAIL> here"
    assert (rows[1].n_email, rows[1].n_ipv4, rows[1].n_phone) == (1, 0, 0)
    assert rows[1].chars_redacted == len("a.b-c%d@ex-ample.co.uk")
    assert rows[2].text == "ip <IPV4> and <IPV4> twice"
    assert rows[2].n_ipv4 == 2
    assert rows[3].text == "call <PHONE> now"
    assert rows[3].n_phone == 1
    assert rows[4].text == "clean text only" and rows[4].chars_redacted == 0
    assert rows[5].text is None and rows[5].n_email is None
    assert (rows[6].n_email, rows[6].n_ipv4, rows[6].n_phone) == (1, 1, 1)


def test_pii_scrub_boundaries(spark):
    """Span-shape guards, pinned: short +digits and 1-letter TLDs
    never match; a version string like 1.2.3.4.5 over-matches its
    first four octets (\\b holds between digit and dot — documented,
    RE2-portable behavior; over-redaction is the safe direction for
    PII, and lookbehind would break the DuckDB oracle dialect)."""
    from formula1_dataengineering_spark.operators.curation import pii_scrub

    df = spark.createDataFrame(
        [(1, "ver 1.2.3.4.5 end"), (2, "+12345678 short"), (3, "a@b.c tld-too-short")],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert rows[1].n_ipv4 == 1 and rows[1].text == "ver <IPV4>.5 end"
    assert rows[2].n_phone == 0  # 8 digits < 9 minimum
    assert rows[3].n_email == 0  # single-letter TLD rejected


def test_span_dedup_first_occurrence_wins_and_rebuild(spark):
    from formula1_dataengineering_spark.operators.curation import span_dedup

    # spans of 2 tokens; doc 1 = [a b][c d]; doc 2 repeats [a b] then
    # unique [e f]; doc 3 is entirely doc 1's content (fully dropped);
    # doc 4 has a tail span shorter than span_tokens; doc 5 NULL text
    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b e f"),
            (3, "c d a b"),
            (4, "g h i"),
            (5, None),
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in span_dedup(df, span_tokens=2).collect()}
    assert rows[1].text == "a b c d" and rows[1].kept_spans == 2
    # doc 2: "a b" already seen at (1,0) -> only "e f" survives
    assert rows[2].text == "e f" and (rows[2].n_spans, rows[2].kept_spans) == (2, 1)
    # doc 3: both spans duplicated -> no text
    assert rows[3].text is None and rows[3].kept_spans == 0
    # doc 4: short tail span kept verbatim
    assert rows[4].text == "g h i" and rows[4].n_spans == 2
    assert rows[5].text is None and rows[5].n_spans is None and rows[5].kept_spans == 0


def test_span_dedup_span_identity_is_content_not_position(spark):
    """The same 2-token content at different offsets is the same span;
    differently-grouped content is not (span cut points matter)."""
    from formula1_dataengineering_spark.operators.curation import span_dedup

    df = spark.createDataFrame(
        [(1, "x y z w"), (2, "q x y z")],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in span_dedup(df, span_tokens=2).collect()}
    # doc2's spans are [q x][y z] — "x y" of doc1 is NOT the same span
    assert rows[1].kept_spans == 2 and rows[2].kept_spans == 2


def test_bloom_decontaminate_matches_exact_join_at_low_fill(spark):
    """With a roomy filter (fill ≈ 0) the bloom path must agree with
    the exact-join path on every contamination flag, and never miss a
    true overlap (one-sided guarantee)."""
    from formula1_dataengineering_spark.operators.curation import (
        bloom_decontaminate,
        contamination_overlap,
    )

    eval_text = " ".join(f"e{i}" for i in range(20))
    docs = _docs(
        spark,
        [
            (0, eval_text, "s", "en"),                 # eval member
            (1, eval_text, "s", "en"),                 # copy → contaminated
            (2, " ".join(f"c{i}" for i in range(20)), "s", "en"),  # clean
            (3, eval_text + " tail", "s", "en"),       # superset → contaminated
            (4, None, "s", "en"),                      # null text → checked, clean
        ],
    )
    pred = F.col("doc_id") % 97 == 0
    bloom = {
        r.doc_id: r
        for r in bloom_decontaminate(
            docs, pred, k=8, num_bits=1 << 20, num_hashes=4
        ).collect()
    }
    exact = {
        r.doc_id: r for r in contamination_overlap(docs, pred, k=8).collect()
    }
    assert set(bloom) == set(exact) == {1, 2, 3, 4}
    for d in exact:
        assert bloom[d].contaminated == exact[d].contaminated, d
        # one-sided: bloom flags at least the true overlaps
        assert bloom[d].n_flagged >= exact[d].n_shared_grams
    assert bloom[1].n_grams == 13 and bloom[1].n_flagged == 13
    assert bloom[4].n_grams == 0 and not bloom[4].contaminated


def test_bloom_decontaminate_saturated_filter_flags_everything(spark):
    """Degenerate regime pinned: a 2-bit filter saturates and every
    gram goes bloom-positive — deterministic false positives, never an
    error or a missed true positive (also covers the sub-byte bitset
    allocation)."""
    from formula1_dataengineering_spark.operators.curation import bloom_decontaminate

    docs = _docs(
        spark,
        [(0, " ".join(f"e{i}" for i in range(12)), "s", "en"),
         (1, " ".join(f"x{i}" for i in range(12)), "s", "en")],
    )
    out = {
        r.doc_id: r
        for r in bloom_decontaminate(
            docs, F.col("doc_id") == 0, k=8, num_bits=2, num_hashes=2
        ).collect()
    }
    assert out[1].contaminated and out[1].n_flagged == out[1].n_grams == 5


def test_pii_scrub_sequential_overlap_accounting(spark):
    """An email span that swallows an embedded phone-shaped run is
    counted as ONE email and ZERO phones: each kind is measured on the
    text as it stands when that kind runs, so the audit matches the
    emitted tokens and chars_redacted never exceeds the input."""
    from formula1_dataengineering_spark.operators.curation import pii_scrub

    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "+123456789@example.com"), (2, "a@b.co and +123456789")],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert rows[1].text == "<EMAIL>"
    assert (rows[1].n_email, rows[1].n_phone) == (1, 0)
    assert rows[1].chars_redacted == len("+123456789@example.com")
    # disjoint spans still both fire
    assert (rows[2].n_email, rows[2].n_phone) == (1, 1)
    assert rows[2].text == "<EMAIL> and <PHONE>"
    with _pytest.raises(ValueError, match="at least one pattern"):
        pii_scrub(df, patterns={})


def test_token_budget_sample_matches_naive_and_overshoots_by_less_than_one_doc(spark):
    from pyspark.sql import Window

    from formula1_dataengineering_spark.operators.curation import token_budget_sample

    rows = [
        (i, " ".join(["t"] * (11 + 7 * (i % 5))), "s", f"l{i % 3}")
        for i in range(90)
    ]
    docs = _docs(spark, rows)
    out = token_budget_sample(docs, part_col="lang", token_budget=120).toPandas()
    # naive single-window reference
    n = docs.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("hk"),
    )
    w = Window.partitionBy("lang").orderBy("hk", "doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    naive = (
        n.withColumn("cum", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .where(F.col("cum") < 120)
        .toPandas()
    )
    assert sorted(out["doc_id"]) == sorted(naive["doc_id"])
    for _, grp in out.groupby("lang"):
        total = (grp["n_tokens"]).sum()
        # budget respected up to the straddling doc: admitted-before
        # tokens < budget for every kept doc, and the total overshoots
        # by less than the last doc
        assert (grp["cum_prev_tokens"] < 120).all()
        assert total - grp["n_tokens"].max() < 120 <= total + grp["n_tokens"].max()


def test_packing_shard_key_exact_for_huge_ids(spark):
    """Round-2 ADVICE: ids beyond 2^53 (the xxhash64-id regime the
    operator itself recommends) must shard by EXACT integer division —
    float division rounds boundary ids into the neighboring shard,
    breaking the contiguous-id-range invariant the two-phase prefix
    sum depends on. Oracle: single-partition global cumsum in pandas."""
    import pandas as pd

    from formula1_dataengineering_spark.operators.curation import (
        pack_sequences_global,
    )

    base = (1 << 60) + (1 << 53)
    # ids straddle a 2^40-wide shard boundary with ±1 offsets that a
    # double cannot represent distinctly at this magnitude
    ids = [base - 1, base, base + 1, base + (1 << 40) - 1, base + (1 << 40)]
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ids,
                "source": ["a"] * len(ids),
                "text": [" ".join(["w"] * (i + 1)) for i in range(len(ids))],
            }
        )
    )
    out = (
        pack_sequences_global(docs, budget=4, part_col="source")
        .orderBy("doc_id")
        .toPandas()
    )
    # oracle: exact global prefix sum over ids ascending
    toks = [i + 1 for i in range(len(ids))]
    prev = 0
    for row, n in zip(out.itertuples(), toks):
        assert row.n_tokens == n
        assert row.bin_id == prev // 4
        assert row.bin_offset == prev % 4
        prev += n


def test_observed_quality_counters_free_with_action(spark):
    """observe() metrics arrive with the action itself — exact counts,
    no second scan."""
    from formula1_dataengineering_spark.operators.curation import (
        observed_quality_counters,
    )

    docs = spark.createDataFrame(
        [(1, "ab"), (2, None), (3, ""), (4, "xyz")],
        "doc_id long, text string",
    )
    observed, obs = observed_quality_counters(docs)
    kept = observed.where("text IS NOT NULL").count()
    assert kept == 3
    m = obs.get
    assert m["n_rows"] == 4
    assert m["n_null_text"] == 1
    assert m["n_empty_text"] == 1
    assert m["total_chars"] == 5


def test_udtf_window_chunks_variable_rows_and_edges(spark):
    """Python UDTF surface (spark.udtf.register + LATERAL): variable
    rows per doc, NULL/empty-text docs emit nothing, multi-whitespace
    splits like the \\s+ contract, exact-multiple docs get no empty
    tail chunk, and the plan is Arrow-batched and shuffle-free."""
    from formula1_dataengineering_spark.operators.curation import (
        make_window_chunks_udtf,
    )

    spark.udtf.register("window_chunks_t", make_window_chunks_udtf())
    _docs(
        spark,
        [
            (1, " ".join(f"w{i}" for i in range(7)), "s", "en"),
            (2, None, "s", "en"),
            (3, "", "s", "en"),
            (4, "a  b\tc", "s", "en"),  # multi-space + tab
            (5, " ".join(f"w{i}" for i in range(6)), "s", "en"),
        ],
    ).createOrReplaceTempView("udtf_docs_t")
    df = spark.sql(
        "SELECT d.doc_id, c.* FROM udtf_docs_t d, "
        "LATERAL window_chunks_t(d.text, 3) c"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPythonUDTF" in plan
    assert "Exchange" not in plan
    rows = sorted(
        (r.doc_id, r.chunk_no, r.start_token, r.chunk_text, r.n_tokens)
        for r in df.collect()
    )
    assert rows == [
        (1, 1, 0, "w0 w1 w2", 3),
        (1, 2, 3, "w3 w4 w5", 3),
        (1, 3, 6, "w6", 1),
        (4, 1, 0, "a b c", 3),
        (5, 1, 0, "w0 w1 w2", 3),
        (5, 2, 3, "w3 w4 w5", 3),  # exact multiple: no empty tail
    ]


def test_substring_match_pairs_known_runs(spark):
    """Hand-computed exact-substring matches: a 6-token verbatim run
    shared by docs 1 and 2 (k=4 → 3 consecutive k-gram matches on one
    diagonal → longest = 3 + 4 - 1 = 6), a disjoint 4-token run shared
    by docs 1 and 3, and no pair for doc 4."""
    from formula1_dataengineering_spark.operators.dedup import (
        substring_match_pairs,
    )

    run6 = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"intro {run6} outro one two"),
            (2, f"completely different start {run6}"),
            (3, "x y alpha beta gamma delta q r s t u v"),
            (4, "nothing shared here at all with anyone else ok"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_a"], r["doc_b"]): (
            r["longest_match_tokens"],
            r["n_shared_kgrams"],
        )
        for r in substring_match_pairs(docs, k=4).collect()
    }
    # doc1/doc2 share the 6-token run: 3 k-grams, longest 6
    # doc1/doc3 share "alpha beta gamma delta": 1 k-gram, longest 4
    # doc2/doc3 share it too (it is a prefix of run6)
    assert out[(1, 2)] == (6, 3)
    assert out[(1, 3)] == (4, 1)
    assert out[(2, 3)] == (4, 1)
    assert len(out) == 3


def test_substring_match_pairs_df_cap(spark):
    """The max_df anchor cap drops boilerplate k-grams: a 4-gram
    present in all 4 docs disappears at max_df=3, so only the pair
    sharing a rarer run survives."""
    from formula1_dataengineering_spark.operators.dedup import (
        substring_match_pairs,
    )

    boiler = "all rights reserved worldwide"
    rare = "unique quarterly revenue statement"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} a b c"),
            (2, f"{boiler} d e f"),
            (3, f"{boiler} {rare}"),
            (4, f"{boiler} junk {rare}"),
        ],
        "doc_id long, text string",
    )
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in substring_match_pairs(docs, k=4, max_df=3).collect()
    }
    assert capped == {(3, 4)}
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in substring_match_pairs(docs, k=4).collect()
    }
    assert uncapped == {(i, j) for i in range(1, 5) for j in range(i + 1, 5)}


def test_substring_family_verify_text_mode_agrees(spark):
    """The dictionary-encoded (dual-xxhash64) candidate join and the
    fully-exact ``verify_text=True`` audit mode (gram text carried
    through the shuffle and string-compared post-join) produce
    IDENTICAL output on a real corpus slice — the collision-bound
    argument made observable. Runs both public operators, with and
    without the df cap, over sf0.001 documents."""
    from formula1_dataengineering_spark.operators.dedup import (
        substring_duplicate_coverage,
        substring_match_pairs,
    )
    from formula1_dataengineering_spark.sources.catalog import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    for cap in (None, 20):
        fast = sorted(
            map(tuple, substring_match_pairs(docs, k=8, max_df=cap).collect())
        )
        exact = sorted(
            map(
                tuple,
                substring_match_pairs(
                    docs, k=8, max_df=cap, verify_text=True
                ).collect(),
            )
        )
        assert fast == exact and len(fast) > 0
    fast_cov = sorted(
        map(tuple, substring_duplicate_coverage(docs, k=8).collect())
    )
    exact_cov = sorted(
        map(
            tuple,
            substring_duplicate_coverage(
                docs, k=8, verify_text=True
            ).collect(),
        )
    )
    assert fast_cov == exact_cov and len(fast_cov) > 0


def test_parse_fields_udtf_analyze_contracts(spark):
    """analyze()-UDTF contracts: schema derives from the constant
    names argument (polymorphic across invocations), short rows pad
    with NULL, long rows truncate, NULL lines emit nothing, and a
    NON-constant names argument fails at PLAN time."""
    from pyspark.sql.utils import AnalysisException

    from formula1_dataengineering_spark.operators.curation import (
        make_parse_fields_udtf,
    )

    spark.udtf.register("parse_fields", make_parse_fields_udtf())
    spark.createDataFrame(
        [("a|b|c",), ("x|y",), ("p|q|r|s",), (None,)], "line string"
    ).createOrReplaceTempView("v_pf_lines")

    df3 = spark.sql(
        "SELECT p.* FROM v_pf_lines t, "
        "LATERAL parse_fields(t.line, 'c1,c2,c3') p"
    )
    assert df3.columns == ["c1", "c2", "c3"]
    rows = sorted(
        (tuple(r) for r in df3.collect()), key=lambda t: str(t)
    )
    assert ("a", "b", "c") in rows
    assert ("x", "y", None) in rows  # short row pads
    assert ("p", "q", "r") in rows  # long row truncates
    assert len(rows) == 3  # NULL line emitted nothing

    df2 = spark.sql(
        "SELECT p.* FROM v_pf_lines t, "
        "LATERAL parse_fields(t.line, 'k1,k2') p"
    )
    assert df2.columns == ["k1", "k2"]  # same UDTF, new schema

    import pytest

    with pytest.raises(AnalysisException):
        # non-constant names: analyze() raises at plan time
        spark.sql(
            "SELECT p.* FROM v_pf_lines t, "
            "LATERAL parse_fields(t.line, t.line) p"
        ).collect()


def test_substring_duplicate_coverage_known(spark):
    """Hand-computed coverage: docs 1/2 share a 6-token run (k=4 →
    covered = 6 tokens each); doc 1 additionally shares a disjoint
    4-token run with doc 3. Interval union must not double-count
    overlapping starts."""
    from formula1_dataengineering_spark.operators.dedup import (
        substring_duplicate_coverage,
    )

    run6 = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"intro {run6} unique1 mid omega psi chi phi tail1"),
            (2, f"start2 begin2 {run6} tail2 x2 y2"),
            (3, "a3 b3 omega psi chi phi c3 d3 e3 f3"),
            (4, "no shared content at all in this document four"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_coverage"])
        for r in substring_duplicate_coverage(docs, k=4).collect()
    }
    # doc 1: 14 tokens; covered = run6 (6) + "omega psi chi phi" (4)
    assert out[1] == (14, 10, round(10 / 14, 6))
    # doc 2: 11 tokens; covered = run6 only
    assert out[2] == (11, 6, round(6 / 11, 6))
    # doc 3: 10 tokens; covered = the 4-token run
    assert out[3] == (10, 4, 0.4)
    assert 4 not in out


def test_partition_stats_udtf_ordered_routing(spark):
    """TABLE-argument UDTF: PARTITION BY routes each group to one
    instance, ORDER BY feeds rows in order — the longest-increasing-run
    statistic detects any misordering."""
    from formula1_dataengineering_spark.operators.curation import (
        make_partition_stats_udtf,
    )

    spark.udtf.register("partition_stats_t", make_partition_stats_udtf())
    spark.createDataFrame(
        [
            ("a", 1, 10), ("a", 2, 20), ("a", 3, 15),
            ("a", 4, 16), ("a", 5, 30),
            ("b", 1, 5), ("b", 2, 5),
        ],
        "source string, doc_id long, n_chars long",
    ).createOrReplaceTempView("v_ps_docs")
    rows = {
        r["source"]: (
            r["n_docs"], r["total_chars"], r["longest_increasing_run"]
        )
        for r in spark.sql(
            "SELECT * FROM partition_stats_t("
            "TABLE(v_ps_docs) PARTITION BY source ORDER BY doc_id)"
        ).collect()
    }
    # a: runs are [10,20], [15,16,30] → longest 3; b: ties reset → 1
    assert rows["a"] == (5, 91, 3)
    assert rows["b"] == (2, 10, 1)
