"""BPE encode (apply-the-trained-merges, VERDICT r9 item 5): exact
hand-computed encodings, the n_merges=0 identity, and monotonicity of
the encoded token count in the merge budget."""

from __future__ import annotations

from pyspark.sql import functions as F


def _counts(spark, texts, n_merges):
    from formula1_dataengineering_spark.functions.text import (
        bpe_encode_token_counts,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r["doc_id"]: (r["n_words"], r["bpe_tokens"])
        for r in bpe_encode_token_counts(docs, n_merges=n_merges).collect()
    }


def test_hand_computed_merge(spark):
    """Corpus 'aa aa aaa': the only pair is (a,a) (overlapping
    occurrences counted: freq-weighted count 4), so merge 1 is aa.
    'aa' encodes to 1 symbol; 'aaa' to 2 (the double-replace contract
    consumes the shared boundary — deterministic positional choice for
    equal-symbol runs, replayed identically by the oracle)."""
    out = _counts(spark, ["aa aa aaa"], n_merges=1)
    assert out[0] == (3, 1 + 1 + 2)


def test_zero_merges_is_character_count(spark):
    """With no merges every word stays fully split: bpe_tokens equals
    the summed word lengths."""
    texts = ["alpha beta", "gg hhh"]
    out = _counts(spark, texts, n_merges=0)
    assert out[0] == (2, len("alpha") + len("beta"))
    assert out[1] == (2, 2 + 3)


def test_more_merges_never_increase_token_count(spark):
    """Each merge round can only fuse symbols: per-doc bpe_tokens is
    non-increasing in n_merges, and n_words is merge-invariant."""
    texts = [
        "the cat sat on the mat",
        "the bat and the rat chat",
        "concatenation station nation",
    ]
    prev = None
    for n in range(4):
        cur = _counts(spark, texts, n_merges=n)
        if prev is not None:
            for d in cur:
                assert cur[d][0] == prev[d][0]
                assert cur[d][1] <= prev[d][1]
        prev = cur


def test_trainer_and_stats_share_one_tokenizer(spark):
    """_bpe_train's merge list drives bpe_merge_symbol_stats' final
    vocabulary: applying the returned merges via bpe_apply_merges to
    the raw vocab reproduces the trained symbol strings."""
    from formula1_dataengineering_spark.functions.text import (
        _bpe_train,
        bpe_apply_merges,
        tokens,
    )

    docs = spark.createDataFrame(
        [(0, "ref ref referee"), (1, "free reef ref")],
        "doc_id long, text string",
    )
    merges, wf_final, wf0 = _bpe_train(docs, "text", 2)
    wf0.unpersist()
    assert len(merges) == 2
    trained = sorted(r["s"] for r in wf_final.select("s").collect())
    reapplied = sorted(
        r["s"]
        for r in docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .distinct()
        .select(bpe_apply_merges(F.col("w"), merges).alias("s"))
        .collect()
    )
    assert trained == reapplied
