"""DuckDB oracle SQL — one entry per key in ``queries.QUERIES``.

Each statement computes the *same relation with the same column names*
as the Spark query, over the driver's pre-registered parquet views.
Canonicalization contract (shared with queries.py):

- float aggregates rounded at the same precision on both sides;
- timestamps exported as epoch-microsecond bigints (``epoch_us`` here,
  ``unix_micros`` in Spark);
- integer-family outputs cast so DuckDB's HUGEINT sums / BIGINT
  row_numbers match Spark's longs/ints;
- every ranking has the same total order on both sides.
"""

from __future__ import annotations

ORACLE_SQL: dict[str, str] = {}


def _qsum(expr: str, in_dp: int, out_dp: int = 2) -> str:
    """Order-independent ``round(sum(expr), out_dp)`` for fixed-point
    money expressions carrying ``in_dp`` decimal places — the oracle
    half of functions/exactsum.py (round-7 cent-flip rule): quantize
    each row to its exact integer unit count, sum as HUGEINT (exact in
    any order), divide back once. Delegates to the shared
    ``exactsum.qsum_sql`` emitter so the Spark-SQL gates and the
    oracles can never drift. Keep ``expr`` textually parallel to the
    DataFrame expression so the per-row doubles are bit-identical.
    """
    from ..functions.exactsum import qsum_sql

    return qsum_sql(expr, in_dp, out_dp, acc="HUGEINT")

ORACLE_SQL["pricing_summary"] = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       {_qsum("l_extendedprice", 2)}                                   AS sum_base_price,
       {_qsum("l_extendedprice * (1 - l_discount)", 4)}                AS sum_disc_price,
       {_qsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)}  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 4)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

ORACLE_SQL["revenue_by_nation"] = f"""
SELECT r_name, n_name,
       {_qsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""

ORACLE_SQL["order_priority_buckets"] = f"""
SELECT o_orderpriority,
       CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 150000 THEN 'mid'
            ELSE 'high' END AS price_bucket,
       count(*) AS n_orders,
       {_qsum("o_totalprice", 2)} AS total_price
FROM orders
GROUP BY 1, 2
"""

ORACLE_SQL["distinct_flag_status"] = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""

ORACLE_SQL["rollup_priority_status"] = f"""
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_orders,
       {_qsum("o_totalprice", 2)} AS total_price
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""

ORACLE_SQL["pivot_returnflag_status"] = """
SELECT l_returnflag,
       round(avg(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS avg_qty_open,
       round(avg(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS avg_qty_filled
FROM lineitem
GROUP BY l_returnflag
"""

ORACLE_SQL["unpivot_part_measures"] = """
SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS value FROM part
"""

ORACLE_SQL["cheapest_order_per_customer"] = """
SELECT o_custkey, o_orderkey, o_totalprice, o_orderpriority
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC) AS rk
  FROM orders
)
WHERE rk = 1
"""

ORACLE_SQL["top5_orders_per_segment"] = """
SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice, row_number() OVER (
    PARTITION BY c.c_mktsegment ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS rk
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
WHERE rk <= 5
"""

ORACLE_SQL["priority_grid"] = """
WITH filtered AS (
  SELECT * FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
), ranked AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice, row_number() OVER (
    PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM filtered
), counts AS (
  SELECT o_orderpriority, count(*) AS n,
         CASE o_orderpriority WHEN '1-URGENT' THEN 0 WHEN '2-HIGH' THEN 1 ELSE 2 END AS ord
  FROM filtered GROUP BY 1
), offsets AS (
  SELECT o_orderpriority,
         COALESCE(SUM(n) OVER (ORDER BY ord
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM counts
)
SELECT CAST(off + rk AS INTEGER) AS grid_position,
       o_orderkey, o_orderpriority, o_totalprice
FROM ranked JOIN offsets USING (o_orderpriority)
"""

ORACLE_SQL["running_revenue_per_supplier"] = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)) OVER (
         PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100, 2) AS running_revenue
FROM lineitem
WHERE l_suppkey <= 3
"""

ORACLE_SQL["value_delta_per_user"] = """
SELECT event_id, user_id,
       round(value - lag(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id), 2) AS value_delta
FROM events
"""

ORACLE_SQL["sessionize_events"] = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM sessions GROUP BY user_id
"""

ORACLE_SQL["interval_join_user_cohort"] = """
SELECT r.r_name AS cohort, e.event_type,
       count(*) AS n_events, round(sum(e.value), 2) AS total_value
FROM events e
JOIN region r
  ON e.user_id BETWEEN r.r_regionkey * 30 AND r.r_regionkey * 30 + 29
GROUP BY 1, 2
"""

ORACLE_SQL["asof_backward_purchase"] = """
WITH views AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
), purchases AS (
  -- greatest-payload dedup per (user, ts): DuckDB's ASOF JOIN is
  -- tie-ambiguous when several right rows share a timestamp; the
  -- Spark operator's documented winner is the greatest payload tuple
  -- (here: max purchase_id). No-op on tie-free data, deterministic
  -- under replication (the 10x/100x correctness drives).
  SELECT user_id, ts, max(event_id) AS purchase_id,
         arg_max(value, event_id) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT v.event_id, v.user_id, epoch_us(v.ts) AS ts_us,
       p.purchase_id, round(p.purchase_value, 2) AS purchase_value,
       epoch_us(p.ts) AS purchase_ts_us
FROM views v
ASOF LEFT JOIN purchases p ON v.user_id = p.user_id AND v.ts >= p.ts
"""

ORACLE_SQL["asof_nearest_error"] = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), errors AS (
  -- greatest-payload tie dedup (see asof_backward_purchase note)
  SELECT user_id, ts, max(event_id) AS error_id
  FROM events WHERE event_type = 'error' GROUP BY user_id, ts
), bwd AS (
  SELECT c.event_id, c.user_id, c.ts, e.error_id AS b_id, e.ts AS b_ts
  FROM clicks c ASOF LEFT JOIN errors e ON c.user_id = e.user_id AND c.ts >= e.ts
), fwd AS (
  SELECT c.event_id, e.error_id AS f_id, e.ts AS f_ts
  FROM clicks c ASOF LEFT JOIN errors e ON c.user_id = e.user_id AND c.ts <= e.ts
)
SELECT b.event_id, b.user_id, epoch_us(b.ts) AS ts_us,
       CASE WHEN b_id IS NOT NULL AND (f_id IS NULL OR (b.ts - b_ts) <= (f_ts - b.ts))
            THEN b_id ELSE f_id END AS error_id,
       CASE WHEN b_id IS NOT NULL AND (f_id IS NULL OR (b.ts - b_ts) <= (f_ts - b.ts))
            THEN epoch_us(b_ts) ELSE epoch_us(f_ts) END AS error_ts_us
FROM bwd b JOIN fwd f USING (event_id)
"""

ORACLE_SQL["customers_without_orders"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""

ORACLE_SQL["segment_active_customers"] = """
SELECT c_mktsegment, count(*) AS n_active_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
"""

ORACLE_SQL["customer_has_big_order"] = """
SELECT o_custkey,
       count(CASE WHEN o_totalprice > 150000 THEN 1 END) > 0 AS has_big_order,
       count(*) AS n_orders
FROM orders GROUP BY 1
"""

ORACLE_SQL["union_hot_cold_items"] = """
SELECT l_orderkey, l_linenumber, 'hot' AS slice FROM lineitem WHERE l_quantity >= 45
UNION ALL
SELECT l_orderkey, l_linenumber, 'cold' AS slice FROM lineitem WHERE l_quantity <= 5
"""

ORACLE_SQL["format_order_runtime"] = """
SELECT o_orderkey,
       round(o_totalprice / 1000.0, 3) AS runtime_s,
       CAST(FLOOR(ms / 60000) AS BIGINT)::VARCHAR || ':' ||
       lpad(CAST(FLOOR((ms % 60000) / 1000) AS BIGINT)::VARCHAR, 2, '0') || '.' ||
       lpad(CAST(ms % 1000 AS BIGINT)::VARCHAR, 3, '0') AS runtime_fmt
FROM (SELECT *, CAST(round(o_totalprice / 1000.0 * 1000) AS BIGINT) AS ms FROM orders)
"""

ORACLE_SQL["events_tumbling_5min"] = """
SELECT CAST(FLOOR(epoch_us(ts) / 300000000) * 300 AS BIGINT) AS window_start_s,
       event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""

# --------------------------------------------------------------------------
# Training-data pipeline oracles. The minhash/simhash statements are
# generated from the same hash-family parameters the Spark operators use
# (dedup.MERSENNE_P, a_i = 2i+1, b_i = 7+3i) so signatures match exactly.
# --------------------------------------------------------------------------

ORACLE_SQL["dedup_exact_docs"] = """
SELECT min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY text
"""

_P = 2147483647
_H = 12
_BANDS = 4
_R = _H // _BANDS

# Inline portable term id, mirroring dedup.portable_term_id: low 48
# bits of the little-endian md5 digest, mod P. DuckDB's md5_number is
# the SIGNED little-endian HUGEINT of the digest, so the 2^48 modulo
# needs the double-mod to stay non-negative.
_M48 = 281474976710656  # 2^48


def _tid(expr: str) -> str:
    return (
        f"CAST((((md5_number({expr}) % {_M48}) + {_M48}) % {_M48})"
        f" % {_P} AS BIGINT)"
    )


# Canonical whitespace tokenizer fragments (VERDICT r5 item 8): one
# definition shared by every text/dedup-family oracle, so the
# tokenization contract exists in exactly one place on the DuckDB
# side (mirrors functions/text.tokens on the Spark side). _TOKSA is
# the alnum-run variant (mirrors text.alnum_tokens).
_TOKS = "list_filter(string_split_regex(text, '\\s+'), t -> t != '')"
_TOKSL = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')"
#: heuristic lang-ID: stopword-hit columns + argmax CASE — one
#: definition shared by the per-doc and confusion-matrix oracles
#: (mirrors functions/text.py STOPWORDS exactly).
_LANGID_HITS = """len(list_filter(string_split_regex(lower(text), '\\s+'),
        t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS en,
    len(list_filter(string_split_regex(lower(text), '\\s+'),
        t -> t IN ('der', 'die', 'das', 'und', 'nicht'))) AS de,
    len(list_filter(string_split_regex(lower(text), '\\s+'),
        t -> t IN ('le', 'la', 'les', 'et', 'pas'))) AS fr"""
_LANGID_CASE = """CASE WHEN en >= de AND en >= fr AND en > 0 THEN 'en'
            WHEN de >= fr AND de > 0 THEN 'de'
            WHEN fr > 0 THEN 'fr'
            ELSE 'und' END"""
#: packing-family running prefix sum (tokens BEFORE this doc) — one
#: definition per accumulation contract; ``over`` is the window scope.
_CUM_PREV = (
    """CAST(COALESCE(SUM(n_tokens) OVER (
           {over}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev"""
)
_CUM_PREV_SRC = _CUM_PREV.format(over="PARTITION BY source ORDER BY doc_id")
_CUM_PREV_GLOBAL = _CUM_PREV.format(over="ORDER BY source, doc_id")
#: single-space-split token list (the curation operators' contract)
_DOC_T = "SELECT doc_id, string_split(text, ' ') AS t FROM documents"
#: embeddings typed to double via list_transform (kmeans/pq family)
_EMB_LT = (
    """SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings"""
)
_TOKSA = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
    "t -> t != '')"
)


_MINHASH_TEMPLATE = f"""
WITH toks AS (
  {_DOC_T}
), sh AS (
  SELECT doc_id, unnest({{shingle_expr}}) AS shingle FROM toks
), ids AS (
  SELECT doc_id, {_tid('shingle')} AS sid FROM sh
), sig AS (
  SELECT doc_id, {{sig_exprs}}
  FROM ids GROUP BY doc_id
)
"""

# Unigram shingles (k=1): the distinct token set.
_SHINGLE_K1 = "list_distinct(t)"
# Word trigram shingles (k=3), mirroring dedup.word_shingles_pandas(3):
# DuckDB list slices are 1-based inclusive, so t[i:i+2] is 3 tokens;
# range() is end-exclusive and empty when stop <= start (docs with
# fewer than 3 tokens yield no shingles, same as the Spark side).
_SHINGLE_K3 = (
    "list_distinct(list_transform(range(1, len(t) - 1), "
    "i -> array_to_string(t[i:i+2], ' ')))"
)
_MINHASH_BASE = _MINHASH_TEMPLATE.replace("{shingle_expr}", _SHINGLE_K1)
_MINHASH_BASE_K3 = _MINHASH_TEMPLATE.replace("{shingle_expr}", _SHINGLE_K3)

_SIG_EXPRS = ", ".join(
    f"CAST(min(({2 * i + 1} * sid + {7 + 3 * i}) % {_P}) AS BIGINT) AS sig_{i}"
    for i in range(_H)
)

ORACLE_SQL["minhash_signatures_docs"] = (
    _MINHASH_BASE.format(sig_exprs=_SIG_EXPRS) + "SELECT * FROM sig"
)

def _band_selects(src: str = "sig") -> str:
    return "\nUNION ALL\n".join(
        "SELECT doc_id, "
        + ", ".join(f"sig_{i}" for i in range(_H))
        + f", {b} AS band, "
        + " || '_' || ".join(
            f"CAST(sig_{b * _R + j} AS VARCHAR)" for j in range(_R)
        )
        + f" AS key FROM {src}"
        for b in range(_BANDS)
    )


_BAND_SELECTS = _band_selects()
#: band rows restricted to exact-duplicate representatives — the
#: hot-bucket-guard replay (operators/dedup.exact_dup_stars): rep =
#: min doc_id per distinct text (NULL text is its own rep), stars =
#: the linear (rep, member) pairs covering collapsed duplicates. The
#: pair-generating self-join oracles read bands from repsig and UNION
#: the stars, in lockstep with the Spark generator.
_DUP_GRP_SQL = """, grp AS (
  SELECT doc_id,
         CASE WHEN text IS NOT NULL
              THEN min(doc_id) OVER (PARTITION BY text)
              ELSE doc_id END AS rep
  FROM documents
), stars AS (
  SELECT rep AS id_a, doc_id AS id_b FROM grp WHERE doc_id <> rep
), repsig AS (
  SELECT sig.* FROM sig JOIN grp ON grp.doc_id = sig.doc_id
  WHERE grp.rep = sig.doc_id
)"""
_BAND_SELECTS_REPS = _band_selects("repsig")

_EQ_SUM = " + ".join(
    f"CASE WHEN a.sig_{i} = b.sig_{i} THEN 1 ELSE 0 END" for i in range(_H)
)

ORACLE_SQL["minhash_lsh_docs"] = (
    _MINHASH_BASE_K3.format(sig_exprs=_SIG_EXPRS)
    + _DUP_GRP_SQL
    + f""", bands AS (
{_BAND_SELECTS_REPS}
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         round(({_EQ_SUM}) / {float(_H)}, 4) AS est_jaccard
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  UNION ALL
  SELECT id_a, id_b, CAST(1.0 AS DOUBLE) AS est_jaccard FROM stars
)
SELECT * FROM pairs"""
)

_SIMHASH_BITS = 32
_BIT_SUMS = ", ".join(
    f"SUM(cnt * (2 * ((h // {1 << j}) % 2) - 1)) AS s_{j}"
    for j in range(_SIMHASH_BITS)
)
_SIM_VALUE = " + ".join(
    f"CASE WHEN s_{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(_SIMHASH_BITS)
)

ORACLE_SQL["simhash_docs"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), counts AS (
  SELECT doc_id, token, count(*) AS cnt FROM toks GROUP BY 1, 2
), hashed AS (
  SELECT doc_id, cnt, (1103515245 * {_tid('token')} + 12345) % {_P} AS h
  FROM counts
), bit_sums AS (
  SELECT doc_id, {_BIT_SUMS} FROM hashed GROUP BY doc_id
)
SELECT doc_id, CAST({_SIM_VALUE} AS BIGINT) AS simhash FROM bit_sums
"""

# Shared fragments for the LSH-candidate exact-Jaccard oracles: the
# candidate pairs come from the same trigram-shingle band topology as
# minhash_lsh_docs; exact scoring intersects distinct-bigram lists.
_CAND_GRAMS_SQL = _DUP_GRP_SQL + f""", bands AS (
{_BAND_SELECTS_REPS}
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  UNION ALL
  SELECT id_a, id_b FROM stars
), gr AS (
  SELECT doc_id, list_distinct(
    list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
  ) AS grams FROM toks
), scored AS (
  SELECT id_a, id_b,
         len(list_intersect(ga.grams, gb.grams)) AS ni,
         len(ga.grams) + len(gb.grams)
           - len(list_intersect(ga.grams, gb.grams)) AS un
  FROM cand
  JOIN gr ga ON ga.doc_id = id_a
  JOIN gr gb ON gb.doc_id = id_b
)"""

ORACLE_SQL["ngram_jaccard_docs"] = (
    _MINHASH_BASE_K3.format(sig_exprs=_SIG_EXPRS)
    + _CAND_GRAMS_SQL
    + """
SELECT id_a, id_b, round(ni * 1.0 / un, 4) AS jaccard
FROM scored WHERE ni > 0 AND ni * 1.0 / un >= 0.05
"""
)

_COS = (
    "list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)
#: typed-embedding base selects shared by every ANN oracle
_EMB_V = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"
_EMB_VL = (
    "SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"
)


def _srp_bits() -> str:
    """The Spark operator's seeded hyperplane sign-bit expression,
    emitted as decimal literals (repr = shortest round-trip, so DuckDB
    parses the identical double)."""
    from ..operators.similarity import default_srp_planes

    return " + ".join(
        f"CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"[{', '.join(repr(float(x)) for x in row)}]) > 0 "
        f"THEN {1 << j} ELSE 0 END"
        for j, row in enumerate(default_srp_planes())
    )


ORACLE_SQL["srp_lsh_buckets"] = (
    f"SELECT vec_id, CAST({_srp_bits()} AS BIGINT) AS bucket FROM embeddings"
)


def _knn_sql(e_select: str, join_on: str) -> str:
    """Shared cosine-top-5 oracle skeleton: every ANN-ladder oracle is
    the same scored→ranked→rank≤5 pipeline over a typed embedding CTE;
    variants differ only in the base select (labels / SRP buckets) and
    the join predicate (candidate-generation rule)."""
    return f"""
WITH e AS (
  {e_select}
), scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS cos
  FROM e a JOIN e b
    ON {join_on}
), ranked AS (
  -- rank on the nearest-grid-quantized cosine (1e-12), mirroring
  -- _gemm_batch_topk: raw GEMM and fold cosines differ in the last
  -- ulp under dense near-ties, and exact duplicates sit grid-ALIGNED
  -- at 1.0 where floor would split them (100x replica finding)
  SELECT query_id, neighbor_id, cos, row_number() OVER (
    PARTITION BY query_id ORDER BY round(cos * 1e12) DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cos, 6) AS cosine,
       CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5
"""


def _emb_v_bucket() -> str:
    return (
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, "
        f"({_srp_bits()}) AS bucket FROM embeddings"
    )


ORACLE_SQL["knn_srp_bucket"] = _knn_sql(
    _emb_v_bucket(),
    "a.vec_id < 10 AND a.vec_id <> b.vec_id AND a.bucket = b.bucket",
)

# Multi-probe membership is pure bucket algebra: a pair is scored iff
# xor(bucket_a, bucket_b) is 0 or a single probe bit.
def _srp_probe_set() -> str:
    from ..operators.similarity import default_srp_planes

    return ", ".join(str(1 << j) for j in range(len(default_srp_planes())))


ORACLE_SQL["knn_srp_multiprobe"] = _knn_sql(
    _emb_v_bucket(),
    "a.vec_id < 10 AND a.vec_id <> b.vec_id\n"
    f"   AND xor(a.bucket, b.bucket) IN (0, {_srp_probe_set()})",
)

ORACLE_SQL["knn_bruteforce"] = _knn_sql(
    _EMB_V, "a.vec_id < 10 AND a.vec_id <> b.vec_id"
)

ORACLE_SQL["hard_negative_topk"] = _knn_sql(
    _EMB_VL, "a.vec_id < 10 AND a.label <> b.label"
)

ORACLE_SQL["knn_ivf_label"] = _knn_sql(
    _EMB_VL, "a.vec_id < 10 AND a.vec_id <> b.vec_id AND a.label = b.label"
)

ORACLE_SQL["embedding_neardup"] = f"""
WITH e AS (
  {_EMB_VL}
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({_COS}, 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id AND a.label = b.label
WHERE {_COS} >= 0.25
"""

# Mutual-kNN graph + degree-oriented triangle enumeration (the Spark
# side mirrors this exactly: row_number (cos desc, id asc) per query,
# reciprocal filter, orientation by (degree, id), wedge + closure).
#
# The kNN stage is BANDED (VERDICT r8 item 2): kNN is computed within
# label, so partitioning the labels into buckets and UNION ALL-ing the
# per-bucket top-3 is semantically IDENTICAL to one global pass — each
# label's pairs live entirely inside one branch. The point is 100x
# feasibility: one monolithic `e a JOIN e b ON a.label = b.label`
# materializes ~250M scored pair rows at the 100x replica (50k
# vectors, 10 labels) and exhausted temp disk in the round-8 drive;
# per-band branches bound the live pair set to ~1/10 of that (~25M
# rows) while total work is unchanged. The band key is a pure function
# of label (non-negative mod), so the decomposition is exact for any
# label domain, not just the fixture's 0..9.
_TRI_BANDS = 10


def _tri_knn_band(i: int) -> str:
    # rank on the nearest-grid-quantized cosine (1e-12), mirroring
    # mutual_knn_edges: raw BLAS GEMM float64 sums and DuckDB's
    # sequential fold can differ in the last ulp, which would flip
    # top-k membership for near-tied cosines (ADVICE r7); nearest-grid
    # (not floor) so exact-duplicate cosines aligned at 1.0 snap to
    # one cell.
    # The quantized cosine is PROJECTED in the inner subquery, before
    # the window: an ORDER BY that computes the cosine inside the
    # window operator drags both 64-double embedding vectors into the
    # window sort payload (~1 KB/row × 25M pair rows per band — this,
    # not the pair count itself, is what filled temp disk in the
    # round-8/round-9 first attempts); pre-projected, the sort row is
    # (qa, qb, qw) = 24 bytes.
    return f"""
  SELECT qa, qb FROM (
    SELECT qa, qb, row_number() OVER (
      PARTITION BY qa ORDER BY qw DESC, qb ASC) AS rk
    FROM (
      SELECT a.vec_id AS qa, b.vec_id AS qb,
             round(({_COS}) * 1e12) AS qw
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
      WHERE ((a.label % {_TRI_BANDS}) + {_TRI_BANDS}) % {_TRI_BANDS} = {i}
    )
  ) WHERE rk <= 3"""


ORACLE_SQL["embedding_knn_triangles"] = f"""
WITH e AS (
  {_EMB_VL}
), knn AS MATERIALIZED (
  -- MATERIALIZED is load-bearing: knn/und feed multiple downstream
  -- references (mutual reads knn twice, o reads und three times);
  -- DuckDB inlines plain CTEs per reference, which would re-run the
  -- banded pair scoring many times over (measured 9.2 s -> 0.1 s at
  -- 1x from this keyword alone).
  {" UNION ALL ".join(_tri_knn_band(i) for i in range(_TRI_BANDS))}
), mutual AS (
  SELECT r1.qa AS u, r1.qb AS v
  FROM knn r1 JOIN knn r2 ON r1.qa = r2.qb AND r1.qb = r2.qa
  WHERE r1.qa < r1.qb
), und AS MATERIALIZED (
  SELECT u, v FROM mutual UNION ALL SELECT v, u FROM mutual
), deg AS (
  SELECT u AS n, count(*) AS d FROM und GROUP BY 1
), o AS MATERIALIZED (
  SELECT und.u AS a, und.v AS b, dv.d AS db
  FROM und JOIN deg du ON du.n = und.u JOIN deg dv ON dv.n = und.v
  WHERE (du.d < dv.d) OR (du.d = dv.d AND und.u < und.v)
)
SELECT x.a AS a, x.b AS b, y.b AS c
FROM o x JOIN o y ON x.a = y.a
 AND ((x.db < y.db) OR (x.db = y.db AND x.b < y.b))
JOIN o z ON z.a = x.b AND z.b = y.b
"""

# Token splits mirror text.tokens(): empty strings are dropped after
# the \s+ split (leading/trailing whitespace would otherwise make the
# engines disagree on token counts; synthetic data happens to be clean
# but the oracle must match the SEMANTICS, not the fixture).
ORACLE_SQL["doc_quality"] = f"""
WITH toks AS (
  SELECT doc_id, text,
         {_TOKS} AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(text) AS INTEGER) AS n_chars,
       CAST(len(t) AS INTEGER) AS n_tokens,
       round(len(regexp_replace(text, '\\s+', '', 'g')) * 1.0
             / len(t), 4) AS avg_token_len,
       round((len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 1.0
             / len(text), 4) AS punct_ratio,
       round(len(list_filter(string_split_regex(lower(text), '\\s+'),
                 t -> t IN ('the', 'a', 'of', 'and', 'to'))) * 1.0
             / len(t), 4) AS stopword_ratio
FROM toks
"""

ORACLE_SQL["doc_language_id"] = f"""
WITH hits AS (
  SELECT doc_id, lang,
    {_LANGID_HITS}
  FROM documents
)
SELECT doc_id, lang,
       {_LANGID_CASE} AS pred_lang,
       CAST(en AS INTEGER) AS en_hits
FROM hits
"""

ORACLE_SQL["doc_fingerprint"] = """
SELECT doc_id,
       CAST(list_sum(list_transform(range(1, len(text) + 1),
            i -> ord(text[i]) * CAST(i AS BIGINT))) % 1000000007 AS BIGINT)
         AS fingerprint
FROM documents
"""

ORACLE_SQL["token_stats_by_source"] = f"""
WITH toks AS (
  SELECT source, n_chars,
         len({_TOKS})
           AS n_tok
  FROM documents
)
SELECT source,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       round(avg(n_tok), 4) AS avg_tokens,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       count(*) AS n_docs
FROM toks
GROUP BY source
"""


# --------------------------------------------------------------------------
# Scale-path oracles: clustering (recursive CTE), IVF centroids,
# percentiles, sliding windows, salted join (plain-join oracle).
# --------------------------------------------------------------------------

# Connected components as a recursive CTE: propagate every reachable
# label, take the min per node. The Spark side iterates min-label
# propagation to a fixpoint — same fixpoint, so values hash-match.
# Edges are LSH-bucket STARS (member → bucket min), matching the Spark
# operator: components of the star graph equal components of the
# all-pairs bucket graph, with linearly many edges.
ORACLE_SQL["neardup_clusters"] = f"""
WITH RECURSIVE bandkeys AS (
{_MINHASH_BASE_K3.format(sig_exprs=_SIG_EXPRS)}, bands AS (
{_BAND_SELECTS}
)
SELECT doc_id, band, key FROM bands
), stars AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY band, key) AS center
  FROM bandkeys
), edges0 AS (
  SELECT DISTINCT doc_id AS s, center AS d FROM stars WHERE doc_id != center
), edges AS (
  SELECT s, d FROM edges0 UNION SELECT d, s FROM edges0
), reach(node, lab) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node
), comp AS (
  SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node
)
SELECT d.doc_id, CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
"""

# Portable multiplicative-mod sample hash (sampling.SAMPLE_HASH_A/P):
# any SQL engine reproduces membership exactly.
ORACLE_SQL["deterministic_event_sample"] = """
WITH ranked AS (
  SELECT event_type, event_id, user_id, round(value, 4) AS value,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY (2654435761 * event_id + 7) % 2147483647, event_id
         ) AS rk
  FROM events
)
SELECT event_type, event_id, user_id, value FROM ranked WHERE rk <= 3
"""

# Ranking is on the UNROUNDED tfidf (matching the Spark window): equal
# (tf, df) pairs are bit-identical doubles on both engines, and the
# token tie-break makes the order total.
ORACLE_SQL["tfidf_top_terms"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2
), dfx AS (
  SELECT token, count(*) AS df FROM tf GROUP BY 1
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT doc_id, token, tf, df,
         tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS tfidf
  FROM tf JOIN dfx USING (token) CROSS JOIN n
), ranked AS (
  SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
         round(tfidf, 4) AS tfidf,
         CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY tfidf DESC, token
         ) AS INT) AS rk
  FROM scored
)
SELECT * FROM ranked WHERE rk <= 5
"""

ORACLE_SQL["label_centroids"] = """
SELECT label, CAST(g.i - 1 AS INT) AS dim_idx,
       round(avg(embedding[g.i]), 6) AS centroid
FROM embeddings CROSS JOIN generate_series(1, 64) AS g(i)
WHERE g.i <= len(embedding)
GROUP BY 1, 2
"""

ORACLE_SQL["value_percentiles_by_type"] = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 4) AS p25,
       round(quantile_cont(value, 0.50), 4) AS p50,
       round(quantile_cont(value, 0.75), 4) AS p75
FROM events
GROUP BY 1
"""

# KMV sketch profile: k=64 minimum portable MD5-48 hashes of user_id
# per type → (k-1)·2^48 / h_k estimate (exact count when < k distinct);
# quantiles over the deterministic hash(event_id) % 4 = 0 row sample.
ORACLE_SQL["sketch_profile_by_type"] = f"""
WITH dist AS (
  SELECT DISTINCT event_type,
         ((md5_number(CAST(user_id AS VARCHAR)) % {_M48} + {_M48}) % {_M48}) AS hh
  FROM events
), r AS (
  SELECT event_type, hh,
         row_number() OVER (PARTITION BY event_type ORDER BY hh) AS rn
  FROM dist
), kmv AS (
  SELECT event_type, count(*) AS d, max(hh) AS hk
  FROM r WHERE rn <= 64 GROUP BY event_type
), counts AS (
  SELECT event_type, count(*) AS n_rows FROM events GROUP BY event_type
), q AS (
  SELECT event_type,
         round(quantile_cont(value, 0.5), 4) AS sample_p50,
         round(quantile_cont(value, 0.95), 4) AS sample_p95
  FROM events
  WHERE ((md5_number(CAST(event_id AS VARCHAR)) % {_M48} + {_M48}) % {_M48}) % 4 = 0
  GROUP BY event_type
)
SELECT c.event_type, c.n_rows,
       round(CASE WHEN k.d < 64 THEN CAST(k.d AS DOUBLE)
                  ELSE (CAST(63 AS DOUBLE) * {_M48}) / k.hk END, 4)
         AS kmv_distinct_ids,
       q.sample_p50, q.sample_p95
FROM counts c
LEFT JOIN kmv k USING (event_type)
LEFT JOIN q USING (event_type)
"""

# Every event belongs to exactly two 10-min/5-min-slide windows:
# the one starting at its 5-min bucket and the one 5 min earlier.
ORACLE_SQL["events_sliding_10m_5m"] = """
WITH assigned AS (
  SELECT (epoch_us(ts) // 300000000) * 300000000 AS w, event_type, value
  FROM events
), both_windows AS (
  SELECT w AS window_start_us, event_type, value FROM assigned
  UNION ALL
  SELECT w - 300000000, event_type, value FROM assigned
)
SELECT window_start_us, event_type, count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM both_windows
GROUP BY 1, 2
"""

ORACLE_SQL["salted_user_event_totals"] = f"""
SELECT c_mktsegment, count(*) AS n_orders,
       {_qsum("o_totalprice", 2)} AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""

ORACLE_SQL["cube_flag_status"] = """
SELECT l_returnflag, l_linestatus, count(*) AS n_items,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

ORACLE_SQL["ntile_price_quartiles"] = """
SELECT o_orderpriority, CAST(quartile AS INTEGER) AS quartile,
       count(*) AS n_orders, round(avg(o_totalprice), 2) AS avg_price
FROM (
  SELECT o_orderpriority, o_totalprice,
         ntile(4) OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice ASC, o_orderkey ASC) AS quartile
  FROM orders
)
GROUP BY 1, 2
"""

ORACLE_SQL["parts_above_brand_avg"] = """
SELECT p_partkey, p_brand, p_retailprice,
       round(brand_total, 2) AS brand_total, n_in_brand
FROM (
  SELECT p_partkey, p_brand, p_retailprice,
         avg(p_retailprice) OVER (PARTITION BY p_brand) AS brand_avg,
         sum(p_retailprice) OVER (PARTITION BY p_brand) AS brand_total,
         count(*) OVER (PARTITION BY p_brand) AS n_in_brand
  FROM part
)
WHERE p_retailprice > brand_avg
"""

ORACLE_SQL["props_json_stats"] = """
SELECT event_type,
       count(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_with_k,
       round(avg(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
       CAST(max(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
FROM events
GROUP BY 1
"""

ORACLE_SQL["python_datasource_scan"] = """
WITH g AS (
  SELECT i AS id, CAST(i % 97 AS INT) AS bucket,
         ['click','view','purchase','signup','error'][CAST(i % 5 AS INT) + 1]
           AS typ,
         ((i * 2654435761) % 1000000) / 1000.0 AS val
  FROM range(20000) t(i)
)
SELECT bucket, count(*) AS n, round(sum(val), 3) AS sum_val,
       max(id) AS max_id
FROM g WHERE typ = 'click' AND id >= 500
GROUP BY bucket
"""

ORACLE_SQL["arrow_embedding_norms"] = """
SELECT vec_id,
       round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))), 6) AS norm
FROM embeddings
"""

ORACLE_SQL["python_sink_roundtrip"] = """
SELECT source, count(*) AS n_docs,
       (SELECT count(*) FROM documents) AS manifest_total
FROM documents GROUP BY source
"""

ORACLE_SQL["python_stream_source_totals"] = """
SELECT CAST(i % 7 AS INT) AS k, count(*) AS n,
       round(sum(((i * 2654435761) % 1000) / 10.0), 2) AS sum_val
FROM range(300) t(i) GROUP BY 1
"""

ORACLE_SQL["value_gini_by_type"] = """
WITH v AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS i,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
)
SELECT event_type,
       -- zero-sum guard mirrors gini_pandas's empty/zero contract
       -- (ADVICE r7): a group summing to 0 is defined as G = 0, not
       -- NULL/div-by-zero.
       CASE WHEN sum(value) = 0 THEN 0.0
            ELSE round(sum((2 * i - n - 1) * value) / (max(n) * sum(value)), 6)
       END AS gini,
       CAST(max(n) AS BIGINT) AS n_values
FROM v GROUP BY event_type
"""

ORACLE_SQL["variant_payload_stats"] = """
SELECT event_type AS t,
       count(*) AS n,
       round(sum(value), 2) AS sum_v,
       CAST(sum(user_id) AS BIGINT) AS sum_u,
       count(*) AS n_missing
FROM events
GROUP BY event_type
"""

ORACLE_SQL["normalized_embeddings"] = """
WITH normed AS (
  SELECT vec_id, embedding,
         sqrt(list_aggregate(
           list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
           'sum')) AS n
  FROM embeddings
)
SELECT vec_id, CAST(g.i - 1 AS INT) AS dim_idx,
       round(CAST(embedding[g.i] AS DOUBLE) / n, 6) AS nval
FROM normed CROSS JOIN generate_series(1, 64) AS g(i)
WHERE g.i <= len(embedding) AND n > 0
"""

ORACLE_SQL["sql_top_revenue_nations"] = """
WITH rev AS (
  SELECT n.n_name,
         round(CAST(sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)) * 10000) AS HUGEINT)) AS DOUBLE) / 10000, 2) AS revenue
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT n_name, revenue,
       CAST(row_number() OVER (ORDER BY revenue DESC, n_name ASC) AS INTEGER) AS rk
FROM rev
"""

ORACLE_SQL["regex_token_stats"] = f"""
WITH toks AS (
  SELECT source,
         len({_TOKSA}) AS n,
         len(list_distinct({_TOKSA})) AS nd
  FROM documents
)
SELECT source, CAST(sum(n) AS BIGINT) AS total_tokens,
       round(avg(n), 4) AS avg_tokens,
       round(avg(CAST(nd AS DOUBLE) / n), 4) AS avg_ttr
FROM toks GROUP BY 1
"""

ORACLE_SQL["quantized_embeddings"] = """
WITH scaled AS (
  SELECT vec_id,
         CAST(list_aggregate(list_transform(embedding, x -> abs(x)), 'max') AS DOUBLE) AS s,
         embedding
  FROM embeddings
)
SELECT vec_id, CAST(g.i - 1 AS INT) AS dim_idx,
       CAST(greatest(-127, least(127,
            round(CAST(embedding[g.i] AS DOUBLE) / s * 127.0, 0))) AS INTEGER) AS qval
FROM scaled CROSS JOIN generate_series(1, 64) AS g(i)
WHERE g.i <= len(embedding) AND s > 0
"""

ORACLE_SQL["shipping_priority_top10"] = f"""
SELECT l_orderkey,
       epoch_us(o_orderdate) AS o_orderdate_us,
       o_orderpriority,
       {_qsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

_NMS_NUM = """CASE WHEN n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0.0 END"""
ORACLE_SQL["nation_market_share"] = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       {_qsum(_NMS_NUM, 4)} AS nation_rev,
       {_qsum("l_extendedprice * (1 - l_discount)", 4)} AS total_rev,
       round({_qsum(_NMS_NUM, 4)}
             / {_qsum("l_extendedprice * (1 - l_discount)", 4)}, 6) AS share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY 1
"""

ORACLE_SQL["grouping_sets_revenue"] = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       {_qsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
       count(*) AS n_items
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""

ORACLE_SQL["nation_activity_full_outer"] = f"""
WITH c AS (
  SELECT c_nationkey AS nationkey, count(*) AS n_customers,
         {_qsum("c_acctbal", 2)} AS cust_balance
  FROM customer WHERE c_mktsegment = 'MACHINERY' GROUP BY 1
), s AS (
  SELECT s_nationkey AS nationkey, count(*) AS n_suppliers,
         {_qsum("s_acctbal", 2)} AS supp_balance
  FROM supplier WHERE s_acctbal > 5000 GROUP BY 1
)
SELECT CAST(coalesce(c.nationkey, s.nationkey) AS INT) AS nationkey,
       coalesce(n_customers, 0) AS n_customers,
       coalesce(cust_balance, 0.0) AS cust_balance,
       coalesce(n_suppliers, 0) AS n_suppliers,
       coalesce(supp_balance, 0.0) AS supp_balance
FROM c FULL OUTER JOIN s USING (nationkey)
"""

ORACLE_SQL["supplier_balance_distribution"] = """
SELECT s_suppkey,
       CAST(s_nationkey AS INT) AS s_nationkey,
       s_acctbal,
       round(percent_rank() OVER w, 6) AS bal_pct_rank,
       round(cume_dist() OVER w, 6) AS bal_cume_dist
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal)
"""

ORACLE_SQL["hourly_moving_value"] = """
SELECT event_id, user_id,
       round(sum(value) OVER w, 2) AS hour_value,
       count(*) OVER w AS hour_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""

ORACLE_SQL["user_event_type_profile"] = """
SELECT user_id,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv,
       count(DISTINCT event_type) AS n_types,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY user_id
"""

ORACLE_SQL["monthly_revenue_trend"] = f"""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         {_qsum("o_totalprice", 2)} AS revenue,
         count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT epoch_us(month) AS month_us, revenue, n_orders,
       round(revenue - lag(revenue) OVER (ORDER BY month), 2) AS mom_delta
FROM m
"""

ORACLE_SQL["decile_value_spread"] = """
WITH t AS (
  SELECT o_orderpriority, o_totalprice,
         CAST(ntile(10) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS INT) AS decile
  FROM orders
)
SELECT o_orderpriority, decile,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi,
       count(*) AS n_orders
FROM t GROUP BY 1, 2
"""

ORACLE_SQL["media_decode_stats"] = """
WITH bytesum AS (
  SELECT doc_id, CAST(sum(ascii(c)) AS BIGINT) AS bsum
  FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
  GROUP BY doc_id
), decoded AS (
  SELECT d.doc_id,
         CASE (d.doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         length(d.text) AS n_bytes,
         b.bsum % 1000000007 AS checksum
  FROM documents d JOIN bytesum b USING (doc_id)
)
SELECT kind,
       count(*) AS n_media,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(sum(checksum) AS BIGINT) AS sum_checksum,
       round(avg(checksum % 640 + 1), 4) AS avg_width,
       round(avg(checksum % 480 + 1), 4) AS avg_height
FROM decoded GROUP BY kind
"""

# media_feature_stats: the engine's fake feature extractor is pure IEEE
# arithmetic on integer-valued byte sums (see sources/multimodal.py
# extract_features) — float64 slot sums are exact integers, sqrt/divide
# are correctly-rounded IEEE ops, and the float32 cast is deterministic,
# so DuckDB rebuilds the exact float32 vectors from the text bytes.
ORACLE_SQL["media_feature_stats"] = """
WITH chars AS (
  SELECT doc_id,
         unnest(string_split(text, '')) AS c,
         generate_subscripts(string_split(text, ''), 1) AS i
  FROM documents
), slots AS (
  SELECT doc_id, CAST((i - 1) % 16 AS INT) AS slot,
         CAST(sum(ascii(c)) AS DOUBLE) AS v
  FROM chars GROUP BY 1, 2
), norms AS (
  SELECT doc_id, sqrt(sum(v * v)) AS nrm FROM slots GROUP BY 1
), fvec AS (
  SELECT s.doc_id, s.slot,
         CAST(s.v / (CASE WHEN n.nrm = 0 THEN 1.0 ELSE n.nrm END) AS FLOAT) AS f
  FROM slots s JOIN norms n USING (doc_id)
), per_doc AS (
  SELECT d.doc_id,
         CASE (d.doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         coalesce(sum(CAST(f.f * f.f AS DOUBLE)), 0.0) AS sq,
         coalesce(max(CASE WHEN f.slot = 0 THEN f.f END),
                  CAST(0.0 AS FLOAT)) AS f0
  FROM documents d LEFT JOIN fvec f ON d.doc_id = f.doc_id
  GROUP BY 1, 2
)
SELECT kind, count(*) AS n_media,
       round(avg(sq), 4) AS avg_sq_norm,
       round(avg(f0), 6) AS avg_f0
FROM per_doc GROUP BY kind
"""

ORACLE_SQL["video_frame_sample"] = """
WITH vids AS (
  SELECT doc_id AS media_id, length(text) AS len
  FROM documents WHERE doc_id % 3 = 2
)
SELECT media_id,
       CAST(least(8, greatest(1, len // 256)) AS BIGINT) AS n_frames,
       CAST(least(len, least(8, greatest(1, len // 256)) * 256) AS BIGINT) AS frame_bytes
FROM vids
"""

ORACLE_SQL["part_segment_set_ops"] = """
WITH building AS (
  SELECT DISTINCT l_partkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
), machinery AS (
  SELECT DISTINCT l_partkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'MACHINERY'
)
SELECT l_partkey, 'both' AS membership
FROM (SELECT l_partkey FROM building INTERSECT SELECT l_partkey FROM machinery)
UNION ALL
SELECT l_partkey, 'building_only' AS membership
FROM (SELECT l_partkey FROM building EXCEPT SELECT l_partkey FROM machinery)
"""

ORACLE_SQL["supplier_rank_tiers"] = """
SELECT s_suppkey,
       CAST(s_nationkey AS INT) AS s_nationkey,
       CAST(floor(s_acctbal / 1000) AS BIGINT) AS bal_tier,
       CAST(rank() OVER w AS INT) AS tier_rank,
       CAST(dense_rank() OVER w AS INT) AS tier_dense_rank
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY floor(s_acctbal / 1000) DESC)
"""

ORACLE_SQL["order_value_histogram"] = """
SELECT least(CAST(floor(o_totalprice / 20000) AS INT), 29) AS bucket,
       count(*) AS n_orders,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price,
       CAST(least(CAST(floor(o_totalprice / 20000) AS INT), 29) * 20000 AS DOUBLE) AS bucket_lo
FROM orders
GROUP BY 1
"""

ORACLE_SQL["corpus_selection"] = (
    _MINHASH_BASE_K3.format(sig_exprs=_SIG_EXPRS)
    + _CAND_GRAMS_SQL
    + f""", losers AS (
  SELECT DISTINCT id_b AS doc_id FROM scored
  WHERE ni > 0 AND ni * 1.0 / un >= 0.5
), winners AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
), q AS (
  SELECT doc_id, source, lang,
         CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
         len(list_filter({_TOKSL},
             x -> x IN ('the', 'a', 'of', 'and', 'to'))) * 1.0
           / len({_TOKS}) AS stop_ratio
  FROM documents
)
SELECT q.doc_id, q.source, q.lang, q.n_tokens
FROM q
JOIN winners ON q.doc_id = winners.doc_id
WHERE q.n_tokens >= 12 AND q.stop_ratio >= 0.04
  AND q.doc_id NOT IN (SELECT doc_id FROM losers)
"""
)

ORACLE_SQL["asof_forward_error"] = """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), errors AS (
  -- greatest-payload tie dedup (see asof_backward_purchase note)
  SELECT user_id, ts, max(event_id) AS error_id
  FROM events WHERE event_type = 'error' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
       e.error_id, epoch_us(e.ts) AS error_ts_us
FROM purchases p
ASOF LEFT JOIN errors e ON p.user_id = e.user_id AND p.ts <= e.ts
"""

ORACLE_SQL["supplier_ship_span"] = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       epoch_us(l_shipdate) AS ship_us,
       first_value(epoch_us(l_shipdate)) OVER w AS first_ship_us,
       last_value(epoch_us(l_shipdate)) OVER w AS last_ship_us,
       nth_value(l_orderkey, 2) OVER w AS second_orderkey
FROM lineitem
WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""

ORACLE_SQL["price_stats_by_flag"] = """
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 2) AS price_stddev,
       round(var_samp(l_quantity), 4) AS qty_variance,
       round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
       count(*) AS n_items
FROM lineitem
GROUP BY l_returnflag
"""

_PRS_NUM = """CASE WHEN p_type = 'PROMO'
                        THEN l_extendedprice * (1 - l_discount)
                        ELSE 0.0 END"""
ORACLE_SQL["promo_revenue_share"] = f"""
WITH m AS (
  SELECT date_trunc('month', l_shipdate) AS ship_month,
         {_qsum(_PRS_NUM, 4)} AS promo_rev,
         {_qsum("l_extendedprice * (1 - l_discount)", 4)} AS total_rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT epoch_us(ship_month) AS ship_month_us, promo_rev, total_rev,
       round(promo_rev / total_rev, 6) AS promo_share
FROM m
"""

ORACLE_SQL["segment_top_customer"] = """
SELECT c_mktsegment,
       arg_max(c_custkey, CAST(round(c_acctbal * 100, 0) AS BIGINT) * 1000000 + c_custkey) AS richest_custkey,
       round(max(c_acctbal), 2) AS max_acctbal,
       arg_min(c_custkey, CAST(round(c_acctbal * 100, 0) AS BIGINT) * 1000000 + c_custkey) AS poorest_custkey,
       round(min(c_acctbal), 2) AS min_acctbal
FROM customer
GROUP BY c_mktsegment
"""

# qualifying_grid_events — replicates the full f1 qualifying lifecycle
# (bucket → clean → best-per-driver-per-Q → segment rank → Q3⊕Q2⊕Q1
# assembly with computed offsets). Time compression is integer floor
# division on epoch micros; lap time is round(v/3+v/3+v/3, 3) — the
# identical IEEE expression tree the engine evaluates.
ORACLE_SQL["qualifying_grid_events"] = """
WITH ev AS (
  SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'click'
), b AS (
  SELECT epoch_us(min(ts)) AS smin FROM ev
), laps AS (
  SELECT 'click' AS session_key,
         e.user_id AS driver_number,
         b.smin + (epoch_us(e.ts) - b.smin) // 1000 AS lap_us,
         CAST(row_number() OVER (PARTITION BY e.user_id
                                 ORDER BY e.ts, e.event_id) AS INT) AS lap_number,
         round(e.value/3 + e.value/3 + e.value/3, 3) AS actual_lap_time,
         (e.event_id % 11 = 0) AS is_pit
  FROM ev e CROSS JOIN b
), bucketed AS (
  SELECT l.*, CASE WHEN l.lap_us < b.smin + 1500000000 THEN 'Q1'
                   WHEN l.lap_us < b.smin + 2880000000 THEN 'Q2'
                   ELSE 'Q3' END AS qualifying
  FROM laps l CROSS JOIN b
), clean AS (
  SELECT * FROM bucketed WHERE NOT is_pit AND actual_lap_time IS NOT NULL
), best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY qualifying, driver_number
               ORDER BY actual_lap_time, lap_us, lap_number) AS rn
    FROM clean) t WHERE rn = 1
), ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY qualifying
               ORDER BY actual_lap_time, lap_us, driver_number) AS INT) AS segment_rank,
         count(*) OVER (PARTITION BY qualifying) AS segment_n
  FROM best
), flagged AS (
  SELECT *, max(CASE WHEN qualifying = 'Q3' THEN 1 ELSE 0 END)
              OVER (PARTITION BY session_key, driver_number) AS in_q3,
            max(CASE WHEN qualifying = 'Q2' THEN 1 ELSE 0 END)
              OVER (PARTITION BY session_key, driver_number) AS in_q2
  FROM ranked
), assembled AS (
  SELECT session_key, driver_number, qualifying, actual_lap_time, segment_rank
  FROM flagged
  WHERE (qualifying = 'Q3')
     OR (qualifying = 'Q2' AND in_q3 = 0)
     OR (qualifying = 'Q1' AND in_q2 = 0 AND in_q3 = 0)
), counts AS (
  SELECT qualifying, count(*) AS n FROM assembled GROUP BY 1
), offs AS (
  SELECT qualifying,
         CASE qualifying
           WHEN 'Q3' THEN 0
           WHEN 'Q2' THEN (SELECT coalesce(sum(n), 0) FROM counts WHERE qualifying = 'Q3')
           ELSE (SELECT coalesce(sum(n), 0) FROM counts WHERE qualifying IN ('Q3', 'Q2'))
         END AS off
  FROM counts
)
SELECT a.session_key, a.driver_number, a.qualifying, a.actual_lap_time,
       a.segment_rank,
       CAST(o.off + row_number() OVER (PARTITION BY a.qualifying
                                       ORDER BY a.segment_rank) AS INT) AS grid_position
FROM assembled a JOIN offs o USING (qualifying)
"""

ORACLE_SQL["race_positions_events"] = """
WITH laps AS (
  SELECT event_type AS session_key, user_id AS driver_number,
         CAST(row_number() OVER (PARTITION BY event_type, user_id
                                 ORDER BY ts, event_id) AS INT) AS lap_number,
         value AS actual_lap_time
  FROM events
), cum AS (
  SELECT *, CASE WHEN bool_and(actual_lap_time IS NOT NULL) OVER w
              THEN round(sum(actual_lap_time) OVER w, 3) END AS race_time
  FROM laps
  WINDOW w AS (PARTITION BY session_key, driver_number ORDER BY lap_number
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), pos AS (
  SELECT *, CASE WHEN race_time IS NOT NULL THEN
         CAST(row_number() OVER (PARTITION BY session_key, lap_number
               ORDER BY race_time ASC NULLS LAST, driver_number) AS INT) END AS position
  FROM cum
)
SELECT session_key, driver_number, lap_number, race_time, position,
       CAST(lag(position) OVER (PARTITION BY session_key, driver_number
                                ORDER BY lap_number) - position AS INT) AS position_change
FROM pos
"""

ORACLE_SQL["events_tumbling_5min_streamed"] = ORACLE_SQL["events_tumbling_5min"]
# RocksDB provider must produce identical results — same oracle.
ORACLE_SQL["schema_evolution_read"] = """
SELECT source,
       count(*) AS n_docs,
       count(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS n_with_chars,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
         AS sum_chars
FROM documents GROUP BY source
"""

ORACLE_SQL["events_rocksdb_tumbling"] = ORACLE_SQL["events_tumbling_5min"]

ORACLE_SQL["minhash_lsh_fast_dup_recall"] = """
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text FROM documents
), grp AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep FROM d
)
SELECT rep AS id_a, doc_id AS id_b,
       CAST(1.0 AS DOUBLE) AS est_jaccard
FROM grp WHERE doc_id <> rep
"""

# lsh_hot_bucket_guard: the planted duplicate-spam bucket replayed
# end to end — spam constants imported from operators/dedup so the
# two sides cannot drift; the sig/band/grouping fragments are the
# shared ones above, over the spam-extended corpus.
from ..operators.dedup import (  # noqa: E402
    HOT_BUCKET_SPAM_BASE_ID as _SPAM_BASE,
    HOT_BUCKET_SPAM_N as _SPAM_N,
    HOT_BUCKET_SPAM_TEXT as _SPAM_TEXT,
)

ORACLE_SQL["lsh_hot_bucket_guard"] = f"""
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT {_SPAM_BASE} + i AS doc_id, '{_SPAM_TEXT}' AS text
  FROM range({_SPAM_N}) t(i)
), toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM docs2
), sh AS (
  SELECT doc_id, unnest({_SHINGLE_K3}) AS shingle FROM toks
), ids AS (
  SELECT doc_id, {_tid('shingle')} AS sid FROM sh
), sig AS (
  SELECT doc_id, {_SIG_EXPRS}
  FROM ids GROUP BY doc_id
), grp AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep FROM docs2
), stars AS (
  SELECT rep AS id_a, doc_id AS id_b FROM grp WHERE doc_id <> rep
), repsig AS (
  SELECT sig.* FROM sig JOIN grp ON grp.doc_id = sig.doc_id
  WHERE grp.rep = sig.doc_id
), bands AS (
{_BAND_SELECTS_REPS}
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         round(({_EQ_SUM}) / {float(_H)}, 4) AS est_jaccard
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  UNION ALL
  SELECT id_a, id_b, CAST(1.0 AS DOUBLE) AS est_jaccard FROM stars
)
SELECT id_a, id_b, est_jaccard,
       (id_a >= {_SPAM_BASE} OR id_b >= {_SPAM_BASE}) AS touches_spam
FROM pairs
"""

# media_real_decode_stats: the engine DECODES real containers it built
# from (doc_id, n_chars); the oracle recomputes dimensions from the
# same formulas and payload sizes from the container math
# (BMP: 54-byte header + 4-byte-aligned 24bpp rows; PPM: ASCII header
# + w*h*3; WAV: 44 bytes + 2*n_samples).
ORACLE_SQL["media_real_decode_stats"] = """
WITH m AS (
  SELECT doc_id, n_chars,
         CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm' ELSE 'wav' END AS container,
         CASE WHEN doc_id % 3 = 2 THEN 'audio' ELSE 'image' END AS kind,
         CASE doc_id % 3
           WHEN 0 THEN n_chars % 64 + 1
           WHEN 1 THEN n_chars % 32 + 1
           ELSE 8000 + doc_id % 8 * 500 END AS width,
         CASE doc_id % 3
           WHEN 0 THEN doc_id % 48 + 1
           WHEN 1 THEN doc_id % 24 + 1
           ELSE n_chars END AS height,
         CASE doc_id % 3
           WHEN 0 THEN 54 + ((n_chars % 64 + 1) * 3 + 3) // 4 * 4 * (doc_id % 48 + 1)
           WHEN 1 THEN length('P6' || chr(10) || '# synthetic' || chr(10)
                             || CAST(n_chars % 32 + 1 AS VARCHAR) || ' '
                             || CAST(doc_id % 24 + 1 AS VARCHAR) || chr(10) || '255')
                       + 1 + (n_chars % 32 + 1) * (doc_id % 24 + 1) * 3
           ELSE 44 + n_chars * 2 END AS n_bytes
  FROM documents
)
SELECT container, kind, count(*) AS n_media,
       CAST(sum(width) AS BIGINT) AS sum_width,
       CAST(sum(height) AS BIGINT) AS sum_height,
       CAST(max(width) AS INT) AS max_width,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes
FROM m GROUP BY 1, 2
"""

# media_thumbnail_stats: resize_images' fake path keeps bytes at
# positions 1, 1+step, ... (step = len//64, first 64 samples) and
# zero-pads to 64; the oracle recomputes those positions' byte values
# from the text column directly.
ORACLE_SQL["media_thumbnail_stats"] = """
WITH img AS (
  SELECT doc_id, text, length(text) AS len
  FROM documents WHERE doc_id % 3 = 0 AND length(text) > 0
), params AS (
  SELECT doc_id, text, len, greatest(len // 64, 1) AS step FROM img
), sampled AS (
  SELECT p.doc_id, sum(ascii(p.text[CAST(1 + k.k * p.step AS INT)])) AS thumb_sum
  FROM params p, range(0, 64) k(k)
  WHERE 1 + k.k * p.step <= p.len
  GROUP BY 1
)
SELECT CAST(8 AS INT) AS thumb_w, CAST(8 AS INT) AS thumb_h,
       count(*) AS n_thumbs,
       CAST(sum(thumb_sum) AS BIGINT) AS sum_bytes,
       CAST(count(*) * 64 AS BIGINT) AS total_thumb_bytes
FROM sampled
"""

# tire_assignment_events: stint k covers laps 10k+1 .. 10k+8, so a lap
# belongs to stint k = (lap-1)//10 iff (lap-1)%10 <= 7 (else the
# inter-stint gap -> NULL compound and it drops out of the aggregate).
ORACLE_SQL["tire_assignment_events"] = """
WITH laps AS (
  SELECT user_id AS driver_number,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lap,
         value AS lap_time
  FROM events WHERE event_type = 'view'
), tires AS (
  SELECT driver_number, lap_time,
         CASE WHEN (lap - 1) % 10 <= 7 THEN
           CASE CAST((lap - 1) // 10 AS INT) % 3
             WHEN 0 THEN 'SOFT' WHEN 1 THEN 'MEDIUM' ELSE 'HARD' END
         END AS compound
  FROM laps
)
SELECT driver_number, compound,
       round(sum(lap_time), 2) AS total_lap_time,
       count(*) AS n_laps
FROM tires
WHERE compound IS NOT NULL AND lap_time IS NOT NULL
GROUP BY 1, 2
"""

ORACLE_SQL["asof_tolerance_purchase"] = """
WITH views AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
), purchases AS (
  -- greatest-payload tie dedup (see asof_backward_purchase note)
  SELECT user_id, ts, max(event_id) AS purchase_id
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT v.event_id, v.user_id, epoch_us(v.ts) AS ts_us,
       CASE WHEN epoch_us(v.ts) - epoch_us(p.ts) <= 1800000000
            THEN p.purchase_id END AS purchase_id
FROM views v
ASOF LEFT JOIN purchases p ON v.user_id = p.user_id AND v.ts >= p.ts
"""

ORACLE_SQL["stratified_event_sample"] = """
SELECT event_type, count(*) AS n_sampled,
       round(sum(value), 2) AS sample_value
FROM events
WHERE ((md5_number(CAST(event_id AS VARCHAR)) % 281474976710656
        + 281474976710656) % 281474976710656) % 2147483647 % 8 = 0
GROUP BY event_type
"""

ORACLE_SQL["order_percentile_rank"] = """
WITH ranked AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         round(percent_rank() OVER w, 6) AS price_pct_rank,
         round(cume_dist() OVER w, 6) AS price_cume_dist,
         lead(o_totalprice) OVER w AS next_price
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice ASC, o_orderkey ASC)
)
SELECT * FROM ranked WHERE o_orderkey % 199 = 0
"""

ORACLE_SQL["neardup_clusters_distributed"] = ORACLE_SQL["neardup_clusters"]

ORACLE_SQL["doc_repetition_stats"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS token
  FROM documents
), per_tok AS (
  SELECT doc_id, token, count(*) AS c FROM toks GROUP BY 1, 2
), top AS (
  SELECT doc_id,
         CAST(max(c) AS DOUBLE) / sum(c) AS top_share,
         CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dup_ratio
  FROM per_tok GROUP BY doc_id
)
SELECT d.source, count(*) AS n_docs,
       round(avg(t.dup_ratio), 6) AS avg_dup_ratio,
       round(avg(t.top_share), 6) AS avg_top_share,
       round(max(t.top_share), 6) AS max_top_share
FROM documents d JOIN top t USING (doc_id)
GROUP BY d.source
"""

ORACLE_SQL["doc_rarity_score"] = f"""
WITH doc_tok AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, unnest({_TOKS}) AS token
    FROM documents
  )
), dfc AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM doc_tok GROUP BY 1
), n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, avg(n.n_docs / d.df) AS rarity
  FROM doc_tok t JOIN dfc d USING (token) CROSS JOIN n
  GROUP BY t.doc_id
)
SELECT doc.source, count(*) AS n_docs,
       round(avg(s.rarity), 4) AS avg_rarity,
       round(max(s.rarity), 4) AS max_rarity
FROM documents doc JOIN scored s USING (doc_id)
GROUP BY doc.source
"""

ORACLE_SQL["events_stream_dedup"] = """
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
GROUP BY event_type
"""

ORACLE_SQL["events_stream_attribution"] = """
SELECT v.event_id AS view_id, p.event_id AS purchase_id,
       round(p.value, 2) AS purchase_value
FROM events v JOIN events p
  ON v.event_type = 'view' AND p.event_type = 'purchase'
 AND v.user_id = p.user_id
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTES
"""

ORACLE_SQL["events_stateful_running_totals"] = """
SELECT user_id, count(*) AS n_events,
       round(sum(coalesce(value, 0.0)), 2) AS total_value
FROM events GROUP BY user_id
"""

ORACLE_SQL["events_sessionized_streamed"] = ORACLE_SQL["sessionize_events"]

# --- corpus-curation gates (operators/curation.py) ---

ORACLE_SQL["doc_chunking"] = f"""
WITH toks AS (
  {_DOC_T}
), st AS (
  SELECT doc_id, t,
         unnest(generate_series(0, greatest(len(t) - 1, 0), 48)) AS s
  FROM toks
)
SELECT doc_id,
       CAST(s // 48 AS INT) AS chunk_idx,
       CAST(s AS INT) AS start_token,
       CAST(len(t[s + 1:s + 64]) AS INT) AS n_tokens,
       {_tid("array_to_string(t[s + 1:s + 64], ' ')")} AS chunk_fp
FROM st
WHERE s = 0 OR len(t) > s - 48 + 64
"""

ORACLE_SQL["udtf_window_chunks"] = f"""
WITH tok AS (
  SELECT doc_id, {_TOKS} AS t FROM documents WHERE text IS NOT NULL
), s AS (
  SELECT doc_id, t, CAST(unnest(range(0, len(t), 16)) AS INT) AS start_token
  FROM tok
)
SELECT doc_id,
       CAST(start_token // 16 + 1 AS INT) AS chunk_no,
       start_token,
       array_to_string(list_slice(t, start_token + 1, start_token + 16), ' ')
         AS chunk_text,
       CAST(len(list_slice(t, start_token + 1, start_token + 16)) AS INT)
         AS n_tokens
FROM s
"""

def _packing_sql(cum_prev: str) -> str:
    """The two packing oracles differ ONLY in the prefix-sum window
    scope (per-source vs global doc order)."""
    return f"""
WITH n AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         {cum_prev}
  FROM n
)
SELECT doc_id, source, CAST(n_tokens AS INT) AS n_tokens,
       CAST(cum_prev // 512 AS BIGINT) AS bin_id,
       CAST(cum_prev % 512 AS INT) AS bin_offset,
       (cum_prev % 512 + n_tokens > 512) AS crosses_boundary
FROM c
"""


ORACLE_SQL["sequence_packing"] = _packing_sql(_CUM_PREV_SRC)

ORACLE_SQL["decontamination_overlap"] = f"""
WITH toks AS (
  {_DOC_T}
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(t) - 6), i -> array_to_string(t[i:i + 7], ' ')
         ))) AS g
  FROM toks
), ids AS (
  SELECT doc_id, {_tid('g')} AS gid FROM sh
), ev AS (
  SELECT DISTINCT gid FROM ids WHERE doc_id % 97 = 0
), hits AS (
  SELECT i.doc_id, count(DISTINCT i.gid) AS n_shared
  FROM ids i JOIN ev USING (gid)
  WHERE i.doc_id % 97 <> 0 GROUP BY i.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_shared, 0) AS INT) AS n_shared_grams,
       COALESCE(h.n_shared, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 97 <> 0
"""

ORACLE_SQL["language_quota_sample"] = """
SELECT doc_id, lang, CAST(rk AS INT) AS sample_rank FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
) WHERE rk <= 20
"""

ORACLE_SQL["stopword_scrub_stats"] = """
WITH f AS (
  SELECT source, len(string_split(text, ' ')) AS n_tok,
         list_filter(string_split(text, ' '),
                     x -> NOT list_contains(['the', 'a', 'of', 'and', 'to'], x))
           AS kept
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(sum(len(kept)) AS BIGINT) AS kept_tokens,
       CAST(sum(n_tok - len(kept)) AS BIGINT) AS removed_tokens,
       CAST(sum(COALESCE(list_sum(list_transform(kept, x -> len(x))), 0))
            AS BIGINT) AS kept_chars
FROM f GROUP BY source
"""

ORACLE_SQL["sequence_packing_global"] = _packing_sql(_CUM_PREV_GLOBAL)

# --- kmeans_ivf_training: 3 unrolled Lloyd iterations, mirroring
# operators/clustering.py bit-for-bit (ordered-fold distances via
# list_reduce, round-4 quantized centroid updates). ---

_KM_DIST = (
    "list_reduce(list_transform(list_zip({v}, {c}), "
    "x -> (x[1] - x[2]) * (x[1] - x[2])), (a, b) -> a + b)"
)

_km = [f'''WITH e AS (
  {_EMB_LT}
), c0 AS (
  SELECT CAST(vec_id AS BIGINT) AS cluster, v AS c
  FROM e ORDER BY vec_id LIMIT 8
)''']
for i in range(1, 4):
    dist = _KM_DIST.format(v="e.v", c="c.c")
    _km.append(f''', s{i} AS (
  SELECT e.vec_id, e.v, c.cluster, {dist} AS dist
  FROM e CROSS JOIN c{i - 1} c
), a{i} AS (
  SELECT vec_id, v, cluster, dist FROM (
    SELECT s.*, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
    FROM s{i} s
  ) WHERE rn = 1
)''')
    if i < 3:
        _km.append(f''', u{i} AS (
  SELECT cluster, d AS dim, round(avg(val), 4) AS cv FROM (
    SELECT cluster, unnest(v) AS val, generate_subscripts(v, 1) AS d FROM a{i}
  ) GROUP BY cluster, d
), c{i} AS (
  SELECT cluster, list(cv ORDER BY dim) AS c FROM u{i} GROUP BY cluster
)''')
_km.append('''
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, round(dist, 6) AS sq_dist
FROM a3
''')

ORACLE_SQL["kmeans_ivf_training"] = "".join(_km)

ORACLE_SQL["incremental_corpus_merge"] = f"""
WITH h AS (
  -- text IS NOT NULL on BOTH sides: a NULL hash under NOT IN's
  -- three-valued logic would drop every 'new' row (round-2 ADVICE).
  SELECT doc_id, source, {_tid('text')} AS hh FROM documents
  WHERE text IS NOT NULL
), base AS (
  SELECT * FROM h WHERE doc_id % 11 <> 0
), batch AS (
  SELECT * FROM h WHERE doc_id % 11 = 0
), batch_canon AS (
  SELECT min(doc_id) AS doc_id, arg_min(source, doc_id) AS source, hh
  FROM batch GROUP BY hh
)
SELECT doc_id, source, 'base' AS origin FROM base
UNION ALL
SELECT b.doc_id, b.source, 'new' AS origin
FROM batch_canon b
WHERE b.hh NOT IN (SELECT hh FROM base)
"""

ORACLE_SQL["media_png_decode_stats"] = """
WITH m AS (
  SELECT n_chars % 40 + 1 AS width, doc_id % 30 + 1 AS height
  FROM documents
)
SELECT 'image' AS kind, count(*) AS n_media,
       CAST(sum(width) AS BIGINT) AS sum_width,
       CAST(sum(height) AS BIGINT) AS sum_height,
       CAST(max(width) AS INT) AS max_width,
       CAST(max(height) AS INT) AS max_height
FROM m
"""

ORACLE_SQL["pii_scrub_stats"] = """
WITH seeded AS (
  SELECT source,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com at 10.' || CAST(doc_id % 256 AS VARCHAR)
              || '.0.' || CAST(doc_id % 100 AS VARCHAR)
              || ' or +49171' || lpad(CAST(doc_id % 1000 AS VARCHAR), 4, '0')
           AS text
  FROM documents
), pats AS (
  SELECT '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}' AS p_email,
         '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b' AS p_ipv4,
         '\\+\\d{9,15}\\b' AS p_phone
), staged AS (
  -- sequential semantics: each kind counts on the text as it stands
  SELECT source, text AS t0,
         regexp_replace(text, p_email, '<EMAIL>', 'g') AS t1,
         p_email, p_ipv4, p_phone
  FROM seeded, pats
), staged2 AS (
  SELECT *, regexp_replace(t1, p_ipv4, '<IPV4>', 'g') AS t2 FROM staged
), m AS (
  SELECT source,
         len(regexp_extract_all(t0, p_email)) AS n_email,
         len(regexp_extract_all(t1, p_ipv4)) AS n_ipv4,
         len(regexp_extract_all(t2, p_phone)) AS n_phone,
         (len(t0) - len(regexp_replace(t0, p_email, '', 'g')))
       + (len(t1) - len(regexp_replace(t1, p_ipv4, '', 'g')))
       + (len(t2) - len(regexp_replace(t2, p_phone, '', 'g')))
           AS chars_redacted,
         len(regexp_replace(t2, p_phone, '<PHONE>', 'g')) AS scrubbed_len
  FROM staged2
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_email) AS BIGINT) AS emails,
       CAST(sum(n_ipv4) AS BIGINT) AS ipv4s,
       CAST(sum(n_phone) AS BIGINT) AS phones,
       CAST(sum(chars_redacted) AS BIGINT) AS chars_redacted,
       CAST(sum(scrubbed_len) AS BIGINT) AS scrubbed_chars
FROM m GROUP BY source
"""

ORACLE_SQL["span_dedup_stats"] = """
WITH t AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks
  FROM documents WHERE text IS NOT NULL
), s AS (
  SELECT doc_id, source,
         CAST(g.i / 16 AS INT) AS span_idx,
         array_to_string(list_slice(toks, g.i + 1, g.i + 16), ' ') AS span
  FROM t, LATERAL unnest(generate_series(0, greatest(len(toks) - 1, 0), 16))
         AS g(i)
), r AS (
  SELECT *, row_number() OVER (PARTITION BY md5(span)
              ORDER BY doc_id, span_idx) AS rk
  FROM s
), rebuilt AS (
  SELECT doc_id, source,
         string_agg(span, ' ' ORDER BY span_idx)
           FILTER (WHERE rk = 1) AS text,
         count(*) AS n_spans,
         count(*) FILTER (WHERE rk = 1) AS kept_spans
  FROM r GROUP BY doc_id, source
)
-- engine keeps NULL-text docs (kept_spans 0); mirror via left join
SELECT d.source,
       count(*) AS n_docs,
       count(rb.text) AS docs_with_text,
       CAST(sum(rb.n_spans) AS BIGINT) AS total_spans,
       CAST(sum(COALESCE(rb.kept_spans, 0)) AS BIGINT) AS kept_spans,
       CAST(sum(len(rb.text)) AS BIGINT) AS rebuilt_chars
FROM documents d LEFT JOIN rebuilt rb USING (doc_id)
GROUP BY d.source
"""

ORACLE_SQL["bloom_decontamination_stats"] = f"""
WITH toks AS (
  {_DOC_T}
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(t) - 6), i -> array_to_string(t[i:i + 7], ' ')
         ))) AS g
  FROM toks
), seeded AS (
  SELECT doc_id, g, s,
         CAST((((md5_number(CAST(s AS VARCHAR) || ':' || g) % 281474976710656) + 281474976710656) % 281474976710656) % 65536 AS BIGINT) AS bit
  FROM sh, UNNEST([0, 1, 2, 3]) AS u(s)
), ev_bits AS (
  SELECT DISTINCT bit FROM seeded WHERE doc_id % 97 = 0
), corpus AS (
  SELECT doc_id, g,
         bool_and(bit IN (SELECT bit FROM ev_bits)) AS hit
  FROM seeded WHERE doc_id % 97 <> 0
  GROUP BY doc_id, g
), per_doc AS (
  SELECT doc_id,
         count(*) AS n_grams,
         count(*) FILTER (WHERE hit) AS n_flagged
  FROM corpus GROUP BY doc_id
)
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN COALESCE(p.n_flagged, 0) > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS contaminated_docs,
       CAST(sum(COALESCE(p.n_grams, 0)) AS BIGINT) AS grams_checked,
       CAST(sum(COALESCE(p.n_flagged, 0)) AS BIGINT) AS grams_flagged
FROM documents d LEFT JOIN per_doc p USING (doc_id)
WHERE d.doc_id % 97 <> 0
GROUP BY d.source
"""

ORACLE_SQL["token_budget_sample_docs"] = """
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS hk
  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
), c AS (
  SELECT doc_id, lang, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY hk, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev_tokens
  FROM t
)
SELECT doc_id, lang, n_tokens, cum_prev_tokens
FROM c WHERE cum_prev_tokens < 3000
"""

ORACLE_SQL["source_similarity_matrix"] = """
WITH toks AS (
  SELECT source, string_split(text, ' ') AS t FROM documents
  WHERE text IS NOT NULL
), sh AS (
  SELECT source, unnest(list_distinct(t)) AS shingle FROM toks
), ids AS (
  SELECT source, CAST((((md5_number(shingle) % 281474976710656) + 281474976710656) % 281474976710656) % 2147483647 AS BIGINT) AS sid FROM sh
), sig AS (
  SELECT source, CAST(min((1 * sid + 7) % 2147483647) AS BIGINT) AS sig_0, CAST(min((3 * sid + 10) % 2147483647) AS BIGINT) AS sig_1, CAST(min((5 * sid + 13) % 2147483647) AS BIGINT) AS sig_2, CAST(min((7 * sid + 16) % 2147483647) AS BIGINT) AS sig_3, CAST(min((9 * sid + 19) % 2147483647) AS BIGINT) AS sig_4, CAST(min((11 * sid + 22) % 2147483647) AS BIGINT) AS sig_5, CAST(min((13 * sid + 25) % 2147483647) AS BIGINT) AS sig_6, CAST(min((15 * sid + 28) % 2147483647) AS BIGINT) AS sig_7, CAST(min((17 * sid + 31) % 2147483647) AS BIGINT) AS sig_8, CAST(min((19 * sid + 34) % 2147483647) AS BIGINT) AS sig_9, CAST(min((21 * sid + 37) % 2147483647) AS BIGINT) AS sig_10, CAST(min((23 * sid + 40) % 2147483647) AS BIGINT) AS sig_11
  FROM ids GROUP BY source
), melted AS (
SELECT source, 0 AS i, sig_0 AS v FROM sig
UNION ALL
SELECT source, 1 AS i, sig_1 AS v FROM sig
UNION ALL
SELECT source, 2 AS i, sig_2 AS v FROM sig
UNION ALL
SELECT source, 3 AS i, sig_3 AS v FROM sig
UNION ALL
SELECT source, 4 AS i, sig_4 AS v FROM sig
UNION ALL
SELECT source, 5 AS i, sig_5 AS v FROM sig
UNION ALL
SELECT source, 6 AS i, sig_6 AS v FROM sig
UNION ALL
SELECT source, 7 AS i, sig_7 AS v FROM sig
UNION ALL
SELECT source, 8 AS i, sig_8 AS v FROM sig
UNION ALL
SELECT source, 9 AS i, sig_9 AS v FROM sig
UNION ALL
SELECT source, 10 AS i, sig_10 AS v FROM sig
UNION ALL
SELECT source, 11 AS i, sig_11 AS v FROM sig
)
SELECT a.source AS group_a, b.source AS group_b,
       CAST(count(*) AS INT) AS n_agree,
       round(count(*) / 12.0, 4) AS est_jaccard
FROM melted a JOIN melted b ON a.i = b.i AND a.v = b.v AND a.source < b.source
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Round 3: recipe filtering, vocabulary audit, drift, leakage, embedding QA
# --------------------------------------------------------------------------

ORACLE_SQL["quality_quantile_filter_docs"] = """
WITH thr AS (
  SELECT source, quantile_cont(n_chars, 0.25) AS t
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source, d.n_chars AS score, round(t.t, 6) AS threshold
FROM documents d JOIN thr t USING (source)
WHERE d.n_chars >= t.t
"""

ORACLE_SQL["heavy_hitter_terms_by_source"] = fr"""
WITH toks AS (
  SELECT source, unnest({_TOKS}) AS term
  FROM documents
), counts AS (
  SELECT source, term, count(*) AS term_count FROM toks GROUP BY 1, 2
), ranked AS (
  SELECT *, CAST(row_number() OVER (
               PARTITION BY source ORDER BY term_count DESC, term) AS INT) AS rk
  FROM counts
)
SELECT source, term, term_count, rk FROM ranked WHERE rk <= 10
"""

ORACLE_SQL["source_term_drift"] = fr"""
WITH toks AS (
  SELECT source, unnest({_TOKS}) AS term
  FROM documents
), gt AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS gc FROM toks GROUP BY 1, 2
), tt AS (
  SELECT term, CAST(sum(gc) AS BIGINT) AS tc FROM gt GROUP BY 1
), gn AS (
  SELECT source, CAST(sum(gc) AS BIGINT) AS gn FROM gt GROUP BY 1
), cn AS (
  SELECT CAST(sum(gc) AS BIGINT) AS cn FROM gt
)
SELECT g.source, count(*) AS n_terms,
       round((sum(abs(CAST(g.gc AS DOUBLE) / n.gn - CAST(t.tc AS DOUBLE) / c.cn))
              + (1 - sum(CAST(t.tc AS DOUBLE) / c.cn))) / 2, 6) AS tvd
FROM gt g JOIN tt t USING (term) JOIN gn n USING (source) CROSS JOIN cn c
GROUP BY g.source
"""

# Seeded leakage: every 7th doc mirrored into a 'mirror' source under a
# shifted id; detection = content hash held by >= 2 distinct sources.
ORACLE_SQL["cross_source_leakage"] = f"""
WITH seeded AS (
  SELECT doc_id, source, text FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT doc_id + 1000000000, 'mirror', text FROM documents
  WHERE text IS NOT NULL AND doc_id % 7 = 0
), h AS (
  SELECT CAST(((md5_number(text) % {_M48} + {_M48}) % {_M48}) AS BIGINT)
           AS content_hash,
         source, doc_id
  FROM seeded
)
SELECT content_hash, count(DISTINCT source) AS n_sources,
       count(*) AS n_docs, min(doc_id) AS first_doc_id
FROM h
GROUP BY content_hash
HAVING count(DISTINCT source) >= 2
"""

ORACLE_SQL["embedding_label_outliers"] = """
WITH dims AS (
  SELECT vec_id, label, g.i - 1 AS dim_idx, CAST(embedding[g.i] AS DOUBLE) AS v
  FROM embeddings CROSS JOIN generate_series(1, 64) AS g(i)
  WHERE g.i <= len(embedding)
), cents AS (
  SELECT label, dim_idx, round(avg(v), 6) AS c FROM dims GROUP BY 1, 2
), sq AS (
  SELECT d.vec_id, d.label, round(sum((d.v - c.c) * (d.v - c.c)), 6) AS sq_dist
  FROM dims d JOIN cents c USING (label, dim_idx)
  GROUP BY 1, 2
), thr AS (
  SELECT label, round(quantile_cont(sq_dist, 0.95), 6) AS label_p95
  FROM sq GROUP BY 1
)
SELECT s.vec_id, s.label, s.sq_dist, t.label_p95,
       s.sq_dist > t.label_p95 AS is_outlier
FROM sq s JOIN thr t USING (label)
"""

ORACLE_SQL["events_stream_static_enrich"] = """
SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS segment,
       count(*) AS n_events, round(sum(e.value), 2) AS total_value
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""

ORACLE_SQL["disjunctive_part_revenue"] = f"""
SELECT p.p_brand, count(*) AS n_lines,
       {_qsum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 40
       AND l.l_quantity BETWEEN 20 AND 50)
GROUP BY 1
"""

ORACLE_SQL["idle_rich_customers"] = f"""
WITH thr AS (
  SELECT avg(c_acctbal) AS t FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey, count(*) AS n_custs,
       {_qsum("c.c_acctbal", 2)} AS total_balance
FROM customer c CROSS JOIN thr
WHERE c.c_acctbal > thr.t
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY 1
"""

ORACLE_SQL["event_funnel_conversion"] = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
), s AS (
  SELECT user_id, min(us) AS t_signup FROM e
  WHERE event_type = 'signup' GROUP BY 1
), v AS (
  SELECT e.user_id, min(e.us) AS t_view, min(s.t_signup) AS t_signup
  FROM e JOIN s USING (user_id)
  WHERE e.event_type = 'view' AND e.us > s.t_signup
  GROUP BY 1
), p AS (
  SELECT e.user_id, min(e.us) AS t_purchase, min(v.t_view) AS t_view
  FROM e JOIN v USING (user_id)
  WHERE e.event_type = 'purchase' AND e.us > v.t_view
  GROUP BY 1
), stage AS (
  SELECT '1_signup' AS stage, user_id, CAST(NULL AS BIGINT) AS lat_us FROM s
  UNION ALL
  SELECT '2_view', user_id, t_view - t_signup FROM v
  UNION ALL
  SELECT '3_purchase', user_id, t_purchase - t_view FROM p
)
SELECT stage, count(*) AS n_users,
       round(quantile_cont(lat_us, 0.5) / 1000000, 2) AS median_latency_s
FROM stage GROUP BY stage
"""

ORACLE_SQL["user_cohort_retention"] = """
WITH e AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), fd AS (
  SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1
)
SELECT CAST(fd.cohort_day - DATE '1970-01-01' AS INT) AS cohort_epoch_day,
       CAST(e.day - fd.cohort_day AS INT) AS day_offset,
       count(DISTINCT e.user_id) AS n_users
FROM e JOIN fd USING (user_id)
GROUP BY 1, 2
"""

ORACLE_SQL["fuzzy_neardup_pairs"] = (
    _MINHASH_BASE_K3.format(sig_exprs=_SIG_EXPRS)
    + _DUP_GRP_SQL
    + f""", bands AS (
{_BAND_SELECTS_REPS}
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  UNION ALL
  SELECT id_a, id_b FROM stars
), pref AS (
  SELECT doc_id, substring(text, 1, 64) AS p FROM documents
  WHERE text IS NOT NULL
)
SELECT p1.doc_id AS id_a, p2.doc_id AS id_b,
       CAST(levenshtein(p1.p, p2.p) AS INT) AS edit_distance
FROM pairs
JOIN pref p1 ON pairs.id_a = p1.doc_id
JOIN pref p2 ON pairs.id_b = p2.doc_id
WHERE levenshtein(p1.p, p2.p) <= 24"""
)


# embedding_top_pc: 3 unrolled power iterations mirroring
# operators/clustering.power_iteration_pc (ordered-fold dots,
# round-4 quantized per-dim sums, round-6 normalized direction).
ORACLE_SQL["embedding_top_pc"] = f"""
WITH base AS (
  {_EMB_LT}
), w0 AS (
  SELECT list_transform(range(64), i -> 1.0) AS w
), s0 AS (
  SELECT b.v,
         list_reduce(list_transform(list_zip(b.v, w0.w),
                                    x -> x[1] * x[2]), (a, c) -> a + c) AS s
  FROM base b CROSS JOIN w0
), d0 AS (
  SELECT CAST(u.i - 1 AS INT) AS dim, round(sum(s0.s * s0.v[u.i]), 4) AS wj
  FROM s0 CROSS JOIN generate_series(1, 64) u(i)
  WHERE u.i <= len(s0.v)
  GROUP BY 1
), wr0 AS (
  SELECT list(wj ORDER BY dim) AS wraw FROM d0
), w1 AS (
  SELECT list_transform(wraw, x -> round(
           CASE WHEN sqrt(list_reduce(list_transform(wraw, y -> y * y),
                                      (a, c) -> a + c)) <> 0
                THEN x / sqrt(list_reduce(list_transform(wraw, y -> y * y),
                                          (a, c) -> a + c))
                ELSE x END, 6))
         AS w
  FROM wr0
), s1 AS (
  SELECT b.v,
         list_reduce(list_transform(list_zip(b.v, w1.w),
                                    x -> x[1] * x[2]), (a, c) -> a + c) AS s
  FROM base b CROSS JOIN w1
), d1 AS (
  SELECT CAST(u.i - 1 AS INT) AS dim, round(sum(s1.s * s1.v[u.i]), 4) AS wj
  FROM s1 CROSS JOIN generate_series(1, 64) u(i)
  WHERE u.i <= len(s1.v)
  GROUP BY 1
), wr1 AS (
  SELECT list(wj ORDER BY dim) AS wraw FROM d1
), w2 AS (
  SELECT list_transform(wraw, x -> round(
           CASE WHEN sqrt(list_reduce(list_transform(wraw, y -> y * y),
                                      (a, c) -> a + c)) <> 0
                THEN x / sqrt(list_reduce(list_transform(wraw, y -> y * y),
                                          (a, c) -> a + c))
                ELSE x END, 6))
         AS w
  FROM wr1
), s2 AS (
  SELECT b.v,
         list_reduce(list_transform(list_zip(b.v, w2.w),
                                    x -> x[1] * x[2]), (a, c) -> a + c) AS s
  FROM base b CROSS JOIN w2
), d2 AS (
  SELECT CAST(u.i - 1 AS INT) AS dim, round(sum(s2.s * s2.v[u.i]), 4) AS wj
  FROM s2 CROSS JOIN generate_series(1, 64) u(i)
  WHERE u.i <= len(s2.v)
  GROUP BY 1
), wr2 AS (
  SELECT list(wj ORDER BY dim) AS wraw FROM d2
)
SELECT CAST(u.i - 1 AS INT) AS dim_idx,
       round(CASE WHEN sqrt(list_reduce(list_transform(wraw, y -> y * y),
                                         (a, c) -> a + c)) <> 0
                  THEN wraw[u.i] / sqrt(list_reduce(
                         list_transform(wraw, y -> y * y), (a, c) -> a + c))
                  ELSE wraw[u.i] END, 6) AS pc1,
       round(sqrt(list_reduce(list_transform(wraw, y -> y * y),
                              (a, c) -> a + c)), 4) AS eigenvalue
FROM wr2 CROSS JOIN generate_series(1, 64) u(i)
WHERE u.i <= len(wraw)
"""

ORACLE_SQL["normalized_dedup_docs"] = f"""
WITH n AS (
  SELECT doc_id, source,
         CAST(((md5_number(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))
           % {_M48} + {_M48}) % {_M48}) AS BIGINT) AS norm_key
  FROM documents WHERE text IS NOT NULL
)
SELECT norm_key, count(*) AS n_docs, min(doc_id) AS canonical_doc_id,
       count(DISTINCT source) AS n_sources
FROM n GROUP BY norm_key
"""

ORACLE_SQL["clipped_value_stats"] = """
WITH b AS (
  SELECT event_type, quantile_cont(value, 0.01) AS lo,
         quantile_cont(value, 0.99) AS hi
  FROM events GROUP BY 1
)
SELECT e.event_type, count(*) AS n_rows,
       round(avg(greatest(least(e.value, b.hi), b.lo)), 4) AS clipped_mean,
       CAST(sum(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_low,
       CAST(sum(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_high
FROM events e JOIN b USING (event_type)
GROUP BY e.event_type
"""


# Shared PQ training replay (per-subspace keyed k-means, 2 unrolled
# iterations) — ONE definition for both PQ gates, so a future fix to
# seeding/tie-break/rounding cannot diverge between them
# (code-review finding).
def _pq_train_sql(where: str = "") -> str:
    """PQ-training replay (m=8, k=4, iters=2) over the embeddings
    view, optionally restricted by ``where`` — the delta-refresh gate
    trains on the corpus split only, everything else on the full
    table (one copy of the training chain, not two drifting ones)."""
    return f"""WITH e AS (
  {_EMB_LT}{where}
), sub AS (
  SELECT vec_id, CAST(s.i AS INT) AS sub_id,
         v[(s.i * 8 + 1):(s.i * 8 + 8)] AS sv
  FROM e CROSS JOIN generate_series(0, 7) s(i)
), c0 AS (
  SELECT sub_id, CAST(vec_id AS BIGINT) AS cluster, sv AS c FROM sub
  WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id LIMIT 4)
), sc1 AS (
  SELECT s.vec_id, s.sub_id, s.sv, c.cluster, list_reduce(list_transform(list_zip(s.sv, c.c), x -> (x[1] - x[2]) * (x[1] - x[2])), (a, b) -> a + b) AS dist
  FROM sub s JOIN c0 c USING (sub_id)
), a1 AS (
  SELECT vec_id, sub_id, sv, cluster, dist FROM (
    SELECT x.*, row_number() OVER (
      PARTITION BY vec_id, sub_id ORDER BY dist, cluster) AS rn
    FROM sc1 x
  ) WHERE rn = 1
), u1 AS (
  SELECT sub_id, cluster, d AS dim, round(avg(val), 4) AS cv FROM (
    SELECT sub_id, cluster, unnest(sv) AS val,
           generate_subscripts(sv, 1) AS d
    FROM a1
  ) GROUP BY 1, 2, 3
), c1 AS (
  SELECT sub_id, cluster, list(cv ORDER BY dim) AS c FROM u1
  GROUP BY 1, 2
), sc2 AS (
  SELECT s.vec_id, s.sub_id, s.sv, c.cluster, list_reduce(list_transform(list_zip(s.sv, c.c), x -> (x[1] - x[2]) * (x[1] - x[2])), (a, b) -> a + b) AS dist
  FROM sub s JOIN c1 c USING (sub_id)
), a2 AS (
  SELECT vec_id, sub_id, sv, cluster, dist FROM (
    SELECT x.*, row_number() OVER (
      PARTITION BY vec_id, sub_id ORDER BY dist, cluster) AS rn
    FROM sc2 x
  ) WHERE rn = 1
)"""


_PQ_TRAIN_SQL = _pq_train_sql()

# pq_encode_embeddings: codes + quantization error per subspace.
ORACLE_SQL["pq_encode_embeddings"] = _PQ_TRAIN_SQL + """
SELECT vec_id, sub_id, CAST(cluster AS BIGINT) AS code,
       round(dist, 6) AS sq_dist
FROM a2
"""

# pq_adc_topk: training replay + per-query LUT + ADC scoring.
ORACLE_SQL["pq_adc_topk"] = _PQ_TRAIN_SQL + """, lut AS (
  SELECT q.vec_id AS q_id, q.sub_id, c.cluster AS code, list_reduce(list_transform(list_zip(q.sv, c.c), x -> (x[1] - x[2]) * (x[1] - x[2])), (a, b) -> a + b) AS ld
  FROM sub q JOIN c1 c USING (sub_id)
  WHERE q.vec_id < 10
), scored AS (
  SELECT l.q_id, a.vec_id, round(sum(l.ld), 6) AS adc_dist
  FROM a2 a JOIN lut l ON a.sub_id = l.sub_id AND a.cluster = l.code
  GROUP BY 1, 2
)
SELECT q_id, vec_id, adc_dist, CAST(rk AS INT) AS rk FROM (
  SELECT s.*, row_number() OVER (
    PARTITION BY q_id ORDER BY adc_dist, vec_id) AS rk
  FROM scored s
) WHERE rk <= 5
"""

# ivf_pq_topk: cell-restricted ADC — the label joins into both the
# LUT and the code table, so scoring only fans out within the
# query's probed cell. The `e` CTE in _PQ_TRAIN_SQL carries labels
# implicitly via the embeddings view.
ORACLE_SQL["ivf_pq_topk"] = _PQ_TRAIN_SQL.replace(
    "SELECT vec_id, list_transform",
    "SELECT vec_id, label, list_transform",
) + ', lc AS (\n  SELECT a.vec_id, a.sub_id, a.cluster, e.label\n  FROM a2 a JOIN e USING (vec_id)\n), lut AS (\n  SELECT q.vec_id AS q_id, e.label, q.sub_id, c.cluster AS code,\n         list_reduce(list_transform(list_zip(q.sv, c.c),\n                     x -> (x[1] - x[2]) * (x[1] - x[2])), (a, b) -> a + b) AS ld\n  FROM sub q JOIN e ON q.vec_id = e.vec_id JOIN c1 c USING (sub_id)\n  WHERE q.vec_id < 10\n), scored AS (\n  SELECT l.q_id, a.vec_id, round(sum(l.ld), 6) AS adc_dist\n  FROM lc a JOIN lut l\n    ON a.sub_id = l.sub_id AND a.cluster = l.code AND a.label = l.label\n  GROUP BY 1, 2\n)\nSELECT q_id, vec_id, adc_dist, CAST(rk AS INT) AS rk FROM (\n  SELECT s.*, row_number() OVER (\n    PARTITION BY q_id ORDER BY adc_dist, vec_id) AS rk\n  FROM scored s\n) WHERE rk <= 5\n'



# ivf_pq_topk_indexed: the stored-index probe path is value-identical
# to the recompute path BY CONSTRUCTION (deterministic pq_encode
# training; array<double> centroids round-trip parquet bit-exactly;
# tests/test_ann_index.py asserts frame equality), so it hashes
# against the SAME oracle text — one semantic truth for both
# execution shapes, the incremental_dedup_indexed precedent.
ORACLE_SQL["ivf_pq_topk_indexed"] = ORACLE_SQL["ivf_pq_topk"]


# ann_multiprobe_recall: replay the stored-index MULTIPROBE path —
# PQ training (shared CTEs), coarse-cell centroids (round(avg,4), the
# kmeans quantization recipe), per-query nearest-nprobe cells for
# nprobe in {1,2,4}, cell-restricted ADC top-5 — and score each
# against the exact squared-L2 top-5 (ordered folds, ties on the id;
# self included on both sides). Window sort keys are pre-projected
# below the windows (the round-9 wide-column pitfall).
ORACLE_SQL["ann_multiprobe_recall"] = _PQ_TRAIN_SQL.replace(
    "SELECT vec_id, list_transform",
    "SELECT vec_id, label, list_transform",
) + """, lc AS (
  SELECT a.vec_id, a.sub_id, a.cluster, e.label
  FROM a2 a JOIN e USING (vec_id)
), cellc AS (
  SELECT label, list(cv ORDER BY dim) AS c FROM (
    SELECT label, d AS dim, round(avg(val), 4) AS cv FROM (
      SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS d
      FROM e
    ) GROUP BY 1, 2
  ) GROUP BY label
), np(nprobe) AS (
  SELECT * FROM (VALUES (1), (2), (4))
), qcell AS (
  SELECT q.vec_id AS q_id, c.label,
         list_reduce(list_transform(list_zip(q.v, c.c),
                     x -> (x[1] - x[2]) * (x[1] - x[2])),
                     (acc, t) -> acc + t) AS cd
  FROM e q CROSS JOIN cellc c WHERE q.vec_id < 10
), qprobe AS (
  SELECT n.nprobe, x.q_id, x.label FROM (
    SELECT q_id, label, row_number() OVER (
      PARTITION BY q_id ORDER BY cd, label) AS crk
    FROM qcell
  ) x JOIN np n ON x.crk <= n.nprobe
), lut AS (
  SELECT q.vec_id AS q_id, q.sub_id, c.cluster AS code,
         list_reduce(list_transform(list_zip(q.sv, c.c),
                     x -> (x[1] - x[2]) * (x[1] - x[2])),
                     (acc, t) -> acc + t) AS ld
  FROM sub q JOIN c1 c USING (sub_id)
  WHERE q.vec_id < 10
), scored AS (
  SELECT p.nprobe, l.q_id, a.vec_id, round(sum(l.ld), 6) AS adc_dist
  FROM qprobe p
  JOIN lc a ON a.label = p.label
  JOIN lut l ON l.q_id = p.q_id AND l.sub_id = a.sub_id
            AND l.code = a.cluster
  GROUP BY 1, 2, 3
), approx AS (
  SELECT nprobe, q_id, vec_id AS neighbor_id FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY nprobe, q_id ORDER BY adc_dist, vec_id) AS rk
    FROM scored s
  ) WHERE rk <= 5
), ed AS (
  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
         list_reduce(list_transform(list_zip(a.v, b.v),
                     x -> (x[1] - x[2]) * (x[1] - x[2])),
                     (acc, t) -> acc + t) AS d
  FROM e a JOIN e b ON a.vec_id < 10
), exact AS (
  SELECT q_id, neighbor_id FROM (
    SELECT q_id, neighbor_id, row_number() OVER (
      PARTITION BY q_id ORDER BY d, neighbor_id) AS rk
    FROM ed
  ) WHERE rk <= 5
), nq AS (
  SELECT count(DISTINCT q_id) AS n_queries FROM exact
), hits AS (
  SELECT ap.nprobe, count(*) AS n_hits
  FROM approx ap
  WHERE EXISTS (
    SELECT 1 FROM exact x
    WHERE x.q_id = ap.q_id AND x.neighbor_id = ap.neighbor_id
  )
  GROUP BY 1
), rec AS (
  SELECT CAST(h.nprobe AS INT) AS nprobe,
         CAST(nq.n_queries AS BIGINT) AS n_queries,
         CAST(h.n_hits AS BIGINT) AS n_hits,
         round(h.n_hits * 1.0 / (nq.n_queries * 5), 4) AS recall_at_5
  FROM hits h CROSS JOIN nq
)
SELECT nprobe, n_queries, n_hits, recall_at_5,
       round(recall_at_5 - first_value(recall_at_5) OVER (
         ORDER BY nprobe), 4) AS gain_vs_nprobe1
FROM rec
"""


# ann_index_delta_topk: the INCREMENTAL index-maintenance replay —
# PQ codebooks and coarse-cell centroids train on the CORPUS split
# only (every 97th vector held out as the ingest batch); the batch is
# then encoded with the STORED codebook (nearest centroid per
# subspace, ties to the smaller code — identical to the final
# training assignment rule) and placed in the nearest stored cell
# (ties to the smaller cell — the IVF insert), exactly what
# refresh_ann_index appends as a delta. Queries are the batch vectors
# themselves probing nprobe=2 cells of base ∪ delta: batch vectors
# exist ONLY in the delta, so every batch id appearing as a neighbor
# proves the delta is unioned and pruned-probed like the base.
#: Shared replay of the incremental-index state (corpus-trained
#: codebooks/cells + stored-codebook batch encode + nearest-cell
#: insert) — ONE copy behind ann_index_delta_topk AND
#: ann_delta_recall (the scoring/recall tails differ).
_ANN_DELTA_CTES = """, lc AS (
  SELECT a.vec_id, a.sub_id, a.cluster, e.label
  FROM a2 a JOIN e USING (vec_id)
), cellc AS (
  SELECT label, list(cv ORDER BY dim) AS c FROM (
    SELECT label, d AS dim, round(avg(val), 4) AS cv FROM (
      SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS d
      FROM e
    ) GROUP BY 1, 2
  ) GROUP BY label
), b AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id % 97 = 0
), bsub AS (
  SELECT vec_id, CAST(s.i AS INT) AS sub_id,
         v[(s.i * 8 + 1):(s.i * 8 + 8)] AS sv
  FROM b CROSS JOIN generate_series(0, 7) s(i)
), bcode AS (
  SELECT vec_id, sub_id, cluster FROM (
    SELECT q.vec_id, q.sub_id, c.cluster, row_number() OVER (
      PARTITION BY q.vec_id, q.sub_id ORDER BY
        list_reduce(list_transform(list_zip(q.sv, c.c),
          x -> (x[1] - x[2]) * (x[1] - x[2])), (a, b) -> a + b),
        c.cluster) AS rn
    FROM bsub q JOIN c1 c USING (sub_id)
  ) WHERE rn = 1
), bcell AS (
  SELECT vec_id, label FROM (
    SELECT q.vec_id, c.label, row_number() OVER (
      PARTITION BY q.vec_id ORDER BY
        list_reduce(list_transform(list_zip(q.v, c.c),
          x -> (x[1] - x[2]) * (x[1] - x[2])), (acc, t) -> acc + t),
        c.label) AS rn
    FROM b q CROSS JOIN cellc c
  ) WHERE rn = 1
), allc AS (
  SELECT vec_id, sub_id, cluster, label FROM lc
  UNION ALL
  SELECT bc.vec_id, bc.sub_id, bc.cluster, bl.label
  FROM bcode bc JOIN bcell bl USING (vec_id)
)"""

_ANN_DELTA_PREFIX = _pq_train_sql(" WHERE vec_id % 97 <> 0").replace(
    "SELECT vec_id, list_transform",
    "SELECT vec_id, label, list_transform",
) + _ANN_DELTA_CTES

ORACLE_SQL["ann_index_delta_topk"] = _ANN_DELTA_PREFIX + """, qprobe AS (
  SELECT q_id, label FROM (
    SELECT q.vec_id AS q_id, c.label, row_number() OVER (
      PARTITION BY q.vec_id ORDER BY
        list_reduce(list_transform(list_zip(q.v, c.c),
          x -> (x[1] - x[2]) * (x[1] - x[2])), (acc, t) -> acc + t),
        c.label) AS crk
    FROM b q CROSS JOIN cellc c
  ) WHERE crk <= 2
), lut AS (
  SELECT q.vec_id AS q_id, q.sub_id, c.cluster AS code,
         list_reduce(list_transform(list_zip(q.sv, c.c),
           x -> (x[1] - x[2]) * (x[1] - x[2])), (a, b) -> a + b) AS ld
  FROM bsub q JOIN c1 c USING (sub_id)
), scored AS (
  SELECT p.q_id, a.vec_id, round(sum(l.ld), 6) AS adc_dist
  FROM qprobe p
  JOIN allc a ON a.label = p.label
  JOIN lut l ON l.q_id = p.q_id AND l.sub_id = a.sub_id
            AND l.code = a.cluster
  GROUP BY 1, 2
)
SELECT q_id, vec_id, adc_dist, CAST(rk AS INT) AS rk FROM (
  SELECT s.*, row_number() OVER (
    PARTITION BY q_id ORDER BY adc_dist, vec_id) AS rk
  FROM scored s
) WHERE rk <= 5
"""


# ann_delta_recall: recall@5 of the DELTA-inserted vectors querying
# base ∪ delta at nprobe ∈ {1,2,4}, scored against the exact
# squared-L2 top-5 over ALL vectors (corpus ∪ batch) — the number
# that prices the add-after-train trade (frozen codebooks / cell
# centroids between rebuilds). Shares _ANN_DELTA_PREFIX with the
# topk gate; only the probe/recall tail differs.
ORACLE_SQL["ann_delta_recall"] = _ANN_DELTA_PREFIX + """, np(nprobe) AS (
  SELECT * FROM (VALUES (1), (2), (4))
), qcell AS (
  SELECT q.vec_id AS q_id, c.label,
         list_reduce(list_transform(list_zip(q.v, c.c),
           x -> (x[1] - x[2]) * (x[1] - x[2])), (acc, t) -> acc + t) AS cd
  FROM b q CROSS JOIN cellc c
), qprobe AS (
  SELECT n.nprobe, x.q_id, x.label FROM (
    SELECT q_id, label, row_number() OVER (
      PARTITION BY q_id ORDER BY cd, label) AS crk
    FROM qcell
  ) x JOIN np n ON x.crk <= n.nprobe
), lut AS (
  SELECT q.vec_id AS q_id, q.sub_id, c.cluster AS code,
         list_reduce(list_transform(list_zip(q.sv, c.c),
           x -> (x[1] - x[2]) * (x[1] - x[2])), (a, b) -> a + b) AS ld
  FROM bsub q JOIN c1 c USING (sub_id)
), scored AS (
  SELECT p.nprobe, p.q_id, a.vec_id, round(sum(l.ld), 6) AS adc_dist
  FROM qprobe p
  JOIN allc a ON a.label = p.label
  JOIN lut l ON l.q_id = p.q_id AND l.sub_id = a.sub_id
            AND l.code = a.cluster
  GROUP BY 1, 2, 3
), approx AS (
  SELECT nprobe, q_id, vec_id AS neighbor_id FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY nprobe, q_id ORDER BY adc_dist, vec_id) AS rk
    FROM scored s
  ) WHERE rk <= 5
), e_all AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), ed AS (
  SELECT q.vec_id AS q_id, a.vec_id AS neighbor_id,
         list_reduce(list_transform(list_zip(q.v, a.v),
           x -> (x[1] - x[2]) * (x[1] - x[2])), (acc, t) -> acc + t) AS d
  FROM b q CROSS JOIN e_all a
), exact AS (
  SELECT q_id, neighbor_id FROM (
    SELECT q_id, neighbor_id, row_number() OVER (
      PARTITION BY q_id ORDER BY d, neighbor_id) AS rk
    FROM ed
  ) WHERE rk <= 5
), nq AS (
  SELECT count(DISTINCT q_id) AS n_queries FROM exact
)
SELECT CAST(h.nprobe AS INT) AS nprobe,
       CAST(nq.n_queries AS BIGINT) AS n_queries,
       CAST(h.n_hits AS BIGINT) AS n_hits,
       round(h.n_hits * 1.0 / (nq.n_queries * 5), 4) AS recall_at_5
FROM (
  SELECT ap.nprobe, count(*) AS n_hits
  FROM approx ap
  WHERE EXISTS (
    SELECT 1 FROM exact x
    WHERE x.q_id = ap.q_id AND x.neighbor_id = ap.neighbor_id
  )
  GROUP BY 1
) h CROSS JOIN nq
"""


ORACLE_SQL["hourly_gap_filled_activity"] = """
WITH e AS (
  SELECT user_id, epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr, value
  FROM events WHERE user_id % 29 = 0
), counts AS (
  SELECT user_id, hr, count(*) AS n_events,
         round(sum(value), 2) AS total_value
  FROM e GROUP BY 1, 2
), spans AS (
  SELECT user_id, min(hr) AS h0, max(hr) AS h1 FROM e GROUP BY 1
), grid AS (
  -- list-form generate_series + unnest: the table-function form cannot
  -- take lateral column bounds in DuckDB
  SELECT user_id, CAST(unnest(generate_series(h0, h1)) AS BIGINT) AS hr
  FROM spans
)
SELECT g.user_id, g.hr,
       coalesce(c.n_events, 0) AS n_events,
       coalesce(c.total_value, 0.0) AS total_value
FROM grid g LEFT JOIN counts c USING (user_id, hr)
"""

ORACLE_SQL["hourly_anomaly_flags"] = """
WITH hourly AS (
  SELECT event_type,
         CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT) AS hr,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, avg(n_events) AS mu, stddev_samp(n_events) AS sd
  FROM hourly GROUP BY 1
)
SELECT h.event_type, h.hr, h.n_events,
       CASE WHEN s.sd <> 0
            THEN round((h.n_events - s.mu) / s.sd, 4) END AS z_score,
       CASE WHEN s.sd <> 0
            THEN abs((h.n_events - s.mu) / s.sd) > 2 END AS is_anomaly
FROM hourly h JOIN stats s USING (event_type)
"""

ORACLE_SQL["source_mixing_order"] = """
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS src_rank
  FROM documents
)
SELECT doc_id, source, CAST(src_rank AS BIGINT) AS src_rank,
       round(src_rank / (CASE source WHEN 'src0' THEN 2.0 WHEN 'src1' THEN 2.0
                         WHEN 'src2' THEN 1.5 ELSE 1.0 END), 6) AS mix_key
FROM r
"""


# bpe_merge_symbol_stats: 3 unrolled BPE merge rounds — pair
# counts, (cnt desc, a, b) argmax, sentinel-string replace merge.
ORACLE_SQL["bpe_merge_symbol_stats"] = "WITH w AS (\n  SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x != '')) AS w\n  FROM documents WHERE text IS NOT NULL\n), wf0 AS (\n  SELECT chr(1) || array_to_string(regexp_extract_all(w, '.'), chr(1)) || chr(1) AS s,\n         CAST(count(*) AS BIGINT) AS freq\n  FROM w GROUP BY 1\n), sym0 AS (\n  SELECT s, freq, list_filter(string_split(s, chr(1)), x -> x != '') AS q\n  FROM wf0\n), pc0 AS (\n  SELECT q[i] AS a, q[i + 1] AS b, CAST(sum(freq) AS BIGINT) AS cnt\n  FROM (SELECT freq, q, unnest(range(1, len(q))) AS i FROM sym0)\n  GROUP BY 1, 2\n), best0 AS (\n  SELECT a, b FROM pc0 ORDER BY cnt DESC, a, b LIMIT 1\n), wf1 AS (\n  SELECT replace(replace(s,\n           coalesce(chr(1) || a || chr(1) || b || chr(1), chr(2)),\n           coalesce(chr(1) || a || b || chr(1), chr(2))),\n         coalesce(chr(1) || a || chr(1) || b || chr(1), chr(2)),\n         coalesce(chr(1) || a || b || chr(1), chr(2))) AS s, freq\n  FROM sym0 LEFT JOIN best0 ON true  -- empty best (no pairs) must keep s, not annihilate it\n), sym1 AS (\n  SELECT s, freq, list_filter(string_split(s, chr(1)), x -> x != '') AS q\n  FROM wf1\n), pc1 AS (\n  SELECT q[i] AS a, q[i + 1] AS b, CAST(sum(freq) AS BIGINT) AS cnt\n  FROM (SELECT freq, q, unnest(range(1, len(q))) AS i FROM sym1)\n  GROUP BY 1, 2\n), best1 AS (\n  SELECT a, b FROM pc1 ORDER BY cnt DESC, a, b LIMIT 1\n), wf2 AS (\n  SELECT replace(replace(s,\n           coalesce(chr(1) || a || chr(1) || b || chr(1), chr(2)),\n           coalesce(chr(1) || a || b || chr(1), chr(2))),\n         coalesce(chr(1) || a || chr(1) || b || chr(1), chr(2)),\n         coalesce(chr(1) || a || b || chr(1), chr(2))) AS s, freq\n  FROM sym1 LEFT JOIN best1 ON true  -- empty best (no pairs) must keep s, not annihilate it\n), sym2 AS (\n  SELECT s, freq, list_filter(string_split(s, chr(1)), x -> x != '') AS q\n  FROM wf2\n), pc2 AS (\n  SELECT q[i] AS a, q[i + 1] AS b, CAST(sum(freq) AS BIGINT) AS cnt\n  FROM (SELECT freq, q, unnest(range(1, len(q))) AS i FROM sym2)\n  GROUP BY 1, 2\n), best2 AS (\n  SELECT a, b FROM pc2 ORDER BY cnt DESC, a, b LIMIT 1\n), wf3 AS (\n  SELECT replace(replace(s,\n           coalesce(chr(1) || a || chr(1) || b || chr(1), chr(2)),\n           coalesce(chr(1) || a || b || chr(1), chr(2))),\n         coalesce(chr(1) || a || chr(1) || b || chr(1), chr(2)),\n         coalesce(chr(1) || a || b || chr(1), chr(2))) AS s, freq\n  FROM sym2 LEFT JOIN best2 ON true  -- empty best (no pairs) must keep s, not annihilate it\n)\nSELECT symbol, CAST(sum(freq) AS BIGINT) AS total_count FROM (\n  SELECT freq, unnest(list_filter(string_split(s, chr(1)), x -> x != ''))\n         AS symbol\n  FROM wf3\n) GROUP BY 1 ORDER BY total_count DESC, symbol LIMIT 20\n"

ORACLE_SQL["filter_cascade_stats"] = """
WITH a AS (
  SELECT CAST(count(*) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN text IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN text IS NOT NULL AND n_chars >= 100
                  THEN 1 ELSE 0 END) AS BIGINT) AS c2,
         CAST(sum(CASE WHEN text IS NOT NULL AND n_chars >= 100
                       AND lang IN ('en', 'de', 'fr')
                  THEN 1 ELSE 0 END) AS BIGINT) AS c3,
         CAST(sum(CASE WHEN text IS NOT NULL AND n_chars >= 100
                       AND lang IN ('en', 'de', 'fr')
                       AND len(string_split(text, ' ')) >= 40
                  THEN 1 ELSE 0 END) AS BIGINT) AS c4
  FROM documents
)
SELECT stage, n_in, n_out, n_in - n_out AS n_dropped FROM (
  SELECT '1_non_null_text' AS stage, c0 AS n_in, c1 AS n_out FROM a
  UNION ALL SELECT '2_min_length', c1, c2 FROM a
  UNION ALL SELECT '3_language', c2, c3 FROM a
  UNION ALL SELECT '4_min_tokens', c3, c4 FROM a
)
"""

ORACLE_SQL["domain_filter_stats"] = """
WITH u AS (
  SELECT 'https://site' || CAST(doc_id % 13 AS VARCHAR) || '.example'
         || (CASE WHEN doc_id % 3 = 0 THEN '.net' ELSE '.org' END)
         || '/p/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
), h AS (
  SELECT regexp_extract(url, '^https?://([^/]+)/', 1) AS domain FROM u
)
SELECT domain, regexp_matches(domain, '\\.net$') AS is_blocked,
       count(*) AS n_docs
FROM h GROUP BY 1, 2
"""

ORACLE_SQL["dedup_keep_best_docs"] = f"""
WITH h AS (
  SELECT doc_id, n_chars,
         CAST(((md5_number(text) % {_M48} + {_M48}) % {_M48}) AS BIGINT)
           AS content_hash,
         row_number() OVER (
           PARTITION BY ((md5_number(text) % {_M48} + {_M48}) % {_M48})
           ORDER BY n_chars DESC, doc_id
         ) AS rn
  FROM documents WHERE text IS NOT NULL
)
SELECT content_hash, CAST(count(*) AS BIGINT) AS n_copies,
       min(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc_id,
       min(CASE WHEN rn = 1 THEN n_chars END) AS kept_n_chars
FROM h GROUP BY content_hash
"""

ORACLE_SQL["packing_efficiency_stats"] = f"""
WITH n AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
  FROM documents WHERE text IS NOT NULL
), c AS (
  SELECT doc_id, source, n_tokens,
         {_CUM_PREV_SRC}
  FROM n
), packed AS (
  SELECT doc_id, source, n_tokens,
         CAST(cum_prev // 512 AS BIGINT) AS bin_id,
         (cum_prev % 512 + n_tokens > 512) AS crosses
  FROM c
), per_bin AS (
  SELECT source, bin_id, count(*) AS docs, sum(n_tokens) AS tok
  FROM packed GROUP BY 1, 2
), last_bin AS (
  SELECT source, max(bin_id) AS last FROM per_bin GROUP BY 1
), fill AS (
  SELECT p.source, round(avg(p.tok / 512.0), 4) AS closed_bin_mean_fill
  FROM per_bin p JOIN last_bin l USING (source)
  WHERE p.bin_id <> l.last GROUP BY 1
), totals AS (
  SELECT source, CAST(count(DISTINCT bin_id) AS BIGINT) AS n_bins,
         count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN crosses THEN 1 ELSE 0 END) AS BIGINT)
           AS n_boundary_docs
  FROM packed GROUP BY 1
)
SELECT t.source, t.n_bins, t.n_docs, t.total_tokens, t.n_boundary_docs,
       f.closed_bin_mean_fill
FROM totals t LEFT JOIN fill f USING (source)
"""

ORACLE_SQL["end_to_end_curation_stats"] = f"""
WITH f AS (
  SELECT doc_id, source, text, n_chars,
         ((md5_number(text) % {_M48} + {_M48}) % {_M48}) AS h
  FROM documents WHERE text IS NOT NULL AND n_chars >= 100
), ranked AS (
  SELECT doc_id, source, text,
         row_number() OVER (
           PARTITION BY h ORDER BY n_chars DESC, doc_id) AS rn
  FROM f
), kept AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
  FROM ranked WHERE rn = 1
), c AS (
  SELECT doc_id, source, n_tokens,
         {_CUM_PREV_SRC}
  FROM kept
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(count(DISTINCT cum_prev // 512) AS BIGINT) AS n_bins,
       CAST(sum(CASE WHEN cum_prev % 512 + n_tokens > 512
                THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs
FROM c GROUP BY source
"""

ORACLE_SQL["source_term_entropy"] = fr"""
WITH tc AS (
  SELECT source,
         unnest({_TOKS})
           AS t
  FROM documents
), c AS (
  SELECT source, t, CAST(count(*) AS BIGINT) AS c FROM tc GROUP BY 1, 2
), tot AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1
)
SELECT c.source,
       round(-sum((CAST(c.c AS DOUBLE) / t.n) * ln(CAST(c.c AS DOUBLE) / t.n)), 4)
         AS entropy_nats,
       count(*) AS n_terms,
       max(t.n) AS n_tokens
FROM c JOIN tot t USING (source)
GROUP BY c.source
"""

ORACLE_SQL["doc_bigram_surprisal"] = fr"""
WITH toks AS (
  SELECT doc_id,
         {_TOKS} AS q
  FROM documents
), bi AS (
  SELECT doc_id, q[i] AS w1, q[i + 1] AS w2
  FROM (SELECT doc_id, q, unnest(range(1, len(q))) AS i FROM toks)
), bc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS bn FROM bi GROUP BY 1, 2
), uc AS (
  SELECT w1, CAST(sum(bn) AS BIGINT) AS un,
         CAST(count(*) AS BIGINT) AS vocab
  FROM bc GROUP BY 1
), lm AS (
  SELECT b.w1, b.w2,
         -ln(CAST(b.bn + 1 AS DOUBLE) / (u.un + u.vocab)) AS surprisal
  FROM bc b JOIN uc u USING (w1)
), scored AS (
  SELECT bi.doc_id, round(avg(l.surprisal), 4) AS mean_surprisal,
         count(*) AS n_bigrams
  FROM bi JOIN lm l USING (w1, w2)
  GROUP BY 1
)
SELECT * FROM scored ORDER BY mean_surprisal DESC, doc_id LIMIT 20
"""


# Round 4: layout-backed execution. The engine runs this over a
# ship_year hive-partitioned rewrite of lineitem (partition pruning in
# the scan); values must equal the same aggregate over the raw table.
ORACLE_SQL["pricing_summary_partitioned"] = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                         AS sum_qty,
       {_qsum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
       round(avg(l_quantity), 4)                         AS avg_qty,
       count(*)                                          AS count_order
FROM lineitem
WHERE year(l_shipdate) = 1995
GROUP BY l_returnflag, l_linestatus
"""


# semantic_dedup_embeddings: the kmeans_ivf_training assignment chain
# (a3) + within-cluster pairwise cosine >= 0.3; dropped = any vector
# with a lower-id same-cluster neighbor over threshold.
ORACLE_SQL["semantic_dedup_embeddings"] = f"""WITH e AS (
  {_EMB_LT}
), c0 AS (
  SELECT CAST(vec_id AS BIGINT) AS cluster, v AS c
  FROM e ORDER BY vec_id LIMIT 8
), s1 AS (
  SELECT e.vec_id, e.v, c.cluster, list_reduce(list_transform(list_zip(e.v, c.c), x -> (x[1] - x[2]) * (x[1] - x[2])), (a, b) -> a + b) AS dist
  FROM e CROSS JOIN c0 c
), a1 AS (
  SELECT vec_id, v, cluster, dist FROM (
    SELECT s.*, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
    FROM s1 s
  ) WHERE rn = 1
), u1 AS (
  SELECT cluster, d AS dim, round(avg(val), 4) AS cv FROM (
    SELECT cluster, unnest(v) AS val, generate_subscripts(v, 1) AS d FROM a1
  ) GROUP BY cluster, d
), c1 AS (
  SELECT cluster, list(cv ORDER BY dim) AS c FROM u1 GROUP BY cluster
), s2 AS (
  SELECT e.vec_id, e.v, c.cluster, list_reduce(list_transform(list_zip(e.v, c.c), x -> (x[1] - x[2]) * (x[1] - x[2])), (a, b) -> a + b) AS dist
  FROM e CROSS JOIN c1 c
), a2 AS (
  SELECT vec_id, v, cluster, dist FROM (
    SELECT s.*, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
    FROM s2 s
  ) WHERE rn = 1
), u2 AS (
  SELECT cluster, d AS dim, round(avg(val), 4) AS cv FROM (
    SELECT cluster, unnest(v) AS val, generate_subscripts(v, 1) AS d FROM a2
  ) GROUP BY cluster, d
), c2 AS (
  SELECT cluster, list(cv ORDER BY dim) AS c FROM u2 GROUP BY cluster
), s3 AS (
  SELECT e.vec_id, e.v, c.cluster, list_reduce(list_transform(list_zip(e.v, c.c), x -> (x[1] - x[2]) * (x[1] - x[2])), (a, b) -> a + b) AS dist
  FROM e CROSS JOIN c2 c
), a3 AS (
  SELECT vec_id, v, cluster, dist FROM (
    SELECT s.*, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
    FROM s3 s
  ) WHERE rn = 1
), pairs AS (
  SELECT b.vec_id, b.cluster, round(list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
  FROM a3 a JOIN a3 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.3
)
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
       round(max(cosine), 6) AS max_cos_to_kept
FROM pairs GROUP BY vec_id, cluster
"""


# dsir_importance_weights: add-one-smoothed unigram log-ratio between
# the lang='en' target LM and the whole-corpus LM, summed per doc with
# token multiplicity.
ORACLE_SQL["dsir_importance_weights"] = f"""
WITH tok AS (
  SELECT doc_id, lang, t
  FROM documents,
       unnest({_TOKS}) AS u(t)
  WHERE text IS NOT NULL
), dtc AS (
  SELECT doc_id, lang, t, count(*) AS k FROM tok GROUP BY 1, 2, 3
), term AS (
  SELECT t, sum(k) AS raw_n,
         sum(CASE WHEN lang = 'en' THEN k ELSE 0 END) AS tgt_n
  FROM dtc GROUP BY t
), tot AS (
  SELECT count(*) AS v, sum(raw_n) AS n_raw, sum(tgt_n) AS n_tgt FROM term
), ratio AS (
  SELECT t,
         ln((tgt_n + 1) * 1.0 / (n_tgt + v))
           - ln((raw_n + 1) * 1.0 / (n_raw + v)) AS lr
  FROM term CROSS JOIN tot
)
SELECT doc_id, round(sum(k * lr), 4) AS importance,
       CAST(sum(k) AS BIGINT) AS n_tokens
FROM dtc JOIN ratio USING (t)
GROUP BY doc_id
ORDER BY importance DESC, doc_id
LIMIT 50
"""


# supplier_pagerank: 3 unrolled PageRank iterations over the bipartite
# distinct (cust, supp) trade graph, per-iteration round-9 quantization
# mirroring operators/graph.pagerank_fixed. The teleport term is
# spelled (1.0 - 0.85) in DOUBLE, not the literal 0.15: Python's
# `1 - damping` is 0.15000000000000002, a different double than 0.15 —
# both sides must round-quantize the SAME double or a boundary-
# straddling rank breaks the hash on other data.
ORACLE_SQL["supplier_pagerank"] = """
WITH pairs AS (
  SELECT DISTINCT o_custkey + 1000000000 AS cust_node, l_suppkey AS supp_node
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), e AS (
  SELECT cust_node AS src, supp_node AS dst FROM pairs
  UNION ALL
  SELECT supp_node AS src, cust_node AS dst FROM pairs
), nodes AS (
  SELECT DISTINCT src AS node FROM e
  UNION
  SELECT DISTINCT dst AS node FROM e
), deg AS (
  SELECT src, count(*) AS deg FROM e GROUP BY src
), n AS (
  SELECT count(*) AS n_nodes FROM nodes
), r0 AS (
  SELECT node, round(1.0 / n_nodes, 9) AS rank FROM nodes CROSS JOIN n
), m1 AS (
  SELECT e.dst, sum(r.rank / d.deg) AS in_mass
  FROM e JOIN deg d ON e.src = d.src JOIN r0 r ON e.src = r.node
  GROUP BY e.dst
), r1 AS (
  SELECT node, round((CAST(1.0 AS DOUBLE) - 0.85) / n_nodes + 0.85 * COALESCE(in_mass, 0.0), 9) AS rank
  FROM nodes LEFT JOIN m1 ON node = m1.dst CROSS JOIN n
), m2 AS (
  SELECT e.dst, sum(r.rank / d.deg) AS in_mass
  FROM e JOIN deg d ON e.src = d.src JOIN r1 r ON e.src = r.node
  GROUP BY e.dst
), r2 AS (
  SELECT node, round((CAST(1.0 AS DOUBLE) - 0.85) / n_nodes + 0.85 * COALESCE(in_mass, 0.0), 9) AS rank
  FROM nodes LEFT JOIN m2 ON node = m2.dst CROSS JOIN n
), m3 AS (
  SELECT e.dst, sum(r.rank / d.deg) AS in_mass
  FROM e JOIN deg d ON e.src = d.src JOIN r2 r ON e.src = r.node
  GROUP BY e.dst
), r3 AS (
  SELECT node, round((CAST(1.0 AS DOUBLE) - 0.85) / n_nodes + 0.85 * COALESCE(in_mass, 0.0), 9) AS rank
  FROM nodes LEFT JOIN m3 ON node = m3.dst CROSS JOIN n
)
SELECT node AS s_suppkey, round(rank, 6) AS pagerank
FROM r3 WHERE node < 1000000000
"""


# join_key_skew_profile: per-key counts then #keys-row stats, for the
# two hottest shuffle keys.
ORACLE_SQL["join_key_skew_profile"] = """
WITH eu AS (
  SELECT user_id AS k, count(*) AS n FROM events GROUP BY 1
), ls AS (
  SELECT l_suppkey AS k, count(*) AS n FROM lineitem GROUP BY 1
)
SELECT 'events.user_id' AS key_name,
       CAST(sum(n) AS BIGINT) AS n_rows,
       count(*) AS n_keys,
       CAST(max(n) AS BIGINT) AS top1_count,
       round(max(n) * 1.0 / sum(n), 6) AS top1_share,
       round(quantile_cont(n, 0.99) / avg(n), 4) AS p99_over_mean
FROM eu
UNION ALL
SELECT 'lineitem.l_suppkey',
       CAST(sum(n) AS BIGINT), count(*), CAST(max(n) AS BIGINT),
       round(max(n) * 1.0 / sum(n), 6),
       round(quantile_cont(n, 0.99) / avg(n), 4)
FROM ls
"""

# weighted_ares_sample: deterministic Efraimidis-Spirakis keys from the
# portable 48-bit hash; ln(u)/n_chars, top-5 per source.
ORACLE_SQL["weighted_ares_sample"] = f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         round(ln((((md5_number(CAST(doc_id AS VARCHAR)) % {_M48} + {_M48})
                     % {_M48}) + 1) / {float(_M48)}) / n_chars, 9)
           AS sample_key
  FROM documents WHERE text IS NOT NULL AND n_chars > 0
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY source ORDER BY sample_key DESC, doc_id) AS rn
  FROM keyed
)
SELECT source, doc_id, n_chars, sample_key, CAST(rn AS INT) AS rank
FROM ranked WHERE rn <= 5
"""

# source_kl_divergence: observed-support KL with add-one smoothing on
# both LMs.
ORACLE_SQL["source_kl_divergence"] = f"""
WITH tok AS (
  SELECT source, t
  FROM documents,
       unnest({_TOKS}) AS u(t)
  WHERE text IS NOT NULL
), tc AS (
  SELECT source, t, count(*) AS k FROM tok GROUP BY 1, 2
), corpus AS (
  SELECT t, sum(k) AS kc FROM tc GROUP BY t
), vn AS (
  SELECT count(*) AS v, sum(kc) AS nc FROM corpus
), st AS (
  SELECT source, sum(k) AS ns FROM tc GROUP BY source
)
SELECT source,
       round(sum(((k + 1) * 1.0 / (ns + v))
                 * (ln((k + 1) * 1.0 / (ns + v))
                    - ln((kc + 1) * 1.0 / (nc + v)))), 4) AS kl_nats,
       count(*) AS n_terms
FROM tc JOIN corpus USING (t) JOIN st USING (source) CROSS JOIN vn
GROUP BY source
"""


# events_stream_hourly_users: batch twin of the streaming exact
# distinct — hour-truncated distinct user counts.
ORACLE_SQL["events_stream_hourly_users"] = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start_s,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
"""


# cms_term_frequency_estimates: d=4 x w=1024 Count-Min Sketch from the
# term-count aggregate; estimates = min over the 4 counters for the
# top-20 true terms.
ORACLE_SQL["cms_term_frequency_estimates"] = f"""
WITH tok AS (
  SELECT t FROM documents,
       unnest({_TOKS}) AS u(t)
  WHERE text IS NOT NULL
), tc AS (
  SELECT t, count(*) AS k FROM tok GROUP BY t
), cells AS (
  SELECT t, k, j,
         CAST(((md5_number(CAST(j AS VARCHAR) || ':' || t) % {_M48} + {_M48})
               % {_M48}) % 1024 AS INT) AS col
  FROM tc CROSS JOIN generate_series(0, 3) g(j)
), sketch AS (
  SELECT j, col, sum(k) AS counter FROM cells GROUP BY j, col
), top AS (
  SELECT t, k FROM tc ORDER BY k DESC, t LIMIT 20
), est AS (
  SELECT top.t, top.k, min(s.counter) AS cms_estimate
  FROM top
  JOIN cells c ON c.t = top.t
  JOIN sketch s ON s.j = c.j AND s.col = c.col
  GROUP BY top.t, top.k
)
SELECT t AS term, CAST(k AS BIGINT) AS true_count,
       CAST(cms_estimate AS BIGINT) AS cms_estimate,
       CAST(cms_estimate - k AS BIGINT) AS overestimate
FROM est
"""


# ppjoin_exact_jaccard_pairs: brute-force all-pairs Jaccard over
# DISTINCT word-trigram shingle sets (same shingling as the MinHash
# family) >= 0.5 — deliberately filter-free so the engine's
# prefix/length/positional filtering is proven lossless by the hash
# match.
ORACLE_SQL["ppjoin_exact_jaccard_pairs"] = """
WITH toks AS (
  SELECT doc_id AS id, string_split(text, ' ') AS t FROM documents
  WHERE text IS NOT NULL
), ts AS (
  SELECT DISTINCT id, unnest(list_transform(range(1, len(t) - 1),
         i -> array_to_string(t[i:i+2], ' '))) AS t
  FROM toks
), sz AS (
  SELECT id, count(*) AS sz FROM ts GROUP BY id
), co AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM ts a JOIN ts b ON a.t = b.t AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM co JOIN sz sa ON co.id_a = sa.id JOIN sz sb ON co.id_b = sb.id
WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.5
"""


# snapshot_cdc_diff: the same derived second snapshot and full-outer
# classification in SQL.
ORACLE_SQL["snapshot_cdc_diff"] = f"""
WITH old AS (
  SELECT o_orderkey AS k, o_totalprice AS old_p FROM orders
), new AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice * 1.1
              ELSE o_totalprice END AS new_p
  FROM orders WHERE o_orderkey % 17 != 0
  UNION ALL
  SELECT o_orderkey + 1000000000, o_totalprice
  FROM orders WHERE o_orderkey % 19 = 0
), j AS (
  SELECT COALESCE(old.k, new.k) AS k, old_p, new_p
  FROM old FULL OUTER JOIN new ON old.k = new.k
)
SELECT CASE WHEN old_p IS NULL THEN 'inserted'
            WHEN new_p IS NULL THEN 'deleted'
            WHEN old_p != new_p THEN 'updated'
            ELSE 'unchanged' END AS status,
       count(*) AS n_keys,
       {_qsum("COALESCE(old_p, 0.0)", 4)} AS total_old_price,
       {_qsum("COALESCE(new_p, 0.0)", 4)} AS total_new_price
FROM j GROUP BY 1
"""


# token_pmi_top_pairs: doc-distinct co-occurrence PMI over the top-200
# vocabulary, c(a,b) >= 5, top-50 by (pmi desc, pair asc).
ORACLE_SQL["token_pmi_top_pairs"] = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, t
  FROM documents,
       unnest({_TOKS}) AS u(t)
  WHERE text IS NOT NULL
), dfc AS (
  SELECT t, count(*) AS df FROM dt GROUP BY t
), top AS (
  SELECT t, df FROM dfc ORDER BY df DESC, t LIMIT 200
), dtt AS (
  SELECT dt.doc_id, dt.t FROM dt JOIN top USING (t)
), n AS (
  SELECT count(DISTINCT doc_id) AS n_docs FROM documents WHERE text IS NOT NULL
), pairs AS (
  SELECT a.t AS t_a, b.t AS t_b, count(*) AS c_ab
  FROM dtt a JOIN dtt b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY 1, 2
  HAVING count(*) >= 5
)
SELECT t_a, t_b, CAST(c_ab AS BIGINT) AS c_ab,
       round(ln(n.n_docs * c_ab * 1.0 / (ta.df * tb.df)), 4) AS pmi
FROM pairs
JOIN top ta ON pairs.t_a = ta.t
JOIN top tb ON pairs.t_b = tb.t
CROSS JOIN n
ORDER BY pmi DESC, t_a, t_b
LIMIT 50
"""


# cdc_chunk_dedup_stats: the same Karp-Rabin rolling-window boundary
# rule (Σ codepoint·pow % (2^31-1) % 64 == 0 over the trailing 16
# chars, position >= 32) replayed with an inlined 16-term polynomial
# (coefficients imported from the Spark kernel so the two sides cannot
# drift); chunk hashes over the cut substrings stay md5-derived.
from ..operators.curation import CDC_MOD as _CDC_MOD
from ..operators.curation import cdc_window_pows as _cdc_window_pows

_CDC_POWS = _cdc_window_pows(16)
# window chars sit at positions i-15 .. i (1-based); offset k gets
# coefficient BASE^(15-k), identical to the numpy kernel's pows[::-1].
_CDC_POLY = " + ".join(
    f"CAST(unicode(substr(c.text, p.i - 15 + {k}, 1)) AS BIGINT)"
    f" * {_CDC_POWS[15 - k]}"
    for k in range(16)
)

ORACLE_SQL["cdc_chunk_dedup_stats"] = f"""
WITH base AS (
  SELECT doc_id, source, text FROM documents
  WHERE text IS NOT NULL AND n_chars > 0
), corpus AS (
  SELECT * FROM base
  UNION ALL
  SELECT doc_id + 1000000000, source, 'zz ' || text FROM base
  WHERE doc_id % 5 = 0
), pos AS (
  SELECT doc_id, CAST(u.i AS INT) AS i
  FROM corpus, unnest(range(16, len(text) + 1)) AS u(i)
  WHERE len(text) >= 16
), bnd AS (
  SELECT p.doc_id, p.i
  FROM pos p JOIN corpus c ON p.doc_id = c.doc_id
  WHERE p.i >= 32
    AND (({_CDC_POLY}) % {_CDC_MOD}) % 64 = 0
), bs AS (
  SELECT doc_id, list(i ORDER BY i) AS bs FROM bnd GROUP BY doc_id
), withbs AS (
  SELECT c.doc_id, c.source, c.text, COALESCE(bs.bs, []) AS bs
  FROM corpus c LEFT JOIN bs ON c.doc_id = bs.doc_id
), chunks AS (
  SELECT doc_id, source,
         u.se[1] AS s, u.se[2] AS e,
         substr(text, u.se[1], u.se[2] - u.se[1] + 1) AS chunk
  FROM withbs,
       unnest(list_zip(
         list_prepend(1, list_transform(bs, x -> x + 1)),
         list_append(bs, len(text)))) AS u(se)
), hashed AS (
  SELECT source, e - s + 1 AS chunk_len,
         CAST(((md5_number(chunk) % {_M48} + {_M48}) % {_M48}) AS BIGINT)
           AS chunk_hash
  FROM chunks
)
SELECT source, count(*) AS n_chunks,
       count(DISTINCT chunk_hash) AS n_distinct_chunks,
       round(count(DISTINCT chunk_hash) * 1.0 / count(*), 4) AS dedup_ratio,
       round(avg(chunk_len), 2) AS mean_chunk_len
FROM hashed GROUP BY source
"""


# langid_confusion_matrix: the doc_language_id predicate aggregated
# into an (actual, predicted) confusion matrix with per-actual shares.
ORACLE_SQL["langid_confusion_matrix"] = f"""
WITH hits AS (
  SELECT lang,
    {_LANGID_HITS}
  FROM documents
), cells AS (
  SELECT lang AS actual,
         {_LANGID_CASE} AS predicted
  FROM hits
), m AS (
  SELECT actual, predicted, count(*) AS n_docs FROM cells GROUP BY 1, 2
)
SELECT actual, predicted, n_docs,
       round(n_docs * 1.0 / sum(n_docs) OVER (PARTITION BY actual), 4)
         AS share_of_actual
FROM m
"""

# bucketed_colocated_revenue: plain join+aggregate over the raw tables
# (the bucketed layout changes the PLAN, never the values).
ORACLE_SQL["bucketed_colocated_revenue"] = f"""
SELECT c_mktsegment AS segment,
       {_qsum("o_totalprice", 2)} AS total_revenue,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# events_stream_unattributed_views: batch anti-join twin of the
# streaming left-outer attribution (views with no same-user purchase
# in [view_ts, view_ts + 30 min]).
ORACLE_SQL["events_stream_unattributed_views"] = """
WITH v AS (
  SELECT user_id, ts AS view_ts, event_id AS view_id
  FROM events WHERE event_type = 'view'
), p AS (
  SELECT user_id, ts AS purchase_ts FROM events WHERE event_type = 'purchase'
)
SELECT v.user_id,
       epoch_us(v.view_ts) AS view_ts_us,
       v.view_id
FROM v
WHERE NOT EXISTS (
  SELECT 1 FROM p
  WHERE p.user_id = v.user_id
    AND p.purchase_ts >= v.view_ts
    AND p.purchase_ts <= v.view_ts + INTERVAL 30 MINUTE
)
-- bounded-source emission cutoff: an unmatched view emits only once
-- the global watermark passes the end of its attribution horizon.
-- Spark's global watermark = min over both inputs of the side's max
-- event time FLOORED TO MILLISECONDS (EventTimeWatermarkExec tracks
-- ms) minus the 30-min delay; the row's own event time stays at
-- microsecond precision on the other side of the comparison.
AND epoch_us(v.view_ts) + 1800000000
      < (SELECT least(
           (epoch_us(max(CASE WHEN event_type = 'view' THEN ts END))
              // 1000) * 1000,
           (epoch_us(max(CASE WHEN event_type = 'purchase' THEN ts END))
              // 1000) * 1000
         ) - 1800000000 FROM events)
"""

# table_profile_stats: one-pass per-column profile of lineitem.
ORACLE_SQL["table_profile_stats"] = """
WITH s AS (
  SELECT
    sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS q_nulls,
    count(DISTINCT l_quantity) AS q_distinct,
    round(CAST(min(l_quantity) AS DOUBLE), 4) AS q_min,
    round(CAST(max(l_quantity) AS DOUBLE), 4) AS q_max,
    sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS ep_nulls,
    count(DISTINCT l_extendedprice) AS ep_distinct,
    round(CAST(min(l_extendedprice) AS DOUBLE), 4) AS ep_min,
    round(CAST(max(l_extendedprice) AS DOUBLE), 4) AS ep_max,
    sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS d_nulls,
    count(DISTINCT l_discount) AS d_distinct,
    round(CAST(min(l_discount) AS DOUBLE), 4) AS d_min,
    round(CAST(max(l_discount) AS DOUBLE), 4) AS d_max,
    sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS t_nulls,
    count(DISTINCT l_tax) AS t_distinct,
    round(CAST(min(l_tax) AS DOUBLE), 4) AS t_min,
    round(CAST(max(l_tax) AS DOUBLE), 4) AS t_max,
    sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS rf_nulls,
    count(DISTINCT l_returnflag) AS rf_distinct,
    sum(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS ls_nulls,
    count(DISTINCT l_linestatus) AS ls_distinct
  FROM lineitem
)
SELECT 'l_quantity' AS column_name, CAST(q_nulls AS BIGINT) AS n_nulls,
       q_distinct AS n_distinct, q_min AS min_value, q_max AS max_value FROM s
UNION ALL
SELECT 'l_extendedprice', CAST(ep_nulls AS BIGINT), ep_distinct, ep_min, ep_max FROM s
UNION ALL
SELECT 'l_discount', CAST(d_nulls AS BIGINT), d_distinct, d_min, d_max FROM s
UNION ALL
SELECT 'l_tax', CAST(t_nulls AS BIGINT), t_distinct, t_min, t_max FROM s
UNION ALL
SELECT 'l_returnflag', CAST(rf_nulls AS BIGINT), rf_distinct, NULL, NULL FROM s
UNION ALL
SELECT 'l_linestatus', CAST(ls_nulls AS BIGINT), ls_distinct, NULL, NULL FROM s
"""


# table_profile_approx: the deterministic columns (nulls, min/max)
# computed exactly; approx_ok asserted TRUE — the Spark side checks
# its HLL estimate against an exact per-column side-pass and emits the
# verdict (DuckDB cannot replay Spark's HLL++ sketch bit-for-bit, so
# the invariant crosses the hash, not the estimate — the
# minhash_lsh_fast_dup_recall pattern).
ORACLE_SQL["table_profile_approx"] = """
WITH s AS (
  SELECT
    sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS q_nulls,
    round(CAST(min(l_quantity) AS DOUBLE), 4) AS q_min,
    round(CAST(max(l_quantity) AS DOUBLE), 4) AS q_max,
    sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS ep_nulls,
    round(CAST(min(l_extendedprice) AS DOUBLE), 4) AS ep_min,
    round(CAST(max(l_extendedprice) AS DOUBLE), 4) AS ep_max,
    sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS d_nulls,
    round(CAST(min(l_discount) AS DOUBLE), 4) AS d_min,
    round(CAST(max(l_discount) AS DOUBLE), 4) AS d_max,
    sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS t_nulls,
    round(CAST(min(l_tax) AS DOUBLE), 4) AS t_min,
    round(CAST(max(l_tax) AS DOUBLE), 4) AS t_max,
    sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS rf_nulls,
    sum(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS ls_nulls
  FROM lineitem
)
SELECT 'l_quantity' AS column_name, CAST(q_nulls AS BIGINT) AS n_nulls,
       q_min AS min_value, q_max AS max_value, TRUE AS approx_ok FROM s
UNION ALL
SELECT 'l_extendedprice', CAST(ep_nulls AS BIGINT), ep_min, ep_max, TRUE FROM s
UNION ALL
SELECT 'l_discount', CAST(d_nulls AS BIGINT), d_min, d_max, TRUE FROM s
UNION ALL
SELECT 'l_tax', CAST(t_nulls AS BIGINT), t_min, t_max, TRUE FROM s
UNION ALL
SELECT 'l_returnflag', CAST(rf_nulls AS BIGINT), NULL, NULL, TRUE FROM s
UNION ALL
SELECT 'l_linestatus', CAST(ls_nulls AS BIGINT), NULL, NULL, TRUE FROM s
"""


# value_mad_outliers: Iglewicz-Hoaglin modified z-score outliers per
# event type (median + MAD via quantile_cont, matching Spark's
# percentile interpolation).
ORACLE_SQL["value_mad_outliers"] = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
), dev AS (
  SELECT e.event_type, abs(e.value - m.med) AS absdev, m.med
  FROM events e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, quantile_cont(absdev, 0.5) AS mad, any_value(med) AS med
  FROM dev GROUP BY 1
)
SELECT d.event_type,
       round(any_value(m.med), 4) AS median_value,
       round(any_value(m.mad), 4) AS mad,
       count(*) AS n_events,
       CAST(sum(CASE WHEN d.absdev > 3.5 * 1.4826 * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(sum(CASE WHEN d.absdev > 3.5 * 1.4826 * m.mad
                      THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS outlier_share
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
"""

# value_psi_drift: decile-bin PSI between timeline halves; bin edges
# fit on the first half (round-9 quantized in both engines).
ORACLE_SQL["value_psi_drift"] = """
WITH ev AS (
  SELECT event_type, value, epoch_us(ts) AS us FROM events
), m AS (
  SELECT CAST(round(quantile_cont(us, 0.5)) AS BIGINT) AS m FROM ev
), halves AS (
  SELECT event_type, value,
         CASE WHEN us <= m.m THEN 1 ELSE 2 END AS half
  FROM ev CROSS JOIN m
), edges AS (
  SELECT event_type,
         list_transform(quantile_cont(value,
             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
           x -> round(x, 9)) AS edges
  FROM halves WHERE half = 1 GROUP BY event_type
), binned AS (
  SELECT h.event_type, h.half,
         len(list_filter(e.edges, ed -> h.value > ed)) AS bin
  FROM halves h JOIN edges e USING (event_type)
), counts AS (
  SELECT event_type, half, bin, count(*) AS n FROM binned GROUP BY 1, 2, 3
), tot AS (
  SELECT event_type, half, sum(n) AS tot FROM counts GROUP BY 1, 2
), shares AS (
  SELECT c.event_type, c.half, c.bin,
         greatest(c.n * 1.0 / t.tot, 1e-6) AS p
  FROM counts c JOIN tot t USING (event_type, half)
), j AS (
  SELECT COALESCE(a.event_type, b.event_type) AS event_type,
         COALESCE(a.p, 1e-6) AS p1, COALESCE(b.p, 1e-6) AS p2
  FROM (SELECT * FROM shares WHERE half = 1) a
  FULL OUTER JOIN (SELECT * FROM shares WHERE half = 2) b
    ON a.event_type = b.event_type AND a.bin = b.bin
)
SELECT event_type,
       round(sum((p2 - p1) * (ln(p2) - ln(p1))), 6) AS psi,
       count(*) AS n_bins
FROM j GROUP BY event_type
"""


# events_stream_psi_drift: batch replay of the windowed drift monitor —
# decile edges + reference shares fit on the first timeline half
# (round-9 quantized), the full stream histogrammed per (day, type)
# against them, PSI per cell with an exploded 0..9 bin spine so empty
# bins hit the same 1e-6 floor as Spark. Complete mode over the
# bounded source = plain batch aggregate semantics.
ORACLE_SQL["events_stream_psi_drift"] = """
WITH ev AS (
  SELECT event_type, value, epoch_us(ts) AS us,
         date_trunc('day', ts) AS day
  FROM events
), m AS (
  SELECT CAST(round(quantile_cont(us, 0.5)) AS BIGINT) AS m FROM ev
), fh AS (
  SELECT event_type, value FROM ev CROSS JOIN m WHERE us <= m.m
), edges AS (
  SELECT event_type,
         list_transform(quantile_cont(value,
             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
           x -> round(x, 9)) AS edges
  FROM fh GROUP BY event_type
), ref_binned AS (
  SELECT f.event_type,
         len(list_filter(e.edges, ed -> f.value > ed)) AS bin
  FROM fh f JOIN edges e USING (event_type)
), ref_counts AS (
  SELECT event_type, bin, count(*) AS rn FROM ref_binned GROUP BY 1, 2
), ref_tot AS (
  SELECT event_type, sum(rn) AS rtot FROM ref_counts GROUP BY 1
), ref_shares AS (
  SELECT c.event_type, c.bin, greatest(c.rn * 1.0 / t.rtot, 1e-6) AS p_ref
  FROM ref_counts c JOIN ref_tot t USING (event_type)
), live_binned AS (
  SELECT ev.day, ev.event_type,
         len(list_filter(e.edges, ed -> ev.value > ed)) AS bin
  FROM ev JOIN edges e USING (event_type)
), live AS (
  SELECT day, event_type, bin, count(*) AS n FROM live_binned
  GROUP BY 1, 2, 3
), tot AS (
  SELECT day, event_type, sum(n) AS tot FROM live GROUP BY 1, 2
), spine AS (
  SELECT t.day, t.event_type, t.tot, g.bin
  FROM tot t CROSS JOIN generate_series(0, 9) g(bin)
), cells AS (
  SELECT s.day, s.event_type, s.tot,
         greatest(COALESCE(l.n, 0) * 1.0 / s.tot, 1e-6) AS p,
         COALESCE(r.p_ref, 1e-6) AS p_ref
  FROM spine s
  LEFT JOIN live l ON s.day = l.day AND s.event_type = l.event_type
                   AND s.bin = l.bin
  LEFT JOIN ref_shares r ON s.event_type = r.event_type AND s.bin = r.bin
)
SELECT CAST(epoch(day) AS BIGINT) AS day_start_s, event_type,
       round(sum((p - p_ref) * (ln(p) - ln(p_ref))), 6) AS psi,
       CAST(min(tot) AS BIGINT) AS n_events
FROM cells GROUP BY 1, 2
"""


# value_quantiles_approx: exact quantile_cont values hash-matched; the
# GK rank verdicts asserted TRUE (the sketch's returned element is
# implementation-defined; its rank-error guarantee is what the Spark
# side checks exactly, per the recall-invariant pattern).
ORACLE_SQL["value_quantiles_approx"] = """
WITH q AS (
  SELECT event_type,
         quantile_cont(value, [0.5, 0.9, 0.99]) AS qs
  FROM events GROUP BY event_type
), px AS (
  SELECT event_type, g.i,
         CASE g.i WHEN 1 THEN 0.5 WHEN 2 THEN 0.9 ELSE 0.99 END AS p,
         round(qs[g.i], 4) AS exact_q
  FROM q CROSS JOIN generate_series(1, 3) g(i)
)
SELECT event_type, round(CAST(p AS DOUBLE), 2) AS p, exact_q,
       TRUE AS rank_ok
FROM px
"""


# gopher_quality_flags: the Gopher rule thresholds replayed with list
# arithmetic; same whitespace tokenization / lowercased stopword
# convention as the rest of the text stack.
ORACLE_SQL["gopher_quality_flags"] = f"""
WITH base AS (
  SELECT source, text,
         {_TOKS} AS toks
  FROM documents WHERE text IS NOT NULL
), sig AS (
  SELECT source,
         len(toks) AS n_words,
         list_sum(list_transform(toks, t -> len(t))) * 1.0 / len(toks)
           AS mean_wl,
         len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]')))
           * 1.0 / len(toks) AS alpha_ratio,
         (len(text) - len(replace(text, '#', ''))
          + (len(text) - len(replace(text, '...', ''))) / 3.0)
           / len(toks) AS symbol_ratio,
         len(list_filter(list_transform(toks, t -> lower(t)),
             t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS stop_hits
  FROM base WHERE len(toks) > 0
), flags AS (
  SELECT source,
         NOT (n_words BETWEEN 50 AND 100000) AS f_words,
         NOT (mean_wl BETWEEN 3.0 AND 10.0) AS f_wordlen,
         symbol_ratio > 0.1 AS f_symbols,
         alpha_ratio < 0.8 AS f_alpha,
         stop_hits < 2 AS f_stopwords
  FROM sig
)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN f_words THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_word_count,
       CAST(sum(CASE WHEN f_wordlen THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_mean_word_len,
       CAST(sum(CASE WHEN f_symbols THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_symbol_ratio,
       CAST(sum(CASE WHEN f_alpha THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_alpha_ratio,
       CAST(sum(CASE WHEN f_stopwords THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_stopwords,
       round(sum(CASE WHEN NOT f_words AND NOT f_wordlen AND NOT f_symbols
                       AND NOT f_alpha AND NOT f_stopwords
                  THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS pass_rate
FROM flags GROUP BY source
"""


# events_stream_mad_outliers: batch replay — first-half median/MAD
# (round-9 quantized thresholds, same doubles both sides), per-day
# modified-z outlier counts over the full stream.
ORACLE_SQL["events_stream_mad_outliers"] = """
WITH ev AS (
  SELECT event_type, value, epoch_us(ts) AS us,
         date_trunc('day', ts) AS day
  FROM events
), m AS (
  SELECT CAST(round(quantile_cont(us, 0.5)) AS BIGINT) AS m FROM ev
), fh AS (
  SELECT event_type, value FROM ev CROSS JOIN m WHERE us <= m.m
), med AS (
  SELECT event_type, round(quantile_cont(value, 0.5), 9) AS med
  FROM fh GROUP BY 1
), mad AS (
  SELECT f.event_type, any_value(d.med) AS med,
         round(quantile_cont(abs(f.value - d.med), 0.5), 9) AS mad
  FROM fh f JOIN med d USING (event_type) GROUP BY f.event_type
), thr AS (
  SELECT event_type, med, round(3.5 * 1.4826 * mad, 9) AS thr FROM mad
)
SELECT CAST(epoch(ev.day) AS BIGINT) AS day_start_s, ev.event_type,
       count(*) AS n_events,
       CAST(sum(CASE WHEN abs(ev.value - t.med) > t.thr THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       round(sum(CASE WHEN abs(ev.value - t.med) > t.thr THEN 1 ELSE 0 END)
             * 1.0 / count(*), 6) AS outlier_share
FROM ev JOIN thr t USING (event_type)
GROUP BY 1, 2
"""


# ivf_recall_at_k: per-query overlap of the IVF top-5 (label cell)
# with the exact brute-force top-5 — both CTEs are the existing
# knn oracles verbatim; recall@5 over denominator k.
ORACLE_SQL["ivf_recall_at_k"] = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), bscored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS cos
  FROM e a JOIN e b ON a.vec_id < 10 AND a.vec_id <> b.vec_id
), brute AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, row_number() OVER (
      PARTITION BY query_id
      ORDER BY round(cos * 1e12) DESC, neighbor_id ASC) AS rank
    FROM bscored
  ) WHERE rank <= 5
), iscored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS cos
  FROM e a JOIN e b
    ON a.vec_id < 10 AND a.vec_id <> b.vec_id AND a.label = b.label
), ivf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, row_number() OVER (
      PARTITION BY query_id
      ORDER BY round(cos * 1e12) DESC, neighbor_id ASC) AS rank
    FROM iscored
  ) WHERE rank <= 5
)
SELECT b.query_id,
       CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       round(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             / 5.0, 4) AS recall_at_5
FROM brute b LEFT JOIN ivf i
  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
GROUP BY b.query_id
"""


# leakage_safe_split: cluster-keyed 80/10/10 split over the
# normalized-content hash (same normalization + hash48 as
# normalized_dedup_docs); straddle count computed, not assumed.
ORACLE_SQL["leakage_safe_split"] = f"""
WITH n AS (
  SELECT doc_id,
         CAST(((md5_number(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))
           % {_M48} + {_M48}) % {_M48}) AS BIGINT) AS cluster_key
  FROM documents WHERE text IS NOT NULL
), a AS (
  SELECT doc_id, cluster_key,
         CASE WHEN cluster_key % 100 < 80 THEN 'train'
              WHEN cluster_key % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM n
), pc AS (
  SELECT cluster_key, count(*) AS n_docs,
         count(DISTINCT split) AS n_splits, any_value(split) AS split
  FROM a GROUP BY cluster_key
), t AS (
  SELECT count(*) AS n_total FROM a
)
SELECT split, CAST(sum(n_docs) AS BIGINT) AS n_docs,
       count(*) AS n_clusters,
       CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_straddling_clusters,
       round(sum(n_docs) * 1.0 / any_value(t.n_total), 4) AS doc_share
FROM pc CROSS JOIN t GROUP BY split
"""


# jsonl_ingest_stats: the same profile from the PARQUET table — the
# Spark side reads its own JSONL dump, so a hash match proves the
# round trip preserved every value the profile touches.
ORACLE_SQL["jsonl_ingest_stats"] = """
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(len(text)) AS BIGINT) AS total_text_len,
       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_text,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM documents
GROUP BY source, lang
"""


# zorder_box_scan: the same 2-D box aggregate from the RAW table (the
# Z-ordered layout changes the PLAN and file-touch count, never the
# values).
ORACLE_SQL["zorder_box_scan"] = f"""
SELECT count(*) AS n_items,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       {_qsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
       round(sum(l_quantity), 2) AS total_qty
FROM lineitem
WHERE l_partkey BETWEEN 100 AND 400 AND l_suppkey BETWEEN 10 AND 60
"""


# bm25_topk_docs: BM25 with the identical formula, round-6 quantized
# scores ranked with the same (score desc, doc_id) total order.
ORACLE_SQL["bm25_topk_docs"] = f"""
WITH q(query, term) AS (
  VALUES ('q_join', 'spark'), ('q_join', 'join'), ('q_join', 'filter'),
         ('q_scan', 'table'), ('q_scan', 'scan'), ('q_scan', 'merge'),
         ('q_stream', 'stream'), ('q_stream', 'window'), ('q_stream', 'value')
), toks AS (
  SELECT doc_id, u.term
  FROM (
    SELECT doc_id,
           {_TOKS} AS ts
    FROM documents WHERE text IS NOT NULL
  ), unnest(ts) AS u(term)
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT count(*) AS n_corpus, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT t.doc_id, t.term, count(*) AS tf
  FROM toks t
  WHERE t.term IN (SELECT DISTINCT term FROM q)
  GROUP BY t.doc_id, t.term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
), scored AS (
  SELECT q.query, tf.doc_id,
         ln((s.n_corpus - df.df + 0.5) / (df.df + 0.5) + 1.0)
         * tf.tf * (1.2 + 1)
         / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS part
  FROM tf
  JOIN df USING (term)
  JOIN q ON q.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
), per_doc AS (
  SELECT query, doc_id, round(sum(part), 6) AS score
  FROM scored GROUP BY query, doc_id
), ranked AS (
  SELECT query, doc_id, score, row_number() OVER (
    PARTITION BY query ORDER BY score DESC, doc_id ASC) AS rank
  FROM per_doc
)
SELECT query, doc_id, score, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 10
"""


# source_temperature_mix: sqrt-tempered shares + largest-remainder
# 10k allocation, same total order on fractional parts.
ORACLE_SQL["source_temperature_mix"] = """
WITH c AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
), t AS (
  SELECT sum(n_docs) AS n_total, sum(sqrt(n_docs)) AS z FROM c
), s AS (
  SELECT c.source, c.n_docs,
         round(c.n_docs * 1.0 / t.n_total, 6) AS natural_share,
         round(sqrt(c.n_docs) / t.z, 9) AS q
  FROM c CROSS JOIN t
), seats AS (
  SELECT source, n_docs, natural_share, q,
         q * 10000 AS exact_seats,
         CAST(floor(q * 10000) AS BIGINT) AS floor_seats
  FROM s
), r AS (
  SELECT sum(floor_seats) AS floor_total FROM seats
), ranked AS (
  SELECT seats.*, (10000 - r.floor_total) AS n_rem,
         row_number() OVER (
           ORDER BY exact_seats - floor_seats DESC, source ASC) AS rk
  FROM seats CROSS JOIN r
)
SELECT source, n_docs, natural_share, round(q, 6) AS tempered_share,
       CAST(floor_seats + CASE WHEN rk <= n_rem THEN 1 ELSE 0 END
            AS BIGINT) AS alloc_10k
FROM ranked
"""


# hybrid_rrf_fusion: BM25 top-10 (same CTEs as bm25_topk_docs) fused
# by RRF (k=60) with a dense cosine top-10 seeded by each query's
# BM25 rank-1 document embedding (pseudo-relevance feedback); dense
# ranking on raw cosine with neighbor-id tie-break, matching
# cosine_topk; the seed doc itself is retrievable (no self-exclusion —
# query ids are offset out of the corpus id range on the Spark side).
ORACLE_SQL["hybrid_rrf_fusion"] = f"""
WITH q(query, term) AS (
  VALUES ('q_join', 'spark'), ('q_join', 'join'), ('q_join', 'filter'),
         ('q_scan', 'table'), ('q_scan', 'scan'), ('q_scan', 'merge'),
         ('q_stream', 'stream'), ('q_stream', 'window'), ('q_stream', 'value')
), toks AS (
  SELECT doc_id, u.term
  FROM (
    SELECT doc_id,
           {_TOKS} AS ts
    FROM documents WHERE text IS NOT NULL
  ), unnest(ts) AS u(term)
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT count(*) AS n_corpus, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT t.doc_id, t.term, count(*) AS tf
  FROM toks t
  WHERE t.term IN (SELECT DISTINCT term FROM q)
  GROUP BY t.doc_id, t.term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
), bm_scored AS (
  SELECT q.query, tf.doc_id,
         ln((s.n_corpus - df.df + 0.5) / (df.df + 0.5) + 1.0)
         * tf.tf * (1.2 + 1)
         / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS part
  FROM tf
  JOIN df USING (term)
  JOIN q ON q.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
), bm_per_doc AS (
  SELECT query, doc_id, round(sum(part), 6) AS score
  FROM bm_scored GROUP BY query, doc_id
), bm25 AS (
  SELECT query, doc_id, rank FROM (
    SELECT query, doc_id, row_number() OVER (
      PARTITION BY query ORDER BY score DESC, doc_id ASC) AS rank
    FROM bm_per_doc
  ) WHERE rank <= 10
), e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), seeds AS (
  SELECT b.query, e.v FROM bm25 b JOIN e ON b.doc_id = e.vec_id
  WHERE b.rank = 1
), d_scored AS (
  SELECT a.query, b.vec_id AS doc_id,
         list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v))
            * sqrt(list_dot_product(b.v, b.v))) AS cos
  FROM seeds a CROSS JOIN e b
), dense AS (
  SELECT query, doc_id, rank FROM (
    SELECT query, doc_id, row_number() OVER (
      PARTITION BY query
      ORDER BY round(cos * 1e12) DESC, doc_id ASC) AS rank
    FROM d_scored
  ) WHERE rank <= 10
), fused AS (
  SELECT COALESCE(b.query, d.query) AS query,
         COALESCE(b.doc_id, d.doc_id) AS doc_id,
         round(COALESCE(1.0 / (60 + b.rank), 0)
               + COALESCE(1.0 / (60 + d.rank), 0), 6) AS rrf_score
  FROM bm25 b FULL OUTER JOIN dense d
    ON b.query = d.query AND b.doc_id = d.doc_id
)
SELECT query, doc_id, rrf_score, CAST(rank AS INTEGER) AS rank FROM (
  SELECT query, doc_id, rrf_score, row_number() OVER (
    PARTITION BY query ORDER BY rrf_score DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= 10
"""


# k_anonymity_profile: QI-group sizes vs k thresholds.
ORACLE_SQL["k_anonymity_profile"] = """
WITH g AS (
  SELECT c_mktsegment, c_nationkey, count(*) AS gsize
  FROM customer GROUP BY 1, 2
), t AS (
  SELECT sum(gsize) AS n_rows FROM g
), ks AS (
  SELECT g.gsize, t.n_rows, u.k
  FROM g CROSS JOIN t, unnest([2, 5, 10]) AS u(k)
)
SELECT k,
       CAST(sum(CASE WHEN gsize < k THEN 1 ELSE 0 END) AS BIGINT)
         AS violating_groups,
       CAST(sum(CASE WHEN gsize < k THEN gsize ELSE 0 END) AS BIGINT)
         AS exposed_rows,
       round(sum(CASE WHEN gsize < k THEN gsize ELSE 0 END)
             * 1.0 / any_value(n_rows), 6) AS exposed_share
FROM ks GROUP BY k
"""


# hourly_ewma_top_residuals: identical sequential fold (list_reduce
# over the hour-sorted series, alpha=0.5 exact halving) -> lag
# residuals -> top-5 per type.
ORACLE_SQL["hourly_ewma_top_residuals"] = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         round(avg(value), 9) AS x
  FROM events GROUP BY 1, 2
), arrs AS (
  SELECT event_type,
         list(hour ORDER BY hour) AS hours,
         list(x ORDER BY hour) AS xs
  FROM hourly GROUP BY event_type
), folded AS (
  SELECT event_type, hours, xs,
         list_transform(range(1, len(xs) + 1),
           i -> list_reduce(xs[1:i],
                (a, b) -> CAST(a * 0.5 AS DOUBLE)
                          + CAST(b * 0.5 AS DOUBLE))) AS ew
  FROM arrs
), rows_ AS (
  SELECT f.event_type, u.i,
         f.hours[u.i] AS hour, f.xs[u.i] AS x, f.ew[u.i] AS ewma
  FROM folded f, unnest(range(1, len(f.xs) + 1)) AS u(i)
), scored AS (
  SELECT event_type,
         CAST(epoch(hour) AS BIGINT) AS hour_s,
         round(x, 6) AS value,
         round(ewma, 6) AS ewma,
         round(abs(x - lag(ewma) OVER (
           PARTITION BY event_type ORDER BY hour)), 6) AS abs_residual
  FROM rows_
)
SELECT event_type, hour_s, value, ewma, abs_residual,
       CAST(rk AS INTEGER) AS rk
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY event_type
    ORDER BY abs_residual DESC, hour_s ASC) AS rk
  FROM scored WHERE abs_residual IS NOT NULL
) WHERE rk <= 5
"""


# events_native_session_window: gap-islands replay of the native
# session_window semantics — session end = last event + gap (10 min),
# epoch MICROS per the catalog timestamp rule.
ORACLE_SQL["events_native_session_window"] = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, value FROM events
), flagged AS (
  SELECT user_id, us, event_id, value,
         CASE WHEN us - lag(us) OVER (
                PARTITION BY user_id ORDER BY us, event_id) > 600000000
              OR lag(us) OVER (
                PARTITION BY user_id ORDER BY us, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e
), sessions AS (
  -- event_id tie-break (the sessionize_events oracle's defense): with
  -- duplicate (user, ts) rows an untied running sum could order the
  -- unflagged duplicate before the flagged one and assign it to the
  -- PREVIOUS session; tied rows are 0 apart so they always belong to
  -- the flagged row's session.
  SELECT user_id, us, value,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       min(us) AS session_start_us,
       max(us) + 600000000 AS session_end_us,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM sessions GROUP BY user_id, sid
"""


# audio_feature_stats: closed-form replay of the WAV DSP — audio rows
# are doc_id%3==2 with rate 8000+doc_id%8*500 and n_samples=n_chars;
# the synthesized square wave has RMS exactly 1000 and (n-1)//4
# crossings.
ORACLE_SQL["audio_feature_stats"] = """
WITH a AS (
  SELECT CAST(8000 + doc_id % 8 * 500 AS INT) AS rate,
         n_chars AS n_samples
  FROM documents WHERE doc_id % 3 = 2 AND n_chars > 0
)
SELECT rate, count(*) AS n_clips,
       CAST(sum(n_samples) AS BIGINT) AS total_samples,
       round(avg(1000.0), 4) AS mean_rms,
       CAST(sum((n_samples - 1) // 4) AS BIGINT) AS total_crossings
FROM a GROUP BY rate
"""


# l_diversity_profile: distinct sensitive values per QI group vs l.
ORACLE_SQL["l_diversity_profile"] = """
WITH g AS (
  SELECT c_nationkey, count(DISTINCT c_mktsegment) AS l_distinct,
         count(*) AS gsize
  FROM customer GROUP BY c_nationkey
), t AS (
  SELECT sum(gsize) AS n_rows FROM g
), ks AS (
  SELECT g.l_distinct, g.gsize, t.n_rows, u.l
  FROM g CROSS JOIN t, unnest([2, 3, 5]) AS u(l)
)
SELECT l,
       CAST(sum(CASE WHEN l_distinct < l THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_below_l,
       CAST(sum(CASE WHEN l_distinct < l THEN gsize ELSE 0 END) AS BIGINT)
         AS rows_below_l,
       round(sum(CASE WHEN l_distinct < l THEN gsize ELSE 0 END)
             * 1.0 / any_value(n_rows), 6) AS exposed_share
FROM ks GROUP BY l
"""


# doc_skyline_frontier: same two-window dominance test (strictly
# longer RANGE frame + equal-length peer max).
ORACLE_SQL["doc_skyline_frontier"] = f"""
WITH m AS (
  SELECT doc_id,
         len({_TOKS})
           AS n_tokens,
         round(len(list_distinct(list_filter(
                 string_split_regex(text, '\\s+'), t -> t != '')))
               * 1.0 /
               len({_TOKS}), 9) AS diversity
  FROM documents WHERE text IS NOT NULL
), nz AS (
  SELECT * FROM m WHERE n_tokens > 0
), flagged AS (
  SELECT doc_id, n_tokens, diversity,
         max(diversity) OVER (
           ORDER BY n_tokens
           RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS best_longer,
         max(diversity) OVER (PARTITION BY n_tokens) AS best_peer
  FROM nz
)
SELECT doc_id, n_tokens, round(diversity, 6) AS diversity
FROM flagged
WHERE NOT ((best_longer IS NOT NULL AND best_longer >= diversity)
           OR best_peer > diversity)
ORDER BY n_tokens DESC, doc_id ASC
"""


# mergeable_profile_check: whole-table deterministic values + TRUE
# verdicts (the merge arithmetic is checked Spark-side; the oracle
# pins the merged values and asserts the invariant).
ORACLE_SQL["mergeable_profile_check"] = """
SELECT count(*) AS merged_rows,
       round(CAST(min(l_quantity) AS DOUBLE), 4) AS merged_min,
       round(CAST(max(l_quantity) AS DOUBLE), 4) AS merged_max,
       TRUE AS exact_merge_ok,
       TRUE AS float_merge_ok
FROM lineitem
"""


# events_stream_restart_recovery: the batch one-pass aggregate the
# two-run checkpointed stream must reproduce; recovery verdicts are
# computed Spark-side and asserted TRUE here (sketch-gate pattern).
ORACLE_SQL["events_stream_restart_recovery"] = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(user_id) AS BIGINT) AS sum_uid,
       TRUE AS recovered_in_run2
FROM events
GROUP BY event_type
"""

# The statestore-reader gate audits the PERSISTED aggregation buffers
# in the checkpoint; correct recovered state == the batch aggregate.
ORACLE_SQL["statestore_reader_recovery"] = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(user_id) AS BIGINT) AS sum_uid
FROM events
GROUP BY event_type
"""

# Exact-substring dedup (suffix-array family): k-gram postings with a
# df<=50 anchor cap (mirrored from the operator contract), candidate
# matches on the full gram text, maximal runs via diagonal
# gaps-and-islands — a run of r k-grams is a shared substring of
# r + k - 1 tokens (k = 12).
ORACLE_SQL["substring_dedup_pairs"] = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), pos AS (
  SELECT doc_id, ts, generate_subscripts(ts, 1) AS i
  FROM toks WHERE len(ts) >= 12
), kg AS (
  SELECT doc_id, i AS pos, array_to_string(ts[i:i+11], ' ') AS g
  FROM pos WHERE i <= len(ts) - 11
), keep AS (
  SELECT g FROM kg GROUP BY g HAVING count(DISTINCT doc_id) <= 50
), kgf AS (
  SELECT kg.doc_id, kg.pos, kg.g FROM kg JOIN keep USING (g)
), m AS (
  SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
  FROM kgf a JOIN kgf b ON a.g = b.g AND a.doc_id < b.doc_id
), runs AS (
  SELECT da, db, pa - pb AS diag,
         pa - row_number() OVER (
           PARTITION BY da, db, pa - pb ORDER BY pa) AS island
  FROM m
), isl AS (
  SELECT da, db, count(*) AS cnt FROM runs GROUP BY da, db, diag, island
)
SELECT da AS doc_a, db AS doc_b,
       CAST(max(cnt) + 11 AS INT) AS longest_match_tokens,
       CAST(sum(cnt) AS BIGINT) AS n_shared_kgrams
FROM isl GROUP BY 1, 2
"""

# Polymorphic-UDTF gate: the serialize → parse_fields(analyze) →
# re-aggregate round trip must equal the raw-column aggregate.
ORACLE_SQL["udtf_analyze_parse"] = """
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE source IS NOT NULL AND lang IS NOT NULL AND n_chars IS NOT NULL
  AND NOT contains(source, '|') AND NOT contains(lang, '|')
GROUP BY 1, 2
"""

# Coverage variant of the exact-substring family: distinct covered
# start positions per doc (both match sides), islands with threshold
# k=12 (starts p1 < p2 share an interval iff p2 - p1 <= 12), covered
# tokens per island = last - first + 12.
ORACLE_SQL["substring_dup_coverage"] = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), pos AS (
  SELECT doc_id, ts, generate_subscripts(ts, 1) AS i
  FROM toks WHERE len(ts) >= 12
), kg AS (
  SELECT doc_id, i AS pos, array_to_string(ts[i:i+11], ' ') AS g
  FROM pos WHERE i <= len(ts) - 11
), keep AS (
  SELECT g FROM kg GROUP BY g HAVING count(DISTINCT doc_id) <= 50
), kgf AS (
  SELECT kg.doc_id, kg.pos, kg.g FROM kg JOIN keep USING (g)
), m AS (
  SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
  FROM kgf a JOIN kgf b ON a.g = b.g AND a.doc_id < b.doc_id
), starts AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT da AS doc_id, pa AS pos FROM m
    UNION ALL SELECT db, pb FROM m
  )
), grouped AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NULL OR pos - prev > 12 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM (
    SELECT doc_id, pos,
           lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
    FROM starts
  )
), per_doc AS (
  SELECT doc_id, CAST(sum(covered) AS BIGINT) AS dup_tokens
  FROM (
    SELECT doc_id, grp, max(pos) - min(pos) + 12 AS covered
    FROM grouped GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT p.doc_id, CAST(len(t.ts) AS BIGINT) AS n_tokens, p.dup_tokens,
       round(p.dup_tokens / CAST(len(t.ts) AS BIGINT), 6) AS dup_coverage
FROM per_doc p JOIN toks t USING (doc_id)
"""

# TABLE-argument UDTF gate: the order-dependent statistic (longest
# strictly-increasing n_chars run in doc_id order) is replayed with
# gaps-and-islands over the same ordering.
ORACLE_SQL["udtf_table_arg_stats"] = """
WITH s AS (
  SELECT source, doc_id, n_chars,
         CASE WHEN n_chars > lag(n_chars) OVER w THEN 0 ELSE 1 END AS brk
  FROM documents
  WINDOW w AS (PARTITION BY source ORDER BY doc_id)
), g AS (
  SELECT source, doc_id, n_chars,
         sum(brk) OVER (PARTITION BY source ORDER BY doc_id) AS grp
  FROM s
), runs AS (
  SELECT source, grp, count(*) AS rl FROM g GROUP BY 1, 2
)
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
       -- IS NOT DISTINCT FROM: a correlated `=` would yield NULL for a
       -- NULL-source group while the Spark UDTF (which partitions by
       -- source, NULLs forming their own group) emits a real value.
       -- Latent on current data (no NULL sources) — ADVICE r8.
       CAST((SELECT max(rl) FROM runs r
             WHERE r.source IS NOT DISTINCT FROM d.source) AS INT)
         AS longest_increasing_run
FROM documents d GROUP BY d.source
"""


# --------------------------------------------------------------------------
# Round 9: corpus layout + incremental-ingest oracles
# --------------------------------------------------------------------------

#: HRW weight, mirroring sharding.rendezvous_shard(mode="portable"):
#: portable_hash48("{salt}:{key}:{shard}") — the 48-bit little-endian
#: md5 prefix, same double-mod as every other portable-hash oracle.
def _hrw_w(expr: str) -> str:
    return f"((md5_number({expr}) % {_M48} + {_M48}) % {_M48})"


ORACLE_SQL["rendezvous_shard_stats"] = f"""
WITH s AS (
  SELECT doc_id, n_chars, unnest(range(0, 16)) AS shard FROM documents
), w AS (
  SELECT doc_id, n_chars, shard,
         {_hrw_w("'hrw:' || CAST(doc_id AS VARCHAR) || ':' || CAST(shard AS VARCHAR)")} AS wt
  FROM s
), pick AS (
  -- argmax over (weight, shard): ties break toward the LARGER shard
  -- id, matching array_max's lexicographic struct comparison.
  SELECT doc_id, n_chars, shard, row_number() OVER (
    PARTITION BY doc_id ORDER BY wt DESC, shard DESC) AS rk
  FROM w
)
SELECT CAST(shard AS INT) AS shard,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id,
       CAST(max(doc_id) AS BIGINT) AS max_doc_id
FROM pick WHERE rk = 1 GROUP BY shard
"""

# Incremental-ingest dedup: batch = doc_id % 97 = 0, corpus = rest.
# Exact = content-hash (portable_hash48 of the raw text) present in
# the corpus; near = any shared MinHash-LSH (band, key) bucket with a
# corpus doc — exactly the minhash_lsh_docs topology, reusing its sig
# and band fragments so the two contracts cannot drift apart.
ORACLE_SQL["incremental_dedup_new_batch"] = (
    _MINHASH_BASE_K3.format(sig_exprs=_SIG_EXPRS)
    + f""", bands AS (
{_BAND_SELECTS}
), hashes AS (
  SELECT doc_id, ((md5_number(text) % {_M48} + {_M48}) % {_M48}) AS ch
  FROM documents
), exact_hit AS (
  SELECT DISTINCT b.doc_id
  FROM hashes b JOIN hashes c ON b.ch = c.ch
  WHERE b.doc_id % 97 = 0 AND c.doc_id % 97 <> 0
), near_hit AS (
  SELECT DISTINCT nb.doc_id
  FROM bands nb JOIN bands cb
    ON nb.band = cb.band AND nb.key = cb.key
  WHERE nb.doc_id % 97 = 0 AND cb.doc_id % 97 <> 0
)
SELECT d.doc_id,
       (e.doc_id IS NOT NULL) AS exact_dup,
       (n.doc_id IS NOT NULL) AS near_dup,
       CASE WHEN e.doc_id IS NOT NULL THEN 'skip_exact'
            WHEN n.doc_id IS NOT NULL THEN 'review_near'
            ELSE 'ingest' END AS action
FROM documents d
LEFT JOIN exact_hit e ON e.doc_id = d.doc_id
LEFT JOIN near_hit n ON n.doc_id = d.doc_id
WHERE d.doc_id % 97 = 0
"""
)

# end_to_end_incremental_ingest: replay the full daily-ingest chain —
# day-N flags against the day-N−1 corpus (the incremental_dedup
# topology verbatim), accept action='ingest', refresh the index with
# the accepted docs (idx2 = corpus ∪ accepted), re-probe the batch
# against the refreshed state (every accepted doc now hits its own
# hash), and attach the membership interval (accepted docs become
# current members at day1 = 1704153600000000 µs, the same instant the
# Spark side's scd2_history emits). bands/hashes/flags/idx2 are each
# read 2-4 times → AS MATERIALIZED (the round-9 CTE-inlining pitfall).
ORACLE_SQL["end_to_end_incremental_ingest"] = (
    _MINHASH_BASE_K3.format(sig_exprs=_SIG_EXPRS)
    + f""", bands AS MATERIALIZED (
{_BAND_SELECTS}
), hashes AS MATERIALIZED (
  SELECT doc_id, ((md5_number(text) % {_M48} + {_M48}) % {_M48}) AS ch
  FROM documents
), exact_hit AS (
  SELECT DISTINCT b.doc_id
  FROM hashes b JOIN hashes c ON b.ch = c.ch
  WHERE b.doc_id % 97 = 0 AND c.doc_id % 97 <> 0
), near_hit AS (
  SELECT DISTINCT nb.doc_id
  FROM bands nb JOIN bands cb
    ON nb.band = cb.band AND nb.key = cb.key
  WHERE nb.doc_id % 97 = 0 AND cb.doc_id % 97 <> 0
), flags AS MATERIALIZED (
  SELECT d.doc_id,
         CASE WHEN e.doc_id IS NOT NULL THEN 'skip_exact'
              WHEN n.doc_id IS NOT NULL THEN 'review_near'
              ELSE 'ingest' END AS action
  FROM documents d
  LEFT JOIN exact_hit e ON e.doc_id = d.doc_id
  LEFT JOIN near_hit n ON n.doc_id = d.doc_id
  WHERE d.doc_id % 97 = 0
), idx2 AS MATERIALIZED (
  SELECT doc_id FROM documents WHERE doc_id % 97 <> 0
  UNION ALL
  SELECT doc_id FROM flags WHERE action = 'ingest'
), exact2 AS (
  SELECT DISTINCT b.doc_id
  FROM hashes b JOIN hashes c ON b.ch = c.ch
  JOIN idx2 i ON i.doc_id = c.doc_id
  WHERE b.doc_id % 97 = 0
), near2 AS (
  SELECT DISTINCT nb.doc_id
  FROM bands nb JOIN bands cb
    ON nb.band = cb.band AND nb.key = cb.key
  JOIN idx2 i ON i.doc_id = cb.doc_id
  WHERE nb.doc_id % 97 = 0
)
SELECT f.doc_id, f.action,
       CASE WHEN e2.doc_id IS NOT NULL THEN 'skip_exact'
            WHEN n2.doc_id IS NOT NULL THEN 'review_near'
            ELSE 'ingest' END AS reprobe_action,
       CASE WHEN f.action = 'ingest'
            THEN CAST(1704153600000000 AS BIGINT) END AS member_from_us,
       (f.action = 'ingest') AS member_current
FROM flags f
LEFT JOIN exact2 e2 ON e2.doc_id = f.doc_id
LEFT JOIN near2 n2 ON n2.doc_id = f.doc_id
"""
)

# incremental_dedup_indexed: the index-probing path is value-identical
# to the recompute path BY CONTRACT (per-doc MinHash signatures are
# corpus-independent; tests/test_incremental_index.py asserts frame
# equality), so it hashes against the SAME oracle — one semantic truth
# for both execution shapes, and the two gates can never drift apart.
ORACLE_SQL["incremental_dedup_indexed"] = ORACLE_SQL[
    "incremental_dedup_new_batch"
]

# e2e_ingest_neardup_resolution: the review_near decision — replay the
# probe's flag topology, pull each review doc's colliding corpus
# members through the SAME band join, then the canonical_keep window
# ((n_chars DESC NULLS LAST, id) — the W1 total order) over
# {review doc} ∪ colliders. bands is read three times, review/members
# twice → AS MATERIALIZED (the round-9 CTE-inlining pitfall).
ORACLE_SQL["e2e_ingest_neardup_resolution"] = (
    _MINHASH_BASE_K3.format(sig_exprs=_SIG_EXPRS)
    + f""", bands AS MATERIALIZED (
{_BAND_SELECTS}
), hashes AS (
  SELECT doc_id, ((md5_number(text) % {_M48} + {_M48}) % {_M48}) AS ch
  FROM documents
), exact_hit AS (
  SELECT DISTINCT b.doc_id
  FROM hashes b JOIN hashes c ON b.ch = c.ch
  WHERE b.doc_id % 97 = 0 AND c.doc_id % 97 <> 0
), near_hit AS (
  SELECT DISTINCT nb.doc_id
  FROM bands nb JOIN bands cb
    ON nb.band = cb.band AND nb.key = cb.key
  WHERE nb.doc_id % 97 = 0 AND cb.doc_id % 97 <> 0
), review AS MATERIALIZED (
  SELECT doc_id FROM near_hit
  WHERE doc_id NOT IN (SELECT doc_id FROM exact_hit)
), colliders AS (
  SELECT DISTINCT nb.doc_id AS cluster_id, cb.doc_id AS member_id
  FROM bands nb
  JOIN review r ON r.doc_id = nb.doc_id
  JOIN bands cb ON nb.band = cb.band AND nb.key = cb.key
  WHERE cb.doc_id % 97 <> 0
), members AS MATERIALIZED (
  SELECT doc_id AS cluster_id, doc_id AS member_id FROM review
  UNION
  SELECT cluster_id, member_id FROM colliders
), ranked AS (
  SELECT m.cluster_id, m.member_id,
         first_value(m.member_id) OVER (
           PARTITION BY m.cluster_id
           ORDER BY d.n_chars DESC NULLS LAST, m.member_id ASC
         ) AS canonical_id
  FROM members m LEFT JOIN documents d ON d.doc_id = m.member_id
)
SELECT r.cluster_id AS doc_id,
       CAST(c.n_members AS BIGINT) AS n_members,
       r.canonical_id,
       (r.member_id = r.canonical_id) AS keep
FROM ranked r
JOIN (
  SELECT cluster_id, count(*) AS n_members FROM members GROUP BY 1
) c ON c.cluster_id = r.cluster_id
WHERE r.member_id = r.cluster_id
"""
)


def _bpe_train_ctes(n_merges: int) -> str:
    """Training-CTE chain for the BPE oracles, generated for any round
    count with the exact textual pattern of the (hand-written, r7)
    bpe_merge_symbol_stats literal above: wf{i}/sym{i}/pc{i}/best{i}
    per round, fixpoint double-replace per merge, coalesce(chr(2))
    guards so an empty best (no pairs) is a no-op rather than an
    annihilator. sym/best CTEs are MATERIALIZED — each is read twice
    (training continuation + the encode fold), and DuckDB inlines
    plain CTEs per reference."""
    parts = ["""WITH w AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'), x -> x != ''))
         AS w
  FROM documents WHERE text IS NOT NULL
), wf0 AS (
  SELECT chr(1) || array_to_string(regexp_extract_all(w, '.'), chr(1)) || chr(1) AS s,
         CAST(count(*) AS BIGINT) AS freq
  FROM w GROUP BY 1
)"""]
    for i in range(n_merges):
        rep = (
            "replace(replace(s,\n"
            "           coalesce(chr(1) || a || chr(1) || b || chr(1), chr(2)),\n"
            "           coalesce(chr(1) || a || b || chr(1), chr(2))),\n"
            "         coalesce(chr(1) || a || chr(1) || b || chr(1), chr(2)),\n"
            "         coalesce(chr(1) || a || b || chr(1), chr(2)))"
        )
        parts.append(f""", sym{i} AS MATERIALIZED (
  SELECT s, freq, list_filter(string_split(s, chr(1)), x -> x != '') AS q
  FROM wf{i}
), pc{i} AS (
  SELECT q[i] AS a, q[i + 1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, q, unnest(range(1, len(q))) AS i FROM sym{i})
  GROUP BY 1, 2
), best{i} AS MATERIALIZED (
  SELECT a, b FROM pc{i} ORDER BY cnt DESC, a, b LIMIT 1
), wf{i + 1} AS (
  SELECT {rep} AS s, freq
  FROM sym{i} LEFT JOIN best{i} ON true
)""")
    return "".join(parts)


# bpe_encode_token_counts: train the 3-merge tokenizer (identical fold
# to bpe_merge_symbol_stats), then ENCODE — apply the merges to the
# distinct vocabulary (v0..v3 replace fold over the best{i} CTEs) and
# sum per-doc encoded symbol counts over one corpus word explode.
_BPE_N = 3
_BPE_ENCODE_FOLD = "".join(
    f""", v{i + 1} AS (
  SELECT w, replace(replace(s,
           coalesce(chr(1) || a || chr(1) || b || chr(1), chr(2)),
           coalesce(chr(1) || a || b || chr(1), chr(2))),
         coalesce(chr(1) || a || chr(1) || b || chr(1), chr(2)),
         coalesce(chr(1) || a || b || chr(1), chr(2))) AS s
  FROM v{i} LEFT JOIN best{i} ON true
)"""
    for i in range(_BPE_N)
)
ORACLE_SQL["bpe_encode_token_counts"] = (
    _bpe_train_ctes(_BPE_N)
    + """, vocab AS (
  SELECT DISTINCT w FROM w
), v0 AS (
  SELECT w, chr(1) || array_to_string(regexp_extract_all(w, '.'), chr(1)) || chr(1) AS s
  FROM vocab
)"""
    + _BPE_ENCODE_FOLD
    + f""", venc AS MATERIALIZED (
  SELECT w,
         CAST(len(list_filter(string_split(s, chr(1)), x -> x != '')) AS BIGINT)
         AS n_sym
  FROM v{_BPE_N}
)
SELECT w.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(v.n_sym) AS BIGINT) AS bpe_tokens
FROM w JOIN venc v ON v.w = w.w
GROUP BY w.doc_id
"""
)


# scd2_user_event_history: tie-dedup (max value per (key, ts)) →
# null-safe change compression → lead() intervals; IS DISTINCT FROM is
# the SQL twin of Spark's ~eqNullSafe (round-8 advice precedent).
ORACLE_SQL["scd2_user_event_history"] = """
WITH b AS (
  SELECT user_id, ts, event_type FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
), t AS (
  SELECT user_id, ts, event_type,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_type DESC) AS pts
  FROM b
), d AS (
  SELECT user_id, ts, event_type FROM t WHERE pts IS NULL OR pts <> ts
), c0 AS (
  SELECT user_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS pv
  FROM d
), c AS (
  SELECT user_id, ts, event_type FROM c0
  WHERE pv IS DISTINCT FROM event_type
)
SELECT user_id, event_type,
       epoch_us(ts) AS effective_from_us,
       epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts))
         AS effective_to_us,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL)
         AS is_current
FROM c
"""

# scd2_refresh_history: the incremental refresh must be value-
# identical to a full rebuild over feed ∪ new-batch (= all events), so
# it hashes against the SAME oracle text as scd2_user_event_history —
# one semantic truth for both execution shapes (the
# incremental_dedup_indexed precedent); the equality property is
# additionally pinned by tests/test_scd2.py under dense ties.
ORACLE_SQL["scd2_refresh_history"] = ORACLE_SQL["scd2_user_event_history"]

# scd2_refresh_pruned_history: the keyed-layout refresh (semi-join on
# (shard, key) against the write_scd2_feed layout, DPP-pruned read)
# must ALSO be value-identical to the full rebuild — same one-truth
# oracle text; the layout changes the PLAN (pruned scan), never the
# result.
ORACLE_SQL["scd2_refresh_pruned_history"] = ORACLE_SQL[
    "scd2_user_event_history"
]

# scd2_cow_refresh_history: the copy-on-write in-place refresh of the
# stored history layout (touched shards only, dynamic partition
# overwrite) must ALSO read back value-identical to the full rebuild
# — the fourth execution shape over the same semantic truth.
ORACLE_SQL["scd2_cow_refresh_history"] = ORACLE_SQL[
    "scd2_user_event_history"
]

# scd2_two_day_cycle_history: two consecutive daily cycles (feed
# delta appends + partial history rewrites) must land on the same
# truth — feed0 ∪ day1 ∪ day2 = all events, so the oracle is again
# the full-rebuild text; what the hash pins is the PIPELINE (a lost
# feed delta or a torn shard rewrite would diverge).
ORACLE_SQL["scd2_two_day_cycle_history"] = ORACLE_SQL[
    "scd2_user_event_history"
]

# neardup_canonical_keep: wraps the neardup_clusters oracle verbatim
# (MATERIALIZED — the cluster table feeds the quality join AND the
# window) and applies the same first_value canonical rule. LEFT JOIN +
# NULLS LAST mirror the operator's missing-quality-row contract (a
# clustered doc with no quality row stays in the list and sorts last).
ORACLE_SQL["neardup_canonical_keep"] = f"""
WITH clusters AS MATERIALIZED (
{ORACLE_SQL["neardup_clusters"]}
), q AS (
  SELECT c.doc_id, c.cluster_id, d.n_chars
  FROM clusters c LEFT JOIN documents d USING (doc_id)
)
SELECT doc_id, cluster_id,
       CAST(first_value(doc_id) OVER (
         PARTITION BY cluster_id ORDER BY n_chars DESC NULLS LAST, doc_id
       ) AS BIGINT) AS canonical_id,
       (doc_id = first_value(doc_id) OVER (
         PARTITION BY cluster_id ORDER BY n_chars DESC NULLS LAST, doc_id
       )) AS keep
FROM q
"""


# Compaction gates (round 13, VERDICT r12 item 1): a fold of the
# *_delta_* directories into the base partitions must be INVISIBLE to
# every probe — so each oracle is the corresponding pre-existing
# replay (one semantic truth again: a compaction that changed any
# probed value would hash-diverge) wrapped with the gates' literal
# proof columns. n_diff_rows is MEASURED Spark-side (the multiset
# |before △ after| across the fold) and must be 0; deltas_remaining
# counts surviving delta dirs/markers after the fold and must be 0.
_COMPACT_PROOF = (
    ", CAST(0 AS INTEGER) AS n_diff_rows"
    ", CAST(0 AS INTEGER) AS deltas_remaining"
)

# The dedup fold replays the e2e ingest chain's REPROBE: the compacted
# base is exactly corpus ∪ accepted (= idx2), so the batch probed
# against it must match the oracle's base ∪ deltas flag topology.
ORACLE_SQL["dedup_index_compaction_probe"] = (
    "SELECT doc_id, reprobe_action AS final_action"
    + _COMPACT_PROOF
    + " FROM ("
    + ORACLE_SQL["end_to_end_incremental_ingest"]
    + ")"
)

ORACLE_SQL["ann_index_compaction_topk"] = (
    "SELECT q_id, vec_id, adc_dist, rk"
    + _COMPACT_PROOF
    + " FROM ("
    + ORACLE_SQL["ann_index_delta_topk"]
    + ")"
)

# feed0 ∪ day1 ∪ day2 = all events: the post-compaction history joins
# the SCD2 family's one-truth full-rebuild text.
ORACLE_SQL["scd2_feed_compaction_history"] = (
    "SELECT user_id, event_type, effective_from_us, effective_to_us,"
    " is_current"
    + _COMPACT_PROOF
    + " FROM ("
    + ORACLE_SQL["scd2_user_event_history"]
    + ")"
)


# ann_rebuild_trigger_policy (round 13, VERDICT r12 item 3): replays
# BOTH phases — 'delta' is the ann_delta_recall replay restricted to
# nprobe=2 (corpus-trained codebook/cells + frozen-codebook inserts);
# 'post_rebuild' retrains the whole chain over ALL embeddings and
# probes the same batch queries at nprobe=2 against the same exact
# top-5. The CONDITIONAL is replayed too: the post row exists only
# where the delta recall crosses the declared threshold, exactly the
# Spark gate's driver-side trigger. drow is MATERIALIZED (read twice:
# the union row and the trigger predicate — the round-9 CTE-inlining
# pitfall).
_ANN_POLICY_POST = _pq_train_sql("").replace(
    "SELECT vec_id, list_transform",
    "SELECT vec_id, label, list_transform",
) + """, lc AS (
  SELECT a.vec_id, a.sub_id, a.cluster, e.label
  FROM a2 a JOIN e USING (vec_id)
), cellc AS (
  SELECT label, list(cv ORDER BY dim) AS c FROM (
    SELECT label, d AS dim, round(avg(val), 4) AS cv FROM (
      SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS d
      FROM e
    ) GROUP BY 1, 2
  ) GROUP BY label
), b AS (
  SELECT vec_id, v FROM e WHERE vec_id % 97 = 0
), qcell AS (
  SELECT q.vec_id AS q_id, c.label,
         list_reduce(list_transform(list_zip(q.v, c.c),
           x -> (x[1] - x[2]) * (x[1] - x[2])), (acc, t) -> acc + t) AS cd
  FROM b q CROSS JOIN cellc c
), qprobe AS (
  SELECT q_id, label FROM (
    SELECT q_id, label, row_number() OVER (
      PARTITION BY q_id ORDER BY cd, label) AS crk
    FROM qcell
  ) WHERE crk <= 2
), lut AS (
  SELECT q.vec_id AS q_id, q.sub_id, c.cluster AS code,
         list_reduce(list_transform(list_zip(q.sv, c.c),
           x -> (x[1] - x[2]) * (x[1] - x[2])), (a, b) -> a + b) AS ld
  FROM sub q JOIN c1 c USING (sub_id)
  WHERE q.vec_id % 97 = 0
), scored AS (
  SELECT p.q_id, a.vec_id, round(sum(l.ld), 6) AS adc_dist
  FROM qprobe p
  JOIN lc a ON a.label = p.label
  JOIN lut l ON l.q_id = p.q_id AND l.sub_id = a.sub_id
            AND l.code = a.cluster
  GROUP BY 1, 2
), approx AS (
  SELECT q_id, vec_id AS neighbor_id FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY q_id ORDER BY adc_dist, vec_id) AS rk
    FROM scored s
  ) WHERE rk <= 5
), ed AS (
  SELECT q.vec_id AS q_id, a.vec_id AS neighbor_id,
         list_reduce(list_transform(list_zip(q.v, a.v),
           x -> (x[1] - x[2]) * (x[1] - x[2])), (acc, t) -> acc + t) AS d
  FROM b q CROSS JOIN e a
), exact AS (
  SELECT q_id, neighbor_id FROM (
    SELECT q_id, neighbor_id, row_number() OVER (
      PARTITION BY q_id ORDER BY d, neighbor_id) AS rk
    FROM ed
  ) WHERE rk <= 5
), nq AS (
  SELECT count(DISTINCT q_id) AS n_queries FROM exact
)
SELECT CAST(nq.n_queries AS BIGINT) AS n_queries,
       CAST(h.n_hits AS BIGINT) AS n_hits,
       round(h.n_hits * 1.0 / (nq.n_queries * 5), 4) AS recall_at_5
FROM (
  SELECT count(*) AS n_hits FROM approx ap
  WHERE EXISTS (
    SELECT 1 FROM exact x
    WHERE x.q_id = ap.q_id AND x.neighbor_id = ap.neighbor_id
  )
) h CROSS JOIN nq
"""

ORACLE_SQL["ann_rebuild_trigger_policy"] = (
    """WITH drow AS MATERIALIZED (
  SELECT n_queries, n_hits, recall_at_5 FROM ("""
    + ORACLE_SQL["ann_delta_recall"]
    + """) WHERE nprobe = 2
), prow AS (
  SELECT n_queries, n_hits, recall_at_5 FROM ("""
    + _ANN_POLICY_POST
    + """)
)
SELECT phase, n_queries, n_hits, recall_at_5,
       CASE WHEN recall_at_5 < 0.5 THEN 'rebuild' ELSE 'hold' END
         AS decision
FROM (
  SELECT 'delta' AS phase, * FROM drow
  UNION ALL
  SELECT 'post_rebuild' AS phase, * FROM prow
  WHERE (SELECT recall_at_5 FROM drow) < 0.5
)"""
)


# stream_feed_ingest_history (round 13, VERDICT r12 item 4): the
# streamed feed's history is the SCD2 one-truth full-rebuild text
# (base ∪ streamed micro-batches = all events — the sixth execution
# shape over the same semantic truth); the proof columns replay as
# literals/scalars: 3 committed micro-batch deltas, feed_rows = the
# full events count (a doubled or lost batch moves it), and the
# crash-replay flag the operator refuses to skip.
ORACLE_SQL["stream_feed_ingest_history"] = (
    "SELECT user_id, event_type, effective_from_us, effective_to_us,"
    " is_current,"
    " CAST(3 AS INTEGER) AS n_stream_deltas,"
    " (SELECT count(*) FROM events) AS feed_rows,"
    " TRUE AS crash_replayed"
    " FROM ("
    + ORACLE_SQL["scd2_user_event_history"]
    + ")"
)


# --------------------------------------------------------------------------
# Round 14: unified maintenance policy loop (VERDICT r13 item 1)
# --------------------------------------------------------------------------

# ann_maintenance_policy, 'day1' tick: the frozen-codebook replay
# with ONLY day1's half of the batch inserted (the insert side of
# allc is filtered; queries stay the full batch — a held-out probe
# set needs no membership), recall at nprobe=2 against the exact
# top-5 over corpus ∪ day1 — the corpus the index serves at that
# tick. Built from the shared _ANN_DELTA_PREFIX by restricting the
# insert union arm, so the training/encode replay cannot drift from
# the other delta gates.
_ANN_INSERT_ARM = """SELECT bc.vec_id, bc.sub_id, bc.cluster, bl.label
  FROM bcode bc JOIN bcell bl USING (vec_id)"""
assert _ANN_INSERT_ARM in _ANN_DELTA_PREFIX
_ANN_DAY1_PREFIX = _ANN_DELTA_PREFIX.replace(
    _ANN_INSERT_ARM,
    _ANN_INSERT_ARM + "\n  WHERE (bc.vec_id // 97) % 2 = 0",
)

_ANN_DAY1_RECALL = _ANN_DAY1_PREFIX + """, qcell AS (
  SELECT q.vec_id AS q_id, c.label,
         list_reduce(list_transform(list_zip(q.v, c.c),
           x -> (x[1] - x[2]) * (x[1] - x[2])), (acc, t) -> acc + t) AS cd
  FROM b q CROSS JOIN cellc c
), qprobe AS (
  SELECT q_id, label FROM (
    SELECT q_id, label, row_number() OVER (
      PARTITION BY q_id ORDER BY cd, label) AS crk
    FROM qcell
  ) WHERE crk <= 2
), lut AS (
  SELECT q.vec_id AS q_id, q.sub_id, c.cluster AS code,
         list_reduce(list_transform(list_zip(q.sv, c.c),
           x -> (x[1] - x[2]) * (x[1] - x[2])), (a, b) -> a + b) AS ld
  FROM bsub q JOIN c1 c USING (sub_id)
), scored AS (
  SELECT p.q_id, a.vec_id, round(sum(l.ld), 6) AS adc_dist
  FROM qprobe p
  JOIN allc a ON a.label = p.label
  JOIN lut l ON l.q_id = p.q_id AND l.sub_id = a.sub_id
            AND l.code = a.cluster
  GROUP BY 1, 2
), approx AS (
  SELECT q_id, vec_id AS neighbor_id FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY q_id ORDER BY adc_dist, vec_id) AS rk
    FROM scored s
  ) WHERE rk <= 5
), e1 AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
  WHERE vec_id % 97 <> 0 OR (vec_id // 97) % 2 = 0
), ed AS (
  SELECT q.vec_id AS q_id, a.vec_id AS neighbor_id,
         list_reduce(list_transform(list_zip(q.v, a.v),
           x -> (x[1] - x[2]) * (x[1] - x[2])), (acc, t) -> acc + t) AS d
  FROM b q CROSS JOIN e1 a
), exact AS (
  SELECT q_id, neighbor_id FROM (
    SELECT q_id, neighbor_id, row_number() OVER (
      PARTITION BY q_id ORDER BY d, neighbor_id) AS rk
    FROM ed
  ) WHERE rk <= 5
), nq AS (
  SELECT count(DISTINCT q_id) AS n_queries FROM exact
)
SELECT CAST(nq.n_queries AS BIGINT) AS n_queries,
       CAST(h.n_hits AS BIGINT) AS n_hits,
       round(h.n_hits * 1.0 / (nq.n_queries * 5), 4) AS recall_at_5
FROM (
  SELECT count(*) AS n_hits FROM approx ap
  WHERE EXISTS (
    SELECT 1 FROM exact x
    WHERE x.q_id = ap.q_id AND x.neighbor_id = ap.neighbor_id
  )
) h CROSS JOIN nq
"""

# ann_maintenance_policy: the whole policy loop replayed — day1 HOLD
# (count policy, drift arm off), day2 COMPACT with recall invariant
# across the fold (recall_after = recall_before BY REPLAY: the oracle
# has no fold, so emitting the same value twice IS the invisibility
# assertion the Spark side must meet with a real re-measurement),
# drift REBUILD with the conditional itself replayed (decision and
# recall_after are CASE over the replayed delta recall — the r13
# policy-gate recipe). drow is MATERIALIZED (read three times).
ORACLE_SQL["ann_maintenance_policy"] = (
    """WITH d1r AS MATERIALIZED (
"""
    + _ANN_DAY1_RECALL
    + """), drow AS MATERIALIZED (
  SELECT n_queries, n_hits, recall_at_5 FROM ("""
    + ORACLE_SQL["ann_delta_recall"]
    + """) WHERE nprobe = 2
), prow AS MATERIALIZED (
  SELECT n_queries, n_hits, recall_at_5 FROM ("""
    + _ANN_POLICY_POST
    + """)
)
SELECT 'day1' AS step, 'hold' AS decision,
       CAST(1 AS INTEGER) AS n_deltas,
       n_queries, n_hits,
       recall_at_5 AS recall_before, recall_at_5 AS recall_after,
       CAST(1 AS INTEGER) AS deltas_remaining
FROM d1r
UNION ALL
SELECT 'day2', 'compact', CAST(2 AS INTEGER),
       n_queries, n_hits, recall_at_5, recall_at_5, CAST(0 AS INTEGER)
FROM drow
UNION ALL
SELECT 'drift',
       CASE WHEN d.recall_at_5 < 0.5 THEN 'rebuild' ELSE 'hold' END,
       CAST(0 AS INTEGER), d.n_queries, d.n_hits, d.recall_at_5,
       CASE WHEN d.recall_at_5 < 0.5
            THEN p.recall_at_5 ELSE d.recall_at_5 END,
       CAST(0 AS INTEGER)
FROM drow d CROSS JOIN prow p"""
)

# dedup_index_maintenance: hold → compact → (conditional) rebuild
# must all land on the e2e ingest chain's one-truth reprobe (base ∪
# accepted — a fold or a full re-shingle of the same corpus cannot
# move any probed value). The day-3 drift conditional replays from
# the SAME accepted-rows counts the Spark side measured off the
# layout: base = corpus + day1/day2 accepted (folded), delta = day3
# accepted; at a replica scale where day3 accepts nothing the arm
# holds and deltas_remaining rides the same CASE.
ORACLE_SQL["dedup_index_maintenance"] = (
    """WITH t AS MATERIALIZED (
"""
    + ORACLE_SQL["end_to_end_incremental_ingest"]
    + """), c AS (
  SELECT
    (SELECT count(*) FROM documents WHERE doc_id % 97 <> 0)
      + count(*) FILTER (WHERE action = 'ingest'
                         AND (doc_id // 97) % 3 IN (0, 1)) AS d3b,
    count(*) FILTER (WHERE action = 'ingest'
                     AND (doc_id // 97) % 3 = 2) AS d3d
  FROM t
)
SELECT t.doc_id, t.reprobe_action AS final_action,
       'hold' AS d1_decision, 'compact' AS d2_decision,
       CASE WHEN c.d3d >= 0.001 * c.d3b
            THEN 'rebuild' ELSE 'hold' END AS d3_decision,
       CAST(c.d3b AS BIGINT) AS d3_base_rows,
       CAST(c.d3d AS BIGINT) AS d3_delta_rows,
       CAST(CASE WHEN c.d3d >= 0.001 * c.d3b THEN 0 ELSE 1 END
            AS INTEGER) AS deltas_remaining
FROM t CROSS JOIN c"""
)

# scd2_feed_maintenance: hold → compact → (conditional) RE-SHARD all
# land on the SCD2 family's one-truth full-rebuild history (base ∪
# day1 ∪ day2 = all events; doubling shards moves rows, never
# values); the re-shard trigger replays as CASE over count(events) —
# total layout rows at the day-3 tick — against the declared
# 512-rows/shard bar over the writer's 16 shards.
ORACLE_SQL["scd2_feed_maintenance"] = (
    "SELECT user_id, event_type, effective_from_us, effective_to_us,"
    " is_current,"
    " 'hold' AS d1_decision, 'compact' AS d2_decision,"
    " CASE WHEN c.cnt > 512 * 16 THEN 'rebuild' ELSE 'hold' END"
    "   AS d3_decision,"
    " CAST(c.cnt AS BIGINT) AS total_rows,"
    " CAST(CASE WHEN c.cnt > 512 * 16 THEN 32 ELSE 16 END AS INTEGER)"
    "   AS final_n_shards,"
    " CAST(0 AS INTEGER) AS deltas_remaining"
    " FROM ("
    + ORACLE_SQL["scd2_user_event_history"]
    + ") CROSS JOIN (SELECT count(*) AS cnt FROM events) c"
)


# --------------------------------------------------------------------------
# Round 14: retention / vacuum (VERDICT r13 item 2)
# --------------------------------------------------------------------------

# layout_vacuum_sweep: the sweep must be INVISIBLE to every reader —
# base ∪ the surviving committed delta = all events, so the hashed
# history is the SCD2 one-truth full-rebuild text; the accounting
# literals replay the gate's DECLARED garbage (an unmarked delta dir
# of 256 B, stale _staging of 128 B, stale manifest-less _compact of
# 64 B, killed-write .spark-staging residue of 32 B → 4 files, 480
# bytes, 1 orphan delta, 2 staging roots, 1 spark-staging root), the
# one committed delta the sweep must keep, and the round-15 DECOY
# (notes_delta_old — '_delta_' in the name but anchored to no table
# of this layout) that must survive.
ORACLE_SQL["layout_vacuum_sweep"] = (
    "SELECT user_id, event_type, effective_from_us, effective_to_us,"
    " is_current,"
    " CAST(4 AS INTEGER) AS files_removed,"
    " CAST(480 AS BIGINT) AS bytes_reclaimed,"
    " CAST(1 AS INTEGER) AS orphan_deltas_removed,"
    " CAST(2 AS INTEGER) AS staging_removed,"
    " CAST(1 AS INTEGER) AS spark_staging_removed,"
    " TRUE AS decoy_survived,"
    " CAST(1 AS INTEGER) AS committed_deltas_kept"
    " FROM ("
    + ORACLE_SQL["scd2_user_event_history"]
    + ")"
)

# scd2_history_retention: replay the retention policy over the
# full-rebuild history — closed versions rank per key by
# effective_from_us DESC (unique per key: scd2_history keeps one row
# per distinct (key, ts) and compresses equal consecutive values),
# keep rk <= 1 plus every current row, count the expired rest. h is
# MATERIALIZED (read three times).
ORACLE_SQL["scd2_history_retention"] = (
    """WITH h AS MATERIALIZED (
"""
    + ORACLE_SQL["scd2_user_event_history"]
    + """), closed AS (
  SELECT user_id, event_type, effective_from_us, effective_to_us,
         is_current,
         row_number() OVER (
           PARTITION BY user_id ORDER BY effective_from_us DESC
         ) AS rk
  FROM h WHERE NOT is_current
), ex AS (
  SELECT count(*) AS n FROM closed WHERE rk > 1
)
SELECT k.user_id, k.event_type, k.effective_from_us,
       k.effective_to_us, k.is_current,
       CAST(ex.n AS BIGINT) AS rows_expired
FROM (
  SELECT user_id, event_type, effective_from_us, effective_to_us,
         is_current
  FROM h WHERE is_current
  UNION ALL
  SELECT user_id, event_type, effective_from_us, effective_to_us,
         is_current
  FROM closed WHERE rk <= 1
) k CROSS JOIN ex"""
)


# stream_dedup_ingest_probe (round 14, VERDICT r13 item 4; replica-
# robust form per VERDICT r14 item 3): the streamed docs are id-salted
# NOVEL text, so each one's only index presence is its own streamed
# delta rows — the post-stream self-probe is exact_dup = near_dup =
# TRUE / 'skip_exact' BY the exactly-once contract (its own content
# hash and band signature always match themselves; a lost micro-batch
# flips its docs to 'ingest' and hash-diverges). index_rows = corpus
# + streamed content-hash rows = ALL docs; the constants hold at any
# replica scale because replicas shift doc_ids and the salt rides the
# id.
ORACLE_SQL["stream_dedup_ingest_probe"] = """
SELECT doc_id,
       TRUE AS exact_dup,
       TRUE AS near_dup,
       'skip_exact' AS action,
       CAST(3 AS INTEGER) AS n_stream_deltas,
       CAST((SELECT count(*) FROM documents) AS BIGINT) AS index_rows,
       TRUE AS crash_replayed
FROM documents WHERE doc_id % 97 = 0
"""


# --------------------------------------------------------------------------
# Round 14: targeted deletion / retraction
# --------------------------------------------------------------------------

# dedup_index_retraction: the corpus docs sharing a content hash with
# any batch doc (the exact twins) are retracted; the probe replays
# against corpus MINUS twins — every former exact collision flips,
# near collisions survive only through OTHER corpus docs. Reuses the
# minhash/band/hash fragments of incremental_dedup_new_batch so the
# two contracts cannot drift. rows_deleted = one hash row + 4 band
# rows per retracted doc.
ORACLE_SQL["dedup_index_retraction"] = (
    _MINHASH_BASE_K3.format(sig_exprs=_SIG_EXPRS)
    + f""", bands AS MATERIALIZED (
{_BAND_SELECTS}
), hashes AS MATERIALIZED (
  SELECT doc_id, ((md5_number(text) % {_M48} + {_M48}) % {_M48}) AS ch
  FROM documents
), twins AS MATERIALIZED (
  SELECT DISTINCT c.doc_id
  FROM hashes c JOIN hashes b ON c.ch = b.ch
  WHERE c.doc_id % 97 <> 0 AND b.doc_id % 97 = 0
), exact_hit AS (
  SELECT DISTINCT b.doc_id
  FROM hashes b JOIN hashes c ON b.ch = c.ch
  WHERE b.doc_id % 97 = 0 AND c.doc_id % 97 <> 0
    AND c.doc_id NOT IN (SELECT doc_id FROM twins)
), near_hit AS (
  SELECT DISTINCT nb.doc_id
  FROM bands nb JOIN bands cb
    ON nb.band = cb.band AND nb.key = cb.key
  WHERE nb.doc_id % 97 = 0 AND cb.doc_id % 97 <> 0
    AND cb.doc_id NOT IN (SELECT doc_id FROM twins)
)
SELECT d.doc_id,
       (e.doc_id IS NOT NULL) AS exact_dup,
       (n.doc_id IS NOT NULL) AS near_dup,
       CASE WHEN e.doc_id IS NOT NULL THEN 'skip_exact'
            WHEN n.doc_id IS NOT NULL THEN 'review_near'
            ELSE 'ingest' END AS action,
       CAST(5 * (SELECT count(*) FROM twins) AS BIGINT) AS rows_deleted
FROM documents d
LEFT JOIN exact_hit e ON e.doc_id = d.doc_id
LEFT JOIN near_hit n ON n.doc_id = d.doc_id
WHERE d.doc_id % 97 = 0
"""
)

# ann_index_retraction: day1's vectors retracted after both deltas
# landed → the index serves corpus ∪ day2 only; the probe replay is
# the shared frozen-codebook insert chain with the insert arm
# restricted to DAY2 (the mirror of the maintenance gate's day1
# variant). rows_deleted = m(8) code rows per retracted vector.
_ANN_DAY2_PREFIX = _ANN_DELTA_PREFIX.replace(
    _ANN_INSERT_ARM,
    _ANN_INSERT_ARM + "\n  WHERE (bc.vec_id // 97) % 2 = 1",
)

ORACLE_SQL["ann_index_retraction"] = _ANN_DAY2_PREFIX + """, qprobe AS (
  SELECT q_id, label FROM (
    SELECT q.vec_id AS q_id, c.label, row_number() OVER (
      PARTITION BY q.vec_id ORDER BY
        list_reduce(list_transform(list_zip(q.v, c.c),
          x -> (x[1] - x[2]) * (x[1] - x[2])), (acc, t) -> acc + t),
        c.label) AS crk
    FROM b q CROSS JOIN cellc c
  ) WHERE crk <= 2
), lut AS (
  SELECT q.vec_id AS q_id, q.sub_id, c.cluster AS code,
         list_reduce(list_transform(list_zip(q.sv, c.c),
           x -> (x[1] - x[2]) * (x[1] - x[2])), (a, b) -> a + b) AS ld
  FROM bsub q JOIN c1 c USING (sub_id)
), scored AS (
  SELECT p.q_id, a.vec_id, round(sum(l.ld), 6) AS adc_dist
  FROM qprobe p
  JOIN allc a ON a.label = p.label
  JOIN lut l ON l.q_id = p.q_id AND l.sub_id = a.sub_id
            AND l.code = a.cluster
  GROUP BY 1, 2
)
SELECT q_id, vec_id, adc_dist, CAST(rk AS INT) AS rk,
       CAST(8 * (SELECT count(*) FROM embeddings
                 WHERE vec_id % 97 = 0 AND (vec_id // 97) % 2 = 0)
            AS BIGINT) AS rows_deleted
FROM (
  SELECT s.*, row_number() OVER (
    PARTITION BY q_id ORDER BY adc_dist, vec_id) AS rk
  FROM scored s
) WHERE rk <= 5
"""

# scd2_feed_key_deletion: whole-key erasure commutes with the
# per-key SCD2 window, so the post-delete history is the one-truth
# full-rebuild text restricted to surviving users; rows_deleted
# replays as the erased users' raw event count (every one of their
# rows lived in base ∪ day1 ∪ day2 = all events).
ORACLE_SQL["scd2_feed_key_deletion"] = (
    "SELECT user_id, event_type, effective_from_us, effective_to_us,"
    " is_current,"
    " CAST((SELECT count(*) FROM events WHERE user_id % 17 = 3)"
    "   AS BIGINT) AS rows_deleted"
    " FROM ("
    + ORACLE_SQL["scd2_user_event_history"]
    + ") WHERE user_id % 17 <> 3"
)


# compaction_ingest_interleave (round 14, VERDICT r13 item 5): the
# post-fold layout is base(day1+day2 folded) ∪ day3's surviving
# delta = corpus ∪ ALL accepted — the e2e reprobe truth again (a
# commit that swept the interleaved delta would flip its docs back
# to 'ingest'); the literals replay the 2 manifest-named folded
# batches, day3's surviving commit marker, and the no-crash path.
ORACLE_SQL["compaction_ingest_interleave"] = (
    "SELECT doc_id, reprobe_action AS final_action,"
    " CAST(2 AS INTEGER) AS n_folded,"
    " CAST(1 AS INTEGER) AS interleaved_committed,"
    " FALSE AS fold_resumed"
    " FROM ("
    + ORACLE_SQL["end_to_end_incremental_ingest"]
    + ")"
)


# --------------------------------------------------------------------------
# Round 15: erasure completion + deletion-aware maintenance + sampled
# recall referee + the maintain_layout umbrella (VERDICT r14 items
# 1, 2, 5, 6)
# --------------------------------------------------------------------------

# scd2_history_key_deletion: whole-key erasure from the PERSISTED
# history layout commutes with the per-key window — the read-back is
# the one-truth full-rebuild history restricted to surviving users;
# rows_deleted replays as the erased users' HISTORY-row count (the
# layout stores the windowed rows, not raw events).
ORACLE_SQL["scd2_history_key_deletion"] = (
    """WITH h AS MATERIALIZED (
"""
    + ORACLE_SQL["scd2_user_event_history"]
    + """)
SELECT user_id, event_type, effective_from_us, effective_to_us,
       is_current,
       CAST((SELECT count(*) FROM h WHERE user_id % 17 = 3)
            AS BIGINT) AS rows_deleted
FROM h WHERE user_id % 17 <> 3"""
)

# dedup_maintenance_deletion_drift: the final layout is corpus MINUS
# the %13 victims whether or not the rebuild arm fired (retraction
# already removed their rows; the rebuild only re-shards the
# survivors), so the probe replays the incremental chain against the
# filtered corpus. The t2 CONDITIONAL replays from the same counts
# the tick read: victims (deleted content rows) vs surviving live
# rows — t1 precedes any deletion (counter 0 -> hold) and t3 follows
# the counter reset (rebuild wrote fresh metadata) or a below-
# threshold counter, hold either way.
ORACLE_SQL["dedup_maintenance_deletion_drift"] = (
    _MINHASH_BASE_K3.format(sig_exprs=_SIG_EXPRS)
    + f""", bands AS MATERIALIZED (
{_BAND_SELECTS}
), hashes AS MATERIALIZED (
  SELECT doc_id, ((md5_number(text) % {_M48} + {_M48}) % {_M48}) AS ch
  FROM documents
), cnt AS (
  SELECT
    (SELECT count(*) FROM documents
     WHERE doc_id % 97 <> 0 AND doc_id % 13 = 1) AS victims,
    (SELECT count(*) FROM documents
     WHERE doc_id % 97 <> 0 AND doc_id % 13 <> 1) AS live
), exact_hit AS (
  SELECT DISTINCT b.doc_id
  FROM hashes b JOIN hashes c ON b.ch = c.ch
  WHERE b.doc_id % 97 = 0 AND c.doc_id % 97 <> 0
    AND c.doc_id % 13 <> 1
), near_hit AS (
  SELECT DISTINCT nb.doc_id
  FROM bands nb JOIN bands cb
    ON nb.band = cb.band AND nb.key = cb.key
  WHERE nb.doc_id % 97 = 0 AND cb.doc_id % 97 <> 0
    AND cb.doc_id % 13 <> 1
)
SELECT d.doc_id,
       (e.doc_id IS NOT NULL) AS exact_dup,
       (n.doc_id IS NOT NULL) AS near_dup,
       CASE WHEN e.doc_id IS NOT NULL THEN 'skip_exact'
            WHEN n.doc_id IS NOT NULL THEN 'review_near'
            ELSE 'ingest' END AS action,
       'hold' AS t1_decision,
       CASE WHEN cnt.victims >= 0.02 * cnt.live
            THEN 'rebuild' ELSE 'hold' END AS t2_decision,
       'hold' AS t3_decision,
       CAST(cnt.victims AS BIGINT) AS rows_deleted,
       CAST(cnt.live AS BIGINT) AS live_rows
FROM documents d
LEFT JOIN exact_hit e ON e.doc_id = d.doc_id
LEFT JOIN near_hit n ON n.doc_id = d.doc_id
CROSS JOIN cnt
WHERE d.doc_id % 97 = 0
"""
)

# scd2_feed_deletion_drift: the erosion rebuild keeps both values and
# shard count, so the hashed history is the one-truth full-rebuild
# text over surviving users; t2's conditional replays from the erased
# users' raw event count vs the surviving rows, and final_n_shards
# stays the writer default (the erosion arm never doubles).
ORACLE_SQL["scd2_feed_deletion_drift"] = (
    """WITH cnt AS (
  SELECT
    (SELECT count(*) FROM events WHERE user_id % 17 = 3) AS del,
    (SELECT count(*) FROM events WHERE user_id % 17 <> 3) AS live
)
SELECT user_id, event_type, effective_from_us, effective_to_us,
       is_current,
       'hold' AS t1_decision,
       CASE WHEN cnt.del >= 0.02 * cnt.live
            THEN 'rebuild' ELSE 'hold' END AS t2_decision,
       'hold' AS t3_decision,
       CAST(cnt.del AS BIGINT) AS rows_deleted,
       CAST(cnt.live AS BIGINT) AS total_rows,
       CAST(16 AS INTEGER) AS final_n_shards
FROM ("""
    + ORACLE_SQL["scd2_user_event_history"]
    + """) CROSS JOIN cnt
WHERE user_id % 17 <> 3"""
)

# ann_sampled_recall_referee (VERDICT r14 item 5): the sampled chain
# is the shared base∪delta replay with BOTH sides restricted to the
# deterministic hash-sample — the indexed arm (allc) by the code
# row's vec_id, the exact referee by the vector's — so the sampled
# recall is replayed EXACTLY, not approximated; the full row is the
# ann_delta_recall replay at nprobe=2 and recall_gap crosses the two.
_ANN_SAMPLE_PRED = (
    "((md5_number('annref' || CAST({x} AS VARCHAR)) % "
    f"{_M48} + {_M48}) % {_M48}) % 2 < 1"
)

_ANN_SAMPLED_RECALL = _ANN_DELTA_PREFIX + f""", qcell AS (
  SELECT q.vec_id AS q_id, c.label,
         list_reduce(list_transform(list_zip(q.v, c.c),
           x -> (x[1] - x[2]) * (x[1] - x[2])), (acc, t) -> acc + t) AS cd
  FROM b q CROSS JOIN cellc c
), qprobe AS (
  SELECT q_id, label FROM (
    SELECT q_id, label, row_number() OVER (
      PARTITION BY q_id ORDER BY cd, label) AS crk
    FROM qcell
  ) WHERE crk <= 2
), lut AS (
  SELECT q.vec_id AS q_id, q.sub_id, c.cluster AS code,
         list_reduce(list_transform(list_zip(q.sv, c.c),
           x -> (x[1] - x[2]) * (x[1] - x[2])), (a, b) -> a + b) AS ld
  FROM bsub q JOIN c1 c USING (sub_id)
), scored AS (
  SELECT p.q_id, a.vec_id, round(sum(l.ld), 6) AS adc_dist
  FROM qprobe p
  JOIN allc a ON a.label = p.label
  JOIN lut l ON l.q_id = p.q_id AND l.sub_id = a.sub_id
            AND l.code = a.cluster
  WHERE {_ANN_SAMPLE_PRED.format(x="a.vec_id")}
  GROUP BY 1, 2
), approx AS (
  SELECT q_id, vec_id AS neighbor_id FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY q_id ORDER BY adc_dist, vec_id) AS rk
    FROM scored s
  ) WHERE rk <= 5
), es AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
  WHERE {_ANN_SAMPLE_PRED.format(x="vec_id")}
), ed AS (
  SELECT q.vec_id AS q_id, a.vec_id AS neighbor_id,
         list_reduce(list_transform(list_zip(q.v, a.v),
           x -> (x[1] - x[2]) * (x[1] - x[2])), (acc, t) -> acc + t) AS d
  FROM b q CROSS JOIN es a
), exact AS (
  SELECT q_id, neighbor_id FROM (
    SELECT q_id, neighbor_id, row_number() OVER (
      PARTITION BY q_id ORDER BY d, neighbor_id) AS rk
    FROM ed
  ) WHERE rk <= 5
), nq AS (
  SELECT count(DISTINCT q_id) AS n_queries FROM exact
)
SELECT CAST(nq.n_queries AS BIGINT) AS n_queries,
       CAST(h.n_hits AS BIGINT) AS n_hits,
       round(h.n_hits * 1.0 / (nq.n_queries * 5), 4) AS recall_at_5
FROM (
  SELECT count(*) AS n_hits FROM approx ap
  WHERE EXISTS (
    SELECT 1 FROM exact x
    WHERE x.q_id = ap.q_id AND x.neighbor_id = ap.neighbor_id
  )
) h CROSS JOIN nq
"""

ORACLE_SQL["ann_sampled_recall_referee"] = (
    """WITH f AS MATERIALIZED (
  SELECT n_queries, n_hits, recall_at_5 FROM ("""
    + ORACLE_SQL["ann_delta_recall"]
    + """) WHERE nprobe = 2
), s AS MATERIALIZED (
"""
    + _ANN_SAMPLED_RECALL
    + """)
SELECT 'full' AS mode, n_queries, n_hits, recall_at_5,
       0.0 AS recall_gap
FROM f
UNION ALL
SELECT 'sampled', s.n_queries, s.n_hits, s.recall_at_5,
       round(f.recall_at_5 - s.recall_at_5, 4)
FROM s CROSS JOIN f"""
)

# layout_maintenance_umbrella: the mixed-family decision table — the
# dedup arm's fold must land on corpus ∪ accepted (the e2e chain's
# truth; rows_kept = content-hash rows after the compact), the feed
# arm holds below compact_after and keeps its committed delta
# (rows_kept = all events); the vacuum accounting replays the gate's
# DECLARED garbage (32-byte _staging on the index, 24-byte unmarked
# orphan delta on the feed).
ORACLE_SQL["layout_maintenance_umbrella"] = (
    """WITH t AS MATERIALIZED (
"""
    + ORACLE_SQL["end_to_end_incremental_ingest"]
    + """)
SELECT 'dedup_index' AS family, 'compact' AS decision,
       CAST(0 AS INTEGER) AS deltas_remaining,
       CAST((SELECT count(*) FROM documents WHERE doc_id % 97 <> 0)
            + (SELECT count(*) FROM t WHERE action = 'ingest')
            AS BIGINT) AS rows_kept,
       CAST(1 AS INTEGER) AS vacuum_files_removed,
       CAST(32 AS BIGINT) AS vacuum_bytes_reclaimed,
       CAST(1 AS INTEGER) AS vacuum_staging_removed,
       CAST(0 AS INTEGER) AS vacuum_orphan_deltas_removed
UNION ALL
SELECT 'scd2_feed', 'hold',
       CAST(1 AS INTEGER),
       CAST((SELECT count(*) FROM events) AS BIGINT),
       CAST(1 AS INTEGER), CAST(24 AS BIGINT),
       CAST(0 AS INTEGER), CAST(1 AS INTEGER)"""
)


# scd2_erasure_end_to_end (round-15 capstone): the stored history
# after independent feed+history erasure equals the one-truth
# full-rebuild history over surviving users; feed_rows_deleted = the
# erased users' raw event count, hist_rows_deleted = their windowed
# HISTORY-row count (the compression makes it a distinct number the
# replay must derive), the erosion-tick conditional replays from the
# same counts, and n_diff_rows = 0 is the measured stored-vs-derived
# agreement the Spark side computes as a real symmetric diff.
ORACLE_SQL["scd2_erasure_end_to_end"] = (
    """WITH h AS MATERIALIZED (
"""
    + ORACLE_SQL["scd2_user_event_history"]
    + """), cnt AS (
  SELECT
    (SELECT count(*) FROM events WHERE user_id % 17 = 3) AS fdel,
    (SELECT count(*) FROM events WHERE user_id % 17 <> 3) AS flive,
    (SELECT count(*) FROM h WHERE user_id % 17 = 3) AS hdel
)
SELECT user_id, event_type, effective_from_us, effective_to_us,
       is_current,
       CAST(cnt.fdel AS BIGINT) AS feed_rows_deleted,
       CAST(cnt.hdel AS BIGINT) AS hist_rows_deleted,
       CASE WHEN cnt.fdel >= 0.02 * cnt.flive
            THEN 'rebuild' ELSE 'hold' END AS tick_decision,
       CAST(0 AS INTEGER) AS n_diff_rows
FROM h CROSS JOIN cnt
WHERE user_id % 17 <> 3"""
)


# snapshot_read_across_commit (round 16, VERDICT r15 item 2): the
# time-travel read at version 0 is the FULL pre-erasure history, the
# current read the survivors — whole-key erasure commutes with the
# per-key window, so both replay from the one-truth full-rebuild
# history text. Witness literals: version 0 -> 1, marker untouched
# (the no-outage contract), rows_deleted = the erased users' events.
ORACLE_SQL["snapshot_read_across_commit"] = (
    "WITH hist AS ("
    + ORACLE_SQL["scd2_user_event_history"]
    + """)
SELECT user_id, event_type, effective_from_us, effective_to_us,
       is_current, 'before' AS snapshot,
       CAST(0 AS INTEGER) AS v_before, CAST(1 AS INTEGER) AS v_after,
       TRUE AS marker_untouched,
       CAST((SELECT count(*) FROM events WHERE user_id % 17 = 3)
            AS BIGINT) AS rows_deleted
FROM hist
UNION ALL
SELECT user_id, event_type, effective_from_us, effective_to_us,
       is_current, 'after' AS snapshot,
       CAST(0 AS INTEGER) AS v_before, CAST(1 AS INTEGER) AS v_after,
       TRUE AS marker_untouched,
       CAST((SELECT count(*) FROM events WHERE user_id % 17 = 3)
            AS BIGINT) AS rows_deleted
FROM hist WHERE user_id % 17 <> 3"""
)
