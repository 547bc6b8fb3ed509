from .asof import asof_join  # noqa: F401
from .clustering import kmeans_assignments  # noqa: F401
from .curation import (  # noqa: F401
    bloom_decontaminate,
    chunk_documents,
    contamination_overlap,
    pack_sequences,
    pack_sequences_global,
    pii_scrub,
    quota_sample,
    scrub_stats,
    span_dedup,
    token_budget_sample,
)
from .dedup import (  # noqa: F401
    exact_dedup,
    group_minhash_similarity,
    minhash_lsh_clusters,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_lsh,
    simhash,
)
from .graph import connected_components  # noqa: F401
from .grid import ordered_group_position  # noqa: F401
from .interval import interval_join  # noqa: F401
from .ranking import rank1_per_group, topk_per_group  # noqa: F401
from .similarity import cosine_topk, ivf_topk, neardup_pairs  # noqa: F401
from .skew import salted_join  # noqa: F401
