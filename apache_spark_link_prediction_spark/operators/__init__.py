from .joins import (  # noqa: F401
    cross_validate_count,
    enrich_edges_both_sides,
    label_by_existence,
)
from .dedup import (  # noqa: F401
    dedup_exact,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from .similarity import (  # noqa: F401
    brute_force_top_k,
    embedding_near_dup_pairs,
    lsh_bucketed_top_k,
)
