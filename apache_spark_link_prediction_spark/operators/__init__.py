from .joins import (  # noqa: F401
    as_of_join,
    cross_validate_count,
    enrich_edges_both_sides,
    label_by_existence,
    range_join,
    salted_join,
)
from .dedup import (  # noqa: F401
    connected_components,
    dedup_clusters,
    dedup_exact,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from .multimodal import (  # noqa: F401
    extract_media_features,
    media_from_documents,
    resize_images,
    sample_frames,
)
from .similarity import (  # noqa: F401
    brute_force_top_k,
    embedding_near_dup_pairs,
    ivf_top_k,
    lsh_bucketed_top_k,
)
