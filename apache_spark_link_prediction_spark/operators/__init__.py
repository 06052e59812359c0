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
from .dedup import signature_band_pairs  # noqa: F401
from .graph import bfs_min_hops, pagerank  # noqa: F401
from .multimodal import (  # noqa: F401
    audio_energy_windows,
    audio_spectral_centroid,
    extract_media_features,
    image_phash,
    media_from_documents,
    phash_near_dup_pairs,
    resize_images,
    sample_frames,
)
from .sketches import (  # noqa: F401
    count_min_estimate,
    count_min_table,
    heavy_hitters,
)
from .text_index import trigram_postings, trigram_search  # noqa: F401
from .similarity import (  # noqa: F401
    brute_force_top_k,
    embedding_near_dup_pairs,
    ivf_top_k,
    lsh_bucketed_top_k,
)
