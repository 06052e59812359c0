from .pairwise import (  # noqa: F401
    common_token_count,
    common_token_count_multiset,
    equality_flag,
    jaccard_tokens,
    to_double_label,
    tokenize,
    year_difference,
)
from .textstats import (  # noqa: F401
    bpe_ish_token_count,
    detect_language,
    doc_fingerprint,
    quality_features,
    whitespace_token_count,
)
from .vectors import cosine_similarity, dot_product, l2_norm  # noqa: F401
