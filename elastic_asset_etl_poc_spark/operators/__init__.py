from .filters import time_window, term, terms, exists_all, exists_any, drop_missing  # noqa: F401
from .project import project_rename, wildcard_select, array_head  # noqa: F401
from .dedup import dedup_latest, collapse_top1  # noqa: F401
from .joins import semi_join_in_list  # noqa: F401
from .graph import group_collect_edges  # noqa: F401
from .neardup import (  # noqa: F401
    dedup_exact,
    dedup_survivors,
    jaccard_pairs,
    minhash_lsh_pairs,
    shingles,
    simhash,
    simhash_neardup,
)
from .text import doc_fingerprint, lang_id, normalize_text, text_quality, token_count  # noqa: F401
from .similarity import cosine_pairs, cosine_pairs_lsh, cosine_topk, ivf_topk, lsh_topk  # noqa: F401
from .skew import salted_agg, salted_join  # noqa: F401
from .sampling import (  # noqa: F401
    deterministic_split,
    hash_sample,
    stratified_hash_sample,
    temperature_fractions,
)
from .temporal import asof_join, band_join  # noqa: F401
