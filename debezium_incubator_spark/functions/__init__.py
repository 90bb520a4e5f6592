from debezium_incubator_spark.functions.text import (  # noqa: F401
    token_counts,
    quality_score,
    lang_id,
)
from debezium_incubator_spark.functions.dedup_text import (  # noqa: F401
    exact_dedup_groups,
    ngram_jaccard_pairs,
    minhash_lsh_pairs,
    simhash_near_dups,
    shingle_overlap_pairs,
)
from debezium_incubator_spark.functions.ann_index import IVFIndex  # noqa: F401
from debezium_incubator_spark.functions.dedup_incremental import (  # noqa: F401
    IncrementalDedupIndex,
)
from debezium_incubator_spark.functions.graph import (  # noqa: F401
    connected_components,
    dedup_clusters,
)
from debezium_incubator_spark.functions.similarity import (  # noqa: F401
    cosine_topk_bruteforce,
    lsh_ann_topk,
)
