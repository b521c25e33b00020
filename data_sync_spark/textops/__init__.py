"""Training-data pipeline operators over document/embedding tables.

Beyond the reference's CDC operators, a 100 TB training-data lake needs
dedup, similarity search, and text analysis as first-class vectorized
operators. Everything here is built on pyspark.sql.functions higher-order
array expressions (whole-stage codegen, no UDFs) unless noted.
"""

from data_sync_spark.textops.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from data_sync_spark.textops.analysis import (  # noqa: F401
    language_id,
    quality_scores,
    token_counts,
    fingerprint,
)
from data_sync_spark.textops.similarity import (  # noqa: F401
    cosine_topk,
    lsh_bucketed_topk,
)
from data_sync_spark.textops.tokens import (  # noqa: F401
    exclusive_prefix_sum,
    global_rank,
    ngram_contamination,
    pack_chunks_meta,
    pack_sequences,
    shuffle_positions,
    split_expr,
)
