from sqoop_spark.pipeline.dedup import (  # noqa: F401
    connected_components,
    dedup_resolve,
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash,
)
from sqoop_spark.pipeline.similarity import (  # noqa: F401
    cosine_topk,
    cosine_topk_blas,
    embedding_cosine_pairs_exact,
    embedding_dedup_pairs,
    ivf_centroids,
    ivf_cosine_topk,
    ivf_index,
    ivf_search,
    ivf_search_stored,
    ivf_store_index,
    lsh_cosine_topk,
)
from sqoop_spark.pipeline.sampling import cap_per_group  # noqa: F401
from sqoop_spark.pipeline.text import (  # noqa: F401
    bpe_encode,
    doc_fingerprint,
    filter_documents,
    lang_id,
    quality_score,
    redact_pii,
    repetition_score,
    token_count,
    train_bpe_merges,
    train_bpe_merges_df,
    vocab_top_k,
)
