from bm25_chroma_spark.operators.index_build import (
    LogicalIndex,
    tokenize_docs,
    build_logical_index,
)
from bm25_chroma_spark.operators.scoring import bm25_score_queries
from bm25_chroma_spark.operators.knn import (
    knn_bruteforce,
    knn_lsh,
    knn_ivf,
    knn_ivf_partitioned,
    ivf_seed_centroids,
    ivf_train_centroids,
    ivf_write_partitioned,
)
from bm25_chroma_spark.operators.dedup import (
    dedup_exact,
    dup_clusters,
    embedding_near_dups,
    keep_canonical,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from bm25_chroma_spark.operators.embed import embed_corpus
from bm25_chroma_spark.operators.fusion import rrf_fuse
from bm25_chroma_spark.operators.span_dedup import (
    remove_repeated_spans,
    repeated_span_keys,
)
from bm25_chroma_spark.operators.lm import (
    WordLM,
    lm_buckets,
    score_lm,
    train_word_lm,
)
from bm25_chroma_spark.operators.quality_clf import (
    NBQualityModel,
    score_nb_quality,
    train_nb_quality,
)
from bm25_chroma_spark.operators.sharding import (
    assign_shards,
    read_shard_manifest,
    validate_shards,
    write_training_shards,
)

__all__ = [
    "LogicalIndex",
    "tokenize_docs",
    "build_logical_index",
    "bm25_score_queries",
    "knn_bruteforce",
    "knn_lsh",
    "knn_ivf",
    "knn_ivf_partitioned",
    "ivf_seed_centroids",
    "ivf_train_centroids",
    "ivf_write_partitioned",
    "dedup_exact",
    "dup_clusters",
    "embedding_near_dups",
    "keep_canonical",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_near_dups",
    "embed_corpus",
    "rrf_fuse",
    "remove_repeated_spans",
    "repeated_span_keys",
    "NBQualityModel",
    "score_nb_quality",
    "train_nb_quality",
    "WordLM",
    "lm_buckets",
    "score_lm",
    "train_word_lm",
    "assign_shards",
    "read_shard_manifest",
    "validate_shards",
    "write_training_shards",
]
