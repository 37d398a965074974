from bm25_chroma_spark.sources.corpus import (
    synth_corpus,
    synth_corpus_rows,
    reference_query_set,
)

__all__ = ["synth_corpus", "synth_corpus_rows", "reference_query_set"]
