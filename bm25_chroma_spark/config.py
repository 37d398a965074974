"""Engine configuration.

Defaults mirror the reference implementation's constants
(/root/reference/bm25_chroma/bm25.py:56 — k1=1.5, b=0.75,
max_postings_per_term=5000; bm25.py:283 — query-time cap of 1000
postings per term; /root/reference/bm25_chroma/hybrid_retriever.py:13
— rrf_k=60).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class BM25Config:
    # BM25 scoring parameters (reference bm25.py:56)
    k1: float = 1.5
    b: float = 0.75

    # Index-build cap: keep only the top-N postings per term by
    # (tf desc, doc_id asc). The reference also uses the *capped*
    # list length as df inside IDF (bm25.py:307) — we replicate that.
    # None disables the cap (the at-scale lossless mode).
    max_postings_per_term: Optional[int] = 5000

    # Query-time cap: score only the first N postings of each term's
    # list (reference bm25.py:283). None disables.
    query_postings_cap: Optional[int] = 1000

    # RRF constant (reference hybrid_retriever.py:13)
    rrf_k: int = 60

    # --- Spark physical knobs (no reference equivalent) ---
    # Salt factor for the skewed groupBy(term) partial aggregation.
    salt_factor: int = 16
    # Number of term buckets for physical shard layout / pruning.
    num_term_buckets: int = 32
    # Postings per block in the compressed shard encoding (block-max).
    block_size: int = 128
    # Round scores to this many decimals for cross-engine comparison
    # (None = raw doubles). Used by oracle-facing queries only.
    score_round: Optional[int] = None


DEFAULT_CONFIG = BM25Config()

# The at-scale mode: no posting caps anywhere. The reference's caps
# are tf-ordered-list semantics the doc-ordered sharded path refuses
# to silently approximate (index/wand.py guard); production corpora
# run lossless.
LOSSLESS_CONFIG = BM25Config(
    max_postings_per_term=None, query_postings_cap=None
)
