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
    # Honored by BOTH paths: logical (sorted-array truncation) and
    # sharded (per-term global thresholds applied at encode time and
    # re-applied on DML merges). None disables (at-scale lossless).
    max_postings_per_term: Optional[int] = 5000

    # Query-time cap: score only the first N postings of each term's
    # tf-ordered list (reference bm25.py:283). Logical-path-only
    # semantics — the sharded path raises if it would bind (its
    # doc-ordered segments cannot reproduce the traversal order).
    # None disables.
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

# The at-scale mode: no posting caps anywhere. The build cap is
# reference-parity lossy truncation (honored physically by the
# sharded build); the query cap is a tf-ordered traversal semantic
# the sharded path refuses when it would bind (index/wand.py guard).
# Production corpora run lossless.
LOSSLESS_CONFIG = BM25Config(
    max_postings_per_term=None, query_postings_cap=None
)
