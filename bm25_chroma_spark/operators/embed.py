"""Distributed corpus embedding — the DataFrame-in/DataFrame-out
ingest step that populates a vector column without driver residency.

The reference embeds documents on the driver in Python lists
(/root/reference/bm25_chroma/hybrid_retriever.py:104-140: the whole
batch goes through embedding_function before Chroma add). That shape
is fine for its list API but a non-starter for a 100 TB corpus: here
the embedding function runs INSIDE ``mapInPandas`` — each Arrow batch
of texts is embedded on the executor that holds it, the plan stays a
narrow map (no shuffle), and the output can stream straight into a
partitioned parquet / IVF store (``ivf_write_partitioned``).

The embedding function contract is the retriever facade's
(plans/retriever.py): ``fn(list[str]) -> list[list[float]]``. The
default is resolved by the same probe — the real sentence-transformers
model when installed, else the deterministic hashed bag-of-words
projection.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType


def embed_corpus(
    df: DataFrame,
    embed_fn: Optional[Callable] = None,
    text_col: str = "text",
    out_col: str = "embedding",
) -> DataFrame:
    """Append ``out_col: array<double>`` = embed_fn(text) to every row.

    Executes as one narrow mapInPandas pass: Arrow ships each batch's
    texts to the Python worker, ``embed_fn`` embeds the batch in one
    call (so a real model amortizes its forward pass over the whole
    Arrow batch), and the vectors ride back as an array column. No
    shuffle, no driver round-trip — partitioning and row order are
    preserved, so the operator composes with bucketed writes.

    Nulls embed as empty strings (the hashed-BoW default then yields
    the zero vector), mirroring str() coercion in the facade.
    """
    from bm25_chroma_spark.plans.retriever import default_embedder

    fn = embed_fn or default_embedder()
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(DoubleType()))]
    )
    if out_col in df.columns:
        raise ValueError(f"column {out_col!r} already exists")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].fillna("").astype(str).tolist()
            vecs = fn(texts) if texts else []
            out = pdf.copy()
            out[out_col] = [[float(x) for x in v] for v in vecs]
            yield out

    return df.mapInPandas(gen, schema=out_schema)
