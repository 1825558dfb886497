"""Sequence packing: assign documents/chunks to fixed-token-budget bins —
the batching step a training pipeline runs between chunking and
tokenization (SURVEY.md §2.11 training-data extras; no counterpart in the
reference, which never batches text).

Two modes, both deterministic and bucket-parallel:

- ``pack_offsets`` — token-offset binning. Within each bucket, documents
  are laid end-to-end in id order and a bin boundary falls every
  ``budget`` tokens, so a document may straddle two bins (the caller
  splits it at tokenization time). One window cumsum per bucket —
  entirely JVM-side, a single shuffle on the bucket key.
- ``pack_greedy`` — greedy first-fit in id order with per-bin reset:
  a document never straddles bins; a new bin opens when the current one
  cannot fit the next document whole. The reset makes the recurrence
  non-associative (not expressible as a window aggregate), so each
  bucket is packed by an Arrow-batched ``applyInPandas`` — the Python
  loop touches one bucket at a time, never the whole table.

Scale design (100 TB): a single global pack would force a one-partition
total order. Bucketing by ``id % n_buckets`` keeps determinism AND
parallelism — each bucket packs independently on its own executor, and
``n_buckets`` is sized so one bucket's (id, n_tokens) pairs — ~16 bytes a
row, NOT the text — fit comfortably in executor memory. Sequences are
then globally unique via (bucket, seq_index). Packing efficiency is
unaffected by bucketing when documents ≫ buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_offsets(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    n_buckets: int = 8,
) -> DataFrame:
    """Token-offset binning: returns (id, bucket, seq_index, start_offset)
    where ``start_offset`` is the document's first-token position inside
    its bucket's concatenated stream and ``seq_index`` =
    ``start_offset // budget``.
    """
    bucket = (F.col(id_col) % n_buckets).cast("long")
    w = Window.partitionBy("bucket").orderBy(id_col)
    staged = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("__t"),
        bucket.alias("bucket"),
    )
    cum = F.sum("__t").over(w) - F.col("__t")
    return staged.select(
        F.col(id_col),
        F.col("bucket"),
        (cum / budget).cast("long").alias("seq_index"),
        cum.alias("start_offset"),
        F.col("__t").alias("n_tokens"),
    )


def pack_greedy(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    n_buckets: int = 8,
) -> DataFrame:
    """Greedy first-fit packing: returns (id, bucket, seq_index, seq_fill)
    where ``seq_fill`` is the bin's running token total after placing the
    document. Documents larger than ``budget`` get a bin of their own.
    """
    import pandas as pd

    schema = (
        f"{id_col} long, bucket long, seq_index long, seq_fill long, n_tokens long"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        seq, fill = 0, 0
        seqs, fills = [], []
        for t in pdf["__t"]:
            if fill > 0 and fill + t > budget:
                seq, fill = seq + 1, 0
            fill += t
            seqs.append(seq)
            fills.append(fill)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                "bucket": pdf["bucket"].values,
                "seq_index": seqs,
                "seq_fill": fills,
                "n_tokens": pdf["__t"].values,
            }
        )

    staged = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("__t"),
        (F.col(id_col) % n_buckets).cast("long").alias("bucket"),
    )
    return staged.groupBy("bucket").applyInPandas(_pack, schema=schema)
