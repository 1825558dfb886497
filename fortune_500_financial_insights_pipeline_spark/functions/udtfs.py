"""Python UDTFs (Spark 4 user-defined TABLE functions) — the 1→N escape
hatch when row expansion needs imperative logic SQL can't express
(SURVEY.md §2.9; the reference has no UDFs at all, its custom logic runs
driver-side in pandas — here even the escape hatch is executor-parallel).

UDTFs are the Python slow path: per-row interpreter dispatch, no codegen.
`ChunkTokens` deliberately mirrors `operators/chunking.chunk_documents`
(the JVM-side fast path) so the two are value-interchangeable — the
fixture query q_udtf_chunk runs against the SAME DuckDB oracle as
q_chunk_docs, proving the UDTF contract, while bench-style use should
always prefer the native operator.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(
    returnType="chunk_index bigint, chunk_start bigint, n_tokens bigint,"
    " chunk_text string"
)
class ChunkTokens:
    """LATERAL-join table function: overlapping token windows.

    SELECT doc_id, s.* FROM documents,
           LATERAL chunk_tokens(text, 32, 8) s
    """

    def eval(self, text: str, chunk_tokens: int, overlap: int):
        if text is None:
            return
        step = chunk_tokens - overlap
        toks = text.split(" ")
        for idx, start in enumerate(range(0, max(len(toks), 1), step)):
            window = toks[start : start + chunk_tokens]
            yield idx, start, len(window), " ".join(window)


def register_udtfs(spark) -> list[str]:
    """Register all engine UDTFs on the session; returns the SQL names."""
    spark.udtf.register("chunk_tokens", ChunkTokens)
    return ["chunk_tokens"]
