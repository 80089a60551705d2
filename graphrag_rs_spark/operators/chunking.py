"""Stage B — chunking: documents → chunks.

The boundary-scan logic is the exact port in rules/chunking.py
(graphrag-rs text/chunking.rs:48-152, text/mod.rs:123-168); here it runs
inside an Arrow-batched ``mapInPandas`` over whole documents — a NARROW
transformation (no shuffle): each executor chunks the documents it already
holds from the assembly stage's shuffle.

Chunk ids follow the reference contract ``{doc_id}_{chunk_idx}``
(text/mod.rs:99, 143).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

from graphrag_rs_spark.config import PipelineConfig

CHUNKS_SCHEMA = (
    "conv_id string, doc_id string, chunk_idx int, chunk_id string, "
    "text string, start int, end int"
)


def chunk_documents(documents: DataFrame, config: PipelineConfig | None = None) -> DataFrame:
    """documents(conv_id, doc_id, full_text, …) → chunks."""
    config = config or PipelineConfig()
    chunk_size = config.chunk_size
    overlap = config.chunk_overlap
    min_size = config.min_chunk_size
    chunker = config.chunker

    def chunk_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from graphrag_rs_spark.rules.chunking import chunk_document

        for pdf in batches:
            rows = []
            for conv_id, doc_id, full_text in zip(
                pdf["conv_id"], pdf["doc_id"], pdf["full_text"]
            ):
                for idx, (start, end, text) in enumerate(
                    chunk_document(
                        full_text or "",
                        chunk_size=chunk_size,
                        overlap=overlap,
                        min_chunk_size=min_size,
                        chunker=chunker,
                    )
                ):
                    rows.append(
                        (conv_id, doc_id, idx, f"{doc_id}_{idx}", text, start, end)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "doc_id", "chunk_idx", "chunk_id",
                    "text", "start", "end",
                ],
            )

    return documents.select("conv_id", "doc_id", "full_text").mapInPandas(
        chunk_batches, schema=CHUNKS_SCHEMA
    )


SEMANTIC_CHUNKS_SCHEMA = (
    "conv_id string, doc_id string, chunk_idx int, chunk_id string, "
    "text string, start_sentence int, end_sentence int, sentence_count int"
)


def semantic_chunk_documents(
    documents: DataFrame, cfg=None
) -> DataFrame:
    """Semantic chunker (graphrag-rs text/semantic_chunking.rs): sentence
    split → hash embeddings → cosine-distance breakpoints, via the exact
    port in rules/semantic_chunking.py. Same narrow ``mapInPandas`` shape
    as the size-based chunkers; offsets are sentence indexes (the
    reference's SemanticChunk contract) rather than char offsets."""
    from graphrag_rs_spark.rules.semantic_chunking import SemanticChunkerConfig

    cfg = cfg or SemanticChunkerConfig()

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from graphrag_rs_spark.rules.semantic_chunking import semantic_chunk

        for pdf in batches:
            rows = []
            for conv_id, doc_id, full_text in zip(
                pdf["conv_id"], pdf["doc_id"], pdf["full_text"]
            ):
                for idx, ch in enumerate(semantic_chunk(full_text or "", cfg)):
                    rows.append(
                        (
                            conv_id, doc_id, idx, f"{doc_id}_s{idx}",
                            ch["content"], ch["start_sentence"],
                            ch["end_sentence"], ch["sentence_count"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "doc_id", "chunk_idx", "chunk_id", "text",
                    "start_sentence", "end_sentence", "sentence_count",
                ],
            )

    return documents.select("conv_id", "doc_id", "full_text").mapInPandas(
        run, schema=SEMANTIC_CHUNKS_SCHEMA
    )
