"""Python UDTF surface (Spark 4) — the table-function leg of X6.

The engine's own operators stay JVM-side (the preference ladder: built-ins >
pandas UDF > UDTF), so this module exists to cover the API surface with a
*twin* of operators/chunking.chunk_documents: one document row in, one row
per token chunk out, via a lateral join. tests/test_chunking.py pins its
output equal to the JVM fast path — same contract as functions/pandas_fns'
Arrow twins.

UDTFs are row-at-a-time Python: use them for genuinely procedural
row-expanding logic (parsers, small simulators), never for what a
``sequence``/``explode``/``slice`` composition already says.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import SparkSession

try:  # pyspark >= 3.5
    from pyspark.sql.functions import udtf
except ImportError:  # pragma: no cover - older pyspark
    udtf = None


if udtf is not None:

    @udtf(returnType="chunk_id: bigint, n_tokens_chunk: bigint, chunk_md5: string")
    class ChunkDocUDTF:
        """Yield (chunk_id, n_tokens, md5) for each token window of ``text``
        — the Python mirror of chunk_documents' column algebra."""

        def eval(self, text: str, chunk_tokens: int, stride: int):
            if text is None:
                return
            toks = text.split(" ")
            for start in range(0, len(toks), stride):
                piece = toks[start : start + chunk_tokens]
                yield (
                    start // stride,
                    len(piece),
                    hashlib.md5(" ".join(piece).encode()).hexdigest(),
                )

else:  # pragma: no cover
    ChunkDocUDTF = None


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTF surface for SQL ``LATERAL`` use
    (``SELECT d.doc_id, c.* FROM docs d, LATERAL chunk_doc(d.text, 50, 40) c``)."""
    if ChunkDocUDTF is None:  # pragma: no cover
        raise NotImplementedError("pyspark.sql.functions.udtf not available")
    spark.udtf.register("chunk_doc", ChunkDocUDTF)
