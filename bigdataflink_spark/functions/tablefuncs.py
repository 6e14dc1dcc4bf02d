"""Python UDTFs (user-defined TABLE functions, SURVEY.md §2.10) —
the row→rows extension point Spark exposes as a first-class API.

The reference's whole job is two MapFunctions (SURVEY.md §2.10); a
UDTF is the one UDF shape that has no DataFrame-expression
equivalent when the fan-out logic is genuinely imperative. Here the
chunker UDTF is deliberately the IMPERATIVE TWIN of q125's pure
column-expression chunker: same windows, same ids — the parity test
pins them equal. Use the expression form in production (JVM codegen,
no Python round-trip); the UDTF form is the template for logic that
can't be expressed as expressions (stateful tokenizers, external
library calls), and it still runs Arrow-batched per partition.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk_len int, chunk_text string")
class ChunkDocUDTF:
    """Overlapping token-window chunker: 32-token windows at stride
    24 over whitespace tokens — q125's exact contract, imperatively.

    Registered per-session via
    ``spark.udtf.register("chunk_doc", ChunkDocUDTF)`` and invoked as
    a LATERAL table function:
    ``SELECT d.doc_id, c.* FROM documents d, LATERAL chunk_doc(d.text) c``.
    """

    CHUNK = 32
    STRIDE = 24

    def eval(self, text: str):  # noqa: A002 - Spark passes the column
        if text is None:
            return
        toks = [t for t in text.split(" ") if t != ""]
        n = len(toks)
        if n < 1:
            return
        for start in range(0, n, self.STRIDE):
            piece = toks[start : start + self.CHUNK]
            yield (start // self.STRIDE, len(piece), " ".join(piece))
