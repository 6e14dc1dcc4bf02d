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

import numpy as np
import pandas as pd
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


def make_trimmed_mean_udaf(trim_frac: float = 0.1):
    """Custom UDAF surface (SURVEY.md §2.10 — the triple's third
    member next to the chunker UDTF and the cleanse UDFs-as-
    expressions): a grouped-agg ``pandas_udf`` computing the trimmed
    mean (drop the top/bottom ``trim_frac`` of values, average the
    rest) — a robust statistic with no built-in equivalent.

    Arrow ships each group's values to ONE python worker batch, so
    like any exact order-statistic this holds a group in memory —
    use the q105 winsorized-decimal path when groups outgrow a task.
    Results are floats from a deterministic sorted fold, suitable
    for test pinning (not cross-engine hashing)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        # SQL-aggregate NULL discipline: drop NULLs BEFORE sorting —
        # NaN sorts to the tail where it would survive the trim and
        # poison the group mean (ADVICE r2)
        arr = np.sort(v.dropna().to_numpy(dtype="float64"))
        k = int(len(arr) * trim_frac)
        kept = arr[k : len(arr) - k] if len(arr) > 2 * k else arr
        return float(kept.mean()) if len(kept) else float("nan")

    return trimmed_mean
