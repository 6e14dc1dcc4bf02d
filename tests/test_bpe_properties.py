"""Property-based parity for the BPE trainer: the distributed
vocab-census driver loop must agree with a direct single-node
implementation of the Sennrich algorithm (pair census over the word
census, argmax with (count desc, left, right) tiebreak, greedy
left-to-right within-word merge) on arbitrary hypothesis corpora —
including all-same-char words, exact ties, and vocabularies that
exhaust before N merges.

One batch of docs per example.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdataflink_spark.operators.text import bpe_train


def ref_bpe_train(texts: list[str], n_merges: int):
    words = Counter()
    for s in texts:
        for w in s.split(" "):
            if w:
                words[w] += 1
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # argmax: count desc, then left asc, right asc
        (l, r), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, l, r, l + r, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            for x in syms:  # greedy left-to-right fold
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


_WORD = st.text(alphabet="abc", min_size=1, max_size=6)
_DOC = st.lists(_WORD, min_size=1, max_size=10).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_DOC, min_size=1, max_size=5))
def test_bpe_train_matches_reference(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [tuple(r) for r in bpe_train(docs, n_merges=4).collect()]
    assert got == ref_bpe_train(texts, 4)
