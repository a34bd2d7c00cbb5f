"""log-IDF TF-IDF vs an independent pandas reference implementation."""

from __future__ import annotations

import math
import re
from collections import Counter

from knowledge_model_spark.operators.text_rank import top_terms_tfidf


def _reference_tfidf(rows, k=3):
    docs = {r["doc_id"]: [w for w in re.split(r"[^a-z0-9]+", r["text"].lower()) if len(w) >= 2] for r in rows}
    n = len(docs)
    dfreq = Counter()
    for toks in docs.values():
        dfreq.update(set(toks))
    out = {}
    for did, toks in docs.items():
        tf = Counter(toks)
        scored = sorted(
            ((t, c * (math.log((n + 1) / (dfreq[t] + 1)) + 1)) for t, c in tf.items()),
            key=lambda x: (-x[1], x[0]),
        )
        out[did] = [(t, round(s, 9)) for t, s in scored[:k]]
    return out


def test_tfidf_matches_pandas_reference(spark, tables):
    docs = tables["documents"].select("doc_id", "text").limit(100)
    rows = [r.asDict() for r in docs.collect()]
    want = _reference_tfidf(rows, k=3)

    got = {}
    for r in top_terms_tfidf(docs, "doc_id", "text", k=3).collect():
        got.setdefault(r["id"], []).append((r["rnk"], r["term"], round(r["tfidf"], 9)))
    for did in want:
        ranked = [(t, s) for _, t, s in sorted(got[did])]
        assert ranked == want[did], f"doc {did}: {ranked} != {want[did]}"
