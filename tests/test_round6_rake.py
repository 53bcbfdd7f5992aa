"""Round-6: RAKE keyword extraction — independent pure-python recompute
(deg/freq word scores, maximal stopword-free runs) from the parquet
fixture, plus the structural properties of the scheme.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pandas as pd

from tests.conftest import SF_T2


def _py_rake(texts, stops, top_k):
    phrases = []  # (phrase_tuple)
    for t in texts:
        toks = [w for w in re.sub(r"[^a-z0-9 ]", "", t.lower()).split(" ") if w]
        run = []
        for w in toks:
            if w in stops:
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(w)
        if run:
            phrases.append(tuple(run))
    freq, deg = defaultdict(int), defaultdict(int)
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    agg = {}
    for p in phrases:
        sc = sum(deg[w] / freq[w] for w in p)
        key = " ".join(p)
        n_words, n_occ, _ = agg.get(key, (len(p), 0, 0.0))
        agg[key] = (len(p), n_occ + 1, sc)
    rows = sorted(
        ((k, v[0], v[1], round(v[2], 6)) for k, v in agg.items()),
        key=lambda r: (-r[3], r[0]),
    )
    return rows[:top_k]


def test_rake_matches_python(spark):
    from pyvectorsearch_spark.operators.textops import STOPWORDS
    from pyvectorsearch_spark.queries.text_extra import RAKE_TOP_K, q_text_rake

    got = [
        (r.phrase, r.n_words, r.n_occ, r.score_r)
        for r in q_text_rake(spark, SF_T2).collect()
    ]
    docs = pd.read_parquet(f"{SF_T2}/documents.parquet")
    want = _py_rake(docs["text"], set(STOPWORDS["en"]), RAKE_TOP_K)
    assert got == want
    # structural checks: multi-word phrases outrank because scores add
    assert any(r[1] >= 2 for r in got)
    assert all(got[i][3] >= got[i + 1][3] for i in range(len(got) - 1))
