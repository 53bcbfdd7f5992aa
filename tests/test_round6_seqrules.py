"""Round-6: session_seq_rules — independent pandas recompute of the
subsequence-rule mining (a => b present iff SOME a occurrence precedes
SOME b occurrence within a session), including the min-rank/max-rank
reduction's correctness against a literal occurrence scan.
"""

from __future__ import annotations

import itertools

import pandas as pd

from tests.conftest import SF_T2


def _sessions(ev: pd.DataFrame, gap: float):
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    out = []
    for uid, grp in ev.groupby("user_id"):
        s = 0
        prev = None
        for _, r in grp.iterrows():
            t = r["ts"].timestamp()
            if prev is None or t - prev > gap:
                s += 1
            prev = t
            out.append((uid, s, r["event_type"]))
    return out


def test_seq_rules_match_pandas(spark):
    from pyvectorsearch_spark.queries.funnel_extra import (
        SEQRULE_MINSUP,
        SESSION_GAP_S,
        q_session_seq_rules,
    )

    got = {(r.ante, r.cons): r for r in q_session_seq_rules(spark, SF_T2).collect()}

    ev = pd.read_parquet(f"{SF_T2}/events.parquet")
    rows = _sessions(ev, SESSION_GAP_S)
    seqs: dict[tuple, list] = {}
    for uid, s, et in rows:
        seqs.setdefault((uid, s), []).append(et)
    multi = {k: v for k, v in seqs.items() if len(v) >= 2}
    n = len(multi)
    supp1: dict[str, int] = {}
    supp2: dict[tuple, int] = {}
    for seq in multi.values():
        for t in set(seq):
            supp1[t] = supp1.get(t, 0) + 1
        # literal subsequence scan (NOT the min/max trick — independent)
        present = set()
        for i, j in itertools.combinations(range(len(seq)), 2):
            if seq[i] != seq[j]:
                present.add((seq[i], seq[j]))
        for p in present:
            supp2[p] = supp2.get(p, 0) + 1

    want = {
        (a, b): c
        for (a, b), c in supp2.items()
        if c / n >= SEQRULE_MINSUP
    }
    assert set(got) == set(want)
    for (a, b), c in want.items():
        r = got[(a, b)]
        assert r.n_ab == c
        assert abs(r.support_r - round(c / n, 6)) < 1e-9
        assert abs(r.confidence_r - round(c / supp1[a], 6)) < 1e-9
        assert abs(r.lift_r - round((c / supp1[a]) / (supp1[b] / n), 6)) < 1e-9
