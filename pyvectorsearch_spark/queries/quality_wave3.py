"""Registration shim for the round-4 quality/statistics additions that live
in ``quality_extra.py`` (KS drift, corpus diversity, A/B z-test, crosstab,
BH-FDR). They register HERE — after the driver's pinned 50-entry window —
so the window's membership stays identical to rounds 1-3 (the round-2
verdict: "keep the window stable"); tests/test_oracle_parity.py covers them
against the same oracles regardless of position."""

from __future__ import annotations

from pyvectorsearch_spark.queries.quality_extra import (
    ORACLE_CORPUS_DIVERSITY,
    ORACLE_EVENTS_AB_CUPED,
    ORACLE_DOCUMENTS_CROSSTAB,
    ORACLE_EVENTS_AB,
    ORACLE_EVENTS_KS,
    ORACLE_EVENTS_KS_BH,
    q_corpus_diversity,
    q_events_ab_cuped,
    q_documents_crosstab,
    q_events_ab_test,
    q_events_ks_bh_fdr,
    q_events_ks_drift,
)

QUERIES = {
    "events_ks_drift": q_events_ks_drift,
    "corpus_diversity": q_corpus_diversity,
    "events_ab_test": q_events_ab_test,
    "documents_crosstab": q_documents_crosstab,
    "events_ks_bh_fdr": q_events_ks_bh_fdr,
    "events_ab_cuped": q_events_ab_cuped,
}
ORACLES = {
    "events_ks_drift": ORACLE_EVENTS_KS,
    "corpus_diversity": ORACLE_CORPUS_DIVERSITY,
    "events_ab_test": ORACLE_EVENTS_AB,
    "documents_crosstab": ORACLE_DOCUMENTS_CROSSTAB,
    "events_ks_bh_fdr": ORACLE_EVENTS_KS_BH,
    "events_ab_cuped": ORACLE_EVENTS_AB_CUPED,
}
