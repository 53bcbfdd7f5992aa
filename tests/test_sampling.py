"""Property and plan tests for the deterministic sampling / splitting /
mixing / packing operators (operators/sampling.py). The exact-value contract
is pinned by the DuckDB oracles in test_oracle_parity; these tests pin the
semantic invariants and the plan shapes (zero-shuffle projections, shard-key
requirement)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.sampling import (
    BUCKETS,
    assign_split,
    hash_bucket,
    mixture_thresholds,
    pack_chunked,
    pack_greedy,
    sample_flag,
    weighted_mixture_flag,
)
from pyvectorsearch_spark.plans import count_exchanges, explain_str
from pyvectorsearch_spark.sources.tables import load_table
from tests.conftest import SF_T2


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_T2, "documents").cache()


def test_split_partitions_every_row_once(spark, docs):
    out = assign_split(docs).groupBy("split").count().collect()
    by = {r["split"]: r["count"] for r in out}
    assert set(by) == {"train", "val", "test"}
    assert sum(by.values()) == docs.count()
    # 80/10/10 within hash noise on 500 docs
    assert by["train"] > by["val"] and by["train"] > by["test"]


def test_split_is_deterministic_and_salt_sensitive(docs):
    a = {r["doc_id"]: r["split"] for r in assign_split(docs).select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"] for r in assign_split(docs).select("doc_id", "split").collect()}
    assert a == b
    c = {
        r["doc_id"]: r["split"]
        for r in assign_split(docs, salt="other").select("doc_id", "split").collect()
    }
    assert a != c  # a different salt re-deals the split


def test_split_holdout_when_fractions_below_one(docs):
    out = assign_split(docs, fractions={"train": 0.5}).filter(
        F.col("split").isNull()
    )
    n = out.count()
    assert 0 < n < docs.count()


def test_split_rejects_oversubscribed_fractions(docs):
    with pytest.raises(ValueError):
        assign_split(docs, fractions={"a": 0.9, "b": 0.2}).collect()


def test_sample_flag_uniform_fraction(docs):
    kept = sample_flag(docs, fraction=0.3).filter("sampled").count()
    n = docs.count()
    assert 0.2 * n < kept < 0.4 * n  # hash noise bound on 500 rows


def test_sample_flag_subset_and_missing_stratum_empty(docs):
    flagged = sample_flag(
        docs, strata_col="lang", fractions={"en": 0.5}, salt="s"
    )
    assert flagged.filter((F.col("lang") != "en") & F.col("sampled")).count() == 0
    en_kept = flagged.filter((F.col("lang") == "en") & F.col("sampled")).count()
    assert en_kept > 0


def test_sample_flag_requires_exactly_one_mode(docs):
    with pytest.raises(ValueError):
        sample_flag(docs)
    with pytest.raises(ValueError):
        sample_flag(docs, fraction=0.5, fractions={"en": 0.1}, strata_col="lang")
    with pytest.raises(ValueError):
        sample_flag(docs, fractions={"en": 0.1})  # no strata_col


def test_mixture_thresholds_cap_and_share(spark, docs):
    rows = mixture_thresholds(
        docs, weights={"src0": 1, "src1": 3}, target_rows=40
    ).collect()
    by = {r["source"]: r for r in rows}
    # src0: 40 * 1/4 = 10 of 25 docs -> threshold 4000; src1: 30 of 25 -> cap
    assert by["src0"]["threshold"] == 10 * BUCKETS // 25
    assert by["src1"]["threshold"] == BUCKETS
    # unweighted sources keep nothing
    assert by["src5"]["threshold"] == 0


def test_weighted_mixture_respects_weights(docs):
    flagged = weighted_mixture_flag(
        docs, weights={"src0": 1, "src1": 1}, target_rows=20
    )
    kept = flagged.filter("sampled").groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in kept}
    assert set(by) <= {"src0", "src1"}
    assert 0 < sum(by.values()) <= 30  # ~20 target, hash noise


def test_projection_ops_add_no_shuffle(docs):
    """assign_split / sample_flag are pure projections — no Exchange beyond
    whatever the input already had."""
    for df in (
        assign_split(docs),
        sample_flag(docs, fraction=0.5),
        sample_flag(docs, strata_col="lang", fractions={"en": 0.5}),
    ):
        assert count_exchanges(df) == 0, explain_str(df)[:2000]


def test_mixture_broadcasts_thresholds(docs):
    df = weighted_mixture_flag(docs, weights={"src0": 1}, target_rows=10)
    s = explain_str(df)
    assert "BroadcastHashJoin" in s, s[:2000]


def test_pack_chunked_offsets_and_coverage(docs):
    budget = 1000
    packed = pack_chunked(docs, by="source", budget=budget).cache()
    try:
        assert packed.count() == docs.count()
        assert packed.filter(
            (F.col("pack_offset") < 0) | (F.col("pack_offset") >= budget)
        ).count() == 0
        # pack_id non-decreasing in doc_id order within each source
        rows = packed.select("source", "doc_id", "pack_id").collect()
        per = {}
        for r in rows:
            per.setdefault(r["source"], []).append((r["doc_id"], r["pack_id"]))
        for seq in per.values():
            seq.sort()
            packs = [p for _, p in seq]
            assert packs == sorted(packs)
            assert packs[0] == 0
    finally:
        packed.unpersist()


def test_pack_greedy_never_overflows_budget(docs):
    budget = 1200
    packed = pack_greedy(docs, by="source", budget=budget)
    per_pack = (
        packed.groupBy("source", "pack_id")
        .agg(F.sum("n_chars").alias("fill"), F.count("*").alias("n"))
        .collect()
    )
    for r in per_pack:
        # a pack may exceed budget only when it is a single oversized doc
        assert r["fill"] <= budget or r["n"] == 1, r


def test_pack_greedy_matches_python_reference(docs):
    budget = 1200
    got = {
        (r["source"], r["doc_id"]): r["pack_id"]
        for r in pack_greedy(docs, by="source", budget=budget).collect()
    }
    rows = docs.select("source", "doc_id", "n_chars").collect()
    per = {}
    for r in rows:
        per.setdefault(r["source"], []).append((r["doc_id"], r["n_chars"]))
    for src, seq in per.items():
        seq.sort()
        pack, fill = 0, None
        for doc_id, size in seq:
            if fill is None:
                fill = size
            elif fill + size <= budget:
                fill += size
            else:
                pack, fill = pack + 1, size
            assert got[(src, doc_id)] == pack, (src, doc_id)


def test_packing_requires_shard_key(docs):
    with pytest.raises(ValueError):
        pack_chunked(docs, by="", budget=100)
    with pytest.raises(ValueError):
        pack_greedy(docs, by="", budget=100)


def test_pack_greedy_sharded_parallel_and_consistent(docs):
    """sub_shards=N: every (source, sub-shard) packs independently —
    >1 distinct sub-shard per source (the single-task-per-source bottleneck
    is gone), pack ids encode the sub-shard in the high 32 bits, and each
    sub-shard's packing equals a plain pack_greedy run on just its rows."""
    from pyvectorsearch_spark.operators.sampling import BUCKETS, hash_bucket

    budget, n_sub = 1200, 4
    packed = pack_greedy(
        docs, by="source", budget=budget, sub_shards=n_sub
    ).cache()
    try:
        assert packed.count() == docs.count()
        subs = (
            packed.withColumn("sub", F.shiftright("pack_id", 32))
            .groupBy("source")
            .agg(F.countDistinct("sub").alias("n_subs"))
            .collect()
        )
        assert all(1 < r["n_subs"] <= n_sub for r in subs), subs

        # per-(source, sub) packing == plain pack_greedy on that slice
        sub_col = F.floor(
            hash_bucket(F.col("doc_id"), "packsub") * n_sub / BUCKETS
        ).cast("bigint")
        one_sub = docs.withColumn("_s", sub_col).filter(F.col("_s") == 1).drop("_s")
        plain = {
            (r["source"], r["doc_id"]): r["pack_id"]
            for r in pack_greedy(one_sub, by="source", budget=budget).collect()
        }
        sharded = {
            (r["source"], r["doc_id"]): r["pack_id"]
            for r in packed.filter(F.shiftright("pack_id", 32) == 1).collect()
        }
        assert set(sharded) == set(plain)
        for k, v in plain.items():
            assert sharded[k] == (1 << 32) + v, k
    finally:
        packed.unpersist()


def test_sample_exact_k_two_phase_equals_global_rank(docs):
    """Exact-k sampling: per-stratum size is exactly min(k, |stratum|), and
    the two-phase sub-shard top-k selects the SAME rows as a single global
    (bucket, id) rank — for every sub_shards setting."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.operators.sampling import sample_exact_k

    k = 7
    b = hash_bucket(F.col("doc_id"), "exactk")
    w = Window.partitionBy("source").orderBy(b, "doc_id")
    want = {
        (r["source"], r["doc_id"])
        for r in docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .collect()
    }
    sizes = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for sub_shards in (1, 3, 8):
        got_rows = sample_exact_k(
            docs, strata_col="source", k=k, sub_shards=sub_shards
        ).collect()
        got = {(r["source"], r["doc_id"]) for r in got_rows}
        assert got == want, sub_shards
        per = {}
        for r in got_rows:
            per[r["source"]] = per.get(r["source"], 0) + 1
        assert per == {s: min(k, n) for s, n in sizes.items()}
        # ranks are a contiguous 1..min(k,n) sequence per stratum
        ranks = {}
        for r in got_rows:
            ranks.setdefault(r["source"], []).append(r["sample_rank"])
        for s, rs in ranks.items():
            assert sorted(rs) == list(range(1, min(k, sizes[s]) + 1))


def test_sample_exact_k_rejects_bad_params(docs):
    from pyvectorsearch_spark.operators.sampling import sample_exact_k

    with pytest.raises(ValueError):
        sample_exact_k(docs, strata_col="source", k=0)
    with pytest.raises(ValueError):
        sample_exact_k(docs, strata_col="source", k=3, sub_shards=0)
