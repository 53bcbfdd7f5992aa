#!/usr/bin/env python
"""Decomposition + interleaved A/B for dedup_embedding_cosine (r11 opt).

Stages timed (noop-forced):
  load   — AngularModel load only (expected ~0 since r10)
  emit   — mapInPandas bucketing pass alone
  cand   — + groupBy(list_id).applyInPandas GEMM + distinct
  full   — current operator (verify joins re-attach vectors)

Variants (identical (d1,d2,cosine) rows required):
  v0 — current embedding_dup_pairs_bucketed
  v1 — carry vectors THROUGH bucket_pairs (Arrow float64 round trip is
       bit-exact), compute the canonical sequential cosine expression on the
       carried arrays, no verify joins / no extra scans
  v2 — size-dispatched blocked GEMM (collect + broadcast + ONE mapInPandas,
       the embedding_dup_pairs_blocked kernel)

Usage: python tools/ab_embcos.py [rounds] [stages|variants...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

MIN_COSINE = 0.4


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    which = sys.argv[2:] or ["v0", "v1", "v2"]
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-embcos")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyvectorsearch_spark.index.cache import build_or_load
    from pyvectorsearch_spark.sources.tables import dataset_tag, load_table
    from pyvectorsearch_spark.operators.dedup import (
        AngularModel,
        angular_bucket_model,
        embedding_dup_pairs_blocked,
        embedding_dup_pairs_bucketed,
    )
    from pyvectorsearch_spark.functions.vector import cosine_sim

    def load_model():
        emb = load_table(spark, sf_dir, "embeddings")
        return emb, build_or_load(
            spark,
            f"angular16_seed42_{dataset_tag(sf_dir, 'embeddings')}",
            load=AngularModel.load,
            build=lambda: angular_bucket_model(emb, n_lists=16, seed=42),
        )

    def v0():
        emb, model = load_model()
        out = embedding_dup_pairs_bucketed(emb, min_cosine=MIN_COSINE, model=model)
        noop(out.select("d1", "d2", F.round("cosine", 6).alias("cosine")))

    def v1():
        emb, model = load_model()
        out = _bucketed_carry(emb, model, cosine_sim)
        noop(out.select("d1", "d2", F.round("cosine", 6).alias("cosine")))

    def v2():
        emb, model = load_model()  # same artifact reads for comparability
        out = embedding_dup_pairs_blocked(emb, min_cosine=MIN_COSINE)
        noop(out.select("d1", "d2", F.round("cosine", 6).alias("cosine")))

    def _bucketed_carry(df, model, cosine_sim):
        import numpy as np
        import pandas as pd

        id_col, vec_col = "vec_id", "embedding"
        C = model.centroids
        theta = float(np.arccos(min(max(MIN_COSINE, -1.0), 1.0)))
        bcC = spark.sparkContext.broadcast(C)
        qs = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        vec_type = dict(df.dtypes)[vec_col]
        radius = theta + model.alpha_max + 1e-9
        amax = model.alpha_max

        def emit_lists(batches):
            C_ = bcC.value
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
                Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
                ang = np.arccos(np.clip(Xn @ C_.T, -1.0, 1.0))
                primary_ang = ang.min(axis=1)
                if float(primary_ang.max()) > amax + 1e-9:
                    raise ValueError("stale model")
                best = ang.argmin(axis=1)
                ids_ = pdf["_id"].to_numpy()
                vs = list(pdf["_v"])
                out_id, out_list, out_role, out_v = [], [], [], []
                for i in range(len(ids_)):
                    for lst in np.nonzero(ang[i] <= radius)[0]:
                        out_id.append(int(ids_[i]))
                        out_list.append(int(lst))
                        out_role.append("p")
                        out_v.append(vs[i])
                    out_id.append(int(ids_[i]))
                    out_list.append(int(best[i]))
                    out_role.append("c")
                    out_v.append(vs[i])
                yield pd.DataFrame(
                    {"_id": out_id, "list_id": out_list, "_role": out_role, "_v": out_v}
                )

        tagged = qs.mapInPandas(
            emit_lists, schema=f"_id long, list_id int, _role string, _v {vec_type}"
        )
        t = float(MIN_COSINE)

        def bucket_pairs(pdf):
            import numpy as np
            import pandas as pd

            probe = pdf[pdf["_role"] == "p"]
            prim = pdf[pdf["_role"] == "c"]
            if not len(probe) or not len(prim):
                return pd.DataFrame({"d1": [], "d2": [], "v1": [], "v2": []}).astype(
                    {"d1": "int64", "d2": "int64"}
                )
            P = np.asarray([np.asarray(v, dtype=np.float64) for v in probe["_v"]])
            Qm = np.asarray([np.asarray(v, dtype=np.float64) for v in prim["_v"]])
            Pn = P / np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-300)
            Qn = Qm / np.maximum(np.linalg.norm(Qm, axis=1, keepdims=True), 1e-300)
            d_ = Pn.shape[1]
            slack = max(1e-4, 8.0 * (d_ + 2) * 2.0 ** -24)
            P32, Q32 = Pn.astype(np.float32), Qn.astype(np.float32)
            pid = probe["_id"].to_numpy()
            cid = prim["_id"].to_numpy()
            pv = list(probe["_v"])
            cv = list(prim["_v"])
            block = max(1, (128 << 20) // max(4 * len(Q32), 1))
            o1, o2, ov1, ov2 = [], [], [], []
            for lo in range(0, len(P32), block):
                G = P32[lo:lo + block] @ Q32.T
                ii, jj = np.nonzero(
                    (G >= t - slack) & (pid[lo:lo + block, None] != cid[None, :])
                )
                ii = ii + lo
                for i, j in zip(ii, jj):
                    a, b = int(pid[i]), int(cid[j])
                    if a < b:
                        o1.append(a); o2.append(b); ov1.append(pv[i]); ov2.append(cv[j])
                    else:
                        o1.append(b); o2.append(a); ov1.append(cv[j]); ov2.append(pv[i])
            return pd.DataFrame({"d1": o1, "d2": o2, "v1": ov1, "v2": ov2})

        cand = (
            tagged.groupBy("list_id")
            .applyInPandas(
                bucket_pairs,
                schema=f"d1 long, d2 long, v1 {vec_type}, v2 {vec_type}",
            )
            .dropDuplicates(["d1", "d2"])
        )
        return (
            cand.withColumn("cosine", cosine_sim(F.col("v1"), F.col("v2")))
            .filter(F.col("cosine") >= MIN_COSINE)
            .select("d1", "d2", "cosine")
        )

    variants = {"v0": v0, "v1": v1, "v2": v2}

    # equivalence gate first
    if any(v in which for v in ("v1", "v2")):
        emb, model = load_model()
        ref = embedding_dup_pairs_bucketed(emb, min_cosine=MIN_COSINE, model=model)
        ref = {tuple(r) for r in ref.select("d1", "d2", F.round("cosine", 6).alias("c")).collect()}
        for name in ("v1", "v2"):
            if name not in which:
                continue
            if name == "v1":
                alt = _bucketed_carry(emb, model, cosine_sim)
            else:
                alt = embedding_dup_pairs_blocked(emb, min_cosine=MIN_COSINE)
            alt = {tuple(r) for r in alt.select("d1", "d2", F.round("cosine", 6).alias("c")).collect()}
            print(f"equivalence {name}: identical={alt == ref} ({len(ref)} rows)", flush=True)

    seq = [v for v in ("v0", "v1", "v2") if v in which]
    res = {v: [] for v in seq}
    for r in range(rounds):
        for v in seq:
            t0 = time.time()
            variants[v]()
            res[v].append(time.time() - t0)
        print(f"round {r}: " + "  ".join(f"{v}={res[v][-1]:.3f}" for v in seq), flush=True)
    print("--- min/median over", rounds, "rounds", flush=True)
    import statistics
    for v in seq:
        print(f"{v}: min={min(res[v]):.3f} median={statistics.median(res[v]):.3f}", flush=True)


if __name__ == "__main__":
    main()
