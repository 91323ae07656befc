"""Round-6 stage-level profiler (guide §1): times sub-stages of the hot
query chains with the noop sink so we know where the seconds go before
touching anything.  Usage:

    python tools/profile_r06.py /root/testdata/sf1.0 [stage ...]

Stages (default: all): sign, band, cands, verify, minhash_q, cc,
repetition, decon, cosine_feats, cosine_q, knn, edit, containment.
Not part of the frozen bench contract — measurement scaffolding only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def force(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    wanted = set(sys.argv[2:])
    import bench
    import __spark_entry__ as entry
    from wdedup_spark.session import spark_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = spark_session(app_name="profile-r06", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    bench._warm_session(spark, cpus)

    def t(name, fn, n=2):
        if wanted and name not in wanted:
            return
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:24s} {best:8.3f} s")

    from wdedup_spark.operators.lsh import minhash_lsh_candidates
    from wdedup_spark.operators.minhash import add_signatures
    from wdedup_spark.operators.verify import verify_pairs

    def docs():
        return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").alias("conv_id"), F.col("text").alias("doc")
        )

    def signed_df():
        return add_signatures(
            docs(), "doc", k=3, n_perms=128,
            enable_simhash=False, enable_substring=False,
        ).drop("doc")

    t("sign", lambda: force(signed_df()))

    def cands_df(s):
        return minhash_lsh_candidates(s, n_perms=128, n_bands=32,
                                      oversize_policy="all")

    def _band():
        s = signed_df().localCheckpoint(eager=True)
        t0 = time.perf_counter()
        force(cands_df(s))
        print(f"{'  cands-after-sign':24s} {time.perf_counter()-t0:8.3f} s")

    t("band+cands", _band, n=1)

    def _verify():
        s = signed_df().localCheckpoint(eager=True)
        c = cands_df(s).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        force(verify_pairs(c, s, threshold=0.8))
        print(f"{'  verify-after-cands':24s} {time.perf_counter()-t0:8.3f} s")

    t("verify", _verify, n=1)

    qs = entry.queries()
    for qn in [
        "minhash_lsh_pairs", "dedup_clusters", "repetition_filter",
        "decontaminated", "cosine_highsim_pairs", "knn_label_purity",
        "edit_dup_pairs", "containment_pairs", "cluster_keepers",
        "soft_dedup_weights", "incremental_clusters", "simhash_pairs",
        "ivf_topk_exact", "substring_pairs",
    ]:
        t(qn, lambda qn=qn: force(qs[qn](spark, sf_dir)))


if __name__ == "__main__":
    main()
