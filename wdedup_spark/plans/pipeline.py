"""The end-to-end near-duplicate pipeline — the graft's ``main``.

Orchestrates the checkpointed stage DAG (SURVEY.md §3):

  assemble → exact → sign(shingle+MinHash+SimHash) → candidates
  (LSH ∪ SimHash ∪ substring) → verify → cluster

mirroring the reference's driver (/root/reference/src/main.cpp:208-222:
wprof → wmerge → wfindfirst) with the stage ledger standing in for the
WAL.  Every stage is resumable: rerunning after a crash skips committed
stages (tests/test_resume.py is the F4 protocol).

Scale architecture (the 100 TB story):
* exact dedup FIRST — near-dup stages run on distinct documents only, so
  boilerplate floods and giant exact-dup cliques never reach the LSH
  shuffle (SURVEY.md §7 "hard parts": cliques collapse to single nodes);
* sign-before-shuffle — candidates/verify exchange signatures and ids,
  never documents; worst-case wide-stage row is ~1 KB regardless of
  conversation length;
* candidate pair volume is bounded per bucket (lsh.candidate_pairs
  max_bucket + star policy), so one pathological bucket cannot explode
  the verify stage;
* each stage commits row counts / bytes / file lineage to the ledger —
  the observability the reference gets from profile sizes in its WAL.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wdedup_spark.operators.assemble import assemble_conversations
from wdedup_spark.operators.cluster import cluster_assignments
from wdedup_spark.operators.exact import add_fingerprint
from wdedup_spark.operators.lsh import minhash_lsh_candidates
from wdedup_spark.operators.minhash import add_signatures
from wdedup_spark.operators.simhash import simhash_chunks
from wdedup_spark.operators.lsh import candidate_pairs as _candidate_pairs
from wdedup_spark.operators.substring import common_run_udf
from wdedup_spark.sources.ledger import StageLedger


#: bumped when the stage DAG / committed schemas change shape, so ledgers
#: written by an incompatible pipeline layout are fenced out on resume
#: (v2: fingerprint committed by the assemble stage; members stage removed)
PIPELINE_VERSION = 2


@dataclass(frozen=True)
class PipelineConfig:
    k: int = 3                    # shingle width (tokens)
    n_perms: int = 128            # MinHash lanes
    n_bands: int = 32             # LSH bands (rows = n_perms // n_bands)
    threshold: float = 0.8        # verified Jaccard threshold
    seed: int = 42
    enable_simhash: bool = True
    max_hamming: int = 3
    enable_substring: bool = True
    substring_k: int = 16
    substring_w: int = 48
    substring_min_span: int = 100  # tokens of verbatim overlap
    verify_edit: bool = False      # second verification channel: pairs that
    edit_threshold: float = 0.85   # fail Jaccard but have edit-sim >= this pass
    edit_margin: float = 0.45      # edit candidates keep a wider MinHash-estimate
    # band than the Jaccard channel's 0.15: token-reorder near-dups (the
    # channel's whole purpose) have depressed shingle Jaccard, so the
    # reachable band is [threshold - edit_margin, threshold); pairs below
    # threshold - edit_margin are unreachable by design (documented bound,
    # not a bug: a candidate must still collide in >= min_band_collisions
    # LSH bands to be seen at all)
    max_bucket: int = 256
    oversize_policy: str = "star"
    min_band_collisions: int = 2   # ≥2 of 32 bands: kills quadratic
    # single-band noise at corpus scale; recall at threshold ~0.999998
    sync_ranges: int = 8           # sub-stage commit granularity for the
    # sign stage (the reference's --sync-distance analog): a crash mid-sign
    # loses at most 1/sync_ranges of the stage's Python work
    sync_min_rows_per_range: int = 20_000  # like the reference's 2 GB
    # syncDistance default, granularity is data-proportional: small inputs
    # collapse to one range (per-range job overhead would exceed the
    # recompute it insures against), large inputs get the full fan-out

    def fence(self) -> str:
        payload = {"v": PIPELINE_VERSION, **asdict(self)}
        return hashlib.sha256(json.dumps(payload, sort_keys=True).encode()).hexdigest()[:16]


def run_pipeline(
    spark: SparkSession,
    turns: DataFrame,
    workdir: str,
    cfg: PipelineConfig = PipelineConfig(),
    stop_after: str | None = None,
    gc: bool = False,
) -> dict[str, DataFrame]:
    """Run (or resume) the full dedup pipeline; returns the named stage
    outputs, all backed by committed parquet.

    ``stop_after`` commits stages up to the named one then returns (the
    reference's --wprof-only/--wmerge-only debug staging,
    /root/reference/src/wcli.cpp:115-125).  ``gc`` reclaims intermediate
    outputs (sign, candidates) once the final stage commits (O14,
    src/wmerge.cpp:141-144); resumed runs then skip straight to the
    surviving outputs."""
    ledger = StageLedger(workdir, config_fence=cfg.fence(), spark=spark)
    out: dict = {"ledger": ledger}

    def done(stage: str) -> bool:
        return stop_after == stage

    # -- stage 1: assemble (one shuffle on conv_id) ---------------------------
    # the content fingerprint is computed HERE, in the same pass, and
    # committed with the conversations: both the exact stage and the
    # cluster stage's exact edges read it back for free instead of each
    # re-hashing the whole corpus (the round-2 "members" stage existed
    # only to cache that second sha2 pass — now unnecessary)
    conv = ledger.run(
        spark, "assemble", lambda: add_fingerprint(assemble_conversations(turns), "doc")
    )
    out["conv"] = conv
    if done("assemble"):
        return out

    # effective sign-stage commit granularity: data-proportional, from the
    # committed assemble row count (free — it's in the ledger entry)
    n_convs = ledger.metrics().get("assemble", {}).get("rows", 0)
    eff_ranges = max(1, min(cfg.sync_ranges, n_convs // cfg.sync_min_rows_per_range))

    # -- stage 2: exact dedup (shuffle on 32-byte digest) ---------------------
    # No collect_list of members: a boilerplate flood (10^8 identical docs)
    # must not materialize one giant array in a single aggregation buffer.
    # Member→rep star edges are derived by re-joining on the digest — a
    # plain shuffle join whose skew AQE splits.
    def _exact() -> DataFrame:
        return conv.groupBy("fp").agg(
            F.min("conv_id").alias("rep_id"),
            F.min("doc").alias("doc"),  # all docs in an fp-group are identical
            F.count(F.lit(1)).alias("n_members"),
        )

    # written range-partitioned on rep_id (when granular commits are in
    # play) so the sign stage's ranged commits partition-prune straight
    # off this output — no staging copy.  At eff_ranges == 1 the range
    # layout buys nothing; skip it and its partitionBy write.
    if eff_ranges > 1:
        exact = ledger.run(
            spark, "exact", _exact, range_key="rep_id", n_ranges=eff_ranges
        )
    else:
        exact = ledger.run(spark, "exact", _exact)
    out["exact"] = exact
    if done("exact"):
        return out
    # exact edges are a pure id/fp join of two COMMITTED outputs (fp rides
    # along from the assemble stage — nothing re-fingerprints the corpus)
    exact_edges = (
        conv.select("fp", F.col("conv_id").alias("conv_b"))
        .join(exact.filter(F.col("n_members") > 1).select("fp", F.col("rep_id").alias("conv_a")), "fp")
        .filter(F.col("conv_a") != F.col("conv_b"))
        .select("conv_a", "conv_b")
    )
    # near-dup stages see one representative per distinct document
    reps = exact.select(F.col("rep_id").alias("conv_id"), "doc")

    # -- stage 3: sign (narrow, ONE fused vectorized pandas UDF) --------------
    # The single most expensive Python stage, so it commits per key-range
    # (run_ranged = the reference's --sync-distance analog): a crash mid-
    # sign resumes from the first uncommitted range instead of re-signing
    # the whole corpus.
    def _sign_range(part: DataFrame, _r: int) -> DataFrame:
        # CPU-bound Python stage: fan out to ~2 partitions per core
        # regardless of input file byte-splits (ranges run up to 4 jobs
        # concurrently, so size each range for its share of the cores)
        par = max(1, spark.sparkContext.defaultParallelism * 2 // min(eff_ranges, 4))
        df = add_signatures(
            part.repartition(par), "doc",
            k=cfg.k, n_perms=cfg.n_perms, seed=cfg.seed,
            enable_simhash=cfg.enable_simhash,
            enable_substring=cfg.enable_substring,
            substring_k=cfg.substring_k, substring_w=cfg.substring_w,
        )
        return df.drop("doc")

    if eff_ranges > 1:
        signed = ledger.run_ranged(
            spark, "sign", lambda: reps, _sign_range, key_col="conv_id",
            n_ranges=eff_ranges, input_stage="exact",
            input_select=lambda df: df.select(
                F.col("rep_id").alias("conv_id"), "doc"
            ),
        )
    else:
        # one range == one whole-stage commit: plain run, none of the
        # fence/staging/per-bucket machinery (toy-scale fast path; the
        # recompute it would insure against is smaller than its overhead)
        signed = ledger.run(spark, "sign", lambda: _sign_range(reps, 0))
    out["signed"] = signed
    if done("sign"):
        return out

    # -- stage 4: candidates (the shuffle stages) ------------------------------
    def _candidates() -> DataFrame:
        # every channel feeds the final (conv_a, conv_b) aggregate, so the
        # per-channel distinct() exchanges are skipped (dedup=False) —
        # cross-band duplicates collapse in that one groupBy instead of in
        # three extra shuffles
        cands = minhash_lsh_candidates(
            signed, n_perms=cfg.n_perms, n_bands=cfg.n_bands,
            max_bucket=cfg.max_bucket, oversize_policy=cfg.oversize_policy,
            min_collisions=cfg.min_band_collisions, dedup=False,
        ).withColumn("via", F.lit("minhash"))
        if cfg.enable_simhash:
            sim_banded = simhash_chunks(signed, "simhash", "conv_id", cfg.max_hamming)
            sim_cands = _candidate_pairs(
                sim_banded, cfg.max_bucket, cfg.oversize_policy, dedup=False
            )
            sigs = signed.select(F.col("conv_id").alias("id"), "simhash")
            sim_cands = (
                sim_cands.join(
                    sigs.select(F.col("id").alias("conv_a"), F.col("simhash").alias("sh_a")), "conv_a"
                )
                .join(sigs.select(F.col("id").alias("conv_b"), F.col("simhash").alias("sh_b")), "conv_b")
                .filter(F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))) <= cfg.max_hamming)
                .select("conv_a", "conv_b")
                .withColumn("via", F.lit("simhash"))
            )
            cands = cands.unionByName(sim_cands)
        if cfg.enable_substring:
            anchored = signed.select(
                F.col("conv_id").alias("id"), F.explode("anchors").alias("bucket")
            ).withColumn("band", F.lit(0))
            sub_cands = _candidate_pairs(
                anchored.select("band", "bucket", "id"), cfg.max_bucket,
                cfg.oversize_policy, dedup=False,
            ).withColumn("via", F.lit("substring"))
            cands = cands.unionByName(sub_cands)
        return cands.groupBy("conv_a", "conv_b").agg(
            F.sort_array(F.collect_set("via")).alias("via")
        )

    cands = ledger.run(spark, "candidates", _candidates)
    out["candidates"] = cands
    if done("candidates"):
        return out

    # -- stage 5: verify (exact Jaccard; substring pairs get exact LCS) -------
    def _verify() -> DataFrame:
        # JVM-side MinHash-estimate pre-filter: lane-agreement rate is an
        # unbiased Jaccard estimate; pairs far below threshold die inside
        # whole-stage codegen before any Python verification (the dominant
        # candidate volume at scale is random band/chunk collisions)
        # ONE join per pair side carrying BOTH the MinHash signature (for
        # the JVM estimate pre-filter) and the shingle set (for the exact
        # Jaccard UDF) — half the corpus joins of the sig-then-shingles
        # two-pass shape, at the cost of shipping shingles for candidates
        # the estimate filter kills (bounded: min_band_collisions already
        # keeps the candidate set tight)
        both = signed.select(F.col("conv_id").alias("id"), "sig", "shingles")
        margin = 0.15
        estimated = (
            cands.join(
                both.select(
                    F.col("id").alias("conv_a"),
                    F.col("sig").alias("sig_a"),
                    F.col("shingles").alias("sh_a"),
                ),
                "conv_a",
            )
            .join(
                both.select(
                    F.col("id").alias("conv_b"),
                    F.col("sig").alias("sig_b"),
                    F.col("shingles").alias("sh_b"),
                ),
                "conv_b",
            )
            .withColumn(
                "est",
                F.aggregate(
                    F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                    F.lit(0),
                    lambda acc, x: acc + x,
                ).cast("double")
                / cfg.n_perms,
            )
            .select("conv_a", "conv_b", "via", "est", "sh_a", "sh_b")
        )
        from wdedup_spark.operators.verify import jaccard_udf

        jac = (
            estimated.filter(
                (F.col("est") >= cfg.threshold - margin)
                | F.array_contains("via", "substring")
            )
            .withColumn("jaccard", jaccard_udf(F.col("sh_a"), F.col("sh_b")))
            .filter(F.col("jaccard") >= cfg.threshold)
            .select("conv_a", "conv_b", "jaccard")
            .withColumn("via", F.lit("jaccard"))
        )
        out = jac
        if cfg.verify_edit:
            # pairs that failed Jaccard get the edit-distance check
            # (north_rule "Jaccard/edit-distance checks"): catches
            # token-reorder-heavy near-dups whose shingle sets diverge.
            # Candidates come from the WIDER edit_margin band — reordered
            # docs have depressed shingle Jaccard, so the jac channel's
            # 0.15 margin would filter out exactly the pairs this channel
            # exists to rescue.
            from wdedup_spark.operators.verify import edit_similarity_udf

            failed = estimated.filter(
                (F.col("est") >= cfg.threshold - cfg.edit_margin)
                | F.array_contains("via", "substring")  # substring-anchored
                # candidates keep their edit shot regardless of estimate
                # (long docs with moderate overlap can sit below the band)
            ).select("conv_a", "conv_b").exceptAll(
                jac.select("conv_a", "conv_b")
            )
            docs = reps.select(F.col("conv_id").alias("id"), "doc")
            edit_ok = (
                failed.join(docs.select(F.col("id").alias("conv_a"), F.col("doc").alias("doc_a")), "conv_a")
                .join(docs.select(F.col("id").alias("conv_b"), F.col("doc").alias("doc_b")), "conv_b")
                .withColumn("edit_sim", edit_similarity_udf(F.col("doc_a"), F.col("doc_b")))
                .filter(F.col("edit_sim") >= cfg.edit_threshold)
                .select("conv_a", "conv_b", F.lit(None).cast("double").alias("jaccard"))
                .withColumn("via", F.lit("edit"))
            )
            out = out.unionByName(edit_ok)
        if cfg.enable_substring:
            sub = cands.filter(F.array_contains("via", "substring")).select("conv_a", "conv_b")
            docs = reps.select(F.col("conv_id").alias("id"), "doc")
            sub_ok = (
                sub.join(docs.select(F.col("id").alias("conv_a"), F.col("doc").alias("doc_a")), "conv_a")
                .join(docs.select(F.col("id").alias("conv_b"), F.col("doc").alias("doc_b")), "conv_b")
                .withColumn("common_run", common_run_udf(F.col("doc_a"), F.col("doc_b")))
                .filter(F.col("common_run") >= cfg.substring_min_span)
                .select("conv_a", "conv_b", F.lit(None).cast("double").alias("jaccard"))
                .withColumn("via", F.lit("substring"))
            )
            out = out.unionByName(sub_ok)
        return out.groupBy("conv_a", "conv_b").agg(
            F.max("jaccard").alias("jaccard"), F.sort_array(F.collect_set("via")).alias("via")
        )

    verified = ledger.run(spark, "verify", _verify)
    out["verified"] = verified
    if done("verify"):
        return out

    # -- stage 6: cluster (iterative hash-to-min CC) ---------------------------
    def _cluster() -> DataFrame:
        edges = verified.select("conv_a", "conv_b").unionByName(
            exact_edges.select("conv_a", "conv_b")
        )
        return cluster_assignments(conv.select("conv_id"), edges)

    clusters = ledger.run(spark, "cluster", _cluster)
    out["clusters"] = clusters

    if gc:
        # reclaim intermediates whose consumers are all committed (O14):
        # sign feeds candidates+verify; candidates feeds verify
        ledger.gc("sign")
        ledger.gc("candidates")

    return out
