"""wdedup_spark — a PySpark-native near-duplicate detection + clustering engine.

A from-scratch, Spark-first re-expression of the capabilities of
aegistudio/wdedup (reference: /root/reference, C++ external-memory word
dedup engine).  The reference's profile/merge/scan stages
(src/wprof.cpp, src/wmerge.cpp, src/wfindfirst.cpp) become declarative
DataFrame programs: one hash-partitioned ``groupBy`` replaces the whole
binary merge tree; Catalyst/AQE replaces the DP merge planner
(src/wmpdp.cpp); Iceberg/parquet stage commits replace the WAL
(src/wiobase.cpp:131-151).

Layout:
  session    — SparkSession factory tuned for the dedup workload
  synth      — deterministic synthetic transcript generator (FIXTURES.md)
  operators  — dedup operators (exact, minhash/LSH, simhash, suffix-array,
               verification, connected components, ANN)
  functions  — text analysis + multimodal column helpers
  sources    — storage abstraction + stage ledger (resume protocol)
  plans      — end-to-end pipeline orchestration
  streaming  — structured-streaming dedup
"""

__version__ = "0.1.0"
