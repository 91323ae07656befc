"""Driver-contract regression test: a subset of queries() checked against
oracle_sql() via DuckDB at sf0.001 — the same compare the driver runs
(row count + column names + order-insensitive values)."""

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
SUBSET = [
    "word_profile",
    "exact_dup_clusters",
    "minhash_lsh_pairs",
    "edit_dup_pairs",
    "cosine_highsim_pairs",
    "token_stats",
    "lang_id",
    "doc_fingerprint",
    "events_hourly",
    "events_rollup",
    "events_json_stats",
    "knn_label_purity",
    "top_terms_by_source",
    "quota_sample",
    "chunk_docs",
    "find_top_unique",
    "revenue_by_nation",
    "span_dup_stats",
    "span_dedup_docs",
    "prefix_subsumed",
    "containment_pairs",
    "semantic_dedup",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, ddb, name):
    sdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
    odf = ddb.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    cols = sorted(sdf.columns)

    def canon(df):
        return sorted(
            tuple(str(v) for v in row) for row in df[cols].itertuples(index=False)
        )

    assert canon(sdf) == canon(odf)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert [f.name for f in df.schema.fields] == ["doc_a", "doc_b", "jaccard"]
