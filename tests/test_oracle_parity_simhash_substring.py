"""Parity tests for the two newly oracle-checkable queries.

simhash_pairs: the md5-of-shingle-string feature hash must match DuckDB's
``('0x' || substr(md5(s),1,16))::UBIGINT`` bit-for-bit, and the full query
must equal the all-pairs Hamming <= 3 SQL.

substring_pairs: the engine's winnowing + seed-chain verify must equal the
shared-16-gram diagonal gaps-and-islands SQL.
"""

import os

import duckdb
import numpy as np
import pytest

from wdedup_spark.functions import hashing

SF_DIR = "/root/testdata/sf0.001"


def test_md5_shingle_hash_matches_duckdb():
    toks = "the quick brown fox jumps over the lazy dog".split()
    py = hashing.md5_shingle_hashes(toks, 3)
    con = duckdb.connect()
    for i, h in enumerate(py):
        s = " ".join(toks[i : i + 3])
        (dd,) = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 16))::UBIGINT", [s]
        ).fetchone()
        assert int(h) == dd


def test_md5_shingle_hash_short_doc_clamps():
    assert len(hashing.md5_shingle_hashes(["a"], 3)) == 1
    assert len(hashing.md5_shingle_hashes([], 3)) == 0
    # whole-doc shingle for n < k
    one = hashing.md5_shingle_hashes(["a", "b"], 3)
    assert len(one) == 1
    import hashlib as _h

    assert int(one[0]) == int.from_bytes(_h.md5(b"a b").digest()[:8], "big")


@pytest.mark.skipif(not os.path.exists(SF_DIR), reason="testdata missing")
@pytest.mark.parametrize("qname", ["simhash_pairs", "substring_pairs"])
def test_query_matches_oracle_at_sf0001(spark, qname):
    import __spark_entry__ as entry

    sdf = entry.queries()[qname](spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    odf = con.execute(entry.oracle_sql()[qname]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    a = sorted(map(tuple, sdf[cols].astype(np.int64).values.tolist()))
    b = sorted(map(tuple, odf[cols].astype(np.int64).values.tolist()))
    assert a == b
