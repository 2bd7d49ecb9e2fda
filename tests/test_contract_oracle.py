"""Every driver-contract query vs its DuckDB oracle at sf0.001
(mirrors the driver's sf0.01 gate: row count + schema + values)."""

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _norm(df):
    """pandas frame -> sorted list of tuples with canonical scalars."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(None)
            elif isinstance(v, float):
                vals.append(round(v, 6))
            elif hasattr(v, "to_pydatetime"):
                vals.append(v.to_pydatetime())
            else:
                vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return cols, out


ORACLES = entrymod.oracle_sql()
ALL_QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_matches_oracle(spark, con, name):
    got_df = ALL_QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        # rows-only contract: must run and return a stable schema
        assert got_df.shape[0] >= 0 and got_df.shape[1] > 0
        return
    want_df = con.sql(ORACLES[name]).df()
    g_cols, g = _norm(got_df)
    w_cols, w = _norm(want_df)
    assert g_cols == w_cols, f"column mismatch: {g_cols} vs {w_cols}"
    assert len(g) == len(w), f"row count {len(g)} vs {len(w)}"
    for i, (a, b) in enumerate(zip(g, w)):
        assert a == b, f"row {i}: {a} != {b}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_minhash_equals_exact_jaccard(spark):
    """Construction check: at these LSH parameters, MinHash+verify must
    recover exactly the pairs the exact-Jaccard query finds."""
    exact = ALL_QUERIES["ngram_jaccard_pairs"](spark, SF_DIR)
    lsh = ALL_QUERIES["minhash_lsh_pairs"](spark, SF_DIR)
    e = {(r.doc_a, r.doc_b) for r in exact.collect()}
    l = {(r.doc_a, r.doc_b) for r in lsh.collect()}
    assert l <= e  # verify step guarantees no false positives
    missed = e - l
    assert len(missed) <= max(1, len(e) // 20), f"LSH recall too low: missed {missed}"


def test_minhash_lsh_matches_exact_jaccard(spark):
    """Construction check for the rows-only MinHash query: candidates are
    exact-verified, so LSH output ⊆ exact pairs; at 16 bands of 2 the
    candidate recall at j>=0.55 is ~1, so the sets should be equal."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ALL_QUERIES["ngram_jaccard_pairs"](spark, SF_DIR).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in ALL_QUERIES["minhash_lsh_pairs"](spark, SF_DIR).collect()
    }
    assert lsh <= exact
    assert lsh == exact, f"LSH missed {len(exact - lsh)} of {len(exact)} pairs"


def test_simhash_neardup_consistent_with_signatures(spark):
    """Every reported pair must truly be within the Hamming threshold of
    the signatures the signature query reports (banding loses nothing at
    threshold = n_bands - 1)."""
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in ALL_QUERIES["simhash_signatures"](spark, SF_DIR).collect()
    }
    pairs = ALL_QUERIES["simhash_neardup_pairs"](spark, SF_DIR).collect()
    for r in pairs:
        ham = bin((sigs[r["doc_a"]] ^ sigs[r["doc_b"]]) & (2**64 - 1)).count("1")
        assert ham == r["hamming"] and ham <= 3
