"""Production-hash MinHash recall property: the xxhash64 variant's
banded candidate generation must recover every true near-dup pair the
exact AllPairs join finds (the banding bound at 16 bands x 2 rows makes
a miss at j >= 0.55 a (1-j^2)^16 ~ 0.3% event per pair; on this corpus
recall is exactly 100%, which is also what lets the registry entry use
the exact all-pairs oracle)."""

from ds_floodexposure_monitoring_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _pairs(spark, name):
    return {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in REGISTRY[name].fn(spark, SF).collect()
    }


def test_xxh_minhash_matches_exact_pairs(spark):
    exact = _pairs(spark, "ngram_jaccard_pairs")
    xxh = _pairs(spark, "minhash_lsh_pairs_xxh")
    # soundness: every emitted pair is exact-verified, so <= exact
    assert xxh <= exact
    # recall: banding recovered every true pair on this corpus
    assert xxh == exact, f"missed {len(exact - xxh)} true pairs"


def test_md5_and_xxh_variants_agree(spark):
    md5 = _pairs(spark, "minhash_lsh_pairs")
    xxh = _pairs(spark, "minhash_lsh_pairs_xxh")
    assert md5 == xxh
