"""Training-data pipeline operators vs DuckDB oracles + property checks.

Mirrors the engine's oracle-equivalence discipline (SURVEY.md §5.2): every
deterministic operator is checked value-for-value against an independent
DuckDB implementation on the sf0.001 documents/embeddings tables; the
approximate ANN path is checked by recall against the exact path.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            continue
        df[c] = pd.to_numeric(df[c], errors="ignore")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_matches_oracle(spark_df, duck, sql):
    got = _norm(spark_df.toPandas())
    want = _norm(duck.sql(sql).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


# --- textstats ---------------------------------------------------------------


def test_token_counts_oracle(docs, duck):
    assert_matches_oracle(
        textstats.with_token_counts(docs), duck, textstats.token_counts_sql()
    )


def test_quality_oracle(docs, duck):
    assert_matches_oracle(textstats.with_quality(docs), duck, textstats.quality_sql())


def test_lang_id_oracle(docs, duck):
    assert_matches_oracle(textstats.with_lang_id(docs), duck, textstats.lang_id_sql())


def test_fingerprint_oracle(docs, duck):
    assert_matches_oracle(
        textstats.with_fingerprint(docs), duck, textstats.fingerprint_sql()
    )


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [(1, "Hello,  World! foo"), (2, "hello world\tfoo")], "doc_id long, text string"
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in textstats.with_fingerprint(df).collect()}
    assert fps[1] == fps[2]


# --- dedup -------------------------------------------------------------------


def test_exact_duplicates_oracle(docs, duck):
    assert_matches_oracle(
        dedup.exact_duplicates(docs), duck, dedup.exact_duplicates_sql()
    )


def test_exact_duplicates_synthetic(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "zzz"), (7, "a b c")],
        "doc_id long, text string",
    )
    rows = {
        (r["dup_doc_id"], r["keeper_doc_id"])
        for r in dedup.exact_duplicates(df).collect()
    }
    assert rows == {(2, 1), (7, 1)}


def test_jaccard_pairs_oracle(docs, duck):
    sh = dedup.shingle_hashes(docs)
    assert_matches_oracle(
        dedup.jaccard_pairs(sh, 0.3).orderBy("doc_a", "doc_b"),
        duck,
        dedup.jaccard_pairs_sql(0.3),
    )


def test_minhash_pairs_oracle(docs, duck):
    assert_matches_oracle(
        dedup.minhash_dedup_pairs(docs, tau=0.3).orderBy("doc_a", "doc_b"),
        duck,
        dedup.minhash_pairs_sql(0.3),
    )


def test_minhash_candidates_subset_of_jaccard_domain(spark):
    # near-identical docs must be found; disjoint docs must not be candidates
    base = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + " ok"),
            (3, "completely different words about spark shuffles and parquet files"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_dedup_pairs(df, tau=0.5).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_simhash_oracle(docs, duck):
    assert_matches_oracle(
        dedup.simhash(docs).orderBy("doc_id"), duck, dedup.simhash_sql()
    )


def test_simhash_pairs_oracle(docs, duck):
    assert_matches_oracle(
        dedup.simhash_pairs(dedup.simhash(docs), 8).orderBy("doc_a", "doc_b"),
        duck,
        dedup.simhash_pairs_sql(8),
    )


def test_simhash_blocked_join_matches_cross_join(docs):
    sim = dedup.simhash(docs)
    blocked = {
        tuple(r) for r in dedup.simhash_pairs(sim, 1).collect()
    }
    exact = {
        tuple(r)
        for r in dedup.simhash_pairs(sim, 2).collect()
        if r["hamming"] <= 1
    }
    assert blocked == exact


def test_embedding_dup_pairs_oracle(emb, duck):
    assert_matches_oracle(
        dedup.embedding_dup_pairs(emb, 0.2).orderBy("id_a", "id_b"),
        duck,
        dedup.embedding_pairs_sql(0.2),
    )


# --- similarity --------------------------------------------------------------


def _qvec(duck) -> list[float]:
    return list(duck.sql("SELECT embedding FROM embeddings WHERE vec_id = 0").fetchone()[0])


def test_cosine_topk_oracle(emb, duck):
    qv = _qvec(duck)
    assert_matches_oracle(
        similarity.cosine_topk(emb, qv, 10), duck, similarity.cosine_topk_sql(qv, 10)
    )


def test_ann_recall_vs_bruteforce(emb, duck):
    qv = _qvec(duck)
    exact = [r["vec_id"] for r in similarity.cosine_topk(emb, qv, 10).collect()]
    approx = [
        r["vec_id"]
        for r in similarity.ann_topk(emb, qv, 10, nbits=8, probe_hamming=2).collect()
    ]
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.5, f"ANN recall too low: {recall}"
    # the query vector itself must always be found (it is in its own bucket)
    assert 0 in approx


def test_knn_join_self_neighbor(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    res = similarity.knn_join(emb, queries, 3).toPandas()
    top1 = res[res["rank"] == 1].set_index("qid")["vec_id"].to_dict()
    assert top1 == {0: 0, 1: 1, 2: 2}
    assert (res.groupby("qid").size() == 3).all()


# --- multimodal --------------------------------------------------------------


def test_asset_schema_and_stats_oracle(docs, duck):
    assets = multimodal.make_assets(docs)
    # nullability flags vary with input source; compare names+types only
    assert assets.schema.simpleString() == multimodal.ASSET_SCHEMA.simpleString()
    assert_matches_oracle(multimodal.asset_stats(assets), duck, multimodal.asset_stats_sql())


def test_extract_features_deterministic(spark, docs):
    assets = multimodal.make_assets(docs.limit(20))
    f1 = multimodal.extract_features(assets, dim=16).orderBy("asset_id").toPandas()
    f2 = multimodal.extract_features(assets, dim=16).orderBy("asset_id").toPandas()
    assert len(f1) == 20
    assert all(len(v) == 16 for v in f1["feature"])
    for a, b in zip(f1["feature"], f2["feature"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_decode_asset_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_asset(b"xx", "image")


def test_frame_sample_shapes(spark, docs):
    assets = multimodal.make_assets(docs)
    n_video = assets.filter(F.col("kind") == "video").filter(F.length("data") > 0).count()
    frames = multimodal.frame_sample(assets, n_frames=4)
    pdf = frames.groupBy("asset_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("mx")
    ).toPandas()
    assert len(pdf) == n_video
    assert (pdf["n"] <= 4).all() and (pdf["n"] >= 1).all()
    # frames reassemble to the original payload
    one = frames.orderBy("asset_id", "frame_idx").limit(4).collect()
    aid = one[0]["asset_id"]
    orig = assets.filter(F.col("asset_id") == aid).collect()[0]["data"]
    joined = b"".join(
        bytes(r["frame"]) for r in frames.filter(F.col("asset_id") == aid)
        .orderBy("frame_idx").collect()
    )
    assert joined == bytes(orig)


def test_scrub_oracle(docs, duck):
    assert_matches_oracle(
        textstats.with_scrubbed(docs).orderBy("doc_id"), duck, textstats.scrubbed_sql()
    )


def test_scrub_redacts_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@example.co or visit https://x.io/p?q=1 now"),
            (2, "server 10.0.0.1 key deadbeefdeadbeefdeadbeefdeadbeef ok"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textstats.with_scrubbed(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_url"] == 1
    assert out[2]["n_ipv4"] == 1 and out[2]["n_hexsecret"] == 1
    assert out[3]["n_url"] == out[3]["n_email"] == 0
    # determinism + actual redaction: same text scrubbed twice -> same md5,
    # and differs from raw md5 when something was redacted
    import hashlib

    raw1 = hashlib.md5(
        "mail me at a.b+c@example.co or visit https://x.io/p?q=1 now".encode()
    ).hexdigest()
    assert out[1]["clean_md5"] != raw1
    raw3 = hashlib.md5("clean text only".encode()).hexdigest()
    assert out[3]["clean_md5"] == raw3


def test_cluster_duplicates_chain_and_survivors(spark):
    # chain 0-1-2-3 needs multiple propagation rounds; 7-8 separate;
    # 5 appears only via (5,9)
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (7, 8), (5, 9)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["cluster"]
        for r in dedup.cluster_duplicates(pairs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 7: 7, 8: 7, 5: 5, 9: 5}
    surv = {
        (r["dup_doc_id"], r["keeper_doc_id"])
        for r in dedup.canonical_survivors(
            dedup.cluster_duplicates(pairs)
        ).collect()
    }
    assert surv == {(1, 0), (2, 0), (3, 0), (8, 7), (9, 5)}


def test_clusters_sql_matches_engine(spark):
    # the recursive-CTE oracle and the label-propagation engine agree on
    # a branched component with a cycle
    rows = [(10, 11), (11, 12), (10, 13), (12, 13), (20, 21)]
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
    eng = sorted(
        (r["doc_id"], r["cluster"])
        for r in dedup.cluster_duplicates(pairs).collect()
    )
    con = duckdb.connect()
    pairs_sql = "SELECT * FROM (VALUES " + ", ".join(
        f"({a}, {b})" for a, b in rows
    ) + ") AS t(doc_a, doc_b)"
    ora = con.execute(dedup.clusters_sql(pairs_sql)).fetchall()
    assert eng == sorted((int(a), int(b)) for a, b in ora)
