"""Benchmark decontamination (n-gram overlap) vs a brute-force oracle."""

import numpy as np

from lucene_spark.pipeline import dedup


def _brute_overlap(texts_bench, texts_corpus, min_overlap):
    bench = set()
    for t in texts_bench:
        bench.update(dedup._doc_shingle_hashes(t).tolist())
    out = {}
    for i, t in enumerate(texts_corpus):
        n = len(set(dedup._doc_shingle_hashes(t).tolist()) & bench)
        if n >= min_overlap:
            out[i] = n
    return out


def test_benchmark_overlap_brute(spark):
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(40)]
    bench_texts = [" ".join(rng.choice(vocab, 12)) for _ in range(6)]
    corpus_texts = [" ".join(rng.choice(vocab, 25)) for _ in range(30)]
    # plant exact contamination: corpus doc 0 embeds a benchmark span
    corpus_texts[0] = corpus_texts[0] + " " + bench_texts[0]
    bench_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(bench_texts)], "doc_id long, text string"
    )
    corpus_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_overlap"]
        for r in dedup.benchmark_overlap(
            dedup.shingle_hashes(corpus_df),
            dedup.shingle_hashes(bench_df),
            min_overlap=2,
        ).collect()
    }
    want = _brute_overlap(bench_texts, corpus_texts, 2)
    assert got == want
    assert 0 in got  # the planted contamination is flagged


def test_benchmark_overlap_min_overlap_filter(spark):
    a = spark.createDataFrame(
        [(0, "x y z p q r"), (1, "a b c d e f")], "doc_id long, text string"
    )
    b = spark.createDataFrame([(9, "x y z w")], "doc_id long, text string")
    # doc 0 shares exactly one shingle ("x y z") with the benchmark
    one = dedup.benchmark_overlap(
        dedup.shingle_hashes(a), dedup.shingle_hashes(b), min_overlap=1
    ).collect()
    assert {(r["doc_id"], r["n_overlap"]) for r in one} == {(0, 1)}
    none = dedup.benchmark_overlap(
        dedup.shingle_hashes(a), dedup.shingle_hashes(b), min_overlap=2
    ).collect()
    assert none == []
