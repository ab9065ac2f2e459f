"""TermFilteredPresearcher analog (streaming/monitor.py) — covering
term extraction (QueryTree conjunction/disjunction rules +
TermWeightor.DEFAULT length weighting), the term -> query index, and
candidate-pruned matching equivalence.
"""

import pandas as pd
import pytest

from lucene_spark.search import BoolQ, PhraseQ, PrefixQ, TermInSetQ, TermQ
from lucene_spark.streaming import Monitor
from lucene_spark.streaming.monitor import (
    _term_weight,
    build_query_index,
    compile_query,
)


def anchors(q):
    return compile_query("q", q).anchor_terms


def test_length_weighting_prefers_longer_terms():
    # TermWeightor.DEFAULT = lengthWeightor(3, 0.3): monotone in length
    assert _term_weight("internationalization") > _term_weight("the")
    # conjunction indexes ONLY the highest-weight child
    assert anchors(BoolQ(must=(TermQ("the"), TermQ("relativistic")))) == (
        "relativistic",
    )


def test_disjunction_indexes_all_children():
    got = anchors(BoolQ(should=(TermQ("alpha"), TermQ("bravo"))))
    assert set(got) == {"alpha", "bravo"}


def test_termset_child_indexes_all_terms():
    # a TermInSet must-clause can be satisfied by ANY member: all index
    got = anchors(BoolQ(must=(TermInSetQ(terms=("xx", "yy")),)))
    assert set(got) == {"xx", "yy"}


def test_phrase_picks_best_slot():
    # phrase = conjunction over slots: only the longest (heaviest) term
    # needs indexing
    assert anchors(PhraseQ(("a", "zygomorphic", "of"))) == ("zygomorphic",)


def test_unextractable_goes_anytoken():
    # prefix has no exact term; a must of only-prefix -> ANYTOKEN
    assert anchors(BoolQ(must=(PrefixQ("pre"),))) == ()
    # but a weighted sibling rescues the conjunction
    assert anchors(BoolQ(must=(PrefixQ("pre"), TermQ("anchor")))) == ("anchor",)
    # one un-extractable disjunct poisons the whole disjunction
    assert anchors(BoolQ(should=(TermQ("anchor"), PrefixQ("pre")))) == ()


def test_query_index_buckets():
    qs = [
        compile_query("t1", TermQ("alpha")),
        compile_query("t2", BoolQ(should=(TermQ("alpha"), TermQ("bravo")))),
        compile_query("any", BoolQ(must=(PrefixQ("pre"),))),
    ]
    by_term, anytoken = build_query_index(qs)
    assert sorted(by_term["alpha"]) == [0, 1]
    assert by_term["bravo"] == [1]
    assert anytoken == [2]


def test_candidate_pruned_matching_equivalence(spark):
    """The index-backed path returns exactly what exhaustive evaluation
    would: every registered query's matches survive, non-candidates
    contribute nothing."""
    m = Monitor()
    m.register("q_merge", TermQ("merge"))
    m.register("q_phrase", PhraseQ(("quick", "fox")))
    m.register("q_prefix", BoolQ(must=(PrefixQ("zz"),)))  # ANYTOKEN bucket
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "content": [
                    "a merge of streams",
                    "the quick fox jumps",
                    "zzyzx road",
                ],
            }
        )
    )
    got = {
        (r["doc_key"], r["query_id"])
        for r in m.match(docs, key_col="doc_id", text_col="content").collect()
    }
    assert got == {("1", "q_merge"), ("2", "q_phrase"), ("3", "q_prefix")}
