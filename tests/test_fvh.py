"""FastVectorHighlighter analog (search/fvh.py) — unit checks of the
phrase-walk / frag-list / fragment-render machinery against hand-traced
reference behavior (vectorhighlight/FieldPhraseList.java,
BaseFragListBuilder.java, BaseFragmentsBuilder.java), plus an
end-to-end Spark pass over a term-vectored index.
"""

import pandas as pd
import pytest

from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.search import BoolQ, PhraseQ, Searcher, TermQ
from lucene_spark.search.fvh import (
    COLORED_PRE_TAGS,
    FieldQuery,
    TermInfo,
    _term_stack,
    create_frag_list,
    field_phrase_list,
    fvh_highlight,
    make_fragment,
)


def _groups(*occ):
    """occ: (text, start, end, position) -> position groups."""
    rows = {}
    for text, s, e, p in occ:
        rows.setdefault(text, []).append((p, s, e - s))
    tv = [
        (t, [p for p, _, _ in v], [s for _, s, _ in v], [ln for _, _, ln in v])
        for t, v in rows.items()
    ]
    terms = set(rows)
    return _term_stack(tv, terms, {t: 1.0 for t in terms})


# ---------------------------------------------------------------------------
# FieldQuery flatten / expand
# ---------------------------------------------------------------------------


def test_flatten_bool_and_dedup():
    fq = FieldQuery(
        BoolQ(must=(TermQ("a"),), should=(TermQ("a"), TermQ("b")),
              must_not=(TermQ("c"),))
    )
    # prohibited clause contributes nothing; duplicates collapse
    assert fq.term_set_for(None) == {"a", "b"}
    root = fq.root_for(None)
    assert root.sub["a"].terminal and root.sub["b"].terminal
    assert "c" not in root.sub


def test_expand_overlapping_phrases():
    # FieldQuery.expand: "a b" + "b c" -> adds "a b c"
    # (FieldQuery.java checkOverlap ex3)
    fq = FieldQuery(
        BoolQ(should=(PhraseQ(("a", "b")), PhraseQ(("b", "c"))))
    )
    root = fq.root_for(None)
    node = root.sub["a"].sub["b"]
    assert node.terminal  # "a b"
    assert node.sub["c"].terminal  # joined "a b c"


def test_phrase_one_term_becomes_term():
    fq = FieldQuery(PhraseQ(("solo",)))
    assert fq.root_for(None).sub["solo"].terminal


# ---------------------------------------------------------------------------
# FieldPhraseList
# ---------------------------------------------------------------------------


def test_single_term_matches_every_occurrence():
    fq = FieldQuery(TermQ("a"))
    groups = _groups(("a", 0, 1, 0), ("a", 8, 9, 4))
    phrases = field_phrase_list(groups, fq.root_for(None))
    assert [(p.start, p.end) for p in phrases] == [(0, 1), (8, 9)]


def test_exact_phrase_merges_adjacent_offsets():
    fq = FieldQuery(PhraseQ(("b", "c")))
    # doc: "a b c d" — b at pos1 (2,3), c at pos2 (4,5)
    groups = _groups(("b", 2, 3, 1), ("c", 4, 5, 2))
    phrases = field_phrase_list(groups, fq.root_for(None))
    assert len(phrases) == 1
    assert phrases[0].toffs == [(2, 5)]  # one merged span


def test_phrase_slop_gap():
    # "a c" slop=1 over "a b c": positions 0 and 2, |2-0-1|=1 <= slop
    fq = FieldQuery(PhraseQ(("a", "c"), slop=1))
    groups = _groups(("a", 0, 1, 0), ("c", 4, 5, 2))
    phrases = field_phrase_list(groups, fq.root_for(None))
    assert len(phrases) == 1
    # non-adjacent positions -> two separate offset spans
    assert phrases[0].toffs == [(0, 1), (4, 5)]
    # slop=0 must NOT match
    fq0 = FieldQuery(PhraseQ(("a", "c"), slop=0))
    assert field_phrase_list(groups, fq0.root_for(None)) == []


def test_backtrack_to_shorter_phrase():
    # query has "a b" and the stack runs a, b, x: longest walk fails at
    # x, backtrack keeps "a b" (FieldPhraseList.java:96-106)
    fq = FieldQuery(BoolQ(should=(PhraseQ(("a", "b")), TermQ("x"))))
    groups = _groups(("a", 0, 1, 0), ("b", 2, 3, 1), ("x", 4, 5, 2))
    phrases = field_phrase_list(groups, fq.root_for(None))
    assert [(p.start, p.end) for p in phrases] == [(0, 3), (4, 5)]


# ---------------------------------------------------------------------------
# FragList + fragment render
# ---------------------------------------------------------------------------


def _ti(text, s, e, p, w=1.0):
    return TermInfo(text, s, e, p, w)


def test_frag_windows_are_disjoint_and_centered():
    fq = FieldQuery(TermQ("a"))
    groups = _groups(("a", 50, 51, 10), ("a", 300, 301, 60))
    phrases = field_phrase_list(groups, fq.root_for(None))
    frags = create_frag_list(phrases, frag_char_size=30, weighted=False)
    assert len(frags) == 2
    f0, f1 = frags
    assert f0.end <= f1.start  # windows never overlap
    assert f0.end - f0.start == 30
    # centered: match at 50, newMargin = (30-1)//2 = 14 -> start 36
    assert f0.start == 36
    assert f0.total_boost == 1.0


def test_weighted_frag_scoring_prefers_more_distinct_terms():
    fq = FieldQuery(BoolQ(should=(TermQ("a"), TermQ("b"))))
    # frag 1: a only; frag 2: a and b (idf weights equal)
    groups = _groups(
        ("a", 10, 11, 2), ("a", 500, 501, 80), ("b", 505, 506, 81)
    )
    phrases = field_phrase_list(groups, fq.root_for(None))
    frags = create_frag_list(phrases, frag_char_size=40, weighted=True)
    assert len(frags) == 2
    assert frags[1].total_boost > frags[0].total_boost


def test_make_fragment_tags_and_boundary_snap():
    text = "xxxx. the quick brown fox jumps over the lazy dog. yyyy"
    # match "brown" at (16, 21)
    from lucene_spark.search.fvh import FragInfo, SubInfo

    frag = FragInfo(10, 45, [SubInfo([(16, 21)], 0, 1.0)], 1.0)
    out = make_fragment(text, frag, ("<b>",), ("</b>",))
    assert "<b>brown</b>" in out
    # boundary scanner snapped the start to just after ". " or a space
    assert not out.startswith("uick")


def test_colored_tags_cycle_by_seqnum():
    fq = FieldQuery(BoolQ(should=(TermQ("a"), TermQ("b"))))
    root = fq.root_for(None)
    assert root.sub["a"].seqnum != root.sub["b"].seqnum
    text = "a b"
    groups = _groups(("a", 0, 1, 0), ("b", 2, 3, 1))
    phrases = field_phrase_list(groups, root)
    frags = create_frag_list(phrases, frag_char_size=18, weighted=False)
    out = make_fragment(
        text, frags[0], COLORED_PRE_TAGS, ("</b>",)
    )
    assert COLORED_PRE_TAGS[0] in out and COLORED_PRE_TAGS[1] in out


# ---------------------------------------------------------------------------
# End-to-end over a term-vectored index
# ---------------------------------------------------------------------------

N_DOCS = 100


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = make_corpus(N_DOCS, seed=31)
    idx_dir = str(tmp_path_factory.mktemp("idx_fvh"))
    build_index(
        spark,
        spark.createDataFrame(pdf),
        idx_dir,
        text_col="content",
        order_cols=["repo", "path", "commit"],
        keep_cols=["lang"],
        num_buckets=4,
        salt_rows=64,
        with_offsets=True,
        with_term_vectors=True,
    )
    return Index(spark, idx_dir), pdf


def _common_term(index):
    return index.high_freq_terms(1).collect()[0]["term"]


def test_fvh_end_to_end_term(built, spark):
    index, _ = built
    s = Searcher(index)
    term = _common_term(index)
    q = TermQ(term)
    hits = s.top_k(q, k=5)
    assert hits.count() > 0
    frags = fvh_highlight(index, hits, q, max_num_fragments=2).collect()
    assert frags, "expected fragments for matching docs"
    by_doc = {}
    for r in frags:
        by_doc.setdefault(r["doc_id"], []).append(r)
        assert f"<b>{term}</b>" in r["fragment"].lower()
    for rows in by_doc.values():
        assert len(rows) <= 2
        # score_order: fragment 0 has the max score
        scores = [r["score"] for r in sorted(rows, key=lambda r: r["frag_num"])]
        assert scores == sorted(scores, reverse=True)


def test_fvh_phrase_single_span(built, spark):
    index, pdf = built
    s = Searcher(index)
    # find a phrase that actually occurs: take two adjacent tokens from
    # a doc's text
    import re

    toks = re.findall(r"[0-9a-z_]+", pdf["content"].iloc[0].lower())
    w1, w2 = toks[3], toks[4]
    q = PhraseQ((w1, w2))
    hits = s.top_k(q, k=3)
    if hits.count() == 0:
        pytest.skip("phrase absent after analysis")
    frags = fvh_highlight(index, hits, q, max_num_fragments=1).collect()
    assert frags
    assert any(
        f"<b>{w1} {w2}</b>" in r["fragment"].lower() for r in frags
    ), [r["fragment"] for r in frags]


def test_fvh_no_match_no_rows(built, spark):
    index, _ = built
    s = Searcher(index)
    hits = s.top_k(TermQ(_common_term(index)), k=3)
    # query whose terms exist nowhere: no fragments at all
    out = fvh_highlight(index, hits, TermQ("zzzzqqqq")).collect()
    assert out == []
