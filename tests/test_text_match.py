"""Golden tests for TEXT_MATCH from the reference's worked examples
(basics/indexing/text-search-support.md:321-539). The corpus and each
query's expected matching records are specified verbatim in the docs, so
these run as executable goldens."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.functions.text import (
    text_match,
    text_contains,
    tokens_expr,
    effective_stop_words,
    DEFAULT_STOP_WORDS,
)

# The 19-record SKILLS_COL resume corpus (text-search-support.md:321-343).
SKILLS = [
    "Java, C++, worked on open source projects, coursera machine learning",
    "Machine learning, Tensor flow, Java, Stanford university,",
    "Distributed systems, Java, C++, Go, distributed query engines for analytics and data warehouses, Machine learning, spark, Kubernetes, transaction processing",
    "Java, Python, C++, Machine learning, building and deploying large scale production systems, concurrency, multi-threading, CPU processing",
    "C++, Python, Tensor flow, database kernel, storage, indexing and transaction processing, building large scale systems, Machine learning",
    "Amazon EC2, AWS, hadoop, big data, spark, building high performance scalable systems, building and deploying large scale production systems, concurrency, multi-threading, Java, C++, CPU processing",
    "Distributed systems, database development, columnar query engine, database kernel, storage, indexing and transaction processing, building large scale systems",
    "Distributed systems, Java, realtime streaming systems, Machine learning, spark, Kubernetes, distributed storage, concurrency, multi-threading",
    "CUDA, GPU, Python, Machine learning, database kernel, storage, indexing and transaction processing, building large scale systems",
    "Distributed systems, Java, database engine, cluster management, docker image building and distribution",
    "Kubernetes, cluster management, operating systems, concurrency, multi-threading, apache airflow, Apache Spark,",
    "Apache spark, Java, C++, query processing, transaction processing, distributed storage, concurrency, multi-threading, apache airflow",
    "Big data stream processing, Apache Flink, Apache Beam, database kernel, distributed query engines for analytics and data warehouses",
    "CUDA, GPU processing, Tensor flow, Pandas, Python, Jupyter notebook, spark, Machine learning, building high performance scalable systems",
    "Distributed systems, Apache Kafka, publish-subscribe, building and deploying large scale production systems, concurrency, multi-threading, C++, CPU processing, Java",
    "Realtime stream processing, publish subscribe, columnar processing for data warehouses, concurrency, Java, multi-threading, C++,",
    "C++, Java, Python, realtime streaming systems, Machine learning, spark, Kubernetes, transaction processing, distributed storage, concurrency, multi-threading, apache airflow",
    "Databases, columnar query processing, Apache Arrow, distributed systems, Machine learning, cluster management, docker image building and distribution",
    "Database engine, OLAP systems, OLTP transaction processing at large scale, concurrency, multi-threading, GO, building large scale systems",
]


@pytest.fixture(scope="module")
def skills_df(spark):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(SKILLS)], ["id", "SKILLS_COL"]
    ).cache()


def matched_ids(df, expr, **kw):
    return sorted(r[0] for r in df.filter(text_match("SKILLS_COL", expr, **kw)).select("id").collect())


def ids_containing(substr):
    return sorted(i for i, s in enumerate(SKILLS) if substr.lower() in s.lower())


def test_example1_phrase_distributed_systems(skills_df):
    # text-search-support.md:346-377 — 6 expected records, and the in-order
    # rule: "Distributed data processing, systems design" must NOT match.
    got = matched_ids(skills_df, '"Distributed systems"')
    assert got == [2, 6, 7, 9, 14, 17]


def test_phrase_does_not_cross_match(spark):
    df = spark.createDataFrame(
        [(0, "Distributed data processing, systems design experience")], ["id", "SKILLS_COL"]
    )
    assert df.filter(text_match("SKILLS_COL", '"distributed systems"')).count() == 0


def test_example2_phrase_query_processing(skills_df):
    # text-search-support.md:385-396 — exactly the two 'query processing' rows
    got = matched_ids(skills_df, '"query processing"')
    assert got == [11, 17]


def test_example3_term_java_case_insensitive(skills_df):
    got = matched_ids(skills_df, "Java")
    assert got == ids_containing("java")


def test_example4_and_of_two_phrases(skills_df):
    # text-search-support.md:415-428: "Machine learning" AND "Tensor Flow"
    got = matched_ids(skills_df, '"Machine learning" AND "Tensor Flow"')
    assert got == [1, 4, 13]


def test_example5_phrase_and_terms(skills_df):
    # text-search-support.md:432-444: "Machine learning" AND gpu AND python
    got = matched_ids(skills_df, '"Machine learning" AND gpu AND python')
    assert got == [8, 13]


def test_example6_implicit_or(skills_df):
    # text-search-support.md:456-466: phrase OR java OR c++ (implicit OR)
    got = matched_ids(skills_df, '"distributed systems" Java C++')
    expect = sorted(
        set(matched_ids(skills_df, '"distributed systems"'))
        | set(matched_ids(skills_df, "java"))
        | set(matched_ids(skills_df, "c"))
    )
    assert got == expect
    assert 0 in got and 2 in got


def test_example7_grouping(skills_df):
    # text-search-support.md:470-480: '"distributed systems" AND (Java C++)'
    got = matched_ids(skills_df, '"distributed systems" AND (Java C++)')
    ds = set(matched_ids(skills_df, '"distributed systems"'))
    jc = set(matched_ids(skills_df, "Java C++"))
    assert got == sorted(ds & jc)


def test_example8_prefix(skills_df):
    # text-search-support.md:484-499: stream* → stream/streaming/streams
    got = matched_ids(skills_df, "stream*")
    assert got == [7, 12, 15, 16]


def test_regex_query(skills_df):
    # text-search-support.md:503-521: '/.*Exception/' style token regex
    got = matched_ids(skills_df, "/colum.*/")
    assert got == sorted(ids_containing("columnar"))


def test_stop_words_ignored(skills_df):
    # 'and' is a stop word: searching it alone matches everything
    # (index never contains it), and phrases skip over it.
    assert "and" in DEFAULT_STOP_WORDS
    got = matched_ids(skills_df, '"indexing and transaction processing"')
    assert got == sorted(ids_containing("indexing and transaction processing"))


def test_stop_word_overrides():
    # text-search-support.md:261-277: includes add, excludes remove, a word
    # in both lists ends up excluded.
    eff = effective_stop_words(include={"incl1", "it"}, exclude={"it"})
    assert "incl1" in eff and "it" not in eff and "the" in eff


def test_text_contains_prefix_postfix(skills_df):
    # native-text-index.md:33-55 — term, prefix "foo.*", postfix ".*bar"
    assert sorted(
        r[0] for r in skills_df.filter(text_contains("SKILLS_COL", "java")).select("id").collect()
    ) == ids_containing("java")
    pre = sorted(
        r[0] for r in skills_df.filter(text_contains("SKILLS_COL", "stream.*")).select("id").collect()
    )
    assert pre == [7, 12, 15, 16]
    post = sorted(
        r[0] for r in skills_df.filter(text_contains("SKILLS_COL", ".*ing")).select("id").collect()
    )
    assert all(any(t.endswith("ing") for t in SKILLS[i].lower().replace(",", " ").split()) for i in post)


def test_tokens_expr_drops_stopwords(spark):
    df = spark.createDataFrame([("The quick AND the dead, of course!",)], ["t"])
    toks = df.select(tokens_expr("t").alias("x")).collect()[0][0]
    assert toks == ["quick", "dead", "course"]


def test_stop_word_overrides(spark):
    """Per-column stop-word include/exclude (text-search-support.md:261-277):
    including 'spark' makes it unsearchable; excluding 'and' makes the
    default stop word searchable."""
    from pyspark.sql import Row
    from apache_pinot_spark.functions.text import text_match

    df = spark.createDataFrame([Row(t="spark and flink engines")])
    # default: 'spark' matches, 'and' is a stop word (always true/ignored)
    assert df.filter(text_match("t", "spark")).count() == 1
    # include 'spark' in stop words → term is dropped from the query
    # (pure stop-word query matches everything, like Lucene ignoring it)
    assert df.filter(text_match("t", "spark", include_stop_words={"spark"})).count() == 1
    # but a boolean with a real term shows 'spark' no longer constrains:
    df2 = spark.createDataFrame([Row(t="only flink here")])
    assert df2.filter(text_match("t", "spark AND flink",
                                 include_stop_words={"spark"})).count() == 1
    assert df2.filter(text_match("t", "spark AND flink")).count() == 0
    # exclude 'and' from stop words → it becomes a searchable token
    assert df.filter(text_match("t", '"and"', exclude_stop_words={"and"})).count() == 1
    assert df2.filter(text_match("t", '"and"', exclude_stop_words={"and"})).count() == 0


# --------------------------------------------------------------------------
# Phrase proximity: '"w1 w2"~N' (Lucene slop syntax, position-displacement
# semantics — in-order gaps at any slop, transpositions from slop 2 up)
# --------------------------------------------------------------------------


def test_phrase_slop_allows_bounded_gaps(spark):
    from pyspark.sql import Row
    from apache_pinot_spark.functions.text import text_match

    df = spark.createDataFrame(
        [
            Row(id=1, t="distributed query engine"),          # adjacent
            Row(id=2, t="distributed columnar query engine"), # 1 extra token
            Row(id=3, t="distributed very fast analytical query engine"),  # 3 extra
            Row(id=4, t="query engine that is distributed"),  # reversed
        ]
    )

    def ids(expr):
        return sorted(r["id"] for r in df.filter(text_match("t", expr)).collect())

    assert ids('"distributed query"') == [1]          # exact adjacency only
    assert ids('"distributed query"~0') == [1]        # ~0 == exact
    assert ids('"distributed query"~1') == [1, 2]
    # id4 analyzes to (query engine distributed): reversed at distance 2 =
    # displacement window 3, so it enters exactly at slop 3 (Lucene rule)
    assert ids('"distributed query"~2') == [1, 2]
    assert ids('"distributed query"~3') == [1, 2, 3, 4]
    assert ids('"distributed engine"~1') == [1]       # id1: 1 token between
    # id2: 2 tokens between; id4: (engine distributed) = adjacent swap,
    # cost exactly 2 under the Lucene displacement rule
    assert ids('"distributed engine"~2') == [1, 2, 4]


def test_phrase_slop_transposition_matches_from_two(spark):
    """Lucene's sloppy phrase admits the adjacent swap at slop >= 2
    (position edit distance 2) — the round-7 divergence, now closed."""
    from pyspark.sql import Row
    from apache_pinot_spark.functions.text import text_match

    df = spark.createDataFrame(
        [
            Row(id=1, t="beta alpha"),           # adjacent transposition
            Row(id=2, t="alpha beta"),           # in order
            Row(id=3, t="beta filler alpha"),    # reversed, 1 apart
        ]
    )

    def ids(expr):
        return sorted(r["id"] for r in df.filter(text_match("t", expr)).collect())

    assert ids('"alpha beta"~0') == [2]
    assert ids('"alpha beta"~1') == [2]          # swap costs 2, not 1
    assert ids('"alpha beta"~2') == [1, 2]       # the Lucene-pinned case
    # id3: alpha@2, beta@0 -> shifts 2 and -1 -> window 3
    assert ids('"alpha beta"~3') == [1, 2, 3]


def test_phrase_slop_repeated_terms_need_distinct_positions(spark):
    """'"alpha alpha"~N' must bind two DIFFERENT alpha positions — one
    occurrence cannot satisfy both terms."""
    from pyspark.sql import Row
    from apache_pinot_spark.functions.text import text_match

    df = spark.createDataFrame(
        [
            Row(id=1, t="alpha beta gamma"),           # single alpha
            Row(id=2, t="alpha beta alpha"),           # two alphas, 2 apart
        ]
    )

    def ids(expr):
        return sorted(r["id"] for r in df.filter(text_match("t", expr)).collect())

    assert ids('"alpha alpha"~5') == [2]
    assert ids('"alpha alpha"~1') == [2]  # positions 0,2: window 1 after -1 shift


def test_phrase_slop_sql_twin_matches_column_form(spark):
    """text_match_sql compiles the same displacement semantics (round 8:
    the SQL emitter previously dropped the slop silently)."""
    from pyspark.sql import Row
    from apache_pinot_spark.functions.text import text_match, text_match_sql
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            Row(id=1, t="beta alpha"),
            Row(id=2, t="alpha beta"),
            Row(id=3, t="alpha filler beta"),
            Row(id=4, t="gamma delta"),
        ]
    )
    df.createOrReplaceTempView("slop_twin")
    for expr in ('"alpha beta"~1', '"alpha beta"~2', '"alpha beta"~3'):
        col_ids = sorted(r.id for r in df.filter(text_match("t", expr)).collect())
        sql_ids = sorted(
            r.id
            for r in df.sparkSession.sql(
                f"SELECT id FROM slop_twin WHERE {text_match_sql('t', expr)}"
            ).collect()
        )
        assert col_ids == sql_ids, expr


def test_phrase_slop_three_terms_and_stopwords(spark):
    from pyspark.sql import Row
    from apache_pinot_spark.functions.text import text_match

    df = spark.createDataFrame(
        [
            Row(id=1, t="load the data into new tables quickly"),
            Row(id=2, t="load data tables"),
            Row(id=3, t="tables data load"),
        ]
    )
    # stop words ('the', 'into') vanish from the token stream first, so
    # analyzed tokens for id=1 are: load data new tables quickly
    def ids(expr):
        return sorted(r["id"] for r in df.filter(text_match("t", expr)).collect())

    assert ids('"load data tables"') == [2]
    assert ids('"load data tables"~1') == [1, 2]   # id1: one extra token 'new'
    # id3 is the full reversal (tables data load): shifts +2, 0, -2 ->
    # displacement window 4 -> matches from slop 4 (Lucene rule), not below
    assert ids('"load data tables"~3') == [1, 2]
    assert ids('"load data tables"~4') == [1, 2, 3]
    assert ids('"load data tables"~9') == [1, 2, 3]


def test_phrase_slop_multiple_anchor_occurrences(spark):
    """A stale first-term occurrence must not mask a later valid chain."""
    from pyspark.sql import Row
    from apache_pinot_spark.functions.text import text_match

    df = spark.createDataFrame(
        [Row(t="alpha zz zz zz zz zz alpha beta")]  # first alpha too far from beta
    )
    assert df.filter(text_match("t", '"alpha beta"~1')).count() == 1


def test_phrase_slop_parses_inside_booleans(spark):
    from pyspark.sql import Row
    from apache_pinot_spark.functions.text import parse_text_expression, text_match

    ast = parse_text_expression('"a b"~2 AND other')
    assert ast.kind == "and" and ast.children[0].slop == 2
    df = spark.createDataFrame([Row(t="a x b plus other stuff")])
    assert df.filter(text_match("t", '"a b"~2 AND other')).count() == 1
    assert df.filter(text_match("t", '"a b"~2 AND missing')).count() == 0
