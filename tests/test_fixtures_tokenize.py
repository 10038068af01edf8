import numpy as np
import pytest

from quicker_spark.fixtures import corpus_df, corpus_pdf, generate_batch
from quicker_spark.functions.tokenize import tokenize_col, tokenize_py, tokenize_udf


def test_corpus_deterministic_and_batch_independent():
    a = corpus_pdf(50)
    b = corpus_pdf(50)
    assert a.equals(b)
    # value of row i must not depend on batch boundaries
    lo = generate_batch(np.arange(0, 25))
    hi = generate_batch(np.arange(25, 50))
    import pandas as pd

    c = pd.concat([lo, hi], ignore_index=True)
    assert a.equals(c)


def test_corpus_schema_and_shape():
    pdf = corpus_pdf(30)
    assert list(pdf.columns) == ["repo", "path", "commit", "lang", "content"]
    assert pdf["commit"].str.len().eq(40).all()
    assert pdf["lang"].isin(["python", "go", "java", "js", "rust", "c"]).all()
    # uniqueness of doc identity
    assert not pdf.duplicated(["repo", "path", "commit"]).any()
    # unique singleton token present
    assert pdf["content"].iloc[7].endswith("uniq_7")


def test_hot_tokens_are_skewed():
    pdf = corpus_pdf(300)
    hot = pdf["content"].str.contains(r"\bdef\b").mean()
    assert hot > 0.3  # FIXTURES.md: hot tokens in >30% of docs


@pytest.mark.usefixtures("spark")
def test_corpus_df_matches_pdf_regardless_of_partitioning(spark):
    pdf = corpus_pdf(80)
    for parts in (1, 7):
        got = (
            corpus_df(spark, 80, partitions=parts)
            .orderBy("repo", "path", "commit")
            .toPandas()
        )
        want = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
        assert got.equals(want)


def test_tokenize_py_spec():
    assert tokenize_py("Def foo(x_1, y):  return x_1+y") == [
        "def", "foo", "x_1", "y", "return", "x_1", "y",
    ]
    assert tokenize_py("") == []
    assert tokenize_py(None) == []


@pytest.mark.usefixtures("spark")
def test_tokenizers_agree(spark):
    from pyspark.sql import functions as F

    df = corpus_df(spark, 40, partitions=2).select("content")
    both = df.select(
        tokenize_col(F.col("content")).alias("a"),
        tokenize_udf(F.col("content")).alias("b"),
    )
    mismatch = both.filter(F.col("a") != F.col("b")).count()
    assert mismatch == 0
    # and agree with the python tokenizer
    rows = both.select("a").limit(5).collect()
    texts = df.limit(5).collect()
    for r, t in zip(rows, texts):
        assert r["a"] == tokenize_py(t["content"])


def test_tf_modes_agree_on_edge_corpus(spark, tmp_path):
    """arrow_pairs and pure-Catalyst explode tf modes build identical
    postings, including empty / whitespace / unicode / null-ish content."""
    import shutil

    from quicker_spark.engine import SearchEngine
    from quicker_spark.operators.build import IndexConfig, build_index

    rows = [
        ("r1", "a.py", "c1", "python", "def foo(): return 1"),
        ("r2", "b.py", "c2", "go", ""),
        ("r3", "c.py", "c3", "java", "   \t  "),
        ("r4", "d.py", "c4", "js", "héllo wörld déf naïve"),
        ("r5", "e.py", "c5", "rust", "DEF Def def dEf"),
        ("r6", "f.py", "c6", "c", "x1_y2 x1_y2 x1_y2 z"),
        # NULL-bearing rows: a NULL in one indexed field must not drop the
        # doc's other terms, and a NULL/empty lang must emit no lang term
        ("r7", "g.py", "c7", None, "null lang still indexed"),
        ("r8", "h.py", "c8", "", "empty lang still indexed"),
        ("r9", "i.py", "c9", "python", None),
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string")

    def postings_of(mode):
        out = str(tmp_path / f"idx_{mode}")
        shutil.rmtree(out, ignore_errors=True)
        build_index(spark, corpus, out,
                    IndexConfig(seg_docs=10, tf_mode=mode, n_salts=2),
                    resume=False)
        eng = SearchEngine(spark, out)
        rows_ = eng.postings.select("segment_id", "term", "df", "ids", "tfs",
                                    "dls", "bits").collect()
        return sorted((r["segment_id"], r["term"], r["df"], bytes(r["ids"]),
                       bytes(r["tfs"]), bytes(r["dls"]), bytes(r["bits"]))
                      for r in rows_)

    p_arrow = postings_of("arrow_pairs")
    terms = {t for (_s, t, *_rest) in p_arrow}
    # NULL lang didn't kill the doc's content terms, and no empty lang term
    assert "content\x01indexed" in terms
    assert "lang\x01" not in terms
    # NULL content doc still indexes its repo/path fields
    assert "repo\x01r9" in terms
    assert p_arrow == postings_of("explode")
