"""input_hint page table: byte-identical extraction invariant."""

from __future__ import annotations

from tests.conftest import SF_DIR

from rgr_pdal_topo_spark.operators import pages


def test_extract_is_byte_identical(spark):
    p = pages.extract_text(pages.pages_df(spark, SF_DIR))
    n = p.count()
    assert n > 0
    bad = p.filter("extracted IS NULL OR extracted <> text").count()
    assert bad == 0
    # urls unique per row (the invariant's key)
    assert p.select("url").distinct().count() == n


def test_extract_handles_markup_and_newlines(spark):
    import tempfile

    import pandas as pd

    d = tempfile.mkdtemp()
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["plain words", "embedded </p> closer",
                     "multi\nline\ntext", "entities &lt; already & here"],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [1] * 4,
        }
    )
    spark.createDataFrame(df).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    out = pages.extract_text(pages.pages_df(spark, d))
    assert out.filter("extracted IS NULL OR extracted <> text").count() == 0


def test_extract_deterministic_across_runs(spark):
    a = pages.extract_text(pages.pages_df(spark, SF_DIR))
    b = pages.extract_text(pages.pages_df(spark, SF_DIR))
    ja = a.selectExpr("url", "extracted AS e1")
    jb = b.selectExpr("url AS url2", "extracted AS e2")
    j = ja.join(jb, ja.url == jb.url2)
    assert j.filter("e1 <> e2").count() == 0
