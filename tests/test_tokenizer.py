"""F1 tokenizer UDF: registration + LATERAL VIEW usage (the reference's
SplitFunction/LATERAL TABLE form)."""

from __future__ import annotations

from gmall_211027_flink_spark.functions.tokenize import register_tokenizer, tokenize


def test_tokenize_python():
    assert tokenize("Hello, World 42!") == ["hello", "world", "42"]
    assert tokenize("小米手机 iPhone13") == ["小", "米", "手", "机", "iphone13"]
    assert tokenize(None) == []
    assert tokenize("") == []


def test_lateral_view_explode_udf(spark):
    register_tokenizer(spark)
    spark.createDataFrame(
        [(1, "Apple iPhone 13"), (2, "apple watch")], ["id", "keyword"],
    ).createOrReplaceTempView("kw")
    got = spark.sql("""
        SELECT word, COUNT(*) AS ct
        FROM kw LATERAL VIEW explode(tokenize(keyword)) t AS word
        GROUP BY word ORDER BY ct DESC, word
    """).collect()
    counts = {r["word"]: r["ct"] for r in got}
    assert counts == {"apple": 2, "iphone": 1, "13": 1, "watch": 1}
