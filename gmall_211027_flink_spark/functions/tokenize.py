"""Keyword tokenizer (SURVEY §2.10 F1).

The reference registers an IK-analyzer UDTF and applies it with LATERAL
TABLE (app/func/SplitFunction.java:12-28, utils/KeywordUtil.java:13-34).
Two Spark forms:

- **fast path** (default): pure JVM `split` + `explode` — used by the
  registered queries (ads_keyword_split / ads_keyword_score). Zero
  Python in the hot path.
- **UDF path** (`register_tokenizer`): a Python UDF returning
  ``array<string>`` for tokenizations `split` can't express (CJK
  segmentation, mixed-script). Registered via ``spark.udf.register`` so
  SQL can ``LATERAL VIEW explode(tokenize(col))`` exactly like the
  reference's UDTF call. This is the documented slow path — row-at-a-time
  Python — so keep it off 100 TB hot paths; a real deployment would swap
  the body for jieba/ICU while keeping the registration contract.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql import types as T

# latin runs, digit runs, or single CJK chars (IK-like behavior for the
# no-dictionary case: CJK falls back to unigrams)
_TOKEN_RE = re.compile(r"[a-z0-9]+|[一-鿿]", re.IGNORECASE)


def tokenize(text: str | None) -> list[str]:
    if not text:
        return []
    return [t.lower() for t in _TOKEN_RE.findall(text)]


def register_tokenizer(spark: SparkSession, name: str = "tokenize") -> None:
    spark.udf.register(name, tokenize, T.ArrayType(T.StringType()))
