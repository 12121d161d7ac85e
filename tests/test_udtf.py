"""Python UDTF (table function) plumbing pin — the last UDF shape in
the engine's surface (scalar exprs are native; batch paths are
mapInPandas/applyInPandas; this is the lateral row-generator form).

Kept OUT of the benched registry on purpose: UDTFs are row-at-a-time
Python, the slow path — the right tool only when a lateral generator
is genuinely needed. The test pins the call contract (yielded rows,
schema string, lateral join usage) against a native-expression
equivalent."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceece563_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


def test_sentence_split_udtf_matches_native(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx: int, sentence: string")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, raw in enumerate(text.split(".")):
                s = raw.strip()
                if s:
                    yield i, s

    spark.udtf.register("sentence_split", SentenceSplit)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence
        FROM udtf_docs d, LATERAL sentence_split(d.text) s
        """
    )

    # native equivalent: posexplode over split + trim + filter
    native = (
        docs.select(
            "doc_id",
            F.posexplode(F.split("text", r"\.")).alias("sent_idx", "raw"),
        )
        .select("doc_id", "sent_idx", F.trim("raw").alias("sentence"))
        .filter(F.col("sentence") != "")
    )
    g = {tuple(r) for r in got.collect()}
    n = {tuple(r) for r in native.collect()}
    assert g == n and len(g) > 0
