"""Custom chunktext Python Data Source: partition planning, filter
pushdown as partition pruning, and line fidelity. The value-level
correctness of both registry faces is pinned by test_registry_oracle;
these tests assert the READER-level contracts the oracle can't see."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, In

from mapreduceece563_spark.sources.chunktext import (
    N_CHUNKS,
    PRUNED_CHUNK,
    ChunkTextReader,
    chunked_corpus_dir,
    register_chunktext,
)
from tests.conftest import SF_DIR


def test_one_partition_per_chunk_file():
    src = chunked_corpus_dir(SF_DIR)
    reader = ChunkTextReader({"path": src})
    parts = reader.partitions()
    assert len(parts) == N_CHUNKS
    assert sorted(p.chunk_id for p in parts) == list(range(N_CHUNKS))


def test_pushdown_prunes_partitions():
    src = chunked_corpus_dir(SF_DIR)
    reader = ChunkTextReader({"path": src})
    remaining = reader.pushFilters([EqualTo(("chunk_id",), PRUNED_CHUNK)])
    assert list(remaining) == []  # fully absorbed
    parts = reader.partitions()
    assert [p.chunk_id for p in parts] == [PRUNED_CHUNK]


def test_pushdown_in_filter_and_foreign_filter_kept():
    src = chunked_corpus_dir(SF_DIR)
    reader = ChunkTextReader({"path": src})
    foreign = EqualTo(("text",), "x")
    remaining = reader.pushFilters(
        [In(("chunk_id",), (1, 5)), foreign]
    )
    assert list(remaining) == [foreign]  # text filter stays with Spark
    assert sorted(p.chunk_id for p in reader.partitions()) == [1, 5]


def test_reader_round_trips_every_line(spark):
    register_chunktext(spark)
    src = chunked_corpus_dir(SF_DIR)
    df = spark.read.format("chunktext").option("path", src).load()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert df.count() == n_docs
    # chunk assignment is doc_id % N_CHUNKS with in-chunk doc_id order,
    # so per-chunk line counts must match the modular census
    got = {
        r["chunk_id"]: r["n"]
        for r in df.groupBy("chunk_id").agg(F.count("*").alias("n")).collect()
    }
    exp = {
        r["c"]: r["n"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select((F.col("doc_id") % N_CHUNKS).cast("int").alias("c"))
        .groupBy("c")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exp


def test_writer_commit_protocol_leaves_no_temps(spark, tmp_path):
    """The custom write path must commit atomically: final chunk_*.txt
    files only, no .tmp_* residue, and a re-write (overwrite mode)
    replaces the previous generation completely."""
    import os

    register_chunktext(spark)
    out = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [("alpha", 2), ("beta", 3), ("gamma", 1)], "word STRING, cnt LONG"
    ).repartition(2)
    for _ in range(2):  # second pass exercises overwrite cleanup
        df.write.format("chunktext").option("path", out).mode(
            "overwrite"
        ).save()
    names = sorted(os.listdir(out))
    assert all(n.startswith("chunk_") and n.endswith(".txt") for n in names)
    back = spark.read.format("chunktext").option("path", out).load()
    got = sorted(r["text"] for r in back.collect())
    assert got == ["alpha 2", "beta 3", "gamma 1"]
