"""Central query registry: name -> (spark callable, DuckDB oracle SQL).

``__spark_entry__.py`` re-exports this. Every operator claimed as
done in SURVEY.md §2 has an entry here; the driver cross-checks each
Spark result against the oracle SQL on the same parquet tables at
sf=0.01 (row count + schema + order-insensitive value hash).

Column-name contract: Spark results and oracle SQL alias every
computed column to the same name (the driver sorts columns by name
before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession

from .operators import wordcount as wc

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> (query_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    _REGISTRY[name] = (fn, oracle)


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None
    }


# --- reference-parity surface (SURVEY.md §2) -------------------------
register("wordcount", wc.wordcount, wc.WORDCOUNT_SQL)
register("wordcount_by_lang", wc.wordcount_by_lang, wc.WORDCOUNT_BY_LANG_SQL)
register("distinct_vocab", wc.distinct_vocab, wc.DISTINCT_VOCAB_SQL)
register("topk_words", wc.topk_words, wc.TOPK_WORDS_SQL)
