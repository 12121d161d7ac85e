"""mapreduceece563_spark — a PySpark-native analytics engine.

Re-expresses the query surface of the reference MapReduce engine
(rkhamkar1977/MapReduceECE563, a C/MPI/OpenMP word-count engine) as
idiomatic Spark DataFrame plans, and extends it with the operators a
large-scale LLM-training-data pipeline needs: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard), similarity search over
embeddings, text analysis (language-ID, quality scoring, token
statistics, fingerprinting), and multimodal-column plumbing.

Design stance (SURVEY.md §7): declare logical plans with the
DataFrame/SQL API and let Catalyst/Tungsten pick physical strategy;
native `pyspark.sql.functions` expressions in every hot path (no
row-at-a-time Python UDFs); Arrow-batched `mapInPandas` only where
built-ins genuinely can't express the semantics (multimodal decode).
"""

__version__ = "0.1.0"
