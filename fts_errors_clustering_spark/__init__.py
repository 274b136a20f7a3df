"""PySpark-native analytics engine with the query and data-processing
capabilities of ``operationalintelligence/fts-errors-clustering``.

The reference (surveyed in ``SURVEY.md``) is a CERN Operational-Intelligence
pipeline that ingests FTS/Rucio transfer-error records, explores them
relationally, and clusters error messages with TF-IDF->LSA->KMeans and
word2vec->kNN/knee->DBSCAN. This package re-expresses every operator of that
surface Spark-first (DataFrame/SQL + pyspark.ml), plus the large-scale
training-data-pipeline extensions (dedup, similarity search, multimodal
columns, text analysis, streaming windows).

Layout:
    sources/    readers (parquet/json/text/REST-landed pages) with explicit schemas
    functions/  column-level helpers (exact-decimal aggregates, text masking,
                vector math, shared Spark/DuckDB hashing)
    operators/  the operator inventory from SURVEY.md section 2, each a
                ``(spark, sf_dir) -> DataFrame`` registered in plans.registry
    plans/      query registry driving __spark_entry__ and the oracle tests
    streaming/  Structured Streaming equivalents (windows, sessions, watermark)
"""

__version__ = "0.1.0"
