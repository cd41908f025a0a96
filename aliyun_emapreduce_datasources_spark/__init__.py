"""PySpark-native analytics engine with the query and data-processing
capabilities of aliyun/aliyun-emapreduce-datasources.

The reference (read-only at /root/reference) is a collection of Spark
DataSource connectors for Aliyun services plus a streaming TPC-DS SQL
corpus.  This package re-expresses that capability surface Spark-first:

- ``session``     — tuned SparkSession factory (AQE, shuffle sizing).
- ``registry``    — table registry mapping logical names to parquet paths
                    (the "static dimension tables" of the corpus).
- ``operators``   — the relational operator surface exercised by the
                    34-query corpus (SURVEY.md §2.2), as DataFrame builders.
- ``streaming``   — TUMBLING/HOPPING windows, delay() watermarks, output
                    modes, exactly-once sinks (SURVEY.md §2.1 S5-S23).
- ``plans``       — the streaming-SQL dialect front-end (rewrites
                    TUMBLING/HOPPING/delay into standard Spark SQL).
- ``sources``     — connector-semantics emulation: KV catalog tables with
                    filter pushdown, log-record schema-on-read, CDC decode
                    and merge-apply, exactly-once sink commit logs.
- ``functions``   — UDF surface (ots_col_parser, CDC decode, LR scoring)
                    plus text analysis and vector math.
- ``dedup``       — exact / MinHash-LSH / SimHash / n-gram-Jaccard /
                    embedding-cosine deduplication at 100 TB design scale.
- ``similarity``  — brute-force and LSH-bucketed ANN top-k search.
- ``multimodal``  — binary media columns with typed metadata and
                    mapInPandas decode plumbing (decode stubbed).
"""

__version__ = "0.1.0"
