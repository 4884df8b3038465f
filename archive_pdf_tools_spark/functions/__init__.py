"""Column-level function libraries for large-scale training-data
pipelines: text stats, deduplication, similarity search, multimodal
plumbing.  All engine-side (pyspark.sql.functions / SQL expressions);
Python appears only in clearly-marked Pandas-UDF paths."""
