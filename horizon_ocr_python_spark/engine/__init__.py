"""Engine: pyspark.sql assembly of the extraction kernel.

One shuffle (the salted repartition), then a single fused Arrow
`mapInPandas` stage (SURVEY §3.4), then a relational tail. Everything else
is narrow.
"""
