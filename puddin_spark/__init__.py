"""puddin_spark — PySpark-native web-text quality-filter / scrub / langid engine.

A from-scratch Spark reimplementation of the capabilities of MatsRooth/puddin
(reference at /root/reference, cited by file:line throughout): per-document
keep/drop quality filtering, byte-identical text scrubbing, sentence
segmentation, lineage/metrics sidecars, and snapshot-based resume — expressed
as DataFrame transforms + vectorized pandas/Arrow UDFs over Common-Crawl-style
web-page tables, plus the large-scale training-data operators (dedup families,
similarity search, text analysis) such a pipeline needs at 100 TB scale.
"""

__version__ = "0.1.0"
