"""pyspark-transcript-tiers: a PySpark-native time-series rollup / downsample /
retention engine over transcript tables.

Reference semantics: admahood/modeling-human-ignition (daily-to-monthly
climate-stack aggregation: unpack -> aggregate mean/min/max -> mask/clip ->
save, with file-exists resume), re-expressed Spark-first per SURVEY.md.
The reference snapshot is empty in this sandbox (SURVEY.md §0); semantics are
bound by BASELINE.json:6/14/15.
"""

__version__ = "0.1.0"
