"""mapreduceplusplus_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference MapReduce engine (Time0o/MapReducePlusPlus,
surveyed in SURVEY.md), re-expressed Spark-first:

- the MapReduce programming model itself (``mr.map_reduce``,
  mirroring the user contract of ``mr/word_count.h:16-38`` in the reference)
  on top of Arrow-batched DataFrame primitives;
- the full relational operator surface (scans, filters, aggregations,
  joins, windows, set ops, scalar functions) declared in SURVEY.md §2.B,
  implemented with the DataFrame/SQL API so Catalyst + Tungsten pick the
  physical strategy;
- Structured-Streaming window semantics (tumbling / sliding / session,
  watermarks), expressed so the same logic runs batch or streaming;
- LLM-data-pipeline operators (exact + MinHash/SimHash/Jaccard dedup,
  similarity search, text analysis, multimodal column plumbing) designed
  for 100 TB scale.

Everything here derives from the public Apache Spark API and the public
reference repo; nothing is copied from the reference's C++ sources.
"""

from mapreduceplusplus_spark.session import get_spark
from mapreduceplusplus_spark.sources.tables import TABLES, load_table

__all__ = ["get_spark", "load_table", "TABLES"]
__version__ = "0.1.0"
