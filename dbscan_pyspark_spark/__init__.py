"""dbscan_pyspark_spark — a PySpark-native density-clustering & analytics engine.

Brand-new DataFrame/MLlib implementation of the capabilities of
``vlee-harmonicinc/DBSCAN-pyspark`` (surveyed in SURVEY.md), plus
LLM-data-pipeline extension operators (dedup, similarity search, text
analysis, multimodal columns), designed for 100 TB scale:

- grid-bucketed ε-distance joins instead of cartesian products
  (reference: ``DBSCAN.py:161`` crashed at 10^4 rows; we bucket on
  ``floor(coord/eps)`` cells and equi-join)
- pure-DataFrame connected components (alternating large/small-star)
  so no GraphFrames jar is required
- every operator is a declarative DataFrame composition Catalyst/AQE
  can optimize — no RDDs, no row-at-a-time Python UDFs in hot paths
"""

__version__ = "0.1.0"

from dbscan_pyspark_spark.session import get_session  # noqa: F401
