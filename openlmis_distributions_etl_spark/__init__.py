"""PySpark-native analytics/ETL engine with the capabilities of the
openlmis-distributions-etl reference, rebuilt Spark-first.

Reference parity note: the read-only reference checkout at
/root/reference was empty in this environment; capability surface is
defined by SURVEY.md §2 (authored from the driver's north-star spec).
"""

__version__ = "0.1.0"
