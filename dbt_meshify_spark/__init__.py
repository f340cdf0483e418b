"""dbt-meshify-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of dbt-labs/dbt-meshify (reference, read-only at
/root/reference), re-expressed Spark-first.

Two planes (see SURVEY.md §0):

1. Metadata/governance plane — manifest, DAG, selection, contracts, access,
   groups, versions, ChangeSet IR (``dbt_meshify_spark.plans``).
2. Data plane — the governed SQL/dataflow semantics executed by Spark
   (``dbt_meshify_spark.queries``, ``operators``, ``sources``, ``streaming``).

Everything here is built on the public PySpark DataFrame/SQL API; Catalyst and
AQE do the physical planning.
"""

__version__ = "0.1.0"
