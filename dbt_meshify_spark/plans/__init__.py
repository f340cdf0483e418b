"""Metadata/governance plane (SURVEY.md §2.1–§2.2).

The reference's own compute: manifest of typed resources, DAG algorithms
(selection, boundary detection, closures), and deterministic source-to-source
rewrites executed as an ordered ChangeSet. Driver-side Python over plain
dataclasses, with DataFrame twins of the node/edge sets for graph queries at
scale (a manifest of 10M models is still just two skinny DataFrames).
"""

from dbt_meshify_spark.plans.manifest import Manifest, Resource
from dbt_meshify_spark.plans.changes import (
    Change,
    ChangeSet,
    ChangeSetProcessor,
    EntityType,
    Operation,
)

__all__ = [
    "Manifest",
    "Resource",
    "Change",
    "ChangeSet",
    "ChangeSetProcessor",
    "EntityType",
    "Operation",
]
