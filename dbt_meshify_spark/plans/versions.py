"""Model versioning (V5–V7).

Reference behavior (versioner.py:79-212): adding a version to an unversioned
model writes a ``versions: [{v: 1}]`` block + ``latest_version`` and MOVES
the model file to ``name_v1.sql``; bumping computes max(v)+1 and COPIES the
latest file to ``name_v{n+1}.sql`` with latest_version per bump behavior
(versioner.py:168-174): Prerelease keeps latest at the old version,
Increment/Latest advances it.

Spark-native consequence: a versioned model materializes as ``name_v{n}``
relations; ``ref('m')`` resolves to the latest_version relation and
``ref('m', v=N)`` to the pinned one (V7, compile-time name mangling).
"""

from __future__ import annotations

from enum import Enum
from pathlib import Path

from dbt_meshify_spark.plans.changes import Change, ChangeSet, EntityType, Operation
from dbt_meshify_spark.plans.manifest import Resource


class BumpBehavior(str, Enum):
    Prerelease = "prerelease"
    Increment = "increment"
    Latest = "latest"


def versioned_file_name(model: Resource, version: int) -> str:
    suffix = ".py" if model.language == "python" else ".sql"
    return f"{model.name}_v{version}{suffix}"


def add_version(model: Resource, patch_path: Path, model_dir: Path) -> ChangeSet:
    """V5: first version (v=1) — versions block + file move
    (reference versioner.py:79-134)."""
    if model.version is not None:
        raise ValueError(f"{model.unique_id} is already versioned")
    changes = ChangeSet()
    changes.add(
        Change(
            operation=Operation.Update,
            entity_type=EntityType.Model,
            identifier=model.name,
            path=patch_path,
            data={"latest_version": 1, "versions": [{"v": 1}]},
        )
    )
    src = model_dir / Path(model.path).name
    changes.add(
        Change(
            operation=Operation.Move,
            entity_type=EntityType.Code,
            identifier=model.name,
            path=model_dir / versioned_file_name(model, 1),
            source=src,
        )
    )
    return changes


def bump_version(
    model: Resource,
    patch_path: Path,
    model_dir: Path,
    behavior: BumpBehavior = BumpBehavior.Increment,
    existing_versions: list[int] | None = None,
) -> ChangeSet:
    """V6: next version = max(existing)+1; latest_version by behavior
    (reference versioner.py:136-212, behavior map :168-174)."""
    versions = sorted(existing_versions or ([model.version] if model.version else [1]))
    latest = model.latest_version or max(versions)
    new_version = max(versions) + 1
    new_latest = latest if behavior == BumpBehavior.Prerelease else new_version
    changes = ChangeSet()
    changes.add(
        Change(
            operation=Operation.Update,
            entity_type=EntityType.Model,
            identifier=model.name,
            path=patch_path,
            data={
                "latest_version": new_latest,
                "versions": [{"v": v} for v in versions + [new_version]],
            },
        )
    )
    latest_file = model_dir / versioned_file_name(model, max(versions))
    changes.add(
        Change(
            operation=Operation.Copy,
            entity_type=EntityType.Code,
            identifier=model.name,
            path=model_dir / versioned_file_name(model, new_version),
            source=latest_file,
        )
    )
    return changes


def resolve_versioned_relation(name: str, version: int | None, latest: int | None) -> str:
    """V7: relation name for ``ref('m'[, v=N])`` under versioning."""
    if version is not None:
        return f"{name}_v{version}"
    if latest is not None:
        return f"{name}_v{latest}"
    return name
