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


def add_version(
    model: Resource,
    patch_path: Path,
    model_dir: Path,
    defined_in: str | None = None,
) -> ChangeSet:
    """V5: first version (v=1) — versions block + file move
    (reference versioner.py:79-134). ``defined_in`` names the versioned
    file (reference: ``{defined_in}.{language}``) and is recorded in the
    version entry, exactly as dbt-core expects."""
    if model.version is not None:
        raise ValueError(f"{model.unique_id} is already versioned")
    suffix = ".py" if model.language == "python" else ".sql"
    entry: dict = {"v": 1}
    if defined_in:
        entry["defined_in"] = defined_in
    changes = ChangeSet()
    changes.add(
        Change(
            operation=Operation.Update,
            entity_type=EntityType.Model,
            identifier=model.name,
            path=patch_path,
            data={"latest_version": 1, "versions": [entry]},
        )
    )
    src = model_dir / Path(model.path).name
    target = (
        model_dir / f"{defined_in}{suffix}"
        if defined_in
        else model_dir / versioned_file_name(model, 1)
    )
    changes.add(
        Change(
            operation=Operation.Move,
            entity_type=EntityType.Code,
            identifier=model.name,
            path=target,
            source=src,
        )
    )
    return changes


def bump_version(
    model: Resource,
    patch_path: Path,
    model_dir: Path,
    behavior: BumpBehavior = BumpBehavior.Prerelease,
    existing_versions: list[int] | None = None,
    defined_in: str | None = None,
) -> ChangeSet:
    """V6: next version = max(existing)+1; latest_version by behavior
    (reference versioner.py:136-212, behavior map :168-174):
    Prerelease (the reference DEFAULT) keeps latest_version unchanged,
    Increment advances it by exactly 1 (not necessarily to the new
    version — a prerelease chain leaves latest behind max(v)), Latest
    pins it to the newly created version. ``defined_in`` names the new
    version's file and rides the version entry."""
    versions = sorted(existing_versions or ([model.version] if model.version else [1]))
    latest = model.latest_version or max(versions)
    new_version = max(versions) + 1
    new_latest = {
        BumpBehavior.Prerelease: latest,
        BumpBehavior.Increment: latest + 1,
        BumpBehavior.Latest: new_version,
    }[behavior]
    suffix = ".py" if model.language == "python" else ".sql"
    entries: list[dict] = [{"v": v} for v in versions]
    new_entry: dict = {"v": new_version}
    if defined_in:
        new_entry["defined_in"] = defined_in
    changes = ChangeSet()
    changes.add(
        Change(
            operation=Operation.Update,
            entity_type=EntityType.Model,
            identifier=model.name,
            path=patch_path,
            data={
                "latest_version": new_latest,
                "versions": entries + [new_entry],
            },
        )
    )
    latest_file = model_dir / versioned_file_name(model, max(versions))
    target = (
        model_dir / f"{defined_in}{suffix}"
        if defined_in
        else model_dir / versioned_file_name(model, new_version)
    )
    changes.add(
        Change(
            operation=Operation.Copy,
            entity_type=EntityType.Code,
            identifier=model.name,
            path=target,
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
