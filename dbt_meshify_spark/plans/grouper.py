"""Group creation + access generation (V2–V4).

Reference behavior: grouper.py:41-55 classifies members via boundary
analysis (our plans.graph G4–G6); grouper.py:63-112 builds the group node
and per-model access patches, rejecting members already owned by another
group; main.py:556-687 composes group creation with optional contracting.
"""

from __future__ import annotations

from pathlib import Path

from dbt_meshify_spark.plans.changes import Change, ChangeSet, EntityType, Operation
from dbt_meshify_spark.plans.graph import classify_access, drop_test_nodes
from dbt_meshify_spark.plans.manifest import Manifest


class GroupingError(Exception):
    pass


def generate_access(
    model_name: str, access: str, patch_path: Path, group: str | None = None
) -> Change:
    """V2: access (+ optional group) patch for one model
    (reference grouper.py:114-131)."""
    data: dict = {"access": access}
    if group:
        data["group"] = group
    return Change(
        operation=Operation.Update,
        entity_type=EntityType.Model,
        identifier=model_name,
        path=patch_path,
        data=data,
    )


def create_group(
    manifest: Manifest,
    group_name: str,
    owner: dict,
    selected: set[str],
    group_yml_path: Path,
    patch_path_for: "callable",
) -> ChangeSet:
    """V3: group YAML + member access patches (reference grouper.py:63-112,
    133-167).

    Rejects members already claimed by a different group. Members classified
    'protected' keep/raise visibility; interior members become 'private'.
    """
    members = drop_test_nodes(manifest, selected)
    for uid in sorted(members):
        r = manifest.get(uid)
        if r and r.group and r.group != group_name:
            raise GroupingError(
                f"{uid} already belongs to group {r.group!r}; "
                f"cannot add to {group_name!r}"
            )
    changes = ChangeSet()
    changes.add(
        Change(
            operation=Operation.Add,
            entity_type=EntityType.Group,
            identifier=group_name,
            path=group_yml_path,
            data={"owner": owner},
        )
    )
    access_map = classify_access(manifest, members)
    for uid in sorted(access_map):
        r = manifest.get(uid)
        if not r or r.resource_type != "model":
            continue
        changes.add(
            generate_access(
                r.name,
                "protected" if access_map[uid] == "protected" else "private",
                patch_path_for(r),
                group=group_name,
            )
        )
    return changes


def group_and_contract(
    manifest: Manifest,
    group_name: str,
    owner: dict,
    selected: set[str],
    group_yml_path: Path,
    patch_path_for: "callable",
    contract_for: "callable",
) -> ChangeSet:
    """V4: create-group + add-contract on every non-private boundary member
    (reference main.py:632-687)."""
    changes = create_group(
        manifest, group_name, owner, selected, group_yml_path, patch_path_for
    )
    access_map = classify_access(manifest, drop_test_nodes(manifest, selected))
    for uid, access in sorted(access_map.items()):
        r = manifest.get(uid)
        if access == "protected" and r and r.resource_type == "model":
            contract_change = contract_for(r)
            if contract_change is not None:
                changes.add(contract_change)
    return changes
