"""Property-based tests (hypothesis) — a verification layer the reference
lacks entirely (SURVEY.md §5.1 'Absent'): randomized round-trip, algebraic,
and invariant checks over the governance primitives and selector grammar.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_meshify_spark.plans import graph as G
from dbt_meshify_spark.plans.changes import (
    dict_to_named_list,
    named_list_to_dict,
    safe_update,
)
from dbt_meshify_spark.plans.manifest import Manifest, Resource

_name = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)
_scalar = st.one_of(st.integers(), st.booleans(), _name)


# -- NamedList round-trip (C2) ------------------------------------------------


@given(
    st.lists(
        st.fixed_dictionaries(
            {"name": _name},
            optional={"description": _name, "priority": st.integers()},
        ),
        max_size=8,
        unique_by=lambda d: d["name"],
    )
)
def test_named_list_round_trip(entries):
    assert dict_to_named_list(named_list_to_dict(entries)) == entries


# -- safe_update algebra (C2) -------------------------------------------------


_doc = st.recursive(
    st.dictionaries(_name, _scalar, max_size=4),
    lambda children: st.dictionaries(_name, children | _scalar, max_size=4),
    max_leaves=10,
)


@given(_doc, _doc)
def test_safe_update_idempotent(a, b):
    once = safe_update(dict(a), b)
    twice = safe_update(dict(once), b)
    assert once == twice


@given(_doc)
def test_safe_update_identity(a):
    assert safe_update(dict(a), {}) == a


@given(_doc, _name)
def test_safe_update_none_deletes(a, key):
    out = safe_update(dict(a), {key: None})
    assert key not in out


# -- selector algebra (G1) ----------------------------------------------------


@st.composite
def _manifests(draw):
    n = draw(st.integers(min_value=1, max_value=10))
    names = [f"m{i}" for i in range(n)]
    resources = []
    for i, name in enumerate(names):
        # edges only to earlier nodes -> guaranteed acyclic
        deps = draw(
            st.lists(
                st.sampled_from([f"model.p.{names[j]}" for j in range(i)])
                if i
                else st.nothing(),
                max_size=3,
                unique=True,
            )
        ) if i else []
        resources.append(
            Resource(unique_id=f"model.p.{name}", name=name, depends_on=deps)
        )
    return Manifest(resources)


@given(_manifests(), st.integers(min_value=0, max_value=9))
@settings(max_examples=50)
def test_selection_contains_seed_and_closures_nest(manifest, idx):
    names = sorted(r.name for r in manifest.resources.values())
    seed = names[idx % len(names)]
    plain = G.select_resources(manifest, seed)
    up = G.select_resources(manifest, f"+{seed}")
    down = G.select_resources(manifest, f"{seed}+")
    both = G.select_resources(manifest, f"+{seed}+")
    assert f"model.p.{seed}" in plain
    assert plain <= up and plain <= down
    assert up | down <= both
    # bounded depth never selects more than unbounded
    assert G.select_resources(manifest, f"1+{seed}") <= up


@given(_manifests(), st.integers(min_value=0, max_value=9))
@settings(max_examples=50)
def test_exclusion_removes_exactly(manifest, idx):
    names = sorted(r.name for r in manifest.resources.values())
    seed = names[idx % len(names)]
    everything = G.select_resources(manifest, "*")
    without = G.select_resources(manifest, "*", exclude=seed)
    assert f"model.p.{seed}" not in without
    assert without <= everything


@given(_manifests())
@settings(max_examples=50)
def test_access_classification_total_and_valid(manifest):
    selected = set(manifest.resources)
    access = G.classify_access(manifest, selected)
    assert set(access) == selected
    assert set(access.values()) <= {"protected", "private"}
    # a full-graph selection has no crossing edges: protected == leaves
    leaves = {
        u for u in selected if not manifest.child_map().get(u)
    }
    assert {u for u, a in access.items() if a == "protected"} == leaves


# -- version arithmetic (V5/V6) ----------------------------------------------


@given(
    st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=6, unique=True)
)
def test_bump_version_always_advances(versions):
    from pathlib import Path

    from dbt_meshify_spark.plans.versions import BumpBehavior, bump_version

    model = Resource(unique_id="model.p.m", name="m", path="models/m.sql")
    model.version = max(versions)
    cs = bump_version(
        model, Path("x.yml"), Path("models"),
        behavior=BumpBehavior.Increment, existing_versions=versions,
    )
    patch = cs.changes[0].data
    assert patch["latest_version"] == max(versions) + 1
    vs = [v["v"] for v in patch["versions"]]
    assert vs == sorted(versions) + [max(versions) + 1]


# -- fuzzy join pigeonhole soundness ----------------------------------------


@given(
    st.lists(
        st.text(alphabet="abcdef", min_size=8, max_size=20), min_size=2,
        max_size=8, unique=True,
    ),
    st.integers(min_value=0, max_value=3),
    st.randoms(use_true_random=False),
)
@settings(max_examples=15, deadline=None)
def test_edit_distance_join_substitution_pigeonhole(base_strings, n_subs, rnd):
    """For equal-length strings differing only by <= k substitutions, the
    aligned-chunk pigeonhole is SOUND: at least one of the k+1 chunks is
    untouched, so the join must find every such pair (cap not triggered at
    this scale)."""
    from dbt_meshify_spark.operators.fuzzy import edit_distance_join
    from dbt_meshify_spark.session import get_spark

    spark = get_spark(app_name="dbt-meshify-spark-tests")
    k = 4
    left = [(i, s) for i, s in enumerate(base_strings)]
    right = []
    for i, s in enumerate(base_strings):
        chars = list(s)
        for _ in range(n_subs):
            pos = rnd.randrange(len(chars))
            chars[pos] = rnd.choice("abcdef")
        right.append((1000 + i, "".join(chars)))
    got = {
        (r.lid, r.rid)
        for r in edit_distance_join(
            spark.createDataFrame(left, ["lid", "lname"]),
            spark.createDataFrame(right, ["rid", "rname"]),
            "lid", "lname", "rid", "rname", k=k,
        ).collect()
    }
    # every (i, 1000+i) pair is within n_subs <= 3 < k substitutions
    for i, _ in enumerate(base_strings):
        assert (i, 1000 + i) in got


# -- temperature mixture weights (N9) -----------------------------------------


_counts = st.dictionaries(
    _name, st.integers(min_value=1, max_value=10**9), min_size=1, max_size=12
)


@given(_counts, st.floats(min_value=0.0, max_value=1.0))
@settings(max_examples=200)
def test_temperature_weights_preserve_expected_total(counts, alpha):
    from dbt_meshify_spark.operators.sampling import (
        temperature_weights_from_counts,
    )

    w = temperature_weights_from_counts(counts, alpha)
    assert set(w) == set(counts)
    total = sum(counts.values())
    mixed = sum(w[s] * n for s, n in counts.items())
    assert abs(mixed - total) <= 1e-9 * max(1.0, total)
    assert all(v > 0 for v in w.values())


@given(_counts)
@settings(max_examples=100)
def test_temperature_alpha_one_is_identity(counts):
    from dbt_meshify_spark.operators.sampling import (
        temperature_weights_from_counts,
    )

    w = temperature_weights_from_counts(counts, 1.0)
    assert all(abs(v - 1.0) < 1e-12 for v in w.values())


@given(_counts, st.floats(min_value=0.0, max_value=1.0))
@settings(max_examples=200)
def test_temperature_flattens_toward_small_sources(counts, alpha):
    """For alpha <= 1, a smaller source never gets a smaller weight."""
    from dbt_meshify_spark.operators.sampling import (
        temperature_weights_from_counts,
    )

    w = temperature_weights_from_counts(counts, alpha)
    items = sorted(counts.items(), key=lambda kv: kv[1])
    for (sa, na), (sb, nb) in zip(items, items[1:]):
        if na < nb:
            assert w[sa] >= w[sb] - 1e-12


# -- PSI invariants (drift monitors) -----------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=12, deadline=None)
def test_psi_terms_nonnegative_and_total_consistent(counts):
    """(p-q)ln(p/q) >= 0 for every bucket (Gibbs), total == sum of terms,
    and identical distributions give PSI == 0 — for ANY count vector,
    including empty buckets (Laplace smoothing must keep logs finite)."""
    from dbt_meshify_spark.operators.snapshots import psi_from_counts
    from dbt_meshify_spark.session import get_spark

    spark = get_spark(app_name="dbt-meshify-spark-tests", shuffle_partitions=8)

    n = len(counts)
    cnts = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(counts)],
        "bucket int, n_old long, n_new long",
    )
    rows = psi_from_counts(cnts, n_buckets=n).collect()
    assert len(rows) == n
    total = rows[0]["psi_total"]
    assert all(abs(r["psi_total"] - total) < 1e-12 for r in rows)
    assert all(r["psi_term"] >= -1e-12 for r in rows)
    assert abs(sum(r["psi_term"] for r in rows) - total) < 1e-9

    same = spark.createDataFrame(
        [(i, a, a) for i, (a, _) in enumerate(counts)],
        "bucket int, n_old long, n_new long",
    )
    zero = psi_from_counts(same, n_buckets=n).collect()[0]["psi_total"]
    assert abs(zero) < 1e-12


# -- 64-bit banding pigeonhole completeness ----------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.sets(st.integers(min_value=0, max_value=63), min_size=0, max_size=3),
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=10, deadline=None)
def test_hash64_banding_finds_every_close_pair(cases):
    """Pigeonhole guarantee: for ANY base hash and ANY <=3 flipped bits,
    4-band blocking over 64 bits must emit the (base, variant) pair —
    banding may overgenerate but can never miss within max_hamming <=
    bands-1. All generated cases batch into ONE Spark job."""
    from dbt_meshify_spark.operators.dedup import hash64_candidate_pairs
    from dbt_meshify_spark.session import get_spark

    spark = get_spark(app_name="dbt-meshify-spark-tests", shuffle_partitions=8)
    rows = []
    expected = set()
    for i, (base, flips) in enumerate(cases):
        variant = base
        for b in flips:
            variant ^= 1 << b
        # flipping bit 63 in Python int arithmetic escapes int64 in BOTH
        # directions (negative base -> below -2^63); mask to 64 bits then
        # re-sign instead of correcting only the positive overflow
        variant &= 2**64 - 1
        if variant >= 2**63:
            variant -= 2**64
        a_id, b_id = i * 2, i * 2 + 1
        rows.append((a_id, base))
        rows.append((b_id, variant))
        expected.add((a_id, b_id, len(flips)))
    # ids are disjoint across cases, so cross-case pairs may appear (hash
    # collisions in banding) but every planted pair MUST appear
    df = spark.createDataFrame(rows, "id long, h long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hash64_candidate_pairs(df, "id", "h", max_hamming=3, bands=4).collect()
    }
    missing = {e for e in expected if e not in got}
    assert not missing, f"pigeonhole violated: {missing}"


# -- winnowing guarantee ------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # prefix length
            st.integers(min_value=0, max_value=30),  # suffix length
            st.integers(min_value=8, max_value=14),  # shared-run tokens
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=8, deadline=None)
def test_winnowing_never_misses_long_shared_runs(cases):
    """For ANY surrounding text, two docs sharing a verbatim run of
    >= window + k - 1 tokens (k=5, window=4 -> 8) must share at least one
    winnowing print. All cases batch into one Spark job; vocabularies are
    disjoint per case AND per side so only the planted run can match."""
    from dbt_meshify_spark.operators.dedup import winnow_overlap_pairs
    from dbt_meshify_spark.session import get_spark

    spark = get_spark(app_name="dbt-meshify-spark-tests", shuffle_partitions=8)
    rows, expected = [], set()
    for i, (npre, nsuf, nshared) in enumerate(cases):
        shared = " ".join(f"c{i}x{j}" for j in range(nshared))
        pre = " ".join(f"a{i}x{j}" for j in range(npre))
        suf = " ".join(f"b{i}x{j}" for j in range(nsuf))
        a_id, b_id = i * 2, i * 2 + 1
        rows.append((a_id, f"{pre} {shared}".strip()))
        rows.append((b_id, f"{shared} {suf}".strip()))
        expected.add((a_id, b_id))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in winnow_overlap_pairs(df, k=5, window=4, min_shared=1).collect()
    }
    missing = expected - got
    assert not missing, f"winnowing guarantee violated: {missing}"
