"""Tenancy-normalized bench regression guard (bench.py).

Round-4 postmortem: uniform shared-host load inflated ALL 187 queries
~1.28x (constant-plan trivia included) and the un-normalized guard
false-fired rc=1. The guard now scales every floor by the run's median
inflation before the 1.5x test; these tests pin that math.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (
    SENTINEL_QUERIES,
    compute_inflation,
    is_regressed,
    uniform_divergence,
)


def _corpus(n=50, base=1.0):
    return {f"q{i:03d}": base for i in range(n)}


def test_uniform_host_load_does_not_flag():
    """Every query 1.6x slower (pure tenancy) => median inflation 1.6,
    scaled floors absorb it, nothing flags."""
    floors = _corpus()
    times = {k: 1.6 for k in floors}
    inf = compute_inflation(times, floors)
    assert abs(inf - 1.6) < 1e-9
    assert not any(is_regressed(t, floors[k], inf) for k, t in times.items())


def test_single_genuine_regression_still_trips():
    """One query 2.5x its floor on an otherwise-quiet host: median stays
    ~1.0, the regressed query trips, the rest do not."""
    floors = _corpus()
    times = {k: 1.02 for k in floors}
    times["q007"] = 2.5
    inf = compute_inflation(times, floors)
    assert inf < 1.1
    flagged = [k for k, t in times.items() if is_regressed(t, floors[k], inf)]
    assert flagged == ["q007"]


def test_regression_trips_even_under_load():
    """Uniform 1.3x load AND one query at 3x: the median absorbs the load
    but the 3x query is still >1.5x its scaled floor."""
    floors = _corpus()
    times = {k: 1.3 for k in floors}
    times["q011"] = 3.0
    inf = compute_inflation(times, floors)
    assert 1.25 < inf < 1.35
    flagged = [k for k, t in times.items() if is_regressed(t, floors[k], inf)]
    assert flagged == ["q011"]


def test_inflation_clamps():
    """Median below 1.0 (faster than floor) clamps to 1.0 — floors are
    never DEflated; pathological medians clamp at 3.0."""
    floors = _corpus()
    assert compute_inflation({k: 0.5 for k in floors}, floors) == 1.0
    assert compute_inflation({k: 10.0 for k in floors}, floors) == 3.0


def test_small_corpus_no_normalization():
    """<5 floored queries: no basis for a median, inflation stays 1.0."""
    floors = _corpus(3)
    assert compute_inflation({k: 2.0 for k in floors}, floors) == 1.0


def test_absolute_guard_and_missing_floor():
    """Sub-second swings below 0.3s absolute never flag; a query with no
    recorded floor never flags."""
    assert not is_regressed(0.25, 0.1, 1.0)  # 2.5x but only +0.15s
    assert is_regressed(0.9, 0.1, 1.0)
    assert not is_regressed(99.0, None, 1.0)


def test_zero_floor_never_flags():
    """floor 0.0 (3dp-rounded sub-ms time) carries no signal: is_regressed
    must skip it, matching the median's floors>0 filter (ADVICE r5 — the
    old code divided the scaled floor to 0 and flagged any t>0.3s)."""
    assert not is_regressed(5.0, 0.0, 1.0)
    assert not is_regressed(5.0, -1.0, 1.3)


def _sentinel_corpus(n_other=50):
    floors = {s: 0.2 for s in SENTINEL_QUERIES}
    floors.update({f"x{i:03d}": 1.0 for i in range(n_other)})
    return floors


def test_inflation_anchors_on_sentinels():
    """Sentinels quiet (1.0x) while every operator query runs 2x: the old
    whole-corpus median called that 2x 'tenancy'; the sentinel anchor
    keeps inflation at 1.0 so the slowdown stays visible."""
    floors = _sentinel_corpus()
    times = {k: (0.2 if k in SENTINEL_QUERIES else 2.0) for k in floors}
    inf = compute_inflation(times, floors)
    assert inf == 1.0


def test_uniform_divergence_fires_on_shared_code_regression():
    """Corpus median 2x vs sentinel anchor 1.0 => divergence 2.0 > 1.5:
    the guard reports a uniform shared-code regression instead of
    absorbing it (ADVICE r5's clamp hole)."""
    floors = _sentinel_corpus()
    times = {k: (0.2 if k in SENTINEL_QUERIES else 2.0) for k in floors}
    inf = compute_inflation(times, floors)
    div = uniform_divergence(times, floors, inf)
    assert div is not None and abs(div - 2.0) < 1e-9


def test_uniform_divergence_quiet_under_pure_tenancy():
    """Host load inflates sentinels AND corpus by the same 1.6x: inflation
    absorbs it, divergence stays ~1.0, nothing fires."""
    floors = _sentinel_corpus()
    times = {k: f * 1.6 for k, f in floors.items()}
    inf = compute_inflation(times, floors)
    assert abs(inf - 1.6) < 1e-9
    assert uniform_divergence(times, floors, inf) is None
    assert not any(is_regressed(t, floors[k], inf) for k, t in times.items())


def test_no_sentinel_floors_falls_back_to_corpus_median():
    """A floor file predating the sentinel names: inflation falls back to
    the whole-corpus median (the r5 behavior) and divergence abstains."""
    floors = _corpus()
    times = {k: 1.4 for k in floors}
    assert abs(compute_inflation(times, floors) - 1.4) < 1e-9
    assert uniform_divergence(times, floors, 1.4) is None


def test_sentinel_alert_fires_over_2x_and_stays_quiet_under():
    """The residual hole made visible (ADVICE r6): a >2x sentinel median —
    heavy load OR a shared scan-path regression — returns the median for
    the advisory note; modest tenancy stays quiet."""
    from bench import sentinel_alert

    floors = _sentinel_corpus()
    hot = {k: f * 2.4 for k, f in floors.items()}
    assert abs(sentinel_alert(hot, floors) - 2.4) < 1e-9
    calm = {k: f * 1.6 for k, f in floors.items()}
    assert sentinel_alert(calm, floors) is None


def test_declared_corpus_counts_stay_synced_with_docs():
    """README/COVERAGE quote the corpus size; the counts-sync discipline is
    a per-round verdict ask — lock it so a new query/oracle that forgets
    the doc bump fails CI instead of shipping a stale number."""
    import os
    import re

    from dbt_meshify_spark.queries import ORACLES, QUERIES

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    readme = open(os.path.join(repo, "README.md")).read()
    m = re.search(r"(\d+) queries \(relational \+ extension;\s*\n?\s*(\d+) DuckDB-oracle-checked", readme)
    assert m, "README corpus-count sentence missing"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} queries, code has {len(QUERIES)}"
    )
    assert int(m.group(2)) == len(ORACLES), (
        f"README says {m.group(2)} oracles, code has {len(ORACLES)}"
    )
    # the driver window is exactly 50 hash-checkable slots
    window = list(QUERIES)[:50]
    assert all(n in ORACLES for n in window)


def test_rotate_window_green_rows_and_staleness_order(tmp_path, monkeypatch):
    """The rotation script's two policies both derive from the CORRECTNESS
    green rows: backlog mode ignores anything ever-green, --oldest-green
    orders by latest green round with never-verified names first (the
    post-backlog steady state documented in COVERAGE.md §rotation)."""
    import json

    import scripts.rotate_window as rw

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "a": {"rows_match": True, "schema_match": True, "hash_match": True,
              "err": None},
        "b": {"rows_match": True, "schema_match": True, "hash_match": False,
              "err": None},  # hash fail — not green
    }))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        "a": {"rows_match": True, "schema_match": True, "hash_match": True,
              "err": None},
        "c": {"rows_match": True, "schema_match": True, "hash_match": True,
              "err": "boom"},  # err — not green
        "d": {"rows_match": True, "schema_match": True, "hash_match": True,
              "err": None},
    }))
    monkeypatch.setattr(rw, "_REPO", str(tmp_path))
    rows = rw._green_rows()
    assert rows == {"a": 3, "d": 3}
    assert rw.green_names() == {"a", "d"}
    # staleness order over a hypothetical oracle list: never-green first
    # (last_green=0), then oldest round, ties alphabetical
    oracles = ["d", "b", "a", "c"]
    ordered = sorted(oracles, key=lambda n: (rows.get(n, 0), n))
    assert ordered == ["b", "c", "a", "d"]
