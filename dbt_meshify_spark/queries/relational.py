"""Relational query corpus Q01–Q22 + Q-G4 + Q-L1 (SURVEY.md §2.7).

Every function is the DataFrame-API expression of a semantic observed in the
reference's governed model corpus (citations in each docstring point into
/root/reference). The paired oracle SQL (validated against DuckDB 1.x during
the survey) lives in ``ORACLES``.

Scale notes applying corpus-wide:
- Dim tables (region/nation/customer at small SF) are joined without hints;
  ``spark.sql.autoBroadcastJoinThreshold`` + AQE pick broadcast when the dim
  fits, sort-merge when it doesn't. Explicit ``F.broadcast`` is used only
  where the small side is known-bounded at ANY scale factor (scalar
  aggregates, literal frames).
- Aggregations are expressed as ``groupBy().agg()`` so Catalyst plans partial
  (map-side) aggregation before the shuffle.
- Final ORDER BYs exist to mirror the declared oracle corpus (total orders,
  NULLS FIRST per the dialect rules); they are TakeOrderedAndProject where a
  LIMIT follows, else a range-partitioned sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_meshify_spark.sources import load_table


def _asc(c: str):
    return F.col(c).asc_nulls_first()


def _desc(c: str):
    return F.col(c).desc_nulls_first()


# --------------------------------------------------------------------------
# Q01–Q09: scans, projections, filters, joins, aggregates, set ops, top-k
# --------------------------------------------------------------------------


def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[S1,P1,P2,S3] projection + rename + cast.

    stg_orders semantics: reference
    test-projects/split/split_proj/models/staging/stg_orders.sql:15-27
    (rename block) and :23-24 (``(order_total / 100.0)::float``).
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        (F.col("o_totalprice") / F.lit(100.0)).cast("double").alias("order_total_dollars"),
        F.col("o_orderdate").cast("date").alias("ordered_on"),
    ).orderBy(_asc("order_id"))


def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[P3,P4] CASE + boolean derivation.

    stg_products.sql:24-33 (CASE) and orders.sql:135-138 (boolean predicate
    projection) in the reference's split_proj corpus.
    """
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.when(F.col("p_type").like("%BRASS%"), F.lit(1)).otherwise(F.lit(0)).alias("is_brass"),
        (F.col("p_size") > F.lit(25)).alias("is_large"),
    ).orderBy(_asc("p_partkey"))


def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F1,F2] timestamp + string equality filters.

    stg_orders.sql:9 (timestamp <= var filter), downstream_model.sql:8
    (string equality). Both predicates push to the parquet scan.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate").cast("date") <= F.lit("1997-06-30").cast("date"))
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .select("o_orderkey", "o_orderstatus")
        .orderBy(_asc("o_orderkey"))
    )


def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[J1,J2] inner + left equi-join then aggregate.

    orders.sql:80-128 join block shape. nation is a bounded dim => broadcast
    via threshold; orders side stays shuffle-partitioned on the group key.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey, "inner")
        .join(orders, orders.o_custkey == customer.c_custkey, "left")
        .groupBy("c_custkey", "n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
        .orderBy(_asc("c_custkey"))
    )


def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[A1,A2,A3] hash aggregate with conditional sum + derived boolean.

    customers.sql:22-38 and orders.sql:57-86 aggregate shapes; partial
    aggregation happens map-side before the single shuffle on l_orderkey.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("count_items"),
            F.round(
                F.sum(
                    F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(
                        F.lit(0.0)
                    )
                ),
                2,
            ).alias("returned_value"),
            F.round(F.min("l_discount"), 2).alias("min_disc"),
            F.round(F.max("l_discount"), 2).alias("max_disc"),
            (F.count("*") > 3).alias("is_big_order"),
        )
        .orderBy(_asc("l_orderkey"))
    )


def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[S2,P5,J3] multi-way join of a derived aggregate onto the fact.

    orders.sql:104-130 joins derived aggregates + dims onto the orders fact.
    item_summary shares the join key with its own group key, so AQE can plan
    the orders<->item_summary join without a second shuffle of the summary.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    item_summary = lineitem.groupBy("l_orderkey").agg(
        F.count("*").alias("count_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("subtotal"),
    )
    return (
        orders.join(item_summary, orders.o_orderkey == item_summary.l_orderkey, "left")
        .join(customer, orders.o_custkey == customer.c_custkey, "left")
        .select("o_orderkey", "o_orderstatus", "count_items", "subtotal", "c_mktsegment")
        .orderBy(_asc("o_orderkey"))
    )


def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[A4,D1] exact distinct count + dbt `unique` test compiled form.

    dbt `unique` compiles to group-by-having-count>1
    (models/staging/__models.yml:9-11). Both aggregates reduce to single
    rows, so the final combine is a broadcast-able 1x1 cross join.
    """
    orders = load_table(spark, sf_dir, "orders")
    n_customers = orders.agg(F.countDistinct("o_custkey").alias("n_customers"))
    dup_keys = (
        orders.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count("*").alias("dup_keys"))
    )
    return n_customers.crossJoin(F.broadcast(dup_keys))


def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U1,U2,X1] literal relation + UNION ALL.

    shared_model.sql:1-13 is a literal UNION ALL in the reference corpus;
    X1 literal relations at models/marts/leaf_node.sql:1.
    """
    rows = spark.sql(
        "SELECT id, colleague FROM VALUES (1, 'grace'), (2, 'dave'), (2, 'dave')"
        " AS t(id, colleague)"
    )
    return rows.orderBy(_asc("id"), _asc("colleague"))


def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[O1] top-k => TakeOrderedAndProject (no global sort materialized)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(_desc("o_totalprice"), _asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


# --------------------------------------------------------------------------
# Q10–Q16: window functions, rollup, time spine, incremental watermark
# --------------------------------------------------------------------------


def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[W1] lag/lead per partition.

    The reference's Python model does exactly this via pandas
    ``groupby().shift(±1)`` (customer_status_histories.py:16-17); native
    window functions keep it JVM-side with one shuffle on o_custkey.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    ).orderBy(_asc("o_custkey"), _asc("o_orderkey"))


def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[W2,N1] ranking keep-first dedup (incremental unique_key semantics).

    orders.sql:4 declares ``unique_key``; upsert dedup compiles to
    row_number()=1 with a deterministic tie-break.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type")
        .orderBy(_asc("event_id"))
    )


def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[W3,N6,N7] gap-based sessionization via running sum.

    Batch equivalent of ``session_window(ts, '30 minutes')``; both windows
    share the user_id partitioning, so Spark plans one shuffle.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTE")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("new_session").over(run).alias("session_id"),
    ).orderBy(_asc("user_id"), _asc("event_id"))


def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[GS1] rollup — semantic-model multi-grain aggregation
    (__semantic_models.yml:15-40 declares measures over multiple grains)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy(_asc("status"), _asc("priority"))
    )


def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[T1] date spine (metricflow_time_spine.sql:9-15 semantics).

    The spine here derives from observed dates (portable oracle form); the
    generator form is ``sequence(start, stop, interval 1 day)`` + explode —
    see operators.timespine.date_spine for the production generator.
    """
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(F.col("o_orderdate").cast("date").alias("date_day")).distinct()
    o = orders.select(
        F.col("o_orderdate").cast("date").alias("od"), "o_orderkey"
    )
    return (
        d.join(o, d.date_day == o.od, "left")
        .groupBy("date_day")
        .agg(F.count("o_orderkey").alias("orders_that_day"))
        .orderBy(_asc("date_day"))
    )


def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[T2,M1,N6] time-grain measure query (semantic model at month grain)."""
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    return (
        orders.groupBy(month)
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("order_total"),
            F.count("*").alias("order_count"),
        )
        .orderBy(_asc("month"))
    )


def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F3] incremental watermark predicate (is_incremental() max-subquery,
    orders.sql:23-29).

    Expressed as a broadcast cross join of the 1-row watermark aggregate —
    exactly what Catalyst rewrites a scalar subquery into; no driver collect.
    """
    orders = load_table(spark, sf_dir, "orders")
    wm = orders.agg(F.date_trunc("year", F.max("o_orderdate")).alias("wm"))
    return (
        orders.crossJoin(F.broadcast(wm))
        .filter(F.col("o_orderdate") >= F.col("wm"))
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("d"))
        .orderBy(_asc("o_orderkey"))
    )


# --------------------------------------------------------------------------
# Q17–Q19: data-test operators (zero-row/zero-count = pass)
# --------------------------------------------------------------------------


def q17_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[D2] `not_null` compiled test (__models.yml:9-11)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_custkey").isNull()).agg(
        F.count("*").alias("null_custkeys")
    )


def q17_accepted_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[D3] `accepted_values` compiled test (__models.yml:34-37)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(~F.col("o_orderstatus").isin("O", "F", "P")).agg(
        F.count("*").alias("bad_status")
    )


def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[D4] `relationships` test — left anti join child->parent
    (__models.yml:56-59)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count("*").alias("orphans"))
    )


def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[D5,D6] expression test (dbt_utils.expression_is_true,
    __models.yml:43-47)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.filter(
        ~((F.col("l_extendedprice") >= 0) & (F.col("l_quantity") > 0))
    ).agg(F.count("*").alias("violations"))


# --------------------------------------------------------------------------
# Q20–Q22: similarity arithmetic, text facets, tumbling windows
# --------------------------------------------------------------------------


def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[N3] exact cosine similarity, explicit arithmetic (small-N oracle
    variant; the scale path is operators.similarity)."""
    nation = load_table(spark, sf_dir, "nation")
    v = nation.select(
        F.col("n_nationkey").cast("double").alias("a"),
        F.col("n_regionkey").cast("double").alias("b"),
        "n_name",
    )
    x = v.alias("x")
    y = v.alias("y")
    dot = F.col("x.a") * F.col("y.a") + F.col("x.b") * F.col("y.b")
    nx = F.sqrt(F.col("x.a") * F.col("x.a") + F.col("x.b") * F.col("x.b"))
    ny = F.sqrt(F.col("y.a") * F.col("y.a") + F.col("y.b") * F.col("y.b"))
    return (
        x.join(y, F.col("x.n_name") < F.col("y.n_name"))
        .select(
            F.col("x.n_name").alias("n1"),
            F.col("y.n_name").alias("n2"),
            F.round(dot / (nx * ny + F.lit(1e-9)), 2).alias("cos_sim"),
        )
        .orderBy(_asc("n1"), _asc("n2"))
    )


def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[N4] text facet analysis over documents."""
    documents = load_table(spark, sf_dir, "documents")
    return (
        documents.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy(_asc("lang"), _asc("source"))
    )


def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[N7] tumbling-window aggregation, batch equivalent of
    ``window(ts, '1 day')`` (streaming form in streaming/events.py)."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    return (
        events.groupBy(day, "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy(_asc("day"), _asc("event_type"))
    )


# --------------------------------------------------------------------------
# Q-G4 / Q-L1: metadata-plane semantics expressed relationally
# --------------------------------------------------------------------------


def q_g4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[G4,G5] graph boundary classification.

    Mirrors /root/reference/dbt_meshify/utilities/grouper.py:30-55 and its
    golden test tests/unit/test_resource_grouper_classification.py:28-37:
    interface = edge_boundary(selected) ∪ leaf nodes => 'protected'.
    """
    edges = spark.sql(
        "SELECT src, dst FROM VALUES ('a','b'),('b','c'),('b','d'),('d','e')"
        " AS t(src, dst)"
    )
    nodes = spark.sql("SELECT id FROM VALUES ('a'),('b'),('c'),('d') AS t(id)")
    boundary = (
        edges.join(F.broadcast(nodes), edges.src == nodes.id, "left_semi")
        .join(F.broadcast(nodes), F.col("dst") == nodes.id, "left_anti")
        .select(F.col("src").alias("id"))
        .distinct()
    )
    leaves = nodes.join(edges, nodes.id == edges.src, "left_anti").select("id")
    interface = boundary.union(leaves).distinct().withColumn("is_if", F.lit(True))
    return (
        nodes.join(interface, "id", "left")
        .select(
            "id",
            F.when(F.col("is_if"), F.lit("protected"))
            .otherwise(F.lit("private"))
            .alias("access"),
        )
        .orderBy(_asc("id"))
    )


def q_l1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[L1] source-hack dependency detection as case-insensitive
    relation-name intersection (linker.py:53-122; integration test
    tests/integration/test_dependency_detection.py:54-84)."""
    my_models = spark.sql(
        "SELECT relation_name, unique_id FROM VALUES"
        " ('db.main.shared_model', 'model.src_proj_a.shared_model'),"
        " ('db.main.new_model', 'model.src_proj_a.new_model')"
        " AS t(relation_name, unique_id)"
    )
    their_sources = spark.sql(
        "SELECT relation_name, unique_id FROM VALUES"
        " ('db.main.SHARED_MODEL', 'source.src_proj_b.src_proj_a.shared_model')"
        " AS t(relation_name, unique_id)"
    )
    m = my_models.alias("m")
    s = their_sources.alias("s")
    return (
        m.join(s, F.lower(F.col("m.relation_name")) == F.lower(F.col("s.relation_name")))
        .select(
            F.col("m.unique_id").alias("upstream_resource"),
            F.col("s.unique_id").alias("downstream_resource"),
        )
        .orderBy(_asc("upstream_resource"))
    )


_Q_G7_SQL = """
WITH edges AS (
  SELECT * FROM (VALUES ('a','b'),('b','c'),('b','d'),('d','e'),('x','d')) AS t(src, dst)
),
sel AS (SELECT * FROM (VALUES ('b'),('d')) AS t(id)),
parents AS (
  SELECT DISTINCT e.src AS unique_id, 'parent' AS relation
  FROM edges e JOIN sel s ON e.dst = s.id
  WHERE e.src NOT IN (SELECT id FROM sel)
),
children AS (
  SELECT DISTINCT e.dst AS unique_id, 'child' AS relation
  FROM edges e JOIN sel s ON e.src = s.id
  WHERE e.dst NOT IN (SELECT id FROM sel)
)
SELECT unique_id, relation FROM parents
UNION ALL
SELECT unique_id, relation FROM children
ORDER BY unique_id NULLS FIRST, relation NULLS FIRST
"""


def q_g7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[G7] cross-selection parents/children — the resources a subproject
    split would leave on the other side of the boundary (reference
    dbt_projects.py:76-90; engine twin plans/graph.py::xproj_parents/
    xproj_children, verified by the splitter e2e tests). The golden VALUES
    graph mirrors q_g4's; the IDENTICAL SQL text is the DuckDB oracle."""
    return spark.sql(_Q_G7_SQL)


_Q_G8_SQL = """
WITH resources AS (
  SELECT * FROM (VALUES
    ('a','model'),('b','model'),('c','model'),('d','model'),('e','model'),
    ('x','model'),('t1','test'),('t2','test')) AS t(id, resource_type)
),
edges AS (
  SELECT * FROM (VALUES
    ('a','b'),('b','c'),('b','d'),('d','e'),('x','d'),('b','t1'),('t1','e'),
    ('e','t2')) AS t(src, dst)
),
sel_raw AS (
  SELECT * FROM (VALUES
    ('split_bd','b'),('split_bd','d'),('split_bd','t1'),
    ('split_a','a'),
    ('split_e','e'),
    ('split_c','c')) AS t(sel_name, id)
),
iter AS (
  SELECT s.sel_name, s.id FROM sel_raw s
  JOIN resources rs ON rs.id = s.id AND rs.resource_type <> 'test'
),
xp AS (
  SELECT i.sel_name, COUNT(DISTINCT e.src) AS n
  FROM iter i JOIN edges e ON e.dst = i.id
  WHERE e.src NOT IN (SELECT id FROM sel_raw s2 WHERE s2.sel_name = i.sel_name)
  GROUP BY i.sel_name
),
xc AS (
  SELECT i.sel_name, COUNT(DISTINCT e.dst) AS n
  FROM iter i JOIN edges e ON e.src = i.id
  WHERE e.dst NOT IN (SELECT id FROM sel_raw s2 WHERE s2.sel_name = i.sel_name)
  GROUP BY i.sel_name
),
names AS (SELECT DISTINCT sel_name FROM sel_raw)
SELECT n.sel_name,
       (COALESCE(xp.n, 0) > 0 AND COALESCE(xc.n, 0) > 0) AS would_cycle
FROM names n
LEFT JOIN xp ON xp.sel_name = n.sel_name
LEFT JOIN xc ON xc.sel_name = n.sel_name
ORDER BY n.sel_name NULLS FIRST
"""


def q_g8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[G8] project-cycle detection for four candidate splits — a split
    creates a cycle iff the subproject is BOTH upstream and downstream of
    the remainder (reference dbt_projects.py:97-108, enforced
    main.py:250-255; engine twin plans/graph.py::is_project_cycle). Test
    nodes are skipped as ITERATION SOURCES only (the reference's
    ``startswith("test"): continue``) — the cross-boundary sets keep test
    nodes, and the FULL selection (tests included) is what gets
    subtracted. split_e pins exactly that: its only cross-boundary child
    is the test t2, and the reference still calls it a cycle; split_bd
    pins the selected-test subtraction (t1 is selected, so it never
    counts as a cross-boundary child of b)."""
    return spark.sql(_Q_G8_SQL)


_Q_G10_SQL = """
WITH depends AS (
  SELECT * FROM (VALUES
    ('model.proj.m1', 'macro.proj.fmt'),
    ('model.proj.m1', 'macro.other.ext'),
    ('model.proj.m2', 'macro.proj.helper'),
    ('macro.proj.fmt', 'macro.proj.base'),
    ('macro.proj.base', 'macro.proj.deepest'),
    ('macro.proj.helper', 'macro.other.ext2')) AS t(src, dep)
),
sel AS (SELECT * FROM (VALUES ('model.proj.m1'),('model.proj.m2')) AS t(id)),
owned AS (
  SELECT src, dep FROM depends
  WHERE dep LIKE 'macro.%' AND md5(split_part(dep, '.', 2)) = md5('proj')
),
level1 AS (
  SELECT DISTINCT o.dep AS macro_id FROM owned o JOIN sel s ON o.src = s.id
),
level2 AS (
  SELECT DISTINCT o.dep AS macro_id FROM owned o JOIN level1 l ON o.src = l.macro_id
)
SELECT macro_id FROM level1
UNION
SELECT macro_id FROM level2
ORDER BY macro_id NULLS FIRST
"""


def q_g10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[G10] project-owned macro closure, EXACTLY two levels deep (macros
    of selected resources, then macros of those macros — a level-3 macro
    is deliberately excluded by the fixture, mirroring the reference's
    fixed two-pass closure in dbt_projects.py:463-486 and its md5 project-
    ownership test at :150-170; engine twin plans/graph.py::macro_closure).
    md5 evaluates identically on both engines, so ownership itself is part
    of the hash-checked replay."""
    return spark.sql(_Q_G10_SQL)


_Q_G12_SQL = """
WITH resources AS (
  SELECT * FROM (VALUES
    ('model.p.m1', 'model', 'finance'),
    ('model.p.m2', 'model', CAST(NULL AS STRING)),
    ('model.p.m3', 'model', 'marketing'),
    ('group.p.finance', 'group', 'finance'),
    ('group.p.marketing', 'group', 'marketing'),
    ('group.p.unused', 'group', 'unused')) AS t(unique_id, resource_type, grp)
),
sel AS (SELECT * FROM (VALUES ('model.p.m1'),('model.p.m2')) AS t(id))
SELECT r.unique_id
FROM resources r
WHERE r.resource_type = 'group'
  AND r.grp IN (
    SELECT r2.grp FROM resources r2 JOIN sel s ON r2.unique_id = s.id
    WHERE r2.grp IS NOT NULL
  )
ORDER BY unique_id NULLS FIRST
"""


def q_g12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[G12] indirect group closure — group resources referenced by the
    selection's group attribute, NULL groups ignored (reference
    dbt_projects.py:521-537; engine twin plans/graph.py::group_closure)."""
    return spark.sql(_Q_G12_SQL)


_Q_V7_SQL = """
WITH versions AS (
  SELECT * FROM (VALUES
    ('dim_customers', 1, 2), ('dim_customers', 2, 2), ('dim_customers', 3, 2),
    ('fct_orders', 1, 1)) AS t(model_name, version, latest_version)
),
refs AS (
  SELECT * FROM (VALUES
    ('r1', 'dim_customers', CAST(NULL AS INT)),
    ('r2', 'dim_customers', 1),
    ('r3', 'dim_customers', 3),
    ('r4', 'fct_orders', CAST(NULL AS INT))) AS t(ref_id, model_name, requested)
)
SELECT r.ref_id, r.model_name,
       CAST(COALESCE(r.requested, v.latest_version) AS BIGINT) AS resolved_version,
       CONCAT(r.model_name, '_v', CAST(COALESCE(r.requested, v.latest_version) AS STRING)) AS relation
FROM refs r
JOIN versions v
  ON v.model_name = r.model_name
 AND v.version = COALESCE(r.requested, v.latest_version)
ORDER BY ref_id NULLS FIRST
"""


def q_v7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[V7] versioned-ref resolution — an unpinned ref resolves to
    latest_version, a pinned ref to its requested version (including a
    PRERELEASE version above latest, r3), and the physical relation gets
    the ``_v{n}`` suffix (reference versioner semantics + references.py
    ref-rewrite rules; engine twins plans/versions.py::
    resolve_versioned_relation and project/runner.py::_resolve_ref)."""
    return spark.sql(_Q_V7_SQL)


_Q_L2_SQL = """
WITH up_models AS (
  SELECT * FROM (VALUES
    ('proj_a', 'model.proj_a.shared_dim', 'db.main.shared_dim'),
    ('proj_a', 'model.proj_a.shared_util', 'db.main.shared_util'),
    ('proj_a', 'model.proj_a.internal', 'db.main.internal'),
    ('proj_z', 'model.proj_z.shared_dim', 'db.main.shared_dim')
  ) AS t(project, unique_id, relation_name)
),
dn_models AS (
  SELECT * FROM (VALUES
    ('model.proj_a.shared_dim', 'proj_a', 'DB.MAIN.SHARED_DIM'),
    ('model.proj_a.shared_util', 'proj_a', 'db.main.shared_util'),
    ('model.proj_c.third', 'proj_c', 'db.main.third'),
    ('model.proj_b.orders', 'proj_b', 'db.main.orders'),
    ('model.proj_b.revenue', 'proj_b', 'db.main.revenue')
  ) AS t(unique_id, package, relation_name)
),
dn_edges AS (
  SELECT * FROM (VALUES
    ('model.proj_a.shared_dim', 'model.proj_b.orders'),
    ('model.proj_b.orders', 'model.proj_b.revenue')
  ) AS t(src, dst)
),
installed AS (
  SELECT DISTINCT md5(package) AS pid FROM dn_models
  WHERE md5(package) <> md5('proj_b')
),
candidates AS (SELECT * FROM (VALUES ('proj_a'), ('proj_z')) AS t(up_name)),
gated AS (
  SELECT c.up_name FROM candidates c JOIN installed i ON i.pid = md5(c.up_name)
),
shared AS (
  SELECT DISTINCT g.up_name, u.unique_id AS upstream_resource
  FROM gated g
  JOIN up_models u ON u.project = g.up_name
  JOIN dn_models d ON lower(u.relation_name) = lower(d.relation_name)
),
deps AS (
  SELECT s.up_name, s.upstream_resource, e.dst AS downstream_resource
  FROM shared s JOIN dn_edges e ON e.src = s.upstream_resource
)
SELECT up_name AS upstream_project, upstream_resource,
       'proj_b' AS downstream_project, downstream_resource,
       'package' AS dep_type
FROM deps
ORDER BY upstream_resource NULLS FIRST, downstream_resource NULLS FIRST
"""


def q_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[L2] package-imported dependency detection — upstream counts as a
    package of downstream iff its md5 project id appears among downstream's
    installed-package ids (every md5(package_name) that is NOT downstream's
    own — reference dbt_projects.py:150-170), shared models are the
    case-insensitive relation-name intersection, and the dependency
    attaches to the downstream CHILDREN of each shared model, keyed by the
    UPSTREAM unique_id (the id an installed package's nodes keep in the
    downstream manifest — linker.py:124-198). The fixture pins each piece:
    proj_z shares a
    relation name but is NOT installed (md5 gate kills it), shared_util is
    installed+shared but childless (no row), revenue is a grandchild (no
    row — children only), and the shared_dim match crosses case. Engine
    twin plans/linker.py::package_dependencies, pinned by the
    twin-agreement test."""
    return spark.sql(_Q_L2_SQL)


def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[A1 extension] exact percentiles + sample stddev per group — the
    statistical-aggregate surface a semantic layer's distribution measures
    need. Exact ``percentile`` (sort-based within groups); at 100 TB swap to
    ``percentile_approx`` (t-digest sketch, one pass, mergeable partials) —
    excluded from the oracle because sketches differ per engine."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90_price"),
            F.round(F.stddev_samp("o_totalprice"), 2).alias("sd_price"),
        )
        .orderBy(_asc("o_orderpriority"))
    )


def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[A1 extension] correlation / covariance aggregates over lineitem —
    single-pass co-moment accumulation, partial-aggregated map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("qty_disc_cov"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        )
        .orderBy(_asc("l_returnflag"))
    )


def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[M1 metrics] ratio + derived metric compiled by the semantic layer
    (project/semantic.py::compile_derived_metric) over an inline semantic
    spec bound to orders. The reference carries metric nodes through splits
    (dbt_projects.py manifest `metrics` dict); here the engine executes
    them: one aggregate pass computes every input measure, the metric
    expressions evaluate post-aggregation — no second shuffle."""
    from dbt_meshify_spark.project.semantic import compile_derived_metric

    sm_spec = {
        "model": "ref('orders')",
        "measures": [
            {"name": "order_total", "agg": "sum", "expr": "o_totalprice"},
            {"name": "order_count", "agg": "count", "expr": "o_orderkey"},
        ],
        "dimensions": [
            {"name": "o_orderdate", "type": "time", "time_granularity": "day"}
        ],
    }
    derived = {
        "name": "avg_order_value",
        "type": "derived",
        "expr": "total_order_value / n_orders",
        "metrics": ["total_order_value", "n_orders"],
    }
    inputs = [
        {"name": "total_order_value", "type": "simple", "measure": "order_total"},
        {"name": "n_orders", "type": "simple", "measure": "order_count"},
    ]
    orders = load_table(spark, sf_dir, "orders")
    out = compile_derived_metric(orders, derived, inputs, sm_spec, grain="month")
    return out.select(
        F.col("o_orderdate").alias("month"),
        F.round("avg_order_value", 2).alias("avg_order_value"),
    ).orderBy(_asc("month"))


def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[GS1 extension] pivot: months x order-status matrix via
    ``groupBy().pivot()`` with explicit pivot values — explicit values keep
    the plan a single aggregate pass (no values-discovery pre-query) and
    make the output schema stable, which a 100 TB job needs anyway.
    Oracle: the equivalent CASE-WHEN conditional aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn(
            "month", F.date_trunc("month", F.col("o_orderdate")).cast("date")
        )
        .groupBy("month")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
        .select(
            "month",
            F.coalesce("O", F.lit(0.0)).alias("open_total"),
            F.coalesce("F", F.lit(0.0)).alias("filled_total"),
            F.coalesce("P", F.lit(0.0)).alias("partial_total"),
        )
        .orderBy(_asc("month"))
    )


def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[W2 extension] rank-family window functions: rank, dense_rank,
    percent_rank, ntile(4), cume_dist per partition — the remaining
    analytic-window surface beyond row_number (q11) and lag/lead (q10)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.round(F.percent_rank().over(w), 4).alias("prnk"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.round(F.cume_dist().over(w), 4).alias("cdist"),
        )
        .filter(F.col("rnk") <= 5)
        .orderBy(_asc("o_orderpriority"), _asc("rnk"), _asc("o_orderkey"))
    )


def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[J2 extension] EXISTS semi-join: customers with at least one open
    order, written as a correlated EXISTS so Catalyst's subquery
    decorrelation rewrites it to a LeftSemi hash join (the DataFrame twin is
    ``join(..., "left_semi")`` — same physical plan). One shuffle on the
    join key; no row duplication however many orders match."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("__q28_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__q28_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM __q28_customer
        WHERE EXISTS (
          SELECT 1 FROM __q28_orders
          WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
        )
        ORDER BY c_custkey NULLS FIRST
        """
    )


def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F3 extension] correlated scalar aggregate subquery: each January-1995
    order paired with its lineitem net value. Catalyst decorrelates to an
    aggregate + left outer equi-join — the filter on orders prunes BEFORE
    the join under pushdown, so the lineitem aggregate only shuffles keys
    that survive."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__q29_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("__q29_lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               -- decimal, not double: float summation order differs across
               -- engines and lands on ROUND half-way boundaries; decimal
               -- addition is exact and order-independent
               (SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                                      * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                            AS DOUBLE)
                  FROM __q29_lineitem WHERE l_orderkey = o_orderkey) AS net_value
        FROM __q29_orders
        WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-02-01'
        ORDER BY o_orderkey NULLS FIRST
        """
    )


def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[GS1 extension] explicit GROUPING SETS with grouping() flags — the
    remaining grouping surface beyond rollup (q13) and pivot (q26). One
    Expand + one aggregate pass; gid is derived from per-column grouping()
    bits, which both engines expose identically."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__q30_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INT) AS gid,
               COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
        FROM __q30_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY gid NULLS FIRST, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[W3 extension] RANGE-frame trailing window: per-customer 90-day
    trailing spend. The frame is value-based (all orders within 90 days),
    not row-based — orders on the same day all see the same trailing sum.
    Date arithmetic runs on an epoch-day ordinal so the numeric range frame
    is portable; the sum is decimal so accumulation order cannot move ROUND
    boundaries."""
    orders = load_table(spark, sf_dir, "orders")
    day_ord = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_ord)
        .rangeBetween(-90, 0)
    )
    trailing = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.round(trailing, 2).cast("double").alias("trailing_90d_spend"),
        )
        .orderBy(_asc("o_orderkey"))
    )


def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U2] INTERSECT / EXCEPT with distinct set semantics — the remaining
    set-operator surface beyond q08's UNION ALL (SURVEY §2.3 U2 mirrors the
    reference's selection set algebra, dbt_projects.py:362-366). Customers
    with both open and finished orders vs. open-only. Each leg is a
    groupBy-free distinct projection; Catalyst plans both set ops as
    aggregate + hash join on the same key, so the three scans share one
    shuffle key and AQE coalesces the post-shuffle partitions."""
    orders = load_table(spark, sf_dir, "orders")
    open_keys = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_keys = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    both = open_keys.intersect(done_keys).select(
        F.lit("both").alias("tag"), "o_custkey"
    )
    only_open = open_keys.subtract(done_keys).select(
        F.lit("only_open").alias("tag"), "o_custkey"
    )
    return both.unionByName(only_open).orderBy(_asc("tag"), _asc("o_custkey"))


def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[J1 extension] FULL OUTER equi-join of two date-grain aggregates —
    order activity vs. ship activity per day. The date ranges only partly
    overlap (shipdate trails orderdate), so both null sides are exercised.
    Aggregating BEFORE the join keeps the full-outer input at date
    cardinality (~2.4k rows at any SF) instead of fact cardinality — the
    join itself is then trivially broadcastable at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    od = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count("*").alias("n_orders"))
    )
    sd = (
        lineitem.groupBy(F.col("l_shipdate").cast("date").alias("d"))
        .agg(F.count("*").alias("n_ships"))
    )
    return (
        od.join(sd, on="d", how="full_outer")
        .select(F.col("d").alias("day"), "n_orders", "n_ships")
        .orderBy(_asc("day"))
    )


def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[UD5 generator surface] posexplode: leading tokens of each document
    with their position. The generator runs inside whole-stage codegen as a
    Generate node co-located with the scan — zero shuffle; the only exchange
    is the final presentation sort. The array is ``slice``d to the leading
    tokens BEFORE the explode, so the generator never materializes the full
    token stream (at 100 TB that is the difference between 3 rows/doc and
    ~100 rows/doc entering the Generate). Position is 1-based to match SQL
    ordinality conventions."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.posexplode(F.slice(F.split(F.col("text"), " "), 1, 3)).alias(
                "pos0", "tok"
            ),
        )
        .select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "tok")
        .orderBy(_asc("doc_id"), _asc("pos"))
    )


def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[P-family] UNPIVOT (melt) of lineitem measures into long form, then
    aggregate per measure. ``stack`` is a codegen'd generator — the wide→long
    reshape happens at scan speed with no shuffle; the only exchange is the
    4-group aggregate. Decimal accumulation keeps the sums order-independent
    across engines."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    long = lineitem.selectExpr(
        """stack(4,
             'discount',      CAST(l_discount      AS DECIMAL(18,4)),
             'extendedprice', CAST(l_extendedprice AS DECIMAL(18,4)),
             'quantity',      CAST(l_quantity      AS DECIMAL(18,4)),
             'tax',           CAST(l_tax           AS DECIMAL(18,4))
           ) AS (measure, value)"""
    )
    return (
        long.groupBy("measure")
        .agg(
            F.round(F.sum("value"), 2).cast("double").alias("total"),
            F.count("*").alias("n"),
        )
        .orderBy(_asc("measure"))
    )


def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[A-nested] array-building aggregation: per customer, the sorted list
    of order keys + a count. ``collect_list`` is partition-order-dependent,
    so ``sort_array`` canonicalizes before anything downstream hashes it —
    the rule every nested-agg pipeline at scale needs (shuffle order is
    nondeterministic under AQE). One shuffle, map-side partial aggregation.

    The checked output serializes the array with ``concat_ws`` so every
    comparator (including pandas-based canonicalizers that cannot sort list
    columns) can hash it; the array-typed variant stays covered in unit
    tests (tests/test_operators.py::test_q36_array_variant)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_list("o_orderkey"))
            ).alias("order_keys"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(_asc("o_custkey"))
    )


def q36_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-typed variant of q36 (unit-test surface; the driver-checked
    q36 emits the concat_ws serialization of the same array)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.sort_array(F.collect_list("o_orderkey")).alias("order_keys"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(_asc("o_custkey"))
    )


def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[HOF] higher-order array functions on the embedding column: L2 norm
    via transform + aggregate (fold), plus dimension count. Runs entirely
    inside the projection — no explode, no shuffle; the fold is
    left-to-right on both engines so float accumulation order is identical."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        emb.select(
            "vec_id",
            F.size("embedding").cast("long").alias("dims"),
            F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
        )
        .orderBy(_asc("vec_id"))
    )


def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F-fuzzy] edit-distance matching within distance 2
    (entity-resolution shape) via the aligned-chunk pigeonhole blocking of
    ``operators.fuzzy.edit_distance_join``.

    Round 1 blocked on a name-length band — degenerate on fixed-format
    TPC-H names (every row one band => a single-key cross join, 70 s at
    sf0.1). Round 2's supplier-vs-customer pairing was driver-green but
    VACUOUS (0 rows: the name families are never within distance 4).
    Round 3 matches supplier names against a deterministic perturbation of
    the supplier table itself (``#`` -> ``@``, a single substitution), so
    the oracle verifies real matches flowing through the chunk blocking,
    bucket cap, and Levenshtein verify. Multi-match coverage (~19 matches
    per supplier: self at distance 1 plus every key within Hamming 1 of
    the digit suffix) holds below ~316 suppliers — those dist-2 matches
    share only chunk 0 ('Suppli', common to EVERY pair), and beyond
    sqrt(max_bucket_pairs)=~316 rows that bucket exceeds the 100k-pair cap
    and is deterministically truncated on BOTH engines, leaving self-pairs
    at distance 1. Oracle parity is unaffected at any SF (identical cap
    both sides); the cap doing its job on the degenerate shared-prefix
    chunk IS the scale posture under test."""
    from dbt_meshify_spark.operators.fuzzy import edit_distance_join

    supplier = load_table(spark, sf_dir, "supplier")
    perturbed = supplier.select(
        F.col("s_suppkey").alias("p_suppkey"),
        F.translate("s_name", "#", "@").alias("p_name"),
    )
    return (
        edit_distance_join(
            supplier.select("s_suppkey", "s_name"),
            perturbed,
            "s_suppkey",
            "s_name",
            "p_suppkey",
            "p_name",
            k=2,
            max_bucket_pairs=100_000,
        )
        .select("s_suppkey", "p_suppkey", "s_name", "p_name", "dist")
        .orderBy(_asc("s_suppkey"), _asc("p_suppkey"))
    )


def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[W3-time] event-time RANGE frame + IGNORE NULLS navigation: per
    event, the user's rolling 1-hour event count (RANGE BETWEEN INTERVAL —
    peers-inclusive, so tie-order-insensitive) and the value of their most
    recent purchase so far (last_value IGNORE NULLS over a ROWS frame with
    a TOTAL order ts, event_id — a range frame's intra-tie row order is
    engine-dependent, a rows frame over a total order is not)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            "event_id",
            "user_id",
            F.expr(
                "count(*) OVER (PARTITION BY user_id ORDER BY ts "
                "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
            ).alias("n_last_hour"),
            F.round(
                F.expr(
                    "last_value(CASE WHEN event_type = 'purchase' THEN value END) "
                    "IGNORE NULLS OVER (PARTITION BY user_id ORDER BY ts, event_id "
                    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                ),
                2,
            ).alias("last_purchase_value"),
        )
        .orderBy(_asc("event_id"))
    )


_Q40_SQL = """
WITH RECURSIVE walk(pk, anc, hop) AS (
  SELECT p_partkey, p_partkey, 0 FROM {tbl}
  UNION ALL
  SELECT pk, CAST(FLOOR(anc / 2.0) AS BIGINT), hop + 1
  FROM walk WHERE anc > 1
),
depths AS (
  SELECT pk, CAST(MAX(hop) AS BIGINT) AS depth FROM walk GROUP BY pk
)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(MIN(pk) AS BIGINT) AS first_part, CAST(MAX(pk) AS BIGINT) AS last_part
FROM depths GROUP BY depth
ORDER BY depth NULLS FIRST
"""


def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REC1] recursive CTE hierarchy walk — Spark 4's WITH RECURSIVE
    (SPARK-24497), the BOM-explosion / org-chart SQL shape: every part
    climbs its synthesized binary-tree ancestor chain (parent(k) =
    floor(k/2)) to the root, then parts are profiled by tree depth.
    ~log2(N) recursion levels (15 at sf0.1), each level one self-join —
    the IDENTICAL SQL string runs on both engines (the oracle is this
    text verbatim).

    Dialect note: the halving must be CAST(FLOOR(x / 2.0) AS BIGINT) —
    bigint `/` returns DOUBLE on both engines, but a bare CAST of the
    quotient truncates in Spark and rounds-half-even in DuckDB.

    Scale posture: each recursion level is a full shuffle with no
    localCheckpoint between levels, so the CTE tier suits bounded-depth
    hierarchies (BOMs, org charts, category trees — depth ~log N or a
    business constant); unbounded/graph-scale traversal stays on the
    iterative operators (graph_rank.py, dedup.connected_components) whose
    per-round pin keeps 100 TB lineage flat."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_q40")
    return spark.sql(_Q40_SQL.format(tbl="part_q40"))


_Q41_SQL = """
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
FROM {cust} c,
LATERAL (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
         ROUND(o_totalprice, 2) AS o_totalprice
  FROM {ord}
  WHERE o_custkey = c.c_custkey
  ORDER BY o_orderdate DESC, o_orderkey DESC
  LIMIT 2
) o
WHERE c.c_custkey < 200
ORDER BY c.c_custkey NULLS FIRST, o.o_orderkey NULLS FIRST
"""


def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[J-lateral] correlated LATERAL subquery with per-row LIMIT — each
    customer's two most recent orders, the top-k-per-group shape expressed
    through Catalyst's lateral-join decorrelation (DecorrelateInnerQuery)
    instead of q09's rank window. The IDENTICAL SQL text runs on both
    engines (the oracle is this string verbatim).

    Scale note: Catalyst rewrites the correlated LIMIT into a join +
    per-key ranking — same physical family as the window form, so the
    lateral surface adds expressiveness, not a new scale hazard; the
    outer filter (c_custkey < 200) pushes into the customer scan."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("cust_q41")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_q41")
    return spark.sql(_Q41_SQL.format(cust="cust_q41", ord="ord_q41"))


_Q42_SQL = """
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
FROM {cust}
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM {ord} WHERE o_totalprice > 400000.0
)
ORDER BY c_custkey NULLS FIRST
"""


def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[J-anti] NOT IN subquery — customers with no very-high-value order.
    Complements q28's EXISTS semi-join with the other decorrelation family:
    Spark plans this as a null-aware LeftAnti join (BuildRight with the
    isNullAwareAntiJoin flag — verified in the physical plan), the operator
    whose three-valued NOT IN semantics a plain anti join would get wrong
    if the subquery column could be NULL. The IDENTICAL SQL text runs on
    both engines (the oracle is this string verbatim).

    Scale note: the subquery side reduces to the distinct high-value
    custkeys BEFORE the anti join and broadcasts under the threshold; at
    scale AQE picks the join strategy — no per-row subquery execution
    survives decorrelation."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("cust_q42")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_q42")
    return spark.sql(_Q42_SQL.format(cust="cust_q42", ord="ord_q42"))


_Q43_SQL = """
WITH ia AS (
  SELECT l_suppkey FROM {li} WHERE l_returnflag = 'R'
  INTERSECT ALL
  SELECT l_suppkey FROM {li} WHERE l_quantity > 25.0
),
ea AS (
  SELECT l_suppkey FROM {li} WHERE l_returnflag = 'R'
  EXCEPT ALL
  SELECT l_suppkey FROM {li} WHERE l_quantity > 25.0
)
SELECT 'intersect_all' AS tag, CAST(l_suppkey AS BIGINT) AS suppkey,
       CAST(COUNT(*) AS BIGINT) AS n
FROM ia GROUP BY l_suppkey
UNION ALL
SELECT 'except_all' AS tag, CAST(l_suppkey AS BIGINT) AS suppkey,
       CAST(COUNT(*) AS BIGINT) AS n
FROM ea GROUP BY l_suppkey
ORDER BY tag NULLS FIRST, suppkey NULLS FIRST
"""


def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U2 multiset] INTERSECT ALL / EXCEPT ALL — the bag-semantics set
    operators q32's DISTINCT variants don't exercise: per supplier,
    INTERSECT ALL keeps min(multiplicity) of returned vs high-quantity
    line items and EXCEPT ALL keeps the surplus, so the result depends
    on duplicate COUNTS, not membership (SURVEY §2.3 U2; the reference
    delegates set algebra to its SQL engine, dbt_projects.py:362-366).
    The IDENTICAL SQL text runs on both engines (the oracle is this
    string verbatim).

    Scale posture: Spark plans both ALL-variants as a partial-aggregatable
    count per leg + a single hash join on the key (no row-by-row bag
    diff); the two legs and the final GROUP BY all shuffle on l_suppkey,
    so AQE reuses one exchange footprint. The trailing per-key counts keep
    the checked output at supplier cardinality."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_q43")
    return spark.sql(_Q43_SQL.format(li="li_q43"))


_Q44_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
       CAST(COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 100000.0)
            AS BIGINT) AS n_big_custs,
       ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'O') + 0.0, 2)
         AS open_value,
       ROUND(MAX(o_totalprice) FILTER (WHERE o_orderstatus = 'P') + 0.0, 2)
         AS max_pending
FROM {ord}
GROUP BY o_orderpriority
ORDER BY o_orderpriority NULLS FIRST
"""


def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[A3 standard form] aggregate FILTER clauses — the ANSI form of
    q05's sum-of-CASE conditional aggregation, including the shape CASE
    cannot express: COUNT(DISTINCT x) FILTER (...) needs the filter
    BEFORE the distinct-set build, where SUM(CASE...) would count the
    placeholder. The IDENTICAL SQL text runs on both engines (the oracle
    is this string verbatim; ROUND(SUM(double)) follows q13's proven
    large-group convention, with the `+ 0.0` fold since an all-NULL
    filter leg can emit NULL and a rounded sum can emit -0.0).

    Scale posture: every FILTER aggregate stays partial-aggregatable —
    one hash aggregate, map-side combine, a single exchange on the group
    key; the distinct-filter column rewrites to an expand + two-phase
    aggregate exactly like a bare COUNT(DISTINCT)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_q44")
    return spark.sql(_Q44_SQL.format(ord="ord_q44"))


_Q45_SQL = """
SELECT o_orderpriority,
       ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice) + 0.0, 2)
         AS median_price,
       ROUND(PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY o_totalprice) + 0.0, 2)
         AS q1_price,
       ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY o_totalprice) + 0.0, 2)
         AS p90_price,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM {ord}
GROUP BY o_orderpriority
ORDER BY o_orderpriority NULLS FIRST
"""


def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[A-ordered-set] PERCENTILE_CONT / PERCENTILE_DISC WITHIN GROUP —
    the ANSI ordered-set aggregate family (q23 covers the function-call
    percentile surface; this is the standard inverse-distribution syntax,
    identical text on both engines and bit-identical at this data:
    PERCENTILE_DISC returns an actual data value and PERCENTILE_CONT's
    linear interpolation lands on representable doubles; the `+ 0.0`
    fold guards the -0.0 canonicalizer rule regardless). The IDENTICAL
    SQL string runs on both engines (the oracle is this text verbatim).

    Scale posture: Spark plans WITHIN GROUP percentiles as the same
    sort-based percentile aggregate as q23 — one exchange on the group
    key, per-group sort inside the aggregate, no window, no join; cost is
    bounded by group size, and the skew guidance in SCALE.md's q23 row
    (pre-aggregate or sketch for mega-groups) applies unchanged."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_q45")
    return spark.sql(_Q45_SQL.format(ord="ord_q45"))


_Q46_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM {ord}
GROUP BY ALL
ORDER BY ALL
"""


def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[GS-resolution] GROUP BY ALL / ORDER BY ALL — the inferred-grouping
    resolution rule (group on every non-aggregate select item, order on
    every output column), supported with identical semantics by both
    engines; the IDENTICAL SQL text runs on both (the oracle is this
    string verbatim). The grouped columns are non-NULL so the engines'
    differing ORDER BY null-placement defaults cannot diverge — and the
    driver canonicalizer re-sorts rows regardless; what this query pins is
    the RESOLUTION, that both engines infer the same grouping set.

    Scale posture: resolves to exactly q13's plan family — one
    partial-aggregatable hash aggregate, one exchange on the inferred
    keys; sugar adds no physical operator."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_q46")
    return spark.sql(_Q46_SQL.format(ord="ord_q46"))


QUERIES = {
    "q01_projection_cast": q01,
    "q02_case_boolean": q02,
    "q03_filters": q03,
    "q04_join_agg": q04,
    "q05_conditional_agg": q05,
    "q06_multiway_join": q06,
    "q07_distinct_unique": q07,
    "q08_union_literal": q08,
    "q09_topk": q09,
    "q10_lag_lead": q10,
    "q11_dedup_rank": q11,
    "q12_sessionize": q12,
    "q13_rollup": q13,
    "q14_date_spine": q14,
    "q15_time_grain": q15,
    "q16_incremental_watermark": q16,
    "q17_not_null": q17_not_null,
    "q17_accepted_values": q17_accepted_values,
    "q18_relationships": q18,
    "q19_expression_test": q19,
    "q20_cosine_exact": q20,
    "q21_text_facets": q21,
    "q22_tumbling_window": q22,
    "q23_percentile_stats": q23,
    "q24_corr_cov": q24,
    "q25_metric_derived": q25,
    "q26_pivot": q26,
    "q27_rank_windows": q27,
    "q28_exists_semijoin": q28,
    "q29_correlated_scalar": q29,
    "q30_grouping_sets": q30,
    "q31_range_frame": q31,
    "q32_set_ops": q32,
    "q33_full_outer_join": q33,
    "q34_posexplode_tokens": q34,
    "q35_unpivot": q35,
    "q36_nested_agg": q36,
    "q37_hof_vector_norm": q37,
    "q38_fuzzy_match": q38,
    "q39_time_range_frame": q39,
    "q40_recursive_hierarchy": q40,
    "q41_lateral_topk": q41,
    "q42_not_in_anti": q42,
    "q43_multiset_ops": q43,
    "q44_filtered_agg": q44,
    "q45_ordered_set_agg": q45,
    "q46_group_by_all": q46,
    "q_g4_boundary_access": q_g4,
    "q_g7_cross_project_edges": q_g7,
    "q_g8_project_cycle": q_g8,
    "q_g10_macro_closure": q_g10,
    "q_g12_group_closure": q_g12,
    "q_v7_version_resolution": q_v7,
    "q_l1_dependency_detection": q_l1,
    "q_l2_package_dependencies": q_l2,
}


ORACLES = {
    "q40_recursive_hierarchy": _Q40_SQL.format(tbl="part"),
    "q41_lateral_topk": _Q41_SQL.format(cust="customer", ord="orders"),
    "q42_not_in_anti": _Q42_SQL.format(cust="customer", ord="orders"),
    "q43_multiset_ops": _Q43_SQL.format(li="lineitem"),
    "q44_filtered_agg": _Q44_SQL.format(ord="orders"),
    "q45_ordered_set_agg": _Q45_SQL.format(ord="orders"),
    "q46_group_by_all": _Q46_SQL.format(ord="orders"),
    "q_g7_cross_project_edges": _Q_G7_SQL,
    "q_g8_project_cycle": _Q_G8_SQL,
    "q_g10_macro_closure": _Q_G10_SQL,
    "q_g12_group_closure": _Q_G12_SQL,
    "q_v7_version_resolution": _Q_V7_SQL,
    "q_l2_package_dependencies": _Q_L2_SQL,
    "q39_time_range_frame": """
WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
SELECT event_id, user_id,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
         AS n_last_hour,
       ROUND(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS last_purchase_value
FROM e
ORDER BY event_id NULLS FIRST
""",
    "q38_fuzzy_match": """
WITH pert AS (
  SELECT s_suppkey AS p_suppkey, translate(s_name, '#', '@') AS p_name FROM supplier
),
lk AS (
  SELECT s_suppkey, s_name, i,
         substring(s_name,
                   CAST(i * (length(s_name) // 3) + least(i, length(s_name) % 3) + 1 AS INT),
                   CAST((length(s_name) // 3) + CASE WHEN i < length(s_name) % 3 THEN 1 ELSE 0 END AS INT)) AS chunk
  FROM supplier, range(0, 3) t(i)
),
rk AS (
  SELECT p_suppkey, p_name, i,
         substring(p_name,
                   CAST(i * (length(p_name) // 3) + least(i, length(p_name) % 3) + 1 AS INT),
                   CAST((length(p_name) // 3) + CASE WHEN i < length(p_name) % 3 THEN 1 ELSE 0 END AS INT)) AS chunk
  FROM pert, range(0, 3) t(i)
),
ok AS (
  SELECT lc.i, lc.chunk
  FROM (SELECT i, chunk, COUNT(*) AS n_l FROM lk GROUP BY i, chunk) lc
  JOIN (SELECT i, chunk, COUNT(*) AS n_r FROM rk GROUP BY i, chunk) rc
    ON lc.i = rc.i AND lc.chunk = rc.chunk
  WHERE lc.n_l * rc.n_r <= 100000
),
cand AS (
  SELECT DISTINCT lk.s_suppkey, lk.s_name, rk.p_suppkey, rk.p_name
  FROM lk
  JOIN ok ON lk.i = ok.i AND lk.chunk = ok.chunk
  JOIN rk ON rk.i = ok.i AND rk.chunk = ok.chunk
  WHERE abs(length(lk.s_name) - length(rk.p_name)) <= 2
)
SELECT s_suppkey, p_suppkey, s_name, p_name,
       CAST(levenshtein(s_name, p_name) AS INT) AS dist
FROM cand
WHERE levenshtein(s_name, p_name) <= 2
ORDER BY s_suppkey NULLS FIRST, p_suppkey NULLS FIRST
""",
    "q36_nested_agg": """
SELECT o_custkey,
       array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_custkey
ORDER BY o_custkey NULLS FIRST
""",
    "q37_hof_vector_norm": """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dims,
       ROUND(sqrt(list_aggregate(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4) AS l2_norm
FROM embeddings
ORDER BY vec_id NULLS FIRST
""",
    "q32_set_ops": """
SELECT 'both' AS tag, o_custkey FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
UNION ALL
SELECT 'only_open' AS tag, o_custkey FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
ORDER BY tag NULLS FIRST, o_custkey NULLS FIRST
""",
    "q33_full_outer_join": """
WITH od AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
sd AS (
  SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS n_ships
  FROM lineitem GROUP BY CAST(l_shipdate AS DATE)
)
SELECT COALESCE(od.d, sd.d) AS day, od.n_orders, sd.n_ships
FROM od FULL OUTER JOIN sd ON od.d = sd.d
ORDER BY day NULLS FIRST
""",
    "q34_posexplode_tokens": """
SELECT doc_id, CAST(pos AS BIGINT) AS pos, tok FROM (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
) t WHERE pos <= 3
ORDER BY doc_id NULLS FIRST, pos NULLS FIRST
""",
    "q35_unpivot": """
SELECT measure,
       CAST(ROUND(SUM(value), 2) AS DOUBLE) AS total,
       COUNT(*) AS n
FROM (
  SELECT 'discount' AS measure, CAST(l_discount AS DECIMAL(18,4)) AS value FROM lineitem
  UNION ALL
  SELECT 'extendedprice', CAST(l_extendedprice AS DECIMAL(18,4)) FROM lineitem
  UNION ALL
  SELECT 'quantity', CAST(l_quantity AS DECIMAL(18,4)) FROM lineitem
  UNION ALL
  SELECT 'tax', CAST(l_tax AS DECIMAL(18,4)) FROM lineitem
) GROUP BY measure
ORDER BY measure NULLS FIRST
""",
    "q30_grouping_sets": """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
ORDER BY gid NULLS FIRST, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
    "q31_range_frame": """
SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey
         ORDER BY datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
         RANGE BETWEEN 90 PRECEDING AND CURRENT ROW
       ), 2) AS DOUBLE) AS trailing_90d_spend
FROM orders
ORDER BY o_orderkey NULLS FIRST
""",
    "q28_exists_semijoin": """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
)
ORDER BY c_custkey NULLS FIRST
""",
    "q29_correlated_scalar": """
SELECT o_orderkey, o_totalprice,
       (SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                    AS DOUBLE)
          FROM lineitem WHERE l_orderkey = o_orderkey) AS net_value
FROM orders
WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-02-01'
ORDER BY o_orderkey NULLS FIRST
""",
    "q26_pivot": """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       COALESCE(ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2), 0.0) AS open_total,
       COALESCE(ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2), 0.0) AS filled_total,
       COALESCE(ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2), 0.0) AS partial_total
FROM orders GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE)
ORDER BY month NULLS FIRST
""",
    "q27_rank_windows": """
SELECT o_orderpriority, o_orderkey, rnk, drnk, prnk, quartile, cdist FROM (
  SELECT o_orderpriority, o_orderkey,
         RANK() OVER w AS rnk,
         DENSE_RANK() OVER w AS drnk,
         ROUND(PERCENT_RANK() OVER w, 4) AS prnk,
         NTILE(4) OVER w AS quartile,
         ROUND(CUME_DIST() OVER w, 4) AS cdist
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
) t WHERE rnk <= 5
ORDER BY o_orderpriority NULLS FIRST, rnk NULLS FIRST, o_orderkey NULLS FIRST
""",
    "q01_projection_cast": """
SELECT o_orderkey AS order_id, o_custkey AS customer_id,
       CAST(o_totalprice / 100.0 AS DOUBLE) AS order_total_dollars,
       CAST(o_orderdate AS DATE) AS ordered_on
FROM orders ORDER BY order_id NULLS FIRST
""",
    "q02_case_boolean": """
SELECT p_partkey,
       CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END AS is_brass,
       (p_size > 25) AS is_large
FROM part ORDER BY p_partkey NULLS FIRST
""",
    "q03_filters": """
SELECT o_orderkey, o_orderstatus
FROM orders
WHERE CAST(o_orderdate AS DATE) <= DATE '1997-06-30' AND o_orderpriority = '1-URGENT'
ORDER BY o_orderkey NULLS FIRST
""",
    "q04_join_agg": """
SELECT c.c_custkey, n.n_name, ROUND(SUM(o.o_totalprice), 2) AS total_spend
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, n.n_name
ORDER BY c.c_custkey NULLS FIRST
""",
    "q05_conditional_agg": """
SELECT l_orderkey,
       COUNT(*) AS count_items,
       ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END), 2) AS returned_value,
       ROUND(MIN(l_discount), 2) AS min_disc,
       ROUND(MAX(l_discount), 2) AS max_disc,
       (COUNT(*) > 3) AS is_big_order
FROM lineitem GROUP BY l_orderkey
ORDER BY l_orderkey NULLS FIRST
""",
    "q06_multiway_join": """
WITH item_summary AS (
  SELECT l_orderkey, COUNT(*) AS count_items, ROUND(SUM(l_extendedprice), 2) AS subtotal
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderkey, o.o_orderstatus, i.count_items, i.subtotal, c.c_mktsegment
FROM orders o
LEFT JOIN item_summary i ON o.o_orderkey = i.l_orderkey
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_orderkey NULLS FIRST
""",
    "q07_distinct_unique": """
SELECT COUNT(DISTINCT o_custkey) AS n_customers,
       (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1) d) AS dup_keys
FROM orders
""",
    "q08_union_literal": """
SELECT id, colleague FROM (
  SELECT 1 AS id, 'grace' AS colleague UNION ALL SELECT 2, 'dave' UNION ALL SELECT 2, 'dave'
) u ORDER BY id NULLS FIRST, colleague NULLS FIRST
""",
    "q09_topk": """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
FROM orders ORDER BY o_totalprice DESC NULLS FIRST, o_orderkey NULLS FIRST LIMIT 10
""",
    "q10_lag_lead": """
SELECT o_custkey, o_orderkey,
       LAG(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
       LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
FROM orders ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST
""",
    "q11_dedup_rank": """
SELECT event_id, user_id, event_type FROM (
  SELECT e.*, ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events e
) t WHERE rn = 1 ORDER BY event_id NULLS FIRST
""",
    "q12_sessionize": """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              OR ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, event_id,
       CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
FROM flagged ORDER BY user_id NULLS FIRST, event_id NULLS FIRST
""",
    "q13_rollup": """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY status NULLS FIRST, priority NULLS FIRST
""",
    "q14_date_spine": """
SELECT CAST(d.date_day AS DATE) AS date_day, COUNT(o.o_orderkey) AS orders_that_day
FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS date_day FROM orders) d
LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = d.date_day
GROUP BY d.date_day ORDER BY date_day NULLS FIRST
""",
    "q15_time_grain": """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       ROUND(SUM(o_totalprice), 2) AS order_total, COUNT(*) AS order_count
FROM orders GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE)
ORDER BY month NULLS FIRST
""",
    "q16_incremental_watermark": """
SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
FROM orders
WHERE o_orderdate >= (SELECT date_trunc('year', MAX(o_orderdate)) FROM orders)
ORDER BY o_orderkey NULLS FIRST
""",
    "q17_not_null": """
SELECT COUNT(*) AS null_custkeys FROM orders WHERE o_custkey IS NULL
""",
    "q17_accepted_values": """
SELECT COUNT(*) AS bad_status FROM orders WHERE o_orderstatus NOT IN ('O','F','P')
""",
    "q18_relationships": """
SELECT COUNT(*) AS orphans
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
""",
    "q19_expression_test": """
SELECT COUNT(*) AS violations
FROM lineitem WHERE NOT (l_extendedprice >= 0 AND l_quantity > 0)
""",
    "q20_cosine_exact": """
WITH v AS (
  SELECT CAST(n_nationkey AS DOUBLE) AS a, CAST(n_regionkey AS DOUBLE) AS b, n_name FROM nation
)
SELECT x.n_name AS n1, y.n_name AS n2,
       ROUND((x.a*y.a + x.b*y.b) /
             (SQRT(x.a*x.a + x.b*x.b) * SQRT(y.a*y.a + y.b*y.b) + 1e-9), 2) AS cos_sim
FROM v x JOIN v y ON x.n_name < y.n_name
ORDER BY n1 NULLS FIRST, n2 NULLS FIRST
""",
    "q21_text_facets": """
SELECT lang, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang, source
ORDER BY lang NULLS FIRST, source NULLS FIRST
""",
    "q22_tumbling_window": """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY CAST(date_trunc('day', ts) AS DATE), event_type
ORDER BY day NULLS FIRST, event_type NULLS FIRST
""",
    "q23_percentile_stats": """
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
       ROUND(stddev_samp(o_totalprice), 2) AS sd_price
FROM orders GROUP BY o_orderpriority
ORDER BY o_orderpriority NULLS FIRST
""",
    "q24_corr_cov": """
SELECT l_returnflag,
       ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
       ROUND(covar_samp(l_quantity, l_discount), 4) AS qty_disc_cov,
       ROUND(AVG(l_extendedprice), 2) AS avg_price
FROM lineitem GROUP BY l_returnflag
ORDER BY l_returnflag NULLS FIRST
""",
    "q25_metric_derived": """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       ROUND(SUM(o_totalprice) / COUNT(o_orderkey), 2) AS avg_order_value
FROM orders GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE)
ORDER BY month NULLS FIRST
""",
    "q_g4_boundary_access": """
WITH edges(src, dst) AS (
  SELECT 'a','b' UNION ALL SELECT 'b','c' UNION ALL SELECT 'b','d' UNION ALL SELECT 'd','e'
),
nodes(id) AS (SELECT 'a' UNION ALL SELECT 'b' UNION ALL SELECT 'c' UNION ALL SELECT 'd'),
boundary AS (
  SELECT DISTINCT e.src AS id FROM edges e
  WHERE e.src IN (SELECT id FROM nodes) AND e.dst NOT IN (SELECT id FROM nodes)
),
leaves AS (
  SELECT n.id FROM nodes n WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = n.id)
)
SELECT n.id,
       CASE WHEN n.id IN (SELECT id FROM boundary) OR n.id IN (SELECT id FROM leaves)
            THEN 'protected' ELSE 'private' END AS access
FROM nodes n ORDER BY n.id NULLS FIRST
""",
    "q_l1_dependency_detection": """
WITH my_models(relation_name, unique_id) AS (
  SELECT 'db.main.shared_model', 'model.src_proj_a.shared_model'
  UNION ALL SELECT 'db.main.new_model', 'model.src_proj_a.new_model'
),
their_sources(relation_name, unique_id) AS (
  SELECT 'db.main.SHARED_MODEL', 'source.src_proj_b.src_proj_a.shared_model'
)
SELECT m.unique_id AS upstream_resource, s.unique_id AS downstream_resource
FROM my_models m JOIN their_sources s
  ON LOWER(m.relation_name) = LOWER(s.relation_name)
ORDER BY upstream_resource NULLS FIRST
""",
}
