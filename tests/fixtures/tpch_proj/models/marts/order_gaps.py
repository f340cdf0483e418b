# Python model mirroring the reference's pandas model shape
# (/root/reference/test-projects/split/split_proj/models/marts/
#  customer_status_histories.py): per-customer previous/next order via
# window functions — kept distributed (no toPandas) as the scale path.


def model(dbt, session):
    dbt.config(materialized="table")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    orders = dbt.ref("orders_mart")
    w = Window.partitionBy("customer_id").orderBy("ordered_on", "order_id")
    return orders.select(
        "customer_id",
        "order_id",
        "ordered_on",
        F.lag("order_id").over(w).alias("prev_order_id"),
        F.lead("order_id").over(w).alias("next_order_id"),
    )
