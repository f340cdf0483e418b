{{ config(materialized='incremental', unique_key='order_id') }}

select
    o.order_id,
    o.customer_id,
    o.status,
    o.ordered_on,
    o.order_total_dollars,
    coalesce(s.count_items, 0) as count_items,
    coalesce(s.subtotal, 0.0) as subtotal
from {{ ref('stg_orders') }} o
left join {{ ref('order_items_summary') }} s
    on o.order_id = s.order_id

{% if is_incremental() %}
where o.ordered_on >= (select max(ordered_on) from {{ this }})
{% endif %}
