select
    {{ generate_surrogate_key(['c.customer_id', 'c.market_segment']) }} as customer_sk,
    c.customer_id,
    c.customer_name,
    c.market_segment,
    count(o.order_id) as lifetime_orders,
    round(sum(coalesce(o.subtotal, 0.0)), 2) as lifetime_value,
    count(o.order_id) > 3 as is_repeat_buyer
from {{ ref('stg_customers') }} c
left join {{ ref('orders_mart') }} o
    on o.customer_id = c.customer_id
group by c.customer_id, c.customer_name, c.market_segment
