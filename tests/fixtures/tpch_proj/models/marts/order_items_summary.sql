select
    order_id,
    count(*) as count_items,
    round(sum(extended_price), 2) as subtotal,
    round(sum(case when return_flag = 'R' then extended_price else 0.0 end), 2)
        as returned_value
from {{ ref('stg_lineitems') }}
group by order_id
