select
    s.status,
    l.label as status_label,
    count(*) as n_orders
from {{ ref('orders_mart') }} s
left join {{ ref('status_labels') }} l
    on l.status = s.status
group by s.status, l.label
