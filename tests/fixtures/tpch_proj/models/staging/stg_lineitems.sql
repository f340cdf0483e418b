select
    l_orderkey as order_id,
    l_linenumber as line_number,
    l_quantity as quantity,
    l_extendedprice as extended_price,
    l_discount as discount,
    l_returnflag as return_flag
from {{ source('tpch', 'lineitem') }}
