with source as (
    select * from {{ source('tpch', 'orders') }}
),

renamed as (
    select
        o_orderkey as order_id,
        o_custkey as customer_id,
        o_orderstatus as status,
        {{ cents_to_dollars('o_totalprice', 4) }} as order_total_dollars,
        cast(o_orderdate as date) as ordered_on
    from source
    where o_orderdate <= date '{{ var("cutoff_date") }}'
)

select * from renamed
