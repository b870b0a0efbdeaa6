

def test_approx_ndv_sweep_audit_tight_bound(spark, sf_dir):
    """The gated invariant allows 5%; pytest holds the tighter 2% HLL++
    rsd=0.01 expectation per grouping set, and gid must partition the
    CUBE lattice (4 distinct gids for 2 columns)."""
    from app_insights_generator_spark.queries.relational_queries import (
        approx_ndv_sweep_audit_lineitem,
    )
    from pyspark.sql import functions as F

    from app_insights_generator_spark.sources import load_table

    est = (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count_distinct("l_partkey").alias("exact_nd"),
            F.approx_count_distinct("l_partkey", 0.01).alias("approx_nd"),
        )
        .collect()
    )
    assert {r.gid for r in est} == {0, 1, 2, 3}
    for r in est:
        assert abs(r.approx_nd - r.exact_nd) <= 0.02 * r.exact_nd, r
    out = approx_ndv_sweep_audit_lineitem(spark, sf_dir).collect()
    assert all(r.n_violations == 0 for r in out)
    assert len(out) == len(est)


def test_listagg_top_customers_deterministic_order(spark, sf_dir):
    """The listagg string must be the rank order (count DESC, custkey) —
    recomputed independently — and identical across two runs."""
    from collections import Counter

    from app_insights_generator_spark.queries.relational_queries import (
        listagg_top_customers_orders,
    )
    from app_insights_generator_spark.sources import load_table

    rows = {r.priority: r for r in listagg_top_customers_orders(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders").collect()
    per = {}
    for o in orders:
        per.setdefault(o.o_orderpriority, Counter())[o.o_custkey] += 1
    for prio, cnt in per.items():
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert rows[prio].top_customers == ",".join(str(k) for k, _ in top)
        assert rows[prio].n_orders_top5 == sum(v for _, v in top)
    again = {r.priority: r.top_customers
             for r in listagg_top_customers_orders(spark, sf_dir).collect()}
    assert again == {p: r.top_customers for p, r in rows.items()}
