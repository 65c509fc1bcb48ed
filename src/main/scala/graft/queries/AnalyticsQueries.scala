package graft.queries

import graft.Tables
import graft.operators.AsOfJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OLAP analytics surface over the fixture tables: as-of join, pivot,
  * cube rollups, order-deterministic moving aggregates, and exact
  * distributional quantiles — the reporting layer a corpus/metrics
  * pipeline runs after ingest.
  *
  * Cross-engine exactness notes: the moving average works in integer
  * CENTS (sliding double sums are incrementally maintained — add/
  * retract — so their floating error depends on the engine; integer
  * sums don't). Cube averages divide exact integer sums. Quantiles use
  * percentile_disc (an ELEMENT of the set, no interpolation
  * arithmetic). All hash-gated.
  */
object AnalyticsQueries {

  val queries: Map[String, QueryFn] = Map(
    // ---- E7: as-of join — each purchase looks up the user's most
    // recent prior-or-equal click, unbounded lookback. See
    // operators.AsOfJoin for why this is a union+window, not a range
    // join; the DuckDB oracle is the native ASOF LEFT JOIN. ----
    "e7_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("us").as("pus"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("us").as("cus"))
      AsOfJoin.join(purchases, clicks, Seq("user_id"),
          col("pus"), col("cus"), Seq("click_id", "cus"), col("click_id"), "click")
        .select(col("purchase_id"), col("user_id"),
          col("click.click_id").as("click_id"),
          expr("CASE WHEN click.click_id IS NOT NULL THEN (pus - click.cus) div 1000000 END")
            .as("gap_sec"))
        .orderBy("purchase_id")
    }),

    // ---- E13: pure range join (NO equi key) via bucketized rewrite —
    // the join OSS Spark has no native optimization for: points
    // (shipment days) against intervals (7-day order windows). Naive
    // formulation plans a BroadcastNestedLoopJoin scanning points ×
    // windows; the rewrite quantizes time into 7-day buckets so a
    // window spans ≤ 2 buckets (exploded) while each POINT lives in
    // exactly ONE bucket — hence a (window, point) pair can meet in at
    // most one bucket and the equi-join needs NO post-dedup, just the
    // exact containment filter. PlanSpec pins the plan free of
    // BNLJ/CartesianProduct. At 100 TB the bucket key is the shuffle
    // key; bucket width trades duplication factor (window copies)
    // against candidate selectivity, exactly like d14's nprobe/K. ----
    "e13_range_join" -> ((s, dir) => {
      // NTZ timestamps at date granularity; UTC sessions on both
      // engines make the epoch-day number identical
      val w = Tables.orders(s, dir).filter(col("o_orderkey") % 1000 === 0)
        .select(col("o_orderkey").as("win_id"),
          expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS BIGINT)").as("sd"))
      val wb = w.select(col("win_id"), col("sd"),
        explode(array_distinct(array(expr("sd div 7"), expr("(sd + 6) div 7")))).as("bk"))
      val p = Tables.lineitem(s, dir)
        .select(expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE'1970-01-01') AS BIGINT)").as("pd"))
        .withColumn("bk", expr("pd div 7"))
      wb.join(p, Seq("bk"))
        .filter(col("pd") >= col("sd") && col("pd") < col("sd") + 7)
        .groupBy("win_id")
        .agg(count(lit(1)).cast("long").as("n_ship"),
          min("pd").as("first_day"), max("pd").as("last_day"))
        .orderBy("win_id")
    }),

    // ---- E5: pivot — event counts per user bucket × event type. The
    // pivot values are EXPLICIT (no extra distinct-scan to discover
    // them — at scale that pass costs a full shuffle); absent cells
    // coalesce to 0. ----
    "e5_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, dir)
        .groupBy((col("user_id") % 10).as("user_bucket"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("user_bucket") +:
          types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("user_bucket")
    }),

    // ---- T10: cube — doc counts and average length over all
    // (source, lang) grouping sets in one pass (partial-aggregated
    // like any hash aggregate; grouping-set expansion is map-side). ----
    "t10_cube" -> ((s, dir) =>
      Tables.documents(s, dir)
        .cube("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          round(sum("n_chars") * lit(1.0) / count(lit(1)), 4).as("avg_chars"))
        .orderBy(col("source").asc_nulls_first, col("lang").asc_nulls_first)),

    // ---- E6: moving aggregate — 4-row trailing average of event value
    // per user, in integer cents so the sliding sum is exact in both
    // engines (incremental double sums are not). ----
    "e6_moving_avg" -> ((s, dir) => {
      // nulls-LAST on the frame's order key — DuckDB's window default;
      // a null-ts event otherwise heads the Spark frame and shifts
      // every trailing window in the partition (edge-fixture sweep)
      val w = Window.partitionBy("user_id")
        .orderBy(col("us").asc_nulls_last, col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("mavg", round(
          sum("cents").over(w) / lit(100.0) / count(lit(1)).over(w), 4))
        .select(col("event_id"), col("user_id"), col("mavg"))
        .orderBy("event_id")
    }),

    // ---- Q3: TPC-H shipping priority — the classic filter-heavy
    // join + top-k: both fact filters are date predicates that push to
    // the parquet scans, the BUILDING customer slice broadcasts (at
    // any scale: a filtered dimension), and the top-10 runs as a
    // TakeOrdered — no global sort materializes. Revenue is the q5
    // integer-e4 formulation (cents × discount-complement-percent), so
    // the sum and the ordering are BIGINT-exact; ties break on
    // (order_day, l_orderkey) to make the LIMIT deterministic. ----
    "q3_shipping_priority" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.load(s, dir, "orders")
        .filter(expr("CAST(o_orderdate AS DATE) < DATE'1998-06-01'"))
      val li = Tables.load(s, dir, "lineitem")
        .filter(expr("CAST(l_shipdate AS DATE) > DATE'1998-06-01'"))
      val revE4 = round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1.0) - col("l_discount")) * 100).cast("long")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS BIGINT)")
            .as("order_day"),
          col("o_orderpriority"))
        .agg(sum(revE4).cast("long").as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("order_day").asc, col("l_orderkey").asc)
        .limit(10)
        .select("l_orderkey", "revenue_e4", "order_day", "o_orderpriority")
    }),

    // ---- Q5: TPC-H-style multi-join rollup — revenue by region/nation
    // through the lineitem→orders→customer→nation→region chain. The two
    // dimension tables broadcast (no shuffle of the fact chain for
    // them); lineitem↔orders↔customer shuffle on their join keys with
    // AQE free to re-plan. Revenue is computed in exact integer
    // hundredths-of-cents (price and discount are 2-decimal, so
    // cents × discount-pct is an exact long product) with ONE final
    // division — engine-exact, like e6/t12. ----
    "q5_region_revenue" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      val nat = Tables.load(s, dir, "nation")
      val reg = Tables.load(s, dir, "region")
      val revE4 = round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1.0) - col("l_discount")) * 100).cast("long")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(round(sum(revE4) / 10000.0, 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("region", "nation")
    }),

    // ---- Q18: TPC-H large-volume customer — the large-cardinality
    // group-by + semi-join-on-aggregate plan class: EVERY order's
    // quantity total is aggregated (O(|lineitem|) with map-side partial
    // combine — the shuffle this query exists to exercise), the >250
    // survivors become a key set, and the fact re-scan SEMI-joins on it
    // before the final small rollup. The hot set is UN-HINTED: its
    // density is tiny (~0.4% of orders) but its absolute cardinality
    // grows linearly with SF — at 100 TB it is past any broadcast — so
    // the planner (AQE runtime stats) picks broadcast when it fits and
    // degrades to a shuffle semi-join when it doesn't, instead of a
    // forced hint dying at the 8 GB limit (PlanSpec pins the broadcast
    // shape at test scale). Quantities aggregate as exact BIGINTs;
    // top-100 breaks ties on o_orderkey so the LIMIT is deterministic. ----
    "q18_big_orders" -> ((s, dir) => {
      val qty = round(col("l_quantity")).cast("long")
      val hot = Tables.lineitem(s, dir)
        .groupBy("l_orderkey").agg(sum(qty).as("oq"))
        .filter(col("oq") > 250).select("l_orderkey")
      Tables.lineitem(s, dir)
        .join(hot, Seq("l_orderkey"), "left_semi")
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS BIGINT)")
            .as("order_day"),
          col("o_totalprice"))
        .agg(sum(qty).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // ---- Q17: TPC-H small-quantity-order revenue — the correlated-
    // scalar-subquery plan class (l_quantity < 0.2·avg(l_quantity)
    // per part): DECORRELATED, the transform Catalyst itself applies
    // to the subquery form — the per-part average is aggregated ONCE
    // over the selected parts' lineitems and joined back on partkey,
    // never recomputed per outer row. Ordering matters at scale: the
    // brand/size part filter broadcast-SEMI-prunes the fact scan
    // FIRST, so the aggregate only pays for the ~1/25th of lineitem it
    // will ever use; the per-part aggregate (≤ one row per selected
    // part) then broadcasts for the join-back — no shuffle of the
    // pruned fact rows at all. The threshold predicate is exact
    // integer arithmetic: qty < 0.2·(sumq/n) ⟺ 5·qty·n < sumq (n > 0),
    // so no engine ever divides; revenue sums in exact cents like q5
    // with ONE final /700 division. ----
    "q17_small_quantity" -> ((s, dir) => {
      val parts = Tables.load(s, dir, "part")
        .filter(col("p_brand") === "Brand#12" && col("p_size") < 15)
        .select("p_partkey")
      val selected = Tables.lineitem(s, dir)
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), round(col("l_quantity")).cast("long").as("qv"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"))
      val perPart = selected.groupBy("l_partkey")
        .agg(sum("qv").as("sumq"), count(lit(1)).as("n"))
      selected.join(broadcast(perPart), Seq("l_partkey"))
        .filter(lit(5L) * col("qv") * col("n") < col("sumq"))
        .agg(round(sum(col("price_c")) / 700.0, 2).as("avg_yearly"),
          count(lit(1)).as("n_small"))
    }),

    // ---- Q21: TPC-H suppliers-who-kept-the-order-waiting — the
    // multi-way semi/anti SELF-join plan class q1/q3/q5 cannot reach:
    // the late-lineitem set joins BACK against the full lineitem set
    // twice, once semi (another supplier exists on the order) and once
    // anti (no OTHER supplier was also late). Both self-joins are
    // equi-joins on l_orderkey with the supplier inequality as a
    // residual — never a nested loop — and the supplier→nation side is
    // a broadcast dimension chain. The fixture carries no
    // receipt/commit dates, so "late" adapts to l_shipdate more than
    // 90 days past o_orderdate (same columns-off-the-fact shape; the
    // reference predicate is /root/reference semantics-free here).
    // Top-100 by (numwait DESC, s_name) is deterministic. ----
    "q21_waiting_suppliers" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (to_date(col("l_shipdate")) >
            date_add(to_date(col("o_orderdate")), 90)).as("late"))
      val l1 = l.filter(col("late"))
      val sn = Tables.load(s, dir, "supplier")
        .join(Tables.load(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name") === "NATION_19")
        .select(col("s_suppkey"), col("s_name"))
      l1.as("a")
        .join(l.select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).as("b"),
          col("a.l_orderkey") === col("b.ok") && col("a.l_suppkey") =!= col("b.sk"),
          "left_semi")
        .join(l1.select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).as("c"),
          col("a.l_orderkey") === col("c.ok") && col("a.l_suppkey") =!= col("c.sk"),
          "left_anti")
        .join(broadcast(sn), col("a.l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(100)
    }),

    // ---- Q14: TPC-H promo-revenue share — the conditional-aggregate
    // RATIO class: one month of the fact, one dimension join, and a
    // scalar that divides two branches of the SAME aggregation pass
    // (sum-if-promo / sum) — no second scan, no self-join. At scale
    // the month predicate is the workhorse: it pushes to the parquet
    // scan (min/max row-group stats skip everything outside the
    // month), the part dimension broadcasts, and the two sums
    // partial-aggregate map-side into one row. Both branches sum the
    // q5 integer-e4 revenue, so the only division is the final
    // ratio of two exact BIGINTs — identical doubles cross-engine. ----
    "q14_promo_revenue" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
        .filter(to_date(col("l_shipdate")) >= to_date(lit("1998-03-01")) &&
          to_date(col("l_shipdate")) < to_date(lit("1998-04-01")))
        .select(col("l_partkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            round((lit(1) - col("l_discount")) * 100).cast("long")).as("rev_e4"))
      l.join(broadcast(Tables.load(s, dir, "part")
          .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          round(sum(when(col("p_type") === "PROMO", col("rev_e4"))
            .otherwise(0L)) * lit(100.0) / sum(col("rev_e4")), 4).as("promo_pct"),
          count(lit(1)).as("n_items"))
    }),

    // ---- Q19: TPC-H discounted-revenue — the DISJUNCTIVE-predicate
    // join class: three OR'd (brand, size-range, quantity-range)
    // condition arms over a part⋈lineitem join. The plan shape is the
    // point: the disjunction shares one equi-key (partkey), so the
    // join stays a single broadcast-hash equi-join with the OR as a
    // residual filter — never a nested loop over condition arms — and
    // Catalyst factors the per-side implications out of the OR (a
    // part-only size disjunction, a lineitem-only quantity
    // disjunction) and pushes them below the join, so each scan
    // prunes before any pairing. Revenue is the q5 integer-e4 sum. ----
    "q19_disjunctive" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
        .select(col("l_partkey"), round(col("l_quantity")).cast("long").as("qty"),
          (round(col("l_extendedprice") * 100).cast("long") *
            round((lit(1) - col("l_discount")) * 100).cast("long")).as("rev_e4"))
      l.join(broadcast(Tables.load(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("qty").between(1, 15)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
            col("qty").between(10, 25)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
            col("qty").between(20, 35)))
        .agg(round(sum(col("rev_e4")) / 10000.0, 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // ---- Q22: TPC-H global-sales-opportunity — the scalar-subquery +
    // ANTI-join combination q17/q21 each carry half of: customers
    // above the average positive account balance (a one-row aggregate
    // attached by broadcast — the scalar subquery, computed ONCE) who
    // have placed no RECENT orders (anti-join on the date-pruned
    // fact — every fixture customer has SOME order, so the textbook
    // no-orders-at-all arm would gate vacuously; the date filter
    // pushes to the orders scan before the anti-join). The threshold
    // compare is cross-multiplied exact integers (bal·n > sum ⟺
    // bal > sum/n), so neither engine divides; the only division is
    // the final cents→currency display. The fixture has no phone
    // column, so the reference's country-code grouping adapts to
    // c_mktsegment — same shape: group the surviving anti-join rows,
    // count and total. ----
    "q22_dormant_customers" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"),
          round(col("c_acctbal") * 100).cast("long").as("bal_c"))
      val thr = cust.filter(col("bal_c") > 0)
        .agg(sum("bal_c").as("sum_c"), count(lit(1)).as("n_c"))
      cust.crossJoin(broadcast(thr))
        .filter(col("bal_c") * col("n_c") > col("sum_c"))
        .join(Tables.orders(s, dir)
          .filter(to_date(col("o_orderdate")) >= to_date(lit("2000-01-01")))
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("numcust"),
          round(sum("bal_c") / 100.0, 2).as("totacctbal"))
        .orderBy("c_mktsegment")
    }),

    // ---- Q4: TPC-H order-priority checking — the EXISTS class with a
    // CROSS-SIDE residual: orders of one quarter survive iff SOME
    // lineitem of theirs shipped >90 days after the order date. The
    // subquery references BOTH relations (l_shipdate vs o_orderdate),
    // so the decorrelation is a LEFT SEMI equi-join on orderkey with
    // the date inequality as a residual on the matched pair — q18's
    // semi joins on a precomputed key set, q21's on the fact itself;
    // this is the only class where the semi's residual spans sides.
    // The quarter predicate pushes to the orders scan (row-group
    // pruning does the heavy lifting at 100 TB); the semi-join never
    // duplicates orders however many lineitems match. The fixture has
    // no commit/receipt dates, so "late" adapts to the q21 convention
    // (ship > order + 90d). ----
    "q4_order_priority" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .filter(to_date(col("o_orderdate")) >= to_date(lit("1997-01-01")) &&
          to_date(col("o_orderdate")) < to_date(lit("1997-04-01")))
        .select(col("o_orderkey"), col("o_orderpriority"),
          to_date(col("o_orderdate")).as("od"))
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
      ord.join(li,
          col("o_orderkey") === col("l_orderkey") && col("sd") > date_add(col("od"), 90),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // ---- Q7: TPC-H volume shipping — the SYMMETRIC-PAIR disjunction
    // class: revenue flowing between two nations in either direction,
    // grouped by (supplier nation, customer nation, ship year). The
    // plan point: both endpoint filters (nation ∈ {A, B}) are applied
    // to the DIMENSION maps before any fact work — the implication
    // the OR can't hide — so the fact only joins two tiny broadcast
    // maps and the (A→B | B→A) pair disjunction is a residual ABOVE
    // equi-joins, never a join condition that would force a nested
    // loop. At 100 TB the two-year ship-date predicate prunes the
    // fact scan and everything downstream is broadcast. ----
    "q7_volume_shipping" -> ((s, dir) => {
      val n1 = "NATION_1"; val n2 = "NATION_2"
      val nat = Tables.load(s, dir, "nation")
      val supp = Tables.load(s, dir, "supplier")
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name").isin(n1, n2))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, dir)
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .filter(col("n_name").isin(n1, n2))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val li = Tables.lineitem(s, dir)
        .filter(to_date(col("l_shipdate")).between(lit("1996-01-01"), lit("1997-12-31")))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(to_date(col("l_shipdate"))).as("l_year"),
          (round(col("l_extendedprice") * 100).cast("long") *
            round((lit(1) - col("l_discount")) * 100).cast("long")).as("rev_e4"))
      li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
          (col("supp_nation") === n2 && col("cust_nation") === n1))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(round(sum("rev_e4") / 10000.0, 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // ---- Q8: TPC-H national market share — the GROUPED conditional
    // ratio q14 computes as one scalar: per order-year, the share of
    // ASIA customers' ECONOMY-part spend served by NATION_7 suppliers.
    // One aggregation pass carries both branches (sum-if-nation /
    // sum); the part-type filter broadcast-prunes the fact FIRST (the
    // ~1/6 selectivity is the cheapest cut available), the supplier→
    // nation and customer→nation→region chains are broadcast maps.
    // Numerator and denominator are exact e4 BIGINTs; the single
    // division happens once per year row. ----
    "q8_market_share" -> ((s, dir) => {
      val nat = Tables.load(s, dir, "nation")
      val ecoParts = Tables.load(s, dir, "part")
        .filter(col("p_type") === "ECONOMY").select("p_partkey")
      val suppN = Tables.load(s, dir, "supplier")
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val asiaCust = Tables.customer(s, dir)
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .join(Tables.load(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select("c_custkey")
      Tables.lineitem(s, dir)
        .join(broadcast(ecoParts), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            round((lit(1) - col("l_discount")) * 100).cast("long")).as("rev_e4"))
        .join(Tables.orders(s, dir)
            .select(col("o_orderkey"), col("o_custkey"),
              year(to_date(col("o_orderdate"))).as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
        .groupBy("o_year")
        .agg(round(sum(when(col("supp_nation") === "NATION_7", col("rev_e4"))
            .otherwise(0L)) * lit(100.0) / sum(col("rev_e4")), 4).as("mkt_share_pct"),
          count(lit(1)).as("n_items"))
        .orderBy("o_year")
    }),

    // ---- Q11: TPC-H important stock — group-level aggregate vs a
    // GLOBAL scalar of the SAME aggregation: per-part inventory value
    // (price × qty, exact cents) kept only where it exceeds 1.3× the
    // average part's value. TPC-H's own q11 thresholds on a FRACTION
    // of the total, which only works because its spec scales the
    // fraction by 1/SF — a share-of-total cutoff empties as the part
    // count grows. The mean-relative form is scale-invariant, and the
    // threshold stays cross-multiplied integers (10·value·n > 13·total
    // — no division anywhere but display). The per-part frame feeds
    // both the scalar and the filter; at 100 TB that's one map-side-
    // combined shuffle of the fact, then driver-free broadcast scalar
    // attachment. (No partsupp in the fixture; lineitem is the
    // part-inventory relation.) ----
    "q11_important_parts" -> ((s, dir) => {
      val pp = Tables.lineitem(s, dir)
        .select(col("l_partkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            round(col("l_quantity")).cast("long")).as("val_c"))
        .groupBy("l_partkey").agg(sum("val_c").as("value_c"))
      val tot = pp.agg(sum("value_c").as("total_c"), count(lit(1)).as("n_parts"))
      pp.crossJoin(broadcast(tot))
        .filter(col("value_c") * col("n_parts") * 10 > col("total_c") * 13)
        .select(col("l_partkey"), round(col("value_c") / 100.0, 2).as("value"))
        .orderBy(col("value_c").desc, col("l_partkey").asc)
        .select("l_partkey", "value")
    }),

    // ---- Q13: TPC-H customer distribution — the OUTER-join-with-ON-
    // filter + count-of-counts class: every customer (including the
    // order-less) counted by how many non-urgent orders they placed,
    // then the distribution of those counts. The ON-clause filter is
    // the trap this class exists for: filtering orders BEFORE the
    // left join (≡ the filter in the ON clause) keeps zero-order
    // customers; filtering after would delete them. Two aggregations:
    // per-customer (shuffle on custkey — the join already partitioned
    // it there, so AQE coalesces) and the tiny count-histogram. ----
    "q13_customer_distribution" -> ((s, dir) =>
      Tables.customer(s, dir).select("c_custkey")
        .join(Tables.orders(s, dir)
            .filter(col("o_orderpriority") =!= "1-URGENT")
            .select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)),

    // ---- Q15: TPC-H top supplier — the ARGMAX-against-global-max
    // class: quarterly revenue per supplier, keep the supplier(s)
    // achieving the maximum. The max is a one-row aggregate over the
    // per-supplier frame attached by broadcast and compared EXACTLY
    // (e4 BIGINTs — the reason TPC-H's own Q15 warns about ties is
    // float revenue; integer revenue makes the argmax deterministic).
    // Same shape as q11 but max instead of sum-fraction: aggregate
    // once, attach scalar, filter, enrich from the broadcast dim. ----
    "q15_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(to_date(col("l_shipdate")) >= to_date(lit("1997-10-01")) &&
          to_date(col("l_shipdate")) < to_date(lit("1998-01-01")))
        .groupBy(col("l_suppkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          round((lit(1) - col("l_discount")) * 100).cast("long")).as("total_rev_e4"))
      val mx = rev.agg(max("total_rev_e4").as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_rev_e4") === col("mx"))
        .join(broadcast(Tables.load(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("total_rev_e4") / 10000.0, 2).as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // ---- Q16: TPC-H supplier relation count — COUNT-DISTINCT over an
    // ANTI-joined relation: how many distinct suppliers can deliver
    // each surviving (brand, type, size) combination, excluding the
    // "complaint" suppliers (negative balance — the fixture's stand-in
    // for the complaint scan). The part filters broadcast-prune the
    // fact to the selected combinations BEFORE the distinct shuffle;
    // the exclusion set is a broadcast anti-join (NOT IN with a
    // guaranteed-non-null key set). countDistinct expands to a
    // two-level aggregate — partial distinct map-side on (group, supp)
    // — so the shuffle carries pairs, never raw lineitems. (lineitem
    // is the part↔supplier relation; the fixture has no partsupp.) ----
    "q16_supplier_counts" -> ((s, dir) => {
      val pts = Tables.load(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val excl = Tables.load(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
        .join(broadcast(pts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
          col("p_type").asc, col("p_size").asc)
    }),

    // ---- Q20: TPC-H excess suppliers — the NESTED decorrelation
    // chain: EUROPE suppliers who, for some 'small*' part, shipped
    // more than 20% of that part's 1998 volume. Three levels collapse
    // into two aggregations and two semi-joins: the name-filtered part
    // set broadcast-prunes the year's fact slice; (part, supplier)
    // totals aggregate once; per-part totals aggregate FROM that
    // frame (a rollup of the first aggregate — no second fact scan);
    // the 5·sq > tq threshold is exact integers; qualifying suppkeys
    // dedup into a key set that SEMI-joins the supplier dimension
    // under its region filter. The oracle keeps the textbook
    // correlated HAVING-subquery form, gating the flattened plan
    // against the original semantics. ----
    "q20_excess_suppliers" -> ((s, dir) => {
      val smallParts = Tables.load(s, dir, "part")
        .filter(col("p_name").startsWith("small")).select("p_partkey")
      val perPS = Tables.lineitem(s, dir)
        .filter(year(to_date(col("l_shipdate"))) === 1998)
        .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"),
          round(col("l_quantity")).cast("long").as("qv"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum("qv").as("sq"))
      val perP = perPS.groupBy("l_partkey").agg(sum("sq").as("tq"))
      val qual = perPS.join(broadcast(perP), Seq("l_partkey"))
        .filter(col("sq") * 5 > col("tq"))
        .select("l_suppkey").distinct()
      Tables.load(s, dir, "supplier")
        .join(broadcast(Tables.load(s, dir, "nation")
            .join(Tables.load(s, dir, "region"),
              col("n_regionkey") === col("r_regionkey"))
            .filter(col("r_name") === "EUROPE").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"), "left_semi")
        .join(broadcast(qual), col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),

    // ---- E9: interval join — events counted into 24 OVERLAPPING 2-hour
    // maintenance windows. Deliberately NOT a range join (a BNL range
    // join touches every (event, window) pair): each window explodes
    // into the hour BINS it covers, events key to their single bin, and
    // a broadcast equi-join on bin + residual range check does the rest
    // — O(events) work, the standard time-bucketed interval join. An
    // event in a 2-bin window joins exactly one (window, bin) row, so
    // no dedup is needed. The DuckDB oracle is the plain range join. ----
    "e9_interval_join" -> ((s, dir) => {
      val hourUs = 3600L * 1000000
      val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z
      val wins = s.range(0, 24).select(col("id").as("w_id"),
        (lit(baseUs) + col("id") * hourUs).as("start_us"),
        (lit(baseUs) + (col("id") + 2) * hourUs).as("end_us"))
      val binned = wins.select(col("w_id"), col("start_us"), col("end_us"),
        explode(sequence(expr("start_us div " + hourUs),
          expr("(end_us - 1) div " + hourUs))).as("bin"))
      val ev = Tables.events(s, dir)
        .select(unix_micros(col("ts")).as("us"), col("value"))
        .withColumn("bin", expr("us div " + hourUs))
      val counts = broadcast(binned).join(ev, Seq("bin"))
        .filter(col("us") >= col("start_us") && col("us") < col("end_us"))
        .groupBy("w_id")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sv"))
      wins.select("w_id").join(counts, Seq("w_id"), "left")
        .select(col("w_id"), coalesce(col("n"), lit(0L)).as("n_events"),
          coalesce(col("sv"), lit(0.0)).as("sum_value"))
        .orderBy("w_id")
    }),

    // ---- E8: conversion funnel — per user, the earliest signup, the
    // earliest click strictly after it, and the earliest purchase
    // strictly after that (ordered sequence mining, the product-
    // analytics staple). Three key-hash aggregations, each with map-side
    // partial min; no window over the full event stream. ----
    "e8_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("us").as("signup_us"))
      val s2 = s1.join(ev.filter(col("event_type") === "click")
            .select(col("user_id"), col("us").as("cus")), Seq("user_id"), "left")
        .groupBy("user_id", "signup_us")
        .agg(min(when(col("cus") > col("signup_us"), col("cus"))).as("click_us"))
      val s3 = s2.join(ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("us").as("pus")), Seq("user_id"), "left")
        .groupBy("user_id", "signup_us", "click_us")
        .agg(min(when(col("pus") > col("click_us"), col("pus"))).as("purchase_us"))
      s3.select(col("user_id"), col("signup_us"), col("click_us"), col("purchase_us"),
          col("purchase_us").isNotNull.as("converted"))
        .orderBy("user_id")
    }),

    // ---- T12: custom typed Aggregator — exact integer-moment variance
    // and stddev per source (see functions.IntMomentsAggregator for why
    // integer moments are the cross-engine-exact formulation). The udaf
    // participates in partial aggregation like any built-in (map-side
    // combine, one reduce shuffle). ----
    "t12_moments" -> ((s, dir) => {
      val mom = udaf(graft.functions.IntMomentsAggregator)
      Tables.documents(s, dir)
        .groupBy("source")
        .agg(mom(col("n_chars")).as("m"))
        .select(col("source"), col("m.n").as("n_docs"), col("m.sum").as("sum_chars"),
          round((col("m.sumSq") * col("m.n") - col("m.sum") * col("m.sum")) * lit(1.0) /
            (col("m.n") * col("m.n")), 4).as("var_pop"),
          round(sqrt((col("m.sumSq") * col("m.n") - col("m.sum") * col("m.sum")) * lit(1.0) /
            (col("m.n") * col("m.n"))), 4).as("stddev_pop"))
        .orderBy("source")
    }),

    // ---- T11: exact per-source vocabulary size (count distinct over
    // exploded tokens — one hash shuffle with map-side partial distinct).
    // The 100 TB path is the HLL sketch (approx_count_distinct);
    // QualitySpec asserts the sketch lands within 5% of this exact
    // result, and the exact form is the oracle gate. ----
    "t11_distinct_counts" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("t"))
        .groupBy("source")
        .agg(countDistinct("t").as("n_vocab"), count(lit(1)).as("n_tokens"))
        .orderBy("source")),

    // ---- T9: exact distribution quantiles of document length per
    // source via percentile_disc (order statistics, not interpolation —
    // the returned values are corpus ELEMENTS, so both engines agree
    // exactly). At 100 TB the one-pass approx_percentile sketch replaces
    // this; the exact form is the oracle-checkable twin. ----
    "t9_quantiles" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy("source")
        .agg(
          // percentile_disc returns DOUBLE in Spark but the order
          // statistic of a BIGINT column IS a bigint — cast so the
          // schema matches DuckDB's quantile_disc exactly
          expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY n_chars)").cast("long").as("p25"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)").cast("long").as("p50"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars)").cast("long").as("p90"),
          max("n_chars").as("p100"))
        .orderBy("source"))
  )

  val oracle: Map[String, String] = Map(
    // e13's twin is the DIRECT range join — DuckDB plans IEJoin for it,
    // which is the point: the oracle may brute-force what the engine
    // must bucketize.
    "e13_range_join" ->
      """WITH w AS (SELECT o_orderkey AS win_id,
        |    CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS sd
        |  FROM orders WHERE o_orderkey % 1000 = 0),
        | p AS (SELECT CAST(epoch(l_shipdate) AS BIGINT) // 86400 AS pd FROM lineitem)
        |SELECT win_id, CAST(count(*) AS BIGINT) AS n_ship,
        |  min(pd) AS first_day, max(pd) AS last_day
        |FROM w JOIN p ON p.pd >= w.sd AND p.pd < w.sd + 7
        |GROUP BY win_id ORDER BY win_id""".stripMargin,

    "e7_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
        | p AS (SELECT event_id AS purchase_id, user_id, us AS pus FROM e
        |   WHERE event_type = 'purchase'),
        | c AS (SELECT event_id AS click_id, user_id, us AS cus FROM e
        |   WHERE event_type = 'click')
        |SELECT p.purchase_id, p.user_id, c.click_id,
        | CASE WHEN c.click_id IS NOT NULL THEN (p.pus - c.cus) // 1000000 END AS gap_sec
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.pus >= c.cus
        |ORDER BY purchase_id""".stripMargin,

    "e5_pivot" ->
      """SELECT user_id % 10 AS user_bucket,
        | CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
        | CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
        | CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
        | CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
        | CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin,

    "t10_cube" ->
      """SELECT source, lang, count(*) AS n_docs,
        | round(CAST(sum(n_chars) AS BIGINT) * 1.0 / count(*), 4) AS avg_chars
        |FROM documents GROUP BY CUBE (source, lang)
        |ORDER BY source NULLS FIRST, lang NULLS FIRST""".stripMargin,

    "e6_moving_avg" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
        |     CAST(round("value" * 100) AS BIGINT) AS cents FROM events),
        | m AS (SELECT event_id, user_id,
        |     round(CAST(sum(cents) OVER w AS BIGINT) / 100.0 /
        |       count(*) OVER w, 4) AS mavg
        |   FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
        |     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, mavg FROM m ORDER BY event_id""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |     CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS order_day,
        | o_orderpriority
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND CAST(o_orderdate AS DATE) < DATE '1998-06-01'
        |  AND CAST(l_shipdate AS DATE) > DATE '1998-06-01'
        |GROUP BY 1, 3, 4
        |ORDER BY revenue_e4 DESC, order_day, l_orderkey LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT r_name AS region, n_name AS nation,
        | round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |     CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 10000.0, 2)
        |   AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY region, nation""".stripMargin,

    "q18_big_orders" ->
      """SELECT c_name, c_custkey, o_orderkey,
        | datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS order_day,
        | o_totalprice,
        | CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 250)
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    // q17's oracle keeps the CORRELATED subquery form — DuckDB
    // decorrelates it itself, proving the engine's hand-decorrelated
    // plan computes the textbook semantics (same integer-exact
    // threshold arithmetic on both sides).
    "q17_small_quantity" ->
      """WITH sel AS (SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS qv,
        |     CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
        |   FROM lineitem JOIN part ON l_partkey = p_partkey
        |   WHERE p_brand = 'Brand#12' AND p_size < 15)
        |SELECT round(CAST(sum(price_c) AS DOUBLE) / 700.0, 2) AS avg_yearly,
        |  CAST(count(*) AS BIGINT) AS n_small
        |FROM sel s1
        |WHERE 5 * qv * (SELECT count(*) FROM sel s2 WHERE s2.l_partkey = s1.l_partkey)
        |    < (SELECT sum(qv) FROM sel s2 WHERE s2.l_partkey = s1.l_partkey)""".stripMargin,

    "q21_waiting_suppliers" ->
      """WITH l AS (SELECT l_orderkey, l_suppkey,
        |     CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS late
        |   FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |   WHERE o_orderstatus = 'F')
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM l l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_19' AND l1.late
        |  AND EXISTS (SELECT 1 FROM l l2 WHERE l2.l_orderkey = l1.l_orderkey
        |    AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM l l3 WHERE l3.l_orderkey = l1.l_orderkey
        |    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,

    "q14_promo_revenue" ->
      """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |     THEN CAST(round(l_extendedprice * 100) AS BIGINT) *
        |          CAST(round((1 - l_discount) * 100) AS BIGINT) ELSE 0 END) /
        |   sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |       CAST(round((1 - l_discount) * 100) AS BIGINT)), 4) AS promo_pct,
        | CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1998-03-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1998-04-01'""".stripMargin,

    "q19_disjunctive" ->
      """SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |     CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 10000.0, 2)
        |   AS revenue,
        | CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |    AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |    AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 25)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
        |    AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 35)""".stripMargin,

    // q22's oracle keeps the textbook correlated forms — the scalar
    // AVG subquery and NOT EXISTS — gating the engine's broadcast-
    // scalar + anti-join decorrelation against the original semantics
    // (integer-exact threshold on both sides: bal·n > sum).
    "q22_dormant_customers" ->
      """WITH cust AS (SELECT c_custkey, c_mktsegment,
        |     CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c FROM customer),
        | thr AS (SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c,
        |     CAST(count(*) AS BIGINT) AS n_c FROM cust WHERE bal_c > 0)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
        |  round(CAST(sum(bal_c) AS BIGINT) / 100.0, 2) AS totacctbal
        |FROM cust, thr
        |WHERE bal_c * n_c > sum_c
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND CAST(o_orderdate AS DATE) >= DATE '2000-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // q4's oracle keeps the textbook EXISTS form — DuckDB plans the
    // correlated subquery itself, gating the engine's semi-join-with-
    // cross-side-residual decorrelation against the original semantics.
    "q4_order_priority" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q7_volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        | CAST(year(CAST(l_shipdate AS DATE)) AS INTEGER) AS l_year,
        | round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |     CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 10000.0, 2)
        |   AS revenue,
        | CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        |    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        |  AND CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q8_market_share" ->
      """SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
        | round(100.0 * sum(CASE WHEN sn.n_name = 'NATION_7'
        |     THEN CAST(round(l_extendedprice * 100) AS BIGINT) *
        |          CAST(round((1 - l_discount) * 100) AS BIGINT) ELSE 0 END) /
        |   sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |       CAST(round((1 - l_discount) * 100) AS BIGINT)), 4) AS mkt_share_pct,
        | CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey
        |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,

    "q11_important_parts" ->
      """WITH pp AS (SELECT l_partkey,
        |     CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |       CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS value_c
        |   FROM lineitem GROUP BY l_partkey)
        |SELECT l_partkey, round(value_c / 100.0, 2) AS value
        |FROM pp
        |WHERE value_c * (SELECT count(*) FROM pp) * 10 >
        |      (SELECT sum(value_c) FROM pp) * 13
        |ORDER BY value_c DESC, l_partkey""".stripMargin,

    "q13_customer_distribution" ->
      """WITH cc AS (SELECT c_custkey, count(o_orderkey) AS c_count
        |   FROM customer LEFT JOIN orders
        |     ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |   GROUP BY c_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM cc GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |     CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |       CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_rev_e4
        |   FROM lineitem
        |   WHERE CAST(l_shipdate AS DATE) >= DATE '1997-10-01'
        |     AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        |   GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, round(total_rev_e4 / 10000.0, 2) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q16_supplier_counts" ->
      """SELECT p_brand, p_type, p_size,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // q20's oracle keeps the textbook correlated HAVING-subquery form —
    // DuckDB decorrelates it itself, gating the engine's flattened
    // two-aggregation chain against the original semantics.
    "q20_excess_suppliers" ->
      """WITH li AS (SELECT l_partkey, l_suppkey,
        |     CAST(round(l_quantity) AS BIGINT) AS qv
        |   FROM lineitem
        |   WHERE year(CAST(l_shipdate AS DATE)) = 1998
        |     AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'))
        |SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM li l1 GROUP BY l_partkey, l_suppkey
        |    HAVING 5 * sum(qv) > (SELECT sum(qv) FROM li l2
        |      WHERE l2.l_partkey = l1.l_partkey))
        |ORDER BY s_suppkey""".stripMargin,

    "e9_interval_join" ->
      """WITH w AS (SELECT range AS w_id,
        |     1704067200000000 + range * 3600000000 AS start_us,
        |     1704067200000000 + (range + 2) * 3600000000 AS end_us
        |   FROM range(0, 24)),
        | e AS (SELECT epoch_us(ts) AS us, "value" FROM events),
        | j AS (SELECT w.w_id, count(e.us) AS n, round(sum(e."value"), 2) AS sv
        |   FROM w LEFT JOIN e ON e.us >= w.start_us AND e.us < w.end_us
        |   GROUP BY w.w_id)
        |SELECT w_id, CAST(n AS BIGINT) AS n_events,
        | COALESCE(sv, 0.0) AS sum_value
        |FROM j ORDER BY w_id""".stripMargin,

    "e8_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        | s1 AS (SELECT user_id, min(us) AS signup_us FROM e
        |   WHERE event_type = 'signup' GROUP BY user_id),
        | s2 AS (SELECT s1.user_id, s1.signup_us,
        |     min(CASE WHEN c.us > s1.signup_us THEN c.us END) AS click_us
        |   FROM s1 LEFT JOIN e c ON c.user_id = s1.user_id AND c.event_type = 'click'
        |   GROUP BY s1.user_id, s1.signup_us),
        | s3 AS (SELECT s2.user_id, s2.signup_us, s2.click_us,
        |     min(CASE WHEN p.us > s2.click_us THEN p.us END) AS purchase_us
        |   FROM s2 LEFT JOIN e p ON p.user_id = s2.user_id AND p.event_type = 'purchase'
        |   GROUP BY s2.user_id, s2.signup_us, s2.click_us)
        |SELECT user_id, signup_us, click_us, purchase_us,
        | purchase_us IS NOT NULL AS converted
        |FROM s3 ORDER BY user_id""".stripMargin,

    "t12_moments" ->
      """SELECT source, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | round((CAST(sum(n_chars * n_chars) AS BIGINT) * count(*) -
        |     CAST(sum(n_chars) AS BIGINT) * CAST(sum(n_chars) AS BIGINT)) * 1.0 /
        |   (count(*) * count(*)), 4) AS var_pop,
        | round(sqrt((CAST(sum(n_chars * n_chars) AS BIGINT) * count(*) -
        |     CAST(sum(n_chars) AS BIGINT) * CAST(sum(n_chars) AS BIGINT)) * 1.0 /
        |   (count(*) * count(*))), 4) AS stddev_pop
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "t11_distinct_counts" ->
      """WITH t AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t
        |           FROM documents)
        |SELECT source, count(DISTINCT t) AS n_vocab, count(*) AS n_tokens
        |FROM t GROUP BY source ORDER BY source""".stripMargin,

    "t9_quantiles" ->
      """SELECT source,
        | quantile_disc(n_chars, 0.25) AS p25,
        | quantile_disc(n_chars, 0.5) AS p50,
        | quantile_disc(n_chars, 0.9) AS p90,
        | max(n_chars) AS p100
        |FROM documents GROUP BY source ORDER BY source""".stripMargin
  )
}
