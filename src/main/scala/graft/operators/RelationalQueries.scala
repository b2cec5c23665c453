package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Tables

/** Relational surface queries: joins, windows, set ops, JSON extraction,
  * top-k. The reference delegates ALL relational work to Spark (SURVEY.md
  * §2.3 verifies it contains no joins/aggs/windows of its own), so this
  * module is the rebuild's demonstration that the full relational surface
  * its callers rely on is present and scale-shaped:
  *
  *  - dimension tables (region/nation) are broadcast — no shuffle of the
  *    fact side for those joins; fact-fact joins (orders⋈lineitem) shuffle
  *    on the join key and AQE handles skew/coalescing;
  *  - money aggregates run over DECIMAL(18,2) — exact, order-independent
  *    arithmetic, so parallel partial aggregation cannot produce
  *    nondeterministic float sums (and the oracle hash-matches);
  *  - double aggregates restricted to order-independent ops (min/max/count);
  *  - top-k = sort+limit (TakeOrderedAndProject — no global sort), or a
  *    per-partition window when grouped.
  */
object RelationalQueries {

  private def dec(c: String) = col(c).cast(DecimalType(18, 2))

  /** Runtime-filter Bloom sizing: 2^18 bits × 3 probes stays a 32 KB
    * broadcast while holding the false-positive rate low for the ~3k
    * (sf0.01) to ~30k (sf0.1) urgent-order keys. */
  val JoinBloomBits = 1 << 18
  val JoinBloomK = 3

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Runtime-filter join: revenue of urgent orders by order status. The
    // dim side (a ~20% slice of orders) outgrows broadcast at real scale,
    // so the join is pinned shuffle-hash — but the FACT side is
    // prefiltered IN-SCAN by a mergeable Bloom built from the dim keys
    // (map-side partials fold to one 32 KB bitmap; the probe is pure
    // column arithmetic inside the scan's codegen), so ~80% of lineitem
    // never enters the exchange. False positives only add wasted shuffle
    // rows — the exact join removes them — so the result is identical to
    // the plain join, which IS the oracle.
    "q_bloom_join" -> ((s, dir) => {
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderstatus"))
      val bloom = urgent.agg(new BloomFilterAgg(JoinBloomBits, JoinBloomK)
        .column(col("o_orderkey")).as("bloom"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .crossJoin(broadcast(bloom))
        .filter(BloomFilterAgg.mightContain(col("bloom"), col("l_orderkey"),
          JoinBloomBits, JoinBloomK))
        .drop("bloom")
        .join(urgent.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(
          sum(dec("l_extendedprice") * (lit(BigDecimal(1)).cast(DecimalType(18, 2)) - dec("l_discount")))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderstatus"))
    }),

    // EXACT global median without a global sort — the two-pass order-
    // statistic shape that scales: pass 1 histograms values into ~1000
    // bounded buckets (one map-side-combined agg, constant-size driver
    // collect), the driver locates the bucket containing rank
    // k = ceil(N/2); pass 2 touches ONLY that bucket (pushed filter) and
    // takes its (k - preceding)-th smallest via sort+limit over a
    // bucket-sized slice. An exact median over 100 TB costs two scans
    // and never sorts more than one bucket; the approx-percentile path
    // (q_quantiles) trades this exactness for one pass.
    "q_exact_median" -> ((s, dir) => {
      import s.implicits._
      val x = Tables.lineitem(s, dir).select(col("l_extendedprice").as("x"))
      val bucket = floor(col("x") / 100.0).cast(LongType)
      val hist = x.groupBy(bucket.as("b")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      val n = hist.map(_._2).sum
      require(n > 0, "q_exact_median: empty lineitem — no median exists")
      val k = (n + 1) / 2
      // explicit fold to the bucket holding rank k: (bucket, cumBefore)
      // for the first bucket whose cumulative count reaches k. 1 <= k <= n
      // guarantees a hit, so the fold's state is Some after the loop.
      val (target, before) = hist
        .foldLeft((Option.empty[(Long, Long)], 0L)) {
          case ((found @ Some(_), cum), _) => (found, cum)
          case ((None, cum), (b, c)) =>
            if (cum + c >= k) (Some((b, cum)), cum) else (None, cum + c)
        }._1.get
      // rank within the bucket: bounded by the bucket's row count — but
      // guard the Int cast anyway (a >2^31-row bucket would silently
      // truncate the limit and return a wrong order statistic)
      val inBucket = k - before
      require(inBucket <= Int.MaxValue,
        s"q_exact_median: rank $inBucket within one bucket overflows limit()")
      val med = x.filter(bucket === target)
        .orderBy("x").limit(inBucket.toInt)
        .agg(max(col("x"))).head().getDouble(0)
      Seq((n, med)).toDF("n", "median")
    }),

    // 5-way join: revenue by nation; dims broadcast, facts shuffle on keys.
    "q_join_revenue_by_nation" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(dec("l_extendedprice") * (lit(BigDecimal(1)).cast(DecimalType(18, 2)) - dec("l_discount")))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Grouped top-k: 3 largest orders per customer (window, partitioned —
    // parallel across customers, never a global sort).
    "q_window_top_orders" -> ((s, dir) => {
      Tables.orders(s, dir)
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .filter(col("rank") <= 3)
        .select(col("o_custkey"), col("rank").cast(LongType).as("rank"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rank"))
    }),

    // Set ops: nations with customers but no suppliers (EXCEPT), and with
    // both (INTERSECT).
    "q_setop_nations" -> ((s, dir) => {
      val custN = Tables.customer(s, dir).select(col("c_nationkey").as("nk")).distinct()
      val suppN = Tables.supplier(s, dir).select(col("s_nationkey").as("nk")).distinct()
      custN.intersect(suppN).withColumn("relation", lit("both"))
        .unionAll(custN.except(suppN).withColumn("relation", lit("cust_only")))
        .orderBy(col("relation"), col("nk"))
    }),

    // JSON property extraction + order-independent double aggs.
    "q_events_json" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("value")).as("min_value"), max(col("value")).as("max_value"))
        .orderBy(col("event_type"))
    }),

    // Tumbling 1-hour event counts — the batch twin of the streaming
    // windowed aggregation (graft.streaming); window start as epoch seconds
    // (raw timestamps never cross the parquet boundary — flavor mismatch).
    "q_events_hourly" -> ((s, dir) => {
      graft.streaming.EventStreams.hourlyCounts(Tables.events(s, dir))
        .orderBy(col("hour_start"), col("event_type"))
    }),

    // Grouped top-k via the bounded mergeable aggregate — same result as
    // q_window_top_orders, different physical shape: state O(k) per group,
    // map-side partial agg ships ≤k rows per (partition, group) into the
    // shuffle, immune to group skew (a window partition can't be split; an
    // agg's partials can). The skew-safe choice at 100 TB.
    "q_topk_grouped_agg" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(TopKAgg.column(3, col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_custkey"), posexplode(col("top")))
        .select(col("o_custkey"), (col("pos") + 1).cast(LongType).as("rank"),
          col("col._2").as("o_orderkey"), col("col._1").as("o_totalprice"))
        .orderBy(col("o_custkey"), col("rank"))
    }),

    // Correlated EXISTS / NOT EXISTS via spark.sql: Catalyst rewrites the
    // subqueries to a semi- and an anti-join on c_custkey — set-membership
    // without materializing match multiplicity (a plain join would both
    // duplicate customers and shuffle the full orders payload).
    "q_exists_customers" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("graft_customer")
      Tables.orders(s, dir).createOrReplaceTempView("graft_orders")
      s.sql("""
        SELECT c_custkey, c_nationkey
        FROM graft_customer
        WHERE EXISTS (SELECT 1 FROM graft_orders o
                      WHERE o.o_custkey = c_custkey)
          AND NOT EXISTS (SELECT 1 FROM graft_orders o
                          WHERE o.o_custkey = c_custkey
                            AND o.o_totalprice > 300000.0)
        ORDER BY c_custkey""")
    }),

    // Window frames: per-customer running revenue and 3-order moving
    // average in ONE window pass (same partitioning+ordering → one sort,
    // one shuffle for both frames). DECIMAL running sums are exact, so the
    // cumulative column hash-matches; the moving average divides the exact
    // decimal sum at the end.
    "q_running_revenue" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("cum_spend",
          sum(dec("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType))
        // divide as DOUBLE: decimal-division scale rules differ between
        // engines, double division of the exact decimal sum does not
        .withColumn("avg3",
          sum(dec("o_totalprice")).over(w.rowsBetween(-2, Window.currentRow))
            .cast(DoubleType) /
            count(lit(1)).over(w.rowsBetween(-2, Window.currentRow))
              .cast(DoubleType))
        .select(col("o_custkey"), col("o_orderkey"), col("cum_spend"), col("avg3"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Hierarchical aggregation: ROLLUP emits (region, nation), per-region
    // subtotals, and the grand total in ONE pass (Expand + single shuffle —
    // not three separate aggregations); GROUPING() disambiguates subtotal
    // rows from genuine NULL keys.
    "q_rollup_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(sum(dec("l_extendedprice")).cast(DoubleType).as("revenue"),
          grouping(col("r_name")).cast(LongType).as("g_region"),
          grouping(col("n_name")).cast(LongType).as("g_nation"))
        .orderBy(col("g_region"), col("g_nation"), col("r_name"), col("n_name"))
    }),

    // CUBE completes the multi-dimensional-totals family next to rollup:
    // all four grouping sets of (return flag, line status) in ONE pass —
    // Catalyst plans an Expand (4x the input rows into one partial agg),
    // which at 100 TB beats four separate scans+aggs as long as the
    // grouping-set count stays small. Grouping ids disambiguate the NULLs.
    "q_cube_pricing" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec("l_quantity")).cast(DoubleType).as("sum_qty"),
          count(lit(1)).as("n_rows"),
          grouping(col("l_returnflag")).cast(LongType).as("g_flag"),
          grouping(col("l_linestatus")).cast(LongType).as("g_status"))
        .orderBy(col("g_flag"), col("g_status"),
          col("l_returnflag"), col("l_linestatus"))
    }),

    // GROUPING SETS — the third multi-dimensional shape next to rollup
    // and cube: exactly the named slices ((priority), (status), ()) and
    // nothing else, the form a reporting layer uses when the full cube's
    // cross products are waste. Same single-shuffle expand execution;
    // grouping() flags disambiguate a NULL key from a rolled-up one, and
    // sorting on the flags first keeps every null column constant within
    // its sort group (no cross-engine null-ordering divergence).
    "q_grouping_sets" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(sum(dec("o_totalprice")).cast(DoubleType).as("sum_price"),
          count(lit(1)).as("n_orders"),
          grouping(col("o_orderpriority")).cast(LongType).as("g_pri"),
          grouping(col("o_orderstatus")).cast(LongType).as("g_st"))
        .orderBy(col("g_pri"), col("g_st"),
          col("o_orderpriority"), col("o_orderstatus"))
    }),

    // Histogram quantiles — the ONE-PASS, mergeable order-statistics path:
    // exact quantiles (q_quantiles) need a per-group sort, which at 100 TB
    // means shuffling every row; fixed-range bin counts are a plain
    // aggregation with constant (n_bins) state per group, map-side
    // combinable, and the estimator reads bin edges off the tiny cumulated
    // histogram. Estimator rule in INTEGER arithmetic (smallest bin with
    // cum*k >= n*q — no doubles, so cross-engine parity is trivial).
    // l_quantity is integral 1..50, so bin = qty-1 and the edge IS the
    // value: estimates are exact here, the machinery is what's exercised.
    "q_quantile_hist" -> ((s, dir) => {
      val bins = 50
      val bin = least(greatest(floor(col("l_quantity") - 1).cast(LongType),
        lit(0L)), lit(bins - 1L))
      val counts = Tables.lineitem(s, dir)
        .select(col("l_returnflag").as("flag"), bin.as("bin"))
        .groupBy(col("flag"), col("bin")).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("flag")).orderBy(col("bin"))
      counts
        .withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(Window.partitionBy(col("flag"))))
        .groupBy(col("flag"))
        .agg(
          (min(when(col("cum") * 2 >= col("n"), col("bin"))) + 1L).as("p50_est"),
          (min(when(col("cum") * 20 >= col("n") * 19, col("bin"))) + 1L).as("p95_est"),
          max(col("n")).as("n_rows"))
        .orderBy("flag")
    }),

    // Salted LARGE×LARGE join (SaltedJoin): lineitem probes orders with the
    // key salted 4 ways by l_linenumber (deterministic — NOT rand(), which
    // breaks exactly-once under task retry), orders replicated 4-fold. The
    // shuffle_hash hint pins the shuffle-join strategy the pattern exists
    // for (Spark would otherwise broadcast this small build side and the
    // salt would be moot). Result is row-identical to the unsalted join —
    // the oracle IS the plain join.
    "q_salted_join" -> ((s, dir) => {
      val build = Tables.orders(s, dir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        .hint("shuffle_hash")
      SaltedJoin.join(Tables.lineitem(s, dir), build, "l_orderkey",
          col("l_linenumber"), 4)
        .groupBy(col("o_orderpriority"))
        .agg(sum(dec("l_extendedprice")).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    }),

    // Hot-key-only salting: a skew-stats pass finds the keys worth
    // splitting (orders with > 4 line items here); only those replicate
    // s-fold on the build side and salt on the probe side — the tail joins
    // 1:1 at salt 0, so the build blowup is hotKeys x s, not |build| x s.
    // Same oracle as the plain join: salting must never change the result.
    "q_salted_join_hotkey" -> ((s, dir) => {
      val build = Tables.orders(s, dir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        .hint("shuffle_hash")
      SaltedJoin.joinSkewAware(Tables.lineitem(s, dir), build, "l_orderkey",
          col("l_linenumber"), s = 4, hotThreshold = 4L)
        .groupBy(col("o_orderpriority"))
        .agg(sum(dec("l_extendedprice")).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    }),

    // lag/lead window navigation: previous/next order price per customer.
    "q_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // RANGE-frame trailing window — the frame type the rows-frame family
    // (running/avg3) can't express: "events in the last HOUR", a
    // time-width frame whose row count varies per row. One hash exchange
    // on user_id; Spark evaluates the moving frame with two sliding
    // bounds over each partition's sort (linear, never re-scans the
    // hour), which is the per-entity time-window shape at any scale.
    // Money sums in exact integer cents (round(value*100): 2-decimal
    // doubles never land on .5, so HALF_UP vs half-away never diverges);
    // timestamps compared as epoch micros, never as raw timestamp cols.
    "q_trailing_window" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          round(col("value") * 100).cast(LongType).as("cents"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-3600L * 1000000L, 0L)
      ev.withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("spend_1h_cents", sum(col("cents")).over(w))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("n_1h"), col("spend_1h_cents"))
        .orderBy("event_id")
    }),

    // ntile quantile bucketing: spend quartiles per market segment — the
    // window family's equal-frequency binning op (lag/lead/running/top
    // cover navigation and ranking; ntile covers cohorting). Partitioned
    // window: parallel across segments, the per-segment sort is the
    // operation's inherent order.
    "q_ntile_spend" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_custkey"),
          ntile(4).over(w).cast(LongType).as("quartile"))
        .groupBy(col("c_mktsegment"), col("quartile"))
        .agg(count(lit(1)).as("n_customers"),
          min(col("c_custkey")).as("first_cust"),
          max(col("c_custkey")).as("last_cust"))
        .orderBy("c_mktsegment", "quartile")
    }),

    // Correlated scalar subquery, decorrelated: parts priced above their
    // OWN type's average ("above-average" per group). Written directly in
    // the decorrelated form Catalyst would rewrite to — per-type avg agg
    // (tiny: one row per type) broadcast back into the scan — because at
    // 100 TB that IS the right plan: one aggregate pass + one broadcast
    // join, never a per-row subquery. Decimal-cast avg for cross-engine
    // exactness, double only at the final compare.
    "q_above_avg_parts" -> ((s, dir) => {
      val avgByType = Tables.part(s, dir)
        .groupBy(col("p_type"))
        .agg((sum(dec("p_retailprice")) / count(lit(1))).as("avg_price"))
      Tables.part(s, dir)
        .join(broadcast(avgByType), "p_type")
        .filter(dec("p_retailprice") > col("avg_price"))
        .groupBy(col("p_type"))
        .agg(count(lit(1)).as("n_above"),
          max(dec("p_retailprice")).cast(DoubleType).as("max_price"),
          min(col("p_partkey")).as("first_part"))
        .orderBy("p_type")
    }),

    // Skew-safe distinct aggregation: COUNT(DISTINCT supplier) per flag as
    // TWO explicit partial-agg stages — groupBy(key, value) then
    // groupBy(key) — the shape that survives a hot key at 100 TB, where a
    // naive distinct funnels the hot key's value set into one task. Both
    // stages are map-side combinable; the associated SUM rides the same
    // two stages (sum of partial decimal sums is exact), so no extra pass.
    "q_distinct_twophase" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_suppkey"))
        .agg(sum(dec("l_quantity")).as("qty_s"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("qty_s")).cast(DoubleType).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // Pivot: event counts per user bucket × event type as columns — one
    // shuffle on the group key; the pivot values are declared, so the plan
    // is a fixed-width conditional aggregation (no second pass to discover
    // columns, which at 100 TB would be a full extra scan).
    "q_pivot_events" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("user_bucket", (col("user_id") % 4).cast(LongType))
        .groupBy(col("user_bucket"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        // a bucket with zero rows of some type pivots to NULL; the oracle's
        // COUNT(*) FILTER says 0 — align (latent divergence on sparse data)
        .na.fill(0L, Seq("click", "view", "purchase", "signup", "error"))
        .orderBy(col("user_bucket"))
    }),

    // Exact quantiles of an integer-valued measure: interpolation lands on
    // k/2 values (deterministic double arithmetic), so the oracle can
    // hash-match quantile_cont. At 100 TB switch to approx_percentile —
    // exact percentile must materialize per-group sorted values.
    "q_quantiles" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.95)").as("p95"))
        .orderBy(col("l_returnflag"))
    }),

    // Global top-k: sort+limit compiles to TakeOrderedAndProject (per-
    // partition heap + driver merge of k, not a cluster sort).
    "q_topk_parts" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
        .limit(10)
    })
  )

  def oracles: Map[String, String] = Map(
    "q_exact_median" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  quantile_disc(l_extendedprice, 0.5) AS median
        |FROM lineitem""".stripMargin,
    "q_bloom_join" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q_join_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q_window_top_orders" ->
      """SELECT o_custkey,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank,
        |  o_orderkey, o_totalprice
        |FROM orders
        |QUALIFY rank <= 3
        |ORDER BY o_custkey, rank""".stripMargin,
    "q_setop_nations" ->
      """WITH custn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
        |suppn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
        |SELECT nk, 'both' AS relation FROM (SELECT nk FROM custn INTERSECT SELECT nk FROM suppn)
        |UNION ALL
        |SELECT nk, 'cust_only' AS relation FROM (SELECT nk FROM custn EXCEPT SELECT nk FROM suppn)
        |ORDER BY relation, nk""".stripMargin,
    "q_events_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_events_hourly" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
        |  event_type, COUNT(*) AS n
        |FROM events
        |GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    "q_exists_customers" ->
      """SELECT c_custkey, c_nationkey
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c_custkey
        |                    AND o.o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_running_revenue" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   / CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS avg3
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_rollup_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(GROUPING(r_name) AS BIGINT) AS g_region,
        |  CAST(GROUPING(n_name) AS BIGINT) AS g_nation
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY g_region, g_nation, r_name, n_name""".stripMargin,
    "q_cube_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_orders,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY g_pri, g_st, o_orderpriority, o_orderstatus""".stripMargin,
    "q_quantile_hist" ->
      """WITH b AS (SELECT l_returnflag AS flag,
        |  LEAST(GREATEST(CAST(FLOOR(l_quantity - 1) AS BIGINT), 0), 49) AS bin
        |  FROM lineitem),
        |c AS (SELECT flag, bin, count(*) AS c FROM b GROUP BY flag, bin),
        |w AS (SELECT flag, bin, c,
        |  SUM(c) OVER (PARTITION BY flag ORDER BY bin) AS cum,
        |  SUM(c) OVER (PARTITION BY flag) AS n FROM c)
        |SELECT flag,
        |  CAST(MIN(CASE WHEN cum*2 >= n THEN bin END) + 1 AS BIGINT) AS p50_est,
        |  CAST(MIN(CASE WHEN cum*20 >= n*19 THEN bin END) + 1 AS BIGINT) AS p95_est,
        |  CAST(MAX(n) AS BIGINT) AS n_rows
        |FROM w GROUP BY flag ORDER BY flag""".stripMargin,
    "q_salted_join" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // hot-key salting is an execution-only rewrite: the oracle IS the
    // plain join, identical to q_salted_join's
    "q_salted_join_hotkey" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_ntile_spend" ->
      """WITH n AS (SELECT c_mktsegment, c_custkey,
        |  CAST(ntile(4) OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
        |  FROM customer)
        |SELECT c_mktsegment, quartile, COUNT(*) AS n_customers,
        |  min(c_custkey) AS first_cust, max(c_custkey) AS last_cust
        |FROM n GROUP BY c_mktsegment, quartile
        |ORDER BY c_mktsegment, quartile""".stripMargin,
    "q_above_avg_parts" ->
      """WITH a AS (SELECT p_type,
        |  SUM(CAST(p_retailprice AS DECIMAL(18,2))) / COUNT(*) AS avg_price
        |  FROM part GROUP BY p_type)
        |SELECT p.p_type, COUNT(*) AS n_above,
        |  CAST(MAX(CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price,
        |  MIN(p.p_partkey) AS first_part
        |FROM part p JOIN a ON p.p_type = a.p_type
        |WHERE CAST(p.p_retailprice AS DECIMAL(18,2)) > a.avg_price
        |GROUP BY p.p_type ORDER BY p.p_type""".stripMargin,
    "q_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_price,
        |  lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_trailing_window" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        |SELECT event_id, user_id, ts_us,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(sum(cents) OVER w AS BIGINT) AS spend_1h_cents
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_distinct_twophase" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_pivot_events" ->
      """SELECT user_id % 4 AS user_bucket,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'view') AS view,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (event_type = 'error') AS error
        |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin,
    "q_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.95) AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // identical result contract to the window formulation — one oracle text
    "q_topk_grouped_agg" ->
      """SELECT o_custkey,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank,
        |  o_orderkey, o_totalprice
        |FROM orders
        |QUALIFY rank <= 3
        |ORDER BY o_custkey, rank""".stripMargin,
    "q_topk_parts" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_retailprice DESC, p_partkey LIMIT 10""".stripMargin
  )
}
