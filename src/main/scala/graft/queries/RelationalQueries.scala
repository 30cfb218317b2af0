package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator coverage over the TPC-H-ish tables (SURVEY.md §2.1:
  * joins, aggregations, windows, sorts/top-k, set ops, grouping sets) —
  * the capabilities a user needs beyond the reference's streaming filters,
  * expressed Spark-first so Catalyst/AQE pick physical strategies.
  *
  * Float-determinism policy for the DuckDB oracle: monetary/quantity sums
  * aggregate in DECIMAL (exact, order-independent — safe under partial
  * aggregation on any cluster size), then cast once to DOUBLE on output.
  */
object RelationalQueries {

  private val dec = DecimalType(18, 2)

  /** q21 interval length AND bin width (µs): a window spans ≤ 2 bins. */
  private val RANGE_WIN_US = 7200000000L // 2 hours

  /** q22 session gap (µs): a quiet 30 min closes the session. */
  private val SESSION_GAP_US = 1800000000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Hash aggregate with partial (map-side) combine; exact decimal sums.
    "q01_agg_sum" -> ((spark: SparkSession, dir: String) =>
      Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base"),
          sum(col("l_extendedprice").cast(dec) *
            (lit(1).cast(dec) - col("l_discount").cast(dec)))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast(dec)).cast("double") / count(lit(1)))
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // Star join: fact orders⨝customer shuffles on the key; the nation and
    // region dims are broadcast (explicit hint — they stay tiny at any SF).
    "q02_join_broadcast" -> ((spark: SparkSession, dir: String) => {
      val o = Tables.orders(spark, dir)
      val c = Tables.customer(spark, dir)
      val n = Tables.nation(spark, dir)
      val r = Tables.region(spark, dir)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(col("o_totalprice").cast(dec)).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Large-large shuffle join on the fact keys + aggregate.
    "q03_join_shuffle" -> ((spark: SparkSession, dir: String) => {
      val l = Tables.lineitem(spark, dir)
      val o = Tables.orders(spark, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          sum((col("l_extendedprice").cast(dec)) *
            (lit(1).cast(dec) - col("l_discount").cast(dec)))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("o_orderpriority"))
    }),

    // Semi join (EXISTS) — no row multiplication, key-only shuffle.
    "q04_semi_join" -> ((spark: SparkSession, dir: String) => {
      val c = Tables.customer(spark, dir)
      val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 100.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Anti join (NOT EXISTS).
    "q05_anti_join" -> ((spark: SparkSession, dir: String) => {
      val c = Tables.customer(spark, dir)
      val o = Tables.orders(spark, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Window function: deterministic top-3 orders per customer.
    "q06_window_topk" -> ((spark: SparkSession, dir: String) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(spark, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Grouping sets via ROLLUP with grouping_id.
    "q07_rollup" -> ((spark: SparkSession, dir: String) =>
      Tables.lineitem(spark, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping_id().cast("long").as("g"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast(dec)).cast("double").as("qty"))
        .orderBy(col("g"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // Set operation: INTERSECT (distinct semantics).
    "q08_intersect" -> ((spark: SparkSession, dir: String) =>
      Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey"))),

    // Set operation: EXCEPT.
    "q09_except" -> ((spark: SparkSession, dir: String) =>
      Tables.nation(spark, dir).select(col("n_nationkey").as("nationkey"))
        .except(Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey"))),

    // Global top-k: sort + limit (Spark executes as TakeOrderedAndProject —
    // per-partition top-k then a single-reduce merge, no full sort).
    "q10_topk_order" -> ((spark: SparkSession, dir: String) =>
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .limit(100)),

    // Exact distinct aggregation (expand + two-phase shuffle).
    "q11_distinct_count" -> ((spark: SparkSession, dir: String) =>
      Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))),

    // Scale-safe distinct counts: KMV sketch (graft.functions.KmvSketch)
    // — O(k) mergeable state per group vs q11's shuffle-every-distinct
    // expand. The md5-based hash family makes the ESTIMATE itself
    // bit-identical in DuckDB, so the oracle hash-matches the sketch
    // output (unlike HLL, whose sketch is engine-private).
    "q11b_distinct_kmv" -> ((spark: SparkSession, dir: String) => {
      val kmv = udaf(new graft.functions.KmvSketch(64))
      Tables.lineitem(spark, dir)
        .select(col("l_returnflag"),
          conv(substring(md5(col("l_partkey").cast("string")), 1, 15), 16, 10)
            .cast("long").as("h"))
        .groupBy(col("l_returnflag"))
        .agg(kmv(col("h")).as("kmv_parts"))
        .orderBy(col("l_returnflag"))
    }),

    // Outer join: dims without matches survive with NULL-padded counts.
    "q13_outer_join" -> ((spark: SparkSession, dir: String) => {
      val n = Tables.nation(spark, dir)
      val s = Tables.supplier(spark, dir)
      n.join(s, n("n_nationkey") === s("s_nationkey"), "left_outer")
        .groupBy(col("n_nationkey"), col("n_name"))
        .agg(count(col("s_suppkey")).as("n_suppliers"),
          coalesce(sum(col("s_acctbal").cast(dec)).cast("double"), lit(0.0))
            .as("total_bal"))
        .orderBy(col("n_nationkey"))
    }),

    // CUBE: all grouping-set combinations with grouping_id.
    "q14_cube" -> ((spark: SparkSession, dir: String) =>
      Tables.orders(spark, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          grouping_id().cast("long").as("g"),
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).cast("double").as("total"))
        .orderBy(col("g"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // Pivot (wide aggregation): explicit value list, so the plan is ONE
    // pass over the fact table (no distinct-values pre-job) — a single
    // hash aggregate producing all three pivoted sums per group.
    "q18_pivot" -> ((spark: SparkSession, dir: String) =>
      Tables.lineitem(spark, dir)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity").cast(dec)).cast("double"))
        .select(col("l_linestatus"), col("A").as("qty_a"),
          col("N").as("qty_n"), col("R").as("qty_r"))
        .orderBy(col("l_linestatus"))),

    // UNPIVOT (q18's inverse — wide → long): each part row melts into
    // one row per measure column. Spark's unpivot plans as a single
    // Expand over the scan — one pass, rows × measures out, no shuffle
    // (the same operator CUBE/ROLLUP use to replicate rows). Measures
    // cast to a common double up front, as unpivot requires one value
    // type.
    "q26_unpivot" -> ((spark: SparkSession, dir: String) =>
      Tables.part(spark, dir)
        .select(col("p_partkey"),
          col("p_retailprice").cast("double").as("p_retailprice"),
          col("p_size").cast("double").as("p_size"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size")), "attr", "val")
        .orderBy(col("p_partkey"), col("attr"))),

    // Explicit GROUPING SETS (the general form behind q07's ROLLUP /
    // q14's CUBE): only the requested sets are expanded, so the Expand
    // operator emits 3 copies per row here instead of CUBE's 4.
    "q19_grouping_sets" -> ((spark: SparkSession, dir: String) =>
      Tables.lineitem(spark, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping_id().cast("long").as("g"),
          count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("revenue"))
        .orderBy(col("g"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // Scalar-function parity: string/conditional/null functions the
    // reference uses (lower, split/substr, concat — sse.py:198,203,213,235)
    // plus the standard library around them.
    "q15_scalar_funcs" -> ((spark: SparkSession, dir: String) =>
      Tables.part(spark, dir)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          lower(col("p_type")).as("type_l"),
          length(col("p_name")).cast("long").as("name_len"),
          substring(col("p_type"), 1, 5).as("type_pfx"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          coalesce(nullif(col("p_brand"), lit("Brand#13")), lit("OTHER")).as("brand_or_other"),
          when(col("p_size") >= 25, lit("large"))
            .when(col("p_size") >= 10, lit("medium"))
            .otherwise(lit("small")).as("size_class"))
        .orderBy(col("p_partkey"))),

    // Exact interpolated quantiles (sort-based aggregate). Interpolation
    // arithmetic is a single deterministic expression over exact order
    // statistics, so it cross-checks against DuckDB's quantile_cont.
    // Both quantiles come from ONE percentile(array(...)) aggregate —
    // one value buffer + one sort per group instead of two.
    // This is the exact/oracle form; q16b is the 100 TB production path.
    "q16_percentiles" -> ((spark: SparkSession, dir: String) =>
      Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, array(0.5D, 0.95D))").as("ps"),
          min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"))
        .select(col("l_returnflag"), col("ps").getItem(0).as("p50"),
          col("ps").getItem(1).as("p95"), col("lo"), col("hi"))
        .orderBy(col("l_returnflag"))),

    // Scale-safe percentiles: approx_percentile is a mergeable sketch
    // (constant memory per group, map-side partial agg) — the production
    // path at 100 TB group sizes, where exact percentile's
    // buffer-every-value aggregate cannot run. The sketch value itself is
    // engine-specific, so the oracle checks it against EXACT order-
    // statistic bounds: with accuracy 10000 the rank error is ≤ n/10000,
    // far inside the [0.45,0.55] / [0.90,0.975] exact-quantile windows —
    // the booleans are deterministically true in any correct run and
    // hash-compare against the oracle's constants.
    "q16b_percentiles_approx" -> ((spark: SparkSession, dir: String) =>
      Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, array(0.45D, 0.55D, 0.90D, 0.975D))").as("bounds"),
          expr("approx_percentile(l_extendedprice, array(0.5D, 0.95D), 10000)").as("ap"))
        .select(col("l_returnflag"),
          (col("ap").getItem(0) >= col("bounds").getItem(0) &&
            col("ap").getItem(0) <= col("bounds").getItem(1)).as("p50_in_bounds"),
          (col("ap").getItem(1) >= col("bounds").getItem(2) &&
            col("ap").getItem(1) <= col("bounds").getItem(3)).as("p95_in_bounds"))
        .orderBy(col("l_returnflag"))),

    // As-of join (custom operator — Spark has no native ASOF JOIN): each
    // click gets the user's latest purchase at-or-before it. Implemented
    // as union + running window (graft.operators.AsOfJoin), checked
    // against DuckDB's native ASOF LEFT JOIN.
    "q17_asof_join" -> ((spark: SparkSession, dir: String) => {
      // time axis in microseconds: DuckDB reads the ns parquet column at
      // µs precision, so the operator is defined at µs in both engines
      val e = Tables.events(spark, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          expr("ts div 1000").as("tus"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts div 1000").as("tus"), col("value"))
      graft.operators.AsOfJoin
        .lastEarlier(clicks, purchases, "user_id", "tus", Seq("value"))
        .select(col("click_id"), col("user_id"),
          col("asof_time").as("purchase_ts_us"),
          col("asof_value").as("purchase_value"))
        .orderBy(col("click_id"))
    }),

    // Window FRAME coverage (complements q06's ranking): lag/lead
    // offsets and a sliding rows-between moving sum per user, ordered by
    // the unique event_id so every frame is deterministic. The moving
    // sum aggregates in DECIMAL: exact arithmetic is order-independent,
    // so it cross-checks DuckDB's segment-tree window evaluation (a
    // DOUBLE moving sum would diverge in the last bit on addition
    // order) and survives any partitioning at scale.
    "q20_window_frames" -> ((spark: SparkSession, dir: String) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val w5 = w.rowsBetween(-4, 0)
      Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("value"))
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("next_value", lead(col("value"), 1).over(w))
        .withColumn("mov_sum5", sum(col("value").cast(dec)).over(w5).cast("double"))
        .withColumn("seq", row_number().over(w).cast("long"))
        .orderBy(col("event_id"))
    }),

    // Interval range join as an EQUI-join (graft.operators.RangeJoin):
    // clicks landing in the 2h window after an error by the same user.
    // A raw BETWEEN join plans as BroadcastNestedLoop/cartesian — the
    // bin-bucketed rewrite shuffles on (user_id, bin) instead, checked
    // against DuckDB's plain BETWEEN join.
    "q21_range_join" -> ((spark: SparkSession, dir: String) => {
      // µs time axis in both engines (see q17's comment)
      val e = Tables.events(spark, dir)
      val err = e.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"),
          expr("ts div 1000").as("start_us"))
        .withColumn("end_us", col("start_us") + lit(RANGE_WIN_US))
      val clk = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          expr("ts div 1000").as("click_us"))
      graft.operators.RangeJoin.pointInInterval(err, clk, Seq("user_id"),
          "start_us", "end_us", "click_us", binWidth = RANGE_WIN_US)
        .select(col("err_id"), col("click_id"), col("user_id"),
          (col("click_us") - col("start_us")).as("delta_us"))
        .orderBy(col("err_id"), col("click_id"))
    }),

    // Batch twin of the streaming gap-sessionizer
    // (graft.streaming.EventTimeOps.sessionize): a >30min quiet gap per
    // user closes the session. The lag/running-sum formulation is the
    // classic SQL islands construction — one shuffle on user_id; the
    // session roll-up reuses that partitioning ((user_id, sess_idx) is a
    // superset key, so EnsureRequirements inserts no second exchange).
    // Ordering by (tus, event_id) makes frames deterministic under
    // timestamp ties; same-timestamp events always share a session
    // (gap 0), so the output is tie-order-independent too.
    "q22_sessionize" -> ((spark: SparkSession, dir: String) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), expr("ts div 1000").as("tus"))
        .withColumn("new_sess",
          when(col("tus") - lag(col("tus"), 1).over(w) > SESSION_GAP_US ||
            lag(col("tus"), 1).over(w).isNull, 1L).otherwise(0L))
        .withColumn("sess_idx", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("sess_idx"))
        .agg(count(lit(1)).as("n_events"),
          min(col("tus")).as("start_us"), max(col("tus")).as("end_us"))
        .orderBy(col("user_id"), col("sess_idx"))
    }),

    // Correlated-scalar-subquery surface: orders strictly above their
    // customer's average order total. Expressed directly as the window
    // Catalyst would decorrelate the subquery into — one shuffle on
    // o_custkey, no self-join. The comparison is MULTIPLIED THROUGH
    // (price·n > Σprice, all DECIMAL-exact) instead of price > Σ/n:
    // decimal division rounds differently across engines, and a
    // boundary tie would flip rows; products and sums cannot.
    "q23_above_cust_avg" -> ((spark: SparkSession, dir: String) => {
      val w = Window.partitionBy(col("o_custkey"))
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .withColumn("cust_sum", sum(col("o_totalprice").cast(dec)).over(w))
        .withColumn("cust_n", count(lit(1)).over(w))
        .filter(col("o_totalprice").cast(dec) * col("cust_n") > col("cust_sum"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("cust_n"))
        .orderBy(col("o_orderkey"))
    }),

    // The SAME range join as q21, but written the NAIVE way — a plain
    // conjunctive BETWEEN condition — and rewritten to the bin equi-join
    // by the graft.plans.RangeJoinRewrite optimizer rule (installed via
    // GraftExtensions in Verify/Bench; conf-gated). The conf is SCOPED
    // to this plan: the rewrite fires lazily at optimization time, so a
    // bare unset-after-build would silently disable it — instead we
    // force optimization while the conf is set, pin the rewritten
    // logical plan via shims.ofRows, and unset before returning. No
    // later query's plan (or bench timing) depends on whether q25 was
    // built first. In a session WITHOUT the extension (e.g. the shared
    // test session) the pinned plan is just the nested-loop one — so
    // correctness is session-independent; the PLAN claim is asserted in
    // RangeJoinRewriteSpec.
    "q25_range_join_auto" -> ((spark: SparkSession, dir: String) => {
      spark.conf.set("spark.graft.rangeJoin.binWidth", RANGE_WIN_US.toString)
      try {
        val e = Tables.events(spark, dir)
        val err = e.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
            expr("ts div 1000").as("start_us"))
          .withColumn("end_us", col("start_us") + lit(RANGE_WIN_US))
        val clk = e.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            expr("ts div 1000").as("click_us"))
        val naive = err.join(clk, col("err_user") === col("user_id")
            && col("click_us") >= col("start_us") && col("click_us") < col("end_us"))
          .select(col("err_id"), col("click_id"), col("user_id"),
            (col("click_us") - col("start_us")).as("delta_us"))
          .orderBy(col("err_id"), col("click_id"))
        org.apache.spark.sql.graft.shims.ofRows(spark,
          naive.queryExecution.optimizedPlan)
      } finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
    }),

    // Salted skew join (graft.operators.SkewJoin): lineitem is the
    // probe side with its hot orderkeys spread over 8 salt buckets; the
    // orders slice is replicated ×8. Salting is semantics-preserving
    // for inner equi-joins, so the oracle is the PLAIN join — a wrong
    // salt/replication pairing drops or duplicates rows and breaks the
    // hash. (At this SF Catalyst broadcasts the replicated side; at
    // 100 TB the same plan shuffles on (key, salt), which is the point.)
    "q24_skew_join" -> ((spark: SparkSession, dir: String) => {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
      val ord = Tables.orders(spark, dir)
        .filter(col("o_custkey") % 100 === 7)
        .select(col("o_orderkey").as("l_orderkey"),
          col("o_custkey"), col("o_totalprice"))
      graft.operators.SkewJoin.saltedInnerJoin(li, ord, "l_orderkey", 8)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Event-time tumbling-window aggregate (batch twin of the streaming
    // windowed agg; ts arrives as nanosecond Longs — see Tables.events).
    "q12_events_hourly" -> ((spark: SparkSession, dir: String) =>
      Tables.events(spark, dir)
        .select(
          date_trunc("hour", timestamp_micros(expr("ts div 1000"))).as("hour"),
          col("event_type"), col("value"))
        .groupBy(col("hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast("double").as("total_value"))
        .orderBy(col("hour"), col("event_type"))),

    // Per-hour top-k users by event count — the EXACT batch twin of the
    // streaming Misra-Gries heavy hitters (EventTimeOps.windowedTopAuthors,
    // whose bounded-state summary is guarantee-checked in specs): same
    // window/top-k contract, hash-checked here where batch can afford a
    // counter per (hour, user). Rank filter plans as WindowGroupLimit,
    // so each partition carries k rows to the ranking, not its users.
    "q27_window_top_users" -> ((spark: SparkSession, dir: String) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("hour")).orderBy(col("n").desc, col("user_id").asc)
      Tables.events(spark, dir)
        .select(
          date_trunc("hour", timestamp_micros(expr("ts div 1000"))).as("hour"),
          col("user_id"))
        .groupBy(col("hour"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("hour"), col("rk"), col("user_id"), col("n"))
        .orderBy(col("hour"), col("rk"))
    }),

    // Exponential moving average (α = 1/2) of each user's event values
    // in event order — the ordered-fold aggregate the window family
    // lacked. Cross-engine exactness WITHOUT decimals: α a power of two
    // makes every step (a + x)/2 an exact halving, and BOTH engines run
    // the identical left fold over the identical order (Spark
    // `aggregate` over the sorted collect; DuckDB `list_reduce` over
    // `list(... ORDER BY ...)`, seed = first element in both), so the
    // published double is bit-identical — a closed-form weighted SUM
    // would round differently and hash-mismatch. Per-user state is the
    // user's own history (bounded, key-partitioned).
    //
    // SKEW CONSTRAINT (documented, not capped): the collect_list puts
    // ONE user's full event history in one aggregation buffer — an EMA
    // is inherently a sequential per-key fold, so the shape is right,
    // but a hyperactive key (a bot writing millions of events) at 100×
    // corpus scale is one JVM's memory. A deployment over unbounded
    // per-key histories bounds the window first (slice the sorted list
    // to the last W events, or pre-aggregate per hour as q12 does) —
    // that changes the metric's definition, so the registered operator
    // keeps the exact whole-history fold and states the bound instead.
    "q28_ema" -> ((spark: SparkSession, dir: String) =>
      Tables.events(spark, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).cast("long").as("n_events"),
          expr("transform(array_sort(collect_list(struct(event_id, value))), s -> s.value)")
            .as("vs"))
        .select(col("user_id"), col("n_events"),
          expr("aggregate(slice(vs, 2, greatest(size(vs) - 1, 0)), element_at(vs, 1), (a, x) -> (a + x) / 2)")
            .as("ema"))
        .orderBy(col("user_id"))),

    // Interval-join attribution (clicks → same-user purchases within
    // 10 min) through the STREAMING operator's code path — the batch
    // twin of EventTimeOps.attributionJoin (withWatermark is a no-op
    // in batch), so the stream-stream join's semantics get a DuckDB
    // oracle on top of the wire spec.
    "q29_attribution" -> ((spark: SparkSession, dir: String) => {
      val ev = Tables.events(spark, dir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      graft.streaming.EventTimeOps.attributionJoin(
        ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts")),
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value")),
        maxDelaySec = 600)
        .orderBy(col("click_id"), col("purchase_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q01_agg_sum" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("\n", " "),
    "q02_join_broadcast" ->
      """SELECT r_name, n_name,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin.replace("\n", " "),
    "q03_join_shuffle" ->
      """SELECT o_orderpriority,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin.replace("\n", " "),
    "q04_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100.0)
        |ORDER BY c_custkey""".stripMargin.replace("\n", " "),
    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin.replace("\n", " "),
    "q06_window_topk" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
        | FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin.replace("\n", " "),
    "q07_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS g,
        | count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin.replace("\n", " "),
    "q08_intersect" ->
      "SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey AS nationkey FROM supplier ORDER BY nationkey",
    "q09_except" ->
      "SELECT n_nationkey AS nationkey FROM nation EXCEPT SELECT s_nationkey AS nationkey FROM supplier ORDER BY nationkey",
    "q10_topk_order" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 100""".stripMargin.replace("\n", " "),
    "q11_distinct_count" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", " "),
    // mirror of KmvSketch: k = 64, M = 2^60; fewer than k distinct
    // hashes → exact count, else (k-1)·M / h_k
    "q11b_distinct_kmv" ->
      s"""WITH h AS (SELECT DISTINCT l_returnflag, ${PipelineQueries.duckHash60("CAST(l_partkey AS VARCHAR)")} AS h FROM lineitem),
        |r AS (SELECT l_returnflag, h, row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn FROM h),
        |c AS (SELECT l_returnflag, count(*) AS n FROM h GROUP BY 1),
        |kth AS (SELECT l_returnflag, h AS hk FROM r WHERE rn = 64)
        |SELECT c.l_returnflag,
        | CASE WHEN c.n < 64 THEN CAST(c.n AS DOUBLE)
        |      ELSE CAST(63 AS DOUBLE) * 1152921504606846976.0 / CAST(hk AS DOUBLE) END AS kmv_parts
        |FROM c LEFT JOIN kth USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin.replace("\n", " "),
    "q13_outer_join" ->
      """SELECT n_nationkey, n_name,
        | count(s_suppkey) AS n_suppliers,
        | coalesce(CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_bal
        |FROM nation LEFT OUTER JOIN supplier ON n_nationkey = s_nationkey
        |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin.replace("\n", " "),
    "q14_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS g,
        | count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin.replace("\n", " "),
    // sum(CASE …) with no ELSE mirrors pivot's empty-cell NULL semantics
    "q18_pivot" ->
      """SELECT l_linestatus,
        | CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_a,
        | CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_n,
        | CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_r
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin.replace("\n", " "),
    // manual UNION ALL melt: portable to any engine and column-name
    // exact vs Spark's unpivot output
    "q26_unpivot" ->
      """SELECT p_partkey, 'p_retailprice' AS attr, CAST(p_retailprice AS DOUBLE) AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |ORDER BY p_partkey, attr""".stripMargin.replace("\n", " "),
    "q19_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS g,
        | count(*) AS n,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY g, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin.replace("\n", " "),
    "q15_scalar_funcs" ->
      """SELECT p_partkey,
        | upper(p_brand) AS brand_u,
        | lower(p_type) AS type_l,
        | CAST(length(p_name) AS BIGINT) AS name_len,
        | substr(p_type, 1, 5) AS type_pfx,
        | concat_ws('|', p_brand, p_type) AS brand_type,
        | coalesce(nullif(p_brand, 'Brand#13'), 'OTHER') AS brand_or_other,
        | CASE WHEN p_size >= 25 THEN 'large' WHEN p_size >= 10 THEN 'medium' ELSE 'small' END AS size_class
        |FROM part ORDER BY p_partkey""".stripMargin.replace("\n", " "),
    "q16_percentiles" ->
      """SELECT l_returnflag,
        | quantile_cont(l_extendedprice, 0.5) AS p50,
        | quantile_cont(l_extendedprice, 0.95) AS p95,
        | min(l_extendedprice) AS lo,
        | max(l_extendedprice) AS hi
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", " "),
    // the sketch values are engine-specific; the oracle asserts the
    // exact-bounds invariant (see the query comment) — a wrong sketch
    // breaks the hash match
    "q16b_percentiles_approx" ->
      """SELECT l_returnflag,
        | true AS p50_in_bounds,
        | true AS p95_in_bounds
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", " "),
    "q17_asof_join" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS tus FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(ts) AS tus, value FROM events WHERE event_type = 'purchase')
        |SELECT c.click_id, c.user_id,
        | p.tus AS purchase_ts_us,
        | p.value AS purchase_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.tus >= p.tus
        |ORDER BY click_id""".stripMargin.replace("\n", " "),
    "q20_window_frames" ->
      """SELECT event_id, user_id, value,
        | lag(value, 1) OVER w AS prev_value,
        | lead(value, 1) OVER w AS next_value,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY event_id
        |   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum5,
        | CAST(row_number() OVER w AS BIGINT) AS seq
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY event_id""".stripMargin.replace("\n", " "),
    "q21_range_join" ->
      """WITH err AS (SELECT event_id AS err_id, user_id, epoch_us(ts) AS sus FROM events WHERE event_type = 'error'),
        |clk AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS cus FROM events WHERE event_type = 'click')
        |SELECT err_id, click_id, err.user_id AS user_id, cus - sus AS delta_us
        |FROM err JOIN clk ON err.user_id = clk.user_id AND cus >= sus AND cus < sus + 7200000000
        |ORDER BY err_id, click_id""".stripMargin.replace("\n", " "),
    "q22_sessionize" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |n AS (SELECT *, CASE WHEN lag(tus, 1) OVER w IS NULL
        |        OR tus - lag(tus, 1) OVER w > $SESSION_GAP_US THEN 1 ELSE 0 END AS new_sess
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_idx FROM n)
        |SELECT user_id, sess_idx, count(*) AS n_events,
        | min(tus) AS start_us, max(tus) AS end_us
        |FROM s GROUP BY user_id, sess_idx ORDER BY user_id, sess_idx""".stripMargin.replace("\n", " "),
    "q23_above_cust_avg" ->
      """WITH t AS (SELECT o_orderkey, o_custkey, o_totalprice,
        |  sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS cust_sum,
        |  count(*) OVER (PARTITION BY o_custkey) AS cust_n FROM orders)
        |SELECT o_orderkey, o_custkey, o_totalprice, CAST(cust_n AS BIGINT) AS cust_n
        |FROM t WHERE CAST(o_totalprice AS DECIMAL(18,2)) * cust_n > cust_sum
        |ORDER BY o_orderkey""".stripMargin.replace("\n", " "),
    // same semantics as q21 — the plain BETWEEN join IS the spec; only
    // the Spark-side plan differs (rewritten by RangeJoinRewrite)
    "q25_range_join_auto" ->
      """WITH err AS (SELECT event_id AS err_id, user_id, epoch_us(ts) AS sus FROM events WHERE event_type = 'error'),
        |clk AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS cus FROM events WHERE event_type = 'click')
        |SELECT err_id, click_id, clk.user_id AS user_id, cus - sus AS delta_us
        |FROM err JOIN clk ON err.user_id = clk.user_id AND cus >= sus AND cus < sus + 7200000000
        |ORDER BY err_id, click_id""".stripMargin.replace("\n", " "),
    "q24_skew_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, l.l_extendedprice,
        | o.o_custkey, o.o_totalprice
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_custkey % 100 = 7
        |ORDER BY l_orderkey, l_linenumber""".stripMargin.replace("\n", " "),
    "q12_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        | count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin.replace("\n", " "),

    "q27_window_top_users" ->
      """WITH c AS (SELECT date_trunc('hour', ts) AS hour, user_id, count(*) AS n
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY hour
        |        ORDER BY n DESC, user_id ASC) AS BIGINT) AS rk FROM c)
        |SELECT hour, rk, user_id, n FROM r WHERE rk <= 3
        |ORDER BY hour, rk""".stripMargin.replace("\n", " "),

    // mirror of q28's fold: list_reduce seeds with the first element
    // and folds left in list order — the identical (a+x)/2 sequence
    "q28_ema" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        | list_reduce(list(value ORDER BY event_id), (a, x) -> (a + x) / 2) AS ema
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin.replace("\n", " "),

    // mirror of q29: inclusive interval endpoints, same-user only
    "q29_attribution" ->
      """SELECT c.event_id AS click_id, c.user_id, c.ts AS cts,
        | p.event_id AS purchase_id, p.ts AS pts, p.value
        |FROM events c JOIN events p
        | ON c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.user_id = c.user_id
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 600 SECOND
        |ORDER BY click_id, purchase_id""".stripMargin.replace("\n", " ")
  )
}
