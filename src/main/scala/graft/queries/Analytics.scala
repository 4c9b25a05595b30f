package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** OLAP-analytics extension catalog: hierarchy rollups, statistical and
  * percentile aggregates, calendar breakdowns, set operators, pivot,
  * running window frames, embedding centroids, and blocked fuzzy matching
  * — standard engine surface beyond the reference's own workload, all
  * oracle-checked.
  *
  * Monetary sums ride as exact integer cents; percentile interpolation
  * on integer-valued doubles is arithmetic-identical across engines.
  */
object Analytics {

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100, 0).cast("long")

  /** ROLLUP over the region→nation hierarchy with explicit NULLS FIRST
    * ordering so subtotal rows land identically. */
  val rollupStats = Q(
    "q44_rollup_stats",
    (s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey"), col("c_acctbal"))
      val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"),
        col("n_regionkey"))
      val r = Tables.region(s, d).select(col("r_regionkey"), col("r_name"))
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(count(lit(1)).as("n_customers"),
             sum(cents(col("c_acctbal"))).as("acctbal_cents"))
        .orderBy(col("region").asc_nulls_first, col("nation").asc_nulls_first)
    },
    Some("""SELECT r_name AS region, n_name AS nation, count(*) AS n_customers,
           CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
             AS acctbal_cents
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY ROLLUP (r_name, n_name)
           ORDER BY region NULLS FIRST, nation NULLS FIRST""")
  )

  /** Statistical aggregates per group: sample stddev/variance (exact on
    * integer-valued quantities) and price–quantity correlation. */
  val statAggs = Q(
    "q45_stat_aggs",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
             round(var_samp(col("l_quantity")), 6).as("var_qty"),
             round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_quantity), 6) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qp
           FROM lineitem GROUP BY 1 ORDER BY l_returnflag""")
  )

  /** Exact interpolated quartiles of quantity per return flag (Spark
    * `percentile` ≡ DuckDB `quantile_cont`). */
  val percentiles = Q(
    "q46_percentiles",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.25)"), 6).as("q25"),
             round(expr("percentile(l_quantity, 0.5)"), 6).as("q50"),
             round(expr("percentile(l_quantity, 0.75)"), 6).as("q75"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) AS q25,
           round(quantile_cont(l_quantity, 0.5), 6) AS q50,
           round(quantile_cont(l_quantity, 0.75), 6) AS q75
           FROM lineitem GROUP BY 1 ORDER BY l_returnflag""")
  )

  /** Calendar breakdown: order volume and revenue by year × month. */
  val dateParts = Q(
    "q47_date_parts",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).cast("long").as("y"),
                 month(col("o_orderdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("n"),
             sum(cents(col("o_totalprice"))).as("revenue_cents"))
        .orderBy(col("y"), col("m")),
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(month(o_orderdate) AS BIGINT) AS m, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS revenue_cents
           FROM orders GROUP BY 1, 2 ORDER BY y, m""")
  )

  /** INTERSECT: customers active in both 1995 and 1996. */
  val intersectYears = Q(
    "q48_intersect_years",
    (s, d) => {
      def active(yr: Int) = Tables.orders(s, d)
        .where(year(col("o_orderdate")) === yr)
        .select(col("o_custkey").as("cust_id"))
      active(1995).intersect(active(1996)).orderBy(col("cust_id"))
    },
    Some("""SELECT o_custkey AS cust_id FROM orders WHERE year(o_orderdate) = 1995
           INTERSECT
           SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
           ORDER BY cust_id""")
  )

  /** EXCEPT: customers active in 1995 but not 1996. */
  val exceptYears = Q(
    "q49_except_years",
    (s, d) => {
      def active(yr: Int) = Tables.orders(s, d)
        .where(year(col("o_orderdate")) === yr)
        .select(col("o_custkey").as("cust_id"))
      active(1995).except(active(1996)).orderBy(col("cust_id"))
    },
    Some("""SELECT o_custkey AS cust_id FROM orders WHERE year(o_orderdate) = 1995
           EXCEPT
           SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
           ORDER BY cust_id""")
  )

  /** Pivot: revenue cents by line status × return flag (fixed pivot
    * columns; oracle uses the equivalent conditional aggregation). */
  val pivotFlags = Q(
    "q50_pivot_flags",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(coalesce(sum(cents(col("l_extendedprice"))), lit(0L)))
        .orderBy(col("l_linestatus")),
    Some("""SELECT l_linestatus,
           CAST(coalesce(sum(CASE WHEN l_returnflag = 'A'
             THEN CAST(round(l_extendedprice * 100, 0) AS BIGINT) END), 0) AS BIGINT) AS "A",
           CAST(coalesce(sum(CASE WHEN l_returnflag = 'N'
             THEN CAST(round(l_extendedprice * 100, 0) AS BIGINT) END), 0) AS BIGINT) AS "N",
           CAST(coalesce(sum(CASE WHEN l_returnflag = 'R'
             THEN CAST(round(l_extendedprice * 100, 0) AS BIGINT) END), 0) AS BIGINT) AS "R"
           FROM lineitem GROUP BY 1 ORDER BY l_linestatus""")
  )

  /** Running window frame: cumulative order count and revenue per
    * customer in order-date order (rowsBetween unbounded→current). */
  val runningTotals = Q(
    "q51_running_totals",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey").as("cust_id"), col("o_orderkey").as("order_id"),
          count(lit(1)).over(w).as("running_n"),
          sum(cents(col("o_totalprice"))).over(w).as("running_cents"))
        .orderBy(col("cust_id"), col("order_id"))
    },
    Some("""SELECT o_custkey AS cust_id, o_orderkey AS order_id,
           count(*) OVER w AS running_n,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) OVER w AS BIGINT)
             AS running_cents
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           ORDER BY cust_id, order_id""")
  )

  /** Per-label embedding centroid, one row per (label, dimension) — the
    * vector-aggregation face of the similarity stack. */
  val labelCentroids = Q(
    "q52_label_centroids",
    (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label").cast("long").as("label"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), (col("pos") + 1).cast("long").as("dim"))
        .agg(round(avg(col("v")), 6).as("centroid"))
        .orderBy(col("label"), col("dim")),
    Some("""SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS dim,
           round(avg(CAST(embedding[CAST(i AS INT)] AS DOUBLE)), 6) AS centroid
           FROM (SELECT label, embedding,
                   unnest(range(1, len(embedding) + 1)) AS i
                 FROM embeddings)
           GROUP BY 1, 2 ORDER BY label, dim""")
  )

  /** Blocked fuzzy matching: near-identical part names by edit distance
    * within (brand, size) blocks — the classic blocking+verify dedup
    * join shape (no cross join; block keys bound the quadratic term). */
  val fuzzyNames = Q(
    "q53_fuzzy_names",
    (s, d) => {
      val p = Tables.part(s, d)
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
      val a = p.select(col("p_brand"), col("p_size"),
        col("p_partkey").as("a_id"), col("p_name").as("a_name"))
      val b = p.select(col("p_brand"), col("p_size"),
        col("p_partkey").as("b_id"), col("p_name").as("b_name"))
      a.join(b, Seq("p_brand", "p_size"))
        .where(col("a_id") < col("b_id"))
        .withColumn("dist", levenshtein(col("a_name"), col("b_name")).cast("long"))
        .where(col("dist") <= 5)
        .select(col("a_id"), col("b_id"), col("dist"))
        .orderBy(col("a_id"), col("b_id"))
    },
    Some("""SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
           FROM part a JOIN part b
             ON a.p_brand = b.p_brand AND a.p_size = b.p_size
             AND a.p_partkey < b.p_partkey
           WHERE levenshtein(a.p_name, b.p_name) <= 5
           ORDER BY a_id, b_id""")
  )

  /** Multi-column DISTINCT aggregation (Expand-based plan) per group. */
  val distinctCounts = Q(
    "q54_distinct_counts",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"),
             count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
           FROM lineitem GROUP BY 1 ORDER BY l_returnflag""")
  )

  // comparison in exact integer cents (the file's convention) so the
  // boundary can't diverge between engines on order-dependent float sums
  private val correlatedSql: String =
    """SELECT p_partkey AS part_id, p_brand,
       round(p_retailprice, 2) AS price
       FROM part p
       WHERE CAST(round(p_retailprice * 100, 0) AS BIGINT) > 1.05 * (
         SELECT avg(CAST(round(p2.p_retailprice * 100, 0) AS BIGINT))
         FROM part p2 WHERE p2.p_brand = p.p_brand)
       ORDER BY part_id"""

  /** Correlated scalar subquery, executed through the engine's SQL front
    * end (`spark.sql`) with byte-identical text on the DuckDB side —
    * parts priced more than 5% above their brand's average. */
  val sqlCorrelated = Q(
    "q61_sql_correlated",
    (s, d) => {
      Tables.part(s, d).createOrReplaceTempView("part")
      s.sql(correlatedSql)
    },
    Some(correlatedSql)
  )

  /** Distribution window functions: quartile bucket, percent rank, and
    * cumulative distribution of customers by account balance per
    * market segment. */
  val distributionWindows = Q(
    "q62_distribution_windows",
    (s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_custkey").as("cust_id"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("c_mktsegment"), col("cust_id"))
    },
    Some("""SELECT c_mktsegment, c_custkey AS cust_id,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
           FROM customer
           WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
           ORDER BY c_mktsegment, cust_id""")
  )

  /** KMV (k-minimum-values) distinct-count SKETCH (Bar-Yossef et al.
    * 2002; the brief's "novel sketch" custom-operator slot): per event
    * type, estimate distinct users from the k smallest values of a
    * shared deterministic hash — est = (k−1)·2³² / kth_min_hash, with
    * the standard small-set rule (fewer than k hashes → count them
    * exactly; the sf0.001 fixture exercises that branch, sf0.01+ the
    * estimator). Unlike HLL (whose estimate is implementation-specific,
    * so Spark's and DuckDB's built-ins can never hash-match), KMV over
    * the shared md5-prefix hash is bit-identical across engines — the
    * sketch itself is oracle-checked, alongside the exact count it
    * approximates. The sketch is a TRUE partial aggregate: the k-min set
    * is held by [[graft.expr.KMinDistinct]], a typed size-k Aggregator
    * whose merge is the synopsis-union rule (merge sorted sets, re-take
    * k smallest) — each map task ships O(k) longs per event type, never
    * its distinct-hash set, and no distinct() or per-key sort exists
    * anywhere in the plan (PlanSpec asserts it). The oracle SQL keeps
    * the equivalent declarative kth-min form; both sides produce the
    * identical estimate. */
  val kmvSketch = Q(
    "q77_kmv_sketch",
    (s, d) => {
      val k = 64
      val h = conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
      val e = Tables.events(s, d)
      val kmin = graft.expr.KMinDistinct.agg(k)
      val stats = e.select(col("event_type"), h.as("h"))
        .groupBy(col("event_type"))
        .agg(kmin(col("h")).as("mins"))
        // n_h saturates at k — the small-set branch below only needs
        // "fewer than k distinct hashes", where size(mins) is exact
        .select(col("event_type"), size(col("mins")).as("n_h"),
          get(col("mins"), lit(k - 1)).as("kth"))
      val exact = e.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      exact.join(stats, Seq("event_type"))
        .select(col("event_type"), col("n_exact"),
          round(when(col("n_h") < k, col("n_h").cast("double"))
            .otherwise(lit((k - 1).toDouble * 4294967296.0) / col("kth")), 3)
            .as("kmv_est"))
        .orderBy(col("event_type"))
    },
    Some {
      val k = 64
      s"""WITH h AS (SELECT DISTINCT event_type,
              ${OracleSql.h32("CAST(user_id AS VARCHAR)")} AS h FROM events),
          r AS (SELECT event_type, h,
                  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
                FROM h),
          st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_h,
                   max(CASE WHEN rn = $k THEN h END) AS kth
                 FROM r GROUP BY 1),
          ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
                 FROM events GROUP BY 1)
          SELECT ex.event_type, ex.n_exact,
            round(CASE WHEN st.n_h < $k THEN CAST(st.n_h AS DOUBLE)
                  ELSE ${(k - 1).toDouble * 4294967296.0} / st.kth END, 3)
              AS kmv_est
          FROM ex JOIN st USING (event_type) ORDER BY event_type"""
    }
  )

  /** HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the
    * industry-standard counterpart to q77's KMV, oracle-checked where
    * built-in HLLs never can be (`approx_count_distinct`'s registers
    * and estimator are implementation-private; here both are explicit
    * over the shared 32-bit hash): 64 buckets from the hash's top 6
    * bits, rank = leading-zero count of the low 26 bits + 1 computed as
    * `27 − length(bin(rem))` — an exact INTEGER-STRING operation on
    * both engines, no float log2 — registers held by
    * [[graft.expr.HllRegisters]] (a true partial aggregate: O(m) state,
    * merge = elementwise max, the HLL union rule; PlanSpec asserts no
    * distinct()/Window anywhere). The indicator sum Σ2^−Mⱼ is EXACT in
    * doubles (binary fractions, denominators ≤ 2²⁷), so the raw
    * estimate is order-independent without rounding tricks. Counted
    * entity: distinct USER-DAYS per event type (the activity metric a
    * DAU pipeline sketches; day = exact integer floor-division of epoch
    * micros, q94's rule) — ~4.4k per type at sf0.01, which exercises
    * the RAW estimator branch at driver scales; Flajolet's
    * linear-counting small-range branch `m·ln(m/V)` is
    * HllSketchSpec's territory. Exact count alongside, as q77. */
  val hllSketch = Q(
    "q108_hll_sketch",
    (s, d) => {
      val m = 64
      val alphaM2 = 0.709 * m * m // Flajolet's alpha_64 * m^2
      val e = Tables.events(s, d)
        .select(col("event_type"),
          concat(col("user_id").cast("string"), lit("_"),
            expr("unix_micros(ts) div 86400000000").cast("string"))
            .as("key"))
      val h = conv(substring(md5(col("key")), 1, 8), 16, 10).cast("long")
      val hll = graft.expr.HllRegisters.agg(m)
      val slot = e.select(col("event_type"), h.as("h"))
        .select(col("event_type"),
          expr("h div 67108864").as("bucket"), // top 6 of 32 bits
          (col("h") % 67108864L).as("rem")) // low 26 bits
        .select(col("event_type"),
          (col("bucket") * 32 +
            when(col("rem") === 0, lit(27L))
              .otherwise(lit(27L) - length(bin(col("rem"))).cast("long")))
            .as("slot"))
      val stats = slot.groupBy(col("event_type"))
        .agg(hll(col("slot")).as("regs"))
        .select(col("event_type"),
          aggregate(col("regs"), lit(0.0),
            (z, r) => z + pow(lit(2.0), -r.cast("double"))).as("z"),
          size(filter(col("regs"), _ === 0L)).as("v"))
      val exact = e.groupBy(col("event_type"))
        .agg(countDistinct(col("key")).as("n_exact"))
      exact.join(stats, Seq("event_type"))
        .select(col("event_type"), col("n_exact"),
          round(when(lit(alphaM2) / col("z") <= 2.5 * m && col("v") > 0,
              lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
            .otherwise(lit(alphaM2) / col("z")), 3).as("hll_est"))
        .orderBy(col("event_type"))
    },
    Some {
      val m = 64
      val alphaM2 = 0.709 * m * m
      s"""WITH e AS (SELECT event_type,
              CAST(user_id AS VARCHAR) || '_' ||
              CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS VARCHAR)
                AS key
            FROM events),
          h AS (SELECT DISTINCT event_type, ${OracleSql.h32("key")} AS h
                FROM e),
          b AS (SELECT event_type, h // 67108864 AS bucket,
                  h % 67108864 AS rem FROM h),
          r AS (SELECT event_type, bucket,
                  CASE WHEN rem = 0 THEN 27
                       ELSE 27 - length(bin(rem)) END AS rho
                FROM b),
          regs AS (SELECT event_type, bucket, max(rho) AS mj
                   FROM r GROUP BY 1, 2),
          et AS (SELECT DISTINCT event_type FROM e),
          bs AS (SELECT unnest(range($m)) AS bucket),
          fl AS (SELECT et.event_type, bs.bucket, coalesce(regs.mj, 0) AS mj
                 FROM et CROSS JOIN bs
                 LEFT JOIN regs ON regs.event_type = et.event_type
                   AND regs.bucket = bs.bucket),
          st AS (SELECT event_type, sum(power(2.0, -mj)) AS z,
                   sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS v
                 FROM fl GROUP BY 1),
          ex AS (SELECT event_type, count(DISTINCT key) AS n_exact
                 FROM e GROUP BY 1)
          SELECT ex.event_type, ex.n_exact,
            round(CASE WHEN $alphaM2 / st.z <= ${2.5 * m} AND st.v > 0
                  THEN $m * ln($m / CAST(st.v AS DOUBLE))
                  ELSE $alphaM2 / st.z END, 3) AS hll_est
          FROM ex JOIN st USING (event_type) ORDER BY event_type"""
    }
  )

  /** Quantiles from a deterministic 10% USER hash-sample vs exact, with
    * the absolute error alongside — the data-profiling face of the
    * sketch family (q77 distinct counts, q90 heavy hitters): at 100 TB
    * the exact per-group percentile is a full sort-based aggregate over
    * the corpus, while the cluster-sample touches a tenth of it, and
    * this query reports exactly what the discount costs per group.
    * Values are exact integer cents, so both engines interpolate over
    * identical multisets and the sketch itself is oracle-checked. */
  val sampledQuantiles = Q(
    "q91_sampled_quantiles",
    (s, d) => {
      val h = conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
      val e = Tables.events(s, d)
        .select(col("event_type"), (h % 10).as("hb"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val exact = e.groupBy(col("event_type"))
        .agg(round(expr("percentile(cents, 0.5)"), 6).as("p50_exact"),
             round(expr("percentile(cents, 0.95)"), 6).as("p95_exact"))
      val approx = e.where(col("hb") === 0)
        .groupBy(col("event_type"))
        .agg(round(expr("percentile(cents, 0.5)"), 6).as("p50_approx"),
             round(expr("percentile(cents, 0.95)"), 6).as("p95_approx"))
      exact.join(approx, Seq("event_type"))
        .select(col("event_type"),
          col("p50_exact"), col("p50_approx"),
          round(abs(col("p50_exact") - col("p50_approx")), 6).as("p50_err"),
          col("p95_exact"), col("p95_approx"),
          round(abs(col("p95_exact") - col("p95_approx")), 6).as("p95_err"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH e AS (SELECT event_type,
              ${OracleSql.h32("CAST(user_id AS VARCHAR)")} % 10 AS hb,
              CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
            ex AS (SELECT event_type,
                     round(quantile_cont(cents, 0.5), 6) AS p50_exact,
                     round(quantile_cont(cents, 0.95), 6) AS p95_exact
                   FROM e GROUP BY 1),
            ap AS (SELECT event_type,
                     round(quantile_cont(cents, 0.5), 6) AS p50_approx,
                     round(quantile_cont(cents, 0.95), 6) AS p95_approx
                   FROM e WHERE hb = 0 GROUP BY 1)
            SELECT event_type, p50_exact, p50_approx,
                   round(abs(p50_exact - p50_approx), 6) AS p50_err,
                   p95_exact, p95_approx,
                   round(abs(p95_exact - p95_approx), 6) AS p95_err
            FROM ex JOIN ap USING (event_type) ORDER BY event_type""")
  )

  /** CUBE completes the grouping-sets trio (q44 rollup, q50 pivot):
    * all four (returnflag × linestatus) grouping sets in one pass —
    * Spark plans a single Expand + hash aggregate, not four scans. */
  val cubeStats = Q(
    "q92_cube_stats",
    (s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
        .agg(count(lit(1)).as("n"),
             sum(cents(col("l_extendedprice"))).as("price_cents"))
        .orderBy(col("rf").asc_nulls_first, col("ls").asc_nulls_first),
    Some("""SELECT l_returnflag AS rf, l_linestatus AS ls, count(*) AS n,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS price_cents
           FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
           ORDER BY rf NULLS FIRST, ls NULLS FIRST""")
  )

  /** UNPIVOT (wide → long), the inverse of q50's pivot: Spark's native
    * `unpivot` operator melts a 3-metric-per-segment table into
    * (segment, metric, val) rows; the oracle is the relational
    * definition — one UNION ALL branch per metric — so the operator's
    * naming and row semantics are pinned, not assumed. */
  val unpivotMetrics = Q(
    "q93_unpivot_metrics",
    (s, d) => {
      val wide = Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
             sum(cents(col("c_acctbal"))).as("acctbal_cents"),
             countDistinct(col("c_nationkey")).as("n_nations"))
      wide.unpivot(
          Array(col("c_mktsegment")),
          Array(col("n_customers"), col("acctbal_cents"), col("n_nations")),
          "metric", "val")
        .orderBy(col("c_mktsegment"), col("metric"))
    },
    Some("""WITH w AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
              CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
                AS acctbal_cents,
              CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations
            FROM customer GROUP BY 1)
            SELECT c_mktsegment, metric, val FROM (
              SELECT c_mktsegment, 'n_customers' AS metric, n_customers AS val FROM w
              UNION ALL
              SELECT c_mktsegment, 'acctbal_cents', acctbal_cents FROM w
              UNION ALL
              SELECT c_mktsegment, 'n_nations', n_nations FROM w) u
            ORDER BY c_mktsegment, metric""")
  )

  /** Rolling 7-day distinct users (DAU / DAU7) — windowed COUNT
    * DISTINCT, which no engine's window frame does natively at scale:
    * the `collect_set(...) OVER (RANGE 6 PRECEDING)` spelling holds
    * every frame's full user set in one task's memory and Spark rightly
    * makes it awkward. The scale shape is map-side day EXPANSION: each
    * distinct (day, user) pair contributes itself to the 7 report-days
    * it covers (a bounded 7× explode), then one hash countDistinct per
    * report day — shuffles carry (day, user) longs, frames never
    * materialize. Restricted to report days that actually have events,
    * so DAU and DAU7 align row-for-row. Day buckets use FLOOR division
    * (truncating `div` would fold pre-1970 micros into day 0's bucket),
    * spelled as exact integer arithmetic — subtract the non-negative
    * `pmod` remainder, then divide exactly — because day is a GROUP key
    * and group keys must come from exact-integer bases. */
  val rollingDau = Q(
    "q94_rolling_dau",
    (s, d) => {
      val pairs = Tables.events(s, d)
        .select(expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000))" +
            " div 86400000000").as("day"),
          col("user_id"))
        .distinct().cache()
      val expanded = pairs
        .select(explode(sequence(col("day"), col("day") + 6)).as("day"),
          col("user_id"))
        .distinct()
      val dau = pairs.groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val dau7 = expanded.join(pairs.select(col("day")).distinct(), Seq("day"))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("dau7"))
      dau.join(dau7, Seq("day")).orderBy(col("day"))
    },
    Some("""WITH e0 AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, user_id
            FROM events),
            p AS (SELECT DISTINCT
              (us - ((us % 86400000000 + 86400000000) % 86400000000))
                // 86400000000 AS day, user_id
            FROM e0),
            ex AS (SELECT DISTINCT day + o AS day, user_id
                   FROM p CROSS JOIN (SELECT unnest(range(7)) AS o) os),
            dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM p GROUP BY 1),
            d7 AS (SELECT ex.day, count(DISTINCT ex.user_id) AS dau7
                   FROM ex JOIN (SELECT DISTINCT day FROM p) dd USING (day)
                   GROUP BY 1)
            SELECT day, dau, dau7 FROM dau JOIN d7 USING (day) ORDER BY day""")
  )

  val all: Seq[Q] = Seq(rollupStats, statAggs, percentiles, dateParts,
    intersectYears, exceptYears, pivotFlags, runningTotals, labelCentroids,
    fuzzyNames, distinctCounts, sqlCorrelated, distributionWindows, kmvSketch,
    sampledQuantiles, cubeStats, unpivotMetrics, rollingDau, hllSketch)
}
