package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Relational query catalog (SURVEY.md §2.2–§2.7, §2.4 Q1–Q10) mapped onto
  * the TPC-H-ish fixtures (FIXTURES.md §8: ratings↔lineitem, users↔customer,
  * movies↔part).
  *
  * Every query is written declaratively so Catalyst plans it: filters reach
  * the parquet scan (pushdown), dimension joins broadcast, aggregations get
  * partial map-side combine, top-k plans as TakeOrderedAndProject. Each
  * query carries matching DuckDB oracle SQL; columns are aliased identically
  * on both sides, rows given a deterministic total order, and doubles
  * rounded identically so the driver's hash compare is exact.
  *
  * Scale notes (100 TB design stance): all pipelines are single-pass
  * shuffles on the natural key (no driver collects, no loops); dimension
  * sides of joins (`part`, `customer` point lookups) are broadcast; the
  * fact table (`lineitem`) is never materialized wider than the projected
  * columns.
  */
object Relational {

  /** Q4 cold-start popularity (ref `src/cold_strategy/cold_rec.py:53-65`):
    * "movies with more than m ratings, by average rating desc" ≡ parts with
    * >30 lineitems by avg extended price. Cypher's two-phase MATCH folds
    * into ONE hash aggregation (SURVEY §2.3 J5) — no self-join.
    */
  val popularParts = Q(
    "q02_popular_parts",
    (s, d) => {
      // average over exact integer cents: the sort key + LIMIT cutoff is
      // then a deterministic function of identical inputs on both engines
      // (an avg over raw doubles is order-dependent at the ulp level)
      Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("part_id"))
        .agg(count(lit(1)).as("cnt"),
             round(avg(round(col("l_extendedprice") * 100, 0).cast("long")), 4)
               .as("avg_price_cents"))
        .where(col("cnt") > 30)
        .orderBy(col("avg_price_cents").desc, col("part_id"))
        .limit(20)
    },
    Some("""SELECT l_partkey AS part_id, count(*) AS cnt,
           round(avg(CAST(round(l_extendedprice * 100, 0) AS BIGINT)), 4)
             AS avg_price_cents
           FROM lineitem GROUP BY 1 HAVING count(*) > 30
           ORDER BY avg_price_cents DESC, part_id LIMIT 20""")
  )

  /** TPC-H Q1-shaped pricing summary: scan→filter(pushdown)→hash agg.
    * (SURVEY §2.5 A2–A4 family; the flagship wide aggregation.) */
  val pricingSummary = Q(
    "q01_pricing_summary",
    (s, d) => {
      Tables.lineitem(s, d)
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
           FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
           GROUP BY l_returnflag, l_linestatus
           ORDER BY l_returnflag, l_linestatus""")
  )

  /** Q5 new/cold items (ref `cold_rec.py:68-76`): parts with fewer than 20
    * lineitems — including never-sold parts, hence part LEFT JOIN lineitem
    * (count of non-null FK). */
  val coldParts = Q(
    "q03_cold_parts",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_partkey"))
      Tables.part(s, d).select(col("p_partkey"))
        .join(li, col("p_partkey") === col("l_partkey"), "left")
        .groupBy(col("p_partkey").as("part_id"))
        .agg(count(col("l_partkey")).as("cnt"))
        .where(col("cnt") < 20)
        .orderBy(col("part_id"))
    },
    Some("""SELECT p_partkey AS part_id, count(l_partkey) AS cnt
           FROM part LEFT JOIN lineitem ON p_partkey = l_partkey
           GROUP BY 1 HAVING count(l_partkey) < 20 ORDER BY part_id""")
  )

  /** Q2 point-pattern join (ref `recommend.py:115-119`): "movies rated by
    * user k" ≡ distinct parts ordered by customer 42. Filter pushes to the
    * orders scan; part dim broadcasts. */
  val customerHistory = Q(
    "q04_customer_history",
    (s, d) => {
      val o = Tables.orders(s, d).where(col("o_custkey") === 42)
        .select(col("o_orderkey"))
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      val p = Tables.part(s, d).select(col("p_partkey"), col("p_name"))
      li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey").as("part_id"), col("p_name").as("part_name"))
        .distinct()
        .orderBy(col("part_id"))
    },
    Some("""SELECT DISTINCT p_partkey AS part_id, p_name AS part_name
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           JOIN part ON l_partkey = p_partkey
           WHERE o_custkey = 42 ORDER BY part_id""")
  )

  /** Q3 reverse point lookup (ref `doc/课程报告.md:575`): customers who
    * bought part 7. */
  val partCustomers = Q(
    "q05_part_customers",
    (s, d) => {
      val li = Tables.lineitem(s, d).where(col("l_partkey") === 7)
        .select(col("l_orderkey"))
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey").as("cust_id"), col("c_name").as("cust_name"))
        .distinct()
        .orderBy(col("cust_id"))
    },
    Some("""SELECT DISTINCT c_custkey AS cust_id, c_name AS cust_name
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           WHERE l_partkey = 7 ORDER BY cust_id""")
  )

  /** Q6 global stats (ref `doc/课程报告.md:600-644`): entity counts + global
    * averages, one row. Four independent single-row aggregates cross-joined
    * (each is a partial+final agg; no shuffle of real data). */
  val globalStats = Q(
    "q06_global_stats",
    (s, d) => {
      val c = Tables.customer(s, d).agg(count(lit(1)).as("n_customers"))
      val p = Tables.part(s, d).agg(count(lit(1)).as("n_parts"))
      val o = Tables.orders(s, d).agg(count(lit(1)).as("n_orders"))
      val l = Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_lineitems"),
        round(avg(col("l_quantity")), 4).as("avg_quantity"))
      c.crossJoin(p).crossJoin(o).crossJoin(l)
    },
    Some("""SELECT (SELECT count(*) FROM customer) AS n_customers,
           (SELECT count(*) FROM part) AS n_parts,
           (SELECT count(*) FROM orders) AS n_orders,
           (SELECT count(*) FROM lineitem) AS n_lineitems,
           (SELECT round(avg(l_quantity), 4) FROM lineitem) AS avg_quantity""")
  )

  /** Q7 point lookup by key (ref `doc/课程报告.md:583-597`): one part's
    * attributes. Predicate pushdown → single row-group read at scale. */
  val pointLookup = Q(
    "q07_point_lookup",
    (s, d) =>
      Tables.part(s, d).where(col("p_partkey") === 100)
        .select(col("p_partkey").as("part_id"), col("p_name"), col("p_brand"),
                col("p_type"), col("p_size").cast("long").as("p_size"),
                round(col("p_retailprice"), 2).as("p_retailprice")),
    Some("""SELECT p_partkey AS part_id, p_name, p_brand, p_type,
           CAST(p_size AS BIGINT) AS p_size,
           round(p_retailprice, 2) AS p_retailprice
           FROM part WHERE p_partkey = 100""")
  )

  /** P7 candidate anti-join (ref `distributed.py:271-273` set-exclusion →
    * left-anti, SURVEY §2.2): parts customer 42 has NOT bought — the
    * recommendation candidate set. Distributed replacement for the
    * reference's collect-to-driver python set. */
  val candidateAnti = Q(
    "q08_candidate_anti",
    (s, d) => {
      val bought = Tables.lineitem(s, d)
        .join(broadcast(Tables.orders(s, d).where(col("o_custkey") === 42)
          .select(col("o_orderkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_partkey"))
      Tables.part(s, d).select(col("p_partkey"))
        .join(bought, col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey").as("part_id"))
        .orderBy(col("part_id"))
    },
    Some("""SELECT p_partkey AS part_id FROM part
           WHERE p_partkey NOT IN (
             SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             WHERE o_custkey = 42)
           ORDER BY part_id""")
  )

  /** Q1/J2 ratings triple (ref `spark_als.py:146-150`): the full fact join
    * `(user, item, measure, ts)` with both dimension names attached. The
    * big fact shuffles once on each FK; dims broadcast. */
  val ratingsTriple = Q(
    "q09_ratings_triple",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"))
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
      val p = Tables.part(s, d).select(col("p_partkey"), col("p_name"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("order_id"),
                col("l_linenumber").cast("long").as("line_no"),
                col("c_custkey").as("cust_id"), col("c_name").as("cust_name"),
                col("p_partkey").as("part_id"), col("p_name").as("part_name"),
                col("l_quantity").as("quantity"))
        .orderBy(col("order_id"), col("line_no"))
    },
    Some("""SELECT l_orderkey AS order_id, CAST(l_linenumber AS BIGINT) AS line_no,
           c_custkey AS cust_id, c_name AS cust_name,
           p_partkey AS part_id, p_name AS part_name,
           l_quantity AS quantity
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN part ON l_partkey = p_partkey
           ORDER BY order_id, line_no""")
  )

  /** Q10 bounded sample (ref `doc/课程报告.md:559` LIMIT 300) — made
    * deterministic with a total order (ref relies on storage order). */
  val sampleLimit = Q(
    "q10_sample_limit",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey").as("order_id"),
                col("l_linenumber").cast("long").as("line_no"),
                col("l_partkey").as("part_id"), col("l_quantity").as("quantity"))
        .orderBy(col("order_id"), col("line_no"))
        .limit(300),
    Some("""SELECT l_orderkey AS order_id, CAST(l_linenumber AS BIGINT) AS line_no,
           l_partkey AS part_id, l_quantity AS quantity
           FROM lineitem ORDER BY order_id, line_no LIMIT 300""")
  )

  /** T6 top-k per user (ref `spark_als.py:124-131` recommendForUserSubset
    * shape): top-3 orders per customer by price, via ranking window.
    * Spark ≥3.5 plans the rn<=3 filter as a window group limit
    * (InferWindowGroupLimit) — no full per-partition sort materialization. */
  val topkPerCustomer = Q(
    "q11_topk_per_customer",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 3)
        .select(col("o_custkey").as("cust_id"), col("o_orderkey").as("order_id"),
                round(col("o_totalprice"), 2).as("price"), col("rn"))
        .orderBy(col("cust_id"), col("rn"))
    },
    Some("""SELECT o_custkey AS cust_id, o_orderkey AS order_id,
           round(o_totalprice, 2) AS price, rn FROM (
             SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
             FROM orders) t
           WHERE rn <= 3 ORDER BY cust_id, rn""")
  )

  /** U4/P9 duplicate elimination (ref `recommend.py:119`). */
  val distinctFlags = Q(
    "q12_distinct_flags",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
           ORDER BY l_returnflag, l_linestatus""")
  )

  /** U6 union / graph symmetrization shape (ref `train_topn.py:74`):
    * distinct union of customer and supplier nation memberships. */
  val unionNations = Q(
    "q13_union_nations",
    (s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_nationkey").cast("long").as("nation_id"))
      val su = Tables.supplier(s, d)
        .select(col("s_nationkey").cast("long").as("nation_id"))
      c.union(su).distinct().orderBy(col("nation_id"))
    },
    Some("""SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nation_id FROM customer
           UNION SELECT CAST(s_nationkey AS BIGINT) FROM supplier
           ORDER BY nation_id""")
  )

  /** Left-semi join (EXISTS): customers having at least one order above a
    * price threshold. */
  val semiJoin = Q(
    "q14_semi_join",
    (s, d) => {
      val o = Tables.orders(s, d).where(col("o_totalprice") > 400000)
        .select(col("o_custkey"))
      Tables.customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey").as("cust_id"), col("c_name").as("cust_name"))
        .orderBy(col("cust_id"))
    },
    Some("""SELECT c_custkey AS cust_id, c_name AS cust_name FROM customer
           WHERE EXISTS (SELECT 1 FROM orders
             WHERE o_custkey = c_custkey AND o_totalprice > 400000)
           ORDER BY cust_id""")
  )

  /** A2 grouped count + HAVING over a categorical (ref `cold_rec.py:57-65`
    * family). */
  val havingPriority = Q(
    "q15_having_priority",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
             round(avg(col("o_totalprice")), 4).as("avg_price"))
        .where(col("cnt") > 10)
        .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority, count(*) AS cnt,
           round(avg(o_totalprice), 4) AS avg_price
           FROM orders GROUP BY 1 HAVING count(*) > 10
           ORDER BY o_orderpriority""")
  )

  /** Multi-hop dimension join + aggregation: avg account balance per region
    * (customer ⋈ nation ⋈ region). Dims broadcast; one fact shuffle. */
  val regionStats = Q(
    "q16_region_stats",
    (s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey"), col("c_acctbal"))
      val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_regionkey"))
      val r = Tables.region(s, d).select(col("r_regionkey"), col("r_name"))
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"))
        .agg(count(lit(1)).as("n_customers"),
             round(avg(col("c_acctbal")), 4).as("avg_acctbal"))
        .orderBy(col("region"))
    },
    Some("""SELECT r_name AS region, count(*) AS n_customers,
           round(avg(c_acctbal), 4) AS avg_acctbal
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY 1 ORDER BY region""")
  )

  /** T1 global top-k (ref `distributed.py:277` orderBy desc + limit):
    * Spark plans TakeOrderedAndProject — no global sort materialization. */
  val globalTopk = Q(
    "q17_global_topk",
    (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey").as("order_id"), col("o_custkey").as("cust_id"),
                round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("price").desc, col("order_id"))
        .limit(10),
    Some("""SELECT o_orderkey AS order_id, o_custkey AS cust_id,
           round(o_totalprice, 2) AS price
           FROM orders ORDER BY price DESC, order_id LIMIT 10""")
  )

  /** F6 multi-hot encoding (ref genre vector `streaming_rec.py:130-134`)
    * in the oracle catalog: p_type over its category vocabulary, one 0/1
    * column per term (GraftFunctions.multiHot produces the same bits as
    * an array; columns keep the oracle compare flat). */
  val multiHotTypes = Q(
    "q64_multi_hot_types",
    (s, d) => {
      val vocab = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
      val toks = split(col("p_type"), " ")
      Tables.part(s, d)
        .select(col("p_partkey").as("part_id") +:
          vocab.map(v => array_contains(toks, v).cast("long").as(s"is_${v.toLowerCase}")): _*)
        .orderBy(col("part_id"))
    },
    Some {
      val vocab = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
      val cols = vocab.map(v =>
        s"CAST(CASE WHEN list_contains(string_split(p_type, ' '), '$v') " +
          s"THEN 1 ELSE 0 END AS BIGINT) AS is_${v.toLowerCase}").mkString(", ")
      s"SELECT p_partkey AS part_id, $cols FROM part ORDER BY part_id"
    }
  )

  val all: Seq[Q] = Seq(multiHotTypes,
    pricingSummary, popularParts, coldParts, customerHistory, partCustomers,
    globalStats, pointLookup, candidateAnti, ratingsTriple, sampleLimit,
    topkPerCustomer, distinctFlags, unionNations, semiJoin, havingPriority,
    regionStats, globalTopk)
}
