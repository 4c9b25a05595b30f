package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Classic TPC-H-shaped decision-support queries over the fixtures —
  * the canonical multi-join + selective-filter + aggregate shapes that
  * exercise join ordering, pushdown through multiple scans, and top-k
  * over aggregates. Revenue is rounded to cents per row then summed, so
  * aggregation is exact-integer and order-independent across engines.
  */
object TpchShapes {

  private def revCents = round(col("l_extendedprice") *
    (lit(1) - col("l_discount")) * 100, 0).cast("long")

  /** TPC-H Q3 shape (shipping priority): revenue of building-segment
    * orders placed before a date with lineitems shipped after it. */
  val shippingPriority = Q(
    "q58_shipping_priority",
    (s, d) => {
      val c = Tables.customer(s, d)
        .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val o = Tables.orders(s, d)
        .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, d)
        .where(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), revCents.as("rc"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey").as("order_id"))
        .agg(sum(col("rc")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("order_id"))
        .limit(10)
    },
    Some("""SELECT l_orderkey AS order_id,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
             AS BIGINT)) AS BIGINT) AS revenue_cents
           FROM customer JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON o_orderkey = l_orderkey
           WHERE c_mktsegment = 'BUILDING'
             AND o_orderdate < TIMESTAMP '1998-01-01'
             AND l_shipdate > TIMESTAMP '1998-01-01'
           GROUP BY 1 ORDER BY revenue_cents DESC, order_id LIMIT 10""")
  )

  /** TPC-H Q5 shape (local supplier volume): six-way join — revenue by
    * nation for Asian customers served by suppliers of the same nation. */
  val localSupplierVolume = Q(
    "q59_local_supplier_volume",
    (s, d) => {
      val r = Tables.region(s, d).where(col("r_name") === "ASIA")
        .select(col("r_regionkey"))
      val n = Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val o = Tables.orders(s, d)
        .where(year(col("o_orderdate")) === 1996)
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), revCents.as("rc"))
      val su = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(sum(col("rc")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("nation"))
    },
    Some("""SELECT n_name AS nation,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
             AS BIGINT)) AS BIGINT) AS revenue_cents
           FROM customer JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON o_orderkey = l_orderkey
           JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'ASIA' AND year(o_orderdate) = 1996
           GROUP BY 1 ORDER BY revenue_cents DESC, nation""")
  )

  /** TPC-H Q10 shape (returned items): top customers by lost revenue on
    * returned lineitems in a window. */
  val returnedItems = Q(
    "q60_returned_items",
    (s, d) => {
      val o = Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
               col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, d)
        .where(col("l_returnflag") === "R")
        .select(col("l_orderkey"), revCents.as("rc"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey").as("cust_id"), col("c_name").as("cust_name"))
        .agg(sum(col("rc")).as("lost_cents"), count(lit(1)).as("n_items"))
        .orderBy(col("lost_cents").desc, col("cust_id"))
        .limit(20)
    },
    Some("""SELECT c_custkey AS cust_id, c_name AS cust_name,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
             AS BIGINT)) AS BIGINT) AS lost_cents,
           count(*) AS n_items
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           WHERE l_returnflag = 'R'
             AND o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1997-01-01'
           GROUP BY 1, 2 ORDER BY lost_cents DESC, cust_id LIMIT 20""")
  )

  private val priorityCheckSql: String =
    """SELECT o_orderpriority, count(*) AS n
       FROM orders
       WHERE EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
       GROUP BY 1 ORDER BY o_orderpriority"""

  /** TPC-H Q4 shape: correlated EXISTS with an inequality predicate
    * (semi join with a non-equi component), byte-identical SQL on both
    * engines. */
  val orderPriorityCheck = Q(
    "q63_order_priority_check",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(priorityCheckSql)
    },
    Some(priorityCheckSql)
  )

  /** Brand revenue routed through the EXPLICIT salt/replicate skew join
    * (`io.SkewJoin.saltedEquiJoin`, saltFactor 8): the fact side is
    * split into 8 random sub-keys and the `part` dim replicated across
    * them, so one hot part key becomes 8 even shuffle partitions — the
    * deterministic fallback for when a single key outgrows an executor
    * (AQE's skew handling is runtime-best-effort; salting is the
    * guaranteed shape). Salting MUST NOT change join semantics, which is
    * exactly what the oracle checks: the plain un-salted SQL join.
    * PlanSpec pins the `__salt` column into the physical join keys so
    * the query can't silently regress to the plain path. */
  val skewJoin = Q(
    "q104_skew_join",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey"), revCents.as("rc"))
      val pt = Tables.part(s, d)
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      graft.io.SkewJoin.saltedEquiJoin(li, pt, "l_partkey", saltFactor = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"), sum(col("rc")).as("revenue_cents"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand, count(*) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
             AS BIGINT)) AS BIGINT) AS revenue_cents
           FROM lineitem JOIN part ON l_partkey = p_partkey
           GROUP BY 1 ORDER BY p_brand""")
  )

  val all: Seq[Q] = Seq(shippingPriority, localSupplierVolume, returnedItems,
    orderPriorityCheck, skewJoin)
}
