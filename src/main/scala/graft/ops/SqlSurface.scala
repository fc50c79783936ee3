package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** The `spark.sql` entry path (SURVEY §3.4: "we expose the DataFrame /
  * `spark.sql` surface") — the engine's tables registered as temp views
  * and queried with ANSI SQL, mirroring the reference's mono-backend
  * dispatch (R13, swagger:30,114,198: one backend, many routes — here one
  * session, many SQL texts).
  *
  * The declared keys prove the SQL path end-to-end: same Catalyst plans,
  * same oracle discipline, different front door.
  */
object SqlSurface {

  /** Idempotently register the given tables as `<name>` temp views,
    * through Tables.loaders so special-case loaders (events' nanos
    * conversion) apply automatically. Registering only what a query
    * references keeps the SQL path independent of unrelated files.
    */
  def registerViews(s: SparkSession, d: String,
      names: Seq[String] = Tables.loaders.keys.toSeq): Unit =
    names.foreach(t => Tables.loaders(t)(s, d).createOrReplaceTempView(t))

  /** TPC-H Q3-style shipping priority, straight SQL. */
  private def sqlShipPriority(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d, Seq("customer", "orders", "lineitem"))
    s.sql(
      """SELECT o_orderkey,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 20""".stripMargin)
  }

  /** Correlated scalar subquery + EXISTS through the SQL parser (the
    * decorrelation rules in action: RewriteCorrelatedScalarSubquery +
    * RewritePredicateSubquery).
    */
  private def sqlSubqueries(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d, Seq("customer", "nation", "orders"))
    s.sql(
      """SELECT n_name, count(*) AS n_above
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > (SELECT CAST(avg(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |                   FROM customer c2)
        |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
  }

  /** Correlated LATERAL join: top-2 orders per customer — the
    * "top-N per group as a JOIN" shape (Catalyst decorrelates the
    * correlated ORDER BY ... LIMIT subquery into a ranked window under
    * the hood, so the plan scales like q_win_rank, not like a
    * nested-loop). Restricted to a key slice to keep output bounded.
    */
  private def sqlLateral(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d, Seq("customer", "orders"))
    s.sql(
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice
        |         FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         LIMIT 2) t
        |WHERE c.c_custkey < 100
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
  }

  /** Recursive CTE (Spark 4's `WITH RECURSIVE` → `UnionLoopExec`): an
    * integer spine over the full nation-key domain LEFT-joined to
    * customer — the gap-filling shape (every key appears, zero-customer
    * nations included) that window/date-gap queries need a generator
    * for. Each recursion step is one bounded micro-plan; the loop's
    * depth here is the key domain, never the data volume, so the shape
    * is scale-free.
    */
  private def sqlRecursive(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d, Seq("customer"))
    s.sql(
      """WITH RECURSIVE spine(nk) AS (
        |  SELECT 0
        |  UNION ALL
        |  SELECT nk + 1 FROM spine WHERE nk < 24
        |)
        |SELECT spine.nk, count(c_custkey) AS n_cust,
        |       coalesce(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS sum_bal
        |FROM spine LEFT JOIN customer ON c_nationkey = spine.nk
        |GROUP BY spine.nk
        |ORDER BY spine.nk""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_recursive"     -> sqlRecursive _,
    "q_sql_lateral"       -> sqlLateral _,
    "q_sql_ship_priority" -> sqlShipPriority _,
    "q_sql_subqueries"    -> sqlSubqueries _,
  )

  val oracle: Map[String, String] = Map(
    "q_sql_recursive" ->
      """WITH RECURSIVE spine(nk) AS (
        |  SELECT 0
        |  UNION ALL
        |  SELECT nk + 1 FROM spine WHERE nk < 24
        |)
        |SELECT spine.nk, count(c_custkey) AS n_cust,
        |       coalesce(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS sum_bal
        |FROM spine LEFT JOIN customer ON c_nationkey = spine.nk
        |GROUP BY spine.nk
        |ORDER BY spine.nk""".stripMargin,
    "q_sql_lateral" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice
        |         FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         LIMIT 2) t
        |WHERE c.c_custkey < 100
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin,
    "q_sql_ship_priority" ->
      """SELECT o_orderkey,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 20""".stripMargin,
    "q_sql_subqueries" ->
      """SELECT n_name, count(*) AS n_above
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > (SELECT CAST(avg(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |                   FROM customer c2)
        |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
  )
}
