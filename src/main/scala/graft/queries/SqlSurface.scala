package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-surface parity: the SAME ANSI SQL string is executed by Spark SQL
  * (over temp views of the tables) and by DuckDB as its own oracle — the
  * engine exposes a full SQL front-end, not just the DataFrame DSL.
  */
object SqlSurface {
  import Tables.t

  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents")

  private def sql(q: String): QueryDef = QueryDef(
    (s: SparkSession, dir: String) => {
      tables.foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql(q)
    },
    Some(q)
  )

  val defs: Map[String, QueryDef] = Map(
    "q_sql_having" -> sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         HAVING COUNT(*) > 100
         ORDER BY l_returnflag, l_linestatus"""),

    "q_sql_scalar_subquery" -> sql(
      """SELECT o_orderkey, o_totalprice
         FROM orders
         WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
         ORDER BY o_orderkey"""),

    "q_sql_in_subquery" -> sql(
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
         ORDER BY c_custkey"""),

    "q_sql_corr_exists" -> sql(
      """SELECT s_suppkey, s_name FROM supplier s
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
         ORDER BY s_suppkey"""),

    "q_sql_union_all" -> sql(
      """SELECT 'auto' AS seg, c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
         UNION ALL
         SELECT 'rich' AS seg, c_custkey FROM customer WHERE c_acctbal > 9000
         ORDER BY seg, c_custkey"""),

    // correlated LATERAL derived table: top-2 nations per region — the
    // "top-k per outer row" join shape subquery-in-FROM can't express
    "q_sql_lateral" -> sql(
      """SELECT r.r_name, x.n_name
         FROM region r,
         LATERAL (SELECT n_name FROM nation
                  WHERE n_regionkey = r.r_regionkey
                  ORDER BY n_name LIMIT 2) x
         ORDER BY r_name, n_name"""),

    // recursive CTE (Spark 4 WITH RECURSIVE): a dense key spine filling
    // gaps a bare GROUP BY would drop — nation keys with zero customers
    // still get a row
    "q_sql_recursive" -> sql(
      """WITH RECURSIVE seq(n) AS (
           SELECT 0
           UNION ALL
           SELECT n + 1 FROM seq WHERE n < 24
         )
         SELECT s.n, COUNT(c.c_custkey) AS n_cust
         FROM seq s LEFT JOIN customer c ON c.c_nationkey = s.n
         GROUP BY s.n ORDER BY s.n"""),

    // window functions through the SQL front-end (top-2 latest orders per
    // customer): OVER with PARTITION BY / ORDER BY / ROWS frame parses and
    // executes identically on both engines
    "q_sql_window" -> sql(
      """WITH r AS (
           SELECT o_custkey, o_orderkey,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey) AS BIGINT) AS rn,
             COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
           FROM orders)
         SELECT o_custkey, o_orderkey, rn, n_orders
         FROM r WHERE rn <= 2 ORDER BY o_custkey, o_orderkey""")
  )
}
