package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General analytic operators (hash aggregate, broadcast + shuffle joins,
  * ranking windows) over the TPC-H-ish tables — Catalyst built-ins only;
  * money is fixed-point cents (exact cross-engine arithmetic).
  */
object Analytics {

  /** Wide hash aggregation with map-side combine (TPC-H Q1 shape). */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("qty_c", expr("CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)"))
      .withColumn("price_c", expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
      .withColumn("disc_c", expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("qty_c").as("sum_qty_c"),
        sum("price_c").as("sum_price_c"),
        sum(expr("price_c * (100 - disc_c)")).as("sum_disc_price_c2"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_c,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
      |      (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) AS sum_disc_price_c2,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Broadcast dim join + shuffle fact join + top-k (TPC-H Q3 shape). The
    * customer side is broadcast (small dim); lineitem⋈orders shuffles on
    * the order key; top-k is TakeOrderedAndProject (no global sort).
    */
  def q3Join(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .withColumn("rev_c2",
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
          "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"))
      .groupBy(col("o_orderkey"))
      .agg(sum("rev_c2").as("revenue_c2"), count(lit(1)).as("lines"))
      .orderBy(col("revenue_c2").desc, col("o_orderkey"))
      .limit(10)
  }

  val q3JoinSql: String =
    """SELECT o_orderkey,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
      |      (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) AS revenue_c2,
      |  count(*) AS lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey
      |ORDER BY revenue_c2 DESC, o_orderkey LIMIT 10""".stripMargin

  /** Ranking + running aggregate window per user over the events stream
    * (the reference's only window shape is ROW_NUMBER desc — A1; this adds
    * the general frame).
    */
  def userWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("value_c", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .select(
        col("user_id"), col("event_id"), col("event_type"),
        row_number().over(w).as("rn"),
        sum("value_c").over(w.rowsBetween(Window.unboundedPreceding, 0))
          .as("running_value_c"),
        lag("event_type", 1).over(w).as("prev_type"))
      .orderBy("user_id", "event_id")
  }

  val userWindowSql: String =
    """SELECT user_id, event_id, event_type,
      |  row_number() OVER w AS rn,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
      |    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_value_c,
      |  lag(event_type, 1) OVER w AS prev_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      |ORDER BY user_id, event_id""".stripMargin
}
