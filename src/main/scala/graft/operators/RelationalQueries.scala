package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Relational operator inventory (SURVEY.md §2.3-§2.8), one named query
  * per operator, each paired with ANSI SQL the driver runs in DuckDB.
  *
  * Determinism rules (so a value-hash compare against DuckDB passes):
  *  - Money aggregates go through `DECIMAL(18,4)` before summing: decimal
  *    addition is exact, so the result is independent of Spark's partial
  *    aggregation order, then a single cast back to double is identical
  *    in both engines. Raw `sum(double)` would differ in the last bits
  *    per summation order.
  *  - Every query ends with a total ORDER BY and the SQL carries the
  *    same ORDER BY.
  *  - Aggregate result columns are aliased identically on both sides.
  */
object RelationalQueries {

  /** sum over a money column, exact regardless of add order. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- aggregation -------------------------------------------------
    "q1_agg" -> ((s, dir) => {
      // TPC-H Q1 shape: map-side partial agg then final; one shuffle on
      // the two low-cardinality group keys. Scales: partial aggregation
      // collapses 100 TB to O(groups) per partition before the shuffle.
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          avg("l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
