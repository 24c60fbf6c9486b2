package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key: interleaves the low `bits` bits of
  * two dimension columns so that rows close in BOTH dimensions land
  * close on the 1-D key. Range-partitioning + sorting by the key gives
  * multi-dimensional data-skipping on plain parquet: a scan filtered
  * on either dimension touches a small contiguous band of files
  * instead of all of them — the standard lakehouse layout trick for
  * 100 TB fact tables where min/max footer stats on a single sort key
  * only prune one dimension.
  *
  * The key is a pure codegen'd integer expression (shift/mask/add — no
  * UDF, stays inside whole-stage codegen), and the same bit formula is
  * emitted as ANSI SQL for the DuckDB oracle so both engines compute
  * the identical key.
  */
object ZOrder {

  /** Morton key as a Column: interleave bits of `x` (even positions)
    * and `y` (odd positions). Inputs must already be non-negative and
    * fit in `bits` bits (mask upstream, e.g. `% (1 << bits)`).
    */
  def zkey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _).cast("long")
  }

  /** The same interleave as ANSI SQL over expressions `x` and `y` —
    * used to generate the DuckDB oracle from one shared bit loop so
    * the two engines can't drift.
    */
  def zkeySql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31)
    val terms = (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})",
        s"((($y >> $i) & 1) << ${2 * i + 1})")
    }
    terms.mkString("(", " + ", ")")
  }

  /** Cluster `df` for scan locality: compute the Morton key over the
    * two (pre-masked) dimension columns, range-partition on it, sort
    * within partitions. Wide shuffle once at write time; every later
    * filtered scan pays less.
    */
  def cluster(df: DataFrame, x: Column, y: Column, bits: Int,
      numPartitions: Int): DataFrame = {
    val keyed = df.withColumn("zkey", zkey(x, y, bits))
    keyed.repartitionByRange(numPartitions, col("zkey"))
      .sortWithinPartitions("zkey")
  }
}
