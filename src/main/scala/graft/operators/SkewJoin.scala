package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §4 / 100 TB rules):
  * when one join key carries a disproportionate share of the big
  * side's rows, a plain hash join sends that whole key to one task.
  * Salting splits each big-side key into `saltBuckets` sub-keys and
  * replicates the small side once per bucket, spreading the hot key
  * across `saltBuckets` tasks at the cost of a small-side blowup.
  *
  * AQE's skew-join split handles sort-merge cases adaptively; this is
  * the explicit, planner-independent form for when the small side is
  * broadcast-sized and the skew is extreme.
  *
  * The salt is derived deterministically from a uniformly-distributed
  * hash of the big side's whole row (not the join key, which is
  * constant within the hot key) — reproducible runs, no rand().
  */
object SkewJoin {

  /** Supported join types: the big-side-preserving ones. Right/full
    * outer would emit `saltBuckets` null-extended copies of unmatched
    * small-side rows (each replica misses independently).
    */
  private val SupportedJoinTypes = Set("inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti", "cross")

  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0)
    require(SupportedJoinTypes(joinType.toLowerCase),
      s"saltedJoin supports ${SupportedJoinTypes.mkString("/")}, not '$joinType' " +
        "(right/full outer would duplicate unmatched small-side rows per salt bucket)")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toSeq: _*)), lit(saltBuckets)))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt").cast("bigint"))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey)
          && saltedBig("__salt") === saltedSmall("__salt"),
        joinType)
      .drop("__salt")
  }

  /** Convenience: measure per-key share of the big side to decide if
    * salting is warranted (driver gets only the top-k counts).
    */
  def topKeyShares(df: DataFrame, key: String, k: Int = 10): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(k)
}
