package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over a driver-generated scale-factor directory
  * (see TESTDATA.md): TPC-H-ish star schema + `events` + LLM tables.
  *
  * Loads are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown/pruning freedom; at cluster scale the same API reads a
  * partitioned directory tree without change. Views are registered so
  * both the DataFrame API and `spark.sql` address tables by name —
  * mirroring the reference's named-dataset addressing
  * (reference: src/test/java/io/cdap/plugin/spark/dynamic/ScalaSparkTest.java:118-128)
  * and temp-table SQL (ScalaSparkTest.java:279-280).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables — always broadcast-join candidates. */
  val smallDims: Set[String] = Set("region", "nation", "supplier")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    // outright unless read as a raw long (nanoseconds since epoch).
    // Queries work in the epoch-microsecond domain via `ts div 1000`,
    // matching DuckDB's ns→µs truncation.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view named after itself. Idempotent. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
