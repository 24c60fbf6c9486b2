package graft

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** THE hand-built events-table fixture contract, shared by every spec
  * that writes a synthetic events parquet (FixtureGateSpec,
  * SkewStressSpec). One copy on purpose: the r6 testdata regeneration
  * broke 15 queries by silently changing the ts domain — the schema
  * the specs pin must live in exactly one place so a future evolution
  * is fixed once, not per-suite.
  */
object EventsFixture {

  /** ts is epoch NANOS — the engine's normalized domain (Tables.load
    * branches on the stored type; these fixtures write the long-ns
    * branch).
    */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Writes rows as `<tempdir>/events.parquet` and returns the dir —
    * shaped as a gate sfDir, so `SparkEntry.queries(name)(spark, dir)`
    * runs the REAL gate function on the fixture.
    */
  def write(spark: SparkSession, rows: Seq[Row], partitions: Int = 1,
      prefix: String = "graft-fixture"): String = {
    val dir = Files.createTempDirectory(prefix).toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows, partitions), schema)
      .write.parquet(s"$dir/events.parquet")
    dir
  }
}
