package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.schema.SchemaJson

/** Structured Streaming layer (SURVEY.md §2.9): the engine's analogue
  * of the reference's data-streams deployment (pom:30,
  * `sc.fromStream`, ScalaSparkProgram-sparkprogram.md:32) — rebuilt on
  * readStream/writeStream instead of DStreams.
  *
  * Kept deliberately thin: streams are DataFrames, so every relational
  * stage and dynamic-compiled transform in the engine applies
  * unchanged; what this module adds is the source/sink wiring plus the
  * streaming-only concerns (watermarks, windows, within-watermark
  * dedup, stateful sessionization).
  */
object StreamStages {

  /** File-based stream source: new files under `path` become
    * micro-batches. Schema required (streaming reads cannot infer).
    */
  def fileSource(spark: SparkSession, format: String, path: String,
      schemaJson: String, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    var r = spark.readStream.schema(SchemaJson.parse(schemaJson))
    maxFilesPerTrigger.foreach(n => r = r.option("maxFilesPerTrigger", n))
    r.format(format).load(path)
  }

  /** Rate source for load/sanity testing. */
  def rateSource(spark: SparkSession, rowsPerSecond: Long): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()

  /** Tumbling/sliding event-time window aggregation with a watermark
    * for late data. `aggregates` are SQL expression strings, as in the
    * batch AggregateCompute stage.
    */
  def windowedAgg(df: DataFrame, timeCol: String, watermark: String,
      windowDuration: String, slide: Option[String],
      groupBy: Seq[String], aggregates: Seq[String]): DataFrame = {
    val win = slide match {
      case Some(s) => window(col(timeCol), windowDuration, s)
      case None    => window(col(timeCol), windowDuration)
    }
    val keys = win +: groupBy.map(col)
    df.withWatermark(timeCol, watermark)
      .groupBy(keys: _*)
      .agg(expr(aggregates.head), aggregates.tail.map(expr): _*)
  }

  /** Exactly-once-style dedup on event keys within the watermark
    * horizon (bounded state — the unbounded form would leak state
    * forever at 100 TB/day).
    */
  def dedupWithinWatermark(df: DataFrame, timeCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Memory sink for tests/smoke: processes everything currently
    * available, synchronously, then returns the finished query.
    */
  def runToMemory(df: DataFrame, queryName: String,
      outputMode: String = "append"): StreamingQuery = {
    val q = df.writeStream.format("memory")
      .queryName(queryName).outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Production-shaped sink: parquet files + checkpoint dir (the
    * at-least-once restart contract).
    */
  def toParquet(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
}
