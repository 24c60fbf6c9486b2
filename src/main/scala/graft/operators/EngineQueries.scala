package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.{Connection, Pipeline, PipelineSpec, StageSpec}
import graft.streaming.StreamStages

/** Correctness-gate entries that exercise the ENGINE itself — the
  * pipeline DAG executor and the runtime Scala compiler — not just the
  * operators: the declared result must still hash-match a DuckDB
  * oracle, so spec parsing, macro resolution, stage composition and
  * dynamic compilation are all on the hook.
  */
object EngineQueries {
  import RelationalQueries.{Q, QDef}

  private def runStage(spec: PipelineSpec, s: SparkSession,
      args: Map[String, String], stage: String): DataFrame =
    new Pipeline(spec).run(s, args)(stage)

  val defs: Seq[QDef] = Seq(

    // declarative pipeline: source → filter → aggregate → sort, with a
    // ${sf} macro resolved at run time
    QDef("pipeline_e2e", (s, dir) => {
      val spec = PipelineSpec(Seq(
        StageSpec("src", "parquet", Map("path" -> "${sf}/lineitem.parquet")),
        StageSpec("flt", "filter", Map("condition" -> "l_quantity >= 30")),
        StageSpec("agg", "aggregate", Map(
          "groupBy" -> "l_returnflag",
          "aggregates" -> "count(*) as n, sum(l_quantity) as qty")),
        StageSpec("srt", "sort", Map("columns" -> "l_returnflag"))),
        Seq(Connection("src", "flt"), Connection("flt", "agg"),
          Connection("agg", "srt")))
      runStage(spec, s, Map("sf" -> dir), "srt")
    },
      Some("""SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS qty
        |FROM lineitem WHERE l_quantity >= 30
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // runtime-compiled user transform inside the pipeline: the
    // reference's flagship path, oracle-checked end to end
    QDef("dynamic_wordcount", (s, dir) => {
      val code =
        """def transform(df: DataFrame): DataFrame =
          |  df.select(explode(split(col("text"), " ")).as("word"))
          |    .filter(col("word") =!= "")
          |    .groupBy("word").count().withColumnRenamed("count", "n")
          |""".stripMargin
      val spec = PipelineSpec(Seq(
        StageSpec("src", "parquet", Map("path" -> "${sf}/documents.parquet")),
        StageSpec("wc", "scalaCompute", Map("scalaCode" -> code)),
        StageSpec("srt", "sort", Map("columns" -> "n DESC, word"))),
        Seq(Connection("src", "wc"), Connection("wc", "srt")))
      runStage(spec, s, Map("sf" -> dir), "srt")
    },
      Some("""SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |) WHERE word <> '' GROUP BY word ORDER BY n DESC, word""".stripMargin)),

    // Structured Streaming, oracle-checked: replay events as a
    // one-file stream, watermarked 1-day tumbling window counts in
    // append mode. Append emits exactly the windows whose end the
    // final watermark (max event time - 1h) passed — the oracle
    // reproduces that horizon in the µs domain, so real streaming
    // semantics (not just stream≡batch) are what's being hashed.
    QDef("stream_window_agg", (s, dir) => {
      val streamDir = java.nio.file.Files.createTempDirectory("graft-gate-stream")
      Tables.load(s, dir, "events")
        .withColumn("ets", timestamp_micros(expr("ts div 1000")))
        .select("ets", "event_type")
        .coalesce(1) // one file → one micro-batch → deterministic emit set
        .write.mode("overwrite").parquet(streamDir.toString)
      val schema = s.read.parquet(streamDir.toString).schema
      val src = StreamStages.fileSource(s, "parquet", streamDir.toString, schema.json)
      val agg = StreamStages.windowedAgg(src, "ets", watermark = "1 hour",
        windowDuration = "1 day", slide = None,
        groupBy = Seq("event_type"), aggregates = Seq("count(*) AS n"))
      StreamStages.runToMemory(agg, "gate_stream_win")
      s.table("gate_stream_win")
        .select(col("window.start").as("day_start"), col("event_type"), col("n"))
        .orderBy("day_start", "event_type")
    },
      Some("""WITH e AS (
        |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day_start, event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events),
        |horizon AS (SELECT max(ts_us) - 3600000000 AS wm FROM e)
        |SELECT day_start, event_type, count(*) AS n
        |FROM e
        |WHERE epoch_us(day_start) + 86400000000 <= (SELECT wm FROM horizon)
        |GROUP BY day_start, event_type
        |ORDER BY day_start, event_type""".stripMargin))
  )

  val queries: Map[String, Q] = defs.map(d => d.name -> d.fn).toMap
  val oracleSql: Map[String, String] =
    defs.flatMap(d => d.sql.map(d.name -> _)).toMap
}
