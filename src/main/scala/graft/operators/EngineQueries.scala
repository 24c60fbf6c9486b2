package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.{Connection, Pipeline, PipelineSpec, StageSpec}

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
        |) WHERE word <> '' GROUP BY word ORDER BY n DESC, word""".stripMargin))
  )

  val queries: Map[String, Q] = defs.map(d => d.name -> d.fn).toMap
  val oracleSql: Map[String, String] =
    defs.flatMap(d => d.sql.map(d.name -> _)).toMap
}
