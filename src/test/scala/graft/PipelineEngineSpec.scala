package graft

import graft.pipeline.{MemorySink, Pipeline, PipelineSpec}

class PipelineEngineSpec extends SparkSpec {

  test("JSON spec: source → filter → aggregate → memory sink, with macros") {
    val json =
      s"""{"stages": [
         |  {"name": "src", "type": "parquet",
         |   "properties": {"path": "$${sf}/lineitem.parquet"}},
         |  {"name": "flt", "type": "filter",
         |   "properties": {"condition": "l_quantity >= 30"}},
         |  {"name": "agg", "type": "aggregate",
         |   "properties": {"groupBy": "l_returnflag",
         |                  "aggregates": "count(*) as n, sum(l_quantity) as qty"}},
         |  {"name": "out", "type": "memorySink", "properties": {"key": "p1"}}
         |],
         |"connections": [
         |  {"from": "src", "to": "flt"},
         |  {"from": "flt", "to": "agg"},
         |  {"from": "agg", "to": "out"}
         |]}""".stripMargin
    Pipeline.fromJson(json).run(spark, Map("sf" -> sfDir))
    val got = MemorySink.results("p1").map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val expect = Tables.load(spark, sfDir, "lineitem")
      .filter("l_quantity >= 30").groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum("l_quantity"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expect)
  }

  test("wordcount E2E with memory source + dynamic scalaCompute (reference E2E analogue)") {
    val json =
      """{"stages": [
        |  {"name": "src", "type": "memory", "properties": {
        |    "schema": "{\"type\":\"record\",\"name\":\"in\",\"fields\":[{\"name\":\"body\",\"type\":[\"string\",\"null\"]}]}",
        |    "rowsJson": "[[\"Line 0\"],[\"Line 1\"],[\"Line 2\"],[\"Line 3\"],[\"Line 4\"],[\"Line 5\"],[\"Line 6\"],[\"Line 7\"],[\"Line 8\"],[\"Line 9\"]]"}},
        |  {"name": "wc", "type": "scalaCompute", "properties": {
        |    "scalaCode": "def transform(df: DataFrame): DataFrame = df.select(explode(split(col(\"body\"), \"\\\\s+\")).as(\"word\")).groupBy(\"word\").count()",
        |    "outputSchema": "{\"type\":\"record\",\"name\":\"out\",\"fields\":[{\"name\":\"word\",\"type\":[\"string\",\"null\"]},{\"name\":\"count\",\"type\":[\"long\",\"null\"]}]}"}},
        |  {"name": "out", "type": "memorySink", "properties": {"key": "wc"}}
        |],
        |"connections": [{"from": "src", "to": "wc"}, {"from": "wc", "to": "out"}]}""".stripMargin
    Pipeline.fromJson(json).run(spark)
    val got = MemorySink.results("wc").map(r => r.getString(0) -> r.getLong(1)).toMap
    val golden = Map("Line" -> 10L) ++ (0 until 10).map(i => i.toString -> 1L)
    assert(got == golden)
  }

  test("multi-input join stage with broadcast hint") {
    val json =
      s"""{"stages": [
         |  {"name": "li", "type": "parquet", "properties": {"path": "$sfDir/lineitem.parquet"}},
         |  {"name": "ord", "type": "parquet", "properties": {"path": "$sfDir/orders.parquet"}},
         |  {"name": "j", "type": "join", "properties": {
         |    "condition": "l.l_orderkey = r.o_orderkey", "joinType": "inner", "broadcast": "true"}},
         |  {"name": "agg", "type": "aggregate", "properties": {"aggregates": "count(*) as n"}},
         |  {"name": "out", "type": "memorySink", "properties": {"key": "join1"}}
         |],
         |"connections": [
         |  {"from": "li", "to": "j"}, {"from": "ord", "to": "j"},
         |  {"from": "j", "to": "agg"}, {"from": "agg", "to": "out"}]}""".stripMargin
    Pipeline.fromJson(json).run(spark)
    val n = MemorySink.results("join1").head.getLong(0)
    assert(n == Tables.load(spark, sfDir, "lineitem").count())
  }

  test("sql stage over upstream views named by stage") {
    val json =
      s"""{"stages": [
         |  {"name": "lineitem_v", "type": "parquet", "properties": {"path": "$sfDir/lineitem.parquet"}},
         |  {"name": "q", "type": "sql", "properties": {
         |    "sql": "SELECT l_returnflag, count(*) AS n FROM lineitem_v GROUP BY l_returnflag"}},
         |  {"name": "out", "type": "memorySink", "properties": {"key": "sql1"}}
         |],
         |"connections": [{"from": "lineitem_v", "to": "q"}, {"from": "q", "to": "out"}]}""".stripMargin
    Pipeline.fromJson(json).run(spark)
    assert(MemorySink.results("sql1").map(_.getString(0)).toSet == Set("A", "N", "R"))
  }

  test("rename, drop, withColumn, sortWithinPartitions stages") {
    val spec = PipelineSpec(Seq(
      pipeline.StageSpec("src", "parquet", Map("path" -> s"$sfDir/region.parquet")),
      pipeline.StageSpec("wc", "withColumn", Map("name" -> "tag",
        "expression" -> "concat(r_name, '#', cast(r_regionkey as string))")),
      pipeline.StageSpec("rn", "rename", Map("mapping" -> "r_name=>region_name")),
      pipeline.StageSpec("dr", "drop", Map("columns" -> "r_regionkey")),
      pipeline.StageSpec("sw", "sortWithinPartitions", Map("columns" -> "region_name DESC")),
      pipeline.StageSpec("out", "memorySink", Map("key" -> "shape1"))),
      Seq(pipeline.Connection("src", "wc"), pipeline.Connection("wc", "rn"),
        pipeline.Connection("rn", "dr"), pipeline.Connection("dr", "sw"),
        pipeline.Connection("sw", "out")))
    new Pipeline(spec).run(spark)
    val rows = MemorySink.results("shape1")
    assert(rows.head.schema.fieldNames.toSeq == Seq("region_name", "tag"))
    assert(rows.exists(_.getString(1) == "ASIA#2"))
  }

  test("sort stage honors DESC / NULLS, expr lists split on top-level commas only") {
    import graft.pipeline.StageRegistry
    assert(StageRegistry.splitExprs("percentile(x, 0.5) as p50, count(*) as n")
      == Seq("percentile(x, 0.5) as p50", "count(*) as n"))
    val spec = PipelineSpec(Seq(
      pipeline.StageSpec("src", "parquet", Map("path" -> s"$sfDir/region.parquet")),
      pipeline.StageSpec("srt", "sort", Map("columns" -> "r_regionkey DESC")),
      pipeline.StageSpec("lim", "limit", Map("n" -> "1")),
      pipeline.StageSpec("agg", "aggregate", Map(
        "aggregates" -> "percentile(r_regionkey, 0.5) as p50, count(*) as n")),
      pipeline.StageSpec("out", "memorySink", Map("key" -> "sort1")),
      pipeline.StageSpec("out2", "memorySink", Map("key" -> "agg2"))),
      Seq(pipeline.Connection("src", "srt"), pipeline.Connection("srt", "lim"),
        pipeline.Connection("lim", "out"),
        pipeline.Connection("src", "agg"), pipeline.Connection("agg", "out2")))
    new Pipeline(spec).run(spark)
    assert(MemorySink.results("sort1").head.getInt(0) == 4) // DESC really descends
    assert(MemorySink.results("agg2").head.getDouble(0) == 2.0)
  }

  test("validate catches unknown connection endpoints and sink-as-input") {
    val bad = PipelineSpec(Seq(
      pipeline.StageSpec("src", "range", Map("end" -> "3")),
      pipeline.StageSpec("out", "memorySink", Map()),
      pipeline.StageSpec("flt", "filter", Map("condition" -> "1=1"))),
      Seq(pipeline.Connection("src", "out"), pipeline.Connection("ghost", "out"),
        pipeline.Connection("out", "flt")))
    val errs = new Pipeline(bad).validate()
    assert(errs.exists(_.contains("unknown stage 'ghost'")))
    assert(errs.exists(_.contains("reads from sink")))
    // deploy-time validate with unresolved macros passes (deferred)
    val macros = PipelineSpec(Seq(
      pipeline.StageSpec("src", "parquet", Map("path" -> "${sf}/region.parquet")),
      pipeline.StageSpec("out", "memorySink", Map())),
      Seq(pipeline.Connection("src", "out")))
    assert(new Pipeline(macros).validate().isEmpty)
  }

  test("csv and json sources round-trip through format sinks") {
    val base = java.nio.file.Files.createTempDirectory("graft-fmt")
    val json =
      s"""{"stages": [
         |  {"name": "src", "type": "parquet", "properties": {"path": "$sfDir/region.parquet"}},
         |  {"name": "csvOut", "type": "csvSink", "properties": {
         |    "path": "$base/csv", "option.header": "true"}},
         |  {"name": "jsonOut", "type": "jsonSink", "properties": {"path": "$base/json"}}
         |],
         |"connections": [{"from": "src", "to": "csvOut"}, {"from": "src", "to": "jsonOut"}]}""".stripMargin
    Pipeline.fromJson(json).run(spark)
    val schema = Tables.load(spark, sfDir, "region").schema
    val backJson =
      s"""{"stages": [
         |  {"name": "csvIn", "type": "csv", "properties": {
         |    "path": "$base/csv", "option.header": "true",
         |    "schema": ${org.json4s.jackson.JsonMethods.compact(
               org.json4s.jackson.JsonMethods.parse("\"" + schema.json.replace("\\", "\\\\").replace("\"", "\\\"") + "\""))}}},
         |  {"name": "jsonIn", "type": "json", "properties": {"path": "$base/json"}},
         |  {"name": "o1", "type": "memorySink", "properties": {"key": "csvBack"}},
         |  {"name": "o2", "type": "memorySink", "properties": {"key": "jsonBack"}}
         |],
         |"connections": [{"from": "csvIn", "to": "o1"}, {"from": "jsonIn", "to": "o2"}]}""".stripMargin
    Pipeline.fromJson(backJson).run(spark)
    val names = Tables.load(spark, sfDir, "region").collect().map(_.getString(1)).toSet
    assert(MemorySink.results("csvBack").map(_.getString(1)).toSet == names)
    assert(MemorySink.results("jsonBack").size == 5)
  }

  test("partitionBy sink writes hive-layout dirs and reads back partition-pruned") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    val json =
      s"""{"stages": [
         |  {"name": "src", "type": "parquet",
         |   "properties": {"path": "$sfDir/events.parquet"}},
         |  {"name": "snk", "type": "parquetSink",
         |   "properties": {"path": "$out/ev", "partitionBy": "event_type"}}
         |],
         |"connections": [{"from": "src", "to": "snk"}]}""".stripMargin
    Pipeline.fromJson(json).run(spark)
    // hive layout on disk
    val dirs = new java.io.File(s"$out/ev").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("event_type=")), dirs.mkString(","))
    // 100 TB behavior: a partition-key predicate becomes a
    // PartitionFilter — whole directories skipped, never opened —
    // not a row-level data filter
    val rd = spark.read.parquet(s"$out/ev").filter(col("event_type") === "view")
    val scan = rd.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("event_type"),
      s"partition predicate not pushed to PartitionFilters:\n$scan")
    val expected = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "view").count()
    assert(rd.count() == expected)
  }

  test("dependency wildcard expands a directory of jars") {
    val helper = graft.dynamic.DynamicCompiler.compile(
      "object WildConst { val N = 7 }")
    val dir = helper.jar.getParent
    val deps = graft.dynamic.DynamicCompiler.expandDependencies(s"$dir/*")
    assert(deps.exists(_.toString.endsWith(".jar")))
    val spec = PipelineSpec(Seq(
      pipeline.StageSpec("src", "range", Map("end" -> "20")),
      pipeline.StageSpec("c", "scalaCompute", Map(
        "scalaCode" -> "def transform(df: DataFrame): DataFrame = df.limit(WildConst.N)",
        "dependencies" -> s"$dir/*")),
      pipeline.StageSpec("out", "memorySink", Map("key" -> "wild1"))),
      Seq(pipeline.Connection("src", "c"), pipeline.Connection("c", "out")))
    new Pipeline(spec).run(spark)
    assert(MemorySink.results("wild1").size == 7)
  }

  test("randomSplit and pivot stages") {
    val spec = PipelineSpec(Seq(
      pipeline.StageSpec("src", "parquet", Map("path" -> s"$sfDir/orders.parquet")),
      pipeline.StageSpec("tr", "randomSplit", Map("weights" -> "0.8,0.2", "index" -> "0", "seed" -> "7")),
      pipeline.StageSpec("pv", "pivot", Map(
        "groupBy" -> "year(o_orderdate)", "pivot" -> "o_orderstatus",
        "values" -> "F,O,P", "aggregates" -> "count(*)")),
      pipeline.StageSpec("out", "memorySink", Map("key" -> "pv1"))),
      Seq(pipeline.Connection("src", "tr"), pipeline.Connection("tr", "pv"),
        pipeline.Connection("pv", "out")))
    new Pipeline(spec).run(spark)
    val rows = MemorySink.results("pv1")
    assert(rows.nonEmpty && rows.head.length == 4) // year + F/O/P columns
  }

  test("field-level lineage records inputs and outputs per stage") {
    val spec = PipelineSpec(Seq(
      pipeline.StageSpec("src", "parquet", Map("path" -> s"$sfDir/region.parquet")),
      pipeline.StageSpec("sel", "select", Map("columns" -> "r_name")),
      pipeline.StageSpec("out", "memorySink", Map("key" -> "lin1"))),
      Seq(pipeline.Connection("src", "sel"), pipeline.Connection("sel", "out")))
    val (_, lineage) = new Pipeline(spec).runWithLineage(spark)
    val byStage = lineage.map(l => l.stage -> l).toMap
    assert(byStage("src").outputFields == Seq("r_regionkey", "r_name"))
    assert(byStage("sel").inputFields == Map("src" -> Seq("r_regionkey", "r_name")))
    assert(byStage("sel").outputFields == Seq("r_name"))
    assert(byStage("out").inputFields == Map("sel" -> Seq("r_name")))
  }

  test("validation: unknown type, cycle, arity, schema mismatch, bad dynamic code") {
    val badType = PipelineSpec(Seq(pipeline.StageSpec("x", "nope")), Nil)
    assert(new Pipeline(badType).validate().exists(_.contains("unknown stage type")))

    val cycle = PipelineSpec(
      Seq(pipeline.StageSpec("a", "filter", Map("condition" -> "1=1")),
        pipeline.StageSpec("b", "filter", Map("condition" -> "1=1"))),
      Seq(pipeline.Connection("a", "b"), pipeline.Connection("b", "a")))
    assert(new Pipeline(cycle).validate().exists(_.contains("cycle")))

    val badCode = PipelineSpec(Seq(
      pipeline.StageSpec("src", "range", Map("end" -> "10")),
      pipeline.StageSpec("c", "scalaCompute", Map("scalaCode" -> "def transform(df: DataFrame): Long = 1L")),
      pipeline.StageSpec("out", "memorySink", Map())),
      Seq(pipeline.Connection("src", "c"), pipeline.Connection("c", "out")))
    assert(new Pipeline(badCode).validate().exists(_.contains("must return DataFrame")))

    // macro in code defers compilation (containsMacro gate,
    // ScalaSparkCompute.java:74) — validate passes, run resolves
    val macroCode = PipelineSpec(Seq(
      pipeline.StageSpec("src", "range", Map("end" -> "10")),
      pipeline.StageSpec("c", "scalaCompute",
        Map("scalaCode" -> "def transform(df: DataFrame): DataFrame = df.limit(${n})")),
      pipeline.StageSpec("out", "memorySink", Map("key" -> "m1"))),
      Seq(pipeline.Connection("src", "c"), pipeline.Connection("c", "out")))
    assert(new Pipeline(macroCode).validate(Map("n" -> "3")).isEmpty)
    new Pipeline(macroCode).run(spark, Map("n" -> "3"))
    assert(MemorySink.results("m1").size == 3)

    // declared output schema mismatch fails at run with collected detail
    val schemaMismatch = PipelineSpec(Seq(
      pipeline.StageSpec("src", "range",
        Map("end" -> "10",
          "outputSchema" -> """{"type":"record","name":"r","fields":[{"name":"nope","type":"long"}]}""")),
      pipeline.StageSpec("out", "memorySink", Map())),
      Seq(pipeline.Connection("src", "out")))
    val e = intercept[IllegalStateException](new Pipeline(schemaMismatch).run(spark))
    assert(e.getMessage.contains("missing field 'nope'"))
  }

  test("pysparkProgram stage: deploy-time python syntax check and macro gate") {
    assume(graft.dynamic.PySparkRunner.available,
      graft.dynamic.PySparkRunner.unavailableReason)
    def spec(code: String, extra: Map[String, String] = Map.empty) =
      PipelineSpec(Seq(
        pipeline.StageSpec("src", "range", Map("end" -> "10")),
        pipeline.StageSpec("py", "pysparkProgram",
          Map("pythonCode" -> code) ++ extra),
        pipeline.StageSpec("out", "memorySink", Map("key" -> "py1"))),
        Seq(pipeline.Connection("src", "py"), pipeline.Connection("py", "out")))
    // broken python fails at DEPLOY time (py_compile), not at run
    val errs = new Pipeline(spec("def broken(:\n  pass")).validate()
    assert(errs.exists(_.contains("python syntax error")), errs.mkString("; "))
    // clean python validates clean
    assert(new Pipeline(spec("print('hi')")).validate().isEmpty)
    // an unresolved ${macro} is NOT a syntax error at deploy time
    // (reference containsMacro gate) but resolves and checks at run
    assert(new Pipeline(spec("x = \"${path}\"\nprint(x)")).validate().isEmpty)
    // a malformed pyFiles URI is caught at deploy time (reference
    // PySparkProgram.java:49-51 configure() parity)
    val uriErrs = new Pipeline(spec("print('hi')",
      Map("pyFiles" -> "ht tp://bad uri"))).validate()
    assert(uriErrs.exists(_.contains("bad pyFiles URI")), uriErrs.mkString("; "))
  }

  test("LLM operator stages: minhashDedup + textStats + annTopK through the DSL") {
    // end-to-end dedup as a declarative stage must equal the API call
    val dedupJson =
      s"""{"stages": [
         |  {"name": "src", "type": "parquet", "properties": {"path": "$sfDir/documents.parquet"}},
         |  {"name": "dd", "type": "minhashDedup", "properties": {"threshold": "0.5"}},
         |  {"name": "out", "type": "memorySink", "properties": {"key": "dd1"}}
         |], "connections": [{"from": "src", "to": "dd"}, {"from": "dd", "to": "out"}]}""".stripMargin
    Pipeline.fromJson(dedupJson).run(spark)
    val got = MemorySink.results("dd1").map(_.getAs[Long]("doc_id")).toSet
    val expect = graft.llm.Dedup.dropNearDups(
        Tables.load(spark, sfDir, "documents"), "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expect && got.nonEmpty)

    val statsJson =
      s"""{"stages": [
         |  {"name": "src", "type": "parquet", "properties": {"path": "$sfDir/documents.parquet"}},
         |  {"name": "st", "type": "textStats", "properties": {}},
         |  {"name": "flt", "type": "filter", "properties": {"condition": "n_tokens >= 10"}},
         |  {"name": "out", "type": "memorySink", "properties": {"key": "st1"}}
         |], "connections": [{"from": "src", "to": "st"}, {"from": "st", "to": "flt"},
         |  {"from": "flt", "to": "out"}]}""".stripMargin
    Pipeline.fromJson(statsJson).run(spark)
    assert(MemorySink.results("st1").nonEmpty)

    // two-input ANN: queries = every 50th vector, corpus = all
    val annJson =
      s"""{"stages": [
         |  {"name": "emb", "type": "parquet", "properties": {"path": "$sfDir/embeddings.parquet"}},
         |  {"name": "qs", "type": "filter", "properties": {"condition": "vec_id % 50 = 0"}},
         |  {"name": "ann", "type": "annTopK", "properties": {"method": "exact", "k": "3"}},
         |  {"name": "out", "type": "memorySink", "properties": {"key": "ann1"}}
         |], "connections": [{"from": "emb", "to": "qs"}, {"from": "qs", "to": "ann"},
         |  {"from": "emb", "to": "ann"}, {"from": "ann", "to": "out"}]}""".stripMargin
    Pipeline.fromJson(annJson).run(spark)
    val ann = MemorySink.results("ann1")
    assert(ann.nonEmpty && ann.forall(_.getAs[Int]("rank") <= 3))
  }

  test("localCheckpoint stage: identical rows, lineage actually cut") {
    // the fan-out lineage-cut stage the multimodal flagship uses: the
    // checkpointed run must be row-identical to the plain run, and the
    // downstream plan must scan the materialized RDD instead of
    // re-deriving the subtree (the whole point — Catalyst does not CSE
    // shared DAG subtrees)
    import graft.pipeline.{Connection, StageSpec}
    def spec(ck: Boolean) = {
      val stages = Seq(
        StageSpec("src", "parquet", Map("path" -> s"$sfDir/lineitem.parquet")),
        StageSpec("flt", "filter", Map("condition" -> "l_quantity >= 30"))) ++
        (if (ck) Seq(StageSpec("ckpt", "localCheckpoint", Map.empty)) else Nil) ++
        Seq(StageSpec("agg", "aggregate", Map("groupBy" -> "l_returnflag",
          "aggregates" -> "count(*) AS n, sum(l_quantity) AS qty")))
      val names = stages.map(_.name)
      PipelineSpec(stages, names.zip(names.tail).map { case (a, b) => Connection(a, b) })
    }
    val plain = new Pipeline(spec(ck = false)).run(spark)("agg")
    val cut = new Pipeline(spec(ck = true)).run(spark)("agg")
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(key(cut) == key(plain) && key(cut).nonEmpty)
    val plan = cut.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD"), s"lineage not cut:\n$plan")
    assert(!plan.toLowerCase.contains("parquet"), s"source still in plan:\n$plan")
  }

  test("splitExprs: string literals are opaque to paren/comma scanning") {
    import graft.pipeline.StageRegistry.splitExprs
    assert(splitExprs("concat(a, ',', b) as ab, c") ==
      Seq("concat(a, ',', b) as ab", "c"))
    assert(splitExprs("regexp_replace(x, '\\(', '') as clean") ==
      Seq("regexp_replace(x, '\\(', '') as clean"))
    // SQL '' escaping inside a literal
    assert(splitExprs("concat(a, 'it''s, fine(', b) as s, d") ==
      Seq("concat(a, 'it''s, fine(', b) as s", "d"))
    assert(splitExprs("a, b, c") == Seq("a", "b", "c"))
    // backslash-escaped quote inside a single-quoted literal
    assert(splitExprs("regexp_replace(x, '\\'', '') as q, y") ==
      Seq("regexp_replace(x, '\\'', '') as q", "y"))
    // double-quoted string literals are opaque too
    assert(splitExprs("concat(a, \",\", b) as ab, c") ==
      Seq("concat(a, \",\", b) as ab", "c"))
    // backquoted identifiers may contain commas; backslash is NOT an
    // escape there (doubled backtick is)
    assert(splitExprs("`weird, name` as w, `path\\` as p, z") ==
      Seq("`weird, name` as w", "`path\\` as p", "z"))
  }
}
