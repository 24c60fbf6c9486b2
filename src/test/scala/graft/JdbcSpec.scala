package graft

import graft.pipeline.{MemorySink, Pipeline}

/** Exercises the jdbc source/sink stages for real against Derby
  * embedded (ships with Spark's jars for the Hive metastore, so it is
  * on the unmanaged classpath in this zero-egress environment): sink
  * writes a table, source reads it back with the partitioned-read
  * knobs (partitionColumn/lowerBound/upperBound/numPartitions).
  */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  test("jdbc sink → partitioned jdbc source round-trip (Derby embedded)") {
    val sinkJson =
      s"""{"stages": [
         |  {"name": "src", "type": "parquet", "properties": {"path": "$sfDir/nation.parquet"}},
         |  {"name": "db", "type": "jdbcSink", "properties": {
         |    "mode": "overwrite", "option.url": "$url", "option.dbtable": "NATION",
         |    "option.driver": "$driver"}}
         |], "connections": [{"from": "src", "to": "db"}]}""".stripMargin
    Pipeline.fromJson(sinkJson).run(spark)

    val srcJson =
      s"""{"stages": [
         |  {"name": "db", "type": "jdbc", "properties": {
         |    "option.url": "$url", "option.dbtable": "NATION",
         |    "option.driver": "$driver",
         |    "option.partitionColumn": "n_nationkey", "option.lowerBound": "0",
         |    "option.upperBound": "25", "option.numPartitions": "4"}},
         |  {"name": "out", "type": "memorySink", "properties": {"key": "jdbcRt"}}
         |], "connections": [{"from": "db", "to": "out"}]}""".stripMargin
    Pipeline.fromJson(srcJson).run(spark)

    val expect = Tables.load(spark, sfDir, "nation")
      .collect().map(r => r.getAs[Long]("n_nationkey") -> r.getAs[String]("n_name")).toSet
    val got = MemorySink.results("jdbcRt")
      .map(r => r.getAs[Long]("n_nationkey") -> r.getAs[String]("n_name")).toSet
    assert(got == expect)
    assert(expect.nonEmpty)
  }

  test("partitioned jdbc read actually splits into numPartitions") {
    val df = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "NATION").option("driver", driver)
      .option("partitionColumn", "n_nationkey")
      .option("lowerBound", "0").option("upperBound", "25")
      .option("numPartitions", "4")
      .load()
    assert(df.rdd.getNumPartitions == 4)
  }
}
