package graft

/** Scan-efficiency CI — the complement to PlanAuditSpec's shuffle/join
  * audit: at 100 TB the scan IS the query cost, so gates must push
  * predicates into the parquet reader and prune unread columns, and
  * the relational hot path must stay inside whole-stage codegen. A
  * scan that reads 11 columns for a 4-column query is wrong even when
  * the answer is right — these assertions fail the build the day a
  * refactor breaks pushdown, not the day the bill arrives.
  */
class ScanAuditSpec extends SparkSpec {

  test("filter_project: predicates reach the parquet scan, unread columns pruned") {
    val plan = SparkEntry.queries("filter_project")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // non-empty pushed filters on the scan node
    assert(plan.contains("PushedFilters: ["), s"no pushdown section:\n$plan")
    assert(!plan.contains("PushedFilters: []"), s"empty pushdown:\n$plan")
    // ReadSchema carries only the touched columns: the 7 untouched
    // lineitem columns must be absent from the scan schema line
    val read = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.nonEmpty, s"no ReadSchema in plan:\n$plan")
    for (c <- Seq("l_partkey", "l_suppkey", "l_quantity", "l_tax",
        "l_returnflag", "l_linestatus"))
      assert(!read.contains(c), s"unread column $c not pruned: $read")
    for (c <- Seq("l_orderkey", "l_linenumber", "l_extendedprice",
        "l_discount", "l_shipdate"))
      assert(read.contains(c), s"needed column $c missing from scan: $read")
  }

  test("q1_agg: aggregation hot path runs inside whole-stage codegen") {
    // AQE wraps the plan until execution — run it, then read the
    // finalized plan's formatted explain (codegen ids mark the
    // whole-stage spans)
    val df = SparkEntry.queries("q1_agg")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("codegen id"), s"no codegen span:\n$plan")
  }

  test("partitioned layout: directory pruning reaches the scan (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.load(spark, sfDir, "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val all = spark.read.parquet(dir)
    val one = all.filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .select("event_id")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("event_type"), s"no partition pruning:\n$plan")
    // pruned read returns exactly the one directory's rows
    assert(one.count() ==
      all.filter(org.apache.spark.sql.functions.col("event_type") === "click").count())
  }

  test("join_multiway: small dimensions broadcast, never shuffled") {
    val plan = SparkEntry.queries("join_multiway")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }
}
