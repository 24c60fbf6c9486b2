package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SessionSpec extends SparkSpec {

  test("poly_hash / vector_dot registered as SQL functions") {
    GraftSession.registerFunctions(spark)
    val got = spark.sql("SELECT poly_hash('ab') AS h").collect().head.getLong(0)
    assert(got == 97L * 31 + 98)
    val dot = spark.sql(
      "SELECT vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect().head.getDouble(0)
    assert(dot == 11.0)
  }

  test("GraftExtensions class wires into a session builder") {
    // separate session instance via newSession would share extensions;
    // just verify the class instantiates and applies cleanly.
    val ext = new GraftExtensions()
    val holder = new org.apache.spark.sql.SparkSessionExtensions
    ext.apply(holder) // must not throw
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // the 100 TB behavior worth pinning: with a selective filter on
    // the dimension side, Spark injects a bloom-filter semi-join
    // (InjectRuntimeFilter) so fact rows that can't match are dropped
    // at scan/filter time instead of surviving to the join shuffle
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // sf0.001 sits under the default 10GB/10MB thresholds' radar
      // only because stats are tiny; force the feature observable
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.load(spark, sfDir, "lineitem")
      val ord = Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter") ||
        plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      assert(j.collect().nonEmpty)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // skew: one hot key with 10k rows
    val big = ((1 to 10000).map(i => (1L, s"v$i")) ++ (1 to 100).map(i => (i.toLong + 1, "x")))
      .toDF("k", "payload")
    val small = (1 to 50).map(i => (i.toLong, s"dim$i")).toDF("k2", "dim")
    val plain = big.join(small, big("k") === small("k2"))
      .select("k", "payload", "dim").collect().map(_.toString).sorted
    val salted = SkewJoin.saltedJoin(big, small, "k", "k2", saltBuckets = 8)
      .select("k", "payload", "dim").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
    val shares = SkewJoin.topKeyShares(big, "k", 1).collect().head
    assert(shares.getLong(1) == 10000L)
  }
}
