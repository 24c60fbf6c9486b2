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
