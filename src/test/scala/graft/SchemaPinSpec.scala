package graft

import org.apache.spark.sql.types._

/** Testdata contract pin (VERDICT r6 item 8): the driver regenerates
  * /root/testdata between rounds and its physical types have shifted
  * before (r6: events.ts TIMESTAMP(NANOS) → TIMESTAMP(µs), which broke
  * 15 queries and 7 suites at analysis time). This spec asserts the
  * ENGINE-FACING types after `Tables.load` normalization — one focused
  * failure with a readable message instead of a suite-wide cascade the
  * next time the generator's output drifts.
  */
class SchemaPinSpec extends SparkSpec {

  private def typeOf(table: String, column: String): DataType =
    Tables.load(spark, sfDir, table).schema(column).dataType

  test("events: ts normalizes to epoch-nanos LongType whatever the parquet stores") {
    assert(typeOf("events", "ts") == LongType,
      "events.ts must reach queries as epoch-nanos long — if this fails, the " +
        "testdata generator changed ts's physical type to something Tables.load " +
        "does not normalize yet; fix it THERE (one site), not in the 20+ call sites")
    assert(typeOf("events", "event_id") == LongType)
    assert(typeOf("events", "user_id") == LongType)
    assert(typeOf("events", "event_type") == StringType)
    assert(typeOf("events", "value") == DoubleType)
    assert(typeOf("events", "props") == StringType)
  }

  test("events: normalized ts values are in the nanos domain (not µs/ms/s)") {
    // 2020-01-01 .. 2040-01-01 in epoch nanos — a µs- or ms-domain
    // value would be orders of magnitude below this band, so a wrong
    // normalization fails here even though the TYPE is right.
    val bounds = Tables.load(spark, sfDir, "events")
      .selectExpr("min(ts) AS lo", "max(ts) AS hi").collect().head
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    assert(lo > 1577836800000000000L && hi < 2208988800000000000L,
      s"events.ts range [$lo, $hi] is not epoch-NANOS — normalization drifted")
  }

  test("documents: text/lang/source strings, doc_id long") {
    assert(typeOf("documents", "doc_id") == LongType)
    assert(typeOf("documents", "text") == StringType)
    assert(typeOf("documents", "lang") == StringType)
    assert(typeOf("documents", "source") == StringType)
  }

  test("embeddings: embedding is array<float>, vec_id long, label int") {
    assert(typeOf("embeddings", "vec_id") == LongType)
    assert(typeOf("embeddings", "embedding") == ArrayType(FloatType, containsNull = true)
      || typeOf("embeddings", "embedding") == ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding must be array<float>, got ${typeOf("embeddings", "embedding")}")
    assert(typeOf("embeddings", "label") == IntegerType)
  }

  test("TPC-H tables: join-key and measure types the queries rely on") {
    assert(typeOf("lineitem", "l_orderkey") == LongType)
    assert(typeOf("lineitem", "l_partkey") == LongType)
    assert(typeOf("lineitem", "l_suppkey") == LongType)
    assert(typeOf("lineitem", "l_quantity") == DoubleType)
    assert(typeOf("lineitem", "l_extendedprice") == DoubleType)
    assert(typeOf("lineitem", "l_returnflag") == StringType)
    assert(typeOf("lineitem", "l_shipdate") == TimestampType
      || typeOf("lineitem", "l_shipdate") == TimestampNTZType)
    assert(typeOf("orders", "o_orderkey") == LongType)
    assert(typeOf("orders", "o_custkey") == LongType)
    assert(typeOf("orders", "o_orderdate") == TimestampType
      || typeOf("orders", "o_orderdate") == TimestampNTZType)
    assert(typeOf("orders", "o_totalprice") == DoubleType)
    assert(typeOf("customer", "c_custkey") == LongType)
    assert(typeOf("customer", "c_nationkey") == IntegerType)
    assert(typeOf("supplier", "s_suppkey") == LongType)
    assert(typeOf("supplier", "s_nationkey") == IntegerType)
    assert(typeOf("part", "p_partkey") == LongType)
    assert(typeOf("nation", "n_nationkey") == IntegerType)
    assert(typeOf("nation", "n_regionkey") == IntegerType)
    assert(typeOf("region", "r_regionkey") == IntegerType)
  }

  test("every declared table loads and is non-empty at sf0.001") {
    Tables.names.foreach { n =>
      assert(Tables.load(spark, sfDir, n).limit(1).count() == 1L, s"table $n is empty")
    }
  }
}
