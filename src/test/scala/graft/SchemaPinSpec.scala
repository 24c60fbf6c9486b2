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

  // ---- value-DOMAIN pins (VERDICT r7 #3): the verdict-gated queries
  // (ann_* recall floors, audio/multimodal ascii_ok oracles) depend on
  // distribution properties of the generated data, not just types. A
  // regeneration that shifts the distribution should fail ONE readable
  // spec here instead of spuriously flipping recall_ok/ascii_ok gate
  // verdicts (the r6-class upstream-drift failure mode).

  test("documents: text is ASCII (the audio-oracle sample-formula contract)") {
    // syntheticWavTable's (codepoint−77)·256 sample formula and its
    // DuckDB oracle replay agree iff every character is ASCII
    // (Multimodal.scala's documented contract: UTF-16 code-unit
    // iteration + toShort wrap vs codepoint iteration, identical below
    // 128). Also guards every $DuckToks tokenizer parity assumption.
    val docs = Tables.load(spark, sfDir, "documents")
    assert(docs.filter(org.apache.spark.sql.functions.col("text").isNull)
      .limit(1).count() == 0L, "documents.text has nulls")
    val nonAscii = docs
      .filter(org.apache.spark.sql.functions.col("text").rlike("[^\\u0000-\\u007F]"))
      .limit(1).count()
    assert(nonAscii == 0L,
      "documents.text contains non-ASCII characters — the audio gates' " +
        "writer/oracle sample formulas diverge above codepoint 127; " +
        "re-derive the Multimodal ASCII contract before trusting their hashes")
  }

  test("embeddings: the distribution invariants the ANN recall floors were calibrated on") {
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, sfDir, "embeddings")
    // dim pinned exactly: every bucketing/PQ-subspace constant (64 = 8
    // subspaces × 8 dims) assumes it
    val dims = emb.select(size(col("embedding")).as("d"))
      .agg(min("d"), max("d")).collect().head
    assert(dims.getInt(0) == 64 && dims.getInt(1) == 64,
      s"embedding dim drifted from 64: [${dims.getInt(0)}, ${dims.getInt(1)}]")
    // unit-norm band: cosine = dot for these vectors; a generator that
    // stops L2-normalizing shifts every cos threshold in the ann gates
    val nrm = emb.select(sqrt(graft.llm.Similarity.dot(col("embedding"),
        col("embedding"))).as("n"))
      .agg(min("n"), max("n")).collect().head
    assert(nrm.getDouble(0) > 0.999 && nrm.getDouble(1) < 1.001,
      s"embeddings are no longer unit-norm: [${nrm.getDouble(0)}, ${nrm.getDouble(1)}]")
    // label cardinality (kmeans_assign / stratified gates assume 10)
    val nLab = emb.agg(countDistinct("label")).collect().head.getLong(0)
    assert(nLab == 10L, s"label cardinality drifted from 10: $nLab")
    // clusteredness proxy: the data is uniform-on-the-sphere (mean
    // pairwise cos ≈ 0, |mean| ≪ 1/√dim) — the regime the IVF/LSH/PQ
    // recall floors (0.2) were measured in (0.26–0.30). A generator
    // switch to clustered embeddings moves recall and must surface
    // HERE, not as a flipped recall_ok verdict.
    val sample = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"), col("embedding"))
    val meanCos = sample.as("a").join(sample.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(graft.llm.Similarity.dot(col("a.embedding"),
        col("b.embedding")).as("cos"))
      .agg(avg("cos")).collect().head.getDouble(0)
    assert(math.abs(meanCos) < 0.02,
      f"mean pairwise cosine $meanCos%.4f — embeddings are no longer " +
        "uniform-on-sphere; re-measure the ann_* recall floors")
  }

  test("every declared table loads and is non-empty at sf0.001") {
    Tables.names.foreach { n =>
      assert(Tables.load(spark, sfDir, n).limit(1).count() == 1L, s"table $n is empty")
    }
  }
}
