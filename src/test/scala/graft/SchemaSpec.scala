package graft

import org.apache.spark.sql.types._
import graft.schema.{SchemaCompat, SchemaJson}

class SchemaSpec extends SparkSpec {

  test("parses Spark-native struct JSON") {
    val st = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = true)))
    assert(SchemaJson.parse(st.json) == st)
  }

  test("parses Avro-style record JSON (reference schema language)") {
    // shape from ScalaSparkTest.java:306-315 — nullable = union w/ null
    val json =
      """{"type":"record","name":"out","fields":[
        |{"name":"word","type":["string","null"]},
        |{"name":"count","type":["null","long"]},
        |{"name":"flag","type":"boolean"},
        |{"name":"tags","type":{"type":"array","items":"string"}},
        |{"name":"props","type":{"type":"map","values":"string"}},
        |{"name":"price","type":{"type":"bytes","logicalType":"decimal","precision":10,"scale":2}},
        |{"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"}}
        |]}""".stripMargin
    val st = SchemaJson.parse(json)
    assert(st("word") == StructField("word", StringType, nullable = true))
    assert(st("count") == StructField("count", LongType, nullable = true))
    assert(st("flag") == StructField("flag", BooleanType, nullable = false))
    assert(st("tags").dataType == ArrayType(StringType, containsNull = false))
    assert(st("props").dataType == MapType(StringType, StringType, valueContainsNull = false))
    assert(st("price").dataType == DecimalType(10, 2))
    assert(st("ts").dataType == TimestampType)
  }

  test("compat: order-insensitive, nullability widening, collected failures") {
    val declared = StructType(Seq(
      StructField("a", LongType, nullable = true),
      StructField("b", StringType, nullable = false)))
    // reordered + a is non-null actual → compatible
    val ok = StructType(Seq(
      StructField("b", StringType, nullable = false),
      StructField("a", LongType, nullable = false)))
    assert(SchemaCompat.check(declared, ok).isEmpty)
    // b nullable-actual vs non-null declared + missing a + extra c: 3 errors
    val bad = StructType(Seq(
      StructField("b", StringType, nullable = true),
      StructField("c", DoubleType, nullable = true)))
    val errs = SchemaCompat.check(declared, bad)
    assert(errs.size == 3, errs.mkString("; "))
    assert(errs.exists(_.contains("missing field 'a'")))
    assert(errs.exists(_.contains("'b' is nullable")))
    assert(errs.exists(_.contains("unexpected field 'c'")))
  }

  test("compat: nested struct and type mismatch paths") {
    val declared = StructType(Seq(StructField("s", StructType(Seq(
      StructField("x", IntegerType, nullable = false))), nullable = false)))
    val actual = StructType(Seq(StructField("s", StructType(Seq(
      StructField("x", LongType, nullable = false))), nullable = false)))
    val errs = SchemaCompat.check(declared, actual)
    assert(errs.exists(e => e.contains("'s.x'") && e.contains("type mismatch")))
  }
}
