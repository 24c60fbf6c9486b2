package graft.schema

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Schema parsing for pipeline specs: accepts either Spark's native
  * `StructType.fromJson` format or the reference's Avro-style JSON
  * (record / union-with-null / logical types), mapped onto Spark types
  * per SURVEY.md §1.4. Spark's `StructType` IS the engine's schema
  * system — this is only a reader.
  *
  * Reference semantics: `Schema.parseJson` on the `schema` config
  * (ScalaSparkCompute.java:67); nullable = union [T, "null"]
  * (ScalaSparkTest.java:306-315).
  */
object SchemaJson {

  def parse(json: String): StructType = {
    val ast = JsonMethods.parse(json)
    // Try Spark-native first (objects with "type":"struct").
    ast \ "type" match {
      case JString("struct") =>
        DataType.fromJson(json).asInstanceOf[StructType]
      case JString("record") =>
        avroRecord(ast)
      case _ =>
        throw new IllegalArgumentException(
          s"schema JSON must be a Spark struct or Avro record, got: $json")
    }
  }

  private def avroRecord(ast: JValue): StructType = {
    val fields = (ast \ "fields") match {
      case JArray(fs) => fs.map(avroField)
      case other => throw new IllegalArgumentException(
        s"Avro record needs a fields array, got $other")
    }
    StructType(fields)
  }

  private def avroField(f: JValue): StructField = {
    val name = (f \ "name") match {
      case JString(n) => n
      case other => throw new IllegalArgumentException(s"field without name: $other")
    }
    val (dt, nullable) = avroType(f \ "type")
    StructField(name, dt, nullable)
  }

  /** Avro type → (Spark type, nullable). */
  private def avroType(t: JValue): (DataType, Boolean) = t match {
    case JString(prim) => (primitive(prim), false)
    case JArray(branches) => // union: [T, "null"] in either order
      val nonNull = branches.filterNot(_ == JString("null"))
      nonNull match {
        case single :: Nil =>
          val (dt, _) = avroType(single)
          (dt, true)
        case _ => throw new IllegalArgumentException(
          s"only unions of one type with null are supported, got $t")
      }
    case obj: JObject =>
      (obj \ "logicalType") match {
        case JString(lt) => (logical(lt, obj), false)
        case _ =>
          (obj \ "type") match {
            case JString("record") => (avroRecord(obj), false)
            case JString("array") =>
              val (elem, en) = avroType(obj \ "items")
              (ArrayType(elem, containsNull = en), false)
            case JString("map") =>
              val (v, vn) = avroType(obj \ "values")
              (MapType(StringType, v, valueContainsNull = vn), false)
            case JString("enum") => (StringType, false)
            case JString(prim) => (primitive(prim), false)
            case other => throw new IllegalArgumentException(s"bad avro type: $other")
          }
      }
    case other => throw new IllegalArgumentException(s"bad avro type: $other")
  }

  private def primitive(name: String): DataType = name match {
    case "null"    => NullType
    case "boolean" => BooleanType
    case "int"     => IntegerType
    case "long"    => LongType
    case "float"   => FloatType
    case "double"  => DoubleType
    case "bytes"   => BinaryType
    case "string"  => StringType
    case other => throw new IllegalArgumentException(s"unknown avro primitive: $other")
  }

  private def logical(lt: String, obj: JValue): DataType = lt match {
    case "decimal" =>
      val p = (obj \ "precision") match { case JInt(i) => i.toInt; case _ => 38 }
      val s = (obj \ "scale") match { case JInt(i) => i.toInt; case _ => 18 }
      DecimalType(p, s)
    case "date" => DateType
    case "time-micros" | "time-millis" => LongType // documented mapping §1.4
    case "timestamp-micros" | "timestamp-millis" => TimestampType
    case "local-timestamp-micros" | "local-timestamp-millis" => TimestampNTZType
    case other => throw new IllegalArgumentException(s"unknown logical type: $other")
  }
}
