package graft

import org.apache.spark.sql.types._
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.schema.{SchemaCompat, SchemaJson}

/** Property tests (SURVEY.md §5): schema JSON round-trip and compat
  * reflexivity over randomly generated StructTypes. Samples scalacheck
  * generators with fixed seeds (scalatest-plus bridge isn't in the
  * offline cache).
  */
class SchemaPropertySpec extends AnyFunSuite {

  private def forAll[T](gen: Gen[T], n: Int = 80)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default.withSize(8), Seed(i.toLong))
        .foreach(body)
    }

  private val leafGen: Gen[DataType] = Gen.oneOf(
    BooleanType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BinaryType, DateType, TimestampType, DecimalType(10, 2))

  private def dataTypeGen(depth: Int): Gen[DataType] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      6 -> leafGen,
      1 -> Gen.lzy(dataTypeGen(depth - 1).map(ArrayType(_, containsNull = true))),
      1 -> Gen.lzy(dataTypeGen(depth - 1).map(MapType(StringType, _, valueContainsNull = true))),
      1 -> Gen.lzy(structGen(depth - 1)))

  private def structGen(depth: Int): Gen[StructType] = for {
    n <- Gen.choose(1, 5)
    names <- Gen.listOfN(n, Gen.identifier.map(_.take(8))).map(_.distinct)
    fields <- Gen.sequence[List[StructField], StructField](names.map { nm =>
      for {
        dt <- dataTypeGen(depth)
        nullable <- Arbitrary.arbitrary[Boolean]
      } yield StructField(nm, dt, nullable)
    })
  } yield StructType(fields)

  test("Spark-native schema JSON round-trips through SchemaJson.parse") {
    forAll(structGen(2)) { st =>
      assert(SchemaJson.parse(st.json) == st)
    }
  }

  test("compat is reflexive and detects any single dropped field") {
    forAll(structGen(1)) { st =>
      assert(SchemaCompat.check(st, st).isEmpty)
      if (st.fields.length > 1) {
        val dropped = StructType(st.fields.tail)
        val errs = SchemaCompat.check(st, dropped)
        assert(errs.exists(_.contains(s"missing field '${st.fields.head.name}'")))
      }
    }
  }
}
