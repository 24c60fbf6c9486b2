package graft

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** Every native expression must ACTUALLY compile under janino — not
  * silently fall back to interpreted projection. UnsafeProjection
  * .create catches codegen failures and degrades quietly, which is how
  * BpeApply ran interpreted from r9 to r13 (its `addReferenceObj` cast
  * used a parameterized Java type, `scala.Tuple2<String, String>[]`,
  * and janino has no generics — PLANS.md "bpe_encode — codegen
  * actually on"). This spec compiles each expression through
  * GenerateUnsafeProjection.generate, which THROWS on a compile error,
  * and cross-checks the compiled value against the interpreted eval —
  * so a future janino-incompatible cast fails the suite loudly instead
  * of shipping a 10× silent slowdown.
  *
  * MisraGries (TypedImperativeAggregate) is out of scope: aggregates
  * don't row-project; its buffer path is covered by the heavy_hitters
  * / freq_cms gates.
  */
class CodegenSpec extends AnyFunSuite {

  private def darr(xs: Double*) =
    Literal.create(xs.toArray, ArrayType(DoubleType, containsNull = false))
  private def farr(xs: Float*) =
    Literal.create(xs.toArray, ArrayType(FloatType, containsNull = false))

  private val cases: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "BpeApply" -> BpeApply(Literal("hello hello world"),
      Seq(("h", "e"), ("he", "l"), ("l", "o"))),
    "PolyHash" -> PolyHash(Literal("hello world graft")),
    "ProfileHits" -> ProfileHits(Literal("the quick the lazy the"),
      Seq("the", "quick")),
    "RepetitionStats" -> RepetitionStats(Literal("a b a b a b c"), 2),
    "SortedBucket" -> SortedBucket(Literal(3.7), Array(1.0, 2.0, 5.0)),
    "SpanCorrupt" -> SpanCorrupt(Literal(42L),
      Literal("alpha beta gamma delta epsilon zeta"), 3, 2),
    "TokenStats" -> TokenStats(Literal("a bb ccc dddd")),
    "VectorDot(double)" -> VectorDot(darr(1.0, 2.0, 3.0), darr(4.0, 5.0, 6.0)),
    "VectorDot(float)" -> VectorDot(farr(1f, 2f), farr(3f, 4f)),
    "WinnowKeys" -> WinnowKeys(Literal("a b c d e f g h"), 2, 3),
    "WordChunks" -> WordChunks(Literal("a b c d e"), 2),
    "WordShingles" -> WordShingles(Literal("a b c d"), 2),
    "WordSpans" -> WordSpans(Literal("a b c d"), 2),
    "OuterMoments" -> OuterMoments(darr(1.0, 2.0)),
    "OuterMoments(float)" -> OuterMoments(farr(1f, 2f)),
    "CrossMoments" -> CrossMoments(darr(1.0, 2.0), darr(3.0, 4.0)),
    "SortedIntersectCount" -> SortedIntersectCount(
      larr(1L, 3L, 3L, 5L, 9L), larr(2L, 3L, 5L, 5L, 10L)))

  private def larr(xs: Long*) =
    Literal.create(xs.toArray,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false))

  for ((name, expr) <- cases)
    test(s"$name compiles under codegen and matches interpreted eval") {
      assert(expr.checkInputDataTypes().isSuccess, s"$name: bad test inputs")
      // throws CompileException (no silent fallback) if janino rejects
      val proj = GenerateUnsafeProjection.generate(Seq(expr))
      val toScala = CatalystTypeConverters.createToScalaConverter(expr.dataType)
      val compiled = toScala(proj(InternalRow.empty).get(0, expr.dataType))
      val interpreted = toScala(expr.eval(InternalRow.empty))
      assert(compiled == interpreted,
        s"$name: codegen value $compiled != interpreted $interpreted")
      assert(interpreted != null, s"$name: eval produced null on non-null input")
    }
}
