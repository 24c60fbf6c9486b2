package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count of DISTINCT common elements of two ASCENDING-sorted long
  * array columns — the candidate-verify kernel of the prefix-filtered
  * containment path. Semantically `size(array_intersect(a, b))` for
  * sorted inputs (array_intersect returns distinct matches; the merge
  * skips duplicate runs the same way), but as one codegen'd
  * two-pointer merge: no per-row hash set, no materialized
  * intersection array, no boxing. The verify stage runs this once per
  * candidate pair over ~|doc|-length arrays, so allocation per row is
  * the dominant cost it removes (measured in OPTIMIZATION_r16.md).
  *
  * Caller contract: both arrays sorted ascending, non-null elements
  * (xxhash64 output). Null ARRAY inputs yield null, like
  * size(array_intersect) under non-legacy sizeOfNull.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  // ADVICE r16: without this, binding to non-ArrayType(LongType)
  // children fails at runtime inside getLong/generated code
  // (ClassCastException or silent misreads) instead of a readable
  // analysis-time error.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        c += 1
        // skip duplicate runs so each common VALUE counts once,
        // matching array_intersect's distinct semantics
        val v = xv
        while (i < n && x.getLong(i) == v) i += 1
        while (j < m && y.getLong(j) == v) j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val c = ctx.freshName("c"); val v = ctx.freshName("v")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else {
         |    $c++;
         |    long $v = $xv;
         |    while ($i < $n && $a.getLong($i) == $v) { $i++; }
         |    while ($j < $m && $b.getLong($j) == $v) { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def apply(a: Column, b: Column): Column =
    bridge.column(SortedIntersectCount(bridge.expression(a), bridge.expression(b)))
}
