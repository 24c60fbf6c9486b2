package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash: `acc = (acc * 31 + byte) mod 1_000_000_007`
  * over the UTF-8 bytes of a string (or raw bytes of a binary).
  *
  * A native Catalyst `Expression` with whole-stage codegen (no UDF
  * serialization, stays inside the generated loop) — the hot-path
  * primitive under document fingerprinting, MinHash shingle hashing
  * and SimHash token hashing (SURVEY.md §2.11). The modulus keeps every
  * intermediate below 2^63 so the same formula is reproducible in any
  * engine with 64-bit ints (the DuckDB oracle replays it with
  * `list_reduce`).
  *
  * Engine-role analogue: the reference ships whole-stage user Scala for
  * custom scalar logic (ScalaSparkCodeExecutor.java:210-231); here the
  * equivalent hot-loop extension point is a first-class codegen'd
  * expression instead.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_hash"

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case s: UTF8String  => s.getBytes
      case b: Array[Byte] => b
    }
    PolyHash.hashBytes(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hasher = PolyHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val getBytes = child.dataType match {
        case StringType => s"byte[] $bytes = $c.getBytes();"
        case _          => s"byte[] $bytes = $c;"
      }
      s"""
         |$getBytes
         |${ev.value} = $hasher.hashBytes($bytes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val Mod: Long = 1000000007L

  def hashBytes(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    acc
  }

  /** Column API: poly_hash(col). */
  def apply(c: Column): Column =
    bridge.column(PolyHash(bridge.expression(c)))
}
