package graft.schema

import org.apache.spark.sql.types._

/** Declared-vs-actual schema compatibility with the reference's
  * semantics (ScalaSparkCompute.java:115-121 `isCompatible`): field
  * order does not matter, nullability may widen (non-null actual is
  * compatible with nullable declared), and failures are collected as
  * messages rather than thrown one at a time (CDAP FailureCollector
  * style).
  */
object SchemaCompat {

  /** Empty result = compatible. */
  def check(declared: StructType, actual: StructType, path: String = ""): Seq[String] = {
    val errs = Seq.newBuilder[String]
    val actualByName = actual.fields.map(f => f.name -> f).toMap
    declared.fields.foreach { d =>
      actualByName.get(d.name) match {
        case None =>
          errs += s"missing field '$path${d.name}' (declared ${d.dataType.simpleString})"
        case Some(a) =>
          if (a.nullable && !d.nullable)
            errs += s"field '$path${d.name}' is nullable but declared non-nullable"
          errs ++= checkType(d.dataType, a.dataType, s"$path${d.name}")
      }
    }
    val declaredNames = declared.fieldNames.toSet
    actual.fields.filterNot(f => declaredNames(f.name)).foreach { extra =>
      errs += s"unexpected field '$path${extra.name}' (${extra.dataType.simpleString})"
    }
    errs.result()
  }

  private def checkType(d: DataType, a: DataType, path: String): Seq[String] =
    (d, a) match {
      case (ds: StructType, as: StructType) => check(ds, as, s"$path.")
      case (ArrayType(de, dn), ArrayType(ae, an)) =>
        val nullErr = if (an && !dn)
          Seq(s"array '$path' allows null elements but declared not to") else Nil
        nullErr ++ checkType(de, ae, s"$path[]")
      case (MapType(dk, dv, dn), MapType(ak, av, an)) =>
        val nullErr = if (an && !dn)
          Seq(s"map '$path' allows null values but declared not to") else Nil
        nullErr ++ checkType(dk, ak, s"$path<key>") ++ checkType(dv, av, s"$path<val>")
      case _ if d == a => Nil
      case _ => Seq(s"field '$path' type mismatch: declared ${d.simpleString}, actual ${a.simpleString}")
    }

  def isCompatible(declared: StructType, actual: StructType): Boolean =
    check(declared, actual).isEmpty
}
