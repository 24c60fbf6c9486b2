package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range (interval) join — the scale path for `l.v BETWEEN
  * r.lo AND r.hi` joins. Catalyst executes a bare inequality join as
  * BroadcastNestedLoopJoin (O(n·m) comparisons; dead once neither side
  * broadcasts). Banding turns it into a hash join: each left row maps
  * to band floor(v/width); each right interval explodes to every band
  * it overlaps; the band equi-join + exact predicate re-check then
  * shuffles both sides once on the band key.
  *
  * Cost: right fan-out ≈ interval/width bands per row, left exactly 1
  * — pick `width` near the median interval length so fan-out ≈ 2.
  * Each (l, r) pair can meet in at most one band (the left row's), so
  * the result needs no dedup. Band skew (many rows in one value band)
  * is ordinary hash-join skew — AQE's skew-join split applies, unlike
  * the nested-loop form which cannot be split at all.
  */
object RangeJoin {

  /** `left.vCol BETWEEN right.loCol AND right.hiCol`, banded. Caller
    * supplies disjoint column names (as with any self-join).
    */
  def bandJoin(left: DataFrame, vCol: String, right: DataFrame,
      loCol: String, hiCol: String, width: Double): DataFrame = {
    val l = left.withColumn("_band", floor(col(vCol) / width).cast("long"))
    val r = right.withColumn("_band",
      explode(sequence(floor(col(loCol) / width).cast("long"),
        floor(col(hiCol) / width).cast("long"))))
    l.join(r, Seq("_band"))
      .filter(col(vCol) >= col(loCol) && col(vCol) <= col(hiCol))
      .drop("_band")
  }
}
