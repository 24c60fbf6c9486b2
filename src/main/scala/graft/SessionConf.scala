package graft

import org.apache.spark.sql.SparkSession

/** Env-var channel for runtime session conf in the harness mains:
  * `SPARK_GRAFT_SESSION_CONF="k=v;k2=v2"` — build.sbt forwards env
  * (not -D) to forked JVMs, so A/B'ing a conf-gated path (e.g.
  * `graft.triangle.sortMerge=true`) through Verify/Bench/ScaleCurves
  * needs no per-main plumbing.
  */
object SessionConf {
  def applyEnv(spark: SparkSession): Unit =
    sys.env.get("SPARK_GRAFT_SESSION_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .foreach { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"bad SPARK_GRAFT_SESSION_CONF entry: '$kv'")
        val (k, v) = (kv.take(i).trim, kv.drop(i + 1).trim)
        spark.conf.set(k, v)
        println(s"[sessionconf] $k=$v")
      }
}
