package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Gate queries replayed against hand-built fixture sfDirs.
  *
  * Two purposes (VERDICT r6 items 4 and 6):
  *  - prove the data-dependent oracle guards hold when the generated
  *    data's soft invariants break (a props row without '$.k', a
  *    non-ASCII document) — the r6 testdata regeneration showed these
  *    invariants DO shift under the builder's feet;
  *  - pin funnel_conversion / cohort_retention to hand-computed
  *    3-user expectations, independent of the DuckDB oracle.
  *
  * Each test writes a tiny parquet table into a temp dir and calls the
  * REAL gate function on it — the exact code path the driver runs.
  */
class FixtureGateSpec extends SparkSpec {

  // schema + writer live in EventsFixture — ONE copy of the ts-domain
  // contract across the fixture-writing suites
  private def writeEvents(rows: Seq[Row]): String =
    EventsFixture.write(spark, rows)

  private def q(name: String) = SparkEntry.queries(name)

  test("json_struct: missing-key props rows stay aligned with the oracle's CASE guard") {
    // row 2 has NO '$.k' — the case the oracle guards with
    // CASE WHEN json_extract(..) IS NULL THEN '{}' (Spark's to_json
    // drops null struct fields). If either side regressed, the gate
    // would hash-mismatch on data like this.
    val dir = writeEvents(Seq(
      Row(1L, 1000L, 1L, "view", 0.0, """{"k": 5}"""),
      Row(2L, 2000L, 1L, "view", 0.0, """{"x": 9}"""),
      Row(3L, 3000L, 2L, "view", 0.0, """{"k": -3, "z": 1}""")))
    val got = q("json_struct")(spark, dir).collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, Some(5), """{"k":5}"""),
      (2L, None, "{}"),
      (3L, Some(-3), """{"k":-3}""")))
  }

  test("funnel_conversion: hand-computed 3-user funnel") {
    // user 1 completes the funnel in order; user 2's pre-view click
    // must NOT count (strictly-after semantics) but the later one
    // does; user 3's purchase precedes any view so only stage 1.
    def ev(id: Long, us: Long, u: Long, t: String) = Row(id, us * 1000L, u, t, 0.0, "{}")
    val dir = writeEvents(Seq(
      ev(1, 1, 1, "view"), ev(2, 2, 1, "click"), ev(3, 3, 1, "purchase"),
      ev(4, 1, 2, "click"), ev(5, 2, 2, "view"), ev(6, 3, 2, "click"),
      ev(7, 1, 3, "purchase"), ev(8, 2, 3, "view")))
    val got = q("funnel_conversion")(spark, dir).collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4)))
    assert(got.toSeq == Seq(
      (1L, Some(1L), Some(2L), Some(3L), 3),
      (2L, Some(2L), Some(3L), None, 2),
      (3L, Some(2L), None, None, 1)))
  }

  test("cohort_retention: hand-computed 3-user weekly cohorts") {
    val WeekUs = 604800000000L
    def ev(id: Long, week: Long, u: Long) = Row(id, week * WeekUs * 1000L, u, "view", 0.0, "{}")
    // user 1 active weeks 0,1,2; user 2 weeks 0,2; user 3 weeks 1,2
    val dir = writeEvents(Seq(
      ev(1, 0, 1), ev(2, 1, 1), ev(3, 2, 1),
      ev(4, 0, 2), ev(5, 2, 2),
      ev(6, 1, 3), ev(7, 2, 3)))
    val got = q("cohort_retention")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 2L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft-fixture").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, t) =>
          Row(id, t, "en", "fixture", t.length.toLong) }, 1), schema)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("multimodal_frames: non-ASCII corpus trips the ascii_ok verdict, byte offsets stay exact") {
    // 'é' is 2 UTF-8 bytes: char-offset replay (the oracle's substr)
    // would diverge — the engine must (a) still frame over BYTES and
    // (b) flip ascii_ok to 0 so the oracle's pinned `1 AS ascii_ok`
    // fails the gate LOUDLY instead of silently hash-diverging.
    val ascii = "a" * 600 // frames at byte 0 and (every 4th) none until 256*4 > len
    val dir = writeDocs(Seq((1L, ascii), (2L, "é" + ("b" * 599))))
    val rows = q("multimodal_frames")(spark, dir).collect()
    assert(rows.forall(_.getAs[Int]("ascii_ok") == 0)) // corpus-wide min
    val d2 = rows.filter(_.getLong(0) == 2L)
    // 601 payload bytes → frames 0..2, every 4th → frame 0 only
    assert(d2.map(r => (r.getAs[Long]("frame_idx"), r.getAs[Long]("frame_off"),
      r.getAs[Long]("frame_len"))).toSeq == Seq((0L, 0L, 256L)))
    // header sniff is over bytes: C3 A9 = 'é'
    assert(d2.head.getAs[String]("frame_hex").startsWith("C3A9"))
  }

  test("multimodal_resize: non-ASCII corpus — byte-domain sizes, ascii_ok=0") {
    val dir = writeDocs(Seq((1L, "é" * 10))) // 20 payload bytes
    val rows = q("multimodal_resize")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("orig_len") == 20L)
    assert(r.getAs[Long]("resized_len") == 5L) // every 4th byte of 20
    assert(r.getAs[Int]("ascii_ok") == 0)
  }

  test("multimodal ascii corpus keeps ascii_ok=1 (gate-green baseline)") {
    val dir = writeDocs(Seq((1L, "plain ascii only " * 40)))
    assert(q("multimodal_frames")(spark, dir).collect()
      .forall(_.getAs[Int]("ascii_ok") == 1))
    assert(q("multimodal_resize")(spark, dir).collect()
      .forall(_.getAs[Int]("ascii_ok") == 1))
  }

  test("interval_overlap_join: hand fixture — islands, point sessions, exclusive hour boundary") {
    // Hourly traffic: A@h0=10, A@h1=10, B@h1=1, B@h2=2 → total 23 over
    // 4 active (type, hour) cells; busy = cnt·4 > 23 → only A@h0 and
    // A@h1, which MERGE into one island [h0, h1] = [0, 7199999999] µs.
    // Sessions: 20 single-event sessions inside the island (overlap 0 —
    // closed-point semantics), one session crossing the island's end
    // boundary (overlap clipped at b_end = 2h−1µs), and one session
    // starting EXACTLY at 2h (hour 2 — must NOT pair: the boundary is
    // exclusive because busy intervals close at end−1).
    def sec(s: Long): Long = s * 1000000000L
    var id = 0L
    def ev(user: Long, tSec: Long, tpe: String): Row = {
      id += 1
      Row(id, sec(tSec), user, tpe, 1.0, "{}")
    }
    val rows =
      (1 to 10).map(i => ev(i.toLong, i.toLong, "A")) ++ // h0 singletons
      (11 to 20).map(i => ev(i.toLong, 3600L + i, "A")) ++ // h1 singletons
      Seq(ev(300L, 6900L, "B"), ev(300L, 8100L, "B"), // one session h1→h2
        ev(200L, 7200L, "B")) // point session at exactly 2h
    val dir = writeEvents(rows)
    val got = q("interval_overlap_join")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val bEnd = 7200000000L - 1
    val expected =
      ((1 to 10).map { i =>
        (i.toLong, i * 1000000L, i * 1000000L, "A", 0L, bEnd, 0L) } ++
       (11 to 20).map { i =>
        (i.toLong, (3600L + i) * 1000000L, (3600L + i) * 1000000L,
          "A", 0L, bEnd, 0L) } :+
       (300L, 6900000000L, 8100000000L, "A", 0L, bEnd, bEnd - 6900000000L)
      ).toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("session_paths: bot session (>20 events, all gaps <30 min) truncates at 20 with '...'") {
    // VERDICT r8 item 2: sessions are NOT bounded by the 30-min gap, so
    // the path must cap at the first 20 events + '...' marker. User 7
    // fires 25 events 60 s apart (one session, alive throughout); user
    // 8 has two views >30 min apart (two 1-event sessions) to pin that
    // short sessions are untouched and counting still works.
    def sec(s: Long): Long = s * 1000000000L
    var id = 0L
    def ev(user: Long, tSec: Long, tpe: String): Row = {
      id += 1; Row(id, sec(tSec), user, tpe, 1.0, "{}")
    }
    val botTypes = (1 to 25).map(i => if (i == 3) "click" else "view")
    val rows = botTypes.zipWithIndex.map { case (tp, i) =>
      ev(7L, 60L * (i + 1), tp) } ++
      Seq(ev(8L, 100L, "view"), ev(8L, 100L + 3600L, "view"))
    val dir = writeEvents(rows)
    val got = q("session_paths")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val botPath = botTypes.take(20).mkString(">") + ">..."
    assert(got == Seq(("view", 2L), (botPath, 1L)))
    assert(botPath.count(_ == '>') == 20) // 20 events + 1 marker
  }

  test("attribution_linear: band boundaries exact across the bucketed join") {
    // The r9 de-skew pairs on (user_id, 30-min bucket) with the
    // purchase exploded over its 2 covering buckets; this fixture pins
    // that the OUTPUT band semantics are unchanged: closed at both
    // ends [p-30min, p], views after the purchase or >30 min before
    // are out, and the cross-bucket view (exactly at p-30min, previous
    // bucket) still pairs. Purchase at 3600 s; views at 1799 (out),
    // 1800 (boundary in, bucket 1), 2000 (in, bucket 1), 3600 (in,
    // same instant, bucket 2 = last touch), 3601 (out).
    def sec(s: Long): Long = s * 1000000000L
    var id = 0L
    def ev(user: Long, tSec: Long, tpe: String): Row = {
      id += 1; Row(id, sec(tSec), user, tpe, 1.0, "{}")
    }
    val v1799 = ev(1L, 1799L, "view"); val v1800 = ev(1L, 1800L, "view")
    val v2000 = ev(1L, 2000L, "view"); val v3600 = ev(1L, 3600L, "view")
    val v3601 = ev(1L, 3601L, "view"); val p = ev(1L, 3600L, "purchase")
    // user 2: a view with no purchase, and a purchase with no views in
    // band — both must emit nothing (inner join).
    val lonelyV = ev(2L, 100L, "view"); val lonelyP = ev(2L, 10000L, "purchase")
    val dir = writeEvents(Seq(v1799, v1800, v2000, v3600, v3601, p,
      lonelyV, lonelyP))
    val got = q("attribution_linear")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5))).toSeq
    val pid = p.getLong(0)
    val expected = Seq(v1800, v2000, v3600).map(_.getLong(0)).sorted.map {
      vid => (1L, pid, vid, 3L, 1.0 / 3, if (vid == v3600.getLong(0)) 1 else 0)
    }
    assert(got == expected, s"got=${got.toList} expected=$expected")
  }
}
