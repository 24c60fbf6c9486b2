package graft

import org.scalatest.funsuite.AnyFunSuite

/** Shape/determinism pins for ScaleGen's Zipfian vocabulary regimes
  * (r16, VERDICT r15 #2): the SCALE_CONTAIN_ZIPF/HEAPS artifacts'
  * meaning rests on the generator actually producing what the regime
  * comments claim — power-law head mass, same length distribution as
  * the dense docs, planted dups intact, and bit determinism (the same
  * id must yield the same bytes on any executor, any run). All pure
  * functions — no SparkSession.
  */
class ScaleGenSpec extends AnyFunSuite {

  test("zipfDoc is deterministic and length-matches the dense draw") {
    (0L until 500L).foreach { id =>
      val a = ScaleGen.zipfDoc(id, ScaleGen.ZipfV)
      val b = ScaleGen.zipfDoc(id, ScaleGen.ZipfV)
      assert(a == b, s"non-deterministic doc $id")
      val dense = ScaleGen.doc(id)
      assert(a.text.split(' ').length == dense.text.split(' ').length,
        s"doc $id: zipf length draw must reuse the dense length hash")
      assert(a.lang == dense.lang && a.source == dense.source)
    }
  }

  test("token frequencies follow the power law: head rank dominates") {
    val tokens = (0L until 2000L)
      .flatMap(id => ScaleGen.zipfDoc(id, ScaleGen.ZipfV).text.split(' '))
    val byTok = tokens.groupBy(identity).view.mapValues(_.size)
    val total = tokens.size.toDouble
    val z0 = byTok.getOrElse("z0", 0) / total
    val z1 = byTok.getOrElse("z1", 0) / total
    // H(10000, 1.07) ≈ 7.1 ⇒ p(z0) ≈ 0.14; allow sampling slack
    assert(z0 > 0.10 && z0 < 0.18, s"head token share $z0 not Zipf-shaped")
    // s = 1.07 ⇒ p(z1)/p(z0) = 2^-1.07 ≈ 0.48
    assert(z1 / z0 > 0.35 && z1 / z0 < 0.60,
      s"rank-2/rank-1 ratio ${z1 / z0} off the s=1.07 decay")
    // the tail exists: a corpus this size must touch thousands of types
    assert(byTok.size > 3000, s"only ${byTok.size} distinct tokens")
  }

  test("dup planting carries over: exact dups byte-equal, near dups differ by one token") {
    val exactPairs = (0L until 5000L).filter(id => id >= 625 && id % 625 == 624)
      .map(id => (ScaleGen.zipfDoc(id, ScaleGen.ZipfV).text,
        ScaleGen.zipfDoc(id - 311, ScaleGen.ZipfV).text))
    assert(exactPairs.nonEmpty && exactPairs.forall { case (a, b) => a == b })
    val nearIds = (0L until 5000L)
      .filter(id => id >= 200 && id % 200 == 199 && id % 625 != 624)
    assert(nearIds.nonEmpty)
    nearIds.foreach { id =>
      val d = ScaleGen.zipfDoc(id, ScaleGen.ZipfV).text.split(' ')
      val donor = ScaleGen.zipfDoc(id - 97, ScaleGen.ZipfV).text.split(' ')
      assert(d.length == donor.length)
      val diffs = d.zip(donor).count { case (x, y) => x != y }
      // the same-token guard (ADVICE r10): NEVER an accidental exact dup
      assert(diffs == 1, s"near-dup $id differs in $diffs tokens, want 1")
    }
  }

  test("heaps regime: vocabulary grows sublinearly and stays within V") {
    assert(ScaleGen.heapsVocab(1) == ScaleGen.ZipfV)
    val v3 = ScaleGen.heapsVocab(3)
    val v10 = ScaleGen.heapsVocab(10)
    assert(v3 > ScaleGen.ZipfV && v10 > v3, "Heaps vocab must grow with m")
    // β = 0.55 ⇒ V(10)/V(1) = 10^0.55 ≈ 3.55 — sublinear in corpus size
    assert(v10 < 10 * ScaleGen.ZipfV)
    val docs = (0L until 300L).map(id => ScaleGen.zipfDoc(id, v10))
    val maxRank = docs.flatMap(_.text.split(' '))
      .map(t => t.drop(1).toInt).max
    assert(maxRank < v10, "drawn ranks must respect the slice vocabulary")
  }
}
