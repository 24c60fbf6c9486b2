package graft

import org.apache.spark.sql.functions._
import graft.functions.PolyHash
import graft.llm.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Tag for tests heavy enough to matter in the edit loop (sf0.1 scale);
  * still part of plain `sbt test` so CI catches regressions — exclude
  * locally with `testOnly * -- -l graft.SlowTest`.
  */
object SlowTest extends org.scalatest.Tag("graft.SlowTest")

class LlmSpec extends SparkSpec {

  test("poly_hash matches the reference formula and codegen path") {
    import spark.implicits._
    val df = Seq("ab", "hello world", "x").toDF("s")
    val got = df.select(PolyHash(col("s"))).as[Long].collect().toSeq
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    assert(got == Seq(ref("ab"), ref("hello world"), ref("x")))
    assert(got.head == 97L * 31 + 98) // 'a','b'
  }

  test("lineDedup strips cross-doc boilerplate lines, keeps order, fingerprints exactly") {
    import spark.implicits._
    // 2-word "lines", boilerplate = in >= 2 docs: "a b" (d1,d2) and
    // "x y" (d2,d3) get stripped everywhere; only d1's "c d" survives
    val docs = Seq((1L, "a b c d"), (2L, "a b x y"), (3L, "x y"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.lineDedup(docs, "text", "doc_id",
        lineWords = 2, maxDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    // poly_hash("c d") = ((99*31+32)*31+100) mod 1e9+7 = 96231
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 3, 96231L),
      (2L, 2L, 0L, 0, 0L),
      (3L, 1L, 0L, 0, 0L)))
  }

  test("incrementalNearDedup: corpus blocking, peer blocking, and the chain policy") {
    import spark.implicits._
    val existing = Seq((1L, "e1 e2 e3 e4 e5 e6"),
      (2L, "filler one two three four five")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "e1 e2 e3 e4 e5 x1"),  // j=4/6 vs existing 1 → corpus-blocked
      (20L, "a1 a2 a3 a4 a5 a6"),  // clean → admitted
      (21L, "a1 a2 a3 a4 a5 b1"),  // j=4/6 vs 20 → peer-blocked
      (22L, "a2 a3 a4 a5 b1 b2"),  // j=4/6 vs 21 only; 21 is corpus-CLEAN
                                   // → blocks (conservative chain policy)
      (30L, "totally unrelated words here live"),
      (40L, "e2 e3 e4 e5 x1 x2"))  // j=4/6 vs 10, but 10 is corpus-BLOCKED
                                   // → no peer block; j=3/7 vs existing 1 → admitted
      .toDF("doc_id", "text")
    val got = Dedup.incrementalNearDedup(batch, existing, "text", "doc_id",
        shingleN = 2, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(got == Map(
      10L -> (1L, 0L, 0), 20L -> (0L, 0L, 1), 21L -> (0L, 1L, 0),
      22L -> (0L, 1L, 0), 30L -> (0L, 0L, 1), 40L -> (0L, 0L, 1)))
  }

  test("decontaminatedSplit == brute-force cross-split jaccard replay; holdout never dropped") {
    import spark.implicits._
    // pairs of near-dup texts (jaccard >= 0.5 on bigram shingles) plus
    // unrelated docs; the content-hash split scatters them, and every
    // engine verdict must match a brute-force scala replay
    val texts = (0 until 8).flatMap { i =>
      Seq(s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i",
        s"alpha$i beta$i gamma$i delta$i epsilon$i eta$i") // near-dup of its twin
    } ++ Seq("lonely words unlike anything else", "another fully unrelated document")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = graft.llm.Sampling.decontaminatedSplit(docs, "text", "doc_id",
        Seq("train" -> 70, "test" -> 100), holdout = "test", shingleN = 2,
        threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getLong(3), r.getInt(4))).toMap
    def shingles(t: String) =
      t.split(" ").filter(_.nonEmpty).sliding(2).map(_.mkString(" ")).toSet
    val byId = texts.zipWithIndex.map { case (t, i) => i.toLong -> t }.toMap
    val testIds = got.collect { case (id, ("test", _, _)) => id }.toSet
    got.foreach { case (id, (split, nLeak, kept)) =>
      if (split == "test") assert(kept == 1, s"holdout doc $id dropped")
      else {
        val partners = testIds.count { tid =>
          val (a, b) = (shingles(byId(id)), shingles(byId(tid)))
          a.nonEmpty && b.nonEmpty &&
            (a & b).size.toDouble / (a | b).size >= 0.5
        }
        assert(nLeak == partners && kept == (if (partners > 0) 0 else 1),
          s"doc $id: engine ($nLeak, $kept) vs replay $partners")
      }
    }
    // the fixture must actually exercise a quarantine for the test to mean anything
    assert(got.values.exists(_._3 == 0) || testIds.isEmpty ||
      got.values.count(_._1 == "test") == 0 ||
      { val anyCross = got.exists { case (id, (sp, _, _)) => sp != "test" &&
          testIds.exists(t => (shingles(byId(id)) & shingles(byId(t))).nonEmpty) }
        !anyCross })
  }

  test("groupCentroids: hand-computed per-label vector means in micro units") {
    import spark.implicits._
    val vs = Seq(
      (0, Seq(1.0f, -2.0f)), (0, Seq(3.0f, 4.0f)),  // label 0: mean (2, 1)
      (1, Seq(0.5f, 0.25f)))                         // label 1: itself
      .toDF("label", "embedding")
    val got = Similarity.groupCentroids(vs, "embedding", "label")
      .orderBy("label").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0, Seq(2000000L, 1000000L), 2L),
      (1, Seq(500000L, 250000L), 1L)))
  }

  test("corpusDiff classifies added/removed/changed/unchanged by id + fingerprint") {
    import spark.implicits._
    val v1 = Seq((1L, "same"), (2L, "old text"), (3L, "gone")).toDF("doc_id", "text")
    val v2 = Seq((1L, "same"), (2L, "new text"), (4L, "brand new")).toDF("doc_id", "text")
    val got = Dedup.corpusDiff(v1, v2, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("piiCard: Luhn gate separates real cards from lookalike digit runs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "pay 4111111111111111 now"),           // valid 16-digit
      (2L, "card 4111-1111-1111-1111 ok"),        // valid, dashed
      (3L, "ref 1234-5678-9012-3456 code"),       // fails Luhn
      (4L, "amex 378282246310005 end"),           // valid 15-digit
      (5L, "no digits here"),
      (6L, "two 4111111111111111 and 6011111111111117 cards"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.piiCard(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // redacted_len: doc1 "pay <CARD> now"=14, doc2 "card <CARD> ok"=14,
    // doc3 unchanged=28, doc4 "amex <CARD> end"=15, doc5=14,
    // doc6 "two <CARD> and <CARD> cards"=27
    assert(got.toSeq == Seq(
      (1L, 1, 0, 14), (2L, 1, 0, 14), (3L, 0, 1, 28),
      (4L, 1, 0, 15), (5L, 0, 0, 14), (6L, 2, 0, 27)))
  }

  test("budgetSelect: banded prefix sum == naive global window; whole-doc cut semantics") {
    import spark.implicits._
    // mixed-quality corpus incl. an empty doc (sentinel key ranks last)
    val docs = Seq(
      (1L, "the the the the the the"), (2L, "the a the a the a"),
      (3L, "rare words here"), (4L, "the the a a"), (5L, ""),
      (6L, "a a a the the the"), (7L, "unique singleton tokens")).toDF("doc_id", "text")
    val got = TextAnalysis.budgetSelect(docs, "text", "doc_id",
        budgetTokens = 12L, nBands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .sortBy(_._1)
    // naive replay: one global ordered cumsum over the same keys
    val naive = got.sortBy(t => (t._3, t._1))
      .scanLeft((0L, 0L, 0L, 0L, 0)) { case ((_, _, _, cum, _), d) =>
        (d._1, d._2, d._3, cum + d._2, if (cum + d._2 <= 12L) 1 else 0) }
      .drop(1).sortBy(_._1)
    assert(got.toSeq == naive.toSeq)
    // the budget cuts mid-corpus: some selected, some not, cut is whole-doc
    assert(got.exists(_._5 == 1) && got.exists(_._5 == 0))
    val cut = got.filter(_._5 == 1).map(_._4).max
    assert(cut <= 12L)
  }

  test("shingles produce distinct word n-grams, short docs give empty") {
    import spark.implicits._
    val df = Seq("a b c d", "a b").toDF("text").withColumn("doc_id", lit(1L))
    val sh = df.select(Dedup.shingles(col("text"), 3).as("sh")).as[Seq[String]].collect()
    assert(sh(0) == Seq("a b c", "b c d"))
    assert(sh(1).isEmpty)
  }

  test("minhash-LSH near-dups match exact inverted-index jaccard pairs") {
    val docs = Tables.load(spark, sfDir, "documents")
    val lsh = Dedup.minhashNearDups(docs, "text", "doc_id", 3, 0.5)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("sf0.1 cross-check: minhash-LSH equals exact inverted index, 256 pairs bit-identical",
      SlowTest) {
    // the scale the DuckDB oracle can't reach (its quadratic replay
    // times out at sf0.1): the collapse→LSH→verify→re-expand pipeline
    // must equal the independent exact algorithm pair-for-pair AND
    // bit-for-bit on jaccard. Promoted from tools/CrossCheck.scala so
    // a re-expansion regression fails CI, not just the round gate.
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("ia", "ib", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = pairs(Dedup.minhashNearDups(docs, "text", "doc_id", 3, 0.5))
    val inv = pairs(Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5))
    assert(lsh.size == 256 && inv.size == 256,
      s"sf0.1 corpus drifted: lsh=${lsh.size} inv=${inv.size} (expected 256)")
    assert(lsh.keySet == inv.keySet, "pair sets differ")
    val valueDiffs = lsh.keySet.filter(k => lsh(k) != inv(k))
    assert(valueDiffs.isEmpty, s"jaccard bits differ on ${valueDiffs.take(5)}")
  }

  test("LSH bucket stats surface the star-path approximation") {
    val docs = Tables.load(spark, sfDir, "documents")
    val sets = Dedup.shingleSets(docs, "text", "doc_id", 3)
    val sigs = Dedup.minhashSignatures(sets, 64)
    // the default cap is far above anything this corpus produces —
    // zero oversized buckets means the gate output is exact all-pairs
    val (overDefault, largest) = Dedup.lshBucketStats(sigs, 32, 2, 4096)
    assert(overDefault == 0L)
    assert(largest >= 1L)
    // a cap of 1 forces every multi-doc bucket onto the star path and
    // the diagnostic must report it (this corpus has near-dups, so
    // multi-doc buckets exist)
    val (overTiny, _) = Dedup.lshBucketStats(sigs, 32, 2, 1)
    assert(overTiny > 0L)
  }

  test("WordChunks native expression matches the HOF slice chain") {
    import spark.implicits._
    val df = Seq("a b c d e f g", "one two", "", "  x  ", "a b c d e f g h i j k")
      .toDF("text")
    val w = 3
    val toks = TextAnalysis.tokens(col("text"))
    val nChunks = ceil(size(toks).cast("double") / w).cast("int")
    val hof = when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(toks, i * w + 1, lit(w)), " ")))
    val rows = df.select(graft.functions.WordChunks(col("text"), w).as("native"),
      hof.as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    assert(rows(0).getSeq[String](0) == Seq("a b c", "d e f", "g"))
    assert(rows(2).getSeq[String](0).isEmpty)
  }

  test("incrementalDedup drops served + in-batch dups, keeps min id") {
    import spark.implicits._
    val existing = Seq((1L, "served doc"), (2L, "other served")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "served doc"),  // exact copy of corpus doc → dropped
      (11L, "fresh one"),
      (12L, "fresh one"),   // in-batch dup → loses to 11
      (13L, "fresh two")).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(batch, existing, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(11L, 13L))
  }

  test("splitByHash: byte-identical docs share a split; bounds cover") {
    import spark.implicits._
    val df = Seq((1L, "dup text"), (2L, "dup text"), (3L, "solo")).toDF("doc_id", "text")
    val out = graft.llm.Sampling.splitByHash(df, "text",
      Seq("train" -> 80, "val" -> 90, "test" -> 100))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out(1L) == out(2L)) // content-addressed: dups never straddle splits
    assert(out.values.forall(Set("train", "val", "test")))
    // corpus-level: every split hash lands inside [0, modulus)
    val docs = Tables.load(spark, sfDir, "documents")
    val hs = graft.llm.Sampling.splitByHash(docs, "text",
      Seq("train" -> 80, "val" -> 90, "test" -> 100))
      .agg(min("split_hash"), max("split_hash")).head()
    assert(hs.getLong(0) >= 0L && hs.getLong(1) < 100L)
  }

  test("diversitySample: capped per cluster, covers every non-empty cluster") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val assign = Similarity.kMeansAssign(emb, k = 4, iters = 2)
    val picked = Similarity.diversitySample(emb, k = 4, iters = 2, perCluster = 10)
    val perCluster = picked.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perCluster.values.forall(_ <= 10))
    val liveClusters = assign.select("cluster").distinct().collect()
      .map(_.getInt(0)).toSet
    assert(perCluster.keySet == liveClusters)
  }

  test("simhash: near-dup docs have small hamming distance") {
    val docs = Tables.load(spark, sfDir, "documents")
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id", 3, 0.7)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1)))
    val sig = Dedup.simhash(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (pairs.nonEmpty) {
      val dists = pairs.toSeq.map { case (a, b) =>
        java.lang.Long.bitCount(sig(a) ^ sig(b))
      }
      assert(dists.max <= 10, s"near-dup hamming too large: $dists")
    }
    // random pairs should be far apart on average
    val ids = sig.keys.toSeq.sorted.take(20)
    val rand = for (a <- ids; b <- ids if a < b)
      yield java.lang.Long.bitCount(sig(a) ^ sig(b))
    assert(rand.sum.toDouble / rand.size > 5.0)
  }

  test("IVF ANN: high recall on clustered data, nprobe/cells on uniform") {
    import spark.implicits._
    // Planted clusters: 10 centers on coordinate axes, 40 members each
    // with small deterministic jitter. label = cluster id (what k-means
    // would recover). IVF with nprobe=2 must find nearly all true
    // neighbors because neighbors share the query's cell.
    val dim = 64
    def jitter(seed: Long, i: Int): Float = {
      val x = (seed * 2654435761L + i * 40503L) % 1000
      (x.toFloat / 1000f - 0.5f) * 0.2f
    }
    val rows = for (c <- 0 until 10; m <- 0 until 40) yield {
      val id = (c * 40 + m).toLong
      val v = Array.tabulate(dim)(i => (if (i == c * 6) 1f else 0f) + jitter(id, i))
      (id, v, c)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val qs = emb.filter(col("vec_id") % 40 === 0) // one query per cluster
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_vec_id", "n_vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(qs, emb, 5))
    val ivf = pairs(Similarity.ivfTopK(qs, emb, 5, nprobe = 2))
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall on clustered data $recall below 0.9")

    // Uniform-random testdata: partition pruning can't beat
    // nprobe/cells on unclustered vectors — assert it's in that regime
    // (sanity that probing works at all), not magic.
    val real = Tables.load(spark, sfDir, "embeddings")
    val rq = real.filter(col("vec_id") % 50 === 0)
    val rExact = pairs(Similarity.bruteForceTopK(rq, real, 5))
    val rIvf = pairs(Similarity.ivfTopK(rq, real, 5, nprobe = 8))
    val rRecall = (rExact & rIvf).size.toDouble / rExact.size
    assert(rRecall >= 0.6, s"IVF recall with nprobe=8/10 was $rRecall")
  }

  test("near-dup clusters: labels are component minima (chain graph), both paths") {
    import spark.implicits._
    // chain 1-2-3-4 plus isolated pair 10-11: transitivity must give
    // the whole chain cluster_id 1 even though (1,4) is not a pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("ia", "ib")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L)
    val viaUnionFind = Dedup.nearDupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaUnionFind == expect)
    // force the distributed large-star/small-star path and require
    // identical output
    val viaStars = Dedup.nearDupClusters(pairs, driverBytesThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStars == expect)
  }

  test("repetition metrics: run-length formulation, edge cases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y x y x y"),      // bigrams: xy yx xy yx xy → top=3/5, dup=5/5
      (2L, "a b c d"),           // all bigrams unique → top=1/3, dup=0
      (3L, "solo"),              // 1 token → no bigrams → nulls
      (4L, "")                   // no tokens → all null
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(docs, "text")
      .orderBy("doc_id").collect()
    assert(r(0).getInt(1) == 5 && r(0).getDouble(2) == 3.0 / 5 && r(0).getDouble(3) == 1.0)
    assert(r(0).getDouble(4) == 1.0 - 2.0 / 6) // x,y distinct of 6 tokens
    assert(r(1).getInt(1) == 3 && r(1).getDouble(2) == 1.0 / 3 && r(1).getDouble(3) == 0.0)
    assert(r(2).getInt(1) == 0 && r(2).isNullAt(2) && r(2).isNullAt(3))
    assert(r(3).isNullAt(4)) // 0 tokens → dup_token_frac null
  }

  test("scrub replaces and counts pattern matches") {
    import spark.implicits._
    val docs = Seq((1L, "the cat saw a dog and the bird"), (2L, "nothing here"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.scrub(docs, "text", "\\b(a|the)\\b", "<STOP>")
      .orderBy("doc_id").collect()
    assert(r(0).getString(1) == "<STOP> cat saw <STOP> dog and <STOP> bird")
    assert(r(0).getInt(2) == 3)
    assert(r(1).getString(1) == "nothing here" && r(1).getInt(2) == 0)
  }

  test("embedding near-dups: triangle-blocked join equals naive all-pairs, any block count") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    // naive all-pairs reference (the pre-round-2 formulation)
    val withNorm = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      .withColumn("nrm", Similarity.l2Norm(col("v")))
    val a = withNorm.select(col("id").as("ia"), col("v").as("va"), col("nrm").as("na"))
    val b = withNorm.select(col("id").as("ib"), col("v").as("vb"), col("nrm").as("nb"))
    val naive = a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        (Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    for (blocks <- Seq(1, 4, 16)) {
      val tri = Dedup.embeddingNearDups(emb, "embedding", "vec_id", 0.4, blocks = blocks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(tri == naive, s"blocks=$blocks differs from all-pairs")
    }
    assert(naive.nonEmpty)
  }

  test("embedding near-dup LSH scale path: exact precision, high recall at near-dup angles") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // tight threshold = true near-dups: recall must be high
    val exactTight = toSet(Dedup.embeddingNearDups(emb, "embedding", "vec_id", 0.9))
    val lshTight = toSet(Dedup.embeddingNearDupsLsh(emb, "embedding", "vec_id", 0.9,
      bits = 8, probeBits = 2))
    assert((lshTight -- exactTight).isEmpty, "LSH emitted a pair the exact join rejects")
    if (exactTight.nonEmpty) {
      val recall = (exactTight & lshTight).size.toDouble / exactTight.size
      assert(recall >= 0.9, s"near-dup LSH recall $recall below 0.9")
    }
  }

  test("pairsWithRecallVerdict: rows are the exact pair set; verdict flips on low recall") {
    import spark.implicits._
    val exact = Seq((1L, 2L, 0.95), (1L, 3L, 0.9), (2L, 3L, 0.85),
      (4L, 5L, 0.8)).toDF("ia", "ib", "cos")
    val approx3 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (9L, 10L)).toDF("ia", "ib")
    val got = Dedup.pairsWithRecallVerdict(exact, approx3, minRecall = 0.7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2), r.getInt(3)))
    // rows = exactly the exact pair set (an approx-only pair never leaks in)
    assert(got.map(_._1).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)) && got.length == 4)
    assert(got.forall(_._3 == 1), "3/4 recovered >= 0.7 must pass")
    val low = Dedup.pairsWithRecallVerdict(exact,
        Seq((1L, 2L)).toDF("ia", "ib"), minRecall = 0.7)
      .collect().map(_.getInt(3))
    assert(low.forall(_ == 0), "1/4 recovered must fail the 0.7 verdict on every row")
  }

  test("minhash near-dups: exact-dup collapse re-expands byte-identical docs correctly") {
    import spark.implicits._
    // docs 1,2,3 byte-identical (long enough to shingle); 4 near-dup of
    // them; 5 unrelated; 6,7 identical but too short to shingle
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (4L, "alpha beta gamma delta epsilon eta"),
      (5L, "the quick brown fox jumps over dogs"),
      (6L, "tiny doc"),
      (7L, "tiny doc")).toDF("doc_id", "text")
    val got = Dedup.minhashNearDups(docs, "text", "doc_id", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .map { case (a, b, j) => (a, b) -> j }.toMap
    // intra-group pairs at exactly 1.0
    assert(got((1L, 2L)) == 1.0 && got((1L, 3L)) == 1.0 && got((2L, 3L)) == 1.0)
    // cross-group expansion: 4 pairs with each of 1,2,3 at the same jaccard
    assert(got.contains((1L, 4L)) && got.contains((2L, 4L)) && got.contains((3L, 4L)))
    assert(got((1L, 4L)) == got((2L, 4L)) && got((2L, 4L)) == got((3L, 4L)))
    // shingle-less identical docs produce NO jaccard pair (undefined),
    // and nothing pairs with the unrelated doc
    assert(!got.keySet.exists { case (a, b) => a == 6L || b == 7L || a == 5L || b == 5L })
  }

  test("dropNearDups removes byte-identical docs shorter than the shingle width") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "the quick brown fox jumps over dogs"),
      (6L, "tiny doc"),
      (7L, "tiny doc")).toDF("doc_id", "text")
    val kept = Dedup.dropNearDups(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 6L))
  }

  test("LSH ANN recall on clustered data >= 0.8 with multi-probe") {
    import spark.implicits._
    val dim = 64
    def jitter(seed: Long, i: Int): Float = {
      val x = (seed * 2654435761L + i * 40503L) % 1000
      (x.toFloat / 1000f - 0.5f) * 0.2f
    }
    val rows = for (c <- 0 until 10; m <- 0 until 40) yield {
      val id = (c * 40 + m).toLong
      val v = Array.tabulate(dim)(i => (if (i == c * 6) 1f else 0f) + jitter(id, i))
      (id, v, c)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val qs = emb.filter(col("vec_id") % 40 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_vec_id", "n_vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(qs, emb, 5))
    val lsh = pairs(Similarity.lshTopK(qs, emb, 5, bits = 6))
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall on clustered data $recall below 0.8")
  }

  test("multimodal stub decode keeps schema + values consistent") {
    val docs = Tables.load(spark, sfDir, "documents")
    val feats = Multimodal.decodeStub(spark, Multimodal.mediaTable(docs))
    val row = feats.filter(col("doc_id") === 0).collect().head
    val text = docs.filter(col("doc_id") === 0).select("text").collect().head.getString(0)
    assert(row.payload_len == text.getBytes("UTF-8").length)
    assert(row.n_chunks == (text.getBytes("UTF-8").length + 255) / 256)
    assert(row.header_hex == text.take(4).getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString)
  }

  test("frame sample and resize handle empty/short/multi-frame payloads") {
    import spark.implicits._
    val media = Seq(
      (0L, ""),                       // empty → no frames, resized len 0
      (1L, "ab"),                     // sub-frame → one frame of 2
      (2L, "x" * 1300))               // 6 frames → sampled idx 0, 4
      .toDF("doc_id", "text")
    val m = Multimodal.mediaTable(media.withColumn("text", col("text")))
    val frames = Multimodal.frameSample(spark, m).collect()
      .map(f => (f.doc_id, f.frame_idx, f.frame_len)).sortBy(x => (x._1, x._2))
    assert(frames.toSeq == Seq((1L, 0L, 2L), (2L, 0L, 256L), (2L, 4L, 256L)))
    val rs = Multimodal.resizeStub(spark, m).collect()
      .map(r => r.doc_id -> (r.orig_len, r.resized_len)).toMap
    assert(rs(0L) == (0L, 0L) && rs(1L) == (2L, 1L) && rs(2L) == (1300L, 325L))
  }

  test("LSH hot bucket actually triggers the star path; connectivity preserved, stats observable") {
    import spark.implicits._
    // 100 docs with IDENTICAL signatures — every band puts them in one
    // 100-doc bucket, far over cap=16 — plus 5 docs with unique sigs
    // exercising the normal all-pairs path alongside.
    val clique = (1L to 100L).map(i => (i, Seq.fill(64)(42L)))
    val loners = (200L to 204L).map(i => (i, Seq.fill(64)(i * 1000)))
    val sigs = (clique ++ loners).toDF("doc_id", "sig")
    val cap = 16

    // the diagnostic sees the overflow (this is what production
    // monitoring would alert on)
    val (oversized, maxBucket) = Dedup.lshBucketStats(sigs, 32, 2, cap)
    assert(oversized == 32 && maxBucket == 100,
      s"expected 32 hot bands of 100, got ($oversized, $maxBucket)")

    def pairs(capN: Int) = Dedup.lshCandidates(sigs, 32, 2, capN).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val star = pairs(cap)
    // star around the bucket minimum: O(m) edges, loners untouched
    assert(star == (2L to 100L).map(j => (1L, j)).toSet)
    // subset of the uncapped enumeration, and the same single
    // connected component (what dedup clustering consumes)
    val full = pairs(4096)
    assert(star.subsetOf(full))
    assert(full == (for (a <- 1L to 100L; b <- (a + 1) to 100L) yield (a, b)).toSet)
  }

  test("PPM decode: header variants parse, malformed payloads fall through") {
    import java.nio.charset.StandardCharsets.US_ASCII
    def ppm(header: String, px: Array[Byte]) =
      header.getBytes(US_ASCII) ++ px
    val rgb = Array[Byte](10, 20, 30, 40, 50, 60) // 2x1, two pixels
    // plain header
    val ok = Multimodal.decodePpm(ppm("P6\n2 1\n255\n", rgb)).get
    assert(ok.width == 2 && ok.height == 1 && ok.channels == 3 && ok.maxval == 255)
    assert(ok.n_pixels == 2 &&
      ok.luma_sum == 299L * 10 + 587 * 20 + 114 * 30 + 299 * 40 + 587 * 50 + 114 * 60)
    // comments between any header tokens, CRLF, multiple spaces
    val commented = Multimodal.decodePpm(
      ppm("P6\n# a comment\n 2 # inline\n1\r\n# more\n255\n", rgb))
    assert(commented.map(f => (f.width, f.height, f.luma_sum)) ==
      Some((2, 1, ok.luma_sum)))
    // unsigned bytes: 0xFF pixel must count as 255, not -1
    val bright = Multimodal.decodePpm(
      ppm("P6\n1 1\n255\n", Array(0xff.toByte, 0xff.toByte, 0xff.toByte))).get
    assert(bright.luma_sum == 255L * (299 + 587 + 114))
    // malformed: wrong magic, truncated pixels, 16-bit maxval, zero dims
    assert(Multimodal.decodePpm("JFIF....".getBytes(US_ASCII)).isEmpty)
    assert(Multimodal.decodePpm(ppm("P6\n2 2\n255\n", rgb)).isEmpty)
    assert(Multimodal.decodePpm(ppm("P6\n1 1\n65535\n",
      Array[Byte](1, 2, 3, 4, 5, 6))).isEmpty)
    assert(Multimodal.decodePpm(ppm("P6\n0 1\n255\n", Array[Byte]())).isEmpty)
    // decodeImages drops opaque payloads, keeps parseable ones
    import spark.implicits._
    val media = Seq(
      (1L, "image/x-portable-pixmap", ppm("P6\n2 1\n255\n", rgb)),
      (2L, "application/octet-stream", "JFIF....".getBytes(US_ASCII)))
      .toDF("doc_id", "media_type", "payload")
    val decoded = Multimodal.decodeImages(spark, media).collect()
    assert(decoded.map(_.doc_id).toSeq == Seq(1L))
    assert(decoded.head.luma_sum == ok.luma_sum)
  }

  test("langId is deterministic and falls back to 'und'") {
    import spark.implicits._
    val df = Seq("the cat is here", "der hund ist gut", "xyzzy blorp").toDF("text")
    val got = df.select(TextAnalysis.langId(col("text"))).as[String].collect().toSeq
    assert(got == Seq("en", "de", "und"))
  }

  test("bloomIncrementalDedup is exact under heavy false positives and matches the plain anti-join") {
    import spark.implicits._
    val existing = (1L to 200L).map(i => (i, s"doc ${i % 50}")).toDF("doc_id", "text")
    val batch = (201L to 400L).map(i => (i, s"doc ${i % 80}")).toDF("doc_id", "text")
    // 16 expected items at fpp 0.5 for a 160-distinct-hash corpus →
    // the filter is saturated, so nearly every probe is a bloom hit and
    // the broadcast verify join does all the real work
    val got = Dedup.bloomIncrementalDedup(batch, existing, "text", "doc_id",
        expectedItems = 16, fpp = 0.5)
      .select("doc_id", "content_hash").orderBy("doc_id").collect().toSeq
    val want = Dedup.incrementalDedup(batch, existing, "text", "doc_id")
      .select("doc_id", "content_hash").orderBy("doc_id").collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // empty corpus: everything new, first occurrence per hash kept
    val emptyCorpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val all = Dedup.bloomIncrementalDedup(batch, emptyCorpus, "text", "doc_id")
      .select("doc_id", "content_hash").orderBy("doc_id").collect().toSeq
    val allWant = Dedup.incrementalDedup(batch, emptyCorpus, "text", "doc_id")
      .select("doc_id", "content_hash").orderBy("doc_id").collect().toSeq
    assert(all == allWant)
  }

  test("boilerplateRemoval drops every occurrence above the doc-frequency threshold") {
    import spark.implicits._
    // chunkWords=2: "nav bar" appears in 3 docs (df=3 > 2) → removed
    // everywhere; "body one"/"body two" are unique; doc 4 repeats
    // "twice here" twice WITHIN itself (df=1) → both kept
    val df = Seq(
      (1L, "nav bar body one"),
      (2L, "nav bar body two"),
      (3L, "nav bar"),
      (4L, "twice here twice here"),
      (5L, "")).toDF("doc_id", "text")
    val got = Dedup.boilerplateRemoval(df, "text", "doc_id",
        chunkWords = 2, maxDocFreq = 2)
      .orderBy("doc_id").as[(Long, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (1L, 2, 1, "body one"),
      (2L, 2, 1, "body two"),
      (3L, 1, 0, ""),
      (4L, 2, 2, "twice here twice here"),
      (5L, 0, 0, "")))
  }

  test("unigramLogProb matches hand-computed quantized NLL; empty doc keeps a zero row") {
    import spark.implicits._
    // Corpus counts: x=3, y=2, z=1, T=6.
    //   nll_micro(x) = floor(1e6*ln(6/3)) = 693147
    //   nll_micro(y) = floor(1e6*ln(6/2)) = 1098612
    //   nll_micro(z) = floor(1e6*ln(6/1)) = 1791759
    val df = Seq((1L, "x x x y"), (2L, "y z"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(df, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 3L * 693147L + 1098612L),
      (2L, 2L, 1098612L + 1791759L),
      (3L, 0L, 0L)))
  }

  test("bigramLogProb matches hand-computed smoothed NLL; short docs keep zero rows") {
    import spark.implicits._
    // corpus bigrams: "x y"=2, "y x"=2; contexts: x=2, y=2; V=3
    //   nll("x y") = nll("y x") = floor(1e6*ln((2+3)/(2+1))) = 510825
    val df = Seq((1L, "x y x y"), (2L, "y x"), (3L, "z"), (4L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(df, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 3L * 510825L),
      (2L, 1L, 510825L),
      (3L, 0L, 0L),
      (4L, 0L, 0L)))
  }

  test("qualityBuckets is bit-identical to the single-global-window ntile form") {
    import spark.implicits._
    // heavy ties (hot token mix repeated) + unique docs + empty docs,
    // n=97 indivisible by 3 and by 5
    val df = (1L to 97L).map { i =>
      val text = if (i % 5 == 0) "common words shared by many docs"
      else if (i % 11 == 0) "" else s"unique${i % 23} tok${i % 31} filler"
      (i, text)
    }.toDF("doc_id", "text")
    for (k <- Seq(3, 5)) {
      val got = TextAnalysis.qualityBuckets(df, "text", "doc_id", buckets = k,
          nBands = 8)
        .orderBy("doc_id").collect().toSeq
      val wAll = org.apache.spark.sql.expressions.Window
        .orderBy("mean_nll_micro", "doc_id")
      val want = TextAnalysis.unigramLogProb(df, "text", "doc_id")
        .withColumn("mean_nll_micro",
          when(col("n_tokens") > 0, expr("nll_micro_sum div n_tokens"))
            .otherwise(lit(8000000000000000000L)))
        .withColumn("nll_rank", row_number().over(wAll).cast("long"))
        .withColumn("quality_bucket", ntile(k).over(wAll))
        .select("doc_id", "n_tokens", "mean_nll_micro", "nll_rank",
          "quality_bucket")
        .orderBy("doc_id").collect().toSeq
      assert(got == want, s"buckets=$k")
    }
  }

  test("containmentPairs surfaces tiny-inside-huge docs that Jaccard misses") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e"), (2L, "a b c"), (3L, "x y z"), (4L, "a b"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "text", "doc_id", shingleN = 2,
        threshold = 0.8)
      .orderBy("ia", "ib").as[(Long, Long, Double, Double)].collect().toSeq
    // (1,2): jaccard = 2/4 = 0.5 — would NOT pass a 0.8 jaccard gate;
    // containment_b = 1.0 does
    assert(got == Seq((1L, 2L, 0.5, 1.0), (1L, 4L, 0.25, 1.0),
      (2L, 4L, 0.5, 1.0)))
  }

  test("containmentPairsPrefix is bit-identical to the full index join") {
    // lossless prefix bound: same pairs AND same double containments,
    // on the real gate corpus and at two thresholds (0.8 exercises
    // short prefixes; 0.5 longer ones + the ceil float guard)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    for (t <- Seq(0.8, 0.5)) {
      val exact = Dedup.containmentPairs(docs, "text", "doc_id",
          shingleN = 2, threshold = t)
        .orderBy("ia", "ib").collect().toSeq
      val pref = Dedup.containmentPairsPrefix(docs, "text", "doc_id",
          shingleN = 2, threshold = t)
        .orderBy("ia", "ib").collect().toSeq
      assert(pref == exact, s"threshold=$t: prefix-filtered result diverged")
      assert(exact.nonEmpty, s"threshold=$t: vacuous corpus equality")
    }
  }

  test("winnow selects rightmost window minima and honors the MOSS guarantee") {
    import spark.implicits._
    // All-equal tokens ⇒ all gram hashes equal ⇒ every window keeps its
    // RIGHTMOST element: selected positions are exactly {w-1 .. n_grams-1}.
    val uniform = Seq((1L, Array.fill(10)("z").mkString(" "))).toDF("doc_id", "text")
    val posSel = TextAnalysis.winnow(uniform, "text", "doc_id", k = 4, w = 4)
      .select("pos").as[Int].collect().toSet
    assert(posSel == (3 to 6).toSet) // 7 grams, windows 0..3, rightmost each
    // Guarantee: a shared token run of length ≥ w + k − 1 = 7 must share
    // at least one fingerprint hash, wherever it sits in either doc.
    val run = "q1 q2 q3 q4 q5 q6 q7"
    val docs = Seq(
      (1L, s"alpha beta $run gamma delta"),
      (2L, s"one two three four $run")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(docs, "text", "doc_id", k = 4, w = 4)
      .select("doc_id", "fp").collect()
      .groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getLong(1)).toSet }
    assert((fps(1L) & fps(2L)).nonEmpty)
    // Short doc (< k tokens) contributes nothing; sub-w gram counts
    // still emit their single whole-doc window.
    val short = Seq((1L, "a b"), (2L, "a b c d e")).toDF("doc_id", "text")
    val byDoc = TextAnalysis.winnow(short, "text", "doc_id", k = 4, w = 4)
      .collect().groupBy(_.getLong(0))
    assert(!byDoc.contains(1L) && byDoc(2L).length == 1)
  }

  test("winnowNearDups pairs docs sharing a long run, not unrelated ones") {
    import spark.implicits._
    val run = "q1 q2 q3 q4 q5 q6 q7 q8"
    val docs = Seq(
      (1L, s"alpha beta $run gamma delta"),
      (2L, s"one two three four $run five"),
      (3L, "totally different words with no shared grams here at all"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowNearDups(docs, "text", "doc_id",
        k = 4, w = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhashPairs finds exactly the brute-force Hamming ball (pigeonhole is lossless)") {
    import spark.implicits._
    // 0/1 near-identical (one word changed), 2 unrelated, 3 = exact dup of 0
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // brute-force reference over the same signatures
    val sigs = Dedup.simhashShingles(docs, "text", "doc_id", shingleN = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 8
    } yield (a, b) -> h).toMap
    assert(got == want)
    assert(got((0L, 3L)) == 0) // exact dup → identical signature
    assert(got.contains((0L, 1L)) && got((0L, 1L)) > 0) // near dup, small h
    assert(!got.keySet.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("exactSubstringSpans marks overlapping spans at any alignment, attributes the primary") {
    import spark.implicits._
    // doc 2 contains doc 1's 5 words shifted by two — a chunk-aligned
    // dedup would miss it; span-level must not. doc 3 too short → 0 spans.
    val docs = Seq(
      (1L, "a b c d e x y"),
      (2L, "p q a b c d e"),
      (3L, "t u")).toDF("doc_id", "text")
    val out = Dedup.exactSubstringSpans(docs, "text", "doc_id", spanTokens = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4))).toMap
    // doc1: spans "a b c d e","b c d e x","c d e x y"; first is duplicated
    // (also at doc2 pos 2) and doc1 owns the primary (doc 1 < doc 2)
    assert(out(1L) == ((3, 1, 1, 1.0 / 3)))
    // doc2: spans "p q a b c","q a b c d","a b c d e"; the last is the copy
    assert(out(2L) == ((3, 1, 0, 1.0 / 3)))
    assert(out(3L) == ((0, 0, 0, 0.0)))
  }

  test("pqCodes equals per-subspace kMeansAssign and packs codes consistently") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0L until 40L).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.pqCodes(df, nSub = 2, k = 3, iters = 1, dim = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3))).toMap
    // per-subspace reference: kMeansAssign on each slice
    (0 until 2).foreach { s =>
      val sub = df.select(col("vec_id"),
        slice(col("embedding"), s * 4 + 1, 4).as("sub"))
      val ref = Similarity.kMeansAssign(sub, k = 3, iters = 1, dim = 4,
          vecCol = "sub").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      out.foreach { case (id, (c0, c1, _)) =>
        assert((if (s == 0) c0 else c1) == ref(id))
      }
    }
    out.values.foreach { case (c0, c1, code) =>
      assert(c0 >= 0 && c0 < 3 && c1 >= 0 && c1 < 3)
      assert(code == c0.toLong * 3 + c1)
    }
  }

  test("bpeTrain learns the hand-computed merge table (Sennrich example), ties lexicographic") {
    import spark.implicits._
    val docs = Seq((1L, "low low lower"), (2L, "low lowest"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(docs, "text", merges = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toList.sortBy(_._1)
    // vocab: low x3, lower x1, lowest x1
    // r1: (l,o)=5 ties (o,w)=5 -> lexicographic -> (l,o)
    // r2: (lo,w)=5; r3: (low,e)=2
    // r4: all pairs cnt 1 -> smallest (lhs,rhs) = (lowe,r)
    assert(out == List((1, "l", "o", 5L), (2, "lo", "w", 5L),
      (3, "low", "e", 2L), (4, "lowe", "r", 1L)))
  }

  test("urlNormalize: hand-checked canonical forms") {
    import spark.implicits._
    val urls = Seq(
      "HTTP://WWW.Ex.COM:80/a/b/?utm_campaign=x&b=2&a=1#top",
      "https://ex.com:8080/a",        // non-default port survives
      "https://ex.com?ref=rss",       // empty path, tracking-only query
      "ftp://Ex.Com:443/f").toDF("url")
    val (canon, host, dropped) = TextAnalysis.urlNormalize(col("url"))
    val got = urls.select(canon, host, dropped).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toList
    assert(got == List(
      ("http://ex.com/a/b?a=1&b=2", "ex.com", 1),
      ("https://ex.com:8080/a", "ex.com:8080", 0),
      ("https://ex.com/", "ex.com", 1),
      ("ftp://ex.com:443/f", "ex.com:443", 0)), s"got $got")
  }

  test("heavyHitters: MG sketch survives decrement pressure and many partial merges") {
    import spark.implicits._
    // 5000 distinct cold tokens (frequency 1) + one hot token at ~9%:
    // with k=9 the sketch holds 9 counters against 5001 keys, so
    // decrements and the (k+1)-largest merge cut both fire constantly.
    // Threshold n/(k+1) = 5500/10 = 550 < 500? hot freq must EXCEED
    // n/(k+1): freq 800, n = 5800, n/10 = 580 < 800. Docs are split
    // across 16 partitions to force many partial-buffer merges.
    val docs = ((1 to 5000).map(i => (i.toLong, s"cold$i")) ++
      (1 to 800).map(i => (5000L + i, "hot")))
      .toDF("doc_id", "text").repartition(16)
    val out = TextAnalysis.heavyHitters(docs, "text", k = 9)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
    assert(out.toList == List(("hot", 800L, 1)),
      s"expected exactly the hot token with its exact count, got ${out.toList}")
  }

  test("hybridRrf: integer fusion reorders — a both-legs doc beats each single-leg leader") {
    import spark.implicits._
    // identical texts → bm25 ties → lex rank by doc_id (0,1,2,3);
    // dense vs query 0: doc1 cos 1 (r1), doc3 cos 0.6 (r2),
    // doc2 cos 0 (r3); doc0 excluded (self). Fusion (k0=60):
    //   doc1 = 1e9/62 + 1e9/61 = 32522474  ← both legs, wins
    //   doc3 = 1e9/64 + 1e9/62 = 31754032
    //   doc2 = 1e9/63 + 1e9/63 = 31746030
    //   doc0 = 1e9/61           = 16393442 ← lex leader alone, falls last
    val docs = (0L to 3L).map(i => (i, "apple banana cherry"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0f)),
      (2L, Array(0f, 1f)), (3L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val got = TextAnalysis.hybridRrf(docs, emb, "text", "doc_id", "vec_id",
        qMod = 97L, kLeg = 10, k = 5)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5)))
    assert(got.toList == List(
      (0L, 1, 1L, 32522474L, 2, 1),
      (0L, 2, 3L, 31754032L, 4, 2),
      (0L, 3, 2L, 31746030L, 3, 3),
      (0L, 4, 0L, 16393442L, 1, -1)), got.toList)
  }

  test("ppmDHash: monotone-gradient images hash to all-ones / all-zeros; comments skipped") {
    def ppm(w: Int, h: Int, comment: Boolean)(px: (Int, Int) => Int): Array[Byte] = {
      val head = if (comment) s"P6\n# c\n$w $h\n255\n" else s"P6\n$w $h\n255\n"
      head.getBytes("US-ASCII") ++
        Array.tabulate(w * h * 3)(i => px(i / 3 % w, i / 3 / w).toByte)
    }
    // luma strictly decreasing along every row → every l0 > l1 → all
    // 64 gradient bits set → hash == -1L (bit 63 = sign bit exercised)
    val dec = ppm(9, 8, comment = true)((x, _) => 255 - x * 10)
    assert(Multimodal.ppmDHash(dec).contains((9, 8, -1L)))
    // strictly increasing → no bit set
    val inc = ppm(9, 8, comment = false)((x, _) => x * 10)
    assert(Multimodal.ppmDHash(inc).contains((9, 8, 0L)))
    // flat image → no strict gradient → 0
    val flat = ppm(4, 3, comment = false)((_, _) => 77)
    assert(Multimodal.ppmDHash(flat).contains((4, 3, 0L)))
    // truncated pixel data → None (falls through to the stub path)
    assert(Multimodal.ppmDHash(dec.dropRight(1)).isEmpty)
  }

  test("hammingPairs: pigeonhole finds exactly the within-distance pairs, sign bit included") {
    import spark.implicits._
    val sig = Seq(
      1L -> -1L,               // all 64 bits
      2L -> (-1L ^ 1L),        // hamming 1 from id 1 (bit 0)
      3L -> 0L,                // hamming 64 from id 1
      4L -> (1L << 63),        // hamming 1 from id 3 — sign-bit block
      5L -> 3L)                // hamming 2 from id 3 — excluded at d=1
      .toDF("doc_id", "dhash").repartition(3)
    val got = Dedup.hammingPairs(sig, "doc_id", "dhash", bits = 64, maxHamming = 1)
      .select("ia", "ib", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 1), (3L, 4L, 1)), s"got $got")
    // d=2 admits (3,5) and (4,5)=3? no: 1<<63 vs 3 differs in 3 bits
    val got2 = Dedup.hammingPairs(sig, "doc_id", "dhash", bits = 64, maxHamming = 2)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(got2 == Set((1L, 2L), (3L, 4L), (3L, 5L)), s"got $got2")
  }

  test("cmsFreq: estimates respect both CMS guarantees across many partial merges") {
    import spark.implicits._
    // skewed stream over 16 partitions: partial sketches merge in
    // arbitrary order; counter additions are commutative so the merged
    // sketch must behave as if built sequentially
    val docs = ((1 to 3000).map(i => (i.toLong, s"cold$i")) ++
      (1 to 500).map(i => (3000L + i, "hot")) ++
      (1 to 250).map(i => (3500L + i, "warm warm")))
      .toDF("doc_id", "text").repartition(16)
    val out = TextAnalysis.cmsFreq(docs, "text", topK = 3)
      .orderBy("w").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    // probe set = exact top-3 (freq desc, term asc): hot=500, warm=500,
    // cold1=1 (first cold term alphabetically... freq ties break asc)
    assert(out.map(_._1).toSet == Set("hot", "warm", "cold1"), out.toList)
    val byW = out.map(t => t._1 -> t).toMap
    assert(byW("hot")._2 == 500L && byW("warm")._2 == 500L && byW("cold1")._2 == 1L)
    // both guarantee verdicts hold for every probe
    assert(out.forall(t => t._3 == 1 && t._4 == 1), out.toList)
  }

  test("bpeEncode applies merges in priority order (Sennrich corpus, hand-counted tokens)") {
    import spark.implicits._
    val docs = Seq((1L, "low low lower"), (2L, "low lowest"))
      .toDF("doc_id", "text")
    // merges (from the bpeTrain test): (l,o) (lo,w) (low,e) (lowe,r)
    // after 4: low -> [low]; lower -> [lower]; lowest -> [lowe, s, t]
    val got4 = TextAnalysis.bpeEncode(docs, "text", "doc_id", merges = 4)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got4 == Map(1L -> ((3, 3)), 2L -> ((2, 4))),
      s"got $got4") // doc1: low+low+lower = 1+1+1; doc2: low + lowe,s,t
    // zero merges: one token per character
    val got0 = TextAnalysis.bpeEncode(docs, "text", "doc_id", merges = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got0 == Map(1L -> 11, 2L -> 9)) // lowlowlower=11, lowlowest=9 chars
  }

  test("bpeTrain stops early when no pairs remain") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(docs, "text", merges = 5).collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getLong(3))).toList == List((1, "a", "b", 2L)))
  }

  test("classifierScore sums folded weights exactly and filters empty docs") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta alpha"), (2L, " "), (3L, "gamma"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.classifierScore(docs, "text", "doc_id", buckets = 128)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // replay the exact integer pipeline on the driver
    def w(tok: String): Long = {
      val h = graft.functions.PolyHash.hashBytes(tok.getBytes("UTF-8")) % 128
      (((h * 2654435761L + 987654321L) % 1000003L) % 1001L) - 500L
    }
    assert(out(1L) == ((3L, 2 * w("alpha") + w("beta"))))
    assert(out(3L) == ((1L, w("gamma"))))
    assert(!out.contains(2L)) // whitespace-only → no tokens → filtered
  }

  test("piiDetect counts and redacts typed PII, leaves clean text alone") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a@b.com and c.d@e.org or call 555-123-4567"),
      (2L, "server at 10.0.0.1 and 192.168.1.255 up"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val out = TextAnalysis.piiDetect(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(out(1L) == ((2, 1, 0)))
    assert(out(2L) == ((0, 0, 2)))
    assert(out(3L) == ((0, 0, 0)))
    // redaction really replaces: redacted text contains no digits
    val red = TextAnalysis.piiDetect(docs, "text", "doc_id")
    val lens = red.collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(lens(1L) ==
      "mail <EMAIL> and <EMAIL> or call <PHONE>".length)
    assert(lens(2L) == "server at <IP> and <IP> up".length)
  }

  test("shardShuffle is a per-shard contiguous permutation covering all docs") {
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val out = graft.llm.Sampling.shardShuffle(docs, "doc_id", nShards = 8)
      .select("doc_id", "shuffle_key", "shard", "shard_seq").collect()
    assert(out.length == 1000)
    // bijective key below the prime: no collisions
    assert(out.map(_.getLong(1)).distinct.length == 1000)
    // shards partition the id space; within-shard seq is 1..n contiguous
    val byShard = out.groupBy(_.getInt(2))
    assert(byShard.keys.forall(s => s >= 0 && s < 8))
    byShard.values.foreach { rs =>
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // the shuffle actually breaks id order: within a shard, ascending
    // seq must not mean ascending doc_id
    val someShard = byShard.values.maxBy(_.length)
      .sortBy(_.getLong(3)).map(_.getLong(0)).toSeq
    assert(someShard != someShard.sorted)
  }

  test("semDeDup collapses identical vectors and keeps distinct ones, any clustering") {
    import spark.implicits._
    // identical vectors always share a k-means cell (deterministic
    // argmin) and have cos=1; orthogonal/negative pairs stay below the
    // threshold whatever cell they land in — so the expected output is
    // independent of where the centroids converge
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.0f, 1.0f)),
      (5L, Array(-0.7f, -0.7f)))
      .toDF("vec_id", "embedding")
    val got = Dedup.semDeDup(vecs, k = 2, iters = 1, threshold = 0.9, dim = 2)
      .orderBy("vec_id")
      .select("vec_id", "rep_id", "is_kept")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, 1L, true), (2L, 1L, false),
      (3L, 3L, true), (4L, 3L, false), (5L, 5L, true)))
  }

  test("bm25TopK matches an independently-computed score and ranks by tf/length") {
    import spark.implicits._
    val docs = Seq((1L, "apple apple banana"), (2L, "apple banana banana"),
      (3L, "cherry")).toDF("doc_id", "text")
    val queries = Seq((10L, "apple"), (20L, "banana cherry"), (30L, "mango"))
      .toDF("query_id", "qtext")
    val got = TextAnalysis.bm25TopK(docs, queries, "text", "doc_id",
        "query_id", "qtext", k = 5)
      .orderBy("query_id", "rank").as[(Long, Int, Long, Long)].collect().toSeq
    // independent replay in plain Scala doubles (same IEEE semantics)
    val n = 3L; val avg = 7.0.toDouble / n
    def idfMicro(dfT: Long): Long =
      math.floor(math.log(1.0 + (n - dfT + 0.5) / (dfT + 0.5)) * 1000000.0).toLong
    def contrib(dfT: Long, tf: Long, len: Long): Long =
      math.floor(idfMicro(dfT).toDouble *
        ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len / avg)))).toLong
    assert(got == Seq(
      (10L, 1, 1L, contrib(2, 2, 3)), // apple: d1 tf=2 beats d2 tf=1
      (10L, 2, 2L, contrib(2, 1, 3)),
      (20L, 1, 3L, contrib(1, 1, 1)), // cherry: rare term + short doc wins
      (20L, 2, 2L, contrib(2, 2, 3)), // banana tf=2
      (20L, 3, 1L, contrib(2, 1, 3)))) // mango query: no rows at all
  }

  test("temperatureSample flattens the mixture with hand-computed integer rates") {
    import spark.implicits._
    // a: 9 docs (90% share), b: 1 doc. w_milli: a=3000, b=1000, W=4000.
    // target 50% of N=10:
    //   rate_a = 500000*10*3000 / (4000*9)  = 416666 (µ) → flattened
    //   rate_b = 500000*10*1000 / (4000*1)  = 1250000 → capped, kept whole
    val df = ((1 to 9).map(i => (i * 100000L, "a")) :+ (999999L, "b"))
      .toDF("doc_id", "source")
    val got = graft.llm.Sampling.temperatureSample(df, "doc_id", "source", 500000L)
      .select("doc_id", "source", "rate_micro")
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (100000L, "a", 416666L), (200000L, "a", 416666L),
      (300000L, "a", 416666L), (400000L, "a", 416666L),
      (999999L, "b", 1000000L)))
  }

  test("gopherRules flags each Table-A1 rule independently") {
    import spark.implicits._
    val longDoc = (Seq.fill(20)("the of and that") :+ "tail").mkString(" ")
    val df = Seq(
      (1L, longDoc),              // 81 words, all rules pass
      (2L, "the of " + Seq.fill(48)("xx").mkString(" ")), // 50 words, mean len 2.02 < 3
      (3L, ("- bullet\n" * 10) + "the of and plain line"), // bullet lines but <= 0.9
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(df, "text")
      .orderBy("doc_id")
      .select("doc_id", "n_words", "word_count_ok", "word_len_ok",
        "stop_ok", "bullet_ok", "gopher_pass")
      .collect()
    // doc 1: 81 words of mean len (3*20*13+4+20*3)/81 — compute: tokens
    // "the"(3) "of"(2) "and"(3) "that"(4) ×20 = 80 tokens sum 12*20=240,
    // + "tail"(4) → 244/81 ≈ 3.01 → word_len_ok=1; ≥2 stopwords; passes
    assert(got(0).getInt(2) == 1 && got(0).getInt(3) == 1 &&
      got(0).getInt(4) == 1 && got(0).getInt(6) == 1)
    // doc 2: 50 words (count ok) but mean (3+2+48*2)/50 = 2.02 < 3
    assert(got(1).getInt(2) == 1 && got(1).getInt(3) == 0 &&
      got(1).getInt(6) == 0)
    // doc 3: 10 of 11 lines are bullets → 10/11 > 0.9 → bullet_ok=0
    assert(got(2).getInt(5) == 0 && got(2).getInt(6) == 0)
    // doc 4: empty → null metrics → null flags (never a false pass)
    assert(got(3).isNullAt(6))
  }

  test("overlapChunks: 50% overlap, stride-aligned starts, short tail") {
    import spark.implicits._
    val df = Seq((7L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (8L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.overlapChunks(df, "text", "doc_id", 4, 2)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, Int, String, Int)].collect().toSeq
    // 10 tokens, stride 2 → starts 0,2,4,6,8; size 4; tail short
    assert(got.map(_._1).forall(_ == 7L)) // empty doc emits nothing
    assert(got.map(c => (c._2, c._3, c._5)) ==
      Seq((0, 0, 4), (1, 2, 4), (2, 4, 4), (3, 6, 4), (4, 8, 2)))
    assert(got(1)._4 == "w3 w4 w5 w6")
    // every adjacent pair shares size - stride = 2 tokens
    got.sliding(2).foreach { case Seq(a, b) =>
      val at = a._4.split(" ").toSeq; val bt = b._4.split(" ").toSeq
      assert(at.drop(2) == bt.take(at.length - 2))
    case _ => ()
    }
  }

  test("dictTag: multi-length phrase matches with positions and ordered list") {
    import spark.implicits._
    val df = Seq(
      (1L, "x spark y big table spark"),
      (2L, "no match here"),
      (3L, "fast merge batch end")).toDF("doc_id", "text")
    val got = TextAnalysis.dictTag(df, "text", "doc_id",
        Seq("spark", "big table", "fast merge batch"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Int, String)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 1, "spark|big table|spark"),
      (2L, 0L, 0L, -1, ""),
      (3L, 1L, 1L, 0, "fast merge batch")))
  }

  test("domainQualityCut keeps each domain's best slice; banded rank = naive rank") {
    import spark.implicits._
    // Domain A: 4 docs, keep 50% → 2 best; domain B: 2 docs → 1 best.
    // Unigram NLL ranks common-word docs better than rare-word docs.
    val df = Seq(
      (1L, "a a a a", "A"), (2L, "a a a b", "A"),
      (3L, "a b c d", "A"), (4L, "x y z w", "A"),
      (5L, "a a b b", "B"), (6L, "q r s t", "B")).toDF("doc_id", "text", "source")
    val got = graft.llm.TextAnalysis
      .domainQualityCut(df, "text", "doc_id", "source", keepPct = 50, nBands = 4)
      .orderBy("doc_id")
      .select("doc_id", "domain", "src_rank", "n_domain", "kept")
      .as[(Long, String, Long, Long, Int)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._4, r._5)) == Seq(
      (1L, "A", 4L, 1), (2L, "A", 4L, 1), (3L, "A", 4L, 0), (4L, "A", 4L, 0),
      (5L, "B", 2L, 1), (6L, "B", 2L, 0)))
    // banded per-domain ranks must form each domain's exact 1..n
    assert(got.filter(_._2 == "A").map(_._3).sorted == Seq(1L, 2L, 3L, 4L))
    assert(got.filter(_._2 == "B").map(_._3).sorted == Seq(1L, 2L))
  }

  test("ivfpqTopK equals brute force on well-separated clusters") {
    import spark.implicits._
    // two tight clusters on orthogonal axes (dim=8, 10 vectors each);
    // the ADC scan + rerank must recover the exact in-cluster top-3
    def vec(axis: Int, i: Int): Array[Float] = {
      val a = Array.fill(8)(0.0f)
      a(axis) = 10.0f
      a((axis + 2) % 8) = 0.1f * i // deterministic jitter, breaks ties
      a
    }
    val rows = (0 until 10).map(i => (i.toLong, vec(0, i), 0)) ++
      (10 until 20).map(i => (i.toLong, vec(4, i - 10), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val qs = emb.filter(col("vec_id").isin(0L, 10L))
    val exact = Similarity.bruteForceTopK(qs, emb, k = 3)
      .select("q_vec_id", "rank", "n_vec_id").as[(Long, Int, Long)]
      .collect().toSet
    val got = Similarity.ivfpqTopK(qs, emb, k = 3, nprobe = 1, nSub = 2,
        codeK = 4, iters = 1, rerank = 2, dim = 8)
      .select("q_vec_id", "rank", "n_vec_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(got == exact)
    assert(got.size == 6) // 2 queries × top-3
  }

  test("parseWav: hand-built PCM features; chunk walk skips extras; malformed streams -> None") {
    import graft.llm.Multimodal
    def wav(samples: Seq[Short], extraChunk: Boolean = false,
        channels: Short = 1, bits: Short = 16, magic: String = "RIFF",
        truncate: Int = 0): Array[Byte] = {
      val dataLen = samples.length * 2
      val extra = if (extraChunk) 12 else 0
      val bb = java.nio.ByteBuffer.allocate(44 + extra + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(magic.getBytes("US-ASCII")).putInt(36 + extra + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels).putInt(8000).putInt(16000)
        .putShort(2).putShort(bits)
      if (extraChunk)
        bb.put("LIST".getBytes("US-ASCII")).putInt(4)
          .put("INFO".getBytes("US-ASCII"))
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array().dropRight(truncate)
    }
    // samples 100, -100, 50, 0: energy = 10000+10000+2500+0 = 22500;
    // crossings: (100,-100) and (-100,50) strictly negative products = 2
    // ((50,0) product 0 -> no crossing); duration = 4*1e6/8000 = 500us
    val ok = Multimodal.parseWav(wav(Seq[Short](100, -100, 50, 0)))
    assert(ok.contains((8000, 16, 4L, 500L, 22500L, 2L)))
    // extra LIST chunk before data: generic walk still finds data
    assert(Multimodal.parseWav(wav(Seq[Short](100, -100, 50, 0),
      extraChunk = true)).contains((8000, 16, 4L, 500L, 22500L, 2L)))
    assert(Multimodal.parseWav(wav(Seq[Short](1), magic = "RIFX")).isEmpty)
    assert(Multimodal.parseWav(wav(Seq[Short](1), channels = 2)).isEmpty)
    assert(Multimodal.parseWav(wav(Seq[Short](1), bits = 8)).isEmpty)
    // truncated data chunk (declared size overruns buffer) -> None
    assert(Multimodal.parseWav(wav(Seq[Short](1, 2), truncate = 2)).isEmpty)
    assert(Multimodal.parseWav(Array[Byte](1, 2, 3)).isEmpty)
    // fingerprint: frame energies e0=10000, e1..e64=0 -> only bit 0
    // set (e0 > e1); all-zero signal -> no bit set
    assert(Multimodal.wavFingerprint(wav(Seq[Short](100, 0, 0, 0, 0, 0)))
      .contains(1L))
    assert(Multimodal.wavFingerprint(wav(Seq[Short](0, 0, 0))).contains(0L))
  }

  test("waterfill: cap level spends the budget exactly, small domains uncapped") {
    import spark.implicits._
    // n = [10, 20, 70], B = 0.95*100 = 95: candidate levels
    // k=0: 95/3=31.67 > 10 invalid; k=1: (95-10)/2=42.5 > 20 invalid;
    // k=2: (95-30)/1=65 in [20, 70] -> c=65, allocs [10, 20, 65]
    val d = Seq(("a", 10L), ("b", 20L), ("c", 70L)).toDF("source", "n")
    val got = graft.llm.Sampling.waterfill(d, budgetFrac = 0.95)
      .orderBy("source")
      .select("source", "alloc", "capped")
      .as[(String, Double, Int)].collect().toSeq
    assert(got == Seq(("a", 10.0, 0), ("b", 20.0, 0), ("c", 65.0, 1)), s"got $got")
    assert(got.map(_._2).sum == 95.0) // budget identity Σ min(n, c) = B
  }

  test("parsePpmStream: multi-frame walk, luma per frame; garbage/truncation/overrun -> None") {
    import graft.llm.Multimodal
    def frame(px: Array[Byte], w: Int = 1, h: Int = 1): Array[Byte] =
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px
    // two 1x1 frames: luma = 299R+587G+114B
    val f1 = frame(Array[Byte](10, 20, 30))
    val f2 = frame(Array[Byte](40, 50, 60))
    val got = Multimodal.parsePpmStream(f1 ++ f2)
    assert(got.contains(IndexedSeq(
      (1, 1, 299L * 10 + 587 * 20 + 114 * 30),
      (1, 1, 299L * 40 + 587 * 50 + 114 * 60))))
    // trailing garbage after the last frame -> not a video
    assert(Multimodal.parsePpmStream(f1 ++ Array[Byte](0x42)).isEmpty)
    // second frame truncated mid-pixels -> None
    assert(Multimodal.parsePpmStream(f1 ++ f2.dropRight(1)).isEmpty)
    // frame-count bound enforced
    assert(Multimodal.parsePpmStream(f1 ++ f2, maxFrames = 1).isEmpty)
    assert(Multimodal.parsePpmStream(Array.empty[Byte]).isEmpty)
  }

  test("mmrRerank: diversity overtakes a redundant near-duplicate of the top pick") {
    import spark.implicits._
    // query 0 along axis 0. Candidates (dim=4):
    //  2: (1, .009, 0, 0) rel highest (smallest off-axis)   -> pick 1
    //  1: (1, .01, 0, 0)  near-clone of 2 (sim~1), rel #2   -> demoted
    //  3: (.7, 0, .7, 0)  less relevant but diverse         -> pick 2
    val emb = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f), 0),
      (1L, Array(1.0f, 0.01f, 0f, 0f), 0),
      (2L, Array(1.0f, 0.009f, 0f, 0f), 0),
      (3L, Array(0.7f, 0f, 0.7f, 0f), 0)).toDF("vec_id", "embedding", "label")
    val qs = emb.filter(col("vec_id") === 0L)
    val got = graft.llm.Similarity.mmrRerank(qs, emb, nCand = 3, k = 3)
      .orderBy("mmr_rank")
      .select("mmr_rank", "n_vec_id").as[(Int, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(2L, 3L, 1L), s"got $got")
    // plain relevance order would have been 2, 1, 3 — diversity moved 3 up
    val rel = graft.llm.Similarity.bruteForceTopK(qs, emb, k = 3)
      .orderBy("rank").select("n_vec_id").as[Long].collect().toSeq
    assert(rel == Seq(2L, 1L, 3L))
  }

  test("mmrRerank frees superseded checkpoints without touching a bystander") {
    import spark.implicits._
    // A concurrent query's persisted RDD must survive mmrRerank's
    // freeing discipline (ADVICE r11: the old getPersistentRDDs
    // set-diff could unpersist it), and the iteration checkpoints
    // themselves must NOT accumulate: at exit only the candidate
    // table, the final accumulator, and the bystander may hold
    // storage (a regression here means checkpointRdd stopped
    // resolving the LogicalRDD leaf and the unpersist went dead).
    val sc = spark.sparkContext
    val bystander = sc.parallelize(1 to 10, 1).persist()
    bystander.count()
    val before = sc.getPersistentRDDs.keySet
    assert(before.nonEmpty)
    val emb = (0 until 12).map(i =>
        (i.toLong, Array.tabulate(4)(j => ((i * 7 + j * 3) % 10).toFloat), 0))
      .toDF("vec_id", "embedding", "label")
    val qs = emb.filter(col("vec_id") < 2L)
    graft.llm.Similarity.mmrRerank(qs, emb, nCand = 8, k = 6).collect()
    val after = sc.getPersistentRDDs.keySet
    assert(after.contains(bystander.id),
      s"bystander persisted RDD ${bystander.id} was unpersisted: $after")
    assert(bystander.count() == 10)
    // cands + final `all` (k-1 superseded iteration checkpoints freed)
    val leaked = (after -- before).size
    assert(leaked <= 2, s"expected <=2 surviving checkpoints, got $leaked")
    bystander.unpersist()
  }

  test("weightedSample: integer exponential-race priorities, weight pulls docs in") {
    import spark.implicits._
    // poly_hash("a")=97, "b"=98, "c"=99; priority = hash*1e6 div weight.
    // With weight, doc 3's huge weight wins despite the largest hash.
    val df = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 99L))
      .toDF("doc_id", "text", "w")
    val got = graft.llm.Sampling.weightedSample(df, "text", "doc_id", "w", k = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((3L, 99L, 1000000L), (1L, 1L, 97000000L)))
  }

  test("domainCap keeps the cap lowest-content-hash docs per domain") {
    import spark.implicits._
    val df = Seq((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2"))
      .toDF("doc_id", "text", "source")
    val got = graft.llm.Sampling.domainCap(df, "text", "doc_id", "source", cap = 1)
      .select("doc_id", "source", "domain_rank")
      .as[(Long, String, Int)].collect().toSet
    // d1: hash("a")=97 < hash("b")=98 → doc 1 keeps the slot
    assert(got == Set((1L, "d1", 1), (3L, "d2", 1)))
  }

  test("filterAttrition: cascade vs marginal counts on a hand fixture") {
    import spark.implicits._
    val df = Seq(
      (1L, 10),  // passes both
      (2L, 3),   // fails r1 only → removed at stage 1
      (3L, 30),  // passes r1, fails r2 → removed at stage 2
      (4L, 2)    // fails both → removed at stage 1; marginal for both
    ).toDF("doc_id", "v")
    val got = TextAnalysis.filterAttrition(df, Seq(
        "v_min_5" -> (col("v") >= 5),
        "v_max_20" -> (col("v") <= 20)))
      .orderBy("stage")
      .as[(Int, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1, "v_min_5", 4L, 2L, 2L, 2L),
      (2, "v_max_20", 2L, 1L, 1L, 1L)))
  }

  test("centroidOutliers: integer micro-unit fence flags the far vector only") {
    import spark.implicits._
    // label 0 vectors: 0,0,0,4 → centroid 1e6 micro; d² = 1e12 ×3, 9e12
    // mean = 3e12, fence = 200·mean div 100 = 6e12 → only the 9e12 vector
    val df = Seq(
      (1L, Array(0.0f), 0), (2L, Array(0.0f), 0),
      (3L, Array(0.0f), 0), (4L, Array(4.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = graft.llm.Similarity
      .centroidOutliers(df, "embedding", "vec_id", "label", factorPct = 200)
      .orderBy("vec_id")
      .as[(Long, Int, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 0, 1000000000000L, 3000000000000L, false),
      (2L, 0, 1000000000000L, 3000000000000L, false),
      (3L, 0, 1000000000000L, 3000000000000L, false),
      (4L, 0, 9000000000000L, 3000000000000L, true)))
  }

  test("domainMixtureStats aggregates doc/char/token/NLL mass per stratum") {
    import spark.implicits._
    val df = Seq(
      (1L, "web", "en", "x x x y"),
      (2L, "web", "en", "y z"),
      (3L, "book", "de", "")).toDF("doc_id", "source", "lang", "text")
    val got = TextAnalysis.domainMixtureStats(df, "text", "doc_id",
        Seq("source", "lang"))
      .orderBy("source", "lang")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("book", "de", 1L, 0L, 0L, 0L),
      ("web", "en", 2L, 10L, 6L, 3L * 693147L + 2L * 1098612L + 1791759L)))
  }

  test("entityDensity: capitalized mid-sentence counts; sentence starts don't") {
    import spark.implicits._
    // "Paris" after '.' = sentence start (not counted); "Bob" counted;
    // doc-initial "Alice" not counted.
    val docs = Seq((1L, "Alice met Bob in town. Paris was far"),
      (2L, "all lower case here")).toDF("doc_id", "text")
    val got = TextAnalysis.entityDensity(docs, "text", "doc_id")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 8, 1), (2L, 4, 0)))
  }

  test("cdcChunks: boundary insertion re-chunks locally; identical chunks share signatures") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f")).toDF("doc_id", "text")
    val got = TextAnalysis.cdcChunks(docs, "text", "doc_id", mask = 8)
      .orderBy("doc_id", "chunk_idx").collect()
    // identical docs → identical chunking → every chunk has a twin
    assert(got.nonEmpty && got.forall(_.getLong(5) == 2L),
      s"expected every chunk duplicated across the twin docs: ${got.mkString(";")}")
    // word positions are chunk-relative: the same words after a prefix
    // shift hash to the same signatures once a boundary resyncs them
    val sigs1 = got.filter(_.getLong(0) == 1L).map(_.getLong(4)).toSeq
    val sigs2 = got.filter(_.getLong(0) == 2L).map(_.getLong(4)).toSeq
    assert(sigs1 == sigs2)
  }

  test("scalarQuantize8: endpoints code to 0/255, constant dim codes to 0") {
    import spark.implicits._
    val emb = Seq((1L, Seq(0.0f, 5.0f, 7.0f)), (2L, Seq(2.0f, 5.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.scalarQuantize8(emb)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1)))
    // dim0 range [0,2]: 0→0, 2→255(clamped); dim1 constant → 0;
    // dim2 range [3,7]: 7→255, 3→0
    assert(got.toSeq == Seq((1L, Seq(0, 0, 255)), (2L, Seq(255, 0, 0))))
  }

  test("waterfill rejects budgetFrac outside (0, 1]") {
    import spark.implicits._
    val d = Seq(("a", 10L), ("b", 20L)).toDF("source", "n")
    intercept[IllegalArgumentException] {
      graft.llm.Sampling.waterfill(d, budgetFrac = 1.5)
    }
    intercept[IllegalArgumentException] {
      graft.llm.Sampling.waterfill(d, budgetFrac = 0.0)
    }
  }

  test("cdcChunks property: chunks exactly partition every doc's token stream") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // random word streams (incl. repeats, 1-char words, empty docs)
    val wordGen = Gen.frequency(
      5 -> Gen.choose('a', 'f').map(_.toString),
      3 -> Gen.listOfN(3, Gen.choose('a', 'z')).map(_.mkString),
      1 -> Gen.const("x"))
    val docGen = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, wordGen))
    val docs = (1 to 60).flatMap { i =>
      docGen(Gen.Parameters.default.withSize(12), Seed(i.toLong))
        .map(ws => (i.toLong, ws.mkString(" ")))
    }
    val df = docs.toDF("doc_id", "text")
    val chunks = TextAnalysis.cdcChunks(df, "text", "doc_id")
      .collect().groupBy(_.getLong(0))
    docs.foreach { case (id, text) =>
      val nToks = text.split(" ").count(_.nonEmpty)
      val cs = chunks.getOrElse(id, Array.empty).sortBy(_.getInt(1))
      // partition: word counts sum to the doc's token count
      assert(cs.map(_.getLong(3)).sum == nToks.toLong,
        s"doc $id: chunk words ${cs.map(_.getLong(3)).sum} != $nToks")
      // contiguity: chunk i starts where chunk i-1 ended, from 0
      val starts = cs.map(_.getLong(2))
      val lens = cs.map(_.getLong(3))
      val expectedStarts = lens.scanLeft(0L)(_ + _).init
      assert(starts.toSeq == expectedStarts.toSeq,
        s"doc $id: starts ${starts.toSeq} != ${expectedStarts.toSeq}")
      // chunk indexes are dense from 0
      assert(cs.map(_.getInt(1)).toSeq == cs.indices.map(identity))
    }
  }

  test("spanCorruption: splicing targets back into the input reconstructs every document") {
    // the denoising-pair CONTRACT: input keeps unmasked tokens with one
    // sentinel per span; target holds exactly the hidden tokens behind
    // matching sentinels — so splicing target spans into the input at
    // their sentinels must reproduce the original token stream exactly.
    val docs = Tables.load(spark, sfDir, "documents")
    val text = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextAnalysis.spanCorruption(docs, "text", "doc_id").collect()
    assert(rows.nonEmpty)
    var maskedTotal = 0L
    rows.foreach { r =>
      val (id, nTok, nMask, nSpans) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))
      val inToks = r.getString(4).split(" ").filter(_.nonEmpty)
      val tgToks = r.getString(5).split(" ").filter(_.nonEmpty)
      def isSent(t: String) = t.startsWith("<extra_id_")
      // sentinels dense 0..n_spans-1 and identical across both sides
      val want = (0 until nSpans).map(k => s"<extra_id_$k>")
      assert(inToks.filter(isSent).toSeq == want, s"doc $id input sentinels")
      assert(tgToks.filter(isSent).toSeq == want, s"doc $id target sentinels")
      // target spans keyed by sentinel
      val spans = scala.collection.mutable.Map.empty[Int, Vector[String]]
      var cur = -1
      tgToks.foreach { t =>
        if (isSent(t)) cur = t.stripPrefix("<extra_id_").stripSuffix(">").toInt
        else spans(cur) = spans.getOrElse(cur, Vector.empty) :+ t
      }
      assert(spans.values.map(_.size).sum == nMask, s"doc $id masked count")
      // splice and compare
      val rebuilt = inToks.flatMap { t =>
        if (isSent(t))
          spans(t.stripPrefix("<extra_id_").stripSuffix(">").toInt)
        else Vector(t)
      }
      val orig = text(id).split(" ").filter(_.nonEmpty)
      assert(rebuilt.toSeq == orig.toSeq, s"doc $id reconstruction")
      assert(orig.length == nTok)
      maskedTotal += nMask
    }
    // the corruption actually fires (≈1/7 of positions start a span)
    assert(maskedTotal > 0)
  }

  test("contaminationFraction: holdout shingles found in train are counted per doc") {
    import spark.implicits._
    // force the split via bounds on a tiny modulus-free fixture is
    // fiddly — instead run on real sf data and cross-check one
    // invariant: contamination ∈ [0,1] and n_in_train <= n_shingles
    val docs = Tables.load(spark, sfDir, "documents")
    val rows = graft.llm.Sampling.contaminationFraction(docs, "text", "doc_id",
      Seq("train" -> 80, "val" -> 90, "test" -> 100), holdout = "test",
      trainSplit = "train")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
    assert(rows.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    // the report covers EVERY holdout document — including those with
    // fewer than shingleN tokens, which surface as (0, 0, 0.0) rather
    // than being dropped (ADVICE r8)
    val nHoldout = graft.llm.Sampling.splitByHash(docs, "text",
      Seq("train" -> 80, "val" -> 90, "test" -> 100), 100)
      .filter(col("split") === "test").count()
    assert(rows.length.toLong == nHoldout)
  }

  test("dpoPairs: packed-key argmax/argmin picks TTR extremes, ties to lowest doc_id") {
    import spark.implicits._
    // nPrompts=1 → one prompt group. TTR micro-scores: doc0 "a b c" =
    // 1000000, doc1 "a a a a" = 250000, doc2 "a b a b" = 500000,
    // doc3 "x y z" = 1000000 (ties doc0 → smaller doc_id is chosen)
    val docs = Seq((0L, "a b c"), (1L, "a a a a"), (2L, "a b a b"),
      (3L, "x y z")).toDF("doc_id", "text")
    val got = graft.llm.Sampling.dpoPairs(docs, "text", "doc_id", nPrompts = 1)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)) == ((4L, 0L, 1L, 1000000L, 250000L, 750000L)))
    // rejected side ties also break to the lowest doc_id
    val tied = Seq((0L, "a a"), (1L, "b b"), (2L, "c d e"))
      .toDF("doc_id", "text")
    val r2 = graft.llm.Sampling.dpoPairs(tied, "text", "doc_id", nPrompts = 1)
      .collect().head
    assert((r2.getLong(2), r2.getLong(3)) == ((2L, 0L)))
    // zero margin (all candidates equal) produces NO pair
    val flat = Seq((0L, "a b"), (1L, "c d")).toDF("doc_id", "text")
    assert(graft.llm.Sampling.dpoPairs(flat, "text", "doc_id", nPrompts = 1)
      .count() == 0L)
    // a doc_id past the packed-key headroom fails LOUDLY (never a
    // silent drop that could mis-pair the rest of the prompt group)
    val big = Seq((10000000000L, "a b c"), (1L, "a a"))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      graft.llm.Sampling.dpoPairs(big, "text", "doc_id", nPrompts = 1)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("headroom")))
    // a ZERO-TOKEN doc with a bad id never enters the packed keys, so
    // it must NOT trip the guard (the guard sits after the token
    // filter, mirroring the oracle's WHERE len(ws) > 0)
    val zeroTok = Seq((10000000000L, ""), (1L, "a a"), (2L, "a b"))
      .toDF("doc_id", "text")
    assert(graft.llm.Sampling.dpoPairs(zeroTok, "text", "doc_id",
      nPrompts = 1).count() == 1L)
  }

  test("vocabCoverage: top-V tie-break unit-asc; OOV counts instances; short docs zero") {
    import spark.implicits._
    // corpus bigram counts: "a b"=2, "b a"=2, "a c"=1; V=1 → the
    // count tie breaks unit-ascending, so vocab = {"a b"}
    val docs = Seq((0L, "a b a b"), (1L, "b a c"), (2L, "x"))
      .toDF("doc_id", "text")
    def rows(v: Int) = graft.llm.TextAnalysis
      .vocabCoverage(docs, "text", "doc_id", vocabSize = v)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows(1).toSeq == Seq(
      (0L, 3L, 1L, 2L, 1L, 333333L),   // "b a" OOV once of 3 spans
      (1L, 2L, 2L, 2L, 2L, 1000000L),  // both spans OOV
      (2L, 0L, 0L, 0L, 0L, 0L)))       // <2 tokens → explicit zero row
    assert(rows(2).toSeq == Seq(       // V=2 admits "b a" as well
      (0L, 3L, 0L, 2L, 0L, 0L),
      (1L, 2L, 1L, 2L, 1L, 500000L),
      (2L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("calibrationBins: hand probe lands rows in exact bins with exact gaps") {
    import spark.implicits._
    // weights=[-1] → pred = clamp((2 - v)/4, 0, 1) for 1-dim vec [v]
    val emb = Seq(
      (Array(2.0), 0),   // pred 0.00 → bin 0, negative: gap 0
      (Array(-2.0), 1),  // pred 1.00 → micro 1000000 clamps to bin 9
      (Array(0.0), 1),   // pred 0.50 → bin 5 ┐ mean 500000, 1 of 2
      (Array(0.0), 0),   //                   ┘ positive: gap 0
      (Array(1.0), 1))   // pred 0.25 → bin 2, positive: gap 750000
      .toDF("embedding", "label")
    val got = graft.llm.Similarity.calibrationBins(emb, "embedding", "label",
        weights = Seq(-1.0), posMin = 1)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, 1L, 0L, 0L, 0L, 0L),
      (2L, 1L, 250000L, 1000000L, 750000L, 750000L),
      (5L, 2L, 500000L, 500000L, 0L, 0L),
      (9L, 1L, 1000000L, 1000000L, 0L, 0L)))
  }

  test("sourceOverlapMatrix: zero-overlap pairs get explicit n_shared=0 rows") {
    import spark.implicits._
    // a,b share the shingle "alpha beta gamma"; c shares nothing with
    // either — all THREE pairs must appear, the c pairs as zero rows
    val docs = Seq(
      ("a", "alpha beta gamma delta"),
      ("b", "alpha beta gamma epsilon"),
      ("c", "zeta eta theta iota")).toDF("source", "text")
    val m = Dedup.sourceOverlapMatrix(docs, "text", "source", shingleN = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(m.size == 3)
    assert(m(("a", "b")).getLong(2) == 1L)
    for (p <- Seq(("a", "c"), ("b", "c"))) {
      assert(m(p).getLong(2) == 0L)
      assert(m(p).getDouble(5) == 0.0)
    }
  }

  test("fimTransform: sections splice back to the original tokens; PSM/SPM by id parity") {
    val docs = Tables.load(spark, sfDir, "documents")
    val rows = graft.llm.TextAnalysis.fimTransform(docs, "text", "doc_id")
      .collect()
    val text = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    var applied = 0
    rows.foreach { r =>
      val (id, nTok, mode) = (r.getLong(0), r.getLong(1), r.getString(2))
      val (np, nm, ns) =
        (r.getLong(3).toInt, r.getLong(4).toInt, r.getLong(5).toInt)
      val toks = r.getString(6).split(" ").filter(_.nonEmpty).toVector
      val orig = text(id).split(" ").filter(_.nonEmpty).toVector
      if (mode == "none") assert(toks == orig, s"doc $id passthrough")
      else {
        applied += 1
        assert(np + nm + ns == nTok.toInt, s"doc $id counts")
        assert((id % 2 == 0) == (mode == "psm"), s"doc $id mode parity")
        // sentinels sit exactly where the section counts place them
        val (pre, suf, mid) = if (mode == "psm") {
          assert(toks(0) == "<PRE>" && toks(1 + np) == "<SUF>" &&
            toks(2 + np + ns) == "<MID>", s"doc $id sentinels")
          (toks.slice(1, 1 + np), toks.slice(2 + np, 2 + np + ns),
            toks.slice(3 + np + ns, 3 + np + ns + nm))
        } else {
          assert(toks(0) == "<SUF>" && toks(1 + ns) == "<PRE>" &&
            toks(2 + ns + np) == "<MID>", s"doc $id sentinels")
          (toks.slice(2 + ns, 2 + ns + np), toks.slice(1, 1 + ns),
            toks.slice(3 + ns + np, 3 + ns + np + nm))
        }
        assert(pre ++ mid ++ suf == orig, s"doc $id reconstruction")
      }
    }
    assert(applied > 0)
    // edge token counts the corpus (10-99 tokens) never exercises:
    // n=0/1 always pass through (even under an applying id), n=2 is
    // the minimal applicable doc and still splices
    import spark.implicits._
    val tiny = Seq((0L, ""), (10L, "a"), (20L, "a b"))
      .toDF("doc_id", "text")
    val t = graft.llm.TextAnalysis.fimTransform(tiny, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(6)))
    assert(t(0) == ((0L, 0L, "none", "")))
    assert(t(1) == ((10L, 1L, "none", "a")))
    assert(t(2)._3 == "psm" && t(2)._4.split(" ").count(_.nonEmpty) == 5)
  }

  test("corpusDriftPsi: identical snapshots score exactly 0; a full band shift is positive and formula-exact") {
    import spark.implicits._
    def text(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val ref = Seq(("same", text(15)), ("shift", text(15)))
      .toDF("src", "text")
    val cur = Seq(("same", text(15)), ("shift", text(95)))
      .toDF("src", "text")
    val got = graft.llm.TextAnalysis
      .corpusDriftPsi(ref, cur, "text", "src")
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // replay of the pinned contribution formula for the shifted source
    // (buckets {1, 9} observed, one doc per half)
    def contrib(a: Long, b: Long, ta: Long, tb: Long, k: Long): Long = {
      val pn = (a + 1).toDouble; val qn = (b + 1).toDouble
      val pd = (ta + k).toDouble; val qd = (tb + k).toDouble
      val lnM = math.floor(math.log((pn * qd) / (qn * pd)) * 1000000.0)
      math.floor((pn / pd - qn / qd) * lnM).toLong
    }
    val expShift = contrib(1, 0, 1, 1, 2) + contrib(0, 1, 1, 1, 2)
    assert(expShift > 400000L) // a total band swap is a LARGE psi
    assert(got.toSeq == Seq(
      ("same", 1L, 1L, 1L, 0L),          // p == q in every bucket → 0
      ("shift", 1L, 1L, 2L, expShift)))
  }

  test("retrievalMetrics: hand ranking with cosine ties → exact DCG/MRR/recall; lone-label guard") {
    import spark.implicits._
    // all 1-D unit vectors → every cosine is 1.0, so rank = id order;
    // query 0 (label 0) sees corpus 1,2,3,4,5,50 → top-3 = 1,2,3 with
    // relevance 1,0,1; query 50 (label 9) has no same-label peer
    val emb = Seq(
      (0L, Array(1.0f), 0), (1L, Array(1.0f), 0), (2L, Array(1.0f), 1),
      (3L, Array(1.0f), 0), (4L, Array(1.0f), 1), (5L, Array(1.0f), 1),
      (50L, Array(1.0f), 9))
      .toDF("vec_id", "embedding", "label")
    val got = graft.llm.Similarity.retrievalMetrics(emb, qMod = 50, k = 3)
      .orderBy("q_vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    // discounts(3) = [1000000, 630929, 500000]; dcg = ranks 1+3,
    // idcg = prefix(min(n_rel=2, 3)) = 1630929, frr = 1, recall = 2/2
    assert(got.toSeq == Seq(
      (0L, 2L, 2L, 1500000L, 1630929L,
        1500000000000L / 1630929L, 1000000L, 1000000L),
      (50L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("retrievalMetrics: metric invariants hold on the real embeddings table") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val nQueries = emb.filter(pmod(col("vec_id"), lit(50L)) === 0).count()
    val rows = graft.llm.Similarity.retrievalMetrics(emb, qMod = 50, k = 10)
      .collect()
    assert(rows.length == nQueries) // one row per query, none dropped
    rows.foreach { r =>
      val (nRel, hits, dcg, idcg) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val (ndcg, mrr, recall) = (r.getLong(5), r.getLong(6), r.getLong(7))
      assert(hits <= math.min(10L, nRel))
      assert(dcg <= idcg) // binary gains: best placement bounds any
      for (m <- Seq(ndcg, mrr, recall)) assert(m >= 0L && m <= 1000000L)
      assert((mrr > 0) == (hits > 0))
    }
  }

  test("embedAnisotropy: isotropic 2-D cloud PR=2, collapsed PR=1, zero-variance guard") {
    import spark.implicits._
    val emb = Seq(
      (Array(1.0f, 0.0f), 0), (Array(-1.0f, 0.0f), 0),
      (Array(0.0f, 1.0f), 0), (Array(0.0f, -1.0f), 0),
      (Array(1.0f, 0.0f), 1), (Array(-1.0f, 0.0f), 1),
      (Array(0.5f, 0.0f), 2), (Array(0.5f, 0.0f), 2))
      .toDF("embedding", "label")
    val got = graft.llm.Similarity
      .embedAnisotropy(emb, "embedding", "label", dim = 2)
      .orderBy("label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 4L, 2000000L),   // variance even over both axes → PR 2
      (1L, 2L, 1000000L),   // all variance on one axis → PR 1
      (2L, 2L, 0L)))        // constant vectors: fro=0 guard row
    // null vectors and null components fail LOUDLY — a silently
    // dropped row would desync n from the oracle's count(*)
    val withNullVec = Seq((Some(Array(1.0f, 0.0f)), 0), (None, 0))
      .toDF("embedding", "label")
    assertThrows[Exception] {
      graft.llm.Similarity
        .embedAnisotropy(withNullVec, "embedding", "label", dim = 2)
        .collect()
    }
  }

  test("embedAnisotropy two-level tiling is bit-identical to the single level") {
    import spark.implicits._
    // d=4, w=2: 2 diagonal OuterMoments triangles + 1 CrossMoments
    // rectangle must reproduce the single-level rows exactly —
    // including all intermediate moment sums, which the final
    // (tr, fro, pr) columns fold in. Asymmetric values so any block
    // mis-mapping (idx offset, transposed rectangle) changes a sum.
    val emb = (0 until 12).map(i =>
        (Array.tabulate(4)(j => ((i * 5 + j * 7) % 11 - 5) / 3.0f), i % 3))
      .toDF("embedding", "label")
    val single = graft.llm.Similarity
      .embedAnisotropy(emb, "embedding", "label", dim = 4)
      .orderBy("label").collect().toSeq
    val two = graft.llm.Similarity
      .embedAnisotropy(emb, "embedding", "label", dim = 4,
        subspaceWidth = Some(2))
      .orderBy("label").collect().toSeq
    assert(single == two, s"single=$single two=$two")
  }

  test("embedAnisotropy: fro_cov past BIGINT fails loudly, ANSI on or off") {
    import spark.implicits._
    // |x| = 3000 sits at the edge of the documented domain: the q·q
    // products (9·10¹⁸) still fit BIGINT so OuterMoments passes, but
    // the cs² Frobenius sum (~10²⁶) exceeds Long.MaxValue — the
    // guarded cast must raise, never return a silent null pr_micro
    val hot = Seq(
      (Array(3000.0f, 3000.0f), 0), (Array(-3000.0f, -3000.0f), 0))
      .toDF("embedding", "label")
    val ex = intercept[Exception] {
      graft.llm.Similarity
        .embedAnisotropy(hot, "embedding", "label", dim = 2)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m =>
      m.contains("BIGINT") || m.contains("multiplyExact") ||
        m.contains("overflow") || m.contains("Overflow")))
  }

  test("guard requires: dpoPairs margin >= 1, calibrationBins divisor bins") {
    import spark.implicits._
    val docs = Seq((0L, "a b"), (1L, "c")).toDF("doc_id", "text")
    // margin 0 would pair a fully score-tied doc with itself
    assertThrows[IllegalArgumentException] {
      graft.llm.Sampling.dpoPairs(docs, "text", "doc_id", nPrompts = 1,
        minMarginMicro = 0L)
    }
    val emb = Seq((Array(0.0), 0)).toDF("embedding", "label")
    // bins=7 doesn't divide 10^6 — truncated width would make the
    // clamped last bin wider than the rest
    assertThrows[IllegalArgumentException] {
      graft.llm.Similarity.calibrationBins(emb, "embedding", "label",
        weights = Seq(-1.0), posMin = 1, bins = 7)
    }
    // a divisor that is NOT 10 stays legal (8 divides 10^6)
    assert(graft.llm.Similarity.calibrationBins(emb, "embedding", "label",
      weights = Seq(-1.0), posMin = 1, bins = 8).count() == 1L)
  }
}
