package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.PolyHash

/** Deduplication operators for training-data pipelines (SURVEY.md
  * §2.11): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
  * cosine. Every algorithm is expressed as shuffles on bounded keys
  * (hash buckets, shingles, LSH bands) — never an O(n²) cross join —
  * so the same plans hold at 100 TB. The brute-force forms live in
  * Similarity and are for oracles/tests only.
  */
object Dedup {

  // ---------------------------------------------------------------
  // Exact dedup: one hash-shuffle on md5(text); map-side partial agg.
  /** Per distinct content hash: the representative (min id) and the
    * duplicate count.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  // ---------------------------------------------------------------
  // Shingling
  /** Distinct word n-gram shingles of a text column (array column). */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    val grams = transform(
      sequence(lit(0), greatest(size(toks) - n, lit(-1))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    array_distinct(when(size(toks) >= n, grams).otherwise(array()))
  }

  /** (doc_id, shingles array) pairs. */
  def shingleSets(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("doc_id"), shingles(col(textCol), n).as("sh"))

  // ---------------------------------------------------------------
  // MinHash + LSH
  /** Deterministic MinHash parameters: numHashes pairs (a, b) for
    * h_i(x) = (a_i * x + b_i) mod P with P = 2^31 - 1. Derived from a
    * fixed splitmix64 stream — stable across runs and cluster nodes.
    */
  object MinHashParams {
    val P: Long = 2147483647L // 2^31 - 1 (prime)
    private def splitmix(seed: Long): Long = {
      var z = seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def a(i: Int): Long = Math.floorMod(splitmix(2 * i), P - 1) + 1
    def b(i: Int): Long = Math.floorMod(splitmix(2 * i + 1), P)
  }

  /** MinHash signatures: one row per doc, `numHashes` min-values.
    * Plan: explode shingles (narrow), hash each once (codegen'd
    * PolyHash), then a single shuffle on doc_id with map-side partial
    * min for all hash functions at once.
    */
  def minhashSignatures(sets: DataFrame, numHashes: Int): DataFrame = {
    // hash each shingle ONCE in a projection — aggregate expressions
    // get no common-subexpression elimination, so folding PolyHash
    // into each of the 64 min()s would re-hash the string 64× per row
    val minCols = (0 until numHashes).map { i =>
      min((col("h") * MinHashParams.a(i) + MinHashParams.b(i)) % MinHashParams.P)
        .as(s"mh$i")
    }
    val exploded = sets.select(col("doc_id"), explode(col("sh")).as("sh"))
      .select(col("doc_id"), PolyHash(col("sh")).as("h")) // < 1e9+7 < P
    exploded.groupBy("doc_id")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"mh$i")): _*).as("sig"))
  }

  /** LSH candidate pairs from banded signatures: `bands` bands of
    * `rowsPerBand` values; docs sharing any band bucket are candidates.
    * The shuffle key is (band index, exact band value) — collision-free
    * because the two sub-values are packed into one long.
    */
  def lshCandidates(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    require(rowsPerBand == 2, "band packing below assumes r=2")
    val bandCols = transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        (element_at(col("sig"), b * rowsPerBand + 1) * MinHashParams.P
          + element_at(col("sig"), b * rowsPerBand + 2)).as("bucket")))
    val banded = sigs.select(col("doc_id"), explode(bandCols).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val l = banded.alias("l"); val r = banded.alias("r")
    l.join(r, col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket")
        && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("ia"), col("r.doc_id").as("ib"))
      .distinct()
  }

  /** Exact Jaccard for given candidate pairs, by joining back the
    * shingle sets (arrays bounded by doc length, so executor-safe).
    */
  def verifyJaccard(pairs: DataFrame, sets: DataFrame): DataFrame = {
    val a = sets.select(col("doc_id").as("ia"), col("sh").as("sh_a"))
    val b = sets.select(col("doc_id").as("ib"), col("sh").as("sh_b"))
    pairs.join(a, "ia").join(b, "ib")
      .select(col("ia"), col("ib"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band →
    * candidate join → exact-Jaccard verify ≥ threshold.
    * 64 hashes as 32 bands × 2 ⇒ P(candidate | j) = 1-(1-j²)^32:
    * ≥ 0.9999 at j = 0.5, so verified output matches the exact
    * all-pairs answer with overwhelming probability — at a fraction of
    * the cost (no O(n²) stage anywhere).
    */
  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sets = shingleSets(df, textCol, idCol, shingleN)
    val sigs = minhashSignatures(sets, 64)
    val cands = lshCandidates(sigs, bands = 32, rowsPerBand = 2)
    verifyJaccard(cands, sets)
      .filter(col("jaccard") >= threshold)
  }

  // ---------------------------------------------------------------
  // Near-dup clustering: connected components over the pair graph →
  // (doc_id, cluster_id = min doc_id in component). This is the final
  // step of a production dedup pipeline (keep one representative per
  // component, drop the rest).
  //
  // Algorithm: iterative min-label propagation to a fixpoint. Each
  // round is one shuffle join; rounds needed = graph diameter, which
  // for near-dup graphs is tiny (dup clusters are cliques-ish). For
  // adversarially long chains at 100 TB, swap in the large-star/
  // small-star variant (Kiveris et al., "Connected Components in
  // MapReduce and Beyond") — same join primitives, O(log n) rounds.
  def nearDupClusters(pairs: DataFrame, maxIter: Int = 20,
      driverEdgeThreshold: Long = 5000000L): DataFrame = {
    val spark = pairs.sparkSession
    // cache: the pair pipeline (shingle→minhash→LSH→verify) feeds the
    // count probe AND the collect/loop — don't run it twice
    val fwd = pairs.select(col("ia").as("a"), col("ib").as("b")).cache()

    // The pair graph is orders of magnitude smaller than the corpus
    // (only near-dup docs appear): even a 100 TB corpus with a 1%
    // dup rate yields an edge list that fits comfortably on the
    // driver. Below the threshold, a driver-side union-find computes
    // components in one collect instead of ~diameter Spark rounds;
    // above it, fall back to distributed min-label propagation.
    val edgeCount = fwd.count()
    if (edgeCount <= driverEdgeThreshold) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      fwd.collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        parent.getOrElseUpdate(a, find(a)); parent.getOrElseUpdate(b, find(b))
      }
      val rows = parent.keys.toSeq.sorted.map(x => Row(x, find(x)))
      return spark.createDataFrame(
        spark.sparkContext.parallelize(rows),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("cluster_id",
            org.apache.spark.sql.types.LongType, nullable = false))))
    }

    val edges = fwd.union(fwd.select(col("b").as("a"), col("a").as("b")))
      .distinct().cache()
    var labels = edges.select(col("a").as("doc_id")).distinct()
      .withColumn("label", col("doc_id")).cache()
    // labels only ever decrease under min-propagation, so the label
    // sum is a strict monotone: unchanged sum ⟺ fixpoint. One cheap
    // aggregate per round instead of a change-detection join.
    var prevSum = Long.MinValue
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // each node adopts min(own label, neighbors' labels)
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("doc_id", "b"), "b")
        .groupBy(col("a").as("doc_id"))
        .agg(min("label").as("nlabel"))
      // cache() per round keeps the data hot; note localCheckpoint was
      // measured here and is pathological under AQE (eager
      // materialization per round cost 10× more than the lineage
      // re-planning it saves at these iteration counts)
      val next = labels.join(viaNeighbors, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .cache()
      val s = next.agg(sum("label")).head().getLong(0)
      labels.unpersist()
      labels = next
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    edges.unpersist()
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** End-to-end dedup: drop every document that shares a near-dup
    * cluster with a smaller doc_id (and exact duplicates implicitly —
    * identical texts have Jaccard 1). Returns the kept rows of `df`.
    */
  def dropNearDups(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val clusters = nearDupClusters(
      minhashNearDups(df, textCol, idCol, shingleN, threshold))
    val losers = clusters.filter(col("cluster_id") =!= col("doc_id"))
      .select(col("doc_id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  // ---------------------------------------------------------------
  // Exact n-gram Jaccard via inverted index (no LSH, no cross join):
  // explode shingles, self-join on the shingle (the inverted-index
  // bucket), count common shingles per pair, derive Jaccard.
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int, threshold: Double): DataFrame = {
    val sets = shingleSets(df, textCol, idCol, shingleN)
    // Inverted-index count join: index keyed by an 8-byte shingle hash
    // (same result — 64-bit collisions negligible — at ~10× less
    // shuffle bytes than shingle strings); set size rides along so the
    // size-ratio filter prunes inside the join (J >= t forces
    // t <= |A|/|B| <= 1/t — exact, no recall loss); common-shingle
    // counts come from a map-side-combined groupBy, so per-pair work
    // is a counter bump, never an array intersection.
    // (A PPJoin-style rarest-prefix index was measured here and LOSES
    // on this workload: with a ~1k-shingle vocabulary even the rare
    // prefixes have high document frequency, and the array-verify on
    // the candidate flood costs more than counting over the full
    // index. On natural text with a long-tail vocabulary, prefix
    // filtering is the right scale path; with dense vocabularies,
    // MinHash-LSH (minhashNearDups) is.)
    val inv = sets.select(col("doc_id"), size(col("sh")).as("n_sh"),
        explode(col("sh")).as("s"))
      .select(col("doc_id"), col("n_sh"), xxhash64(col("s")).as("h"))
    val l = inv.alias("l"); val r = inv.hint("shuffle_hash").alias("r")
    val tInv = lit(1.0 / threshold)
    val common = l.join(r, col("l.h") === col("r.h")
        && col("l.doc_id") < col("r.doc_id")
        && col("r.n_sh") <= col("l.n_sh") * tInv
        && col("l.n_sh") <= col("r.n_sh") * tInv)
      .groupBy(col("l.doc_id").as("ia"), col("r.doc_id").as("ib"))
      .agg(count(lit(1)).as("common"),
        first(col("l.n_sh")).as("na"), first(col("r.n_sh")).as("nb"))
    common
      .select(col("ia"), col("ib"),
        (col("common").cast("double") / (col("na") + col("nb") - col("common")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---------------------------------------------------------------
  // SimHash: 30-bit signatures from token polynomial hashes.
  // One explode + one shuffle on doc_id; the 30 bit-sums are computed
  // as parallel aggregate expressions (single pass, codegen'd).
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val bits = 30 // PolyHash < 2^30, so higher bits carry no signal
    val tok = df.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .withColumn("h", PolyHash(col("w")))
    val sums = (0 until bits).map { j =>
      sum(when(shiftright(col("h"), j) % 2 === 1, 1).otherwise(-1)).as(s"s$j")
    }
    val agged = tok.groupBy("doc_id").agg(sums.head, sums.tail: _*)
    val sig = (0 until bits).map { j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    agged.select(col("doc_id"), sig.as("simhash"))
  }

  // ---------------------------------------------------------------
  // Embedding near-dup: exact cosine pairs at small scale (oracle
  // path); the scale path buckets by LSH first (Similarity.ivfTopK
  // shows the probe pattern).
  def embeddingNearDups(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val withNorm = df.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .withColumn("nrm", Similarity.l2Norm(col("v")))
    val a = withNorm.select(col("vec_id").as("ia"), col("v").as("va"), col("nrm").as("na"))
    val b = withNorm.select(col("vec_id").as("ib"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        (Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
