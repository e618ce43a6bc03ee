package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{MinHash, SimHash}
import graft.operators.{Multimodal, Similarity, TextPipeline}

/** Dedup / similarity / text-analysis / multimodal pipeline correctness:
  * LSH candidates verified-exact (soundness by construction), recall
  * against exact all-pairs on planted near-duplicates, multimodal batch
  * plumbing determinism. */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-pipeline-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Corpus with planted near-duplicates: base docs + mutated copies
    * (drop/replace a few words) + unrelated docs. */
  def plantedDocs(): DataFrame = {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi")
    val rnd = new scala.util.Random(99)
    val base = (0 until 30).map { i =>
      (f"base$i%03d", Vector.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val nearDups = base.take(10).zipWithIndex.map { case ((id, text), i) =>
      val words = text.split(' ').toVector
      // mutate 3 of 60 words -> 3-shingle jaccard stays high
      val mutated = words.updated(5, "MUT1").updated(25, "MUT2").updated(45, "MUT3")
      (f"dup$i%03d", mutated.mkString(" "))
    }
    val exactDups = base.slice(10, 15).zipWithIndex.map { case ((_, text), i) => (f"copy$i%03d", text) }
    (base ++ nearDups ++ exactDups).toDF("doc_id", "text")
  }

  test("minhash estimate tracks exact jaccard (core property)") {
    val a = MinHash.signature(1, 2, MinHash.wordShingles("a b c d e f g h".split(' '), 2), 256)
    val b = MinHash.signature(1, 2, MinHash.wordShingles("a b c d e f x y".split(' '), 2), 256)
    // shingles: a:{ab,bc,cd,de,ef,fg,gh} b:{ab,bc,cd,de,ef,fx,xy} -> J = 5/9
    val est = MinHash.estimateJaccard(a, b)
    assert(math.abs(est - 5.0 / 9.0) < 4.0 / math.sqrt(256), s"estimate $est vs 5/9")
    // merge = signature of the union
    val union = MinHash.signature(1, 2,
      MinHash.wordShingles("a b c d e f g h".split(' '), 2) ++
        MinHash.wordShingles("a b c d e f x y".split(' '), 2), 256)
    assert(MinHash.merge(a.clone(), b).sameElements(union))
  }

  test("minhash components behave independently (envelope-of-lines regression guard)") {
    // 300 deterministic set pairs, each sharing 80 of 120 shingles
    // (J = 2/3). With INDEPENDENT permutations, estimateJaccard over h=128
    // components is mean J, std sqrt(J(1-J)/h) ≈ 0.0417. The raw
    // Kirsch-Mitzenmacher g_i (pre-mix64) correlated the components —
    // fraction-of-agreeing-components variance inflated several-fold and
    // 32x4 banding missed J=0.8 pairs 4,700x more often than predicted
    // (see MinHash.gi + BASELINE.md). This locks the fix in.
    val h = 128
    val m = 300
    def shingle(tag: String, p: Int, i: Int): String = s"$tag-$p-$i"
    val ests = (0 until m).map { p =>
      val shared = (0 until 80).map(shingle("s", p, _))
      val a = MinHash.signature(1, 2, (shared ++ (0 until 40).map(shingle("a", p, _))).iterator, h)
      val b = MinHash.signature(1, 2, (shared ++ (0 until 40).map(shingle("b", p, _))).iterator, h)
      MinHash.estimateJaccard(a, b)
    }
    val j = 80.0 / 160.0 // |A∩B|=80, |A∪B|=160
    val mean = ests.sum / m
    val std = math.sqrt(ests.map(e => (e - mean) * (e - mean)).sum / (m - 1))
    val theoStd = math.sqrt(j * (1 - j) / h)
    assert(math.abs(mean - j) < 4 * theoStd / math.sqrt(m.toDouble),
      s"minhash estimator biased: mean $mean vs J=$j")
    assert(std < 1.5 * theoStd,
      s"minhash component dependence: sample std $std vs independent-theory $theoStd")
  }

  test("LSH banding recall: zero misses on the deterministic corpus where raw KM missed") {
    // EXACTLY the Bench.lshStressCorpus construction, first 20k docs: 2000
    // planted pairs at shingle-Jaccard ≈ 0.806. The pre-mix64 signatures
    // deterministically missed pairs here (e.g. (8140, 8149) and
    // (15900, 15909) in the 1M run — 4,700x the independent-hash miss
    // rate); with the finalizer the banding must find every pair, as the
    // 1-(1-J^4)^32 ≈ 1-2e-8 theory says.
    import graft.core.{Keys, MinHash, SipHash}
    def text(i: Long): Array[String] = {
      val base = if (i % 10 == 9) i - 9 else i
      val words = Array.tabulate(30) { j =>
        "w" + ((SipHash.hashLong(Keys.DefaultK0, Keys.DefaultK1, base * 31 + j) & 0x7fffffffL) % 200000)
      }
      if (i % 10 == 9) words(7) = "x" + i
      words
    }
    def bands(words: Array[String]): Array[Long] = {
      val sig = MinHash.signature(
        graft.operators.TextPipeline.K0, graft.operators.TextPipeline.K1,
        MinHash.wordShingles(words, 3), 128)
      MinHash.bandKeys(graft.operators.TextPipeline.K0, graft.operators.TextPipeline.K1,
        sig, bands = 32, rowsPerBand = 4)
    }
    val missed = (9L until 20000L by 10L).filter { i =>
      val h = bands(text(i - 9))
      val d = bands(text(i))
      !(h.indices.exists(b => h(b) == d(b))) // no shared (band, key) bucket
    }
    assert(missed.isEmpty,
      s"banding missed ${missed.size} of 2000 planted pairs (component dependence?): ${missed.take(5)}")
  }

  test("minhash-LSH near-dups: sound and complete vs exact all-pairs on planted corpus") {
    val docs = plantedDocs()
    val found = TextPipeline.minHashNearDups(docs, "doc_id", "text",
      shingleN = 3, numHashes = 128, bands = 32, threshold = 0.7)
      .select("doc_a", "doc_b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // exact all-pairs oracle via the same verified-jaccard step on a cross join
    val ids = docs.select(col("doc_id")).collect().map(_.getString(0))
    val allPairs = spark.createDataFrame(
      spark.sparkContext.parallelize(
        for { a <- ids.toSeq; b <- ids.toSeq if a < b } yield (a, b), 4))
      .toDF("doc_a", "doc_b")
    val exact = TextPipeline.verifyJaccard(allPairs, docs, "doc_id", "text", 3, 0.7)
      .select("doc_a", "doc_b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(exact.nonEmpty, "planted corpus must contain near-dups above threshold")
    assert(found.subsetOf(exact), s"LSH reported non-duplicates: ${found -- exact}")
    val recall = found.size.toDouble / exact.size
    assert(recall >= 0.95, s"LSH recall $recall (${found.size}/${exact.size}) below 0.95")
  }

  test("simhash: exact copies collide; planted near-dups mostly within hamming 3") {
    val docs = plantedDocs()
    val pairs = TextPipeline.simHashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // exact copies (copyNNN of baseN) must be found (hamming 0)
    for (i <- 0 until 5) {
      val pair = (f"base${10 + i}%03d", f"copy$i%03d")
      assert(pairs.contains(pair), s"simhash missed exact duplicate $pair")
    }
    // soundness of the hamming bound itself
    val fpUdf = TextPipeline.withSimHash(docs, "text").select("doc_id", "simhash")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b) =>
      assert(SimHash.hamming(fpUdf(a), fpUdf(b)) <= 3)
    }
  }

  test("SRP-LSH ann: sound (exact cosine verify) and high recall vs exact pairs") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val threshold = 0.6
    val approx = Similarity.srpNearDups(emb, "vec_id", "embedding", b = 32, chunks = 8, threshold = threshold)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.exactNearDups(emb, "vec_id", "embedding", threshold)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.subsetOf(exact), "SRP reported a pair below threshold")
    if (exact.nonEmpty)
      assert(approx.size.toDouble / exact.size >= 0.9,
        s"SRP recall ${approx.size}/${exact.size} below 0.9")
  }

  test("SRP-LSH near-dup regime (b=64, 8x8-bit bands, cos>=0.9): recall on a planted corpus") {
    import spark.implicits._
    // deterministic planted corpus: 200 base vectors + 60 perturbed copies
    // (the perturbed pairs land at cos ~0.93-0.99); same parameters as the
    // production query q_srp_ann_recall
    def unit(seed: Long, dim: Int): Array[Float] = Array.tabulate(dim) { j =>
      val h = graft.core.SipHash.hashLong(11L, seed, j.toLong)
      ((h >>> 11).toDouble / (1L << 53).toDouble - 0.5).toFloat
    }
    val dim = 32
    val base = (0L until 200L).map(i => (i, unit(i, dim)))
    val dups = (0L until 60L).map { i =>
      val v = unit(i, dim)
      val noise = unit(i + 100000L, dim)
      val scale = 0.15f
      (1000L + i, v.indices.map(j => v(j) + scale * noise(j)).toArray)
    }
    val emb = (base ++ dups).toDF("vec_id", "embedding")
    val approx = Similarity.srpNearDups(emb, "vec_id", "embedding", b = 64, chunks = 8, threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.exactNearDups(emb, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 30, s"planted corpus must contain real near-dups, got ${exact.size}")
    assert(approx.subsetOf(exact), "SRP reported a pair below threshold")
    assert(approx.size.toDouble / exact.size >= 0.9,
      s"SRP recall ${approx.size}/${exact.size} below 0.9 in the near-dup regime")
  }

  test("embedding near-dup query: planted twins exactly, LSH set == exact set") {
    // the production query plants a perturbed twin of every fifth vector
    // (100 of 500 at sf0.01); planted pairs land at cos ~0.99837 against a
    // <= 0.513 background, so the expected result is pinned exactly —
    // n_pairs == n_planted == 100 and the LSH pair set equals the
    // brute-force set (recall 1 on the deterministic fixture)
    val row = PipelineQueries.embeddingNearDups(spark, "/root/testdata/sf0.01").head()
    assert(row.getLong(row.fieldIndex("n_pairs")) === 100L)
    assert(row.getLong(row.fieldIndex("n_planted")) === 100L)
    assert(row.getBoolean(row.fieldIndex("lsh_equals_exact")))
  }

  test("winnowing: shared-run guarantee, empty/dup edge cases, density") {
    import spark.implicits._
    // k=4, w=5: any shared run of >= w+k-1 = 8 words must yield at least
    // one shared fingerprint (the MOSS guarantee)
    val run = "one two three four five six seven eight" // 8 shared words
    val docsDf = Seq(
      (1L, s"aa bb cc dd $run ee ff gg hh"),
      (2L, s"xx yy zz ww $run qq rr ss tt"),
      (3L, "tiny doc"), // < k words -> no grams -> empty fps
      (4L, s"aa bb cc dd $run ee ff gg hh") // exact dup of 1
    ).toDF("doc_id", "text")
    val fps = TextPipeline.withWinnowFingerprints(docsDf)
      .select(col("doc_id"), col("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      "docs sharing an 8-word run must share a winnowed fingerprint")
    assert(fps(3L).isEmpty, "doc with < k words must have no fingerprints")
    assert(fps(1L) === fps(4L), "identical text must fingerprint identically")
    // density: doc 1 has 16 words (4 + 8 + 4) -> 13 grams -> 9 windows;
    // winnowing selects at least one and at most one per window
    assert(fps(1L).nonEmpty && fps(1L).size <= 9)
  }

  test("winnowing: UDF kernel value-identical to the HOF expression pipeline, per doc") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    val u = TextPipeline.withWinnowFingerprints(docs)
      .select(col("doc_id"), col("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val h = TextPipeline.withWinnowFingerprintsHof(docs)
      .select(col("doc_id"), col("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(u.keySet === h.keySet)
    u.foreach { case (id, fps) =>
      assert(fps === h(id), s"fingerprints differ for doc $id")
    }
  }

  test("winnow fingerprint query: pinned sf0.01 values") {
    // DuckDB recomputes the identical pipeline; these values were pinned
    // from the cross-checked run (and the full oracle runs per round)
    val rows = PipelineQueries.winnowFingerprints(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r).toMap
    val src0 = rows("src0")
    assert(src0.getLong(src0.fieldIndex("n_docs")) === 25L)
    assert(src0.getLong(src0.fieldIndex("total_fps")) === 445L)
    assert(src0.getLong(src0.fieldIndex("distinct_fps")) === 443L)
    assert(src0.getLong(src0.fieldIndex("n_overlap_pairs")) === 1L)
    val totalPairs = rows.values.map(r => r.getLong(r.fieldIndex("n_overlap_pairs"))).sum
    assert(totalPairs === 26L, "global partial-overlap pair count at sf0.01")
  }

  test("brute-force top-k matches a local exact computation") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val rows = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray)
    val query = rows.find(_._1 == 0L).get._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      dot / math.sqrt(na * nb)
    }
    val expected = rows.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(query, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSeq
    val got = Similarity.bruteForceTopK(
      emb.where(col("vec_id") =!= 0), "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(got === expected, "Spark top-k disagrees with local exact cosine ranking")
    // plan shape: top-k must be TakeOrderedAndProject, not a global sort
    val plan = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject in\n$plan")
  }

  test("IVF-Flat: full-probe search equals brute force; pruned search scans fewer rows") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val query = emb.where(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    val candidates = emb.where(col("vec_id") =!= 0)
    val index = Similarity.ivfBuild(candidates, "vec_id", "embedding", numClusters = 16)
    index.indexed.persist()
    // sanity: every cluster id in range, all rows indexed
    val clusters = index.indexed.groupBy("cluster").count().collect()
    assert(clusters.map(_.getLong(1)).sum === candidates.count())
    assert(clusters.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 16))
    // nProbe = numClusters degenerates to exact brute force
    val full = Similarity.ivfSearch(index, query, 10, nProbe = 16)
      .collect().map(_.getLong(0)).toSeq
    val exact = Similarity.bruteForceTopK(candidates, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(full === exact, "full-probe IVF must equal brute force")
    // pruned probe: returns k results from probed clusters only, scanning less
    val pruned = Similarity.ivfSearch(index, query, 10, nProbe = 4)
    assert(pruned.count() === 10)
    val recall = pruned.collect().map(_.getLong(0)).count(exact.contains).toDouble / 10
    // Lloyd-refined centroids (round-2 VERDICT #3) lift this fixture from
    // 0.3-0.4 (sampled seeds) to 0.6 measured — but the fixture embeddings
    // are near-random (no planted cluster structure; only one pair above
    // cos 0.6 in the whole corpus), which caps nProbe=4/16 recall around
    // scan-fraction + epsilon NO MATTER how good the centroids are. The
    // >=0.9 recall floor lives in the planted-structure test below, where
    // the property is actually measurable.
    assert(recall >= 0.5, s"IVF recall@10 with 4/16 probes too low for k-means centroids: $recall")
    index.indexed.unpersist()
  }

  test("ivfBuild degrades gracefully when the table is smaller than numClusters (and when empty)") {
    import spark.implicits._
    // 5 vectors, 16 requested clusters -> 5 effective centroids, no crash
    // (round-4 ADVICE: the sample-trained recentre loop must clamp)
    val tiny = (0 until 5).map(i => (i.toLong, Array.fill(8)(i + 1.0f))).toDF("vec_id", "embedding")
    val idx = Similarity.ivfBuild(tiny, "vec_id", "embedding", numClusters = 16)
    assert(idx.centroids.length === 5)
    val assigned = idx.indexed.collect()
    assert(assigned.length === 5)
    assert(assigned.forall { r => val c = r.getInt(2); c >= 0 && c < 5 })
    val hits = Similarity.ivfSearch(idx, Array.fill(8)(3.0f), 3, nProbe = 5).collect()
    assert(hits.length === 3)
    // empty table: no centroids, empty index, search returns no rows
    val none = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val emptyIdx = Similarity.ivfBuild(none, "vec_id", "embedding", numClusters = 4)
    assert(emptyIdx.centroids.isEmpty && emptyIdx.indexed.isEmpty)
  }

  test("IVF-Flat with k-means centroids: recall >= 0.9 at nProbe 4/16 on planted clusters") {
    import spark.implicits._
    // 16 planted archetype directions (deterministic rademacher vectors,
    // near-orthogonal at dim 64) + bounded per-vector noise: same-cluster
    // cosine stays high, cross-cluster near 0 — the regime IVF exists for.
    val dim = 64
    val k = 16
    val n = 1024
    def unit(v: Array[Float]): Array[Float] = {
      val nrm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / nrm)
    }
    def arche(c: Int): Array[Float] = unit(Array.tabulate(dim) { j =>
      if ((graft.core.SipHash.hashLong(0xA11CEL, c.toLong, j.toLong) & 1L) == 1L) 1f else -1f
    })
    def noise(i: Int): Array[Float] = Array.tabulate(dim) { j =>
      val h = graft.core.SipHash.hashLong(0xB0B5EL, i.toLong, j.toLong)
      ((h & 0xffff).toFloat / 0xffff - 0.5f) * 0.35f
    }
    val archetypes = (0 until k).map(arche)
    val rows = (0L until n.toLong).map { i =>
      val base = archetypes((i % k).toInt)
      (i, unit(base.zip(noise(i.toInt)).map { case (b, e) => b + e }))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val query = rows.head._2 // member of planted cluster 0
    val candidates = emb.where(col("vec_id") =!= 0)
    val exact = Similarity.bruteForceTopK(candidates, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet
    val index = Similarity.ivfBuild(candidates, "vec_id", "embedding", numClusters = k)
    index.indexed.persist()
    val got = Similarity.ivfSearch(index, query, 10, nProbe = 4)
      .collect().map(_.getLong(0))
    val recall = got.count(exact.contains).toDouble / 10
    index.indexed.unpersist()
    assert(recall >= 0.9, s"planted-cluster IVF recall@10 at nProbe=4/16: $recall")
    // bounded-sample training (round-3 VERDICT #1): Lloyd over only 256 of
    // the 1023 vectors — a TRUE subsample — must keep the same recall floor
    // (centroid directions converge on a uniform sample; the full table is
    // read once, for the final assignment pass only)
    val sampled = Similarity.ivfBuild(candidates, "vec_id", "embedding",
      numClusters = k, trainSample = 256)
    sampled.indexed.persist()
    val gotSampled = Similarity.ivfSearch(sampled, query, 10, nProbe = 4)
      .collect().map(_.getLong(0))
    val recallSampled = gotSampled.count(exact.contains).toDouble / 10
    sampled.indexed.unpersist()
    assert(recallSampled >= 0.9,
      s"sample-trained IVF recall@10 at nProbe=4/16: $recallSampled")
  }

  test("connected components: labels are component minima; deterministic; keep-set exact") {
    import spark.implicits._
    // two chains (transitive closure matters) + a pair + isolated docs
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (7L, 5L))
      .toDF("doc_a", "doc_b")
    val cc = TextPipeline.connectedComponents(pairs)
    val got = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cc.unpersist()
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 5L -> 5L, 7L -> 5L))
    // identical assignment when the pair input arrives partitioned differently
    val ccR = TextPipeline.connectedComponents(pairs.repartition(5, col("doc_b")))
    val gotR = ccR.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ccR.unpersist()
    assert(gotR === got)
    // keep-set: winners + unclustered survive, losers drop
    val docs = (1L to 12L).toDF("doc_id")
    val kept = TextPipeline.keepAfterClusterDedup(docs, "doc_id", cc)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(1L, 5L, 6L, 8L, 9L, 10L, 12L))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("connected components: long path converges via pointer jumping; empty input is empty") {
    import spark.implicits._
    // a 33-node path: naive propagation needs 32 rounds, jumping needs ~5
    val path = (0L until 32L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = TextPipeline.connectedComponents(path, maxIters = 10)
    val got = cc.collect()
    cc.unpersist()
    assert(got.length === 33 && got.forall(_.getLong(1) == 0L))
    val empty = TextPipeline.connectedComponents(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"))
    assert(empty.isEmpty)
    empty.unpersist()
  }

  test("connected components: non-convergence throws AND unpersists every iteration frame") {
    import spark.implicits._
    // a 33-node path cannot converge in 2 pointer-jumping rounds; the
    // failure path must not leak the persisted labels/edges frames —
    // Verify keeps the session alive after a per-query failure, so a
    // leaked cache would squat executor memory for the rest of the run
    // (review r5)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    val path = (0L until 32L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalArgumentException](
      TextPipeline.connectedComponents(path, maxIters = 2))
    assert(e.getMessage.contains("no convergence"))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked after failure: ${spark.sparkContext.getPersistentRDDs.keys}")
  }

  test("connected components match union-find on random graphs (seeded)") {
    import spark.implicits._
    for (seed <- Seq(11, 23, 47)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val edges = Seq.fill(40)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      // reference components via union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> find(x)).toMap
      val cc = TextPipeline.connectedComponents(edges.toDF("doc_a", "doc_b"))
      val got = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      cc.unpersist()
      assert(got === expected, s"seed $seed")
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("minHashDedupClusters resolves planted dup groups end to end") {
    // planted corpus: dup00i pairs with base00i, copies pair with their
    // bases — every cluster's winner is the lexically-smallest doc_id
    val cc = TextPipeline.minHashDedupClusters(plantedDocs(), "doc_id", "text",
      threshold = 0.7)
    val got = cc.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cc.unpersist()
    (0 until 10).foreach { i =>
      assert(got(f"dup$i%03d") === f"base$i%03d", s"dup $i")
      assert(got(f"base$i%03d") === f"base$i%03d", s"base $i")
    }
    (0 until 5).foreach { i =>
      assert(got(f"copy$i%03d") === f"base${10 + i}%03d", s"copy $i")
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("quality metrics agree with a straightforward recomputation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = TextPipeline.withQualityMetrics(docs)
      .select("doc_id", "word_count", "stopword_count", "quality_ok").collect()
    got.foreach { r =>
      val text = docs.where(col("doc_id") === r.getLong(0)).head().getAs[String]("text")
      val words = text.split(' ').filter(_.nonEmpty)
      assert(r.getLong(1) === words.length.toLong)
      assert(r.getLong(2) === words.count(TextPipeline.Stopwords.contains).toLong)
      val ok = words.length >= 5 && words.length <= 10000 &&
        2 * words.count(TextPipeline.Stopwords.contains) <= words.length
      assert(r.getBoolean(3) === ok)
    }
  }

  test("multimodal: real decode recovers the encoded dimensions/intensity, batch-invariant") {
    val media = Multimodal.syntheticMedia(spark, 500, 4)
    val f1 = Multimodal.extractFeatures(media, batchSize = 32).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, batchSize = 7).collect().sortBy(_.media_id)
    assert(f1.length === 500)
    assert(f1.toSeq === f2.toSeq, "batch size must not change extracted features")
    // every decoded feature equals its closed form: the real codec must
    // roundtrip exactly (PNG gray 8-bit and PCM_U8 are lossless)
    f1.foreach { f =>
      val id = f.media_id
      assert(f.media_type === Multimodal.typeOf(id))
      f.media_type match {
        case "image" =>
          assert(f.width === Multimodal.widthOf(id) && f.height === Multimodal.heightOf(id))
          assert(f.frames_sampled === 1)
        case "audio" =>
          assert(f.width === 0 && f.height === 0 && f.frames_sampled === 1)
        case "video" =>
          assert(f.width === Multimodal.widthOf(id) && f.height === Multimodal.heightOf(id))
          assert(f.frames_sampled === Multimodal.framesOf(id))
      }
      assert(f.mean_intensity === Multimodal.grayOf(id).toDouble,
        s"decoded intensity drifted for media $id (${f.media_type})")
    }
    assert(f1.exists(_.frames_sampled > 1), "video rows must decode multiple frames")
    val stats = Multimodal.featureStats(Multimodal.extractFeatures(media)).collect()
    assert(stats.map(_.getLong(2)).sum === 500L)
  }

  test("multimodal: corrupted payloads fail loudly, not silently") {
    val bad = Multimodal.MediaRow(1L, "image", Array[Byte](1, 2, 3), "src0")
    intercept[Exception](Multimodal.decodeOne(bad))
    val badVideo = Multimodal.MediaRow(2L, "video", Array[Byte](0, 0, 0, 0, 0, 0, 0, 1), "src0")
    intercept[Exception](Multimodal.decodeOne(badVideo))
  }

  test("language id: deterministic and sane on the synthetic corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val preds = docs.withColumn("p", TextPipeline.langIdUdf(col("text")))
      .groupBy("p").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the synthetic vocabulary is English-ish; 'the' is in it
    assert(preds.getOrElse("en", 0L) > 0L)
    assert(preds.values.sum === 500L)
  }

  /** Tiny tokens table with PLANTED contamination: eval source "ev" holds
    * two docs; train doc t1 copies a 4-token run from ev's first doc
    * (1 shared distinct gram), t2 copies a 5-token run (2 shared grams),
    * t3 shares nothing, t4 is shorter than n. */
  private def plantedTokens(): DataFrame = {
    import spark.implicits._
    Seq(
      graft.sources.Tokens.TokenRow("e1", Array(1, 2, 3, 4, 5), 5, "ev"),
      graft.sources.Tokens.TokenRow("e2", Array(9, 9, 9, 9), 4, "ev"),
      graft.sources.Tokens.TokenRow("t1", Array(7, 1, 2, 3, 4, 8), 6, "trA"),
      graft.sources.Tokens.TokenRow("t2", Array(1, 2, 3, 4, 5, 6), 6, "trA"),
      graft.sources.Tokens.TokenRow("t3", Array(5, 4, 3, 2, 1), 5, "trB"),
      graft.sources.Tokens.TokenRow("t4", Array(1, 2, 3), 3, "trB")
    ).toDF()
  }

  test("decontamination: planted overlaps found exactly, clean docs untouched") {
    val rep = graft.operators.Decontamination
      .decontaminate(plantedTokens(), "ev", 4, SketchQueries.bloomCfg)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // trA: t1 hits gram 1|2|3|4; t2 hits 1|2|3|4 and 2|3|4|5 -> 2 docs, 3 hits
    assert(rep("trA") === ((2L, 2L, 3L)))
    // trB: t3 reversed shares nothing; t4 too short -> 2 docs, 0 contaminated
    assert(rep("trB") === ((2L, 0L, 0L)))
    assert(!rep.contains("ev"))
  }

  test("decontamination: Bloom prefilter is pruning-only (equals the exact twin)") {
    val t = graft.sources.Tokens.table(spark, "/root/testdata/sf0.001")
    val a = graft.operators.Decontamination
      .decontaminate(t, "src0", 4, SketchQueries.bloomCfg)
      .collect().map(_.toSeq).toSeq
    val b = graft.operators.Decontamination
      .decontaminateExact(t, "src0", 4).collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("decontamination: empty eval source yields zero hits, full doc counts") {
    val rep = graft.operators.Decontamination
      .decontaminate(plantedTokens(), "no_such_source", 4, SketchQueries.bloomCfg)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rep("ev") === ((2L, 0L, 0L)))
    assert(rep("trA") === ((2L, 0L, 0L)))
    assert(rep("trB") === ((2L, 0L, 0L)))
  }

  test("decontamination: per-doc gram dedup is map-side (repeated grams count once)") {
    import spark.implicits._
    val t = Seq(
      graft.sources.Tokens.TokenRow("e1", Array(1, 1, 1, 1, 1, 1), 6, "ev"),
      // three positions of gram 1|1|1|1 -> ONE distinct (doc, gram) hit
      graft.sources.Tokens.TokenRow("t1", Array(1, 1, 1, 1, 1, 1), 6, "tr")
    ).toDF()
    val rep = graft.operators.Decontamination
      .decontaminate(t, "ev", 4, SketchQueries.bloomCfg)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rep("tr") === ((1L, 1L, 1L)))
  }

  test("decontamination: UDF gram kernel value-identical to the HOF twin, per doc") {
    val t = graft.sources.Tokens.table(spark, "/root/testdata/sf0.01")
    def collectGrams(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("doc_id")).agg(collect_list(col("gram")).as("gs"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).sorted).toMap
    val u = collectGrams(graft.operators.Decontamination.gramRows(t, 4))
    val h = collectGrams(graft.operators.Decontamination.gramRowsHof(t, 4))
    assert(u.keySet === h.keySet)
    u.foreach { case (id, gs) => assert(gs === h(id), s"grams differ for doc $id") }
  }

  test("bigram packing: (a << 32) | b is exact and injective for int token ids") {
    import spark.implicits._
    val big = Int.MaxValue
    val t = Seq(
      graft.sources.Tokens.TokenRow("d1", Array(big, big, 1, big), 4, "s")
    ).toDF()
    val keys = t.select(explode(zip_with(
        slice(col("tokens"), lit(1), size(col("tokens")) - 1),
        slice(col("tokens"), lit(2), size(col("tokens")) - 1),
        (a, b) => a.cast("long") * lit(4294967296L) + b.cast("long"))).as("k"))
      .collect().map(_.getLong(0)).toSeq
    assert(keys === Seq(
      big.toLong * 4294967296L + big.toLong,
      big.toLong * 4294967296L + 1L,
      1L * 4294967296L + big.toLong))
    assert(keys.forall(_ > 0L)) // no overflow into the sign bit
  }

  test("sequence packing matches the serial next-fit reference, any input partitioning") {
    import spark.implicits._
    import graft.operators.SequencePacking
    val rnd = new scala.util.Random(7)
    // sizes include overflow docs (> capacity) and exact-fit boundaries
    val docs = (0L until 400L).map { id =>
      val n = rnd.nextInt(12) match {
        case 0 => 300L + rnd.nextInt(100)              // overflow: alone in a seq
        case 1 => 256L                                 // exact fit
        case _ => 10L + rnd.nextInt(90)
      }
      (id, s"src${id % 5}", n)
    }
    val df = docs.toDF("doc_id", "source", "n_tok")
    val expected = docs.groupBy { case (id, src, _) => (src, id / 64) }
      .flatMap { case ((src, shard), group) =>
        val sorted = group.sortBy(_._1)
        val seqIds = SequencePacking.packSerial(sorted.map(_._3), 256L)
        sorted.zip(seqIds).map { case ((id, _, n), seq) => (src, shard, id, n, seq) }
      }.toSet
    for (parts <- Seq(1, 3, 13)) {
      val got = SequencePacking.packDocs(df.repartition(parts), 256L, 64L)
        .collect().map(p => (p.source, p.shard, p.doc_id, p.n_tok, p.seq_id)).toSet
      assert(got === expected, s"mismatch at input partitioning $parts")
    }
    // capacity respected except single overflowing docs; token mass conserved
    val rollup = SequencePacking.packedSequences(df, 256L, 64L).collect()
    assert(rollup.map(_.getLong(4)).sum === docs.map(_._3).sum)
    rollup.foreach { r =>
      assert(r.getLong(4) <= 256L || r.getLong(3) == 1L,
        s"over-capacity sequence with ${r.getLong(3)} docs: $r")
    }
  }

  test("repetition kernel matches a collections recomputation; gate flags planted spam") {
    import graft.operators.TextPipeline
    def reference(text: String): (Long, Long, Long, Long, Long) = {
      val ws = text.split(' ').filter(_.nonEmpty)
      val bgs = ws.sliding(2).filter(_.length == 2).map(_.mkString("\u0001")).toSeq
      val top = if (ws.isEmpty) 0L else ws.groupBy(identity).values.map(_.length).max.toLong
      (ws.length.toLong, ws.distinct.length.toLong, top, bgs.length.toLong, bgs.distinct.length.toLong)
    }
    val rnd = new scala.util.Random(13)
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val cases = Seq("", " ", "solo", "a a a a a b", "x y x y x y",
      "  double  spaces  here  ") ++
      (0 until 50).map(_ => Vector.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    cases.foreach { text =>
      val k = TextPipeline.repetitionKernel(text)
      assert((k.n_words, k.n_distinct_words, k.top_word_count, k.n_bigrams, k.n_distinct_bigrams)
        === reference(text), s"kernel mismatch on '$text'")
    }
    assert(TextPipeline.repetitionKernel(null) === TextPipeline.RepetitionStats(0, 0, 0, 0, 0))
    // the DataFrame gate: spam doc flagged, diverse doc not
    import spark.implicits._
    val df = Seq(
      ("d1", "spam spam spam spam spam something"),            // top word 5/6
      ("d2", "one two three four five six seven eight"),       // diverse
      ("d3", "ab cd ab cd ab cd ab cd ab cd"))                  // repeated bigrams
      .toDF("doc_id", "text")
    val out = TextPipeline.withRepetitionMetrics(df)
      .select("doc_id", "repetitive").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out === Map("d1" -> true, "d2" -> false, "d3" -> true))
  }

  test("sequence packing: overflow doc sits alone and resets the fill") {
    import graft.operators.SequencePacking
    // 100 + 100 fit; 999 overflows alone; 100 starts fresh after it
    assert(SequencePacking.packSerial(Seq(100L, 100L, 999L, 100L, 100L), 256L)
      === Seq(0L, 0L, 1L, 2L, 2L))
    // leading overflow occupies seq 0 by itself
    assert(SequencePacking.packSerial(Seq(999L, 10L), 256L) === Seq(0L, 1L))
    assert(SequencePacking.packSerial(Seq.empty[Long], 256L) === Seq.empty[Long])
  }

  test("sequence packing: randomized capacities and shard widths match the serial reference") {
    import spark.implicits._
    import graft.operators.SequencePacking
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 4) {
      val capacity = 32L + rnd.nextInt(400)
      val shardDocs = 1L + rnd.nextInt(90)
      val nDocs = 150 + rnd.nextInt(200)
      val docs = (0 until nDocs).map { _ =>
        // non-contiguous, duplicated-gap ids across sources; sizes straddle
        // the capacity so overflow and exact-fit paths both fire
        val id = rnd.nextInt(5000).toLong
        (id, s"s${id % 3}", 1L + rnd.nextInt(2 * capacity.toInt))
      }.distinctBy(d => (d._1, d._2))
      val df = docs.toDF("doc_id", "source", "n_tok").repartition(1 + rnd.nextInt(8))
      val expected = docs.groupBy { case (id, src, _) => (src, id / shardDocs) }
        .flatMap { case ((src, shard), group) =>
          val sorted = group.sortBy(_._1)
          sorted.zip(SequencePacking.packSerial(sorted.map(_._3), capacity))
            .map { case ((id, _, n), seq) => (src, shard, id, n, seq) }
        }.toSet
      val got = SequencePacking.packDocs(df, capacity, shardDocs)
        .collect().map(p => (p.source, p.shard, p.doc_id, p.n_tok, p.seq_id)).toSet
      assert(got === expected,
        s"trial $trial mismatch (capacity=$capacity shardDocs=$shardDocs nDocs=${docs.size})")
    }
  }

  test("KMV string sketch: exact below capacity, Jaccard within 5 sigma, partition-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import graft.core.{Keys, Kmv}
    import graft.operators.SketchAggs.KmvStringAgg
    val k = 256
    val kmvU = udaf(new KmvStringAgg(Keys.DefaultK0, Keys.DefaultK1, k), ExpressionEncoder[String]())
    // two groups: 200 distinct strings (< k: estimate EXACT), sharing 100
    val rows = ((0 until 200).map(i => ("a", s"g$i")) ++
      (100 until 300).map(i => ("b", s"g$i"))).toDF("grp", "v")
    for (parts <- Seq(1, 7)) {
      val sk = rows.repartition(parts).groupBy(col("grp")).agg(kmvU(col("v")).as("sk"))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
      val (ha, sa, tagA, _) = Kmv.fromBytes(sk("a"))
      assert(tagA === graft.core.BlockedBloom.TypeTag.String)
      assert(math.round(Kmv.estimate(ha, sa)) === 200L, "below capacity must be exact")
      val (hb, sb, _, _) = Kmv.fromBytes(sk("b"))
      val (estJ, _) = Kmv.jaccardAndIntersection(ha, sa, hb, sb)
      val j = 100.0 / 300.0
      assert(math.abs(estJ - j) <= 5 * math.sqrt(j * (1 - j) / k) + 0.01,
        s"jaccard estimate $estJ vs exact $j at parts=$parts")
    }
  }

  test("mixture selection: exact prefix to the budget, integer math, edge fractions") {
    import spark.implicits._
    import graft.operators.MixtureSelection
    // srcA total 100, budget 50: 30(cum30 sel) 25(cum55 no) 20 15 10 -> only first
    // srcB total 60, budget 30: 30(cum30 sel, ==budget boundary) 20 10
    val df = Seq(
      (1L, "srcA", 30L), (2L, "srcA", 25L), (3L, "srcA", 20L), (4L, "srcA", 15L), (5L, "srcA", 10L),
      (1L, "srcB", 30L), (2L, "srcB", 20L), (3L, "srcB", 10L))
      .toDF("doc_id", "source", "n_tok")
    val rep = MixtureSelection.mixtureReport(df, "n_tok", 1L, 2L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5), r.getBoolean(6))).toMap
    // srcA: selected {30}, smallest unselected 10 -> 40 <= 50: NOT tight
    assert(rep("srcA") === ((5L, 1L, 30L, 100L, true, false)))
    // srcB: selected {30} (boundary inclusive), smallest unselected 10 -> 40 > 30: tight
    assert(rep("srcB") === ((3L, 1L, 30L, 60L, true, true)))
    // num=0 selects nothing (positive doc sizes); num=den selects everything
    val zero = MixtureSelection.mixtureReport(df, "n_tok", 0L, 2L).collect()
    assert(zero.forall(r => r.getLong(2) === 0L))
    val all = MixtureSelection.mixtureReport(df, "n_tok", 2L, 2L).collect()
    assert(all.forall(r => r.getLong(2) === r.getLong(1) && r.getBoolean(6)))
    // selection is a contiguous prefix in doc_id order
    val flags = MixtureSelection.withMixtureSelection(df, "n_tok", 1L, 2L)
      .select("source", "doc_id", "selected").collect()
      .groupBy(_.getString(0)).view.mapValues(_.sortBy(_.getLong(1)).map(_.getBoolean(2)).toSeq)
    flags.foreach { case (src, fs) =>
      assert(!fs.dropWhile(identity).contains(true), s"$src selection is not a prefix: $fs")
    }
  }

  test("mixture selection: two-level distributed prefix scan equals one global window") {
    import spark.implicits._
    import graft.operators.MixtureSelection
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(21)
    val df = (0L until 300L).map(id => (id, s"src${id % 4}", 1L + rnd.nextInt(80).toLong))
      .toDF("doc_id", "source", "n_tok")
    // naive single-window formulation (the scale-killer shape, kept as oracle)
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = df.groupBy(col("source")).agg(sum(col("n_tok")).cast("long").as("tok_total"))
    val naive = df.join(tot, Seq("source"))
      .withColumn("cum", sum(col("n_tok")).over(w).cast("long"))
      .withColumn("selected", col("cum") * 2L <= col("tok_total") * 1L)
      .select("source", "doc_id", "cum", "selected").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
    for (shardDocs <- Seq(2L, 7L, 1L << 16)) {
      val got = MixtureSelection.withMixtureSelection(df, "n_tok", 1L, 2L, shardDocs)
        .select("source", "doc_id", "cum", "selected").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
      assert(got === naive, s"two-level scan diverged at shardDocs=$shardDocs")
    }
  }

  test("sequence packing shard key is exact above 2^53 (integer div, not double /)") {
    import spark.implicits._
    import graft.operators.SequencePacking
    // (1<<60) + 127 rounds UP to (1<<60) + 128 in double, flipping the
    // shard from 2^53 to 2^53 + 1 under `/`; integer div must keep 2^53
    val id = (1L << 60) + 127L
    val out = SequencePacking.packDocs(
      Seq((id, "s", 10L)).toDF("doc_id", "source", "n_tok"), 256L, 128L).collect()
    assert(out.length === 1)
    assert(out.head.shard === id / 128L, s"shard ${out.head.shard} != exact ${id / 128L}")
  }

  test("packed sequence content: concatenation in doc order, offsets exact, partition-invariant") {
    import spark.implicits._
    import graft.operators.SequencePacking
    val rnd = new scala.util.Random(9)
    val capacity = 64L
    val docs = (0L until 200L).map { id =>
      // lengths straddle the capacity: empties, exact fits, overflow docs
      val n = rnd.nextInt(10) match {
        case 0 => 0
        case 1 => 64
        case 2 => 80 + rnd.nextInt(30) // overflow: alone in a sequence
        case _ => 1 + rnd.nextInt(30)
      }
      (id, s"src${id % 3}", (0 until n).map(_ => rnd.nextInt(1 << 20).toLong).toArray)
    }
    val expected = docs.groupBy { case (id, src, _) => (src, id / 16) }
      .flatMap { case ((src, shard), group) =>
        val sorted = group.sortBy(_._1)
        val seqIds = SequencePacking.packSerial(sorted.map(_._3.length.toLong), capacity)
        sorted.zip(seqIds).groupBy(_._2).map { case (seq, members) =>
          val toks = members.flatMap(_._1._3)
          val offs = members.map(_._1._3.length.toLong).scanLeft(0L)(_ + _).dropRight(1)
          (src, shard, seq) ->
            ((members.map(_._1._1), offs, toks.toSeq, members.map(_._1._3.length.toLong).sum))
        }
      }.toMap
    for (parts <- Seq(1, 5)) {
      val got = SequencePacking.packSequenceContent(
          docs.toDF("doc_id", "source", "toks").repartition(parts), capacity, 16L)
        .collect()
        .map(p => (p.source, p.shard, p.seq_id) ->
          ((p.doc_ids.toSeq, p.doc_offsets.toSeq, p.tokens.toSeq, p.seq_tok))).toMap
      assert(got.keySet === expected.keySet, s"sequence set differs at parts=$parts")
      expected.foreach { case (k, (ids, offs, toks, tot)) =>
        val (gIds, gOffs, gToks, gTot) = got(k)
        assert(gIds === ids, s"doc ids differ for $k at parts=$parts")
        assert(gOffs === offs, s"offsets differ for $k at parts=$parts")
        assert(gToks === toks, s"tokens differ for $k at parts=$parts")
        assert(gTot === tot && gTot === gToks.length.toLong)
      }
    }
    // assignment agrees with packDocs on the derived n_tok frame
    val viaAssign = SequencePacking.packDocs(
        docs.map { case (id, src, t) => (id, src, t.length.toLong) }
          .toDF("doc_id", "source", "n_tok"), capacity, 16L)
      .collect().map(p => (p.source, p.shard, p.doc_id) -> p.seq_id).toMap
    val viaContent = SequencePacking.packSequenceContent(
        docs.toDF("doc_id", "source", "toks"), capacity, 16L)
      .collect().flatMap(p => p.doc_ids.map(id => (p.source, p.shard, id) -> p.seq_id)).toMap
    assert(viaContent === viaAssign)
  }

  test("weighted mixture selection: two-level ES-order scan equals one window; keys match esKey") {
    import spark.implicits._
    import graft.core.{BottomK, Keys, SipHash}
    import graft.operators.MixtureSelection
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(5)
    val df = (0L until 300L).map(id => (id, s"src${id % 4}", 1L + rnd.nextInt(80).toLong))
      .toDF("doc_id", "source", "n_tok")
    // the operator's es_bits are BIT-IDENTICAL to the weighted sampler's keys
    val bits = MixtureSelection.withEsBits(df, "n_tok")
      .select("doc_id", "n_tok", "es_bits").collect()
    bits.foreach { r =>
      val expectedKey = BottomK.esKey(
        SipHash.hashLong(Keys.DefaultK0, Keys.DefaultK1, r.getLong(0)), r.getLong(1).toDouble)
      assert(r.getLong(2) === expectedKey, s"es_bits drifted for doc ${r.getLong(0)}")
    }
    // naive single-window formulation over the same keys (the gate shape)
    val w = Window.partitionBy(col("source")).orderBy(col("es_bits"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = df.groupBy(col("source")).agg(sum(col("n_tok")).cast("long").as("tok_total"))
    val naive = MixtureSelection.withEsBits(df, "n_tok").join(tot, Seq("source"))
      .withColumn("cum", sum(col("n_tok")).over(w).cast("long"))
      .withColumn("selected", col("cum") * 2L <= col("tok_total") * 1L)
      .select("source", "doc_id", "cum", "selected").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
    for (shardBits <- Seq(0, 20, 40, 62)) {
      val got = MixtureSelection.withMixtureSelectionWeighted(df, "n_tok", 1L, 2L, shardBits)
        .select("source", "doc_id", "cum", "selected").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
      assert(got === naive, s"weighted two-level scan diverged at shardBits=$shardBits")
    }
    // the selection is a contiguous prefix in ES-key order per source
    val sel = MixtureSelection.withMixtureSelectionWeighted(df, "n_tok", 1L, 2L)
      .select("source", "es_bits", "doc_id", "selected").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.sortBy(r => (r.getLong(1), r.getLong(2))).map(_.getBoolean(3)).toSeq)
    sel.foreach { case (src, fs) =>
      assert(!fs.dropWhile(identity).contains(true), s"$src weighted selection not a prefix")
    }
  }

  test("BPE: greedy kernel equals sequential rank replay; fixture examples exact") {
    import graft.operators.Bpe
    val ranks = new java.util.HashMap[String, Integer]()
    Bpe.FixtureMerges.zipWithIndex.foreach { case ((a, b), r) =>
      ranks.put(a + " " + b, Integer.valueOf(r)) }
    // the oracle's semantics: merges applied sequentially in rank order,
    // each in ONE leftmost-first non-overlapping pass
    def sequential(word: String): Seq[String] = {
      var syms = word.map(String.valueOf(_)).toVector
      Bpe.FixtureMerges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    assert(Bpe.encodeWord("the", ranks).toSeq === Seq("the"))
    assert(Bpe.encodeWord("and", ranks).toSeq === Seq("and"))
    assert(Bpe.encodeWord("there", ranks).toSeq === Seq("the", "re"))
    assert(Bpe.encodeWord("standing", ranks).toSeq === Seq("st", "and", "in", "g"))
    assert(Bpe.encodeWord("x", ranks).toSeq === Seq("x"))
    assert(Bpe.encodeWord("", ranks).toSeq === Seq.empty)
    // the DuckDB oracle's EXACT semantics: literal string replace over the
    // 0x01-bounded form, left-to-right non-overlapping, applied TWICE per
    // rank (one replace pass consumes the shared boundary between adjacent
    // occurrences — 'inin' merges only its first 'in' in a single pass)
    def stringReplay(word: String): Seq[String] = {
      val sep = 1.toChar.toString
      var s = sep + word.map(String.valueOf(_)).mkString(sep) + sep
      Bpe.FixtureMerges.foreach { case (a, b) =>
        val pat = sep + a + sep + b + sep
        val rep = sep + a + b + sep
        s = s.replace(pat, rep)
        s = s.replace(pat, rep)
      }
      s.split(1.toChar).filter(_.nonEmpty).toSeq
    }
    // adjacency regression: runs of the same merge pair (the case a single
    // replace pass gets wrong)
    Seq("inin", "ininin", "inininin", "thethe", "thethethe", "erer", "stinstin")
      .foreach { w =>
        assert(Bpe.encodeWord(w, ranks).toSeq === sequential(w), s"list replay on '$w'")
        assert(Bpe.encodeWord(w, ranks).toSeq === stringReplay(w), s"string replay on '$w'")
      }
    // randomized words over the merge alphabet: greedy == BOTH replays
    val rnd = new scala.util.Random(17)
    val chars = "theinandorst"
    val compiled = new Bpe.CompiledMerges(Bpe.FixtureMerges)
    def compiledEncode(w: String): Seq[String] = {
      val buf = new scala.collection.mutable.ArrayBuffer[String]()
      compiled.encodeInto(w, buf); buf.toSeq
    }
    (0 until 500).foreach { _ =>
      val word = (0 until 1 + rnd.nextInt(14)).map(_ => chars(rnd.nextInt(chars.length))).mkString
      assert(Bpe.encodeWord(word, ranks).toSeq === sequential(word),
        s"greedy != sequential on '$word'")
      assert(Bpe.encodeWord(word, ranks).toSeq === stringReplay(word),
        s"greedy != string replay on '$word'")
      assert(compiledEncode(word) === Bpe.encodeWord(word, ranks).toSeq,
        s"compiled id kernel != string kernel on '$word'")
    }
    // DataFrame surface: pre-tokens encode independently and concatenate
    import spark.implicits._
    val out = Bpe.withBpeTokens(Seq(("d1", "the cat and the dog"), ("d2", null))
        .toDF("doc_id", "text"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(out("d1") === Seq("the", "c", "at", "and", "the", "d", "o", "g"))
    assert(out("d2") === Seq.empty)
  }

  test("BPE: greedy equals sequential replay for RANDOM valid merge tables") {
    import graft.operators.Bpe
    // a merge table is VALID when each pair's constituents exist before
    // its rank (chars, or tokens produced by earlier merges) — the
    // precondition of the equivalence theorem; build such tables randomly
    val rnd = new scala.util.Random(23)
    val alphabet = "abcd"
    (0 until 40).foreach { trial =>
      var available = alphabet.map(String.valueOf(_)).toVector
      val merges = (0 until 10).map { _ =>
        val a = available(rnd.nextInt(available.size))
        val b = available(rnd.nextInt(available.size))
        available :+= (a + b)
        (a, b)
      }.toVector
      val ranks = new java.util.HashMap[String, Integer]()
      // last rank wins on duplicate pairs in the table — mirror that in
      // the sequential replay by deduplicating to the FIRST occurrence
      // (a later duplicate pair can never fire: its occurrences were
      // exhausted at the earlier rank)
      val seen = scala.collection.mutable.LinkedHashSet[(String, String)]()
      merges.foreach(m => if (!seen.contains(m)) { seen += m })
      val uniq = seen.toVector
      uniq.zipWithIndex.foreach { case ((a, b), r) =>
        ranks.put(a + " " + b, Integer.valueOf(r)) }
      def sequential(word: String): Seq[String] = {
        var syms = word.map(String.valueOf(_)).toVector
        uniq.foreach { case (a, b) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
        }
        syms
      }
      // the compiled id kernel must track the string kernel on these
      // tables too — they include self-pairs AND duplicate product
      // strings (e.g. a+bc and ab+c both producing "abc"), the cases the
      // canonical-id scheme must collapse exactly as string equality does
      val compiled = new Bpe.CompiledMerges(uniq)
      (0 until 25).foreach { _ =>
        val word = (0 until 1 + rnd.nextInt(16))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        assert(Bpe.encodeWord(word, ranks).toSeq === sequential(word),
          s"trial $trial: greedy != sequential on '$word' with merges $uniq")
        val buf = new scala.collection.mutable.ArrayBuffer[String]()
        compiled.encodeInto(word, buf)
        assert(buf.toSeq === Bpe.encodeWord(word, ranks).toSeq,
          s"trial $trial: compiled != string kernel on '$word' with merges $uniq")
      }
    }
  }

  test("connected components: periodic checkpoint converges long-diameter chains leak-free") {
    import spark.implicits._
    // a 300-node chain needs ~9 pointer-jumping rounds; checkpointEvery=2
    // fires several reliable checkpoints (auto tmpdir) along the way
    val path = (0L until 300L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = TextPipeline.connectedComponents(path, maxIters = 20, checkpointEvery = 2)
    val got = cc.collect()
    cc.unpersist()
    assert(got.length === 301 && got.forall(_.getLong(1) == 0L))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked after checkpointed run: ${spark.sparkContext.getPersistentRDDs.keys}")
  }

  test("vocab build: per-doc counting kernel matches a collections recomputation") {
    import spark.implicits._
    val df = Seq(
      ("a b a  c b a", 1L), ("", 2L), ("b b", 3L), (null: String, 4L))
      .toDF("text", "doc_id")
    val got = df.select(explode(TextPipeline.docTokenCounts(col("text"))).as("kv"))
      .select(col("kv._1"), col("kv._2")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    // doc1 "a b a  c b a": a=3 b=2 c=1 (double space folds); doc3 "b b": b=2
    assert(got === Map("a" -> Seq(3L), "b" -> Seq(2L, 2L), "c" -> Seq(1L)))
    // floor 0/1 keeps everything: the kernel path vs a direct recount
    val vocab = PipelineQueries.vocabBuild(spark, "/root/testdata/sf0.001",
        num = 0L, den = 1L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    assert(vocab.nonEmpty)
    // the relative floor actually filters: 1% must drop the rare tail
    // while keeping the common words (scale-invariant by construction)
    val floored = PipelineQueries.vocabBuild(spark, "/root/testdata/sf0.001")
      .collect()
    assert(floored.length < vocab.length && floored.nonEmpty)
    // spot-check one token against a direct recomputation
    val (tok, (cnt, dfreq)) = vocab.head
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    assert(cnt === docs.map(_.split(' ').count(_ == tok)).sum.toLong)
    assert(dfreq === docs.count(_.split(' ').contains(tok)).toLong)
  }

  test("curation funnel: stage counts nest and the conjunction is consistent") {
    val out = PipelineQueries.curationFunnel(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(out.nonEmpty)
    out.foreach { case (src, (nDocs, nQ, nU, nC, nR, nF, tokF)) =>
      assert(nQ <= nDocs && nU <= nDocs && nC <= nDocs && nR <= nDocs, src)
      assert(nF <= Seq(nQ, nU, nC, nR).min, s"$src conjunction exceeds a stage")
      assert((nF == 0) == (tokF == 0L) || tokF > 0L, src)
    }
    // eval-source rows are trivially clean (contamination is defined
    // against src0, which never joins itself)
    assert(out("src0")._4 === out("src0")._1)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("PII redaction: classes counted before their own replacement, sentinels never self-match") {
    import spark.implicits._
    val df = Seq(
      ("plain words only", 1L),
      ("mail me at bob.smith@corp.example now", 2L),
      ("see http://x.y/a?b=123456789012 and c@d.e", 3L), // url swallows its digits
      ("card 9876543210 twice 1234567890", 4L),
      (null: String, 5L))
      .toDF("text", "doc_id")
    val out = TextPipeline.withPiiRedaction(df)
      .select("doc_id", "n_urls", "n_emails", "n_longnums", "redacted").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(out(1L) === ((0L, 0L, 0L, "plain words only")))
    assert(out(2L) === ((0L, 1L, 0L, "mail me at <EMAIL> now")))
    // the URL (replaced first) swallows its own digits AND the '?b=' part;
    // the standalone email still counts; no long number survives
    assert(out(3L) === ((1L, 1L, 0L, "see <URL> and <EMAIL>")))
    assert(out(4L) === ((0L, 0L, 2L, "card <NUM> twice <NUM>")))
    assert(out(5L) === ((0L, 0L, 0L, "")))
  }

  test("winnow overlap pairs: document-frequency cap suppresses hot boilerplate fingerprints") {
    import spark.implicits._
    // 20 docs all share fp 999 (a boilerplate header); docs 1 and 2 also
    // share two genuine fps. The inverted-index join is O(df^2) per fp, so
    // the cap must drop 999 while leaving genuine overlap intact.
    val fp = (1L to 20L).map { id =>
      val own = Seq(id * 1000L, id * 1000L + 1L)
      val genuine = if (id <= 2L) Seq(100L, 101L) else Seq.empty[Long]
      (id, s"src${id % 2}", (Seq(999L) ++ genuine ++ own).toArray)
    }.toDF("doc_id", "source", "fps")
    // cap inactive (fixture df 20 <= 1000): the hot fp contributes shared
    // counts — every pair shares >= 1, only (1,2) reaches minShared 2
    val uncapped = TextPipeline.winnowOverlapPairs(fp, "doc_id", "source", minShared = 1)
      .collect()
    assert(uncapped.length === 190, s"expected all 190 pairs via the hot fp")
    // cap active: fp 999 (df 20 > 10) is dropped entirely -> only the
    // genuine pair remains, even at minShared 1
    val capped = TextPipeline.winnowOverlapPairs(fp, "doc_id", "source",
        minShared = 1, maxDf = 10L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(capped.toSeq === Seq((1L, 2L, 2L)))
    // value-identity when the cap is above every df (the fixture regime)
    val wide = TextPipeline.winnowOverlapPairs(fp, "doc_id", "source",
        minShared = 2, maxDf = 1000L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val none = TextPipeline.winnowOverlapPairs(fp, "doc_id", "source", minShared = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(wide === none && wide === Set((1L, 2L, 3L)))
  }
}
