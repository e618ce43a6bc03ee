package graft

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.functions.SketchFunctions
import graft.plans.GraftFunctions
import graft.operators.SketchAggs._
import graft.sources.Tokens

/** Distributed-equivalence properties through REAL Spark aggregation:
  * the Catalyst partial/final split must be byte-identical to a serial
  * build regardless of partitioning — the distributed analogue of the
  * reference's concurrent-insert ≡ serial test (tests/Main.hs:142-159).
  */
class SparkAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import SketchQueries.{K0, K1}

  val cfg = BloomConfig(K0, K1, 3, 12)

  def tokenDf(numDocs: Int, partitions: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until numDocs).map { i =>
      val toks = Array.tabulate(1 + i % 40)(j => 1 + (i * 31 + j * 7) % 500)
      (s"doc-$i", toks, toks.length, s"src${i % 3}")
    }
    spark.sparkContext.parallelize(rows, partitions)
      .toDF("doc_id", "tokens", "n_tok", "source")
  }

  def serialBloom(df: DataFrame): Array[Byte] = {
    val words = new Array[Long](cfg.l)
    df.select("tokens").collect().foreach { r =>
      r.getSeq[Int](0).foreach(t => BlockedBloom.insertInt(words, cfg, t))
    }
    BlockedBloom.toBytes(words, cfg, BlockedBloom.TypeTag.Int)
  }

  test("Bloom agg over Spark partitions is byte-identical to serial build, at any parallelism") {
    val bloomUdaf = udaf(new BloomTokensAgg(cfg), ExpressionEncoder[Array[Int]]())
    for (parts <- Seq(1, 3, 8)) {
      val df = tokenDf(500, parts)
      val distributed = df.agg(bloomUdaf(col("tokens"))).head().getAs[Array[Byte]](0)
      val serial = serialBloom(df)
      assert(java.util.Arrays.equals(distributed, serial),
        s"partial/final aggregation diverged from serial build at $parts partitions")
    }
  }

  test("Bloom agg is repartition-invariant (merge commutativity under shuffle)") {
    val bloomUdaf = udaf(new BloomTokensAgg(cfg), ExpressionEncoder[Array[Int]]())
    val df = tokenDf(500, 4)
    val a = df.agg(bloomUdaf(col("tokens"))).head().getAs[Array[Byte]](0)
    val b = df.repartition(7, col("doc_id")).agg(bloomUdaf(col("tokens"))).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("per-source sketches probe their own tokens with zero false negatives") {
    val df = tokenDf(300, 4)
    val bloomUdaf = udaf(new BloomTokensAgg(cfg), ExpressionEncoder[Array[Int]]())
    val sketches = df.groupBy(col("source")).agg(bloomUdaf(col("tokens")).as("sketch"))
    val missing = df.select(col("source"), explode(col("tokens")).as("token"))
      .join(broadcast(sketches), "source")
      .where(!SketchFunctions.bloomMightContainInt(K0, K1)(col("sketch"), col("token")))
      .count()
    assert(missing === 0L, "bloom reported a false negative through the Spark query path")
  }

  test("BloomMergeAgg merges per-source sketches into a global filter correctly") {
    val df = tokenDf(300, 4)
    val bloomUdaf = udaf(new BloomTokensAgg(cfg), ExpressionEncoder[Array[Int]]())
    val mergeUdaf = udaf(new BloomMergeAgg(K0, K1), ExpressionEncoder[Array[Byte]]())
    val global = df.groupBy(col("source")).agg(bloomUdaf(col("tokens")).as("sketch"))
      .agg(mergeUdaf(col("sketch"))).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(global, serialBloom(df)),
      "two-level merge must equal the single-level build")
  }

  test("HLL agg estimate within bound through Spark; merge-invariant") {
    val hllUdaf = udaf(new HllTokensAgg(K0, K1, 12), ExpressionEncoder[Array[Int]]())
    val df = tokenDf(2000, 5)
    val bytes = df.agg(hllUdaf(col("tokens"))).head().getAs[Array[Byte]](0)
    val est = Hll.estimate(Hll.fromBytes(bytes)._2)
    val exact = df.select(explode(col("tokens"))).distinct().count()
    assert(math.abs(est - exact) <= math.max(4 * Hll.stdError(12) * exact, 3.0),
      s"HLL est $est vs exact $exact")
    val bytes2 = df.repartition(9).agg(hllUdaf(col("tokens"))).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(bytes, bytes2), "HLL must be partitioning-invariant")
  }

  test("CMS agg counters partitioning-invariant and one-sided") {
    val cms = SketchQueries.cmsCfg
    val cmsUdaf = udaf(new CmsTokensAgg(cms), ExpressionEncoder[Array[Int]]())
    val df = tokenDf(1000, 4)
    val bytes = df.agg(cmsUdaf(col("tokens"))).head().getAs[Array[Byte]](0)
    val bytes2 = df.repartition(11).agg(cmsUdaf(col("tokens"))).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(bytes, bytes2))
    val (_, _, buf, _) = CountMin.fromBytes(bytes)
    val exact = df.select(explode(col("tokens")).as("t")).groupBy("t").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    exact.foreach { case (tok, cnt) =>
      assert(CountMin.estimateInt(buf, cms, tok) >= cnt, s"CMS underestimated $tok")
    }
  }

  test("KLL and t-digest aggs return quantiles within published bounds via Spark") {
    import spark.implicits._
    val n = 50000
    val data = new scala.util.Random(5).shuffle((1 to n).toVector).toDF("x")
      .select(col("x").cast("double").as("x")).repartition(6)
    val kllUdaf = udaf(new KllDoubleAgg(200), ExpressionEncoder[Double]())
    val kllBytes = data.agg(kllUdaf(col("x"))).head().getAs[Array[Byte]](0)
    val kll = Kll.fromBytes(kllBytes)
    assert(kll.n === n.toLong)
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(math.abs(kll.quantile(q) / n - q) <= Kll.normalizedRankError(200) * 2)
    val tdUdaf = udaf(new TDigestDoubleAgg(100), ExpressionEncoder[Double]())
    val tdBytes = data.agg(tdUdaf(col("x"))).head().getAs[Array[Byte]](0)
    val td = TDigest.fromBytes(tdBytes)
    assert(math.abs(td.n - n) < 1e-6)
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(math.abs(td.quantile(q) / n - q) <= 0.04)
  }

  test("fused agg output is byte-identical to the three individual aggregators") {
    val hllP = 12
    val cms = SketchQueries.cmsCfg
    val enc = ExpressionEncoder[Array[Int]]()
    val df = tokenDf(800, 5)
    val fusedU = udaf(new FusedTokensAgg(cfg, hllP, cms), enc)
    val fused = df.agg(fusedU(col("tokens")).as("sk")).select("sk.bloom", "sk.hll", "sk.cms").head()
    val bloom = df.agg(udaf(new BloomTokensAgg(cfg), enc)(col("tokens"))).head().getAs[Array[Byte]](0)
    val hll = df.agg(udaf(new HllTokensAgg(K0, K1, hllP), enc)(col("tokens"))).head().getAs[Array[Byte]](0)
    val cmsB = df.agg(udaf(new CmsTokensAgg(cms), enc)(col("tokens"))).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(fused.getAs[Array[Byte]](0), bloom), "fused bloom differs")
    assert(java.util.Arrays.equals(fused.getAs[Array[Byte]](1), hll), "fused hll differs")
    assert(java.util.Arrays.equals(fused.getAs[Array[Byte]](2), cmsB), "fused cms differs")
  }

  test("native TypedImperativeAggregates are byte-identical to the udaf aggregators") {
    val enc = ExpressionEncoder[Array[Int]]()
    val df = tokenDf(800, 5)
    graft.plans.NativeAggs.register(spark, bloomK = cfg.k, bloomLog2l = cfg.log2l)
    val udafBloom = df.agg(udaf(new BloomTokensAgg(cfg), enc)(col("tokens"))).head().getAs[Array[Byte]](0)
    val nativeBloom = df.agg(graft.plans.NativeAggs.bloomTokensNative(col("tokens"))).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(nativeBloom, udafBloom), "native bloom differs from udaf bloom")
    val fusedU = udaf(new FusedTokensAgg(cfg, 12, SketchQueries.cmsCfg), enc)
    val udafFused = df.agg(fusedU(col("tokens")).as("sk")).select("sk.bloom", "sk.hll", "sk.cms").head()
    val nativeFused = df.agg(graft.plans.NativeAggs.fusedTokensNative(col("tokens")).as("sk"))
      .select("sk.bloom", "sk.hll", "sk.cms").head()
    for (i <- 0 until 3)
      assert(java.util.Arrays.equals(
        nativeFused.getAs[Array[Byte]](i), udafFused.getAs[Array[Byte]](i)),
        s"native fused field $i differs")
    // shuffle-path (serialize/deserialize of the native buffer) exercised
    val repart = df.repartition(9).groupBy(col("source"))
      .agg(graft.plans.NativeAggs.bloomTokensNative(col("tokens")).as("sk"))
      .agg(udaf(new BloomMergeAgg(K0, K1), ExpressionEncoder[Array[Byte]]())(col("sk")))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(repart, udafBloom))
  }

  test("native aggs: 128-bit-config bloom matches udaf; fused rejects >64-bit configs; SQL arity errors") {
    val enc = ExpressionEncoder[Array[Int]]()
    val df = tokenDf(400, 3)
    // 6*13 + 10 = 88 > 64: 128-bit hash path through the native agg
    val cfg128 = BloomConfig(K0, K1, 13, 10)
    graft.plans.NativeAggs.register(spark, bloomK = 13, bloomLog2l = 10)
    val nat = df.agg(graft.plans.NativeAggs.bloomTokensNative(col("tokens"))).head().getAs[Array[Byte]](0)
    val ud = df.agg(udaf(new BloomTokensAgg(cfg128), enc)(col("tokens"))).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(nat, ud), "128-bit native bloom differs from udaf")
    // fused must refuse a config whose bloom needs the 128-bit hash
    assertThrows[IllegalArgumentException](
      graft.plans.FusedTokensNative(org.apache.spark.sql.catalyst.expressions.Literal(null),
        13, 10, 12, 5, 11, K0, K1))
    // SQL arity misuse fails with a named error, not NoSuchElementException
    df.createOrReplaceTempView("native_arity_t")
    val e = intercept[Exception](
      spark.sql("SELECT graft_fused_tokens_native(tokens, n_tok) FROM native_arity_t").collect())
    assert(e.getMessage.contains("graft_fused_tokens_native") || e.getCause != null)
    // per-call bloom params through SQL
    val perCall = spark.sql(
      "SELECT graft_bloom_tokens_native(tokens, 13, 10) FROM native_arity_t").head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(perCall, ud), "per-call (k, log2l) SQL args ignored")
  }

  test("typed Dataset facade: per-source sketches + probe, no false negatives") {
    import spark.implicits._
    val ds = Tokens.table(spark, "/root/testdata/sf0.001").as[Tokens.TokenRow]
    val sketches = graft.operators.TypedSketchOps.perSourceSketches(ds)
    val rows = sketches.collect()
    assert(rows.map(_.n_rows).sum === 500L)
    rows.foreach(r => assert(r.bloom.nonEmpty && r.hll.nonEmpty && r.cms.nonEmpty))
    val probed = graft.operators.TypedSketchOps.probeOwnSource(ds, sketches)
    // no false negatives: every token of every doc is present in its sketch
    assert(probed.where(col("n_present") =!= col("n_tok")).count() === 0L)
  }

  test("driver contract: entry() returns rows on sf0.001 and every query name has a body") {
    assert(SparkEntry.entry(spark).count() > 0, "entry smoke must return rows")
    // every oracle key refers to an existing query
    SparkEntry.oracleSql.keys.foreach(k =>
      assert(SparkEntry.queries.contains(k), s"oracle $k has no query"))
  }

  test("heavy-hitter MG query: every per-source guarantee boolean true at sf0.001") {
    val rows = SketchQueries.heavyHitterMgBound(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 20)
    rows.foreach(r => assert(r.getBoolean(1), s"guarantees violated for ${r.getString(0)}"))
  }

  test("graft_heavyhitter SQL surface: summary respects capacity and dominant key ranks first") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // key 7 holds 30% of the stream; universe ~8k keys >> capacity 64
    (0 until 20000).map { i =>
      if (i % 10 < 3) 7L else 100L + (graft.core.SipHash.hashLong(1L, 2L, i.toLong) & 0x1fffL)
    }.toDF("key").createOrReplaceTempView("hh_in")
    val bytes = spark.sql("SELECT graft_heavyhitter(key) FROM hh_in").head().getAs[Array[Byte]](0)
    val s = graft.core.FrequentItems.fromBytes(bytes)
    assert(s.size <= 64)
    assert(s.total === 20000L)
    assert(s.topK(1).head._1 === 7L)
    assert(s.decremented * 64 <= s.total)
    // pure-SQL read path: the native struct-returning summary reader
    val r = spark.sql(
      """SELECT graft_heavyhitter_summary(sk).topk[0].key AS top_key,
        |       graft_heavyhitter_summary(sk).error AS d,
        |       graft_heavyhitter_summary(sk).total AS n
        |FROM (SELECT graft_heavyhitter(key) AS sk FROM hh_in)""".stripMargin).head()
    assert(r.getLong(0) === 7L)
    assert(r.getLong(1) === s.decremented && r.getLong(2) === 20000L)
    // the full struct matches the core decode: every stored entry, est-desc
    val full = spark.sql(
      """SELECT graft_heavyhitter_summary(sk) AS s
        |FROM (SELECT graft_heavyhitter(key) AS sk FROM hh_in)""".stripMargin).head()
      .getStruct(0)
    val topk = full.getSeq[org.apache.spark.sql.Row](0)
    assert(topk.length === s.size)
    assert(topk.map(e => (e.getLong(0), e.getLong(1))) === s.topK(s.capacity))
  }

  test("HeavyHittersMergeAgg: merging serialized per-group summaries keeps every guarantee") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // per-source summaries then a serialized second-level merge to global
    val xs = (0 until 30000).map { i =>
      (s"src${i % 4}", if (i % 5 < 2) (i % 8).toLong else 1000L + (i * 2654435761L % 4000))
    }
    xs.toDF("source", "key").createOrReplaceTempView("hhm_in")
    val globalBytes = spark.sql(
      """SELECT graft_heavyhitter_merge(sk) FROM
        |(SELECT graft_heavyhitter(key) AS sk FROM hhm_in GROUP BY source)""".stripMargin)
      .head().getAs[Array[Byte]](0)
    val s = graft.core.FrequentItems.fromBytes(globalBytes)
    val exact = xs.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    assert(s.total === 30000L)
    assert(s.size <= 64)
    assert(s.decremented * s.capacity <= s.total)
    s.entries.foreach { case (k, est) =>
      val t = exact.getOrElse(k, 0L)
      assert(est <= t && t <= est + s.decremented, s"merged sandwich broken at $k")
    }
    exact.foreach { case (k, t) =>
      if (t > s.decremented) assert(s.contains(k), s"heavy $k lost in serialized merge")
    }
  }

  test("weighted heavy hitters: mass-based guarantees through SQL, merge keeps them") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // key 7 carries 40% of the MASS in few rows; tail keys carry weight 1-3
    val rows = (0 until 12000).map { i =>
      if (i % 100 == 0) (7L, 400L)
      else (100L + (graft.core.SipHash.hashLong(3L, 4L, i.toLong) & 0xfffL), 1L + i % 3)
    }
    rows.toDF("key", "w").createOrReplaceTempView("hhw_in")
    val bytes = spark.sql("SELECT graft_heavyhitter_weighted(key, w) FROM hhw_in")
      .head().getAs[Array[Byte]](0)
    val s = graft.core.FrequentItems.fromBytes(bytes)
    val exact = rows.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val totalMass = rows.map(_._2).sum
    assert(s.total === totalMass)
    assert(s.decremented * s.capacity <= s.total)
    s.entries.foreach { case (k, est) =>
      val t = exact.getOrElse(k, 0L)
      assert(est <= t && t <= est + s.decremented, s"weighted sandwich broken at $k")
    }
    exact.foreach { case (k, t) =>
      if (t > s.decremented) assert(s.contains(k), s"heavy-mass key $k lost")
    }
    assert(s.topK(1).head._1 === 7L, "the dominant-mass key must rank first")
    // distributed merge over partitions keeps the guarantees
    val bytesParts = rows.toDF("key", "w").repartition(7)
      .agg(udaf(new HeavyHittersWeightedLongAgg(64),
        ExpressionEncoder[(Long, Long)]())(col("key"), col("w")))
      .head().getAs[Array[Byte]](0)
    val sp = graft.core.FrequentItems.fromBytes(bytesParts)
    assert(sp.total === totalMass && sp.decremented * sp.capacity <= sp.total)
    assert(sp.contains(7L) && sp.topK(1).head._1 === 7L)
  }

  test("HeavyHittersMergeAgg: empty payloads chain through merge levels (family convention)") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // ADVICE r3: a chained merge level can see Array.emptyByteArray (the
    // output of a merge over an empty group — the checkpoint-merge shape);
    // it must be SKIPPED, not fed to fromBytes (which requires >= 40 bytes)
    Seq(("a", 1L), ("a", 1L), ("b", 7L)).toDF("g", "key")
      .createOrReplaceTempView("hhm_empty_in")
    // level-2 merge over ZERO inputs finishes to the empty payload, not null
    val emptyOut = spark.sql(
      """SELECT graft_heavyhitter_merge(sk) FROM
        |(SELECT graft_heavyhitter(key) AS sk FROM hhm_empty_in WHERE key < 0 GROUP BY g)""".stripMargin)
      .head().getAs[Array[Byte]](0)
    assert(emptyOut != null && emptyOut.isEmpty,
      "merge over an empty group must finish to Array.emptyByteArray")
    // level-3 merge over real summaries PLUS an empty shard skips the empty
    val merged = spark.sql(
      """SELECT graft_heavyhitter_merge(sk) FROM (
        |  SELECT graft_heavyhitter(key) AS sk FROM hhm_empty_in GROUP BY g
        |  UNION ALL SELECT CAST(X'' AS BINARY) AS sk
        |)""".stripMargin)
      .head().getAs[Array[Byte]](0)
    val s = graft.core.FrequentItems.fromBytes(merged)
    assert(s.total === 3L && s.estimate(1L) === 2L && s.estimate(7L) === 1L)
  }

  test("BottomK sample agg: distributed build byte-identical to serial, SQL surface reads back") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val elems = (0L until 5000L).map(i => i * 31L % 4801L)
    // serial truth
    val (sh, sv) = BottomK.emptyBuffers(64)
    var ss = 0
    elems.foreach(e => ss = BottomK.add(sh, sv, ss, SipHash.hashLong(K0, K1, e), e))
    val serialBytes = BottomK.toBytes(sh, sv, ss, BlockedBloom.TypeTag.Long,
      SipHash.hashLong(K0, K1, K0 ^ K1))
    for (parts <- Seq(1, 3, 8)) {
      val agg = udaf(new BottomKLongAgg(K0, K1, 64), ExpressionEncoder[Long]())
      val bytes = elems.toDF("x").repartition(parts).agg(agg(col("x")))
        .head().getAs[Array[Byte]](0)
      assert(bytes.sameElements(serialBytes), s"BottomK at $parts partitions differs from serial")
    }
    // SQL surface: default-k agg + native values reader + serialized merge
    elems.map(e => (s"s${e % 3}", e)).toDF("g", "x").createOrReplaceTempView("bk_in")
    val direct = spark.sql(
      "SELECT g, graft_sample_values(graft_sample_bottomk(x)) AS vals FROM bk_in GROUP BY g")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(direct.values.forall(_.length === 64))
    direct.foreach { case (g, vals) =>
      assert(vals.forall(v => s"s${v % 3}" == g), s"sample of $g contains foreign values")
    }
    val merged = spark.sql(
      """SELECT g, graft_sample_values(graft_sample_merge(p)) AS vals FROM
        |(SELECT g, x % 5 AS shard, graft_sample_bottomk(x) AS p FROM bk_in GROUP BY g, x % 5)
        |GROUP BY g""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(merged === direct, "serialized two-level merge must reproduce the direct sample")
  }

  test("BottomK string sample agg: distributed = serial bytes, SQL read-back, merge identity") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val elems = (0 until 4000).map(i => s"doc-${i * 13 % 3701}")
    // serial truth
    val (sh, _) = BottomK.emptyBuffers(64)
    val sv = new Array[Array[Byte]](64)
    var ss = 0
    elems.foreach { e =>
      val b = e.getBytes("UTF-8")
      ss = BottomK.addG(sh, sv, ss, SipHash.hash64(K0, K1, b), b)
    }
    val serialBytes = BottomK.toBytesStr(sh, sv, ss, SipHash.hashLong(K0, K1, K0 ^ K1))
    for (parts <- Seq(1, 4)) {
      val agg = udaf(new BottomKStringAgg(K0, K1, 64), ExpressionEncoder[String]())
      val bytes = elems.toDF("x").repartition(parts).agg(agg(col("x")))
        .head().getAs[Array[Byte]](0)
      assert(bytes.sameElements(serialBytes), s"string BottomK at $parts partitions != serial")
    }
    // SQL surface + serialized merge identity
    elems.toDF("x").createOrReplaceTempView("bks_in")
    val direct = spark.sql(
      "SELECT graft_sample_strings(graft_sample_bottomk_str(x)) FROM bks_in")
      .head().getSeq[String](0)
    assert(direct.length === 64 && direct.forall(_.startsWith("doc-")))
    val merged = spark.sql(
      """SELECT graft_sample_strings(graft_sample_str_merge(p)) FROM
        |(SELECT length(x) % 3 AS shard, graft_sample_bottomk_str(x) AS p FROM bks_in
        | GROUP BY length(x) % 3)""".stripMargin)
      .head().getSeq[String](0)
    assert(merged === direct, "serialized string-sample merge must reproduce the direct sample")
  }

  test("runtime-filter queries release their persisted build side (no cache growth)") {
    val before = spark.sparkContext.getPersistentRDDs.size
    SketchQueries.bloomPrefilterSemijoin(spark, "/root/testdata/sf0.001").count()
    SketchQueries.bloomJoinLineitem(spark, "/root/testdata/sf0.001").count()
    SketchQueries.bloomPrefilterSemijoin(spark, "/root/testdata/sf0.001").count()
    SketchQueries.bloomJoinLineitem(spark, "/root/testdata/sf0.001").count()
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "repeated invocations must not accumulate persisted RDDs")
  }

  test("KMV agg over Spark partitions: retained bottom-k identical to serial build, any parallelism") {
    val kmvUdaf = udaf(new KmvTokensAgg(K0, K1, 64), ExpressionEncoder[Array[Int]]())
    // serial truth
    val serialHashes = Kmv.emptyHashes(64)
    var serialSize = 0
    tokenDf(500, 1).select("tokens").collect().foreach { r =>
      r.getSeq[Int](0).foreach(t =>
        serialSize = Kmv.add(serialHashes, serialSize, SipHash.hashInt(K0, K1, t)))
    }
    for (parts <- Seq(1, 3, 8)) {
      val bytes = tokenDf(500, parts).agg(kmvUdaf(col("tokens"))).head().getAs[Array[Byte]](0)
      val (h, s, tag, _) = Kmv.fromBytes(bytes)
      assert(tag === BlockedBloom.TypeTag.Int)
      assert(s === serialSize && h.take(s).sameElements(serialHashes.take(serialSize)),
        s"KMV at $parts partitions differs from serial build")
    }
  }

  test("KMV full SQL path: build, merge, estimate, jaccard, intersect via registered functions") {
    GraftFunctions.register(spark)
    tokenDf(400, 4).createOrReplaceTempView("kmv_docs")
    val row = spark.sql(
      """SELECT graft_kmv_estimate(graft_kmv_merge(sk)) AS g_est,
        |       graft_kmv_jaccard(min(sk), max(sk)) AS j,
        |       graft_kmv_intersect(min(sk), max(sk)) AS inter
        |FROM (SELECT source, graft_kmv_tokens(tokens) AS sk
        |      FROM kmv_docs WHERE source IN ('src0', 'src1') GROUP BY source)""".stripMargin)
      .head()
    // exact truths from the fixture
    val d = spark.sql(
      """SELECT source, collect_set(t) AS s FROM
        |(SELECT source, explode(tokens) AS t FROM kmv_docs WHERE source IN ('src0','src1'))
        |GROUP BY source ORDER BY source""".stripMargin).collect()
    val s0 = d(0).getSeq[Int](1).toSet
    val s1 = d(1).getSeq[Int](1).toSet
    val interExact = (s0 & s1).size.toDouble
    val unionExact = (s0 | s1).size.toDouble
    val se = Kmv.stdError(256)
    assert(math.abs(row.getDouble(0) - unionExact) <= 4 * se * unionExact + 3)
    assert(math.abs(row.getDouble(1) - interExact / unionExact) <= 5 * math.sqrt(0.25 / 256) + 0.01)
    assert(math.abs(row.getDouble(2) - interExact) <= 0.3 * interExact + 5)
  }

  test("serialized second-level quantile merges: per-source KLL/t-digest merged sketches stay within rank-error bound") {
    GraftFunctions.register(spark)
    tokenDf(600, 6).createOrReplaceTempView("qmerge_docs")
    // level 1: per-source serialized sketches; level 2: merge across sources
    val row = spark.sql(
      """SELECT graft_kll_quantile(graft_kll_merge(kll_sk), 0.5) AS kll_med,
        |       graft_tdigest_quantile(graft_tdigest_merge(td_sk), 0.5) AS td_med
        |FROM (SELECT source, graft_kll(CAST(n_tok AS DOUBLE)) AS kll_sk,
        |             graft_tdigest(CAST(n_tok AS DOUBLE)) AS td_sk
        |      FROM qmerge_docs GROUP BY source)""".stripMargin).head()
    val exact = tokenDf(600, 6).select("n_tok").collect().map(_.getInt(0).toDouble).sorted
    def rankOf(x: Double): Double = exact.count(_ <= x).toDouble / exact.length
    // KLL(k=200) rank error ~1.7%/sqrt... use 5% slack; t-digest mid-quantiles tighter
    assert(math.abs(rankOf(row.getDouble(0)) - 0.5) <= 0.05,
      s"merged KLL median ${row.getDouble(0)} at rank ${rankOf(row.getDouble(0))}")
    assert(math.abs(rankOf(row.getDouble(1)) - 0.5) <= 0.05,
      s"merged t-digest median ${row.getDouble(1)} at rank ${rankOf(row.getDouble(1))}")
  }

  test("sketch rollup query: daily-partial merge byte-identical to direct build, bounds hold") {
    val rows = SketchQueries.sketchRollup(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.length === 5, "five event types")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_days")) >= 1L)
      assert(r.getBoolean(r.fieldIndex("hll_merge_eq_direct")),
        s"${r.getString(0)}: HLL daily-merge must be byte-identical to direct build")
      assert(r.getBoolean(r.fieldIndex("kmv_merge_eq_direct")),
        s"${r.getString(0)}: KMV daily-merge must be byte-identical to direct build")
      assert(r.getBoolean(r.fieldIndex("est_within_bound")))
    }
  }

  test("tokens fixture: deterministic across builds (token-array equality invariant)") {
    val dir = "/root/testdata/sf0.001"
    val a = Tokens.table(spark, dir).orderBy("doc_id").collect()
    val b = Tokens.table(spark, dir).orderBy("doc_id").collect()
    assert(a.length === 500)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getSeq[Int](1) === y.getSeq[Int](1), s"tokens differ for ${x.getString(0)}")
    }
    // schema is the input_hint shape
    val schema = Tokens.table(spark, dir).schema
    assert(schema.fieldNames.toSeq === Seq("doc_id", "tokens", "n_tok", "source"))
  }
}
