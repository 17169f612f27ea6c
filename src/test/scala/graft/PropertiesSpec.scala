package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.ops.SimilarityJoin

/** Property-based correctness (SURVEY §5.3): the filtered similarity-join
  * pipelines must equal a brute-force Scala reference on random corpora —
  * across τ values where sz·τ is often integral (τ = 0.5, 0.75), the
  * FP-boundary cases the round-1 ADVICE flagged for the prefix/length
  * bounds. Corpora come from a fixed-seed generator, so failures replay.
  */
class PropertiesSpec extends SparkSpec {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "lam", "mu")

  private def randomCorpus(rng: scala.util.Random): List[List[String]] = {
    val n = 4 + rng.nextInt(21)
    List.fill(n)(List.fill(1 + rng.nextInt(8))(vocab(rng.nextInt(vocab.size))))
  }

  private def bruteForce(docs: Seq[Set[String]], tau: Double): Set[(Long, Long, Double)] =
    (for {
      i <- docs.indices; j <- docs.indices if i < j
      inter = (docs(i) intersect docs(j)).size
      sim = inter.toDouble / (docs(i).size + docs(j).size - inter)
      if sim >= tau
    } yield (i.toLong, j.toLong, math.rint(sim * 1e6) / 1e6)).toSet

  private def toDf(docs: Seq[Seq[String]]) = {
    val rows = docs.zipWithIndex.map { case (toks, i) =>
      Row(i.toLong, toks.mkString(" "), "b")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("blk", StringType))))
  }

  test("exact and prefix-filtered joins both equal brute force at integer-prone taus") {
    val rng = new scala.util.Random(42)
    val taus = Seq(0.5, 0.6, 0.75, 0.8)
    for (trial <- 1 to 12) {
      val docs = randomCorpus(rng)
      val tau = taus(rng.nextInt(taus.size))
      val df = toDf(docs)
      val sets = docs.map(_.toSet)
      val expected = bruteForce(sets, tau)
      val exact = SimilarityJoin.jaccardSelf(df, "doc_id", "text", Seq("blk"), tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val prefix = SimilarityJoin.jaccardSelfPrefix(df, "doc_id", "text", Seq("blk"), tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(exact === expected, s"trial $trial tau $tau exact")
      assert(prefix === expected, s"trial $trial tau $tau prefix")
    }
  }

  test("R-S exact and prefix-filtered joins equal brute force on random corpora") {
    val rng = new scala.util.Random(4242)
    val taus = Seq(0.5, 0.6, 0.75)
    for (trial <- 1 to 8) {
      val qDocs = randomCorpus(rng)
      val dDocs = randomCorpus(rng)
      val tau = taus(rng.nextInt(taus.size))
      // distinct id spaces so q_id != d_id never accidentally matches
      val qDf = toDf(qDocs).withColumn("doc_id",
        org.apache.spark.sql.functions.col("doc_id") + 1000L)
      val dDf = toDf(dDocs)
      val qSets = qDocs.map(_.toSet)
      val dSets = dDocs.map(_.toSet)
      val expected = (for {
        i <- qSets.indices; j <- dSets.indices
        inter = (qSets(i) intersect dSets(j)).size
        sim = inter.toDouble / (qSets(i).size + dSets(j).size - inter)
        if sim >= tau
      } yield (i.toLong + 1000L, j.toLong, math.rint(sim * 1e6) / 1e6)).toSet
      val exact = SimilarityJoin.jaccardRS(qDf, dDf, "doc_id", "text", Seq("blk"), tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val prefix = SimilarityJoin.jaccardRSPrefix(qDf, dDf, "doc_id", "text", Seq("blk"), tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(exact === expected, s"trial $trial tau $tau R-S exact")
      assert(prefix === expected, s"trial $trial tau $tau R-S prefix")
    }
  }

  test("containment R-S equals brute force on random corpora") {
    val rng = new scala.util.Random(777)
    def shingles(toks: Seq[String]): Set[String] =
      if (toks.size < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    for (trial <- 1 to 8) {
      val qDocs = randomCorpus(rng)
      val dDocs = randomCorpus(rng)
      val tau = Seq(0.4, 0.5, 0.75)(rng.nextInt(3))
      val qDf = toDf(qDocs).withColumn("doc_id",
        org.apache.spark.sql.functions.col("doc_id") + 1000L)
      val expected = (for {
        i <- qDocs.indices
        sq = shingles(qDocs(i)) if sq.nonEmpty
        j <- dDocs.indices
        c = (sq intersect shingles(dDocs(j))).size.toDouble / sq.size
        if c >= tau - 1e-9
      } yield (i.toLong + 1000L, j.toLong, math.rint(c * 1e6) / 1e6)).toSet
      val got = SimilarityJoin.containmentRS(qDf, toDf(dDocs), "doc_id", "text", Nil, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === expected, s"trial $trial tau $tau")
    }
  }

  test("jaccard bounds: every emitted sim is within [tau, 1]") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 6) {
      val sims = SimilarityJoin
        .jaccardSelf(toDf(randomCorpus(rng)), "doc_id", "text", Seq("blk"), 0.5)
        .collect().map(_.getDouble(2))
      assert(sims.forall(s => s >= 0.5 - 1e-9 && s <= 1.0 + 1e-9))
    }
  }

  test("bucketized interval join equals the direct theta join (incl. boundary cases)") {
    import org.apache.spark.sql.functions._
    val pts = Tables.lineitem(spark, sf0001)
      .filter(col("l_quantity") >= 49.5)
      .select("l_orderkey", "l_linenumber", "l_shipdate")
    val ivs = Tables.orders(spark, sf0001)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"),
        (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("o_end"))
    val direct = pts.join(ivs,
        col("l_shipdate") >= col("o_orderdate") && col("l_shipdate") < col("o_end"))
      .select("l_orderkey", "l_linenumber", "o_orderkey")
      .collect().map(_.toString).sorted.toSeq
    // widths that do NOT divide the interval length exercise the
    // bucket-spill edge; 1-day width forces multi-bucket intervals
    for (w <- Seq(86400L, 5L * 86400, 7L * 86400, 11L * 86400)) {
      val bucketed = graft.ops.RangeJoin.pointInInterval(
          pts, ivs, "l_shipdate", "o_orderdate", "o_end", w)
        .select("l_orderkey", "l_linenumber", "o_orderkey")
        .collect().map(_.toString).sorted.toSeq
      assert(bucketed === direct, s"width $w")
    }
    assert(direct.nonEmpty)
  }

  test("bucketized interval join keeps sub-second matches near an exclusive hi (r7)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // p shares hi's fractional second but precedes the exclusive bound:
    // unix_timestamp truncation used to drop hi's own bucket and MISS this
    // match (ADVICE r6). Also pin the boundary exclusions around it.
    val pts = Seq(
      (1L, "2024-01-01 00:02:00.2"),  // < hi=00:02:00.5 → MUST match
      (2L, "2024-01-01 00:02:00.5"),  // == hi (exclusive) → must NOT match
      (3L, "2024-01-01 00:00:00.0"),  // == lo (inclusive) → MUST match
      (4L, "2024-01-01 00:02:01.0")   // past hi's second → must NOT match
    ).toDF("p_id", "s").select(col("p_id"), col("s").cast("timestamp").as("p_ts"))
    val ivs = Seq((10L, "2024-01-01 00:00:00.0", "2024-01-01 00:02:00.5"))
      .toDF("iv_id", "lo_s", "hi_s")
      .select(col("iv_id"), col("lo_s").cast("timestamp").as("lo"),
        col("hi_s").cast("timestamp").as("hi"))
    val got = graft.ops.RangeJoin.pointInInterval(pts, ivs, "p_ts", "lo", "hi", 60L)
      .select("p_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(1L, 3L))
  }

  test("degenerate inputs: every operator family returns empty, never throws (r7)") {
    import spark.implicits._
    import graft.ops._
    val emptyDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "blk")
    val oneDoc = Seq((1L, "alpha beta gamma", "x")).toDF("doc_id", "text", "blk")
    // similarity joins on empty / single-row inputs
    assert(SimilarityJoin.jaccardSelf(emptyDocs, "doc_id", "text", Seq("blk"), 0.5).isEmpty)
    assert(SimilarityJoin.jaccardSelf(oneDoc, "doc_id", "text", Seq("blk"), 0.5).isEmpty)
    assert(SimilarityJoin.jaccardSelfPrefix(emptyDocs, "doc_id", "text", Seq("blk"), 0.5).isEmpty)
    assert(SimilarityJoin.jaccardRS(emptyDocs, oneDoc, "doc_id", "text", Seq("blk"), 0.5).isEmpty)
    // containment: queries whose every doc is too short for a 3-gram
    val short = Seq((9L, "just two", "x")).toDF("doc_id", "text", "blk")
    assert(SimilarityJoin.containmentRS(short, oneDoc, "doc_id", "text", Nil, 0.5).isEmpty)
    // graph: empty edge list converges to an empty labeling
    val noEdges = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(GraphOps.connectedComponents(noEdges, "a_id", "b_id").isEmpty)
    // retrieval: query vocabulary absent from the corpus scores nothing
    val alien = Seq((1L, "zz yy xx")).toDF("q_id", "text")
    assert(Bm25.scoreRS(alien, "q_id", "text", oneDoc, "doc_id", "text", 5).isEmpty)
    assert(TfIdf.cosineRS(alien, "q_id", "text", oneDoc, "doc_id", "text", 5).isEmpty)
    // vector search: empty query predicate
    val emb = Tables.embeddings(spark, sf0001)
    assert(VectorSearch.cosineKnn(emb, "vec_id", "embedding",
      org.apache.spark.sql.functions.col("id") < 0, 3).isEmpty)
    // r8 additions: alternating-star on empty edges; interval join with an
    // empty side (both directions)
    assert(GraphOps.connectedComponentsAlternating(noEdges, "a_id", "b_id").isEmpty)
    val ev = Seq((1L, 5L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val noEv = Seq.empty[(Long, Long, java.sql.Timestamp)]
      .toDF("event_id", "user_id", "ts")
    assert(graft.streaming.StreamJoin.attributionJoin(noEv, ev, 24).isEmpty)
    assert(graft.streaming.StreamJoin.attributionJoin(ev, noEv, 24).isEmpty)
    // r8 late additions: enrichment with an empty stream is empty; with an
    // empty dim it keeps every event (left semantics — never drops traffic)
    val dim = Seq((5L, "BUILDING")).toDF("c_custkey", "c_mktsegment")
    val noDim = Seq.empty[(Long, String)].toDF("c_custkey", "c_mktsegment")
    assert(graft.streaming.StreamJoin.enrichJoin(noEv, dim, "user_id", "c_custkey").isEmpty)
    val kept = graft.streaming.StreamJoin.enrichJoin(ev, noDim, "user_id", "c_custkey")
    assert(kept.count() === 1 && kept.select("c_mktsegment").head.isNullAt(0))
  }

  test("dedup idempotence: dedup(dedup(x)) == dedup(x)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    def dedup(df: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy(lower(trim(col("text")))).orderBy(col("doc_id"))
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    }
    val docs = Tables.documents(spark, sf0001)
    val once = dedup(docs)
    val twice = dedup(once)
    assert(twice.count() === once.count())
    assert(twice.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      once.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("levenshtein is a metric on sampled part-name triples (triangle inequality)") {
    import org.apache.spark.sql.functions._
    val names = Tables.part(spark, sf0001).select("p_name")
      .limit(30).collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // Spark's built-in agrees with the reference implementation
    val spk = Tables.part(spark, sf0001).limit(30)
      .select(levenshtein(col("p_name"), reverse(col("p_name"))).as("d"), col("p_name"))
      .collect().map(r => r.getString(1) -> r.getInt(0)).toMap
    names.foreach { n => assert(spk(n) === lev(n, n.reverse)) }
    // triangle inequality on sampled triples
    for (a <- names.take(10); b <- names.slice(10, 20); c <- names.slice(20, 30))
      assert(lev(a, c) <= lev(a, b) + lev(b, c))
  }
}
