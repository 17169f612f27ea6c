package graft

import org.apache.spark.sql.functions._
import graft.ops.{Multimodal, VectorSearch}

/** The multimodal plumbing beyond decode (r6): resize geometry, video
  * frame-sample fan-out, and the feature-extract boundary whose output
  * feeds the ANN operators directly.
  */
class MultimodalSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf0001)

  test("resize stub: aspect-preserving letterbox into the target canvas") {
    val rows = Multimodal.resizeStub(docs, "doc_id", "text", 224, 224).collect()
    assert(rows.length === docs.count())
    rows.foreach { r =>
      val (ow, oh) = (r.getInt(3), r.getInt(4))
      val (px, py) = (r.getInt(6), r.getInt(7))
      assert(ow <= 224 && oh <= 224, r.toString)
      // letterbox: at least one output dimension fills the canvas
      assert(ow == 224 || oh == 224 || math.max(ow, oh) >= 223, r.toString)
      assert(px >= 0 && py >= 0 && px + ow <= 224 && py + oh <= 224, r.toString)
      // exact letterbox geometry: out dims are the rounded scaled src dims
      val scale = math.min(224.0 / r.getInt(1), 224.0 / r.getInt(2))
      assert(ow === math.max(1, math.rint(r.getInt(1) * scale).toInt), r.toString)
      assert(oh === math.max(1, math.rint(r.getInt(2) * scale).toInt), r.toString)
    }
  }

  test("frame sampling fans out one row per kept frame with the declared stride") {
    val frameBytes = 64
    val every = 4
    val out = Multimodal.frameSampleStub(docs, "doc_id", "text", frameBytes, every)
    val counts = out.groupBy("doc_id").agg(count(lit(1)).as("n"),
        collect_list("frame_idx").as("idxs"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Int](2))).toMap
    val lens = docs.select(col("doc_id"),
        length(to_binary(col("text"), lit("utf-8"))).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts.nonEmpty)
    lens.foreach { case (id, len) =>
      val nFrames = (len + frameBytes - 1) / frameBytes
      val expected = (0 until nFrames).count(_ % every == 0)
      val (n, idxs) = counts.getOrElse(id, (0L, Seq.empty[Int]))
      assert(n === expected.toLong, s"doc $id: $n frames, expected $expected")
      assert(idxs.forall(_ % every == 0), s"doc $id idxs $idxs")
    }
  }

  test("feature-extract stub: unit vectors, content-determined, ANN-ready") {
    val emb = Multimodal.embedStub(docs, "doc_id", "text")
    val rows = emb.collect()
    assert(rows.length === docs.count())
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v.length === 64)
      val nrm = math.sqrt(v.map(f => f.toDouble * f).sum)
      assert(math.abs(nrm - 1.0) < 1e-3, s"norm $nrm")
    }
    // identical payloads embed identically (content-seeded, not id-seeded)
    val twin = docs.limit(1).select(lit(900001L).as("doc_id"), col("text"))
      .unionByName(docs.limit(1).select(lit(900002L).as("doc_id"), col("text")))
    val twinSigs = Multimodal.embedStub(twin, "doc_id", "text")
      .collect().map(_.getSeq[Float](1))
    assert(twinSigs.length === 2)
    assert(twinSigs(0) === twinSigs(1), "identical payloads must embed identically")

    // end-to-end: the stub's output is shape-compatible with the ANN path
    val knn = VectorSearch.cosineKnn(emb, "vec_id", "embedding", col("id") < 5, 3)
    assert(knn.count() === 15)
  }
}
