package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed,
  * per-record metadata extracted by batched per-partition decoders.
  *
  * The Spark-side architecture is the real deliverable here — binary
  * columns, a typed Dataset boundary, and `mapPartitions` so a decoder
  * amortizes its setup (codec init, model load) once per partition, the
  * Scala analogue of a batched `mapInPandas` UDF. The decode itself is a
  * clearly-marked deterministic STUB (no image/audio codecs exist in this
  * environment): it derives fake dimensions from payload bytes, so the
  * pipeline is testable end-to-end and swapping in a real codec touches
  * only `decodeOne`.
  */
object Multimodal {

  /** Typed decoder output: what a real image decode would yield. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      header: String, // first 8 payload bytes, lowercase hex (magic-number slot)
      width: Int,
      height: Int,
      aspect: Double)

  /** STUB decode — deterministic fake standing in for an image codec.
    * Replace the body with a real decoder (JavaCV, TwelveMonkeys, …) when
    * codecs are available; everything upstream/downstream stays unchanged.
    */
  private def decodeOne(id: Long, payload: Array[Byte]): MediaMeta = {
    val w = 1 + (payload.length % 64)
    val h = 1 + (payload.length % 48)
    MediaMeta(
      doc_id = id,
      n_bytes = payload.length,
      header = payload.take(8).map(b => f"$b%02x").mkString,
      width = w,
      height = h,
      aspect = math.rint(w.toDouble / h * 1e6) / 1e6)
  }

  /** Binary ingestion + per-partition batched decode over any table with an
    * id column and a payload source column (here: utf-8 bytes of `text`,
    * standing in for image bytes read from object storage).
    */
  def decodeStub(docs: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(col(idCol).cast("long").as("id"),
        to_binary(col(payloadCol), lit("utf-8")).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition one-time decoder setup would go here
        it.map { case (id, payload) => decodeOne(id, payload) }
      }
      .toDF()
  }

  /** Resize metadata: the letterbox geometry a real resizer would apply. */
  final case class ResizeMeta(
      doc_id: Long, src_w: Int, src_h: Int,
      out_w: Int, out_h: Int, scale: Double, pad_x: Int, pad_y: Int)

  /** STUB resize — computes the aspect-preserving letterbox placement into
    * a (targetW × targetH) canvas from the stub-decoded dimensions. A real
    * implementation would also emit the resampled pixel buffer; the
    * geometry math (the testable part) is exact and engine-side identical.
    */
  def resizeStub(docs: DataFrame, idCol: String, payloadCol: String,
                 targetW: Int, targetH: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(col(idCol).cast("long").as("id"),
        to_binary(col(payloadCol), lit("utf-8")).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val m = decodeOne(id, payload)
          val scale = math.min(targetW.toDouble / m.width, targetH.toDouble / m.height)
          val ow = math.max(1, math.rint(m.width * scale).toInt)
          val oh = math.max(1, math.rint(m.height * scale).toInt)
          ResizeMeta(id, m.width, m.height, ow, oh,
            math.rint(scale * 1e6) / 1e6, (targetW - ow) / 2, (targetH - oh) / 2)
        }
      }
      .toDF()
  }

  /** One sampled frame of a (fake) video payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Int, header: String)

  /** STUB frame sampling — treats the payload as fixed-size frames and
    * keeps every `every`-th one, emitting ONE ROW PER SAMPLED FRAME (the
    * fan-out shape of real video ingestion: mapPartitions with a
    * flatMap-style iterator, so a partition's decoder is still initialized
    * once however many frames it yields).
    */
  def frameSampleStub(docs: DataFrame, idCol: String, payloadCol: String,
                      frameBytes: Int = 64, every: Int = 4): DataFrame = {
    require(frameBytes > 0 && every > 0)
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(col(idCol).cast("long").as("id"),
        to_binary(col(payloadCol), lit("utf-8")).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          payload.grouped(frameBytes).zipWithIndex
            .filter(_._2 % every == 0)
            .map { case (frame, idx) =>
              Frame(id, idx, frame.length,
                frame.take(8).map(b => f"$b%02x").mkString)
            }
        }
      }
      .toDF()
  }

  /** STUB feature extraction — a deterministic pseudo-embedding standing in
    * for per-partition model inference (the "model load once, infer
    * batched" boundary). Output is a unit-normalized `array<float>` with
    * the SAME shape as the embeddings table, so it flows straight into the
    * ANN operators ([[VectorSearch.cosineKnn]] / LSH / IVF) — the
    * image→embedding→near-dup pipeline end to end, pinned in
    * MultimodalSpec.
    */
  def embedStub(docs: DataFrame, idCol: String, payloadCol: String,
                dim: Int = 64): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(col(idCol).cast("long").as("id"),
        to_binary(col(payloadCol), lit("utf-8")).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition one-time model load would go here
        it.map { case (id, payload) =>
          // splitmix64 stream seeded by payload content (not id): identical
          // payloads embed identically — exactly what near-dup needs
          var x = payload.foldLeft(0x9e3779b97f4a7c15L)((a, b) => (a * 31) ^ (b & 0xffL))
          val v = Array.fill(dim) {
            x += 0x9e3779b97f4a7c15L
            var z = x
            z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
            z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
            z = z ^ (z >>> 31)
            ((z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
          }
          val nrm = math.sqrt(v.map(f => f.toDouble * f).sum)
          (id, v.map(f => (f / nrm).toFloat))
        }
      }
      .toDF("vec_id", "embedding")
  }
}
