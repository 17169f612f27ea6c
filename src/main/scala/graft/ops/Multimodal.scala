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
}
