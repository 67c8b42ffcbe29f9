package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.Webtext.mix64

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata, plus decode / feature-extract plumbing.
  *
  * The actual codec step is STUBBED (this container ships no image/audio
  * libraries): [[decodeStub]] parses our deterministic fake header instead of
  * calling a real decoder. Everything AROUND the stub is real Spark: binary
  * column synthesis, schema, partition-friendly batch iteration
  * (mapPartitions — the Scala analog of mapInPandas batches), and the
  * feature-vector schema a downstream ANN stage consumes.
  */
object MultiModal {

  val Magic: Int = 0x47494D47 // "GIMG"

  /** Deterministic fake "image": 16-byte header
    * [magic i32][width i32][height i32][format u8][pad 3] + payload bytes
    * derived from the seed. Width/height/format are pure functions of id so
    * the DuckDB oracle can recompute them without parsing binary.
    */
  def synthBlob(id: Long): Array[Byte] = {
    val width = (id % 1920 + 16).toInt
    val height = (id % 1080 + 16).toInt
    val format = (id % 3).toInt // 0=rgb8, 1=gray8, 2=rgba8
    val payloadLen = 64
    val bb = java.nio.ByteBuffer.allocate(16 + payloadLen)
    bb.putInt(Magic).putInt(width).putInt(height)
      .put(format.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    var x = mix64(id)
    for (_ <- 0 until payloadLen) { x = mix64(x); bb.put((x & 0xff).toByte) }
    bb.array()
  }

  case class ImageMeta(width: Int, height: Int, format: String, payloadBytes: Int)

  /** DECODE STUB — a real implementation would hand `blob` to an image codec
    * here; we parse the deterministic fake header. Signature and batch shape
    * are what a real decoder plugs into.
    */
  def decodeStub(blob: Array[Byte]): Option[ImageMeta] = {
    if (blob == null || blob.length < 16) return None
    val bb = java.nio.ByteBuffer.wrap(blob)
    if (bb.getInt() != Magic) return None
    val w = bb.getInt(); val h = bb.getInt()
    val fmt = bb.get() match {
      case 0 => "rgb8"; case 1 => "gray8"; case 2 => "rgba8"; case _ => "unknown"
    }
    Some(ImageMeta(w, h, fmt, blob.length - 16))
  }

  /** Feature extraction stub: 8-bin byte histogram of the payload, L1
    * normalized — stands in for a CNN embedding; batch-iterated per partition
    * like a real model-server call would be.
    */
  def featuresStub(blob: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](8)
    if (blob == null || blob.length <= 16) return hist
    var i = 16
    while (i < blob.length) { hist((blob(i) & 0xff) >>> 5) += 1f; i += 1 }
    val s = hist.sum
    if (s > 0) { var j = 0; while (j < 8) { hist(j) /= s; j += 1 } }
    hist
  }

  /** Attach a synthetic binary media column to a docs frame (plumbing demo +
    * test input). Real pipelines read these bytes from the lake.
    */
  def withMediaColumn(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val blobUdf = udf((id: Long) => synthBlob(id))
    docs.withColumn("media", blobUdf(col(idCol)))
  }

  /** Decode + feature-extract over the binary column, batched per partition
    * (mapPartitions = the JVM analog of a pandas-batch UDF: amortizes any
    * per-batch model/codec setup across rows).
    */
  def decodeMedia(spark: SparkSession, docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would initialize the codec/model ONCE here
        it.map { case (id, blob) =>
          val meta = decodeStub(blob)
          val feats = featuresStub(blob)
          (id, meta.map(_.width).getOrElse(-1), meta.map(_.height).getOrElse(-1),
            meta.map(_.format).getOrElse("invalid"),
            meta.map(_.payloadBytes).getOrElse(0), feats.toSeq)
        }
      }
      .toDF("doc_id", "width", "height", "format", "payload_bytes", "features")
  }
}
