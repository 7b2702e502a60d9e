package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: opaque `binary` payloads with typed
  * metadata, plus decode / feature-extract / frame-sample operators.
  *
  * The container has no image/audio codecs, so the byte-level decode is a
  * clearly-marked DETERMINISTIC STUB (byte statistics standing in for
  * pixel/sample decoding) — but the Spark-side plumbing is real and
  * tested: binary column representation, metadata struct schema, the
  * `mapPartitions` batch shape a Pandas-UDF/Arrow pipeline would use, and
  * partition-preserving execution.
  *
  * Scale: payloads stay columnar (parquet binary), metadata extraction is
  * pure column arithmetic (codegen'd), and the decode stage processes
  * rows partition-by-partition with no shuffle — exactly how a real
  * `mapInPandas`/Arrow decode fleet runs at 100 TB.
  */
object Multimodal {

  val metadataType: StructType = StructType(Seq(
    StructField("modality", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Wrap documents into multimodal rows: payload = UTF-8 bytes of the
    * text (the sandbox's stand-in for real media bytes), metadata derived
    * deterministically (modality by id, synthetic dims from byte length).
    */
  def attachPayload(docs: DataFrame): DataFrame = {
    val nb = octet_length(col("text").cast("binary")).cast("long")
    docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        nb.as("n_bytes"),
        md5(col("text").cast("binary")).as("checksum"),
        (nb % 640).cast("int").as("width"),
        ((nb * 7) % 480).cast("int").as("height"),
        (nb % 30 + 1).cast("int").as("n_frames")).as("meta"))
  }

  /** Column-level metadata projection (portable; this is what the oracle
    * checks).
    */
  def metadata(docs: DataFrame): DataFrame =
    attachPayload(docs).select(col("doc_id"),
      col("meta.modality").as("modality"), col("meta.n_bytes").as("n_bytes"),
      col("meta.checksum").as("checksum"), col("meta.width").as("width"),
      col("meta.height").as("height"), col("meta.n_frames").as("n_frames"))

  /** Frame sampling: ≤4 evenly spaced frame indices per "video" payload —
    * pure `sequence`/`explode`, no driver loop.
    */
  def frameSample(docs: DataFrame, maxFrames: Int = 4): DataFrame =
    attachPayload(docs)
      .filter(col("meta.modality") === "video")
      .withColumn("step",
        expr(s"greatest(1, (meta.n_frames + ${maxFrames - 1}) div $maxFrames)").cast("int"))
      .select(col("doc_id"), col("meta.n_frames").as("n_frames"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, col("step"))).as("frame_idx"))

  /** The decode stage: partition-wise batch processing over the binary
    * payload. REAL plumbing, STUB math — `decodeBytes` is where an image
    * library would run; here it computes deterministic byte statistics
    * (the ??? of this sandbox, see class doc).
    */
  def decodeFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    val withPayload = attachPayload(docs).select("doc_id", "payload")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("mean_byte", DoubleType),
      StructField("min_byte", IntegerType),
      StructField("max_byte", IntegerType),
      StructField("n_bytes", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    withPayload.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        val (sum, mn, mx) = decodeBytes(bytes)
        Row(r.getAs[Long]("doc_id"),
          if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
          mn, mx, bytes.length.toLong)
      }
    }(enc)
  }

  /** STUB: stands in for `image.decode(bytes)` — deterministic byte
    * statistics (sum, min, max as unsigned).
    */
  private def decodeBytes(bytes: Array[Byte]): (Long, Int, Int) = {
    var sum = 0L; var mn = 256; var mx = -1
    var i = 0
    while (i < bytes.length) {
      val u = bytes(i) & 0xff
      sum += u; if (u < mn) mn = u; if (u > mx) mx = u
      i += 1
    }
    (sum, if (mn == 256) 0 else mn, if (mx == -1) 0 else mx)
  }
}
