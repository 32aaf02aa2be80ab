package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Extracted per-media features (the typed output schema a real decoder
  * would produce). */
case class MediaFeatures(
    media_id: Long,
    n_bytes: Long,
    byte_mean: Double,
    distinct_bytes: Long,
    head_hash: Long)

/** A decoded-and-embedded media row: resized dims + feature vector. */
case class MediaVec(media_id: Long, rw: Int, rh: Int, feat: Array[Double])

/** Multimodal column support (SURVEY §2 E56 [N]): media (image/audio/video)
  * travel as opaque `binary` columns beside typed metadata structs; decode /
  * feature-extract runs partition-batched over the binary payloads.
  *
  * The decode step is a STUB — media codecs are not available in this
  * container — but everything Spark-side is real: binary column handling,
  * the `mapPartitions` batch shape (one iterator per partition ≅ Arrow
  * batches under `mapInPandas`), the typed output Encoder, and partition
  * sizing. Swapping `decodeStub` for a JPEG/PCM decoder changes no plan
  * shape. At 100 TB the binary column rides its own parquet chunk pages, so
  * metadata-only queries never touch the blobs (column pruning).
  */
object Multimodal {

  /** STUB decoder: deterministic features from raw bytes, standing in for
    * e.g. image decode + pooling. Replace with a real codec off-container. */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    var sum = 0L
    var hash = 1125899906842597L // deterministic FNV-ish rolling head hash
    val head = math.min(bytes.length, 16)
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    i = 0
    while (i < head) { hash = hash * 31 + (bytes(i) & 0xff); i += 1 }
    MediaFeatures(id, bytes.length.toLong,
      if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length,
      bytes.map(b => b & 0xff).distinct.length.toLong, hash)
  }

  /** Partition-batched feature extraction over (id, blob) rows. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      idCol: String, blobCol: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeStub(id, if (bytes == null) Array.emptyByteArray else bytes)
      })
  }

  /** "Decode + resize + embed" over a 64-row BATCH — the vectorized-
    * decoder call shape (mapInPandas' Arrow batches, in Scala form): the
    * partition iterator is consumed in fixed batches, each handed to the
    * decoder as a unit. The stub here is md5-based ON PURPOSE: unlike
    * [[decodeStub]]'s FNV hash (q67, rows-only), md5 is computable in
    * SQL, so the WHOLE multimodal pipeline — binary payloads, batch
    * plumbing, typed Encoder, downstream aggregation — hash-checks
    * against a DuckDB twin (q252). Features are hex32/2^32 ∈ [0,1)
    * (exactly representable doubles); resize clamps to 224. */
  def decodeBatch(batch: Seq[(Long, Array[Byte], Int, Int)]): Seq[MediaVec] =
    batch.map { case (id, bytes, w, h) =>
      val feat = Array.tabulate(8) { k =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(bytes ++ s":$k".getBytes("UTF-8"))
        val hex = d.take(4).map(b => f"$b%02x").mkString
        java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
      }
      MediaVec(id, math.min(w, 224), math.min(h, 224), feat)
    }

  /** Partition-batched decode: 64-row batches, typed output. */
  def extractVecs(spark: SparkSession, media: DataFrame, idCol: String,
                  blobCol: String, wCol: String, hCol: String): Dataset[MediaVec] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(blobCol).cast("binary"),
        col(wCol).cast("int"), col(hCol).cast("int"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions(_.grouped(64).flatMap(b => decodeBatch(b.toSeq)))
  }

  /** Build the multimodal frame: blob + typed metadata + embedding struct
    * (documents ⋈ embeddings on doc_id = vec_id). */
  def multimodalTable(docs: DataFrame, emb: DataFrame): DataFrame =
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(col("doc_id"),
        struct(
          encode(col("text"), "utf-8").as("blob"),
          struct(col("lang"), col("source"), col("n_chars")).as("meta"),
          col("embedding").as("vec")).as("payload"))
}
