package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing (E56 [N]): binary payload round-trip, decode-stub
  * determinism, partition-batched extraction, metadata-only pruning. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("decodeStub is deterministic and byte-faithful") {
    val b = "hello world".getBytes("UTF-8")
    val f1 = Multimodal.decodeStub(7L, b)
    val f2 = Multimodal.decodeStub(7L, b)
    assert(f1 == f2)
    assert(f1.n_bytes == 11L)
    assert(math.abs(f1.byte_mean - b.map(_ & 0xff).sum.toDouble / 11) < 1e-12)
    assert(f1.distinct_bytes == b.map(_ & 0xff).distinct.length)
  }

  test("extractFeatures runs partition-batched over binary payloads") {
    val mm = Multimodal.multimodalTable(
      graft.Tables.documents(spark, graft.TestSpark.SF),
      graft.Tables.embeddings(spark, graft.TestSpark.SF))
    val feats = Multimodal.extractFeatures(spark,
      mm.select($"doc_id", $"payload.blob".as("blob")), "doc_id", "blob")
    val joined = feats.toDF().join(
      graft.Tables.documents(spark, graft.TestSpark.SF),
      $"media_id" === $"doc_id")
    // n_bytes from the decoder must equal n_chars metadata (ASCII corpus)
    val mismatches = joined.filter($"n_bytes" =!= $"n_chars").count()
    assert(mismatches == 0)
  }

  test("empty payload handled") {
    val f = Multimodal.decodeStub(1L, Array.emptyByteArray)
    assert(f.n_bytes == 0L && f.byte_mean == 0.0 && f.distinct_bytes == 0L)
  }
}
