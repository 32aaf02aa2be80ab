package graft.text

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization semantics (the rows-only q175's scalatest face):
  * code bounds, Lloyd-step SSE non-increase, determinism. */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val M = 4
  private val K = 16
  private lazy val emb = Tables.embeddings(spark, TestSpark.SF)

  test("codes: m per vector, each in [0, k); every vector encoded") {
    val books = Pq.train(emb, M, K)
    assert(books.count() == M.toLong * K)
    val enc = Pq.encode(emb, books, M)
    assert(enc.count() == emb.count())
    val bad = enc.filter(size(col("codes")) =!= M ||
      exists(col("codes"), c => c < 0 || c >= K)).count()
    assert(bad == 0)
    assert(enc.filter(col("sq_err") < 0).count() == 0)
  }

  test("one Lloyd step does not increase SSE vs the init codebooks") {
    // init codebooks rebuilt independently: subvectors of the k smallest
    // vec_ids, centroid_id = rank of vec_id
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val subD = dim / M
    val ids = emb.select(col("vec_id")).orderBy(col("vec_id")).limit(K)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    val ranked = ids.withColumn("cid", row_number().over(w).cast("long") - 1)
    val init = emb.join(ranked, "vec_id")
      .select(col("cid"), explode(array((0 until M).map(i =>
        struct(lit(i).as("sub"),
          slice(col("embedding"), i * subD + 1, subD).as("cv"))): _*)).as("x"))
      .select(col("x.sub").as("sub"), col("cid").as("centroid_id"),
        col("x.cv").as("cv"))
    def sse(books: org.apache.spark.sql.DataFrame): Double =
      Pq.encode(emb, books, M).agg(sum(col("sq_err"))).head().getDouble(0)
    val sseInit = sse(init)
    val sseTrained = sse(Pq.train(emb, M, K))
    assert(sseTrained <= sseInit + 1e-6,
      s"Lloyd step worsened SSE: $sseTrained > $sseInit")
    // and it genuinely moved: strictly better on this corpus
    assert(sseTrained < sseInit)
  }

  test("training is bit-stable across runs") {
    def snap() = Pq.train(emb, M, K).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2))).toSet
    assert(snap() == snap())
  }
}
