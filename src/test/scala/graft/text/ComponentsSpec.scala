package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Min-label propagation correctness: transitivity across pairs that never
  * directly collide, disjoint clusters, singletons. */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chain a-b, b-c collapses to one component; disjoint stay apart") {
    // chain 1-2-3 (1,3 never paired), pair 10-11, singleton 99
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id")
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("id1", "id2")
    val comp = Components.connectedComponents(nodes, pairs, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(comp(99L) == 99L)
  }

  test("long path converges within the iteration cap (pointer doubling, O(log d))") {
    // path 0-1-2-...-299: pure neighbor-min propagation moves the label
    // one hop per round (299 rounds — would trip the maxIter=12 cap and
    // throw); pointer doubling squares the reach per round, so ~9 rounds
    // close the 299-diameter chain.
    val n = 300
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val pairs = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("id1", "id2")
    val comp = Components.connectedComponents(nodes, pairs, "id", maxIter = 12)
      .select(countDistinct(col("component"))).collect()(0).getLong(0)
    assert(comp == 1L)
  }

  test("non-convergence at the cap throws instead of returning split clusters") {
    val n = 40
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val pairs = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("id1", "id2")
    val e = intercept[IllegalStateException] {
      Components.connectedComponents(nodes, pairs, "id", maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("carried columns survive and cluster stats aggregate correctly") {
    val nodes = Seq((1L, "en"), (2L, "en"), (3L, "fr")).toDF("id", "lang")
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val out = Components.connectedComponents(nodes, pairs, "id")
    val sizes = out.groupBy("lang", "component").agg(count(lit(1)).as("sz"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sizes(("en", 1L)) == 2L)
    assert(sizes(("fr", 3L)) == 1L)
  }
}
