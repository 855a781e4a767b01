package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LlmQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents resolves a 40-hop chain to one cluster (pointer jumping)") {
    // Worst case for plain min-label propagation: a single path graph
    // 0-1-2-...-40 has diameter 40, so label-only propagation needs 40
    // rounds; the pointer-jumping shortcut must close it in O(log n)
    // (~6 rounds — well under the loop cap).
    val vertices = (0L to 40L).toDF("doc_id")
    val pairs = (0L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = LlmQueries.connectedComponents(vertices, pairs)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(got.length == 41)
    assert(got.forall(_._2 == 0L), s"non-minimum labels: ${got.filter(_._2 != 0L).toSeq}")
  }

  test("connectedComponents labels multiple components and isolated vertices") {
    // Two chains (10-14, reversed-orientation 20-24), one triangle with a
    // duplicate edge, and isolated vertices 1 and 2.
    val vertices = (Seq(1L, 2L) ++ (10L to 14L) ++ (20L to 24L) ++ (30L to 32L)).toDF("doc_id")
    val pairs = (
      (10L until 14L).map(i => (i, i + 1)) ++
        (20L until 24L).map(i => (i + 1, i)) ++ // orientation tolerated
        Seq((30L, 31L), (31L, 32L), (30L, 32L), (30L, 31L)) // dup edge tolerated
    ).toDF("doc_a", "doc_b")
    val got = LlmQueries.connectedComponents(vertices, pairs)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 2L)
    assert((10L to 14L).forall(got(_) == 10L))
    assert((20L to 24L).forall(got(_) == 20L))
    assert((30L to 32L).forall(got(_) == 30L))
  }

  test("connectedComponents on an empty vertex set returns empty (no NPE)") {
    val vertices = Seq.empty[Long].toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(LlmQueries.connectedComponents(vertices, pairs).count() == 0L)
  }

  test("simhash plan computes md5 once per word (no per-bit-plane rehash)") {
    // The 16 parity folds must reference the single materialized hash
    // array: exactly one md5 in the optimized plan. CollapseProject keeps
    // the alias because it is non-cheap and referenced 16 times; this
    // pins that (a regression re-inlines 16 copies).
    val plan = LlmQueries.qSimhash(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan.toString
    val n = "md5\\(".r.findAllIn(plan).length
    assert(n == 1, s"expected exactly 1 md5 in the optimized plan, found $n")
  }
}
