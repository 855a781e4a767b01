package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom top-k-per-key operator: exact parity with the rank-window
  * formulation it replaces, the partial/final plan shape around the key
  * shuffle, and the bounded-heap semantics (ties broken by the total
  * order, k larger than a group passes the whole group through).
  */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def base = spark.read.parquet(s"$sf/lineitem.parquet")
    .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
      floor($"l_extendedprice" * (lit(1) - $"l_discount") * 100 + 0.5)
        .cast("long").as("rev_cents"))

  test("operator output equals the rank-window formulation exactly") {
    import org.apache.spark.sql.expressions.Window
    val got = TopK.perKey(base, Seq("l_suppkey"),
        Seq(("rev_cents", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
      .as[(Long, Long, Int, Long)].collect().sorted
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"rev_cents".desc, $"l_orderkey", $"l_linenumber")
    val want = base.withColumn("rn", row_number().over(w)).where($"rn" <= 3)
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"rev_cents")
      .as[(Long, Long, Int, Long)].collect().sorted
    assert(want.nonEmpty)
    assert(got.toSeq == want.toSeq)
  }

  test("plan shape: partial below the key shuffle, final above, no window/sort") {
    val df = TopK.perKey(base, Seq("l_suppkey"), Seq(("rev_cents", false),
      ("l_orderkey", true), ("l_linenumber", true)), 3)
    val plan = df.queryExecution.executedPlan
    val p = plan.toString
    assert(p.contains("TopKPerKeyPartial"), s"no partial pass in plan:\n$p")
    assert(p.contains("TopKPerKeyFinal"), s"no final pass in plan:\n$p")
    // The partial must sit BELOW the exchange (shrink before shuffle):
    // walking down from the final node hits Exchange before Partial.
    val order = p.linesIterator.zipWithIndex.collect {
      case (l, i) if l.contains("TopKPerKeyFinal") => ("final", i)
      case (l, i) if l.contains("Exchange") => ("exchange", i)
      case (l, i) if l.contains("TopKPerKeyPartial") => ("partial", i)
    }.toSeq.sortBy(_._2).map(_._1)
    assert(order == Seq("final", "exchange", "partial"),
      s"expected final/exchange/partial nesting, got $order:\n$p")
    // AQE wraps the tree (node-collect sees only the wrapper), so pin the
    // window-free single-shuffle shape on the plan string.
    assert(!p.contains("Window"), s"custom top-k plan fell back to a window:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly one key shuffle, got $exchanges:\n$p")
  }

  test("partial-pass flush (>64k keys in one partition) stays exact") {
    // 90k rows, 45k keys, 2 rows per key, ONE input partition — the
    // partial map crosses PartialFlushKeys and flushes mid-stream, with
    // many groups split across flush epochs. Top-1 by v asc must still
    // be exactly the per-key minimum.
    val df = spark.range(0, 90000).toDF("id").repartition(1)
      .select(($"id" % 45000).as("k"), $"id".as("v"))
    val got = TopK.perKey(df, Seq("k"), Seq(("v", true)), 1)
      .as[(Long, Long)].collect()
    assert(got.length == 45000)
    assert(got.forall { case (k, v) => v == k }, "kept row is not the per-key min")
  }

  test("k >= group size passes whole groups; heap respects the total order") {
    val tiny = Seq(
      (1L, 10L, 5L), (1L, 11L, 5L), (1L, 12L, 7L),
      (2L, 20L, 1L)).toDF("k", "id", "v")
    // k=2, order v desc then id asc: key 1 keeps (12,7) and the TIE at
    // v=5 resolves to the smaller id (10); key 2 keeps its only row.
    val got2 = TopK.perKey(tiny, Seq("k"), Seq(("v", false), ("id", true)), 2)
      .select($"k", $"id", $"v").as[(Long, Long, Long)].collect().sorted
    assert(got2.toSeq == Seq((1L, 10L, 5L), (1L, 12L, 7L), (2L, 20L, 1L)))
    val gotAll = TopK.perKey(tiny, Seq("k"), Seq(("v", false), ("id", true)), 99)
      .count()
    assert(gotAll == 4L)
  }
}
