package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EmaAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("EMA folds in sort order regardless of input order") {
    val rows = Seq( // (group, sortKey, tiebreak, value) shuffled on purpose
      ("g", 3L, 0L, 30.0), ("g", 1L, 0L, 10.0), ("g", 2L, 0L, 20.0),
      ("h", 1L, 1L, 5.0), ("h", 1L, 0L, 1.0))
      .toDF("g", "k1", "k2", "x")
    val ema = udaf(new EmaAggregator(0.5))
    val out = rows.groupBy($"g").agg(ema($"k1", $"k2", $"x").as("e"))
      .as[(String, Double)].collect().toMap
    // g: e1=10, e2=15, e3=22.5 ; h: sorted by (k1,k2) -> 1.0 then 5.0 -> 3.0
    assert(out("g") == 22.5)
    assert(out("h") == 3.0)
  }
}
