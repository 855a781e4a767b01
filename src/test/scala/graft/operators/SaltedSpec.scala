package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on a skewed key distribution") {
    // 90% of facts share one hot key — the shape that straggles a plain
    // shuffle join at scale.
    val facts = (1 to 5000)
      .map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i.toLong, i * 1.5))
      .toDF("key", "id", "amount")
    val dims = (0L until 50L).map(k => (k, s"d$k")).toDF("key", "name")
    val plain = facts.join(dims, "key")
      .select($"id", $"name", $"amount").collect().toSet
    for (s <- Seq(1, 4, 16)) {
      val salted = Salted.join(facts, dims, "key", s)
        .select($"id", $"name", $"amount").collect().toSet
      assert(salted == plain, s"salted($s) join diverges from plain join")
    }
  }

  test("salt spreads the hot key across the full fan-out") {
    val facts = (1 to 2000).map(i => (7L, i.toLong)).toDF("key", "id")
    val salts = facts.withColumn("__salt", pmod(hash(facts.columns.map(col): _*), lit(8)))
      .select($"__salt").distinct().as[Int].collect().toSet
    assert(salts == (0 until 8).toSet, s"hot key only reached salts $salts")
  }

  test("salting is deterministic across evaluations (no rand)") {
    val facts = (1 to 500).map(i => (i.toLong % 3, i.toLong)).toDF("key", "id")
    val dims = (0L until 3L).map(k => (k, s"d$k")).toDF("key", "name")
    val df = Salted.join(facts, dims, "key", 4).orderBy("id")
    assert(df.collect().toSeq == df.collect().toSeq)
  }
}
