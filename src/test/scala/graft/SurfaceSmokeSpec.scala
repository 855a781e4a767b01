package graft

/** Executes EVERY declared query end-to-end at sf0.001.
  *
  * Exists because of the round-6 regression class: a testdata schema
  * change broke two queries (q19/q23) at DRIVER time — they vanished
  * from the correctness artifact as missing keys rather than failures,
  * which nothing in `sbt test` caught. This spec makes "every declared
  * query still executes against the current testdata" a CI property, so
  * a loader or schema drift fails here first with the query's name.
  * (Correct VALUES are the oracle gate's job, not this spec's.)
  */
class SurfaceSmokeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("every declared query executes and returns rows at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val n = fn(spark, sf).queryExecution.toRdd.count()
          if (n == 0L) Some(s"$name: 0 rows") else None
        } catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}")
        }
    }
    assert(failures.isEmpty, s"${failures.size} queries failed:\n  ${failures.mkString("\n  ")}")
  }

  test("every declared oracle key has a query and vice versa (SQL-expressible set)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val orphanOracles = o.diff(q)
    assert(orphanOracles.isEmpty, s"oracles without queries: $orphanOracles")
    // Every current query is SQL-expressible; if a future one is not,
    // list it here explicitly rather than silently weakening the gate.
    val unoracled = q.diff(o)
    assert(unoracled.isEmpty, s"queries without oracles: $unoracled")
  }
}
