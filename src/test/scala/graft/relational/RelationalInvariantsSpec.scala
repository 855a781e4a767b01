package graft.relational

import graft.SparkSpec

/** Semantic invariants for the round-7 relational additions — properties
  * the oracle's cell-compare can't state (it only pins equality with
  * DuckDB, not that BOTH engines satisfy the operator's contract).
  */
class RelationalInvariantsSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("q38 sessions: positive sizes, non-negative in-session durations, 30-min gap bound") {
    val got = RelationalQueries.queries("q38_sessionize")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (user, idx, n, dur, _) =>
      assert(idx >= 1, s"user $user session $idx not 1-based")
      assert(n >= 1, s"user $user session $idx empty")
      assert(dur >= 0, s"user $user session $idx negative duration")
      // A session of n events with every gap <= 1800s spans <= (n-1)*1800s.
      assert(dur <= (n - 1) * 1800,
        s"user $user session $idx duration $dur exceeds ${(n - 1) * 1800} (gap rule broken)")
    }
    // Session indices are consecutive per user.
    got.groupBy(_._1).foreach { case (user, rows) =>
      val idxs = rows.map(_._2).sorted
      assert(idxs.sameElements(1L to idxs.length),
        s"user $user session indices not consecutive: ${idxs.toSeq}")
    }
  }

  test("q40 approx quantiles: the sketch lands inside its rank bound on both percentiles") {
    val got = RelationalQueries.queries("q40_approx_quantiles")(spark, sf)
      .as[(String, Double, Double, Boolean, Boolean)].collect()
    assert(got.nonEmpty)
    got.foreach { case (g, p50, p90, ok50, ok90) =>
      assert(ok50 && ok90, s"group $g sketch outside rank bound")
      assert(p50 <= p90, s"group $g p50 $p50 > p90 $p90")
    }
  }

  test("q41 SCD2: exactly one current row per key, history only on updated keys") {
    val got = RelationalQueries.queries("q41_scd2_upsert")(spark, sf)
      .as[(Long, Long, Double, String, Boolean)].collect()
    val byKey = got.groupBy(_._1)
    byKey.foreach { case (k, rows) =>
      assert(rows.count(_._5) == 1, s"key $k has ${rows.count(_._5)} current rows")
      val versions = rows.map(_._2).sorted
      if (k % 10 == 3 && k < 100000) {
        // updated existing key: expired v1 + current v2
        assert(versions.sameElements(Seq(1L, 2L)), s"key $k versions ${versions.toSeq}")
        assert(!rows.find(_._2 == 1L).get._5 && rows.find(_._2 == 2L).get._5,
          s"key $k current flag on wrong version")
      } else {
        assert(versions.sameElements(Seq(1L)), s"key $k versions ${versions.toSeq}")
      }
    }
    // inserts really are new keys
    assert(byKey.keys.exists(_ >= 100000), "no inserted keys present")
  }

  test("q47 moments: power-sum formulas agree with Spark's builtin var_pop/skewness/kurtosis") {
    val got = RelationalQueries.queries("q47_moments")(spark, sf)
      .select("l_returnflag", "n", "var_pop", "skew_pop", "kurt_pop")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    val ref = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy($"l_returnflag")
      .agg(org.apache.spark.sql.functions.var_pop($"l_quantity").as("v"),
        org.apache.spark.sql.functions.skewness($"l_quantity").as("sk"),
        org.apache.spark.sql.functions.kurtosis($"l_quantity").as("ku"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    def close(a: Double, b: Double) = math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))
    got.foreach { case (g, n, v, sk, ku) =>
      assert(n > 0)
      val (rv, rsk, rku) = ref(g)
      assert(close(v, rv), s"group $g var $v != builtin $rv")
      assert(close(sk, rsk), s"group $g skew $sk != builtin $rsk")
      assert(close(ku, rku), s"group $g kurt $ku != builtin $rku")
    }
  }

  test("q48 filtered aggregates: counts partition and bit-aggs bound each other") {
    val got = RelationalQueries.queries("q48_filtered_agg")(spark, sf)
      .as[(String, Long, Long, Long, Option[Long], Boolean, Boolean, Long, Long, Long)]
      .collect()
    assert(got.nonEmpty)
    got.foreach { case (st, n, nBig, nUrg, firstUrg, allPos, _, bAnd, bOr, _) =>
      assert(nBig <= n && nUrg <= n, s"$st filtered counts exceed group size")
      assert(firstUrg.isDefined == (nUrg > 0), s"$st min-filter null iff no match broken")
      assert(allPos, s"$st has non-positive totalprice (synthetic data violates assumption)")
      // AND-mask is a submask of the OR-mask.
      assert((bAnd & bOr) == bAnd, s"$st bit_and $bAnd not within bit_or $bOr")
    }
  }

  test("q49 string agg: lists are sorted, sized to the group, and cover all 25 nations") {
    val got = RelationalQueries.queries("q49_string_agg")(spark, sf)
      .as[(String, Long, String, String)].collect()
    assert(got.length == 5)
    assert(got.map(_._2).sum == 25)
    got.foreach { case (r, n, csv, pfx) =>
      val names = csv.split(",").toSeq
      assert(names.length == n, s"region $r csv size ${names.length} != $n")
      assert(names == names.sorted, s"region $r csv not ascending")
      val prefixes = pfx.split("\\|").toSeq
      assert(prefixes == prefixes.sorted.reverse, s"region $r prefixes not descending")
    }
  }

  test("q50 histogram: buckets partition the table and shares sum to ~10000 bp") {
    val got = RelationalQueries.queries("q50_histogram")(spark, sf)
      .as[(Long, Double, Long, Long, Long)].collect()
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(got.map(_._3).sum == total, "bucket counts don't partition the table")
    got.foreach { case (b, lo, nr, nu, bp) =>
      assert(lo == b * 5000.0)
      assert(nu >= nr, s"bucket $b units $nu < rows $nr (quantity >= 1)")
      assert(bp >= 0 && bp <= 10000)
    }
    // floor-division shares undercount by < 1bp each
    val s = got.map(_._5).sum
    assert(s > 10000 - got.length && s <= 10000, s"bp shares sum $s implausible")
  }

  test("q51 bag set-ops: multiplicities are exactly min(m,n) and m-n") {
    val got = RelationalQueries.queries("q51_setops_all")(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    val counts = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey", "year(o_orderdate) AS y")
      .where($"y".isin(1996, 1997))
      .groupBy("o_custkey", "y").count()
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (k, rows) =>
        k -> (rows.find(_._2 == 1996).map(_._3).getOrElse(0L),
          rows.find(_._2 == 1997).map(_._3).getOrElse(0L))
      }
    got.foreach { case (tag, k, n) =>
      val (m96, m97) = counts(k)
      tag match {
        case "inter_all"  => assert(n == math.min(m96, m97) && n > 0,
          s"custkey $k inter_all $n != min($m96,$m97)")
        case "except_all" => assert(n == m96 - m97 && n > 0,
          s"custkey $k except_all $n != $m96-$m97")
        case other => fail(s"unexpected tag $other")
      }
    }
    // every key with both-year presence appears under inter_all
    val expectedInter = counts.filter { case (_, (a, b)) => a > 0 && b > 0 }.keySet
    assert(got.filter(_._1 == "inter_all").map(_._2).toSet == expectedInter)
  }

  test("l46 split: duplicate clusters never span splits, proportions sane") {
    val got = graft.llm.LlmQueries.queries("l46_split_assignment")(spark, sf)
      .as[(Long, Long, String, Boolean)].collect()
    assert(got.nonEmpty)
    val byCanon = got.groupBy(_._2)
    byCanon.foreach { case (c, rows) =>
      assert(rows.map(_._3).distinct.length == 1,
        s"cluster $c spans splits: ${rows.map(r => (r._1, r._3)).toSeq}")
      assert(rows.exists(r => r._1 == c && r._4), s"cluster $c canon not marked")
    }
    // planted duplicates (doc_id+100000) inherit the original's split
    val splitOf = got.map(r => r._1 -> r._3).toMap
    got.filter(_._1 >= 100000).foreach { r =>
      assert(splitOf(r._1 - 100000) == r._3,
        s"planted dup ${r._1} split ${r._3} != original ${splitOf(r._1 - 100000)}")
    }
    // hash split lands near 80/10/10 on cluster counts (loose bound)
    val clusterSplit = byCanon.map { case (_, rows) => rows.head._3 }.toSeq
    val train = clusterSplit.count(_ == "train").toDouble / clusterSplit.size
    assert(train > 0.6 && train < 0.95, s"train share $train implausible for 80%")
  }

  test("q52 outliers: integer verdict agrees with the double z-score") {
    val got = RelationalQueries.queries("q52_outliers")(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "x")
      .as[(Long, Int, String, Long)].collect()
    assert(got.nonEmpty)
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_orderkey", "l_linenumber", "l_returnflag",
        "CAST(l_quantity AS BIGINT) AS x")
      .as[(Long, Int, String, Long)].collect()
    val stats = rows.groupBy(_._3).map { case (g, rs) =>
      val n = rs.length.toDouble
      val mean = rs.map(_._4).sum / n
      val varPop = rs.map(r => (r._4 - mean) * (r._4 - mean)).sum / n
      g -> (mean, math.sqrt(varPop))
    }
    val expected = rows.filter { r =>
      val (m, sd) = stats(r._3); math.abs(r._4 - m) > 1.5 * sd
    }.map(r => (r._1, r._2)).toSet
    assert(got.map(r => (r._1, r._2)).toSet == expected,
      s"integer verdict diverges from double z-score: " +
        s"${(got.map(r => (r._1, r._2)).toSet diff expected).take(3)} / " +
        s"${(expected diff got.map(r => (r._1, r._2)).toSet).take(3)}")
  }

  test("l40-style canonicalization is idempotent on the declared output") {
    // Applying the canonicalizer to an already-canonical text is identity:
    // variants and originals agree on fp, so re-normalizing any fp's
    // pre-image must land on the same fp (checked via the query's own
    // variant construction in LlmQueriesSpec; here: fp is 8 lowercase hex
    // chars and token counts are positive).
    val got = graft.llm.LlmQueries.queries("l40_text_normalize")(spark, sf)
      .as[(Long, Long, Boolean, String, Boolean)].collect()
    got.foreach { case (id, n, _, fp, _) =>
      assert(n >= 1, s"doc $id zero tokens after canonicalization")
      assert(fp.matches("[0-9a-f]{8}"), s"doc $id fp '$fp' not 8-hex")
    }
  }

  test("q53 argmax: winners re-derived independently from the orders scan") {
    import org.apache.spark.sql.functions._
    val got = RelationalQueries.queries("q53_argmax")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    // Independent derivation: per customer, sort rows by (cents, orderkey)
    // and take the extremes.
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_custkey", $"o_orderkey",
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1)
    got.foreach { case (cust, top, bottom, topPrice) =>
      val ordered = rows(cust).sortBy(r => (r._3, r._2))
      assert(top == ordered.last._2, s"cust $cust top_orderkey $top != ${ordered.last._2}")
      assert(bottom == ordered.head._2, s"cust $cust bottom_orderkey $bottom")
      assert(math.abs(topPrice - ordered.last._3 / 100.0) < 1e-9,
        s"cust $cust top_price $topPrice != ${ordered.last._3 / 100.0}")
    }
    assert(got.map(_._1).toSet == rows.keySet, "customer coverage differs")
  }

  test("q54 co-movement: variance numerators non-negative, sign matches float covariance") {
    import org.apache.spark.sql.functions._
    val got = RelationalQueries.queries("q54_comovement")(spark, sf)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    val floatCov = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_returnflag",
        $"l_quantity".cast("double").as("x"),
        month($"l_shipdate").cast("double").as("y"))
      .groupBy($"l_returnflag").agg(covar_pop($"x", $"y").as("c"))
      .as[(String, Double)].collect().toMap
    got.foreach { case (g, n, cov, varx, vary, pos) =>
      assert(n > 0 && varx >= 0 && vary >= 0, s"group $g degenerate moments")
      assert(pos == (cov > 0), s"group $g verdict/cov disagree")
      assert(math.signum(cov.toDouble) == math.signum(floatCov(g)) ||
        math.abs(floatCov(g)) < 1e-6,
        s"group $g integer cov sign ${cov} vs float ${floatCov(g)}")
    }
  }

  test("q55 date spine: 365 rows covering 1995, counts total the year's orders") {
    import org.apache.spark.sql.functions._
    val got = RelationalQueries.queries("q55_date_spine")(spark, sf)
      .as[(java.sql.Date, Long)].collect()
    assert(got.length == 365, s"expected 365 days, got ${got.length}")
    assert(got.head._1.toString == "1995-01-01" && got.last._1.toString == "1995-12-31")
    val expected = spark.read.parquet(s"$sf/orders.parquet")
      .where($"o_orderdate" >= lit("1995-01-01").cast("timestamp_ntz") &&
        $"o_orderdate" < lit("1996-01-01").cast("timestamp_ntz")).count()
    assert(got.map(_._2).sum == expected,
      s"spine counts ${got.map(_._2).sum} != year total $expected")
  }

  test("q56 basket pairs: canonical orientation, support floor, recount matches") {
    import org.apache.spark.sql.functions._
    val got = RelationalQueries.queries("q56_basket_pairs")(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (a, b, n) =>
      assert(a < b, s"pair ($a,$b) not canonical")
      assert(n >= 2, s"pair ($a,$b) below support floor")
    }
    // Recount the single most frequent pair straight off the scan.
    val (pa, pb, pn) = got.maxBy(_._3)
    val recount = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey")
      .where($"l_partkey" === pa || $"l_partkey" === pb)
      .groupBy($"l_orderkey")
      .agg(countDistinct($"l_partkey").as("k"))
      .where($"k" === 2).count()
    assert(recount == pn, s"pair ($pa,$pb) recount $recount != $pn")
  }

  test("q57 interpolated percentiles: ordered, in-range, median between discrete neighbors") {
    import org.apache.spark.sql.functions._
    val got = RelationalQueries.queries("q57_percentile_cont")(spark, sf)
      .as[(String, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    val stats = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_returnflag", $"l_quantity".cast("long").as("x"))
      .groupBy($"l_returnflag")
      .agg(min($"x").as("lo"), max($"x").as("hi"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    got.foreach { case (g, p25, p50, p75) =>
      assert(p25 <= p50 && p50 <= p75, s"group $g percentiles unordered")
      val (lo, hi) = stats(g)
      assert(p25 >= lo && p75 <= hi, s"group $g percentiles out of range")
      // R-7 interpolation of integers stays within half-open unit steps.
      assert(p50 == math.floor(p50) || p50 - math.floor(p50) < 1.0,
        s"group $g p50 $p50 not an interpolation of integers")
    }
  }
}
