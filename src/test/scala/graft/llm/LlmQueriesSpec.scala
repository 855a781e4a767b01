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

  test("chunk dedup marks every chunk of an exact copy as duplicate") {
    // docsWithDups appends doc_id+100000 copies of every 10th doc; each
    // copy's chunks all first occur in the original (smaller doc_id), so
    // the copy keeps nothing and its kept fingerprint is md5 of the
    // empty string. Originals are first occurrences of their own text.
    val got = LlmQueries.qChunkDedup(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_chunks", "n_dup_chunks", "kept_fp")
      .as[(Long, Long, Long, String)].collect()
    val copies = got.filter(_._1 >= 100000L)
    assert(copies.nonEmpty)
    copies.foreach { case (id, n, dup, fp) =>
      assert(n == dup, s"copy $id kept ${n - dup} chunks")
      assert(fp == "d41d8cd98f00b204e9800998ecf8427e", s"copy $id fp $fp")
    }
    // every copy's original keeps at least its own first chunk
    val byId = got.map(r => r._1 -> r).toMap
    copies.foreach { case (id, _, _, _) =>
      val (_, n, dup, _) = byId(id - 100000L)
      assert(dup < n, s"original ${id - 100000L} lost all chunks")
    }
  }

  test("sequence packing offsets are per-language prefix sums") {
    val got = LlmQueries.qSequencePacking(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "est_tokens", "start_ofs", "first_seq",
        "last_seq", "n_seqs_spanned")
      .as[(Long, String, Long, Long, Long, Long, Long)].collect()
    got.groupBy(_._2).foreach { case (_, rows) =>
      var run = 0L
      rows.sortBy(_._1).foreach { case (id, _, tok, start, first, last, span) =>
        assert(start == run, s"doc $id start_ofs $start, expected $run")
        assert(first == start / 512 && last == (start + tok - 1) / 512)
        assert(span == last - first + 1 && span >= 1)
        run += tok
      }
    }
  }

  test("rare-term index ranks by (tf desc, df asc, term asc) with top-3 per doc") {
    val got = LlmQueries.qRareTermIndex(spark, "/root/testdata/sf0.001")
      .select("doc_id", "term", "tf", "df", "rnk")
      .as[(Long, String, Long, Long, Long)].collect()
    got.groupBy(_._1).foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._5)
      assert(sorted.map(_._5).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.length <= 3)
      sorted.sliding(2).foreach {
        case Array((_, ta, tfa, dfa, _), (_, tb, tfb, dfb, _)) =>
          val ordered = tfa > tfb || (tfa == tfb &&
            (dfa < dfb || (dfa == dfb && ta < tb)))
          assert(ordered, s"doc $id rank order violated: ($ta,$tfa,$dfa) vs ($tb,$tfb,$dfb)")
        case _ => ()
      }
    }
  }

  test("boilerplate counts respect the 3-distinct-doc threshold") {
    // A chunk shared by only an original+copy pair (2 distinct docs) is
    // NOT boilerplate; the integer percentage and verdict must derive
    // from the counts exactly.
    val got = LlmQueries.qBoilerplate(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_chunks", "n_boiler_chunks", "boiler_pct",
        "mostly_boilerplate")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, n, b, pct, mostly) =>
      assert(b <= n && pct == b * 100 / n && mostly == (b * 2 >= n), s"doc $id")
    }
  }

  test("PQ codes: sampled codebook vectors self-assign at distance zero") {
    val got = LlmQueries.qPqCodes(spark, "/root/testdata/sf0.001")
      .select("vec_id", "sub_id", "code", "d2_x1e6")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length % 4 == 0 && got.nonEmpty)
    // every vector gets exactly one code per subspace
    got.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.map(_._2).sorted.toSeq == Seq(0L, 1L, 2L, 3L), s"vec $id")
    }
    // the centroid source vectors (vec_id = 10 + 7*c) must pick themselves
    (0 to 15).foreach { c =>
      val rows = got.filter(_._1 == 10L + 7 * c)
      assert(rows.forall(r => r._3 == c && r._4 == 0L),
        s"centroid $c self-assignment violated: ${rows.toSeq}")
    }
  }

  test("k-means refine: memberships partition the corpus, inertia is sane") {
    val d = "/root/testdata/sf0.001"
    val got = LlmQueries.qKmeansRefine(spark, d)
      .select("c_id", "n_members", "inertia", "centroid_sum")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty && got.length <= 16)
    // every vector lands in exactly one surviving cluster
    val total = spark.read.parquet(d + "/embeddings.parquet").count()
    assert(got.map(_._2).sum == total,
      s"memberships ${got.map(_._2).sum} != corpus $total")
    assert(got.forall(r => r._2 > 0 && r._3 >= 0))
    // refined centroids must not be worse than the raw init: the round-2
    // assignment's inertia is <= assigning everything to the 16 raw seeds
    // (Lloyd's monotonicity, integer-exact here up to the floor-mean).
    val inertia2 = got.map(_._3).sum
    assert(inertia2 > 0, "degenerate zero inertia on the synthetic corpus")
  }

  test("BPE pairs are 2-char, capped at 20, counts descending") {
    val got = LlmQueries.qBpePairs(spark, "/root/testdata/sf0.001")
      .as[(String, Long)].collect()
    assert(got.nonEmpty && got.length <= 20)
    assert(got.forall(_._1.length == 2), s"non-2-char pair in ${got.toSeq}")
    assert(got.forall(_._2 > 0))
    val counts = got.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "pair counts not descending")
  }

  test("domain mix: under-quota sources pass through whole, none exceed n_src") {
    val got = LlmQueries.qDomainMix(spark, "/root/testdata/sf0.001")
      .select("source", "n_src", "quota", "n_kept")
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val quotas = got.map(_._3).distinct
    assert(quotas.length == 1, s"quota must be global, got ${quotas.toSeq}")
    got.foreach { case (src, n, q, kept) =>
      assert(kept <= n, s"$src keeps more than it has")
      // bucket < 1e6 and n <= quota makes bucket*n < quota*1e6 always true
      if (n <= q) assert(kept == n, s"under-quota source $src lost rows")
    }
  }

  test("simhash banding finds every planted exact copy at hamming 0") {
    val got = LlmQueries.qSimhashPairs(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    assert(got.forall(_._3 <= 3), "pair beyond the declared Hamming radius")
    val found = got.filter(r => r._3 == 0).map(r => (r._1, r._2)).toSet
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id").as[Long].collect()
    val planted = docs.filter(_ % 10 == 0).map(d => (d, d + 100000L))
    planted.foreach { p =>
      assert(found.contains(p), s"planted exact copy $p not mined at hamming 0")
    }
  }

  test("source overlap matrix is strictly upper-triangular with positive mass") {
    val got = LlmQueries.qSourceOverlap(spark, "/root/testdata/sf0.001")
      .as[(String, String, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (a, b, n) => a < b && n > 0 })
    // planted copies land 5 buckets away (100000 % 7 == 5), so at least
    // one cross-bucket pair must carry the duplicated text's mass
    assert(got.map(_._3).max >= 8,
      "no pair shows the planted duplicate overlap")
  }

  test("substring repeats: planted exact copies are fully repeated span mass") {
    // Every 8-gram of a planted copy (doc_id+100000) also occurs in its
    // original, so both sides of each copy pair must report
    // n_repeated == n_grams. Unique docs must keep n_repeated < n_grams
    // somewhere (the corpus is not all duplicates).
    val got = LlmQueries.qSubstringRepeats(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    val copies = got.filter(_._1 >= 100000L)
    assert(copies.nonEmpty)
    copies.foreach { case (id, n, rep) =>
      assert(n == rep, s"copy $id has only $rep/$n repeated positions")
    }
    val originals = copies.map(_._1 - 100000L).toSet
    got.filter(r => originals.contains(r._1)).foreach { case (id, n, rep) =>
      assert(n == rep, s"original $id of a copy has only $rep/$n repeated")
    }
    assert(got.exists { case (_, n, rep) => rep < n },
      "every doc fully repeated — corpus degenerate for this pin")
  }

  test("dedup keep policy: one keeper per cluster, ties keep the original") {
    // Exactly one is_kept per cluster_id; kept_id is that keeper for all
    // members. Planted copies (doc_id+100000) tie their original on
    // token count, so the tiebreak must keep the ORIGINAL and drop the
    // copy whenever the pair shares a cluster (exact copies always do —
    // identical MinHash signatures collide in every band).
    val got = LlmQueries.qDedupKeepPolicy(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._2).foreach { case (c, rs) =>
      val keepers = rs.filter(_._5)
      assert(keepers.length == 1, s"cluster $c has ${keepers.length} keepers")
      val k = keepers.head._1
      rs.foreach(r => assert(r._4 == k, s"doc ${r._1} kept_id ${r._4} != $k"))
      assert(rs.forall(r => keepers.head._3 > r._3
        || (keepers.head._3 == r._3 && k <= r._1)),
        s"cluster $c keeper $k not policy-maximal")
    }
    val byId = got.map(r => r._1 -> r).toMap
    got.filter(_._1 >= 100000L).foreach { case (id, c, _, kept, isKept) =>
      assert(byId(id - 100000L)._2 == c, s"copy $id split from its original")
      assert(!isKept && kept != id, s"planted copy $id survived its original")
    }
  }

  test("semantic dedup: cluster minima survive and evidence is consistent") {
    // Each cluster's lowest vec_id has no lower-id mate: NULL evidence,
    // never pruned (keep-lowest policy is total). Every non-minimum has
    // a best_lower_id strictly below it in the SAME cluster, and pruned
    // iff its best cosine clears the 0.35 threshold.
    val got = LlmQueries.qSemanticDedup(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Option[Long], Option[Long], Boolean)].collect()
    assert(got.nonEmpty)
    val clusterOf = got.map(r => r._1 -> r._2).toMap
    val minOf = got.groupBy(_._2).map { case (c, rs) => c -> rs.map(_._1).min }
    got.foreach { case (id, c, bid, bcos, pruned) =>
      if (id == minOf(c)) {
        assert(bid.isEmpty && bcos.isEmpty && !pruned,
          s"cluster-min $id carries evidence or got pruned")
      } else {
        assert(bid.nonEmpty && bid.get < id && clusterOf(bid.get) == c,
          s"doc $id best match ${bid} not a lower-id cluster-mate")
        assert(pruned == (bcos.get >= 350000L), s"doc $id verdict mismatch")
      }
    }
    assert(got.exists(_._5) && got.exists(!_._5),
      "pruned verdict never splits — threshold degenerate at this SF")
  }

  test("rarity surprisal: mass bounds hold and hapax flag is exact") {
    // Every token's rarity is in [1, n_total] (cnt>=1 always; cnt=1 →
    // rarity = n_total exactly), so n_tokens <= surprisal_mass <=
    // n_tokens * n_total and max_rarity = n_total iff has_hapax.
    val got = LlmQueries.qRaritySurprisal(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    val nTotal = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(col("text"), " "))).count()
    assert(got.map(_._2).sum == nTotal, "per-doc token counts must tile corpus")
    got.foreach { case (id, n, mass, mx, hapax) =>
      assert(n > 0 && mass >= n, s"doc $id mass $mass below token count $n")
      assert(mx >= 1 && mx <= nTotal && mass <= n * nTotal)
      assert(hapax == (mx == nTotal), s"doc $id hapax flag inconsistent")
    }
    assert(got.map(t => t._3.toDouble / t._2).distinct.length > 1,
      "mean rarity never varies — corpus degenerate for this pin")
  }

  test("importance weights: own-slice tokens guarantee mass lower bounds") {
    // A target-slice doc's tokens each contribute at least themselves to
    // the target bucket counts, so target_mass >= n_tokens there (and
    // symmetrically background_mass >= n_tokens off-slice). Both masses
    // are draws from corpus-wide counts, so neither is ever negative.
    val got = LlmQueries.qImportanceWeights(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, n, tm, bm, _) =>
      assert(tm >= 0 && bm >= 0 && n > 0)
      if (id % 17 == 3) assert(tm >= n, s"target doc $id mass $tm < $n")
      else assert(bm >= n, s"background doc $id mass $bm < $n")
    }
    assert(got.exists(_._5) && got.exists(!_._5),
      "prefer_target verdict never splits — thresholding degenerate")
  }

  test("vocab coverage: OOV mass is bounded and non-degenerate") {
    val got = LlmQueries.qVocabCoverage(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, n, oov) =>
      assert(oov >= 0 && oov <= n, s"doc $id oov $oov outside [0, $n]")
    }
    // The 16-word vocab covers the frequent function words, so most docs
    // must mix in-vocab and OOV tokens.
    assert(got.exists { case (_, n, oov) => oov > 0 && oov < n },
      "no doc mixes vocab and OOV tokens")
  }

  test("incremental dedup: exact copies drop_exact, all batch docs covered") {
    val got = LlmQueries.qIncrementalDedup(spark, "/root/testdata/sf0.001")
      .as[(Long, Boolean, Boolean, String)].collect()
    assert(got.nonEmpty)
    val byId = got.map(r => r._1 -> r).toMap
    // Every +100000 batch doc is a byte-identical copy of a corpus doc:
    // must be exact_dup (and exact implies the LSH bands match too).
    val exacts = got.filter(_._1 >= 100000).filter(_._1 < 200000)
    assert(exacts.nonEmpty)
    exacts.foreach { case (id, ex, band, v) =>
      assert(ex && band && v == "drop_exact", s"doc $id: ($ex, $band, $v)")
    }
    // Perturbed +200000 docs are never byte-identical.
    val nears = got.filter(_._1 >= 200000)
    assert(nears.nonEmpty)
    nears.foreach { case (id, ex, _, v) =>
      assert(!ex && v != "drop_exact", s"doc $id: exact=$ex verdict=$v")
    }
    // Verdict is consistent with the two flags.
    got.foreach { case (id, ex, band, v) =>
      val expect = if (ex) "drop_exact" else if (band) "drop_near" else "keep"
      assert(v == expect, s"doc $id: ($ex, $band) -> $v")
    }
    assert(byId.size == got.length, "duplicate batch doc_ids in output")
  }

  test("text normalize: variants collapse onto their originals") {
    val got = LlmQueries.qTextNormalize(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Boolean, String, Boolean)].collect()
    val byId = got.map(r => r._1 -> r).toMap
    val variants = got.filter(_._1 >= 100000)
    assert(variants.nonEmpty)
    variants.foreach { case (id, n, changed, fp, dup) =>
      // UPPER + '!!' always differs from its canonical form...
      assert(changed, s"variant $id not flagged changed")
      // ...and canonicalizes to exactly the original's form.
      val orig = byId(id - 100000)
      assert(fp == orig._4, s"variant $id fp $fp != original fp ${orig._4}")
      assert(n == orig._2, s"variant $id token count $n != ${orig._2}")
      assert(dup, s"variant $id not flagged canon_dup against ${id - 100000}")
    }
  }

  test("LSH audit: perfect recall on planted duplicates, high-sim at least the planted count") {
    val got = LlmQueries.queries("l41_lsh_audit")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(got.length == 1)
    val (nCand, nHigh, nLow, nTrue, nMissed, recallPerfect) = got.head
    assert(nCand == nHigh + nLow, "high/low split doesn't partition the candidates")
    assert(nTrue > 0, "no planted duplicate pairs")
    assert(nMissed == 0 && recallPerfect,
      s"banding missed $nMissed of $nTrue byte-identical pairs")
    // Every planted exact-copy pair is a candidate with Jaccard 1.0, so
    // the high-similarity count is at least the planted-pair count.
    assert(nHigh >= nTrue, s"n_high $nHigh < planted $nTrue")
  }

  test("bigram surprisal: per-doc bigram counts tile the corpus and bounds hold") {
    // A document of W>=2 words contributes exactly W-1 bigrams; rarity is
    // in [1, m_total]; singletons are bigrams with corpus count 1, so
    // each contributes rarity exactly m_total.
    val got = LlmQueries.qBigramSurprisal(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val perDoc = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).as("w"))
      .where(col("w") >= 2)
      .as[(Long, Int)].collect().map(r => r._1 -> (r._2 - 1L)).toMap
    val mTotal = perDoc.values.sum
    assert(got.map(_._2).sum == mTotal, "per-doc bigram counts must tile corpus")
    got.foreach { case (id, n, mass, mx, singles) =>
      assert(n == perDoc(id), s"doc $id bigram count $n != ${perDoc(id)}")
      assert(mass >= n && mass <= n * mTotal, s"doc $id mass $mass out of bounds")
      assert(mx >= 1 && mx <= mTotal)
      assert(singles >= 0 && singles <= n)
      // each singleton contributes exactly m_total to the mass
      assert(mass >= singles * mTotal, s"doc $id mass below singleton floor")
      assert(singles > 0 == (mx == mTotal), s"doc $id singleton iff max-rarity broken")
    }
  }

  test("pmi collocations: support floor, deterministic descending order, exact ratio") {
    val got = LlmQueries.qPmiCollocations(spark, "/root/testdata/sf0.001")
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(got.length == 20, s"expected top-20, got ${got.length}")
    got.foreach { case (a, b, cab, ca, cb, ratio) =>
      assert(cab >= 5, s"pair ($a,$b) support $cab below floor")
      assert(cab <= ca && cab <= cb, s"pair ($a,$b) support exceeds unigram counts")
      assert(ratio > 0.0)
    }
    val ratios = got.map(_._6)
    assert(ratios.zip(ratios.tail).forall { case (x, y) => x >= y },
      "pmi ratios not descending")
    // Recompute one row's ratio from corpus counts to pin the formula.
    val toks = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(split(col("text"), " ").as("w"))
    val n = toks.select(explode(col("w"))).count()
    val m = toks.select((size(col("w")) - 1).cast("long")).as[Long].collect().filter(_ > 0).sum
    val (a, b, cab, ca, cb, ratio) = got.head
    assert(ratio == cab.toDouble * n * n / (ca.toDouble * cb * m),
      s"pair ($a,$b) ratio $ratio doesn't match recomputation")
  }

  test("token budget: kept mass within budget, greedy-maximal, quality-monotone") {
    val got = LlmQueries.qTokenBudget(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    val budget = got.map(_._3).sum / 3
    val keptMass = got.filter(_._4).map(_._3).sum
    assert(keptMass <= budget, s"kept $keptMass exceeds budget $budget")
    // Quality-monotone: at most one level holds both kept and dropped docs,
    // and every kept doc's level is >= every dropped doc's level.
    val mixed = got.groupBy(_._2).filter { case (_, rows) =>
      rows.exists(_._4) && rows.exists(!_._4)
    }
    assert(mixed.size <= 1, s"multiple mixed levels: ${mixed.keys.toSeq.sorted}")
    val keptQ = got.filter(_._4).map(_._2)
    val dropQ = got.filter(!_._4).map(_._2)
    if (keptQ.nonEmpty && dropQ.nonEmpty) {
      if (mixed.nonEmpty)
        assert(keptQ.min >= dropQ.max,
          s"kept level ${keptQ.min} below dropped level ${dropQ.max}")
      else
        assert(keptQ.min > dropQ.max,
          s"clean cut but kept level ${keptQ.min} <= dropped level ${dropQ.max}")
    }
    // Greedy-maximal on the boundary: the first dropped doc (doc_id order
    // within the mixed level) would overflow the budget.
    mixed.headOption.foreach { case (_, rows) =>
      rows.filter(!_._4).sortBy(_._1).headOption.foreach { d =>
        assert(keptMass + d._3 > budget,
          s"boundary doc ${d._1} (${d._3} tokens) would still fit — not maximal")
      }
    }
  }

  test("cluster balance: members partition the corpus, shares and verdicts consistent") {
    val got = LlmQueries.qClusterBalance(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long], Long, Boolean)]
      .collect()
    assert(got.length == 16, s"expected 16 centroid rows, got ${got.length}")
    val nVecs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    assert(got.map(_._2).sum == nVecs, "cluster sizes don't partition the corpus")
    got.foreach { case (c, n, mn, mx, inertia, bp, oversized) =>
      assert((n == 0) == mn.isEmpty, s"cluster $c empty-iff-null broken")
      if (n > 0) {
        assert(mn.get <= mx.get, s"cluster $c min > max")
        assert(inertia.get >= mn.get * n && inertia.get <= mx.get * n,
          s"cluster $c inertia outside [min*n, max*n]")
      }
      assert(bp == n * 10000 / nVecs, s"cluster $c share_bp wrong")
      assert(oversized == (n * 16 > 2 * nVecs), s"cluster $c verdict wrong")
    }
  }

  test("corpus funnel: monotone shrink, every stage does real work, exact planted deltas") {
    val got = LlmQueries.qCorpusFunnel(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq ==
      Seq("0_raw", "1_exact_dedup", "2_canonical_dedup", "3_quality"))
    val docs = got.map(_._2); val toks = got.map(_._3)
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b }, "docs not monotone")
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b }, "tokens not monotone")
    val nBase = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    val nExact = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") % 10 === 0).count()
    val nVariant = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") % 7 === 0).count()
    assert(docs(0) == nBase + nExact + nVariant, "raw count wrong")
    assert(docs(0) - docs(1) == nExact, "stage 1 must drop exactly the planted copies")
    assert(docs(1) - docs(2) == nVariant,
      "stage 2 must drop exactly the planted case/punct variants")
    assert(docs(2) == nBase, "survivors after dedup must be the original corpus")
  }

  test("connectedComponents matches a union-find reference on 12 seeded random graphs") {
    // The CC loop is the trickiest distributed algorithm in the repo
    // (min-label + pointer jumping + sum-fixpoint); pin it against a
    // 15-line sequential union-find across density regimes: sparse
    // forests, ~critical, and dense near-cliques.
    val rnd = new scala.util.Random(0xC0FFEE)
    for (trial <- 1 to 12) {
      val n = 2 + rnd.nextInt(49)
      val m = rnd.nextInt(2 * n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // sequential reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map { v =>
        // min vertex of v's component
        val root = find(v)
        (v.toLong, (0 until n).filter(find(_) == root).min.toLong)
      }.toMap
      val vertices = (0L until n.toLong).toDF("doc_id")
      val pairs = if (edges.isEmpty)
        Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
      else edges.toDF("doc_a", "doc_b")
      val got = LlmQueries.connectedComponents(vertices, pairs)
        .as[(Long, Long)].collect().toMap
      assert(got == expected,
        s"trial $trial (n=$n, m=${edges.size}): " +
          s"diff=${(got.toSet diff expected.toSet).take(5)}")
    }
  }

  test("l48 chunking: counts match the formula, strides tile each document") {
    val sf = "/root/testdata/sf0.001"
    val got = LlmQueries.queries("l48_chunk_sliding")(spark, sf)
      .as[(Long, Long, Long, String)].collect()
    assert(got.nonEmpty)
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    got.groupBy(_._1).foreach { case (doc, chunks) =>
      val n = words(doc)
      val expected = 1 + math.max(0L, n - 64 + 47) / 48
      assert(chunks.length == expected,
        s"doc $doc: ${chunks.length} chunks, formula says $expected (n=$n)")
      val byIdx = chunks.sortBy(_._2)
      assert(byIdx.map(_._2).sameElements(0L until expected),
        s"doc $doc chunk indices not consecutive")
      // Non-final chunks are full 64-word windows; the final chunk covers
      // exactly to the end of the document (start + len == n).
      byIdx.init.foreach { c =>
        assert(c._3 == 64, s"doc $doc chunk ${c._2} len ${c._3} != 64") }
      val last = byIdx.last
      assert(last._2 * 48 + last._3 == n,
        s"doc $doc final chunk ends at ${last._2 * 48 + last._3}, n=$n")
    }
  }

  test("l66 repeated spans: islands are contiguous and planted copies are fully covered") {
    val sf = "/root/testdata/sf0.001"
    val out = LlmQueries.queries("l66_repeat_spans")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // islands are maximal runs of consecutive positions by construction
    assert(out.forall { case (_, s0, e0, n) => s0 <= e0 && n == e0 - s0 + 1 },
      "non-contiguous island emitted")
    // a planted exact-duplicate pair: every gram position of both docs
    // repeats, so each must carry exactly ONE span covering 1..n_grams
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val (k, txt) = docs.filter(_._1 % 10 == 0).minBy(_._1)
    val expectPos = math.max(txt.split(" ").length - 7, 1)
    for (id <- Seq(k, k + 100000)) {
      val spans = out.filter(_._1 == id).toSeq
      assert(spans.length == 1, s"doc $id spans: $spans")
      assert(spans.head._2 == 1L && spans.head._4 == expectPos.toLong,
        s"doc $id span ${spans.head} != full coverage 1..$expectPos")
    }
  }

  test("l67 span cut: planted copies cut to empty, untouched docs keep their exact text") {
    val sf = "/root/testdata/sf0.001"
    val out = LlmQueries.queries("l67_span_cut")(spark, sf)
      .as[(Long, Long, Long, String)].collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(out.forall { case (_, n, k, _) => k >= 0 && k <= n })
    // an exact duplicate pair is repeated at every position -> fully cut
    val dupId = docs.keys.filter(_ % 10 == 0).min
    for (id <- Seq(dupId, dupId + 100000)) {
      val row = out.find(_._1 == id).get
      assert(row._3 == 0L && row._4 == "d41d8cd98f00b204e9800998ecf8427e",
        s"duplicated doc $id not fully cut: $row")
    }
    // a doc the cutter left whole must fingerprint to md5(original text)
    val whole = out.filter(r => r._3 == r._2 && docs.contains(r._1))
    assert(whole.nonEmpty, "no document survived uncut")
    whole.take(5).foreach { case (id, _, _, fp) =>
      val expect = java.security.MessageDigest.getInstance("MD5")
        .digest(docs(id).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(fp == expect, s"doc $id kept_fp drifted from its own text")
    }
  }

  test("l50 containment: every planted snippet and exact copy is found with full overlap") {
    val sf = "/root/testdata/sf0.001"
    val got = LlmQueries.queries("l50_containment")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val byPair = got.map(r => (r._1, r._2) -> r).toMap
    // Planted prefix snippets (+300000, word-boundary cut): the gram set
    // is a strict subset of the parent's, so the pair MUST be found with
    // n_inter == n_a — the case LSH banding cannot see.
    val snippetIds = got.map(_._1).filter(_ >= 300000).distinct
    assert(snippetIds.nonEmpty, "no snippet docs surfaced at all")
    snippetIds.foreach { sid =>
      val r = byPair.get((sid, sid - 300000))
      assert(r.isDefined, s"snippet $sid -> parent pair missing")
      assert(r.get._3 == r.get._4,
        s"snippet $sid n_inter ${r.get._3} != n_a ${r.get._4} (not a subset?)")
    }
    // Exact duplicates (+100000) have identical gram sets: both directed
    // pairs present with n_inter == n_a == n_b.
    val dupPairs = got.filter(r => r._1 >= 100000 && r._1 < 300000 &&
      r._2 == r._1 - 100000)
    assert(dupPairs.nonEmpty, "no exact-dup containment pairs surfaced")
    dupPairs.foreach { r =>
      assert(r._3 == r._4 && r._4 == r._5, s"exact dup pair $r not fully overlapping")
      assert(byPair.contains((r._2, r._1)), s"reverse direction of $r missing")
    }
    // The verdict is real: every emitted pair satisfies 5*n_inter >= 4*n_a.
    got.foreach(r => assert(5 * r._3 >= 4 * r._4, s"pair $r below threshold"))
  }

  test("l49 compression ratio: bp is the exact integer ratio, verdicts honor bounds") {
    val sf = "/root/testdata/sf0.001"
    val got = LlmQueries.queries("l49_compression_ratio")(spark, sf)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, bytes, toks, bp, keep) =>
      assert(toks > 0, s"doc $id zero tokens")
      assert(bp == bytes * 10000L / toks, s"doc $id bp $bp != ${bytes * 10000L / toks}")
      assert(keep == (bp >= 48000L && bp <= 58000L), s"doc $id verdict wrong")
    }
  }

  test("winnowing: an 11-word shared run shares a fingerprint across offsets; disjoint docs share none") {
    // The Schleimer/Wilkerson/Aiken guarantee at (k=8, w=4): any shared
    // run of >= w+k-1 = 11 words yields 4 consecutive shared gram
    // positions, so one full window sits inside the run in BOTH docs and
    // selects the same minimum HASH — regardless of the run's offset.
    // This is exactly what folding position into the emitted fingerprint
    // (instead of only the tie-break key) would silently break.
    val sharedRun = (1 to 11).map(i => s"run$i").mkString(" ")
    val a = ((1 to 9).map(i => s"alpha$i") :+ sharedRun).mkString(" ") // run at tail
    val b = (sharedRun +: (1 to 13).map(i => s"beta$i")).mkString(" ") // run at head
    val c = (1 to 25).map(i => s"gamma$i").mkString(" ")               // no shared gram
    val dd = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val byDoc = LlmQueries.winnowingFingerprints(dd)
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "planted 11-word shared run must share a selected fingerprint")
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty, "false sharing with disjoint doc")
    assert((byDoc(2L) intersect byDoc(3L)).isEmpty, "false sharing with disjoint doc")
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

  test("l61 random projection matches a direct per-vector computation") {
    val sf = "/root/testdata/sf0.001"
    val got = LlmQueries.queries("l61_random_projection")(spark, sf)
      .as[(Long, Long, Long)].collect()
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    assert(got.length == vecs.size * 8, "8 output dims per vector")
    // Recompute the sign matrix exactly as the query derives it.
    def sgn(i: Int, j: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"${i}_${j}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      h.head match {
        case c if c <= '2' => 1L
        case c if c >= 'd' => -1L
        case _             => 0L
      }
    }
    // The matrix must be genuinely sparse and two-sided (Achlioptas
    // 3/16 mass per side): both signs present, zeros the majority.
    val entries = for (i <- 1 to 64; j <- 1 to 8) yield sgn(i, j)
    assert(entries.contains(1L) && entries.contains(-1L))
    assert(entries.count(_ == 0L) > entries.length / 2)
    got.foreach { case (vid, j, y) =>
      val exp = vecs(vid).zipWithIndex.map { case (x, pos) =>
        math.floor(x.toDouble * 1e6 + 0.5).toLong * sgn(pos + 1, j.toInt)
      }.sum
      assert(y == exp, s"vec $vid dim $j: got $y expected $exp")
    }
  }

  test("l63 snapshot diff matches a directly-computed reconciliation") {
    val sf = "/root/testdata/sf0.001"
    val got = LlmQueries.queries("l63_snapshot_diff")(spark, sf)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val v1 = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def toks(t: String) = t.split(" ", -1).length.toLong
    val removed = v1.filter(_._1 % 17 == 3)
    val changed = v1.filter(d => d._1 % 17 != 3 && d._1 % 5 == 0)
    val added = v1.filter(_._1 % 11 == 0)
    val unchanged = v1.length - removed.length - changed.length
    assert(got("removed") == (removed.length.toLong, -removed.map(d => toks(d._2)).sum))
    // " rev2" appends exactly one whitespace token per changed doc.
    assert(got("changed") == (changed.length.toLong, changed.length.toLong))
    assert(got("added") == (added.length.toLong, added.map(d => toks(d._2)).sum))
    assert(got("unchanged") == (unchanged.toLong, 0L))
  }

  test("l64 batch novelty: unseen count is exactly the tail-covering windows") {
    val sf = "/root/testdata/sf0.001"
    val got = LlmQueries.queries("l64_batch_novelty")(spark, sf)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    got.foreach { case (id, nGrams, nUnseen, bp, adds) =>
      val n = words(id - 400000)
      // Batch doc = n core words + 8 novel tail tokens -> n+1 windows;
      // the max(n-7, 0) core-only windows are all substrings of the
      // original document, hence seen; every other window covers a tail
      // token no corpus document contains.
      val expUnseen = (n + 1) - math.max(n - 7, 0)
      assert(nUnseen == expUnseen, s"doc $id unseen $nUnseen != $expUnseen (n=$n)")
      assert(nGrams >= nUnseen && nGrams <= n + 1)
      assert(bp == nUnseen * 10000 / nGrams, s"doc $id bp mismatch")
      assert(adds == (nUnseen * 5 >= nGrams), s"doc $id verdict mismatch")
    }
  }

  test("l65 classifier apply matches a direct sparse-dot recomputation") {
    val sf = "/root/testdata/sf0.001"
    val got = LlmQueries.queries("l65_classifier_filter")(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    def md5hex(x: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def bucket(w: String): Long =
      java.lang.Long.parseLong(md5hex(w).take(15), 16) % 256
    val wts = (0 until 256).map(b =>
      b.toLong -> (java.lang.Long.parseLong(md5hex(s"w_$b").take(4), 16) - 32768L)).toMap
    // Weights must be genuinely two-sided (a constant-sign model would
    // make every verdict trivially identical).
    assert(wts.values.exists(_ > 0) && wts.values.exists(_ < 0))
    val docsMap = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(got.length == docsMap.size)
    got.foreach { case (id, nTok, score, keep) =>
      val words = docsMap(id).split(" ").filter(_.nonEmpty)
      assert(nTok == words.length.toLong, s"doc $id token count")
      val exp = words.map(w => wts(bucket(w))).sum
      assert(score == exp, s"doc $id score $score != $exp")
      assert(keep == (score >= 0), s"doc $id verdict")
    }
    // The model actually separates: both verdicts occur on this corpus.
    assert(got.exists(_._4) && got.exists(!_._4),
      "classifier produced a constant verdict — threshold degenerate")
  }

  test("l62 int8 quantization: codes bounded, max element saturates, error within half-step") {
    val sf = "/root/testdata/sf0.001"
    val got = LlmQueries.queries("l62_int8_quant")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val byVec = got.groupBy(_._1)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    byVec.foreach { case (vid, rows) =>
      assert(rows.length == 64, s"vec $vid has ${rows.length} element rows")
      val scaleQ = rows.head._2
      assert(rows.forall(_._2 == scaleQ), s"vec $vid scale not constant")
      val xs = vecs(vid).map(_.toDouble)
      assert(scaleQ == math.floor(xs.map(math.abs).max * 1e9 + 0.5).toLong)
      rows.foreach { case (_, _, i, code, absErr) =>
        assert(code >= -127 && code <= 127, s"vec $vid code $code out of range")
        // |x - code*scale/127| <= scale/254  =>  in the output's integer
        // domain (x1e6 * 127): err <= scale*1e6/2, plus <=191 for the two
        // floor quantizations' slack (63.5 from q_x1e6, 127 from s_q/1000).
        assert(absErr <= scaleQ / 2000 + 191,
          s"vec $vid i=$i abs_err $absErr exceeds half-step bound ${scaleQ / 2000 + 191}")
      }
      // The max-|x| element must saturate to exactly +/-127 — unless the
      // whole vector is zero, where the query's scale=0 guard emits 0s.
      if (scaleQ != 0L) {
        val maxIdx = xs.map(math.abs).zipWithIndex.maxBy(_._1)._2
        val maxRow = rows.find(_._3 == maxIdx + 1).get
        assert(math.abs(maxRow._4) == 127,
          s"vec $vid max element code ${maxRow._4} != +/-127")
      } else {
        assert(rows.forall(_._4 == 0L), s"vec $vid zero-scale codes not all 0")
      }
    }
  }

  test("l68 bloom prescreen: one-sided vs l64 exact, broadcast probe plan") {
    val sf = "/root/testdata/sf0.001"
    val bloom = LlmQueries.queries("l68_bloom_prescreen")(spark, sf)
    // Plan shape: the probe is a broadcast join against the bounded
    // (lane, bit) table; the corpus-sized anti join is l64's, not ours.
    val plan = bloom.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "bloom bits not broadcast")
    assert(!plan.contains("LeftAnti"), "prescreen must not pay the exact anti join")
    val got = bloom.select($"doc_id", $"n_grams", $"n_definite_new")
      .as[(Long, Long, Long)].collect().toSeq
    val exact = LlmQueries.queries("l64_batch_novelty")(spark, sf)
      .select($"doc_id", $"n_grams", $"n_unseen")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.nonEmpty && got.size == exact.size)
    got.foreach { case (id, nGrams, nDef) =>
      val (exGrams, exUnseen) = exact(id)
      assert(nGrams == exGrams, s"doc $id gram count $nGrams != l64 $exGrams")
      // The one-sided guarantee: a lane miss PROVES novelty, so the
      // bloom's definite-new count can never exceed the exact unseen
      // count (false positives only demote novel -> maybe-seen).
      assert(nDef <= exUnseen, s"doc $id bloom $nDef > exact $exUnseen — unsound")
      assert(nDef >= 0L)
    }
    // The filter is not saturated at this scale: the novel tails are
    // mostly caught (the lower bound is within 2x of exact in aggregate).
    val defSum = got.map(_._3).sum
    val exSum = exact.values.map(_._2).sum
    assert(defSum * 2 >= exSum,
      s"bloom lower bound $defSum collapsed vs exact $exSum — filter saturated?")
  }

  test("l69 source calibration: deciles exact per source, windows over the bounded hist only") {
    val sf = "/root/testdata/sf0.001"
    val df = LlmQueries.queries("l69_source_calibration")(spark, sf)
    val got = df.as[(Long, String, Long, Long, Boolean)].collect().toSeq
    assert(got.nonEmpty)
    // Recompute the decile definition independently: decile =
    // (#docs in the source with strictly smaller score) * 10 div n.
    val bySrc = got.groupBy(_._2)
    bySrc.foreach { case (src, rows) =>
      val n = rows.length.toLong
      rows.foreach { case (id, _, score, decile, keep) =>
        val cumLt = rows.count(_._3 < score).toLong
        assert(decile == cumLt * 10 / n, s"doc $id in $src decile")
        assert(decile >= 0 && decile <= 9, s"doc $id decile $decile out of range")
        assert(keep == (decile >= 7), s"doc $id keep verdict")
      }
    }
    // Monotone within source: a higher score never gets a lower decile.
    bySrc.values.foreach { rows =>
      rows.sortBy(_._3).sliding(2).foreach {
        case Seq(a, b) => assert(a._4 <= b._4, "decile not monotone in score")
        case _ =>
      }
    }
    // Scale pin: every Window in the plan runs over the aggregated
    // histogram, never the corpus row scan — the plan has exactly one
    // aggregate below its windows and no corpus-wide Sort outside the
    // final presentation orderBy.
    val win = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(win.nonEmpty, "expected hist windows")
    win.foreach { w =>
      assert(w.find(_.isInstanceOf[
        org.apache.spark.sql.execution.aggregate.HashAggregateExec]).isDefined,
        "window input is not the aggregated histogram")
    }
  }

  test("l70 source dup flow: triangle form, injected dups land on the diagonal confirmed") {
    val sf = "/root/testdata/sf0.001"
    val got = LlmQueries.queries("l70_source_dup_flow")(spark, sf)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (lo, hi, nCand, nConf, bp) =>
      assert(lo <= hi, s"pair ($lo,$hi) not canonicalized")
      assert(nConf <= nCand, s"($lo,$hi) confirmed $nConf > candidates $nCand")
      assert(bp == nConf * 10000 / nCand, s"($lo,$hi) bp")
    }
    // No duplicate cells and one triangle only.
    assert(got.map(r => (r._1, r._2)).distinct.size == got.size)
    // Every injected exact dup (doc, doc+100000) shares its source, has
    // Jaccard 1 and must be confirmed — so the diagonal's confirmed
    // total is at least the injected-pair count.
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val injected = (0L until nDocs by 10L).size.toLong
    val diagConf = got.filter(r => r._1 == r._2).map(_._4).sum
    assert(diagConf >= injected,
      s"diagonal confirmed $diagConf < injected dup pairs $injected")
  }

  test("l73 drift gate: spam batch drifts, clean split does not (negative control)") {
    val sf = "/root/testdata/sf0.001"
    val got = LlmQueries.queries("l73_drift_gate")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].collect()
    assert(got.length == 8, "one row per bucket")
    assert(got.map(_._1).sorted.toSeq == (0L to 7L), "bucket spine incomplete")
    // the perturbed fixture must trip the gate, and the statistic is
    // the sum of the per-bucket contributions
    assert(got.forall(_._8), "spam-perturbed batch not flagged as drifted")
    val total = got.map(_._6).sum
    assert(got.forall(_._7 == total), s"drift_x1e4 ${got.head._7} != sum $total")
    // negative control: an UNPERTURBED random quarter of the same
    // corpus must pass the gate — the bar is above sampling noise
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val bucket = org.apache.spark.sql.functions
      .expr("least(size(split(text, ' ')) div 16, 7)").cast("long")
    def hist(df: org.apache.spark.sql.DataFrame) = df
      .select(bucket.as("bucket")).groupBy("bucket").count()
      .as[(Long, Long)].collect().toMap.withDefaultValue(0L)
    val ref = hist(docs.where($"doc_id" % 4 =!= 1))
    val clean = hist(docs.where($"doc_id" % 4 === 1))
    val refT = ref.values.sum; val cleanT = clean.values.sum
    val noise = (0L to 7L).map { b =>
      val rbp = ref(b) * 10000 / refT
      val bbp = clean(b) * 10000 / cleanT
      (bbp - rbp) * (bbp - rbp) * 10000 / (rbp + 1)
    }.sum
    assert(noise <= 25000000L,
      s"clean split trips the gate (noise statistic $noise) — bar miscalibrated")
  }

  test("trainBpe(3) equals l89's unrolled merge table; trainBpe(8) extends it as a prefix") {
    val d = "/root/testdata/sf0.001"
    val cols = Seq("round", "rank", "left", "right", "pair_count")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(cols.map(col): _*)
      .as[(Int, Int, String, String, Long)].collect().toSeq
    val unrolled = rows(LlmQueries.qBpeTrain(spark, d))
    val looped3 = rows(LlmQueries.trainBpe(spark, d, 3))
    assert(looped3 == unrolled,
      "the driver-loop trainBpe(3) diverged from l89's unrolled three rounds")
    val looped8 = rows(LlmQueries.trainBpe(spark, d, 8))
    assert(looped8.length == 24,
      s"trainBpe(8) produced ${looped8.length} rows, expected 8 rounds x top-3")
    // monotone extension: the deterministic total order makes each
    // round's outcome a pure function of the previous rewrite, so the
    // 8-round run must start with exactly the 3-round table
    assert(looped8.take(9) == looped3,
      "trainBpe(8) is not a monotone extension of trainBpe(3)")
    // each adopted merge (rank 1) really is consumed: no later round
    // re-elects an identical (left, right) winner
    val winners = looped8.filter(_._2 == 1).map(r => (r._3, r._4))
    assert(winners.distinct.length == winners.length,
      s"a merged pair was re-elected in a later round: $winners")
  }

  test("encodeBpe replays the trained merge list: left-to-right non-overlapping, in rank order, with the untrained fallback") {
    val d = "/root/testdata/sf0.001"
    val merges = LlmQueries.trainBpe(spark, d, 3).where($"rank" === 1)
      .select($"round", $"left", $"right")
    val rules = merges.as[(Int, String, String)].collect().sortBy(_._1).toSeq
    assert(rules.length == 3)
    // reference implementation: the canonical BPE application — each
    // merge one left-to-right non-overlapping pass over the symbols
    def applyMerges(w: String): Long = {
      var toks = w.map(_.toString).toVector
      rules.foreach { case (_, l, r) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
      toks.length.toLong
    }
    val (l1, r1) = (rules.head._2, rules.head._3)
    // novel words built FROM the first merge's symbols: the replay must
    // merge them; adjacent repeats pin the non-overlap rule; 'qq7'
    // (non-[a-z]) and 'a' (1 char) pin the untrained 1-token fallback
    val w1 = l1 + r1
    val w2 = l1 + r1 + l1 + r1
    val w3 = l1 + l1 + r1 + "zq"
    val text = s"$w1 $w2 $w3 zz qq7 a"
    val batch = Seq((1L, text)).toDF("doc_id", "text")
    val got = LlmQueries.encodeBpe(batch, merges)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val domainToks = Seq(w1, w2, w3, "zz").map(applyMerges).sum
    val expected = (1L, 6L,
      Seq(w1, w2, w3, "zz", "qq7", "a").map(_.length.toLong).sum,
      domainToks + 2L)
    assert(got == Seq(expected),
      s"encodeBpe $got != reference replay $expected (rules $rules)")
    assert(applyMerges(w2) < w2.length,
      "fixture: the trained merges did not shorten the novel word at all")
    // the l97 held-out fixture genuinely exercises the OOV path
    val oov = LlmQueries.qBpeOovEncode(spark, d)
      .agg(sum($"n_oov")).as[Long].collect().head
    assert(oov > 0, "held-out split contains no out-of-vocabulary words")
  }
}
