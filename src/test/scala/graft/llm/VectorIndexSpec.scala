package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted-IVF lifecycle: build writes centroids + partitioned
  * inverted lists; search reads ONLY probed lists (dynamic partition
  * pruning) and self-queries rank themselves first.
  */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("build persists partitioned lists; search self-ranks corpus vectors at cos 1e6") {
    val dir = Files.createTempDirectory("ivf").toString
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    VectorIndex.buildIvf(embs, s"$dir/idx")

    // inverted lists are directory-partitioned by centroid id
    val listDirs = new java.io.File(s"$dir/idx/lists").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("c_id="))
    assert(listDirs.nonEmpty, "no c_id= partition directories written")
    // every corpus vector is in exactly one list
    assert(spark.read.parquet(s"$dir/idx/lists").count() == embs.count())

    val queries = embs.limit(3)
      .select($"vec_id".as("query_id"), $"embedding")
    val got = VectorIndex.searchIvf(spark, s"$dir/idx", queries,
        nprobe = 4, topk = 5)
      .as[(Long, Int, Long, Long)].collect()
    val byQuery = got.groupBy(_._1)
    assert(byQuery.size == 3)
    byQuery.foreach { case (qid, rows) =>
      assert(rows.map(_._2).sorted.sameElements(1 to rows.length))
      val top = rows.minBy(_._2)
      assert(top._3 == qid, s"query $qid rank-1 is ${top._3}, not itself")
      assert(top._4 == 1000000L, s"query $qid self-cos ${top._4} != 1e6")
    }
  }

  test("PQ lifecycle: 4 codes per vector in [0,15]; ADC equals the codebook recomputation") {
    val dir = Files.createTempDirectory("pq").toString
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    VectorIndex.buildPq(embs, s"$dir/idx")

    val codebook = spark.read.parquet(s"$dir/idx/pq_codebook")
      .as[(Long, Long, Array[Float])].collect()
      .map { case (c, s, v) => (s, c) -> v }.toMap
    assert(codebook.size == 64, s"codebook has ${codebook.size} entries, not 4x16")
    val codes = spark.read.parquet(s"$dir/idx/pq_codes")
      .as[(Long, Long, Long)].collect()
    assert(codes.length == embs.count() * 4, "not exactly 4 codes per vector")
    assert(codes.forall(c => c._3 >= 0 && c._3 <= 15), "code out of [0,15]")

    val queries = embs.limit(2).select($"vec_id".as("query_id"), $"embedding")
    val got = VectorIndex.searchPq(spark, s"$dir/idx", queries, topk = 5)
      .as[(Long, Int, Long, Long)].collect()
    assert(got.groupBy(_._1).size == 2)
    got.groupBy(_._1).values.foreach(rows =>
      assert(rows.map(_._2).sorted.sameElements(1 to rows.length)))

    // ADC ground truth for one (query, neighbor): sum over subspaces of
    // floor(dot(q_sub, codeword)*1e6+.5), codeword = codebook[s, code(x,s)]
    val (qid, _, nid, score) = got.head
    val qvec = embs.where($"vec_id" === qid)
      .select($"embedding").as[Array[Float]].head()
    val nCodes = codes.filter(_._1 == nid).sortBy(_._2).map(_._3)
    val expected = (0 until 4).map { s =>
      val cw = codebook((s.toLong, nCodes(s)))
      val qs = qvec.slice(s * 16, s * 16 + 16)
      math.floor(qs.zip(cw).map { case (a, b) =>
        a.toDouble * b.toDouble }.sum * 1e6 + 0.5).toLong
    }.sum
    assert(score == expected, s"ADC $score != recomputed $expected")
  }

  test("mergeIvf equals a frozen-quantizer rebuild over the union; guard + replay hold") {
    val dir = Files.createTempDirectory("ivfmerge").toString
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val base = embs.where($"vec_id" % 9 =!= 5)
    val delta = embs.where($"vec_id" % 9 === 5)
    VectorIndex.buildIvf(base, s"$dir/merged")
    VectorIndex.mergeIvf(spark, s"$dir/merged", delta, mergeId = Some("d1"))

    // Reference: assign the UNION against the SAME persisted quantizer
    // (mergeIvf's contract is frozen-centroid parity, not
    // buildIvf(union) — that would re-sample the quantizer).
    val cent = spark.read.parquet(s"$dir/merged/centroids")
    def vdot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VectorFunctions.vecDot(a, b)
    val e = embs.select($"vec_id", $"embedding",
      sqrt(vdot($"embedding", $"embedding")).as("nrm"))
    val expected = e.join(broadcast(cent))
      .select($"vec_id", $"c_id",
        struct(floor(vdot($"embedding", $"cv") / ($"nrm" * $"cn") * 1e6 + 0.5)
          .cast("long").as("cc"), (-$"c_id").as("nc")).as("k"))
      .groupBy("vec_id").agg(max_by($"c_id", $"k").as("c_id"))
      .as[(Long, Long)].collect().toMap
    val merged = spark.read.parquet(s"$dir/merged/lists")
      .select($"vec_id", $"c_id").as[(Long, Long)].collect()
    assert(merged.length == embs.count(), "merged lists row count")
    merged.foreach { case (v, c) =>
      assert(c == expected(v), s"vec $v assigned to $c, expected ${expected(v)}")
    }

    // replay with the same mergeId: marker-gated no-op
    VectorIndex.mergeIvf(spark, s"$dir/merged", delta, mergeId = Some("d1"))
    assert(spark.read.parquet(s"$dir/merged/lists").count() == embs.count(),
      "replayed mergeIvf re-appended the delta")
    // id-overlap guard fires before writing
    intercept[IllegalArgumentException] {
      VectorIndex.mergeIvf(spark, s"$dir/merged", delta.limit(2))
    }
  }

  test("mergePq equals buildPq over the union when the codebook ids live in the base") {
    val dir = Files.createTempDirectory("pqmerge").toString
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    // codebook ids 10..115 step 7 all satisfy % 9 != 5? not all — split
    // instead on a predicate that keeps the whole codebook window in
    // the base: ids > 200 are the delta.
    val base = embs.where($"vec_id" <= 200)
    val delta = embs.where($"vec_id" > 200)
    VectorIndex.buildPq(base, s"$dir/merged")
    VectorIndex.mergePq(spark, s"$dir/merged", delta, mergeId = Some("d1"))
    VectorIndex.buildPq(embs, s"$dir/scratch")
    def codes(p: String) = spark.read.parquet(s"$p/pq_codes")
      .as[(Long, Long, Long)].collect().toSet
    assert(codes(s"$dir/merged") == codes(s"$dir/scratch"),
      "merged PQ codes diverge from a from-scratch build over the union")
    // replay no-op + guard
    VectorIndex.mergePq(spark, s"$dir/merged", delta, mergeId = Some("d1"))
    assert(codes(s"$dir/merged") == codes(s"$dir/scratch"),
      "replayed mergePq re-appended")
    intercept[IllegalArgumentException] {
      VectorIndex.mergePq(spark, s"$dir/merged", delta.limit(1))
    }
  }

  test("compactIvf/compactPq: search parity, one file per list, markers cleared") {
    val dir = Files.createTempDirectory("ivfcompact").toString
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val base = embs.where($"vec_id" <= 200)
    val delta = embs.where($"vec_id" > 200)
    VectorIndex.buildIvf(base, s"$dir/idx")
    VectorIndex.mergeIvf(spark, s"$dir/idx", delta, mergeId = Some("d1"))
    VectorIndex.buildPq(base, s"$dir/idx")
    VectorIndex.mergePq(spark, s"$dir/idx", delta, mergeId = Some("p1"))
    val queries = embs.where($"vec_id" % 97 === 11)
      .select($"vec_id".as("query_id"), $"embedding")
    def ivfHits() = VectorIndex.searchIvf(spark, s"$dir/idx", queries, 2, 5)
      .as[(Long, Int, Long, Long)].collect().toSeq
    def pqHits() = VectorIndex.searchPq(spark, s"$dir/idx", queries, 5)
      .as[(Long, Int, Long, Long)].collect().toSeq
    // capture the duplicate-free answers FIRST: compaction must restore
    // them after the at-least-once residual corrupts the layout
    val wantIvf = ivfHits(); val wantPq = pqHits()
    // the residual: one stage's append replayed after its commit
    // (duplicate full rows in lists and pq_codes)
    for (stage <- Seq("lists", "pq_codes")) {
      val dup = spark.read.parquet(s"$dir/idx/$stage").limit(5).collect()
      spark.createDataFrame(
          spark.sparkContext.parallelize(dup.toIndexedSeq),
          spark.read.parquet(s"$dir/idx/$stage").schema)
        .write.mode("append")
        .partitionBy(spark.read.parquet(s"$dir/idx/$stage").schema
          .fieldNames.filter(Set("c_id")): _*)
        .parquet(s"$dir/idx/$stage")
    }
    val nLists = spark.read.parquet(s"$dir/idx/lists").count()
    val nCodes = spark.read.parquet(s"$dir/idx/pq_codes").count()
    assert(nLists == embs.count() + 5 && nCodes == 4 * embs.count() + 5,
      "fixture failed to plant duplicate rows")

    VectorIndex.compactIvf(spark, s"$dir/idx", targetFiles = 4)
    VectorIndex.compactPq(spark, s"$dir/idx", targetFiles = 4)

    assert(spark.read.parquet(s"$dir/idx/lists").count() == embs.count(),
      "duplicate list rows survived compaction")
    assert(spark.read.parquet(s"$dir/idx/pq_codes").count() == 4 * embs.count(),
      "duplicate code rows survived compaction")
    assert(ivfHits() == wantIvf, "IVF search drifted under compaction")
    assert(pqHits() == wantPq, "PQ search drifted under compaction")
    def parquetFiles(p: String) = new java.io.File(p).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val listDirs = new java.io.File(s"$dir/idx/lists").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("c_id="))
    assert(listDirs.nonEmpty, "compaction lost the c_id= list layout")
    assert(listDirs.forall(d => parquetFiles(d.getPath) == 1),
      "a c_id= list holds more than one file after compaction")
    assert(parquetFiles(s"$dir/idx/pq_codes") <= 4, "pq_codes files not bounded")
    assert(!new java.io.File(s"$dir/idx/_merges").exists(), "_merges not cleared")
    // replaying an old mergeId now fails loudly on the overlap guard
    intercept[IllegalArgumentException] {
      VectorIndex.mergeIvf(spark, s"$dir/idx", delta, mergeId = Some("d1"))
    }
  }

  test("aligned PQ layout: identical IVF-PQ results, pruned code scan, no membership join") {
    val dir = Files.createTempDirectory("ivfpqalign").toString
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = embs.where($"vec_id" >= 10)
    VectorIndex.buildIvf(corpus, s"$dir/idx")
    VectorIndex.buildPq(corpus, s"$dir/idx")
    val queries = embs.where($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")
    def hits() = VectorIndex.searchIvfPq(spark, s"$dir/idx", queries, 2, 5)
      .as[(Long, Int, Long, Long)].collect().toSeq
    val fallback = hits()

    VectorIndex.alignPqToLists(spark, s"$dir/idx")

    // one c_id= directory per inverted list, each written by one task
    val codeDirs = new java.io.File(s"$dir/idx/pq_codes_by_list").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("c_id="))
    assert(codeDirs.nonEmpty, "aligned layout has no c_id= partitions")
    val aligned = hits()
    assert(aligned == fallback,
      "aligned-layout IVF-PQ search diverges from the membership-join plan")
    // the aligned plan reads the aligned artifact and drops both the
    // full pq_codes scan and the lists membership join
    val plan = VectorIndex.searchIvfPq(spark, s"$dir/idx", queries, 2, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("pq_codes_by_list"),
      s"aligned artifact not used:\n$plan")
    assert(!plan.contains("pq_codes]") && !plan.contains("pq_codes,"),
      s"aligned search still scans the unaligned codes table:\n$plan")
  }

  test("merge/compact invalidate the aligned PQ table: no re-align needed to see the delta") {
    val dir = Files.createTempDirectory("ivfpqstale").toString
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    // keep the fixed codebook window (vec_ids 10..115) inside the base
    val corpus = embs.where($"vec_id".between(10, 200))
    VectorIndex.buildIvf(corpus, s"$dir/idx")
    VectorIndex.buildPq(corpus, s"$dir/idx")
    VectorIndex.alignPqToLists(spark, s"$dir/idx")
    assert(graft.util.Fs.isFile(spark, s"$dir/idx/pq_codes_by_list/_SUCCESS"))

    // the delta: an exact copy of query vector 5 under a fresh id — its
    // list is the query's own rank-1 probe, so any plan that reads the
    // current index MUST surface it; only a stale aligned table can
    // miss it
    val delta = embs.where($"vec_id" === 5)
      .select(lit(900001L).as("vec_id"), $"embedding")
    VectorIndex.mergeIvf(spark, s"$dir/idx", delta, mergeId = Some("s1"))
    VectorIndex.mergePq(spark, s"$dir/idx", delta, mergeId = Some("s1"))
    // merges drop only the serving gate (rows stay for the O(delta)
    // reconcile) — search must be on the fallback plan now
    assert(!graft.util.Fs.isFile(spark, s"$dir/idx/pq_codes_by_list/_SUCCESS"),
      "merge left a stale aligned PQ table serveable")

    val queries = embs.where($"vec_id" === 5)
      .select($"vec_id".as("query_id"), $"embedding")
    def hits() = VectorIndex.searchIvfPq(spark, s"$dir/idx", queries, 4, 5)
      .as[(Long, Int, Long, Long)].collect().toSeq
    val unaligned = hits()
    assert(unaligned.exists(_._3 == 900001L),
      s"merged vector missing from IVF-PQ search without a re-align: $unaligned")

    // re-aligning is an O(delta) reconcile-append: the delta's 4 code
    // rows land, nothing is duplicated, and the aligned plan serves
    // the identical answer
    def alignedRows() = spark.read.parquet(s"$dir/idx/pq_codes_by_list").count()
    val beforeRealign = alignedRows()
    VectorIndex.alignPqToLists(spark, s"$dir/idx")
    assert(alignedRows() == beforeRealign + 4,
      "reconcile-append did not add exactly the delta's code rows")
    assert(hits() == unaligned,
      "re-aligned plan diverges from the membership-join plan over the merged index")
    // a crashed re-align (appended rows, _SUCCESS never restored) is
    // healed by the retry's anti-join — no duplicate rows, gate restored
    graft.util.Fs.delete(spark, s"$dir/idx/pq_codes_by_list/_SUCCESS")
    VectorIndex.alignPqToLists(spark, s"$dir/idx")
    assert(alignedRows() == beforeRealign + 4,
      "re-align retry duplicated aligned code rows")
    assert(graft.util.Fs.isFile(spark, s"$dir/idx/pq_codes_by_list/_SUCCESS"),
      "re-align retry did not restore the serving gate")
    assert(hits() == unaligned, "post-retry aligned search drifted")
    // compaction passes remove rows, so they drop the artifact WHOLE
    // (an append cannot reconcile away rows)
    VectorIndex.compactPq(spark, s"$dir/idx")
    assert(!graft.util.Fs.exists(spark, s"$dir/idx/pq_codes_by_list"),
      "compactPq left a stale aligned PQ table in place")
    VectorIndex.alignPqToLists(spark, s"$dir/idx")
    VectorIndex.compactIvf(spark, s"$dir/idx")
    assert(!graft.util.Fs.exists(spark, s"$dir/idx/pq_codes_by_list"),
      "compactIvf left a stale aligned PQ table in place")
    assert(hits() == unaligned, "search answer drifted across the lifecycle")
  }

  test("re-align is O(delta): pending-only reads, multi-merge consume, mismatched halves fail loudly") {
    val dir = Files.createTempDirectory("ivfpqodelta").toString
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = embs.where($"vec_id".between(10, 200))
    VectorIndex.buildIvf(corpus, s"$dir/idx")
    VectorIndex.buildPq(corpus, s"$dir/idx")
    VectorIndex.alignPqToLists(spark, s"$dir/idx")

    // two daily deltas, merged into both halves but not yet re-aligned
    val d1 = embs.where($"vec_id".between(201, 210))
      .select(($"vec_id" + 800000L).as("vec_id"), $"embedding")
    val d2 = embs.where($"vec_id".between(211, 220))
      .select(($"vec_id" + 800000L).as("vec_id"), $"embedding")
    VectorIndex.mergeIvf(spark, s"$dir/idx", d1, mergeId = Some("day1"))
    VectorIndex.mergePq(spark, s"$dir/idx", d1, mergeId = Some("day1"))
    VectorIndex.mergeIvf(spark, s"$dir/idx", d2, mergeId = Some("day2"))
    VectorIndex.mergePq(spark, s"$dir/idx", d2, mergeId = Some("day2"))

    // capture the fallback answer over the merged index FIRST
    val queries = embs.where($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")
    def hits() = VectorIndex.searchIvfPq(spark, s"$dir/idx", queries, 4, 5)
      .as[(Long, Int, Long, Long)].collect().toSeq
    val fallback = hits()

    // the O(delta) proof: hide BOTH corpus-scale tables — a reconcile
    // that scans lists or pq_codes now fails; the pending-only join
    // must not notice
    assert(graft.util.Fs.rename(spark, s"$dir/idx/lists", s"$dir/hidden_lists"))
    assert(graft.util.Fs.rename(spark, s"$dir/idx/pq_codes", s"$dir/hidden_codes"))
    VectorIndex.alignPqToLists(spark, s"$dir/idx")
    assert(graft.util.Fs.rename(spark, s"$dir/hidden_lists", s"$dir/idx/lists"))
    assert(graft.util.Fs.rename(spark, s"$dir/hidden_codes", s"$dir/idx/pq_codes"))

    // one align consumed every pending merge and restored the gate
    assert(!graft.util.Fs.exists(spark, s"$dir/idx/_align_pending/lists"),
      "pending membership record not consumed")
    assert(!graft.util.Fs.exists(spark, s"$dir/idx/_align_pending/codes"),
      "pending code record not consumed")
    assert(graft.util.Fs.isFile(spark, s"$dir/idx/pq_codes_by_list/_SUCCESS"),
      "re-align did not restore the serving gate")
    assert(hits() == fallback,
      "pending-only re-aligned search diverges from the membership-join plan")
    // a repeat align with nothing pending is a no-op on the rows
    val n = spark.read.parquet(s"$dir/idx/pq_codes_by_list").count()
    VectorIndex.alignPqToLists(spark, s"$dir/idx")
    assert(spark.read.parquet(s"$dir/idx/pq_codes_by_list").count() == n,
      "idle re-align mutated the aligned table")

    // a half-merged delta (IVF landed, PQ not) must fail the re-align
    // loudly instead of clearing provenance it did not consume
    val d3 = embs.where($"vec_id" === 230)
      .select(($"vec_id" + 800000L).as("vec_id"), $"embedding")
    VectorIndex.mergeIvf(spark, s"$dir/idx", d3, mergeId = Some("day3"))
    intercept[IllegalArgumentException] {
      VectorIndex.alignPqToLists(spark, s"$dir/idx")
    }
    // finishing the other half heals it
    VectorIndex.mergePq(spark, s"$dir/idx", d3, mergeId = Some("day3"))
    VectorIndex.alignPqToLists(spark, s"$dir/idx")
    assert(graft.util.Fs.isFile(spark, s"$dir/idx/pq_codes_by_list/_SUCCESS"))
    assert(hits().nonEmpty, "post-heal aligned search returned nothing")
  }

  test("retrainIvf equals buildIvf over the current corpus; re-key invalidates derivatives; kill window converges") {
    val dir = Files.createTempDirectory("ivfretrain").toString
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = embs.where($"vec_id" >= 10)
    val base = corpus.where($"vec_id" % 9 =!= 5)
    val delta = corpus.where($"vec_id" % 9 === 5)
    VectorIndex.buildIvf(base, s"$dir/idx")
    VectorIndex.mergeIvf(spark, s"$dir/idx", delta, mergeId = Some("d1"))
    VectorIndex.buildPq(corpus, s"$dir/idx")
    VectorIndex.alignPqToLists(spark, s"$dir/idx")
    assert(graft.util.Fs.isFile(spark, s"$dir/idx/pq_codes_by_list/_SUCCESS"))

    // the actuator: retrain re-derives the quantizer from the CURRENT
    // corpus — exactly buildIvf(union) (stride over the union count,
    // not the base count the frozen quantizer was trained with)
    VectorIndex.retrainIvf(spark, s"$dir/idx")
    VectorIndex.buildIvf(corpus, s"$dir/scratch")
    def table(p: String, cols: String*) = spark.read.parquet(p)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(table(s"$dir/idx/centroids", "c_id") ==
      table(s"$dir/scratch/centroids", "c_id"),
      "retrained quantizer differs from buildIvf over the union")
    assert(table(s"$dir/idx/lists", "vec_id", "c_id") ==
      table(s"$dir/scratch/lists", "vec_id", "c_id"),
      "retrained lists differ from buildIvf over the union")
    // the re-key dropped the c_id-keyed aligned artifact and provenance
    assert(!graft.util.Fs.exists(spark, s"$dir/idx/pq_codes_by_list"),
      "retrain left a stale aligned PQ table keyed by dead c_ids")
    assert(!graft.util.Fs.exists(spark, s"$dir/idx/_align_pending"),
      "retrain left stale align provenance")
    // merge markers cleared: a replayed old mergeId fails the guard
    intercept[IllegalArgumentException] {
      VectorIndex.mergeIvf(spark, s"$dir/idx", delta, mergeId = Some("d1"))
    }
    // PQ survives (quantizer-independent); a fresh align serves again
    VectorIndex.alignPqToLists(spark, s"$dir/idx")
    val queries = embs.where($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")
    assert(VectorIndex.searchIvfPq(spark, s"$dir/idx", queries, 4, 5)
      .count() > 0, "post-retrain IVF-PQ search returned nothing")

    // mid-retrain kill between the two stage swaps: centroids already
    // swapped to the new generation, lists swap pending (intent up,
    // staged complete). Re-running retrain must converge the PAIR to
    // one complete generation, not serve new centroids over old lists.
    val delta2 = embs.where($"vec_id" === 7)
      .select(lit(950001L).as("vec_id"), $"embedding")
    VectorIndex.mergeIvf(spark, s"$dir/idx", delta2, mergeId = Some("d2"))
    val union2 = corpus.select($"vec_id", $"embedding").unionByName(delta2)
    VectorIndex.buildIvf(union2, s"$dir/scratch2")
    graft.util.Fs.delete(spark, s"$dir/idx/centroids")
    assert(graft.util.Fs.rename(spark, s"$dir/scratch2/centroids",
      s"$dir/idx/centroids"))
    assert(graft.util.Fs.rename(spark, s"$dir/scratch2/lists",
      s"$dir/idx/_compact/lists"))
    graft.util.Fs.touch(spark, s"$dir/idx/_compact/_swapping_lists")
    VectorIndex.retrainIvf(spark, s"$dir/idx")
    VectorIndex.buildIvf(union2, s"$dir/scratch3")
    assert(table(s"$dir/idx/centroids", "c_id") ==
      table(s"$dir/scratch3/centroids", "c_id"),
      "post-kill retrain centroids diverge from the union rebuild")
    assert(table(s"$dir/idx/lists", "vec_id", "c_id") ==
      table(s"$dir/scratch3/lists", "vec_id", "c_id"),
      "post-kill retrain lists diverge from the union rebuild")
  }

  test("filtered search never surfaces a disallowed vector; ranks stay dense") {
    val dir = Files.createTempDirectory("ivffiltered").toString
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    VectorIndex.buildIvf(embs.where($"vec_id" >= 10), s"$dir/idx")
    val queries = embs.where($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")
    val allowed = embs.where($"vec_id" % 3 === 0).select($"vec_id")
    val got = VectorIndex.searchIvfFiltered(spark, s"$dir/idx", queries,
        allowed, nprobe = 4, topk = 5)
      .as[(Long, Int, Long, Long)].collect()
    assert(got.nonEmpty, "filtered search returned nothing")
    assert(got.forall(_._3 % 3 == 0),
      "a disallowed vector leaked through the filter")
    got.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._2).sorted.sameElements(1 to rows.length),
        s"query $qid ranks not dense: ${rows.map(_._2).toSeq}")
      assert(rows.length <= 5)
    }
    // the unfiltered search must NOT equal the filtered one here (the
    // filter excludes 2/3 of the corpus): post-filter semantics are
    // doing real work, not a no-op
    val unfiltered = VectorIndex.searchIvf(spark, s"$dir/idx", queries, 4, 5)
      .as[(Long, Int, Long, Long)].collect()
    assert(!unfiltered.forall(_._3 % 3 == 0),
      "fixture too weak: the unfiltered top-k already satisfies the filter")
  }

  test("cell-balance audit records the l83 verdict; maintainIfDue retrains and consumes it") {
    val dir = Files.createTempDirectory("ivfmaint").toString
    val idx = s"$dir/idx"
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = embs.where($"vec_id" >= 10)
    VectorIndex.buildIvf(corpus, idx)
    // healthy index: audit records the verdict (audit trail) but no
    // retrain is due, and the actuator is a no-op
    assert(!VectorIndex.auditCellBalance(spark, idx),
      "healthy index tripped the 3x bar")
    assert(graft.util.Fs.isFile(spark, s"$idx/_maintenance/balance/_SUCCESS"),
      "audit did not record its verdict")
    assert(!VectorIndex.maintenanceDue(spark, idx))
    assert(!VectorIndex.maintainIfDue(spark, idx))

    // the l81 failure mode: a constant-direction flood (0.4x the
    // corpus, every row vec_id 7's embedding) all lands in ONE frozen
    // cell — the audit must flip the 3x verdict
    val n = corpus.count()
    val flood = spark.range(1, 2 * n / 5 + 1)
      .select(($"id" + 800000L).as("vec_id"))
      .crossJoin(embs.where($"vec_id" === 7).select($"embedding"))
    VectorIndex.mergeIvf(spark, idx, flood, mergeId = Some("flood"))
    assert(VectorIndex.auditCellBalance(spark, idx),
      "constant-direction flood did not trip the 3x bar")
    assert(VectorIndex.maintenanceDue(spark, idx))

    // the actuator consumes the verdict: retrain runs, and the result
    // is exactly buildIvf over the current (flooded) corpus
    assert(VectorIndex.maintainIfDue(spark, idx), "actuator did not run")
    VectorIndex.buildIvf(
      corpus.select($"vec_id", $"embedding").unionByName(flood),
      s"$dir/scratch")
    def table(p: String, cols: String*) = spark.read.parquet(p)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(table(s"$idx/centroids", "c_id") ==
      table(s"$dir/scratch/centroids", "c_id"),
      "maintained quantizer differs from buildIvf over the flooded corpus")
    assert(table(s"$idx/lists", "vec_id", "c_id") ==
      table(s"$dir/scratch/lists", "vec_id", "c_id"),
      "maintained lists differ from buildIvf over the flooded corpus")
    // verdict consumed: the loop is quiescent until the next audit
    assert(!graft.util.Fs.exists(spark, s"$idx/_maintenance/balance"),
      "verdict not cleared after the retrain")
    assert(!VectorIndex.maintainIfDue(spark, idx))
  }

  test("retrainIvf preserves a streamed batch_id= layout; post-retrain replay stays safe") {
    val dir = Files.createTempDirectory("ivfstreamretrain").toString
    val idx = s"$dir/idx"
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = embs.where($"vec_id" >= 10)
      .select($"vec_id", $"embedding")
    VectorIndex.trainQuantizer(corpus, idx)
    val b0 = corpus.where($"vec_id" % 2 === 0)
    val b1 = corpus.where($"vec_id" % 2 === 1)
    graft.streaming.VecStream.ingestBatch(b0, idx, 0L)
    graft.streaming.VecStream.ingestBatch(b1, idx, 1L, balanceAudit = true)
    // the fold's audit recorded its verdict
    assert(graft.util.Fs.isFile(spark, s"$idx/_maintenance/balance/_SUCCESS"),
      "ingest fold did not record the balance audit")

    VectorIndex.retrainIvf(spark, idx)
    // the re-key kept the replay partitions: batch_id= outer, c_id= in
    val batchDirs = graft.util.Fs
      .listDirNames(spark, graft.util.Fs.stagePath(spark, idx, "lists"))
      .filter(_.startsWith("batch_id=")).sorted
    assert(batchDirs == Seq("batch_id=0", "batch_id=1"),
      s"retrain lost the streamed replay partitions: $batchDirs")
    assert(graft.util.Fs.listDirNames(spark,
        s"${graft.util.Fs.stagePath(spark, idx, "lists")}/batch_id=0")
      .exists(_.startsWith("c_id=")), "c_id= layer missing under batch dirs")
    // every vector survived the re-key with its batch
    assert(spark.read.parquet(graft.util.Fs.stagePath(spark, idx, "lists"))
      .count() == corpus.count())

    // a crash-replay of batch 1 AFTER the retrain overwrites its own
    // partition under the new quantizer — no mixed-depth corruption,
    // and the index stays complete and searchable
    graft.streaming.VecStream.ingestBatch(b1, idx, 1L)
    assert(spark.read.parquet(graft.util.Fs.stagePath(spark, idx, "lists"))
      .count() == corpus.count(),
      "post-retrain replay changed the corpus size")
    val queries = embs.where($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")
    assert(VectorIndex.searchIvf(spark, idx, queries, 4, 5).count() > 0,
      "search broken after post-retrain replay")
  }

  test("pointer-protocol retrain: journaled two-stage flip, parity with buildIvf, pointed layout serves") {
    val dir = Files.createTempDirectory("ivfptr").toString
    val idx = s"$dir/idx"
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = embs.where($"vec_id" >= 10)
    VectorIndex.buildIvf(corpus, idx)
    VectorIndex.buildPq(corpus, idx)
    def table(p: String, cols: String*) = spark.read.parquet(p)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet

    {
      // swap mode passed per-call; the layout is sticky afterwards, so
      // the later recoverStages/stagedDir calls stay pointer-governed
      // without any session-conf toggle
      VectorIndex.retrainIvf(spark, idx, swapMode = Some("pointer"))
      // both stages flipped to published generations; the superseded
      // bare directories are RETAINED for in-flight readers (the
      // retainGens window — GC happens at later maintenance entries)
      for (stage <- Seq("centroids", "lists")) {
        assert(graft.util.Fs.isFile(spark, s"$idx/_ptr/$stage"),
          s"$stage: no pointer published")
        assert(graft.util.Fs.exists(spark, s"$idx/$stage"),
          s"$stage: superseded bare directory dropped at flip time — " +
            "in-flight readers would lose files mid-scan")
      }
      assert(!graft.util.Fs.isFile(spark, s"$idx/_ptr/_intent"),
        "intent journal not cleared after a completed retrain")
      // parity: pointer-mode retrain computes exactly buildIvf(corpus)
      VectorIndex.buildIvf(corpus, s"$dir/scratch")
      assert(table(graft.util.Fs.stagePath(spark, idx, "centroids"), "c_id") ==
        table(s"$dir/scratch/centroids", "c_id"),
        "pointer-mode retrained quantizer differs from buildIvf")
      assert(table(graft.util.Fs.stagePath(spark, idx, "lists"),
          "vec_id", "c_id") ==
        table(s"$dir/scratch/lists", "vec_id", "c_id"),
        "pointer-mode retrained lists differ from buildIvf")
      // serving resolves through the pointers: plain IVF search, then
      // the composed IVF-PQ path after a fresh align (retrain dropped
      // the c_id-keyed aligned artifact, as in rename mode)
      val queries = embs.where($"vec_id" < 10)
        .select($"vec_id".as("query_id"), $"embedding")
      assert(VectorIndex.searchIvf(spark, idx, queries, 4, 5).count() > 0)
      VectorIndex.alignPqToLists(spark, idx)
      assert(VectorIndex.searchIvfPq(spark, idx, queries, 4, 5).count() > 0,
        "IVF-PQ search over the pointed layout returned nothing")

      // crash between the journal write and the flips: BOTH stages'
      // generations are staged and journaled; recovery must flip both
      // — the journal is what keeps a two-stage swap from serving new
      // centroids over old lists
      val wantC = table(graft.util.Fs.stagePath(spark, idx, "centroids"),
        "c_id", "cv", "cn")
      val wantL = table(graft.util.Fs.stagePath(spark, idx, "lists"),
        "vec_id", "c_id")
      val sc = graft.llm.IndexMaintenance.stagedDir(spark, idx, "centroids")
      val sl = graft.llm.IndexMaintenance.stagedDir(spark, idx, "lists")
      spark.read.parquet(graft.util.Fs.stagePath(spark, idx, "centroids"))
        .write.parquet(sc)
      spark.read.parquet(graft.util.Fs.stagePath(spark, idx, "lists"))
        .write.parquet(sl)
      graft.util.Fs.writeString(spark, s"$idx/_ptr/_intent",
        s"centroids ${sc.split('/').last}\nlists ${sl.split('/').last}")
      graft.llm.IndexMaintenance.recoverStages(spark, idx,
        Seq("centroids", "lists"))
      assert(graft.util.Fs.readString(spark, s"$idx/_ptr/centroids").trim ==
        sc.split('/').last, "journal replay missed the centroids flip")
      assert(graft.util.Fs.readString(spark, s"$idx/_ptr/lists").trim ==
        sl.split('/').last, "journal replay missed the lists flip")
      assert(table(graft.util.Fs.stagePath(spark, idx, "centroids"),
        "c_id", "cv", "cn") == wantC, "replayed flip changed the quantizer")
      assert(table(graft.util.Fs.stagePath(spark, idx, "lists"),
        "vec_id", "c_id") == wantL, "replayed flip changed the lists")
      assert(VectorIndex.searchIvf(spark, idx, queries, 4, 5).count() > 0,
        "search broken after journal replay")
    }
  }

  test("lloyd-refined quantizer: same schema and K, deterministic, searchable") {
    val dir = Files.createTempDirectory("ivflloyd").toString
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = embs.where($"vec_id" >= 10)
    VectorIndex.buildIvf(corpus, s"$dir/a", lloydIters = 2)
    VectorIndex.buildIvf(corpus, s"$dir/b", lloydIters = 2)
    VectorIndex.buildIvf(corpus, s"$dir/sampled")
    val refined = spark.read.parquet(s"$dir/a/centroids")
      .select($"c_id", $"cv", $"cn")
      .as[(Long, Array[Float], Double)].collect().sortBy(_._1)
    val again = spark.read.parquet(s"$dir/b/centroids")
      .select($"c_id", $"cv", $"cn")
      .as[(Long, Array[Float], Double)].collect().sortBy(_._1)
    val sampled = spark.read.parquet(s"$dir/sampled/centroids")
      .select($"c_id").as[Long].collect().sorted
    // same cells (seed ids), refined positions, bit-identical re-run
    assert(refined.map(_._1).sameElements(sampled),
      "refinement changed the cell id set")
    assert(refined.length == again.length &&
      refined.zip(again).forall { case ((i1, v1, n1), (i2, v2, n2)) =>
        i1 == i2 && n1 == n2 && v1.sameElements(v2) },
      "refined quantizer is not deterministic across builds")
    assert(refined.exists { case (id, v, _) =>
      val seed = corpus.where($"vec_id" === id)
        .select($"embedding").as[Array[Float]].head()
      !v.sameElements(seed)
    }, "refinement moved no centroid — Lloyd step had no effect")
    // the refined index serves: every corpus self-query still ranks
    // itself first at cos 1e6 (refinement moves cell boundaries, not
    // the exact re-ranking)
    val queries = corpus.limit(3).select($"vec_id".as("query_id"), $"embedding")
    val got = VectorIndex.searchIvf(spark, s"$dir/a", queries, 4, 5)
      .as[(Long, Int, Long, Long)].collect()
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val top = rows.minBy(_._2)
      assert(top._3 == qid && top._4 == 1000000L,
        s"refined-index self-query $qid does not rank itself first")
    }
  }

  test("filtered search: autoOverProbe equals the explicit overProbeOf width; selectivity is corpus-scoped") {
    val dir = Files.createTempDirectory("ivffilter").toString
    val idx = s"$dir/idx"
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = embs.where($"vec_id" >= 10)
    VectorIndex.buildIvf(corpus, idx)
    val queries = embs.where($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    // a 1-in-5 filter widens the probe width by ~5x (capped at K)
    val allowed = corpus.where($"vec_id" % 5 === 0).select($"vec_id")
    val eff = VectorIndex.overProbeOf(spark, idx, allowed, 2)
    assert(eff > 2, s"selective filter did not widen the probe count: $eff")
    val auto = VectorIndex
      .searchIvfFiltered(spark, idx, queries, allowed, 2, 5,
        autoOverProbe = true)
      .collect().map(_.toSeq).toSeq
    val explicit = VectorIndex
      .searchIvfFiltered(spark, idx, queries, allowed, eff, 5)
      .collect().map(_.toSeq).toSeq
    assert(auto == explicit,
      "autoOverProbe diverged from the explicit overProbeOf width")
    // an unselective filter does not widen...
    assert(VectorIndex.overProbeOf(spark, idx,
      corpus.select($"vec_id"), 2) == 2)
    // ...and ids the index does not hold cannot dilute the measured
    // selectivity (the filter may come from a wider table)
    val withJunk = allowed.unionByName(
      spark.range(5000000, 5003000).select($"id".as("vec_id")))
    assert(VectorIndex.overProbeOf(spark, idx, withJunk, 2) == eff,
      "out-of-corpus ids diluted the selectivity estimate")
  }

  test("search prunes unprobed list partitions via dynamic partition pruning") {
    val dir = Files.createTempDirectory("ivfdpp").toString
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    VectorIndex.buildIvf(embs, s"$dir/idx")
    val queries = embs.limit(1).select($"vec_id".as("query_id"), $"embedding")
    val df = VectorIndex.searchIvf(spark, s"$dir/idx", queries, 2, 5)
    val planned = df.queryExecution.executedPlan.toString
    assert(planned.toLowerCase.contains("dynamicpruning"),
      s"list scan is not dynamically pruned:\n$planned")
  }

  test("deleteIvf tombstones vectors on every serving path; folds clear only when complete") {
    val dir = Files.createTempDirectory("ivf").toString
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    VectorIndex.buildIvf(embs, s"$dir/idx")
    VectorIndex.buildPq(embs, s"$dir/idx")
    VectorIndex.alignPqToLists(spark, s"$dir/idx")
    val deleted = embs.where($"vec_id" % 7 === 3).select($"vec_id")
    val deletedIds = deleted.as[Long].collect().toSet
    assert(deletedIds.nonEmpty)
    VectorIndex.deleteIvf(spark, s"$dir/idx", deleted)

    val queries = embs.where($"vec_id" % 7 === 3).limit(2)
      .select($"vec_id".as("query_id"), $"embedding")
    // self-queries over deleted vectors: the deleted self can no longer
    // be its own rank-1 on any serving path
    def neighborsOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("neighbor_id").as[Long].collect().toSet
    val ivf = neighborsOf(VectorIndex.searchIvf(spark, s"$dir/idx",
      queries, nprobe = 4, topk = 5))
    assert(ivf.nonEmpty && ivf.intersect(deletedIds).isEmpty,
      "searchIvf served a deleted vector")
    val pq = neighborsOf(VectorIndex.searchPq(spark, s"$dir/idx", queries, 5))
    assert(pq.nonEmpty && pq.intersect(deletedIds).isEmpty,
      "searchPq served a deleted vector")
    assert(graft.util.Fs.isFile(spark, s"$dir/idx/pq_codes_by_list/_SUCCESS"),
      "delete must not invalidate the aligned artifact (reads filter)")
    val ivfpqAligned = VectorIndex.searchIvfPq(spark, s"$dir/idx",
      queries, nprobe = 4, topk = 5)
    assert(neighborsOf(ivfpqAligned).intersect(deletedIds).isEmpty,
      "aligned IVFADC served a deleted vector")
    graft.util.Fs.delete(spark, s"$dir/idx/pq_codes_by_list/_SUCCESS")
    val ivfpqFallback = VectorIndex.searchIvfPq(spark, s"$dir/idx",
      queries, nprobe = 4, topk = 5)
    assert(neighborsOf(ivfpqFallback).intersect(deletedIds).isEmpty,
      "fallback IVFADC served a deleted vector")
    graft.util.Fs.touch(spark, s"$dir/idx/pq_codes_by_list/_SUCCESS")
    val filtered = VectorIndex.searchIvfFiltered(spark, s"$dir/idx", queries,
      embs.select($"vec_id"), nprobe = 4, topk = 5)
    assert(neighborsOf(filtered).intersect(deletedIds).isEmpty,
      "filtered search served a deleted vector")

    // re-adding a deleted id pre-fold fails loudly (the id-overlap
    // guard sees the raw lists)
    val readd = embs.where($"vec_id" === deletedIds.min)
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.mergeIvf(spark, s"$dir/idx", readd)
    }
    assert(ex.getMessage.contains("vec_ids"), ex.getMessage)
    // an in-place rebuild over the tombstoned layout fails loudly too
    val exb = intercept[IllegalArgumentException] {
      VectorIndex.buildIvf(embs, s"$dir/idx")
    }
    assert(exb.getMessage.contains("tombstones"), exb.getMessage)

    // compactIvf folds the lists but must NOT clear the tombstones
    // while pq_codes still holds the deleted rows
    val servedBefore = VectorIndex.searchIvf(spark, s"$dir/idx", queries,
      nprobe = 4, topk = 5).collect().toSeq
    VectorIndex.compactIvf(spark, s"$dir/idx")
    assert(new java.io.File(s"$dir/idx/_tombstones").exists(),
      "tombstones cleared while pq_codes was unfolded")
    assert(spark.read.parquet(s"$dir/idx/lists").select("vec_id")
      .as[Long].collect().toSet.intersect(deletedIds).isEmpty,
      "compactIvf left deleted rows in the lists")
    // THE dangerous window: the lists no longer hold the id (so the
    // overlap guard passes) but the tombstone is still live — without
    // the tombstone guard this merge would land rows that the read
    // filter silently re-deletes
    val ex2 = intercept[IllegalArgumentException] {
      VectorIndex.mergeIvf(spark, s"$dir/idx", readd)
    }
    assert(ex2.getMessage.contains("tombstoned"), ex2.getMessage)
    // the full fold (lists + pq_codes in one swap set) RETIRES them:
    // the _FOLDED marker names what the next maintenance entry GCs
    VectorIndex.compact(spark, s"$dir/idx")
    assert(Option(new java.io.File(s"$dir/idx/_tombstones").listFiles())
      .exists(_.exists(_.getName.startsWith("_FOLDED"))),
      "compact(all) did not retire the tombstones")
    assert(spark.read.parquet(s"$dir/idx/pq_codes").select("vec_id")
      .as[Long].collect().toSet.intersect(deletedIds).isEmpty,
      "fold left deleted rows in pq_codes")
    // fold parity: the served results are unchanged by the rewrite
    val servedAfter = VectorIndex.searchIvf(spark, s"$dir/idx", queries,
      nprobe = 4, topk = 5).collect().toSeq
    assert(servedAfter == servedBefore, "fold changed served results")
    // retired tombstones still refuse a re-add; the next maintenance
    // entry GCs them and frees the id
    intercept[IllegalArgumentException] {
      VectorIndex.mergeIvf(spark, s"$dir/idx", readd)
    }
    VectorIndex.compact(spark, s"$dir/idx")
    assert(!new java.io.File(s"$dir/idx/_tombstones").exists(),
      "second maintenance entry did not GC the retired tombstones")
    VectorIndex.mergeIvf(spark, s"$dir/idx", readd)
    assert(spark.read.parquet(s"$dir/idx/lists")
      .where($"vec_id" === deletedIds.min).count() == 1L)
  }

  test("a reader never composes a half-flipped multi-stage pointer swap: blocked loudly, unblocked by recovery") {
    val dir = Files.createTempDirectory("ivf").toString
    val idx = s"$dir/idx"
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    VectorIndex.buildIvf(embs, idx)
    // pointer-govern BOTH stages (a pointer-protocol retrain stages and
    // flips centroids + lists under the one-file journal)
    VectorIndex.retrainIvf(spark, idx, swapMode = Some("pointer"))
    val q = embs.limit(2).select($"vec_id".as("query_id"), $"embedding")
    val before = VectorIndex.searchIvf(spark, idx, q, 4, 5).collect().toSeq
    assert(before.nonEmpty)
    // plant a crashed TWO-stage flip: stage content-identical fresh
    // generations for both stages, journal both, flip ONLY centroids —
    // the exact mixed state (new centroids over old lists) a per-stage
    // resolver would happily compose
    val stagedC = IndexMaintenance.stagedDir(spark, idx, "centroids")
    spark.read.parquet(graft.util.Fs.stagePath(spark, idx, "centroids"))
      .write.parquet(stagedC)
    val stagedL = IndexMaintenance.stagedDir(spark, idx, "lists")
    spark.read.parquet(graft.util.Fs.stagePath(spark, idx, "lists"))
      .write.partitionBy("c_id").parquet(stagedL)
    graft.util.Fs.writeString(spark, s"$idx/_ptr/_intent",
      s"centroids ${stagedC.split('/').last}\nlists ${stagedL.split('/').last}")
    graft.util.Fs.writeString(spark, s"$idx/_ptr/centroids",
      stagedC.split('/').last)
    // the snapshot resolver must refuse to serve while the flip journal
    // is up — the "do not serve between a crash and its recovery"
    // contract enforced mechanically (retries ~5s, then loud)
    val ex = intercept[IllegalStateException] {
      VectorIndex.searchIvf(spark, idx, q, 4, 5).collect()
    }
    assert(ex.getMessage.contains("in flight"), ex.getMessage)
    // any maintenance entry converges the flip; the read then serves
    // the complete post-flip set (content-identical copies here, so
    // results must equal the pre-flip read exactly)
    IndexMaintenance.recoverStages(spark, idx, Seq("centroids", "lists"),
      swapMode = Some("pointer"))
    assert(!graft.util.Fs.isFile(spark, s"$idx/_ptr/_intent"))
    val after = VectorIndex.searchIvf(spark, idx, q, 4, 5).collect().toSeq
    assert(after == before, "converged read diverged from the flipped content")
  }

  test("retrainIvf trains on the tombstone-filtered corpus and folds the lists") {
    val dir = Files.createTempDirectory("ivf").toString
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    VectorIndex.buildIvf(embs, s"$dir/idx")
    val deleted = embs.where($"vec_id" % 5 === 1).select($"vec_id")
    val deletedIds = deleted.as[Long].collect().toSet
    VectorIndex.deleteIvf(spark, s"$dir/idx", deleted)
    VectorIndex.retrainIvf(spark, s"$dir/idx")
    // the rebuild excluded the deleted vectors from lists AND training
    assert(spark.read.parquet(s"$dir/idx/lists").select("vec_id")
      .as[Long].collect().toSet.intersect(deletedIds).isEmpty,
      "retrain kept deleted vectors")
    // no pq stage here, so the retrain completed the fold (retired —
    // GC'd by the next maintenance entry)
    assert(Option(new java.io.File(s"$dir/idx/_tombstones").listFiles())
      .exists(_.exists(_.getName.startsWith("_FOLDED"))),
      "retrain did not retire a completed fold")
    // parity: retrained == buildIvf over the surviving corpus
    val ref = Files.createTempDirectory("ivf").toString
    VectorIndex.buildIvf(
      embs.where($"vec_id" % 5 =!= 1), s"$ref/idx")
    val q = embs.limit(3).select($"vec_id".as("query_id"), $"embedding")
    val got = VectorIndex.searchIvf(spark, s"$dir/idx", q, 4, 5).collect().toSeq
    val want = VectorIndex.searchIvf(spark, s"$ref/idx", q, 4, 5).collect().toSeq
    assert(got == want, "retrained index != survivors-only build")
  }

  test("searchIvfAsOf serves the retained pre-retrain generation; bounds and takedowns enforced") {
    val dir = Files.createTempDirectory("ivfasof").toString
    val idx = s"$dir/idx"
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = embs.where($"vec_id" >= 10)
    VectorIndex.buildIvf(corpus.where($"vec_id" % 9 =!= 5), idx)
    VectorIndex.mergeIvf(spark, idx, corpus.where($"vec_id" % 9 === 5),
      mergeId = Some("asof-delta"))
    val q = embs.where($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")
    // never pointer-swapped: no history exists, and the error says so
    val ex0 = intercept[IllegalArgumentException] {
      VectorIndex.searchIvfAsOf(spark, idx, q, 4, 5, back = 1).count()
    }
    assert(ex0.getMessage.contains("never"), ex0.getMessage)
    val pre = VectorIndex.searchIvf(spark, idx, q, 4, 5)
      .as[(Long, Int, Long, Long)].collect().toSeq
    VectorIndex.retrainIvf(spark, idx, swapMode = Some("pointer"))
    // back=1 is the pre-retrain index, exactly — centroids AND lists
    // resolved at the superseded generation as one lockstep pair
    val asOf = VectorIndex.searchIvfAsOf(spark, idx, q, 4, 5, back = 1)
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(asOf == pre, "asOf(1) != the pre-retrain search")
    // past what ever existed: loud, with the widening knob named
    val ex1 = intercept[IllegalArgumentException] {
      VectorIndex.searchIvfAsOf(spark, idx, q, 4, 5, back = 2).count()
    }
    assert(ex1.getMessage.contains("retainGens"), ex1.getMessage)
    // a takedown beats time travel: current tombstones filter history
    val victim = pre.head._3
    VectorIndex.deleteIvf(spark, idx, Seq(victim).toDF("vec_id"))
    val historic = VectorIndex.searchIvfAsOf(spark, idx, q, 4, 5, back = 1)
      .as[(Long, Int, Long, Long)].collect()
    assert(!historic.exists(_._3 == victim),
      "a deleted vector was served from a historical snapshot")
  }

  test("searchIvfPqAsOf: retained coarse pair + live PQ halves, aligned bypassed; bounds and takedowns enforced") {
    val dir = Files.createTempDirectory("ivfpqasof").toString
    val idx = s"$dir/idx"
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = embs.where($"vec_id" >= 10)
    val base = corpus.where($"vec_id" % 9 =!= 5)
    val delta = corpus.where($"vec_id" % 9 === 5)
    VectorIndex.buildIvf(base, idx)
    VectorIndex.buildPq(base, idx)
    VectorIndex.alignPqToLists(spark, idx)
    VectorIndex.mergeIvf(spark, idx, delta, mergeId = Some("pqasof-ivf"))
    VectorIndex.mergePq(spark, idx, delta, mergeId = Some("pqasof-pq"))
    val q = embs.where($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")
    // never pointer-swapped: no coarse history, and the error says so
    val ex0 = intercept[IllegalArgumentException] {
      VectorIndex.searchIvfPqAsOf(spark, idx, q, 4, 5, back = 1).count()
    }
    assert(ex0.getMessage.contains("never"), ex0.getMessage)
    val pre = VectorIndex.searchIvfPq(spark, idx, q, 4, 5)
      .as[(Long, Int, Long, Long)].collect().toSeq
    VectorIndex.retrainIvf(spark, idx, swapMode = Some("pointer"))
    VectorIndex.alignPqToLists(spark, idx)
    // the LIVE search serves the re-aligned fast path; the historical
    // read must equal the pre-retrain ADC search exactly — old coarse
    // pair, same frozen codebook/codes, membership-join plan (the
    // aligned artifact is keyed by the NEW quantizer's c_ids)
    val asOf = VectorIndex.searchIvfPqAsOf(spark, idx, q, 4, 5, back = 1)
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(asOf == pre, "searchIvfPqAsOf(1) != the pre-retrain ADC search")
    // back = 0 is exactly the live read
    val live = VectorIndex.searchIvfPq(spark, idx, q, 4, 5)
      .as[(Long, Int, Long, Long)].collect().toSeq
    val asOf0 = VectorIndex.searchIvfPqAsOf(spark, idx, q, 4, 5, back = 0)
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(asOf0 == live, "searchIvfPqAsOf(0) != the live search")
    // past what ever existed: loud, with the widening knob named
    val ex1 = intercept[IllegalArgumentException] {
      VectorIndex.searchIvfPqAsOf(spark, idx, q, 4, 5, back = 2).count()
    }
    assert(ex1.getMessage.contains("retainGens"), ex1.getMessage)
    // a takedown beats time travel: current tombstones filter the
    // historical membership join too
    val victim = pre.head._3
    VectorIndex.deleteIvf(spark, idx, Seq(victim).toDF("vec_id"))
    val historic = VectorIndex.searchIvfPqAsOf(spark, idx, q, 4, 5, back = 1)
      .as[(Long, Int, Long, Long)].collect()
    assert(!historic.exists(_._3 == victim),
      "a deleted vector was served from a historical ADC snapshot")
  }

  test("searchIvfPqAsOfBatch slices lists AND codes; the frontier equals live; batch-less layouts fail loudly") {
    val dir = Files.createTempDirectory("ivfpqasofb").toString
    val idx = s"$dir/idx"
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = embs.where($"vec_id" >= 10)
    VectorIndex.trainQuantizer(corpus, idx)
    VectorIndex.trainPqCodebook(corpus, idx)
    graft.streaming.VecStream.ingestBatch(
      corpus.where($"vec_id" % 2 === 0), idx, 0L, pqCodes = true)
    graft.streaming.VecStream.ingestBatch(
      corpus.where($"vec_id" % 2 === 1), idx, 1L, pqCodes = true)
    val q = embs.where($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")
    // the frontier snapshot IS the live search
    val live = VectorIndex.searchIvfPq(spark, idx, q, 4, 5)
      .as[(Long, Int, Long, Long)].collect().toSeq
    val frontier = VectorIndex.searchIvfPqAsOfBatch(spark, idx, q, 4, 5, n = 1L)
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(frontier == live, "asOfBatch(frontier) != the live ADC search")
    // the shallow snapshot serves only batch 0's (even) vectors
    val b0 = VectorIndex.searchIvfPqAsOfBatch(spark, idx, q, 4, 5, n = 0L)
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(b0.nonEmpty && b0.forall(_._3 % 2 == 0),
      "asOfBatch(0) served a later batch's vector")
    // a batch-less (buildIvf+buildPq) layout has no batch axis: loud
    val plain = s"$dir/plain"
    VectorIndex.buildIvf(corpus, plain)
    VectorIndex.buildPq(corpus, plain)
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.searchIvfPqAsOfBatch(spark, plain, q, 4, 5, n = 0L).count()
    }
    assert(ex.getMessage.contains("batch_id"), ex.getMessage)
  }

  /** The aligned-at-depth fixture: base+delta merged into BOTH halves,
    * THEN aligned (gate-complete over the union — exactly the artifact
    * the upcoming flip supersedes), pointer-retrained, re-aligned.
    */
  private def retainedFixture(dir: String): (String,
      org.apache.spark.sql.DataFrame,
      Seq[(Long, Int, Long, Long)]) = {
    val idx = s"$dir/idx"
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = embs.where($"vec_id" >= 10)
    VectorIndex.buildIvf(corpus.where($"vec_id" % 9 =!= 5), idx)
    VectorIndex.buildPq(corpus.where($"vec_id" % 9 =!= 5), idx)
    VectorIndex.mergeIvf(spark, idx, corpus.where($"vec_id" % 9 === 5),
      mergeId = Some("ret-ivf"))
    VectorIndex.mergePq(spark, idx, corpus.where($"vec_id" % 9 === 5),
      mergeId = Some("ret-pq"))
    VectorIndex.alignPqToLists(spark, idx)
    assert(graft.util.Fs.isFile(spark, s"$idx/pq_codes_by_list/_SUCCESS"),
      "fixture: aligned gate not up before the retrain")
    val q = embs.where($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")
    val pre = VectorIndex.searchIvfPq(spark, idx, q, 4, 5)
      .as[(Long, Int, Long, Long)].collect().toSeq
    VectorIndex.retrainIvf(spark, idx, swapMode = Some("pointer"))
    VectorIndex.alignPqToLists(spark, idx)
    (idx, q, pre)
  }

  private def asOf1(idx: String, q: org.apache.spark.sql.DataFrame) =
    VectorIndex.searchIvfPqAsOf(spark, idx, q, 4, 5, back = 1)
      .as[(Long, Int, Long, Long)].collect().toSeq

  test("pointer retrain retains the gate-complete aligned codes; searchIvfPqAsOf serves them at depth == membership join") {
    val dir = Files.createTempDirectory("ivfpqret").toString
    val (idx, q, pre) = retainedFixture(dir)
    // the superseded pair's aligned copy is retained, gated, keyed by
    // the generation the flip superseded (g0 = the bare pre-pointer
    // layout), and the live view dropped it until the re-align
    assert(graft.util.Fs.isFile(spark,
      s"$idx/_gen/pq_codes_by_list/g0/_RETAINED"),
      "retrain did not retain the gate-complete aligned copy")
    // the retained copy carries NONE of the live artifact's align
    // markers: a _BASE surviving a torn copy+delete move would send
    // the next align down the incremental branch over a partial source
    for (m <- Seq("_SUCCESS", "_BASE", "_CONSUMED"))
      assert(!graft.util.Fs.isFile(spark,
        s"$idx/_gen/pq_codes_by_list/g0/$m"),
        s"the retained copy kept the live $m marker")
    // the historical read serves the retained aligned scan and equals
    // the pre-retrain ADC search exactly
    val aligned = asOf1(idx, q)
    assert(aligned == pre, "aligned-at-depth != the pre-retrain search")
    // the retained aligned plan IS pruned: the previous leg's code scan
    // reads only probed c_id= partitions of the retained artifact, and
    // no bare pq_codes membership join appears anywhere in the plan
    val hist = VectorIndex.searchIvfPqAsOf(spark, idx, q, 4, 5, back = 1)
    val plan = hist.queryExecution.executedPlan.toString
    assert(plan.contains("_gen/pq_codes_by_list/g0"),
      "historical plan does not scan the retained aligned copy")
    assert(!plan.contains("/idx/pq_codes]") &&
      !plan.contains("/idx/pq_codes/"),
      s"historical plan fell back to the bare pq_codes membership join:\n$plan")
    // cell-for-cell equal to the always-correct membership join (the
    // operator escape hatch forces it)
    spark.conf.set("spark.graft.index.alignedAsOf", "off")
    val joined = try asOf1(idx, q)
      finally spark.conf.unset("spark.graft.index.alignedAsOf")
    assert(joined == aligned, "aligned-at-depth != the membership join")
    // a takedown beats time travel on the aligned path too: current
    // tombstones filter the retained copy, which stays gated (the
    // anti-join keeps it exact until the fold)
    val victim = pre.head._3
    VectorIndex.deleteIvf(spark, idx, Seq(victim).toDF("vec_id"))
    assert(!asOf1(idx, q).exists(_._3 == victim),
      "a deleted vector was served from the retained aligned copy")
    assert(graft.util.Fs.isFile(spark,
      s"$idx/_gen/pq_codes_by_list/g0/_RETAINED"),
      "a delete un-gated the retained copy the anti-join keeps exact")
  }

  test("retained aligned lifecycle: retention trims, folds drop history, rename retains nothing, crashed-flip copies un-gate") {
    val dir = Files.createTempDirectory("ivfpqretlc").toString
    val (idx, q, _) = retainedFixture(dir)
    // a crashed pre-flip retrain leaves a retained copy keyed by the
    // STILL-LIVE generation; the next mutation of that pair un-gates it
    // (simulated: plant the copy at the current generation, then merge)
    val cur = IndexMaintenance.liveGenNumber(spark, idx, "lists")
    val planted = s"$idx/_gen/pq_codes_by_list/g$cur"
    graft.util.Fs.touch(spark, s"$planted/_RETAINED")
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val lcDelta = embs.where($"vec_id" < 5)
      .withColumn("vec_id", $"vec_id" + 1000000L)
    VectorIndex.mergeIvf(spark, idx, lcDelta, mergeId = Some("lc-ivf"))
    assert(!graft.util.Fs.isFile(spark, s"$planted/_RETAINED"),
      "a mutation of the still-live pair left its crashed-flip copy gated")
    VectorIndex.mergePq(spark, idx, lcDelta, mergeId = Some("lc-pq"))
    graft.util.Fs.delete(spark, planted)
    // second pointer retrain: g1 retained; g0 is trimmed by the NEXT
    // entry's hygiene pass, in the same pass that GCs lists g0 —
    // never at flip time, which would break an in-flight historical
    // reader one cycle early (retainGens = 1)
    VectorIndex.alignPqToLists(spark, idx)
    val live = VectorIndex.searchIvfPq(spark, idx, q, 4, 5)
      .as[(Long, Int, Long, Long)].collect().toSeq
    VectorIndex.retrainIvf(spark, idx, swapMode = Some("pointer"))
    VectorIndex.alignPqToLists(spark, idx)
    assert(graft.util.Fs.isFile(spark,
      s"$idx/_gen/pq_codes_by_list/g1/_RETAINED"),
      "second retrain did not retain its superseded aligned copy")
    assert(graft.util.Fs.exists(spark, s"$idx/_gen/pq_codes_by_list/g0"),
      "the flip itself trimmed an aligned copy whose lists a reader " +
        "may still hold")
    IndexMaintenance.recoverStages(spark, idx, Seq("centroids", "lists"))
    assert(!graft.util.Fs.exists(spark, s"$idx/_gen/pq_codes_by_list/g0"),
      "the hygiene pass did not trim the aligned copy beyond the window")
    assert(!graft.util.Fs.exists(spark, s"$idx/lists"),
      "fixture drift: lists g0 outlived its hygiene pass")
    assert(asOf1(idx, q) == live,
      "aligned-at-depth != the pre-second-retrain search")
    // a tombstone-folding compact drops ALL retained history; the
    // historical read falls back to the membership join and stays exact
    val preCompact = VectorIndex.searchIvfPq(spark, idx, q, 4, 5)
      .as[(Long, Int, Long, Long)].collect().toSeq
    VectorIndex.compactIvf(spark, idx)
    assert(!graft.util.Fs.exists(spark, s"$idx/_gen/pq_codes_by_list"),
      "a fold left frozen aligned history that could resurrect ids")
    assert(asOf1(idx, q) == preCompact,
      "post-fold historical read (membership join) != the pre-compact search")
    // a rename-protocol retrain retains nothing (no history axis at all)
    val plain = s"$dir/plain"
    val corpus = embs.where($"vec_id" >= 10)
    VectorIndex.buildIvf(corpus, plain)
    VectorIndex.buildPq(corpus, plain)
    VectorIndex.alignPqToLists(spark, plain)
    VectorIndex.retrainIvf(spark, plain, swapMode = Some("rename"))
    assert(!graft.util.Fs.exists(spark, s"$plain/_gen/pq_codes_by_list"),
      "a rename-protocol retrain retained an aligned copy nothing can serve")
  }
}
