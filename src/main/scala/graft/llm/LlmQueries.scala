package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale training-data pipeline operators over the `documents` and
  * `embeddings` tables: exact + near deduplication (MinHash/LSH, SimHash,
  * n-gram Jaccard, embedding cosine), similarity search (brute-force and
  * LSH-bucketed ANN), and text analysis (language-ID, quality scoring,
  * token counting, fingerprinting).
  *
  * Hashing discipline: every hash the oracle must reproduce is md5 (hex
  * string) — identical in Spark and DuckDB — combined with `min`/ordering
  * on the hex strings. No engine-specific hash functions in checked
  * outputs.
  */
object LlmQueries {

  // The driver's tables are single small parquet files -> one input
  // partition; without an explicit repartition every md5/shingle/dot
  // projection would run on a single core. (On a real cluster the input
  // would already be many files/row-groups.)
  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet").repartition(s.sparkContext.defaultParallelism)
  private def embs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/embeddings.parquet").repartition(s.sparkContext.defaultParallelism)

  /** Documents augmented with exact duplicates (doc_id+100000 for every
    * 10th doc) so dedup operators have real work; both engines construct
    * the identical set.
    */
  private def docsWithDups(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
    base.unionByName(
      base.where(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 100000))
  }
  private val docsWithDupsSql: String =
    """dd AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0)""".stripMargin

  /** Character 4-gram shingles of a text column. */
  private def shingles(t: Column): Column =
    transform(sequence(lit(1), greatest(length(t) - 3, lit(1))),
      i => t.substr(i, lit(4)))
  private def shinglesSql(t: String): String =
    s"list_transform(generate_series(1, greatest(length($t) - 3, 1)), i -> substring($t, i, 4))"

  /** MinHash j-th signature: min over shingles of md5(j || '|' || shingle). */
  private def minhash(t: Column, j: Int): Column =
    array_min(transform(shingles(t), x => md5(concat(lit(s"$j|"), x))))
  private def minhashSql(t: String, j: Int): String =
    s"list_aggregate(list_transform(${shinglesSql(t)}, s -> md5('$j|' || s)), 'min')"

  private val NumHashes = 8
  private val NumBands = 1 // all 8 hashes in one band: the high-precision
  // near-dup configuration. The synthetic corpus is intrinsically
  // high-similarity (tiny vocabulary), so looser banding degenerates to
  // a quadratic candidate set by construction — with 8-hash agreement
  // the buckets stay near the true-duplicate set at every scale factor.

  // ------------------------------------------------------------ exact dedup
  /** Exact dedup by content hash: groups with the surviving doc_id. */
  def qDedupExact(s: SparkSession, d: String): DataFrame =
    docsWithDups(s, d)
      .groupBy(md5(col("text")).as("fp"))
      .agg(count(lit(1)).as("copies"), min("doc_id").as("keeper"),
        max("doc_id").as("last_copy"))
      .orderBy("fp")
  val qDedupExactSql: String =
    s"""WITH $docsWithDupsSql
       |SELECT md5(text) AS fp, COUNT(*) AS copies, min(doc_id) AS keeper,
       |       max(doc_id) AS last_copy
       |FROM dd GROUP BY md5(text) ORDER BY fp""".stripMargin

  // ---------------------------------------------------------------- MinHash
  /** Per-document MinHash signature (8 permutations via seeded md5). */
  def qMinhashSignatures(s: SparkSession, d: String): DataFrame = {
    val sigCols = (0 until NumHashes).map(j => minhashOver(col("sh"), j).as(s"sig$j"))
    docs(s, d)
      .withColumn("sh", shingles(col("text"))) // materialize shingles once
      .select(col("doc_id") +: sigCols: _*).orderBy("doc_id")
  }

  /** MinHash over an already-materialized shingle array column. */
  private def minhashOver(sh: Column, j: Int): Column =
    array_min(transform(sh, x => md5(concat(lit(s"$j|"), x))))
  val qMinhashSignaturesSql: String = {
    val sigs = (0 until NumHashes).map(j => s"${minhashSql("text", j)} AS sig$j")
      .mkString(",\n  ")
    s"""SELECT doc_id,
       |  $sigs
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------- LSH pairs
  /** MinHash-LSH candidate pairs: band the signatures (4 bands × 2 rows),
    * bucket by banded hash, emit distinct same-bucket pairs. The exact
    * duplicates injected by the dup-augmented set must all surface.
    */
  def qLshPairs(s: SparkSession, d: String): DataFrame = {
    val sigs = docsWithDups(s, d)
      .withColumn("sh", shingles(col("text")))
      .select(
        col("doc_id") +: (0 until NumHashes).map(j => minhashOver(col("sh"), j).as(s"sig$j")): _*)
    val banded = sigs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .select(col("doc_id"),
      explode(array((0 until NumBands).map(b =>
        struct(lit(b).as("band"),
          md5(concat((8 * b until 8 * b + 8).map(j => col(s"sig$j")): _*)).as("bkey"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }
  val qLshPairsSql: String = {
    val sigs = (0 until NumHashes).map(j => s"${minhashSql("text", j)} AS sig$j")
      .mkString(",\n  ")
    val bands = (0 until NumBands)
      .map(bn => s"SELECT doc_id, $bn AS band, md5(${(8 * bn until 8 * bn + 8).map(j => s"sig$j").mkString(" || ")}) AS bkey FROM sigs")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH $docsWithDupsSql,
       |sigs AS (
       |  SELECT doc_id,
       |  $sigs
       |  FROM dd),
       |banded AS (
       |  $bands)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---------------------------------------------------------------- SimHash
  /** 16-bit SimHash over word tokens; bit source is the parity of the
    * j-th hex char of md5(token) (engine-portable bit extraction).
    */
  def qSimhash(s: SparkSession, d: String): DataFrame = {
    val words = split(col("text"), " ")
    val bits = (0 until 16).map { j =>
      val contrib = aggregate(
        transform(words, w => ascii(substring(md5(w), j + 1, 1)) % 2 * 2 - 1),
        lit(0), (acc, x) => acc + x)
      when(contrib > 0, lit(1L << j)).otherwise(lit(0L))
    }
    docs(s, d)
      .select(col("doc_id"), bits.reduce(_ + _).as("simhash"))
      .orderBy("doc_id")
  }
  val qSimhashSql: String = {
    val bits = (0 until 16).map { j =>
      s"""CASE WHEN list_sum(list_transform(string_split(text, ' '),
         |    w -> ascii(substring(md5(w), ${j + 1}, 1)) % 2 * 2 - 1)) > 0
         |  THEN ${1L << j} ELSE 0 END""".stripMargin
    }.mkString(" +\n  ")
    s"""SELECT doc_id,
       |  $bits AS simhash
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------- n-gram Jaccard
  /** Exact n-gram Jaccard similarity, verified on the LSH candidate pairs
    * (the scalable shape: LSH prunes the quadratic space, exact Jaccard
    * re-scores the candidates).
    */
  def qNgramJaccard(s: SparkSession, d: String): DataFrame = {
    val pairs = qLshPairs(s, d)
    val docShingles = docsWithDups(s, d)
      .select(col("doc_id"), explode(array_distinct(shingles(col("text")))).as("sh"))
    val sizes = docShingles.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = pairs
      .join(docShingles.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(docShingles.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(sizes.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sizes.as("zb"), col("doc_b") === col("zb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        floor(col("n_inter").cast("double") * 1e6 /
          (col("za.n_sh") + col("zb.n_sh") - col("n_inter")) + 0.5).as("jaccard_x1e6"))
      .orderBy("doc_a", "doc_b")
  }
  val qNgramJaccardSql: String = {
    val sigs = (0 until NumHashes).map(j => s"${minhashSql("text", j)} AS sig$j")
      .mkString(",\n  ")
    val bands = (0 until NumBands)
      .map(bn => s"SELECT doc_id, $bn AS band, md5(${(8 * bn until 8 * bn + 8).map(j => s"sig$j").mkString(" || ")}) AS bkey FROM sigs")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH $docsWithDupsSql,
       |sigs AS (
       |  SELECT doc_id,
       |  $sigs
       |  FROM dd),
       |banded AS (
       |  $bands),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |doc_sh AS (
       |  SELECT DISTINCT doc_id, unnest(${shinglesSql("text")}) AS sh FROM dd),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM doc_sh GROUP BY doc_id),
       |inter AS (
       |  SELECT doc_a, doc_b, COUNT(*) AS n_inter
       |  FROM pairs
       |  JOIN doc_sh sa ON doc_a = sa.doc_id
       |  JOIN doc_sh sb ON doc_b = sb.doc_id AND sa.sh = sb.sh
       |  GROUP BY doc_a, doc_b)
       |SELECT p.doc_a, p.doc_b,
       |  floor(CAST(COALESCE(n_inter, 0) AS DOUBLE) * 1e6 /
       |        (za.n_sh + zb.n_sh - COALESCE(n_inter, 0)) + 0.5) AS jaccard_x1e6
       |FROM pairs p
       |LEFT JOIN inter USING (doc_a, doc_b)
       |JOIN sizes za ON p.doc_a = za.doc_id
       |JOIN sizes zb ON p.doc_b = zb.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ----------------------------------------------------- embedding cosine
  // Codegen'd dot (identical fold order/precision to the interpreted
  // zip_with+aggregate form and to DuckDB's list_sum(list_transform)).
  private def dotD(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)
  private def dotSql(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, len($a)),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))""".stripMargin

  /** Brute-force cosine top-k: 5 nearest neighbors (vec_id >= 10) for
    * each query vector (vec_id < 10). The scale path is [[qAnnLsh]].
    */
  def qCosineTopk(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        sqrt(dotD(col("embedding"), col("embedding"))).as("qn"))
    val c = e.where(col("vec_id") >= 10)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        sqrt(dotD(col("embedding"), col("embedding"))).as("cn"))
    val scored = q.join(c)
      .select(col("query_id"), col("neighbor_id"),
        floor(dotD(col("qv"), col("cv")) / (col("qn") * col("cn"))
          * 1e6 + 0.5).cast("long").as("cos_x1e6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_x1e6").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cos_x1e6")
      .orderBy("query_id", "rank")
  }
  val qCosineTopkSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
       |    sqrt(${dotSql("embedding", "embedding")}) AS qn
       |  FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
       |    sqrt(${dotSql("embedding", "embedding")}) AS cn
       |  FROM embeddings WHERE vec_id >= 10),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(floor(${dotSql("qv", "cv")} / (qn * cn)
       |      * 1e6 + 0.5) AS BIGINT) AS cos_x1e6
       |  FROM q CROSS JOIN c),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_x1e6 DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, cos_x1e6
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  // -------------------------------------------------------------- ANN / LSH
  /** Random-hyperplane LSH bucketing (8 deterministic integer planes):
    * the scalable ANN path — candidates only need comparing within a
    * bucket. Output: per-bucket population stats.
    */
  def qAnnLsh(s: SparkSession, d: String): DataFrame = {
    val planeDot: Int => Column = p =>
      aggregate(
        transform(col("embedding"),
          (x, i) => x.cast("double") * ((i * 37 + p * 101) % 19 - 9).cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val bucket = (0 until 8).map(p =>
      when(planeDot(p) > 0, lit(1L << p)).otherwise(lit(0L))).reduce(_ + _)
    embs(s, d)
      .select(col("vec_id"), bucket.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("population"), min("vec_id").as("min_vec"),
        max("vec_id").as("max_vec"))
      .orderBy("bucket")
  }
  val qAnnLshSql: String = {
    val planeDot: Int => String = p =>
      s"""list_sum(list_transform(generate_series(1, len(embedding)),
         |    i -> CAST(embedding[i] AS DOUBLE)
         |         * CAST(((i - 1) * 37 + $p * 101) % 19 - 9 AS DOUBLE)))""".stripMargin
    val bucket = (0 until 8)
      .map(p => s"CASE WHEN ${planeDot(p)} > 0 THEN ${1L << p} ELSE 0 END")
      .mkString(" +\n    ")
    s"""WITH bucketed AS (
       |  SELECT vec_id,
       |    $bucket AS bucket
       |  FROM embeddings)
       |SELECT bucket, COUNT(*) AS population, min(vec_id) AS min_vec,
       |       max(vec_id) AS max_vec
       |FROM bucketed GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  /** Embedding-cosine near-duplicate pairs (all-pairs at this scale;
    * at 100 TB this composes [[qAnnLsh]] buckets before the pair join).
    */
  def qEmbedNearDup(s: SparkSession, d: String): DataFrame = {
    val normed = embs(s, d).select(col("vec_id"), col("embedding"),
      sqrt(dotD(col("embedding"), col("embedding"))).as("nrm"))
    val a = normed.select(col("vec_id").as("id_a"), col("embedding").as("va"),
      col("nrm").as("na"))
    val b = normed.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
      col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        floor(dotD(col("va"), col("vb")) / (col("na") * col("nb"))
          * 1e6 + 0.5).cast("long").as("cos_x1e6"))
      .where(col("cos_x1e6") >= 400000)
      .orderBy("id_a", "id_b")
  }
  val qEmbedNearDupSql: String =
    s"""WITH n AS (SELECT vec_id, embedding,
       |    sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |a AS (SELECT vec_id AS id_a, embedding AS va, nrm AS na FROM n),
       |b AS (SELECT vec_id AS id_b, embedding AS vb, nrm AS nb FROM n),
       |scored AS (
       |  SELECT id_a, id_b,
       |    CAST(floor(${dotSql("va", "vb")} / (na * nb)
       |      * 1e6 + 0.5) AS BIGINT) AS cos_x1e6
       |  FROM a JOIN b ON id_a < id_b)
       |SELECT id_a, id_b, cos_x1e6 FROM scored
       |WHERE cos_x1e6 >= 400000
       |ORDER BY id_a, id_b""".stripMargin

  // ----------------------------------------------------------- text analysis
  private val lexicons: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "es", "y"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "wo3"))

  /** N-gram-lexicon language ID: stopword hits per language, argmax with
    * alphabetical tiebreak; compared against the labeled `lang`.
    */
  def qLangId(s: SparkSession, d: String): DataFrame = {
    val words = split(col("text"), " ")
    val scores = lexicons.map { case (lg, lex) =>
      lg -> size(filter(words, w => w.isInCollection(lex)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val predicted = scores.foldRight(lit("und"): Column) { case ((lg, sc), acc) =>
      when(sc === best && best > 0, lit(lg)).otherwise(acc)
    }
    // foldRight + when-chain: first (alphabetically) language hitting the
    // max wins, matching the SQL CASE below.
    docs(s, d)
      .select(col("doc_id"), col("lang").as("labeled"), predicted.as("predicted"),
        best.as("best_score"))
      .orderBy("doc_id")
  }
  val qLangIdSql: String = {
    val scoreSql = lexicons.map { case (lg, lex) =>
      val inList = lex.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(text, ' '), w -> w IN ($inList))) AS score_$lg"
    }.mkString(",\n    ")
    val bestSql = s"greatest(${lexicons.map(l => s"score_${l._1}").mkString(", ")})"
    val caseSql = lexicons.map { case (lg, _) =>
      s"WHEN score_$lg = best AND best > 0 THEN '$lg'"
    }.mkString("\n    ")
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    $scoreSql
       |  FROM documents),
       |withbest AS (SELECT *, $bestSql AS best FROM scored)
       |SELECT doc_id, lang AS labeled,
       |  CASE $caseSql ELSE 'und' END AS predicted,
       |  best AS best_score
       |FROM withbest ORDER BY doc_id""".stripMargin
  }

  /** Quality scoring: length, word counts, digit/punct density, mean word
    * length, stopword ratio — the standard pre-training filters.
    */
  def qQuality(s: SparkSession, d: String): DataFrame = {
    val words = split(col("text"), " ")
    val stop = size(filter(words, w => w.isInCollection(Seq("the", "a", "and", "of", "to"))))
    docs(s, d)
      .select(col("doc_id"),
        length(col("text")).as("n_chars"),
        size(words).as("n_words"),
        length(regexp_replace(col("text"), "[^0-9]", "")).as("n_digits"),
        length(regexp_replace(col("text"), "[a-z0-9 ]", "")).as("n_punct"),
        floor(length(regexp_replace(col("text"), " ", "")).cast("double") * 1000
          / size(words) + 0.5).as("mean_word_len_x1000"),
        floor(stop.cast("double") * 1e6 / size(words) + 0.5).as("stop_ratio_x1e6"))
      .orderBy("doc_id")
  }
  val qQualitySql: String =
    """SELECT doc_id,
      |  length(text) AS n_chars,
      |  len(string_split(text, ' ')) AS n_words,
      |  length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
      |  length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
      |  floor(CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) * 1000
      |    / len(string_split(text, ' ')) + 0.5) AS mean_word_len_x1000,
      |  floor(CAST(len(list_filter(string_split(text, ' '),
      |      w -> w IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE) * 1e6
      |    / len(string_split(text, ' ')) + 0.5) AS stop_ratio_x1e6
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Token counting: whitespace tokens, alpha runs (BPE-ish pre-token
    * regex), and the chars/4 heuristic.
    */
  def qTokenCount(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(filter(split(col("text"), "[^a-z]+"), w => length(w) > 0)).as("alpha_runs"),
        ceil(length(col("text")).cast("double") / 4.0).cast("long").as("est_bpe_tokens"))
      .orderBy("doc_id")
  val qTokenCountSql: String =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS ws_tokens,
      |  len(list_filter(string_split_regex(text, '[^a-z]+'), w -> len(w) > 0)) AS alpha_runs,
      |  CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS est_bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Document fingerprinting: md5 over the sorted distinct word set
    * (order-insensitive near-canonical form).
    */
  def qFingerprint(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))).as("fp"),
        size(array_distinct(split(col("text"), " "))).as("vocab"))
      .orderBy("doc_id")
  val qFingerprintSql: String =
    """SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
      |  len(list_distinct(string_split(text, ' '))) AS vocab
      |FROM documents ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l01_dedup_exact" -> qDedupExact _,
    "l02_minhash_signatures" -> qMinhashSignatures _,
    "l03_lsh_pairs" -> qLshPairs _,
    "l04_simhash" -> qSimhash _,
    "l05_ngram_jaccard" -> qNgramJaccard _,
    "l06_cosine_topk" -> qCosineTopk _,
    "l07_ann_lsh" -> qAnnLsh _,
    "l08_embed_neardup" -> qEmbedNearDup _,
    "l09_langid" -> qLangId _,
    "l10_quality" -> qQuality _,
    "l11_token_count" -> qTokenCount _,
    "l12_fingerprint" -> qFingerprint _
  )

  val oracles: Map[String, String] = Map(
    "l01_dedup_exact" -> qDedupExactSql,
    "l02_minhash_signatures" -> qMinhashSignaturesSql,
    "l03_lsh_pairs" -> qLshPairsSql,
    "l04_simhash" -> qSimhashSql,
    "l05_ngram_jaccard" -> qNgramJaccardSql,
    "l06_cosine_topk" -> qCosineTopkSql,
    "l07_ann_lsh" -> qAnnLshSql,
    "l08_embed_neardup" -> qEmbedNearDupSql,
    "l09_langid" -> qLangIdSql,
    "l10_quality" -> qQualitySql,
    "l11_token_count" -> qTokenCountSql,
    "l12_fingerprint" -> qFingerprintSql
  )
}
