package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF index LIFECYCLE — build once, persist, search many: the
  * deployment shape real ANN systems run, complementing the in-line
  * l14 query (which rebuilds its index per run, fine for a benchmark,
  * wrong for a serving path).
  *
  * Layout: `indexDir/centroids` holds the stride-sampled coarse
  * quantizer (bounded at ~1000 rows regardless of corpus size — the
  * l14 discipline, ≈256 KB broadcast at 10⁹ vectors);
  * `indexDir/lists` holds every vector's (embedding, norm) PARTITIONED
  * BY its centroid id — the inverted lists ARE the directory layout.
  * A search then reads only its probed lists: the probe set joins the
  * list table on the partition column, and Spark's dynamic partition
  * pruning turns that join into directory-level skipping (pinned by
  * VectorIndexSpec), so search I/O is nprobe/K of the corpus instead
  * of all of it — at 100 TB the difference between a lookup and a
  * table scan.
  */
object VectorIndex {

  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  /** Integer-quantized cosine (the suite-wide `floor(cos·10⁶ + .5)`
    * discipline — engine-exact ordering, id tiebreaks).
    */
  private def cosQ(va: Column, na: Column, vb: Column, nb: Column): Column =
    floor(dot(va, vb) / (na * nb) * 1e6 + 0.5).cast("long")

  /** Build and persist the index. `embs` needs (vec_id, embedding). */
  def buildIvf(embs: DataFrame, indexDir: String): Unit = {
    val e = embs.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val stride = math.max(37L, math.ceil(embs.count() / 1000.0).toLong)
    val cent = e.where(col("vec_id") % stride === 11)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"),
        col("nrm").as("cn"))
    cent.write.mode(SaveMode.Overwrite).parquet(s"$indexDir/centroids")
    val assigned = e.join(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("c_id"),
        cosQ(col("embedding"), col("nrm"), col("cv"), col("cn")).as("cc"))
      .withColumn("r", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cc").desc, col("c_id").asc)))
      .where(col("r") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("c_id"))
    assigned.write.mode(SaveMode.Overwrite)
      .partitionBy("c_id").parquet(s"$indexDir/lists")
  }

  /** Search the persisted index: `queries` needs (query_id, embedding);
    * returns (query_id, rank, neighbor_id, cos_x1e6), top-`topk` by
    * exact re-ranked cosine over the `nprobe` nearest lists.
    */
  def searchIvf(spark: SparkSession, indexDir: String, queries: DataFrame,
      nprobe: Int, topk: Int): DataFrame = {
    val cent = spark.read.parquet(s"$indexDir/centroids")
    val lists = spark.read.parquet(s"$indexDir/lists")
    val q = queries.select(col("query_id"), col("embedding").as("qv"),
      sqrt(dot(col("embedding"), col("embedding"))).as("qn"))
    val probes = q.join(broadcast(cent))
      .select(col("query_id"), col("qv"), col("qn"), col("c_id"),
        cosQ(col("qv"), col("qn"), col("cv"), col("cn")).as("cc"))
      .withColumn("r", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cc").desc, col("c_id").asc)))
      .where(col("r") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("c_id"))
    val scored = probes.join(lists, Seq("c_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosQ(col("qv"), col("qn"), col("embedding"), col("nrm")).as("cos_x1e6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_x1e6").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topk)
      .select("query_id", "rank", "neighbor_id", "cos_x1e6")
      .orderBy("query_id", "rank")
  }
}
