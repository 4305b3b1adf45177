package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.dedup.Dedup.cosine

/** Similarity search over an embedding column (`Array[Float]`).
  *
  *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline; a
  *    broadcast of the (small) query set against the full corpus, one pass,
  *    no n² blowup, but O(|corpus|·|queries|) compute.
  *  - `ivfTopK`: the scale path — k-means-lite (seeded, fixed rounds)
  *    coarse quantizer; corpus partitioned by nearest centroid; queries
  *    probe only `nprobe` nearest cells, so compute drops by
  *    ~nlist/nprobe with mild recall loss. All joins are broadcasts of
  *    centroid/query tables; the corpus never self-joins.
  */
object Ann {

  /** Exact top-k cosine neighbors for each query vector. Output
    * (query_id, neighbor_id, cos, rank); self-matches excluded. Determinism:
    * ties broken by ascending neighbor id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Seeded k-means-lite centroids: init = the `nlist` corpus vectors with
    * the smallest `md5(id)` (a deterministic uniform sample — NOT the
    * smallest ids, which would bias toward whatever the id order encodes;
    * `orderBy(md5).limit` plans as TakeOrdered: per-partition top-k + a
    * driver-side merge of nlist rows, no global sort). Then `rounds` Lloyd
    * iterations, each eagerly checkpointed so the lineage stays flat.
    * Centroid ids are dense ranks of the seed hash order (0..nlist-1 —
    * deterministic, unlike monotonically_increasing_id).
    * Output (centroid_id, centroid array<double>).
    */
  def trainCentroids(spark: SparkSession, corpus: DataFrame, nlist: Int,
                     rounds: Int = 3, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val v = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seeds = v.orderBy(md5(col("id").cast("string")), col("id")).limit(nlist)
    var centroids = seeds
      .select(row_number().over(Window.orderBy(
        md5(col("id").cast("string")), col("id"))).cast("long").as("cid"),
        col("v").as("cv"))
      .transform(graft.core.Materialize.checkpoint)
    var r = 0
    while (r < rounds) {
      val assigned = assign(v, centroids)
      // new centroid = element-wise mean of members (posexplode + avg —
      // scales to any dimension without a per-dim column explosion)
      // centroid coordinates rounded to 9 decimals: the element means are
      // sum-order dependent in the last bits; rounding pins them so any
      // re-computation (tests, the DuckDB oracle) assigns identically
      centroids = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(round(avg("x"), 9).as("x"))
        .groupBy("cid").agg(
          array_sort(collect_list(struct(col("pos"), col("x")))).as("px"))
        .select(col("cid"), transform(col("px"), p => p.getField("x")).as("cv"))
        .transform(graft.core.Materialize.checkpoint)
      r += 1
    }
    v.unpersist(blocking = false)
    centroids.select(col("cid").as("centroid_id"), col("cv").as("centroid"))
  }

  /** Nearest-centroid assignment (broadcast the centroid table). Ordering
    * on the 9-decimal-rounded cosine (ties → lowest cid) so assignment is
    * reproducible bit-for-bit by independent implementations.
    */
  private def assign(v: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("id").orderBy(desc("rcos"), asc("cid"))
    v.crossJoin(broadcast(centroids))
      .select(col("id"), col("v"), col("cid"),
        round(cosine(col("v"), col("cv")), 9).as("rcos"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("id", "v", "cid")
  }

  /** IVF search: probe the `nprobe` closest cells per query. Same output
    * shape as bruteForceTopK; recall < 1 by construction.
    */
  def ivfTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
              k: Int, nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val cents = trainCentroids(spark, corpus, nlist, rounds = 2, idCol, vecCol)
      .withColumnRenamed("centroid_id", "cid").withColumnRenamed("centroid", "cv")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val corpusCells = assign(v, cents)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val wq = Window.partitionBy("query_id").orderBy(desc("qcos"), asc("cid"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("cid"),
        round(cosine(col("qv"), col("cv")), 9).as("qcos"))
      .withColumn("rn", row_number().over(wq)).where(col("rn") <= nprobe)
      .select("query_id", "qv", "cid")
    corpusCells.join(broadcast(probes), "cid")
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(round(col("cos"), 9).desc, col("neighbor_id").asc)))
      .where(col("rank") <= k)
  }
}
