package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Deduplication operators for training-data pipelines over a
  * `documents(doc_id, text, ...)` table. Scale notes per operator — exact
  * dedup and MinHash-LSH are linear + one shuffle; the pairwise variants
  * exist as verification baselines and are candidate-bounded.
  */
object Dedup {

  /** Exact duplicate groups by content hash: one shuffle on md5(text).
    * Output: (doc_id, content_hash, group_size, is_canonical) — canonical =
    * smallest doc_id in the group (the standard "keep one" policy).
    */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy("content_hash")
    docs.select(col(idCol), md5(col(textCol)).as("content_hash"))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_canonical", col(idCol) === min(idCol).over(w))
  }

  /** n-gram Jaccard similarity over DISTINCT word tokens for candidate
    * pairs — the inverted-index self-join. `maxDf` caps the document
    * frequency of tokens admitted to the index (and, consistently, to the
    * per-doc set sizes): without it one stopword shared by d documents
    * fans out d² join rows — quadratic blowup on any real corpus. Tokens
    * with df > maxDf carry ~zero Jaccard signal anyway (they are in
    * everything), so the df-capped measure is the standard practical
    * variant; at web scale prefer LSH-generated candidates.
    * Output: (a, b, jaccard) for pairs with jaccard ≥ minSim, a < b.
    */
  def tokenJaccardPairs(docs: DataFrame, minSim: Double,
                        idCol: String = "doc_id",
                        textCol: String = "text",
                        maxDf: Long = 10000): DataFrame = {
    val allToks = docs.select(col(idCol).as("id"),
      explode(array_distinct(TextOps.tokens(col(textCol)))).as("tok"))
    val rare = allToks.groupBy("tok").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf).select("tok")
    val toks = allToks.join(rare, Seq("tok"), "left_semi")
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = toks.withColumnRenamed("id", "a")
      .join(toks.withColumnRenamed("id", "b"), "tok")
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("id").as("b"), col("sz").as("szb")), "b")
      .select(col("a"), col("b"),
        (col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= minSim)
  }

  /** MinHash signatures (k entries) per doc. */
  def minhashSignatures(docs: DataFrame, k: Int = 8,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val sig = (0 until k).map(j => TextOps.minhash(col(textCol), j).as(s"mh$j"))
    docs.select((col(idCol) +: sig): _*)
  }

  /** MinHash + LSH banding: docs sharing ≥1 of `bands` band values are
    * candidate pairs; estimated similarity = fraction of matching signature
    * entries. The scale path: shingle→minhash is a narrow map; the
    * band-bucket join shuffles once on band value; candidate count ≈ true
    * near-dups, never n².
    * Output: (a, b, est_sim) distinct pairs, a < b.
    */
  def minhashLsh(docs: DataFrame, k: Int = 8, bands: Int = 4,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sigs = minhashSignatures(docs, k, idCol, textCol)
      .withColumnRenamed(idCol, "id").persist()
    val bandCols = (0 until bands).map { b =>
      md5(concat((0 until r).map(i => col(s"mh${b * r + i}")): _*)).as("band")
    }
    val buckets = bandCols.zipWithIndex.map { case (bc, i) =>
      sigs.select(col("id"), lit(i).as("band_idx"), bc)
    }.reduce(_ unionByName _)
    val cand = buckets.withColumnRenamed("id", "a")
      .join(buckets.withColumnRenamed("id", "b"), Seq("band_idx", "band"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
    val matches = (0 until k).map(j =>
      when(col(s"la.mh$j") === col(s"lb.mh$j"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(sigs.as("la"), col("a") === col("la.id"))
      .join(sigs.as("lb"), col("b") === col("lb.id"))
      .select(col("a"), col("b"),
        (matches.cast("double") / k).as("est_sim"))
  }

  /** SimHash near-dup: 16-bit fingerprints; pairs at Hamming distance ≤
    * maxDist via the classic multi-index: split the fingerprint into
    * `maxDist + 1` bit-bands — by pigeonhole any pair within distance
    * maxDist matches EXACTLY on at least one band, so bucketing each band
    * and verifying candidates by true Hamming distance has full recall
    * (two bands for maxDist ≥ 2 would silently miss pairs). Candidates per
    * bucket ≈ true near-dups; never n².
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 2,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val fps = docs.select(col(idCol).as("id"),
      TextOps.simhash16(col(textCol)).as("fp")).persist()
    val nb = math.min(maxDist + 1, 16)
    val baseW = 16 / nb
    val extras = 16 % nb
    // band i covers [start_i, start_i + w_i) with w_i = baseW (+1 for the
    // first `extras` bands)
    val frames = (0 until nb).scanLeft((0, 0)) { case ((st, w), i) =>
      (st + w, baseW + (if (i < extras) 1 else 0))
    }.tail
    val bandsDf = frames.zipWithIndex.map { case ((st, w), i) =>
      fps.select(col("id"), col("fp"), lit(i).as("h"),
        shiftright(col("fp"), st).bitwiseAND(lit((1 << w) - 1)).as("key"))
    }.reduce(_ unionByName _)
    val cand = bandsDf.select(col("id").as("a"), col("fp").as("fpa"), col("h"), col("key"))
      .join(bandsDf.select(col("id").as("b"), col("fp").as("fpb"), col("h"), col("key")),
        Seq("h", "key"))
      .where(col("a") < col("b"))
      .select("a", "b", "fpa", "fpb").distinct()
    cand.withColumn("dist",
        bit_count(col("fpa").bitwiseXOR(col("fpb"))).cast("long"))
      .where(col("dist") <= maxDist)
      .select("a", "b", "dist")
  }

  /** Embedding cosine near-dup: pairs with cosine ≥ minSim. Exact pairwise
    * baseline (bound candidates upstream; the IVF path in graft.ann
    * generates candidates at scale).
    */
  def embeddingCosinePairs(embs: DataFrame, minSim: Double,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    val v = embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val a = v.select(col("id").as("a"), col("v").as("va"))
    val b = v.select(col("id").as("b"), col("v").as("vb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"), cosine(col("va"), col("vb")).as("cos"))
      .where(col("cos") >= minSim)
  }

  /** Random-hyperplane LSH cosine near-dup — the SCALE path for
    * [[embeddingCosinePairs]] (which stays as the exact n² verification
    * baseline): `planes` deterministic ±1 hyperplanes (sign of the integer
    * mix (p·1000003 + dim·7919) mod 10⁶ — replayable in any SQL engine),
    * signature bit p = sign of the projection, `bands` bands of
    * planes/bands bits; candidates share ≥1 band key, then the exact
    * cosine filter runs on candidates only. Collision probability per
    * plane for angle θ is 1 − θ/π, so recall for cos ≥ 0.9 pairs at
    * 16 planes / 4 bands is ≈ 95% while buckets stay tiny. Projections are
    * row-local higher-order-function folds (no cross join, codegen);
    * the only shuffles are the band-key groupBys and the candidate join.
    */
  def embeddingCosinePairsLsh(embs: DataFrame, minSim: Double,
                              planes: Int = 16, bands: Int = 4,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding"): DataFrame = {
    require(planes % bands == 0, "planes must divide into bands")
    val bpb = planes / bands
    val v = embs.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    def bit(p: Int): Column = {
      val proj = aggregate(
        zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
          (x, i) => x * when((lit(p.toLong) * 1000003L + i * 7919L)
            % 1000000L < 500000L, 1.0).otherwise(-1.0)),
        lit(0.0), _ + _)
      when(proj >= 0, 1L).otherwise(0L)
    }
    val keyed = v.select(col("id") +: (0 until bands).map { b =>
      (0 until bpb).map(j => bit(b * bpb + j) * (1L << j))
        .reduce(_ + _).as(s"k$b")
    }: _*)
    val bandKeys = keyed.select(col("id"), posexplode(
      array((0 until bands).map(b => col(s"k$b")): _*)).as(Seq("band", "key")))
    val cand = bandKeys.as("x").join(bandKeys.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
    cand
      .join(v.select(col("id").as("a"), col("v").as("va")), "a")
      .join(v.select(col("id").as("b"), col("v").as("vb")), "b")
      .select(col("a"), col("b"), cosine(col("va"), col("vb")).as("cos"))
      .where(col("cos") >= minSim)
  }

  /** Cosine similarity of two double arrays via built-in higher-order
    * functions (codegen-friendly; no UDF).
    */
  def cosine(x: Column, y: Column): Column = {
    val dot = aggregate(zip_with(x, y, (a, b) => a * b), lit(0.0), _ + _)
    val nx = sqrt(aggregate(transform(x, a => a * a), lit(0.0), _ + _))
    val ny = sqrt(aggregate(transform(y, a => a * a), lit(0.0), _ + _))
    dot / (nx * ny)
  }
}
