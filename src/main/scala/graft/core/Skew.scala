package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for power-law hub vertices (the north star's
  * "salting/splitting of high-degree hub vertices"; the reference's analog
  * is OpenMP guided scheduling, `graph/Graph.h:1139-1146`).
  *
  * Where it is and isn't needed in this engine:
  *  - PageRank / CC / PLP aggregations (`groupBy` over dst) are already
  *    hub-safe: Spark's hash aggregation does map-side partial aggregation,
  *    so a hub's 10⁷ incoming contributions collapse to ≤ #partitions
  *    partials before the exchange (measured: see BASELINE.md skew bench).
  *  - Per-key WINDOW operations (top-k of a node's incidence list) are NOT:
  *    a window partitioned by node puts a hub's whole incidence list into
  *    one task. [[saltedTopK]] is the two-phase remedy.
  */
object Skew {

  /** Top-k rows per key under `order`, with hub keys split across `salts`
    * sub-partitions first: phase 1 ranks within (key, salt) — every task
    * sees at most ~|key|/salts rows — and keeps k; phase 2 ranks the
    * ≤ salts·k survivors per key. Correct because a key's global top-k is
    * contained in the union of its salted top-ks. Output = input columns +
    * `rank` (1-based, deterministic under a total `order`).
    */
  def saltedTopK(df: DataFrame, keyCols: Seq[String], order: Seq[Column],
                 k: Int, salts: Int = 32): DataFrame = {
    val salt = pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts))
    val salted = df.withColumn("_salt", salt)
    val w1 = Window.partitionBy((keyCols.map(col) :+ col("_salt")): _*)
      .orderBy(order: _*)
    val phase1 = salted.withColumn("_r1", row_number().over(w1))
      .where(col("_r1") <= k)
    val w2 = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    phase1.withColumn("rank", row_number().over(w2))
      .where(col("rank") <= k)
      .drop("_salt", "_r1")
  }
}
