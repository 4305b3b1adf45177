package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable deterministic dense-id assignment (0..n-1) over a global sort
  * order — the Spark-native replacement for the reference readers'
  * first-appearance id remap (`io/SNAPGraphReader.cpp:29-45`,
  * `io/EdgeListReader.h:59-64`).
  *
  * A single global `row_number()` window would funnel all rows through one
  * partition — non-starter at 10^12 rows. Instead the classic two-phase
  * scheme, expressed entirely in DataFrame ops:
  *   1. range-partition by the sort key (`repartitionByRange`) — Spark
  *      samples split points, so partitions are contiguous key ranges;
  *   2. per-partition `row_number()` windowed by `spark_partition_id()`
  *      (parallel — each partition sorts locally);
  *   3. tiny `(pid → count)` aggregate joined back (broadcast) to add the
  *      cumulative offset of all preceding partitions.
  * Only the P-row offset table is driver-side; everything else scales out.
  */
object DenseId {

  /** Returns `df` with an extra `idCol` BIGINT column, dense 0-based ids in
    * ascending `sortCols` order. `sortCols` must be a total order
    * (deterministic ids require no ties across rows).
    */
  def assign(df: DataFrame, idCol: String, sortCols: Seq[String],
             numPartitions: Int = 0): DataFrame = {
    val cols: Seq[Column] = sortCols.map(col)
    // The pid→count pass and the final pass MUST see one materialization of
    // the range partitioning: `spark_partition_id()` is only meaningful
    // relative to a concrete partitioning, and RangePartitioner's sample
    // (hence the partition boundaries) is seeded by the physical RDD id, so
    // two independent materializations can disagree — the `_pid` inner join
    // would then silently drop rows. A lazy `.persist()` is NOT enough: a
    // cache miss on plan-canonicalization differences (e.g. a session conf
    // change between the passes) or eviction-with-replanning re-samples.
    // Eager localCheckpoint pins the data AND freezes `_pid` in one shot.
    val parted =
      (if (numPartitions > 0) df.repartitionByRange(numPartitions, cols: _*)
       else df.repartitionByRange(cols: _*))
        .withColumn("_pid", spark_partition_id())
        .transform(Materialize.checkpoint)
    val offsets = parted.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
      .withColumn("_offset",
        coalesce(sum("_cnt").over(
          Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_pid", "_offset")
    val w = Window.partitionBy("_pid").orderBy(cols: _*)
    val out = parted
      .join(broadcast(offsets), Seq("_pid"))
      .withColumn(idCol, row_number().over(w).cast("long") - 1 + col("_offset"))
      .drop("_pid", "_offset")
      // materialize eagerly so `parted`'s pinned blocks can be released
      // here instead of leaking one cached RDD per call
      .transform(Materialize.checkpoint)
    Materialize.free(parted)
    out
  }

  /** Exclusive prefix sum of `valueCol` over ascending `sortCols` order,
    * added as `outCol` (DOUBLE) — same two-phase range-partitioned scheme
    * as [[assign]], so no global single-partition window. Used by e.g.
    * ROC-AUC (negatives-below-score) where the running total must scale
    * past one task.
    */
  def prefixSum(df: DataFrame, valueCol: String, outCol: String,
                sortCols: Seq[String]): DataFrame = {
    val cols: Seq[Column] = sortCols.map(col)
    // eager localCheckpoint for the same two-pass `_pid` consistency
    // reason as assign() — see the comment there
    val parted = df.repartitionByRange(cols: _*)
      .withColumn("_pid", spark_partition_id())
      .transform(Materialize.checkpoint)
    val offsets = parted.groupBy("_pid")
      .agg(sum(col(valueCol)).cast("double").as("_sum"))
      .withColumn("_offset",
        coalesce(sum("_sum").over(
          Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0.0)))
      .select("_pid", "_offset")
    val w = Window.partitionBy("_pid").orderBy(cols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = parted
      .join(broadcast(offsets), Seq("_pid"))
      .withColumn(outCol,
        coalesce(sum(col(valueCol)).over(w).cast("double"), lit(0.0))
          + col("_offset"))
      .drop("_pid", "_offset")
      .transform(Materialize.checkpoint) // same lifecycle as assign()
    Materialize.free(parted)
    out
  }
}
