package graft.cli
import org.apache.spark.sql.functions._
object KcoreVerbose {
  def main(args: Array[String]): Unit = {
    val compactAt = if (args.nonEmpty) args(0).toLong else -1L
    val spark = graft.Bench.buildSession("32")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    val edges = graft.ingest.PageGen.edges(spark, 2000000L, seed = 42, numPartitions = 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    edges.count()
    val t0 = System.nanoTime()
    graft.algo.Centrality.coreDecomposition(spark, edges, compactAt)
      .agg(max("coreness")).head()
    System.err.println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
