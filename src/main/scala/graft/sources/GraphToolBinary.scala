package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** graph-tool `gt` binary format (`io/GraphToolBinaryReader.cpp:38-131`,
  * `GraphToolBinaryWriter.cpp:18-110`; the format itself is public,
  * documented at graph-tool's "gt file format" page):
  *
  *   - 8-byte header: magic `e2 9b be 20 67 74` ("⛾ gt" UTF-8), version
  *     `0x01`, endianness byte (0 = little, 1 = big);
  *   - comment: uint64 length + bytes (ignored on read, empty on write);
  *   - directed: 1 byte; number of nodes: uint64;
  *   - per node u in 0..n-1: out-degree as uint64, then that many
  *     neighbor ids at the smallest width that fits n (1/2/4/8 bytes,
  *     thresholds 2^8 / 2^16 / 2^32).
  *
  * Undirected graphs store each edge exactly once, in the HIGHER
  * endpoint's list (the reference writer's `v <= u` filter) — the reader
  * emits edges as stored, so canonicalize downstream as usual.
  *
  * Scale shape: the format is degree-prefixed variable-width and therefore
  * inherently sequential PER FILE — there is no record boundary a split
  * can land on. The reader parallelizes across FILES (one task per `.gt`
  * shard via the `binaryFile` source); a single monolithic file decodes in
  * one task, which matches what every consumer of this single-machine
  * interchange format does (the reference reads it on one thread too).
  * The writer assembles the byte image on the driver and is loudly
  * bounded by `maxEdges` — at engine scale use parquet; this exists for
  * interchange with graph-tool itself.
  */
object GraphToolBinary {

  /** @return (edges with weight 1.0, directed flag) */
  def read(spark: SparkSession, path: String): (DataFrame, Boolean) = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
    val directed = bin.map(b => parseHeader(b)._1).head()
    val edges = bin.flatMap(b => parseEdges(b)).toDF("src", "dst")
      .withColumn("weight", lit(1.0))
    (edges, directed)
  }

  /** Write the canonical undirected (or as-given directed) edge set as one
    * `.gt` file. Node universe is 0..max(id) (the format is positional).
    */
  def write(edges: DataFrame, path: String, directed: Boolean = false,
            littleEndian: Boolean = true, maxEdges: Long = 10000000L): Unit = {
    val es =
      if (directed) edges.select("src", "dst")
      else graft.core.GraphOps.canonicalize(edges).select("src", "dst")
    val m = es.count()
    require(m <= maxEdges,
      s"GraphToolBinary.write: $m edges exceeds maxEdges=$maxEdges - this " +
        "driver-assembled interchange writer is for graph-tool-sized " +
        "exports; use the parquet sink at engine scale")
    val pairs = es.collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxId = pairs.iterator.flatMap(p => Iterator(p._1, p._2))
      .foldLeft(-1L)(math.max)
    val n = maxId + 1
    val width = widthFor(n)
    // undirected: each edge once in the HIGHER endpoint's list
    // (GraphToolBinaryWriter.cpp:68-84); directed: the out-list as given
    val adj = Array.fill(n.toInt)(scala.collection.mutable.ArrayBuffer.empty[Long])
    pairs.foreach { case (u, v) =>
      if (directed) adj(u.toInt) += v
      else { val (lo, hi) = (math.min(u, v), math.max(u, v)); adj(hi.toInt) += lo }
    }
    val size = 8 + 8 + 1 + 8 + n * 8 + m * width
    val bb = ByteBuffer.allocate(size.toInt)
      .order(if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    bb.put(MAGIC).put(1.toByte).put(if (littleEndian) 0.toByte else 1.toByte)
    bb.putLong(0L) // empty comment
    bb.put(if (directed) 1.toByte else 0.toByte)
    bb.putLong(n)
    adj.foreach { nbrs =>
      bb.putLong(nbrs.length.toLong)
      nbrs.foreach(v => putWidth(bb, v, width))
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bb.array())
  }

  private val MAGIC: Array[Byte] =
    Array(0xe2, 0x9b, 0xbe, 0x20, 0x67, 0x74).map(_.toByte)

  private def widthFor(n: Long): Int =
    if (n < (1L << 8)) 1 else if (n < (1L << 16)) 2
    else if (n < (1L << 32)) 4 else 8

  /** @return (directed, buffer positioned at the node count) */
  private def parseHeader(b: Array[Byte]): (Boolean, ByteBuffer) = {
    require(b.length >= 18 && MAGIC.indices.forall(i => b(i) == MAGIC(i)),
      "GraphToolBinary: bad magic - not a gt file")
    require(b(6) == 1, s"GraphToolBinary: unsupported version ${b(6)}")
    require(b(7) == 0 || b(7) == 1, "GraphToolBinary: bad endianness byte")
    val bb = ByteBuffer.wrap(b)
      .order(if (b(7) == 0) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    bb.position(8)
    val clen = bb.getLong
    bb.position(bb.position() + clen.toInt) // skip comment
    (bb.get() != 0, bb)
  }

  private def parseEdges(b: Array[Byte]): Iterator[(Long, Long)] = {
    val (_, bb) = parseHeader(b)
    val n = bb.getLong
    val width = widthFor(n)
    (0L until n).iterator.flatMap { u =>
      val deg = bb.getLong
      (0L until deg).iterator.map(_ => (u, getWidth(bb, width)))
    }
  }

  private def putWidth(bb: ByteBuffer, v: Long, width: Int): Unit =
    width match {
      case 1 => bb.put(v.toByte)
      case 2 => bb.putShort(v.toShort)
      case 4 => bb.putInt(v.toInt)
      case _ => bb.putLong(v)
    }

  private def getWidth(bb: ByteBuffer, width: Int): Long =
    width match {
      case 1 => bb.get() & 0xffL
      case 2 => bb.getShort & 0xffffL
      case 4 => bb.getInt & 0xffffffffL
      case _ => bb.getLong
    }
}
