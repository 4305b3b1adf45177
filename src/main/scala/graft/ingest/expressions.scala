package graft.ingest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the ingest hot path (preferred over Scala
  * UDFs: no extra serialization round-trip through the encoder, null-safe
  * eval handled by the framework, usable from SQL once registered).
  * String-processing cost dominates, so `CodegenFallback` is acceptable here;
  * everything downstream of extraction stays in whole-stage codegen.
  */
case class ExtractTextExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_extract_text"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(TextExtract.extract(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression): ExtractTextExpr = copy(c)
}

case class ExtractHrefsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_extract_hrefs"
  override protected def nullSafeEval(input: Any): Any = {
    val hrefs = TextExtract.extractHrefs(input.asInstanceOf[Array[Byte]])
    new GenericArrayData(hrefs.map(UTF8String.fromString).toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): ExtractHrefsExpr = copy(c)
}

case class NormalizeUrlExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_normalize_url"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(TextExtract.normalizeUrl(input.toString))
  override protected def withNewChildInternal(c: Expression): NormalizeUrlExpr = copy(c)
}

/** Column-level API. Functions are registered once per session so the
  * expressions are also callable from SQL (`graft_extract_text(html)`).
  */
object IngestFunctions {
  @volatile private var registered = Set.empty[Int]

  def register(spark: SparkSession): Unit = synchronized {
    val key = System.identityHashCode(spark)
    if (!registered.contains(key)) {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction(
        "graft_extract_text", es => ExtractTextExpr(es.head), "built-in")
      reg.createOrReplaceTempFunction(
        "graft_extract_hrefs", es => ExtractHrefsExpr(es.head), "built-in")
      reg.createOrReplaceTempFunction(
        "graft_normalize_url", es => NormalizeUrlExpr(es.head), "built-in")
      registered += key
    }
  }

  def extractText(spark: SparkSession, html: Column): Column = {
    register(spark); call_function("graft_extract_text", html)
  }
  def extractHrefs(spark: SparkSession, html: Column): Column = {
    register(spark); call_function("graft_extract_hrefs", html)
  }
  def normalizeUrl(spark: SparkSession, url: Column): Column = {
    register(spark); call_function("graft_normalize_url", url)
  }
}
