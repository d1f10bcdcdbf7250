package graft.plans

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import javax.xml.parsers.{DocumentBuilder, DocumentBuilderFactory}

import scala.collection.mutable

import org.w3c.dom.{Element, Node}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Namespace-insensitive per-record XML extraction (SURVEY.md §2.1 S8,
  * §2.6 F27) — the LEDM EventTable / ProductStatusDyn walk that Spark's
  * `xpath` cannot express: the path argument must be foldable, so
  * per-Event subtree queries (find the first descendant whose
  * LOCAL name is in a candidate set and has non-empty direct text,
  * ledm_client.py:22-44) need real per-node traversal.
  *
  * One row per container element (local name == `container`, document
  * pre-order, nested containers included — `_iter_elems_by_local`,
  * ledm_client.py:22-33). Per row, each of the three candidate lists is
  * resolved with `_text_of_first` semantics (ledm_client.py:35-44):
  * first element in subtree pre-order (container itself included) whose
  * local name is in the candidate SET and whose direct text (text
  * before the first child element, comments skipped like
  * ElementTree's `.text`) is non-blank; value is that text stripped,
  * null when no element answers. Unparseable XML yields no rows
  * (`_parse_xml`, ledm_client.py:66-71).
  *
  * Output: (idx int, severity string, code string, description string).
  *
  * Scale: per-row generation, no state, no shuffle; the DOM parse is
  * per-payload and the builder is cached per thread.
  */
case class XmlLocalRecords(
    child: Expression,
    container: String,
    sevTags: Seq[String],
    codeTags: Seq[String],
    descTags: Seq[String])
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("severity", StringType),
    StructField("code", StringType),
    StructField("description", StringType)))

  override protected def withNewChildInternal(c: Expression): XmlLocalRecords =
    copy(child = c)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")

  @transient private lazy val sevSet = sevTags.toSet
  @transient private lazy val codeSet = codeTags.toSet
  @transient private lazy val descSet = descTags.toSet

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val root = XmlLocalRecords.parse(v.toString)
    if (root == null) return Iterator.empty
    val containers = mutable.ArrayBuffer.empty[Element]
    XmlLocalRecords.collectByLocal(root, container, containers)
    containers.iterator.zipWithIndex.map { case (el, i) =>
      def f(wanted: Set[String]): UTF8String = {
        val t = XmlLocalRecords.firstText(el, wanted)
        if (t == null) null else UTF8String.fromString(t)
      }
      InternalRow(i, f(sevSet), f(codeSet), f(descSet))
    }
  }
}

/** Scalar `_text_of_first` over a whole XML document
  * (ledm_client.py:35-44 applied to the status root,
  * problem_from_status :111-128): first element in document pre-order
  * whose local name is in `tags` with non-blank direct text → stripped
  * text; null on no match or unparseable XML. */
case class XmlFirstLocalText(child: Expression, tags: Seq[String])
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def withNewChildInternal(c: Expression): XmlFirstLocalText =
    copy(child = c)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")

  @transient private lazy val wanted = tags.toSet

  override def nullSafeEval(input: Any): Any = {
    val root = XmlLocalRecords.parse(input.toString)
    if (root == null) null
    else {
      val t = XmlLocalRecords.firstText(root, wanted)
      if (t == null) null else UTF8String.fromString(t)
    }
  }
}

object XmlLocalRecords {

  private val builders = new ThreadLocal[DocumentBuilder] {
    override def initialValue(): DocumentBuilder = {
      val f = DocumentBuilderFactory.newInstance()
      f.setNamespaceAware(true)
      // untrusted payloads: no DTDs / external entities
      try f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      catch { case _: Exception => () }
      f.setXIncludeAware(false)
      f.setExpandEntityReferences(false)
      f.newDocumentBuilder()
    }
  }

  private[plans] def parse(xml: String): Element =
    try {
      val b = builders.get()
      b.reset()
      b.parse(new ByteArrayInputStream(xml.getBytes(StandardCharsets.UTF_8)))
        .getDocumentElement
    } catch { case _: Exception => null }

  private def localName(e: Element): String = {
    val ln = e.getLocalName
    if (ln != null) ln
    else {
      val t = e.getTagName
      val i = t.indexOf(':')
      if (i >= 0) t.substring(i + 1) else t
    }
  }

  /** ElementTree `.text`: character data before the first child
    * element; comments/PIs are invisible (adjacent text merges). */
  private def directText(e: Element): String = {
    val sb = new java.lang.StringBuilder
    var n = e.getFirstChild
    while (n != null) {
      n.getNodeType match {
        case Node.TEXT_NODE | Node.CDATA_SECTION_NODE =>
          sb.append(n.getNodeValue)
        case Node.ELEMENT_NODE => return sb.toString
        case _ => () // comment / PI: skip, keep accumulating
      }
      n = n.getNextSibling
    }
    sb.toString
  }

  /** Pre-order collection of elements with the given local name,
    * nested matches included. */
  private[plans] def collectByLocal(e: Element, wanted: String,
      out: mutable.ArrayBuffer[Element]): Unit = {
    if (localName(e) == wanted) out += e
    var n = e.getFirstChild
    while (n != null) {
      n match {
        case el: Element => collectByLocal(el, wanted, out)
        case _ => ()
      }
      n = n.getNextSibling
    }
  }

  /** `_text_of_first`: pre-order (self first) scan for the first
    * element whose local name is in `wanted` with non-blank direct
    * text; returns the stripped text or null. */
  private[plans] def firstText(e: Element, wanted: Set[String]): String = {
    if (wanted.contains(localName(e))) {
      val t = directText(e).trim
      if (t.nonEmpty) return t
    }
    var n = e.getFirstChild
    while (n != null) {
      n match {
        case el: Element =>
          val r = firstText(el, wanted)
          if (r != null) return r
        case _ => ()
      }
      n = n.getNextSibling
    }
    null
  }
}
