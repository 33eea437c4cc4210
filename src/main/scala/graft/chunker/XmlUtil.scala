package graft.chunker

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Document, Element, Node, Text}

import scala.collection.mutable.ArrayBuffer

/** Minimal DOM helpers for the chunker — the JVM analogue of the reference's
  * lxml navigation (`lovdata_chunker.py:68-69` + XPath use throughout).
  * Secure-by-default parser: DTDs and external entities disabled (the corpus
  * is untrusted input at 100 TB scale).
  */
object XmlUtil {

  // One builder per task thread: factory/builder construction costs more
  // than a small parse, and DocumentBuilder is not thread-safe. reset()
  // between documents is required and cheap.
  private val builders = new ThreadLocal[javax.xml.parsers.DocumentBuilder] {
    override def initialValue(): javax.xml.parsers.DocumentBuilder = {
      val f = DocumentBuilderFactory.newInstance()
      f.setNamespaceAware(false)
      // Lovdata documents carry a DOCTYPE — allow it, but never fetch DTDs or
      // expand external entities (XXE hardening for untrusted corpus input).
      f.setFeature("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
      f.setFeature("http://xml.org/sax/features/external-general-entities", false)
      f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
      f.setExpandEntityReferences(false)
      f.newDocumentBuilder()
    }
  }

  def parse(xml: String): Element = {
    val b = builders.get()
    b.reset()
    val doc: Document = b.parse(new ByteArrayInputStream(xml.getBytes(StandardCharsets.UTF_8)))
    doc.getDocumentElement
  }

  def childElements(e: Element): Seq[Element] = {
    val out = ArrayBuffer.empty[Element]
    var n = e.getFirstChild
    while (n != null) {
      n match { case el: Element => out += el; case _ => }
      n = n.getNextSibling
    }
    out.toSeq
  }

  /** All descendant elements, document order, excluding `e` itself. */
  def descendants(e: Element): Seq[Element] = {
    val out = ArrayBuffer.empty[Element]
    def walk(el: Element): Unit = childElements(el).foreach { c => out += c; walk(c) }
    walk(e)
    out.toSeq
  }

  def descendantsWithClass(e: Element, tag: String, cls: String): Seq[Element] =
    descendants(e).filter(x => x.getTagName == tag && x.getAttribute("class") == cls)

  /** First matching descendant in document order, early-exit DFS (called
    * several times per article on the chunker hot path — don't materialize
    * the subtree).
    */
  def firstDescendant(e: Element, tag: String, cls: Option[String] = None): Option[Element] = {
    var result: Element = null
    def walk(el: Element): Unit = {
      var n = el.getFirstChild
      while (n != null && result == null) {
        n match {
          case c: Element =>
            if (c.getTagName == tag && cls.forall(_ == c.getAttribute("class"))) result = c
            else walk(c)
          case _ =>
        }
        n = n.getNextSibling
      }
    }
    walk(e)
    Option(result)
  }

  /** lxml `itertext()`: every text node under the element, document order,
    * concatenated with no separator.
    */
  def iterText(e: Element): String = {
    val sb = new StringBuilder
    def walk(n: Node): Unit = n match {
      case t: Text => sb.append(t.getData)
      case el: Element =>
        var c = el.getFirstChild
        while (c != null) { walk(c); c = c.getNextSibling }
      case _ =>
    }
    walk(e)
    sb.toString
  }

  /** The element's own leading text node(s) before the first child element
    * (lxml `elem.text`).
    */
  def directText(e: Element): String = {
    val sb = new StringBuilder
    var n = e.getFirstChild
    var done = false
    while (n != null && !done) {
      n match {
        case t: Text => sb.append(t.getData)
        case _: Element => done = true
        case _ =>
      }
      n = n.getNextSibling
    }
    sb.toString
  }

  /** Text nodes immediately following the element (lxml `elem.tail`). */
  def tailText(e: Element): String = {
    val sb = new StringBuilder
    var n = e.getNextSibling
    var done = false
    while (n != null && !done) {
      n match {
        case t: Text => sb.append(t.getData)
        case _: Element => done = true
        case _ =>
      }
      n = n.getNextSibling
    }
    sb.toString
  }

  def attr(e: Element, name: String, default: String = ""): String = {
    val v = e.getAttribute(name)
    if (v == null || v.isEmpty) default else v
  }

  def parentElement(e: Element): Option[Element] = e.getParentNode match {
    case p: Element => Some(p)
    case _          => None
  }
}
