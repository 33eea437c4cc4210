package graft.chunker

import org.w3c.dom.Element

import graft.functions.{TokenCounter, WordSymbolTokenizer}
import graft.model.Chunk
import XmlUtil._

import scala.collection.mutable.ArrayBuffer

/** Three-tier structure-aware chunker — the behavioral heart of the engine
  * (reference `domain/parsers/lovdata_chunker.py:30-829`).
  *
  * Tier 1 standard laws: `article.legalArticle` → per-`article.legalP` (ledd)
  * chunks; tier 2 change laws: `section.section` → token-budget-grouped
  * legalP; tier 3 simple laws: `main.documentBody` → direct legalP children.
  * Every tier ends with the aggressive small-chunk merge fold
  * (`lovdata_chunker.py:707-829`). Oversized ledd split by list boundaries
  * (`:338-411`) or by sentences with ~15% overlap (`:413-484`).
  *
  * This is a pure Scala module: order-dependent folds (A4/A5/W1) stay inside
  * the per-document call, embarrassingly parallel across documents via
  * `Dataset.flatMap` (SURVEY §7 "hard parts"). Token counting is pluggable;
  * the default is the engine-wide deterministic [[WordSymbolTokenizer]].
  *
  * Bound subtlety (faithful to the reference): `maxTokens` caps individual
  * tier-1/tier-3 chunks, but change-law grouped chunks respect only
  * `targetTokens` (reference `:160-190` has no max check) and the merge fold
  * may overshoot max while accumulating toward `minTokens` (`:742-747`'s
  * heuristic guard, not a hard cap).
  */
final class LovdataChunker(
    val targetTokens: Int = 768,
    val maxTokens: Int = 8191,
    val minTokens: Int = 300,
    val overlapRatio: Double = 0.15,
    val tokens: TokenCounter = WordSymbolTokenizer
) extends Serializable {

  private val overlap: Int = (targetTokens * overlapRatio).toInt

  /** Main entry — three-tier fallback (reference `:59-82`). */
  def chunk(xml: String): Seq[Chunk] = {
    val root = parse(xml)
    val standard = chunkStandard(root)
    val out =
      if (standard.nonEmpty) standard
      else {
        val change = chunkChangeLaw(root)
        if (change.nonEmpty) change else chunkSimple(root)
      }
    out.zipWithIndex.map { case (c, i) => c.copy(chunkIndex = i) }
  }

  // ---- tier 1: standard laws (reference `:84-138`) ----

  private def chunkStandard(root: Element): Seq[Chunk] = {
    val chunks = ArrayBuffer.empty[Chunk]
    for (article <- descendantsWithClass(root, "article", "legalArticle")) {
      val ref = paragraphRef(article)
      val title = paragraphTitle(article)
      val ctx = hierarchicalContext(article, root)
      for ((ledd, idx0) <- descendantsWithClass(article, "article", "legalP").zipWithIndex) {
        val idx = idx0 + 1
        val text = extractLeddText(ledd)
        val tk = tokens.countTokens(text)
        if (tk <= maxTokens) {
          chunks += Chunk(
            chunkId = attr(ledd, "id", s"$ref-ledd$idx"),
            chunkIndex = 0,
            text = text,
            tokenCount = tk,
            paragraphRef = ref,
            paragraphTitle = title,
            sectionHeading = ctx.sectionHeading,
            documentTitle = ctx.documentTitle,
            chapterPath = ctx.chapterPath,
            address = attr(ledd, "data-absoluteaddress"),
            url = attr(ledd, "data-lovdata-URL"),
            crossRefs = crossRefs(ledd),
            leddNumber = idx,
            merged = false,
            mergedWith = Seq.empty
          )
        } else {
          chunks ++= splitLargeLedd(ledd, text, idx, ref, title, ctx)
        }
      }
    }
    mergeSmallChunks(chunks.toSeq)
  }

  // ---- tier 2: change laws (reference `:140-190`) ----

  private def chunkChangeLaw(root: Element): Seq[Chunk] = {
    val chunks = ArrayBuffer.empty[Chunk]
    for (section <- descendantsWithClass(root, "section", "section")) {
      val heading = sectionHeading(section)
      val ctx = hierarchicalContext(section, root)
      val legalPs = descendantsWithClass(section, "article", "legalP")
      if (legalPs.nonEmpty) {
        // A4: accumulate consecutive legalP until target budget exceeded.
        var buffer = ArrayBuffer.empty[(Element, String, Int)]
        var bufferTokens = 0
        def flush(): Unit = if (buffer.nonEmpty) {
          chunks += groupedChunk(buffer.toSeq, heading, ctx)
          buffer = ArrayBuffer.empty
          bufferTokens = 0
        }
        for (lp <- legalPs) {
          val text = iterText(lp).trim
          val tk = tokens.countTokens(text)
          if (bufferTokens + tk > targetTokens && buffer.nonEmpty) flush()
          buffer += ((lp, text, tk))
          bufferTokens += tk
        }
        flush()
      }
    }
    mergeSmallChunks(chunks.toSeq)
  }

  private def groupedChunk(buf: Seq[(Element, String, Int)], heading: String, ctx: Ctx): Chunk = {
    val combined = buf.map(_._2).mkString("\n\n")
    val total = buf.map(_._3).sum
    val firstId = attr(buf.head._1, "id", "unknown")
    Chunk(
      chunkId = s"section-$firstId",
      chunkIndex = 0,
      text = combined,
      tokenCount = total,
      paragraphRef = "",
      paragraphTitle = "",
      sectionHeading = heading,
      documentTitle = ctx.documentTitle,
      chapterPath = ctx.chapterPath,
      address = "",
      url = "",
      crossRefs = Seq.empty,
      leddNumber = buf.length, // legalp_count in the reference metadata
      merged = false,
      mergedWith = Seq.empty
    )
  }

  // ---- tier 3: simple laws (reference `:192-239`) ----

  private def chunkSimple(root: Element): Seq[Chunk] = {
    val chunks = ArrayBuffer.empty[Chunk]
    firstDescendant(root, "main", Some("documentBody")).foreach { main =>
      val docTitle = documentTitle(root)
      for ((lp, idx0) <- childElements(main)
             .filter(e => e.getTagName == "article" && e.getAttribute("class") == "legalP")
             .zipWithIndex) {
        val idx = idx0 + 1
        val text = iterText(lp).trim
        val tk = tokens.countTokens(text)
        if (tk <= maxTokens) {
          chunks += Chunk(
            chunkId = s"ledd-$idx",
            chunkIndex = 0,
            text = text,
            tokenCount = tk,
            paragraphRef = "",
            paragraphTitle = "",
            sectionHeading = "",
            documentTitle = docTitle,
            chapterPath = Seq.empty,
            address = attr(lp, "data-absoluteaddress"),
            url = attr(lp, "data-lovdata-URL"),
            crossRefs = Seq.empty,
            leddNumber = idx,
            merged = false,
            mergedWith = Seq.empty
          )
        } else {
          chunks ++= splitBySentences(text, idx, docTitle)
        }
      }
    }
    mergeSmallChunks(chunks.toSeq)
  }

  // ---- C17: ledd text extraction with lists and continuations (reference `:241-300`) ----

  private def extractLeddText(ledd: Element): String = {
    val parts = ArrayBuffer.empty[String]
    val direct = directText(ledd).trim
    if (direct.nonEmpty) parts += direct
    for (child <- childElements(ledd)) {
      child.getTagName match {
        case "ol" | "ul" => parts += extractList(child)
        case "p" if attr(child, "class").contains("leddfortsettelse") =>
          parts += iterText(child).trim
        case _ =>
          val t = iterText(child).trim
          if (t.nonEmpty) parts += t
      }
      val tail = tailText(child).trim
      if (tail.nonEmpty) parts += tail
    }
    parts.filter(_.nonEmpty).mkString(" ")
  }

  private def extractList(listElem: Element): String =
    descendants(listElem).filter(_.getTagName == "li").map { li =>
      val marker = attr(li, "data-name")
      val text = iterText(li).trim
      if (marker.nonEmpty) s"$marker $text" else text
    }.mkString("\n")

  // ---- W4: list-boundary segmentation (reference `:338-411`) ----

  private def splitLargeLedd(
      ledd: Element, text: String, leddNum: Int,
      ref: String, title: String, ctx: Ctx
  ): Seq[Chunk] = {
    val hasLists = descendants(ledd).exists(e => e.getTagName == "ol" || e.getTagName == "ul")
    if (hasLists) splitByLists(ledd, leddNum, ref, title, ctx)
    else splitBySentencesWithOverlap(text, leddNum, ref, title, ctx)
  }

  private def splitByLists(
      ledd: Element, leddNum: Int, ref: String, title: String, ctx: Ctx
  ): Seq[Chunk] = {
    val parts = ArrayBuffer.empty[String]
    val current = ArrayBuffer.empty[String]
    for (child <- childElements(ledd)) {
      if (child.getTagName == "ol" || child.getTagName == "ul") {
        if (current.nonEmpty) { parts += current.mkString(" "); current.clear() }
        parts += extractList(child)
      } else {
        val t = iterText(child).trim
        if (t.nonEmpty) current += t
      }
    }
    if (current.nonEmpty) parts += current.mkString(" ")
    parts.toSeq.zipWithIndex.flatMap { case (part, i0) =>
      val idx = i0 + 1
      val tk = tokens.countTokens(part)
      // over-max parts are dropped with a warning in the reference (`:391-397`)
      if (tk <= maxTokens) Some(Chunk(
        chunkId = s"$ref-ledd$leddNum-part$idx",
        chunkIndex = 0,
        text = part,
        tokenCount = tk,
        paragraphRef = ref,
        paragraphTitle = title,
        sectionHeading = ctx.sectionHeading,
        documentTitle = ctx.documentTitle,
        chapterPath = ctx.chapterPath,
        address = "",
        url = "",
        crossRefs = Seq.empty,
        leddNumber = leddNum,
        merged = false,
        mergedWith = Seq.empty
      ))
      else None
    }
  }

  // ---- W1: sentence sliding window with overlap (reference `:413-484`) ----

  private[chunker] def splitSentences(text: String): Seq[String] =
    text.split("(?<=[.!?])\\s+").map(_.trim).filter(_.nonEmpty).toSeq

  private def splitBySentencesWithOverlap(
      text: String, leddNum: Int, ref: String, title: String, ctx: Ctx
  ): Seq[Chunk] = {
    val sentences = splitSentences(text)
    val overlapCount = math.max(1, (sentences.length * overlap / targetTokens.toDouble).toInt)
    val chunks = ArrayBuffer.empty[Chunk]
    var i = 0
    var chunkIdx = 1
    while (i < sentences.length) {
      val sel = ArrayBuffer.empty[String]
      var tk = 0
      var j = i
      var stop = false
      while (j < sentences.length && !stop) {
        val st = tokens.countTokens(sentences(j))
        if (tk + st <= targetTokens) { sel += sentences(j); tk += st; j += 1 }
        else stop = true
      }
      if (sel.nonEmpty) {
        chunks += Chunk(
          chunkId = s"$ref-ledd$leddNum-$chunkIdx",
          chunkIndex = 0,
          text = sel.mkString(" "),
          tokenCount = tk,
          paragraphRef = ref,
          paragraphTitle = title,
          sectionHeading = ctx.sectionHeading,
          documentTitle = ctx.documentTitle,
          chapterPath = ctx.chapterPath,
          address = "",
          url = "",
          crossRefs = Seq.empty,
          leddNumber = leddNum,
          merged = false,
          mergedWith = Seq.empty
        )
        chunkIdx += 1
      }
      i = math.max(i + 1, j - overlapCount)
    }
    chunks.toSeq
  }

  private def splitBySentences(text: String, idx: Int, docTitle: String): Seq[Chunk] =
    splitSentences(text).zipWithIndex.flatMap { case (sent, k0) =>
      val tk = tokens.countTokens(sent)
      if (tk <= maxTokens) Some(Chunk(
        chunkId = s"ledd-$idx-${k0 + 1}",
        chunkIndex = 0,
        text = sent,
        tokenCount = tk,
        paragraphRef = "",
        paragraphTitle = "",
        sectionHeading = "",
        documentTitle = docTitle,
        chapterPath = Seq.empty,
        address = "",
        url = "",
        crossRefs = Seq.empty,
        leddNumber = idx,
        merged = false,
        mergedWith = Seq.empty
      ))
      else None
    }

  // ---- A5: merge-small-chunks fold (reference `:707-829`) ----

  private[chunker] def mergeSmallChunks(chunks: Seq[Chunk]): Seq[Chunk] = {
    if (chunks.isEmpty) return chunks
    val merged = ArrayBuffer.empty[Chunk]
    var buffer = ArrayBuffer.empty[Chunk]
    var bufferTokens = 0

    def mergeBuffer(buf: Seq[Chunk], total: Int): Chunk = {
      val first = buf.head
      first.copy(
        text = buf.map(_.text).mkString("\n\n"),
        tokenCount = total,
        merged = true,
        mergedWith = buf.tail.map(_.chunkId)
      )
    }

    for (chunk <- chunks) {
      buffer += chunk
      bufferTokens += chunk.tokenCount
      val shouldFlush =
        bufferTokens >= minTokens ||
          bufferTokens + (bufferTokens / buffer.length) > maxTokens
      if (shouldFlush) {
        if (buffer.length == 1) merged += buffer.head
        else merged += mergeBuffer(buffer.toSeq, bufferTokens)
        buffer = ArrayBuffer.empty
        bufferTokens = 0
      }
    }

    if (buffer.nonEmpty) {
      if (buffer.length == 1) {
        // trailing small chunk merges backward into its predecessor when the
        // combined size stays within max (reference `:783-820`)
        val last = buffer.head
        if (last.tokenCount < minTokens && merged.nonEmpty) {
          val prev = merged.last
          val combined = prev.tokenCount + last.tokenCount
          if (combined <= maxTokens) {
            merged(merged.length - 1) = prev.copy(
              text = s"${prev.text}\n\n${last.text}",
              tokenCount = combined,
              merged = true,
              mergedWith = prev.mergedWith :+ last.chunkId
            )
          } else merged += last
        } else merged += last
      } else merged += mergeBuffer(buffer.toSeq, bufferTokens)
    }
    merged.toSeq
  }

  // ---- hierarchy + heading helpers (reference `:614-705`) ----

  private final case class Ctx(documentTitle: String, chapterPath: Seq[String], sectionHeading: String)

  private def hierarchicalContext(elem: Element, root: Element): Ctx = {
    var chapterPath = List.empty[String]
    var sectionHead = ""
    var current = parentElement(elem)
    while (current.isDefined) {
      val e = current.get
      if (attr(e, "class") == "section") {
        val h = sectionHeading(e)
        if (h.nonEmpty) {
          if (sectionHead.isEmpty) sectionHead = h
          chapterPath = h :: chapterPath // insert at front → outermost-first
        }
      }
      current = parentElement(e)
    }
    Ctx(documentTitle(root), chapterPath, sectionHead)
  }

  private def paragraphRef(article: Element): String =
    firstDescendant(article, "span", Some("legalArticleValue")).map(iterText(_).trim).getOrElse("")

  private def paragraphTitle(article: Element): String =
    firstDescendant(article, "span", Some("legalArticleTitle")).map(iterText(_).trim).getOrElse("")

  private def sectionHeading(section: Element): String =
    Seq("h2", "h3", "h4").iterator
      .flatMap(t => firstDescendant(section, t))
      .map(iterText(_).trim)
      .find(_ => true)
      .getOrElse("")

  private def documentTitle(root: Element): String =
    firstDescendant(root, "h1").map(iterText(_).trim).getOrElse("")

  private def crossRefs(elem: Element): Seq[String] =
    descendants(elem).filter(e => e.getTagName == "a" && e.hasAttribute("href"))
      .map(_.getAttribute("href"))
}
