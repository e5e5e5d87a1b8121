package graft.wiki

import java.io.{ByteArrayInputStream, StringReader}
import java.nio.charset.StandardCharsets.UTF_8

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream
import org.apache.hadoop.fs.FSDataInputStream

/** Per-task decode/parse kernel for [[WikipediaSource.readMultistream]]:
  * positional-read one bz2 stream's byte range, decompress it standalone
  * (every multistream chunk is an independent bz2 stream), scan for
  * complete `<page>…</page>` fragments, and StAX-parse each fragment.
  *
  * The fragment scan (not a whole-chunk XML parse) is what makes header
  * (`<mediawiki><siteinfo>…`) and footer (`</mediawiki>`) streams —
  * which are not well-formed documents on their own — harmless: they
  * simply contain no complete page fragment. Literal `</page>` cannot
  * occur inside page content: wikitext is XML-escaped in the dump.
  */
private[wiki] object MultistreamCodec {

  private val factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    f
  }

  /** (title, ns, article_id, text) for every complete page in the range.
    * Eager (the range is one ~MB-scale stream) so the shared input stream
    * is never read lazily across ranges.
    */
  def pagesInRange(in: FSDataInputStream, start: Long,
                   end: Long): List[(String, Long, String, String)] = {
    // a degenerate index (empty/stale) can collapse the range list to
    // (0, fileLen); past 2 GiB the toInt below would overflow into a
    // NegativeArraySizeException or a silently truncated buffer
    require(end - start <= Int.MaxValue,
      s"multistream range [$start,$end) exceeds 2 GiB — the stream index " +
        "is missing or degenerate; refusing to buffer the whole file")
    val buf = new Array[Byte]((end - start).toInt)
    in.readFully(start, buf) // positional read: no shared seek state
    val bz = new BZip2CompressorInputStream(new ByteArrayInputStream(buf), true)
    val text = try new String(bz.readAllBytes(), UTF_8) finally bz.close()
    parsePages(text)
  }

  /** Scan a decompressed chunk for complete page fragments and parse each. */
  def parsePages(chunk: String): List[(String, Long, String, String)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(String, Long, String, String)]
    var i = chunk.indexOf("<page>")
    while (i >= 0) {
      val close = chunk.indexOf("</page>", i)
      if (close < 0) i = -1
      else {
        parsePage(chunk.substring(i, close + "</page>".length)).foreach(out += _)
        i = chunk.indexOf("<page>", close + "</page>".length)
      }
    }
    out.toList
  }

  /** StAX-parse one well-formed `<page>` fragment. Path-aware: the
    * page-level `<id>` is page > id (NOT page > revision > id — the
    * revision/contributor ids the reference's line scanner must
    * hand-exclude, ref wikipedia.py:340-422); the body is
    * page > revision > text. Entities (&lt; etc.) are resolved by StAX.
    */
  def parsePage(frag: String): Option[(String, Long, String, String)] = {
    val r = factory.createXMLStreamReader(new StringReader(frag))
    var title: String = null
    var ns: Long = 0L
    var id: String = null
    var text: String = null
    val stack = scala.collection.mutable.Stack.empty[String]
    val sb = new java.lang.StringBuilder()
    var capture: String = null // which field the current characters feed
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            stack.push(r.getLocalName)
            capture = stack.toList.reverse match {
              case List("page", "title")              => "title"
              case List("page", "ns")                 => "ns"
              case List("page", "id") if id == null   => "id"
              case List("page", "revision", "text")   => "text"
              case _                                  => null
            }
            sb.setLength(0)
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (capture != null) sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            if (capture != null) {
              capture match {
                case "title" => title = sb.toString
                case "ns"    => ns = sb.toString.trim.toLong
                case "id"    => id = sb.toString.trim
                case "text"  => text = sb.toString
              }
              capture = null
            }
            if (stack.nonEmpty) stack.pop()
          case _ => ()
        }
      }
      Option.when(id != null)((title, ns, id, text))
    } catch {
      case _: Exception => None // malformed fragment: skip, never kill the scan
    } finally r.close()
  }
}
