package graft.wiki

import java.io.FileOutputStream

import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The multistream-INDEXED parallel reader: a faithful
  * `pages-articles-multistream` fixture (header stream with an unclosed
  * `<mediawiki><siteinfo>` root, N independent page streams, footer
  * stream) plus its `offset:page_id:title` index. Asserts the parallel
  * reader (a) reads every page exactly once with byte-equal text,
  * (b) agrees row-for-row with the native single-task XML source, and
  * (c) actually fans out over multiple partitions — the property the
  * native source lacks on one big bz2 file.
  */
class MultistreamIndexedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val pagesPerStream = 40
  private val nStreams = 5
  private val nPages = pagesPerStream * nStreams

  private def pageXml(i: Int): String =
    s"""  <page>
       |    <title>Ms page $i &amp; more</title>
       |    <ns>${i % 3}</ns>
       |    <id>$i</id>
       |    <revision>
       |      <id>${900000 + i}</id>
       |      <contributor>
       |        <id>42</id>
       |      </contributor>
       |      <text bytes="120" xml:space="preserve">Body &lt;b&gt; of $i with [[Link $i|anchor]] ${"filler " * 15}end-$i</text>
       |    </revision>
       |  </page>""".stripMargin

  /** Build dump + index; returns (dumpPath, indexPath). */
  private def writeFixture(): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_msi").toFile
    dir.deleteOnExit()
    val dump = new java.io.File(dir, "dump.xml.bz2")
    val out = new FileOutputStream(dump)
    var offset = 0L
    val indexLines = scala.collection.mutable.ListBuffer.empty[String]
    def writeStream(content: String): Long = {
      val before = offset
      val s = new BZip2CompressorOutputStream(out)
      s.write(content.getBytes("UTF-8"))
      s.finish()
      out.flush()
      offset = out.getChannel.position()
      before
    }
    try {
      writeStream("<mediawiki xmlns=\"x\" version=\"0.11\">\n  <siteinfo>\n    <sitename>Fixture</sitename>\n  </siteinfo>\n")
      for (s <- 0 until nStreams) {
        val ids = (s * pagesPerStream) until ((s + 1) * pagesPerStream)
        val streamOff = writeStream(ids.map(pageXml).mkString("", "\n", "\n"))
        ids.foreach(i => indexLines += s"$streamOff:$i:Ms page $i & more")
      }
      writeStream("</mediawiki>\n")
    } finally out.close()
    val index = new java.io.File(dir, "index.txt")
    java.nio.file.Files.write(index.toPath,
      indexLines.mkString("\n").getBytes("UTF-8"))
    (dump.getPath, index.getPath)
  }

  test("indexed parallel reader: lossless, parity with native source, and parallel") {
    val (dump, index) = writeFixture()
    val par = WikipediaSource.readMultistream(spark, dump, index)

    val rows = par.collect()
    assert(rows.length == nPages, "every page exactly once")
    assert(rows.map(_.getAs[String]("article_id")).distinct.length == nPages)

    // byte-equal content incl. entity unescaping on a sample page
    val p77 = rows.find(_.getAs[String]("article_id") == "77").get
    assert(p77.getAs[String]("title") == "Ms page 77 & more")
    assert(p77.getAs[Long]("ns") == 77 % 3)
    assert(p77.getAs[String]("text") ==
      s"Body <b> of 77 with [[Link 77|anchor]] ${"filler " * 15}end-77")

    // row-for-row parity with the native (single-task) XML source
    val native = WikipediaSource.read(spark, dump).collect()
      .map(r => (r.getAs[String]("title"), r.getAs[String]("article_id"),
        r.getAs[Long]("ns"), r.getAs[String]("text"))).toSet
    val ours = rows
      .map(r => (r.getAs[String]("title"), r.getAs[String]("article_id"),
        r.getAs[Long]("ns"), r.getAs[String]("text"))).toSet
    assert(ours == native, "parallel reader must agree with the native source")

    // and it genuinely fans out (the native source is pinned to 1 task)
    assert(par.rdd.getNumPartitions > 1,
      s"expected multi-partition scan, got ${par.rdd.getNumPartitions}")
  }

  test("a malformed page fragment is skipped; the rest of its stream survives") {
    val good = (0 until 3).map(pageXml).mkString("\n")
    val chunk = good + "\n  <page>\n    <title>broken & unescaped <<</title>\n    <id>99</id>\n  </page>\n" + pageXml(7)
    val pages = MultistreamCodec.parsePages(chunk)
    // 3 good + 1 trailing good; the malformed one contributes nothing
    assert(pages.map(_._3).toSet == Set("0", "1", "2", "7"))
  }

  test("index-less fallback: magic-scan offsets ⊇ index offsets, identical rows") {
    val (dump, index) = writeFixture()
    // ground truth from the index (page streams only — the header and
    // footer streams are real streams the index never mentions)
    val indexed = scala.io.Source.fromFile(index).getLines()
      .map(_.split(":")(0).toLong).toSet
    val discovered = WikipediaSource.discoverStreamOffsets(spark, dump)
    assert(discovered.head == 0L, "header stream starts at byte 0")
    assert(indexed.subsetOf(discovered.toSet),
      s"every indexed stream must be discovered: $indexed vs ${discovered.toSet}")
    // header + nStreams page streams + footer
    assert(discovered.length == nStreams + 2, discovered.mkString(","))

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("title"), r.getAs[String]("article_id"),
        r.getAs[Long]("ns"), r.getAs[String]("text"))).toSet
    assert(rows(WikipediaSource.readMultistream(spark, dump)) ==
      rows(WikipediaSource.readMultistream(spark, dump, index)),
      "index-less read must equal the indexed read")
  }

  test("downstream parity: linkCounts over the parallel read == over the native read") {
    val (dump, index) = writeFixture()
    val titleMap = spark.range(nPages).selectExpr(
      "concat('Link ', id) AS name", "concat('Q', id) AS id")
    def counts(pages: org.apache.spark.sql.DataFrame) =
      AliasesJob.linkCounts(pages, titleMap).collect()
        .map(r => (r.getAs[String]("alias"), r.getAs[String]("entity_id"),
          r.getAs[Long]("count"))).toSet
    assert(counts(WikipediaSource.readMultistream(spark, dump, index)) ==
      counts(WikipediaSource.read(spark, dump)))
  }
}
