package graft.wiki

import java.io.FileOutputStream

import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** SURVEY §7.4 risk #1: a real `pages-articles-multistream.xml.bz2` is a
  * CONCATENATION of independent bz2 streams, and a `<page>` element can
  * straddle a stream boundary (the reference's line-oriented state machine
  * rides across it transparently, ref /root/reference/scripts/wiki/
  * wikipedia.py:302-425). Hadoop's splittable Bzip2Codec must (a) decode
  * concatenated streams and (b) hand Spark's XML record reader the bytes
  * across both stream and input-split boundaries without losing or
  * duplicating the straddling page.
  *
  * The fixture here is adversarial on both axes: two bz2 streams whose
  * boundary falls mid-`<page>`, read with tiny input splits so the scan
  * also splits WITHIN streams.
  */
class MultistreamBz2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val nPages = 200

  private def pageXml(i: Int): String =
    s"""  <page>
       |    <title>Multistream page $i</title>
       |    <ns>0</ns>
       |    <id>$i</id>
       |    <revision>
       |      <id>${1000 + i}</id>
       |      <text>Body of page $i with a [[Link $i|anchor $i]] and enough filler text to give the page a realistic size for compression. ${"x " * 40}end-$i</text>
       |    </revision>
       |  </page>""".stripMargin

  /** Write `xml` as ONE bz2 file of two concatenated streams, cut at byte
    * `cutAt` (mid-page by construction). Returns the file path.
    */
  private def writeMultistream(xml: String, cutAt: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ms").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "dump.xml.bz2")
    val bytes = xml.getBytes("UTF-8")
    val out = new FileOutputStream(f)
    try {
      for ((from, to) <- Seq((0, cutAt), (cutAt, bytes.length))) {
        val s = new BZip2CompressorOutputStream(out)
        s.write(bytes, from, to - from)
        s.finish() // ends THIS stream; next iteration starts a fresh one
      }
    } finally out.close()
    f.getPath
  }

  test("a <page> straddling a bz2 stream boundary is read exactly once, byte-equal") {
    val xml = "<mediawiki>\n" +
      (0 until nPages).map(pageXml).mkString("\n") + "\n</mediawiki>"
    // cut inside page 100's <text> body: boundary mid-element, mid-line
    val marker = "Body of page 100"
    val cutAt = xml.indexOf(marker) + marker.length + 7
    assert(cutAt > 0 && cutAt < xml.length)
    val path = writeMultistream(xml, cutAt)

    // tiny splits force multiple partitions inside each stream too
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
      val pages = WikipediaSource.read(spark, path)
      val rows = pages.collect()
      assert(rows.length == nPages, "no page lost or duplicated")
      assert(rows.map(_.getAs[String]("article_id")).distinct.length == nPages)

      // the straddling page survives byte-for-byte
      val p100 = rows.find(_.getAs[String]("article_id") == "100").get
      val expected = s"Body of page 100 with a [[Link 100|anchor 100]] and enough filler text to give the page a realistic size for compression. ${"x " * 40}end-100"
      assert(p100.getAs[String]("text") == expected)
      assert(p100.getAs[String]("title") == "Multistream page 100")

      // NOTE the native XML source reads a bz2 file as ONE task even with
      // tiny maxPartitionBytes (asserted so a behavior change is noticed):
      // correct, but single-threaded per file — the parallel scale path
      // for one huge dump file is readMultistreamIndexed (its own spec).
      assert(pages.rdd.getNumPartitions == 1)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("Wikidata JSON-lines dump split across bz2 streams mid-line parses losslessly") {
    // same risk for the S1 source: a JSON line cut at a stream boundary.
    // Compression-resistant filler pushes the raw size past several bz2
    // blocks (900 KB each) so the splittability assertion below is real.
    def filler(i: Int): String =
      (0 until 12).map(j => java.lang.Long.toHexString(
        (i.toLong * 2654435761L + j * 40503L) * 2246822519L)).mkString(" ")
    val lines = (0 until 20000).map { i =>
      s"""{"type":"item","id":"Q$i","labels":{"en":{"language":"en","value":"Label $i ${filler(i)}"}},"sitelinks":{"enwiki":{"title":"Title $i"}}},"""
    }
    val body = "[\n" + lines.mkString("\n") + "\n]"
    val cutAt = body.indexOf("\"Q10250\"") + 3 // inside a line, inside a string
    val path = writeMultistream(body, cutAt)

    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
      val parsed = WikidataSource.read(spark, path)
      assert(parsed.count() == 20000)
      assert(parsed.select("id").distinct().count() == 20000)
      // unlike the XML source, the line-based scan SPLITS inside bz2
      // (Hadoop splittable codec) — the S1 parallelism claim, pinned
      assert(parsed.rdd.getNumPartitions > 1)
      assert(parsed.filter(org.apache.spark.sql.functions.col("id") === "Q10250")
        .select("labels").collect().head.getMap[String, org.apache.spark.sql.Row](0)
        .get("en").get.getAs[String]("value").startsWith("Label 10250 "))
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
