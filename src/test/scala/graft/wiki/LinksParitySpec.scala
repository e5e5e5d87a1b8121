package graft.wiki

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Bit-parity of the JVM tight-loop link extractor ([[WikiText.linksImpl]],
  * the WP-ingest hot path) against the column-expression semantic reference
  * ([[WikiText.linksExpr]]) — the same pattern that gates the minhash and
  * langid tight loops.
  */
class LinksParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def both(texts: Seq[String]): Unit = {
    import spark.implicits._
    val df = texts.toDF("text").repartition(4).cache()
    val expr = df.select(col("text"), WikiText.linksExpr(col("text")).as("ls"))
    val fast = df.select(col("text"), WikiText.links(col("text")).as("ls"))
    def mat(d: org.apache.spark.sql.DataFrame) = d.collect().map { r =>
      val ls = r.getSeq[org.apache.spark.sql.Row](1)
      r.getString(0) -> (if (ls == null) null
        else ls.map(x => (x.getString(0), x.getString(1))))
    }.toMap
    val (e, f) = (mat(expr), mat(fast))
    df.unpersist()
    for ((t, exp) <- e)
      assert(f(t) == exp, s"parity break on input: <$t>")
  }

  test("parity on reference goldens") {
    val golden = spark.read.option("multiLine", "true")
      .json(TestSpark.resource("/golden_text.json"))
    val ins = golden.select(explode(col("links")).as("c"))
      .select("c.in").collect().map(_.getString(0)).toSeq
    assert(ins.length >= 12)
    both(ins)
  }

  test("parity on hand-picked edge cases") {
    both(Seq(
      null,
      "",
      "no links at all",
      "[[Berlin]]",
      "[[Berlin|the capital]]",
      "[[ Berlin _ city ]] and [[Paris#arrondissement]]",
      "[[Berlin (city)|]]",                // empty-alias paren shape
      "[[Berlin (city)|]] and [[(x)|]]",   // paren at position 0
      "[[a|b|c]]",                         // extra pipe: third part dropped
      "[[|x]]", "[[x|]]", "[[|]]", "[[]]", // degenerate pipes
      "[[#fragment]]", "[[x#y|z]]", "[[x#y]]",
      "[[Category:Stuff]] kept? no", "[[File:pic.png|thumb]]",
      "[[:fr:Paris]] interwiki", "[[fr:Paris]]",
      "[[User talk:Bob|bob]]", "[[wikt:word]]",
      "unclosed [[Berlin and then [[Paris]] ok",
      "nested [[a[[b]]c]] shapes",
      "tricky [[a]b]] backtrack",
      "tricky [[a]]] extra bracket",
      "[[x]][[y]]",
      "]] stray close [[z]]",
      "[[trailing_underscore_]]",
      "[[__]]", "[[ _ ]]",
      "[[éléphant]]",            // non-ASCII capitalize
      "[[ß-title]]",                  // sharp s upper → SS
      "[[😀 emoji first]]",      // supplementary first codepoint
      "multi\nline [[A\nB]] span?",
      "pipe first [[|only alias]]",
      "[[  spaced  |  alias  ]]",
      "[[a(b|c]]",                         // paren + pipe interplay
      "[[a (b)|x]]"))
  }

  test("parity on the documents corpus + adversarial synthetic wikitext") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text").as[String].collect().toSeq
    // deterministic pseudo-random wikitext stressing the scanner states
    val rnd = new scala.util.Random(42)
    val atoms = Seq("[[", "]]", "|", "#", "_", "(", ")", " ", ":", "=",
      "Berlin", "Category:X", "fr:", "User talk:A", "word", "é", "\n")
    val synth = (0 until 300).map { _ =>
      (0 until (3 + rnd.nextInt(25))).map(_ => atoms(rnd.nextInt(atoms.length)))
        .mkString
    }
    both(docs ++ synth)
  }
}
