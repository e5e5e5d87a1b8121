package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TextStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token counting: whitespace and BPE-ish") {
    val df = Seq("Hello, world! It's 2024.", "", "  ", "one").toDF("t")
    val got = df.select(
      TextStats.wsTokenCount(col("t")).as("ws"),
      TextStats.tokenCount(col("t")).as("bpe")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    // "Hello, world! It's 2024." -> ws: 4;
    // bpe: hello , world ! it ' s 2024 . -> 9
    assert(got == Seq((4, 9), (0, 0), (0, 0), (1, 1)))
  }

  test("punct ratio and avg word len") {
    val r = Seq("ab, cd!").toDF("t")
      .select(TextStats.punctRatio(col("t")).as("p"),
        TextStats.avgWordLen(col("t")).as("w")).head
    // non-space chars: a b , c d ! = 6, punct = 2
    assert(math.abs(r.getDouble(0) - 2.0 / 6.0) < 1e-9)
    // words "ab," (3) "cd!" (3) -> 3.0
    assert(math.abs(r.getDouble(1) - 3.0) < 1e-9)
  }

  test("stopword ratio and quality score bands") {
    val good = ("the quick brown fox jumps over the lazy dog and keeps running " * 10)
    val r = Seq(good, "x@#$%", "").toDF("t")
      .select(TextStats.stopwordRatio(col("t")).as("sw"),
        TextStats.qualityScore(col("t")).as("q")).collect()
    assert(r(0).getDouble(0) > 0.2)
    assert(r(0).getDouble(1) == 1.0)
    assert(r(1).getDouble(1) < 0.5)
    assert(r(2).getDouble(1) == 0.0)
  }

  test("langId picks the marker-heavy language deterministically") {
    val df = Seq(
      "the cat is in the house and it is warm",
      "der hund ist nicht ein problem und das ist gut",
      "le chat est dans la maison et il est content",
      "el perro es un animal y la casa es grande",
      "zzz qqq xxx").toDF("t")
    val got = df.select(TextStats.langId(col("t")).as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("en", "de", "fr", "es", "und"))
  }

  test("fingerprint is order/dup-insensitive; rollingHash is order-sensitive") {
    val df = Seq(("b a c a", "a b c"), ("a b c", "c b a")).toDF("x", "y")
    val fp = df.select(
      (TextStats.fingerprint(col("x")) === TextStats.fingerprint(col("y"))).as("eq"),
      (TextStats.rollingHash(col("x")) === TextStats.rollingHash(col("y"))).as("rheq"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1))).toSeq
    assert(fp == Seq((true, false), (true, false)))
  }

  test("stats run over the real documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val agg = docs.select(
      TextStats.tokenCount(col("text")).as("tc"),
      TextStats.qualityScore(col("text")).as("q"))
      .agg(sum("tc"), avg("q")).head
    assert(agg.getLong(0) > 0)
    assert(agg.getDouble(1) >= 0.0 && agg.getDouble(1) <= 1.0)
  }

  test("qualityKeep tight loop is bit-identical to the Column form") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").as[String].collect().toSeq
    val edge = Seq(
      null, "", "   ", "one two three four", // < 5 tokens
      "the and of is to in words here now ok",          // stopword heavy
      "aa bb cc dd ee",                                 // awl 2 -> fail
      "longwordsareherenow longwordsareherenow three four five", // awl high
      "the !!! ??? ... ;;; mark mark mark mark",        // punct heavy
      "The\tAnd\nof\ris to valid line with words here.",
      "ab the of with is words padd padd padd",
      // non-BMP parity: astral chars count ONE code point in both forms
      "the \ud835\udd4f\ud835\udd4f word with astral runes here now",
      "\ud83d\ude00\ud83d\ude00 the of with is words padd padd padd")
    val texts = docs ++ edge
    val df = texts.toDF("text")
    val got = df.select(col("text"),
        graft.ext.TextStats.qualityKeep(col("text")).as("fast"),
        graft.ext.TextStats.qualityKeepExpr(col("text")).as("ref"))
      .collect()
    for (r <- got)
      assert(r.getBoolean(1) == (if (r.isNullAt(2)) false else r.getBoolean(2)),
        s"parity break on: <${r.getString(0)}>")
    assert(got.exists(_.getBoolean(1)) && got.exists(!_.getBoolean(1)))
  }

  test("repetition signals: top-2gram and dup-3gram fractions, hand-checked") {
    val df = Seq(
      (1L, "foo bar foo bar foo bar baz"), // spammy: "foo bar" x3
      (2L, "all distinct words here now"),
      (3L, "x"),                            // below n-gram sizes
      (4L, "")
    ).toDF("doc_id", "text")
    val got = TextStats.repetitionStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-9
    // doc 1: m2("foo bar")=3 -> 6/7; dup 3-grams (2+2)*3=12 -> 12/7 (>1 by
    // design: overlapping coverage is a filter signal, not a probability)
    assert(got(1L)._1 == 7 && close(got(1L)._2, 6.0 / 7) && close(got(1L)._3, 12.0 / 7))
    assert(got(2L)._1 == 5 && close(got(2L)._2, 0.4) && close(got(2L)._3, 0.0))
    assert(got(3L) == ((1, 0.0, 0.0)))
    assert(got(4L) == ((0, 0.0, 0.0)))
  }

  test("unigram LM scoring: rare-token docs score higher, smoothing exact") {
    val df = Seq(
      (1L, "common common common"),
      (2L, "common rareword"),
      (3L, "")
    ).toDF("doc_id", "text")
    val got = TextStats.lmScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    // corpus: common x4, rareword x1 -> N=5, V=2; alpha=1
    // p(w) = (c+1)/(N+V) = (c+1)/7
    val pc = 5.0 / 7.0; val pr = 2.0 / 7.0
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(got(1L)._1 == 3L && close(got(1L)._2, -math.log(pc)))
    assert(got(2L)._1 == 2L &&
      close(got(2L)._2, (-math.log(pc) - math.log(pr)) / 2))
    assert(got(2L)._2 > got(1L)._2, "rare token raises the doc's NLL")
    assert(got(3L) == ((0L, 0.0)), "empty doc scores 0 with 0 tokens")
  }

  test("char entropy: uniform max, single-char zero, prose in between") {
    val df = Seq(
      (1L, "abcd"),          // uniform over 4 chars -> exactly 2 bits
      (2L, "aaaaaaaa"),      // degenerate -> 0 bits
      (3L, "the quick brown fox jumps"),
      (4L, "")
    ).toDF("doc_id", "text")
    val got = TextStats.charEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-9
    assert(got(1L)._1 == 4L && close(got(1L)._2, 2.0))
    assert(got(2L)._1 == 8L && close(got(2L)._2, 0.0))
    assert(got(3L)._2 > 2.0 && got(3L)._2 < 5.0, s"prose in range: ${got(3L)}")
    assert(got(4L) == ((0L, 0.0)))
  }

  test("cross-doc repetition: shared boilerplate scores, within-doc spam does not") {
    val footer = "copyright example corp all rights reserved"   // 6 tokens
    val df = Seq(
      (1L, s"unique article one body text here $footer"),       // 12 tokens
      (2L, s"another different second body entirely $footer"),  // 11 tokens
      (3L, "spam spam spam spam spam spam spam spam spam"),     // self-repeat only
      (4L, "tiny")                                              // below n
    ).toDF("doc_id", "text")
    val got = TextStats.crossDocRepetition(df, "doc_id", "text", n = 3, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-9
    // the shared footer contributes its 4 internal 3-grams and nothing
    // else (bodies and boundary grams are disjoint)
    assert(got(1L)._1 == 10L && close(got(1L)._2, 4.0 / 10), s"got ${got(1L)}")
    assert(got(2L)._1 == 9L && close(got(2L)._2, 4.0 / 9), s"got ${got(2L)}")
    // doc 3 repeats only WITHIN itself: its gram appears in one doc, so
    // the cross-doc signal stays zero (the axis repetitionStats covers)
    assert(got(3L)._1 == 7L && close(got(3L)._2, 0.0))
    assert(got(4L) == ((0L, 0.0)))
  }
}
