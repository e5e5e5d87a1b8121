package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ext.Similarity

class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("array_dot / array_l2norm match hand-computed values") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      VectorExpressions.array_dot(col("a"), col("b")).as("d"),
      VectorExpressions.array_l2norm(col("a")).as("n"),
      VectorExpressions.array_cosine(col("a"), col("a")).as("c")).head
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("codegen'd expression results are bit-identical to the UDF kernels") {
    val cross = emb.limit(30).select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(emb.limit(30).select(col("vec_id").as("ib"), col("embedding").as("b")))
    val mismatches = cross.select(
        VectorExpressions.array_dot(col("a"), col("b")).as("expr_dot"),
        Similarity.dot(col("a"), col("b")).as("udf_dot"),
        VectorExpressions.array_l2norm(col("a")).as("expr_norm"),
        Similarity.l2Norm(col("a")).as("udf_norm"))
      .filter(col("expr_dot") =!= col("udf_dot") || col("expr_norm") =!= col("udf_norm"))
      .count()
    assert(mismatches == 0)
  }

  test("null inputs propagate null") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0)), Option.empty[Array[Double]])).toDF("a", "b")
    val r = df.select(VectorExpressions.array_dot(col("a"), col("b")).as("d")).head
    assert(r.isNullAt(0))
  }

  test("SQL registration exposes the functions") {
    VectorExpressions.register(spark)
    emb.limit(5).createOrReplaceTempView("t_vec")
    val n = spark.sql(
      """SELECT array_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) AS d,
        |       array_l2norm(CAST(embedding AS ARRAY<DOUBLE>)) AS l
        |FROM t_vec""".stripMargin).collect()
    assert(n.length == 5)
    for (r <- n) assert(math.abs(math.sqrt(r.getDouble(0)) - r.getDouble(1)) < 1e-9)
  }

  test("expression works inside whole-stage codegen (no fallback errors) on a full scan") {
    val s = emb.select(VectorExpressions.array_l2norm(col("embedding")).as("n"))
      .agg(sum("n")).head.getDouble(0)
    assert(s > 0)
  }
}
