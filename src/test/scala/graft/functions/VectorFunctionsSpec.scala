package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class VectorFunctionsSpec extends SparkSuite {

  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (2L, Seq(0.0, 0.0), Seq(1.0, 1.0)),
      (3L, Seq(1.5), Seq(-2.0)),
    ).toDF("id", "a", "b")
  }

  test("vec_dot matches the HOF formulation exactly (same sum order)") {
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, z) => acc + z)
    val rows = vecs.select(VectorFunctions.dot(col("a"), col("b")).as("fast"),
      hof.as("ref")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("vec_dot null propagation") {
    import spark.implicits._
    val df = Seq((1L, Option(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("id", "a", "b")
    assert(df.select(VectorFunctions.dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("vec_dot stays inside WholeStageCodegen (HOFs would break out)") {
    val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val exec = e.select(VectorFunctions.dot(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan
    val inCodegen = exec.exists {
      case _: org.apache.spark.sql.execution.WholeStageCodegenExec => true
      case p => p.toString.startsWith("*(") // codegen'd span marker
    }
    assert(inCodegen, exec.toString)
  }

  test("vec_dot is callable from SQL after registration") {
    VectorFunctions.registerSql(spark)
    val v = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(v == 11.0)
    // arity is validated at resolution
    intercept[Exception](spark.sql("SELECT vec_dot(array(1.0d))").collect())
  }

  test("the SparkSessionExtensions hook wires the same builder") {
    // cluster path: spark.sql.extensions=...GraftSqlExtensions; here we
    // exercise the injection call itself (the builder's behavior is the
    // SQL test above — both paths share it)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new org.apache.spark.sql.graftvec.GraftSqlExtensions().apply(ext)
  }

  test("vec_dot on real embeddings agrees with rounded cosine oracle path") {
    val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // unit vectors: self dot ≈ 1
    val selfs = e.select(VectorFunctions.dot(col("v"), col("v")).as("d"))
      .agg(min("d"), max("d")).head()
    assert(math.abs(selfs.getDouble(0) - 1.0) < 1e-5)
    assert(math.abs(selfs.getDouble(1) - 1.0) < 1e-5)
  }
}
