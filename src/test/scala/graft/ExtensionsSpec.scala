package graft

import graft.functions.GraftExtensions
import org.apache.spark.sql.functions._

/** SparkSessionExtensions surface: the HOF-to-kernel optimizer rule must
  * rewrite exactly the bitwise-safe pattern and nothing else.
  */
class ExtensionsSpec extends SparkSpec {

  private def hofDot(df: org.apache.spark.sql.DataFrame) =
    df.select(expr(
      "aggregate(zip_with(v, v, (x, y) -> x * y), 0d, (acc, w) -> acc + w)").as("d"))

  test("HOF dot product over double arrays rewrites to the graft_dot kernel") {
    GraftExtensions.install(spark)
    val e = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val hof = hofDot(e)
    val opt = hof.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_dot"), s"HOF pattern not rewritten:\n$opt")
    // and the rewrite must be invisible in the output: bitwise identical
    graft.functions.VectorFunctions.register(spark)
    val viaKernel = e.select(expr("graft_dot(v, v)").as("d"))
      .collect().map(_.getDouble(0)).toSeq
    val viaHof = hof.collect().map(_.getDouble(0)).toSeq
    assert(viaHof == viaKernel, "rewrite changed output bits")
  }

  test("float-array HOF is NOT rewritten (float-mult numerics differ from the kernel)") {
    GraftExtensions.install(spark)
    val e = Tables.t(spark, sfDir, "embeddings").select(col("embedding").as("v"))
    val opt = hofDot(e).queryExecution.optimizedPlan.toString
    assert(!opt.contains("graft_dot"),
      s"float HOF must keep its own numerics:\n$opt")
  }

  test("a non-dot HOF aggregate is left alone") {
    GraftExtensions.install(spark)
    val e = Tables.t(spark, sfDir, "embeddings")
      .select(expr("transform(embedding, x -> cast(x as double))").as("v"))
    // sum of MAXes, not products — must not match
    val other = e.select(expr(
      "aggregate(zip_with(v, v, (x, y) -> greatest(x, y)), 0d, (acc, w) -> acc + w)").as("d"))
    assert(!other.queryExecution.optimizedPlan.toString.contains("graft_dot"))
  }
}
