package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** GraftExtensions: SQL surface of the native expressions + the
  * zero-offset-lead optimizer guard.
  */
class ExtensionsSpec extends SparkSpec {

  test("quantized_cosine is callable from SQL and matches the kernel") {
    val r = spark.sql(
      "SELECT quantized_cosine(array(1L,2L), array(3L,4L), 5L, 5L) AS c")
      .collect()(0).getDouble(0)
    // dot = 1*3 + 2*4 = 11; sqrt(5*5) = 5
    assert(math.abs(r - 11.0 / 5.0) < 1e-15)
  }

  test("strip_namespace is callable from SQL with the F4 edge cases") {
    val rows = spark.sql(
      """SELECT strip_namespace(x) AS s FROM VALUES
        |  ('a.b'), ('plain'), ('.lead'), ('trail.') AS t(x)""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    // trailing dot = empty namespace, stripped (matches the f4 oracle);
    // leading dot = empty local part, passes through unchanged
    assert(rows == Seq("a", "plain", ".lead", "trail"))
  }

  test("lead(c, 0) windows collapse to a projection (quadratic-frame guard)") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val w = Window.partitionBy($"k").orderBy($"v")
    val bad = df.withColumn("x", lead($"v", 0).over(w))
    val optimized = bad.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("Window"), optimized)
    // semantics preserved: lead at offset 0 is the row's own value
    assert(bad.collect().forall(r => r.getString(1) == r.getString(2)))
    // non-zero offsets keep their window
    val good = df.withColumn("x", lead($"v", 1).over(w))
    assert(good.queryExecution.optimizedPlan.toString.contains("Window"))
  }
}
