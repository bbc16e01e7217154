package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests for the native codegen vector kernels: the
  * generated code (exercised through a DataFrame, so doGenCode runs)
  * must agree with a plain-Scala reference on seeded-random inputs,
  * including empty and length-mismatched arrays. */
class KernelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("vec_dot matches the scalar reference (codegen path)") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(42)
    val cases = (0 until 40).map { i =>
      def vec(n: Int) = Array.fill(n)(rnd.nextDouble() * 2e3 - 1e3)
      (i.toLong, vec(rnd.nextInt(80)), vec(rnd.nextInt(80)))
    } :+ ((99L, Array.empty[Double], Array(1.0, 2.0)))
    val got = cases.toDF("i", "a", "b")
      .selectExpr("i", "vec_dot(a, b) AS dotp")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((i, a, b) <- cases) {
      val n = math.min(a.length, b.length)
      val want = (0 until n).map(k => a(k) * b(k)).sum
      assert(math.abs(got(i) - want) <= 1e-9 * (1 + math.abs(want)),
        s"case $i: got ${got(i)}, want $want")
    }
  }

  test("vec_inter_sorted matches set intersection (codegen path)") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val cases = (0 until 40).map { i =>
      def sorted(n: Int) =
        Array.fill(n)(rnd.nextInt(50).toLong).distinct.sorted
      (i.toLong, sorted(rnd.nextInt(60)), sorted(rnd.nextInt(60)))
    } :+ ((99L, Array.empty[Long], Array(1L, 2L)))
    val got = cases.toDF("i", "a", "b")
      .selectExpr("i", "vec_inter_sorted(a, b) AS inter")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((i, a, b) <- cases)
      assert(got(i) == a.toSet.intersect(b.toSet).size, s"case $i")
  }
}
