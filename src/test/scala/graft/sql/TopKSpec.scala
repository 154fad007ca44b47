package graft.sql

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[org.apache.spark.sql.graft.TopKByScore]]: heap semantics (ties,
  * under-full groups, serde round trip through a real shuffle), agreement
  * with the window idiom on adversarial data, and the layout-invariance
  * property that justifies replacing a window with an aggregate at all.
  */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(graft.functions.topk_by(col("s"), col("id"), k).as("tk"))
      .select(col("g"), posexplode(col("tk")))
      .select(col("g"), (col("pos") + 1).as("rnk"),
        col("col.id").as("id"), col("col.score").as("s"))

  test("matches the row_number window idiom, including score ties") {
    import spark.implicits._
    // deterministic pseudo-random rows with deliberate score collisions
    // (s has only 17 distinct values over 500 rows → heavy tie pressure)
    val rows = (0 until 500).map { i =>
      (s"g${i % 7}", ((i * 2654435761L) % 17).toDouble, i.toLong)
    }
    val df = rows.toDF("g", "s", "id").repartition(13)
    val got = topk(df, 5).orderBy("g", "rnk").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val want = rows.toDF("g", "s", "id")
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("s").desc, col("id").asc)))
      .filter(col("rnk") <= 5)
      .select(col("g"), col("rnk"), col("id"), col("s"))
      .orderBy("g", "rnk").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("result is invariant to partitioning (pure function of the row set)") {
    import spark.implicits._
    val rows = (0 until 300).map(i => ("g", (i % 11).toDouble, i.toLong))
    val a = topk(rows.toDF("g", "s", "id").repartition(1), 7)
      .orderBy("rnk").collect().toSeq
    val b = topk(rows.toDF("g", "s", "id").repartition(29, col("id")), 7)
      .orderBy("rnk").collect().toSeq
    assert(a == b)
  }

  test("groups smaller than k return all rows, sorted; nulls are skipped") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1.0), Some(10L)), ("a", Some(3.0), Some(11L)),
      ("a", None, Some(12L)), ("a", Some(2.0), None))
      .toDF("g", "s", "id")
    val got = topk(df, 5).orderBy("rnk").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1, 11L, 3.0), (2, 10L, 1.0)))
  }

  test("NaN scores rank above finite ones, agreeing with the window idiom") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 1L), ("a", Double.NaN, 2L), ("a", 99.0, 3L),
      ("a", Double.NaN, 4L)).toDF("g", "s", "id")
    val agg = topk(df, 3).orderBy("rnk").collect().map(r => r.getLong(2)).toSeq
    val win = df.withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("s").desc, col("id").asc)))
      .filter(col("rnk") <= 3).orderBy("rnk")
      .collect().map(_.getLong(2)).toSeq
    assert(agg == Seq(2L, 4L, 3L) && win == agg)
  }

  test("topk_by is callable from SQL via the registry") {
    import spark.implicits._
    graft.sql.LshFunctions.register(spark)
    Seq(("a", 5.0, 1L), ("a", 7.0, 2L), ("a", 6.0, 3L))
      .toDF("g", "s", "id").createOrReplaceTempView("topk_sql_t")
    val got = spark.sql(
      "SELECT g, topk_by(s, id, 2) AS tk FROM topk_sql_t GROUP BY g")
      .selectExpr("g", "tk[0].id AS first", "tk[1].id AS second").head()
    assert(got.getLong(1) == 2L && got.getLong(2) == 3L)
  }

  test("k must be a constant in range") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 1L)).toDF("g", "s", "id")
    val e = intercept[Exception] {
      df.groupBy("g").agg(graft.functions.topk_by(col("s"), col("id"), 0)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("k"))
  }
}
