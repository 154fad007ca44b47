package graft.sql

import graft.TestSpark
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OrEquiJoinExpansion: an inner join on a pure OR of cross-side equalities
  * must plan as a union of equi-joins (no nested-loop/cartesian), with
  * EXACTLY the rows of the naive plan — including null-key and
  * duplicate-row multiplicity semantics, the two places an OR-expansion
  * can silently go wrong. */
class OrJoinRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // nulls in both key columns, plus a duplicated left row (id 6 twice):
  // pair semantics must survive three-valued logic and preserve multiplicity
  private lazy val left = Seq(
    (1L, Option("a"), Option(10L)),
    (2L, Option("b"), None),
    (3L, None, Option(30L)),
    (4L, Option("d"), Option(40L)),
    (6L, Option("f"), Option(60L)),
    (6L, Option("f"), Option(60L))
  ).toDF("lid", "lk1", "lk2")
  private lazy val right = Seq(
    (101L, Option("a"), Option(99L)),  // matches lid 1 on k1 only
    (102L, None, Option(30L)),         // matches lid 3 on k2; k1 null
    (103L, Option("d"), Option(40L)),  // matches lid 4 on BOTH disjuncts
    (104L, Option("zz"), None),
    (105L, Option("f"), Option(60L))   // matches duplicated lid 6 twice
  ).toDF("rid", "rk1", "rk2")

  private def orJoin(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, l("lk1") === r("rk1") || l("lk2") === r("rk2"))
      .select("lid", "rid")

  /** The semantic ground truth, computed in plain Scala (no Spark plan). */
  private def expectedPairs: Seq[(Long, Long)] = {
    val ls = left.collect().map(r => (r.getLong(0), Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val rs = right.collect().map(r => (r.getLong(0), Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    (for {
      (lid, lk1, lk2) <- ls
      (rid, rk1, rk2) <- rs
      if (lk1.isDefined && lk1 == rk1) || (lk2.isDefined && lk2 == rk2)
    } yield (lid, rid)).toSeq.sorted
  }

  test("rewritten OR-join: exact rows (nulls, multiplicity) and no nested-loop plan") {
    val df = orJoin(left, right)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"OR-join should have been expanded to equi-joins:\n$plan")
    assert(plan.contains("Union"), s"expected a union of per-disjunct joins:\n$plan")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == expectedPairs)
    // the both-disjuncts pair (4,103) appears ONCE; the duplicated left row
    // contributes its pair TWICE — disjoint pieces preserve multiplicity
    assert(got.count(_ == (4L, 103L)) == 1)
    assert(got.count(_ == (6L, 105L)) == 2)
  }

  test("cap conf disables the rewrite; rows unchanged") {
    spark.conf.set("graft.rewrite.orJoinMaxDisjuncts", "1")
    try {
      val df = orJoin(left, right)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"),
        s"capped rule should leave the naive plan:\n$plan")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got == expectedPairs)
    } finally spark.conf.unset("graft.rewrite.orJoinMaxDisjuncts")
  }

  test("non-inner joins and single-sided disjuncts are left alone") {
    // left outer with OR condition: not rewritten (outer-join OR expansion
    // has different unmatched-row semantics — out of scope by design)
    val outer = left.join(right, left("lk1") === right("rk1") || left("lk2") === right("rk2"), "left")
    assert(outer.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    // a disjunct touching only one side is not a join key: declined
    val oneSided = left.join(right, left("lk1") === right("rk1") || left("lk2") > 0L)
    assert(!oneSided.queryExecution.executedPlan.toString.contains("Union"))
  }

  test("randomized equivalence: rewritten join == cross-filter ground truth") {
    // 12 deterministic trials over random tables with nulls, duplicate rows,
    // and 2-4 disjuncts — the adversarial surface for three-valued logic and
    // multiplicity, beyond the hand-picked cases above
    val rng = new scala.util.Random(20260813L)
    for (trial <- 1 to 12) {
      val nd = 2 + rng.nextInt(3) // disjunct count: 2..4 key columns
      def randRows(n: Int): Seq[(Long, Seq[Option[Long]])] =
        (0 until n).map { i =>
          (i.toLong, Seq.fill(nd)(if (rng.nextInt(5) == 0) None
            else Some(rng.nextInt(6).toLong)))
        } ++ (0 until n / 5).map { i => // duplicated rows
          (i.toLong, Seq.fill(nd)(Some(rng.nextInt(6).toLong)))
        }
      val lrows = randRows(25)
      val rrows = randRows(18)
      def toDf(rows: Seq[(Long, Seq[Option[Long]])], p: String) = {
        val cols = (0 until nd).map(k => s"$p$k")
        val data = rows.map { case (id, ks) =>
          Row.fromSeq(id +: ks.map(_.map(Long.box).orNull))
        }
        val schema = org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.types.StructField(s"${p}id", org.apache.spark.sql.types.LongType, nullable = false) +:
            cols.map(c => org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.LongType, nullable = true)))
        spark.createDataFrame(spark.sparkContext.parallelize(data, 3), schema)
      }
      val l = toDf(lrows, "l")
      val r = toDf(rrows, "r")
      val cond = (0 until nd).map(k => l(s"l$k") === r(s"r$k")).reduce(_ || _)
      val df = l.join(r, cond).select("lid", "rid")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"trial $trial (nd=$nd) not rewritten:\n$plan")
      val got = df.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
      val expect = (for {
        (lid, lks) <- lrows
        (rid, rks) <- rrows
        if lks.zip(rks).exists { case (a, b) => a.isDefined && a == b }
      } yield (lid, rid)).sorted
      assert(got == expect, s"trial $trial (nd=$nd): ${got.size} vs ${expect.size} pairs")
    }
  }

  test("rewrite fires through SQL with the banded-signature idiom") {
    // the SURVEY §7.4 shape: per-band signature equality, OR'd — on the
    // engine's own lsh_min arrays, end to end through SQL
    val docs = Seq((1L, "princeton university press"), (2L, "princeton university library"),
      (3L, "completely different text here"), (4L, "princeton university presses"))
      .toDF("id", "text")
    docs.createOrReplaceTempView("orj_docs")
    val df = spark.sql("""
      SELECT a.id AS id_a, b.id AS id_b
      FROM orj_docs a JOIN orj_docs b
        ON (lsh_min(a.text, 3, 4, 2, 42)[0] = lsh_min(b.text, 3, 4, 2, 42)[0]
         OR lsh_min(a.text, 3, 4, 2, 42)[1] = lsh_min(b.text, 3, 4, 2, 42)[1]
         OR lsh_min(a.text, 3, 4, 2, 42)[2] = lsh_min(b.text, 3, 4, 2, 42)[2]
         OR lsh_min(a.text, 3, 4, 2, 42)[3] = lsh_min(b.text, 3, 4, 2, 42)[3])
      WHERE a.id < b.id""")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"banded OR-join should be equi-joins:\n$plan")
    // ground truth from the signatures themselves
    val sigs = spark.sql("SELECT id, lsh_min(text, 3, 4, 2, 42) AS sig FROM orj_docs")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val expect = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if sigs(a).zip(sigs(b)).exists { case (x, y) => x == y }
    } yield (a, b)).toSeq.sorted
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == expect)
    assert(got.contains((1L, 2L)) || got.contains((1L, 4L))) // near-dups really collide
  }
}
