package graft.sql

import graft.TestSpark
import org.apache.spark.sql.{AnalysisException, Row}
import org.scalatest.funsuite.AnyFunSuite

/** The reference's SQLLogicTest cases replayed through spark.sql — table
  * inputs with NULL rows, both lsh_min overloads, both widths, error cases
  * (SURVEY.md §5.3.2). Golden values from /root/reference/test/sql/lsh/.
  * u64 goldens appear as their Long bit patterns (SURVEY.md §1.2).
  */
class LshSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def u64(s: String): Long = java.lang.Long.parseUnsignedLong(s)

  test("cosine_sim via SQL: exact value, null propagation, length mismatch") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS s").collect()
    assert(math.abs(r.head.getDouble(0) - 1.0) < 1e-12)
    // orthogonal -> 0; null input -> null; mismatched lengths -> null
    assert(spark.sql("SELECT cosine_sim(array(1.0D, 0.0D), array(0.0D, 3.0D))")
      .head().getDouble(0) == 0.0)
    assert(spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D))")
      .head().isNullAt(0))
    assert(spark.sql("SELECT cosine_sim(array(1.0D), array(1.0D, 2.0D))")
      .head().isNullAt(0))
  }

  test("lsh_min scalar over SQL") {
    val rows = spark.sql("SELECT lsh_min('Princeton University', 2, 3, 2, 123) AS h").collect()
    assert(rows.head.getSeq[Long](0) == Seq(u64("6891191098855684803"),
      u64("6484452798683863108"), u64("14488917645112899542")))
  }

  test("lsh_min over a table with NULL rows") {
    import spark.implicits._
    val names = Seq(Some("Alice Johnson"), Some("Robert Smith"), None,
      Some("Charlotte Brown")).toDF("name")
    names.createOrReplaceTempView("temp_names")
    val got = spark.sql("SELECT lsh_min(name, 2, 3, 2, 123) AS hash FROM temp_names").collect()
    assert(got(0).getSeq[Long](0).head == u64("13571929851950895096"))
    assert(got(1).getSeq[Long](0).head == u64("8779492002049334510"))
    assert(got(2).isNullAt(0))
    assert(got(3).getSeq[Long](0).head == u64("17147317566672094549"))
  }

  test("lsh_min shingle-list overload") {
    val got = spark.sql(
      "SELECT lsh_min(ARRAY('Today is', 'is such', 'such a', 'a beautiful', 'beautiful day'), 3, 2, 123) AS h")
      .collect()
    assert(got.head.getSeq[Long](0) == Seq(u64("9974840119851185478"),
      u64("4711155484753061995"), u64("16211519798383806619")))
  }

  test("lsh_min32 truncation via SQL") {
    val got = spark.sql("SELECT lsh_min32('Princeton University', 2, 3, 2, 123) AS h").collect()
    // u32 values stored as Int bit patterns
    assert(got.head.getSeq[Int](0).map(_.toLong & 0xffffffffL) ==
      Seq(379615939L, 3696678980L, 685242326L))
  }

  test("lsh_euclidean via SQL incl. NULL row") {
    import spark.implicits._
    Seq(Some(Array(1.1, 2.2, 3.3, 5.8, 3.9)), None, Some(Array(4.5, 5.5, 2.3, 1.8, 6.3)))
      .toDF("val").createOrReplaceTempView("temp_vals")
    val got = spark.sql("SELECT lsh_euclidean(val, 0.5, 2, 3, 123) AS h FROM temp_vals").collect()
    assert(got(0).getSeq[Long](0) == Seq(u64("4153593470791884295"), u64("13333357882440433242")))
    assert(got(1).isNullAt(0))
    assert(got(2).getSeq[Long](0) == Seq(u64("9539244981710099531"), u64("8978554412800410753")))
  }

  test("lsh_euclidean float arrays are implicitly cast") {
    import spark.implicits._
    Seq(Array(1.1f, 2.2f, 3.3f)).toDF("v").createOrReplaceTempView("temp_f")
    // Just verifies analysis passes and a 3-band list comes back.
    val got = spark.sql("SELECT lsh_euclidean(CAST(v AS ARRAY<DOUBLE>), 0.5, 4, 2, 7) AS h FROM temp_f").collect()
    assert(got.head.getSeq[Long](0).length == 4)
  }

  test("lsh_jaccard via SQL with NULLs") {
    import spark.implicits._
    Seq(("Charlotte Brown", "Charlene Browning"), ("Alice Johnson", null),
      (null, "Roberta Mills"), ("Michael Wilson", "Mike Wilson"))
      .toDF("a", "b").createOrReplaceTempView("temp_pairs")
    val got = spark.sql("SELECT lsh_jaccard(a, b, 2) AS s FROM temp_pairs").collect()
    assert(got(0).getDouble(0) == 0.5)
    assert(got(1).isNullAt(0))
    assert(got(2).isNullAt(0))
    assert(got(3).getDouble(0) == 0.4375)
  }

  test("unsupported first-argument type gives the reference's message") {
    // atomics implicitly cast to string (Spark superset); complex non-array
    // types get the reference's dispatch error (minhash.rs:166)
    val e = intercept[AnalysisException] {
      spark.sql("SELECT lsh_min(map('a', 'b'), 2, 3, 2, 123)").collect()
    }
    assert(e.getMessage.contains("Unsupported argument type for MinHash"))
    assert(spark.sql("SELECT size(lsh_min(42, 2, 1, 1, 1)) n").collect().head.getInt(0) == 1)
  }

  test("non-constant parameter is rejected at analysis time") {
    import spark.implicits._
    Seq(("ab", 1L)).toDF("s", "n").createOrReplaceTempView("temp_nc")
    val e = intercept[AnalysisException] {
      spark.sql("SELECT lsh_min(s, n, 3, 2, 123) FROM temp_nc").collect()
    }
    assert(e.getMessage.contains("must be a constant value, not vary per row"))
  }

  test("mixed euclidean array lengths error") {
    import spark.implicits._
    val df = Seq(Array(1.0, 2.0), Array(1.0, 2.0, 3.0)).toDF("v")
    df.createOrReplaceTempView("temp_mixed")
    val e = intercept[Exception] {
      spark.sql("SELECT lsh_euclidean(v, 0.5, 1, 1, 1) FROM temp_mixed").collect()
    }
    assert(e.getMessage.contains("All input arrays must have the same length") ||
      e.getCause != null && e.getCause.getMessage.contains("All input arrays must have the same length"))
  }

  test("DataFrame API parity") {
    import spark.implicits._
    import graft.functions._
    val df = Seq("Princeton University").toDF("s")
    val got = df.select(lsh_min($"s", 2, 3, 2, 123).as("h")).collect()
    assert(got.head.getSeq[Long](0).head == u64("6891191098855684803"))
    val j = df.select(lsh_jaccard($"s", $"s", 2).as("j")).collect()
    assert(j.head.getDouble(0) == 1.0)
  }

  test("word-bigram shingle build is ANSI-safe on 0/1-word docs") {
    import spark.implicits._
    // sequence(1, size-1) would DESCEND ([1, 0]) for a single-word doc and
    // element_at(words, 0) then throws under ANSI; the filter(sequence(...))
    // shape used by the lsh_min_shingles query must instead degrade to the
    // empty shingle list (SURVEY §2.2.4 empty-shingle semantics)
    Seq((1L, "one"), (2L, ""), (3L, "two words"), (4L, "a b c"), (5L, "x  y"))
      .toDF("doc_id", "text").createOrReplaceTempView("temp_tiny_docs")
    // the exact shingle-building shape lsh_min_shingles uses in SparkEntry:
    // zip_with over a pre-split words array (NO outer reference inside any
    // lambda — CollapseProject would inline split() per element), trailing
    // NULL pair sliced off
    val got = spark.sql("""
      SELECT doc_id,
             lsh_min(slice(zip_with(words, slice(words, 2, greatest(size(words) - 1, 0)),
                                    (a, b) -> concat(a, ' ', b)),
                           1, greatest(size(words) - 1, 0)),
                     3, 2, 123) AS hash
      FROM (SELECT doc_id, split(text, ' ') AS words FROM temp_tiny_docs)
      ORDER BY doc_id""").collect()
    assert(got.length == 5)
    // 0/1-word docs share the empty-shingle hash; multi-word docs differ
    assert(got(0).getSeq[Long](1) == got(1).getSeq[Long](1))
    assert(got(2).getSeq[Long](1) != got(0).getSeq[Long](1))
    // 2-word doc: exactly the one bigram "two words"
    assert(got(2).getSeq[Long](1) ==
      spark.sql("SELECT lsh_min(ARRAY('two words'), 3, 2, 123) h").collect().head.getSeq[Long](0))
    // every row matches the kernel computed on Java-split word bigrams
    // (split keeps trailing/interior empty tokens: limit -1 semantics)
    val fam = graft.core.MinHashFamily(3, 2, 123L)
    val texts = Map(1L -> "one", 2L -> "", 3L -> "two words", 4L -> "a b c", 5L -> "x  y")
    got.foreach { r =>
      val words = texts(r.getLong(0)).split(" ", -1)
      val bigrams = (0 until words.length - 1).map(i => words(i) + " " + words(i + 1))
      val expected = fam.hash(graft.core.Shingles.fromShingles(bigrams.iterator)).toSeq
      assert(r.getSeq[Long](1) == expected, s"doc ${r.getLong(0)}")
    }
  }

  test("banded LSH blocking join (README.md:150-164 pattern)") {
    import spark.implicits._
    val a = Seq((1L, "Charlotte Brown"), (2L, "Emily Davis"), (3L, "Michael Wilson"))
      .toDF("id", "col")
    val b = Seq((10L, "Charlene Browning"), (11L, "Mike Wilson"), (12L, "Laura Bennett"))
      .toDF("id", "col")
    a.createOrReplaceTempView("A")
    b.createOrReplaceTempView("B")
    val got = spark.sql(
      """SELECT A.id AS ida, B.id AS idb
        |FROM A INNER JOIN B
        |ON element_at(lsh_min(A.col, 2, 1, 3, 1), 1) = element_at(lsh_min(B.col, 2, 1, 3, 1), 1)
        |WHERE lsh_jaccard(A.col, B.col, 2) > 0.3""".stripMargin).collect()
    // Candidate pairs must be a subset of truly-similar pairs; exact content
    // depends on band collisions, so assert shape + filter correctness only.
    got.foreach { r => assert(r.getLong(0) > 0 && r.getLong(1) >= 10) }
  }

  test("levenshtein_cp counts CODE POINTS, not UTF-16 units or bytes") {
    def d(a: String, b: String): Int =
      spark.sql(s"SELECT levenshtein_cp('$a', '$b')").head.getInt(0)
    assert(d("kitten", "sitting") == 3)
    // one accented char: byte semantics (DuckDB) would say 2
    assert(d("\u00e0", "a") == 1)
    // one astral char vs empty: a UTF-16-unit count would say 2
    assert(d("\ud83d\ude00", "") == 1)
    assert(spark.sql("SELECT levenshtein_cp(NULL, 'x')").head.isNullAt(0))
    // Spark 4's builtin agrees on these cases (measured: it counts code
    // points too); the expression exists to PIN the unit the verifier
    // means independently of either engine's builtin — DuckDB's counts
    // BYTES, and the unicode gate would catch any drift back to that
    assert(spark.sql("SELECT levenshtein('\ud83d\ude00', '')")
      .head.getInt(0) == 1)
  }
}
