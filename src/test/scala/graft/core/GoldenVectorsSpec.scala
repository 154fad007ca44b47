package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Every golden vector embedded in the reference's own test suite
  * (/root/reference/test/sql/lsh/&#42;.test), asserted against the pure-Scala
  * kernels with no SparkSession — pins FxHash64 / PCG32 / ChaCha12 /
  * uniform / ziggurat bit-exactness (SURVEY.md §5.3.1).
  * u64 golden values are written as unsigned strings and parsed, since they
  * exceed Long.MaxValue.
  */
class GoldenVectorsSpec extends AnyFunSuite {

  private def u64(s: String): Long = java.lang.Long.parseUnsignedLong(s)
  private def u64s(ss: String*): Array[Long] = ss.map(u64).toArray

  private def minText(s: String, w: Int, bands: Int, size: Int, seed: Long): Array[Long] =
    MinHashFamily(bands, size, seed).hash(Shingles.fromText(s, w))

  private def minList(ss: Seq[String], bands: Int, size: Int, seed: Long): Array[Long] =
    MinHashFamily(bands, size, seed).hash(Shingles.fromShingles(ss.iterator))

  // --- lsh_min text overload (lsh_min.test:17-54) ---
  test("lsh_min('Princeton University', 2, 3, 2, 123)") {
    assert(minText("Princeton University", 2, 3, 2, 123).toSeq ==
      u64s("6891191098855684803", "6484452798683863108", "14488917645112899542").toSeq)
  }

  private val nameGoldens = Seq(
    "Alice Johnson" -> Seq("13571929851950895096", "9380027513982184887", "2973452616913389687"),
    "Robert Smith" -> Seq("8779492002049334510", "6213046290947405081", "13321761559668221936"),
    "Charlotte Brown" -> Seq("17147317566672094549", "9868884775472345505", "9544039307031965287"),
    "David Martinez" -> Seq("8205471107123956470", "3856457550471365223", "160978381860159594"),
    "Emily Davis" -> Seq("5031590273592478399", "2643794611755346220", "10496886524478706543"),
    "Michael Wilson" -> Seq("7351019434982270461", "11969544284460938578", "1096653296545732983"),
    "Sophia Taylor" -> Seq("947309311728102588", "6485027977500841069", "11465726828575944543"),
    "James Anderson" -> Seq("6511242524203601686", "5368660891928216176", "4531328875985401258"),
    "Olivia Thomas" -> Seq("6134578107120707744", "8471287122008225606", "13561556383590060017"),
    "Benjamin Lee" -> Seq("7926739398273580158", "2501438919389423193", "17085734390799214704"))

  for ((name, golden) <- nameGoldens)
    test(s"lsh_min('$name', 2, 3, 2, 123)") {
      assert(minText(name, 2, 3, 2, 123).toSeq == golden.map(u64))
    }

  // --- lsh_min shingle-list overload (lsh_min.test:56-75) ---
  test("lsh_min(shingle list 1, 3, 2, 123)") {
    assert(minList(Seq("Today is", "is such", "such a", "a beautiful", "beautiful day"), 3, 2, 123).toSeq ==
      u64s("9974840119851185478", "4711155484753061995", "16211519798383806619").toSeq)
  }
  test("lsh_min(shingle list 2, 3, 2, 123)") {
    assert(minList(Seq("Jane was", "was happy", "happy to", "to hear", "hear the", "the news"), 3, 2, 123).toSeq ==
      u64s("2354814969659523670", "7221458756809834639", "17094615994155466934").toSeq)
  }

  // --- lsh_min32 = low-32 truncation (lsh_min32.test, lib.rs:23-27) ---
  test("lsh_min32 equals low 32 bits of lsh_min") {
    val g32 = Seq(379615939L, 3696678980L, 685242326L)
    val h = minText("Princeton University", 2, 3, 2, 123)
    assert(h.map(_ & 0xffffffffL).toSeq == g32)
    val names32 = Seq(
      Seq(235769848L, 2454482359L, 2878605431L),
      Seq(3397950702L, 4177163545L, 2323277808L),
      Seq(4232987989L, 1800024481L, 3925962343L),
      Seq(1524288246L, 3006792295L, 1128972394L),
      Seq(13257407L, 616884524L, 3676525423L),
      Seq(2401003005L, 4271502674L, 3864959351L),
      Seq(3388550332L, 493376621L, 1961848671L),
      Seq(3851603734L, 115982960L, 3449058730L),
      Seq(970025120L, 832845638L, 3176206321L),
      Seq(758168702L, 2844468825L, 2185439344L))
    for (((n, _), g) <- nameGoldens.zip(names32))
      assert(minText(n, 2, 3, 2, 123).map(_ & 0xffffffffL).toSeq == g, s"for $n")
    assert(minList(Seq("Today is", "is such", "such a", "a beautiful", "beautiful day"), 3, 2, 123)
      .map(_ & 0xffffffffL).toSeq == Seq(1930130758L, 3730237547L, 1138821275L))
    assert(minList(Seq("Jane was", "was happy", "happy to", "to hear", "hear the", "the news"), 3, 2, 123)
      .map(_ & 0xffffffffL).toSeq == Seq(307495510L, 2009645199L, 4015587510L))
  }

  // --- empty / short input → all bands identical (SURVEY §2.2.4) ---
  test("empty string collides everywhere") {
    assert(minText("", 2, 3, 2, 123).toSeq == Seq.fill(3)(u64("15973479568771280466")))
    assert(minText("x", 2, 3, 2, 123).toSeq == Seq.fill(3)(u64("15973479568771280466")))
  }

  // --- lsh_euclidean (lsh_euclidean.test:17-42) ---
  private val vecGoldens = Seq(
    Array(1.1, 2.2, 3.3, 5.8, 3.9) -> Seq("4153593470791884295", "13333357882440433242"),
    Array(4.5, 5.5, 2.3, 1.8, 6.3) -> Seq("9539244981710099531", "8978554412800410753"),
    Array(7.3, 1.2, 9.6, 5.5, 7.8) -> Seq("3765229951789618540", "13117769235920535871"),
    Array(6.7, 4.5, 1.3, 0.6, 4.6) -> Seq("13333357882440433242", "2643848813970240984"))

  for (((v, golden), i) <- vecGoldens.zipWithIndex)
    test(s"lsh_euclidean(vec$i, 0.5, 2, 3, 123)") {
      assert(EuclideanFamily(0.5, 2, 3, 123, 5).hash(v).toSeq == golden.map(u64))
    }

  test("lsh_euclidean32 equals low 32 bits") {
    val g32 = Seq(Seq(1206820359L, 3590602330L), Seq(272766027L, 58459265L),
      Seq(773117292L, 2157396287L), Seq(3590602330L, 344503768L))
    for (((v, _), g) <- vecGoldens.zip(g32))
      assert(EuclideanFamily(0.5, 2, 3, 123, 5).hash(v).map(_ & 0xffffffffL).toSeq == g)
  }

  // --- lsh_jaccard (lsh_jaccard.test:17-51) ---
  test("lsh_jaccard goldens") {
    val cases = Seq(
      ("Princeton University", "Harvard University", 0.4),
      ("Charlotte Brown", "Charlene Browning", 0.5),
      ("David Martinez", "Davis Martin", 0.6),
      ("Olivia Thomas", "Olive Thomason", 0.5625),
      ("Emily Davis", "Laura Bennett", 0.0),
      ("Michael Wilson", "Mike Wilson", 0.4375),
      ("James Anderson", "Jamie Anders", 0.5),
      ("Benjamin Lee", "Christopher Grant", 0.0))
    for ((a, b, want) <- cases) {
      assert(Shingles.jaccardText(a, b, 2) == want, s"J($a, $b)")
      assert(Shingles.jaccardText(b, a, 2) == want, s"J($b, $a) symmetry")
    }
  }

  test("jaccard edge cases") {
    assert(Shingles.jaccardText("", "anything", 2) == 0.0)
    assert(Shingles.jaccardText("a", "ab", 2) == 0.0) // left shorter than width
    assert(Shingles.jaccardText("abc", "abc", 2) == 1.0)
  }

  // --- non-BMP text: code points, not UTF-16 units (SURVEY §7.5.2) ---
  test("surrogate pairs count as one shingle char") {
    // "😀😀x" = 3 code points → two bigram windows; must not split surrogates.
    val s = "😀😀x"
    assert(Shingles.codePoints(s).length == 3)
    assert(Shingles.fromText(s, 2).size == 2)
    assert(Shingles.jaccardText(s, s, 2) == 1.0)
  }
}
