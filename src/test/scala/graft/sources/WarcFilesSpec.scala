package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WarcFilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("parseWarc: framing is Content-Length-authoritative, offsets recorded") {
    // the adversarial payload: contains the record magic AND a blank
    // line — only byte-exact Content-Length framing survives it
    val evil = "WARC/1.0\r\n\r\nnot a record".getBytes("UTF-8")
    val multi = "日本語テキスト".getBytes("UTF-8") // byte length != char length
    val tape = WarcFiles.buildWarc(Seq(
      (1L, "https://a.example/x", evil),
      (2L, "https://b.example/y", multi)))
    val rows = WarcFiles.parseWarc("t.warc", tape)
    assert(rows.length == 2)
    assert(rows.head.getLong(1) == 0L, "first record at offset 0")
    assert(rows(1).getLong(1) > 0L)
    assert(rows.head.getAs[Array[Byte]](7).sameElements(evil),
      "payload containing record magic must round-trip whole")
    assert(rows(1).getAs[Array[Byte]](7).sameElements(multi))
    assert(rows.map(_.getString(2)).forall(_ == "resource"))
    assert(rows.map(_.getString(4)) == Seq("https://a.example/x", "https://b.example/y"))
  }

  test("parseWarc: truncated and malformed tapes fail loudly, naming the offset") {
    val good = WarcFiles.buildWarc(Seq((1L, "u", "abc".getBytes("UTF-8"))))
    val truncated = good.take(good.length - 8) // cut into the payload/sep
    val e = intercept[IllegalArgumentException](
      WarcFiles.parseWarc("bad.warc", truncated))
    assert(e.getMessage.contains("bad.warc"))
    val noMagic = "HELLO/1.0\r\n\r\n".getBytes("UTF-8")
    val e2 = intercept[IllegalArgumentException](
      WarcFiles.parseWarc("nm.warc", noMagic))
    assert(e2.getMessage.contains("WARC/"))
    // a Content-Length past 2^32 must fail LOUDLY, not wrap Int into a
    // small positive slice that misframes the rest of the tape
    val huge = ("WARC/1.0\r\nContent-Length: 4294967306\r\n\r\n" +
      "0123456789rest").getBytes("UTF-8")
    val e3 = intercept[IllegalArgumentException](
      WarcFiles.parseWarc("huge.warc", huge))
    assert(e3.getMessage.contains("4294967306"),
      s"wrap must surface the declared length: ${e3.getMessage}")
  }

  test("read: distributed parse over a 2-file tape; httpBody strips envelopes") {
    val base = java.nio.file.Files.createTempDirectory("warc_spec")
    val httpBlock = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<p>body</p>").getBytes("UTF-8")
    java.nio.file.Files.write(base.resolve("a.warc"),
      WarcFiles.buildWarc(Seq((1L, "u1", "plain".getBytes("UTF-8")))))
    java.nio.file.Files.write(base.resolve("b.warc"),
      WarcFiles.buildWarc(Seq((2L, "u2", httpBlock))))
    val got = WarcFiles.read(spark, s"$base/*.warc")
      .withColumn("body", WarcFiles.httpBody(col("content")))
      .select("target_uri", "body").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("u1") == "plain", "no envelope: block passes through whole")
    assert(got("u2") == "<p>body</p>", "envelope stripped at the first CRLFCRLF")
  }
}
