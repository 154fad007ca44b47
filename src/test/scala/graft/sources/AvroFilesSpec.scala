package graft.sources

import graft.TestSpark
import org.apache.avro.Schema
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class AvroFilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val tmp = s"${sys.props("java.io.tmpdir")}/graft_avro_spec"

  test("full type surface round-trips: atoms, nullables, binary, arrays") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("i", IntegerType, nullable = true),
      StructField("d", DoubleType, nullable = true),
      StructField("f", FloatType, nullable = true),
      StructField("b", BooleanType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("bin", BinaryType, nullable = true),
      StructField("emb", ArrayType(DoubleType, containsNull = false), nullable = true),
      StructField("tags", ArrayType(StringType, containsNull = true), nullable = true)))
    val rows = Seq(
      Row(1L, 7, 2.5, 1.25f, true, "plain", Array[Byte](1, 2, 3),
        Seq(0.1, -0.2, 3.0), Seq("a", null, "c")),
      // hostile string content + empty containers
      Row(2L, null, null, null, null, "q\"uo,te\nnew\tline",
        Array.empty[Byte], Seq.empty[Double], Seq.empty[String]),
      // all-null optionals
      Row(3L, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    AvroFiles.write(df, tmp)
    val back = AvroFiles.read(spark, tmp, schema)
      .orderBy("id").collect()
    val want = df.orderBy("id").collect()
    assert(back.length == want.length)
    back.zip(want).foreach { case (g, w) =>
      // binary needs element compare (Array[Byte] equals is by reference)
      assert(g.getLong(0) == w.getLong(0))
      (1 until g.length).foreach { i =>
        (g.get(i), w.get(i)) match {
          case (a: Array[Byte], b: Array[Byte]) => assert(a.toSeq == b.toSeq, s"field $i")
          case (a, b) => assert(a == b, s"field $i of id ${g.getLong(0)}")
        }
      }
    }
  }

  test("write is one container file per partition; read re-parallelizes") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id").repartition(3)
    AvroFiles.write(df, s"$tmp-parts")
    val files = new java.io.File(s"$tmp-parts").listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 3, files.map(_.getName).mkString(","))
    val back = AvroFiles.read(spark, s"$tmp-parts",
      StructType(Seq(StructField("id", LongType, nullable = false))))
    assert(back.rdd.getNumPartitions >= 3) // sync-marker splits never reduce below file count
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      == (0L until 1000L).sum)
  }

  test("nullable fields become union(null, T) with null default") {
    val s = AvroFiles.avroSchemaFor(StructType(Seq(
      StructField("req", LongType, nullable = false),
      StructField("opt", StringType, nullable = true))))
    assert(s.getField("req").schema().getType == Schema.Type.LONG)
    val opt = s.getField("opt").schema()
    assert(opt.getType == Schema.Type.UNION &&
      opt.getTypes.get(0).getType == Schema.Type.NULL &&
      opt.getTypes.get(1).getType == Schema.Type.STRING)
    assert(s.getField("opt").hasDefaultValue)
    // unsupported types fail loud, not silently coerced
    intercept[IllegalArgumentException] {
      AvroFiles.avroSchemaFor(StructType(Seq(
        StructField("m", MapType(StringType, LongType), nullable = true))))
    }
  }
}
