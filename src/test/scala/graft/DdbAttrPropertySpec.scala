package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.model.DdbAttr

/** Property-based AttributeValue roundtrip (SURVEY §5.2.3a): random typed
  * rows → encode to export JSON → decode → identical rows. Exercises nulls,
  * empty strings/arrays, negative and high-precision numbers, unicode, and
  * nested structs. */
class DdbAttrPropertySpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("pk", StringType),
    StructField("n_long", LongType),
    StructField("n_dec", DecimalType(38, 6)),
    StructField("flag", BooleanType),
    StructField("blob", BinaryType),
    StructField("tags", ArrayType(StringType)),
    StructField("nested", StructType(Seq(
      StructField("city", StringType), StructField("zip", LongType))))))

  private val genString = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(20)),
    Gen.const(""),
    Gen.oneOf("héllo wörld", "日本語", "a\"quote\\back", "tab\tnl\n", "☃"))

  private val genRow: Gen[Row] = for {
    pk <- Gen.alphaNumStr.map(s => "PK#" + s.take(10))
    nLongV <- Gen.oneOf(Gen.long, Gen.const(0L), Gen.const(Long.MinValue + 1))
    dec <- Gen.chooseNum(-999999999L, 999999999L)
      .map(v => new java.math.BigDecimal(v).movePointLeft(6))
    decOrNull <- Gen.oneOf(Gen.const(null), Gen.const(dec))
    flag <- Gen.oneOf(true, false)
    blob <- Gen.listOfN(8, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
    blobOrNull <- Gen.oneOf(Gen.const(null), Gen.const(blob))
    tags <- Gen.oneOf(
      Gen.const(null),
      Gen.listOfN(3, genString).map(l => l: Seq[String]),
      Gen.const(Seq.empty[String]))
    city <- genString
    zip <- Gen.chooseNum(0L, 99999L)
    nestedOrNull <- Gen.oneOf(Gen.const(null), Gen.const(Row(city, zip)))
  } yield Row(pk, nLongV, decOrNull, flag, blobOrNull, tags, nestedOrNull)

  test("property: encode->decode roundtrip is the identity on typed rows") {
    import scala.jdk.CollectionConverters._
    val prop = Prop.forAll(Gen.listOfN(12, genRow)) { rows =>
      val df = spark.createDataFrame(rows.asJava, schema)
      val raw = df.select(DdbAttr.encodeLine(schema).as("json"))
      val back = DdbAttr.decode(raw, schema)
      back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }

  test("property: inference never narrows — decode with inferred schema keeps all attributes") {
    import scala.jdk.CollectionConverters._
    val prop = Prop.forAll(Gen.listOfN(8, genRow)) { rows =>
      val df = spark.createDataFrame(rows.asJava, schema)
      val raw = df.select(DdbAttr.encodeLine(schema).as("json"))
      val inferred = DdbAttr.inferSchema(spark, raw)
      // every source attribute that had any non-null value must be inferred
      val present = schema.fieldNames.filter(f => df.filter(df(f).isNotNull).count() > 0)
      present.forall(inferred.fieldNames.contains) &&
        DdbAttr.decode(raw, inferred).count() == rows.size
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }
}
