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

  test("property: 38-digit N values roundtrip through infer+decode exactly") {
    import scala.jdk.CollectionConverters._
    val decSchema = StructType(Seq(
      StructField("pk", LongType),
      StructField("big", DecimalType(38, 18))))
    val genBig: Gen[java.math.BigDecimal] = for {
      intPart <- Gen.listOfN(20, Gen.numChar).map(_.mkString)
      fracPart <- Gen.listOfN(18, Gen.numChar).map(_.mkString)
      neg <- Gen.oneOf("", "-")
    } yield new java.math.BigDecimal(s"$neg$intPart.$fracPart")
    val prop = Prop.forAll(Gen.listOfN(10, genBig)) { bigs =>
      val rows = bigs.zipWithIndex.map { case (b, i) => Row(i.toLong, b) }
      val df = spark.createDataFrame(rows.asJava, decSchema)
      val raw = df.select(DdbAttr.encodeLine(decSchema).as("json"))
      val inferred = DdbAttr.inferSchema(spark, raw)
      // inferred field order is alphabetical (spark.read.json); align it
      val back = DdbAttr.decode(raw, inferred).select("pk", "big")
      // inference must not have dropped below decimal precision
      inferred("big").dataType.isInstanceOf[DecimalType] &&
        back.exceptAll(df.select(df("pk"),
          df("big").cast(inferred("big").dataType))).count() == 0
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }

  test("nested fractional N infers Double, not a lossy Long") {
    import scala.jdk.CollectionConverters._
    val nestedSchema = StructType(Seq(
      StructField("pk", StringType),
      StructField("m", StructType(Seq(
        StructField("ratio", DoubleType), StructField("count", LongType))))))
    val rows = Seq(Row("a", Row(1.5, 7L)), Row("b", Row(0.25, 9L)))
    val df = spark.createDataFrame(rows.asJava, nestedSchema)
    val raw = df.select(DdbAttr.encodeLine(nestedSchema).as("json"))
    val inferred = DdbAttr.inferSchema(spark, raw)
    val m = inferred("m").dataType.asInstanceOf[StructType]
    assert(m("ratio").dataType == DoubleType, s"inferred $inferred")
    assert(m("count").dataType == LongType)
    // align column and nested-field order (inference alphabetizes both)
    val back = DdbAttr.decode(raw, inferred)
      .selectExpr("pk", "struct(m.ratio AS ratio, m.count AS count) AS m")
    assert(back.exceptAll(df).count() == 0)
  }

  test("property: heterogeneous lists roundtrip encode->decode->encode (SURVEY §7.5.2)") {
    import scala.jdk.CollectionConverters._
    // canonical AttributeValue JSON in hetAvSchema tag order, compact —
    // exactly the form to_json re-emits, so string equality is well-defined
    val genScalar: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.map(s => s"""{"S":"${s.take(8)}"}"""),
      Gen.chooseNum(-999999L, 999999L).map(n => s"""{"N":"$n"}"""),
      Gen.chooseNum(1L, 999L).map(n => s"""{"N":"$n.25"}"""),
      Gen.oneOf(true, false).map(b => s"""{"BOOL":$b}"""),
      Gen.const("""{"NULL":true}"""),
      Gen.listOfN(2, Gen.alphaNumStr.map(_.take(4)))
        .map(l => s"""{"SS":[${l.map(s => s""""$s"""").mkString(",")}]}"""))
    def genAv(depth: Int): Gen[String] =
      if (depth <= 0) genScalar
      else Gen.frequency(
        6 -> genScalar,
        2 -> Gen.listOfN(2, genAv(depth - 1))
          .map(es => s"""{"L":[${es.mkString(",")}]}"""),
        2 -> Gen.listOfN(2, genAv(depth - 1)).map(es =>
          s"""{"M":{${es.zipWithIndex.map { case (e, i) => s""""k$i":$e""" }.mkString(",")}}}"""))
    val hetField = StructField("mix", ArrayType(StringType), nullable = true,
      metadata = DdbAttr.HetMeta)
    val schema = StructType(Seq(StructField("pk", LongType), hetField))
    val genRow: Gen[(Long, Seq[String])] = for {
      n <- Gen.chooseNum(1, 4)
      els <- Gen.listOfN(n, genAv(2))
    } yield (0L, els)
    val prop = Prop.forAll(Gen.listOfN(6, genRow)) { rows0 =>
      val rows = rows0.zipWithIndex.map { case ((_, els), i) => Row(i.toLong, els) }
      val df = spark.createDataFrame(rows.asJava, schema)
      val encoded = df.select(DdbAttr.encodeLine(schema).as("json"))
      val back = DdbAttr.decode(encoded, schema)
      // decode(encode(x)) == x element-for-element, and a second encode
      // emits the identical wire line (canonical form is a fixed point)
      val reencoded = back.select(DdbAttr.encodeLine(schema).as("json"))
      back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0 &&
        reencoded.exceptAll(encoded).count() == 0
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
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
