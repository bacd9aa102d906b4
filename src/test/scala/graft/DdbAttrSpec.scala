package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.DdbAttr

/** AttributeValue codec: roundtrip across all tags, inference, evolution
  * (SURVEY §5.2.3a/c; wire format per FIXTURES.md §3.1). */
class DdbAttrSpec extends SparkSuite {
  import scala.jdk.CollectionConverters._

  test("decode handles every AttributeValue tag from raw export lines") {
    val lines = Seq(
      """{"Item":{"PK":{"S":"CUST#42"},"SK":{"S":"ORDER#1001"},
        |"total":{"N":"199.95"},"paid":{"BOOL":true},"note":{"NULL":true},
        |"tags":{"SS":["prio","eu"]},"qtys":{"NS":["1","3"]},
        |"payload":{"B":"aGVsbG8="},
        |"address":{"M":{"city":{"S":"Cork"},"zip":{"N":"0042"}}},
        |"lines":{"L":[{"S":"a"},{"S":"b"}]}}}""".stripMargin.replaceAll("\n", ""),
      """{"Item":{"PK":{"S":"CUST#43"},"SK":{"S":"ORDER#1002"},
        |"total":{"N":"12345678901234567890123456789012345678"}}}"""
        .stripMargin.replaceAll("\n", ""))
    val raw = spark.createDataFrame(
      lines.map(Row(_)).asJava, StructType(Seq(StructField("json", StringType))))
    val target = StructType(Seq(
      StructField("PK", StringType), StructField("SK", StringType),
      StructField("total", DecimalType(38, 0)),
      StructField("paid", BooleanType),
      StructField("note", StringType),
      StructField("tags", ArrayType(StringType)),
      StructField("qtys", ArrayType(LongType)),
      StructField("payload", BinaryType),
      StructField("address", StructType(Seq(
        StructField("city", StringType), StructField("zip", StringType)))),
      StructField("lines", ArrayType(StringType))))
    val out = DdbAttr.decode(raw, target).orderBy("PK").collect()
    assert(out.length == 2)
    val r = out(0)
    assert(r.getAs[String]("PK") == "CUST#42")
    assert(r.getAs[java.math.BigDecimal]("total").intValue == 200) // 199.95 rounds at scale 0
    assert(r.getAs[Boolean]("paid"))
    assert(r.getAs[Any]("note") == null) // NULL tag -> no S value
    assert(r.getSeq[String](r.fieldIndex("tags")).toList == List("prio", "eu"))
    assert(r.getSeq[Long](r.fieldIndex("qtys")).toList == List(1L, 3L))
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello")
    assert(r.getAs[Row]("address").getAs[String]("city") == "Cork")
    assert(r.getSeq[String](r.fieldIndex("lines")).toList == List("a", "b"))
    // 38-digit N survives as exact decimal (SURVEY §7.5.1)
    assert(out(1).getAs[java.math.BigDecimal]("total").toString
      == "12345678901234567890123456789012345678")
  }

  test("encode->decode roundtrip preserves typed rows (orders)") {
    val orders = Tables.load(spark, sfDir, "orders")
    val raw = orders.select(DdbAttr.encodeLine(orders.schema).as("json"))
    val back = DdbAttr.decode(raw, orders.schema)
    assert(back.schema.fieldNames.toSeq == orders.schema.fieldNames.toSeq)
    assert(back.schema.fields.map(_.dataType).toSeq ==
      orders.schema.fields.map(_.dataType).toSeq)
    assert(back.exceptAll(orders).count() == 0)
    assert(orders.exceptAll(back).count() == 0)
  }

  test("inferSchema distinguishes integer from fractional N attributes") {
    val cust = Tables.load(spark, sfDir, "customer")
    val raw = cust.select(DdbAttr.encodeLine(cust.schema).as("json"))
    val inferred = DdbAttr.inferSchema(spark, raw)
    val byName = inferred.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("c_custkey") == LongType)
    assert(byName("c_nationkey") == LongType)
    assert(byName("c_acctbal") == DoubleType)
    assert(byName("c_name") == StringType)
  }

  test("mixed-type lists infer het-marked and decode losslessly to AV JSON leaves") {
    val lines = Seq(
      """{"Item":{"pk":{"S":"a"},"mix":{"L":[{"S":"x"},{"N":"1.5"},{"BOOL":true},{"M":{"k":{"N":"2"}}}]},"nums":{"L":[{"N":"1"},{"N":"2.5"}]}}}""",
      """{"Item":{"pk":{"S":"b"},"mix":{"L":[{"NULL":true},{"L":[{"S":"deep"}]}]},"nums":{"L":[{"N":"7"}]}}}""")
    val raw = spark.createDataFrame(
      lines.map(Row(_)).asJava, StructType(Seq(StructField("json", StringType))))
    val inferred = DdbAttr.inferSchema(spark, raw)
    // mixed list → het-marked string array; homogeneous N list → typed doubles
    assert(inferred("mix").dataType == ArrayType(StringType))
    assert(inferred("mix").metadata.contains(DdbAttr.HetKey))
    assert(inferred("nums").dataType == ArrayType(DoubleType))
    val out = DdbAttr.decode(raw, inferred).orderBy("pk").collect()
    // every element survives as its AttributeValue JSON — no nulled misfits
    assert(out(0).getSeq[String](out(0).fieldIndex("mix")).toList == List(
      """{"S":"x"}""", """{"N":"1.5"}""", """{"BOOL":true}""",
      """{"M":{"k":{"N":"2"}}}"""))
    assert(out(1).getSeq[String](out(1).fieldIndex("mix")).toList == List(
      """{"NULL":true}""", """{"L":[{"S":"deep"}]}"""))
    assert(out(0).getSeq[Double](out(0).fieldIndex("nums")).toList == List(1.0, 2.5))
    // encode ∘ decode is the identity on the decoded form (wire-roundtrip)
    val typed = DdbAttr.decode(raw, inferred)
    val reencoded = typed.select(DdbAttr.encodeLine(inferred).as("json"))
    val back = DdbAttr.decode(reencoded, inferred)
    assert(back.exceptAll(typed).count() == 0 && typed.exceptAll(back).count() == 0)
  }

  test("mergeSchemas widens and appends; incompatible types are rejected") {
    val a = StructType(Seq(StructField("k", LongType), StructField("x", LongType)))
    val b = StructType(Seq(StructField("k", LongType), StructField("x", DoubleType),
      StructField("y", StringType)))
    val m = DdbAttr.mergeSchemas(a, b)
    assert(m.fieldNames.toSeq == Seq("k", "x", "y"))
    assert(m("x").dataType == DoubleType)
    val bad = StructType(Seq(StructField("k", BooleanType)))
    intercept[IllegalArgumentException](DdbAttr.mergeSchemas(a, bad))
  }

  test("mergeSchemas commutes on disjoint attribute sets (SURVEY §5.2.3c)") {
    val rnd = new scala.util.Random(11)
    val types = Seq(LongType, DoubleType, StringType, BooleanType)
    for (_ <- 0 until 20) {
      val names = rnd.shuffle(('a' to 'p').map(c => s"f_$c")).distinct
      val (an, bn) = names.splitAt(rnd.nextInt(names.size))
      val key = StructField("k", LongType)
      val a = StructType(key +: an.map(n => StructField(n, types(rnd.nextInt(4)))))
      val b = StructType(key +: bn.map(n => StructField(n, types(rnd.nextInt(4)))))
      val ab = DdbAttr.mergeSchemas(a, b)
      val ba = DdbAttr.mergeSchemas(b, a)
      // same field set and same types, independent of merge order
      assert(ab.fields.map(f => f.name -> f.dataType).toMap ==
        ba.fields.map(f => f.name -> f.dataType).toMap)
    }
  }

  test("decode validates key columns like the reference's synth-time checks") {
    val orders = Tables.load(spark, sfDir, "orders")
    val raw = orders.select(DdbAttr.encodeLine(orders.schema).as("json"))
    val e = intercept[IllegalArgumentException](
      DdbAttr.decode(raw, orders.schema, keyColumns = Seq("PK")))
    assert(e.getMessage.contains("key column"))
  }
}
