package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DynamoDB AttributeValue codec (SURVEY.md §1.1, §2.A `scan_ddb_export`).
  *
  * The reference's initial load is a DynamoDB PITR export
  * (`dynamodb:ExportTableToPointInTime`,
  * reference src/dynamodb-zero-etl-s3tables.ts:135): newline-delimited JSON,
  * one `{"Item":{attr:{TAG:value}}}` per line with type tags
  * S/N/B/BOOL/NULL/M/L/SS/NS/BS. This module maps that wire form to and from
  * typed Spark columns as pure Catalyst column expressions — `from_json` /
  * `to_json` / `transform` — so decode stays inside whole-stage codegen
  * (SURVEY §7.4: no UDFs in the ingest hot path).
  *
  * Scale: the decode is a per-row projection, embarrassingly parallel; no
  * shuffle, no driver involvement beyond building the expression tree.
  */
object DdbAttr {

  /** Spark-side schema of one encoded AttributeValue holding `target`.
    * Only the tags reachable from `target` are materialized. */
  def avSchema(target: DataType): StructType = target match {
    case StringType => StructType(Seq(StructField("S", StringType)))
    case _: NumericType => StructType(Seq(StructField("N", StringType)))
    case BooleanType => StructType(Seq(StructField("BOOL", BooleanType)))
    case BinaryType => StructType(Seq(StructField("B", StringType)))
    case TimestampType | TimestampNTZType =>
      StructType(Seq(StructField("S", StringType)))
    case DateType => StructType(Seq(StructField("S", StringType)))
    case ArrayType(el, _) =>
      // lists arrive as L; string/number/binary sets may arrive as SS/NS/BS
      val setTag = el match {
        case StringType => Seq(StructField("SS", ArrayType(StringType)))
        case _: NumericType => Seq(StructField("NS", ArrayType(StringType)))
        case BinaryType => Seq(StructField("BS", ArrayType(StringType)))
        case _ => Nil
      }
      StructType(StructField("L", ArrayType(avSchema(el))) +: setTag)
    case st: StructType =>
      StructType(Seq(StructField("M", StructType(
        st.fields.map(f => StructField(f.name, avSchema(f.dataType)))))))
    case MapType(StringType, v, _) =>
      StructType(Seq(StructField("M", MapType(StringType, avSchema(v)))))
    case other =>
      throw new IllegalArgumentException(s"unsupported DynamoDB target type: $other")
  }

  /** Schema of a whole export line for a target row schema. */
  def itemSchema(target: StructType): StructType =
    StructType(Seq(StructField("Item", StructType(
      target.fields.map(f => StructField(f.name, avSchema(f.dataType)))))))

  /** Decode one AttributeValue struct column into `target`. */
  def decodeValue(av: Column, target: DataType): Column = target match {
    case StringType => av.getField("S")
    case n: NumericType => av.getField("N").cast(n)
    case BooleanType => av.getField("BOOL")
    case BinaryType => unbase64(av.getField("B"))
    case TimestampType => av.getField("S").cast(TimestampType)
    case TimestampNTZType => av.getField("S").cast(TimestampNTZType)
    case DateType => av.getField("S").cast(DateType)
    case ArrayType(el, _) =>
      val fromList = transform(av.getField("L"), e => decodeValue(e, el))
      val fromSet = el match {
        case StringType => Some(av.getField("SS"))
        case n: NumericType =>
          Some(transform(av.getField("NS"), e => e.cast(n)))
        case BinaryType =>
          Some(transform(av.getField("BS"), e => unbase64(e)))
        case _ => None
      }
      fromSet.map(s => coalesce(fromList, s)).getOrElse(fromList)
    case st: StructType =>
      val m = av.getField("M")
      when(m.isNotNull, struct(
        st.fields.map(f => decodeValue(m.getField(f.name), f.dataType).as(f.name)): _*))
    case MapType(StringType, v, _) =>
      transform_values(av.getField("M"), (_, value) => decodeValue(value, v))
    case other =>
      throw new IllegalArgumentException(s"unsupported DynamoDB target type: $other")
  }

  /** Parse a `Dataset`-of-JSON-lines export into typed columns.
    * `raw` must carry the export line in column `json`. Validation parity
    * with the reference's synth-time checks (src:58-66): requested key
    * columns must exist in the target schema. */
  def decode(raw: DataFrame, target: StructType, keyColumns: Seq[String] = Nil)
      : DataFrame = {
    keyColumns.foreach { k =>
      if (!target.fieldNames.contains(k))
        throw new IllegalArgumentException(
          s"key column '$k' missing from target schema ${target.simpleString}")
    }
    val parsed = raw.withColumn("_item",
      from_json(col("json"), itemSchema(target)).getField("Item"))
    parsed.select(target.fields.map(f =>
      decodeValue(col("_item").getField(f.name), f.dataType).as(f.name)): _*)
  }

  /** Encode typed columns as one AttributeValue struct (to_json-ready).
    * Null values become the `NULL` tag, like the wire format. */
  def encodeValue(c: Column, dt: DataType): Column = {
    val tagged: Seq[(String, Column)] = dt match {
      case StringType => Seq("S" -> c)
      case _: NumericType => Seq("N" -> c.cast(StringType))
      case BooleanType => Seq("BOOL" -> c)
      case BinaryType => Seq("B" -> base64(c))
      case TimestampType | TimestampNTZType =>
        Seq("S" -> date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      case DateType => Seq("S" -> c.cast(StringType))
      case ArrayType(el, _) =>
        Seq("L" -> transform(c, e => encodeValue(e, el)))
      case st: StructType =>
        Seq("M" -> when(c.isNotNull, struct(st.fields.map(f =>
          encodeValue(c.getField(f.name), f.dataType).as(f.name)): _*)))
      case MapType(StringType, v, _) =>
        Seq("M" -> transform_values(c, (_, value) => encodeValue(value, v)))
      case other =>
        throw new IllegalArgumentException(s"unsupported DynamoDB source type: $other")
    }
    // NULL tag carried alongside; to_json drops whichever side is null.
    val withNull = tagged :+ ("NULL" -> when(c.isNull, lit(true)))
    struct(withNull.map { case (t, v) =>
      (if (t == "NULL") v else when(c.isNotNull, v)).as(t)
    }: _*)
  }

  /** Encode a whole row as an export JSON line (fixture/roundtrip path). */
  def encodeLine(schema: StructType): Column =
    to_json(struct(struct(schema.fields.map(f =>
      encodeValue(col(f.name), f.dataType).as(f.name)): _*).as("Item")))

  // -------------------------------------------------------- schema inference

  /** Infer a relational schema from raw export lines — the
    * `glue:CreateTable` analog (reference src:112). Two passes, both
    * distributed: (1) `spark.read.json` discovers which tags each attribute
    * carries; (2) one aggregate decides integer-vs-decimal per `N` attribute
    * (SURVEY §7.5.1) by checking every value for a fractional part. */
  def inferSchema(spark: SparkSession, raw: DataFrame): StructType = {
    val avShaped = spark.read.json(raw.select(col("json").as("value"))
      .as(org.apache.spark.sql.Encoders.STRING))
    val itemType = avShaped.schema.fields.find(_.name == "Item").map(_.dataType) match {
      case Some(st: StructType) => st
      case _ => throw new IllegalArgumentException(
        "not a DynamoDB export: no Item object found")
    }
    // N attributes present anywhere in the top level
    val nAttrs = itemType.fields.collect {
      case StructField(name, st: StructType, _, _) if st.fieldNames.contains("N") => name
    }
    val fractional: Map[String, Boolean] =
      if (nAttrs.isEmpty) Map.empty
      else {
        val parsed = raw.select(from_json(col("json"),
          StructType(Seq(StructField("Item", StructType(nAttrs.map(a =>
            StructField(a, StructType(Seq(StructField("N", StringType)))))))))
        ).getField("Item").as("i"))
        val aggs = nAttrs.map(a => max(
          col("i").getField(a).getField("N").contains(".").cast("int")).as(a))
        val row = parsed.agg(aggs.head, aggs.tail: _*).head()
        nAttrs.zipWithIndex.map { case (a, i) =>
          a -> (!row.isNullAt(i) && row.getInt(i) == 1)
        }.toMap
      }
    def fieldType(name: String, av: StructType): DataType = {
      val tags = av.fieldNames.toSet
      if (tags.contains("S")) StringType
      else if (tags.contains("N"))
        if (fractional.getOrElse(name, false)) DoubleType else LongType
      else if (tags.contains("BOOL")) BooleanType
      else if (tags.contains("B")) BinaryType
      else if (tags.contains("SS")) ArrayType(StringType)
      else if (tags.contains("NS")) ArrayType(DoubleType)
      else if (tags.contains("BS")) ArrayType(BinaryType)
      else if (tags.contains("M")) av.fields.find(_.name == "M").get.dataType match {
        case m: StructType =>
          StructType(m.fields.map(f => StructField(f.name,
            fieldType(s"$name.${f.name}", f.dataType.asInstanceOf[StructType]))))
        case _ => MapType(StringType, StringType)
      }
      else if (tags.contains("L")) ArrayType(StringType) // heterogeneous-safe
      else if (tags.contains("NULL")) StringType
      else StringType
    }
    StructType(itemType.fields.map { f =>
      StructField(f.name, fieldType(f.name, f.dataType.asInstanceOf[StructType]))
    })
  }

  /** Widen/merge two schema generations — `glue:UpdateTable` +
    * `GetTableVersions` analog (reference src:113-115). New attributes
    * append; conflicting numeric types widen Long→Double; anything else
    * must match. */
  def mergeSchemas(a: StructType, b: StructType): StructType = {
    def widen(x: DataType, y: DataType): DataType = (x, y) match {
      case (s, t) if s == t => s
      case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
      case (IntegerType, LongType) | (LongType, IntegerType) => LongType
      case (s: StructType, t: StructType) => mergeSchemas(s, t)
      case (ArrayType(s, _), ArrayType(t, _)) => ArrayType(widen(s, t))
      case (s, t) => throw new IllegalArgumentException(
        s"incompatible schema evolution: $s vs $t")
    }
    val bByName = b.fields.map(f => f.name -> f).toMap
    val merged = a.fields.map { f =>
      bByName.get(f.name)
        .map(g => StructField(f.name, widen(f.dataType, g.dataType),
          nullable = true))
        .getOrElse(f.copy(nullable = true))
    }
    val extras = b.fields.filterNot(f => a.fieldNames.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(merged ++ extras)
  }
}
